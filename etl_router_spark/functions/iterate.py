"""Lineage-cut materialization for iterative DataFrame algorithms
(PageRank, connected components, any fixed-point loop).

Iterative plans re-embed their full upstream tree every round: persist
short-circuits execution but Catalyst still re-analyzes the
ever-growing logical plan (driver OOM by round ~5 when the input is
itself a big plan). Both checkpoint flavors truncate lineage to the
materialized partitions; they differ in fault tolerance:

- ``localCheckpoint`` (default, ``checkpoint_dir=None``): blocks live
  on executor local storage — fastest, but an executor loss makes the
  checkpointed partitions UNRECOVERABLE and fails the job. Fine for
  local mode and short interactive runs.
- reliable ``checkpoint()`` (``checkpoint_dir=...``): blocks write to
  the (HDFS/S3/shared-fs) directory, so a 1000-executor job survives
  preemptions and node loss mid-iteration — the right setting for
  long-running cluster jobs.

The reliable checkpoint directory is SparkContext-global; this helper
re-points it at the requested path before every reliable checkpoint —
a cached "already set" shortcut would silently trust a stale value if
anything else called ``setCheckpointDir`` in between, voiding the
fault-tolerance contract (blocks landing on the wrong filesystem).
``setCheckpointDir`` is a driver-side mkdir: one UUID subdirectory per
call, noise-level cost next to writing the checkpoint data itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame, checkpoint_dir: str | None = None) -> DataFrame:
    """Eagerly materialize ``df`` and cut its lineage.

    ``checkpoint_dir=None`` -> ``localCheckpoint`` (executor-local,
    not fault-tolerant); a path -> reliable ``checkpoint()`` rooted
    there (fault-tolerant, cluster-safe).
    """
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=True)
    sc = df.sparkSession.sparkContext
    sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=True)
