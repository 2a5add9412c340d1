"""CDC changelog application: collapse an ordered change stream into
current state per key.

Completes the engine's CDC source story (reference declares Postgres /
MySQL CDC sources, ``crates/conveyor-etl-dsl/src/types.rs:346-364``,
whose decoded streams are exactly such changelogs): the snapshot a
downstream consumer wants is "latest surviving row per key", with
delete ops tombstoning the key.

Scale design: the latest-row pick is ``max_by(struct(cols),
struct(order_cols))`` — an ordinary aggregate with a map-side partial,
so the shuffle carries ONE candidate row per key per input partition.
The window-function formulation (`row_number() OVER (PARTITION BY key
ORDER BY ...)`) shuffles every change event and sorts each key group;
at 100 TB of changelog that is strictly worse. Both produce identical
results (the oracle uses the window form on purpose).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cdc_apply(
    changelog: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str | None = None,
    delete_values: tuple[str, ...] = ("delete", "d"),
) -> DataFrame:
    """Latest surviving state per key from a CDC changelog.

    ``order_cols`` break ties (e.g. ``["ts", "event_id"]`` — commit
    time then log sequence). If ``op_col`` is given, keys whose LATEST
    change is a delete op are dropped (tombstoned); earlier deletes are
    overridden by subsequent re-inserts, exactly like replaying the log.
    """
    data_cols = [c for c in changelog.columns if c not in key_cols]
    last = changelog.groupBy(*key_cols).agg(
        F.expr(
            "max_by(struct({}), struct({}))".format(
                ", ".join(data_cols), ", ".join(order_cols)
            )
        ).alias("__last")
    )
    out = last.select(*key_cols, "__last.*")
    if op_col is not None:
        low = F.lower(F.col(op_col))
        out = out.filter(~low.isin(*[v.lower() for v in delete_values]))
    return out


def cdc_snapshot_merge(
    snapshot: DataFrame,
    changelog: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str | None = None,
    delete_values: tuple[str, ...] = ("delete", "d"),
) -> DataFrame:
    """Apply a changelog on top of an initial snapshot (the JDBC
    snapshot read of the CDC sources): changed keys take the changelog
    state (or disappear on delete), untouched keys keep snapshot rows.
    """
    latest = cdc_apply(changelog, key_cols, order_cols, op_col=None)
    if op_col is not None:
        low = F.lower(F.col(op_col))
        survivors = latest.filter(~low.isin(*[v.lower() for v in delete_values]))
    else:
        survivors = latest
    # every changed key (including tombstoned ones) leaves the snapshot;
    # survivors re-enter with their latest state
    untouched = snapshot.join(latest.select(*key_cols), key_cols, "left_anti")
    return untouched.unionByName(survivors.select(*snapshot.columns))
