"""Z-order layout tests: key math plus the actual pruning effect of
``compact_files(zorder_by=...)`` on per-file min/max stats."""

from __future__ import annotations

import glob

import pytest

from pyspark.sql import functions as F

from etl_router_spark.functions.layout import zorder_key


def test_zorder_key_interleaves_known_bits(spark):
    # two columns spanning [0, 3] at bits=2: buckets == raw values.
    # Morton order of (x, y) -> bit i*2+j, x = column 0 (less
    # significant at equal bit position)
    df = spark.createDataFrame(
        [(0, 0), (3, 0), (0, 3), (3, 3), (2, 1)], "x int, y int"
    )
    out = {
        (r["x"], r["y"]): r["__zkey"]
        for r in zorder_key(df, ["x", "y"], bits=2).collect()
    }
    # interleave(x=b1b0, y=c1c0) = c1 b1 c0 b0
    assert out[(0, 0)] == 0b0000
    assert out[(3, 0)] == 0b0101
    assert out[(0, 3)] == 0b1010
    assert out[(3, 3)] == 0b1111
    assert out[(2, 1)] == 0b0110  # x=10, y=01 -> c1=0 b1=1 c0=1 b0=0


def test_zorder_nulls_and_constant_columns_bucket_zero(spark):
    df = spark.createDataFrame(
        [(None, 5), (7, 5), (3, 5)], "x int, y int"
    )
    rows = zorder_key(df, ["x", "y"], bits=4).collect()
    by_x = {r["x"]: r["__zkey"] for r in rows}
    # y is constant -> contributes 0 bits; null x -> whole key 0
    assert by_x[None] == 0
    assert by_x[3] == 0  # x-min bucket is 0 too
    assert by_x[7] > 0


def test_zorder_key_rejects_overflow_and_empty(spark):
    df = spark.createDataFrame([(1, 2)], "x int, y int")
    with pytest.raises(ValueError):
        zorder_key(df, [], bits=16)
    with pytest.raises(ValueError):
        zorder_key(df, ["x", "y"], bits=32)


def test_compact_zorder_clusters_both_columns(spark, tmp_path):
    from etl_router_spark.io import compact_files

    path = str(tmp_path / "pts")
    # 512x512 grid (~6 MB parquet, so target_file_mb=1 re-splits into
    # several files) written in a layout that correlates with NEITHER
    # column (shuffled), then z-order compacted
    side = 512
    df = (
        spark.range(side * side)
        .select(
            (F.col("id") % side).alias("x"),
            (F.col("id") / side).cast("long").alias("y"),
            F.rand(7).alias("noise"),
            # incompressible pad so target_file_mb=1 re-splits into
            # enough files for a meaningful per-file stats comparison
            F.md5(F.col("id").cast("string")).alias("pad"),
        )
        .orderBy("noise")
    )
    df.repartition(16).write.parquet(path)

    def coverage(col):
        files = sorted(glob.glob(path + "/*.parquet"))
        assert len(files) > 3
        spans = []
        for f in files:
            mn, mx = spark.read.parquet(f).agg(F.min(col), F.max(col)).first()
            spans.append((mx - mn) / float(side - 1))
        return sum(spans) / len(spans)

    # shuffled layout: every file spans ~the full range of both cols
    assert coverage("x") > 0.9 and coverage("y") > 0.9

    before = sorted(
        (r["x"], r["y"]) for r in spark.read.parquet(path).select("x", "y").collect()
    )
    compact_files(spark, path, target_file_mb=1, zorder_by=["x", "y"])
    after_df = spark.read.parquet(path)
    after = sorted((r["x"], r["y"]) for r in after_df.select("x", "y").collect())
    assert before == after  # contents unchanged
    assert "__zkey" not in after_df.columns
    # z-ordered layout: per-file min/max tightens on BOTH columns at
    # once (single-column sort would tighten only one)
    assert coverage("x") < 0.8 and coverage("y") < 0.8


def test_compact_zorder_sort_by_exclusive(spark, tmp_path):
    from etl_router_spark.io import compact_files

    path = str(tmp_path / "d")
    spark.range(10).write.parquet(path)
    with pytest.raises(ValueError):
        compact_files(spark, path, zorder_by=["id"], sort_by=["id"])


def test_zorder_key_randomized_vs_duckdb_with_negatives(spark):
    """Random data including negative values and mixed scales must
    produce identical z-keys in DuckDB (pins the bucket arithmetic
    across engines — the fixture gate only covers positive columns)."""
    import random

    import duckdb

    from etl_router_spark.functions.layout import zorder_key, zorder_oracle_sql

    rng = random.Random(20260814)
    rows = [(i, rng.uniform(-1e4, 1e4), rng.randint(-500, 500))
            for i in range(300)]
    df = spark.createDataFrame(rows, "id long, x double, y long")
    got = dict(
        (r["id"], r["__zkey"])
        for r in zorder_key(df, ["x", "y"], bits=12).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, x DOUBLE, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = dict(con.execute(
        "WITH " + zorder_oracle_sql("t", ["x", "y"], bits=12)
        + " SELECT id, zkey FROM zkeyed"
    ).fetchall())
    assert got == want
