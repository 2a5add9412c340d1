"""Property test: randomized T12 aggregate configs (group keys ×
aggregation function subsets) against DuckDB on the same rows —
combinatorial coverage the per-function gates don't give."""

from __future__ import annotations

import math
import random

import duckdb
import pandas as pd

FUNS = [
    ("count", None, "count(*)"),
    ("count", "v", "count(v)"),
    ("sum", "v", "round(sum(v), 6)"),
    ("avg", "v", "round(avg(v), 6)"),
    ("min", "v", "round(min(v), 6)"),
    ("max", "v", "round(max(v), 6)"),
    ("countdistinct", "cat", "count(DISTINCT cat)"),
    ("stddev", "v", "round(stddev_samp(v), 6)"),
]


def test_aggregate_random_configs_match_duckdb(spark):
    from pyspark.sql import functions as F

    from etl_router_spark.compile.transforms import apply_aggregate

    rng = random.Random(7)
    rows = [
        (i, rng.choice(["a", "b", "c"]), rng.choice(["x", "y"]),
         round(rng.uniform(-100, 100), 4) if rng.random() > 0.1 else None)
        for i in range(300)
    ]
    pdf = pd.DataFrame(rows, columns=["id", "g", "cat", "v"])
    df = spark.createDataFrame(pdf.where(pd.notnull(pdf), None),
                               "id long, g string, cat string, v double")
    con = duckdb.connect()
    con.register("t", pdf)

    for trial in range(15):
        picked = rng.sample(FUNS, rng.randint(1, 4))
        group = rng.choice([["g"], ["g", "cat"], ["cat"]])
        aggs = []
        sql_parts = []
        for j, (fn, field, sql) in enumerate(picked):
            out = f"o{j}"
            cfg = {"function": fn, "output_field": out}
            if field:
                cfg["field"] = field
            aggs.append(cfg)
            sql_parts.append(f"CAST({sql} AS DOUBLE) AS {out}")
        got_df = apply_aggregate(df, group, aggs)
        # normalize spark output to doubles/rounding used in the SQL
        sel = [F.col(c) for c in group] + [
            F.round(F.col(f"o{j}").cast("double"), 6).alias(f"o{j}")
            for j in range(len(picked))
        ]
        got = sorted(
            (tuple(r) for r in got_df.select(*sel).collect()),
            key=str,
        )
        want = sorted(
            (tuple(r) for r in con.execute(
                f"SELECT {', '.join(group)}, {', '.join(sql_parts)} "
                f"FROM t GROUP BY {', '.join(group)}"
            ).fetchall()),
            key=str,
        )
        assert len(got) == len(want), (trial, picked, group)
        for a, b in zip(got, want):
            assert len(a) == len(b)
            for x, y in zip(a, b):
                if isinstance(x, float) and isinstance(y, float):
                    assert math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-6), (trial, a, b)
                else:
                    assert x == y, (trial, picked, group, a, b)
