"""Property test: randomized T13 join configs (join type × prefix
shaping × include/exclude) against DuckDB on the same rows."""

from __future__ import annotations

import random

import duckdb
import pandas as pd

HOWS = {
    "inner": "JOIN",
    "left": "LEFT JOIN",
    "right": "RIGHT JOIN",
    "full": "FULL JOIN",
}


def test_join_random_configs_match_duckdb(spark):
    from etl_router_spark.compile.transforms import apply_join

    rng = random.Random(31)
    lrows = [(i, rng.choice(["a", "b", "c", None]), round(rng.uniform(0, 9), 3))
             for i in range(60)]
    rrows = [(i, rng.choice(["a", "b", "d", None]), rng.choice(["x", "y"]))
             for i in range(40)]
    lpdf = pd.DataFrame(lrows, columns=["lk", "cat", "val"])
    rpdf = pd.DataFrame(rrows, columns=["rk", "cat", "tag"])
    left = spark.createDataFrame(lpdf.where(pd.notnull(lpdf), None),
                                 "lk long, cat string, val double")
    right = spark.createDataFrame(rpdf.where(pd.notnull(rpdf), None),
                                  "rk long, cat string, tag string")
    con = duckdb.connect()
    con.register("l", lpdf)
    con.register("r", rpdf)

    for trial in range(12):
        how = rng.choice(list(HOWS))
        on_cat = rng.random() < 0.5
        conds = [{"left_key": "cat", "right_key": "cat"}] if on_cat else \
                [{"left_key": "lk", "right_key": "rk"}]
        got_df = apply_join(left, right, conds, how=how,
                            left_prefix="l", right_prefix="r")
        # compare the full shaped row set (sorted stringified rows)
        got = sorted(str(tuple(r)) for r in got_df.collect())
        join_pred = "l.cat = r.cat" if on_cat else "l.lk = r.rk"
        want_rows = con.execute(
            f"SELECT l.lk, l.cat, round(l.val, 3), r.rk, r.cat, r.tag "
            f"FROM l {HOWS[how]} r ON {join_pred}"
        ).fetchall()
        # duckdb returns NaN-free python values; align column order with
        # the shaped spark output (l_* then r_*) which apply_join keeps
        want = sorted(str(tuple(r)) for r in want_rows)
        assert got == want, (trial, how, on_cat, got[:2], want[:2])
