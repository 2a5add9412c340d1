"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a scale factor and
compares against the DuckDB ``oracle_sql()`` twin: row count, column
names, and exact values (rows sorted, columns sorted by name) — the
strictest local approximation of the driver's value-hash comparison.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def make_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def _kind(dtype) -> str:
    """Collapse a pandas dtype to the rendering class the driver's
    value-hash is sensitive to: int vs float vs everything-else."""
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    return "other"


def frame_to_rows(pdf) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in pdf[cols].itertuples(index=False, name=None)]
    rows.sort()
    return rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if sf_dir in ("-h", "--help") or not Path(sf_dir).is_dir():
        print(__doc__.strip())
        if sf_dir not in ("-h", "--help"):
            print(f"\nerror: {sf_dir!r} is not a directory", file=sys.stderr)
            return 2
        return 0
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    # Deliberately NOT the engine's session factory: the driver injects
    # its own plain session, so the local gate must prove every query
    # works without engine-factory confs (the round-1 nanos regression
    # was invisible precisely because this script used get_spark()).
    spark = (
        SparkSession.builder.appName("correctness-driverlike")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = make_duck(sf_dir)
    queries = entry.queries()
    oracles = entry.oracle_sql()

    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(spdf)} (no oracle, rows-only) [{time.time()-t0:.1f}s]")
            continue
        try:
            opdf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        s_cols, o_cols = sorted(spdf.columns), sorted(opdf.columns)
        if s_cols != o_cols:
            failures.append(name)
            print(f"FAIL  {name}: columns differ spark={s_cols} oracle={o_cols}")
            continue
        # The driver hashes rendered values, so an int64 4037 vs a
        # float64 4037.0 (DuckDB HUGEINT via fetchdf) is a hash MISMATCH
        # even though 9-sig-digit normalization makes them equal.
        # Reproduce that sensitivity: numeric dtype *kind* must agree.
        kind_mismatch = [
            c for c in s_cols
            if _kind(spdf[c].dtype) != _kind(opdf[c].dtype)
        ]
        if kind_mismatch:
            failures.append(name)
            print(
                f"FAIL  {name}: dtype-kind mismatch (driver hash would differ): "
                + ", ".join(
                    f"{c} spark={spdf[c].dtype} oracle={opdf[c].dtype}" for c in kind_mismatch
                )
            )
            continue
        if len(spdf) != len(opdf):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(spdf)} oracle={len(opdf)}")
            continue
        s_rows, o_rows = frame_to_rows(spdf), frame_to_rows(opdf)
        if s_rows != o_rows:
            failures.append(name)
            ndiff = sum(1 for a, b in zip(s_rows, o_rows) if a != b)
            print(f"FAIL  {name}: {ndiff}/{len(s_rows)} rows differ")
            for a, b in list(zip(s_rows, o_rows))[:200]:
                if a != b:
                    print(f"      spark : {a}")
                    print(f"      oracle: {b}")
                    break
        else:
            print(f"ok    {name}: rows={len(spdf)} values match [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
