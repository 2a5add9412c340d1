"""Property test: the compiled Spark condition tree matches a direct
Python implementation of the reference matcher semantics
(``routing/src/matcher.rs:24-82``) on randomized records × randomized
condition trees — including the two-valued missing-key behavior that
Spark's three-valued null logic gets wrong without the coalesce fix.

200 random trees evaluate in ONE Spark job (each tree is a boolean
column over the same records), so the sweep costs seconds.
"""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

KEYS = ["env", "region", "score", "empty", "weird"]
VALUES = ["prod", "dev", "eu-1", "", "10", "3.5", "-2", "abc", "NaN",
          " 3.5 ", "inf", "-Infinity", "1_000", "1e3", "+5",
          "\t3.5", "3.5\n", " 7", "4\r", " "]
RTYPES = ["user.event", "order.created", "noise"]
PATTERNS = [r"^prod", r"eu-\d", r"\d+", r"^$", r"a.c"]


def make_records(rng: random.Random, n: int = 60):
    recs = []
    for i in range(n):
        meta = {}
        for k in KEYS:
            if rng.random() < 0.6:
                meta[k] = rng.choice(VALUES)
        recs.append((i, rng.choice(RTYPES), meta))
    return recs


def make_tree(rng: random.Random, depth: int = 0):
    from etl_router_spark.model.conditions import Condition as C

    leaf_makers = [
        lambda: C.record_type(rng.choice(RTYPES)),
        lambda: C.metadata_exists(rng.choice(KEYS)),
        lambda: C.metadata_equals(rng.choice(KEYS), rng.choice(VALUES)),
        lambda: C.metadata_match(rng.choice(KEYS), rng.choice(PATTERNS)),
        lambda: C.metadata_gt(rng.choice(KEYS), rng.choice([0.0, 3.0, -5.0])),
        lambda: C.metadata_lt(rng.choice(KEYS), rng.choice([0.0, 3.0, 11.0])),
        lambda: C.metadata_gte(rng.choice(KEYS), rng.choice([3.5, 10.0])),
        lambda: C.metadata_lte(rng.choice(KEYS), rng.choice([3.5, -2.0])),
        lambda: C.always(),
        lambda: C.never(),
    ]
    if depth >= 3 or rng.random() < 0.5:
        return rng.choice(leaf_makers)()
    op = rng.choice(["and", "or", "not"])
    if op == "not":
        return C.not_(make_tree(rng, depth + 1))
    kids = [make_tree(rng, depth + 1) for _ in range(rng.randint(2, 3))]
    return C.and_(*kids) if op == "and" else C.or_(*kids)


def eval_ref(cond, record_type: str, meta: dict[str, str]) -> bool:
    """matcher.rs semantics: two-valued, missing/unparsable => False."""
    k = cond.kind
    if k == "record_type":
        return record_type == cond.value
    if k == "metadata_exists":
        return cond.key in meta
    if k == "metadata_equals":
        return meta.get(cond.key) == cond.value
    if k == "metadata_match":
        v = meta.get(cond.key)
        return v is not None and re.search(cond.value, v) is not None
    if k in ("metadata_gt", "metadata_lt", "metadata_gte", "metadata_lte"):
        v = meta.get(cond.key)
        # Rust f64::from_str: no surrounding whitespace, no underscores
        if v is None or v != v.strip() or "_" in v:
            return False
        try:
            x = float(v)
        except ValueError:
            return False
        if x != x:  # NaN comparisons are false in the reference parse
            return False
        t = float(cond.value)
        return {"metadata_gt": x > t, "metadata_lt": x < t,
                "metadata_gte": x >= t, "metadata_lte": x <= t}[k]
    if k == "and":
        return all(eval_ref(c, record_type, meta) for c in cond.children)
    if k == "or":
        return any(eval_ref(c, record_type, meta) for c in cond.children)
    if k == "not":
        return not eval_ref(cond.children[0], record_type, meta)
    if k == "always":
        return True
    if k == "never":
        return False
    raise AssertionError(k)


def test_condition_compiler_matches_reference_semantics(spark):
    from etl_router_spark.compile.conditions import compile_condition

    rng = random.Random(20260813)
    records = make_records(rng)
    trees = [make_tree(rng) for _ in range(200)]

    df = spark.createDataFrame(
        records, "id long, record_type string, metadata map<string,string>"
    )
    cols = [compile_condition(t).alias(f"c{i}") for i, t in enumerate(trees)]
    rows = df.select("id", *cols).orderBy("id").collect()

    mismatches = []
    for row in rows:
        rid, rtype, meta = records[row.id]
        for i, t in enumerate(trees):
            want = eval_ref(t, rtype, meta)
            got = row[f"c{i}"]
            if bool(got) != want or got is None:
                mismatches.append((rid, i, want, got, t))
    assert not mismatches, mismatches[:5]


def test_field_mapping_precedence_property(spark):
    """Randomized mapping sets vs a direct Python implementation of the
    reference's mapping precedence (engine.rs:289-322): literal >
    source_field (with per-field default on null) > default; in
    authoritative (drop_unmapped) mode the output is built ONLY from
    mapping targets."""
    from etl_router_spark.compile.transforms import apply_map
    from etl_router_spark.model.manifest import FieldMapping

    rng = random.Random(99)
    src_cols = ["a", "b", "c"]
    records = []
    for i in range(40):
        records.append((
            i,
            rng.choice(["x", "y", None]),
            rng.choice([1, 2, None]),
            rng.choice(["p", None]),
        ))
    df = spark.createDataFrame(records, "id long, a string, b long, c string")

    def rand_mapping(t):
        shape = rng.choice(["literal", "source", "source_default", "default"])
        if shape == "literal":
            return FieldMapping(target=t, literal=rng.choice(["L1", "L2"]))
        if shape == "source":
            return FieldMapping(target=t, source=rng.choice(["a", "c"]))
        if shape == "source_default":
            return FieldMapping(target=t, source=rng.choice(["a", "c"]),
                                default=rng.choice(["D1", "D2"]))
        return FieldMapping(target=t, default=rng.choice(["D3", "D4"]))

    for trial in range(20):
        mappings = [rand_mapping(f"t{j}") for j in range(rng.randint(1, 4))]
        out = apply_map(df, mappings, drop_unmapped=True)
        assert [f.name for f in out.schema.fields] == [m.target for m in mappings]
        got = [tuple(r) for r in out.orderBy(F.lit(1)).collect()]
        # reference evaluation, row-aligned with the source records
        want = []
        for rec in records:
            vals = dict(zip(["id", "a", "b", "c"], rec))
            row = []
            for m in mappings:
                if m.literal is not None:
                    row.append(m.literal)
                elif m.source is not None:
                    v = vals[m.source]
                    row.append(v if v is not None else m.default)
                else:
                    row.append(m.default)
            want.append(tuple(row))
        assert sorted(got, key=str) == sorted(want, key=str), (trial, mappings)
