"""Condition AST -> Spark Column compiler.

Truth tables match the reference matcher
(``crates/conveyor-etl-routing/src/matcher.rs:24-82``), which is
two-valued: any predicate over a missing/unparsable metadata value is
*false*, and ``Not`` of that is *true*. Spark comparisons return null for
null inputs, so every leaf is wrapped in ``coalesce(expr, false)`` before
combinators apply — this makes ``~leaf`` evaluate to true for missing
keys exactly like the reference (SURVEY §2.4 caveat; reference test
corpus ``routing/src/tests.rs:248-469``).

Everything compiles to built-in Column expressions — whole-stage codegen
keeps predicate evaluation JVM-side; no Python is involved per row. A
compiled condition placed early in the plan is eligible for Catalyst
predicate pushdown into the parquet/Kafka scan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

from etl_router_spark.model.conditions import Condition

METADATA_COL = "metadata"
RECORD_TYPE_COL = "record_type"


def _two_valued(col: Column) -> Column:
    """Null (unknown) collapses to false, matching the reference."""
    return F.coalesce(col, F.lit(False))


def compile_condition(
    cond: Condition,
    metadata_col: str = METADATA_COL,
    record_type_col: str = RECORD_TYPE_COL,
) -> Column:
    """Compile a Condition tree into a boolean Column (never null)."""
    meta = F.col(metadata_col)

    def rec(c: Condition) -> Column:
        k = c.kind
        if k == "always":
            return F.lit(True)
        if k == "never":
            return F.lit(False)
        if k == "and":
            if not c.children:
                return F.lit(True)  # vacuous truth, matcher.rs:70-72 iter().all
            return reduce(lambda a, b: a & b, (rec(ch) for ch in c.children))
        if k == "or":
            if not c.children:
                return F.lit(False)
            return reduce(lambda a, b: a | b, (rec(ch) for ch in c.children))
        if k == "not":
            return ~rec(c.children[0])
        if k == "record_type":
            return _two_valued(F.col(record_type_col) == F.lit(c.value))
        if k == "metadata_exists":
            return meta[c.key].isNotNull()
        if k == "metadata_equals":
            return _two_valued(meta[c.key] == F.lit(str(c.value)))
        if k == "metadata_match":
            # invalid regex => false in the reference (matcher.rs:29-39);
            # Spark raises at runtime instead — validated at compile time.
            _validate_regex(c.value)
            return _two_valued(meta[c.key].rlike(c.value))
        if k in ("metadata_gt", "metadata_lt", "metadata_gte", "metadata_lte"):
            # reference parses the metadata string as f64; parse failure
            # => false (matcher.rs:46-51). try_cast->null->coalesce(false)
            # (plain cast throws under Spark 4 ANSI mode). A parsed NaN
            # ("NaN" is a valid f64 literal) compares FALSE under IEEE
            # in the reference, but Spark's SQL comparisons use NaN
            # total-ordering (NaN greater than everything) — mask it
            # out explicitly. Found by tests/test_condition_property.py.
            num = meta[c.key].try_cast("double")
            not_nan = ~F.coalesce(F.isnan(num), F.lit(True))
            # Rust f64::from_str rejects surrounding whitespace where
            # Spark's cast trims it — a padded " 3.5 " must not match.
            # rlike, not F.trim: trim strips only ASCII spaces while
            # try_cast trims all whitespace/control chars, so "\t3.5"
            # would slip through a trim-based guard. (?s) so an inner
            # newline can't hide the trailing character, and \A/\z
            # anchors because Java's $ matches BEFORE a final newline
            # (so "3.5\n" would sneak past a $-anchored check).
            untrimmed_ok = meta[c.key].rlike(r"(?s)\A\S(.*\S)?\z")
            not_nan = not_nan & untrimmed_ok
            op = {
                "metadata_gt": num > F.lit(float(c.value)),
                "metadata_lt": num < F.lit(float(c.value)),
                "metadata_gte": num >= F.lit(float(c.value)),
                "metadata_lte": num <= F.lit(float(c.value)),
            }[k]
            return _two_valued(not_nan & op)
        # --- typed-column extension -------------------------------
        if k == "field_null":
            return F.col(c.key).isNull()
        if k == "field_equals":
            return _two_valued(F.col(c.key) == F.lit(c.value))
        if k == "field_in":
            return _two_valued(F.col(c.key).isin(list(c.value)))
        if k in ("field_gt", "field_lt", "field_gte", "field_lte"):
            col = F.col(c.key)
            op = {
                "field_gt": col > F.lit(c.value),
                "field_lt": col < F.lit(c.value),
                "field_gte": col >= F.lit(c.value),
                "field_lte": col <= F.lit(c.value),
            }[k]
            return _two_valued(op)
        if k == "expression":
            return _two_valued(F.expr(c.value).cast("boolean"))
        raise ValueError(f"unknown condition kind: {k!r}")

    return rec(cond)


def _validate_regex(pattern: str) -> None:
    import re

    try:
        re.compile(pattern)
    except re.error as exc:  # surface at compile time, not mid-job
        raise ValueError(f"invalid regex in metadata_match: {pattern!r}: {exc}") from exc
