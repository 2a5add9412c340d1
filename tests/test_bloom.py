"""Bloom-filter decontamination: bitmap matches a pure-Python filter
built with the same h60 hash family, the probe has one-sided error
(never keeps a true leak the exact semi-join would drop), and the
stage is declarable in a manifest."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from etl_router_spark.functions.corpus import (
    bloom_bitmap,
    bloom_decontaminate,
    decontaminate,
)


def _positions(g: str, m: int, k: int) -> list[int]:
    # windowed family: one md5 digest per 3 positions, 40-bit hex
    # windows [0:10], [10:20], [20:30] (matches _bloom_pos_sql)
    out = []
    for i in range(k):
        j, w = divmod(i, 3)
        digest = hashlib.md5(f"bf{j}|{g}".encode()).hexdigest()
        out.append(int(digest[10 * w: 10 * w + 10], 16) % m)
    return out


def _py_bitmap(texts, n, m, k):
    words = [0] * (m // 64)
    for t in texts:
        toks = t.strip().split()
        for j in range(len(toks) - n + 1):
            g = " ".join(toks[j:j + n])
            for p in _positions(g, m, k):
                words[p // 64] |= 1 << (p % 64)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def test_bitmap_matches_python_reference(spark):
    texts = ["aa bb cc dd ee ff gg hh ii jj", "one two three four five six seven eight"]
    bench = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    assert bloom_bitmap(bench, n=8, m_bits=1 << 10, k=3) == _py_bitmap(
        texts, 8, 1 << 10, 3)


def test_probe_flags_leaks_and_passes_clean(spark):
    bench = spark.createDataFrame(
        [(1, "aa bb cc dd ee ff gg hh ii")], ["doc_id", "text"])
    docs = spark.createDataFrame(
        [(1, "zz aa bb cc dd ee ff gg hh"),   # shares an 8-gram
         (2, "xx yy zz ww vv uu tt ss rr"),   # disjoint vocabulary
         (3, "short text")],                  # no 8-gram at all
        ["doc_id", "text"])
    kept = {r["doc_id"]
            for r in bloom_decontaminate(docs, bench, n=8,
                                         m_bits=1 << 16, k=3).collect()}
    assert kept == {2, 3}
    tagged = bloom_decontaminate(docs, bench, n=8, m_bits=1 << 16, k=3,
                                 mode="tag")
    flags = {r["doc_id"]: r["contaminated"] for r in tagged.collect()}
    assert flags == {1: True, 2: False, 3: False}


def test_one_sided_error_vs_exact(spark, sf_dir):
    """Bloom survivors are ALWAYS a subset of exact-semi-join
    survivors: false positives drop extra docs, never keep a leak."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") < 40)
    bench = docs.filter(F.col("doc_id") >= 40).limit(60)
    exact = decontaminate(corpus, bench, n=8)
    bloom = bloom_decontaminate(corpus, bench, n=8, m_bits=1 << 20, k=3)
    extra = bloom.select("doc_id").exceptAll(exact.select("doc_id")).count()
    assert extra == 0
    # with a well-sized filter the FP loss is tiny: >= 90% of exact
    # survivors also survive the bloom pass
    assert bloom.count() >= 0.9 * exact.count()


def test_validation(spark):
    bench = spark.createDataFrame([(1, "a b c d e f g h")], ["doc_id", "text"])
    docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_decontaminate(docs, bench, m_bits=100)
    with pytest.raises(ValueError, match="drop|tag"):
        bloom_decontaminate(docs, bench, mode="bogus")


def test_manifest_stage(spark, sf_dir, tmp_path):
    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict

    docs_path = f"{sf_dir}/documents.parquet"
    pipeline = parse_manifest_dict({
        "apiVersion": "etl.dev/v1", "kind": "Pipeline",
        "metadata": {"name": "bloom"},
        "spec": {"stages": [
            {"id": "src", "type": "source",
             "config": {"source_type": "file", "format": "parquet",
                        "path": docs_path}},
            {"id": "op", "type": "transform",
             "config": {"transform_type": "bloom_decontaminate",
                        "ngram": 8, "m_bits": 1 << 20,
                        "benchmark": {"source_type": "file",
                                      "format": "parquet",
                                      "path": docs_path}}},
            {"id": "out", "type": "sink",
             "config": {"sink_type": "file", "format": "parquet",
                        "path": str(tmp_path / "o")}},
        ]},
    })
    out = compile_pipeline(spark, pipeline).sink_frames["out"]
    # benchmark == corpus: every doc with >= 1 8-gram leaks itself
    docs = spark.read.parquet(docs_path)
    with_gram = docs.filter(F.size(F.split(F.trim("text"), r"\s+")) >= 8).count()
    assert out.count() == docs.count() - with_gram


def test_xxhash64_family_contract(spark, sf_dir):
    """The native-hash production path honors the same one-sided-error
    contract as the oracle-exact h60 family: every true leak flagged,
    survivors a subset of the exact semi-join's."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") < 40)
    bench = docs.filter(F.col("doc_id") >= 40).limit(60)
    exact = decontaminate(corpus, bench, n=8)
    bloom = bloom_decontaminate(corpus, bench, n=8, m_bits=1 << 20, k=3,
                                hash_family="xxhash64")
    extra = bloom.select("doc_id").exceptAll(exact.select("doc_id")).count()
    assert extra == 0
    assert bloom.count() >= 0.9 * exact.count()


def test_xxhash64_flags_leaks(spark):
    bench = spark.createDataFrame(
        [(1, "aa bb cc dd ee ff gg hh ii")], ["doc_id", "text"])
    docs = spark.createDataFrame(
        [(1, "zz aa bb cc dd ee ff gg hh"),
         (2, "xx yy zz ww vv uu tt ss rr")],
        ["doc_id", "text"])
    kept = {r["doc_id"]
            for r in bloom_decontaminate(docs, bench, n=8, m_bits=1 << 16,
                                         k=3, hash_family="xxhash64").collect()}
    assert kept == {2}
    with pytest.raises(ValueError, match="hash_family"):
        bloom_decontaminate(docs, bench, hash_family="fnv")


def test_hoisted_probe_matches_per_position_form(spark):
    """The digest-HOISTED h60 probe (one md5 per gram per digest
    window group — the hot path, since exists/forall are interpreted
    with no codegen subexpression elimination) produces bit-identical
    flags to the canonical per-position _bloom_pos_sql form, at k=3
    (one digest), k=5 (two digests, second only partially windowed)
    and k=1, including NULL / empty / too-short text."""
    from etl_router_spark.functions.corpus import (
        _bloom_pos_sql,
        bloom_bitmap,
    )
    from etl_router_spark.functions.text import shingles_sql, tokens_sql

    bench = spark.createDataFrame(
        [(1, "aa bb cc dd ee ff gg hh ii jj kk")], ["doc_id", "text"])
    docs = spark.createDataFrame(
        [(1, "zz aa bb cc dd ee ff gg hh ii"),  # shares an 8-gram
         (2, "xx yy zz ww vv uu tt ss rr qq"),  # disjoint vocabulary
         (3, "short text"),                     # no 8-gram
         (4, ""),                               # empty
         (5, None)],                            # NULL text
        ["doc_id", "text"])
    for k in (1, 3, 5):
        m = 1 << 14
        words = bloom_bitmap(bench, n=8, m_bits=m, k=k)
        probe = docs.withColumn("__bf", F.lit(words))
        pos = _bloom_pos_sql("g", m, k, "h60")
        bit = ("p -> (shiftright(element_at(__bf, CAST(p DIV 64 AS INT)"
               " + 1), CAST(p % 64 AS INT)) & 1) = 1")
        per_position = (
            f"exists({shingles_sql(tokens_sql('text'), 8)}, g -> "
            f"forall(array({', '.join(pos)}), {bit}))")
        rows = (
            bloom_decontaminate(docs, bench, n=8, m_bits=m, k=k,
                                mode="tag")
            .join(probe.withColumn("__ref", F.expr(per_position))
                  .select("doc_id", "__ref"), "doc_id")
            .select("doc_id", "contaminated", "__ref").collect())
        assert len(rows) == 5
        for r in rows:
            assert r["contaminated"] == r["__ref"], (k, r)


def test_hoisted_probe_computes_each_digest_once(spark):
    """Plan-level pin of the hoist itself: the h60 probe expression
    contains exactly ceil(k/3) md5 calls (one per digest), not k."""
    bench = spark.createDataFrame(
        [(1, "aa bb cc dd ee ff gg hh ii")], ["doc_id", "text"])
    docs = spark.createDataFrame(
        [(2, "xx yy zz ww vv uu tt ss rr")], ["doc_id", "text"])
    for k, n_digests in ((1, 1), (3, 1), (4, 2), (6, 2), (7, 3)):
        tagged = bloom_decontaminate(docs, bench, n=8, m_bits=1 << 14,
                                     k=k, mode="tag")
        plan = tagged._jdf.queryExecution().analyzed().toString()
        # count the FULL digest form md5(concat(bf, <j>, |, ...)) — a
        # bare "md5" substring count would break (or silently weaken)
        # on any unrelated md5 in the plan: a column name, another
        # expression, a plan-rendering change (r14 ADVICE)
        import re

        hits = re.findall(r"md5\((?:cast\()?concat\(bf, \d+, \|", plan)
        assert len(hits) == n_digests, (k, hits, plan)
