"""Randomized cross-checks: duplicate_ngram_spans and mix_sample vs
independent pure-Python reference implementations on seeded random
corpora (the gate pins one fixed config; these sweep the space)."""

from __future__ import annotations

import hashlib
import random
import re

from pyspark.sql import functions as F

from etl_router_spark.functions.corpus import mix_sample
from etl_router_spark.functions.dedup import duplicate_ngram_spans


# ---------------------------------------------------------------------------
# duplicate_ngram_spans vs brute force
# ---------------------------------------------------------------------------
def _ref_spans(docs: list[tuple[int, str]], n: int, min_count: int):
    """Brute-force reference: global n-gram counts, per-doc position
    sets, maximal-interval merge."""
    grams: dict[tuple, int] = {}
    toks_by_doc = {}
    for did, text in docs:
        toks = re.split(r"\s+", text.strip()) if text.strip() else []
        toks_by_doc[did] = toks
        for i in range(len(toks) - n + 1):
            g = tuple(toks[i : i + n])
            grams[g] = grams.get(g, 0) + 1
    out = set()
    for did, toks in toks_by_doc.items():
        covered = sorted(
            i
            for i in range(len(toks) - n + 1)
            if grams[tuple(toks[i : i + n])] >= min_count
        )
        span = None
        for i in covered:
            s, e = i + 1, i + n  # 1-based inclusive
            if span and s <= span[1] + 1:
                span = (span[0], max(span[1], e))
            else:
                if span:
                    out.add((did, span[0], span[1]))
                span = (s, e)
        if span:
            out.add((did, span[0], span[1]))
    return out


def test_duplicate_spans_random_cross_check(spark):
    rng = random.Random(1234)
    for trial in range(5):
        n = rng.choice([2, 3, 4])
        vocab = [f"w{i}" for i in range(rng.choice([5, 12, 30]))]
        docs = [
            (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25))))
            for d in range(rng.randint(3, 12))
        ]
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        got = {
            (r.doc_id, r.span_start, r.span_end)
            for r in duplicate_ngram_spans(df, n=n).collect()
        }
        want = _ref_spans(docs, n, 2)
        assert got == want, f"trial {trial} n={n}: {got ^ want}"


# ---------------------------------------------------------------------------
# mix_sample vs pure-Python reference (same h60 + same IEEE arithmetic)
# ---------------------------------------------------------------------------
def _h60_bucket(salt: str, key) -> int:
    h = hashlib.md5(f"{salt}|{key}".encode()).hexdigest()[:15]
    return int(h, 16) % 1_000_000


def _ref_mix(rows, weights, salt):
    # rows: (id, domain, size)
    n = {}
    for _, d, s in rows:
        if d in weights:
            n[d] = n.get(d, 0.0) + float(s)
    scale = min(n[d] / weights[d] for d in n)
    rate = {d: weights[d] * scale / n[d] for d in n}
    return {
        rid
        for rid, d, _ in rows
        if d in rate and _h60_bucket(salt, rid) < rate[d] * 1_000_000.0
    }


def test_mix_sample_random_cross_check(spark):
    rng = random.Random(77)
    for trial in range(4):
        domains = [f"d{i}" for i in range(rng.randint(2, 6))]
        weights = {d: rng.choice([0.1, 0.25, 0.5, 1.0, 2.0]) for d in rng.sample(domains, rng.randint(2, len(domains)))}
        rows = [
            (i, rng.choice(domains), rng.randint(1, 500))
            for i in range(rng.randint(20, 120))
        ]
        # every weighted domain present with nonzero mass?  not required —
        # absent domains must simply contribute nothing
        df = spark.createDataFrame(rows, "id bigint, dom string, sz bigint")
        out = mix_sample(df, weights, domain_col="dom", key_col="id",
                         salt=f"s{trial}", size_col="sz")
        got = {r.id for r in out.select("id").collect()}
        present = {d for _, d, _ in rows}
        w_present = {d: w for d, w in weights.items() if d in present}
        if not w_present:
            assert got == set()
            continue
        want = _ref_mix(rows, w_present, f"s{trial}")
        assert got == want, f"trial {trial}: {got ^ want}"


def test_mix_sample_monotone_rescaling(spark):
    """Doubling every weight must not change the kept set (scale
    invariance holds algebraically; pin it end-to-end)."""
    rng = random.Random(5)
    rows = [(i, rng.choice(["a", "b", "c"]), rng.randint(1, 100)) for i in range(80)]
    df = spark.createDataFrame(rows, "id bigint, dom string, sz bigint")
    w1 = {"a": 0.5, "b": 0.25, "c": 0.25}
    w2 = {d: w * 2 for d, w in w1.items()}
    a = {r.id for r in mix_sample(df, w1, "dom", "id", "m", "sz").select("id").collect()}
    b = {r.id for r in mix_sample(df, w2, "dom", "id", "m", "sz").select("id").collect()}
    assert a == b
