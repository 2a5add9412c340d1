"""The data-pipeline operators as first-class ``transform_type``s in a
manifest (SURVEY §7.3 M6) — a user can declare dedup/similarity/text
stages in YAML exactly like filter/aggregate."""

from __future__ import annotations

import pytest

from etl_router_spark.compile.pipeline import compile_pipeline
from etl_router_spark.model.parser import parse_manifest_dict


def _run(spark, src_path, transform_cfg, out):
    pipeline = parse_manifest_dict({
        "apiVersion": "etl.dev/v1", "kind": "Pipeline",
        "metadata": {"name": "llm-op"},
        "spec": {"stages": [
            {"id": "src", "type": "source",
             "config": {"source_type": "file", "format": "parquet", "path": src_path}},
            {"id": "op", "type": "transform", "config": transform_cfg},
            {"id": "out", "type": "sink",
             "config": {"sink_type": "file", "format": "parquet", "path": out}},
        ]},
    })
    return compile_pipeline(spark, pipeline).sink_frames["out"]


def test_dedup_exact_manifest(spark, sf_dir, tmp_path):
    out = _run(spark, f"{sf_dir}/documents.parquet",
               {"transform_type": "dedup_exact"}, str(tmp_path / "o"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert 0 < out.count() <= docs.count()
    assert set(out.columns) == set(docs.columns)


def test_dedup_minhash_manifest(spark, sf_dir, tmp_path):
    out = _run(spark, f"{sf_dir}/documents.parquet",
               {"transform_type": "dedup_minhash", "num_hashes": 8, "bands": 4,
                "threshold": 0.5}, str(tmp_path / "o"))
    assert {"id_a", "id_b", "est_jaccard"} <= set(out.columns)
    assert out.filter("id_a >= id_b").count() == 0


def test_similarity_topk_manifest(spark, sf_dir, tmp_path):
    out = _run(spark, f"{sf_dir}/embeddings.parquet",
               {"transform_type": "similarity_topk", "k": 3,
                "query_condition": {"type": "field_lt", "key": "vec_id", "value": 5}},
               str(tmp_path / "o"))
    rows = out.collect()
    assert {r.query_id for r in rows} <= set(range(5))
    assert max(r.rank for r in rows) <= 3


def test_text_ops_manifest(spark, sf_dir, tmp_path):
    stats = _run(spark, f"{sf_dir}/documents.parquet",
                 {"transform_type": "text_stats"}, str(tmp_path / "s"))
    assert {"n_words", "stopword_ratio"} <= set(stats.columns)
    lang = _run(spark, f"{sf_dir}/documents.parquet",
                {"transform_type": "langid"}, str(tmp_path / "l"))
    assert "lang_pred" in lang.columns
    fp = _run(spark, f"{sf_dir}/documents.parquet",
              {"transform_type": "fingerprint"}, str(tmp_path / "f"))
    assert "fingerprint" in fp.columns


def test_multimodal_resize_and_frames(spark, sf_dir):
    from etl_router_spark.functions.multimodal import (
        attach_fake_media,
        resize_images,
        sample_frames,
    )

    docs = attach_fake_media(spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20))
    resized = resize_images(docs, width=16, height=8)
    rows = resized.collect()
    assert len(rows) == 20
    assert all(len(r.media) == 16 * 8 for r in rows)
    assert all((r.width, r.height) == (16, 8) for r in rows)
    # deterministic: same input -> same bytes
    again = {r.doc_id: r.media for r in resize_images(docs, 16, 8).collect()}
    assert all(again[r.doc_id] == r.media for r in rows)

    frames = sample_frames(docs, every_n=10, max_frames=4)
    fr = frames.collect()
    assert {r.doc_id for r in fr} <= {r.doc_id for r in rows}
    per_doc = {}
    for r in fr:
        per_doc.setdefault(r.doc_id, []).append(r.frame_index)
    assert all(sorted(v) == list(range(len(v))) and len(v) <= 4 for v in per_doc.values())

    import pytest as _pytest
    with _pytest.raises(Exception, match="NotImplementedError|real image"):
        resize_images(docs, 4, 4, decoder="real").collect()


def test_multimodal_extract_manifest(spark, sf_dir, tmp_path):
    from etl_router_spark.functions.multimodal import attach_fake_media

    docs = attach_fake_media(spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50))
    pipeline = parse_manifest_dict({
        "apiVersion": "etl.dev/v1", "kind": "Pipeline",
        "metadata": {"name": "mm"},
        "spec": {"stages": [
            {"id": "src", "type": "source",
             "config": {"source_type": "memory", "rows": []}},
            {"id": "op", "type": "transform",
             "config": {"transform_type": "multimodal_extract"}},
            {"id": "out", "type": "sink",
             "config": {"sink_type": "file", "format": "parquet",
                        "path": str(tmp_path / "o")}},
        ]},
    })
    compiled = compile_pipeline(spark, pipeline, source_overrides={"src": docs})
    out = compiled.sink_frames["out"]
    assert {"n_bytes", "content_digest", "feature"} <= set(out.columns)
    assert out.count() == 50


def test_corpus_stage_manifests(spark, sf_dir, tmp_path):
    """decontaminate / hash_sample / pack_sequences as manifest
    transform_types: the full corpus-prep pipeline is declarable in
    YAML like any filter or aggregate."""
    docs_path = f"{sf_dir}/documents.parquet"
    n_docs = spark.read.parquet(docs_path).count()

    sampled = _run(spark, docs_path,
                   {"transform_type": "hash_sample", "rate": 0.3,
                    "key_field": "doc_id", "salt": "m"},
                   str(tmp_path / "s"))
    assert 0 < sampled.count() < n_docs

    clean = _run(spark, docs_path,
                 {"transform_type": "decontaminate", "ngram": 8,
                  "benchmark": {"source_type": "file", "format": "parquet",
                                "path": docs_path}},
                 str(tmp_path / "d"))
    # benchmark == corpus -> every doc leaks its own 8-grams
    assert clean.count() == 0

    packed = _run(spark, docs_path,
                  {"transform_type": "tokenize"},
                  str(tmp_path / "t"))
    pipeline2 = parse_manifest_dict({
        "apiVersion": "etl.dev/v1", "kind": "Pipeline",
        "metadata": {"name": "pack"},
        "spec": {"stages": [
            {"id": "src", "type": "source",
             "config": {"source_type": "memory", "rows": []}},
            {"id": "op", "type": "transform",
             "config": {"transform_type": "pack_sequences", "max_tokens": 1024}},
            {"id": "out", "type": "sink",
             "config": {"sink_type": "file", "format": "parquet",
                        "path": str(tmp_path / "p")}},
        ]},
    })
    compiled = compile_pipeline(
        spark, pipeline2,
        source_overrides={"src": packed.select("doc_id", "n_tokens")})
    out = compiled.sink_frames["out"]
    assert {"seq_index", "seq_offset", "token_start"} <= set(out.columns)
    assert out.count() == n_docs


def test_repetition_and_pii_and_chunk_manifests(spark, sf_dir, tmp_path):
    out = _run(spark, f"{sf_dir}/documents.parquet",
               {"transform_type": "repetition_stats"}, str(tmp_path / "rep"))
    assert {"dup_2gram_frac", "dup_3gram_frac", "top_token_frac"} <= set(out.columns)

    out = _run(spark, f"{sf_dir}/documents.parquet",
               {"transform_type": "pii_redact"}, str(tmp_path / "pii"))
    assert {"clean_text", "n_email", "n_ip", "n_phone"} <= set(out.columns)

    out = _run(spark, f"{sf_dir}/documents.parquet",
               {"transform_type": "chunk", "window": 16, "stride": 8},
               str(tmp_path / "chunk"))
    assert {"chunk_id", "chunk_text", "n_chunk_tokens"} <= set(out.columns)
    # overlap: more chunks than documents
    assert out.count() > out.select("doc_id").distinct().count()


def test_repetition_stats_values(spark):
    from etl_router_spark.functions.text import repetition_stats

    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x y z w"), (3, "")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_stats(df).collect()}
    # "a b a b a": 2-grams [ab, ba, ab, ba] -> 2 distinct of 4 = 0.5 dup
    assert rows[1].dup_2gram_frac == 0.5
    assert rows[1].top_token_frac == 0.6        # 'a' 3 of 5
    assert rows[2].dup_2gram_frac == 0.0
    assert rows[3].top_token_frac == 0.0


def test_pii_redact_values(spark):
    from etl_router_spark.functions.text import pii_redact

    df = spark.createDataFrame(
        [(1, "mail bob@x.io and 10.0.0.1 or +1 555-000-1234 end")],
        "doc_id long, text string",
    )
    row = pii_redact(df).collect()[0]
    assert (row.n_email, row.n_ip, row.n_phone) == (1, 1, 1)
    assert row.clean_text == "mail <EMAIL> and <IP> or <PHONE> end"


def test_chunk_documents_cover_and_overlap(spark):
    from etl_router_spark.functions.corpus import chunk_documents

    toks = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, toks), (2, "a b")], "doc_id long, text string")
    rows = chunk_documents(df, window=4, stride=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 10 tokens, window 4, stride 3 -> chunks at 0,3,6 -> 3 chunks
    assert sorted(c.chunk_id for c in by_doc[1]) == [0, 1, 2]
    texts = {c.chunk_id: c.chunk_text for c in by_doc[1]}
    assert texts[0] == "t0 t1 t2 t3"
    assert texts[2] == "t6 t7 t8 t9"
    # short doc: single chunk, whole text
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == "a b"


# ---------------------------------------------------------------------------
# hot-bucket salting (degenerate-corpus protection for pair generation)
# ---------------------------------------------------------------------------
def _identical_docs(spark, n, text="the quick brown fox jumps over the lazy dog again"):
    return spark.createDataFrame(
        [(i, text) for i in range(n)], "doc_id long, text string"
    )


def test_minhash_salting_bounds_degenerate_bucket(spark):
    # 400 identical docs share every band key: unsalted that is one
    # C(400,2)=79800-pair task per band; salt_cap=50 must split it
    from etl_router_spark.functions.dedup import connected_components, minhash_lsh_pairs

    docs = _identical_docs(spark, 400)
    pairs = minhash_lsh_pairs(docs, num_hashes=8, bands=4, threshold=0.5, salt_cap=50)
    n_pairs = pairs.count()
    # ~8 sub-buckets x C(50,2) + C(8,2) rep links, NOT C(400,2)
    assert 0 < n_pairs < 30_000, n_pairs
    # the closure the dedup actually consumes is intact: one component
    comp = connected_components(pairs, algorithm="star")
    labels = {r.component for r in comp.collect()}
    assert labels == {0}
    assert comp.count() == 400


def test_simhash_salting_bounds_degenerate_bucket(spark):
    from etl_router_spark.functions.dedup import connected_components, simhash_pairs

    docs = _identical_docs(spark, 300)
    pairs = simhash_pairs(docs, max_hamming=3, bits=32, blocks=4, salt_cap=40)
    n_pairs = pairs.count()
    assert 0 < n_pairs < 20_000, n_pairs
    comp = connected_components(pairs, algorithm="star")
    assert {r.component for r in comp.collect()} == {0}
    assert comp.count() == 300


def test_salting_preserves_closure_on_mixed_corpus(spark):
    # several dup groups + unique docs: salted and unsalted pair sets
    # may differ, but the cluster assignment (the dedup output) must not
    from etl_router_spark.functions.dedup import dedup_clusters, minhash_lsh_pairs

    rows = []
    for g in range(4):
        text = f"group {g} text body shared by all members of group {g} exactly"
        for m in range(30):
            rows.append((g * 100 + m, text))
    for u in range(500, 520):
        rows.append((u, f"totally unique document number {u} with its own words {u * 7}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def clusters(salt_cap):
        pairs = minhash_lsh_pairs(
            docs, num_hashes=8, bands=4, threshold=0.5, salt_cap=salt_cap
        )
        return {
            r.doc_id: r.cluster_id for r in dedup_clusters(docs, pairs).collect()
        }

    assert clusters(salt_cap=10) == clusters(salt_cap=None)


def test_salting_off_below_cap_identical_pairs(spark):
    # buckets under the cap: salted output must be EXACTLY the unsalted
    # output (this is what keeps the sf0.01 driver gates hash-stable)
    from etl_router_spark.functions.dedup import minhash_lsh_pairs

    rows = [(i, f"doc {i % 7} repeated body for bucket sharing test") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, minhash_lsh_pairs(docs, num_hashes=8, bands=4, salt_cap=512).collect()))
    b = sorted(map(tuple, minhash_lsh_pairs(docs, num_hashes=8, bands=4, salt_cap=None).collect()))
    assert a == b and len(a) > 0


def test_ngram_chunk_pair_blocking_exact(spark):
    # a hot shingle (posting list >> pair_chunk) must produce EXACTLY
    # the same pair multiset through chunk-pair blocking as through the
    # single-task explode — blocking is a placement change, not a
    # semantics change
    from etl_router_spark.functions.dedup import ngram_jaccard_pairs

    rows = [(i, "alpha beta gamma delta shared tail") for i in range(150)]
    rows += [(500 + i, f"unique doc {i} with words {i * 3} {i * 7} {i * 11}")
             for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def pairs(chunk):
        return sorted(map(tuple, ngram_jaccard_pairs(
            docs, threshold=0.5, max_df_frac=None, pair_chunk=chunk
        ).collect()))

    blocked = pairs(16)       # 150-doc list -> 10 chunks -> 55 chunk pairs
    single = pairs(100_000)   # everything on one task (old behavior)
    assert blocked == single
    assert len(blocked) == 150 * 149 // 2  # the identical-group clique


def test_char_entropy_known_values(spark):
    import math

    from etl_router_spark.functions.text import char_entropy

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.char_entropy for r in char_entropy(docs).collect()}
    assert got[1] == 0.0                       # single symbol: zero bits
    assert abs(got[2] - 1.0) < 1e-9            # two equiprobable symbols
    assert abs(got[3] - 2.0) < 1e-9            # four equiprobable symbols
    assert got[4] == 0.0                       # empty text guard


def test_ngram_counts_order_and_counts(spark):
    from etl_router_spark.functions.text import ngram_counts

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x y")], "doc_id long, text string"
    )
    rows = [(r.ngram, r.cnt) for r in ngram_counts(docs, n=2, k=3).collect()]
    # bigrams: doc1: "a b","b a","a b","b c"; doc2: "a b","b x","x y"
    assert rows[0] == ("a b", 3)
    assert rows[1:] == [("b a", 1), ("b c", 1)]  # ties broken by ngram ASC


def test_ngram_chunk_blocking_property_random_corpora(spark):
    # randomized corpora with duplicate groups of varying size: the
    # blocked pair set must equal the unblocked pair set for every
    # chunk size — blocking is placement-only, at any granularity
    import random

    from etl_router_spark.functions.dedup import ngram_jaccard_pairs

    for seed in (11, 12):
        rng = random.Random(seed)
        rows = []
        nid = 0
        for g in range(rng.randint(2, 4)):
            text = " ".join(rng.choice("abcdefgh") for _ in range(rng.randint(6, 10)))
            for _ in range(rng.randint(5, 40)):
                rows.append((nid, text)); nid += 1
        for _ in range(rng.randint(5, 15)):
            rows.append((nid, f"unique {nid} " + " ".join(
                str(rng.randint(0, 9999)) for _ in range(6)))); nid += 1
        docs = spark.createDataFrame(rows, "doc_id long, text string")

        def pairs(chunk):
            return sorted(map(tuple, ngram_jaccard_pairs(
                docs, threshold=0.3, max_df_frac=None, pair_chunk=chunk
            ).collect()))

        baseline = pairs(10**9)
        for chunk in (4, 16):
            assert pairs(chunk) == baseline, f"seed={seed} chunk={chunk}"
        assert len(baseline) > 0


def test_line_dedup_delimiter_keeps_first_global_occurrence(spark):
    from etl_router_spark.functions.corpus import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "cookie banner\nunique alpha\ncookie banner"),
            (2, "cookie banner\nunique beta"),
            (3, "Unique   ALPHA\nfresh gamma"),
            (4, "cookie banner"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["n_lines"], r["n_lines_kept"], r["text_deduped"])
        for r in line_dedup(docs).collect()
    }
    # doc 1 keeps the first "cookie banner" + "unique alpha"; its own
    # second copy of the banner is an intra-document duplicate too
    assert out[1] == (3, 2, "cookie banner\nunique alpha")
    assert out[2] == (2, 1, "unique beta")
    # "Unique   ALPHA" normalizes (lower + whitespace collapse) to
    # doc 1's line -> dropped; doc 3 keeps only its fresh line
    assert out[3] == (2, 1, "fresh gamma")
    # every line a duplicate -> empty doc, still present in the output
    assert out[4] == (1, 0, "")


def test_line_dedup_token_segmenter_covers_all_tokens(spark):
    from etl_router_spark.functions.corpus import line_dedup

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d x y z")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in line_dedup(docs, tokens_per_line=4).collect()}
    # 7 tokens -> lines of 4 + 3; doc 2 shares its first 4-token line
    assert out[1]["n_lines"] == 2 and out[1]["n_lines_kept"] == 2
    assert out[2]["n_lines"] == 2 and out[2]["n_lines_kept"] == 1
    assert out[2]["text_deduped"] == "x y z"


def test_line_dedup_manifest(spark, tmp_path):
    import pyspark.sql.functions as F

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "dup line\nkeep one"), (2, "dup line\nkeep two")], ["doc_id", "text"]
    ).write.parquet(src)
    out = _run(spark, src, {"transform_type": "line_dedup"}, str(tmp_path / "o"))
    rows = {r["doc_id"]: r["text_deduped"] for r in out.collect()}
    assert rows == {1: "dup line\nkeep one", 2: "keep two"}


def test_embedding_normalize_and_quantize_roundtrip(spark):
    import math

    from etl_router_spark.functions.embedding import (
        dequantize_int8,
        l2_normalize,
        quantize_int8,
    )

    rows = [
        (1, [3.0, 4.0]),
        (2, [0.0, 0.0]),            # zero vector: passes through, scale 0
        (3, [-1.5, 2.5]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    n = {r["vec_id"]: r for r in l2_normalize(df).collect()}
    assert n[1]["l2_norm"] == 5.0
    assert n[1]["embedding_norm"] == [0.6, 0.8]
    assert n[2]["l2_norm"] == 0.0 and n[2]["embedding_norm"] == [0.0, 0.0]
    assert abs(sum(x * x for x in n[3]["embedding_norm"]) - 1.0) < 1e-12

    q = dequantize_int8(quantize_int8(df))
    for r in q.collect():
        orig = dict(rows)[r["vec_id"]]
        assert all(abs(a) <= 127 for a in r["q_embedding"])
        scale = r["q_scale"]
        for a, b in zip(orig, r["embedding_deq"]):
            assert abs(a - b) <= scale / 2 + 1e-12
    z = {r["vec_id"]: r for r in q.collect()}[2]
    assert z["q_scale"] == 0.0 and z["q_embedding"] == [0, 0]


def test_embedding_manifest_transforms(spark, tmp_path):
    src = str(tmp_path / "emb")
    spark.createDataFrame([(1, [3.0, 4.0])], ["vec_id", "embedding"]).write.parquet(src)
    out = _run(spark, src, {"transform_type": "embedding_normalize"}, str(tmp_path / "o1"))
    assert out.collect()[0]["embedding_norm"] == [0.6, 0.8]
    out2 = _run(spark, src, {"transform_type": "embedding_quantize"}, str(tmp_path / "o2"))
    assert out2.collect()[0]["q_embedding"] == [95, 127]


def test_minhash_lsh_join_stored_signature_table(spark, sf_dir, tmp_path):
    """The incremental-dedup production shape: the corpus side's
    signatures come from a stored parquet table; results must be
    byte-identical to recomputing from text."""
    from etl_router_spark.functions.dedup import minhash_lsh_join, minhash_signatures
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new = docs.filter(F.col("doc_id") < 150)
    seen = docs.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 400))

    sig_path = str(tmp_path / "sigs")
    minhash_signatures(seen, num_hashes=8).write.parquet(sig_path)
    stored = spark.read.parquet(sig_path)

    kw = dict(num_hashes=8, bands=4, threshold=0.5)
    recomputed = {tuple(r) for r in minhash_lsh_join(new, seen, **kw).collect()}
    from_table = {tuple(r) for r in
                  minhash_lsh_join(new, seen, right_signatures=stored, **kw).collect()}
    assert recomputed == from_table and len(from_table) > 0

    with pytest.raises(ValueError, match="missing columns"):
        minhash_lsh_join(new, seen, right_signatures=stored.drop("mh_7"), **kw)

    # the frame carries its build stamp through the parquet round-trip
    from etl_router_spark.functions.dedup import minhash_signature_params

    assert minhash_signature_params(stored) == {
        "num_hashes": 8, "shingle_n": 3, "hash_family": "h60"}
    # mixing an h60-built signature table with a different family (or
    # shingle width) would band-key to zero collisions — fail fast
    # instead of silent zero recall (r14 ADVICE)
    with pytest.raises(ValueError, match="hash_family='xxhash64'.*h60"
                                         "|conflict"):
        minhash_lsh_join(new, seen, right_signatures=stored,
                         hash_family="xxhash64", **kw)
    with pytest.raises(ValueError, match="conflict"):
        minhash_lsh_join(new, seen, right_signatures=stored,
                         shingle_n=5, **kw)
    # a WIDER stored frame banded at a narrower num_hashes is allowed
    # (prefix reuse): the affine consts are index-deterministic, so
    # mh_0..mh_3 of a 8-wide frame ARE the num_hashes=4 signatures —
    # results byte-identical to signatures built at 4
    kw4 = dict(num_hashes=4, bands=2, threshold=0.5)
    prefix_pairs = {tuple(r) for r in
                    minhash_lsh_join(new, seen, right_signatures=stored,
                                     **kw4).collect()}
    native4 = {tuple(r) for r in
               minhash_lsh_join(new, seen, **kw4).collect()}
    assert prefix_pairs == native4 and len(native4) > 0
    # ... but a NARROWER stored frame than asked still fails (the
    # column check catches an unstamped one; the stamp names it too)
    with pytest.raises(ValueError, match="missing columns|conflict"):
        minhash_lsh_join(new, seen, right_signatures=stored,
                         num_hashes=16, bands=4, threshold=0.5)
    # a pre-stamp legacy frame (metadata stripped) passes on the
    # caller's word, as before
    legacy = stored.withMetadata("mh_0", {})
    assert minhash_signature_params(legacy) is None
    legacy_pairs = {tuple(r) for r in
                    minhash_lsh_join(new, seen, right_signatures=legacy,
                                     **kw).collect()}
    assert legacy_pairs == from_table


def test_incremental_dedup_invariant_any_batching(spark, sf_dir, tmp_path):
    """Incremental dedup over id-ordered batches must equal the global
    one-shot result regardless of how the corpus is batched."""
    from etl_router_spark.functions.dedup import (
        minhash_lsh_join,
        minhash_lsh_pairs,
        minhash_signatures,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(F.col("doc_id") < 300)

    def incremental(cuts, tag):
        sig_paths, dropped = [], set()
        for i, (lo, hi) in enumerate(cuts):
            batch = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            p = str(tmp_path / tag / f"b{i}")
            minhash_signatures(batch, num_hashes=8).write.parquet(p)
            sig_b = spark.read.parquet(p)
            ids = {r["id_b"] for r in
                   minhash_lsh_pairs(batch, num_hashes=8, bands=4, threshold=0.5)
                   .select("id_b").collect()}
            if sig_paths:
                prior = spark.read.parquet(*sig_paths)
                ids |= {r["id_left"] for r in
                        minhash_lsh_join(batch, batch, num_hashes=8, bands=4,
                                         threshold=0.5, left_signatures=sig_b,
                                         right_signatures=prior)
                        .select("id_left").collect()}
            dropped |= ids
            sig_paths.append(p)
        return dropped

    one_shot = {r["id_b"] for r in
                minhash_lsh_pairs(docs, num_hashes=8, bands=4, threshold=0.5)
                .select("id_b").collect()}
    assert incremental([(0, 300)], "one") == one_shot
    assert incremental([(0, 150), (150, 300)], "two") == one_shot
    assert incremental([(0, 100), (100, 200), (200, 300)], "three") == one_shot
    assert len(one_shot) > 0


def test_text_normalize_flags(spark):
    from etl_router_spark.functions.text import normalize_text

    df = spark.createDataFrame([(1, "  Héllo,   WORLD!!  42  ")], ["doc_id", "text"])
    full = normalize_text(df, strip_non_alnum=True).collect()[0]["text_norm"]
    assert full == "h llo world 42"
    keep_punct = normalize_text(df).collect()[0]["text_norm"]
    assert keep_punct == "héllo, world!! 42"
    no_lower = normalize_text(df, lowercase=False, strip_non_alnum=True
                              ).collect()[0]["text_norm"]
    assert no_lower == "H llo WORLD 42"


def test_text_normalize_manifest(spark, tmp_path):
    src = str(tmp_path / "d")
    spark.createDataFrame([(1, "A  B!")], ["doc_id", "text"]).write.parquet(src)
    out = _run(spark, src,
               {"transform_type": "text_normalize", "strip_non_alnum": True},
               str(tmp_path / "o"))
    assert out.collect()[0]["text_norm"] == "a b"


def test_round4_example_manifests_compile(spark, tmp_path):
    """The new example manifests must parse, validate and compile
    end-to-end against local fixture data."""
    import yaml

    from etl_router_spark.model.parser import parse_manifest_dict

    docs = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "dup\nkeep a"), (2, "dup\nkeep b")], ["doc_id", "text"]
    ).write.parquet(docs)
    emb = str(tmp_path / "emb")
    spark.createDataFrame([(1, [3.0, 4.0])], ["vec_id", "embedding"]).write.parquet(emb)

    for name, src, sink_key in [
        ("boilerplate-clean.yaml", docs, "cleaned"),
        ("embedding-prep.yaml", emb, "serving_table"),
    ]:
        with open(f"examples/manifests/{name}") as fh:
            doc = yaml.safe_load(fh)
        doc["spec"]["stages"][0]["config"]["path"] = src
        doc["spec"]["stages"][-1]["config"]["path"] = str(tmp_path / f"out_{name}")
        for st in doc["spec"]["stages"]:
            if st["config"].get("transform_type") == "hash_sample":
                st["config"]["rate"] = 1.0  # 2-row fixture: keep everything
            if st["config"].get("transform_type") == "embedding_pca_project":
                # the example references a persisted pca_train model;
                # supply one matching the 2-dim fixture vectors
                import json

                mpath = str(tmp_path / "pca.json")
                with open(mpath, "w") as mfh:
                    json.dump({"mean": [0.0, 0.0],
                               "components": [[0.6, 0.8]]}, mfh)
                st["config"]["components"] = mpath
        frames = compile_pipeline(spark, parse_manifest_dict(doc)).sink_frames
        assert frames[sink_key].count() >= 1


def test_rerank_stage_occupancy_guard_manifest_key(spark, tmp_path):
    """The r11 verdict ask: ``occupancy_guard`` is a first-class rerank
    stage key, not API-only — a manifest can declare the enforcement
    mode. 'error' on a one-cell (tight) corpus fails the compile with
    the measured-collapse message; the DEFAULT stays lazy (hints, no
    measurement job, no raise)."""
    import warnings

    rows = [(i, [float(i == 0)] * 8) for i in range(40)]
    src = str(tmp_path / "tight")
    spark.createDataFrame(rows, "vec_id long, embedding array<double>") \
        .write.parquet(src)
    cfg = {"transform_type": "pq_topk", "dim": 8, "k": 3,
           "nprobe": 2, "shortlist": 5,
           "query_condition": {"type": "field_lt", "key": "vec_id",
                               "value": 2}}
    from etl_router_spark.functions import pq as pqmod

    pqmod._OCCUPANCY_CACHE.clear()
    # default first (an error-mode run would memoize the histogram and
    # hand the default a free hit — the production cold path has none)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = _run(spark, src, cfg, str(tmp_path / "o2"))
    assert [w for w in caught if "occupancy unknown" in str(w.message)]
    assert not [w for w in caught
                if "p95 IVF cell occupancy" in str(w.message)]
    assert out.count() > 0
    with pytest.raises(ValueError, match="p95 IVF cell occupancy"):
        _run(spark, src, {**cfg, "occupancy_guard": "error"},
             str(tmp_path / "o1"))
    pqmod._OCCUPANCY_CACHE.clear()
    with pytest.raises(ValueError, match="occupancy_guard must be"):
        _run(spark, src, {**cfg, "occupancy_guard": "loud"},
             str(tmp_path / "o3"))


def test_quantized_ann_recall_at_10(spark, sf_dir):
    """int8 quantization must preserve ANN quality: top-10 neighbors
    computed on dequantized vectors recall >= 0.9 of the exact float
    top-10 (max reconstruction error is scale/2 per coordinate)."""
    from etl_router_spark.functions.embedding import dequantize_int8, quantize_int8
    from etl_router_spark.functions.similarity import brute_force_topk
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)

    exact = brute_force_topk(queries, emb, k=10)
    deq = dequantize_int8(quantize_int8(emb)).select(
        "vec_id", F.col("embedding_deq").alias("embedding"))
    approx = brute_force_topk(deq.filter(F.col("vec_id") < 20), deq, k=10)

    def neighbors(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    e, a = neighbors(exact), neighbors(approx)
    assert set(e) == set(a)
    recalls = [len(e[q] & a[q]) / len(e[q]) for q in e]
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_line_dedup_matches_reference_simulation_random_corpora(spark):
    """Randomized cross-check: line_dedup against a pure-Python
    first-global-occurrence simulation over random corpora with heavy
    line collisions."""
    import random

    from etl_router_spark.functions.corpus import line_dedup

    vocab = ["alpha beta", "gamma delta", "epsilon zeta", "eta theta", "iota kappa"]
    for seed in (7, 23):
        rng = random.Random(seed)
        rows = []
        for doc_id in range(30):
            n = rng.randint(0, 5)
            rows.append((doc_id, "\n".join(rng.choice(vocab) for _ in range(n))))
        docs = spark.createDataFrame(rows, ["doc_id", "text"])

        seen, expected = set(), {}
        for doc_id, text in rows:
            kept = []
            total = 0
            for line in text.split("\n"):
                if not line.strip():
                    continue
                total += 1
                key = " ".join(line.lower().split())
                if key not in seen:
                    seen.add(key)
                    kept.append(line)
            expected[doc_id] = (total, len(kept), "\n".join(kept))

        got = {r["doc_id"]: (r["n_lines"], r["n_lines_kept"], r["text_deduped"])
               for r in line_dedup(docs).collect()}
        assert got == expected, f"seed={seed}"


def test_embedding_lsh_pairs_subset_of_exact_with_high_recall(spark, sf_dir):
    """LSH pairs are a subset of the exact cosine pairs (precision is
    exact — cosine filters candidates) and recall the bulk of them at
    these bucket settings."""
    from etl_router_spark.functions.dedup import embedding_cosine_pairs, embedding_lsh_pairs
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(F.col("vec_id") < 300)
    exact = {(r["id_a"], r["id_b"]) for r in
             embedding_cosine_pairs(emb, threshold=0.38, method="block",
                                    num_blocks=4).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in
           embedding_lsh_pairs(emb, dim=64, threshold=0.38, planes=3,
                               tables=4).collect()}
    assert lsh <= exact
    assert len(exact) > 0 and len(lsh) / len(exact) >= 0.5


def test_dedup_embedding_lsh_manifest(spark, sf_dir, tmp_path):
    out = _run(spark, f"{sf_dir}/embeddings.parquet",
               {"transform_type": "dedup_embedding", "method": "lsh", "dim": 64,
                "threshold": 0.38, "planes": 3, "tables": 4},
               str(tmp_path / "o"))
    assert {"id_a", "id_b", "cosine"} <= set(out.columns)
    assert out.filter("id_a >= id_b").count() == 0 and out.count() > 0


class TestNormalizeUrl:
    def test_known_canonical_forms(self, spark):
        from pyspark.sql import functions as F

        from etl_router_spark.functions.text import normalize_url

        cases = [
            ("HTTP://WWW.Example.com:80/a/b/?b=2&a=1#frag", "example.com/a/b?a=1&b=2"),
            ("https://example.com/a/b", "example.com/a/b"),
            ("example.com///", "example.com"),
            ("https://example.com:443/?utm_source=x&gclid=1&q=k", "example.com?q=k"),
            ("https://example.com/#only-frag", "example.com"),
            ("https://sub.example.com:8080/p", "sub.example.com:8080/p"),
            ("ftp://example.com/f", "example.com/f"),
        ]
        df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
        got = [r[0] for r in df.select(normalize_url(F.col("url"))).collect()]
        assert got == [want for _, want in cases]

    def test_variants_collapse(self, spark):
        from pyspark.sql import functions as F

        from etl_router_spark.functions.text import normalize_url

        variants = [
            "http://example.com/p?a=1&b=2",
            "https://www.example.com/p/?b=2&a=1",
            "HTTPS://EXAMPLE.COM:443/p?a=1&b=2&utm_campaign=z",
        ]
        df = spark.createDataFrame([(u,) for u in variants], "url string")
        assert (
            df.select(normalize_url(F.col("url")).alias("n")).distinct().count() == 1
        )


class TestAdaptiveQualityFilter:
    def test_per_group_quartile_cut(self, spark):
        from etl_router_spark.functions.corpus import adaptive_quality_filter

        rows = [("a", i, float(i)) for i in range(1, 10)]  # 1..9, p25 = 3.0
        rows += [("b", i, float(100 + i)) for i in range(1, 5)]  # p25 = 101.75
        df = spark.createDataFrame(rows, "grp string, id int, score double")
        kept = adaptive_quality_filter(df, "score", "grp", quantile=0.25)
        got = {(r["grp"], r["id"]) for r in kept.collect()}
        assert got == {("a", i) for i in range(3, 10)} | {("b", i) for i in (2, 3, 4)}

    def test_threshold_round_snaps_boundary(self, spark):
        from etl_router_spark.functions.corpus import adaptive_quality_filter

        df = spark.createDataFrame(
            [("g", 0.1000004), ("g", 0.2), ("g", 0.3)], "grp string, score double"
        )
        # p25 of (0.1000004, 0.2, 0.3) = 0.1500003; rounded to 1 decimal
        # the threshold snaps to 0.2 -> 0.1000004 is dropped either way,
        # but 0.2 must survive the rounded comparison exactly
        kept = adaptive_quality_filter(
            df, "score", "grp", quantile=0.25, threshold_round=1
        )
        assert sorted(r["score"] for r in kept.collect()) == [0.2, 0.3]


class TestUrlNormalizePropertyVsOracle:
    def test_randomized_urls_match_duckdb(self, spark):
        """Randomized URL components cross-checked against the DuckDB
        twin — pins Java-regex vs RE2 dialect agreement beyond the
        fixture's variant classes."""
        import random

        import duckdb
        from pyspark.sql import functions as F

        from etl_router_spark.functions.text import (
            normalize_url,
            normalize_url_oracle_sql,
        )

        rng = random.Random(20260814)
        schemes = ["http://", "https://", "HTTP://", "ftp://", ""]
        hosts = ["Example.com", "www.Example.com", "sub.ex-ample.org",
                 "EXAMPLE.COM:443", "example.com:80", "example.com:8080"]
        paths = ["", "/", "/a", "/a/b/", "/A/B//", "/p%20q"]
        queries = ["", "?a=1", "?b=2&a=1", "?utm_source=x", "?a=1&utm_x=2&gclid=3",
                   "?z=9&y=8&x=7", "?a=&b"]
        frags = ["", "#f", "#a/b?c=1"]
        urls = [
            rng.choice(schemes) + rng.choice(hosts) + rng.choice(paths)
            + rng.choice(queries) + rng.choice(frags)
            for _ in range(300)
        ]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        got = [r[0] for r in df.select(normalize_url(F.col("url"))).collect()]
        con = duckdb.connect()
        con.execute("CREATE TABLE t(url VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?)", [(u,) for u in urls])
        want = [
            r[0]
            for r in con.execute(
                f"SELECT {normalize_url_oracle_sql('url')} FROM t"
            ).fetchall()
        ]
        assert got == want


class TestChunkBySentences:
    def test_chunks_split_on_cumulative_length(self, spark):
        from etl_router_spark.functions.corpus import chunk_by_sentences

        text = "Aaaa bbbb. Cccc dddd! Eeee ffff? Gggg hhhh."
        df = spark.createDataFrame([(1, text)], "doc_id int, text string")
        # sentences of 10/10/10/10 chars; max_chars=25 ->
        # chars_before = 0,10,20,30 -> chunks 0,0,0,1
        rows = {r["chunk_id"]: r for r in
                chunk_by_sentences(df, max_chars=25).collect()}
        assert rows[0]["chunk_text"] == "Aaaa bbbb. Cccc dddd! Eeee ffff?"
        assert rows[0]["n_sentences"] == 3
        assert rows[1]["chunk_text"] == "Gggg hhhh."
        assert rows[1]["n_sentences"] == 1

    def test_single_sentence_doc_one_chunk(self, spark):
        from etl_router_spark.functions.corpus import chunk_by_sentences

        df = spark.createDataFrame(
            [(1, "no terminal punctuation at all")], "doc_id int, text string"
        )
        out = chunk_by_sentences(df, max_chars=5).collect()
        assert len(out) == 1 and out[0]["chunk_id"] == 0


class TestUpsertSink:
    def test_upsert_merges_and_tombstones(self, spark, tmp_path):
        from etl_router_spark.sinks.registry import write_sink

        target = str(tmp_path / "state")
        snap = spark.createDataFrame(
            [(1, "a", 1), (2, "b", 1), (3, "c", 1)], "k int, v string, ver int"
        )
        write_sink(snap, {"sink_type": "file", "mode": "upsert", "path": target,
                          "merge_keys": ["k"], "order_by": ["ver"]})
        upd = spark.createDataFrame(
            [(2, "b2", 2, "upsert"), (3, "c", 2, "delete"),
             (4, "d", 2, "upsert"),
             (4, "d3", 3, "upsert")],  # same key twice: latest ver wins
            "k int, v string, ver int, op string",
        )
        write_sink(upd, {"sink_type": "file", "mode": "upsert", "path": target,
                         "merge_keys": ["k"], "order_by": ["ver"],
                         "op_col": "op"})
        got = {(r["k"], r["v"]) for r in spark.read.parquet(target).collect()}
        assert got == {(1, "a"), (2, "b2"), (4, "d3")}

    def test_upsert_requires_keys(self, spark, tmp_path):
        import pytest as _pt

        from etl_router_spark.sinks.registry import write_sink

        df = spark.createDataFrame([(1, "a")], "k int, v string")
        with _pt.raises(ValueError):
            write_sink(df, {"sink_type": "file", "mode": "upsert",
                            "path": str(tmp_path / "x")})


class TestQualityBuckets:
    def test_tertile_assignment(self, spark):
        from etl_router_spark.functions.corpus import quality_buckets

        rows = [("g", i, float(i)) for i in range(1, 10)]  # 1..9
        df = spark.createDataFrame(rows, "grp string, id int, score double")
        out = {r["id"]: r["bucket"]
               for r in quality_buckets(df, "score", "grp",
                                        labels=("tail", "middle", "head")).collect()}
        # t1 = quantile(1/3) of 1..9 = 3.667, t2 = 6.333
        assert [out[i] for i in range(1, 10)] == (
            ["tail"] * 3 + ["middle"] * 3 + ["head"] * 3)

    def test_label_arity_checked(self, spark):
        import pytest as _pt

        from etl_router_spark.functions.corpus import quality_buckets

        df = spark.createDataFrame([("g", 1.0)], "grp string, score double")
        with _pt.raises(ValueError):
            quality_buckets(df, "score", "grp", labels=("only", "two", "x", "y"))


def test_web_curation_manifest_compiles(spark, tmp_path):
    """examples/manifests/web-curation.yaml (url canonicalization ->
    unigram LM -> CCNet buckets -> quartile filter) runs end to end:
    the unigram stage passes input columns through, so the chained
    group fields survive."""
    import yaml

    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict

    docs = str(tmp_path / "web")
    spark.createDataFrame(
        [(i, f"https://www.Site{i % 2}.com/p{i}?utm_source=x",
          f"s{i % 2}", "alpha beta gamma " * (1 + (i // 2) % 4) + "delta")
         for i in range(16)],
        "doc_id long, url string, source string, text string",
    ).write.parquet(docs)

    with open("examples/manifests/web-curation.yaml") as fh:
        doc = yaml.safe_load(fh)
    doc["spec"]["stages"][0]["config"]["path"] = docs
    doc["spec"]["stages"][-1]["config"]["path"] = str(tmp_path / "curated")
    frames = compile_pipeline(spark, parse_manifest_dict(doc)).sink_frames
    out = frames["curated"]
    assert {"doc_id", "url_norm", "source", "avg_logprob", "bucket"} <= set(out.columns)
    n = out.count()
    assert 0 < n < 16  # quartile filter dropped each source's tail
    assert out.filter(~out.url_norm.contains("utm_")).count() == n


class TestEditDistancePairs:
    def test_known_pairs_and_distances(self, spark):
        from etl_router_spark.functions.dedup import edit_distance_pairs

        rows = [(1, "kitten"), (2, "sitten"), (3, "sittin"),
                (4, "mittens"), (5, "banana")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {(r["id_a"], r["id_b"]): r["distance"]
               for r in edit_distance_pairs(df, max_distance=2).collect()}
        # kitten~sitten 1, sitten~sittin 1, kitten~sittin 2,
        # sitten~mittens 2, kitten~mittens 2; banana far from all,
        # levenshtein(sittin, mittens) = 3 -> excluded
        assert got == {(1, 2): 1, (2, 3): 1, (1, 3): 2, (2, 4): 2, (1, 4): 2}

    def test_matches_brute_force_random(self, spark):
        import random

        from pyspark.sql import functions as F

        from etl_router_spark.functions.dedup import edit_distance_pairs

        rng = random.Random(7)
        alphabet = "abcd"
        strs = ["".join(rng.choices(alphabet, k=rng.randint(4, 9)))
                for _ in range(80)]
        df = spark.createDataFrame(list(enumerate(strs)), "doc_id long, text string")
        got = {(r["id_a"], r["id_b"], r["distance"])
               for r in edit_distance_pairs(df, max_distance=2).collect()}
        a, b = df.alias("a"), df.alias("b")
        brute = {
            (r["id_a"], r["id_b"], r["distance"])
            for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("id_a"),
                    F.col("b.doc_id").alias("id_b"),
                    F.levenshtein("a.text", "b.text").cast("bigint").alias("distance"))
            .filter(F.col("distance") <= 2).collect()
        }
        assert got == brute  # blocking is lossless


class TestMeanPool:
    def test_pooled_vector_exact(self, spark):
        from etl_router_spark.functions.embedding import mean_pool

        df = spark.createDataFrame(
            [("a", [1.0, 2.0, 3.0]), ("a", [3.0, 4.0, 7.0]), ("b", [5.0, 5.0, 5.0])],
            "label string, embedding array<double>",
        )
        got = {r["label"]: r["embedding_mean"]
               for r in mean_pool(df, "label").collect()}
        assert got["a"] == [2.0, 3.0, 5.0]
        assert got["b"] == [5.0, 5.0, 5.0]


class TestProfileHistogram:
    def test_bins_cover_and_close_top(self, spark):
        from etl_router_spark.functions.profile import profile_histogram

        df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
        rows = {r["bin"]: r for r in profile_histogram(df, "x", bins=10).collect()}
        assert sum(r["n"] for r in rows.values()) == 100
        assert rows[9]["n"] == 10 + 1 - 1  # 90..99 -> top bin holds max
        assert rows[0]["lo"] == 0.0 and rows[9]["hi"] == 99.0

    def test_constant_column_single_bin(self, spark):
        from etl_router_spark.functions.profile import profile_histogram

        df = spark.createDataFrame([(7.0,), (7.0,), (None,)], "x double")
        rows = profile_histogram(df, "x", bins=5).collect()
        assert len(rows) == 1 and rows[0]["bin"] == 0 and rows[0]["n"] == 2


def test_hybrid_search_manifest_compiles(spark, tmp_path):
    """examples/manifests/hybrid-search.yaml: sentence chunking ->
    chunk-id mapping -> BM25 against a query source, end to end."""
    import yaml

    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict

    docs = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, "alpha beta gamma. delta epsilon zeta! eta theta iota.")
         for i in range(6)],
        "doc_id long, text string",
    ).write.parquet(docs)
    queries = str(tmp_path / "queries")
    spark.createDataFrame(
        [(1, "alpha beta"), (2, "eta theta")],
        "query_id long, query_text string",
    ).write.parquet(queries)

    with open("examples/manifests/hybrid-search.yaml") as fh:
        doc = yaml.safe_load(fh)
    doc["spec"]["stages"][0]["config"]["path"] = docs
    doc["spec"]["stages"][3]["config"]["queries"]["path"] = queries
    doc["spec"]["stages"][-1]["config"]["path"] = str(tmp_path / "ranked")
    frames = compile_pipeline(spark, parse_manifest_dict(doc)).sink_frames
    out = frames["rankings"]
    assert set(out.columns) == {"query_id", "rank", "doc_id", "score"}
    assert out.filter("rank = 1").count() == 2  # both queries ranked


def test_embedding_mean_pool_manifest(spark, sf_dir, tmp_path):
    out = _run(spark, f"{sf_dir}/embeddings.parquet",
               {"transform_type": "embedding_mean_pool",
                "group_field": "label"}, str(tmp_path / "o"))
    rows = out.collect()
    assert {len(r.embedding_mean) for r in rows} == {64}
    assert len(rows) == out.select("label").distinct().count()


def test_embedding_pca_project_manifest(spark, sf_dir, tmp_path):
    import json

    import numpy as np

    # model file path form: persist a pca_train result, reference it
    from etl_router_spark.functions.embedding import pca_train

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = pca_train(emb.limit(100), k=3)
    mpath = str(tmp_path / "pca.json")
    with open(mpath, "w") as fh:
        json.dump(model, fh)
    out = _run(spark, f"{sf_dir}/embeddings.parquet",
               {"transform_type": "embedding_pca_project",
                "components": mpath}, str(tmp_path / "o"))
    rows = out.limit(5).collect()
    assert all(len(r.pca) == 3 for r in rows)
    # inline matrix form
    out2 = _run(spark, f"{sf_dir}/embeddings.parquet",
                {"transform_type": "embedding_pca_project",
                 "components": [[1.0] + [0.0] * 63]}, str(tmp_path / "o2"))
    r = out2.limit(1).collect()[0]
    assert np.isclose(r.pca[0], float(r.embedding[0]), atol=1e-7)


def test_bpe_tokenize_manifest(spark, sf_dir, tmp_path):
    import json

    from etl_router_spark.functions.text import bpe_train

    docs = f"{sf_dir}/documents.parquet"
    merges = bpe_train(spark.read.parquet(docs), num_merges=10)
    mpath = str(tmp_path / "merges.json")
    with open(mpath, "w") as fh:
        json.dump(merges, fh)
    out = _run(spark, docs,
               {"transform_type": "bpe_tokenize", "merges": mpath},
               str(tmp_path / "o"))
    rows = out.limit(5).collect()
    assert all(r.bpe_tokens_n == len(r.bpe_tokens) > 0 for r in rows)


def test_dedup_manifest_candidate_budget(spark, sf_dir, tmp_path):
    """max_candidates flows from the YAML stage config into the
    operator's pre-flight budget: a saturated corpus fails fast at
    compile-run time instead of launching the quadratic pair shuffle."""
    from etl_router_spark.functions.dedup import CandidateBudgetExceeded

    with pytest.raises(CandidateBudgetExceeded, match="minhash_lsh_pairs"):
        _run(spark, f"{sf_dir}/documents.parquet",
             {"transform_type": "dedup_minhash", "num_hashes": 8,
              "bands": 4, "threshold": 0.5, "max_candidates": 1},
             str(tmp_path / "o"))


class TestSemanticDedup:
    def _corpus(self, spark):
        import random

        rng = random.Random(11)
        base = [[rng.gauss(0, 1) for _ in range(8)] for _ in range(12)]
        rows = [(i, v) for i, v in enumerate(base)]
        # plant near-dups of vec 3 and vec 7 (scaled copies: cosine = 1)
        rows += [(100, [x * 2.0 for x in base[3]]),
                 (101, [x * 0.5 for x in base[3]]),
                 (102, [x * 3.0 for x in base[7]])]
        return spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>")

    def test_keeps_lowest_id_representative(self, spark):
        from etl_router_spark.functions.dedup import semantic_dedup

        df = self._corpus(spark)
        out = semantic_dedup(df, threshold=0.999, n_cells=4)
        kept = {r.vec_id for r in out.select("vec_id").collect()}
        # exact copies land in the same cell; lowest id survives
        assert 3 in kept and 7 in kept
        assert kept.isdisjoint({100, 101, 102})
        # singletons untouched; cell column attached
        assert {0, 1, 2} <= kept and "cell" in out.columns

    def test_candidate_budget(self, spark):
        from etl_router_spark.functions.dedup import (
            CandidateBudgetExceeded,
            semantic_dedup,
        )

        df = self._corpus(spark)
        with pytest.raises(CandidateBudgetExceeded, match="semantic_dedup"):
            semantic_dedup(df, threshold=0.999, n_cells=2, max_candidates=3)

    def test_manifest_method_semantic(self, spark, sf_dir, tmp_path):
        out = _run(spark, f"{sf_dir}/embeddings.parquet",
                   {"transform_type": "dedup_embedding", "method": "semantic",
                    "threshold": 0.3, "n_cells": 8},
                   str(tmp_path / "o"))
        assert "cell" in out.columns
        n_in = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
        assert 0 < out.count() < n_in

    def test_auto_cells(self, spark):
        from etl_router_spark.functions.dedup import semantic_dedup

        df = self._corpus(spark)  # 15 rows
        # target_occupancy 4 -> ceil(15/4) = 4 cells, same as explicit
        auto = semantic_dedup(df, threshold=0.999, n_cells="auto",
                              target_occupancy=4)
        explicit = semantic_dedup(df, threshold=0.999, n_cells=4)
        assert sorted(r.vec_id for r in auto.collect()) == \
            sorted(r.vec_id for r in explicit.collect())
        with pytest.raises(ValueError, match="n_cells"):
            semantic_dedup(df, n_cells="all")

    def test_empty_standin_centroids_raise(self, spark):
        from pyspark.sql import functions as F

        from etl_router_spark.functions.dedup import semantic_dedup

        df = self._corpus(spark).withColumn(
            "vec_id", F.col("vec_id") + 5000)
        with pytest.raises(ValueError, match="centroids"):
            semantic_dedup(df, threshold=0.999, n_cells=4)
        # explicit centroids make shifted id spaces work
        cents = [(i, v) for i, (j, v) in enumerate(
            sorted((r.vec_id, list(r.embedding))
                   for r in df.limit(4).collect()))]
        out = semantic_dedup(df, threshold=0.999, n_cells=4,
                             centroids=cents)
        assert out.count() < df.count()  # planted dups still pruned


def test_dedup_at_scale_example_manifest(spark, sf_dir, tmp_path):
    """examples/manifests/dedup-at-scale.yaml — the '100 TB defaults'
    template (spec.limits + n_cells: auto + planes: auto) must parse,
    compile, and produce both sink frames end-to-end; the semantic
    branch keeps a strict subset and the pair branch emits id pairs."""
    import yaml

    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict

    with open("examples/manifests/dedup-at-scale.yaml") as fh:
        doc = yaml.safe_load(fh)
    doc["spec"]["stages"][0]["config"]["path"] = f"{sf_dir}/embeddings.parquet"
    for st in doc["spec"]["stages"]:
        if st["type"] == "sink":
            st["config"]["path"] = str(tmp_path / st["id"])
    pipeline = parse_manifest_dict(doc)
    # the declared DAG is a two-branch fan-out: BOTH branches hang off
    # the source (pre-r11 the parser ignored depends_on and chained
    # sequentially, so the LSH branch silently ran over the semantic
    # branch's survivors instead of the corpus)
    assert {e.from_stage for e in pipeline.incoming("lsh_pairs")} == {
        "embeddings"}
    assert {e.from_stage for e in pipeline.incoming("semantic_kept")} == {
        "embeddings"}
    frames = compile_pipeline(spark, pipeline).sink_frames
    n_in = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    kept = frames["kept_out"]
    assert 0 < kept.count() <= n_in and "cell" in kept.columns
    assert {"id_a", "id_b"} <= set(frames["pairs_out"].columns)


def test_semantic_dedup_whole_cell_contract_beyond_old_salt_cap(spark):
    """The operator's contract — drop EVERY row with a smaller-id
    same-cell neighbor at cosine >= threshold — must hold even when a
    cell exceeds the pair machinery's default salting cap (512), which
    is why semantic_dedup defaults salt_cap=None: cosine is not
    transitive, so sub-bucket salting would silently keep rows whose
    only smaller-id neighbor hashed elsewhere."""
    from etl_router_spark.functions.dedup import semantic_dedup

    # 600 scaled copies of one vector (cosine 1.0 pairwise) + a far
    # anchor at id 0 so two stand-in centroids split the space and the
    # copies land in ONE cell of 600 > 512 members
    rows = [(0, [100.0, 0.0, 0.0, 0.0])]
    rows += [(i, [0.1 * (1 + i % 7), 0.0, 0.0, 0.1 * (1 + i % 7)])
             for i in range(1, 601)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    kept = sorted(r.vec_id for r in
                  semantic_dedup(df, threshold=0.999, n_cells=2).collect())
    assert kept == [0, 1]  # one representative per cell, nothing leaks


class TestMinhashIncrementalIndex:
    def test_index_probe_drops_near_dups_keeps_unique(self, spark, tmp_path):
        from etl_router_spark.functions.dedup import (
            dedup_against_minhash_index,
            minhash_index,
        )

        base = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away into the deep green forest tonight")
        corpus = spark.createDataFrame(
            [(1, base), (2, "completely different words about spark "
                            "partitions and shuffles at massive scale")],
            "doc_id long, text string")
        idx_path = str(tmp_path / "idx")
        minhash_index(corpus, num_hashes=8, bands=4).write.parquet(idx_path)
        batch = spark.createDataFrame(
            [(10, base + " extra"),          # near-dup of doc 1
             (11, "entirely novel content with no overlapping shingles "
                  "whatsoever in any window of three tokens")],
            "doc_id long, text string")
        kept = dedup_against_minhash_index(
            batch, spark.read.parquet(idx_path), num_hashes=8, bands=4,
            threshold=0.5)
        assert [r.doc_id for r in kept.collect()] == [11]

    def test_index_layout_matches_pair_operator(self, spark):
        """One band-key definition: ids that minhash_lsh_pairs pairs up
        must also collide index-vs-probe (and vice versa for clean
        separations) — the desync guard for the shared helper."""
        from etl_router_spark.functions.dedup import (
            dedup_against_minhash_index,
            minhash_index,
            minhash_lsh_pairs,
        )

        docs = spark.createDataFrame(
            [(i, f"shared prefix tokens run along here marker{i} "
                 "and the long common tail keeps jaccard high for pairs")
             for i in range(6)],
            "doc_id long, text string")
        pairs = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(
            docs, num_hashes=8, bands=4, threshold=0.5).collect()}
        idx = minhash_index(docs.filter("doc_id < 3"), num_hashes=8, bands=4)
        kept = {r.doc_id for r in dedup_against_minhash_index(
            docs.filter("doc_id >= 3"), idx, num_hashes=8, bands=4,
            threshold=0.5).collect()}
        dropped = {4, 5, 3} - kept
        paired_with_index = {b for (a, b) in pairs if a < 3 and b >= 3} | {
            a for (a, b) in pairs if b < 3 and a >= 3}
        assert dropped == paired_with_index

    def test_mismatched_index_width_fails_fast(self, spark):
        """A minhash_index frame carries its build parameters as
        column metadata, so ANY probe mismatch — including the
        bands/shingle_n kinds whose band keys simply never collide
        and used to pass everything through silently — raises
        DRIVER-SIDE before a job launches (r11 advisor). An index
        stripped of its metadata (legacy artifact) still gets the
        in-task signature-width guard for num_hashes."""
        import pytest as _pytest

        from etl_router_spark.functions.dedup import (
            dedup_against_minhash_index,
            minhash_index,
        )

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta eta theta")],
            "doc_id long, text string")
        idx = minhash_index(docs, num_hashes=16, bands=4)
        with _pytest.raises(ValueError,
                            match="conflict with the index"):
            dedup_against_minhash_index(docs, idx, num_hashes=8, bands=4)
        # the silent killers: same num_hashes, different banding or
        # shingling — zero collisions, no in-task guard could fire
        with _pytest.raises(ValueError, match="bands=8"):
            dedup_against_minhash_index(docs, idx, num_hashes=16, bands=8)
        with _pytest.raises(ValueError, match="shingle_n=5"):
            dedup_against_minhash_index(docs, idx, num_hashes=16, bands=4,
                                        shingle_n=5)
        # legacy (metadata-free) index: in-task width guard still fires
        legacy = idx.withMetadata("sig", {})
        from etl_router_spark.functions.dedup import minhash_index_params

        assert minhash_index_params(legacy) is None
        with _pytest.raises(Exception, match="signature width"):
            dedup_against_minhash_index(
                docs, legacy, num_hashes=8, bands=4).collect()


def test_dedup_index_manifests(spark, tmp_path):
    """dedup_index_build -> file sink, then dedup_index_probe reading
    that index back — the nightly-dedup pair of manifests."""
    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict

    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep green forest tonight")
    corpus_path = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(1, base), (2, "unrelated text about catalyst optimizer rules "
                        "and adaptive query execution behavior")],
        "doc_id long, text string").write.parquet(corpus_path)
    idx_path = str(tmp_path / "index")
    build = {"apiVersion": "etl.dev/v1", "kind": "Pipeline",
             "metadata": {"name": "idx-build"},
             "spec": {"stages": [
                 {"id": "s", "type": "source",
                  "config": {"source_type": "file", "format": "parquet",
                             "path": corpus_path}},
                 {"id": "t", "type": "transform",
                  "config": {"transform_type": "dedup_index_build",
                             "num_hashes": 8, "bands": 4}},
                 {"id": "o", "type": "sink",
                  "config": {"sink_type": "file", "format": "parquet",
                             "path": idx_path}}]}}
    compile_pipeline(spark, parse_manifest_dict(build)).run()

    batch_path = str(tmp_path / "batch")
    spark.createDataFrame(
        [(10, base + " postscript"), (11, "fresh novel never seen words "
         "forming windows that match nothing indexed anywhere")],
        "doc_id long, text string").write.parquet(batch_path)
    probe = {"apiVersion": "etl.dev/v1", "kind": "Pipeline",
             "metadata": {"name": "idx-probe"},
             "spec": {"stages": [
                 {"id": "s", "type": "source",
                  "config": {"source_type": "file", "format": "parquet",
                             "path": batch_path}},
                 {"id": "t", "type": "transform",
                  "config": {"transform_type": "dedup_index_probe",
                             "index_path": idx_path,
                             "num_hashes": 8, "bands": 4,
                             "threshold": 0.5}},
                 {"id": "o", "type": "sink",
                  "config": {"sink_type": "file", "format": "parquet",
                             "path": str(tmp_path / "kept")}}]}}
    compile_pipeline(spark, parse_manifest_dict(probe)).run()
    kept = spark.read.parquet(str(tmp_path / "kept"))
    assert [r.doc_id for r in kept.collect()] == [11]


def test_training_data_release_manifest(spark, sf_dir, tmp_path):
    """examples/manifests/training-data-release.yaml end to end: the
    full release chain (gopher gate -> canonical dedup -> Bloom
    decontamination -> fuzzy decontamination -> leakage-safe splits ->
    epoch upsampling) over the documents fixture with a DISJOINT
    staged benchmark, asserting each stage's contract on the
    surviving rows."""
    import yaml

    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict

    bench_path = str(tmp_path / "bench")
    spark.createDataFrame(
        [(900001, "benchmark only eval question tokens alpha beta "
                  "gamma delta epsilon")],
        ["doc_id", "text"]).write.parquet(bench_path)

    with open("examples/manifests/training-data-release.yaml") as fh:
        doc = yaml.safe_load(fh)
    doc["spec"]["stages"][0]["config"]["path"] = (
        f"{sf_dir}/documents.parquet")
    for st in doc["spec"]["stages"]:
        cfg = st["config"]
        if cfg.get("transform_type") == "bloom_decontaminate":
            cfg["benchmark"]["path"] = bench_path
            cfg["m_bits"] = 1 << 16
        if cfg.get("transform_type") == "decontaminate_fuzzy":
            cfg["benchmark"]["path"] = bench_path
        if cfg.get("transform_type") == "epoch_upsample":
            # fixture sources are src0..src19; budget sized so the cap
            # binds for the heavy domain
            cfg["weights"] = {"src0": 3.0, "src1": 1.0}
            cfg["token_budget"] = 30000
    doc["spec"]["stages"][-1]["config"]["path"] = str(tmp_path / "out")

    pipeline = parse_manifest_dict(doc)
    out = compile_pipeline(spark, pipeline).sink_frames["out"]
    rows = out.collect()
    assert rows, "release pipeline produced no rows"
    # epoch_upsample kept only the two weighted domains
    assert {r["source"] for r in rows} <= {"src0", "src1"}
    # leakage splits assigned every row and epochs respect the cap
    assert all(r["split"] in ("train", "val", "test") for r in rows)
    assert all(1 <= r["epoch"] <= 2 for r in rows)
    # canonical dedup: each (doc, epoch) appears once
    seen = [(r["doc_id"], r["epoch"]) for r in rows]
    assert len(seen) == len(set(seen))


def test_release_manifest_build_once_decontamination(spark, sf_dir, tmp_path):
    """The r10 verdict ask: the build-once decontamination shape is
    DECLARABLE from a manifest. `filter:` on bloom_decontaminate
    points at a save_bloom_filter artifact (no benchmark source, no
    per-run gram collection) and `benchmark_index:` on
    decontaminate_fuzzy points at a persisted minhash_index table (no
    per-run shingle->minhash build). The build-once variant must (a)
    produce exactly the rebuild variant's rows and (b) compile with
    the build stages ABSENT — the benchmark text is never scanned."""
    import yaml

    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.functions.corpus import (
        bloom_bitmap, save_bloom_filter)
    from etl_router_spark.functions.dedup import minhash_index
    from etl_router_spark.model.parser import parse_manifest_dict

    bench_path = str(tmp_path / "bench")
    bench = spark.createDataFrame(
        [(900001, "benchmark only eval question tokens alpha beta "
                  "gamma delta epsilon")],
        ["doc_id", "text"])
    bench.write.parquet(bench_path)
    # nightly shape: build the two artifacts ONCE, out of band
    bf_path = str(tmp_path / "bloom_filter")
    save_bloom_filter(
        spark,
        bloom_bitmap(bench, n=8, m_bits=1 << 16, k=3,
                     hash_family="xxhash64"),
        bf_path, n=8, k=3, hash_family="xxhash64")
    idx_path = str(tmp_path / "bench_index")
    minhash_index(bench, num_hashes=16, bands=4,
                  shingle_n=3).write.parquet(idx_path)

    def load_doc(build_once: bool) -> dict:
        with open("examples/manifests/training-data-release.yaml") as fh:
            doc = yaml.safe_load(fh)
        doc["spec"]["stages"][0]["config"]["path"] = (
            f"{sf_dir}/documents.parquet")
        for st in doc["spec"]["stages"]:
            cfg = st["config"]
            if cfg.get("transform_type") == "bloom_decontaminate":
                cfg["m_bits"] = 1 << 16
                if build_once:
                    del cfg["benchmark"]
                    # matching keys may stay (validated, not trusted)
                    cfg["filter"] = bf_path
                else:
                    cfg["benchmark"]["path"] = bench_path
            if cfg.get("transform_type") == "decontaminate_fuzzy":
                if build_once:
                    del cfg["benchmark"]
                    cfg["benchmark_index"] = {
                        "source_type": "file", "format": "parquet",
                        "path": idx_path}
                else:
                    cfg["benchmark"]["path"] = bench_path
            if cfg.get("transform_type") == "epoch_upsample":
                cfg["weights"] = {"src0": 3.0, "src1": 1.0}
                cfg["token_budget"] = 30000
        doc["spec"]["stages"][-1]["config"]["path"] = str(
            tmp_path / ("out_once" if build_once else "out_rebuild"))
        return doc

    frames = {}
    for build_once in (False, True):
        pipeline = parse_manifest_dict(load_doc(build_once))
        frames[build_once] = compile_pipeline(spark, pipeline) \
            .sink_frames["out"]
    key = lambda df: sorted(
        (r["doc_id"], r["epoch"], r["split"]) for r in df.collect())
    rebuilt, probed = key(frames[False]), key(frames[True])
    assert probed == rebuilt and rebuilt, (rebuilt, probed)
    # the build stage is ABSENT: the build-once plan never scans the
    # benchmark text — its only extra input is the tiny index table
    plan = (frames[True]._jdf.queryExecution().executedPlan().toString())
    assert bench_path not in plan, plan
    assert (frames[False]._jdf.queryExecution().executedPlan()
            .toString().count(bench_path)) >= 1  # rebuild DOES scan it


def test_bloom_build_manifest_closes_the_nightly_loop(spark, sf_dir, tmp_path):
    """The artifact-refresh side is declarative too: the
    nightly-benchmark-refresh manifest (bloom_build + dedup_index_build
    fanning out from ONE benchmark scan) produces artifacts the probe
    keys (`filter:`, `benchmark_index:`) consume directly — the whole
    nightly loop is two manifests, no Python in between. The
    engine-side filter frame is bit-identical to the driver-side
    bloom_bitmap build."""
    import yaml
    from pyspark.sql import functions as F

    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.functions.corpus import (
        bloom_bitmap, bloom_decontaminate, bloom_filter_frame,
        load_bloom_filter)
    from etl_router_spark.io import load_table
    from etl_router_spark.model.parser import parse_manifest_dict

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    bench_path = str(tmp_path / "bench")
    bench.write.parquet(bench_path)

    # engine-side frame == driver-side build, bit for bit
    kw = dict(n=4, m_bits=1 << 18, k=3, hash_family="h60")
    row = bloom_filter_frame(bench, **kw).collect()
    assert len(row) == 1
    assert list(row[0]["words"]) == bloom_bitmap(bench, **kw)
    assert (row[0]["m_bits"], row[0]["n"], row[0]["k"],
            row[0]["hash_family"]) == (1 << 18, 4, 3, "h60")

    with open("examples/manifests/nightly-benchmark-refresh.yaml") as fh:
        doc = yaml.safe_load(fh)
    doc["spec"]["stages"][0]["config"]["path"] = bench_path
    for st in doc["spec"]["stages"]:
        cfg = st["config"]
        if cfg.get("transform_type") == "bloom_build":
            cfg.update({"ngram": 4, "m_bits": 1 << 18,
                        "hash_family": "h60"})
        if st["id"] == "bloom_out":
            cfg["path"] = str(tmp_path / "bloom")
        if st["id"] == "index_out":
            cfg["path"] = str(tmp_path / "minhash_idx")
    compile_pipeline(spark, parse_manifest_dict(doc)).run()

    # the sink output IS what the probe keys consume
    bf = load_bloom_filter(spark, str(tmp_path / "bloom"))
    assert bf["words"] == bloom_bitmap(bench, **kw)
    probe = {"apiVersion": "etl.dev/v1", "kind": "Pipeline",
             "metadata": {"name": "probe"},
             "spec": {"stages": [
                 {"id": "s", "type": "source",
                  "config": {"source_type": "file", "format": "parquet",
                             "path": bench_path}},  # replaced below
                 {"id": "b", "type": "transform", "depends_on": ["s"],
                  "config": {"transform_type": "bloom_decontaminate",
                             "filter": str(tmp_path / "bloom")}},
                 {"id": "f", "type": "transform", "depends_on": ["b"],
                  "config": {"transform_type": "decontaminate_fuzzy",
                             "num_hashes": 16, "bands": 4,
                             "threshold": 0.5,
                             "benchmark_index": {
                                 "source_type": "file",
                                 "format": "parquet",
                                 "path": str(tmp_path / "minhash_idx")}}},
                 {"id": "o", "type": "sink", "depends_on": ["f"],
                  "config": {"sink_type": "file", "format": "parquet",
                             "path": str(tmp_path / "kept")}}]}}
    corpus_path = str(tmp_path / "corpus")
    corpus.write.parquet(corpus_path)
    probe["spec"]["stages"][0]["config"]["path"] = corpus_path
    compile_pipeline(spark, parse_manifest_dict(probe)).run()
    kept = {r["doc_id"] for r in
            spark.read.parquet(str(tmp_path / "kept")).collect()}
    # equals the inline (rebuild) composition
    from etl_router_spark.functions.corpus import decontaminate_fuzzy

    expect = {r["doc_id"] for r in decontaminate_fuzzy(
        bloom_decontaminate(corpus, bench, **kw),
        bench, num_hashes=16, bands=4, threshold=0.5,
    ).select("doc_id").collect()}
    assert kept == expect and kept


def test_bloom_build_xxhash_family_and_index_width_failfast(spark, tmp_path):
    """Two contract pins on the build-once path: (1) the engine-side
    filter frame equals the driver-side build for the PRODUCTION
    xxhash64 family too (the unit equality above pins h60); (2) a
    manifest `benchmark_index:` built with a different num_hashes
    fails AT COMPILE (the index's persisted params are authoritative,
    r11 advisor — it used to rely on the in-task width guard, which a
    bands/shingle_n mismatch never even reaches) instead of silently
    missing contamination."""
    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.functions.corpus import (
        bloom_bitmap, bloom_filter_frame)
    from etl_router_spark.functions.dedup import minhash_index
    from etl_router_spark.model.parser import parse_manifest_dict

    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        ["doc_id", "text"])
    kw = dict(n=4, m_bits=1 << 14, k=3, hash_family="xxhash64")
    row = bloom_filter_frame(bench, **kw).collect()[0]
    assert list(row["words"]) == bloom_bitmap(bench, **kw)

    idx_path = str(tmp_path / "idx8")
    minhash_index(bench, num_hashes=8, bands=4).write.parquet(idx_path)
    docs_path = str(tmp_path / "docs")
    bench.write.parquet(docs_path)
    doc = {"apiVersion": "etl.dev/v1", "kind": "Pipeline",
           "metadata": {"name": "width-mismatch"},
           "spec": {"stages": [
               {"id": "s", "type": "source",
                "config": {"source_type": "file", "format": "parquet",
                           "path": docs_path}},
               {"id": "f", "type": "transform", "depends_on": ["s"],
                "config": {"transform_type": "decontaminate_fuzzy",
                           "num_hashes": 16, "bands": 4,  # != index's 8
                           "benchmark_index": {"source_type": "file",
                                               "format": "parquet",
                                               "path": idx_path}}},
               {"id": "o", "type": "sink", "depends_on": ["f"],
                "config": {"sink_type": "file", "format": "parquet",
                           "path": str(tmp_path / "out")}}]}}
    with pytest.raises(Exception, match="width|num_hashes"):
        compile_pipeline(spark, parse_manifest_dict(doc)).run()
    # omitted keys ADOPT the index's persisted params (like the Bloom
    # twin's `filter:`): same manifest minus the conflicting override
    # detects the verbatim-contaminated doc and drops it
    del doc["spec"]["stages"][1]["config"]["num_hashes"]
    del doc["spec"]["stages"][1]["config"]["bands"]
    doc["spec"]["stages"][1]["config"]["mode"] = "drop"
    doc["spec"]["stages"][2]["config"]["path"] = str(tmp_path / "out2")
    compile_pipeline(spark, parse_manifest_dict(doc)).run()
    assert spark.read.parquet(str(tmp_path / "out2")).count() == 0


def test_bloom_filter_save_load_roundtrip_and_conflicts(spark, tmp_path):
    """save_bloom_filter persists the build parameters WITH the bits;
    load hands both back; the manifest `filter:` key refuses
    conflicting probe-parameter overrides (mismatched positions would
    silently void the one-sided-error contract)."""
    import pytest

    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.functions.corpus import (
        bloom_bitmap, bloom_decontaminate, load_bloom_filter,
        save_bloom_filter)
    from etl_router_spark.model.parser import parse_manifest_dict

    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota")],
        ["doc_id", "text"])
    words = bloom_bitmap(bench, n=4, m_bits=1 << 12, k=3,
                         hash_family="h60")
    path = str(tmp_path / "bf")
    save_bloom_filter(spark, words, path, n=4, k=3, hash_family="h60")
    bf = load_bloom_filter(spark, path)
    assert bf == {"words": words, "m_bits": 1 << 12, "n": 4, "k": 3,
                  "hash_family": "h60"}
    docs = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta eta theta iota"),
         (11, "completely different words nothing shared here at all")],
        ["doc_id", "text"])
    kept = bloom_decontaminate(
        docs, None, n=4, m_bits=1 << 12, k=3, hash_family="h60",
        prebuilt_words=bf["words"])
    assert [r["doc_id"] for r in kept.collect()] == [11]

    def manifest(extra: dict) -> dict:
        src = str(tmp_path / "docs")
        docs.write.mode("overwrite").parquet(src)
        return {"apiVersion": "etl.dev/v1", "kind": "Pipeline",
                "metadata": {"name": "probe-only"},
                "spec": {"stages": [
                    {"id": "s", "type": "source",
                     "config": {"source_type": "file",
                                "format": "parquet", "path": src}},
                    {"id": "t", "type": "transform", "depends_on": ["s"],
                     "config": {"transform_type": "bloom_decontaminate",
                                "filter": path, **extra}},
                    {"id": "o", "type": "sink", "depends_on": ["t"],
                     "config": {"sink_type": "file", "format": "parquet",
                                "path": str(tmp_path / "kept")}}]}}

    out = compile_pipeline(
        spark, parse_manifest_dict(manifest({}))).sink_frames["o"]
    assert [r["doc_id"] for r in out.collect()] == [11]
    # matching explicit keys are accepted
    compile_pipeline(spark, parse_manifest_dict(
        manifest({"ngram": 4, "hashes": 3, "hash_family": "h60"})))
    # conflicting keys fail fast at compile
    for bad in ({"ngram": 8}, {"m_bits": 1 << 13}, {"hashes": 2},
                {"hash_family": "xxhash64"}):
        with pytest.raises(ValueError, match="conflicts"):
            compile_pipeline(spark, parse_manifest_dict(manifest(bad)))


def test_minhash_hash_family_contract(spark):
    """The MinHash stack's dual hash family (mirrors Bloom/DSIR: h60 =
    oracle-exact default, xxhash64 = native scale path). The family
    seeds everything downstream, so (a) xxhash64 signatures are
    deterministic and estimate Jaccard like h60's (exact-dup pair
    found at est_jaccard 1.0, disjoint-vocab docs unpaired), (b) an
    index records its family and a probe under the other family fails
    fast driver-side, and (c) an unknown family is a named error."""
    import pytest as _pytest

    from etl_router_spark.functions.dedup import (
        dedup_against_minhash_index,
        minhash_index,
        minhash_index_params,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "alpha beta gamma delta epsilon zeta eta theta"),   # exact dup
         (3, "one two three four five six seven eight")],        # disjoint
        "doc_id long, text string")

    a = minhash_signatures(docs, num_hashes=8, hash_family="xxhash64").collect()
    b = minhash_signatures(docs, num_hashes=8, hash_family="xxhash64").collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
    h = minhash_signatures(docs, num_hashes=8).collect()
    assert sorted(map(str, a)) != sorted(map(str, h))  # different family

    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"]
             for r in minhash_lsh_pairs(docs, num_hashes=8, bands=4,
                                        threshold=0.5,
                                        hash_family="xxhash64").collect()}
    assert pairs.get((1, 2)) == 1.0
    assert not any(3 in p for p in pairs)

    idx = minhash_index(docs.filter("doc_id <= 2"), num_hashes=8, bands=4,
                        hash_family="xxhash64")
    assert minhash_index_params(idx)["hash_family"] == "xxhash64"
    with _pytest.raises(ValueError, match="hash_family=h60"):
        dedup_against_minhash_index(docs, idx, num_hashes=8, bands=4)
    kept = {r["doc_id"] for r in dedup_against_minhash_index(
        docs, idx, num_hashes=8, bands=4, hash_family="xxhash64").collect()}
    assert kept == {3}  # only the disjoint doc survives the matched probe

    with _pytest.raises(ValueError, match="hash_family"):
        minhash_signatures(docs, hash_family="fnv")

    # legacy index (pre-family metadata) reads back as h60
    legacy = idx.withMetadata("sig", {"num_hashes": 8, "bands": 4,
                                      "shingle_n": 3})
    assert minhash_index_params(legacy)["hash_family"] == "h60"


def test_minhash_hash_family_manifest_roundtrip(spark, tmp_path):
    """dedup_index_build with hash_family: xxhash64 -> parquet sink;
    dedup_index_probe adopts the persisted family (no key needed) and
    a conflicting explicit key is a compile error. The manifest
    default for the MinHash stack stays h60 — unlike bloom/dsir —
    because signatures feed persisted indexes and a default flip
    would silently mis-key every pre-existing index."""
    import pytest as _pytest

    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict

    docs_p = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "one two three four five six seven eight")],
        "doc_id long, text string").write.parquet(docs_p)

    def run(stages):
        return compile_pipeline(spark, parse_manifest_dict({
            "apiVersion": "etl.dev/v1", "kind": "Pipeline",
            "metadata": {"name": "mh-hf"},
            "spec": {"stages": stages},
        })).sink_frames["out"]

    idx_p = str(tmp_path / "idx")
    run([
        {"id": "src", "type": "source",
         "config": {"source_type": "file", "format": "parquet", "path": docs_p}},
        {"id": "op", "type": "transform",
         "config": {"transform_type": "dedup_index_build", "num_hashes": 8,
                    "bands": 4, "hash_family": "xxhash64"}},
        {"id": "out", "type": "sink",
         "config": {"sink_type": "file", "format": "parquet", "path": idx_p}},
    ]).write.mode("overwrite").parquet(idx_p)

    probe = [
        {"id": "src", "type": "source",
         "config": {"source_type": "file", "format": "parquet", "path": docs_p}},
        {"id": "op", "type": "transform",
         "config": {"transform_type": "dedup_index_probe",
                    "index_path": idx_p}},
        {"id": "out", "type": "sink",
         "config": {"sink_type": "file", "format": "parquet",
                    "path": str(tmp_path / "o2")}},
    ]
    # family adopted from the persisted footer metadata: both docs are
    # IN the index, so the family-matched probe drops both
    assert run(probe).count() == 0
    # conflicting explicit key -> compile error
    probe[1]["config"]["hash_family"] = "h60"
    with _pytest.raises(ValueError, match="hash_family"):
        run(probe)
    # numerically-equal YAML spellings are NOT conflicts (r14 ADVICE:
    # the blanket str() compare spuriously rejected 8.0 / quoted ' 8')
    probe[1]["config"] = {"transform_type": "dedup_index_probe",
                          "index_path": idx_p, "num_hashes": 8.0,
                          "bands": " 4"}
    assert run(probe).count() == 0
    # while a genuinely different value still is one
    probe[1]["config"]["num_hashes"] = 16.0
    with _pytest.raises(ValueError, match="num_hashes"):
        run(probe)


def test_duplicate_spans_multi_n_one_scan(spark, tmp_path):
    """n as a LIST of widths — the docstring's 'several n in one pass'
    shape: (a) the result equals the interval-union of the single-n
    runs, (b) a one-element list matches the single-int path exactly,
    (c) the multi-n plan scans the input ONCE, (d) the manifest stage
    accepts the list form."""
    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.functions.dedup import duplicate_ngram_spans
    from etl_router_spark.model.parser import parse_manifest_dict

    boiler5 = "alpha beta gamma delta epsilon"
    boiler9 = "one two three four five six seven eight nine"
    docs = spark.createDataFrame(
        [(1, f"{boiler5} filler1 {boiler9}"),
         (2, f"{boiler5} other filler2 pad {boiler9}"),
         (3, "completely unrelated words here nothing shared at all")],
        "doc_id long, text string")
    docs_p = str(tmp_path / "docs")
    docs.write.parquet(docs_p)
    pq = spark.read.parquet(docs_p)

    def spans(frame, n):
        return {(r["doc_id"], r["span_start"], r["span_end"])
                for r in duplicate_ngram_spans(frame, n=n).collect()}

    def union_merge(*span_sets):
        by_doc: dict = {}
        for ss in span_sets:
            for d, a, b in ss:
                by_doc.setdefault(d, []).append((a, b))
        out = set()
        for d, iv in by_doc.items():
            iv.sort()
            cur = list(iv[0])
            for a, b in iv[1:]:
                if a <= cur[1] + 1:
                    cur[1] = max(cur[1], b)
                else:
                    out.add((d, cur[0], cur[1]))
                    cur = [a, b]
            out.add((d, cur[0], cur[1]))
        return out

    s5, s9 = spans(pq, 5), spans(pq, 9)
    assert s5 and s9  # both widths find their planted boilerplate
    assert spans(pq, [5, 9]) == union_merge(s5, s9)
    assert spans(pq, [5]) == s5
    assert spans(pq, [9, 5, 9]) == spans(pq, [5, 9])  # dedup + order-free

    plan = (duplicate_ngram_spans(pq, n=[5, 9])
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Scan parquet") == 1  # one corpus scan for all widths

    pipeline = parse_manifest_dict({
        "apiVersion": "etl.dev/v1", "kind": "Pipeline",
        "metadata": {"name": "multi-n"},
        "spec": {"stages": [
            {"id": "src", "type": "source",
             "config": {"source_type": "file", "format": "parquet",
                        "path": docs_p}},
            {"id": "op", "type": "transform",
             "config": {"transform_type": "duplicate_spans", "n": [5, 9]}},
            {"id": "out", "type": "sink",
             "config": {"sink_type": "file", "format": "parquet",
                        "path": str(tmp_path / "o")}},
        ]},
    })
    got = {(r["doc_id"], r["span_start"], r["span_end"])
           for r in compile_pipeline(spark, pipeline)
           .sink_frames["out"].collect()}
    assert got == union_merge(s5, s9)
