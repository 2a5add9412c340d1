"""Edge-input robustness: empty tables and null/empty text through the
operator library — every operator must return its normal schema with
zero (or the degenerate count of) rows, never raise."""

from __future__ import annotations

from pyspark.sql import functions as F


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def _null_docs(spark):
    return spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "real text here")],
        "doc_id long, text string",
    )


def test_dedup_ops_on_empty_and_null_text(spark):
    from etl_router_spark.functions.dedup import (
        connected_components,
        exact_dedup,
        minhash_lsh_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
        simhash_pairs,
    )

    empty = _empty_docs(spark)
    nulls = _null_docs(spark)

    assert ngram_jaccard_pairs(empty).count() == 0
    assert minhash_lsh_pairs(empty, num_hashes=8, bands=4).count() == 0
    assert simhash_pairs(empty, bits=32, blocks=4).count() == 0
    assert connected_components(
        spark.createDataFrame([], "id_a long, id_b long")).count() == 0

    # null/blank text: rows survive exact dedup (null == null dedupes),
    # produce no shingle pairs, and never raise
    assert exact_dedup(nulls).count() >= 2
    assert ngram_jaccard_pairs(nulls).count() == 0
    # docs with no shingles simply have no signature row
    sigs = minhash_signatures(nulls, num_hashes=8)
    assert sigs.count() <= 4


def test_text_ops_on_empty_and_null_text(spark):
    from etl_router_spark.functions.text import (
        quality_score,
        repetition_stats,
        text_stats,
        tokenize,
        unigram_logprob,
    )

    empty = _empty_docs(spark)
    nulls = _null_docs(spark)

    for op in (tokenize, text_stats, quality_score, repetition_stats):
        assert op(empty).count() == 0
        out = op(nulls)
        assert out.count() == 4  # row-preserving ops keep null rows

    assert unigram_logprob(empty).count() == 0
    lm = unigram_logprob(nulls)
    assert lm.count() <= 4 and lm.filter(F.col("avg_logprob") > 0).count() == 0


def test_relational_ops_on_empty_input(spark):
    from etl_router_spark.compile.transforms import (
        apply_aggregate,
        apply_dedupe,
        apply_ratelimit,
        apply_sessionize,
    )

    empty_ev = spark.createDataFrame([], "user_id long, ts timestamp, value double")
    assert apply_dedupe(empty_ev, ["user_id"], order_field="ts").count() == 0
    assert apply_dedupe(empty_ev, ["user_id"], order_field="ts", window="1h").count() == 0
    assert apply_ratelimit(empty_ev, ["user_id"], 5, "1h", "ts").count() == 0
    assert apply_sessionize(empty_ev, ["user_id"], "30m", ts_field="ts").count() == 0
    assert apply_sessionize(empty_ev, ["user_id"], "30m", ts_field="ts",
                            max_duration="1h").count() == 0
    agg = apply_aggregate(
        empty_ev, ["user_id"],
        [{"function": "sum", "field": "value", "output_field": "s"}],
    )
    assert agg.count() == 0


def test_cdc_and_profile_on_empty_input(spark):
    from etl_router_spark.functions.cdc import cdc_apply
    from etl_router_spark.functions.profile import profile_table

    empty = spark.createDataFrame([], "k long, seq long, op string, v double")
    assert cdc_apply(empty, ["k"], ["seq"], op_col="op").count() == 0
    prof = profile_table(empty, exact_distinct=True)
    rows = {r.column: r for r in prof.collect()}
    assert rows["k"].n_rows == 0 and rows["k"].n_nulls == 0


def test_similarity_and_corpus_ops_on_empty_input(spark):
    from etl_router_spark.functions.corpus import (
        assign_splits,
        global_shuffle,
        group_topk,
        hash_sample,
        pack_sequences,
    )
    from etl_router_spark.functions.dedup import embedding_cosine_join
    from etl_router_spark.functions.similarity import brute_force_topk

    empty_vecs = spark.createDataFrame([], "vec_id long, embedding array<double>")
    some_vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>")

    # empty queries against a real corpus, and vice versa
    assert brute_force_topk(empty_vecs, some_vecs, k=3).count() == 0
    assert embedding_cosine_join(empty_vecs, some_vecs, threshold=0.0,
                                 left_blocks=2, right_blocks=2).count() == 0
    assert embedding_cosine_join(some_vecs, empty_vecs, threshold=0.0,
                                 left_blocks=2, right_blocks=2).count() == 0

    empty_docs = spark.createDataFrame([], "doc_id long, text string, source string, n_chars long")
    assert hash_sample(empty_docs, 0.5, "doc_id").count() == 0
    assert assign_splits(empty_docs, "doc_id",
                         {"train": 0.9, "val": 0.1}).count() == 0
    assert group_topk(empty_docs, "source", "n_chars", k=3).count() == 0
    assert global_shuffle(empty_docs.select("doc_id")).count() == 0
    empty_tok = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert pack_sequences(empty_tok, max_tokens=128).count() == 0


def test_merge_schema_reads_evolved_files(spark, tmp_path):
    """merge_schema: parquet files written before/after a column was
    added read back as one evolved schema (missing values null)."""
    from etl_router_spark.sources.registry import read_source

    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string") \
        .coalesce(1).write.parquet(f"{p}/part1")
    spark.createDataFrame([(2, "b", 9.5)], "id long, v string, score double") \
        .coalesce(1).write.parquet(f"{p}/part2")
    out = read_source(spark, {"source_type": "file", "format": "parquet",
                              "path": f"{p}/part*", "merge_schema": True},
                      streaming=False)
    assert set(out.columns) == {"id", "v", "score"}
    rows = {r.id: r.score for r in out.collect()}
    assert rows == {1: None, 2: 9.5}


def test_round4_operators_on_empty_and_null_inputs(spark):
    from etl_router_spark.functions.dedup import ngram_jaccard_pairs
    from etl_router_spark.functions.text import char_entropy, ngram_counts

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert ngram_counts(empty, n=2, k=5).count() == 0
    assert char_entropy(empty).count() == 0
    assert ngram_jaccard_pairs(empty, threshold=0.5, max_df_frac=None).count() == 0

    # NULL text: entropy stays NULL (standard SQL propagation), counts skip
    nulls = spark.createDataFrame(
        [(1, None), (2, "a b c d")], "doc_id long, text string"
    )
    got = {r.doc_id: r.char_entropy for r in char_entropy(nulls).collect()}
    assert got[1] is None and got[2] is not None
    assert ngram_counts(nulls, n=2, k=10).count() == 3  # from doc 2 only
