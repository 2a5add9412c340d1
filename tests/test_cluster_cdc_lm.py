"""Unit tests: near-dup clustering, CDC apply, unigram LM scoring."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_connected_components_basic(spark):
    from etl_router_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (10, 11), (11, 12), (3, 4)],
        "id_a long, id_b long",
    )
    got = {r.id: r.component for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 10: 10, 11: 10, 12: 10}


def test_connected_components_chain_converges(spark):
    # a 12-node path: worst case for label propagation (diameter 11)
    from etl_router_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    got = {r.id: r.component for r in connected_components(pairs).collect()}
    assert set(got.values()) == {0}


def test_dedup_clusters_includes_singletons(spark):
    from etl_router_spark.functions.dedup import dedup_clusters

    docs = spark.createDataFrame([(i, f"d{i}") for i in range(6)], "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "id_a long, id_b long")
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(docs, pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5}


def test_cdc_apply_tombstone_and_reinsert(spark):
    from etl_router_spark.functions.cdc import cdc_apply

    log = spark.createDataFrame(
        [
            # key 1: insert -> update (survives with v=20)
            (1, 1, "insert", 10.0),
            (1, 2, "update", 20.0),
            # key 2: insert -> delete (tombstoned)
            (2, 1, "insert", 1.0),
            (2, 2, "delete", 0.0),
            # key 3: delete -> re-insert (survives: later op wins)
            (3, 1, "delete", 0.0),
            (3, 2, "insert", 7.0),
        ],
        "k long, seq long, op string, v double",
    )
    got = {r.k: (r.op, r.v) for r in cdc_apply(log, ["k"], ["seq"], op_col="op").collect()}
    assert got == {1: ("update", 20.0), 3: ("insert", 7.0)}


def test_cdc_snapshot_merge(spark):
    from etl_router_spark.functions.cdc import cdc_snapshot_merge

    snap = spark.createDataFrame(
        [(1, 1, "insert", 10.0), (2, 1, "insert", 1.0), (9, 1, "insert", 99.0)],
        "k long, seq long, op string, v double",
    )
    log = spark.createDataFrame(
        [(1, 5, "update", 11.0), (2, 5, "delete", 0.0), (4, 5, "insert", 4.0)],
        "k long, seq long, op string, v double",
    )
    got = {r.k: r.v for r in cdc_snapshot_merge(snap, log, ["k"], ["seq"], op_col="op").collect()}
    # 1 updated, 2 deleted, 4 inserted, 9 untouched
    assert got == {1: 11.0, 4: 4.0, 9: 99.0}


def test_unigram_logprob_values(spark):
    from etl_router_spark.functions.text import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")],
        "doc_id long, text string",
    )
    # corpus tokens: a a b b c -> p(a)=2/5, p(b)=2/5, p(c)=1/5
    rows = {r.doc_id: r for r in unigram_logprob(docs).collect()}
    assert rows[1].n_tokens == 3 and rows[2].n_tokens == 2
    exp1 = (2 * math.log(2 / 5) + math.log(2 / 5)) / 3
    exp2 = (math.log(2 / 5) + math.log(1 / 5)) / 2
    assert abs(rows[1].avg_logprob - exp1) < 1e-6
    assert abs(rows[2].avg_logprob - exp2) < 1e-6


def test_new_transform_type_manifests(spark, sf_dir, tmp_path):
    """dedup_cluster / cdc_apply / split_assign / unigram_logprob as
    manifest transform_types — declarable in YAML like any filter."""
    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict

    def run(src_path, transform_cfg, out):
        pipeline = parse_manifest_dict({
            "apiVersion": "etl.dev/v1", "kind": "Pipeline",
            "metadata": {"name": "r3-op"},
            "spec": {"stages": [
                {"id": "src", "type": "source",
                 "config": {"source_type": "file", "format": "parquet", "path": src_path}},
                {"id": "op", "type": "transform", "config": transform_cfg},
                {"id": "out", "type": "sink",
                 "config": {"sink_type": "file", "format": "parquet", "path": out}},
            ]},
        })
        return compile_pipeline(spark, pipeline).sink_frames["out"]

    docs = f"{sf_dir}/documents.parquet"
    n_docs = spark.read.parquet(docs).count()

    clustered = run(docs, {"transform_type": "dedup_cluster",
                           "method": "simhash", "bits": 32}, str(tmp_path / "c"))
    assert clustered.count() == n_docs
    assert set(clustered.columns) == {"doc_id", "cluster_id"}

    split = run(docs, {"transform_type": "split_assign", "salt": "7",
                       "fractions": {"train": 0.8, "val": 0.1, "test": 0.1}},
                str(tmp_path / "s"))
    counts = {r.split: r.cnt for r in
              split.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    assert set(counts) <= {"train", "val", "test"} and counts["train"] > counts.get("val", 0)

    lm = run(docs, {"transform_type": "unigram_logprob"}, str(tmp_path / "l"))
    assert lm.count() == n_docs
    assert lm.filter(F.col("avg_logprob") >= 0).count() == 0

    ev = f"{sf_dir}/events.parquet"
    state = run(ev, {"transform_type": "cdc_apply",
                     "key_fields": ["user_id"], "order_fields": ["ts", "event_id"],
                     "op_field": "event_type", "delete_values": ["error"]},
                str(tmp_path / "cdc"))
    assert state.count() == state.select("user_id").distinct().count()
    assert state.filter(F.col("event_type") == "error").count() == 0


def test_tfidf_cosine_identical_docs(spark):
    from etl_router_spark.functions.indexing import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [(1, "apple banana cherry"), (2, "apple banana cherry"),
         (3, "dog e f g h"), (4, "x y z w q")],
        "doc_id long, text string",
    )
    got = {(r.id_a, r.id_b): r.cosine
           for r in tfidf_cosine_pairs(docs, threshold=0.99, max_df_frac=0.6).collect()}
    # identical docs -> cosine 1.0; disjoint docs produce no pair
    assert got == {(1, 2): 1.0}


def test_profile_table_values(spark):
    from etl_router_spark.functions.profile import profile_table

    df = spark.createDataFrame(
        [(1, 2.0, "a"), (2, None, "b"), (3, 4.0, None), (3, 6.0, "a")],
        "k long, v double, s string",
    )
    rows = {r.column: r for r in profile_table(df, exact_distinct=True).collect()}
    assert rows["k"].n_rows == 4 and rows["k"].n_nulls == 0 and rows["k"].n_distinct == 3
    assert rows["v"].n_nulls == 1 and rows["v"].mean == 4.0
    assert rows["s"].n_nulls == 1 and rows["s"].min_value == "a" and rows["s"].max_value == "b"
    assert rows["s"].mean is None


def test_ivf_trained_centroids_balance_and_recall(spark, sf_dir):
    """IVF with MLlib-k-means centroids: the k-means quantizer must
    yield materially better-balanced cells than the lowest-id stand-in
    (balance is what bounds candidate-set size, i.e. the actual
    speedup) while keeping useful recall vs brute force. Raw recall
    alone would reward degenerate quantizers: lumping the corpus into
    one cell gives recall 1.0 and zero pruning."""
    import math

    from etl_router_spark.functions.similarity import (
        brute_force_topk,
        cosine_cols,
        ivf_topk,
        train_ivf_centroids,
    )
    from etl_router_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 400)
    queries = emb.filter(F.col("vec_id") < 10)

    def assign_counts(cents):
        scored = F.array(*[
            F.struct(
                F.round(cosine_cols(F.col("v"), F.array(*[F.lit(x) for x in cv])), 6).alias("s"),
                F.lit(cid).alias("cid"))
            for cid, cv in cents])
        rows = (emb.select(F.col("embedding").cast("array<double>").alias("v"))
                .withColumn("cid", F.array_max(scored)["cid"])
                .groupBy("cid").count().collect())
        return [r["count"] for r in rows]

    def recall(result):
        exact = {(r.query_id, r.neighbor_id)
                 for r in brute_force_topk(queries, emb, k=5).collect()}
        got = {(r.query_id, r.neighbor_id) for r in result.collect()}
        return len(got & exact) / len(exact)

    trained = train_ivf_centroids(emb, n_centroids=8, sample_fraction=0.5)
    assert len(trained) == 8 and all(len(v) > 0 for _, v in trained)
    n = emb.count()
    counts = assign_counts(trained)
    # every cell used, none dominant: candidate-set size stays bounded
    # (on these uniform synthetic embeddings the stand-in quantizer is
    # also balanced — the comparative claim only shows on clustered
    # data, so we pin the absolute properties)
    assert len(counts) == 8
    assert max(counts) / n < 0.4
    assert recall(ivf_topk(queries, emb, k=5, nprobe=3, centroids=trained)) > 0.5


def test_avro_unavailable_raises_actionable_error(spark):
    """avro without the spark-avro module jar: ConnectorUnavailable
    naming the exact fix, not Spark's generic lookup failure."""
    import pytest

    from etl_router_spark.sources.registry import ConnectorUnavailable, read_source

    with pytest.raises(ConnectorUnavailable, match="spark-avro"):
        read_source(spark, {"source_type": "file", "format": "avro",
                            "path": "/tmp/nonexistent"}, streaming=False)


def test_dedup_canonical_keeps_representatives(spark):
    from etl_router_spark.functions.dedup import dedup_canonical

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "id_a long, id_b long")
    out = dedup_canonical(docs, pairs)
    assert sorted(r.doc_id for r in out.collect()) == [0, 3, 4]
    assert set(out.columns) == {"doc_id", "text"}


def test_dedup_cluster_manifest_canonical_emit(spark, sf_dir, tmp_path):
    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict

    docs = f"{sf_dir}/documents.parquet"
    n_docs = spark.read.parquet(docs).count()
    doc = {"apiVersion": "etl.dev/v1", "kind": "Pipeline",
           "metadata": {"name": "canon"},
           "spec": {"stages": [
               {"id": "src", "type": "source",
                "config": {"source_type": "file", "format": "parquet", "path": docs}},
               {"id": "op", "type": "transform",
                "config": {"transform_type": "dedup_cluster", "method": "simhash",
                           "bits": 32, "emit": "canonical"}},
               {"id": "out", "type": "sink",
                "config": {"sink_type": "file", "format": "parquet",
                           "path": str(tmp_path / "o")}}]}}
    out = compile_pipeline(spark, parse_manifest_dict(doc)).sink_frames["out"]
    cnt = out.count()
    assert 0 < cnt <= n_docs
    assert set(out.columns) == set(spark.read.parquet(docs).columns)


# ---------------------------------------------------------------------------
# alternating-star connected components (deep-chain escalation path)
# ---------------------------------------------------------------------------
def _uf_components(n_nodes, edges):
    """Union-find ground truth: node -> min id of its component."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n_nodes)}


def test_star_cc_long_chain(spark):
    # a 60-node path: diameter 59 >> default label max_iterations —
    # exactly the adversarial case the star algorithm exists for
    from etl_router_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "id_a long, id_b long"
    )
    got = {
        r.id: r.component
        for r in connected_components(pairs, algorithm="star").collect()
    }
    assert set(got.values()) == {0} and len(got) == 61


def test_label_cc_raises_instead_of_truncating(spark):
    # the same chain through label propagation with a cap below the
    # diameter must raise, never return wrong labels silently
    import pytest

    from etl_router_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iterations=5).collect()


def test_star_cc_matches_label_and_union_find_random(spark):
    # property check: star == label == union-find on random graphs of
    # mixed shape (sparse random edges + an embedded long chain + a
    # clique), several seeds
    import random

    from etl_router_spark.functions.dedup import connected_components

    for seed in (0, 1, 2):
        rng = random.Random(seed)
        n = 80
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(40)]
        edges += [(i, i + 1) for i in range(20, 45)]          # chain
        edges += [(a, b) for a in range(70, 74) for b in range(a + 1, 74)]  # clique
        edges = [(a, b) for a, b in edges if a != b]
        truth = _uf_components(n, edges)
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        in_graph = {a for e in edges for a in e}
        want = {i: truth[i] for i in in_graph}

        star = {
            r.id: r.component
            for r in connected_components(pairs, algorithm="star").collect()
        }
        label = {
            r.id: r.component
            for r in connected_components(pairs, max_iterations=60).collect()
        }
        assert star == want, f"seed {seed}: star mismatch"
        assert label == want, f"seed {seed}: label mismatch"


def test_dedup_canonical_star_algorithm(spark):
    from etl_router_spark.functions.dedup import dedup_canonical

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id long, text string"
    )
    # chain 0-1-2-3 plus pair 5-6: representatives {0, 4, 5, 7}
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    kept = sorted(
        r.doc_id for r in dedup_canonical(docs, pairs, algorithm="star").collect()
    )
    assert kept == [0, 4, 5, 7]


def test_connected_components_reliable_checkpoint_dir(spark, tmp_path):
    # both algorithms accept checkpoint_dir= for fault-tolerant
    # reliable checkpoints; results identical to the local default
    from etl_router_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "id_a string, id_b string")
    want = {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
    for algo in ("label", "star"):
        ck = str(tmp_path / f"ck_{algo}")
        got = {r.id: r.component
               for r in connected_components(
                   pairs, algorithm=algo, checkpoint_dir=ck).collect()}
        assert got == want, algo
        import glob
        assert glob.glob(ck + "/*/rdd-*"), f"{algo}: no checkpoint data"


def test_bigram_logprob_hand_computed(spark):
    """Hand-computed interpolated-bigram scores on a 2-doc corpus, plus
    the fluency property unigrams cannot see: a doc whose bigrams all
    occur in the LM outscores a token-permuted twin with identical
    unigram stats."""
    from etl_router_spark.functions.text import bigram_logprob

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a")],
        "doc_id long, text string",
    )
    # tokens: a b a b b a -> T=6, V=2; c(a)=3, c(b)=3
    # bigrams: doc1 (a,b) (b,a) (a,b); doc2 (b,a) -> cb(a,b)=2, cb(b,a)=2
    rows = {r.doc_id: r for r in bigram_logprob(docs, lam=0.7, add_k=0.5)
            .collect()}
    uni_a = (3 + 0.5) / (6 + 0.5 * 3)  # add-k unigram, V+1 in the denom
    p_ab = 0.7 * (2 / 3) + 0.3 * uni_a  # cb/c_prev interpolated
    lp = math.log(p_ab)  # all four pairs share c_prev=3, same cb=2
    assert rows[1].n_bigrams == 3 and rows[2].n_bigrams == 1
    assert abs(rows[1].avg_bigram_logprob - lp) < 1e-6
    assert abs(rows[2].avg_bigram_logprob - lp) < 1e-6
    assert abs(rows[1].bigram_ppl - math.exp(-lp)) < 1e-3

    # fluency separation: "a b a b" vs its permutation "a a b b" under
    # the SAME LM (lm_df) — identical unigrams, different bigrams
    lm = docs
    fluent = spark.createDataFrame([(10, "a b a b")], "doc_id long, text string")
    garbled = spark.createDataFrame([(11, "a a b b")], "doc_id long, text string")
    f = bigram_logprob(fluent, lm_df=lm).collect()[0]
    g = bigram_logprob(garbled, lm_df=lm).collect()[0]
    assert f.avg_bigram_logprob > g.avg_bigram_logprob


def test_bigram_logprob_edge_docs(spark):
    """Single-token and empty docs pass through with NULL scores; an
    unseen word (scoring corpus != LM corpus) stays finite via the
    add-k unigram floor."""
    from etl_router_spark.functions.text import bigram_logprob

    lm = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "a"), (2, "a z")], "doc_id long, text string")
    rows = {r.doc_id: r for r in bigram_logprob(docs, lm_df=lm).collect()}
    assert rows[1].n_bigrams is None and rows[1].avg_bigram_logprob is None
    # (a, z): cb=0, c_prev=c(a)=2; unigram floor for unseen z = add_k/(T+add_k*(V+1))
    p = 0.7 * 0.0 + 0.3 * (0.5 / (3 + 0.5 * 3))
    assert abs(rows[2].avg_bigram_logprob - math.log(p)) < 1e-6


def test_bigram_logprob_manifest(spark, tmp_path):
    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, "the cat sat on the mat " * (1 + i % 2)) for i in range(8)],
        "doc_id long, text string",
    ).write.parquet(src)
    doc = {"apiVersion": "etl.dev/v1", "kind": "Pipeline",
           "metadata": {"name": "bglm"},
           "spec": {"stages": [
               {"id": "s", "type": "source",
                "config": {"source_type": "file", "format": "parquet", "path": src}},
               {"id": "t", "type": "transform",
                "config": {"transform_type": "bigram_logprob", "lam": 0.8}},
               {"id": "o", "type": "sink",
                "config": {"sink_type": "file", "format": "parquet",
                           "path": str(tmp_path / "out")}},
           ]}}
    compile_pipeline(spark, parse_manifest_dict(doc)).run()
    out = spark.read.parquet(str(tmp_path / "out"))
    assert {"doc_id", "text", "n_bigrams", "avg_bigram_logprob",
            "bigram_ppl"} <= set(out.columns)
    assert out.filter("avg_bigram_logprob IS NULL").count() == 0


def test_bigram_logprob_matches_reference_property(spark):
    """Property check against an independent pure-Python reference
    implementation on small random corpora (fixed seeds, CPython
    arithmetic): the Spark column expressions reproduce the
    interpolated probability to 1e-6 on every doc."""
    import random

    from etl_router_spark.functions.text import bigram_logprob

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        vocab = ["aa", "bb", "cc", "dd", "ee"]
        docs = [(i, " ".join(rng.choice(vocab)
                             for _ in range(rng.randint(1, 12))))
                for i in range(12)]
        lam, add_k = 0.7, 0.5
        # reference model
        toks = [d.split() for _, d in docs]
        uni: dict[str, int] = {}
        bi: dict[tuple, int] = {}
        for ts in toks:
            for t in ts:
                uni[t] = uni.get(t, 0) + 1
            for a, b in zip(ts, ts[1:]):
                bi[(a, b)] = bi.get((a, b), 0) + 1
        T = sum(uni.values())
        V = len(uni)

        def ref_score(ts):
            if len(ts) < 2:
                return None
            lps = []
            for a, b in zip(ts, ts[1:]):
                pb = bi.get((a, b), 0) / uni.get(a, 1)
                pu = (uni.get(b, 0) + add_k) / (T + add_k * (V + 1))
                lps.append(math.log(lam * pb + (1 - lam) * pu))
            return sum(lps) / len(lps)

        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r.doc_id: r.avg_bigram_logprob
               for r in bigram_logprob(df, lam=lam, add_k=add_k).collect()}
        for (i, _), ts in zip(docs, toks):
            exp = ref_score(ts)
            if exp is None:
                assert got[i] is None
            else:
                assert abs(got[i] - exp) < 1e-6, (seed, i)
