"""Guard-auto recall of the chain's two sizing arms, vs exact L2.

Closes the r13 verdict's measurement gap: RETRIEVAL_CHAIN_r13.json's
macro_recall_at_10 is 0.001 at 200k for BOTH arms — an artifact of the
label-constructed qrels (the fixture has 10 labels, so each query's
relevant set is ~n/10 docs and recall@10 is bounded by 10/(n/10) ~
0.0005 by construction, not an engine signal). This script measures
what the chain cannot: recall@10 against the EXACT-L2 top-10 ground
truth (the metric PQ approximates), for three arms sharing the chain's
index recipe (pq_train m=4/k=16, stand-in centroids, write_pq_index
sidecar feeding ``occupancy_guard="auto"``):

- ``fixed8_np2``: the pre-r13 layout — occupancy grows with the
  corpus, nprobe=2 probes 25% of the cells (semi-brute-force).
- ``sized_np2``: the r13 composition — sqrt(n) cells but nprobe still
  pinned at 2, probing 0.45% of 447 cells at 200k. The r14 run
  exposed it as a recall hole (0.867 -> 0.200 at 200k, m=4 codes);
  it is ALSO the "clamp auto back to 2" remediation candidate the
  r14 verdict asked to measure against — its numbers ARE that arm's.
- ``sized_np_auto``: the ENGINE no-config default, invoked as such —
  ``nprobe=None`` with ``corpus_n`` from the sidecar's ``n_vectors``
  (r15): sqrt(n) cells, ``suggest_nprobe``'s size-aware probed
  fraction (25% under ~2k vectors sliding to 5% at 20k+), and —
  under sub-resolution codes — the shortlist scaled with the probed
  volume so the exact refine absorbs the extra candidates instead of
  a fixed ADC cut diluting on them.

Each layout runs under two code widths (``_m4`` / ``_m16`` suffixes):
the chain's oracle-friendly m=4/k=16 books are BELOW quantizer
resolution (16 bits/vector — the ADC cut is ~noise, so the r14
flat-shortlist auto arm measured BELOW np=2 at 200k: 0.165 vs 0.200),
while the production-width m=16/k=32 books carry enough signal for
the fraction rule's cell-recall gains to survive the cut. The r15
acceptance bars (verdict asks #2/#4): the auto default must not read
below sized_np2 at ANY (n, m) point, must hold the m=16/200k 0.870,
and at 2k/m=16 must land within noise of fixed8's 0.442.

Usage:
    python scripts/gen_scale_data.py --out /tmp/sf1 --scale 10
    python scripts/gen_scale_data.py --out /tmp/emb200k --scale 100 \
        --tables embeddings
    python scripts/ivfpq_recall_arms.py /tmp/sf1 /tmp/emb200k \
        --out IVFPQ_RECALL_r14.json
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
import warnings
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

K = 10
N_QUERIES = 64
# r15: new stage root — pre-r15 sidecars lack n_vectors, and the auto
# arm now feeds corpus_n from the sidecar, so stale indexes would
# silently measure the flat-fraction rule instead of the default
STAGE_ROOT = "/tmp/ivfpq_recall_arms_r15"


def _fixture_fingerprint(sf_dir: str) -> str:
    """Short content fingerprint of the embeddings fixture (file
    sizes + mtimes) — keys the truth cache so a regenerated
    same-size fixture can't silently reuse stale ground truth."""
    import hashlib

    root = Path(sf_dir) / "embeddings.parquet"
    paths = ([root] if root.is_file()
             else sorted(root.rglob("*")) if root.exists() else [])
    h = hashlib.sha256()
    for p in paths:
        if p.is_file():
            st = p.stat()
            h.update(f"{p.name}:{st.st_size}:{st.st_mtime_ns};".encode())
    return h.hexdigest()[:12]


# ONE truth definition, shared with retrieval_chain_timing.py —
# SCALE.md compares recall across the two artifacts
from _truth import exact_l2_topk, hash_spaced_sample  # noqa: E402


def run_dir(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from etl_router_spark.functions.pq import (
        ivfpq_rerank_topk,
        pq_train,
        read_pq_index,
        standin_centroids,
        suggest_n_centroids,
        write_pq_index,
    )
    from etl_router_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings") \
        .select("vec_id", "embedding").persist()
    n = emb.count()
    queries = hash_spaced_sample(emb, N_QUERIES)
    n_q = queries.count()

    # truth is the run's dominant fixed cost at large n (~25 min at
    # 2M) — cache it under the stage root so a crashed run resumes.
    # The key carries a fixture content fingerprint (file sizes +
    # mtimes), not just dir name + row count: a re-generated fixture
    # with a different seed but the same n must NOT reuse stale truth.
    truth_path = os.path.join(
        STAGE_ROOT,
        f"truth_{Path(sf_dir).name}_{n}_{_fixture_fingerprint(sf_dir)}.json")
    t0 = time.perf_counter()
    if os.path.exists(truth_path):
        with open(truth_path) as fh:
            truth = {tuple(p) for p in json.load(fh)}
    else:
        truth = exact_l2_topk(emb, queries, K)
        os.makedirs(STAGE_ROOT, exist_ok=True)
        with open(truth_path, "w") as fh:
            json.dump(sorted(truth), fh)
    t_truth = time.perf_counter() - t0

    sized = suggest_n_centroids(n)
    row = {"dir": sf_dir, "n": n, "n_queries": n_q, "k": K,
           "truth_metric": "exact_l2_top10",
           "truth_sec": round(t_truth, 1), "arms": {}}
    # layout arms x code widths: the pre-r13 fixed-8 layout, the r13
    # composition (sized cells, nprobe still pinned at the old 2 —
    # the recall hole this file exposed), and the r14 no-config
    # default (sized cells + suggest_nprobe's matched fraction) —
    # each under BOTH the chain's oracle-friendly m=4/k=16 codes
    # (16 bits/vector, BELOW quantizer resolution: the ADC cut is
    # ~noise, so extra probed cells add nothing) and the
    # production-width m=16/k=32 recipe (80 bits, the ivfpq_recall.py
    # sweep width) where the fraction rule's gains actually land.
    for m, kk in ((4, 16), (16, 32)):
        books = pq_train(emb, m=m, k=kk)
        # nprobe None = the engine no-config default (size-aware
        # fraction + sub-resolution shortlist scaling, resolved
        # in-engine); the explicit arms pin the historical layouts
        for layout, cells, nprobe in (
                ("fixed8_np2", 8, 2),
                ("sized_np2", sized, 2),
                ("sized_np_auto", sized, None)):
            arm = f"{layout}_m{m}"
            cents = standin_centroids(emb, "vec_id", "embedding", cells)
            idx_path = os.path.join(STAGE_ROOT, Path(sf_dir).name,
                                    f"m{m}_c{cells}")
            if not os.path.exists(os.path.join(idx_path, "_pq_meta.json")):
                shutil.rmtree(idx_path, ignore_errors=True)
                write_pq_index(emb, books, cents, idx_path)
            idx, rbooks, rcents, meta = read_pq_index(spark, idx_path)
            occ = meta.get("cell_occupancy") or {}
            p95 = occ.get("p95")
            sidecar_n = occ.get("n_vectors")
            t0 = time.perf_counter()
            resolved: dict = {}
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")  # guard/remediation
                got = {(r.query_id, r.neighbor_id)
                       for r in ivfpq_rerank_topk(
                           queries, emb, rbooks, k=K, shortlist=50,
                           nprobe=nprobe, centroids=rcents,
                           corpus_index=idx, cell_occupancy_p95=p95,
                           occupancy_guard="auto",
                           corpus_n=sidecar_n,
                           resolved_params=resolved).collect()}
            # ENGINE-reported resolution (resolved_params) — the JSON
            # publishes what the call actually ran, not a script-side
            # mirror of the default arithmetic that would silently
            # desync when the defaults change
            row["arms"][arm] = {
                "m": m, "k_codebook": kk, "n_centroids": cells,
                "nprobe": resolved["nprobe"],
                "auto": resolved["auto_nprobe"],
                "shortlist_effective": resolved["shortlist"],
                "p95_occupancy": p95,
                "recall_at_10": round(len(got & truth) / len(truth), 3),
                "rerank_sec": round(time.perf_counter() - t0, 1),
            }
            print(f"{sf_dir} {arm}: cells={cells} "
                  f"nprobe={resolved['nprobe']} "
                  f"shortlist={resolved['shortlist']} p95={p95} "
                  f"recall@10={row['arms'][arm]['recall_at_10']}",
                  flush=True)
    emb.unpersist()
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dirs", nargs="*", default=["/tmp/sf1", "/tmp/emb200k"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from etl_router_spark.session import get_spark

    spark = get_spark("ivfpq_recall_arms")
    out = {"chain_recipe": "pq_train + standin centroids + "
                           "write_pq_index sidecar -> rerank guard=auto "
                           "shortlist=50; sized_np_auto arm = the "
                           "engine no-config default (nprobe=None, "
                           "corpus_n from the sidecar n_vectors)",
           "rows": [run_dir(spark, d) for d in args.sf_dirs]}
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
