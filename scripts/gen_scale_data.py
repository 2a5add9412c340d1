"""Generate a scaled copy of the star schema for scale-curve sweeps.

The driver's fixtures stop at sf0.1 (and /root/testdata is read-only),
so empirical 10x scaling measurements need a larger dataset with the
SAME schema, dtypes and distribution shape. This generator measures the
distribution parameters it can from the reference SF directory (vocab,
category frequencies, value ranges) and synthesizes `--scale` times the
rows with a fixed numpy seed — deterministic, self-contained, no
network, writes only under the given --out.

Usage:
    python scripts/gen_scale_data.py --out /tmp/sf1 --scale 10

Distribution shapes mirrored from the sf0.1 fixtures:
- lineitem lines-per-order ~ Poisson(4) with zeros dropped (matches the
  observed 147236/150000 orders having >=1 line and the 1..17 tail)
- documents: word-salad from the reference's vocab, 10..100 words,
  measured lang skew, uniform 20 sources, ~0.16% planted exact dups
- embeddings: 64-dim unit-norm float32 with 10 label-aligned clusters
  (cosine neighbors exist, as in the reference fixture)
"""

from __future__ import annotations

import argparse

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts_us(start: str, end: str, n: int, rng) -> np.ndarray:
    lo = np.datetime64(start, "us").astype("int64")
    hi = np.datetime64(end, "us").astype("int64")
    return rng.integers(lo, hi, n).astype("datetime64[us]")


def _round2(x: np.ndarray) -> np.ndarray:
    return np.round(x, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--ref", default="/root/testdata/sf0.1")
    ap.add_argument("--scale", type=float, default=10.0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--tables", default=None,
                    help="comma list to generate only these tables "
                         "(e.g. 'embeddings' for a vectors-only dir — "
                         "scale 100 of everything would put ~60M "
                         "lineitem rows through driver numpy for a "
                         "sweep that reads one table)")
    args = ap.parse_args()

    import os

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    ref, out, s = args.ref, args.out, args.scale
    only = (set(t.strip() for t in args.tables.split(","))
            if args.tables else None)

    def write(name: str, table: pa.Table) -> None:
        pq.write_table(table, f"{out}/{name}.parquet")
        print(f"{name}: {table.num_rows} rows")

    if only is not None:
        unsupported = only - {"embeddings"}
        if unsupported:
            raise SystemExit(
                "--tables supports only the self-contained tables "
                f"(embeddings); got {sorted(unsupported)} — the star-"
                "schema tables cross-reference each other's key ranges")
        write("embeddings", _gen_embeddings(rng, int(2_000 * s)))
        return

    # nation/region: fixed dimensions, copied verbatim
    for t in ("nation", "region"):
        write(t, pq.read_table(f"{ref}/{t}.parquet"))

    n_cust = int(15_000 * s)
    n_ord = int(150_000 * s)
    n_part = int(20_000 * s)
    n_supp = int(1_000 * s)
    n_evt = int(100_000 * s)
    n_doc = int(5_000 * s)
    n_emb = int(2_000 * s)

    # --- customer ---
    segs = np.array(["HOUSEHOLD", "MACHINERY", "FURNITURE", "AUTOMOBILE",
                     "BUILDING"])
    write("customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": _round2(rng.uniform(-1000, 10_000, n_cust)),
        "c_mktsegment": pa.array(segs[rng.integers(0, 5, n_cust)]),
    }))

    # --- part (names/brands/types sampled from the reference's sets) ---
    refp = pq.read_table(f"{ref}/part.parquet")
    names = np.array(refp.column("p_name").unique().to_pylist())
    types = np.array(refp.column("p_type").unique().to_pylist())
    write("part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array(names[rng.integers(0, len(names), n_part)]),
        "p_brand": pa.array([f"Brand#{b}" for b in
                             rng.integers(1, 26, n_part)]),
        "p_type": pa.array(types[rng.integers(0, len(types), n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": _round2(rng.uniform(900, 1000, n_part)),
    }))

    # --- supplier ---
    write("supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": _round2(rng.uniform(0, 10_000, n_supp)),
    }))

    # --- orders ---
    stats = np.array(["O", "P", "F"])
    prios = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                      "5-LOW"])
    write("orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(stats[rng.integers(0, 3, n_ord)]),
        "o_totalprice": _round2(rng.uniform(1000, 500_000, n_ord)),
        "o_orderdate": pa.array(_ts_us("1995-01-01", "2001-08-01", n_ord,
                                       rng), pa.timestamp("us")),
        "o_orderpriority": pa.array(prios[rng.integers(0, 5, n_ord)]),
    }))

    # --- lineitem: lines/order ~ Poisson(4), zeros dropped ---
    counts = rng.poisson(4.0, n_ord)
    okeys = np.repeat(np.arange(n_ord), counts)
    n_li = len(okeys)
    linenum = (np.concatenate([np.arange(c) for c in counts if c]) % 7) + 1
    rflag = np.array(["A", "N", "R"])
    lstat = np.array(["O", "F"])
    write("lineitem", pa.table({
        "l_orderkey": pa.array(okeys, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenum, pa.int32()),
        "l_quantity": np.floor(rng.uniform(1, 51, n_li)),
        "l_extendedprice": _round2(rng.uniform(900, 105_000, n_li)),
        "l_discount": _round2(rng.uniform(0, 0.1, n_li)),
        "l_tax": _round2(rng.uniform(0, 0.08, n_li)),
        "l_returnflag": pa.array(rflag[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(lstat[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(_ts_us("1995-01-02", "2001-11-04", n_li,
                                      rng), pa.timestamp("us")),
    }))

    # --- events ---
    etypes = np.array(["click", "view", "purchase", "signup", "error"])
    write("events", pa.table({
        "event_id": pa.array(np.arange(n_evt), pa.int64()),
        "ts": pa.array(np.sort(_ts_us("2024-01-01", "2024-01-31", n_evt,
                                      rng)), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, int(1500 * s), n_evt),
                            pa.int64()),
        "event_type": pa.array(etypes[rng.integers(0, 5, n_evt)]),
        "value": _round2(rng.uniform(0, 560, n_evt)),
        "props": pa.array([f'{{"k": {k}}}' for k in
                           rng.integers(0, 100, n_evt)]),
    }))

    # --- documents: measured vocab + lang skew, planted exact dups ---
    refd = pq.read_table(f"{ref}/documents.parquet",
                         columns=["text", "lang"]).to_pydict()
    vocab = np.array(sorted({w for t in refd["text"]
                             for w in (t or "").split()}))
    langs, lcounts = np.unique(np.array(refd["lang"]), return_counts=True)
    lprob = lcounts / lcounts.sum()
    lens = rng.integers(10, 101, n_doc)
    starts = np.concatenate([[0], np.cumsum(lens)])
    words = vocab[rng.integers(0, len(vocab), int(starts[-1]))]
    texts = [" ".join(words[starts[i]:starts[i + 1]])
             for i in range(n_doc)]
    # exact duplicates at the reference's ~0.16% rate
    dup_idx = rng.choice(n_doc, max(1, int(0.0016 * n_doc)), replace=False)
    for i in dup_idx:
        texts[i] = texts[int(rng.integers(0, n_doc))]
    write("documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs[rng.choice(len(langs), n_doc, p=lprob)]),
        "source": pa.array([f"src{i}" for i in
                            rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
    }))

    # --- embeddings: unit-norm float32, label-aligned clusters ---
    write("embeddings", _gen_embeddings(rng, n_emb))


def _gen_embeddings(rng, n_emb: int) -> pa.Table:
    dim, n_lab = 64, 10
    centers = rng.normal(0, 1, (n_lab, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, n_lab, n_emb)
    vecs = 0.8 * centers[labels] + 0.6 * rng.normal(0, 1 / np.sqrt(dim),
                                                    (n_emb, dim))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
            ).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })


if __name__ == "__main__":
    main()
