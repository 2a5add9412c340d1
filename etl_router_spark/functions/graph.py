"""Link-graph analytics for corpus curation.

Web-scale training corpora carry a link graph (page -> page, domain ->
domain), and published curation pipelines weight documents by
link-graph centrality (e.g. Common Crawl's harmonic-centrality-ranked
host lists). This module provides the graph primitives a 100 TB corpus
pipeline needs, each as a composition of DataFrame joins/aggregations
— no GraphX/GraphFrames dependency, no driver-side adjacency:

- ``degree_stats``        per-node in/out degree + total (one shuffle)
- ``pagerank``            damped PageRank with dangling-mass
                          redistribution; fixed iteration count,
                          per-round lineage cuts (local or reliable
                          checkpoint via ``checkpoint_dir=``)
- ``triangle_count``      per-node triangle counts via degree-ordered
                          orientation (each triangle counted once)

Reference parity: the reference engine (alexchoi0/etl-router) has no
graph operators — this extends the LLM-data-pipeline operator set the
project adds beyond the reference surface (BASELINE.json north star),
alongside `functions/dedup.py`'s connected components.

Scale notes (100 TB / billions of edges):
- Every step shuffles node-id-keyed aggregates, never adjacency lists
  wider than one node's neighborhood; the only scalars that leave the
  executors are single-row aggregates (node count, dangling mass) that
  ride as broadcast 1-row cross joins — no ``collect()`` on any path.
- PageRank materializes each iteration eagerly (lineage would
  otherwise double per round and re-execute the whole prefix on each
  action — same discipline as ``dedup.connected_components``):
  executor-local checkpoint by default, reliable fault-tolerant
  ``checkpoint()`` when ``checkpoint_dir=`` is passed (cluster jobs
  that must survive executor loss mid-iteration).
- ``triangle_count`` orients edges from the lower-degree endpoint to
  the higher (ties by id), so a node of degree d contributes at most
  C(d_oriented, 2) wedge checks and hub nodes never explode — the
  standard degree-ordering bound (arboricity-style) used by every
  distributed triangle counter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_router_spark.functions.iterate import materialize


def _canonical_edges(
    edges: DataFrame, src: str, dst: str, assume_simple: bool = False
) -> DataFrame:
    """Distinct directed edges with self-loops dropped (both PageRank
    and triangle semantics here are simple-graph). ``assume_simple``
    skips the dedup shuffle when the caller guarantees the edge set is
    already distinct (e.g. produced by an upstream ``groupBy``/
    ``distinct``) — at billions of edges that is a whole pass saved."""
    out = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).filter(
        F.col("src") != F.col("dst")
    )
    return out if assume_simple else out.distinct()


def nodes_of(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Distinct node ids appearing as either endpoint (one column ``id``)."""
    return (
        edges.select(F.col(src).alias("id"))
        .unionAll(edges.select(F.col(dst).alias("id")))
        .distinct()
    )


def degree_stats(
    edges: DataFrame, src: str, dst: str, assume_simple: bool = False
) -> DataFrame:
    """Per-node degree statistics over the distinct directed edge set.

    Returns ``id, out_degree, in_degree, degree`` (degree = out + in;
    a node linked in both directions counts each direction). Plan (r15):
    each edge explodes into its two endpoint rows ``(id, is_out)`` and
    ONE stacked aggregation counts both directions — one pass over the
    edge set, one narrow (id, flag) shuffle with map-side partial
    aggregation, no join. (The previous shape — two independent
    per-direction aggregates full-outer sort-merge-merged on id —
    computed the whole edge subtree twice and paid two exchanges, two
    sorts and a join for the same integers.)
    """
    e = _canonical_edges(edges, src, dst, assume_simple)
    stacked = e.select(
        F.explode(
            F.array(
                F.struct(F.col("src").alias("id"), F.lit(1).alias("o")),
                F.struct(F.col("dst").alias("id"), F.lit(0).alias("o")),
            )
        ).alias("end")
    ).select("end.id", "end.o")
    return stacked.groupBy("id").agg(
        F.sum("o").alias("out_degree"),
        (F.count("*") - F.sum("o")).alias("in_degree"),
        F.count("*").alias("degree"),
    )


def pagerank(
    edges: DataFrame,
    src: str,
    dst: str,
    iterations: int = 10,
    damping: float = 0.85,
    broadcast_nodes: int = 2_000_000,
    assume_simple: bool = False,
    weight_col: str | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Damped PageRank over the distinct directed edge set.

    Semantics (the textbook power-iteration form, Page et al. 1999,
    with uniform dangling-mass redistribution):

      pr_0(v)    = 1/N
      pr_k+1(v)  = (1-d)/N + d * (sum_{u->v} pr_k(u)/outdeg(u)
                                  + dangling_k/N)
      dangling_k = sum of pr_k(u) over nodes with no out-edges

    so ``sum(pr) == 1`` is invariant at every step. Fixed
    ``iterations`` (deterministic, oracle-matchable) rather than an
    epsilon stop; 10 rounds is the usual operating point for ranking
    (values move < 1e-3 after that on power-law graphs).

    Plan: (edges ⋈ out-degree) materializes ONCE before the loop, so
    each iteration is a single join with the rank vector ->
    groupBy(dst) partial-agg -> nodes left-join. The node count is
    read once (one long — the only driver-side scalar; same class as
    a parquet footer read) and embedded as a literal; dangling mass
    stays a per-round 1-row aggregate riding as a broadcast cross
    join. When the graph has at most ``broadcast_nodes`` nodes the
    rank vector (id + one double) is broadcast-hinted into the
    contribution join so the EDGE SET NEVER RESHUFFLES across rounds
    — above that, the join shuffles ranks against the pre-partitioned
    edges (at 10^9+ nodes pre-bucket both by id to pin even that).
    The rank vector is materialized each round to cut lineage:
    executor-local checkpoint by default, or a reliable fault-tolerant
    ``checkpoint()`` when ``checkpoint_dir`` is set (survives executor
    loss mid-iteration — use it for long cluster jobs; see
    ``functions/iterate.py``).

    Returns ``id, pagerank`` (raw double — callers round for
    presentation).
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if weight_col is not None:
        # weighted variant: a neighbor receives pr(u) * w(u,v) / W(u)
        # with W(u) the sum of u's outgoing weights — same plan, the
        # out-degree aggregate becomes a weight sum
        e = (
            edges.select(
                F.col(src).alias("src"), F.col(dst).alias("dst"),
                F.col(weight_col).cast("double").alias("__w"),
            )
            .filter(F.col("src") != F.col("dst"))
        )
        if not assume_simple:
            e = e.groupBy("src", "dst").agg(F.sum("__w").alias("__w"))
    else:
        e = _canonical_edges(edges, src, dst, assume_simple).withColumn(
            "__w", F.lit(1.0)
        )
    nodes = nodes_of(e).persist()
    n = nodes.count()  # one long to the driver; also materializes nodes

    out_d = e.groupBy(F.col("src").alias("id")).agg(
        F.sum("__w").alias("__outdeg")
    )
    small = n <= broadcast_nodes
    # per-edge out-weight resolved once, reused by every iteration
    edges_deg = (
        e.join(out_d.withColumnsRenamed({"id": "src"}), "src")
        .select("src", "dst", "__w", "__outdeg")
    )
    if small:
        # broadcast-rank mode: the ONLY per-iteration row shuffle left
        # is the contribution groupBy(dst). Cluster the cached edge set
        # by dst ONCE (BY_COL — AQE sizes the partition count from
        # measured bytes) so every round's aggregation reuses the
        # cached clustering instead of re-exchanging the edge set:
        # iterations-many edge-sized shuffles become one (guide §2.4 —
        # operations keyed the same way share one exchange). In shuffle
        # mode the rank join re-partitions by src each round anyway, so
        # dst clustering would buy nothing there (pre-bucket both by id
        # at 10^9+ nodes instead, per the docstring).
        edges_deg = edges_deg.repartition(F.col("dst"))
    edges_deg = edges_deg.persist()
    dangling_ids = nodes.join(
        out_d, "id", "left_anti"
    ).persist()  # nodes with no out-edges
    ranks = materialize(
        nodes.select("id", (F.lit(1.0) / F.lit(float(n))).alias("pr")),
        checkpoint_dir,
    )
    for _ in range(iterations):
        ranks_j = F.broadcast(ranks) if small else ranks
        contrib = (
            edges_deg.join(
                ranks_j.withColumnsRenamed({"id": "src"}), "src"
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("pr") * F.col("__w") / F.col("__outdeg")).alias("__c"))
        )
        dangling = (
            ranks.join(
                F.broadcast(dangling_ids) if small else dangling_ids,
                "id", "left_semi",
            )
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("__dm"))
        )
        ranks = materialize(
            nodes.join(contrib, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit(1.0 - damping) / F.lit(float(n))
                    + F.lit(damping)
                    * (
                        F.coalesce("__c", F.lit(0.0))
                        + F.col("__dm") / F.lit(float(n))
                    )
                ).alias("pr"),
            ),
            checkpoint_dir,
        )
    # the final rank vector is checkpointed (self-contained RDD);
    # release the loop-support caches so long-lived sessions running
    # many graphs don't accumulate executor storage
    for cached in (edges_deg, dangling_ids, nodes):
        cached.unpersist()
    return ranks.select("id", F.col("pr").alias("pagerank"))


def triangle_count(
    edges: DataFrame,
    src: str,
    dst: str,
    assume_simple: bool = False,
    checkpoint_dir: str | None = None,
    eager: bool = True,
) -> DataFrame:
    """Per-node triangle participation counts, direction-blind.

    The edge set is first symmetrized to an undirected simple graph,
    then oriented low-degree -> high-degree (ties by id): every
    triangle has exactly one node whose two oriented out-edges point
    at the other two, so joining oriented wedges (a->b, a->c with
    b < c in the orientation order) against the oriented edge (b->c)
    counts each triangle exactly once. Degree-ordering bounds the
    per-node wedge fan-out — a celebrity node with degree 10^6 has
    near-zero oriented out-degree, so the wedge explode cannot
    single-task (the standard MapReduce triangle-counting bound,
    Suri & Vassilvitskii 2011).

    Returns ``id, triangles`` for every node in at least one triangle.
    """
    e = _canonical_edges(edges, src, dst, assume_simple)
    und = (
        e.select("src", "dst")
        .unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    deg = und.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("__deg"))

    # orientation order: (degree, id) lexicographic, encoded as a
    # sortable struct comparison
    def _rank(d: Column, i: Column) -> Column:
        return F.struct(d.alias("d"), i.alias("i"))

    # keep the dst's rank components on each oriented edge: wedge
    # pairing must follow the SAME (degree, id) order as the
    # orientation itself — for a triangle ranked x < y < z the closing
    # edge is stored as y->z, so the wedge at x must emit (y, z) in
    # rank order (pairing by raw id would look up z->y and miss it)
    oriented = (
        und.join(deg.withColumnsRenamed({"id": "src", "__deg": "__ds"}), "src")
        .join(deg.withColumnsRenamed({"id": "dst", "__deg": "__dd"}), "dst")
        .filter(_rank(F.col("__ds"), F.col("src")) < _rank(F.col("__dd"), F.col("dst")))
        .select("src", "dst", "__dd")
        .persist()
    )
    wedges = (
        oriented.alias("e1")
        .join(oriented.alias("e2"), F.col("e1.src") == F.col("e2.src"))
        .filter(
            _rank(F.col("e1.__dd"), F.col("e1.dst"))
            < _rank(F.col("e2.__dd"), F.col("e2.dst"))
        )
        .select(
            F.col("e1.src").alias("a"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
        )
    )
    tris = wedges.join(
        oriented.select(F.col("src").alias("b"), F.col("dst").alias("c")),
        ["b", "c"],
        "inner",
    )
    per_node = (
        tris.select(F.col("a").alias("id"))
        .unionAll(tris.select(F.col("b").alias("id")))
        .unionAll(tris.select(F.col("c").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("triangles"))
    )
    if not eager:
        # lazy mode for plan-inspection callers (manifest compile /
        # `explain`): the result stays a plan; the oriented cache is
        # then released only by session end or caller unpersist — the
        # pre-round-5 tradeoff, opt-in
        return per_node
    # materialize the (small: one row per triangle-member node) result
    # so the oriented-edge cache can be released before returning —
    # otherwise every call leaks executor storage in long sessions
    per_node = materialize(per_node, checkpoint_dir)
    oriented.unpersist()
    return per_node
