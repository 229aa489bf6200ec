"""KG graph materialization — degree stats, PageRank, k-hop expansion.

The reference stops at per-document annotations (bern2/bern2.py:504-528
output shaping); the north-star pipeline materializes a graph from the
triple store. ``operators/cooccur.py`` builds the weighted entity-entity
edge list; this module adds the standard derived artifacts a KG service
ships alongside it: per-node degree/strength, a fixed-iteration
PageRank centrality column, and bounded k-hop neighborhoods for
entity-centric retrieval.

Scale shape:
* every step is a join or aggregation keyed on a node id — one shuffle
  per step, map-side combined, row width ~(16B id + 8B value);
* PageRank's iteration state is ``localCheckpoint``-ed so the plan stays
  flat in the iteration count (same discipline as
  ``dataprep/cluster.connected_components``); on a preemptible cluster
  swap in a reliable ``checkpoint`` dir;
* the only driver-side scalar is the node count (one ``count()``), the
  MLlib-standard shape for normalized centralities;
* k-hop expansion joins the (small) frontier against the full edge list
  — the frontier side is broadcast when it fits, and the visited-set
  anti-join keeps frontiers from re-expanding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def symmetrize(edges: DataFrame,
               src_col: str = "cui_a", dst_col: str = "cui_b",
               weight_col: str | None = None) -> DataFrame:
    """Undirected (a, b[, w]) edge list -> directed (src, dst[, w])
    with both orientations, self-loops dropped. The canonical input is
    ``cooccurrence_edges`` output (a < b guaranteed there, but the
    filter keeps this safe for arbitrary edge tables)."""
    cols = [F.col(src_col).alias("src"), F.col(dst_col).alias("dst")]
    rcols = [F.col(dst_col).alias("src"), F.col(src_col).alias("dst")]
    if weight_col is not None:
        cols.append(F.col(weight_col).alias("weight"))
        rcols.append(F.col(weight_col).alias("weight"))
    return (edges.select(*cols)
            .unionByName(edges.select(*rcols))
            .filter(F.col("src") != F.col("dst")))


def degree_stats(edges: DataFrame,
                 src_col: str = "cui_a", dst_col: str = "cui_b",
                 weight_col: str | None = None) -> DataFrame:
    """(node, degree[, strength]) per node of the undirected graph.
    One symmetrize + one groupBy — degree is the edge count, strength
    the weight sum (only when ``weight_col`` given)."""
    e = symmetrize(edges, src_col, dst_col, weight_col)
    aggs = [F.count("*").alias("degree")]
    if weight_col is not None:
        aggs.append(F.sum("weight").alias("strength"))
    return (e.groupBy(F.col("src").alias("node")).agg(*aggs))


def pagerank(edges: DataFrame,
             src_col: str = "cui_a", dst_col: str = "cui_b",
             iterations: int = 5, damping: float = 0.85,
             round_to: int | None = 9) -> DataFrame:
    """Fixed-iteration PageRank over the undirected graph: (node, rank).

    Power iteration in its DataFrame form: rank flows along out-edges
    split by out-degree, re-aggregated per destination, damped against
    the uniform teleport. A symmetrized graph has no dangling nodes
    (every node in the edge list has out-degree >= 1), so no dangling
    redistribution term is needed — isolated nodes simply don't appear,
    matching the semantics of a graph *derived from* an edge list.

    Per iteration: one shuffle for the rank join (co-partitioned with
    the degree-annotated edge list, which is shuffled once before the
    loop and checkpointed) + one map-side-combined groupBy. The plan is
    truncated every iteration via ``localCheckpoint`` so 50 iterations
    cost the same per-round as 5.

    ``round_to`` rounds the final rank for stable cross-engine
    comparison (sum order differs between engines; the fixed-point is
    identical to ~1e-15 relative)."""
    e = symmetrize(edges, src_col, dst_col)
    deg = e.groupBy("src").agg(F.count("*").alias("_deg"))
    # degree-annotated edges: shuffled on src ONCE, reused every round
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    nodes = ed.select(F.col("src").alias("node")).distinct() \
              .localCheckpoint(eager=True)
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    teleport = (1.0 - damping) / n
    for _ in range(iterations):
        inflow = (ed.join(ranks.withColumnRenamed("node", "src"), "src")
                  .groupBy(F.col("dst").alias("node"))
                  .agg(F.sum(F.col("rank") / F.col("_deg"))
                       .alias("_in")))
        ranks = (nodes.join(inflow, "node", "left")
                 .select("node",
                         (F.lit(teleport)
                          + F.lit(damping) * F.coalesce("_in", F.lit(0.0)))
                         .alias("rank"))
                 .localCheckpoint(eager=True))
    if round_to is not None:
        ranks = ranks.select("node", F.round("rank", round_to).alias("rank"))
    return ranks


def khop_neighborhood(edges: DataFrame, sources: DataFrame, k: int,
                      src_col: str = "cui_a", dst_col: str = "cui_b"
                      ) -> DataFrame:
    """Bounded BFS: (root, node, hops) with hops = min distance <= k,
    for every root in ``sources`` (a one-column DataFrame ``root``).
    hops=0 rows (the roots themselves) are included.

    The frontier table carries (root, node) pairs — at hop h it is the
    h-sphere of every root simultaneously, so one pass serves all roots
    (contrast a per-root loop: k joins total, not k*|roots|). The
    visited anti-join guarantees min-distance semantics and monotone
    frontier shrinkage on finite graphs."""
    e = symmetrize(edges, src_col, dst_col) \
        .localCheckpoint(eager=True)
    visited = (sources.select(F.col("root"),
                              F.col("root").alias("node"),
                              F.lit(0).alias("hops"))
               .localCheckpoint(eager=True))
    frontier = visited
    for h in range(1, k + 1):
        nxt = (frontier
               .join(e, frontier["node"] == e["src"])
               .select("root", F.col("dst").alias("node"))
               .distinct())
        frontier = (nxt.join(visited.select("root", "node"),
                             ["root", "node"], "left_anti")
                    .withColumn("hops", F.lit(h))
                    .localCheckpoint(eager=True))
        if frontier.isEmpty():
            break
        visited = visited.unionByName(frontier) \
                         .localCheckpoint(eager=True)
    return visited


def triangle_counts(edges: DataFrame,
                    src_col: str = "cui_a",
                    dst_col: str = "cui_b") -> DataFrame:
    """Per-node triangle participation: (node, triangles).

    Uses the degree-orientation trick (the compact-forward /
    node-iterator++ algorithm): every undirected edge is directed from
    its lower-(degree, id) endpoint to the higher one, making the
    oriented out-degree at most O(sqrt(m)) for any node regardless of
    skew. Wedges are then an out-out self-join on the wedge center and
    each candidate is closed by one semi-join against the oriented edge
    list — total work O(m^1.5) instead of the O(sum deg^2) a naive
    neighbor-pair join pays on a skewed graph (a celebrity node with
    10^7 neighbors would otherwise emit 10^14 wedges). Each triangle is
    enumerated exactly once (its vertices are totally ordered), then
    credited to all three corners with a map-side-combined groupBy."""
    deg = degree_stats(edges, src_col, dst_col) \
        .select("node", "degree")
    canon = (symmetrize(edges, src_col, dst_col)
             .filter(F.col("src") < F.col("dst"))
             .distinct())
    da = deg.select(F.col("node").alias("src"),
                    F.col("degree").alias("_ds"))
    db = deg.select(F.col("node").alias("dst"),
                    F.col("degree").alias("_dd"))
    ranked = canon.join(da, "src").join(db, "dst")
    lo_first = (F.col("_ds") < F.col("_dd")) | \
               ((F.col("_ds") == F.col("_dd"))
                & (F.col("src") < F.col("dst")))
    oriented = (ranked.select(
        F.when(lo_first, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(lo_first, F.col("dst")).otherwise(F.col("src")).alias("v"))
        .localCheckpoint(eager=True))
    e1 = oriented.select(F.col("u").alias("x"), F.col("v").alias("a"))
    e2 = oriented.select(F.col("u").alias("x"), F.col("v").alias("b"))
    wedges = (e1.join(e2, "x")
              .filter(F.col("a") < F.col("b")))
    # close the wedge: (a, b) must be an oriented edge in EITHER
    # direction (orientation order and id order disagree in general)
    closing = oriented.select(
        F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b"))
    tri = wedges.join(closing, ["a", "b"], "left_semi")
    corners = (tri.select(F.col("x").alias("node"))
               .unionByName(tri.select(F.col("a").alias("node")))
               .unionByName(tri.select(F.col("b").alias("node"))))
    return corners.groupBy("node").agg(F.count("*").alias("triangles"))


def clustering_coefficient(edges: DataFrame,
                           src_col: str = "cui_a",
                           dst_col: str = "cui_b",
                           round_to: int | None = 9) -> DataFrame:
    """Local clustering coefficient per node: 2*triangles /
    (degree * (degree - 1)); degree-1 nodes get 0. One triangle pass +
    one degree pass + a node-keyed join."""
    t = triangle_counts(edges, src_col, dst_col)
    d = degree_stats(edges, src_col, dst_col).select("node", "degree")
    cc = (d.join(t, "node", "left")
          .select("node", "degree",
                  F.coalesce("triangles", F.lit(0)).alias("triangles"))
          .withColumn(
              "clustering",
              F.when(F.col("degree") >= 2,
                     2.0 * F.col("triangles")
                     / (F.col("degree") * (F.col("degree") - 1)))
               .otherwise(F.lit(0.0))))
    if round_to is not None:
        cc = cc.withColumn("clustering",
                           F.round("clustering", round_to))
    return cc


def negative_samples(triples, entities, k: int = 2,
                     obj_col: str = "obj"):
    """Deterministic tail-corruption negative sampling for KG
    embedding training (the TransE/DistMult recipe): each (subj,
    pred, obj) triple yields ``k`` corrupted copies whose object is a
    pseudo-random OTHER entity, picked by an engine-portable hash so
    the sample is bit-stable (no RNG, reproducible per epoch seed).

    Plan shape: the entity vocabulary is ranked once (one window
    sort), the triples explode k seed rows, the pick index is
    md5(subj:pred:obj:seed) mod |entities|, and the pick itself is an
    equi-join on the index — broadcast while the vocabulary fits
    (entity catalogs are ~10^7 rows, trivially broadcastable), SMJ
    co-partitioned on the index beyond that.  Corrupted copies that
    collide with the true object are kept and flagged (``collision``)
    rather than resampled — resampling loops are nondeterministic
    under distribution; downstream training filters on the flag."""
    from bern2_spark.dataprep.sketch import uniform_hash_col

    ent = (entities.select(F.col(entities.columns[0]).alias("_ent"))
           .distinct())
    n = ent.count()  # one scalar; the ranked vocab is reused below
    ranked = ent.withColumn(
        "_idx", F.row_number().over(Window.orderBy("_ent")) - 1)
    seeds = F.explode(F.array(*[F.lit(i) for i in range(k)]))
    t = triples.withColumn("seed", seeds)
    key = F.concat(F.col("subj"), F.lit(":"), F.col("pred"),
                   F.lit(":"), F.col(obj_col), F.lit(":"),
                   F.col("seed").cast("string"))
    # reuse the engine-portable 52-bit md5 fraction: floor(u * n) is a
    # uniform index both engines compute identically
    idx = F.floor(uniform_hash_col(key) * n).cast("long")
    t = t.withColumn("_idx", F.least(idx, F.lit(n - 1)))
    out = (t.join(F.broadcast(ranked), "_idx")
           .select("subj", "pred",
                   F.col(obj_col).alias("true_obj"),
                   "seed",
                   F.col("_ent").alias("neg_obj"))
           .withColumn("collision",
                       F.col("neg_obj") == F.col("true_obj")))
    return out


def trim_to_cycles(edges: DataFrame, src_col: str = "src",
                   dst_col: str = "dst", rounds: int = 5) -> DataFrame:
    """Iteratively trim the digraph down to its cycle-bearing core:
    each round drops every edge whose source never appears as a
    destination (in-degree 0) or whose destination never appears as a
    source (out-degree 0) — acyclic chains and trees peel away, and
    what survives ``rounds`` rounds is exactly the edges reachable
    from AND leading back to a cycle through chains shorter than
    ``rounds`` (the standard trimming prelude of SCC algorithms, e.g.
    Hong et al. 2013; a fixed round count keeps the fixed point
    hash-checkable the same way the unrolled PageRank oracle does —
    pick rounds >= the longest dangling chain to certify the exact
    cycle core).

    Scale shape: one round = two semi-joins keyed on a node id —
    co-partitioned shuffles of (src, dst) pairs only, nothing wider;
    ``localCheckpoint`` per round keeps the plan flat in the round
    count (the module's iteration discipline).  Convergence is
    typically after the longest chain, far before ``rounds`` on real
    dependency graphs."""
    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .distinct().localCheckpoint(eager=True))
    for _ in range(rounds):
        has_in = e.select(F.col("dst").alias("src")).distinct()
        has_out = e.select(F.col("src").alias("dst")).distinct()
        e = (e.join(has_in, "src", "left_semi")
             .join(has_out, "dst", "left_semi")
             .select("src", "dst")
             .localCheckpoint(eager=True))
    return e


def transitive_closure(edges: DataFrame,
                       src_col: str = "src",
                       dst_col: str = "dst",
                       max_rounds: int = 16) -> DataFrame:
    """Full reachability closure over a DAG edge list — the ontology
    materialization step (every ancestor of every node, the is-a
    closure MeSH/GO-style hierarchies ship pre-expanded so lookups
    are one equi-join instead of a runtime walk).

    Path-doubling (Valiant): after round r the relation holds every
    pair connected by a path of length <= 2^r, so a hierarchy of
    depth d closes in ceil(log2 d) self-joins — 50 levels in 6
    rounds, vs 50 frontier iterations for the naive chase.  Each
    round is one co-partitioned self-join on the midpoint column
    plus a distinct on the (src, dst) pair; ``localCheckpoint``
    truncates the self-referential lineage exactly as the
    connected-components loop does (dataprep/cluster.py).  The loop
    exits on the first round that adds no pair (count compared on
    8-byte pair counts, not materialized rows).

    Output: ``(src, dst)`` — src reaches dst by >= 1 edge."""
    r = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .filter(F.col("src") != F.col("dst"))
         .distinct()
         .localCheckpoint(eager=True))
    n = r.count()
    for _ in range(max_rounds):
        mid = r.select(F.col("src").alias("_m"),
                       F.col("dst").alias("dst"))
        two = (r.select("src", F.col("dst").alias("_m"))
               .join(mid, "_m")
               .select("src", "dst"))
        r = (r.unionByName(two)
             .filter(F.col("src") != F.col("dst"))
             .distinct()
             .localCheckpoint(eager=True))
        m = r.count()
        if m == n:
            break
        n = m
    return r


def label_propagation(edges: DataFrame,
                      src_col: str = "cui_a", dst_col: str = "cui_b",
                      weight_col: str | None = None,
                      iterations: int = 3) -> DataFrame:
    """Synchronous weighted label propagation (Raghavan et al. 2007)
    with a fixed iteration count — community detection that, unlike
    the connected-components communities (dataprep/cluster.py), can
    split a single connected blob into densely-linked groups.

    Every node starts labeled with itself; each round it adopts the
    label carrying the highest total edge weight among its neighbors'
    current labels, ties broken by the SMALLEST label — synchronous
    updates plus that tie-break make the result a pure function of the
    edge list, so the DuckDB oracle unrolls the same rounds as chained
    CTEs (the kg_pagerank discipline for iterative operators).

    Per round: one co-partitioned join of the label table against the
    degree-annotated edge list (shuffled once before the loop and
    checkpointed), one map-side-combined (node, label) weight sum, one
    per-node window argmax; ``localCheckpoint`` truncates the lineage
    each round.  Weights stay integral (doc counts), so the argmax
    compares exact longs — no float tie ambiguity across engines.

    Output: ``(node, community)``."""
    w = weight_col
    e = symmetrize(edges, src_col, dst_col, w)
    if w is None:
        e = e.withColumn("weight", F.lit(1))
    ed = e.localCheckpoint(eager=True)
    labels = (ed.select(F.col("src").alias("node")).distinct()
              .withColumn("label", F.col("node"))
              .localCheckpoint(eager=True))
    win = (Window.partitionBy("node")
           .orderBy(F.desc("_s"), F.asc("label")))
    for _ in range(iterations):
        labels = (ed.join(labels.withColumnRenamed("node", "src"), "src")
                  .groupBy(F.col("dst").alias("node"), "label")
                  .agg(F.sum("weight").alias("_s"))
                  .withColumn("_rn", F.row_number().over(win))
                  .filter(F.col("_rn") == 1)
                  .select("node", "label")
                  .localCheckpoint(eager=True))
    return labels.select("node", F.col("label").alias("community"))


def modularity(edges: DataFrame, labels: DataFrame,
               src_col: str = "cui_a", dst_col: str = "cui_b",
               weight_col: str | None = None,
               round_to: int | None = 6) -> DataFrame:
    """Per-community Newman modularity contributions (Newman 2004):
    for community c over the symmetrized weighted graph,
    q_c = w_in_c/2m − (w_tot_c/2m)², where w_in_c is the weight of
    (directed-both-ways) edges inside c, w_tot_c the strength sum of
    c's nodes, and 2m the total symmetrized weight.  Σ q_c is the
    partition's modularity Q — the standard quality score for the
    community operators (label_propagation, the component
    communities).

    ``labels`` is ``(node, community)``.  All sums are integral until
    the final division, so both engines hash identically after the
    6-place round.  Shape: two co-partitioned joins of the edge list
    against the label table (src then dst), one map-side-combined
    groupBy(community), a 1-row broadcast total.  Output:
    ``(community, n_nodes, w_in, w_tot, q_contrib)``."""
    e = symmetrize(edges, src_col, dst_col, weight_col)
    if weight_col is None:
        e = e.withColumn("weight", F.lit(1))
    la = labels.select(F.col("node").alias("src"),
                       F.col("community").alias("_ca"))
    lb = labels.select(F.col("node").alias("dst"),
                       F.col("community").alias("_cb"))
    j = e.join(la, "src").join(lb, "dst")
    pc = (j.groupBy(F.col("_ca").alias("community"))
          .agg(F.sum("weight").alias("w_tot"),
               F.sum(F.when(F.col("_ca") == F.col("_cb"),
                            F.col("weight")).otherwise(F.lit(0)))
               .alias("w_in")))
    nn = labels.groupBy("community").agg(F.count("*").alias("n_nodes"))
    m2 = e.agg(F.sum("weight").alias("_m2"))
    q = (F.col("w_in") / F.col("_m2")
         - (F.col("w_tot") / F.col("_m2"))
           * (F.col("w_tot") / F.col("_m2")))
    if round_to is not None:
        q = F.round(q, round_to)
    return (pc.join(nn, "community")
            .crossJoin(F.broadcast(m2))
            .select("community", "n_nodes", "w_in", "w_tot",
                    q.alias("q_contrib")))


def personalized_pagerank(edges: DataFrame, seeds: DataFrame,
                          src_col: str = "cui_a", dst_col: str = "cui_b",
                          iterations: int = 5, damping: float = 0.85,
                          round_to: int | None = 9) -> DataFrame:
    """Personalized PageRank (Haveliwala 2002): the power iteration of
    ``pagerank`` with the teleport mass restricted to ``seeds`` —
    entity-centric KG relevance ("what is most related to THESE
    entities"), the standard graph-retrieval primitive behind
    recommendation and query expansion.

    ``seeds`` is a 1-column ``(node)`` DataFrame; teleport splits
    (1−d)/|S| uniformly over it.  Nodes unreachable from the seed set
    keep rank 0 (they stay in the output — the vector is over the
    whole node set, like ``pagerank``).  Same plan shape per round:
    one co-partitioned join against the once-shuffled degree-annotated
    edge list + one map-side-combined groupBy; ``localCheckpoint``
    truncates lineage.  The seed table is broadcast into the teleport
    term (it is a query, not a corpus)."""
    e = symmetrize(edges, src_col, dst_col)
    deg = e.groupBy("src").agg(F.count("*").alias("_deg"))
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    nodes = ed.select(F.col("src").alias("node")).distinct() \
              .localCheckpoint(eager=True)
    s = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
    ns = s.count()
    if ns == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    seed_mark = F.broadcast(s.withColumn("_is_seed", F.lit(True)))
    base = (nodes.join(seed_mark, "node", "left")
            .select("node", F.coalesce("_is_seed", F.lit(False))
                    .alias("_is_seed"))
            .localCheckpoint(eager=True))
    tele = F.when(F.col("_is_seed"), F.lit((1.0 - damping) / ns)) \
            .otherwise(F.lit(0.0))
    init = F.when(F.col("_is_seed"), F.lit(1.0 / ns)).otherwise(F.lit(0.0))
    ranks = base.select("node", init.alias("rank"))
    for _ in range(iterations):
        inflow = (ed.join(ranks.withColumnRenamed("node", "src"), "src")
                  .groupBy(F.col("dst").alias("node"))
                  .agg(F.sum(F.col("rank") / F.col("_deg"))
                       .alias("_in")))
        ranks = (base.join(inflow, "node", "left")
                 .select("node", "_is_seed",
                         (tele + F.lit(damping)
                          * F.coalesce("_in", F.lit(0.0))).alias("rank"))
                 .localCheckpoint(eager=True))
    out = ranks.select("node", "rank")
    if round_to is not None:
        out = out.select("node", F.round("rank", round_to).alias("rank"))
    return out


def hits(edges: DataFrame,
         src_col: str = "src", dst_col: str = "dst",
         iterations: int = 5,
         round_to: int | None = 9) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over a DIRECTED edge
    list, L1-normalized each half-step, fixed iterations.  On the
    repo→package dependency graph the authority score surfaces the
    packages the ecosystem agrees on and the hub score the repos with
    the broadest footprint — directed semantics PageRank's symmetrized
    walk can't express.

    Every src has out-degree >= 1 and every dst in-degree >= 1 by
    construction (both are drawn from the edge list), so no zero rows
    drop out of the inner joins and the two score vectors stay
    complete.  Per half-step: one co-partitioned join against the
    once-shuffled checkpointed edge list, one map-side-combined
    groupBy, one 1-row broadcast normalizer.  Output:
    ``(node, score, kind)`` with kind in {'hub', 'authority'}."""
    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .distinct().localCheckpoint(eager=True))
    hub_nodes = e.select("src").distinct()
    nh = hub_nodes.count()
    if nh == 0:
        empty = hub_nodes.selectExpr("src as node",
                                     "cast(0.0 as double) as score",
                                     "'hub' as kind")
        return empty
    h = hub_nodes.select(F.col("src").alias("node"),
                         F.lit(1.0 / nh).alias("score"))
    a = None
    for _ in range(iterations):
        ar = (e.join(h.withColumnRenamed("node", "src"), "src")
              .groupBy(F.col("dst").alias("node"))
              .agg(F.sum("score").alias("_s")))
        a = (ar.crossJoin(F.broadcast(ar.agg(F.sum("_s").alias("_t"))))
             .select("node", (F.col("_s") / F.col("_t")).alias("score"))
             .localCheckpoint(eager=True))
        hr = (e.join(a.withColumnRenamed("node", "dst"), "dst")
              .groupBy(F.col("src").alias("node"))
              .agg(F.sum("score").alias("_s")))
        h = (hr.crossJoin(F.broadcast(hr.agg(F.sum("_s").alias("_t"))))
             .select("node", (F.col("_s") / F.col("_t")).alias("score"))
             .localCheckpoint(eager=True))
    out = (h.withColumn("kind", F.lit("hub"))
           .unionByName(a.withColumn("kind", F.lit("authority"))))
    if round_to is not None:
        out = out.select("node", F.round("score", round_to).alias("score"),
                         "kind")
    return out


def wl_relabel(edges: DataFrame,
               src_col: str = "cui_a", dst_col: str = "cui_b",
               iterations: int = 2) -> DataFrame:
    """Weisfeiler–Lehman relabeling (Weisfeiler & Lehman 1968;
    Shervashidze et al. 2011's WL-kernel form): every node starts
    labeled with its degree; each round the new label is the hash of
    (own label, SORTED multiset of neighbor labels).  After k rounds
    two nodes share a label iff their k-hop unfolding trees agree —
    the structural-role fingerprint WL graph kernels and GNN
    expressiveness arguments are built on, and a cheap graph-level
    feature (the label histogram) for corpus-scale graph dedup.

    Determinism: the neighbor multiset is sorted (``sort_array`` over
    ``collect_list`` — collection order never reaches the hash) and
    the hash is md5 over a '|'/',' serialization, identical in DuckDB,
    so the unrolled-CTE oracle matches exactly.  Per round: one
    co-partitioned join against the once-shuffled checkpointed edge
    list, one groupBy collecting ~degree-sized label lists, one
    co-partitioned self-join to re-attach the node's own label.
    Output: ``(node, wl_label)``."""
    e = symmetrize(edges, src_col, dst_col).localCheckpoint(eager=True)
    labels = (e.groupBy(F.col("src").alias("node"))
              .agg(F.count("*").cast("string").alias("label"))
              .localCheckpoint(eager=True))
    for _ in range(iterations):
        nl = (e.join(labels.withColumnRenamed("node", "src"), "src")
              .groupBy(F.col("dst").alias("node"))
              .agg(F.sort_array(F.collect_list("label")).alias("_nl")))
        labels = (nl.join(labels, "node")
                  .select("node",
                          F.md5(F.concat(F.col("label"), F.lit("|"),
                                         F.concat_ws(",", "_nl")))
                          .alias("label"))
                  .localCheckpoint(eager=True))
    return labels.select("node", F.col("label").alias("wl_label"))


def adamic_adar(edges: DataFrame,
                src_col: str = "cui_a", dst_col: str = "cui_b",
                max_center_degree: int = 64,
                round_to: int | None = 6) -> DataFrame:
    """Adamic–Adar link prediction (Adamic & Adar 2003): for every
    non-adjacent node pair sharing >= 1 neighbor, score
    Σ_z 1/ln(deg(z)) over the common neighbors z — the classic
    KG-completion / missing-edge ranking signal.

    Scale shape: wedges are generated by a self-join CO-PARTITIONED
    on the center node, with the center's degree attached as a window
    count over the SAME partitioning — one exchange, planned once,
    read back by both join sides (the coedit_edges discipline).  Skew
    is bounded BEFORE the join: centers above ``max_center_degree``
    are dropped, which is the standard truncation in link-prediction
    at scale (a 10^6-degree hub contributes 1/ln(10^6) ≈ 0.07 per
    wedge while costing C(10^6, 2) of them).  Existing edges are
    removed by a left-anti join so the output ranks only candidate
    NEW links.  Output: ``(node_a, node_b, aa_score)`` with
    ``node_a < node_b``."""
    e = symmetrize(edges, src_col, dst_col)
    w = Window.partitionBy("src")
    m = (e.withColumn("_deg", F.count("*").over(w))
         .filter(F.col("_deg") <= max_center_degree))
    a = m.select("src", F.col("dst").alias("node_a"), "_deg")
    b = m.select("src", F.col("dst").alias("node_b"))
    score = F.sum(F.lit(1.0) / F.log(F.col("_deg"))).alias("aa_score")
    pairs = (a.join(b, "src")
             .filter(F.col("node_a") < F.col("node_b"))
             .groupBy("node_a", "node_b")
             .agg(score))
    existing = e.select(F.col("src").alias("node_a"),
                        F.col("dst").alias("node_b"))
    out = pairs.join(existing, ["node_a", "node_b"], "left_anti")
    if round_to is not None:
        out = out.withColumn("aa_score",
                             F.round("aa_score", round_to))
    return out


def assortativity(edges: DataFrame,
                  src_col: str = "cui_a", dst_col: str = "cui_b",
                  round_to: int | None = 6) -> DataFrame:
    """Degree-assortativity coefficient (Newman 2002): the Pearson
    correlation of endpoint degrees over the edges — positive when
    hubs link to hubs (social-network mixing), negative when hubs
    link to leaves (biological / technological graphs).  The single
    global diagnostic that says which regime a KG's topology is in,
    and therefore which skew strategy its joins need.

    Computed over the symmetrized directed edge list (each undirected
    edge contributes both orientations, which is exactly the
    symmetric treatment Newman's formula requires):
    r = (S_jk/m − (S_j/2m)²·4) … in the standard half-sum form
    r = [S_jk/m − ((S_j+S_k)/2m)²] / [(S_j²+S_k²)/2m − ((S_j+S_k)/2m)²]
    with j, k the endpoint degrees.  Every sum is integral (degree
    products of integer degrees), so both engines divide the same
    exact values — only the final divisions are floating point.

    Shape: one degree aggregation + one co-partitioned join per
    endpoint + one global agg; 1-row output
    ``(n_edges, assortativity)`` (n_edges counts directed/sym rows).
    Degenerate regular graphs (zero degree variance) return NULL."""
    e = symmetrize(edges, src_col, dst_col)
    deg = e.groupBy("src").agg(F.count("*").alias("_d"))
    j = deg.select(F.col("src").alias("_sj"), F.col("_d").alias("_j"))
    k = deg.select(F.col("src").alias("_sk"), F.col("_d").alias("_k"))
    ed = (e.join(j, e.src == j._sj).join(k, e.dst == k._sk)
          .select("_j", "_k"))
    agg = ed.agg(
        F.count("*").alias("n_edges"),
        F.sum(F.col("_j") * F.col("_k")).alias("_sjk"),
        F.sum((F.col("_j") + F.col("_k"))).alias("_sjpk"),
        F.sum(F.col("_j") * F.col("_j")
              + F.col("_k") * F.col("_k")).alias("_sj2k2"))
    m = F.col("n_edges").cast("double")
    mean2 = (F.col("_sjpk") / (2.0 * m))
    num = F.col("_sjk") / m - mean2 * mean2
    den = F.col("_sj2k2") / (2.0 * m) - mean2 * mean2
    r = F.when(den != 0.0, num / den)
    if round_to is not None:
        r = F.round(r, round_to)
    return agg.select("n_edges", r.alias("assortativity"))


def kcore(edges: DataFrame, k: int,
          src_col: str = "cui_a", dst_col: str = "cui_b",
          max_iter: int = 12) -> DataFrame:
    """k-core decomposition for a fixed ``k``: iteratively peel nodes
    of degree < k until a fixpoint, returning the surviving nodes with
    their within-core degree — the standard dense-subgraph filter for
    KG noise pruning (nodes that only ever co-occur incidentally fall
    out; the tightly-connected entity communities remain).

    Scale shape: each round is one map-side-combined degree aggregate
    plus two SEMI joins co-partitioned on the edge endpoints — no
    node-to-all fan-out, nothing proportional to n².  The loop runs
    AT MOST ``max_iter`` rounds and stops early at the fixpoint
    (checked by comparing surviving-edge counts, one scalar action per
    round); each round's edge table is ``localCheckpoint``-ed so the
    lineage stays O(1) deep instead of O(rounds) (same posture as
    ``pagerank`` / dataprep/cluster.connected_components).  Peeling
    any graph converges in at most O(n) rounds, but degree-peel
    cascades die out geometrically in practice; the paired DuckDB
    oracle unrolls exactly ``max_iter`` rounds, and the equality test
    asserts the fixpoint lands before the cap so both formulations
    provably agree.

    Output: ``(node, core_degree)`` — nodes of the k-core with their
    degree inside the core (>= k by construction)."""
    e = symmetrize(edges, src_col, dst_col).distinct()
    n_prev = e.count()
    for _ in range(max_iter):
        keep = (e.groupBy("src").agg(F.count("*").alias("_d"))
                .filter(F.col("_d") >= k).select("src"))
        e2 = (e.join(keep, "src", "left_semi")
              .join(keep.select(F.col("src").alias("dst")),
                    "dst", "left_semi")
              .localCheckpoint(eager=False))
        n_cur = e2.count()
        e = e2
        if n_cur == n_prev:
            break
        n_prev = n_cur
    return (e.groupBy(F.col("src").alias("node"))
            .agg(F.count("*").cast("int").alias("core_degree")))


def transitive_reduction(edges: DataFrame,
                         src_col: str = "src", dst_col: str = "dst",
                         max_rounds: int = 16) -> DataFrame:
    """Minimal equivalent DAG: drop every edge (u, v) for which some
    OTHER path u ~> v exists — the inverse of ``transitive_closure``
    and the standard ontology-hygiene pass (MeSH/GO distribute
    reduced is-a graphs; redundant shortcut edges double-count in
    closure sizes and PageRank mass).

    An edge is redundant iff a path of length >= 2 connects its
    endpoints.  Those pairs are exactly (edge ∘ closure): one
    co-partitioned join of the edge list with the path-doubled
    closure (length >= 1) through the midpoint, then one anti-join
    back onto the edges.  Costs the closure (log-depth self-joins,
    checkpointed) + two keyed joins; sound for DAGs — cycles would
    delete themselves entirely, so run ``trim_to_cycles`` first on
    suspect inputs (same contract as transitive_closure).

    Output: ``(src, dst)`` — the surviving minimal edge set."""
    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .filter(F.col("src") != F.col("dst")).distinct())
    clo = transitive_closure(e, max_rounds=max_rounds)
    two_plus = (e.select("src", F.col("dst").alias("_m"))
                .join(clo.select(F.col("src").alias("_m"), "dst"),
                      "_m")
                .select("src", "dst").distinct())
    return e.join(two_plus, ["src", "dst"], "left_anti")


def degree_distribution(edges: DataFrame,
                        src_col: str = "cui_a", dst_col: str = "cui_b",
                        top_k: int = 100,
                        round_to: int = 6) -> DataFrame:
    """Degree-distribution shape analysis: the log2-binned degree
    histogram plus the Hill estimator of the power-law tail exponent
    (alpha = 1 + k / Σ ln(d_i / d_min) over the top-k degrees —
    Clauset/Shalizi/Newman's MLE restricted to the tail) replicated
    onto every bin row — the one-glance answer to "is this graph
    scale-free or did extraction melt into a hub?", complementing the
    per-node degree_stats.

    Scale shape: degrees are the usual map-side-combined aggregate;
    the histogram is a second tiny aggregate over log2 bins (a
    codegen'd WHEN-free floor(log2) on BIGINT degrees — exact for
    integer inputs in both engines); the Hill tail uses a
    TakeOrderedAndProject-bounded top-k (the wordpiece vocab-cap
    posture), never a global sort.

    Output: (degree_bin, min_degree, n_nodes, hill_alpha)."""
    deg = (symmetrize(edges, src_col, dst_col)
           .groupBy("src").agg(F.count("*").alias("d")))
    # exact integer bin ladder, NOT floor(log2(d)): log2 computed as
    # ln(d)/ln(2) lands a hair below the integer at exact powers of
    # two in some libms, flipping the floor — the ladder provably
    # agrees across engines (same rationale as LENGTH_BUCKETS)
    b = F.lit(31)
    for i in reversed(range(31)):
        b = F.when(F.col("d") < (1 << (i + 1)), F.lit(i)).otherwise(b)
    b = b.cast("int")
    hist = (deg.groupBy(b.alias("degree_bin"))
            .agg(F.min("d").cast("long").alias("min_degree"),
                 F.count("*").cast("long").alias("n_nodes")))
    top = deg.orderBy(F.desc("d"), F.asc("src")).limit(top_k)
    mn = top.agg(F.min("d").alias("_dmin"))
    lnsum = F.sum(F.log(F.col("d").cast("double")
                        / F.col("_dmin").cast("double")))
    hill = (top.crossJoin(F.broadcast(mn))
            .agg(F.when(lnsum > 0,
                        1.0 + F.count("*") / lnsum).alias("_alpha"))
            .select(F.round("_alpha", round_to).alias("hill_alpha")))
    return hist.crossJoin(F.broadcast(hill))


def shortest_paths(edges: DataFrame, roots: DataFrame,
                   rounds: int = 4,
                   src_col: str = "cui_a", dst_col: str = "cui_b",
                   weight_col: str = "n_docs") -> DataFrame:
    """Bounded Bellman–Ford: weighted shortest distances from a root
    set, relaxed for a fixed ``rounds`` — the weighted sibling of the
    k-hop expansion (hops treat a 1-doc and a 500-doc co-occurrence
    alike; here edge cost = 1e6 / weight in integer micro-units, so
    strongly-evidenced edges are cheap and the distance is an
    entity-relatedness measure).

    Scale shape: per round one co-partitioned join of the frontier
    with the edge list + one map-side-combined min — the PageRank
    loop's exchange pattern — with ``localCheckpoint`` truncating the
    lineage each round.  Costs are EXACT integers (micro-units), so
    min-of-sums is engine-exact with no float-order caveat; the
    oracle unrolls the same rounds as MATERIALIZED CTEs.

    Output: (root, node, dist_micros) — reachable within ``rounds``
    edges, including the roots at distance 0."""
    e = (symmetrize(edges, src_col, dst_col, weight_col)
         .select("src", "dst",
                 F.round(1e6 / F.col("weight")).cast("long")
                 .alias("w")))
    dist = roots.select(F.col("root"),
                        F.col("root").alias("node"),
                        F.lit(0).cast("long").alias("dist_micros"))
    for _ in range(rounds):
        relax = (dist.join(e, dist["node"] == e["src"])
                 .select("root", F.col("dst").alias("node"),
                         (F.col("dist_micros") + F.col("w"))
                         .alias("dist_micros")))
        dist = (dist.unionByName(relax)
                .groupBy("root", "node")
                .agg(F.min("dist_micros").alias("dist_micros"))
                .localCheckpoint(eager=False))
    return dist
