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

from pyspark.sql import DataFrame
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
