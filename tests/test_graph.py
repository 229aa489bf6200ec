"""operators/graph.py — degree stats, PageRank, k-hop neighborhoods.

PageRank is checked against an independent numpy power iteration on
the same graph (same fixed iteration count and damping), not against
hand-computed constants, so any change to either formulation that
breaks equivalence fails loudly.
"""
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from bern2_spark.operators.graph import (degree_stats, khop_neighborhood,
                                         pagerank, symmetrize)

# path graph a-b-c-d plus a triangle x-y-z, weighted
EDGES = [("a", "b", 2), ("b", "c", 1), ("c", "d", 3),
         ("x", "y", 1), ("y", "z", 1), ("x", "z", 1)]


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(EDGES, ["cui_a", "cui_b", "n_docs"])


def test_symmetrize_drops_self_loops(spark):
    e = spark.createDataFrame([("a", "a"), ("a", "b")],
                              ["cui_a", "cui_b"])
    rows = {(r.src, r.dst) for r in symmetrize(e).collect()}
    assert rows == {("a", "b"), ("b", "a")}


def test_degree_stats(edges):
    out = {r.node: (r.degree, r.strength)
           for r in degree_stats(edges, weight_col="n_docs").collect()}
    assert out["a"] == (1, 2)
    assert out["b"] == (2, 3)
    assert out["c"] == (2, 4)
    assert out["d"] == (1, 3)
    assert out["x"] == out["y"] == out["z"] == (2, 2)


def _numpy_pagerank(pairs, iters, d):
    nodes = sorted({n for p in pairs for n in p[:2]})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    adj = np.zeros((n, n))
    for a, b, _ in pairs:
        adj[idx[a], idx[b]] = adj[idx[b], idx[a]] = 1.0
    deg = adj.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        r = (1.0 - d) / n + d * (adj.T @ (r / deg))
    return dict(zip(nodes, r))


def test_pagerank_matches_numpy_power_iteration(edges):
    got = {r.node: r.rank
           for r in pagerank(edges, iterations=5, damping=0.85,
                             round_to=None).collect()}
    want = _numpy_pagerank(EDGES, 5, 0.85)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-12)
    # mass conservation: symmetrized graph has no dangling nodes
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # triangle symmetry: x, y, z are automorphic
    assert got["x"] == pytest.approx(got["y"], abs=1e-12)
    assert got["y"] == pytest.approx(got["z"], abs=1e-12)


def test_pagerank_empty_graph(spark):
    e = spark.createDataFrame([], "cui_a string, cui_b string")
    assert pagerank(e).count() == 0


def test_khop_min_distance(spark, edges):
    roots = spark.createDataFrame([("a",), ("x",)], ["root"])
    out = {(r.root, r.node): r.hops
           for r in khop_neighborhood(edges, roots, k=2).collect()}
    # a's component is the path a-b-c-d: d is 3 hops away -> absent
    assert {k: v for k, v in out.items() if k[0] == "a"} == {
        ("a", "a"): 0, ("a", "b"): 1, ("a", "c"): 2}
    # the triangle closes at hop 1 for every other member
    assert {k: v for k, v in out.items() if k[0] == "x"} == {
        ("x", "x"): 0, ("x", "y"): 1, ("x", "z"): 1}


def test_khop_k1(spark, edges):
    roots = spark.createDataFrame([("b",)], ["root"])
    out = {(r.root, r.node): r.hops
           for r in khop_neighborhood(edges, roots, k=1).collect()}
    assert out == {("b", "b"): 0, ("b", "a"): 1, ("b", "c"): 1}


def test_triangle_counts(spark, edges):
    from bern2_spark.operators.graph import triangle_counts
    out = {r.node: r.triangles for r in triangle_counts(edges).collect()}
    # only the x-y-z triangle exists; the path contributes none
    assert out == {"x": 1, "y": 1, "z": 1}


def test_triangle_counts_shared_edge(spark):
    # two triangles sharing edge p-q: p,q in 2 each, r,s in 1 each
    from bern2_spark.operators.graph import triangle_counts
    e = spark.createDataFrame(
        [("p", "q"), ("p", "r"), ("q", "r"), ("p", "s"), ("q", "s")],
        ["cui_a", "cui_b"])
    out = {r.node: r.triangles for r in triangle_counts(e).collect()}
    assert out == {"p": 2, "q": 2, "r": 1, "s": 1}


def test_clustering_coefficient(spark, edges):
    from bern2_spark.operators.graph import clustering_coefficient
    out = {r.node: (r.degree, r.triangles, r.clustering)
           for r in clustering_coefficient(edges).collect()}
    assert out["x"] == (2, 1, 1.0)
    assert out["b"] == (2, 0, 0.0)
    assert out["a"] == (1, 0, 0.0)


# ------------------------------------------------ entity catalog

def test_entity_catalog(spark):
    from bern2_spark.operators.canonicalize import entity_catalog
    m = spark.createDataFrame([
        ("d1", "disease", "MESH:D1", "lung cancer"),
        ("d1", "disease", "MESH:D1", "lung cancer"),
        ("d2", "disease", "MESH:D1", "cancer of the lung"),
        ("d2", "gene",    "1017",    "CDK2"),
        ("d3", "gene",    "1017",    "cdk2"),   # tie -> lexicographic
    ], ["doc_id", "ent_type", "cui", "mention"])
    out = {(r.ent_type, r.cui): r for r in entity_catalog(m).collect()}
    dis = out[("disease", "MESH:D1")]
    assert (dis.n_mentions, dis.n_docs) == (3, 2)
    assert dis.canonical_surface == "lung cancer"
    gene = out[("gene", "1017")]
    assert (gene.n_mentions, gene.n_docs) == (2, 2)
    assert gene.canonical_surface == "CDK2"


# ------------------------------------------------ transitive closure

def test_transitive_closure_chain(spark):
    """A 5-node chain closes to all 10 ancestor pairs in
    ceil(log2 4) = 2 doubling rounds."""
    from bern2_spark.operators.graph import transitive_closure
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
        ["src", "dst"])
    got = {(r.src, r.dst) for r in transitive_closure(e).collect()}
    want = {(x, y) for i, x in enumerate("abcde")
            for y in "abcde"[i + 1:]}
    assert got == want


def test_transitive_closure_dag_and_dupes(spark):
    """Diamond DAG: both paths to the sink yield ONE closure row;
    duplicate input edges and self-loops are ignored."""
    from bern2_spark.operators.graph import transitive_closure
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
         ("a", "b"), ("d", "d")],
        ["src", "dst"])
    got = sorted((r.src, r.dst) for r in transitive_closure(e).collect())
    assert got == [("a", "b"), ("a", "c"), ("a", "d"),
                   ("b", "d"), ("c", "d")]


def test_label_propagation_splits_bridged_cliques(spark):
    from bern2_spark.operators.graph import label_propagation
    # two triangles joined by ONE weak bridge: connected components
    # would merge them; LPA's weighted majority keeps them apart
    e = spark.createDataFrame(
        [("a", "b", 5), ("b", "c", 5), ("a", "c", 5),
         ("x", "y", 5), ("y", "z", 5), ("x", "z", 5),
         ("c", "x", 1)],
        ["cui_a", "cui_b", "n_docs"])
    got = {r.node: r.community
           for r in label_propagation(e, weight_col="n_docs",
                                      iterations=3).collect()}
    assert len(got) == 6
    left = {got[n] for n in "abc"}
    right = {got[n] for n in "xyz"}
    assert len(left) == 1 and len(right) == 1
    assert left != right


def test_label_propagation_partition_invariance(spark):
    from bern2_spark.operators.graph import label_propagation
    e = spark.createDataFrame(
        [("a", "b", 5), ("b", "c", 5), ("a", "c", 5),
         ("x", "y", 5), ("y", "z", 5), ("x", "z", 5),
         ("c", "x", 1)],
        ["cui_a", "cui_b", "n_docs"])
    a = sorted(map(tuple, label_propagation(
        e, weight_col="n_docs").collect()))
    b = sorted(map(tuple, label_propagation(
        e.repartition(7), weight_col="n_docs").collect()))
    assert a == b


def test_label_propagation_unweighted_default(spark):
    from bern2_spark.operators.graph import label_propagation
    e = spark.createDataFrame([("a", "b"), ("b", "c")],
                              ["cui_a", "cui_b"])
    rows = label_propagation(e, iterations=1).collect()
    # 1 round, unit weights: every node adopts its smallest neighbor
    got = {r.node: r.community for r in rows}
    assert got == {"a": "b", "b": "a", "c": "b"}


def test_modularity_hand_computed(spark):
    from bern2_spark.operators.graph import modularity
    e = spark.createDataFrame(
        [("a", "b", 5), ("b", "c", 5), ("a", "c", 5),
         ("x", "y", 5), ("y", "z", 5), ("x", "z", 5),
         ("c", "x", 1)],
        ["cui_a", "cui_b", "n_docs"])
    lab = spark.createDataFrame(
        [(n, "A") for n in "abc"] + [(n, "B") for n in "xyz"],
        ["node", "community"])
    got = {r.community: r for r in
           modularity(e, lab, weight_col="n_docs").collect()}
    # 2m = 62; each triangle: w_in 30; strengths 10+10+11 = 31
    for c in ("A", "B"):
        assert got[c].n_nodes == 3
        assert got[c].w_in == 30
        assert got[c].w_tot == 31
        assert abs(got[c].q_contrib
                   - (30 / 62 - (31 / 62) ** 2)) < 1e-6
    # the 2-community split beats the trivial all-in-one partition
    one = spark.createDataFrame([(n, "all") for n in "abcxyz"],
                                ["node", "community"])
    q_one = sum(r.q_contrib for r in
                modularity(e, one, weight_col="n_docs").collect())
    q_two = sum(r.q_contrib for r in got.values())
    assert q_two > q_one
    assert abs(q_one) < 1e-6


def _numpy_ppr(edge_list, seed_nodes, iters, d):
    nodes = sorted({a for a, b, _ in edge_list}
                   | {b for a, b, _ in edge_list})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for a, b, _ in edge_list:
        A[idx[a], idx[b]] = A[idx[b], idx[a]] = 1.0
    deg = A.sum(axis=1)
    P = A / deg[:, None]
    e = np.zeros(n)
    for s in seed_nodes:
        e[idx[s]] = 1.0 / len(seed_nodes)
    r = e.copy()
    for _ in range(iters):
        r = (1 - d) * e + d * (P.T @ r)
    return {nodes[i]: r[i] for i in range(n)}


def test_personalized_pagerank_matches_numpy(spark, edges):
    from bern2_spark.operators.graph import personalized_pagerank
    seeds = spark.createDataFrame([("a",)], ["node"])
    got = {r.node: r.rank
           for r in personalized_pagerank(edges, seeds, iterations=5,
                                          damping=0.85,
                                          round_to=None).collect()}
    want = _numpy_ppr(EDGES, ["a"], 5, 0.85)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-12)
    # the x-y-z triangle is unreachable from seed 'a': rank exactly 0
    assert got["x"] == got["y"] == got["z"] == 0.0
    # every node on the seed's component holds positive mass
    for node in "abcd":
        assert got[node] > 0


def test_hits_matches_numpy(spark):
    from bern2_spark.operators.graph import hits
    E = [("r1", "p1"), ("r1", "p2"), ("r2", "p2"), ("r3", "p2"),
         ("r3", "p3")]
    srcs = sorted({s for s, _ in E})
    dsts = sorted({d for _, d in E})
    si = {s: i for i, s in enumerate(srcs)}
    di = {d: i for i, d in enumerate(dsts)}
    A = np.zeros((len(srcs), len(dsts)))
    for s, d in E:
        A[si[s], di[d]] = 1.0
    h = np.full(len(srcs), 1.0 / len(srcs))
    for _ in range(5):
        a = A.T @ h
        a /= a.sum()
        h = A @ a
        h /= h.sum()
    want = {(s, "hub"): h[si[s]] for s in srcs}
    want.update({(d, "authority"): a[di[d]] for d in dsts})
    e = spark.createDataFrame(E, ["src", "dst"])
    got = {(r.node, r.kind): r.score
           for r in hits(e, round_to=None).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    # p2 (cited by all three repos) is the top authority
    assert got[("p2", "authority")] == max(
        v for (n, k), v in got.items() if k == "authority")


def test_wl_relabel_structural_roles(spark, edges):
    from bern2_spark.operators.graph import wl_relabel
    got = {r.node: r.wl_label
           for r in wl_relabel(edges, iterations=2).collect()}
    assert len(got) == 7
    # triangle members are automorphic -> identical WL labels
    assert got["x"] == got["y"] == got["z"]
    # path ends (a, d) are automorphic to each other, path middles
    # (b, c) likewise, and the two orbits differ
    assert got["a"] == got["d"]
    assert got["b"] == got["c"]
    assert got["a"] != got["b"]
    # the triangle orbit differs from every path orbit
    assert got["x"] not in (got["a"], got["b"])


def test_wl_relabel_refines_across_rounds(spark):
    from bern2_spark.operators.graph import wl_relabel
    # star center vs path middle: same degree 2 at round 0 is NOT the
    # case here — use a 4-path vs 4-cycle: all cycle nodes degree 2,
    # path middles degree 2 too; one round separates them (neighbor
    # degree multisets {1,2} vs {2,2})
    path = [("p1", "p2"), ("p2", "p3"), ("p3", "p4")]
    cyc = [("c1", "c2"), ("c2", "c3"), ("c3", "c4"), ("c4", "c1")]
    e = spark.createDataFrame(path + cyc, ["cui_a", "cui_b"])
    got = {r.node: r.wl_label
           for r in wl_relabel(e, iterations=1).collect()}
    assert got["p2"] != got["c1"]
    assert got["c1"] == got["c2"] == got["c3"] == got["c4"]


def test_adamic_adar_hand_computed(spark):
    from bern2_spark.operators.graph import adamic_adar
    # square a-b-c-d-a plus diagonal chord a-c: candidate new link is
    # b-d (common neighbors a and c, both degree 3)
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")],
        ["cui_a", "cui_b"])
    got = {(r.node_a, r.node_b): r.aa_score
           for r in adamic_adar(e, round_to=None).collect()}
    # b-d is the only non-adjacent pair sharing neighbors
    assert set(got) == {("b", "d")}
    assert got[("b", "d")] == pytest.approx(2 / math.log(3), abs=1e-12)


def test_adamic_adar_excludes_existing_edges(spark, edges):
    from bern2_spark.operators.graph import adamic_adar
    got = {(r.node_a, r.node_b) for r in adamic_adar(edges).collect()}
    # path a-b-c-d: wedges predict a-c (via b) and b-d (via c); the
    # triangle x-y-z is complete so contributes nothing
    assert got == {("a", "c"), ("b", "d")}


def test_adamic_adar_hub_cap(spark):
    from bern2_spark.operators.graph import adamic_adar
    star = [("hub", f"leaf{i}") for i in range(10)]
    e = spark.createDataFrame(star + [("p", "q"), ("q", "r")],
                              ["cui_a", "cui_b"])
    got = {(r.node_a, r.node_b)
           for r in adamic_adar(e, max_center_degree=5).collect()}
    # the 10-degree hub is dropped: no leaf-leaf wedge survives, only
    # the p-r prediction through q
    assert got == {("p", "r")}


def test_assortativity_matches_numpy(spark, edges):
    from bern2_spark.operators.graph import assortativity
    row = assortativity(edges, round_to=None).collect()[0]
    # independent computation over the symmetrized edge list
    sym = []
    for a, b, _ in EDGES:
        sym += [(a, b), (b, a)]
    deg = {}
    for a, _ in sym:
        deg[a] = deg.get(a, 0) + 1
    j = np.array([deg[a] for a, _ in sym], dtype=float)
    k = np.array([deg[b] for _, b in sym], dtype=float)
    m = len(sym)
    mean2 = (j + k).sum() / (2 * m)
    num = (j * k).sum() / m - mean2 ** 2
    den = (j * j + k * k).sum() / (2 * m) - mean2 ** 2
    assert row.n_edges == m
    assert row.assortativity == pytest.approx(num / den, abs=1e-12)


def test_assortativity_regular_graph_null(spark):
    from bern2_spark.operators.graph import assortativity
    # triangle: every degree 2 -> zero variance -> NULL, not div-by-0
    e = spark.createDataFrame([("x", "y"), ("y", "z"), ("x", "z")],
                              ["cui_a", "cui_b"])
    row = assortativity(e).collect()[0]
    assert row.n_edges == 6
    assert row.assortativity is None


def test_textrank_hub_word_wins(spark):
    """The query wiring lives in queries.py; here check the token
    graph + pagerank composition ranks the connective word highest."""
    import os
    os.environ.setdefault("SPARK_GRAFT_TEST_SF",
                          "/root/testdata/sf0.001")
    from bern2_spark.queries import QUERIES
    rows = QUERIES["qc_textrank_keywords"](
        spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 10
    # descending rank with deterministic tie-break
    ranks = [r.rank for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    # every keyword is a real corpus token (lowercase, non-empty)
    for r in rows:
        assert r.keyword and r.keyword == r.keyword.lower()
