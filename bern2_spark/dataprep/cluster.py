"""Duplicate-cluster resolution + dataset splitting for training-data
pipelines.

``connected_components`` turns the PAIR output of any dedup family
(exact / LSH-verified / simhash / embedding-cosine) into CLUSTER
labels: every doc gets the minimum doc_id of its connected component,
so "keep one per duplicate group" becomes a single filter
(``doc_id == component``). The reference has no analogue (its dedup
story ends at per-request caching, bern2/bern2.py:93-116); this is the
operator a 100-TB corpus needs between near-dup PAIRS and an actual
deduplicated training set.

Algorithm: min-label hooking + pointer jumping + edge contraction
(the alternating-contraction family of Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14), expressed as DataFrame
joins. Per round:

1. **hook** — every current representative adopts
   ``min(own label, neighbor labels)`` over the contracted edge set
   (one shuffle-join + groupBy on the edge key);
2. **propagate + jump** — each node re-reads its representative's new
   label, then jumps once more (``l(v) <- l(l(v))``), so label chains
   halve every round;
3. **contract** — edges are rewritten to ``(label(a), label(b))``,
   self-loops dropped, duplicates merged: the edge table SHRINKS
   monotonically, so late rounds shuffle only the un-converged core,
   not the whole graph;
4. **converged** when the contracted edge table is empty (the only
   action per round is a count over ids — never text); a final
   pointer-jump-to-fixpoint phase then compresses any label chains
   left over from the round edges went empty (an empty edge table
   proves every component has ONE representative, not yet that every
   node points at it directly).

Pointer jumping makes the round count O(log n) in the worst case and
2-4 rounds for the short chains/cliques real dedup graphs are made
of; plain one-hop min propagation would need O(diameter) rounds.

Determinism: labels are min() folds over doc ids — no RNG, no
iteration-order dependence; the fixed point is unique.

``stratified_split`` assigns train/val/test by a hash of doc_id so the
split is stable across runs and cluster sizes (no RNG, no sampling
shuffle) and, when given a strata column, salts the hash per stratum
so every language/source keeps the target proportions independently.
"""

from typing import Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame,
                         src_col: str = "doc_a",
                         dst_col: str = "doc_b",
                         max_rounds: int = 25) -> DataFrame:
    """(src, dst) undirected pair table -> (doc_id, component) with
    component = min doc id reachable. Raises after ``max_rounds``
    without convergence (pointer jumping converges in O(log n), so 25
    rounds cover any graph that fits in a cluster; hitting the cap
    means the input is malformed, e.g. nulls in the id columns).

    Iteration state is ``localCheckpoint(eager=True)``-ed every round:
    round N's plan references round N-1's TWICE (the pointer-jump
    self-join), so without lineage truncation the final plan would be
    exponential in the round count. Local checkpoints live on executor
    local storage — on a real cluster with preemptible executors, set
    a reliable ``spark.sparkContext.setCheckpointDir`` and swap
    ``localCheckpoint`` for ``checkpoint``; the driver-query scale is
    fine with the local variant. Superseded checkpoints are dropped by
    Spark's ContextCleaner once unreferenced."""
    edges = (pairs.select(F.col(src_col).alias("a"),
                          F.col(dst_col).alias("b"))
             .union(pairs.select(F.col(dst_col).alias("a"),
                                 F.col(src_col).alias("b")))
             .filter(F.col("a") != F.col("b"))
             .distinct()
             .localCheckpoint(eager=True))
    # every endpoint starts as its own representative
    labels = (edges.select(F.col("a").alias("node"))
              .distinct()
              .withColumn("component", F.col("node"))
              .localCheckpoint(eager=True))
    converged = False
    for _ in range(max_rounds):
        if edges.count() == 0:
            converged = True
            break
        # 1. hook: representative adopts min over contracted-edge nbrs
        nbr = (edges
               .join(labels.select(F.col("node").alias("b"),
                                   F.col("component").alias("_nc")), "b")
               .groupBy("a").agg(F.min("_nc").alias("_nbr_min")))
        hooked = (labels.join(nbr, labels["node"] == nbr["a"], "left")
                  .select("node",
                          F.least("component",
                                  F.coalesce("_nbr_min", "component"))
                          .alias("component")))
        # 2. propagate + pointer jump: l(v) <- l(l(v)) — label chains
        # halve every round, which is what makes this O(log n)
        jumped = (hooked.alias("x")
                  .join(hooked.select(F.col("node").alias("component"),
                                      F.col("component").alias("_j"))
                        .alias("y"), "component", "left")
                  .select(F.col("x.node").alias("node"),
                          F.coalesce("_j", "component").alias("component"))
                  .localCheckpoint(eager=True))
        # 3. contract: rewrite edges to representatives; the table
        # shrinks monotonically so late rounds shuffle only the
        # un-converged core
        edges = (edges
                 .join(jumped.select(F.col("node").alias("a"),
                                     F.col("component").alias("_la")),
                       "a")
                 .join(jumped.select(F.col("node").alias("b"),
                                     F.col("component").alias("_lb")),
                       "b")
                 .select(F.col("_la").alias("a"),
                         F.col("_lb").alias("b"))
                 .filter(F.col("a") != F.col("b"))
                 .distinct()
                 .localCheckpoint(eager=True))
        labels = jumped
    if not converged:
        raise RuntimeError(
            f"connected_components: no convergence in {max_rounds} "
            "rounds — input does not look like a valid pair table")
    # empty edges proves one representative per component; labels may
    # still hold pointer CHAINS (v -> r -> min) from the round the
    # edges emptied — jump to fixpoint (chains halve per round, and
    # each round is one id-only self-join + count)
    for _ in range(max_rounds):
        jumped = (labels.alias("x")
                  .join(labels.select(F.col("node").alias("component"),
                                      F.col("component").alias("_j"))
                        .alias("y"), "component", "left")
                  .select(F.col("x.node").alias("node"),
                          F.coalesce("_j", "component").alias("component"))
                  .localCheckpoint(eager=True))
        changed = (jumped.join(labels.withColumnRenamed("component",
                                                        "_old"), "node")
                   .filter(F.col("component") != F.col("_old")).count())
        labels = jumped
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), "component")


def dedup_keep_canonical(docs: DataFrame, pairs: DataFrame,
                         id_col: str = "doc_id") -> DataFrame:
    """Filter ``docs`` to one representative per duplicate cluster
    (the min-id member); docs in no pair pass through untouched."""
    comp = connected_components(pairs)
    return (docs.join(comp.withColumnRenamed("doc_id", id_col), id_col,
                      "left")
            .filter(F.col("component").isNull()
                    | (F.col("component") == F.col(id_col)))
            .drop("component"))


def dedup_keep_best(docs: DataFrame, pairs: DataFrame,
                    score_col: str, id_col: str = "doc_id") -> DataFrame:
    """Filter ``docs`` to the HIGHEST-``score_col`` member of each
    duplicate cluster (ties break to min id; unpaired docs pass
    through untouched) — the production variant of
    ``dedup_keep_canonical``: when near-duplicates differ (truncated
    mirror vs full article, stripped vs intact formatting), min-id
    keeps an arbitrary copy while argmax-quality keeps the one worth
    training on (the keep-longest / keep-best-quality rule of C4 and
    The Stack's dedup stages).

    Scale shape: same as keep-canonical plus ONE window — the
    component join (left, component table is |paired docs| rows, far
    smaller than the corpus) and a row_number per cluster label; the
    window partitions on coalesce(component, id), so the unpaired
    majority forms singleton partitions that never concentrate."""
    comp = connected_components(pairs)
    j = docs.join(comp.withColumnRenamed("doc_id", id_col), id_col,
                  "left")
    grp = F.coalesce(F.col("component"), F.col(id_col))
    w = Window.partitionBy(grp).orderBy(F.desc(score_col),
                                        F.asc(id_col))
    return (j.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "component"))


def leakage_safe_split(docs: DataFrame, pairs: DataFrame,
                       weights: Sequence[Tuple[str, float]] = (
                           ("train", 0.8), ("val", 0.1), ("test", 0.1)),
                       id_col: str = "doc_id",
                       bucket_fn=None) -> DataFrame:
    """Train/val/test assignment that can never split a duplicate
    cluster across sets: the hash bucket is computed on the CONNECTED
    COMPONENT label (min doc id reachable through ``pairs``), not the
    doc id, so every member of a near-dup family lands in the same
    set. Splitting near-dups across train and test is the classic
    contamination bug in training-data pipelines — the eval set
    silently contains paraphrases of training docs; hashing the
    cluster label is the standard guard. Docs in no pair hash on
    their own id.

    ``bucket_fn``: optional ``Column -> Column`` mapping the group
    column to a [0,1) bucket — the query layer passes the
    plain-arithmetic hash so the DuckDB oracle reproduces the
    assignment bit-identically; default is xxhash64."""
    comp = connected_components(pairs)
    grp = F.coalesce(F.col("component"), F.col(id_col))
    if bucket_fn is None:
        bucket = (F.pmod(F.xxhash64(grp.cast("string")), F.lit(1000000))
                  .cast("double") / F.lit(1000000.0))
    else:
        bucket = bucket_fn(grp)
    return (stratified_split(
                docs.join(comp.withColumnRenamed("doc_id", id_col),
                          id_col, "left"),
                weights, id_col=id_col, bucket=bucket)
            .drop("component"))


def stratified_split(docs: DataFrame,
                     weights: Sequence[Tuple[str, float]] = (
                         ("train", 0.8), ("val", 0.1), ("test", 0.1)),
                     id_col: str = "doc_id",
                     strata_col: Optional[str] = None,
                     bucket: Optional[Column] = None) -> DataFrame:
    """Adds a ``split`` column by deterministic hash bucketing.

    The default bucket is ``xxhash64(id [, stratum]) pmod 10**6 /
    10**6`` — a uniform [0,1) value that is a pure function of the
    row, so the assignment is reproducible across runs and
    partitionings. With ``strata_col`` the hash salts on the stratum,
    so proportions hold within each stratum under skewed strata sizes
    (each stratum's ids are an independent uniform draw).

    ``bucket`` overrides the [0,1) expression entirely — the query
    layer passes a plain-arithmetic multiplicative hash there so the
    DuckDB oracle can recompute the assignment bit-identically
    (xxhash64 exists only in Spark)."""
    if bucket is None:
        cols = [F.col(id_col).cast("string")]
        if strata_col is not None:
            cols.append(F.col(strata_col).cast("string"))
        bucket = (F.pmod(F.xxhash64(*cols), F.lit(1000000))
                  .cast("double") / F.lit(1000000.0))
    edges = []
    acc = 0.0
    for name, w in weights:
        acc += w
        edges.append((name, acc))
    expr = F.lit(edges[-1][0])
    for name, hi in reversed(edges[:-1]):
        expr = F.when(bucket < F.lit(hi), F.lit(name)).otherwise(expr)
    return docs.withColumn("split", expr)
