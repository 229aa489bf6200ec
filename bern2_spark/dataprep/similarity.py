"""Similarity search over an embedding column (array<float>).

* brute-force cosine top-k — the exactness baseline: query × corpus
  join, dot product via zip_with/aggregate (JVM-side, codegen'd), top-k
  by window rank. Right answer at any scale where queries are few or
  the corpus side is broadcastable.
* LSH-bucketed ANN — the scale path: sign-of-projection bit buckets on
  deterministic hyperplanes; candidates = bucket co-residents (with
  multi-probe via bit flips), then exact cosine re-rank within buckets.
  At 10^12 rows the bucket join shuffles only (id, bucket) pairs.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(c):
    return F.sqrt(F.aggregate(F.transform(c, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """(query_id, neighbor_id, cosine, rank<=k); excludes self-matches.
    The query side is broadcast (few queries vs big corpus)."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("c_vec"))
    scored = (c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cosine",
                          _dot(F.col("q_vec"), F.col("c_vec"))
                          / (_norm(F.col("q_vec")) * _norm(F.col("c_vec")))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def hyperplanes(n_bits: int, dim: int) -> List[List[float]]:
    """Driver-side deterministic ±1 hyperplane matrix: component (i, d)
    = +1 iff the first 4 hex digits of md5('i:d') are even. Computed
    ONCE (n_bits × dim floats) and embedded as plan literals — the
    in-plan formulation recomputed these per ROW (10^15 redundant md5s
    at 10^12 rows). Reproducible on any engine, no RNG state."""
    import hashlib
    return [[1.0 if int(hashlib.md5(f"{i}:{d}".encode())
                        .hexdigest()[:4], 16) % 2 == 0 else -1.0
             for d in range(dim)]
            for i in range(n_bits)]


def sign_lsh_bucket(vec_col, planes: List[List[float]]):
    """Sign-LSH bucket id from a precomputed hyperplane matrix: bit i =
    sign of dot(vec, plane_i). The dot is a LEFT-TO-RIGHT aggregate fold
    (not a matmul) so the float summation order — and therefore the
    sign of near-zero projections — is identical across engines."""
    bucket = F.lit(0)
    for i, row in enumerate(planes):
        plane = F.array(*[F.lit(v) for v in row])
        proj = F.aggregate(F.zip_with(vec_col, plane, lambda x, p: x * p),
                           F.lit(0.0), lambda acc, v: acc + v)
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


# ------------------------------------------------------------------- IVF

def ivf_centroids(n_centroids: int, dim: int,
                  scale: float = 0.15) -> List[List[float]]:
    """Deterministic seed centroids (+-scale components from md5
    parity): a fixed Voronoi partition of the embedding space. A
    production deployment k-means-trains centroids offline (MLlib) and
    broadcasts them the same way; correctness of the cell/probe
    machinery is independent of centroid quality."""
    import hashlib
    return [[scale if int(hashlib.md5(f"ivf:{c}:{d}".encode())
                          .hexdigest()[:4], 16) % 2 == 0 else -scale
             for d in range(dim)]
            for c in range(n_centroids)]


def _cell_scores(vec_col, centroids: List[List[float]]):
    """Per-centroid squared-L2 surrogate ||c||^2 - 2*v.c (the ||v||^2
    term is constant per row): array of (score, idx) structs, ordered
    args — LEFT-TO-RIGHT dot folds for cross-engine float parity."""
    out = []
    for i, c in enumerate(centroids):
        c_norm_sq = sum(x * x for x in c)
        plane = F.array(*[F.lit(v) for v in c])
        dot = F.aggregate(F.zip_with(vec_col, plane, lambda x, y: x * y),
                          F.lit(0.0), lambda acc, v: acc + v)
        out.append(F.struct((F.lit(c_norm_sq) - 2.0 * dot).alias("s"),
                            F.lit(i).alias("i")))
    return F.array(*out)


def ivf_assign(df: DataFrame, centroids: List[List[float]],
               vec_col: str = "embedding") -> DataFrame:
    """Adds ``cell`` = nearest centroid (argmin L2, idx tiebreak)."""
    return df.withColumn(
        "cell", F.array_min(_cell_scores(F.col(vec_col), centroids))["i"])


def kmeans_train(df: DataFrame, k: int, iters: int = 2, dim: int = 64,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> List[List[float]]:
    """Lloyd's k-means over the embedding column, DataFrame-native —
    the trained-centroid upgrade the IVF docstring promises (the
    reference trains its faiss index the same way,
    normalizers/neural_normalizer.py:145-158, nlist=2048).

    Deterministic: init = the k vectors with the smallest ids; each
    iteration assigns via the same broadcast-literal argmin used by
    ``ivf_assign`` (centroid list is a k x dim dimension table — plan
    literals, no shuffle on the corpus beyond the component-mean agg)
    and recomputes centroids as per-cell component means via
    posexplode + groupBy(cell, pos) with map-side combine. Centroids
    round-trip through the driver between iterations exactly like
    MLlib's implementation; the corpus-proportional work per iteration
    is one scan + one (cell, pos)-keyed agg of dim floats per row.
    Empty cells keep their previous centroid."""
    init = (df.orderBy(id_col).limit(k)
            .select(F.col(vec_col).alias("v")).collect())
    cents = [[float(x) for x in r["v"]] for r in init]
    for _ in range(iters):
        a = ivf_assign(df.select(F.col(vec_col).alias("embedding")),
                       cents, "embedding")
        means = (a.select("cell", F.posexplode("embedding")
                          .alias("pos", "x"))
                 .groupBy("cell", "pos").agg(F.avg("x").alias("m"))
                 .collect())
        new = [list(c) for c in cents]
        for r in means:
            new[r["cell"]][r["pos"]] = float(r["m"])
        cents = new
    return cents


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 8, n_probe: int = 2, dim: int = 64,
             id_col: str = "vec_id",
             vec_col: str = "embedding",
             centroids: List[List[float]] | None = None) -> DataFrame:
    """IVF ANN: corpus rows live in their nearest-centroid cell; each
    query probes its ``n_probe`` nearest cells and exact-cosine re-ranks
    inside them. At scale the corpus shuffles once by cell (or is
    bucketed on it at write time) and each query touches n_probe/n_c of
    the data. Recall < 1 by construction; raise n_probe to trade cost
    for recall. ``centroids`` overrides the deterministic seed cells —
    pass ``kmeans_train(corpus, k=n_centroids)`` for the trained
    variant (balanced cells: better recall at the same n_probe)."""
    if centroids is None:
        centroids = ivf_centroids(n_centroids, dim)
    c = ivf_assign(
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("c_vec")),
        centroids, "c_vec")
    return _probe_rerank(c, queries, centroids, k, n_probe,
                         id_col, vec_col)


def ivf_topk_prebuilt(store: DataFrame, queries: DataFrame,
                      centroids: List[List[float]], k: int = 5,
                      n_probe: int = 2, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Top-k over an EXISTING cell-partitioned IVF store — the read
    side of streaming index maintenance (streaming/ann.py
    read_ivf_index): ``store`` already carries its ``cell`` assignment
    from write time, so the corpus-proportional assignment scan that
    ``ivf_topk`` pays never happens; only the probed cells' rows join.
    ``centroids`` must be the generation the store was built with
    (frozen between retrains — see streaming/ann.py)."""
    c = store.select(F.col(id_col).alias("neighbor_id"),
                     F.col(vec_col).alias("c_vec"),
                     F.col("cell").cast("int").alias("cell"))
    return _probe_rerank(c, queries, centroids, k, n_probe,
                         id_col, vec_col)


def _probe_rerank(c: DataFrame, queries: DataFrame,
                  centroids: List[List[float]], k: int, n_probe: int,
                  id_col: str, vec_col: str) -> DataFrame:
    """Shared IVF query path: each query probes its n_probe nearest
    cells, joins the celled corpus, exact-cosine re-ranks."""
    scores = _cell_scores(F.col("q_vec"), centroids)
    probes = F.slice(F.array_sort(scores), 1, n_probe)
    q = (queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("q_vec"))
         .select("query_id", "q_vec",
                 F.explode(F.transform(probes, lambda p: p["i"]))
                 .alias("cell")))
    scored = (c.join(q, "cell")
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cosine",
                          _dot(F.col("q_vec"), F.col("c_vec"))
                          / (_norm(F.col("q_vec"))
                             * _norm(F.col("c_vec")))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


# ------------------------------------------- occupancy / banding math

def bit_agree_prob(cosine: float) -> float:
    """P(one sign-LSH bit agrees) for a pair at the given cosine:
    1 - theta/pi (Goemans-Williamson / Charikar)."""
    import math
    return 1.0 - math.acos(max(-1.0, min(1.0, cosine))) / math.pi


def banded_lsh_recall(p_bit: float, r: int, tables: int) -> float:
    """Candidate-recall of ``tables`` independent r-bit sign-LSH
    tables: 1 - (1 - p^r)^L (the MinHash banding formula applied to
    sign bits)."""
    return 1.0 - (1.0 - p_bit ** r) ** tables


def banded_lsh_plan(n_rows: int, cos_threshold: float,
                    target_occupancy: int = 1024,
                    target_recall: float = 0.9) -> tuple:
    """The production near-dup configuration: choose r so the expected
    bucket occupancy N/2^r stays ~target_occupancy (keeping the
    in-bucket pair join LINEAR in N: sum_b occ_b^2 ~ N * occupancy),
    then choose the table count L for the target candidate recall at
    the cosine threshold. Returns (r, L, expected_occupancy,
    predicted_recall). See PARITY.md 'Sign-LSH occupancy at scale' for
    the worked 10^12-row numbers."""
    import math
    r = max(1, math.ceil(math.log2(max(2.0, n_rows / target_occupancy))))
    p = bit_agree_prob(cos_threshold)
    miss = 1.0 - p ** r
    tables = (1 if miss <= 0.0 else
              max(1, math.ceil(math.log(1.0 - target_recall)
                               / math.log(miss))))
    return r, tables, n_rows / (2 ** r), banded_lsh_recall(p, r, tables)


def hyperplanes_seeded(seed: str, n_bits: int, dim: int) -> List[List[float]]:
    """Like ``hyperplanes`` but namespaced by a seed string — gives
    each banded table its own independent plane set."""
    import hashlib
    return [[1.0 if int(hashlib.md5(f"{seed}:{i}:{d}".encode())
                        .hexdigest()[:4], 16) % 2 == 0 else -1.0
             for d in range(dim)]
            for i in range(n_bits)]


def lsh_banded_pairs(embeddings: DataFrame, threshold: float = 0.95,
                     r: int = 8, tables: int = 4, dim: int = 64,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Banded multi-table sign-LSH near-dup pairs — the 10^12-row
    configuration (single-table recall decays as p^r once r is large
    enough to keep buckets small; L tables recover it as
    1-(1-p^r)^L). Each row computes L bucket ids (one per table's
    plane set), candidates join per (table, bucket), pairs are
    DISTINCT-ed before the exact cosine verify so a pair colliding in
    several tables verifies once. Shuffled artifact: (id, table,
    bucket, vec) rows — L x corpus, never pairs."""
    b = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
        F.explode(F.array(*[
            F.struct(F.lit(t).alias("table"),
                     sign_lsh_bucket(F.col(vec_col),
                                     hyperplanes_seeded(f"t{t}", r, dim))
                     .alias("bucket"))
            for t in range(tables)])).alias("tb")
    ).select("id", "vec", "tb.table", "tb.bucket")
    a = b.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"),
                 "table", "bucket")
    c = b.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"),
                 "table", "bucket")
    cand = (a.join(c, ["table", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "vec_a", "vec_b")
            .distinct())
    return (cand
            .withColumn("cosine",
                        _dot(F.col("vec_a"), F.col("vec_b"))
                        / (_norm(F.col("vec_a")) * _norm(F.col("vec_b"))))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def probe_masks(n_bits: int, max_flip: int = 2) -> List[int]:
    """All bit-flip masks with popcount <= max_flip, the candidate
    probe set for multi-probe LSH. 0 (the home bucket) comes first;
    the per-query ORDER among the rest is decided at query time by
    flip cost (sum of |projection| over flipped bits — flipping a
    near-zero projection is almost free, flipping a confident bit is
    expensive)."""
    return [m for m in range(1 << n_bits)
            if bin(m).count("1") <= max_flip]


def lsh_multiprobe_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                        n_bits: int = 8, dim: int = 64, n_probe: int = 4,
                        max_flip: int = 2,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Multi-probe sign-LSH ANN (Lv et al., VLDB'07 shape): each query
    probes its home bucket plus the buckets reached by the CHEAPEST bit
    flips — cost of flipping bit i = |dot(vec, plane_i)|, so the probe
    order follows the query's own uncertainty. Raises recall without
    touching the corpus-side layout: the corpus is still bucketed once;
    only the (broadcast) query side explodes to n_probe rows.

    Candidate masks are enumerated driver-side with popcount <=
    ``max_flip`` (n_bits + C(n_bits,2) masks at the default 2), then
    ranked per query by flip cost inside the plan — all scalar
    expressions, fully codegen'd. At production n_bits (16+) keep
    max_flip at 2 and let banded multi-table LSH supply the rest of the
    recall (see dedup docs); enumerating 2^n_bits masks is only for
    tiny demo configs."""
    planes = hyperplanes(n_bits, dim)
    masks = probe_masks(n_bits, max_flip)

    def probed_queries():
        vec = F.col("q_vec")
        projs = [
            F.aggregate(F.zip_with(vec, F.array(*[F.lit(v) for v in row]),
                                   lambda x, p: x * p),
                        F.lit(0.0), lambda acc, v: acc + v)
            for row in planes]
        home = sum((F.when(projs[i] > 0, F.lit(1 << i)).otherwise(F.lit(0))
                    for i in range(n_bits)), F.lit(0))
        cands = []
        for m in masks:
            cost = sum((F.abs(projs[i]) for i in range(n_bits)
                        if m & (1 << i)), F.lit(0.0))
            # home XOR m, written per-bit with literal weights so it
            # stays plain arithmetic: bit set in home -> subtract
            flipped = home
            for i in range(n_bits):
                if m & (1 << i):
                    flipped = flipped + F.when(
                        projs[i] > 0, F.lit(-(1 << i))
                    ).otherwise(F.lit(1 << i))
            cands.append(F.struct(cost.alias("cost"),
                                  F.lit(m).alias("mask"),
                                  flipped.alias("bucket")))
        ranked = F.array_sort(F.array(*cands))  # (cost, mask) lexicographic
        probes = F.transform(F.slice(ranked, 1, n_probe),
                             lambda s: s["bucket"])
        return (queries.select(F.col(id_col).alias("query_id"),
                               F.col(vec_col).alias("q_vec"))
                .withColumn("bucket", F.explode(probes)))

    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("c_vec"),
                      sign_lsh_bucket(F.col(vec_col), planes)
                      .alias("bucket"))
    scored = (c.join(F.broadcast(probed_queries()), "bucket")
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cosine",
                          _dot(F.col("q_vec"), F.col("c_vec"))
                          / (_norm(F.col("q_vec")) * _norm(F.col("c_vec")))))
    # a (query, neighbor) pair can surface from several probed buckets
    # only if bucketing were ambiguous — it is not (one bucket per
    # corpus row), so no distinct is needed before ranking
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def lsh_bucket_pairs(embeddings: DataFrame, threshold: float = 0.95,
                     n_bits: int = 8, dim: int = 64,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Near-dup pairs at scale: candidates = same sign-LSH bucket
    (self-join on the bucket id — shuffles (id, bucket, vec), never
    all pairs), then exact cosine verify inside buckets. The bucketed
    complement of dedup.embedding_cosine_pairs' exact all-pairs."""
    planes = hyperplanes(n_bits, dim)
    b = embeddings.select(F.col(id_col).alias("id"),
                          F.col(vec_col).alias("vec"),
                          sign_lsh_bucket(F.col(vec_col), planes)
                          .alias("bucket"))
    a = b.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"),
                 "bucket")
    c = b.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"),
                 "bucket")
    return (a.join(c, "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine",
                        _dot(F.col("vec_a"), F.col("vec_b"))
                        / (_norm(F.col("vec_a")) * _norm(F.col("vec_b"))))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def lsh_bucketed_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                      n_bits: int = 8, dim: int = 64,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """ANN: bucket both sides on sign-LSH, join on bucket, exact cosine
    re-rank inside buckets. Recall < 1.0 by construction; raise via
    multi-probe (duplicate queries with single-bit flips). At 10^12
    rows the bucket join shuffles only (id, bucket, vec) pairs and the
    per-bucket re-rank is embarrassingly parallel."""
    planes = hyperplanes(n_bits, dim)
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("c_vec"),
                      sign_lsh_bucket(F.col(vec_col), planes)
                      .alias("bucket"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"),
                       sign_lsh_bucket(F.col(vec_col), planes)
                       .alias("bucket"))
    scored = (c.join(F.broadcast(q), "bucket")
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cosine",
                          _dot(F.col("q_vec"), F.col("c_vec"))
                          / (_norm(F.col("q_vec")) * _norm(F.col("c_vec")))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def semantic_dedup(embeddings: DataFrame, threshold: float = 0.95,
                   n_centroids: int = 8, dim: int = 64,
                   centroids: List[List[float]] | None = None,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster embeddings
    into IVF cells, compute pairwise cosines WITHIN each cell only, and
    drop every row that has a lower-id row in its cell with cosine >=
    threshold (deterministic keep-lowest-id, no iteration). Returns
    (id, cell, keep).

    Scale shape: the clustering bounds the quadratic — the self-join is
    equi on ``cell``, so each cell's pairs stay inside one shuffle
    partition family and total work is sum over cells of n_c^2, the
    exact knob SemDeDup turns (more centroids => smaller n_c). Cells
    with heavy skew get more centroids or a per-cell LSH pre-filter
    (``lsh_bucket_pairs``); centroids are plan literals exactly like
    ``ivf_topk``'s."""
    if centroids is None:
        centroids = ivf_centroids(n_centroids, dim)
    assigned = ivf_assign(
        embeddings.select(id_col, vec_col), centroids, vec_col)
    a = assigned.select(F.col(id_col).alias("_ida"), "cell",
                        F.col(vec_col).alias("_va"))
    b = assigned.select(F.col(id_col).alias("_idb"), "cell",
                        F.col(vec_col).alias("_vb"))
    cos = _dot(F.col("_va"), F.col("_vb")) / \
        (_norm(F.col("_va")) * _norm(F.col("_vb")))
    dropped = (a.join(b, "cell")
               .filter(F.col("_ida") > F.col("_idb"))
               .withColumn("_cos", cos)
               .filter(F.col("_cos") >= threshold)
               .select(F.col("_ida").alias(id_col))
               .distinct())
    return (assigned.select(id_col, "cell")
            .join(dropped.withColumn("_dup", F.lit(True)), id_col, "left")
            .select(id_col, "cell",
                    F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep")))
