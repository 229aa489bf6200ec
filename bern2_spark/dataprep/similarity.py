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


def sign_lsh_bucket(vec_col, n_bits: int = 8):
    """Deterministic sign-LSH bucket id: bit i = sign of the dot product
    with pseudo-random hyperplane i, whose components are ±1 derived
    from md5(i:dim) — reproducible on any engine, no RNG state."""
    def bit(i):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.transform(F.sequence(F.lit(0), F.size(vec_col) - 1),
                            lambda d: F.when(
                                F.conv(F.substring(
                                    F.md5(F.concat_ws(
                                        ":", F.lit(i), d.cast("string"))),
                                    1, 4), 16, 10).cast("long") % 2 == 0,
                                F.lit(1.0)).otherwise(F.lit(-1.0))),
                lambda x, p: x * p),
            F.lit(0.0), lambda acc, v: acc + v)
        return F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    bucket = F.lit(0)
    for i in range(n_bits):
        bucket = bucket + bit(i)
    return bucket


def lsh_bucketed_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                      n_bits: int = 8, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """ANN: bucket both sides on sign-LSH, join on bucket, exact cosine
    re-rank inside buckets. Recall < 1.0 by construction; raise via
    multi-probe (duplicate queries with single-bit flips)."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("c_vec"),
                      sign_lsh_bucket(F.col(vec_col), n_bits).alias("bucket"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"),
                       sign_lsh_bucket(F.col(vec_col), n_bits).alias("bucket"))
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
