"""Bucketized interval (range) join — point-in-interval without a
theta join.

``points JOIN intervals ON key = key AND lo <= x < hi`` has no
equi-join key on the range predicate, so Spark plans it as a
BroadcastNestedLoopJoin (or a full cartesian product per key) — O(n*m)
comparisons per key, the classic scale killer for event attribution,
genomic overlap, IP-range lookup, and time-window enrichment.  The
reference has no range operator at all (BERN2 joins mentions to spans
by exact offsets); this is part of the engine's training-data /
analytics extension surface.

The bucketization trick turns it into an equi-join:

1. pick a bucket width ``W`` (ideally ~ the typical interval length);
2. each point lands in exactly ONE bucket: ``floor(x / W)``;
3. each interval is exploded to every bucket it overlaps:
   ``sequence(floor(lo/W), floor((hi-1)/W))`` — ``ceil(len/W)+1``
   copies at most, a bounded expansion factor;
4. equi-join on ``(key..., bucket)`` then re-check the exact range
   predicate.  A point occupies one bucket and an interval contributes
   one row per bucket, so every qualifying (point, interval) pair is
   produced exactly once — no dedup pass.

At 100 TB both sides shuffle hash-partitioned on (key, bucket) — a
plain shuffled hash / sort-merge join that AQE can skew-split; the
nested-loop plan Spark would otherwise pick cannot be partitioned on
the range predicate at all.  Columns are pruned to the join key +
payload before the explode, so the duplicated interval rows are
skinny.  ``tests/test_rangejoin.py`` asserts the executed plan
contains no BroadcastNestedLoopJoin / CartesianProduct.

All range columns are LONG (caller converts timestamps to epoch
micros, genome coordinates stay ints) — generic over any ordered
domain, and immune to session-timezone reinterpretation.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(points: DataFrame, intervals: DataFrame,
                  key_cols: List[str], point_col: str,
                  lo_col: str, hi_col: str,
                  bucket_width: int) -> DataFrame:
    """Inner-join every point row to every interval row of the same
    key with ``lo <= point < hi`` (half-open, the standard window
    convention).  ``point_col``/``lo_col``/``hi_col`` must be integral
    (LONG) columns; ``bucket_width`` is in the same units.  Empty or
    inverted intervals (hi <= lo) match nothing.  Non-key column names
    must not collide across the two inputs (select/alias first)."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be a positive integer")
    overlap = set(points.columns) & set(intervals.columns) - set(key_cols)
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")
    w = F.lit(int(bucket_width)).cast("long")
    p = points.withColumn(
        "_rj_bucket", F.floor(F.col(point_col).cast("long") / w))
    iv = (intervals
          .where(F.col(hi_col).cast("long") > F.col(lo_col).cast("long"))
          .withColumn(
              "_rj_bucket",
              F.explode(F.sequence(
                  F.floor(F.col(lo_col).cast("long") / w),
                  F.floor((F.col(hi_col).cast("long") - F.lit(1)) / w)))))
    return (p.join(iv, [*key_cols, "_rj_bucket"])
            .where((F.col(point_col) >= F.col(lo_col))
                   & (F.col(point_col) < F.col(hi_col)))
            .drop("_rj_bucket"))
