"""Skew handling — salted joins and salted aggregation (north rule:
"salted joins for head-entity skew").

Context: Zipfian surfaces ("p53", "human") make some join/agg keys
orders of magnitude hotter than the median. Our lexicon lookups are
broadcast joins (skew-immune: no shuffle of the fact side), and AQE
skew-join splitting covers sort-merge joins; salting is the explicit
escape hatch for (a) shuffle joins against dimensions too big to
broadcast and (b) two-phase aggregations where one key dominates.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                n_salts: int = 16, how: str = "left") -> DataFrame:
    """Equi-join robust to hot keys: the fact side gets a random salt in
    [0, n_salts); the dim side is replicated n_salts times. The shuffle
    then spreads each hot key over n_salts reducers.

    Use when ``dim`` exceeds the broadcast threshold; otherwise
    ``F.broadcast`` is strictly better."""
    salted_fact = fact.withColumn(
        "_salt", (F.abs(F.xxhash64(F.monotonically_increasing_id()))
                  % n_salts).cast("int"))
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = salted_fact.join(exploded_dim, [key, "_salt"], how)
    return out.drop("_salt")


def salted_agg_count(df: DataFrame, keys: List[str],
                     n_salts: int = 16) -> DataFrame:
    """Two-phase count for skewed group keys: partial count per
    (key, salt), then final sum per key. Spark's hash aggregate already
    does map-side partial aggregation; the explicit salt additionally
    splits a hot key across reducers in the FIRST shuffle."""
    salted = df.withColumn(
        "_salt", (F.abs(F.xxhash64(*[F.col(k) for k in keys],
                                   F.monotonically_increasing_id()))
                  % n_salts).cast("int"))
    partial = (salted.groupBy(*keys, "_salt")
               .agg(F.count("*").alias("_partial")))
    return (partial.groupBy(*keys)
            .agg(F.sum("_partial").alias("count")))


def hot_key_profile(df: DataFrame, keys: List[str],
                    hot_share: float = 0.01,
                    n_buckets: int = 32) -> DataFrame:
    """The measurement that DRIVES the salting decision: per-key row
    counts and corpus share, keeping only keys above ``hot_share``.

    Output: ``(key..., n_rows, share, recommended_salts)`` where
    ``recommended_salts = ceil(share * n_buckets)`` — the number of
    reducers a key needs so no single task processes more than ~1/
    n_buckets of the table (set n_buckets to the stage's task count).

    Scale shape: one map-side-combined groupBy on the key (the same
    shuffle the skewed agg itself would do, but carrying only counts),
    then the single global-total row joins back via crossJoin of a
    1-row broadcast — no global window funneling all counts through
    one partition."""
    counts = df.groupBy(*keys).agg(F.count("*").alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("_total"))
    share = F.col("n_rows") / F.col("_total")
    return (counts.crossJoin(F.broadcast(total))
            .filter(share >= hot_share)
            .select(*keys, "n_rows",
                    F.round(share, 6).alias("share"),
                    F.ceil(share * n_buckets).cast("int")
                     .alias("recommended_salts")))
