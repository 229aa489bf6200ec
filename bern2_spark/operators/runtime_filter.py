"""Bloom runtime-filter semi-join: prune the big side BEFORE its
shuffle with a broadcast Bloom filter of the small side's keys.

This is the manual form of the runtime row filtering engines inject
automatically (Spark 3.3+ runtime bloom filter joins, guarded by
``spark.sql.optimizer.runtime.bloomFilter.enabled``); having it as an
explicit operator matters at 100 TB because the automatic injection
only fires under planner heuristics (creation-side size thresholds,
shuffle-join shapes), while a pipeline author often KNOWS the probe
side is huge and the build side is selective.

Correctness is one-sided and therefore free: a Bloom filter has no
false negatives, so pre-filtering can never drop a row that the exact
join would keep; false positives merely survive until the exact
semi-join verifies them.  The result is BIT-IDENTICAL to the plain
semi-join — the oracle for any query using this operator is the plain
EXISTS/IN SQL.

Plan shape: the bitmap is built by the same bounded aggregation as
streaming/bloom.py (groupBy(word_idx).bit_or — at most m/64 int64
rows no matter the build-side size); the probe side's membership test
is k BROADCAST hash lookups of that words table — broadcast joins
STREAM the probe side, so the test adds zero probe-side exchanges
(streaming/bloom.py's ``probably_seen`` instead shuffles k position
rows per probe row for its per-doc verdict — the wrong shape for a
pre-filter) — and only survivors reach the exact join's exchange.
At build selectivity s the semi-join shuffles ~(s + FPR) of the probe
side instead of all of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bern2_spark.streaming.bloom import batch_bitmap

_WORD = 64


def bloom_semi_join(big: DataFrame, small: DataFrame, key_col: str,
                    m_bits: int = 1 << 20, k: int = 5) -> DataFrame:
    """Rows of ``big`` whose ``key_col`` appears in ``small`` —
    exactly ``big SEMI JOIN small ON key`` — with the big side pruned
    by a broadcast Bloom filter of small's keys before the join's
    shuffle.  Result is identical to the plain semi-join (no false
    negatives; false positives are removed by the verifying join)."""
    build = small.select(F.col(key_col).cast("string").alias("_k")) \
        .distinct()
    words = batch_bitmap(build, "_k", k, m_bits)
    kc = F.col(key_col).cast("string")
    probe = big
    keep = F.lit(True)
    for i in range(k):
        pos = F.pmod(F.xxhash64(kc, F.lit(i)), F.lit(m_bits))
        widx = (pos / _WORD).cast("long")
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST(pmod(pmod(xxhash64(CAST(`{key_col}` AS STRING), "
            f"{i}), {m_bits}), {_WORD}) AS INT))")
        w = (words.select(F.col("word_idx").alias(f"_wi{i}"),
                          F.col("word").alias(f"_w{i}")))
        probe = (probe.withColumn(f"_wi{i}", widx)
                 .join(F.broadcast(w), f"_wi{i}", "left"))
        keep = keep & (F.coalesce(F.col(f"_w{i}"), F.lit(0))
                       .bitwiseAND(mask) != 0)
    drop = [c for i in range(k) for c in (f"_wi{i}", f"_w{i}")]
    candidates = probe.filter(keep).drop(*drop)
    return candidates.join(
        small.select(key_col).distinct(), key_col, "left_semi")
