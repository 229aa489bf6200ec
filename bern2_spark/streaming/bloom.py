"""Bloom-filter streaming dedup — constant-memory forever-dedup.

``streaming/dedup.py:stream_dedup_exact`` keeps the full seen-hash
table on disk; its state grows with the number of distinct documents
ever seen (fixed-width digests, but still O(corpus)).  This module is
the other end of the state-size trade: a Bloom filter of ``m`` bits
with ``k`` hashes is a FIXED-size seen-set (e.g. 2^30 bits = 128 MB
covers ~10^8 docs at ~1% false-positive rate) with the classic
one-sided guarantee — a previously seen document is NEVER re-emitted
(no false negatives); a genuinely new document is dropped with
probability ~(1 - e^{-kn/m})^k (the documented cost of constant
state).

Everything stays JVM-side — no Python bitmap, no driver collect:

* a document's k bit positions are ``pmod(xxhash64(hash, seed_i), m)``
  column expressions;
* the batch's bitmap is built by a distributed aggregation
  ``groupBy(pos div 64).agg(bit_or(1 << pos % 64))`` — int64 words,
  at most m/64 rows regardless of batch size, map-side combined;
* membership is an equi-join of the doc's word indexes against the
  state words (m/64 rows — broadcast at any realistic m) and a
  bitwise AND per position: seen iff ALL k bits are set.

State layout mirrors streaming/ann.py: each micro-batch OVERWRITES
``state/batch=<id>/`` with the FULL merged bitmap (previous state
bit_or batch bits), and batch b reads the newest state with id < b —
so a replayed batch recomputes against the same prior state and
rewrites identical files (replay-idempotent).  Snapshots are m/64-row
parquet files; compaction = deleting all but the newest is safe at
any time.

No reference counterpart (bern2/server.py is a batch HTTP service);
Spark-first scale addition per the build brief.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_WORD = 64


def _positions(hash_col, k: int, m_bits: int):
    """Array of k bit positions for a digest column."""
    return F.array(*[
        F.pmod(F.xxhash64(hash_col, F.lit(i)), F.lit(m_bits))
        for i in range(k)])


def position_words(df: DataFrame, hash_col: str, k: int,
                   m_bits: int) -> DataFrame:
    """One row per (source row id, word_idx, mask): where each of the
    k hashes lands, as an int64 word index + single-bit mask."""
    pos = F.explode(_positions(F.col(hash_col), k, m_bits)).alias("pos")
    d = df.select(hash_col, pos)
    # pyspark's F.shiftleft only takes a literal shift count; the SQL
    # form accepts a column expression
    mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                  f"CAST(pmod(pos, {_WORD}) AS INT))")
    return d.select(
        hash_col,
        (F.col("pos") / _WORD).cast("long").alias("word_idx"),
        mask.alias("mask"))


def batch_bitmap(df: DataFrame, hash_col: str, k: int,
                 m_bits: int) -> DataFrame:
    """The batch's Bloom bitmap as (word_idx, word) int64 rows —
    at most m_bits/64 rows, built by one map-side-combined agg."""
    return (position_words(df, hash_col, k, m_bits)
            .groupBy("word_idx")
            .agg(F.bit_or("mask").alias("word")))


def merge_bitmaps(a: DataFrame, b: DataFrame) -> DataFrame:
    """bit_or union of two (word_idx, word) bitmaps."""
    return (a.unionByName(b)
            .groupBy("word_idx")
            .agg(F.bit_or("word").alias("word")))


def probably_seen(df: DataFrame, state: DataFrame, hash_col: str,
                  k: int, m_bits: int) -> DataFrame:
    """Adds ``seen`` (bool): true iff ALL k bits are set in ``state``.
    The state side is m/64 rows — broadcast; the doc side never
    shuffles beyond the per-doc k-row expansion."""
    pw = position_words(df, hash_col, k, m_bits)
    joined = pw.join(F.broadcast(state), "word_idx", "left")
    hit = (F.coalesce(F.col("word"), F.lit(0))
           .bitwiseAND(F.col("mask")) != 0).cast("int")
    verdict = (joined.groupBy(hash_col)
               .agg((F.min(hit) == 1).alias("seen")))
    return df.join(verdict, hash_col, "left")


def _latest_state(spark: SparkSession, state_dir: str,
                  before_batch: int):
    """Newest full-bitmap snapshot with id < before_batch, or None.
    Reading ONE batch dir (each holds the merged full state) keeps
    this a fixed-size read no matter how long the stream has run."""
    if not os.path.isdir(state_dir):
        return None
    ids = sorted(int(e.split("=", 1)[1]) for e in os.listdir(state_dir)
                 if e.startswith("batch="))
    prior = [i for i in ids if i < before_batch]
    if not prior:
        return None
    return spark.read.parquet(
        os.path.join(state_dir, f"batch={prior[-1]}"))


def stream_dedup_bloom(spark: SparkSession, input_dir: str,
                       out_dir: str, schema, text_col: str = "text",
                       m_bits: int = 1 << 16, k: int = 5) -> None:
    """Drain ``input_dir`` (json files) through Bloom-gated dedup:
    survivors under ``docs/batch=<id>`` (overwrite = idempotent),
    merged bitmap snapshots under ``state/batch=<id>``."""
    docs_dir = os.path.join(out_dir, "docs")
    state_dir = os.path.join(out_dir, "state")

    def process_batch(batch_df, batch_id: int) -> None:
        sess = batch_df.sparkSession
        batch = (batch_df
                 .withColumn("text_hash", F.md5(F.col(text_col)))
                 .dropDuplicates(["text_hash"]))
        prev = _latest_state(sess, state_dir, batch_id)
        if prev is not None:
            flagged = probably_seen(batch, prev, "text_hash", k, m_bits)
            survivors = flagged.filter(~F.coalesce("seen", F.lit(False)))
            survivors = survivors.drop("seen")
        else:
            survivors = batch
        (survivors.write.mode("overwrite").format("parquet")
         .save(os.path.join(docs_dir, f"batch={batch_id}")))
        bits = batch_bitmap(batch, "text_hash", k, m_bits)
        merged = bits if prev is None else merge_bitmaps(prev, bits)
        (merged.write.mode("overwrite").format("parquet")
         .save(os.path.join(state_dir, f"batch={batch_id}")))

    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", "1")   # force multi-batch
         .json(input_dir)
         .writeStream.foreachBatch(process_batch)
         .option("checkpointLocation", os.path.join(out_dir, "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def read_survivors(spark: SparkSession, out_dir: str) -> DataFrame:
    return (spark.read
            .option("basePath", os.path.join(out_dir, "docs"))
            .parquet(os.path.join(out_dir, "docs", "batch=*")))
