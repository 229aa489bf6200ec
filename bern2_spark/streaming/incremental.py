"""Incremental/streaming variant (SURVEY §2.10).

The reference has no streaming semantics — its request/response loop
(app/__init__.py:63-89) is subsumed by our batch job. But the pipeline
is embarrassingly per-document, so an incremental deployment drops into
Structured Streaming unchanged: a file-source stream of document
batches -> ``foreachBatch`` running the SAME batch plan -> appends
through the checkpointed sink. No stateful operators, no watermarks —
per-doc work needs neither.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bern2_spark import schemas
from bern2_spark.pipeline import run_pipeline
from bern2_spark.sources.sink import CheckpointedSink


def stream_documents(spark: SparkSession, input_dir: str,
                     lexicon_rows: Sequence[Tuple[str, str, str]],
                     out_dir: str, checkpoint_dir: str,
                     available_now: bool = True):
    """Watch ``input_dir`` for document parquet files; annotate each
    micro-batch with the batch pipeline; append triples + annotations.

    ``available_now=True`` processes the current backlog and stops —
    the test/CI mode; a real deployment runs continuous triggers."""
    sink = CheckpointedSink(out_dir)

    stream = (spark.readStream
              .schema(schemas.DOCUMENTS)
              .parquet(input_dir))

    def process_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # context manager releases the pipeline's persisted RDDs after
        # the writes — without it, caches accumulate across micro-batches
        with run_pipeline(batch_df, lexicon_rows,
                          batch_df.sparkSession) as result:
            (result.annotations.withColumn("batch_id", F.lit(batch_id))
             .write.mode("append").parquet(f"{out_dir}/annotations_stream"))
            (result.triples.withColumn("batch_id", F.lit(batch_id))
             .write.mode("append").parquet(f"{out_dir}/triples_stream"))

    writer = (stream.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination()
        return query
    return writer.start()


def stream_cooccurrence(spark: SparkSession, triples_dir: str,
                        out_dir: str, checkpoint_dir: str,
                        available_now: bool = True):
    """Incremental KG-edge maintenance: a stream of new triples keeps
    the co-occurrence edge table current by appending per-batch edge
    DELTAS; ``read_cooccurrence_edges`` merges on read.

    DOC-IDEMPOTENT deltas: nothing assumes a document's triples land in
    one micro-batch (the file source is free to split a doc's files
    across triggers, and upstream sinks partition triples by pred, so
    one doc routinely spans files). The job keeps a (doc, cui) state
    table; a batch's delta is computed only over the docs it touches:
        delta(doc) = pairs(state ∪ batch) − pairs(state)
    Every contribution is +1 (a doc gaining entities only ADDS pairs),
    so deltas stay additive and groupBy-sum on read still equals the
    batch recompute over the full input (asserted for split docs in
    tests/test_streaming.py).

    Scale shape: the state read is semi-join-pruned to the batch's
    affected docs before the pair self-join, so per-trigger cost is
    O(batch docs × entities-per-doc²), never corpus-proportional; the
    delta+compaction pattern on the read side is unchanged."""

    state_dir = f"{out_dir}/doc_cuis"

    stream = (spark.readStream
              .schema("subj string, pred string, obj string")
              .parquet(triples_dir))

    def _pairs(e):
        a = e.select("doc", F.col("cui").alias("cui_a"))
        b = e.select("doc", F.col("cui").alias("cui_b"))
        return a.join(b, "doc").filter(F.col("cui_a") < F.col("cui_b"))

    def process_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ss = batch_df.sparkSession
        new_e = (batch_df.select(F.col("subj").alias("doc"),
                                 F.col("obj").alias("cui"))
                 .distinct())
        try:
            prev = (ss.read.parquet(state_dir)
                    .select("doc", "cui")
                    .join(new_e.select("doc").distinct(), "doc",
                          "semi"))
        except Exception:  # first batch: no state yet
            prev = ss.createDataFrame([], "doc string, cui string")
        # the delta plan reads the CURRENT state lazily — it must be
        # materialized (written) before the state append below, or the
        # scan would see this batch's own state files
        delta = (_pairs(prev.union(new_e).distinct())
                 .subtract(_pairs(prev))
                 .groupBy("cui_a", "cui_b")
                 .agg(F.count("*").alias("n_docs")))
        (delta.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(f"{out_dir}/cooccur_delta"))
        # materialize before appending: the plan reads state_dir, the
        # write targets state_dir — pin the scan's file list first
        new_state = (new_e.subtract(prev)
                     .withColumn("batch_id", F.lit(batch_id))
                     .persist())
        new_state.count()
        new_state.write.mode("append").parquet(state_dir)
        new_state.unpersist()

    writer = (stream.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination()
        return query
    return writer.start()


def read_cooccurrence_edges(spark: SparkSession, out_dir: str):
    """Merge-on-read over the streamed edge deltas (the compaction
    job runs this same plan and rewrites the summed table)."""
    return (spark.read.parquet(f"{out_dir}/cooccur_delta")
            .groupBy("cui_a", "cui_b")
            .agg(F.sum("n_docs").alias("n_docs")))
