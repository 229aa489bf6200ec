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
    """Incremental KG-edge maintenance: a stream of NEW triples (each
    doc appears in exactly one batch — the pipeline's append-only
    output) keeps the co-occurrence edge table current by appending
    per-batch edge DELTAS; ``read_cooccurrence_edges`` merges on read.

    Additivity is what makes this correct: co-occurrence counts over
    disjoint document sets sum, so per-batch deltas + a groupBy-sum on
    read equal the batch recompute over the union (asserted in
    tests/test_streaming.py). At scale this is the standard
    delta+compaction pattern — readers pay a small merge until a
    periodic compaction job rewrites the summed table; nothing
    re-reads old documents."""
    from bern2_spark.operators.cooccur import cooccurrence_edges

    stream = (spark.readStream
              .schema("subj string, pred string, obj string")
              .parquet(triples_dir))

    def process_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (cooccurrence_edges(batch_df)
         .withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(f"{out_dir}/cooccur_delta"))

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
