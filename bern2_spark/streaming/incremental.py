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
