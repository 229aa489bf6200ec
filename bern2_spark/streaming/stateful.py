"""Custom stateful streaming operator: running per-type entity totals
over a document stream via ``applyInPandasWithState``.

The batch pipeline computes A1/A5 metrics per run; an incremental
deployment wants RUNNING totals that survive across micro-batches
without re-reading history. That is exactly the
``applyInPandasWithState`` shape: group the stream by ``ent_type``,
keep (n_mentions, n_docs-ish) counters in GroupState, emit the updated
cumulative row each batch.

The tagging itself stays the batch operator — ``extract_mentions`` is a
``mapInPandas`` projection, which Structured Streaming runs per
micro-batch unchanged (stateless narrow op). Only the accumulation is
stateful.

No watermark: counters are monotone totals keyed by a tiny closed set
(entity types), so state size is bounded and late data simply folds in
whenever it arrives.
"""

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

STATE_SCHEMA = StructType([
    StructField("total_mentions", LongType()),
    StructField("total_batches", LongType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("ent_type", StringType()),
    StructField("total_mentions", LongType()),
    StructField("total_batches", LongType()),
])


def _update_counts(key, pdfs, state: GroupState):
    import pandas as pd
    n_new = 0
    for pdf in pdfs:
        n_new += len(pdf)
    if state.exists:
        total, batches = state.get
    else:
        total, batches = 0, 0
    total += n_new
    batches += 1
    state.update((total, batches))
    yield pd.DataFrame({"ent_type": [key[0]],
                        "total_mentions": [total],
                        "total_batches": [batches]})


def running_entity_totals(mentions_stream: DataFrame) -> DataFrame:
    """MENTIONS stream -> one updated cumulative row per ent_type per
    micro-batch. State is O(|entity types|) — bounded forever."""
    return (mentions_stream
            .groupBy("ent_type")
            .applyInPandasWithState(
                _update_counts,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def stream_entity_totals(spark, input_dir: str, lexicon_rows,
                         out_dir: str, checkpoint_dir: str):
    """End-to-end stateful stream: watch ``input_dir`` for document
    parquet, tag each micro-batch (stateless mapInPandas), accumulate
    per-type totals in GroupState, append the running rows to
    ``out_dir`` (processes the backlog, then stops — CI mode)."""
    from bern2_spark import schemas
    from bern2_spark.operators.preprocess import preprocess
    from bern2_spark.operators.tagging import extract_mentions

    stream = (spark.readStream
              .schema(schemas.DOCUMENTS)
              .parquet(input_dir))
    mentions = extract_mentions(preprocess(stream), lexicon_rows)
    totals = running_entity_totals(mentions)

    # the file sink is append-only and cannot take update-mode output;
    # foreachBatch appends each batch's refreshed rows with its id
    def write_batch(batch_df, batch_id: int) -> None:
        from pyspark.sql import functions as F
        (batch_df.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(out_dir))

    query = (totals.writeStream
             .outputMode("update")
             .foreachBatch(write_batch)
             .option("checkpointLocation", checkpoint_dir)
             .trigger(availableNow=True)
             .start())
    query.awaitTermination()
    return query
