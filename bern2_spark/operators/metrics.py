"""Metrics / lineage side-outputs. Operators A1, A5, A6 of SURVEY §2.4
plus per-partition lineage rows (north rule: per-partition lineage +
metrics). All plain hash aggregations — partial map-side combine free."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bern2_spark.schemas import CUI_LESS


def entity_counts(mentions: DataFrame) -> DataFrame:
    """A1 — num_entities per doc (multi_ner/ner_server.py:11-19)."""
    return (mentions.groupBy("doc_id")
            .agg(F.count("*").alias("num_entities")))


def cuiless_rate(normalized: DataFrame) -> DataFrame:
    """A5 — per-type CUI-less fraction (bern2/normalizer.py:429-441)."""
    return (normalized.groupBy("ent_type")
            .agg(F.count("*").alias("n_mentions"),
                 F.avg((F.col("cui") == CUI_LESS).cast("int"))
                  .alias("cuiless_frac")))


def partition_lineage(df: DataFrame, stage: str) -> DataFrame:
    """Per-partition lineage rows: (stage, partition, rows). Cheap
    observability at any scale — one count per partition, no shuffle of
    the data itself."""
    return (df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("rows"))
            .withColumn("stage", F.lit(stage))
            .select("stage", "partition_id", "rows"))


def predicate_functionality(triples, subj_col="subj", pred_col="pred",
                            obj_col="obj", round_to=6):
    """Per-predicate functionality profile (PARIS, Suchanek et al.
    2011): fun(p) = #distinct subjects / #distinct (subject, object)
    pairs — 1.0 means each subject has exactly one object (the
    predicate behaves like a key), and the inverse functionality is
    the same ratio from the object side.  Alignment and
    link-prediction systems weight evidence by exactly these ratios,
    and they double as KG quality profiling (a 'has_variant' predicate
    suddenly reading functional signals an extraction bug).

    One map-side-combined groupBy(pred) with distinct-count
    aggregates; output is |predicates| rows.  Exact integer counts
    feed the rounded ratios identically in both engines."""
    from pyspark.sql import functions as F
    g = (triples.groupBy(F.col(pred_col).alias("pred"))
         .agg(F.count("*").cast("long").alias("n_triples"),
              F.countDistinct(subj_col).cast("long").alias("n_subjects"),
              F.countDistinct(obj_col).cast("long").alias("n_objects"),
              F.countDistinct(subj_col, obj_col).cast("long")
              .alias("n_pairs")))
    return g.select(
        "pred", "n_triples", "n_subjects", "n_objects", "n_pairs",
        F.round(F.col("n_subjects") / F.col("n_pairs"), round_to)
        .alias("functionality"),
        F.round(F.col("n_objects") / F.col("n_pairs"), round_to)
        .alias("inv_functionality"))
