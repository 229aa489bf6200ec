"""Stage 6a — canonicalization. Operators W1 (overlap resolution),
U1 (mutation union), W3 (output ordering) of SURVEY §2.5/§2.7.

W1 reproduces resolve_overlap step 1 (bern2/bern2.py:451-486): group
all typed mentions sharing an exact (start, end) span, rank by
(has-CUI desc, prob desc), and keep every mention whose (cui, ent_type)
equals the top-1's. The reference's Python stable sort breaks ties by
dict insertion order — i.e. the fixed entity-type order of
multi_ner/main.py:523 — so our window adds that type rank plus
mention_id as a final deterministic key.

Mutations bypass W1 entirely and are unioned in afterwards (U1,
bern2/bern2.py:488-489), exactly like the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bern2_spark.schemas import CUI_LESS, ENTITY_TYPE_ORDER


def _type_rank():
    expr = F.lit(len(ENTITY_TYPE_ORDER))
    m = F.create_map(*[x for i, t in enumerate(ENTITY_TYPE_ORDER)
                       for x in (F.lit(t), F.lit(i))])
    return F.coalesce(m[F.col("ent_type")], expr)


def resolve_overlap(normalized: DataFrame) -> DataFrame:
    """W1 — one window over (doc_id, start, end): compute the top-1
    (cui, ent_type) per exact span, keep rows matching it. Single
    shuffle on (doc_id, start, end) prefix doc_id."""
    w = (Window.partitionBy("doc_id", "start", "end")
         .orderBy(F.desc((F.col("cui") != CUI_LESS).cast("int")),
                  F.desc("prob"),
                  _type_rank().asc(),
                  F.asc("mention_id")))
    ranked = (normalized
              .withColumn("top_cui", F.first("cui").over(w))
              .withColumn("top_type", F.first("ent_type").over(w)))
    return (ranked
            .filter((F.col("cui") == F.col("top_cui"))
                    & (F.col("ent_type") == F.col("top_type")))
            .drop("top_cui", "top_type"))


def union_mutations(resolved: DataFrame, mutations_norm: DataFrame) -> DataFrame:
    """U1 — tmVar mentions join the canonical set unconditionally."""
    return resolved.unionByName(mutations_norm)


def order_output(annotations: DataFrame) -> DataFrame:
    """W3 — stable (begin, obj) sort inside each doc
    (bern2/convert.py:329-335). sortWithinPartitions after hashing by
    doc keeps this a local sort at scale (no global range shuffle)."""
    return (annotations
            .repartition("doc_id")
            .sortWithinPartitions("doc_id", "begin", "obj"))


def entity_catalog(mentions: DataFrame,
                   type_col: str = "ent_type", cui_col: str = "cui",
                   mention_col: str = "mention",
                   doc_col: str = "doc_id") -> DataFrame:
    """Entity-linking canonicalization artifact: one row per linked
    entity (ent_type, cui) with its corpus stats and a canonical
    surface form — the table a KG service publishes as its entity
    index. canonical_surface = the entity's most frequent mention
    text, ties broken lexicographically (deterministic re-runs).

    Two aggregations over the same (type, cui)-keyed shuffle family:
    per-surface counts (then a tiny per-entity top-1 window over
    |distinct surfaces| rows, NOT corpus rows) and per-entity
    mention/doc totals. At 100 TB both combine map-side; the window's
    partitions are per-entity surface lists — bounded by vocabulary,
    not corpus size."""
    keys = [type_col, cui_col]
    per_surface = (mentions
                   .groupBy(*keys, mention_col)
                   .agg(F.count("*").alias("_n")))
    w = Window.partitionBy(*keys).orderBy(
        F.col("_n").desc(), F.col(mention_col).asc())
    canon = (per_surface
             .withColumn("_rk", F.row_number().over(w))
             .filter(F.col("_rk") == 1)
             .select(*keys,
                     F.col(mention_col).alias("canonical_surface")))
    stats = (mentions.groupBy(*keys)
             .agg(F.count("*").alias("n_mentions"),
                  F.countDistinct(doc_col).alias("n_docs")))
    return stats.join(canon, keys)
