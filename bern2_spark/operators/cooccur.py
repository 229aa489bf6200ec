"""KG edge construction — entity co-occurrence over the triple store.

The reference emits per-document annotations (doc -> entity triples,
bern2/bern2.py:504-528 output shaping); any knowledge-graph built from
them needs the next derivation: entity-entity edges weighted by how
many documents assert both. This module builds those edges Spark-first.

Scale shape (the part that matters at 100 TB):
* input is the (subj=doc, pred, obj=cui) triple SET (already distinct,
  postprocess.to_triples) — the projection to (doc, cui) is column
  pruning on a parquet scan;
* the pair generation is a self-equi-join on doc: both sides shuffle
  ONCE on the same key and sort-merge co-partitioned, so the quadratic
  blow-up is bounded per doc (entities-per-doc is small and the
  ``max_entities_per_doc`` guard caps pathological hub docs);
* the final groupBy(cui_a, cui_b) aggregates with map-side combine —
  the only corpus-proportional shuffle carries ~(16B + 16B + 8B) rows;
* NPMI scoring joins two tiny per-entity count tables back in as
  broadcasts.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def doc_entity_pairs(triples: DataFrame,
                     max_entities_per_doc: Optional[int] = None
                     ) -> DataFrame:
    """(subj, pred, obj) triples -> distinct (doc, cui) rows.

    ``max_entities_per_doc`` is the hub-doc guard: a doc asserting k
    entities contributes k*(k-1)/2 pairs, so one pathological document
    with 10^4 entities would emit 5*10^7 rows into the join. The cap
    keeps the deterministic smallest CUIs (stable under re-runs);
    real deployments tune it to the corpus' p99.9."""
    e = triples.select(F.col("subj").alias("doc"),
                       F.col("obj").alias("cui")).distinct()
    if max_entities_per_doc is not None:
        w = Window.partitionBy("doc").orderBy("cui")
        e = (e.withColumn("_rk", F.row_number().over(w))
             .filter(F.col("_rk") <= max_entities_per_doc)
             .drop("_rk"))
    return e


def cooccurrence_edges(triples: DataFrame,
                       min_count: int = 1,
                       max_entities_per_doc: Optional[int] = None,
                       npmi: bool = False) -> DataFrame:
    """Undirected co-mention edges: (cui_a, cui_b, n_docs[, npmi]).

    ``cui_a < cui_b`` canonicalizes the pair once (no double counting,
    no self-loops). With ``npmi=True`` adds normalized pointwise mutual
    information npmi = ln(p(a,b)/(p(a)p(b))) / -ln(p(a,b)) with
    probabilities over the document count — the standard edge weight
    for co-mention graphs (rounded to 6 decimals for stable cross-
    engine comparison)."""
    e = doc_entity_pairs(triples, max_entities_per_doc)
    a = e.select("doc", F.col("cui").alias("cui_a"))
    b = e.select("doc", F.col("cui").alias("cui_b"))
    pairs = (a.join(b, "doc")
             .filter(F.col("cui_a") < F.col("cui_b"))
             .groupBy("cui_a", "cui_b")
             .agg(F.count("*").alias("n_docs")))
    if min_count > 1:
        pairs = pairs.filter(F.col("n_docs") >= min_count)
    if not npmi:
        return pairs
    n_total = e.select("doc").distinct().count()
    per = e.groupBy("cui").agg(F.count("*").alias("df"))
    pa = per.select(F.col("cui").alias("cui_a"), F.col("df").alias("_dfa"))
    pb = per.select(F.col("cui").alias("cui_b"), F.col("df").alias("_dfb"))
    pab = F.col("n_docs") / F.lit(float(n_total))
    ratio = (pab / ((F.col("_dfa") / F.lit(float(n_total)))
                    * (F.col("_dfb") / F.lit(float(n_total)))))
    return (pairs.join(F.broadcast(pa), "cui_a")
            .join(F.broadcast(pb), "cui_b")
            .withColumn("npmi",
                        F.when(pab >= 1.0, F.lit(1.0))
                         .otherwise(F.round(F.log(ratio) / -F.log(pab), 6)))
            .select("cui_a", "cui_b", "n_docs", "npmi"))


def sentence_cooccurrence(docs: DataFrame, lexicon: DataFrame,
                          text_col: str = "text",
                          min_count: int = 1) -> DataFrame:
    """Sentence-granular co-mention edges — the higher-precision
    relation signal (two entities in the same SENTENCE assert a far
    stronger association than the same document; the standard first
    step of distant-supervision relation extraction).

    Deliberately relational end to end so the DuckDB oracle runs the
    identical formulation (the pipeline's full segmenter with the
    reference's edge cases is a pandas UDF, operators/segment.py —
    this operator trades those edge cases for engine-portable
    semantics):

    * sentences  = regexp split on ``[.!?] `` (1-based index);
    * tokens     = alnum runs of the lowercased sentence;
    * spotting   = exact match of lexicon names against token unigrams
      AND bigrams — a broadcast EQUI-join (never a contains
      theta-join, which at 100 TB would be a nested-loop over the
      corpus);
    * pairs      = self-join co-partitioned on (doc_id, sent_idx) —
      one shuffle, quadratic blow-up bounded per sentence (sentences
      are <=100 tokens by construction upstream, P18/X3 caps);
    * agg        = (cui_a, cui_b) with map-side combine: n_sents =
      co-occurring sentences, n_docs = distinct documents among them.

    ``lexicon``: (cui, name) rows; multi-token names beyond bigrams
    are not spotted (document corpus lexicons here are 1-2 tokens).
    """
    sents = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col(text_col)), r"[.!?] "))
         .alias("sent_idx0", "sent"))
    # materialized once per sentence row: the bigram HOF's lambda body
    # re-evaluates captured subtrees per element, so the raw split
    # expression would re-tokenize the sentence per bigram position
    sents = sents.withColumn(
        "_ct_toks", F.filter(F.split(F.col("sent"), "[^a-z0-9]+"),
                             lambda t: t != ""))
    toks = F.col("_ct_toks")
    n_bi = F.greatest(F.size(toks) - F.lit(1), F.lit(0))
    bigrams = F.when(n_bi > 0, F.slice(
        F.transform(F.sequence(F.lit(1), F.greatest(n_bi, F.lit(1))),
                    lambda i: F.array_join(F.slice(toks, i, 2), " ")),
        1, n_bi)).otherwise(F.array().cast("array<string>"))
    grams = (sents
             .select("doc_id",
                     (F.col("sent_idx0") + 1).alias("sent_idx"),
                     F.explode(F.concat(toks, bigrams)).alias("gram")))
    lex = lexicon.select(F.lower(F.col("name")).alias("gram"),
                         F.col("cui"))
    ents = (grams.join(F.broadcast(lex), "gram")
            .select("doc_id", "sent_idx", "cui")
            .distinct())
    a = ents.select("doc_id", "sent_idx", F.col("cui").alias("cui_a"))
    b = ents.select("doc_id", "sent_idx", F.col("cui").alias("cui_b"))
    return (a.join(b, ["doc_id", "sent_idx"])
            .filter(F.col("cui_a") < F.col("cui_b"))
            .groupBy("cui_a", "cui_b")
            .agg(F.count("*").alias("n_sents"),
                 F.count_distinct("doc_id").alias("n_docs"))
            .filter(F.col("n_sents") >= min_count))
