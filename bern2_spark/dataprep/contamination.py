"""Benchmark decontamination for training-data pipelines.

The standard hygiene step before pretraining: drop (or flag) corpus
documents that share long token n-grams with an evaluation benchmark,
so downstream eval numbers measure generalization rather than
memorization (the GPT-3 appendix-C / PaLM "13-gram overlap" recipe,
here parameterized on n).

Shape at 100 TB:

* The eval side is small (benchmarks are a few MB-GB of text): its
  DISTINCT shingle set is built once and **broadcast** — the corpus
  side never shuffles its text, and the only wide exchange is the
  per-doc hit count groupBy, whose map-side partial aggregation
  reduces each task's output to one row per locally-seen doc.
* The corpus shingle explode is a narrow map over the document scan
  (same `shingles` expression the dedup family uses, so Catalyst can
  share the subtree when both run in one job).
* `decontaminate` is a broadcast **anti-join on doc_id** against the
  flagged set — the corpus is filtered in place, never repartitioned.

Determinism: pure string shingling + hash-free equality joins — no RNG,
no time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from bern2_spark.dataprep.dedup import shingle_table


def contamination_report(docs: DataFrame, eval_docs: DataFrame,
                         text_col: str = "text",
                         shingle_n: int = 5,
                         min_hits: int = 1) -> DataFrame:
    """Per contaminated corpus doc: how many of its distinct token
    ``shingle_n``-grams appear anywhere in the eval set.

    Returns ``(doc_id, n_hit_shingles, n_shingles, hit_frac)`` for docs
    with at least ``min_hits`` overlapping shingles.  ``hit_frac`` is
    hits over the doc's own distinct-shingle count, i.e. "how much of
    this document is benchmark text".
    """
    corpus_sh = shingle_table(docs, text_col, shingle_n)
    eval_sh = (shingle_table(eval_docs, text_col, shingle_n)
               .select("shingle").distinct())
    totals = corpus_sh.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"))
    hits = (corpus_sh
            .join(broadcast(eval_sh), "shingle")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_hit_shingles"))
            .filter(F.col("n_hit_shingles") >= min_hits))
    return (hits.join(totals, "doc_id")
            .select("doc_id", "n_hit_shingles", "n_shingles",
                    (F.col("n_hit_shingles")
                     / F.col("n_shingles")).alias("hit_frac")))


def decontaminate(docs: DataFrame, eval_docs: DataFrame,
                  text_col: str = "text",
                  shingle_n: int = 5,
                  min_hits: int = 1) -> DataFrame:
    """Corpus minus contaminated docs (same schema as ``docs``).

    The flagged-id set is tiny relative to the corpus, so the anti-join
    broadcasts it; the surviving corpus keeps its partitioning."""
    flagged = (contamination_report(docs, eval_docs, text_col,
                                    shingle_n, min_hits)
               .select("doc_id"))
    return docs.join(broadcast(flagged), "doc_id", "left_anti")
