"""Data mixing under per-domain token budgets.

A pretraining corpus is mixed from domains (web, code, books, by
language, ...) with a target token count per domain.  Two samplers,
one exact and one scale-path, both deterministic (hash order, no RNG):

* ``sample_to_token_budget`` — EXACT greedy: within each domain, docs
  are ranked by a multiplicative hash of their id and taken while the
  running token total is below the budget (the first overflowing doc
  is kept, standard greedy cutoff).  Implemented as one window prefix
  sum.  At 100 TB the window's sort is per-domain — with a handful of
  domains those partitions are huge, so this variant is for
  modest-cardinality strata or post-filtered candidate pools.

* ``sample_to_token_budget_approx`` — SCALE PATH: a first aggregate
  measures tokens per domain, the keep-fraction ``min(1, budget /
  total)`` is broadcast back, and docs pass iff their unit-interval
  hash is below the fraction.  No sort, no wide shuffle of the corpus
  (the only exchange is the tiny per-domain total), expected token
  error O(1/sqrt(n_docs_in_domain)).  This is the variant a 1000-node
  mixing job runs.

The unit-interval hash is the same BIGINT arithmetic the split family
uses (``(id * 2654435761) % 2^32 / 2^32``), so assignments reproduce
bit-identically in the DuckDB oracles.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from bern2_spark.dataprep.textqc import bpe_ish_token_count

_KNUTH = 2654435761
_M32 = 4294967296


def _unit_hash(id_col: Column) -> Column:
    """Deterministic [0,1) bucket from a BIGINT id (Knuth multiplicative
    hash — plain arithmetic so any ANSI engine reproduces it)."""
    return ((id_col * F.lit(_KNUTH)) % F.lit(_M32)).cast("double") / _M32


def _budget_df(docs: DataFrame, budgets: Mapping[str, int],
               domain_col: str):
    spark = docs.sparkSession
    return spark.createDataFrame(
        [(k, int(v)) for k, v in sorted(budgets.items())],
        f"{domain_col} string, budget bigint")


def sample_to_token_budget(docs: DataFrame,
                           budgets: Mapping[str, int],
                           domain_col: str = "lang",
                           id_col: str = "doc_id",
                           text_col: str = "text",
                           token_col: str | None = None) -> DataFrame:
    """Exact greedy cut: (docs columns) + ``n_tokens`` for the selected
    docs.  A doc is kept iff the token sum of all hash-earlier docs in
    its domain is still under the domain's budget; domains absent from
    ``budgets`` contribute nothing."""
    tokens = (F.col(token_col) if token_col
              else bpe_ish_token_count(F.col(text_col))).cast("long")
    w = (Window.partitionBy(domain_col)
         .orderBy(_unit_hash(F.col(id_col)), id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    return (docs
            .withColumn("n_tokens", tokens)
            .join(broadcast(_budget_df(docs, budgets, domain_col)),
                  domain_col)
            .withColumn("cum_before",
                        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
            .filter(F.col("cum_before") < F.col("budget"))
            .drop("cum_before", "budget"))


def sample_to_token_budget_approx(docs: DataFrame,
                                  budgets: Mapping[str, int],
                                  domain_col: str = "lang",
                                  id_col: str = "doc_id",
                                  text_col: str = "text",
                                  token_col: str | None = None
                                  ) -> DataFrame:
    """Scale-path sampler: keep docs whose unit hash falls below the
    domain's measured keep-fraction.  Output adds ``n_tokens`` and the
    applied ``keep_frac``.  Deterministic given the corpus."""
    tokens = (F.col(token_col) if token_col
              else bpe_ish_token_count(F.col(text_col))).cast("long")
    with_tok = docs.withColumn("n_tokens", tokens)
    fracs = (with_tok
             .groupBy(domain_col)
             .agg(F.sum("n_tokens").alias("domain_tokens"))
             .join(broadcast(_budget_df(docs, budgets, domain_col)),
                   domain_col)
             .select(domain_col,
                     F.least(F.lit(1.0),
                             F.col("budget")
                             / F.col("domain_tokens")).alias("keep_frac")))
    return (with_tok
            .join(broadcast(fracs), domain_col)
            .filter(_unit_hash(F.col(id_col)) < F.col("keep_frac")))
