"""Table profiling and declarative data-quality checks — the
Deequ/Great-Expectations operator family for the engine's input
tables.

Why first-class: a 100-TB ingest that silently carries 4% NULL
``content`` rows or duplicate ``doc_id``s poisons every downstream
operator; production pipelines gate on a profile + constraint suite
BEFORE the expensive work runs.  Both operators here are single-scan:
every per-column statistic and every constraint verdict folds into
ONE map-side-combined aggregate over the table — no per-column passes
(Deequ's own scan-sharing design), no shuffle beyond the one
aggregation exchange, and the output is bounded by the column/
constraint count, never the row count.

Reference scope note: BERN2 validates inputs imperatively per request
(bern2/bern2.py input guards); this is the batch-corpus
generalization (SURVEY §2.12 infrastructure)."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame,
                    cols: Sequence[str] | None = None,
                    round_to: int = 6) -> DataFrame:
    """Per-column completeness profile: NULL count, empty-string
    count (string columns), approximate-free exact distinct count,
    and completeness ratio — one row per column, ALL computed in one
    scan-shared aggregate (each statistic is a conditional-count
    expression; countDistinct adds its per-column expand but stays in
    the single groupBy-less aggregate).

    Output: (column, n_rows, n_null, n_empty, n_distinct,
    completeness)."""
    cols = list(cols) if cols is not None else df.columns
    aggs = [F.count("*").alias("_n")]
    str_cols = {f.name for f in df.schema.fields
                if f.dataType.simpleString() == "string"}
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1))
                    .alias(f"_null_{c}"))
        empty = (F.count(F.when(F.col(c) == "", 1))
                 if c in str_cols else F.lit(0))
        aggs.append(empty.alias(f"_empty_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"_dist_{c}"))
    one = df.agg(*aggs)
    rows = None
    for c in cols:
        r = one.select(
            F.lit(c).alias("column"),
            F.col("_n").cast("long").alias("n_rows"),
            F.col(f"_null_{c}").cast("long").alias("n_null"),
            F.col(f"_empty_{c}").cast("long").alias("n_empty"),
            F.col(f"_dist_{c}").cast("long").alias("n_distinct"),
            F.round((F.col("_n") - F.col(f"_null_{c}"))
                    / F.col("_n"), round_to).alias("completeness"))
        rows = r if rows is None else rows.unionByName(r)
    return rows


def check_constraints(df: DataFrame,
                      checks: Sequence[tuple[str, Column]],
                      unique_keys: Sequence[str] = (),
                      ) -> DataFrame:
    """Declarative constraint suite: each named ROW-LEVEL predicate
    is counted for violations in the shared single-scan aggregate; a
    ``unique_keys`` entry adds the one TABLE-LEVEL check that needs
    its own (map-side-combined) aggregation — key-duplicate counting.
    The verdict table is what a pipeline gates on (Deequ
    VerificationSuite shape).

    ``checks``: (name, boolean Column that is True when the row
    PASSES).  Output: (constraint, n_violations, passed)."""
    aggs = [F.count(F.when(~cond, 1)).cast("long").alias(f"_v_{i}")
            for i, (_, cond) in enumerate(checks)]
    one = df.agg(*aggs) if aggs else None
    rows = None
    for i, (name, _) in enumerate(checks):
        r = one.select(F.lit(name).alias("constraint"),
                       F.col(f"_v_{i}").alias("n_violations"))
        rows = r if rows is None else rows.unionByName(r)
    if unique_keys:
        dup = (df.groupBy(*[F.col(k) for k in unique_keys])
               .agg(F.count("*").alias("_n"))
               .filter(F.col("_n") > 1)
               .agg(F.coalesce(F.sum("_n"), F.lit(0)).cast("long")
                    .alias("n_violations"))
               .select(F.lit("unique(" + ",".join(unique_keys) + ")")
                       .alias("constraint"), "n_violations"))
        rows = dup if rows is None else rows.unionByName(dup)
    return rows.withColumn("passed", F.col("n_violations") == 0)


def schema_drift(current: DataFrame, baseline: DataFrame,
                 cols: Sequence[str] | None = None,
                 completeness_tol: float = 0.05,
                 round_to: int = 6) -> DataFrame:
    """Snapshot-over-snapshot drift report: the column profiles of
    two table versions joined side by side with completeness deltas
    and a drift flag — the monitoring readout that catches a
    upstream schema/quality regression (a feed silently starts
    NULLing a column; a join key loses cardinality) before the
    pipeline consumes the new snapshot.

    Both profiles are the single-scan aggregate of
    ``profile_columns``; the comparison joins |columns| rows.
    Distinct-count drift is reported as a ratio (current/baseline)
    rather than flagged — cardinality legitimately grows with
    volume; completeness should not move.

    Output: (column, completeness_now, completeness_base,
    completeness_delta, distinct_ratio, drifted)."""
    now = profile_columns(current, cols)
    base = profile_columns(baseline, cols)
    j = (now.select(F.col("column"),
                    F.col("completeness").alias("completeness_now"),
                    F.col("n_distinct").alias("_dn"))
         .join(base.select(
             F.col("column"),
             F.col("completeness").alias("completeness_base"),
             F.col("n_distinct").alias("_db")), "column"))
    delta = F.col("completeness_now") - F.col("completeness_base")
    return j.select(
        "column", "completeness_now", "completeness_base",
        F.round(delta, round_to).alias("completeness_delta"),
        F.round(F.col("_dn") / F.col("_db"), round_to)
        .alias("distinct_ratio"),
        (F.abs(delta) > completeness_tol).alias("drifted"))
