"""Bounded-state cardinality sketches for 100-TB profiling.

K-minimum-values (KMV / bottom-k) distinct counting: hash every value
to a uniform (0,1) fraction, keep only the k smallest DISTINCT
fractions per group, estimate distinct = (k-1)/u_k (Bar-Yossef et al.
2002, "Counting distinct elements in a data stream"). The sketch is
mergeable — per-partition bottom-k buffers union into the exact global
bottom-k — which is what makes it the right shape on a cluster: the
shuffle carries at most ``partitions x groups x k`` 16-byte rows no
matter how many trillions of values were scanned, where an exact
``count(DISTINCT ...)`` shuffles every distinct value.

Everything is deterministic and engine-portable by construction: the
uniform fraction is the first 13 hex digits of md5 (52 bits — exact in
a double, divided by the power-of-two 16^13, so no rounding anywhere),
the estimator is one IEEE division, and the k-min set is independent
of partitioning. The DuckDB oracle recomputes the same fractions from
the same md5 with positional hex arithmetic.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 16^13 = 2^52: 13 hex digits are exact in a double, and dividing by a
# power of two is exact, so u is the SAME double on any IEEE engine.
_HEX_DIGITS = 13
_DENOM = float(16 ** _HEX_DIGITS)


def uniform_hash_col(col):
    """Deterministic uniform-(0,1) fraction of a string column:
    first 13 hex digits of md5, exactly representable, no rounding."""
    return (F.conv(F.substring(F.md5(col), 1, _HEX_DIGITS), 16, 10)
            .cast("double") / F.lit(_DENOM))


def kmv_partial_sketch(hashed: DataFrame, group_col: str, k: int,
                       u_col: str = "u") -> DataFrame:
    """Per-partition bottom-k: fold every Arrow batch of a partition
    into a per-group sorted buffer of at most k distinct fractions and
    emit the buffers once at partition end. This is the bounded-state
    step Spark's built-ins can't express (a window rank needs the full
    distinct set shuffled first); mapInPandas keeps it a streaming
    O(groups x k) fold per partition. Output rows: (group, u),
    <= groups x k per partition."""
    import pandas as pd

    schema = f"`{group_col}` string, `{u_col}` double"

    def fold(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        state: dict = {}
        for pdf in batches:
            for g, sub in pdf.groupby(group_col, sort=False):
                seen = state.setdefault(g, set())
                seen.update(sub[u_col].tolist())
                if len(seen) > k:
                    state[g] = set(sorted(seen)[:k])
        rows = [(g, u) for g, us in state.items() for u in sorted(us)[:k]]
        yield pd.DataFrame(rows, columns=[group_col, u_col])

    return hashed.mapInPandas(fold, schema=schema)


def kmv_distinct(df: DataFrame, value_col: str, group_col: str,
                 k: int = 32) -> DataFrame:
    """(group, kmv_distinct): estimated distinct ``value_col`` count
    per group from a bottom-k sketch.

    Plan shape: one scan computing (group, u); a mapInPandas partial
    sketch bounding each partition's output to groups x k rows; ONE
    shuffle of those bounded rows to merge per group (collect_set is
    safe here — its input is <= partitions x k per group BY
    CONSTRUCTION, not by data luck); estimate (k-1)/u_k when the
    merged sketch is full, else the sketch IS the distinct set and the
    estimate is exact. At 10^12 rows the exact-distinct alternative
    shuffles 10^12 hashes; this shuffles partitions x groups x k."""
    hashed = df.select(F.col(group_col).cast("string").alias(group_col),
                       uniform_hash_col(F.col(value_col)).alias("u"))
    partial = kmv_partial_sketch(hashed, group_col, k)
    return kmv_estimate(partial, group_col, k)


def kmv_estimate(minima: DataFrame, group_col: str, k: int) -> DataFrame:
    """Merge (group, u) minima rows — from any number of partial
    sketches — into the global bottom-k per group and apply the
    estimator: (k-1)/u_k when the merged sketch is full, exact count
    otherwise. Bottom-k merge is set-union + k-min, so this read-side
    merge is order- and duplication-insensitive: the same helper
    serves the batch operator and the streaming merge-on-read path
    (streaming/sketch.py), where replayed micro-batches may contribute
    identical minima twice."""
    merged = (minima.groupBy(group_col)
              .agg(F.array_sort(F.collect_set("u")).alias("us")))
    n = F.size("us")
    est = F.when(n >= k,
                 (F.lit(float(k - 1)) / F.element_at("us", k)))
    return merged.select(
        group_col,
        F.round(F.coalesce(est, n.cast("double")), 4)
        .alias("kmv_distinct"))


def kmv_oracle_sql(table: str, value_col: str, group_col: str,
                   k: int = 32) -> str:
    """DuckDB twin: same md5 fractions via positional hex arithmetic
    (no conv() in DuckDB), same full-sketch rule, same one division."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substring(hx, {i + 1}, 1)) - 1) "
        f"* {float(16 ** (_HEX_DIGITS - 1 - i))!r}"
        for i in range(_HEX_DIGITS))
    return f"""
WITH h AS (
  SELECT {group_col}::VARCHAR AS g, md5({value_col}) AS hx FROM {table}
),
u AS (SELECT DISTINCT g, ({terms}) / {_DENOM!r} AS u FROM h),
ranked AS (
  SELECT g, u,
         row_number() OVER (PARTITION BY g ORDER BY u) AS rn,
         count(*) OVER (PARTITION BY g) AS cnt
  FROM u
)
SELECT g AS {group_col},
       round(CASE WHEN cnt >= {k}
                  THEN {float(k - 1)!r} / max(CASE WHEN rn = {k} THEN u END)
                  ELSE cnt::DOUBLE END, 4) AS kmv_distinct
FROM ranked
GROUP BY g, cnt
"""
