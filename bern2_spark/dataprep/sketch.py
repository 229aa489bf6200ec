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


# -------------------------------------------------- Count-Min sketch

def cms_bucket(col, seed: int, width: int):
    """Deterministic CMS row hash: first 13 md5 hex digits of
    'seed:value' (exact in a long) mod width — the same
    engine-portable construction as the KMV fraction, so the DuckDB
    oracle reproduces the sketch bit-for-bit."""
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, _HEX_DIGITS),
        16, 10).cast("long")
    return F.pmod(h, F.lit(width))


def cms_sketch(df: DataFrame, value_col: str,
               depth: int = 4, width: int = 256) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of a value
    column: ``depth`` hash rows of ``width`` counters.  Output rows
    (seed, bucket, cnt) — at most depth*width regardless of input
    size, and the groupBy's map-side partial aggregation bounds the
    shuffle to partitions * depth * width rows.  This is the
    heavy-hitter scale path: where the exact top-k (qc_heavy_hitters)
    shuffles one row per distinct token, the sketch shuffles a fixed
    few KB per partition at any corpus size, with the classic
    guarantee est <= true + (e/width) * N at confidence 1-e^-depth."""
    c = F.col(value_col)
    pairs = F.array(*[
        F.struct(F.lit(i).alias("seed"),
                 cms_bucket(c, i, width).alias("bucket"))
        for i in range(depth)])
    return (df.select(F.explode(pairs).alias("p"))
            .select("p.seed", "p.bucket")
            .groupBy("seed", "bucket")
            .agg(F.count("*").alias("cnt")))


def cms_estimate(sketch: DataFrame, queries: DataFrame,
                 value_col: str, depth: int = 4,
                 width: int = 256) -> DataFrame:
    """Point-estimate each query value against a CMS: min over the
    depth rows of the addressed counters (absent counter = 0).  The
    sketch side is at most depth*width rows, so Catalyst broadcasts
    it; the query side never shuffles."""
    c = F.col(value_col)
    pairs = F.array(*[
        F.struct(F.lit(i).alias("seed"),
                 cms_bucket(c, i, width).alias("bucket"))
        for i in range(depth)])
    expanded = (queries.select(c.alias(value_col),
                               F.explode(pairs).alias("p"))
                .select(value_col, "p.seed", "p.bucket"))
    joined = expanded.join(F.broadcast(sketch), ["seed", "bucket"],
                           "left")
    return (joined.groupBy(value_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias("cms_count")))


def cms_hex_terms_sql(hex_col: str = "hx") -> str:
    """DuckDB twin of cms_bucket's hex->int step: positional hex
    arithmetic over a 13-hex-digit column (no conv() in DuckDB),
    exact for 52 bits.  Wrap as CAST(<terms> AS BIGINT) % width."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substring({hex_col}, {i + 1}, 1))"
        f" - 1) * {float(16 ** (_HEX_DIGITS - 1 - i))!r}"
        for i in range(_HEX_DIGITS))
