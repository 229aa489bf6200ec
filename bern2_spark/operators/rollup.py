"""Multi-granularity time rollup — the hypertable continuous-aggregate
shape (hour + day + ... grains of the same measures in one pass).

The naive formulation scans the fact table once PER grain (``GROUP BY
date_trunc('hour', ts)`` then again for day, week, ...), or uses
GROUPING SETS, which still shuffles every input row once per grouping
set.  Both are wrong at 100 TB: the event table is the big thing, and
it should be read and shuffled exactly once.

This operator aggregates at the FINEST grain only (the single full
shuffle over the fact table), then derives every coarser grain by
re-aggregating the finest-grain result — valid because the measures
are reaggregable (counts and integer-micro sums are associative;
min/max too).  The hourly aggregate is ~10^5 smaller than the raw
events, so the day/week re-aggregations are effectively free — the
same materialization hierarchy TimescaleDB continuous aggregates and
Druid rollup segments use.

Measures are summed as exact integer micros (``round(value*1e6)`` cast
long) so results are independent of float summation order — hashable
against a DuckDB oracle and stable across partitionings.

Reference scope note: BERN2 has no time dimension at all; this is part
of the engine's analytics extension surface (SURVEY §2.12), sharing the
events table with the as-of/sessionize/funnel family.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# coarse -> fine; a requested grain set must be a contiguous suffix
# check is per-pair: each coarser grain re-truncates the next finer one
_GRAIN_ORDER = ["year", "month", "week", "day", "hour", "minute"]


def rollup_timegrains(df: DataFrame, ts_col: str, dims: List[str],
                      value_col: str,
                      grains: Sequence[str] = ("hour", "day"),
                      ) -> DataFrame:
    """Counts + exact integer-micro sums of ``value_col`` per ``dims``
    at every grain in ``grains``, computed with ONE shuffle over
    ``df``.  Output: ``grain`` (string), dims..., ``win_start``
    (timestamp, bucket start), ``n_events`` (long), ``value_micros``
    (long).  Coarser grains re-aggregate the finest grain's result."""
    grains = sorted(set(grains), key=_GRAIN_ORDER.index, reverse=True)
    finest = grains[0]
    cur = (df.groupBy(*dims,
                      F.date_trunc(finest, F.col(ts_col))
                      .alias("win_start"))
           .agg(F.count("*").alias("n_events"),
                F.sum(F.round(F.col(value_col) * 1000000).cast("bigint"))
                .cast("bigint").alias("value_micros"))
           .withColumn("grain", F.lit(finest)))
    out = cur
    for g in grains[1:]:
        cur = (cur.groupBy(*dims,
                           F.date_trunc(g, F.col("win_start"))
                           .alias("win_start"))
               .agg(F.sum("n_events").cast("long").alias("n_events"),
                    F.sum("value_micros").cast("bigint")
                    .alias("value_micros"))
               .withColumn("grain", F.lit(g)))
        out = out.unionByName(cur)
    return out.select("grain", *dims, "win_start", "n_events",
                      "value_micros")


def gapfill(df: DataFrame, ts_col: str, keys: Sequence[str],
            value_col: str, grain: str = "day") -> DataFrame:
    """Time-spine gap-fill with forward fill (locf): per key, emit one
    row for EVERY ``grain`` bucket between that key's first and last
    observation, carrying the last observed value across empty buckets
    — the resample/locf primitive every time-series consumer of the
    events table needs (TimescaleDB ``time_bucket_gapfill`` +
    ``locf``, Flink's windowed fill).

    Scale shape: the fact table is aggregated to the grain FIRST (the
    one full shuffle, map-side combined, same posture as
    ``rollup_timegrains``), so the spine explode and the fill window
    run over the ~10^5-smaller bucket table, never over raw events.
    The spine is ``sequence(lo, hi)`` per key — generated, not joined
    from a calendar table, so there is no extra shuffle; its size is
    bounded by (span / grain) per key, and the subsequent left join is
    co-partitioned on (key, bucket).  The fill itself is one running
    ``last(ignorenulls)`` window over the per-key sort the join
    already established.  Values are summed as exact integer micros so
    the fill is hashable across engines.

    Output: keys + ``(bucket: date-truncated ts, value_micros:
    nullable observed sum, filled_micros: locf value, is_gap)``."""
    micros = F.round(F.col(value_col) * 1e6).cast("long")
    keyed = (df.groupBy(*keys,
                        F.date_trunc(grain, F.col(ts_col)).alias("bucket"))
             .agg(F.sum(micros).alias("value_micros")))
    span = keyed.groupBy(*keys).agg(F.min("bucket").alias("_lo"),
                                    F.max("bucket").alias("_hi"))
    spine = span.select(
        *keys,
        F.explode(F.sequence("_lo", "_hi",
                             F.expr(f"interval 1 {grain}")))
        .alias("bucket"))
    out = spine.join(keyed, [*keys, "bucket"], "left")
    w = (Window.partitionBy(*keys).orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (out.withColumn("filled_micros",
                           F.last("value_micros", ignorenulls=True).over(w))
            .withColumn("is_gap", F.col("value_micros").isNull()))


def rolling_zscore(df: DataFrame, ts_col: str, keys: Sequence[str],
                   value_col: str, window_rows: int = 7,
                   min_obs: int = 3, z_thresh: float = 2.0,
                   grain: str = "day") -> DataFrame:
    """Trailing-window anomaly scores: per key, z-score each grain
    bucket's value against the mean/std of the previous
    ``window_rows`` OBSERVED buckets (rows, not calendar days — the
    window slides over observations, so silent periods don't dilute
    the baseline), flagging |z| > ``z_thresh`` — the classic ops
    anomaly primitive over the events table.

    Scale shape: one grain aggregate (the only full shuffle), then a
    single per-key ordered window producing count/sum/sum-of-squares
    in one pass.  Variance uses the explicit (s2 - s1^2/n)/n form:
    the window sums are EXACT integers (micros, micros²), and both
    engines then apply the identical double-arithmetic expression to
    them — deterministic regardless of window-frame summation order,
    which stddev_samp over doubles would not guarantee.

    Output: keys + (bucket, value_micros, n_base, z, is_anomaly);
    z is NULL below ``min_obs`` observations or at zero variance."""
    micros = F.round(F.col(value_col) * 1e6).cast("long")
    daily = (df.groupBy(*keys,
                        F.date_trunc(grain, F.col(ts_col)).alias("bucket"))
             .agg(F.sum(micros).alias("value_micros")))
    w = (Window.partitionBy(*keys).orderBy("bucket")
         .rowsBetween(-window_rows, -1))
    x = F.col("value_micros").cast("double")
    n = F.count("value_micros").over(w).cast("double")
    s1 = F.sum("value_micros").over(w).cast("double")
    s2 = F.sum(F.col("value_micros") * F.col("value_micros")) \
          .over(w).cast("double")
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / n
    z = F.when((n >= min_obs) & (var > 0),
               F.round((x - mean) / F.sqrt(var), 6))
    return (daily.withColumn("n_base", n.cast("long"))
            .withColumn("z", z)
            .withColumn("is_anomaly",
                        F.coalesce(F.abs(z) > z_thresh, F.lit(False))))


def rfm_scores(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", value_col: str = "value",
               n_bins: int = 3) -> DataFrame:
    """RFM segmentation: per user, Recency (days since last event,
    against the corpus max date), Frequency (event count), Monetary
    (exact integer-micro value sum), each scored 1..n_bins by linear
    range split — the classic lifecycle segmentation over the events
    table.

    Scale shape: one groupBy(user) aggregate (the only full shuffle),
    then TWO 1-row broadcasts — the corpus max timestamp and the
    per-metric (min, max) ranges — and pure integer binning
    arithmetic (the same exact floor((x-lo)*k/span) split as the
    Z-order layout, deterministic in both engines).  Range-split
    scores, not rank quantiles, deliberately: an ntile over all users
    is a single-partition sort at corpus scale; the linear split is
    shuffle-free and its semantics ("top third of the value RANGE")
    are stable under resampling.  Recency scores INVERTED so higher
    = more recent, matching R-F-M convention.

    Output: (user, recency_days, frequency, monetary_micros,
    r_score, f_score, m_score, rfm)."""
    per = (events.groupBy(F.col(user_col).alias("user"))
           .agg(F.max(ts_col).alias("_last"),
                F.count("*").cast("long").alias("frequency"),
                F.sum(F.round(F.col(value_col) * 1e6).cast("long"))
                .alias("monetary_micros")))
    mx = events.agg(F.max(ts_col).alias("_corpus_last"))
    per = (per.crossJoin(F.broadcast(mx))
           .withColumn("recency_days",
                       F.datediff(F.to_date("_corpus_last"),
                                  F.to_date("_last")).cast("long"))
           .drop("_last", "_corpus_last"))
    rng = per.agg(*[f for c in ("recency_days", "frequency",
                                "monetary_micros")
                    for f in (F.min(c).alias(f"_lo_{c}"),
                              F.max(c).alias(f"_hi_{c}"))])
    per = per.crossJoin(F.broadcast(rng))

    def score(c):
        lo, hi = F.col(f"_lo_{c}"), F.col(f"_hi_{c}")
        return (F.lit(1) + F.least(
            F.floor((F.col(c) - lo) * n_bins / (hi - lo + 1)),
            F.lit(n_bins - 1))).cast("int")

    r = (F.lit(n_bins + 1) - score("recency_days")).cast("int")
    f_ = score("frequency")
    m = score("monetary_micros")
    return per.select(
        "user", "recency_days", "frequency", "monetary_micros",
        r.alias("r_score"), f_.alias("f_score"), m.alias("m_score"),
        F.concat(r.cast("string"), f_.cast("string"),
                 m.cast("string")).alias("rfm"))


def ab_lift(events: DataFrame, user_col: str = "user_id",
            value_col: str = "value", round_to: int = 6) -> DataFrame:
    """Two-sample A/B lift with a Welch z statistic: users hash-split
    into control (group 0) and treatment (group 1) by user-id parity
    (the deterministic stand-in for an assignment column), then the
    per-event value means are compared — relative lift % and
    z = (mean_t - mean_c) / sqrt(var_c/n_c + var_t/n_t) — the
    experiment-readout primitive over the events table.

    Scale shape: ONE map-side-combined aggregate producing per-group
    (n, Σx, Σx²) — the whole readout is 2 rows — then closed-form
    arithmetic.  The value sums stay exact integer micros; the
    squared sums are accumulated as DOUBLES in both engines (a
    micros² sum overflows 64-bit integers at corpus scale, and DuckDB
    would silently widen to int128 where Spark wraps — the double
    formulation is the one that means the same thing in both), with
    round(6) absorbing the sum-order ulps.

    Output: one row (n_c, n_t, mean_c_micros, mean_t_micros,
    lift_pct, z_score)."""
    vm = F.round(F.col(value_col) * 1e6).cast("long")
    g = (events.select((F.col(user_col) % 2).alias("grp"),
                       vm.alias("vm"))
         .groupBy("grp")
         .agg(F.count("*").cast("double").alias("n"),
              F.sum("vm").cast("double").alias("s1"),
              F.sum(F.col("vm").cast("double")
                    * F.col("vm").cast("double")).alias("s2")))

    def side(gid, tag):
        return (g.filter(F.col("grp") == gid)
                .select(F.col("n").alias(f"n_{tag}"),
                        F.col("s1").alias(f"s1_{tag}"),
                        F.col("s2").alias(f"s2_{tag}")))

    x = side(0, "c").crossJoin(side(1, "t"))
    mean_c = F.col("s1_c") / F.col("n_c")
    mean_t = F.col("s1_t") / F.col("n_t")
    var_c = ((F.col("s2_c") - F.col("s1_c") * F.col("s1_c")
              / F.col("n_c")) / (F.col("n_c") - 1))
    var_t = ((F.col("s2_t") - F.col("s1_t") * F.col("s1_t")
              / F.col("n_t")) / (F.col("n_t") - 1))
    se = F.sqrt(var_c / F.col("n_c") + var_t / F.col("n_t"))
    return x.select(
        F.col("n_c").cast("long").alias("n_c"),
        F.col("n_t").cast("long").alias("n_t"),
        F.round(mean_c, round_to).alias("mean_c_micros"),
        F.round(mean_t, round_to).alias("mean_t_micros"),
        F.round((mean_t - mean_c) / mean_c * 100, round_to)
        .alias("lift_pct"),
        F.round((mean_t - mean_c) / se, round_to).alias("z_score"))


def sliding_counts(events: DataFrame, ts_col: str = "ts",
                   dim_cols: Sequence[str] = ("event_type",),
                   window_minutes: int = 60,
                   slide_minutes: int = 15) -> DataFrame:
    """Sliding (hopping) window counts: every event contributes to
    ``window/slide`` overlapping windows — the smoothing variant of
    the tumbling rollup (rollup_timegrains) that trend detection and
    rate alerting read; the batch twin of Structured Streaming's
    ``F.window(ts, "1 hour", "15 minutes")``.

    Scale shape: the hop memberships are GENERATED row-side (an
    explode of window/slide window-start offsets — pure arithmetic on
    the truncated timestamp, no calendar join), then one
    map-side-combined groupBy on (dims, win_start).  The fan-out
    factor is the fixed window/slide ratio (4 here), applied before
    the only shuffle.

    Output: dims + (win_start, n_events)."""
    k = window_minutes // slide_minutes
    slide_s = slide_minutes * 60
    base = (F.unix_timestamp(F.col(ts_col))
            - (F.unix_timestamp(F.col(ts_col)) % slide_s))
    starts = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.timestamp_seconds(base - i * slide_s))
    return (events
            .select(*dim_cols, F.explode(starts).alias("win_start"))
            .groupBy(*dim_cols, "win_start")
            .agg(F.count("*").cast("long").alias("n_events")))


def stickiness(events: DataFrame, ts_col: str = "ts",
               user_col: str = "user_id", window_days: int = 7,
               round_to: int = 6) -> DataFrame:
    """DAU / trailing-WAU stickiness: per day, the distinct active
    users that day over the distinct users active in the trailing
    ``window_days`` — the standard product-health ratio (DAU/WAU,
    DAU/MAU).

    Exact distinct over a sliding window without any window-distinct
    operator: the (user, day) DISTINCT table (the one real shuffle,
    corpus → user-days) is EXPLODED into the ``window_days`` trailing
    windows each active day contributes to — pure arithmetic on the
    truncated date, the same generated-hop trick as
    ``sliding_counts`` — then deduplicated per (window-end, user) and
    counted.  Fan-out is the fixed window size, applied to user-days,
    never raw events.

    Output: (day, dau, wau, stickiness) for days with any trailing
    activity."""
    ud = (events.select(F.col(user_col).alias("u"),
                        F.to_date(F.col(ts_col)).alias("d"))
          .distinct())
    dau = ud.groupBy(F.col("d").alias("day")) \
            .agg(F.count("*").cast("long").alias("dau"))
    member = (ud.select(
        "u", F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(window_days - 1)),
            lambda i: F.date_add(F.col("d"), i))).alias("day"))
        .distinct())
    wau = member.groupBy("day").agg(
        F.count("*").cast("long").alias("wau"))
    return (dau.join(wau, "day")
            .select("day", "dau", "wau",
                    F.round(F.col("dau") / F.col("wau"), round_to)
                    .alias("stickiness")))
