"""operators/rangejoin.py + operators/rollup.py — bucketized interval
join semantics (boundaries, multi-bucket spans, no nested-loop plan)
and multi-grain rollup re-aggregation identity."""
import pytest
from pyspark.sql import functions as F

from bern2_spark.operators.rangejoin import interval_join
from bern2_spark.operators.rollup import rollup_timegrains


def _points(spark, rows):
    return spark.createDataFrame(rows, ["k", "pid", "x"])


def _intervals(spark, rows):
    return spark.createDataFrame(rows, ["k", "iid", "lo", "hi"])


def test_interval_join_boundaries(spark):
    # W=10; interval [10, 30) spans buckets 1-2
    pts = _points(spark, [("u", 1, 10), ("u", 2, 29), ("u", 3, 30),
                          ("u", 4, 9), ("v", 5, 15)])
    ivs = _intervals(spark, [("u", 100, 10, 30)])
    got = {(r.pid, r.iid) for r in
           interval_join(pts, ivs, ["k"], "x", "lo", "hi", 10).collect()}
    # lo inclusive (1), interior (2); hi exclusive (3), below (4),
    # other key (5) all drop
    assert got == {(1, 100), (2, 100)}


def test_interval_join_multibucket_no_dups(spark):
    # interval spanning many buckets still matches each point once
    pts = _points(spark, [("u", i, v) for i, v in
                          enumerate([0, 5, 19, 20, 99, 100])])
    ivs = _intervals(spark, [("u", 7, 0, 100)])
    rows = interval_join(pts, ivs, ["k"], "x", "lo", "hi", 10).collect()
    assert sorted(r.pid for r in rows) == [0, 1, 2, 3, 4]
    assert len(rows) == len({(r.pid, r.iid) for r in rows})


def test_interval_join_overlapping_and_empty(spark):
    pts = _points(spark, [("u", 1, 15)])
    ivs = _intervals(spark, [("u", 1, 10, 20), ("u", 2, 0, 100),
                             ("u", 3, 15, 15), ("u", 4, 20, 10)])
    got = sorted(r.iid for r in
                 interval_join(pts, ivs, ["k"], "x", "lo", "hi",
                               7).collect())
    assert got == [1, 2]  # empty/inverted intervals match nothing


def test_interval_join_rejects_collisions_and_bad_width(spark):
    pts = _points(spark, [("u", 1, 15)])
    ivs = pts.select("k", F.col("pid").alias("iid"),
                     F.col("x").alias("lo"), (F.col("x") + 1).alias("hi"),
                     F.lit(0).alias("pid"))
    with pytest.raises(ValueError, match="collision"):
        interval_join(pts, ivs, ["k"], "x", "lo", "hi", 10)
    with pytest.raises(ValueError, match="positive"):
        interval_join(pts, ivs.drop("pid"), ["k"], "x", "lo", "hi", 0)


def test_interval_join_plan_has_no_nested_loop(spark):
    """The whole point: the range predicate rides an equi-join."""
    pts = _points(spark, [("u", 1, 15)])
    ivs = _intervals(spark, [("u", 1, 10, 20)])
    plan = (interval_join(pts, ivs, ["k"], "x", "lo", "hi", 10)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_rollup_reaggregation_identity(spark):
    from datetime import datetime
    rows = [(datetime(2024, 1, d, h, m), t, v)
            for d, h, m, t, v in [
                (1, 0, 5, "a", 1.25), (1, 0, 55, "a", 2.5),
                (1, 1, 0, "a", 0.000001), (1, 1, 30, "b", -1.0),
                (2, 23, 59, "a", 10.0), (3, 0, 0, "b", 0.5)]]
    df = spark.createDataFrame(rows, ["ts", "event_type", "value"])
    out = rollup_timegrains(df, "ts", ["event_type"], "value",
                            grains=("hour", "day")).collect()
    hours = [r for r in out if r.grain == "hour"]
    days = [r for r in out if r.grain == "day"]
    # day totals == sum of that day's hour rows, per dim
    for d in days:
        hsel = [h for h in hours if h.event_type == d.event_type
                and h.win_start.date() == d.win_start.date()]
        assert d.n_events == sum(h.n_events for h in hsel)
        assert d.value_micros == sum(h.value_micros for h in hsel)
    # exact integer micros, no float drift
    a_h0 = next(h for h in hours if h.event_type == "a"
                and h.win_start.hour == 0 and h.win_start.day == 1)
    assert a_h0.value_micros == 3_750_000
    a_h1 = next(h for h in hours if h.event_type == "a"
                and h.win_start.hour == 1)
    assert a_h1.value_micros == 1


def test_rollup_single_shuffle_over_input(spark):
    """The fact table is exchanged once; the day grain re-aggregates
    the hourly result instead of rescanning the input."""
    from datetime import datetime
    df = spark.createDataFrame(
        [(datetime(2024, 1, 1, h), "a", 1.0) for h in range(24)],
        ["ts", "event_type", "value"])
    out = rollup_timegrains(df, "ts", ["event_type"], "value",
                            grains=("hour", "day"))
    out.collect()  # AQE finalizes exchange reuse at execution
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the day branch must read the hourly shuffle's output, not
    # rescan + reshuffle the fact table
    assert "ReusedExchange" in plan
