"""operators/asof.py — as-of join semantics."""
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from bern2_spark.operators.asof import asof_join

T0 = datetime(2024, 1, 1)


def _t(minutes):
    return T0 + timedelta(minutes=minutes)


def test_asof_basic(spark):
    right = spark.createDataFrame(
        [("u", _t(0), 10.0), ("u", _t(10), 20.0), ("v", _t(5), 99.0)],
        ["k", "ts", "price"])
    left = spark.createDataFrame(
        [("u", _t(4), "a"), ("u", _t(10), "b"), ("u", _t(15), "c"),
         ("v", _t(1), "d"), ("w", _t(9), "e")],
        ["k", "ts", "tag"])
    out = {r.tag: r for r in
           asof_join(left, right, ["k"]).collect()}
    assert out["a"].asof_price == 10.0          # latest prior
    assert out["b"].asof_price == 20.0          # equal ts matches (<=)
    assert out["c"].asof_price == 20.0
    assert out["d"].asof_price is None          # right row is later
    assert out["e"].asof_price is None          # key has no right rows
    assert out["b"].asof_ts == _t(10)


def test_asof_tolerance(spark):
    right = spark.createDataFrame([("u", _t(0), 1.0)],
                                  ["k", "ts", "price"])
    left = spark.createDataFrame(
        [("u", _t(3), "near"), ("u", _t(30), "far")],
        ["k", "ts", "tag"])
    out = {r.tag: r for r in
           asof_join(left, right, ["k"],
                     tolerance_seconds=600).collect()}
    assert out["near"].asof_price == 1.0
    assert out["far"].asof_price is None        # outside 10 min


def test_asof_equal_ts_seq_tiebreak(spark):
    # two right rows at the same instant: highest seq wins
    right = spark.createDataFrame(
        [("u", _t(0), 1, 1.0), ("u", _t(0), 2, 2.0)],
        ["k", "ts", "event_id", "price"])
    left = spark.createDataFrame([("u", _t(1), "x")],
                                 ["k", "ts", "tag"])
    row = asof_join(left, right, ["k"], right_cols=["price"],
                    right_seq="event_id").collect()[0]
    assert row.asof_price == 2.0


def test_funnel_strict_ordering(spark):
    from datetime import datetime as dt

    from bern2_spark.operators.asof import funnel_counts
    rows = [
        # u1 completes the funnel in order
        (1, dt(2024, 1, 1), 1, "view"),
        (2, dt(2024, 1, 2), 1, "click"),
        (3, dt(2024, 1, 3), 1, "purchase"),
        # u2 clicks BEFORE viewing -> stalls at view
        (4, dt(2024, 1, 2), 2, "click"),
        (5, dt(2024, 1, 3), 2, "view"),
        # u3 views only
        (6, dt(2024, 1, 1), 3, "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string")
    out = {r.stage: r.users for r in
           funnel_counts(ev, ["view", "click", "purchase"]).collect()}
    assert out == {"view": 3, "click": 1, "purchase": 1}


def test_retention_cohorts_offsets(spark):
    from datetime import datetime as dt

    from bern2_spark.operators.asof import retention_cohorts
    rows = [
        (1, dt(2024, 1, 1, 9), 1, "a"), (2, dt(2024, 1, 2, 9), 1, "a"),
        (3, dt(2024, 1, 1, 5), 2, "a"), (4, dt(2024, 1, 3, 5), 2, "a"),
        (5, dt(2024, 1, 2, 1), 3, "a"),   # second cohort
        (6, dt(2024, 1, 20, 1), 1, "a"),  # beyond max_offset -> dropped
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string")
    out = {(str(r.cohort_day), r.day_offset): r.users
           for r in retention_cohorts(ev, max_offset=7).collect()}
    assert out[("2024-01-01", 0)] == 2
    assert out[("2024-01-01", 1)] == 1   # u1 returns next day
    assert out[("2024-01-01", 2)] == 1   # u2 returns on day 3
    assert out[("2024-01-02", 0)] == 1   # u3's own cohort
    assert ("2024-01-01", 19) not in out
