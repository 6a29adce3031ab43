"""Hand-checked goldens for the round-5 temporal/selection additions:
last-touch attribution, TWAP, CUSUM drift, inter-arrival stats, ABC."""

from datetime import datetime

from pyspark.sql import functions as F

from gene_level_metadata_pipeline_spark.operators.selection import (
    abc_classification,
)
from gene_level_metadata_pipeline_spark.operators.temporal import (
    attribute_last_touch,
)
from gene_level_metadata_pipeline_spark.operators.timeseries import (
    cusum_drift,
    interarrival_stats,
    time_weighted_avg,
)


def _ts(s):
    return datetime(2024, 1, 1, 0, 0, s)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint, "
        "event_type string, value double"
    )


# ------------------------------------------------------------- attribution

def test_last_touch_picks_latest_prior_with_tiebreak(spark):
    df = _ev(spark, [
        (1, _ts(1), 10, "click", 0.0),
        (1, _ts(2), 11, "view", 0.0),     # latest prior touch
        (1, _ts(2), 12, "click", 0.0),    # same ts, larger id -> wins
        (1, _ts(3), 13, "purchase", 0.0),
        (1, _ts(4), 14, "click", 0.0),    # AFTER the conversion: ignored
        (2, _ts(5), 20, "purchase", 0.0), # no prior touch -> NULLs
    ])
    out = attribute_last_touch(
        df, "user_id", "ts", "event_id", "event_type",
        ["purchase"], ["click", "view"],
    )
    got = {r.event_id: (r.touch_id, r.touch_type) for r in out.collect()}
    assert got == {13: (12, "click"), 20: (None, None)}


def test_last_touch_same_ts_touch_is_strictly_prior_only(spark):
    # a touch at the SAME (ts) but smaller id than the conversion counts;
    # same ts and larger id does not (it sorts after the conversion)
    df = _ev(spark, [
        (1, _ts(1), 10, "click", 0.0),
        (1, _ts(2), 11, "purchase", 0.0),
        (1, _ts(2), 12, "click", 0.0),
    ])
    out = attribute_last_touch(
        df, "user_id", "ts", "event_id", "event_type",
        ["purchase"], ["click", "view"],
    )
    assert out.collect()[0].touch_id == 10


# -------------------------------------------------------------------- TWAP

def test_twap_duration_weighted_exact(spark):
    # value 10 held 3s, value 20 held 1s, final obs excluded:
    # twap = (10*3 + 20*1) / 4 = 12.5
    df = _ev(spark, [
        (1, _ts(0), 1, "x", 10.0),
        (1, _ts(3), 2, "x", 20.0),
        (1, _ts(4), 3, "x", 99.0),
    ])
    out = time_weighted_avg(df, "user_id", "ts", "event_id", "value")
    r = out.collect()[0]
    assert (r.key, r.n_intervals, r.twap) == (1, 2, 12.5)


def test_twap_null_value_excluded_extends_previous_interval(spark):
    # the NULL observation vanishes BEFORE lead(), so value 10 holds
    # until the last real observation: (10*4)/4 = 10
    df = _ev(spark, [
        (1, _ts(0), 1, "x", 10.0),
        (1, _ts(2), 2, "x", None),
        (1, _ts(4), 3, "x", 50.0),
    ])
    r = time_weighted_avg(df, "user_id", "ts", "event_id", "value").collect()
    assert r[0].n_intervals == 1 and r[0].twap == 10.0


# ------------------------------------------------------------------- CUSUM

def test_cusum_closed_form_matches_recurrence(spark):
    vals = [7.0, 1.0, 9.0, 8.0, 2.0, 9.0, 9.0, 3.0]
    rows = [(1, _ts(i), i, "x", v) for i, v in enumerate(vals)]
    out = cusum_drift(
        _ev(spark, rows), "user_id", "ts", "event_id", "value",
        target=4.0, slack=1.0, threshold=3.0,
    )
    got = {r.id: r.cusum for r in out.collect()}
    # reference recurrence c_t = max(0, c + x - 5)
    c, want = 0.0, {}
    for i, v in enumerate(vals):
        c = max(0.0, c + v - 5.0)
        if c > 3.0:
            want[i] = c
    assert got == want


def test_cusum_constant_at_target_never_alerts(spark):
    rows = [(1, _ts(i), i, "x", 5.0) for i in range(10)]
    out = cusum_drift(
        _ev(spark, rows), "user_id", "ts", "event_id", "value",
        target=5.0, slack=0.0, threshold=0.5,
    )
    assert out.count() == 0


# ----------------------------------------------------------- inter-arrival

def test_interarrival_known_gaps(spark):
    # user 1 type a at t=0,10,30 -> gaps 10, 20
    df = _ev(spark, [
        (1, _ts(0), 1, "a", 0.0),
        (1, _ts(10), 2, "a", 0.0),
        (1, _ts(30), 3, "a", 0.0),
        (2, _ts(0), 4, "a", 0.0),   # singleton stream: no gap
    ])
    r = interarrival_stats(
        df, ["user_id", "event_type"], "ts", "event_id", "event_type"
    ).collect()
    assert len(r) == 1
    row = r[0]
    assert (row.grp, row.n_gaps, row.mean_gap_s) == ("a", 2, 15.0)
    assert row.p50_gap_s == 15.0  # interpolated median of {10, 20}
    assert row.p90_gap_s == 19.0


# --------------------------------------------------------------------- ABC

def test_abc_exact_boundary_classes(spark):
    # contributions 5, 3, 2 of total 10: cum 5 -> A (exactly 50%),
    # cum 8 -> B (exactly 80%), cum 10 -> C
    df = spark.createDataFrame(
        [("p1", 5.0), ("p2", 3.0), ("p3", 2.0)], ["k", "v"]
    )
    out = abc_classification(df, "k", "v")
    got = {r.key: (r.cum_share, r.abc_class) for r in out.collect()}
    assert got == {"p1": (0.5, "A"), "p2": (0.8, "B"), "p3": (1.0, "C")}


def test_abc_ties_break_on_key_and_aggregate_first(spark):
    # equal contributions order by key ascending; rows pre-aggregate per key
    df = spark.createDataFrame(
        [("b", 2.0), ("a", 1.0), ("a", 1.0), ("c", 2.0)], ["k", "v"]
    )
    out = abc_classification(df, "k", "v")
    rows = sorted(out.collect(), key=lambda r: r.cum_share)
    assert [r.key for r in rows] == ["a", "b", "c"]
    assert [float(r.contribution) for r in rows] == [2.0, 2.0, 2.0]
