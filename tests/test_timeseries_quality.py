"""Hand-checked goldens for timeseries (resample LOCF, SCD2) and
data-quality (validate, histogram) operators."""

from pyspark.sql import functions as F

from gene_level_metadata_pipeline_spark.operators import quality as Q
from gene_level_metadata_pipeline_spark.operators.timeseries import (
    resample_locf,
    scd2_intervals,
)


def test_resample_locf_numeric_axis(spark):
    # key a: obs at t=5 (v=1.0), t=25 (v=2.0); key b: obs at t=12 only.
    # step 10, global min 5 -> origin 0, max 25 -> grid 0,10,20 (plus 25? no:
    # sequence(0,25,10) = 0,10,20).
    df = spark.createDataFrame(
        [("a", 5, 1.0, 1), ("a", 25, 2.0, 2), ("b", 12, 9.0, 3)],
        ["k", "t", "v", "id"],
    )
    out = resample_locf(df, "k", "t", "v", "id", step_us=10)
    got = {(r.k, r.grid_ts): r.value_locf for r in out.collect()}
    assert got == {
        ("a", 0): None, ("a", 10): 1.0, ("a", 20): 1.0,
        ("b", 0): None, ("b", 10): None, ("b", 20): 9.0,
    }


def test_resample_locf_tie_breaks_by_greatest_tie_col(spark):
    # two observations at the same (key, ts): the greater id wins
    df = spark.createDataFrame(
        [("a", 0, 1.0, 1), ("a", 0, 7.0, 2)], ["k", "t", "v", "id"]
    )
    out = resample_locf(df, "k", "t", "v", "id", step_us=10)
    got = {(r.k, r.grid_ts): r.value_locf for r in out.collect()}
    assert got == {("a", 0): 7.0}


def test_scd2_intervals_runs_and_current_flag(spark):
    df = spark.createDataFrame(
        [
            (1, 10, "x", 100),
            (1, 20, "x", 101),  # same attr -> merged into first interval
            (1, 30, "y", 102),  # change
            (1, 40, "x", 103),  # change back -> new interval
            (2, 15, "z", 104),
        ],
        ["k", "t", "attr", "id"],
    )
    out = scd2_intervals(df, "k", "t", "attr", "id")
    rows = {(r.k, r.valid_from): (r.attr, r.valid_to, r.is_current)
            for r in out.collect()}
    assert rows == {
        (1, 10): ("x", 30, False),
        (1, 30): ("y", 40, False),
        (1, 40): ("x", None, True),
        (2, 15): ("z", None, True),
    }


def test_scd2_null_attr_transitions(spark):
    # null -> value -> null are all changes; null==null run merges
    df = spark.createDataFrame(
        [(1, 1, None, 1), (1, 2, None, 2), (1, 3, "a", 3), (1, 4, None, 4)],
        "k int, t int, attr string, id int",
    )
    out = scd2_intervals(df, "k", "t", "attr", "id")
    rows = sorted((r.valid_from, r.attr) for r in out.collect())
    assert rows == [(1, None), (3, "a"), (4, None)]


def test_validate_rules_hand_checked(spark):
    child = spark.createDataFrame(
        [(1, "A", 5.0), (2, "B", -1.0), (2, "Z", 3.0), (None, "A", 99.0)],
        "fk int, cat string, x double",
    )
    parent = spark.createDataFrame([(1,), (3,)], "pk int")
    report = {
        r.rule: r.n_violations
        for r in Q.validate([
            Q.not_null("fk_not_null", child, "fk"),
            Q.accepted_values("cat_domain", child, "cat", ["A", "B"]),
            Q.in_range("x_range", child, "x", 0.0, 10.0),
            Q.unique("fk_unique", child, "fk"),
            Q.foreign_key("fk_parent", child, "fk", parent, "pk"),
        ]).collect()
    }
    assert report == {
        "fk_not_null": 1,   # the None fk
        "cat_domain": 1,    # 'Z'
        "x_range": 2,       # -1.0 and 99.0
        "fk_unique": 2,     # fk=2 appears twice (sum of dup-group sizes)
        "fk_parent": 2,     # both fk=2 rows lack a parent (null fk ignored)
    }


def test_validate_empty_violations(spark):
    df = spark.createDataFrame([(1,), (2,)], "a int")
    report = {
        r.rule: r.n_violations
        for r in Q.validate([
            Q.unique("u", df, "a"),
            Q.not_null("nn", df, "a"),
        ]).collect()
    }
    assert report == {"u": 0, "nn": 0}


def test_histogram_bins_and_edges(spark):
    df = spark.createDataFrame([(float(x),) for x in range(11)], "v double")
    out = {r.bin: (r.lo, r.hi, r.n) for r in Q.histogram(df, "v", 5).collect()}
    # min 0, max 10, width 2: bins [0,2) [2,4) [4,6) [6,8) [8,10]; the max
    # value 10.0 is clamped into the last bin.
    assert out == {
        0: (0.0, 2.0, 2), 1: (2.0, 4.0, 2), 2: (4.0, 6.0, 2),
        3: (6.0, 8.0, 2), 4: (8.0, 10.0, 3),
    }


def test_approx_count_distinct_within_rsd(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("u"), F.lit("g").alias("g")
    )
    row = df.groupBy("g").agg(
        F.approx_count_distinct("u", 0.02).alias("approx"),
        F.countDistinct("u").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.1


def test_snapshot_diff_classifies_changes(spark):
    from gene_level_metadata_pipeline_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "k int, s string, x double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0),      # unchanged -> dropped
         (2, "B", 2.0),      # update (s)
         (3, "c", 3.0),      # update (NULL -> value, null-safe)
         (5, "e", 5.0)],     # insert; 4 deleted
        "k int, s string, x double",
    )
    got = {r.k: r.change for r in snapshot_diff(old, new, "k").collect()}
    assert got == {2: "update", 3: "update", 4: "delete", 5: "insert"}


def test_snapshot_diff_compare_cols_subset(spark):
    from gene_level_metadata_pipeline_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame([(1, "a", 1.0)], "k int, s string, x double")
    new = spark.createDataFrame([(1, "a", 9.0)], "k int, s string, x double")
    # x differs but only s is compared -> no change rows
    assert snapshot_diff(old, new, "k", compare_cols=["s"]).count() == 0


def test_flag_outliers_zero_variance_and_singleton(spark):
    from pyspark.sql import functions as F

    from gene_level_metadata_pipeline_spark.operators.quality import flag_outliers

    df = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0), ("a", 5.0),     # zero variance
         ("b", 1.0),                              # singleton
         ("c", 0.0), ("c", 0.0), ("c", 100.0)],   # one wild point
        ["g", "x"],
    )
    out = {(r["g"], r["x"]): (r["z_score"], r["is_outlier"])
           for r in flag_outliers(df, "g", "x", z=1.0).collect()}
    assert out[("a", 5.0)] == (None, False)   # sd=0 -> never flagged
    assert out[("b", 1.0)] == (None, False)   # singleton -> never flagged
    assert out[("c", 100.0)][1] is True
    assert out[("c", 0.0)][1] is False


def test_winsorize_clips_to_group_percentiles(spark):
    from gene_level_metadata_pipeline_spark.operators.quality import winsorize

    rows = [("a", float(i)) for i in range(1, 11)] + [("b", 5.0)]
    df = spark.createDataFrame(rows, ["g", "x"])
    out = {(r["g"], r["x"]): r["winsorized"]
           for r in winsorize(df, "g", "x", lo=0.1, hi=0.9).collect()}
    # group a: p10 = 1.9, p90 = 9.1 (interpolated over 1..10)
    assert out[("a", 1.0)] == 1.9
    assert out[("a", 10.0)] == 9.1
    assert out[("a", 5.0)] == 5.0
    assert out[("b", 5.0)] == 5.0  # singleton group: plo = phi = x


def test_flag_outliers_null_group_rows_survive(spark):
    """NULL group keys must be flagged within their own stratum, not
    silently dropped by the moments re-attach join (ADVICE r2)."""
    from gene_level_metadata_pipeline_spark.operators.quality import flag_outliers

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.2), (None, 0.0), (None, 0.0), (None, 50.0)],
        ["g", "x"],
    )
    out = flag_outliers(df, "g", "x", z=1.0)
    assert out.count() == 5  # no rows lost
    nulls = {r["x"]: r["is_outlier"] for r in out.where(F.col("g").isNull()).collect()}
    assert nulls[50.0] is True
    assert nulls[0.0] is False


def test_winsorize_null_group_rows_survive(spark):
    """NULL-group rows clip against their own stratum's percentiles
    instead of vanishing (ADVICE r2)."""
    from gene_level_metadata_pipeline_spark.operators.quality import winsorize

    rows = [(None, float(i)) for i in range(1, 11)] + [("b", 5.0)]
    df = spark.createDataFrame(rows, ["g", "x"])
    out = winsorize(df, "g", "x", lo=0.1, hi=0.9)
    assert out.count() == 11
    vals = {r["x"]: r["winsorized"]
            for r in out.where(F.col("g").isNull()).collect()}
    assert vals[1.0] == 1.9 and vals[10.0] == 9.1 and vals[5.0] == 5.0


def test_rolling_zscore_flags_spike_and_masks_warmup(spark):
    """Hand-checkable rolling z-score: 20 alternating 1/2 values (mean
    1.5, sd 0.5) then a 100.0 spike -> z = (100-1.5)/0.5 = 197 exactly,
    flagged; every warm-up row (< 20 predecessors) stays NULL; a
    constant-frame follow-up row is NULL too (sd = 0 is "don't know")."""
    from pyspark.sql import functions as F

    from gene_level_metadata_pipeline_spark.operators.timeseries import (
        rolling_zscore,
    )

    rows = [(i, i * 1000, "m", 1.0 + (i % 2)) for i in range(20)]
    rows.append((20, 20000, "m", 100.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts long, event_type string, value double"
    )
    out = {
        r["event_id"]: (r["z"], r["is_anomaly"])
        for r in rolling_zscore(
            df, "event_type", "ts", "value", "event_id", window=20
        ).collect()
    }
    assert out[20] == (197.0, True)
    assert all(out[i] == (None, None) for i in range(20))

    import pytest
    with pytest.raises(ValueError, match="window=1"):
        rolling_zscore(df, "event_type", "ts", "value", "event_id", window=1)


def test_mad_outliers_robust_to_the_outlier_itself(spark):
    """The 50%-breakdown claim: one 1000x row must be flagged by the MAD
    gate even though it drags the group's stddev enough that the z-score
    gate (z=3) misses it in a small group; identical-value groups have
    MAD 0 -> modified z NULL -> never flagged (no ANSI abort)."""
    from pyspark.sql import functions as F

    from gene_level_metadata_pipeline_spark.operators.quality import (
        flag_outliers, mad_outliers,
    )

    rows = [(i, "g", 100.0 + i) for i in range(9)] + [(99, "g", 100000.0)]
    rows += [(200 + i, "const", 5.0) for i in range(4)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    mad = {r["id"]: r for r in
           mad_outliers(df, "grp", "v", threshold=3.5).collect()}
    assert mad[99]["is_outlier"] is True
    assert all(not mad[i]["is_outlier"] for i in range(9))
    for i in (200, 201, 202, 203):
        assert mad[i]["modified_z"] is None
        assert mad[i]["is_outlier"] is False
    # the z-score gate misses the same point at z=3 in a 10-row group
    # (a single extreme value caps |z| at (n-1)/sqrt(n) ~ 2.85)
    zs = {r["id"]: r for r in flag_outliers(df, "grp", "v", z=3.0).collect()}
    assert zs[99]["is_outlier"] is False
