"""Round-7 regression tests for the exact floor-division fix.

The round-6 advisor caught that `(num - pmod(num, den)) / den` routes
bigints through IEEE double division (`/` on LongType is DoubleType in
Spark), silently losing ulps past 2^53 — the advisor's own repro:
dy=900000000000007, dt=7, scale=10000 gave 1285714285714295552 instead
of the exact 1285714285714295714. The fix replaces `/` with Spark's
integral `div` everywhere the numerator has been pmod-adjusted to be
exactly divisible (theil_sen_slope, bootstrap_mean_ci,
_floor_div_exact), and the DuckDB oracle twins moved from `/` to `//`
in lockstep so both engines are exact, not identically wrong.
"""
from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from gene_level_metadata_pipeline_spark.operators.drift import (
    _floor_div_exact,
)
from gene_level_metadata_pipeline_spark.operators.timeseries import (
    theil_sen_slope,
)


def test_floor_div_exact_past_2_53(spark):
    """The advisor's exact repro: quotients past 2^53 must not round."""
    num = 900000000000007 * 10_000
    df = spark.createDataFrame([(num, 7), (-num, 7), (num, -7)],
                               "n bigint, d bigint")
    got = {
        (r.n, r.d): r.q
        for r in df.select(
            "n", "d", _floor_div_exact(F.col("n"), F.col("d")).alias("q")
        ).collect()
    }
    assert got[(num, 7)] == num // 7 == 1285714285714295714
    assert got[(-num, 7)] == (-num) // 7          # floor, not trunc
    assert got[(num, -7)] == num // -7            # floor, not trunc


def test_floor_div_exact_matches_python_floor(spark):
    """Floor semantics on all sign combinations, incl. non-divisible."""
    cases = [(7, 3), (-7, 3), (7, -3), (-7, -3), (0, 5), (10, 5),
             (2**60 + 1, 3), (-(2**60 + 1), 3)]
    df = spark.createDataFrame(cases, "n bigint, d bigint")
    rows = df.select(
        "n", "d", _floor_div_exact(F.col("n"), F.col("d")).alias("q")
    ).collect()
    for r in rows:
        assert r.q == r.n // r.d, (r.n, r.d, r.q)


def test_floor_div_exact_decimal_operands(spark):
    """CUPED path: decimal(38,0) operands stay exact through `div`.

    Contract: the QUOTIENT must fit int64 (every caller computes a
    scaled mean/ratio); operands may be full decimal(38,0). Here the
    numerator is 30 digits — far past both 2^53 and 2^63 — while the
    quotient is 12 digits: double division would be wrong, div is
    exact."""
    n = int("9" * 30)
    d = int("9" * 18)
    df = spark.createDataFrame([(1,)], "x int").select(
        F.lit(str(n)).cast("decimal(38,0)").alias("n"),
        F.lit(str(d)).cast("decimal(38,0)").alias("d"),
    )
    q = df.select(_floor_div_exact(F.col("n"), F.col("d")).alias("q"))
    assert q.collect()[0].q == n // d


def test_theil_sen_slope_exact_past_2_53(spark):
    """End-to-end: a two-point series whose slope numerator > 2^53."""
    dy = 900000000000007
    df = spark.createDataFrame(
        [("g", 0, 0), ("g", 7, dy)], "grp string, t bigint, y bigint"
    )
    out = theil_sen_slope(df, group="grp", t_col="t", y_col="y",
                          scale=10_000).collect()
    assert len(out) == 1
    assert out[0].slope_scaled == (dy * 10_000) // 7 == 1285714285714295714


def test_duckdb_oracle_idiom_matches(spark):
    """The `//` oracle idiom replays Spark's div result past 2^53."""
    num = 900000000000007 * 10_000
    duck = duckdb.sql(
        f"SELECT CAST(({num} - (({num} % 7) + 7) % 7) // 7 AS BIGINT) AS q"
    ).fetchone()[0]
    sp = (
        spark.range(1)
        .select(
            F.call_function(
                "div",
                F.lit(num) - F.pmod(F.lit(num), F.lit(7)),
                F.lit(7),
            ).alias("q")
        )
        .collect()[0]
        .q
    )
    assert duck == sp == num // 7
