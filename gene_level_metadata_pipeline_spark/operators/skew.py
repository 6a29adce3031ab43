"""Skew-mitigation operators: salting for hot keys.

AQE's skew-join splitting (on in session defaults) handles most runtime
skew; salting is the explicit tool for *aggregation* skew and for joins
whose hot keys are known upfront (hub proteins in STRING-style edge lists,
boilerplate LSH buckets — SURVEY.md §4).

``salted_agg`` is the two-phase pattern: salt the key → partial aggregate
on (key, salt) — spreading one hot key over ``salt_buckets`` reducers —
then final-aggregate the partials on the key alone. Works for any
algebraic aggregate (sum/count/min/max); averages must be decomposed into
sum+count by the caller.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "salted_count"]


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over a salted key.

    ``partial_aggs`` run per (keys, salt); ``final_aggs`` must re-combine
    the partial columns per keys (e.g. partial ``sum(x) as s`` → final
    ``sum(s) as s``). The salt is a deterministic spread — hash of the
    whole input row — so re-runs produce identical partials.
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.hash(*df.columns), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_count(df: DataFrame, keys: list[str], salt_buckets: int = 16) -> DataFrame:
    """Skew-safe ``groupBy(keys).count()``: one hot key becomes
    ``salt_buckets`` partial counts summed in a second (tiny) aggregation.
    Returns (keys..., n)."""
    return salted_agg(
        df,
        keys,
        partial_aggs=[F.count(F.lit(1)).alias("__pn")],
        final_aggs=[F.sum("__pn").alias("n")],
        salt_buckets=salt_buckets,
    )
