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

__all__ = ["salted_agg", "salted_count", "salted_join", "skew_split_confs"]


def skew_split_confs(advisory_bytes: int = 8 * 1024 * 1024) -> dict[str, str]:
    """AQE confs that make the skew-join split actually ENGAGE for the
    given partition sizing — measured, not folklore (r5 skew stress,
    tools/stress_skew.py): on a 40%-hub decoration join at local scale
    the stock pair (256 MB threshold, 64 MB advisory) never split
    (9.6s, same as split-off), and lowering EITHER knob alone changed
    nothing (9.6s / 8.7s); only the pair together engaged the split
    (2.5-2.9s, 3.3x). Threshold rides at 4x the advisory size so a
    partition must be markedly over target before the split pays its
    re-planning cost.

    Not session defaults: the small advisory size costs a non-skewed
    workload ~30% in task overhead (measured on the bench headline
    set) — apply these per known-skew job::

        for k, v in skew_split_confs().items():
            spark.conf.set(k, v)

    For cluster submits, tools/scale_conf.py emits the 128 MB-partition
    equivalents of the same rule.
    """
    return {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(advisory_bytes),
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": str(
            4 * advisory_bytes
        ),
    }


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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Replicate-small-side salted equi-join for known hot keys.

    The fact side gets a deterministic salt in ``[0, salt_buckets)``
    (hash of the whole row — identical rows co-bucket, everything else
    spreads); the dim side is exploded ``salt_buckets``× so every
    (key, salt) pair exists. The join key becomes (key, salt), which
    splits one hot key's row group across ``salt_buckets`` reducers.

    Cost model: dim-side rows × salt_buckets extra shuffle volume buys
    fact-side hot keys spread over salt_buckets tasks — worth it exactly
    when the dim is small and the fact is skewed (hub proteins in STRING
    edges, SURVEY §4). AQE's skew-join split is the runtime alternative;
    salting is the static one that also works for non-sort-merge plans
    and for aggregations feeding the join. Result is bit-identical to
    the unsalted join (asserted in tests/test_skew_join.py).
    """
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.hash(*fact.columns), F.lit(salt_buckets))
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.array([F.lit(i) for i in range(salt_buckets)]))
    )
    cond = (salted_fact[fact_key] == salted_dim[dim_key]) & (
        salted_fact["__salt"] == salted_dim["__salt"]
    )
    return salted_fact.join(salted_dim, cond, how).drop("__salt")
