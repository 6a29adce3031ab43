"""Bucketed co-located joins: the 100 TB shuffle-elimination strategy.

SURVEY §4 / PLANS.md: big fact-fact joins shuffle on their keys unless the
tables are bucketed on the join key at write time. This test proves the
engine's bucketing path end-to-end — write two tables bucketed by the join
key, join them, and assert the physical plan contains NO shuffle exchange
on either side.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_spark():
    # warehouse.dir is a static conf — use the default ./spark-warehouse
    # (gitignored); saveAsTable only needs it writable
    from gene_level_metadata_pipeline_spark.session import get_spark

    spark = get_spark("bucketing-test")
    # disable auto-broadcast so the join strategy is decided by bucketing,
    # not by the tables being tiny
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    for t in ("t_orders", "t_lines"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_is_shuffle_free(bucketed_spark):
    spark = bucketed_spark
    orders = spark.range(0, 10_000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 100).alias("o_custkey"),
    )
    lines = spark.range(0, 40_000).select(
        (F.col("id") % 10_000).alias("l_orderkey"),
        (F.col("id") % 7).alias("l_qty"),
    )
    import shutil

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    for name, df, key in [("t_orders", orders, "o_orderkey"),
                          ("t_lines", lines, "l_orderkey")]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # a killed previous run can leave the LOCATION without a catalog
        # entry — DROP TABLE is then a no-op and saveAsTable fails with
        # LOCATION_ALREADY_EXISTS; clear the orphan directory too
        shutil.rmtree(os.path.join(warehouse, name), ignore_errors=True)
        (df.write.mode("overwrite").bucketBy(8, key).sortBy(key)
         .format("parquet").saveAsTable(name))

    joined = spark.table("t_orders").join(
        spark.table("t_lines"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    joined.count()  # force AQE-final plan
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located buckets: a sort-merge join with zero shuffle exchanges
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan

    # sanity: result is correct (each order matches its 4 lines)
    assert joined.count() == 40_000


def test_aqe_splits_skewed_join(bucketed_spark, tmp_path):
    """AQE skew-join handling — the runtime defense PLANS.md names for
    hub keys: a heavily skewed fact side joined without broadcast gets
    its oversized partitions split (plan shows the skew marker)."""
    spark = bucketed_spark
    skew_path = str(tmp_path / "skewfact")
    dim_path = str(tmp_path / "dim")
    # 300k rows, 90% on key 0 — one reducer partition gets ~270k
    (
        spark.range(0, 300_000)
        .selectExpr(
            "CASE WHEN id % 10 < 9 THEN 0 ELSE id % 1000 END AS k",
            "id AS payload",
        )
        .write.mode("overwrite").parquet(skew_path)
    )
    spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS dval").write.mode(
        "overwrite"
    ).parquet(dim_path)

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k"
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
    try:
        fact = spark.read.parquet(skew_path)
        dim = spark.read.parquet(dim_path)
        joined = fact.join(dim, "k")
        # collect through joined's OWN QueryExecution — count()/write would
        # build a separate execution and the AQE-final plan (where the skew
        # marker lives) would never attach to `joined`
        assert len(joined.collect()) == 300_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
    finally:
        for c in ("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                  "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
                  "spark.sql.adaptive.advisoryPartitionSizeInBytes"):
            spark.conf.unset(c)
