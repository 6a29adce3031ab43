"""Runtime Bloom-filter join pruning (Spark 3.3+ `InjectRuntimeFilter`).

At 100 TB the classic shape is: a huge fact shuffle-joined to a dimension
that carries a selective filter. DPP (test_layout.py) prunes whole
partition directories, but only when the fact is partitioned on the join
key. The Bloom-filter runtime filter is the row-level complement: Spark
builds a bloom filter from the filtered creation side and semi-filters
the fact *before* the shuffle, cutting exchange volume by the dim's
selectivity — no physical layout required.

These tests prove on the executed plan that
  * a BloomFilterAggregate / might_contain pair is injected around the
    shuffle join, and
  * results are identical with the filter on and off.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # fact-side scans at sf-test sizes are far below the 10GB default
    # application threshold — drop it so injection triggers in-test
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # force the shuffle join the filter exists for (BHJ needs no bloom)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def bloom_conf(spark):
    old = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _tables(spark, tmp_path):
    fact_path = str(tmp_path / "fact")
    dim_path = str(tmp_path / "dim")
    spark.range(0, 50_000).select(
        (F.col("id") % 1000).alias("k"), (F.col("id") % 97).alias("v")
    ).write.mode("overwrite").parquet(fact_path)
    spark.range(0, 1000).select(
        F.col("id").alias("d_k"),
        F.when(F.col("id") % 50 == 0, "hot").otherwise("cold").alias("tier"),
    ).write.mode("overwrite").parquet(dim_path)
    return spark.read.parquet(fact_path), spark.read.parquet(dim_path)


def test_bloom_filter_injected_on_executed_plan(spark, tmp_path, bloom_conf):
    fact, dim = _tables(spark, tmp_path)
    joined = fact.join(dim.where(F.col("tier") == "hot"), fact.k == dim.d_k)
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString().lower()
    assert "might_contain" in plan, plan
    assert "bloomfilter" in plan or "bloom_filter" in plan, plan


def test_bloom_filter_preserves_results(spark, tmp_path, bloom_conf):
    fact, dim = _tables(spark, tmp_path)

    def run():
        return sorted(
            (r.k, r.v)
            for r in fact.join(
                dim.where(F.col("tier") == "hot"), fact.k == dim.d_k
            ).collect()
        )

    with_filter = run()
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    without = run()
    assert with_filter == without
    # 20 hot keys of 1000, 50 fact rows per key
    assert len(with_filter) == 1000
