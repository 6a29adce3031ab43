"""RocksDB state store provider for stateful streaming.

The default HDFSBackedStateStoreProvider keeps every key in executor
heap — fine for demo streams, a hard wall when 100 TB/day of sessions
or dedup keys accumulate. Spark ships a RocksDB provider (rocksdbjni is
in the distribution) that spills state to local disk with incremental
changelog checkpointing. This test proves the engine's streaming plans
run unchanged on it: same results as the default provider, and the
progress metrics show RocksDB actually held the state.
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture()
def rocksdb_conf(spark):
    old = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(_PROVIDER_KEY, ROCKSDB)
    yield
    if old is None:
        spark.conf.unset(_PROVIDER_KEY)
    else:
        spark.conf.set(_PROVIDER_KEY, old)


def _run_hourly(spark, sf_dir: str):
    """Windowed count over the events stream; returns (rows, progresses)."""
    from gene_level_metadata_pipeline_spark.sources.readers import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    agg = (
        normalize_event_ts(src)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"rocks_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted(
        (r["window"].start.isoformat(), r["event_type"], r["n"])
        for r in spark.table(name).collect()
    )
    progresses = list(q.recentProgress)
    spark.catalog.dropTempView(name)
    return rows, progresses


def test_rocksdb_state_store_matches_default(spark, rocksdb_conf):
    sf = "/root/testdata/sf0.001"
    rocks_rows, progresses = _run_hourly(spark, sf)

    # the provider really was RocksDB: its custom metrics are namespaced
    state_ops = [p for prog in progresses for p in prog["stateOperators"]]
    assert state_ops, "no stateful operator reported progress"
    custom = {k for op in state_ops for k in op.get("customMetrics", {})}
    assert any("rocksdb" in k.lower() for k in custom), custom

    spark.conf.unset(_PROVIDER_KEY)
    default_rows, _ = _run_hourly(spark, sf)
    assert rocks_rows == default_rows
    assert len(rocks_rows) > 0
