"""Cache surface + storage codecs + streaming file sink.

* cacheTable must show up as InMemoryTableScan in subsequent plans (the
  reference reuses its spine 25×; caching is the Spark spelling of
  'built once, used many').
* Parquet codec roundtrips: zstd/snappy/gzip all readable, values
  identical; zstd ≤ snappy ≤ uncompressed on this synthetic text table
  (ordering asserted loosely — zstd < uncompressed only, codecs can tie
  on tiny data).
* Streaming parquet sink: exactly-once via the _spark_metadata commit
  log — a second read sees exactly the committed rows, no partials.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def test_cache_table_plan_and_release(spark):
    df = spark.read.parquet(f"{SF_ORACLE}/nation.parquet")
    df.createOrReplaceTempView("nation_cache_t")
    spark.catalog.cacheTable("nation_cache_t")
    try:
        out = spark.table("nation_cache_t").groupBy("n_regionkey").count()
        out.collect()
        # Spark 4's AQE executed-plan string renders the cache as a
        # TableCacheQueryStage; the stable marker is the optimized plan
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "InMemoryRelation" in plan
        assert spark.catalog.isCached("nation_cache_t")
    finally:
        spark.catalog.uncacheTable("nation_cache_t")
    assert not spark.catalog.isCached("nation_cache_t")


def test_parquet_codec_roundtrip(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    expected = docs.count()
    sizes = {}
    base = tempfile.mkdtemp(prefix="codecs-")
    try:
        for codec in ("uncompressed", "snappy", "gzip", "zstd"):
            path = os.path.join(base, codec)
            docs.coalesce(1).write.option("compression", codec).parquet(path)
            back = spark.read.parquet(path)
            assert back.count() == expected
            assert back.agg(F.sum("n_chars")).collect()[0][0] == \
                docs.agg(F.sum("n_chars")).collect()[0][0]
            sizes[codec] = sum(
                os.path.getsize(os.path.join(path, f))
                for f in os.listdir(path) if f.endswith(".parquet")
            )
        assert sizes["zstd"] < sizes["uncompressed"]
        assert sizes["gzip"] < sizes["uncompressed"]
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_streaming_parquet_sink_exactly_once(spark):
    src = tempfile.mkdtemp(prefix="stream-src-")
    out = tempfile.mkdtemp(prefix="stream-out-")
    ckpt = tempfile.mkdtemp(prefix="stream-ckpt-")
    try:
        spark.read.parquet(f"{SF_ORACLE}/nation.parquet").write.parquet(
            os.path.join(src, "batch1"), mode="overwrite"
        )
        stream = (
            spark.readStream.schema(
                spark.read.parquet(os.path.join(src, "batch1")).schema
            ).parquet(os.path.join(src, "*"))
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # commit log written → exactly the 25 nation rows, once
        assert os.path.isdir(os.path.join(out, "_spark_metadata"))
        assert spark.read.parquet(out).count() == 25
        # re-running the same availableNow trigger adds NOTHING (offsets
        # are checkpointed; no new files)
        q2 = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(120)
        assert spark.read.parquet(out).count() == 25
    finally:
        for d in (src, out, ckpt):
            shutil.rmtree(d, ignore_errors=True)
