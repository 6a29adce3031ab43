"""Streaming/batch sessionize reconciliation (VERDICT r1 item 2).

Pins the watermark-punctuation flush contract:

1. With ``flush_final=True`` (default) the streaming sessionizer's result
   is row-for-row identical to the batch twin ``sessionize`` — the
   sentinel advances the final watermark past every real session's
   ``last_seen + gap`` so the trailing no-data micro-batch drains all
   open state, and the sentinel's own session is filtered out.
2. With ``flush_final=False`` (strict unbounded-stream semantics) the
   only missing rows are final open sessions whose timeout the last
   watermark (max event time − 1 h) never passed — i.e. sessions with
   ``end + gap >= max_ts − 1h``. Nothing else may differ.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _batch_sessions(spark, sf_dir):
    from gene_level_metadata_pipeline_spark.plans.driver_queries import QUERIES

    return (
        QUERIES["sessionize"](spark, sf_dir)
        .select(
            "user_id",
            F.col("start_us").alias("session_start_us"),
            F.col("end_us").alias("session_end_us"),
            "n_events",
        )
    )


def test_flushed_stream_equals_batch(spark):
    from gene_level_metadata_pipeline_spark.streaming.windows import sessionize_stream

    stream = sessionize_stream(spark, SF_SMOKE, flush_final=True)
    batch = _batch_sessions(spark, SF_SMOKE)
    s = {tuple(r) for r in stream.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b, (
        f"stream-batch drift: only-stream={sorted(s - b)[:5]} "
        f"only-batch={sorted(b - s)[:5]}"
    )


def test_unflushed_gap_is_exactly_open_horizon_sessions(spark):
    from gene_level_metadata_pipeline_spark.streaming.windows import sessionize_stream

    stream = sessionize_stream(spark, SF_SMOKE, flush_final=False)
    batch = _batch_sessions(spark, SF_SMOKE)
    s = {tuple(r) for r in stream.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s <= b, f"stream emitted sessions absent from batch: {sorted(s - b)[:5]}"

    gap_us = 30 * 60 * 1_000_000
    delay_us = 3600 * 1_000_000
    max_us = max(r[2] for r in b)
    final_watermark = max_us - delay_us
    missing = b - s
    assert missing, "fixture too small: no open-horizon sessions at stream end"
    for (_uid, _start, end, _n) in missing:
        assert end + gap_us >= final_watermark, (
            "unflushed run dropped a session the watermark had already "
            f"passed: end={end}, final_watermark={final_watermark}"
        )
    # and every missing session is its user's LAST batch session
    last_by_user = {}
    for (uid, _start, end, _n) in b:
        last_by_user[uid] = max(last_by_user.get(uid, 0), end)
    for (uid, _start, end, _n) in missing:
        assert end == last_by_user[uid]


def test_native_session_window_stream_equals_batch(spark):
    """The native session_window streaming query (window-merge state)
    must equal the batch session-window aggregation after the flush."""
    from pyspark.sql import functions as F

    from gene_level_metadata_pipeline_spark.streaming.windows import (
        _events_confs,
        session_window_counts_stream,
    )
    from gene_level_metadata_pipeline_spark.sources.readers import (
        normalize_event_ts,
    )

    stream = session_window_counts_stream(spark, SF_SMOKE)
    _events_confs(spark)
    ev = normalize_event_ts(
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    )
    batch = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total"),
        )
        .select(
            "user_id",
            F.unix_micros("sw.start").alias("session_start_us"),
            F.unix_micros("sw.end").alias("session_end_us"),
            "n",
            "total",
        )
    )
    s = {tuple(r) for r in stream.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b, (
        f"only-stream={sorted(s - b)[:3]} only-batch={sorted(b - s)[:3]}"
    )


def test_flush_sentinel_empty_events_short_circuits(spark, tmp_path):
    """An empty events table has nothing to flush: the sentinel stager
    returns None (no IndexError on the empty template collect), and the
    sessionizer falls back to the plain source (ADVICE r2)."""
    from pyspark.sql.types import LongType, StructField, StructType

    from gene_level_metadata_pipeline_spark.streaming.windows import (
        _stage_with_flush_sentinel,
    )

    schema = StructType(
        [
            StructField("event_id", LongType(), False),  # non-nullable on purpose
            StructField("user_id", LongType(), False),
            StructField("ts", LongType(), False),
        ]
    )
    empty = spark.createDataFrame([], schema)
    empty.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    static = spark.read.parquet(str(tmp_path / "events.parquet"))
    assert _stage_with_flush_sentinel(spark, static, str(tmp_path), 30) is None


def test_flush_sentinel_nullable_schema_with_required_payload(spark, tmp_path):
    """Sentinel templating nulls payload columns; a parquet-required
    payload field must not break createDataFrame (ADVICE r2)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gene_level_metadata_pipeline_spark.streaming.windows import (
        _FLUSH_SENTINEL_UID,
        _stage_with_flush_sentinel,
    )

    # single-FILE events.parquet, like the testdata layout, with every
    # field parquet-required (non-nullable)
    table = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "user_id": pa.array([10], pa.int64()),
            "ts": pa.array([1_700_000_000_000_000_000], pa.int64()),
            "event_type": pa.array(["click"], pa.string()),
            "value": pa.array([1.5], pa.float64()),
        },
        schema=pa.schema(
            [
                pa.field("event_id", pa.int64(), nullable=False),
                pa.field("user_id", pa.int64(), nullable=False),
                pa.field("ts", pa.int64(), nullable=False),
                pa.field("event_type", pa.string(), nullable=False),
                pa.field("value", pa.float64(), nullable=False),
            ]
        ),
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    static = spark.read.parquet(str(tmp_path / "events.parquet"))
    stage = _stage_with_flush_sentinel(spark, static, str(tmp_path), 30)
    assert stage is not None
    try:
        staged = spark.read.parquet(stage)
        assert staged.count() == 2  # original + sentinel
        sent = staged.where(F.col("user_id") == _FLUSH_SENTINEL_UID).collect()
        assert len(sent) == 1
        assert sent[0]["event_type"] is None  # payload nulled
        assert sent[0]["ts"] > 1_700_000_000_000_000_000
    finally:
        import shutil

        shutil.rmtree(stage, ignore_errors=True)
