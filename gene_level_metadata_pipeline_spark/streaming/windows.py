"""Structured Streaming slices over the events table (SURVEY.md §2.12).

The reference is strictly batch; streaming is the engine's extension
surface. Design: the same logical aggregation as the batch
``events_hourly`` query, expressed as readStream → tumbling window →
memory sink, run to completion with an availableNow trigger. At 100 TB the
identical plan runs continuously against an object-store drop zone with a
watermark bounding state.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gene_level_metadata_pipeline_spark.sources.readers import normalize_event_ts

__all__ = [
    "asof_enrich_stream",
    "hourly_event_counts_stream",
    "incremental_corpus_stream",
    "session_window_counts_stream",
    "sessionize_stream",
    "stream_dedup_within_watermark_demo",
    "stream_outer_join_demo",
    "stream_stream_interval_join",
    "transform_with_state_counts",
]


import contextlib


@contextlib.contextmanager
def _pinned_shuffle(spark: SparkSession, n: int = 16):
    """Pin shuffle/state partitions for one streaming query.

    Stateful operators allocate one state-store task per shuffle
    partition per micro-batch; on a caller session with the 200 default,
    a kilobyte-scale demo stream pays 200 × operators × batches empty
    tasks. The count is bound at ``start()``, so restoring the caller's
    conf afterwards is safe."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def _events_confs(spark: SparkSession) -> None:
    """The events path must work on ANY caller-provided session (the
    driver's verify uses its own): nanos-as-long for the parquet read and
    UTC rendering to agree with the timezone-free oracle."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def hourly_event_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window counts via an actual streaming query.

    Reads the events parquet as a stream (availableNow = process all
    existing files then stop), aggregates with ``window()``, lands in a
    memory sink, and returns the completed result as a batch DataFrame —
    so the driver can oracle-check a genuinely streaming plan.
    """
    _events_confs(spark)
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ev = normalize_event_ts(src)
    agg = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"stream_hourly_{uuid.uuid4().hex[:8]}"
    with _pinned_shuffle(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    out = spark.table(name).select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type",
        "n",
    )
    # materialize before the sink table goes stale, then free the sink
    rows = out.collect()
    spark.catalog.dropTempView(name)
    return spark.createDataFrame(rows, out.schema)


_FLUSH_SENTINEL_UID = -(2**40)  # impossible user_id reserved for the punctuation row


def _stage_with_flush_sentinel(
    spark: SparkSession, static: DataFrame, sf_dir: str, gap_minutes: int
) -> str:
    """Stage events.parquet plus one far-future sentinel event.

    Watermark punctuation: EventTimeTimeout only fires when the watermark
    (max event time − delay) passes ``last_seen + gap``, so every user's
    final open session would otherwise sit in state when a bounded run
    ends. One synthetic event at ``max(ts) + delay + gap + 1s`` under a
    reserved user_id pushes the final watermark past every real session's
    timeout, so the trailing no-data micro-batch drains all of them. The
    sentinel user's own (single-event) session is the only state left
    behind, and its output is filtered. This is the standard bounded-
    replay flush; on a true unbounded stream no sentinel is needed.

    Returns ``None`` when the static frame is EMPTY — there is nothing
    to flush and no row to template the sentinel from (the caller falls
    back to the plain no-sentinel source). The sentinel row is built
    against a NULLABLE copy of the schema: payload columns are nulled,
    and ``createDataFrame`` would reject a null in any field the parquet
    footer declared required.
    """
    import glob as _glob
    import os
    import shutil
    import tempfile

    from pyspark.sql.types import StructField, StructType

    first = static.limit(1).collect()
    if not first:
        return None
    horizon_s = 3600 + gap_minutes * 60 + 1  # watermark delay + gap + margin
    fields = static.schema.fields
    ts_type = static.schema["ts"].dataType.simpleString()
    row = first[0].asDict()
    for f in fields:  # null out payload columns; keep only the key + time
        if f.name not in ("ts", "user_id", "event_id"):
            row[f.name] = None
    row["user_id"] = _FLUSH_SENTINEL_UID
    if "event_id" in row:
        row["event_id"] = -1
    if ts_type == "bigint":  # raw nanos under nanosAsLong
        max_ts = static.agg(F.max("ts")).first()[0]
        row["ts"] = int(max_ts) + horizon_s * 1_000_000_000
    else:  # timestamp / timestamp_ntz
        import datetime

        max_ts = static.agg(F.max("ts")).first()[0]
        row["ts"] = max_ts + datetime.timedelta(seconds=horizon_s)
    stage = tempfile.mkdtemp(prefix="sessionize_flush_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"), f"{stage}/events.parquet"
    )
    nullable = StructType(
        [StructField(f.name, f.dataType, True) for f in fields]
    )
    sent = spark.createDataFrame(
        [tuple(row[f.name] for f in fields)], nullable
    )
    tmp_out = stage + "_w"
    sent.coalesce(1).write.mode("overwrite").parquet(tmp_out)
    part = _glob.glob(os.path.join(tmp_out, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(stage, "zz_sentinel.parquet"))
    shutil.rmtree(tmp_out, ignore_errors=True)
    return stage


def sessionize_stream(
    spark: SparkSession,
    sf_dir: str,
    gap_minutes: int = 30,
    flush_final: bool = True,
) -> DataFrame:
    """Stateful streaming sessionization via applyInPandasWithState.

    The custom-stateful-operator slice: per-user sessions with a
    ``gap_minutes`` inactivity timeout, state = (session start, last seen,
    count), emitted on event-time timeout. The watermark bounds state.

    With ``flush_final=True`` (default) a watermark-punctuation sentinel
    (see ``_stage_with_flush_sentinel``) drains every open session when
    the bounded replay ends, making the result provably identical to the
    batch twin ``sessionize`` — the registered query shares its oracle.
    With ``flush_final=False`` the run keeps strict unbounded-stream
    semantics: sessions whose timeout the final watermark never passed
    stay in state (e.g. 21 of 150 users' last sessions at sf0.01),
    awaiting data that will never come.

    Returns (user_id, session_start_us, session_end_us, n_events).
    """
    import shutil

    from pyspark.sql.streaming.state import GroupStateTimeout

    _events_confs(spark)
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    stage_dir = None
    if flush_final:
        # None when events is empty: nothing to flush, no sentinel template
        stage_dir = _stage_with_flush_sentinel(spark, static, sf_dir, gap_minutes)
    if stage_dir is not None:
        src = spark.readStream.schema(static.schema).parquet(stage_dir)
    else:
        src = (
            spark.readStream.schema(static.schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    ev = normalize_event_ts(src).withWatermark("ts", "1 hour")

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdf_iter, state):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "session_start_us": [start],
                 "session_end_us": [last], "n_events": [n]}
            )
            return
        out = []
        cur = list(state.get) if state.exists else None
        # accumulate ALL chunks before sorting: pdf_iter yields the group
        # in Arrow-batch chunks in partition order, so sorting per chunk
        # would sessionize a >1-batch user out of time order
        all_us = sorted(
            int(t)
            for pdf in pdf_iter
            for t in (pdf["ts"].astype("int64") // 1000)
        )
        for t in all_us:
            if cur is None:
                cur = [t, t, 0]
            elif t - cur[1] > gap_us:
                out.append((user_id, cur[0], cur[1], cur[2]))
                cur = [t, t, 0]
            cur[1] = max(cur[1], t)
            cur[2] += 1
        if cur is not None:
            state.update(tuple(cur))
            state.setTimeoutTimestamp(cur[1] // 1000 + gap_us // 1000)
        yield pd.DataFrame(
            out, columns=["user_id", "session_start_us", "session_end_us", "n_events"]
        )

    sessions = ev.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, session_start_us long, "
                         "session_end_us long, n_events long",
        stateStructType="start long, last long, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    name = f"stream_sessions_{uuid.uuid4().hex[:8]}"
    try:
        with _pinned_shuffle(spark):
            q = (
                sessions.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        out = spark.table(name).where(F.col("user_id") != F.lit(_FLUSH_SENTINEL_UID))
        rows = out.collect()
        spark.catalog.dropTempView(name)
        return spark.createDataFrame(rows, out.schema)
    finally:
        if stage_dir is not None:
            shutil.rmtree(stage_dir, ignore_errors=True)


def session_window_counts_stream(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 30
) -> DataFrame:
    """Native streaming session windows: ``F.session_window`` under a
    watermark in append mode — Spark's built-in window-MERGE state
    (distinct from the tumbling-window state of
    ``hourly_event_counts_stream`` and the custom
    ``applyInPandasWithState`` sessionizer): per-key session windows
    merge as events arrive and emit once the watermark passes a
    session's end.

    Append mode has the same bounded-replay horizon problem as the
    custom sessionizer — sessions whose end the final watermark never
    passes stay in state — so the run reuses the watermark-punctuation
    flush (``_stage_with_flush_sentinel``): the sentinel advances the
    final watermark past every real session's end, all sessions emit,
    and the result provably equals the batch ``events_session_windows``
    query, whose oracle it shares.

    Returns (user_id, session_start_us, session_end_us, n, total).
    """
    import shutil

    _events_confs(spark)
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    stage_dir = _stage_with_flush_sentinel(spark, static, sf_dir, gap_minutes)
    try:
        src = spark.readStream.schema(static.schema).parquet(stage_dir)
        ev = normalize_event_ts(src).withWatermark("ts", "1 hour")
        agg = (
            ev.groupBy(
                "user_id",
                F.session_window("ts", f"{gap_minutes} minutes").alias("sw"),
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
                .cast("double")
                .alias("total"),
            )
        )
        name = f"stream_swin_{uuid.uuid4().hex[:8]}"
        with _pinned_shuffle(spark):
            q = (
                agg.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        out = (
            spark.table(name)
            .where(F.col("user_id") != F.lit(_FLUSH_SENTINEL_UID))
            .select(
                "user_id",
                F.unix_micros("sw.start").alias("session_start_us"),
                F.unix_micros("sw.end").alias("session_end_us"),
                "n",
                "total",
            )
        )
        rows = out.collect()
        spark.catalog.dropTempView(name)
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(stage_dir, ignore_errors=True)


def asof_enrich_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming as-of enrichment against a VERSIONED dimension — the
    feature-store lookup pattern: each event joins the dimension version
    valid at its event time (not the latest), via the batch
    ``temporal.as_of_join`` applied per micro-batch in ``foreachBatch``
    (the as-of union-window is not expressible on an unbounded stream;
    per-batch batch semantics is the standard composition).

    The dimension is derived deterministically from the data so the
    oracle can rebuild it: two versions per user — tier = user_id % 3
    from epoch 0, then tier + 10 from the corpus' midpoint timestamp.
    Events before the midpoint must pick version 1, the rest version 2.

    Returns (event_id, user_id, us, tier).
    """
    from gene_level_metadata_pipeline_spark.operators.temporal import as_of_join

    _events_confs(spark)
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    stat_us = normalize_event_ts(static).select(
        "event_id", "user_id", F.unix_micros("ts").alias("us")
    )
    lo, hi = stat_us.agg(F.min("us"), F.max("us")).first()
    t0 = lo + (hi - lo) // 2
    users = stat_us.select("user_id").distinct()
    dim = users.select(
        "user_id",
        F.lit(0).cast("long").alias("valid_from_us"),
        (F.col("user_id") % 3).alias("tier"),
    ).unionByName(
        users.select(
            "user_id",
            F.lit(t0).cast("long").alias("valid_from_us"),
            (F.col("user_id") % 3 + 10).alias("tier"),
        )
    )

    results: list = []

    def enrich(batch_df, _bid):
        j = as_of_join(
            batch_df, dim, on="user_id", left_ts="us", right_ts="valid_from_us"
        )
        results.extend(
            j.select(
                "event_id", "user_id", "us", F.col("right_tier").alias("tier")
            ).collect()
        )

    src = spark.readStream.schema(static.schema).option(
        "pathGlobFilter", "events.parquet"
    ).parquet(sf_dir)
    ev = normalize_event_ts(src).select(
        "event_id", "user_id", F.unix_micros("ts").alias("us")
    )
    with _pinned_shuffle(spark):
        q = (
            ev.writeStream.foreachBatch(enrich)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.createDataFrame(
        results, "event_id long, user_id long, us long, tier long"
    )


def stream_stream_interval_join(
    spark: SparkSession, sf_dir: str, minutes: int = 30
) -> DataFrame:
    """Stream-stream event-time interval join: click → purchase funnels.

    Joins two STREAMING sides (clicks and purchases filtered from the same
    source stream) on user_id with the purchase constrained to
    [click.ts, click.ts + ``minutes``]. Both sides carry watermarks, so
    Spark bounds the join state: a buffered click is evicted once the
    purchase-side watermark passes click.ts + interval — the unbounded-
    stream contract that makes this run forever at 100 TB/day.

    Run with availableNow over one parquet file → a single micro-batch, so
    every in-interval match is emitted before state eviction and the result
    equals the batch interval join (the oracle).

    Returns (click_id, purchase_id, user_id, lag_s).
    """
    _events_confs(spark)
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ev = normalize_event_ts(src)
    clicks = (
        ev.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {int(minutes)} MINUTES")
        ),
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")
        ).cast("long").alias("lag_s"),
    )
    name = f"stream_join_{uuid.uuid4().hex[:8]}"
    with _pinned_shuffle(spark):
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    out = spark.table(name)
    rows = out.collect()
    spark.catalog.dropTempView(name)
    return spark.createDataFrame(rows, out.schema)


def stream_dedup_within_watermark_demo(
    spark: SparkSession, demo_dir: str | None = None
) -> DataFrame:
    """``dropDuplicatesWithinWatermark``: dedup state that EXPIRES.

    Plain streaming ``dropDuplicates`` (streaming_dedup) keeps every key
    forever — unbounded state on an unbounded stream. The
    within-watermark variant guarantees dedup only for duplicates that
    arrive within the watermark delay of each other, which lets Spark
    evict a key once the watermark passes its horizon. That trade —
    bounded state for time-bounded dedup — is the only viable exact-dedup
    contract on a 100 TB/day stream.

    Deterministic five-batch demo: k1/k2 arrive in batch 1; batches 2-3
    advance the watermark far past k1's horizon and give the
    (one-batch-delayed) eviction pass time to run; batch 4 re-sends k1,
    which EMITS AGAIN — the expiry observable. A near-duplicate of k2
    inside batch 1 is suppressed — the dedup observable.

    Returns every emitted (event_id, k) row.
    """
    import json
    import os
    import tempfile

    _events_confs(spark)
    d = demo_dir or tempfile.mkdtemp(prefix="dedup_wm_demo_")
    os.makedirs(d, exist_ok=True)

    def write_batch(name: str, rows: list[tuple[str, str, str]], mtime: int) -> None:
        path = os.path.join(d, name)
        if not os.path.exists(path):
            with open(path, "w") as f:
                for event_id, k, ts in rows:
                    f.write(json.dumps(
                        {"event_id": event_id, "k": k, "ts": ts}) + "\n")
        os.utime(path, (mtime, mtime))

    write_batch("batch_1.json", [
        ("e1", "k1", "2024-01-01 01:00:00"),
        ("e2", "k2", "2024-01-01 01:05:00"),
        ("e2dup", "k2", "2024-01-01 01:06:00"),   # within delay: suppressed
    ], mtime=1_700_000_000)
    # far-future row: watermark jumps to 09:50, past k1's 01:10 horizon
    write_batch("batch_2.json", [
        ("e3", "k9", "2024-01-01 10:00:00"),
    ], mtime=1_700_000_600)
    # filler: eviction runs with the advanced watermark one batch later
    write_batch("batch_3.json", [
        ("e4", "k8", "2024-01-01 10:02:00"),
    ], mtime=1_700_001_200)
    # k1 again, long after expiry: emits a SECOND time
    write_batch("batch_4.json", [
        ("e5", "k1", "2024-01-01 10:03:00"),
    ], mtime=1_700_001_800)

    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([
        StructField("event_id", StringType()),
        StructField("k", StringType()),
        StructField("ts", StringType()),
    ])
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(d)
        .withColumn("ts", F.to_timestamp("ts"))
        .withWatermark("ts", "10 minutes")
    )
    dedup = src.dropDuplicatesWithinWatermark(["k"]).select("event_id", "k")
    name = f"dedup_wm_{uuid.uuid4().hex[:8]}"
    with _pinned_shuffle(spark, 8):
        q = (
            dedup.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    out = spark.table(name)
    rows = out.collect()
    df = spark.createDataFrame(rows, out.schema)
    spark.catalog.dropTempView(name)
    return df


def transform_with_state_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event counts via ``transformWithStateInPandas`` — Spark 4's
    arbitrary-stateful-processing API (the applyInPandasWithState
    successor: typed state handles, timers, TTL, and a state store the
    operator can evolve). A ValueState cell accumulates each user's count
    across micro-batches; Arrow moves rows in grouped pandas batches.

    Requires the RocksDB state store provider (a transformWithState
    precondition) — set for this query and restored after. Run with
    availableNow over the events parquet; the emitted totals must equal
    the batch GROUP BY.

    Environment gate: the transformWithState protocol speaks protobuf to
    the state server, so the ``protobuf`` Python package must be present
    (it is not part of this engine's minimal dependency set). Raises
    ``NotImplementedError`` when absent; tests skip accordingly. The
    applyInPandasWithState sessionizer (sessionize_stream) is the
    dependency-free stateful path.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as ex:
        raise NotImplementedError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(pyspark's state-server protocol); not installed here"
        ) from ex

    import pandas as pd  # noqa: F401 (executor-side)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    _events_confs(spark)

    class CountProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState(
                "n", StructType([StructField("n", LongType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            batch_n = sum(len(pdf) for pdf in rows)
            prev = self._n.get()[0] if self._n.exists() else 0
            total = prev + batch_n
            self._n.update((total,))
            yield pd.DataFrame({"user_id": [key[0]], "n": [total]})

        def close(self) -> None:
            pass

    out_schema = StructType([
        StructField("user_id", LongType()),
        StructField("n", LongType()),
    ])
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    counts = src.select("user_id").groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=CountProcessor(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old_provider = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    name = f"tws_counts_{uuid.uuid4().hex[:8]}"
    try:
        with _pinned_shuffle(spark):
            q = (
                counts.writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        if old_provider is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old_provider)
    out = spark.table(name)
    rows = out.collect()
    df = spark.createDataFrame(rows, out.schema)
    spark.catalog.dropTempView(name)
    return df


def late_data_window_counts(spark: SparkSession, gap_dir: str | None = None) -> DataFrame:
    """Watermark + append-mode windowed counts: the late-data contract.

    Deterministic three-batch demo: batch 1 carries hour-1/hour-2 events
    plus a far-future event that will advance the watermark; batch 2 is a
    filler; batch 3 carries a LATE hour-1 event. Append mode emits a
    window once the eviction watermark passes its end, and late rows are
    filtered with the PREVIOUS batch's watermark (Spark keeps
    watermarkForLateEvents one batch behind watermarkForEviction —
    SPARK-24588), which is why the late event must arrive two batches
    after the watermark-advancing one to be provably dropped. The emitted
    hour-1 count is 2, not 3. maxFilesPerTrigger=1 splits the batches,
    and batch ORDER is pinned via file modification times
    (FileStreamSource orders by mtime, not name).

    Returns (hour, n) for every CLOSED window.
    """
    import json
    import os
    import tempfile

    _events_confs(spark)
    d = gap_dir or tempfile.mkdtemp(prefix="late_demo_")
    os.makedirs(d, exist_ok=True)

    def write_batch(name: str, rows: list[tuple[str, int]], mtime: int) -> None:
        path = os.path.join(d, name)
        if not os.path.exists(path):
            with open(path, "w") as f:
                for ts, uid in rows:
                    f.write(json.dumps({"ts": ts, "user_id": uid}) + "\n")
        os.utime(path, (mtime, mtime))

    write_batch("batch_1.json", [
        ("2024-01-01 01:10:00", 1), ("2024-01-01 01:20:00", 2),
        ("2024-01-01 02:15:00", 3),
        # max event time far ahead: watermark = 09:00 - 2h = 07:00,
        # so windows 01:00 and 02:00 are closed after this batch
        ("2024-01-01 09:00:00", 4),
    ], mtime=1_700_000_000)
    write_batch("batch_2.json", [
        ("2024-01-01 09:30:00", 5),   # filler: lets the 07:00 watermark
    ], mtime=1_700_000_600)           # become the late-event filter
    write_batch("batch_3.json", [
        ("2024-01-01 01:40:00", 6),   # LATE: behind the 07:00 watermark
    ], mtime=1_700_001_200)

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType([
        StructField("ts", StringType()),
        StructField("user_id", LongType()),
    ])
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(d)
        .withColumn("ts", F.to_timestamp("ts"))
        .withWatermark("ts", "2 hours")
    )
    agg = src.groupBy(F.window("ts", "1 hour")).agg(
        F.count(F.lit(1)).alias("n")
    )
    name = f"late_demo_{uuid.uuid4().hex[:8]}"
    with _pinned_shuffle(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")   # emit each window once, on watermark close
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    out = spark.table(name).select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "n",
    )
    rows = out.collect()
    spark.catalog.dropTempView(name)
    return spark.createDataFrame(rows, out.schema)


def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: a stream of events enriched by a static
    dimension (per-user tier derived from the customer table) — the
    standard streaming-enrichment shape. The static side is planned as a
    broadcast per micro-batch (no state, unlike stream-stream joins);
    the memory sink returns the completed result for oracle comparison
    against the equivalent batch join.
    """
    import uuid

    from pyspark.sql import functions as F

    from gene_level_metadata_pipeline_spark.sources.readers import normalize_event_ts

    _events_confs(spark)
    static_events = spark.read.parquet(f"{sf_dir}/events.parquet")
    dim = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .where(F.col("c_custkey") < 100)
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("tier"),
        )
    )
    src = (
        spark.readStream.schema(static_events.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ev = normalize_event_ts(src).select(
        "event_id", "user_id", "event_type"
    )
    joined = ev.join(F.broadcast(dim), "user_id")
    name = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name).select("event_id", "user_id", "event_type", "tier")
    rows = out.collect()
    df = spark.createDataFrame(rows, out.schema)
    spark.catalog.dropTempView(name)
    return df


def stream_outer_join_demo(spark: SparkSession, demo_dir: str | None = None) -> DataFrame:
    """LEFT OUTER stream-stream join: the watermark-driven NULL contract.

    Inner stream-stream joins (stream_stream_interval_join) emit matches
    as they arrive; the OUTER variant additionally emits an unmatched
    left row with NULLs — but only once the watermark proves no future
    match is possible (otherwise the NULL would be a lie a later row
    contradicts). That proof is exactly the state-eviction bound, so this
    is the one join where result completeness is governed by watermark
    progress, not input exhaustion.

    Deterministic three-batch demo (same mtime-pinned mechanics as
    late_data_window_counts): batch 1 carries clicks c1/c2 and a purchase
    matching only c1; batch 2 advances both sides' watermarks far past
    c2's 30-minute match window; batch 3 triggers the (one-batch-delayed)
    eviction pass that emits c2 with NULLs. The far-future batch-2/3 rows
    themselves stay inside their own match windows at query end and are
    provably NOT emitted — stopping the stream does not flush state.

    Returns (click_id, purchase_id, user_id, lag_s): one matched row and
    one NULL-padded row.
    """
    import json
    import os
    import tempfile

    _events_confs(spark)
    d = demo_dir or tempfile.mkdtemp(prefix="outer_join_demo_")
    os.makedirs(d, exist_ok=True)

    def write_batch(name: str, rows: list[tuple[str, str, int, str]], mtime: int) -> None:
        path = os.path.join(d, name)
        if not os.path.exists(path):
            with open(path, "w") as f:
                for kind, event_id, uid, ts in rows:
                    f.write(json.dumps(
                        {"kind": kind, "event_id": event_id,
                         "user_id": uid, "ts": ts}) + "\n")
        os.utime(path, (mtime, mtime))

    write_batch("batch_1.json", [
        ("click", "c1", 1, "2024-01-01 01:00:00"),
        ("click", "c2", 2, "2024-01-01 01:05:00"),
        ("purchase", "p1", 1, "2024-01-01 01:10:00"),
    ], mtime=1_700_000_000)
    # far-future rows on BOTH sides (different users — no match): each
    # side's watermark jumps to 09:50, far past c2's 01:35 match horizon
    write_batch("batch_2.json", [
        ("click", "c8", 8, "2024-01-01 10:00:00"),
        ("purchase", "p9", 9, "2024-01-01 10:00:00"),
    ], mtime=1_700_000_600)
    # filler batch: eviction (and its NULL emission) runs one batch
    # behind the watermark advance, same lag as SPARK-24588's late filter
    write_batch("batch_3.json", [
        ("purchase", "p7", 7, "2024-01-01 10:05:00"),
    ], mtime=1_700_001_200)

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType([
        StructField("kind", StringType()),
        StructField("event_id", StringType()),
        StructField("user_id", LongType()),
        StructField("ts", StringType()),
    ])
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(d)
        .withColumn("ts", F.to_timestamp("ts"))
    )
    clicks = (
        src.where(F.col("kind") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "10 minutes")
    )
    purchases = (
        src.where(F.col("kind") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "10 minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        "leftOuter",
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")
        ).cast("long").alias("lag_s"),
    )
    name = f"outer_join_{uuid.uuid4().hex[:8]}"
    with _pinned_shuffle(spark, 8):
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    out = spark.table(name)
    rows = out.collect()
    df = spark.createDataFrame(rows, out.schema)
    spark.catalog.dropTempView(name)
    return df


def incremental_corpus_stream(
    spark: SparkSession, demo_dir: str | None = None
) -> DataFrame:
    """Incremental corpus ingestion with exact dedup against the
    accumulated history — the streaming form of
    ``dedup.dedup_against_history``.

    The 100 TB/day ingestion contract: each micro-batch of arriving
    documents is (1) exact-deduped WITHIN the batch (min doc_id per
    content hash), then (2) deduped AGAINST the full history via the
    Bloom-prefiltered exact anti join, and (3) the survivors append to
    the history parquet — so the history only ever holds the first-seen
    copy of every distinct text, and each batch pays one Bloom build
    over the history (at scale: size the mask once and persist it; the
    operator's auto-sizing re-derives it per batch here for
    self-containment). ``foreachBatch`` is the right primitive because
    the sink transaction (read history -> filter -> append) is a batch
    job per trigger, not a continuous stateful operator — Spark's
    streaming dedup (``dropDuplicates``) keeps state on the driver/state
    store, while this keeps it IN THE SINK, which is what lets a
    restarted job resume from the parquet history alone.

    Deterministic three-batch demo (maxFilesPerTrigger=1, pinned
    mtimes): batch 1 carries an in-batch duplicate, batches 2-3 carry
    history duplicates and fresh texts. Returns the final history
    (doc_id, text) — first-seen ids 1, 2, 5, 8 only.
    """
    import json
    import os
    import tempfile

    from gene_level_metadata_pipeline_spark.operators.dedup import (
        dedup_against_history, dedup_exact,
    )

    d = demo_dir or tempfile.mkdtemp(prefix="inc_corpus_")
    src_dir = os.path.join(d, "incoming")
    hist_dir = os.path.join(d, "history")
    os.makedirs(src_dir, exist_ok=True)

    def write_batch(name: str, rows: list[tuple[int, str]], mtime: int) -> None:
        path = os.path.join(src_dir, name)
        if not os.path.exists(path):
            with open(path, "w") as f:
                for doc_id, text in rows:
                    f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        os.utime(path, (mtime, mtime))

    write_batch("batch_1.json", [
        (1, "alpha beta"),
        (2, "gamma delta"),
        (3, "alpha beta"),      # in-batch duplicate of 1: dropped in (1)
    ], mtime=1_700_000_000)
    write_batch("batch_2.json", [
        (4, "alpha beta"),      # history duplicate: dropped in (2)
        (5, "epsilon zeta"),
    ], mtime=1_700_000_600)
    write_batch("batch_3.json", [
        (6, "epsilon zeta"),    # history duplicate
        (7, "gamma delta"),     # history duplicate
        (8, "eta theta"),
    ], mtime=1_700_001_200)

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ])

    def ingest(batch_df: DataFrame, _bid: int) -> None:
        sp = batch_df.sparkSession
        # (1) in-batch exact dedup: keep the minimum id per content hash
        keep = dedup_exact(batch_df, "text", "doc_id").select(
            F.col("canonical_id").alias("doc_id")
        )
        batch = batch_df.join(F.broadcast(keep), "doc_id")
        # (2) against-history dedup (Bloom prefilter + exact confirm)
        if os.path.isdir(hist_dir) and any(
            f.endswith(".parquet") for f in os.listdir(hist_dir)
        ):
            hist = sp.read.parquet(hist_dir)
            batch = dedup_against_history(batch, hist, "text", "doc_id")
        # (3) survivors become history
        batch.write.mode("append").parquet(hist_dir)

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src_dir)
    )
    with _pinned_shuffle(spark, 8):
        q = (
            src.writeStream.foreachBatch(ingest)
            .option(
                "checkpointLocation", os.path.join(d, "_checkpoint")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    out = spark.read.parquet(hist_dir)
    rows = out.collect()
    return spark.createDataFrame(rows, out.schema)


def cdc_stream_apply(
    spark: SparkSession, demo_dir: str | None = None
) -> DataFrame:
    """Streaming CDC materialization: a snapshot table maintained in the
    sink, each micro-batch of change events applied with
    ``harmonize.cdc_apply`` (tombstones + multi-version latest-wins) and
    the result written as the next snapshot VERSION — the
    materialized-view-maintenance pattern (what Delta/Iceberg MERGE
    does per commit), with ``foreachBatch`` as the transaction
    boundary and ALL state in the sink: a restarted job resumes from
    the latest snapshot version + the source checkpoint alone.
    Versioned directories (never overwrite-in-place: the job reading
    snap_v{n} writes snap_v{n+1}) are the copy-on-write discipline.

    Deterministic three-batch demo (maxFilesPerTrigger=1, pinned
    mtimes): upsert + insert, then a tombstone + a re-upsert, then a
    delete-of-inserted + update + fresh insert. Final snapshot:
    {1: A3, 2: B, 4: d, 6: F} — key 3 tombstoned, key 5 inserted then
    deleted."""
    import json
    import os
    import re as _re
    import tempfile

    from gene_level_metadata_pipeline_spark.operators.harmonize import (
        cdc_apply,
    )

    d = demo_dir or tempfile.mkdtemp(prefix="cdc_stream_")
    src_dir = os.path.join(d, "changes")
    os.makedirs(src_dir, exist_ok=True)
    snap0 = os.path.join(d, "snap_v0")
    if not os.path.isdir(snap0):
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, val string"
        ).write.mode("overwrite").parquet(snap0)

    def write_batch(name: str, rows: list, mtime: int) -> None:
        path = os.path.join(src_dir, name)
        if not os.path.exists(path):
            with open(path, "w") as f:
                for k, val, version, op in rows:
                    f.write(json.dumps(
                        {"k": k, "val": val, "version": version, "op": op}
                    ) + "\n")
        os.utime(path, (mtime, mtime))

    write_batch("b1.json", [
        (2, "B", 1, "upsert"), (5, "E", 1, "upsert"),
    ], mtime=1_700_000_000)
    write_batch("b2.json", [
        (3, None, 2, "delete"), (5, "E2", 2, "upsert"),
    ], mtime=1_700_000_600)
    write_batch("b3.json", [
        (5, None, 3, "delete"), (1, "A3", 3, "upsert"), (6, "F", 1, "upsert"),
    ], mtime=1_700_001_200)

    from pyspark.sql.types import (
        IntegerType, LongType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("k", LongType()),
        StructField("val", StringType()),
        StructField("version", IntegerType()),
        StructField("op", StringType()),
    ])

    def latest_version() -> int:
        vs = [
            int(m.group(1))
            for f in os.listdir(d)
            if (m := _re.fullmatch(r"snap_v(\d+)", f))
        ]
        return max(vs)

    def apply_batch(batch_df: DataFrame, bid: int) -> None:
        sp = batch_df.sparkSession
        cur = latest_version()
        snap = sp.read.parquet(os.path.join(d, f"snap_v{cur}"))
        out = cdc_apply(snap, batch_df, "k")
        out.write.mode("overwrite").parquet(
            os.path.join(d, f"snap_v{cur + 1}")
        )

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src_dir)
    )
    with _pinned_shuffle(spark, 8):
        q = (
            src.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", os.path.join(d, "_checkpoint"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    out = spark.read.parquet(os.path.join(d, f"snap_v{latest_version()}"))
    rows = out.collect()
    return spark.createDataFrame(rows, out.schema)


def cms_stream_merge(
    spark: SparkSession, demo_dir: str | None = None
) -> DataFrame:
    """Streaming heavy-hitter sketch maintenance: each micro-batch of
    tokens becomes a count-min sketch (textanalysis.cms_sketch) and is
    MERGED BY ADDITION into the sink's running sketch — the property
    that makes CMS the streaming/distributed frequency sketch (executors
    sketch locally, merges are sums; here the foreachBatch commit is the
    merge boundary, copy-on-write sketch versions like cdc_stream_apply).

    Restart safety is BY BATCH ID, not latest-version+1: foreachBatch
    is at-least-once, and CMS addition — unlike cdc_apply — is NOT
    idempotent, so a batch replayed after its snapshot write committed
    but before the streaming checkpoint commit must OVERWRITE its own
    snapshot (cms_v{bid}, merged from the max version < bid), never
    re-add into a newer one. The round-6 advisor caught the original
    latest()+1 scheme double-adding in exactly that crash window;
    tests/test_streaming_foreachbatch.py pins the replay.

    Deterministic three-batch demo; the returned frame certifies, per
    distinct word, against the exact union counts:
      * never_underestimates — est >= true, CMS's deterministic
        one-sided guarantee, SURVIVES merging;
      * within_eps — est <= true + 8N/width + 1 (Markov at k=8,
        depth 4);
      * merge_exact — the merged sketch's estimate EQUALS the estimate
        from a sketch built over the concatenated batches in one shot:
        additivity certified end-to-end, not assumed.
    """
    import os
    import re as _re
    import tempfile

    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        cms_lookup,
        cms_merge,
        cms_sketch,
    )

    width, depth = 256, 4
    d = demo_dir or tempfile.mkdtemp(prefix="cms_stream_")
    src_dir = os.path.join(d, "tokens")
    os.makedirs(src_dir, exist_ok=True)

    batches = {
        "b1.txt": ["apple"] * 3 + ["banana"] * 2 + ["cherry"],
        "b2.txt": ["apple"] * 2 + ["durian"] * 4,
        "b3.txt": ["banana"] + ["cherry"] * 2 + ["elderberry"] * 5
                  + ["apple"],
    }
    for i, (name, words) in enumerate(sorted(batches.items())):
        path = os.path.join(src_dir, name)
        if not os.path.exists(path):
            with open(path, "w") as f:
                f.write("\n".join(words) + "\n")
        mt = 1_700_000_000 + i * 600
        os.utime(path, (mt, mt))

    def versions() -> list[int]:
        return sorted(
            int(m.group(1))
            for f in os.listdir(d)
            if (m := _re.fullmatch(r"cms_v(\d+)", f))
        )

    def latest_version() -> int:
        vs = versions()
        return vs[-1] if vs else -1

    def sketch_of(df: DataFrame) -> DataFrame:
        wc = df.groupBy(F.col("value").alias("word")).agg(
            F.count(F.lit(1)).alias("n")
        )
        return cms_sketch(wc, width=width, depth=depth)

    def apply_batch(batch_df: DataFrame, bid: int) -> None:
        sp = batch_df.sparkSession
        # Snapshot keyed by BATCH ID: a replayed batch (at-least-once
        # foreachBatch) merges from the same predecessor (max version
        # strictly below bid) and OVERWRITES cms_v{bid} — byte-identical
        # rewrite instead of a non-idempotent double-add.
        prevs = [v for v in versions() if v < bid]
        batch_sketch = sketch_of(batch_df)
        if not prevs:
            merged = batch_sketch
        else:
            prev = sp.read.parquet(os.path.join(d, f"cms_v{prevs[-1]}"))
            merged = cms_merge(prev, batch_sketch)
        merged.write.mode("overwrite").parquet(
            os.path.join(d, f"cms_v{bid}")
        )

    src = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(src_dir)
    )
    with _pinned_shuffle(spark, 8):
        q = (
            src.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", os.path.join(d, "_checkpoint"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    merged = spark.read.parquet(os.path.join(d, f"cms_v{latest_version()}"))
    allw = spark.read.format("text").load(src_dir)
    exact = allw.groupBy(F.col("value").alias("word")).agg(
        F.count(F.lit(1)).alias("exact_n")
    )
    one_shot = cms_sketch(exact.select("word", F.col("exact_n").alias("n")),
                          width=width, depth=depth)
    est_m = cms_lookup(exact.select("word"), merged, width=width, depth=depth)
    est_o = (
        cms_lookup(exact.select("word"), one_shot, width=width, depth=depth)
        .withColumnRenamed("est", "est_once")
    )
    total = exact.agg(F.sum("exact_n").alias("big_n"))
    out = (
        exact.join(est_m, "word").join(est_o, "word")
        .crossJoin(F.broadcast(total))
        .select(
            "word", "exact_n",
            (F.col("est") >= F.col("exact_n")).alias("never_underestimates"),
            (
                F.col("est")
                <= F.col("exact_n") + (F.col("big_n") * 8) / width + 1
            ).alias("within_eps"),
            (F.col("est") == F.col("est_once")).alias("merge_exact"),
        )
    )
    rows = out.collect()
    return spark.createDataFrame(rows, out.schema)


def ivm_stream_join(
    spark: SparkSession, demo_dir: str | None = None
) -> DataFrame:
    """STREAMING incremental view maintenance of a JOIN view — the
    foreachBatch completion of ``cdc.join_view_delta``: a per-priority
    (row count, revenue) view over A ⋈ B is kept materialized in the
    sink while signed A-side deltas stream in; each micro-batch joins
    ONLY the delta against the static B side (ΔA ⋈ B — the base join
    never re-runs), aggregates with signs, and retract-merges into the
    next view version.

    Restart safety is BY BATCH ID (the cms_stream_merge discipline,
    NOT cdc_stream_apply's latest()+1): a signed merge is additive and
    therefore NOT idempotent, so a batch replayed after its snapshot
    write but before the checkpoint commit must overwrite its OWN
    version (view_v{bid+1}, merged from the max version < bid+1),
    never re-add into a newer one.
    tests/test_streaming_foreachbatch.py pins the kill-between-commit
    replay.

    Deterministic three-batch demo: inserts into both groups, a
    delete that retracts a 2-row order, and a delete + an insert whose
    key has no B rows (a join-empty delta). Final view:
    HIGH (2 rows, 800 cents), LOW (1 row, 400 cents).
    """
    import json
    import os
    import re as _re
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        IntegerType, LongType, StringType, StructField, StructType,
    )

    d = demo_dir or tempfile.mkdtemp(prefix="ivm_stream_")
    src_dir = os.path.join(d, "deltas")
    os.makedirs(src_dir, exist_ok=True)
    b_dir = os.path.join(d, "base_b")
    if not os.path.isdir(b_dir):
        spark.createDataFrame(
            [(1, 100), (1, 50), (2, 200), (3, 300), (4, 400), (5, 500)],
            "k long, cents long",
        ).write.mode("overwrite").parquet(b_dir)
    v0 = os.path.join(d, "view_v0")
    if not os.path.isdir(v0):
        a_old = spark.createDataFrame(
            [(1, "HIGH"), (2, "LOW"), (3, "HIGH")], "k long, prio string"
        )
        b = spark.read.parquet(b_dir)
        a_old.join(b, "k").groupBy("prio").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("cents").cast("bigint").alias("cents_total"),
        ).write.mode("overwrite").parquet(v0)

    def write_batch(name: str, rows: list, mtime: int) -> None:
        path = os.path.join(src_dir, name)
        if not os.path.exists(path):
            with open(path, "w") as f:
                for k, prio, sign in rows:
                    f.write(json.dumps(
                        {"k": k, "prio": prio, "sign": sign}
                    ) + "\n")
        os.utime(path, (mtime, mtime))

    write_batch("b1.json", [(4, "LOW", 1), (5, "HIGH", 1)],
                mtime=1_700_000_000)
    write_batch("b2.json", [(1, "HIGH", -1)], mtime=1_700_000_600)
    write_batch("b3.json", [(2, "LOW", -1), (6, "LOW", 1)],
                mtime=1_700_001_200)

    schema = StructType([
        StructField("k", LongType()),
        StructField("prio", StringType()),
        StructField("sign", IntegerType()),
    ])

    def versions() -> list:
        return sorted(
            int(m.group(1))
            for f in os.listdir(d)
            if (m := _re.fullmatch(r"view_v(\d+)", f))
        )

    def apply_batch(batch_df: DataFrame, bid: int) -> None:
        sp = batch_df.sparkSession
        target = bid + 1
        prev = max(v for v in versions() if v < target)
        view = sp.read.parquet(os.path.join(d, f"view_v{prev}"))
        b = sp.read.parquet(b_dir)
        delta = (
            batch_df.join(b, "k")
            .groupBy("prio")
            .agg(
                F.sum("sign").cast("bigint").alias("n_rows"),
                F.sum(F.col("sign") * F.col("cents")).cast("bigint")
                .alias("cents_total"),
            )
        )
        merged = (
            view.unionByName(delta)
            .groupBy("prio")
            .agg(
                F.sum("n_rows").cast("bigint").alias("n_rows"),
                F.sum("cents_total").cast("bigint").alias("cents_total"),
            )
            .where(F.col("n_rows") > 0)
        )
        merged.write.mode("overwrite").parquet(
            os.path.join(d, f"view_v{target}")
        )

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src_dir)
    )
    with _pinned_shuffle(spark, 8):
        q = (
            src.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", os.path.join(d, "_checkpoint"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    out = spark.read.parquet(os.path.join(d, f"view_v{max(versions())}"))
    rows = out.collect()
    return spark.createDataFrame(rows, out.schema)
