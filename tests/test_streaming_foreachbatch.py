"""foreachBatch incremental state maintenance: a streaming source merged
micro-batch-by-micro-batch into a keyed parquet state — the silver-zone
refresh pattern (streaming complement of operators/harmonize.upsert).

The merge keeps the max-version row per key, so the final state is
independent of micro-batch arrival order (no reliance on file mtime
ordering) while still exercising one foreachBatch invocation per file
(maxFilesPerTrigger=1 + availableNow).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

SCHEMA = "k int, v string, ver int"


def _merge_fn(spark, state_dir):
    def merge(batch_df, batch_id):
        versions = sorted(
            glob.glob(os.path.join(state_dir, "v*")),
            key=lambda p: int(os.path.basename(p)[1:]),
        )
        if versions:
            prev = batch_df.sparkSession.read.parquet(versions[-1])
            allr = prev.unionByName(batch_df)
        else:
            allr = batch_df
        merged = (
            allr.groupBy("k")
            .agg(F.max_by(F.struct("v", "ver"), "ver").alias("s"))
            .select("k", "s.v", "s.ver")
        )
        merged.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v{batch_id}")
        )

    return merge


def test_foreachbatch_incremental_merge(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    os.makedirs(state)
    batches = [
        [(1, "a", 1), (2, "b", 1)],
        [(2, "B", 2), (3, "c", 2)],
        [(1, "A", 3)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            f"{src}/b{i}"
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    q = (
        stream.writeStream.foreachBatch(_merge_fn(spark, state))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    versions = sorted(
        glob.glob(os.path.join(state, "v*")),
        key=lambda p: int(os.path.basename(p)[1:]),
    )
    assert len(versions) >= 1
    final = {
        r.k: (r.v, r.ver)
        for r in spark.read.parquet(versions[-1]).collect()
    }
    assert final == {1: ("A", 3), 2: ("B", 2), 3: ("c", 2)}


def test_incremental_corpus_stream_restart_resumes_from_history(spark, tmp_path):
    """The sink-state claim, tested directly: run the 3-batch demo, then
    START A SECOND STREAM over the same directory with one more batch
    containing a duplicate of a batch-1 text and a fresh text. The new
    stream has no memory of the first — only the parquet history — and
    must still drop the duplicate and admit the fresh text."""
    import json
    import os

    from gene_level_metadata_pipeline_spark.streaming.windows import (
        incremental_corpus_stream,
    )

    d = str(tmp_path / "demo")
    out1 = {(r["doc_id"], r["text"])
            for r in incremental_corpus_stream(spark, demo_dir=d).collect()}
    assert out1 == {(1, "alpha beta"), (2, "gamma delta"),
                    (5, "epsilon zeta"), (8, "eta theta")}

    # simulate a restart: new batch file arrives, stream runs again from
    # the same checkpoint + history
    path = os.path.join(d, "incoming", "batch_4.json")
    with open(path, "w") as f:
        f.write(json.dumps({"doc_id": 9, "text": "alpha beta"}) + "\n")
        f.write(json.dumps({"doc_id": 10, "text": "iota kappa"}) + "\n")
    os.utime(path, (1_700_001_800, 1_700_001_800))
    out2 = {(r["doc_id"], r["text"])
            for r in incremental_corpus_stream(spark, demo_dir=d).collect()}
    assert out2 == out1 | {(10, "iota kappa")}


def test_cdc_stream_apply_restart_resumes_from_latest_snapshot(spark, tmp_path):
    """Run the CDC stream once, then run it AGAIN over the same demo dir:
    the checkpoint replays nothing, the latest snapshot version is
    reread, and the final table is unchanged — the restart-safety
    contract (state lives in the sink + checkpoint, not the driver)."""
    from gene_level_metadata_pipeline_spark.streaming.windows import (
        cdc_stream_apply,
    )

    d = str(tmp_path / "cdc_demo")
    first = {(r["k"], r["val"]) for r in cdc_stream_apply(spark, d).collect()}
    second = {(r["k"], r["val"]) for r in cdc_stream_apply(spark, d).collect()}
    assert first == second == {(1, "A3"), (2, "B"), (4, "d"), (6, "F")}


def test_cdc_stream_replayed_batch_cannot_double_apply(spark, tmp_path):
    """Kill-between-commit idempotency (VERDICT r5 task 6): crash AFTER
    the foreachBatch sink wrote snap_v{n+1} but BEFORE the streaming
    checkpoint committed the batch. Simulated faithfully through the
    engine: run to completion, delete the NEWEST checkpoint commit
    marker (offsets log keeps its entry — exactly the crash window),
    restart. Structured Streaming re-executes the last micro-batch with
    identical offsets against the ALREADY-UPDATED latest snapshot; the
    copy-on-write discipline writes a new version, and idempotency of
    cdc_apply (apply(apply(S,C),C) == apply(S,C): the same winners
    replace the same keys, deletes stay deleted) must make it
    value-identical — the replay cannot double-apply."""
    import os

    from gene_level_metadata_pipeline_spark.streaming.windows import (
        cdc_stream_apply,
    )

    d = str(tmp_path / "cdc_crash")
    final = {(r["k"], r["val"]) for r in cdc_stream_apply(spark, d).collect()}
    assert final == {(1, "A3"), (2, "B"), (4, "d"), (6, "F")}
    versions_before = sorted(
        f for f in os.listdir(d) if f.startswith("snap_v")
    )

    commits_dir = os.path.join(d, "_checkpoint", "commits")
    commits = sorted(
        (f for f in os.listdir(commits_dir) if f.isdigit()), key=int
    )
    assert len(commits) == 3  # three micro-batches ran
    # crash window: the commit marker never landed — on the local
    # ChecksumFileSystem that means neither the file nor its .crc sidecar
    os.remove(os.path.join(commits_dir, commits[-1]))
    crc = os.path.join(commits_dir, f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    replayed = {
        (r["k"], r["val"]) for r in cdc_stream_apply(spark, d).collect()
    }
    versions_after = sorted(
        f for f in os.listdir(d) if f.startswith("snap_v")
    )
    # the replay really ran: a NEW snapshot version was written...
    assert len(versions_after) == len(versions_before) + 1
    # ...and the commit marker is back (the batch re-committed)
    assert sorted(
        (f for f in os.listdir(commits_dir) if f.isdigit()), key=int
    ) == commits
    # ...but the table is value-identical: no double-apply
    assert replayed == final


def test_cms_stream_replayed_batch_cannot_double_add(spark, tmp_path):
    """Kill-between-commit for the CMS stream (round-6 advisor): CMS
    merge is ADDITION, which is NOT idempotent, so the latest()+1
    versioning that cdc_stream_apply gets away with would double-add a
    batch replayed after its snapshot write but before the checkpoint
    commit. The fix keys snapshots by batch id (cms_v{bid}, merged from
    the max version < bid), so the replay overwrites its own snapshot
    byte-for-byte. Simulated through the engine: run to completion,
    delete the newest checkpoint commit marker, restart."""
    import os

    from gene_level_metadata_pipeline_spark.streaming.windows import (
        cms_stream_merge,
    )

    d = str(tmp_path / "cms_crash")
    final = {
        (r["word"], r["exact_n"], r["never_underestimates"],
         r["merge_exact"])
        for r in cms_stream_merge(spark, d).collect()
    }
    assert all(ok for _, _, ok, _ in final)
    assert all(me for _, _, _, me in final)
    versions_before = sorted(
        f for f in os.listdir(d) if f.startswith("cms_v")
    )

    commits_dir = os.path.join(d, "_checkpoint", "commits")
    commits = sorted(
        (f for f in os.listdir(commits_dir) if f.isdigit()), key=int
    )
    assert len(commits) == 3
    os.remove(os.path.join(commits_dir, commits[-1]))
    crc = os.path.join(commits_dir, f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    replayed = {
        (r["word"], r["exact_n"], r["never_underestimates"],
         r["merge_exact"])
        for r in cms_stream_merge(spark, d).collect()
    }
    versions_after = sorted(
        f for f in os.listdir(d) if f.startswith("cms_v")
    )
    # the replay overwrote cms_v{bid} in place: NO new version appears
    assert versions_after == versions_before
    # the commit marker is back (the batch re-committed)
    assert sorted(
        (f for f in os.listdir(commits_dir) if f.isdigit()), key=int
    ) == commits
    # and every estimate is value-identical: no double-add
    assert replayed == final


def test_cms_bucket_rejects_unsupported_width(spark):
    """_cms_bucket draws from 256 distinct md5 values; widths that do
    not divide 256 (or exceed it) must fail loud, not silently bias or
    empty buckets (round-6 advisor)."""
    import pytest

    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        cms_sketch,
    )

    wc = spark.createDataFrame([("a", 1)], "word string, n bigint")
    for bad in (0, -8, 257, 512, 100, 3):
        with pytest.raises(ValueError, match="divisor of 256"):
            cms_sketch(wc, width=bad, depth=2)
    # supported widths still build
    for ok in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        assert cms_sketch(wc, width=ok, depth=1).count() >= 1


def test_ivm_stream_replayed_batch_cannot_double_merge(spark, tmp_path):
    """Kill-between-commit for the streaming join-view: the signed
    retract-merge is additive (not idempotent), so versions key by
    batch id — a replayed batch overwrites view_v{bid+1} built from
    the max version below it, never re-merges into a newer one."""
    import os

    from gene_level_metadata_pipeline_spark.streaming.windows import (
        ivm_stream_join,
    )

    d = str(tmp_path / "ivm_crash")
    final = {
        (r["prio"], r["n_rows"], r["cents_total"])
        for r in ivm_stream_join(spark, d).collect()
    }
    assert final == {("HIGH", 2, 800), ("LOW", 1, 400)}
    versions_before = sorted(
        f for f in os.listdir(d) if f.startswith("view_v")
    )

    commits_dir = os.path.join(d, "_checkpoint", "commits")
    commits = sorted(
        (f for f in os.listdir(commits_dir) if f.isdigit()), key=int
    )
    assert len(commits) == 3
    os.remove(os.path.join(commits_dir, commits[-1]))
    crc = os.path.join(commits_dir, f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    replayed = {
        (r["prio"], r["n_rows"], r["cents_total"])
        for r in ivm_stream_join(spark, d).collect()
    }
    versions_after = sorted(
        f for f in os.listdir(d) if f.startswith("view_v")
    )
    assert versions_after == versions_before
    assert replayed == final
