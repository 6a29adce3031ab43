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
