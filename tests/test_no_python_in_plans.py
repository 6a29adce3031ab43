"""Automated guarantee behind COVERAGE.md's claim: no Python evaluation
nodes in any relational query plan (SURVEY §2.11 stance). The only
Python-on-executor paths are the explicitly Arrow-batched ones."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

# queries that EXECUTE on construction (streaming runs / driver-side file
# fixups) or that intentionally use Arrow-batched Python
EXECUTING = {
    "streaming_events_hourly", "streaming_late_data", "streaming_sessionize",
    "streaming_stream_join", "streaming_outer_join", "streaming_dedup",
    "streaming_dedup_watermark", "streaming_static_enrich",
    "streaming_pages_source",
}
ARROW_PYTHON_OK = {
    "applyinpandas_normalize", "multimodal_features", "cogroup_asof_join",
    # r7: REAL stdlib WAV decoder inside the Arrow stage — the payload
    # is Catalyst-built, only the codec runs in Python (by necessity)
    "audio_wav_decode",
    # r7 sitting 2: same discipline for the stdlib BMP raster decoder
    "image_bmp_decode",
    # r8: stdlib zlib PNG decoder (chunk CRCs + scanline un-filtering)
    "image_png_decode",
    # r9: stdlib baseline JPEG decoder + the MJPEG/AVI chunk walker
    # that reuses it — Catalyst-built payloads, codec-only Python
    "image_jpeg_decode",
    "video_mjpeg_frames",
    # r10: the blocked-BLAS RBH tier IS a numpy matmul stage by design
    # (dense scoring belongs in BLAS); packing/merge stay relational
    "rbh_blocked_mutual_nn",
}
# Python DATA SOURCES are intentional executor-side Python (ingestion,
# not relational compute) — allowed, asserted positively
PYTHON_SOURCE_OK = {"custom_datasource_pages"}


def test_no_eval_python_nodes(spark):
    from gene_level_metadata_pipeline_spark.plans import driver_queries as dq

    offenders = []
    for name, fn in dq.QUERIES.items():
        if name in EXECUTING:
            continue
        df = fn(spark, SF)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        has_python = any(
            k in plan
            for k in ("Python", "InPandas", "ArrowEval")
        )  # PythonUDF / MapInPandas / FlatMapGroupsInPandas
        if name in PYTHON_SOURCE_OK:
            # python sources appear as a plain RelationV2 named after the
            # source — no relational Python nodes to flag
            assert "genepages" in plan
        elif name in ARROW_PYTHON_OK:
            assert has_python, f"{name} expected an Arrow-batched Python node"
        elif has_python:
            offenders.append(name)
    assert not offenders, f"Python nodes leaked into: {offenders}"
