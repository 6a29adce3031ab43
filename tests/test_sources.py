"""Ingest loop + bronze writer tests (SURVEY.md §2.2 K1/K4, §2.13 E1)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from gene_level_metadata_pipeline_spark.sources.sinks import ingest_sources, write_bronze


def test_ingest_isolates_failures_and_reports(spark):
    root = tempfile.mkdtemp(prefix="bronze_")
    logs: list[str] = []

    def good():
        return spark.range(5).withColumn("v", F.col("id") * 2)

    def bad():
        raise RuntimeError("boom: upstream 503")

    errors = ingest_sources({"good_src": good, "bad_src": bad}, root, log=logs.append)

    assert set(errors) == {"bad_src"}
    assert "RuntimeError" in errors["bad_src"]
    # the good source landed as readable parquet despite the failure
    back = spark.read.parquet(f"{root}/good_src")
    assert back.count() == 5
    assert any("1 of 2 sources failed" in m for m in logs)


def test_write_bronze_partitioned(spark):
    root = tempfile.mkdtemp(prefix="bronze_")
    df = spark.createDataFrame(
        [("r1", "a"), ("r2", "a"), ("r3", "b")], ["id", "release"]
    )
    path = write_bronze(df, root, "src", partition_by=["release"])
    back = spark.read.parquet(path)
    assert back.count() == 3
    # partition pruning works on the layout
    pruned = back.where(F.col("release") == "a")
    assert pruned.count() == 2


def test_read_excel_by_name_and_startrow(spark):
    from gene_level_metadata_pipeline_spark.plans.fixtures import fixture_dir
    from gene_level_metadata_pipeline_spark.sources.readers import read_excel
    from gene_level_metadata_pipeline_spark.sources.xlsx import sheet_names

    path = f"{fixture_dir()}/workbook.xlsx"
    assert sheet_names(path) == ["Scores", "Meta"]
    # sheet by name with startRow skipping the banner (IM:13 startRow=2)
    meta = read_excel(spark, path, sheet="Meta", skip=1)
    rows = [tuple(r) for r in meta.collect()]
    assert meta.columns == ["key", "val"]
    assert rows == [("k1", 10.0)]  # numerics uniformly double
