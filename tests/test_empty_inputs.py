"""Empty-input behavior of the graph/dedup family.

A batch with ZERO near-duplicate pairs is a normal production outcome (a
clean corpus), not an edge case: `connected_components` previously spun
``max_iter`` eager-checkpoint rounds and raised (sum over an empty frame
observes NULL, which never compared equal to 0), and `pagerank` divided
the initial mass by a zero node count. Both must return empty frames
with the contract schema instead.
"""

from __future__ import annotations


def _empty_pairs(spark):
    return spark.createDataFrame([], "doc_a bigint, doc_b bigint")


def test_connected_components_empty_pairs(spark):
    from gene_level_metadata_pipeline_spark.operators.graph import (
        connected_components,
    )

    out = connected_components(_empty_pairs(spark))
    assert out.columns == ["doc_id", "component"]
    assert out.count() == 0


def test_pagerank_empty_graph(spark):
    from gene_level_metadata_pipeline_spark.operators.graph import pagerank

    out = pagerank(_empty_pairs(spark), src="doc_a", dst="doc_b")
    assert out.columns == ["node", "pr"]
    assert out.count() == 0


def test_canonicalize_with_no_duplicates(spark):
    """Zero pairs → every document is its own canonical representative."""
    from pyspark.sql import functions as F

    from gene_level_metadata_pipeline_spark.operators.graph import (
        canonicalize_duplicates,
    )

    docs = spark.range(5).select(F.col("id").alias("doc_id"))
    out = canonicalize_duplicates(docs, _empty_pairs(spark)).collect()
    assert sorted((r.doc_id, r.canonical_id) for r in out) == [
        (i, i) for i in range(5)
    ]


def test_near_dup_pairs_empty_docs(spark):
    from gene_level_metadata_pipeline_spark.operators.dedup import (
        near_dup_pairs,
    )

    docs = spark.createDataFrame([], "doc_id bigint, text string")
    out = near_dup_pairs(docs, "text", "doc_id")
    assert out.count() == 0


def test_gaps_islands_empty_and_all_null_ts(spark):
    from gene_level_metadata_pipeline_spark.operators.timeseries import (
        gaps_islands,
    )

    empty = spark.createDataFrame([], "user_id bigint, ts timestamp")
    out = gaps_islands(empty, "user_id", "ts", 3_600_000_000)
    assert out.columns == ["key", "island_start_us", "island_len"]
    assert out.count() == 0
    # all-NULL timestamps behave like empty, not like one giant island
    nulls = spark.createDataFrame(
        [(1, None), (2, None)], "user_id bigint, ts timestamp"
    )
    assert gaps_islands(nulls, "user_id", "ts", 3_600_000_000).count() == 0


def test_ols_trend_empty_input(spark):
    from pyspark.sql import functions as F

    from gene_level_metadata_pipeline_spark.operators.timeseries import (
        ols_trend,
    )

    empty = spark.createDataFrame([], "g string, x bigint, y bigint")
    out = ols_trend(
        empty.withColumn("y", F.col("y").cast("decimal(18,0)")),
        "g", "x", "y",
    )
    assert out.count() == 0
    assert {"slope_raw", "intercept_raw", "r2_raw"} <= set(out.columns)
