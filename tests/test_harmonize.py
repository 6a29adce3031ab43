"""Spine/harmonize invariants (SURVEY.md §5 item 3).

For any source x, harmonize(spine, x, key) must satisfy:
  (a) distinct(output.key) == spine keyset,
  (b) every non-spine column is NULL for keys absent from x,
  (c) no duplicate full rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gene_level_metadata_pipeline_spark.operators.harmonize import harmonize, spine


def _frames(spark):
    master = spark.createDataFrame(
        [("A",), ("B",), ("C",), (None,), ("A",)], ["symbol"]
    )
    src = spark.createDataFrame(
        [("A", "x1"), ("A", "x2"), ("B", "y"), ("B", "y"), ("Z", "z")],
        ["symbol", "val"],
    )
    return master, src


def test_spine_distinct_nonnull(spark):
    master, _ = _frames(spark)
    got = sorted(r[0] for r in spine(master, "symbol").collect())
    assert got == ["A", "B", "C"]


def test_harmonize_keyset_preserved(spark):
    master, src = _frames(spark)
    out = harmonize(spine(master, "symbol"), src, "symbol")
    keys = sorted({r["symbol"] for r in out.collect()})
    assert keys == ["A", "B", "C"]  # Z (not in spine) dropped; C kept


def test_harmonize_null_pad_and_fanout(spark):
    master, src = _frames(spark)
    rows = harmonize(spine(master, "symbol"), src, "symbol").collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["symbol"], []).append(r["val"])
    assert sorted(by_key["A"]) == ["x1", "x2"]  # fan-out preserved
    assert by_key["B"] == ["y"]  # source dups collapsed by distinct()
    assert by_key["C"] == [None]  # NULL-padded absent key


def test_harmonize_no_dup_rows(spark):
    master, src = _frames(spark)
    out = harmonize(spine(master, "symbol"), src, "symbol")
    assert out.count() == out.dropDuplicates().count()


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert "c_custkey" in df.columns


def test_upsert_semantics(spark):
    from gene_level_metadata_pipeline_spark.operators.harmonize import upsert

    cur = spark.createDataFrame([("A", 1), ("B", 2), ("C", 3)], ["k", "v"])
    upd = spark.createDataFrame([("B", 20), ("D", 40)], ["k", "v"])
    rows = {(r["k"], r["v"]) for r in upsert(cur, upd, "k").collect()}
    assert rows == {("A", 1), ("B", 20), ("C", 3), ("D", 40)}
