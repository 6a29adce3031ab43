"""Join strategy hints: each hint must surface as its physical operator.

At 100 TB the optimizer's size estimates are sometimes wrong (fresh
tables without stats, post-filter selectivity, exploded arrays); hints
are the user's override. This pins the full mapping so a Spark upgrade
that silently ignores a hint (HintErrorLogger only WARNs — PLANS.md
lesson 1) fails loudly here instead of in production plans.

mapInArrow: the lowest-overhead executor-side Python path (raw Arrow
RecordBatches, no pandas conversion) — certified against the same
result computed relationally.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def _executed(df) -> str:
    df.count()
    return df._jdf.queryExecution().executedPlan().toString()


def _sides(spark):
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet").select(
        "l_suppkey", "l_extendedprice"
    )
    su = spark.read.parquet(f"{SF_ORACLE}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    return li, su


def test_broadcast_hint(spark):
    li, su = _sides(spark)
    plan = _executed(li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey))
    assert "BroadcastHashJoin" in plan


def test_merge_hint(spark):
    li, su = _sides(spark)
    plan = _executed(li.join(su.hint("merge"), li.l_suppkey == su.s_suppkey))
    assert "SortMergeJoin" in plan


def test_shuffle_hash_hint(spark):
    li, su = _sides(spark)
    plan = _executed(li.join(su.hint("shuffle_hash"), li.l_suppkey == su.s_suppkey))
    assert "ShuffledHashJoin" in plan


def test_shuffle_replicate_nl_hint(spark):
    li, su = _sides(spark)
    # cross join: replicate-NL is the only legal strategy the hint can pick
    plan = _executed(
        li.limit(100).join(su.hint("shuffle_replicate_nl").limit(10))
    )
    assert "CartesianProduct" in plan


def test_hint_on_wrong_side_of_outer_join_is_dropped(spark):
    """PLANS.md lesson 1, pinned: broadcasting the PRESERVED side of a
    left join is semantically impossible — Spark drops the hint and
    plans a non-broadcast join. The engine's harmonize broadcasts the
    key-collapsed source side instead."""
    li, su = _sides(spark)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _executed(
            F.broadcast(su).join(li, li.l_suppkey == su.s_suppkey, "left")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # hint dropped AND auto-broadcast off → no broadcast anywhere
    assert "BroadcastHashJoin" not in plan and "SortMergeJoin" in plan


def test_map_in_arrow_matches_relational(spark):
    import pyarrow as pa

    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet").select(
        "l_suppkey", "l_quantity"
    )

    def double_qty(batches):
        for b in batches:
            t = pa.Table.from_batches([b])
            yield pa.RecordBatch.from_arrays(
                [t.column("l_suppkey").combine_chunks(),
                 pa.compute.multiply(t.column("l_quantity").combine_chunks(), 2.0)],
                names=["l_suppkey", "qty2"],
            )

    arrow = (
        li.mapInArrow(double_qty, schema="l_suppkey bigint, qty2 double")
        .groupBy("l_suppkey").agg(F.sum("qty2").alias("s"))
    )
    rel = li.groupBy("l_suppkey").agg(F.sum(F.col("l_quantity") * 2.0).alias("s"))
    a = {r.l_suppkey: round(r.s, 6) for r in arrow.collect()}
    b = {r.l_suppkey: round(r.s, 6) for r in rel.collect()}
    assert a == b
