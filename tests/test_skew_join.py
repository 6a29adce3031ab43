"""salted_join: bit-identical to the plain join, and physically spread.

The salt only changes WHERE rows meet (which reducer), never WHICH rows
match — asserted by exact multiset equality against the unsalted join.
The physical assertion pins the mechanism: with broadcast disabled the
salted plan sort-merge-joins on BOTH (key, salt) — a hot key hashes to
``salt_buckets`` different reducers instead of one.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def _rows(df):
    return Counter(tuple(r) for r in df.collect())


def test_salted_join_equals_plain_join(spark):
    from gene_level_metadata_pipeline_spark.operators.skew import salted_join

    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet").select(
        "l_suppkey", "l_extendedprice"
    )
    su = spark.read.parquet(f"{SF_ORACLE}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    plain = li.join(su, li.l_suppkey == su.s_suppkey)
    salted = salted_join(li, su, "l_suppkey", "s_suppkey", salt_buckets=8)
    assert _rows(salted) == _rows(plain)


def test_salted_join_shuffles_on_key_and_salt(spark):
    from gene_level_metadata_pipeline_spark.operators.skew import salted_join

    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet").select(
        "l_suppkey", "l_extendedprice"
    )
    su = spark.read.parquet(f"{SF_ORACLE}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = salted_join(li, su, "l_suppkey", "s_suppkey", salt_buckets=8)
        j.count()
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # join condition carries the salt (both sides keyed on key AND salt)
    assert "__salt" in plan and "SortMergeJoin" in plan


def test_quantize_error_bound(spark):
    """|x - q*scale| <= scale/2 element-wise, and q stays in int8 range."""
    from gene_level_metadata_pipeline_spark.operators.similarity import (
        quantize_embeddings,
    )

    d = quantize_embeddings(
        spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    )
    bad = d.select(
        F.size(
            F.filter(
                F.zip_with(
                    F.transform("embedding", lambda x: x.cast("double")),
                    F.transform("q_vec", lambda q: q * F.col("q_scale")),
                    lambda x, r: F.abs(x - r),
                ),
                lambda e: e > F.col("q_scale") / 2 + 1e-15,
            )
        ).alias("n_violations"),
        F.array_max(F.transform("q_vec", F.abs)).alias("qmax"),
    )
    agg = bad.agg(
        F.sum("n_violations").alias("v"), F.max("qmax").alias("m")
    ).collect()[0]
    assert agg.v == 0
    assert agg.m <= 127


def test_skew_split_confs_pairing(spark):
    """The measured engagement rule (r5 skew stress): threshold rides at
    4x advisory, skew split on, and the pair round-trips through
    spark.conf cleanly."""
    from gene_level_metadata_pipeline_spark.operators.skew import (
        skew_split_confs,
    )

    confs = skew_split_confs(16 * 1024 * 1024)
    assert confs["spark.sql.adaptive.skewJoin.enabled"] == "true"
    adv = int(confs["spark.sql.adaptive.advisoryPartitionSizeInBytes"])
    thr = int(
        confs[
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        ]
    )
    assert (adv, thr) == (16 * 1024 * 1024, 64 * 1024 * 1024)
    before = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    for k, v in confs.items():
        assert spark.conf.get(k) == v
    for k, v in before.items():
        spark.conf.set(k, v)
