"""Hand-checked goldens for the round-5 audit/analytics additions:
k-anonymity, FD violations, Benford digits, group entropy, exact EWMA,
and BFS hops."""

import math

import pytest
from pyspark.sql import functions as F

from gene_level_metadata_pipeline_spark.operators.graph import bfs_hops
from gene_level_metadata_pipeline_spark.operators.quality import (
    benford_first_digit,
    fd_violations,
    group_entropy,
    k_anonymity,
)
from gene_level_metadata_pipeline_spark.operators.timeseries import ewma_smooth


# ---------------------------------------------------------------- k-anonymity

def test_k_anonymity_flags_small_classes_and_null_qi(spark):
    df = spark.createDataFrame(
        [("US", "A"), ("US", "A"), ("US", "A"), ("US", "B"), (None, "A")],
        ["country", "seg"],
    )
    out = k_anonymity(df, ["country", "seg"], 3)
    got = {(r.country, r.seg): r.class_size for r in out.collect()}
    # (US, A) has 3 members -> safe at k=3; the singletons are flagged,
    # including the NULL-country class (NULL is attacker-visible)
    assert got == {("US", "B"): 1, (None, "A"): 1}


def test_k_anonymity_rejects_bad_args(spark):
    df = spark.createDataFrame([("a",)], ["x"])
    with pytest.raises(ValueError):
        k_anonymity(df, [], 5)
    with pytest.raises(ValueError):
        k_anonymity(df, ["x"], 1)


# ------------------------------------------------------------- FD violations

def test_fd_violations_witnesses_and_null_dependent(spark):
    df = spark.createDataFrame(
        [("b1", "t1"), ("b1", "t2"), ("b1", "t2"), ("b2", "t3"),
         ("b2", None), ("b3", None)],
        ["brand", "typ"],
    )
    out = fd_violations(df, "brand", "typ")
    rows = {r.brand: (r.n_dependent, r.dep_lo, r.dep_hi)
            for r in out.collect()}
    # b2 maps to one non-NULL type (NULL is absence, not a second value);
    # b3 maps only to NULL -> no violation either
    assert rows == {"b1": (2, "t1", "t2")}


# ------------------------------------------------------------------- Benford

def test_benford_digit_extraction_exact(spark):
    # 0.01 -> 1 cent -> digit 1; 999.99 -> 99999 -> 9; 10.00 -> 1000 -> 1;
    # 0 and negative and NULL are excluded
    df = spark.createDataFrame(
        [(0.01,), (999.99,), (10.00,), (0.0,), (-5.0,), (None,)],
        "x double",
    )
    out = benford_first_digit(df, "x").collect()
    got = {r.digit: r.n for r in out}
    assert got == {1: 2, 9: 1}
    one = [r for r in out if r.digit == 1][0]
    assert one.obs_p == round(2 / 3 * 1e6) / 1e6
    assert one.exp_p == round(math.log10(2) * 1e6) / 1e6


# ------------------------------------------------------------- group entropy

def test_group_entropy_uniform_and_single_category(spark):
    df = spark.createDataFrame(
        [("s1", "en"), ("s1", "fr"), ("s1", "en"), ("s1", "fr"),
         ("s2", "en"), ("s2", "en")],
        ["source", "lang"],
    )
    out = {r.source: r for r in group_entropy(df, "source", "lang").collect()}
    # s1: 2 equally-likely langs -> exactly 1 bit, norm 1.0
    assert out["s1"].n_cats == 2 and out["s1"].n == 4
    assert out["s1"].entropy == 1.0 and out["s1"].entropy_norm == 1.0
    # s2: single lang -> 0 bits, normalization undefined -> NULL
    assert out["s2"].entropy == 0.0 and out["s2"].entropy_norm is None


def test_group_entropy_null_group_and_null_category_kept(spark):
    df = spark.createDataFrame(
        [(None, "en"), (None, None)], "source string, lang string"
    )
    out = group_entropy(df, "source", "lang").collect()
    # the NULL group survives (window partitioning, not an equality join)
    # and the NULL category counts as a real class -> 1 bit over 2 classes
    assert len(out) == 1
    assert out[0].source is None and out[0].n_cats == 2
    assert out[0].entropy == 1.0


# ---------------------------------------------------------------------- EWMA

def test_ewma_exact_binary_weights(spark):
    # one key, values 1, 2, 3 in order:
    #  t=1: 1.0
    #  t=2: (2*2 + 1*1) / 3 = 5/3
    #  t=3: (3*4 + 2*2 + 1*1) / 7 = 17/7
    df = spark.createDataFrame(
        [("k", 1, 1.0), ("k", 2, 2.0), ("k", 3, 3.0)], ["k", "t", "v"]
    )
    out = ewma_smooth(df, "k", [F.col("t").asc_nulls_last()], "v", lags=20)
    got = {r.t: (r.ewma_num, r.ewma_den, r.ewma) for r in out.collect()}
    w0 = 1 << 19
    assert got[1] == (1_000_000 * w0, w0, 1.0)
    assert got[2] == (
        2_000_000 * w0 + 1_000_000 * (w0 >> 1),
        w0 + (w0 >> 1),
        round(5 / 3 * 1e6) / 1e6,
    )
    assert got[3][2] == round(17 / 7 * 1e6) / 1e6


def test_ewma_null_values_excluded_before_windowing(spark):
    # the NULL at t=2 is dropped BEFORE the lag structure forms: t=3's
    # 1-step lag is t=1, not the NULL row
    df = spark.createDataFrame(
        [("k", 1, 1.0), ("k", 2, None), ("k", 3, 3.0)], ["k", "t", "v"]
    )
    out = ewma_smooth(df, "k", [F.col("t").asc_nulls_last()], "v", lags=20)
    got = {r.t: r.ewma for r in out.collect()}
    assert set(got) == {1, 3}
    assert got[3] == round((3 * 2 + 1) / 3 * 1e6) / 1e6


def test_ewma_truncation_window(spark):
    # lags=2: only the previous value contributes
    rows = [("k", i, float(i)) for i in range(1, 5)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = ewma_smooth(df, "k", [F.col("t").asc_nulls_last()], "v", lags=2)
    got = {r.t: r.ewma for r in out.collect()}
    # t=4: (4*2 + 3*1)/3
    assert got[4] == round(11 / 3 * 1e6) / 1e6
    with pytest.raises(ValueError):
        ewma_smooth(df, "k", [F.col("t")], "v", lags=0)


# ----------------------------------------------------------------- BFS hops

def test_bfs_path_graph_hops(spark):
    # path 1-2-3-4-5, seed 1, max_hops 3 -> node 5 unreachable in budget
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], ["u", "v"]
    )
    seed = spark.createDataFrame([(1,)], ["node"])
    out = bfs_hops(edges, seed, max_hops=3)
    got = {r.node: r.hop for r in out.collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_bfs_directed_vs_undirected(spark):
    edges = spark.createDataFrame([(2, 1), (2, 3)], ["u", "v"])
    seed = spark.createDataFrame([(1,)], ["node"])
    undirected = bfs_hops(edges, seed, max_hops=3)
    assert {r.node: r.hop for r in undirected.collect()} == {
        1: 0, 2: 1, 3: 2,
    }
    directed = bfs_hops(edges, seed, max_hops=3, directed=True)
    # 1 has no out-edges in the directed graph -> frontier dies at once
    assert {r.node: r.hop for r in directed.collect()} == {1: 0}


def test_bfs_early_exit_and_min_hop_first_discovery(spark):
    # diamond: 1-2, 1-3, 2-4, 3-4 -> 4 discovered once at hop 2;
    # diameter 2 < max_hops budget exercises the early exit
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4)], ["u", "v"]
    )
    seed = spark.createDataFrame([(1,)], ["node"])
    out = bfs_hops(edges, seed, max_hops=6)
    rows = out.collect()
    assert len(rows) == 4  # no duplicate discoveries
    assert {r.node: r.hop for r in rows} == {1: 0, 2: 1, 3: 1, 4: 2}


def test_golden_record_mode_tiebreak_and_nulls(spark):
    """Survivorship rules on a hand-built cluster: mode tie (2 'en' vs
    2 'fr') breaks to the SMALLER value; NULLs never win mode; an
    all-NULL attribute survives as NULL."""
    from gene_level_metadata_pipeline_spark.operators.conflicts import (
        golden_record,
    )

    rows = [
        ("c1", 5, "fr", None, 10),
        ("c1", 3, "en", None, 20),
        ("c1", 9, "fr", None, 30),
        ("c1", 7, "en", None, 40),
        ("c2", 1, None, "s1", 5),
    ]
    df = spark.createDataFrame(
        rows, "cluster string, id long, lang string, src string, n long"
    )
    out = {r["cluster"]: r for r in golden_record(
        df, "cluster",
        {"id": "min", "n": "max", "lang": "mode", "src": "mode"},
    ).collect()}
    c1, c2 = out["c1"], out["c2"]
    assert (c1["n_members"], c1["id"], c1["n"], c1["lang"], c1["src"]) == (
        4, 3, 40, "en", None)
    assert (c2["n_members"], c2["id"], c2["lang"], c2["src"]) == (
        1, 1, None, "s1")


def test_golden_record_rejects_unknown_rule(spark):
    import pytest

    from gene_level_metadata_pipeline_spark.operators.conflicts import (
        golden_record,
    )

    df = spark.createDataFrame([("a", 1)], "k string, v long")
    with pytest.raises(ValueError, match="unknown rule"):
        golden_record(df, "k", {"v": "median"})
