"""Tests for the r8 reciprocal_best_hits tiering (VERDICT r7 task 5):
the exact tier is the certified default at bounded pair budgets; the
IVF tier is the documented probabilistic large-panel path; "auto"
gates on the counted |panel|x|corpus| product.
"""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from gene_level_metadata_pipeline_spark.session import get_spark

        _spark = get_spark("rbh-ivf")
    return _spark


def _vec(k, j, dim=8):
    v = [0.0] * dim
    v[k] = 100.0
    v[(k + 1) % dim] = float(j)  # in-cluster jitter
    return v


def _clustered(spark, n_clusters=6, per_cluster=10):
    """Well-separated clusters with INTERLEAVED corpus ids (cluster =
    id % n_clusters), so the quantizer's lowest-id seeds land one per
    cluster and 1 Lloyd round recovers the true clusters exactly —
    the regime where the IVF tier's recall is structurally 1.0.
    Queries (ids 1000+) probe one vector per cluster."""
    corpus = [
        (j * n_clusters + k, _vec(k, 1 + j % 9))
        for k in range(n_clusters)
        for j in range(per_cluster)
    ]
    queries = [(1000 + k, _vec(k, 5)) for k in range(n_clusters)]
    schema = "vec_id bigint, embedding array<double>"
    return (
        spark.createDataFrame(queries, schema),
        spark.createDataFrame(corpus, schema),
    )


def _pairs(qs, cs, **kw):
    from gene_level_metadata_pipeline_spark.operators.similarity import (
        reciprocal_best_hits,
    )

    return {
        (r["query_id"], r["corpus_id"]): r["cos_sim"]
        for r in reciprocal_best_hits(qs, cs, **kw).collect()
    }


def test_ivf_tier_matches_exact_on_separated_clusters():
    spark = _get_spark()
    qs, cs = _clustered(spark)
    exact = _pairs(qs, cs, method="exact")
    ivf = _pairs(qs, cs, method="ivf", n_cells=6, probes=2)
    assert exact and ivf == exact


def test_auto_gate_flips_on_pair_budget():
    """auto with a 1-pair budget must leave the exact tier — the panel
    is under the BLAS cap, so it lands on BLAS, whose result must
    match exact here — and the default budget stays exact."""
    spark = _get_spark()
    qs, cs = _clustered(spark)
    exact = _pairs(qs, cs, method="exact")
    assert _pairs(qs, cs, method="auto") == exact  # << default budget
    assert _pairs(qs, cs, method="auto", exact_pair_budget=1) == exact


def test_blas_tier_matches_exact():
    """The BLAS tier is the same full cross scoring vectorized — on
    both fixtures it must reproduce the exact tier bit-for-bit
    (identical pairs AND identical 4dp cosines)."""
    spark = _get_spark()
    qs, cs = _clustered(spark)
    assert _pairs(qs, cs, method="blas") == _pairs(qs, cs, method="exact")
    rows = [
        (i, [math.sin(0.7 * i * (d + 1)) for d in range(8)])
        for i in range(90)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    q2 = df.where(F.col("vec_id") % 5 == 0)
    c2 = df.where(F.col("vec_id") % 5 != 0)
    assert _pairs(q2, c2, method="blas") == _pairs(q2, c2, method="exact")


def test_blas_tier_degenerate_vectors():
    """Zero-norm and null-element vectors are excluded on both sides,
    matching the exact tier's NULL-cosine contract."""
    spark = _get_spark()
    schema = "vec_id bigint, embedding array<double>"
    qs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, None)], schema
    )
    cs = spark.createDataFrame(
        [(10, [2.0, 0.1]), (11, [0.0, 0.0]), (12, [None, 1.0])], schema
    )
    assert _pairs(qs, cs, method="blas") == _pairs(qs, cs, method="exact")


def test_ivf_recall_measured_on_mixed_vectors():
    """On non-separated vectors the IVF tier is allowed to lose pairs —
    but every pair it DOES return must carry the true cosine, and the
    recall floor for probes=2 over sqrt-cells should hold on this
    deterministic mix."""
    spark = _get_spark()
    rows = [
        (i, [math.sin(0.7 * i * (d + 1)) for d in range(8)])
        for i in range(90)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    qs = df.where(F.col("vec_id") % 5 == 0)
    cs = df.where(F.col("vec_id") % 5 != 0)
    exact = _pairs(qs, cs, method="exact")
    ivf = _pairs(qs, cs, method="ivf", probes=2)
    assert exact
    # returned pairs carry exact cosines (scoring is identical)
    for pair, cos in ivf.items():
        if pair in exact:
            assert cos == exact[pair]
    recall = len(set(ivf) & set(exact)) / len(exact)
    assert recall >= 0.5, f"recall {recall} collapsed"


def test_rbh_validates_method_and_probes():
    from gene_level_metadata_pipeline_spark.operators.similarity import (
        reciprocal_best_hits,
    )

    spark = _get_spark()
    qs, cs = _clustered(spark, n_clusters=2, per_cluster=3)
    with pytest.raises(ValueError, match="method"):
        reciprocal_best_hits(qs, cs, method="annoy")
    with pytest.raises(ValueError, match="probes"):
        reciprocal_best_hits(qs, cs, method="ivf", probes=0)


def test_auto_beyond_blas_cap_goes_blocked_not_ivf(monkeypatch):
    """r10 (VERDICT r9 item 2): past the BLAS panel cap 'auto' routes
    to the EXACT distributed blocked tier — never the probabilistic
    IVF tier (the r8 finding stands: measured recall 0.15 at the old
    probes=2 default on unstructured embeddings; the r9 build raised
    here because no exact tier existed past the cap). The blocked
    answer must equal the exact tier's."""
    from gene_level_metadata_pipeline_spark.operators import similarity

    spark = _get_spark()
    qs, cs = _clustered(spark)
    monkeypatch.setattr(similarity, "_BLAS_PANEL_CAP", 2)
    got = sorted(map(tuple, similarity.reciprocal_best_hits(
        qs, cs, method="auto", exact_pair_budget=1
    ).collect()))
    want = sorted(map(tuple, similarity.reciprocal_best_hits(
        qs, cs, method="exact"
    ).collect()))
    assert got == want and len(got) > 0
    # explicit opt-in to the probabilistic tier still works
    out = similarity.reciprocal_best_hits(
        qs, cs, method="ivf", n_cells=6, probes=6
    )
    assert out.count() > 0


def test_ivf_default_probes_is_recall_honest():
    """probes=None (the default) resolves to 32 — the measured
    recall>=0.9 point on the committed curve — so an explicit IVF call
    without a probes choice gets the recall-honest setting, not the
    old 2."""
    spark = _get_spark()
    qs, cs = _clustered(spark)
    exact = _pairs(qs, cs, method="exact")
    # 6 cells, default probes (32 > 6 means every cell is probed):
    # full recall on this fixture by construction
    ivf = _pairs(qs, cs, method="ivf", n_cells=6)
    assert ivf == exact
