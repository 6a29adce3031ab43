"""Regression tests for the four round-7 ADVICE findings (all low).

* similarity.dbscan_grid_2d — min_pts<=1 would silently label isolated
  points noise (degree is derived from the pair table, so zero-neighbor
  points never appear in it); now validated with a loud ValueError.
* similarity.reciprocal_best_hits — the tie-break no longer negates the
  id column (numeric-only under ANSI); min_by keyed on (-cos, id) works
  for any orderable id type, so string UUIDs round-trip.
* cdc.join_view_delta — a base table legitimately carrying a column
  named sign_col now fails loud instead of producing ambiguous signs.
* drift.brier_decomposition — documented DECIMAL(38,0) safe bound
  corrected to ~3e6 (docstring-only; the N^4*scale^2 regime is pinned
  here so the doc can't silently drift again).
"""

from __future__ import annotations

import pytest

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from gene_level_metadata_pipeline_spark.session import get_spark

        _spark = get_spark("advice-r8")
    return _spark


def test_dbscan_rejects_min_pts_below_two():
    from gene_level_metadata_pipeline_spark.operators.similarity import (
        dbscan_grid_2d,
    )

    spark = _get_spark()
    pts = spark.createDataFrame(
        [(1, 0.0, 0.0)], "vec_id bigint, x double, y double"
    )
    with pytest.raises(ValueError, match="min_pts"):
        dbscan_grid_2d(pts, min_pts=1)
    with pytest.raises(ValueError, match="eps_micro"):
        dbscan_grid_2d(pts, eps_micro=0)


def test_rbh_string_ids():
    """String vec_ids: the r7 arithmetic-negation tie-break failed (or
    nulled) here under ANSI; min_by over the (-cos, id) struct must
    return the lexicographically smallest id on cosine ties."""
    from gene_level_metadata_pipeline_spark.operators.similarity import (
        reciprocal_best_hits,
    )

    spark = _get_spark()
    # q1 ties exactly between c-a and c-b (identical vectors): the
    # smaller STRING id "c-a" must win both directions.
    qs = spark.createDataFrame(
        [("q-1", [1.0, 0.0]), ("q-2", [0.0, 1.0])],
        "vec_id string, embedding array<double>",
    )
    cs = spark.createDataFrame(
        [("c-b", [2.0, 0.0]), ("c-a", [2.0, 0.0]), ("c-z", [0.0, 3.0])],
        "vec_id string, embedding array<double>",
    )
    got = {
        (r["query_id"], r["corpus_id"]): r["cos_sim"]
        for r in reciprocal_best_hits(qs, cs).collect()
    }
    assert got == {("q-1", "c-a"): 1.0, ("q-2", "c-z"): 1.0}


def test_rbh_numeric_ids_unchanged():
    """The min_by rewrite must preserve the numeric-id tie-break
    (smaller id wins) byte-for-byte — this pins the oracle contract."""
    from gene_level_metadata_pipeline_spark.operators.similarity import (
        reciprocal_best_hits,
    )

    spark = _get_spark()
    qs = spark.createDataFrame(
        [(10, [1.0, 0.0])], "vec_id bigint, embedding array<double>"
    )
    cs = spark.createDataFrame(
        [(7, [5.0, 0.0]), (3, [5.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    rows = reciprocal_best_hits(qs, cs).collect()
    assert [(r["query_id"], r["corpus_id"]) for r in rows] == [(10, 3)]


def test_join_view_delta_rejects_sign_collision():
    from gene_level_metadata_pipeline_spark.operators.cdc import (
        join_view_delta,
    )

    spark = _get_spark()
    base = spark.createDataFrame([(1, "x")], "k bigint, v string")
    poisoned = spark.createDataFrame(
        [(1, "x", 9)], "k bigint, v string, sign int"
    )
    delta = spark.createDataFrame(
        [(1, "y", 1)], "k bigint, v string, sign int"
    )
    with pytest.raises(ValueError, match="a_new"):
        join_view_delta(poisoned, delta, base, delta, on="k")
    with pytest.raises(ValueError, match="b_old"):
        join_view_delta(base, delta, poisoned, delta, on="k")


def test_brier_doc_bound_regime():
    """Pin the arithmetic behind the corrected docstring bound: with one
    dominating bucket, RES's numerator is ~N^4*scale^2, which exceeds
    38 digits just past N=10^6.5 — so ~3e6 is the honest single-shot
    bound (and 1e7, the old claim, is not)."""
    scale = 10 ** 6
    digits = lambda n: len(str(n))
    n_ok, n_bad = 3 * 10 ** 6, 10 ** 7
    assert digits(n_ok ** 4 * scale ** 2) <= 38
    assert digits(n_bad ** 4 * scale ** 2) > 38
