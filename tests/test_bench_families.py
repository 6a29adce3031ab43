"""Pin the bench's per-family regression verdict (VERDICT r8 item 8):
the control-deflated ratio math, the shared-query restriction, the
>1.25 flag threshold, and the graceful first-run path. Pure-Python —
no Spark session."""

from __future__ import annotations

import json


def _fake_prev(tmp_path, queries, control):
    p = tmp_path / "prev_detail.json"
    p.write_text(json.dumps({"queries": queries, "control_sec": control}))
    return str(p)


def test_uniform_host_shift_deflates_to_flat(tmp_path):
    import bench

    prev_q = {"tpch_q1_pricing": 1.0, "dedup_exact": 2.0, "graph_bfs_hops": 3.0}
    prev = _fake_prev(tmp_path, prev_q, 0.5)
    now = {k: v * 1.4 for k, v in prev_q.items()}
    out = bench._family_regression(now, 0.5 * 1.4, prev)
    assert out["available"] and out["control_deflator"] == 1.4
    assert all(r == 1.0 for r in out["ratio_vs_prev_deflated"].values())
    assert out["regressed_families"] == []
    assert out["n_shared_queries"] == 3


def test_real_regression_flagged_per_family(tmp_path):
    import bench

    prev = _fake_prev(
        tmp_path, {"tpch_q1_pricing": 1.0, "dedup_exact": 1.0}, 1.0
    )
    now = {"tpch_q1_pricing": 1.0, "dedup_exact": 2.0,
           "brand_new_query": 9.0}  # new query must not pollute ratios
    out = bench._family_regression(now, 1.0, prev)
    rs = out["ratio_vs_prev_deflated"]
    assert rs["tpch"] == 1.0 and rs["dedup"] == 2.0
    assert out["regressed_families"] == ["dedup"]
    assert out["n_shared_queries"] == 2


def test_missing_previous_detail_is_graceful():
    import bench

    out = bench._family_regression({"a_q": 1.0}, 1.0, "/nonexistent.json")
    assert out == {"available": False, "reason": "no previous bench_detail"}


def test_deflated_queries_cancels_local_wave():
    import bench

    # queries q0..q3; a load wave doubles the floor mid-suite: the
    # control rep at position 2 reads 1.0 vs the 0.5 elsewhere.
    # Query midpoints are qi+0.5, so q1/q2 sit nearest the at=2 wave
    # rep and q0/q3 nearest the quiet brackets.
    headline = ["q0", "q1", "q2", "q3"]
    times = {"q0": 1.0, "q1": 2.0, "q2": 2.0, "q3": 1.0}
    trace = [
        {"at": 0, "sec": 0.5},
        {"at": 2, "sec": 1.0},
        {"at": 4, "sec": 0.5},
    ]
    nearest, deflated, floor = bench._deflated_queries(
        times, headline, trace
    )
    assert floor == 0.5  # trace min = quietest observed floor
    assert nearest == {"q0": 0.5, "q1": 1.0, "q2": 1.0, "q3": 0.5}
    # the wave-hit queries deflate 2x back to the quiet floor; the
    # quiet-window queries are untouched
    assert deflated == {"q0": 1.0, "q1": 1.0, "q2": 1.0, "q3": 1.0}


def test_deflated_queries_flat_trace_is_identity():
    import bench

    headline = ["q0", "q1"]
    times = {"q0": 1.5, "q1": 0.7}
    trace = [{"at": 0, "sec": 0.5}, {"at": 2, "sec": 0.5}]
    nearest, deflated, floor = bench._deflated_queries(
        times, headline, trace
    )
    assert deflated == times
    assert floor == 0.5


def test_deflated_queries_empty_trace_is_graceful():
    import bench

    nearest, deflated, floor = bench._deflated_queries(
        {"q0": 1.0}, ["q0"], []
    )
    assert nearest == {} and deflated == {} and floor == 0.0


def test_family_overrides_merge_prefix_splits():
    import bench

    assert bench._family("pagerank_suppliers") == "graph"
    assert bench._family("winnow_overlap_pairs") == "dedup"
    assert bench._family("bpe_train_merges") == "text"
    assert bench._family("tpch_q1_pricing") == "tpch"
    assert bench._family("asof_join_events") == "windows"
