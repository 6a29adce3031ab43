"""Round-6 operator units: label propagation, grid NN join, Theil-Sen
slope, count-min estimates.

Hand-computed fixtures small enough to verify by eye; each pins the
deterministic tie-break that makes the operator oracle-certifiable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gene_level_metadata_pipeline_spark.operators.graph import label_propagation
from gene_level_metadata_pipeline_spark.operators.similarity import grid_nn_join_2d
from gene_level_metadata_pipeline_spark.operators.textanalysis import (
    count_min_estimates,
)
from gene_level_metadata_pipeline_spark.operators.timeseries import theil_sen_slope


# ---------------------------------------------------------------- LPA

def test_lpa_two_cliques_converge_to_min_labels(spark):
    # two triangles bridged by one edge: after a few synchronous rounds
    # each triangle carries its min node id; the bridge can't flip a
    # whole clique (each member has 2 in-clique votes vs 1 outside).
    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(4, 5), (5, 6), (4, 6)]
    g = spark.createDataFrame(tri1 + tri2 + [(3, 4)], "u long, v long")
    out = {r["node"]: r["community"]
           for r in label_propagation(g, rounds=4).collect()}
    # each triangle is internally uniform; the bridge leaks node 3's
    # label into the second triangle (synchronous LPA semantics), so
    # the two communities are 1 and 3 — distinct either way.
    assert out[1] == out[2] == out[3] == 1
    assert out[4] == out[5] == out[6] == 3
    assert out[1] != out[4]


def test_lpa_tiebreak_is_min_label(spark):
    # node 2's neighbors 1 and 3 hold labels 1 and 3 after round 1's
    # simultaneous update; the (count DESC, label ASC) tie-break must
    # pick 1, never 3 — the determinism the unrolled oracle relies on.
    g = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long")
    one = {r["node"]: r["community"]
           for r in label_propagation(g, rounds=1).collect()}
    assert one == {1: 2, 2: 1, 3: 2}


def test_lpa_drops_self_loops_and_isolated_nodes(spark):
    g = spark.createDataFrame([(1, 1), (2, 3)], "u long, v long")
    out = {r["node"]: r["community"]
           for r in label_propagation(g, rounds=2).collect()}
    assert set(out) == {2, 3}


def test_lpa_rejects_zero_rounds(spark):
    g = spark.createDataFrame([(1, 2)], "u long, v long")
    try:
        label_propagation(g, rounds=0)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


# ------------------------------------------------------- grid NN join

def test_grid_nn_exact_within_cell(spark):
    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 0.1, 0.0), (3, 0.9, 0.9)],
        "vec_id long, x double, y double",
    )
    out = {r["id"]: (r["nn_id"], r["d2_micro"])
           for r in grid_nn_join_2d(pts).collect()}
    # 1 and 2 are 0.1 apart (d2 = (1e5)^2); 3 sees them via the 3x3
    # window (cells are 0.25 wide, 0.9 is 3 cells over -> NOT visible).
    assert out[1] == (2, 100_000 ** 2)
    assert out[2] == (1, 100_000 ** 2)
    assert 3 not in out  # no candidate within its 3x3 neighborhood


def test_grid_nn_ties_break_on_min_id(spark):
    pts = spark.createDataFrame(
        [(10, 0.0, 0.0), (11, 0.1, 0.0), (12, -0.1, 0.0)],
        "vec_id long, x double, y double",
    )
    out = {r["id"]: r["nn_id"] for r in grid_nn_join_2d(pts).collect()}
    assert out[10] == 11  # equidistant 11 vs 12 -> min id


def test_grid_nn_cross_cell_neighbor_found(spark):
    # 0.24 and 0.26 straddle a cell boundary (cell = 0.25): the join
    # must still pair them via the +1 offset probe.
    pts = spark.createDataFrame(
        [(1, 0.24, 0.0), (2, 0.26, 0.0)],
        "vec_id long, x double, y double",
    )
    out = {r["id"]: r["nn_id"] for r in grid_nn_join_2d(pts).collect()}
    assert out == {1: 2, 2: 1}


def test_grid_nn_null_coords_dropped(spark):
    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, None, 0.0), (3, 0.1, 0.0)],
        "vec_id long, x double, y double",
    )
    out = {r["id"]: r["nn_id"] for r in grid_nn_join_2d(pts).collect()}
    assert out == {1: 3, 3: 1}


# --------------------------------------------------------- Theil-Sen

def test_theil_sen_exact_line_recovers_slope(spark):
    # y = 7x + 3 exactly: every pairwise slope is 7 -> median 7*scale.
    rows = [("a", t, 7 * t + 3) for t in range(1, 6)]
    df = spark.createDataFrame(rows, "g string, t long, y long")
    out = theil_sen_slope(df, "g", "t", "y").collect()
    assert len(out) == 1
    assert out[0]["slope_scaled"] == 7 * 10_000
    assert out[0]["n_pairs"] == 10


def test_theil_sen_robust_to_one_outlier(spark):
    # one wild point can't move the median of pairwise slopes.
    rows = [("a", t, 2 * t) for t in range(1, 8)] + [("a", 8, 10_000)]
    df = spark.createDataFrame(rows, "g string, t long, y long")
    out = theil_sen_slope(df, "g", "t", "y").collect()[0]
    assert out["slope_scaled"] == 2 * 10_000


def test_theil_sen_floor_semantics_negative_slope(spark):
    # slope -3/2 must floor to -2 (scaled: -15000 exactly at scale 1e4;
    # use scale 1 to expose the floor: (-3)/2 -> -2, not -1).
    df = spark.createDataFrame(
        [("a", 0, 3), ("a", 2, 0)], "g string, t long, y long"
    )
    out = theil_sen_slope(df, "g", "t", "y", scale=1).collect()[0]
    assert out["slope_scaled"] == -2


def test_theil_sen_lower_median_even_count(spark):
    # 2 points per distinct slope set: slopes {1, 3} -> even count picks
    # rank ceil(2/2)=1 -> the LOWER one.
    df = spark.createDataFrame(
        [("a", 0, 0), ("a", 1, 1), ("a", 2, 6)], "g string, t long, y long"
    )
    # pairwise slopes: (0,1)=1, (0,2)=3, (1,2)=5 -> odd count 3, median 3
    out = theil_sen_slope(df, "g", "t", "y", scale=1).collect()[0]
    assert out["slope_scaled"] == 3 and out["n_pairs"] == 3


# --------------------------------------------------------------- CMS

def test_cms_never_underestimates_and_exact_when_alone(spark):
    wc = spark.createDataFrame(
        [(f"w{i}", i + 1) for i in range(50)], "word string, n long"
    )
    est = count_min_estimates(wc, width=256, depth=4)
    joined = est.join(wc, "word").select("word", "est", "n").collect()
    assert len(joined) == 50
    for r in joined:
        assert r["est"] >= r["n"], r
    # total sketch mass conservation: sum over any one hash row == N
    total = sum(i + 1 for i in range(50))
    rows = count_min_estimates(
        wc.limit(0), width=256, depth=1
    )  # empty input -> empty estimates
    assert rows.count() == 0
    assert total == 1275


def test_cms_collision_inflates_but_min_recovers(spark):
    # width=1 forces every word into one bucket: est == total mass for
    # all words — the worst case the min-over-depth normally avoids.
    wc = spark.createDataFrame(
        [("a", 5), ("b", 7)], "word string, n long"
    )
    est = {r["word"]: r["est"]
           for r in count_min_estimates(wc, width=1, depth=3).collect()}
    assert est == {"a": 12, "b": 12}


# ------------------------------------------------------- RRF fusion

def test_rrf_exact_contributions_and_tiebreak(spark):
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        rrf_fuse,
    )

    ra = spark.createDataFrame(
        [(0, 100, 1), (0, 200, 2)], "qid long, doc_id long, rank long"
    )
    rb = spark.createDataFrame(
        [(0, 200, 1), (0, 300, 2)], "qid long, doc_id long, rank long"
    )
    out = {r["doc_id"]: (r["fused_e9"], r["fused_rank"])
           for r in rrf_fuse(ra, rb, topk=3).collect()}
    c1, c2 = 10 ** 9 // 61, 10 ** 9 // 62
    # doc 200 appears in both lists (rank 2 + rank 1) and must win
    assert out[200] == (c2 + c1, 1)
    assert out[100] == (c1, 2)   # ties with 300 on c-value? no: c1 > c2
    assert out[300] == (c2, 3)


def test_rrf_requires_two_rankings(spark):
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        rrf_fuse,
    )

    ra = spark.createDataFrame([(0, 1, 1)], "qid long, doc_id long, rank long")
    try:
        rrf_fuse(ra)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_term_overlap_counts_distinct_words_only(spark):
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        term_overlap_topk,
    )

    docs = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "cat fish")], "doc_id long, text string"
    )
    qs = spark.createDataFrame([(0, "cat dog dog")], "qid long, query string")
    out = {r["doc_id"]: r["overlap"]
           for r in term_overlap_topk(docs, qs, "text", "doc_id").collect()}
    # repeated words count once on both sides: doc1 matches {cat, dog}=2
    assert out == {1: 2, 2: 1}


# ------------------------------------------------------ random walks

def test_random_walks_deterministic_and_valid_edges(spark):
    from gene_level_metadata_pipeline_spark.operators.graph import (
        random_walks,
    )

    g = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "u long, v long"
    )
    w1 = sorted(map(tuple, random_walks(g, walk_len=3).collect()))
    w2 = sorted(map(tuple, random_walks(g, walk_len=3).collect()))
    assert w1 == w2  # replayable: the hash is the seed
    # every walk has steps 0..3 and every hop is a real edge
    edges = {(1, 2), (2, 3), (3, 1), (3, 4)}
    edges |= {(b, a) for a, b in edges}
    walks = {}
    for start, step, node in w1:
        walks.setdefault(start, {})[step] = node
    assert set(walks) == {1, 2, 3, 4}
    for start, seq in walks.items():
        assert seq[0] == start and len(seq) == 4
        for s in range(1, 4):
            assert (seq[s - 1], seq[s]) in edges, (start, s, seq)


def test_random_walks_isolated_node_excluded(spark):
    from gene_level_metadata_pipeline_spark.operators.graph import (
        random_walks,
    )

    g = spark.createDataFrame([(1, 2), (5, 5)], "u long, v long")
    starts = {r["start"] for r in random_walks(g, walk_len=2).collect()}
    assert starts == {1, 2}  # self-loop-only node 5 never walks


# --------------------------------------------------------- bootstrap

def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    from gene_level_metadata_pipeline_spark.operators.drift import (
        bootstrap_mean_ci,
    )

    rows = [("a", i, 1000 + (i * 37) % 200) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, id long, x long")
    out1 = bootstrap_mean_ci(df, "g", "x", "id").collect()
    out2 = bootstrap_mean_ci(df, "g", "x", "id").collect()
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]
    r = out1[0]
    assert r["n_rows"] == 200
    assert r["ci_lo_scaled"] <= r["mean_scaled"] <= r["ci_hi_scaled"]
    assert r["ci_lo_scaled"] < r["ci_hi_scaled"]


def test_bootstrap_rejects_too_few_replicates(spark):
    from gene_level_metadata_pipeline_spark.operators.drift import (
        bootstrap_mean_ci,
    )

    df = spark.createDataFrame([("a", 1, 5)], "g string, id long, x long")
    try:
        bootstrap_mean_ci(df, "g", "x", "id", replicates=2)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


# --------------------------------------------------------- skip-gram

def test_skipgram_window_and_symmetry(spark):
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        skipgram_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    )
    out = {(r["center"], r["context"]): r["n"]
           for r in skipgram_pairs(docs, window=2).collect()}
    # pairs within distance <=2: (a,b), (a,c), (b,c) — both directions
    assert out == {("a", "b"): 1, ("b", "a"): 1,
                   ("a", "c"): 1, ("c", "a"): 1,
                   ("b", "c"): 1, ("c", "b"): 1}


def test_skipgram_empty_tokens_keep_positions(spark):
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        skipgram_pairs,
    )

    # double space: 'a' and 'b' are at positions 0 and 2 — still within
    # window 2, but 'a'..'c' (position 3) is out of window.
    docs = spark.createDataFrame(
        [(1, "a  b c")], "doc_id long, text string"
    )
    out = {(r["center"], r["context"])
           for r in skipgram_pairs(docs, window=2).collect()}
    assert ("a", "b") in out and ("b", "c") in out
    assert ("a", "c") not in out  # distance 3 > window


def test_skipgram_no_cross_document_pairs(spark):
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        skipgram_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    )
    assert skipgram_pairs(docs, window=2).count() == 0


# ----------------------------------------------------------- k-center

def test_kcenter_picks_farthest_point_each_round(spark):
    from gene_level_metadata_pipeline_spark.operators.similarity import (
        kcenter_sample,
    )

    # colinear points: seed = min id (at 0.0); the farthest is 1.0,
    # then 0.5 (farthest from {0.0, 1.0}), then 0.25 (ties 0.75 on
    # distance 0.25^2 -> min id wins).
    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 0.25, 0.0), (3, 0.5, 0.0), (4, 0.75, 0.0),
         (5, 1.0, 0.0)],
        "vec_id long, x double, y double",
    )
    out = {r["sel_round"]: (r["id"], r["mind2_micro"])
           for r in kcenter_sample(pts, k=4).collect()}
    assert out[1] == (1, 0)
    assert out[2] == (5, 1_000_000 ** 2)
    assert out[3] == (3, 500_000 ** 2)
    assert out[4] == (2, 250_000 ** 2)


def test_kcenter_k1_returns_seed_only(spark):
    from gene_level_metadata_pipeline_spark.operators.similarity import (
        kcenter_sample,
    )

    pts = spark.createDataFrame(
        [(7, 0.1, 0.2), (9, 0.3, 0.4)], "vec_id long, x double, y double"
    )
    out = kcenter_sample(pts, k=1).collect()
    assert len(out) == 1 and out[0]["id"] == 7


# ------------------------------------------------- streaming CMS merge

def test_cms_merge_equals_one_shot_sketch(spark):
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        cms_lookup,
        cms_merge,
        cms_sketch,
    )

    wc1 = spark.createDataFrame([("x", 3), ("y", 1)], "word string, n long")
    wc2 = spark.createDataFrame([("x", 2), ("z", 5)], "word string, n long")
    merged = cms_merge(cms_sketch(wc1), cms_sketch(wc2))
    union = spark.createDataFrame(
        [("x", 5), ("y", 1), ("z", 5)], "word string, n long"
    )
    once = cms_sketch(union)
    words = union.select("word")
    em = {r["word"]: r["est"] for r in cms_lookup(words, merged).collect()}
    eo = {r["word"]: r["est"] for r in cms_lookup(words, once).collect()}
    assert em == eo  # additivity: merge of sketches == sketch of union
    for w, true_n in (("x", 5), ("y", 1), ("z", 5)):
        assert em[w] >= true_n


# --------------------------------------------------------------- CUPED

def test_cuped_perfect_covariate_collapses_variance(spark):
    from gene_level_metadata_pipeline_spark.operators.drift import (
        cuped_adjust,
    )

    # y == x exactly -> theta == 1 (scaled), and every unit's adjusted
    # value equals the global mean: both arms' adjusted means coincide.
    rows = [(i % 2, 100 + i * 10, 100 + i * 10) for i in range(10)]
    df = spark.createDataFrame(rows, "arm int, x long, y long")
    out = {r["arm"]: r for r in cuped_adjust(df).collect()}
    assert out[0]["theta_scaled"] == 10 ** 6
    assert out[0]["adj_mean_y_scaled"] == out[1]["adj_mean_y_scaled"]
    assert out[0]["mean_y_scaled"] != out[1]["mean_y_scaled"]


def test_cuped_uncorrelated_covariate_is_noop(spark):
    from gene_level_metadata_pipeline_spark.operators.drift import (
        cuped_adjust,
    )

    # x constant-per-pattern with zero covariance against y -> theta 0,
    # adjusted means == raw means.
    rows = [(0, 1, 10), (0, 2, 20), (1, 1, 20), (1, 2, 10)]
    df = spark.createDataFrame(rows, "arm int, x long, y long")
    out = {r["arm"]: r for r in cuped_adjust(df).collect()}
    assert out[0]["theta_scaled"] == 0
    assert out[0]["adj_mean_y_scaled"] == out[0]["mean_y_scaled"]


# ----------------------------------------------------------- conformal

def test_conformal_quantile_rank_and_coverage(spark):
    from gene_level_metadata_pipeline_spark.operators.drift import (
        conformal_split_interval,
    )

    # train (even ids): y = 100 -> pred 100. calibration (odd ids):
    # residuals 0,10,20,...,90 (10 rows) -> k = ceil(0.9*11) = 10 ->
    # q = 90, coverage 10/10.
    rows = [("a", 2 * i, 100) for i in range(10)] + [
        ("a", 2 * i + 1, 100 + 10 * i) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "g string, id long, y long")
    out = conformal_split_interval(df, "g", "y", "id").collect()[0]
    assert out["pred_scaled"] == 100
    assert out["n_cal"] == 10 and out["q_resid"] == 90
    assert out["cover_cnt"] == 10 and out["cover_ok"]


def test_conformal_small_calibration_clamps_rank(spark):
    from gene_level_metadata_pipeline_spark.operators.drift import (
        conformal_split_interval,
    )

    # 2 calibration rows: k = ceil(0.9*3) = 3 > n_cal -> clamped to 2.
    rows = [("a", 0, 50), ("a", 2, 50), ("a", 1, 60), ("a", 3, 80)]
    df = spark.createDataFrame(rows, "g string, id long, y long")
    out = conformal_split_interval(df, "g", "y", "id").collect()[0]
    assert out["n_cal"] == 2 and out["q_resid"] == 30 and out["cover_ok"]


# ------------------------------------------------------ target encode

def test_target_encode_excludes_own_fold(spark):
    from gene_level_metadata_pipeline_spark.operators.drift import (
        target_encode_kfold,
    )

    rows = [("a", i, 100 * (i + 1)) for i in range(50)]
    df = spark.createDataFrame(rows, "cat string, id long, t long")
    out = target_encode_kfold(df, "cat", "t", "id", folds=5).collect()
    tot_n, tot_s = 50, sum(100 * (i + 1) for i in range(50))
    assert len(out) == 5
    for r in out:
        n_in = tot_n - r["n_out_of_fold"]
        assert 0 < n_in < tot_n
        # out-of-fold mean never equals the all-rows mean unless the
        # fold mean coincides — verify exact arithmetic instead:
        s_out = r["enc_scaled"]
        # enc = floor((tot_s - s_fold)*1e4 / n_out): reconstructable
        assert s_out * r["n_out_of_fold"] <= (tot_s) * 10_000


def test_target_encode_single_fold_category_gets_null(spark):
    from gene_level_metadata_pipeline_spark.operators.drift import (
        target_encode_kfold,
    )

    # one row -> its category has rows in exactly one fold -> that
    # fold's encoding must be NULL (no out-of-fold evidence).
    df = spark.createDataFrame([("solo", 7, 123)], "cat string, id long, t long")
    out = target_encode_kfold(df, "cat", "t", "id", folds=5).collect()
    assert len(out) == 1
    assert out[0]["n_out_of_fold"] == 0 and out[0]["enc_scaled"] is None


# ----------------------------------------------------------------- MMR

def test_mmr_prefers_diverse_over_redundant(spark):
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        mmr_diversify,
    )

    # doc 2 is slightly more relevant than doc 3 but nearly identical
    # to the round-1 pick (doc 1): MMR must pick 3 at round 2.
    cand = spark.createDataFrame(
        [(0, 1, 1000), (0, 2, 990), (0, 3, 900)],
        "qid long, doc_id long, rel long",
    )
    sims = spark.createDataFrame(
        [(0, 1, 2, 950_000), (0, 1, 3, 10_000)],
        "qid long, a long, b long, sim long",
    )
    out = {r["pick_order"]: r["doc_id"]
           for r in mmr_diversify(cand, sims, k=3, rel_weight=100).collect()}
    assert out == {1: 1, 2: 3, 3: 2}


def test_mmr_missing_similarity_is_zero(spark):
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        mmr_diversify,
    )

    cand = spark.createDataFrame(
        [(0, 10, 5), (0, 20, 4)], "qid long, doc_id long, rel long"
    )
    sims = spark.createDataFrame(
        [], "qid long, a long, b long, sim long"
    )
    out = {r["pick_order"]: r["doc_id"]
           for r in mmr_diversify(cand, sims, k=2).collect()}
    assert out == {1: 10, 2: 20}


# ------------------------------------------------ exact set-sim join

def test_set_similarity_join_exact_no_false_negatives(spark):
    from gene_level_metadata_pipeline_spark.operators.dedup import (
        set_similarity_join,
    )

    # sets: A={1,2,3,4}, B={1,2,3}, C={9}. jac(A,B)=3/4 >= 1/2 -> pair;
    # jac with C = 0. Also verify the exact fields.
    rows = (
        [(1, f"t{i}") for i in (1, 2, 3, 4)]
        + [(2, f"t{i}") for i in (1, 2, 3)]
        + [(3, "t9")]
    )
    df = spark.createDataFrame(rows, "doc_id long, w string")
    out = set_similarity_join(df, "doc_id", "w", 1, 2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["a"], r["b"], r["inter_n"], r["union_n"]) == (1, 2, 3, 4)
    assert r["jac_e6"] == 750_000


def test_set_similarity_join_boundary_threshold(spark):
    from gene_level_metadata_pipeline_spark.operators.dedup import (
        set_similarity_join,
    )

    # jac exactly 1/2: A={1,2}, B={1,3} -> i=1, u=3 -> 1/3 < 1/2 (no);
    # A={1,2,3,4}, B={1,2,5,6}: i=2, u=6 -> 1/3 (no);
    # A={1,2,3}, B={1,2,3,4,5,6... need exactly 0.5: i=2,u=4: A={1,2,3},B={1,2,4} -> i=2,u=4 -> keep.
    rows = (
        [(1, "a"), (1, "b"), (1, "c")]
        + [(2, "a"), (2, "b"), (2, "d")]
    )
    df = spark.createDataFrame(rows, "doc_id long, w string")
    out = set_similarity_join(df, "doc_id", "w", 1, 2).collect()
    assert len(out) == 1 and out[0]["jac_e6"] == 500_000


# ------------------------------------------------ temporal reachability

def test_temporal_guard_blocks_backward_in_time_paths(spark):
    from gene_level_metadata_pipeline_spark.operators.graph import (
        temporal_reachability,
    )

    # 1 -(t=5)- 2 -(t=3)- 3: plain BFS reaches 3 in 2 hops, but the
    # signal arrives at 2 at t=5 and the 2-3 edge happened at t=3 —
    # time-respecting reachability must NOT include 3.
    e = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 3)], "u long, v long, t long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {r["node"]: r["arrival"]
           for r in temporal_reachability(e, seeds, max_hops=3).collect()}
    assert out == {1: 0, 2: 5}


def test_temporal_forward_path_and_earliest_arrival(spark):
    from gene_level_metadata_pipeline_spark.operators.graph import (
        temporal_reachability,
    )

    # two time-respecting routes to 4: via 2 arrives at 7, via 3 at 6 —
    # earliest-arrival must report 6.
    e = spark.createDataFrame(
        [(1, 2, 1), (2, 4, 7), (1, 3, 2), (3, 4, 6)],
        "u long, v long, t long",
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {r["node"]: r["arrival"]
           for r in temporal_reachability(e, seeds, max_hops=2).collect()}
    assert out[4] == 6 and out[2] == 1 and out[3] == 2


def test_temporal_hop_bound_binds(spark):
    from gene_level_metadata_pipeline_spark.operators.graph import (
        temporal_reachability,
    )

    e = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 2), (3, 4, 3)], "u long, v long, t long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]
           for r in temporal_reachability(e, seeds, max_hops=2).collect()}
    assert got == {1, 2, 3}  # 4 needs 3 hops
