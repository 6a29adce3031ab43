"""Property-based tests for the semantic-fidelity hot spots SURVEY §7
ranks hardest: R-parity rounding, tidyr separate_rows NULL behavior, and
LOCF resampling — each checked against an independent pure-Python
reference implementation on randomized inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from gene_level_metadata_pipeline_spark.session import get_spark

        _spark = get_spark("property-semantics")
    return _spark


# --- round_r (X21): banker's rounding must match Python's round() -------

# exact-binary grids: quarters at scale 1, halves at scale 0 — where the
# scaled value is exactly representable, bround / R / Python provably
# agree (see round_r docstring for the off-grid 1-ulp caveat)
quarters = st.integers(min_value=-4_000, max_value=4_000).map(lambda n: n / 4.0)
halves = st.integers(min_value=-2_000, max_value=2_000).map(lambda n: n / 2.0)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(xs=st.lists(quarters, min_size=1, max_size=30),
       ys=st.lists(halves, min_size=1, max_size=30))
def test_round_r_matches_python_bankers(xs, ys):
    from gene_level_metadata_pipeline_spark.functions.scalars import round_r

    spark = _get_spark()
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    got = [r[0] for r in df.select(round_r("x", 1)).collect()]
    # Python round() is IEC 60559 round-half-even on the double — the
    # same contract as R >= 4.0 round() (SURVEY X21)
    assert got == [round(x, 1) for x in xs]
    df0 = spark.createDataFrame([(y,) for y in ys], "y double")
    got0 = [r[0] for r in df0.select(round_r("y", 0)).collect()]
    assert got0 == [float(round(y)) for y in ys]


# --- separate_rows (R1): tidyr NULL/empty semantics ---------------------

piece = st.sampled_from(["a", "b", "cc", ""])
packed = st.one_of(
    st.none(),
    st.lists(piece, min_size=1, max_size=4).map("|".join),
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=st.lists(st.tuples(st.integers(0, 9), packed),
                     min_size=0, max_size=12))
def test_separate_rows_matches_reference_semantics(rows):
    from gene_level_metadata_pipeline_spark.operators.reshape import separate_rows

    spark = _get_spark()
    df = spark.createDataFrame(rows, "id int, v string")
    got = sorted(
        ((r.id, r.v) for r in separate_rows(df, "v", r"\|").collect()),
        key=repr,
    )
    # reference semantics: NULL stays one NULL row; "" splits to [""];
    # every delimiter piece (including empty pieces) becomes a row
    want = []
    for i, v in rows:
        if v is None:
            want.append((i, None))
        else:
            want.extend((i, p) for p in v.split("|"))
    assert got == sorted(want, key=repr)


# --- resample_locf: grid carries the latest at-or-before observation ----

obs_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 9)),
    min_size=1, max_size=15,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(obs=obs_strategy)
def test_resample_locf_matches_reference(obs):
    from gene_level_metadata_pipeline_spark.operators.timeseries import resample_locf

    spark = _get_spark()
    rows = [(f"k{k}", t, float(v), i) for i, (k, t, v) in enumerate(obs)]
    df = spark.createDataFrame(rows, "k string, t int, v double, id int")
    step = 10
    got = {(r.k, r.grid_ts): r.value_locf
           for r in resample_locf(df, "k", "t", "v", "id",
                                  step_us=step).collect()}

    tmin = min(t for _, t, _, _ in rows)
    tmax = max(t for _, t, _, _ in rows)
    t0 = tmin - tmin % step
    grid = range(t0, tmax + 1, step)
    # reference: per key, value of the max-(t, id) observation with t<=g
    want = {}
    for key in {r[0] for r in rows}:
        kobs = [(t, i, v) for (k, t, v, i) in rows if k == key]
        for g in grid:
            eligible = [(t, i, v) for (t, i, v) in kobs if t <= g]
            want[(key, g)] = max(eligible)[2] if eligible else None
    assert got == want


@given(
    st.floats(min_value=-0.5, max_value=1.5, allow_nan=False),
    st.floats(min_value=-0.5, max_value=1.5, allow_nan=False),
)
def test_hex_sample_bound_monotone_and_saturated(a, b):
    """Bounds are string-compared against md5 prefixes, so fraction
    monotonicity must survive the hex encoding: a <= b implies
    bound(a) <= bound(b) under the same lexicographic order, with 'g'
    above every hex string (saturation) and '00000000' below every
    hash (keep-nothing)."""
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        hex_sample_bound,
    )

    ba, bb = hex_sample_bound(a), hex_sample_bound(b)
    if a <= b:
        assert ba <= bb  # 'g' > any hex char, so saturation stays on top
    for x, bx in ((a, ba), (b, bb)):
        if x >= 1.0:
            assert bx == "g"
        elif x <= 0.0:
            assert bx == "00000000"
        else:
            assert len(bx) == 8 and bx <= "ffffffff"


def test_blocked_dedup_pairs_are_subsets_of_exact_truth(spark):
    """Containment laws of the blocked dedup family on real fixture data:
    blocking (LSH bands, sign buckets, k-means cells) may only REMOVE
    pairs relative to the unblocked exact truth at the same threshold —
    a blocked pair that exact scoring rejects would mean the confirm
    stage and the truth diverged."""
    from pyspark.sql import functions as F

    from gene_level_metadata_pipeline_spark.operators.dedup import (
        near_dup_pairs,
        ngram_jaccard_pairs,
    )
    from gene_level_metadata_pipeline_spark.operators.similarity import (
        brute_force_topk,
        semantic_near_dup,
        sign_lsh_pairs,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    thr = 0.5
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, "text", "doc_id", threshold=thr).collect()
    }
    confirmed = {
        (r["doc_a"], r["doc_b"])
        for r in near_dup_pairs(docs, "text", "doc_id", threshold=thr).collect()
    }
    assert confirmed <= exact

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    cos_thr = 0.15
    # unblocked exact cosine pairs via a single-bucket sign-LSH (planes=0
    # puts every vector in bucket 0 == all-pairs)
    all_pairs = {
        (r["vec_a"], r["vec_b"])
        for r in sign_lsh_pairs(emb, planes=0, threshold=cos_thr).collect()
    }
    bucketed = {
        (r["vec_a"], r["vec_b"])
        for r in sign_lsh_pairs(emb, planes=4, threshold=cos_thr).collect()
    }
    assert bucketed <= all_pairs

    sem_pairs = set()
    for r in semantic_near_dup(emb, k=8, threshold=cos_thr).collect():
        if not r["is_canonical"]:
            sem_pairs.add(r["vec_id"])
    # every non-canonical member of a semantic cluster must appear in at
    # least one unblocked near-dup pair (components only connect pairs
    # that exact cosine confirmed)
    linked = {v for pair in all_pairs for v in pair}
    assert sem_pairs <= linked


# --- fuzzy_dup_pairs: deletion-neighborhood blocking completeness -------

# short lowercase strings over a tiny alphabet maximize collision-rich
# edit neighborhoods — the adversarial regime for a blocking scheme
_words = st.text(alphabet="abc", min_size=0, max_size=5)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(words=st.lists(_words, min_size=2, max_size=12),
       k=st.integers(min_value=1, max_value=2))
def test_fuzzy_pairs_equal_quadratic_truth(words, k):
    """The completeness claim of the deletion-neighborhood generator,
    checked generatively: on random collision-rich inputs the blocked
    result must equal the brute-force levenshtein truth exactly — any
    pair the blocking failed to surface, or any wrong distance, fails."""
    from gene_level_metadata_pipeline_spark.operators.dedup import (
        fuzzy_dup_pairs,
    )

    spark = _get_spark()
    rows = list(enumerate(words))
    df = spark.createDataFrame(rows, "id long, t string")
    got = {(r["id_a"], r["id_b"]): r["distance"]
           for r in fuzzy_dup_pairs(df, "t", "id", max_distance=k).collect()}
    want = {
        (i, j): _lev(words[i], words[j])
        for i in range(len(words)) for j in range(i + 1, len(words))
        if _lev(words[i], words[j]) <= k
    }
    assert got == want


# --- gaps_islands: rank-difference islands vs pure-Python reference -----

@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(buckets=st.lists(
    st.tuples(st.integers(min_value=1, max_value=3),      # key
              st.integers(min_value=0, max_value=40)),    # hour bucket
    min_size=1, max_size=60))
def test_gaps_islands_matches_reference(buckets):
    from gene_level_metadata_pipeline_spark.operators.timeseries import (
        gaps_islands,
    )
    from datetime import datetime, timedelta

    spark = _get_spark()
    HOUR_US = 3_600_000_000
    base = datetime(2024, 1, 1)
    rows = [(k, base + timedelta(hours=h)) for k, h in buckets]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    got = sorted(
        (r.key, r.island_start_us, r.island_len)
        for r in gaps_islands(df, "user_id", "ts", HOUR_US).collect()
    )
    # reference: sort each key's distinct buckets, split on gaps > 1
    base_us = 1704067200 * 1_000_000
    want = []
    by_key: dict[int, set] = {}
    for k, h in buckets:
        by_key.setdefault(k, set()).add(h)
    for k, hs in by_key.items():
        run = []
        for h in sorted(hs):
            if run and h != run[-1] + 1:
                want.append((k, base_us + run[0] * HOUR_US, len(run)))
                run = []
            run.append(h)
        want.append((k, base_us + run[0] * HOUR_US, len(run)))
    assert got == sorted(want)
    # invariant: island lengths partition the active-bucket count
    for k, hs in by_key.items():
        assert sum(n for kk, _, n in want if kk == k) == len(hs)
