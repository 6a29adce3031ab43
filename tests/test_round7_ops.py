"""Property tests for the round-7 sitting-2 operators, each replayed
against an independent pure-Python reference on randomized inputs:

* drift.fdr_bh vs a sequential Benjamini-Hochberg replay (exact
  fixed-point form), across partition counts that straddle the row
  count — the distributed prefix-count rank and the partition-offset
  suffix min must agree with the single-machine recurrence exactly.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from gene_level_metadata_pipeline_spark.session import get_spark

        _spark = get_spark("property-round7")
    return _spark


def _bh_reference(pvals: dict[int, int], scale: int = 10 ** 6):
    """Sequential BH in the same floored fixed point: rank by (p, key),
    raw = min(scale, p*m // rank), adj = suffix min of raw."""
    m = len(pvals)
    s = sorted(pvals.items(), key=lambda kv: (kv[1], kv[0]))
    raw = [min(scale, p * m // (i + 1)) for i, (_, p) in enumerate(s)]
    adj = raw[:]
    for i in range(m - 2, -1, -1):
        adj[i] = min(adj[i], adj[i + 1])
    return {k: (i + 1, adj[i]) for i, (k, _) in enumerate(s)}


p_tables = st.dictionaries(
    keys=st.integers(min_value=0, max_value=10 ** 9),
    values=st.integers(min_value=0, max_value=10 ** 6),
    min_size=1, max_size=40,
)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(pvals=p_tables, n_parts=st.integers(min_value=1, max_value=7))
def test_fdr_bh_matches_sequential_reference(pvals, n_parts):
    from gene_level_metadata_pipeline_spark.operators.drift import fdr_bh

    spark = _get_spark()
    df = spark.createDataFrame(
        [(k, p) for k, p in pvals.items()], "id bigint, p_e6 bigint"
    )
    got = {
        r["key"]: (r["rnk"], r["adj_e6"], r["reject"])
        for r in fdr_bh(
            df, p_col="p_e6", key_col="id", num_partitions=n_parts
        ).collect()
    }
    want = _bh_reference(pvals)
    assert set(got) == set(want)
    for k, (rnk, adj) in want.items():
        assert got[k][0] == rnk, (k, got[k], rnk, adj)
        assert got[k][1] == adj, (k, got[k], rnk, adj)
        assert got[k][2] == (adj <= 50_000)


def test_fdr_bh_monotone_and_clipped():
    """Adjusted p is non-decreasing in rank and never exceeds scale;
    duplicate p-values share neither rank nor (necessarily) adj, but
    order stays total via the key tie-break."""
    from gene_level_metadata_pipeline_spark.operators.drift import fdr_bh

    spark = _get_spark()
    rows = [(i, (i * 37) % 5) for i in range(50)]  # heavy p ties
    out = (
        fdr_bh(
            spark.createDataFrame(rows, "id bigint, p_e6 bigint"),
            num_partitions=4,
        )
        .orderBy("rnk")
        .collect()
    )
    assert [r["rnk"] for r in out] == list(range(1, 51))
    adjs = [r["adj_e6"] for r in out]
    assert all(a <= 10 ** 6 for a in adjs)
    assert all(a <= b for a, b in zip(adjs, adjs[1:]))


# --- reciprocal best hits vs pure-Python mutual argmax --------------------

def _rbh_reference(qs, cs):
    """qs/cs: {id: vector}. Same 4dp rounding + smaller-id tie-break."""
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        if na == 0 or nb == 0:
            return None
        return round(d / (na * nb), 4)

    best_c = {}
    for q, qv in qs.items():
        cand = [(cos(qv, cv), c) for c, cv in cs.items()]
        cand = [(s, c) for s, c in cand if s is not None]
        if cand:
            best_c[q] = max(cand, key=lambda t: (t[0], -t[1]))
    best_q = {}
    for c, cv in cs.items():
        cand = [(cos(qv, cv), q) for q, qv in qs.items()]
        cand = [(s, q) for s, q in cand if s is not None]
        if cand:
            best_q[c] = max(cand, key=lambda t: (t[0], -t[1]))
    return {
        (q, c): s
        for q, (s, c) in best_c.items()
        if best_q.get(c, (None, None))[1] == q
    }


vec = st.lists(
    st.integers(min_value=-5, max_value=5).map(float), min_size=3, max_size=3
)
vec_tables = st.tuples(
    st.dictionaries(st.integers(0, 50), vec, min_size=1, max_size=8),
    st.dictionaries(st.integers(51, 120), vec, min_size=1, max_size=12),
)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(tables=vec_tables)
def test_rbh_matches_reference(tables):
    from gene_level_metadata_pipeline_spark.operators.similarity import (
        reciprocal_best_hits,
    )

    qs, cs = tables
    spark = _get_spark()
    mk = lambda d: spark.createDataFrame(
        [(k, v) for k, v in d.items()], "vec_id bigint, embedding array<double>"
    )
    got = {
        (r["query_id"], r["corpus_id"]): r["cos_sim"]
        for r in reciprocal_best_hits(mk(qs), mk(cs)).collect()
    }
    want = _rbh_reference(qs, cs)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] is not None and abs(got[k] - want[k]) < 1e-9


# --- join-view delta vs full recompute ------------------------------------

delta_plans = st.tuples(
    # base A rows: key -> payload
    st.dictionaries(st.integers(0, 9), st.integers(0, 99),
                    min_size=1, max_size=8),
    # base B rows: list of (key, payload) — duplicates allowed
    st.lists(st.tuples(st.integers(0, 9), st.integers(0, 99)),
             min_size=0, max_size=12),
    # inserted A keys (disjointified below), deleted A keys
    st.sets(st.integers(10, 14), max_size=3),
    st.sets(st.integers(0, 9), max_size=3),
    # inserted B rows, deleted B row indices
    st.lists(st.tuples(st.integers(0, 14), st.integers(0, 99)), max_size=5),
    st.sets(st.integers(0, 11), max_size=4),
)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(plan=delta_plans)
def test_join_view_delta_equals_full_recompute(plan):
    from collections import Counter

    from gene_level_metadata_pipeline_spark.operators.cdc import (
        join_view_delta,
    )

    a_base, b_base, a_ins, a_del, b_ins, b_del_idx = plan
    a_old = [(k, v) for k, v in a_base.items()]
    a_new = [r for r in a_old if r[0] not in a_del] + [
        (k, k * 7) for k in a_ins
    ]
    b_old = list(b_base)
    b_new = [r for i, r in enumerate(b_old) if i not in b_del_idx] + list(
        b_ins
    )

    spark = _get_spark()
    mk = lambda rows, schema: spark.createDataFrame(rows, schema)
    da = [(k, v, 1) for k, v in a_new if k in a_ins] + [
        (k, v, -1) for k, v in a_old if k in a_del
    ]
    db = [(k, v, 1) for k, v in b_ins] + [
        (k, v, -1)
        for i, (k, v) in enumerate(b_old)
        if i in b_del_idx
    ]
    d = join_view_delta(
        mk(a_new, "k long, av long"),
        mk(da or [(None, None, None)], "k long, av long, sign long").where(
            "k is not null"
        ),
        mk(b_old or [(None, None)], "k long, bv long").where("k is not null"),
        mk(db or [(None, None, None)], "k long, bv long, sign long").where(
            "k is not null"
        ),
        on="k",
    ).collect()

    signed = Counter()
    for k, av in a_old:
        for kb, bv in b_old:
            if k == kb:
                signed[(k, av, bv)] += 1
    for r in d:
        signed[(r["k"], r["av"], r["bv"])] += r["sign"]

    want = Counter()
    for k, av in a_new:
        for kb, bv in b_new:
            if k == kb:
                want[(k, av, bv)] += 1
    assert {k: n for k, n in signed.items() if n} == {
        k: n for k, n in want.items() if n
    }


# --- Kneser-Ney bigram LM vs exact-fraction replay -------------------------

def _kn_reference(texts, d_num=3, d_den=4, scale=10 ** 12, min_count=1):
    from collections import Counter

    c12 = Counter()
    for t in texts:
        ws = [w for w in t.split(" ") if w]
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] += 1
    c1, nfol, nprec = Counter(), Counter(), Counter()
    for (a, b), c in c12.items():
        c1[a] += c
        nfol[a] += 1
        nprec[b] += 1
    t_types = len(c12)
    out = {}
    for (a, b), c in c12.items():
        if c < min_count:
            continue
        num = (max(d_den * c - d_num, 0) * t_types
               + d_num * nfol[a] * nprec[b]) * scale
        out[(a, b)] = (c, num // (d_den * c1[a] * t_types))
    return out


corpus = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "dd", "e"]), min_size=0, max_size=8
    ).map(" ".join),
    min_size=1, max_size=6,
)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(texts=corpus)
def test_kneser_ney_matches_fraction_replay(texts):
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        kneser_ney_bigram,
    )

    spark = _get_spark()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["w1"], r["w2"]): (r["c12"], r["p_kn_e12"])
        for r in kneser_ney_bigram(df, "text", "doc_id").collect()
    }
    assert got == _kn_reference(texts)


def test_kneser_ney_probability_identity():
    """With D=3/4 the interpolated-KN mass identity holds exactly in the
    fixed point up to floor error: for every context w1,
    sum over observed w2 of p  <=  scale, and adding the continuation
    mass of UNOBSERVED w2 types reaches scale to within one ulp per
    emitted row (the definition of a proper smoother)."""
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        kneser_ney_bigram,
    )

    spark = _get_spark()
    texts = ["a b a c a b d", "b a b c d a", "c a a b"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = kneser_ney_bigram(df, "text", "doc_id").collect()
    ref = _kn_reference(texts)
    by_w1 = {}
    for r in rows:
        by_w1.setdefault(r["w1"], []).append(r)
    for w1, rs in by_w1.items():
        assert sum(r["p_kn_e12"] for r in rs) <= 10 ** 12
    assert {(r["w1"], r["w2"]) for r in rows} == set(ref)


# --- grid DBSCAN vs quadratic reference ------------------------------------

def _dbscan_reference(pts, eps_micro, min_pts):
    """pts: {id: (xm, ym)} already in micro ints."""
    eps2 = eps_micro * eps_micro
    ids = sorted(pts)
    nbr = {
        i: [
            j for j in ids
            if j != i
            and (pts[i][0] - pts[j][0]) ** 2
            + (pts[i][1] - pts[j][1]) ** 2 <= eps2
        ]
        for i in ids
    }
    core = {i for i in ids if len(nbr[i]) + 1 >= min_pts}
    # min-label components over the core graph
    lbl = {i: i for i in core}
    changed = True
    while changed:
        changed = False
        for i in core:
            for j in nbr[i]:
                if j in core and lbl[j] < lbl[i]:
                    lbl[i] = lbl[j]
                    changed = True
    out = {}
    for i in ids:
        if i in core:
            out[i] = ("core", lbl[i])
        else:
            cands = [lbl[j] for j in nbr[i] if j in core]
            out[i] = ("border", min(cands)) if cands else ("noise", None)
    return out


point_sets = st.dictionaries(
    st.integers(0, 40),
    st.tuples(st.integers(-50, 50), st.integers(-50, 50)),
    min_size=1, max_size=25,
)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(pts=point_sets, eps=st.sampled_from([10, 20, 35]),
       min_pts=st.integers(2, 5))
def test_dbscan_matches_quadratic_reference(pts, eps, min_pts):
    from gene_level_metadata_pipeline_spark.operators.similarity import (
        dbscan_grid_2d,
    )

    spark = _get_spark()
    df = spark.createDataFrame(
        [(k, x / 1e6, y / 1e6) for k, (x, y) in pts.items()],
        "vec_id long, x double, y double",
    )
    got = {
        r["id"]: (r["role"], r["cluster"])
        for r in dbscan_grid_2d(
            df, eps_micro=eps, min_pts=min_pts
        ).collect()
    }
    assert got == _dbscan_reference(pts, eps, min_pts)


# --- k-truss fixed-round peel vs pure-Python replay -------------------------

def _truss_reference(edges, k, rounds):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}

    def sup(es_):
        adj = {}
        for u, v in es_:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        return {
            (u, v): len(adj[u] & adj[v]) for u, v in es_
        }
    for _ in range(rounds):
        s = sup(es)
        es = {e for e in es if s[e] >= k - 2}
    s = sup(es)
    return {e: s[e] for e in es}


edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=0, max_size=40,
)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(edges=edge_lists, k=st.integers(3, 5), rounds=st.integers(1, 3))
def test_truss_peel_matches_reference(edges, k, rounds):
    from gene_level_metadata_pipeline_spark.operators.graph import (
        truss_peel,
    )

    spark = _get_spark()
    df = spark.createDataFrame(
        edges or [(None, None)], "u long, v long"
    ).where("u is not null")
    got = {
        (r["u"], r["v"]): r["support"]
        for r in truss_peel(df, k=k, rounds=rounds).collect()
    }
    assert got == _truss_reference(edges, k, rounds)


# --- exact repeated-substring spans vs pure-Python reference ---------------

def _spans_reference(texts, L):
    from collections import defaultdict

    occ = defaultdict(set)
    for i, t in texts.items():
        for p in range(len(t) - L + 1):
            occ[t[p:p + L]].add(i)
    out = {}
    for i, t in texts.items():
        marked = sorted(
            p for p in range(len(t) - L + 1)
            if len(occ[t[p:p + L]]) >= 2
        )
        spans = []
        for p in marked:
            s, e = p + 1, p + L  # 1-based inclusive
            if spans and s <= spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], max(spans[-1][1], e))
            else:
                spans.append((s, e))
        if spans:
            out[i] = spans
    return out


texts_strategy = st.dictionaries(
    st.integers(0, 20),
    st.text(alphabet="abc", min_size=0, max_size=18),
    min_size=1, max_size=8,
)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(texts=texts_strategy, L=st.sampled_from([2, 3, 5]))
def test_repeated_substring_spans_matches_reference(texts, L):
    from gene_level_metadata_pipeline_spark.operators.dedup import (
        repeated_substring_spans,
    )

    spark = _get_spark()
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    rows = repeated_substring_spans(
        df, "text", "doc_id", gram_len=L
    ).collect()
    got = {}
    for r in rows:
        got.setdefault(r["id"], []).append(
            (r["span_start"], r["span_end"])
        )
        assert r["span_len"] == r["span_end"] - r["span_start"] + 1
    got = {k: sorted(v) for k, v in got.items()}
    assert got == _spans_reference(texts, L)


# --- Brier decomposition vs exact integer replay ----------------------------

def _brier_reference(buckets, scale=10 ** 6):
    """buckets: list of (s, n, p_scaled)."""
    S = sum(s for s, _, _ in buckets)
    N = sum(n for _, n, _ in buckets)
    rel = sum((n * p - s * scale) ** 2 // (n * N) for s, n, p in buckets)
    res = sum(
        (s * N - S * n) ** 2 * scale * scale // (n * N ** 3)
        for s, n, p in buckets
    )
    unc = S * (N - S) * scale * scale // (N * N)
    return len(buckets), N, rel, res, unc


bucket_tables = st.lists(
    st.tuples(st.integers(0, 50), st.integers(1, 60),
              st.integers(0, 10 ** 6)).filter(lambda t: t[0] <= t[1]),
    min_size=1, max_size=10,
)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(bks=bucket_tables)
def test_brier_decomposition_matches_integer_replay(bks):
    from gene_level_metadata_pipeline_spark.operators.drift import (
        brier_decomposition,
    )

    spark = _get_spark()
    df = spark.createDataFrame(
        [(i, s, n, p) for i, (s, n, p) in enumerate(bks)],
        "bucket long, s long, n long, p_e6 long",
    )
    r = brier_decomposition(df).collect()
    assert len(r) == 1
    got = (r[0]["n_buckets"], r[0]["n"], r[0]["rel_e12"],
           r[0]["res_e12"], r[0]["unc_e12"])
    assert got == _brier_reference(bks)


def test_brier_identity_on_calibrated_predictor():
    """When the predictor IS each bucket's exact scaled mean, REL is
    only floor dust (< n_buckets ulps) and Brier = REL - RES + UNC
    matches the directly-computed mean squared error to the same dust."""
    from gene_level_metadata_pipeline_spark.operators.drift import (
        brier_decomposition,
    )

    spark = _get_spark()
    bks = [(3, 10, 300000), (7, 10, 700000), (1, 4, 250000)]
    df = spark.createDataFrame(
        [(i, s, n, p) for i, (s, n, p) in enumerate(bks)],
        "bucket long, s long, n long, p_e6 long",
    )
    r = brier_decomposition(df).collect()[0]
    assert r["rel_e12"] <= len(bks)  # pure floor dust
    # direct Brier at e12: sum over rows of (p - y)^2 / N
    S = sum(s for s, _, _ in bks); N = sum(n for _, n, _ in bks)
    direct = sum(
        (s * (p - 10 ** 6) ** 2 + (n - s) * p ** 2) // N
        for s, n, p in bks
    )
    recon = r["rel_e12"] - r["res_e12"] + r["unc_e12"]
    assert abs(recon - direct) <= 3 * len(bks)


# --- exact-substring removal vs pure-Python reference -----------------------

@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(texts=texts_strategy, L=st.sampled_from([2, 3, 5]))
def test_remove_repeated_substrings_matches_reference(texts, L):
    from gene_level_metadata_pipeline_spark.operators.dedup import (
        remove_repeated_substrings,
    )

    spark = _get_spark()
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r["id"]: (r["n_spans"], r["removed_chars"], r["kept_text"])
        for r in remove_repeated_substrings(
            df, "text", "doc_id", gram_len=L
        ).collect()
    }
    spans = _spans_reference(texts, L)
    for i, t in texts.items():
        ss = spans.get(i, [])
        kept = ""
        pos = 1
        for a, b in ss:
            kept += t[pos - 1:a - 1]
            pos = b + 1
        kept += t[pos - 1:]
        removed = sum(b - a + 1 for a, b in ss)
        assert got[i] == (len(ss), removed, kept), (i, t, got[i])


# --- rendezvous hashing: monotone consistency ------------------------------

@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    keys=st.sets(st.integers(0, 10 ** 6), min_size=1, max_size=30),
    n=st.integers(1, 6),
)
def test_rendezvous_growth_moves_keys_only_to_the_new_shard(keys, n):
    from gene_level_metadata_pipeline_spark.operators.selection import (
        rendezvous_assign,
    )

    spark = _get_spark()
    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    before = {
        r["key"]: r["shard"]
        for r in rendezvous_assign(df, "doc_id", n).collect()
    }
    after = {
        r["key"]: r["shard"]
        for r in rendezvous_assign(df, "doc_id", n + 1).collect()
    }
    assert before.keys() == after.keys() == keys
    for k in keys:
        assert after[k] == before[k] or after[k] == n, (
            k, before[k], after[k]
        )
    assert all(0 <= s < n for s in before.values())
