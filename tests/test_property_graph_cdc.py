"""Property-based checks for the round-5 second-sitting operators,
each against an independent pure-Python reference on randomized inputs:

* ``kcore``: output is EXACTLY the k-core — every member's in-core
  degree >= k (soundness) AND no dropped node has >= k neighbors in
  the core (maximality: if one did, adding it back would keep all
  degrees >= k, contradicting the fixpoint).
* ``cdc_apply``: equals the brute-force per-key replay (sort changes
  by (version, op), last wins; delete removes).
* ``interval_overlap_join``: equals the quadratic per-key overlap scan,
  including empty-interval exclusion and the exactly-once guarantee.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from gene_level_metadata_pipeline_spark.session import get_spark

        _spark = get_spark("property-graph-cdc")
    return _spark


edges_strategy = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),
    min_size=0, max_size=25,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(edges=edges_strategy, k=st.integers(1, 3))
def test_kcore_sound_and_maximal(edges, k):
    from gene_level_metadata_pipeline_spark.operators.graph import kcore

    spark = _get_spark()
    simple = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    # pure-Python peeling reference
    adj: dict[int, set[int]] = {}
    for u, v in simple:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    alive = set(adj)
    while True:
        drop = {n for n in alive if len(adj[n] & alive) < k}
        if not drop:
            break
        alive -= drop
    expected = {n: len(adj[n] & alive) for n in alive}

    if not simple:
        df = spark.createDataFrame([], "u long, v long")
    else:
        df = spark.createDataFrame(list(simple), "u long, v long")
    got = {r["node"]: r["core_deg"] for r in kcore(df, k=k).collect()}
    assert got == expected


ops_strategy = st.lists(
    st.tuples(
        st.integers(0, 4),                       # key
        st.one_of(st.none(), st.text("ab", max_size=2)),  # val
        st.integers(0, 5),                       # version
        st.sampled_from(["upsert", "delete"]),
    ),
    min_size=0, max_size=20,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(changes=ops_strategy)
def test_cdc_apply_matches_replay(changes):
    from gene_level_metadata_pipeline_spark.operators.harmonize import (
        cdc_apply,
    )

    spark = _get_spark()
    snap_rows = [(0, "s0"), (1, "s1"), (2, "s2")]
    # the documented contract leaves the PAYLOAD undefined when two
    # changes share a key's winning (version, op) exactly — drop such
    # collisions from the generated feed (keep the first)
    seen: set[tuple] = set()
    uniq = []
    for c in changes:
        sig = (c[0], c[2], c[3])
        if sig not in seen:
            seen.add(sig)
            uniq.append(c)
    changes = uniq
    # reference: per key, winner = max (version, op); delete drops
    winners: dict[int, tuple] = {}
    for key, val, ver, op in changes:
        cur = winners.get(key)
        if cur is None or (ver, op) > (cur[0], cur[1]):
            winners[key] = (ver, op, val)
    expected = {}
    for key, val in snap_rows:
        if key not in winners:
            expected[key] = val
    for key, (_, op, val) in winners.items():
        if op != "delete":
            expected[key] = val

    snap = spark.createDataFrame(snap_rows, "k long, val string")
    if changes:
        ch = spark.createDataFrame(
            changes, "k long, val string, version int, op string"
        )
    else:
        ch = spark.createDataFrame([], "k long, val string, version int, op string")
    got = {r["k"]: r["val"] for r in cdc_apply(snap, ch, "k").collect()}
    assert got == expected


intervals_strategy = st.lists(
    st.tuples(st.integers(0, 1), st.integers(0, 40), st.integers(0, 40)),
    min_size=0, max_size=12,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(a=intervals_strategy, b=intervals_strategy,
       width=st.sampled_from([1, 3, 7, 50]))
def test_interval_overlap_matches_quadratic(a, b, width):
    from gene_level_metadata_pipeline_spark.operators.temporal import (
        interval_overlap_join,
    )

    spark = _get_spark()
    expected = sorted(
        (ka, la, ha, lb, hb, min(ha, hb) - max(la, lb))
        for (ka, la, ha) in a
        for (kb, lb, hb) in b
        if ka == kb and ha > la and hb > lb and la < hb and lb < ha
    )

    def mk(rows):
        if not rows:
            return spark.createDataFrame([], "k long, lo long, hi long")
        return spark.createDataFrame(rows, "k long, lo long, hi long")

    got = sorted(
        (r["k"], r["a_lo"], r["a_hi"], r["b_lo"], r["b_hi"], r["overlap"])
        for r in interval_overlap_join(
            mk(a), mk(b), "k", bucket_width=width
        ).collect()
    )
    assert got == expected


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(edges=st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7), st.integers(1, 9)),
    min_size=1, max_size=18,
), hops=st.integers(1, 4))
def test_sssp_matches_bounded_bellman_ford(edges, hops):
    from gene_level_metadata_pipeline_spark.operators.graph import (
        sssp_weighted,
    )

    spark = _get_spark()
    # undirected; duplicates collapse to min weight? No — the operator
    # distinct()s exact (u, v, w) triples and relaxes ALL of them, so
    # the reference must too: keep distinct triples both directions.
    sym = {(u, v, w) for u, v, w in edges} | {
        (v, u, w) for u, v, w in edges
    }
    seed = min(u for u, _, _ in sym)
    dist = {seed: 0}
    for _ in range(hops):
        nxt = dict(dist)
        for u, v, w in sym:
            if u in dist and dist[u] + w < nxt.get(v, float("inf")):
                nxt[v] = dist[u] + w
        dist = nxt
    df = spark.createDataFrame(list(sym), "u long, v long, w long")
    sdf = spark.createDataFrame([(seed,)], "node long")
    got = {r["node"]: r["dist"] for r in
           sssp_weighted(df, sdf, max_hops=hops).collect()}
    assert got == dist


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(edges=st.lists(
    st.tuples(st.integers(0, 5), st.integers(10, 14)),
    min_size=1, max_size=15,
), iters=st.integers(1, 3))
def test_hits_matches_integer_replay(edges, iters):
    from gene_level_metadata_pipeline_spark.operators.graph import (
        hits_bipartite,
    )

    spark = _get_spark()
    SCALE = 10 ** 6
    e = sorted(set(edges))
    h = {u: SCALE for u, _ in e}
    a = {}
    for _ in range(iters):
        ra = {}
        for u, v in e:
            ra[v] = ra.get(v, 0) + h[u]
        m = max(ra.values())
        a = {v: x * SCALE // m for v, x in ra.items()}
        rh = {}
        for u, v in e:
            rh[u] = rh.get(u, 0) + a[v]
        m = max(rh.values())
        h = {u: x * SCALE // m for u, x in rh.items()}
    expected = {("hub", u): s for u, s in h.items()}
    expected |= {("authority", v): s for v, s in a.items()}
    df = spark.createDataFrame(e, "u long, v long")
    got = {(r["side"], r["node"]): r["score"]
           for r in hits_bipartite(df, iterations=iters).collect()}
    assert got == expected
