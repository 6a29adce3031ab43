"""Property-pin for winnow_overlap_pairs' df-cap recall contract
(VERDICT r7 task 8).

The precise guarantee: ``shared_fp`` counts EXACTLY the shared hashes
with document frequency <= max_df. Consequences pinned here, on
hypothesis-generated corpora with controlled boilerplate density
(a designated block of hashes shared by MANY documents, plus sparse
content hashes):

1. the operator's output equals the set-arithmetic reference that
   drops hashes with df > max_df and then intersects — bit-for-bit;
2. a pair all of whose shared hashes are sub-cap is NEVER lost and
   keeps its full shared count (the "true pair below the cap" recall
   statement);
3. what the cap CAN lose is exactly the pairs that need a boilerplate
   hash to reach min_shared — enumerated, not guessed.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from gene_level_metadata_pipeline_spark.session import get_spark

        _spark = get_spark("winnow-cap")
    return _spark


# documents: id -> set of fingerprint hashes. Hashes 0..4 are the
# "boilerplate pool" (high df when many docs draw from it); hashes
# 100+ are sparse content hashes.
corpora = st.dictionaries(
    keys=st.integers(min_value=0, max_value=14),
    values=st.sets(
        st.one_of(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=100, max_value=130),
        ),
        min_size=1,
        max_size=10,
    ),
    min_size=2,
    max_size=12,
)


def _reference(docs: dict, min_shared: int, max_df: int):
    dfreq: dict = {}
    for hs in docs.values():
        for h in hs:
            dfreq[h] = dfreq.get(h, 0) + 1
    kept = {
        i: {h for h in hs if dfreq[h] <= max_df} for i, hs in docs.items()
    }
    ids = sorted(docs)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            n = len(kept[a] & kept[b])
            if n >= min_shared:
                out[(a, b)] = n
    return dfreq, out


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(docs=corpora, min_shared=st.integers(1, 3), max_df=st.integers(1, 6))
def test_cap_recall_contract(docs, min_shared, max_df):
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        winnow_overlap_pairs,
    )

    spark = _get_spark()
    fps = spark.createDataFrame(
        [(i, h, 0) for i, hs in docs.items() for h in hs],
        "id bigint, fp_hash bigint, fp_pos bigint",
    )
    got = {
        (r["a"], r["b"]): r["shared_fp"]
        for r in winnow_overlap_pairs(
            fps, min_shared=min_shared, max_df=max_df
        ).collect()
    }
    dfreq, want = _reference(docs, min_shared, max_df)

    # (1) exact equality with the df-filtered set-arithmetic reference
    assert got == want

    # (2) recall statement: every pair whose shared hashes are ALL
    # sub-cap appears with its full (uncapped) shared count
    ids = sorted(docs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            shared = docs[a] & docs[b]
            if len(shared) >= min_shared and all(
                dfreq[h] <= max_df for h in shared
            ):
                assert got.get((a, b)) == len(shared), (a, b, shared)

    # (3) anything lost vs the UNCAPPED truth needed a boilerplate hash
    _, uncapped = _reference(docs, min_shared, max_df=10 ** 9)
    for pair in set(uncapped) - set(got):
        a, b = pair
        shared = docs[a] & docs[b]
        assert any(dfreq[h] > max_df for h in shared), pair


def test_fractional_cap_scales_with_corpus():
    """max_df_frac_e6 (r8): the effective cap is
    max(max_df, n_docs * frac // 1e6) — on a corpus where every doc
    shares one hash, an absolute cap of 1 excludes it but a 100%
    fraction keeps it; and the floor keeps tiny corpora from capping
    everything away."""
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        winnow_overlap_pairs,
    )

    import pytest

    spark = _get_spark()
    n = 8
    fps = spark.createDataFrame(
        [(i, 777, 0) for i in range(n)]
        + [(0, 1, 0), (1, 1, 0), (0, 2, 0), (1, 2, 0), (0, 3, 0),
           (1, 3, 0)],
        "id bigint, fp_hash bigint, fp_pos bigint",
    )
    # absolute cap 1: hash 777 (df=8) AND hashes 1-3 (df=2) excluded
    assert winnow_overlap_pairs(fps, min_shared=3, max_df=1).count() == 0
    # 100% fractional cap: effective cap = max(1, 8) = 8 — everything
    # kept; docs 0 and 1 share {1,2,3,777} = 4 >= 3
    got = winnow_overlap_pairs(
        fps, min_shared=3, max_df=1, max_df_frac_e6=10 ** 6
    ).collect()
    assert [(r["a"], r["b"], r["shared_fp"]) for r in got] == [(0, 1, 4)]
    # 25% fraction of 8 docs = cap 2: hash 777 excluded, 1-3 kept
    got = winnow_overlap_pairs(
        fps, min_shared=3, max_df=1, max_df_frac_e6=250_000
    ).collect()
    assert [(r["a"], r["b"], r["shared_fp"]) for r in got] == [(0, 1, 3)]
    with pytest.raises(ValueError, match="max_df_frac_e6"):
        winnow_overlap_pairs(fps, max_df_frac_e6=0)


def test_ceiling_clamps_the_fractional_cap():
    """max_df_ceiling (r9) restores a constant per-hash fan-out bound:
    eff = min(ceiling, max(floor, n*frac)) — with a ceiling of 1 even
    the 100% fractional cap excludes every shared hash, and an
    above-floor ceiling only trims the fraction, never the floor's
    guarantees."""
    import pytest

    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        winnow_overlap_pairs,
    )

    spark = _get_spark()
    n = 8
    fps = spark.createDataFrame(
        [(i, 777, 0) for i in range(n)]
        + [(0, 1, 0), (1, 1, 0), (0, 2, 0), (1, 2, 0), (0, 3, 0),
           (1, 3, 0)],
        "id bigint, fp_hash bigint, fp_pos bigint",
    )
    # 100% frac would keep everything (eff 8); ceiling 1 excludes all
    assert winnow_overlap_pairs(
        fps, min_shared=3, max_df=1, max_df_frac_e6=10 ** 6,
        max_df_ceiling=1,
    ).count() == 0
    # ceiling 2 keeps the df=2 hashes {1,2,3} but drops 777 (df=8):
    # docs 0,1 share exactly 3 sub-cap hashes
    got = winnow_overlap_pairs(
        fps, min_shared=3, max_df=1, max_df_frac_e6=10 ** 6,
        max_df_ceiling=2,
    ).collect()
    assert [(r["a"], r["b"], r["shared_fp"]) for r in got] == [(0, 1, 3)]
    with pytest.raises(ValueError, match="max_df_ceiling"):
        winnow_overlap_pairs(fps, max_df_ceiling=0)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    docs=corpora, min_shared=st.integers(1, 3),
    ceiling=st.integers(1, 4),
)
def test_ceiling_regime_recall_contract(docs, min_shared, ceiling):
    """r10 (VERDICT r9 item 8): the THIRD cap regime — eff-cap =
    max_df_ceiling — gets the same pinned contract as the floor and
    fraction regimes. Configuration forces the ceiling to bind: floor
    max_df=1, fraction 100% (so the frac cap = n_docs), ceiling <
    n_docs on most generated corpora. Pins:

    1. output == the set-arithmetic reference at eff = min(ceiling,
       max(1, n_docs)) — the documented formula, bit-for-bit;
    2. recall at the ceiling: a pair all of whose shared hashes have
       df <= eff keeps its full count;
    3. the ceiling's LOSS MODE, enumerated: every pair present under
       the unceilinged fractional cap but absent here needed a hash
       with df > eff to reach min_shared — i.e. the ceiling can lose
       exactly the pairs whose evidence is boilerplate-band hashes
       (ceiling < df <= frac-cap), nothing else.
    """
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        winnow_overlap_pairs,
    )

    spark = _get_spark()
    fps = spark.createDataFrame(
        [(i, h, 0) for i, hs in docs.items() for h in hs],
        "id bigint, fp_hash bigint, fp_pos bigint",
    )
    got = {
        (r["a"], r["b"]): r["shared_fp"]
        for r in winnow_overlap_pairs(
            fps, min_shared=min_shared, max_df=1,
            max_df_frac_e6=10 ** 6, max_df_ceiling=ceiling,
        ).collect()
    }
    n_docs = len(docs)
    eff = min(ceiling, max(1, n_docs))
    dfreq, want = _reference(docs, min_shared, max_df=eff)

    # (1) exact formula replay
    assert got == want

    # (2) recall at the ceiling
    ids = sorted(docs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            shared = docs[a] & docs[b]
            if len(shared) >= min_shared and all(
                dfreq[h] <= eff for h in shared
            ):
                assert got.get((a, b)) == len(shared), (a, b, shared)

    # (3) the ceiling's loss mode, enumerated vs the unceilinged
    # fractional cap (eff = n_docs keeps every hash)
    _, unceilinged = _reference(docs, min_shared, max_df=n_docs)
    for pair in set(unceilinged) - set(got):
        a, b = pair
        shared = docs[a] & docs[b]
        assert any(dfreq[h] > eff for h in shared), pair
