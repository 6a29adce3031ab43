"""Winnowing fingerprint tests (round 7): the operator replayed against
a pure-Python reference implementation of Schleimer et al. 2003 on
randomized inputs, plus the winnowing THEOREM as a property — any
shared substring of length >= w + k - 1 forces a shared fingerprint."""

from __future__ import annotations

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

K, W = 5, 4
POS_BASE = 2 ** 31

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from gene_level_metadata_pipeline_spark.session import get_spark

        _spark = get_spark("winnow-tests")
    return _spark


def _py_winnow(text: str, k: int = K, w: int = W) -> set[tuple[int, int]]:
    """Reference winnowing: returns {(hash, pos)} selected fingerprints."""
    t = re.sub("[^a-z]", "", text.lower())
    if len(t) < k:
        return set()
    hashes = [
        int(hashlib.md5(t[i:i + k].encode()).hexdigest()[:6], 16)
        for i in range(len(t) - k + 1)
    ]
    n = len(hashes)
    out = set()
    if n < w:
        packed = min(h * POS_BASE + (POS_BASE - 1 - p)
                     for p, h in enumerate(hashes))
        out.add((packed // POS_BASE, POS_BASE - 1 - packed % POS_BASE))
        return out
    for s in range(n - w + 1):
        packed = min(hashes[p] * POS_BASE + (POS_BASE - 1 - p)
                     for p in range(s, s + w))
        out.add((packed // POS_BASE, POS_BASE - 1 - packed % POS_BASE))
    return out


texts = st.text(alphabet="abcdef gh", min_size=0, max_size=60)


@settings(max_examples=10, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(docs=st.lists(texts, min_size=1, max_size=5))
def test_winnow_matches_python_reference(docs):
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        winnow_fingerprints,
    )

    spark = _get_spark()
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got: dict[int, set] = {}
    for r in winnow_fingerprints(df, k=K, w=W).collect():
        got.setdefault(r["id"], set()).add((r["fp_hash"], r["fp_pos"]))
    want = {i: _py_winnow(t) for i, t in enumerate(docs) if _py_winnow(t)}
    assert got == want


@settings(max_examples=10, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    shared=st.text(alphabet="abcdefgh", min_size=W + K - 1, max_size=16),
    pre1=st.text(alphabet="mnopqrst", min_size=0, max_size=20),
    suf1=st.text(alphabet="mnopqrst", min_size=0, max_size=20),
    pre2=st.text(alphabet="uvwxyz", min_size=0, max_size=20),
    suf2=st.text(alphabet="uvwxyz", min_size=0, max_size=20),
)
def test_winnowing_theorem_shared_substring_shares_fingerprint(
    shared, pre1, suf1, pre2, suf2
):
    """Any match of length >= w + k - 1 normalized chars must leave a
    shared fingerprint HASH in both documents — the guarantee the
    overlap join builds on (Schleimer et al. 2003, theorem 1)."""
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        winnow_fingerprints,
    )

    spark = _get_spark()
    df = spark.createDataFrame(
        [(1, pre1 + shared + suf1), (2, pre2 + shared + suf2)],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(df, k=K, w=W)
    hashes = {1: set(), 2: set()}
    for r in fp.collect():
        hashes[r["id"]].add(r["fp_hash"])
    assert hashes[1] & hashes[2], (
        f"theorem violated: shared={shared!r} produced disjoint "
        f"fingerprints {hashes}"
    )


def test_winnow_short_doc_partial_window():
    """Docs with >= k chars but < w k-grams winnow their single partial
    window: exactly one fingerprint, the global min (rightmost tie)."""
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        winnow_fingerprints,
    )

    spark = _get_spark()
    df = spark.createDataFrame(
        [(1, "abcde"), (2, "abcdef"), (3, "abc")],
        "doc_id long, text string",
    )
    rows = winnow_fingerprints(df, k=K, w=W).collect()
    by_id: dict[int, list] = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append((r["fp_hash"], r["fp_pos"]))
    assert len(by_id[1]) == 1          # 1 k-gram -> 1 fingerprint
    assert len(by_id[2]) == 1          # 2 k-grams < w -> global min only
    assert 3 not in by_id              # shorter than k -> nothing
    assert by_id[1] == list(_py_winnow("abcde"))
    assert by_id[2] == list(_py_winnow("abcdef"))


def test_winnow_rightmost_tie_on_repeated_text():
    """A periodic string repeats k-gram hashes; ties must resolve to the
    RIGHTMOST position exactly as the reference does (the classic MOSS
    rule — leftmost would also be consistent, but it is not the one the
    oracle replays)."""
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        winnow_fingerprints,
    )

    spark = _get_spark()
    t = "abcab" * 6
    df = spark.createDataFrame([(1, t)], "doc_id long, text string")
    got = {
        (r["fp_hash"], r["fp_pos"])
        for r in winnow_fingerprints(df, k=K, w=W).collect()
    }
    assert got == _py_winnow(t)
