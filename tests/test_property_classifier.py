"""Property-based test for linear_classifier_train: the exact-DECIMAL
contract means a THIRD engine — pure-Python ``decimal`` — must replay
training bit-for-bit on arbitrary corpora. (The DuckDB oracle certifies
two engines agree; this pins the recurrence itself, independent of any
SQL dialect.)"""

from __future__ import annotations

import hashlib
import re
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from gene_level_metadata_pipeline_spark.session import get_spark

        _spark = get_spark("property-classifier")
    return _spark


N, ROUNDS, LR = 16, 2, Decimal("0.001")
_Q12 = Decimal("1e-12")


def _replay(rows: list[tuple[int, str | None, str | None]]):
    """Pure-Python Decimal replay of the training recurrence (same
    hashing, same link, same HALF_UP quantization points)."""
    feats: dict[int, dict[int, int]] = {}
    ys: dict[int, Decimal] = {}
    for doc_id, text, lang in rows:
        if text is None:
            continue
        ys[doc_id] = Decimal(1 if lang == "en" else 0)
        for w in re.findall(r"[a-z]+", text.lower()):
            h = hashlib.md5(w.encode()).hexdigest()
            b = (int(h[0], 16) * 16 + int(h[1], 16)) % N
            s = 1 if int(h[2], 16) < 8 else -1
            feats.setdefault(doc_id, {})
            feats[doc_id][b] = feats[doc_id].get(b, 0) + s
    wts = {j: Decimal(0) for j in range(N)}
    for _ in range(ROUNDS):
        grad: dict[int, Decimal] = {}
        for d, fv in feats.items():
            z = sum(wts[b] * v for b, v in fv.items())
            p = min(max(Decimal("0.5") + z * Decimal("0.25"), Decimal(0)),
                    Decimal(1))
            err = ys[d] - p
            for b, v in fv.items():
                grad[b] = grad.get(b, Decimal(0)) + err * v
        for b, g in grad.items():
            g12 = g.quantize(_Q12, rounding=ROUND_HALF_UP)
            wts[b] = (wts[b] + LR * g12).quantize(
                _Q12, rounding=ROUND_HALF_UP
            )
    return wts, feats, ys


words = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "x", "yz", "omega"]
)
texts = st.one_of(
    st.none(), st.lists(words, min_size=0, max_size=5).map(" ".join)
)
langs = st.sampled_from(["en", "fr", None])


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(docs=st.lists(st.tuples(texts, langs), min_size=1, max_size=10))
def test_training_matches_pure_decimal_replay(docs):
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        linear_classifier_score,
        linear_classifier_train,
    )

    spark = _get_spark()
    rows = [(i, t, g) for i, (t, g) in enumerate(docs)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string"
    )
    got_w = linear_classifier_train(df, rounds=ROUNDS)
    exp_w, feats, _ = _replay(rows)
    got = {int(r["bucket"]): r["w"] for r in got_w.collect()}
    assert {b: w for b, w in got.items()} == {
        b: w.quantize(_Q12) for b, w in exp_w.items()
    }
    # predictions replay too (clamped link on the final weights)
    preds = {
        r["doc_id"]: r["pred"]
        for r in linear_classifier_score(df, got_w).collect()
    }
    for doc_id, _t, _g in rows:
        z = sum(
            exp_w[b] * v for b, v in feats.get(doc_id, {}).items()
        )
        p = min(max(Decimal("0.5") + z * Decimal("0.25"), Decimal(0)),
                Decimal(1))
        assert preds[doc_id] == (1 if p >= Decimal("0.5") else 0)
