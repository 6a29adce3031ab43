"""DSIR importance resampling (r10): hashed-n-gram log-weights +
deterministic Gumbel-top-k.

* log-weights match a pure-Python decimal replay of the documented
  recipe (16-bit md5 bucket mod B, add-alpha four-term log-ratio
  rounded 6dp, exact decimal per-doc sums);
* weights are DIRECTIONAL: documents drawn from the target
  distribution outscore documents from a disjoint vocabulary;
* buckets absent from the target stay finite (smoothing);
* Gumbel selection is deterministic, exact-k, rank-contiguous, and a
  doc's key does not depend on the other rows;
* validation failures are loud.
"""

from __future__ import annotations

import decimal
import hashlib
import math

import pytest

import pyspark.sql.functions as F

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from gene_level_metadata_pipeline_spark.session import get_spark

        _spark = get_spark("dsir")
    return _spark


B = 64  # small bucket count so collisions actually occur in the test


def _py_weights(raw, target, alpha=1.0):
    """Pure-Python replay of dsir_log_weights."""
    def grams(text):
        ws = text.split(" ")
        return ws + [f"{ws[i]} {ws[i+1]}" for i in range(len(ws) - 1)]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:4], 16) % B

    rb = [(i, bucket(g)) for i, t in raw for g in grams(t)]
    tb = [bucket(g) for _, t in target for g in grams(t)]
    rcnt: dict = {}
    for _, b in rb:
        rcnt[b] = rcnt.get(b, 0) + 1
    tcnt: dict = {}
    for b in tb:
        tcnt[b] = tcnt.get(b, 0) + 1
    rtot, ttot = len(rb), len(tb)
    term = {
        b: decimal.Decimal(
            f"{round(math.log(tcnt.get(b, 0) + alpha) - math.log(ttot + alpha * B) - math.log(rc + alpha) + math.log(rtot + alpha * B), 6):.6f}"
        )
        for b, rc in rcnt.items()
    }
    out: dict = {}
    for i, b in rb:
        out[i] = out.get(i, decimal.Decimal(0)) + term[b]
    return {i: float(v) for i, v in out.items()}


_RAW = [
    (1, "gene expression analysis of the knockout mouse model"),
    (2, "gene expression profile in the mutant mouse"),
    (3, "stock market prices fell sharply on tuesday trading"),
    (4, "market prices and trading volume on the exchange"),
    (5, "gene expression analysis of the knockout mouse model"),
]
_TARGET = [_RAW[0], _RAW[1]]  # biology-flavored target


def test_weights_match_python_replay():
    from gene_level_metadata_pipeline_spark.operators.selection import (
        dsir_log_weights,
    )

    spark = _get_spark()
    raw = spark.createDataFrame(_RAW, "doc_id bigint, text string")
    tgt = spark.createDataFrame(_TARGET, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["logw"]
        for r in dsir_log_weights(raw, tgt, "text", "doc_id", buckets=B).collect()
    }
    exp = _py_weights(_RAW, _TARGET)
    assert set(got) == set(exp)
    for i in exp:
        assert got[i] == pytest.approx(exp[i], abs=1e-9), f"doc {i}"


def test_weights_are_directional():
    from gene_level_metadata_pipeline_spark.operators.selection import (
        dsir_log_weights,
    )

    spark = _get_spark()
    raw = spark.createDataFrame(_RAW, "doc_id bigint, text string")
    tgt = spark.createDataFrame(_TARGET, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["logw"]
        for r in dsir_log_weights(raw, tgt, "text", "doc_id", buckets=B).collect()
    }
    bio = min(got[1], got[2], got[5])
    fin = max(got[3], got[4])
    assert bio > fin, got
    # off-target docs still get FINITE weights (smoothing)
    assert all(math.isfinite(v) for v in got.values())


def test_gumbel_select_contract():
    from gene_level_metadata_pipeline_spark.operators.selection import (
        dsir_gumbel_select,
        dsir_log_weights,
    )

    spark = _get_spark()
    raw = spark.createDataFrame(_RAW, "doc_id bigint, text string")
    tgt = spark.createDataFrame(_TARGET, "doc_id bigint, text string")
    w = dsir_log_weights(raw, tgt, "text", "doc_id", buckets=B)
    sel = dsir_gumbel_select(w, "doc_id", k=3).collect()
    assert [r["sample_rank"] for r in sorted(sel, key=lambda r: r["sample_rank"])] == [1, 2, 3]
    again = dsir_gumbel_select(w, "doc_id", k=3).collect()
    assert sorted(map(tuple, sel)) == sorted(map(tuple, again))
    # per-doc keys are independent of the rest of the frame: the top-3
    # of the full frame and the top-1 of the frame restricted to those
    # 3 ids agree on the winner
    ids = [r["doc_id"] for r in sel]
    sub = dsir_gumbel_select(
        w.where(F.col("doc_id").isin(ids)), "doc_id", k=1
    ).collect()
    best = min(sel, key=lambda r: r["sample_rank"])
    assert sub[0]["doc_id"] == best["doc_id"]
    assert sub[0]["sel_key"] == best["sel_key"]


def test_validation_fails_loud():
    from gene_level_metadata_pipeline_spark.operators.selection import (
        dsir_gumbel_select,
        dsir_log_weights,
    )

    spark = _get_spark()
    raw = spark.createDataFrame(_RAW, "doc_id bigint, text string")
    with pytest.raises(ValueError, match="buckets"):
        dsir_log_weights(raw, raw, "text", "doc_id", buckets=0)
    with pytest.raises(ValueError, match="alpha"):
        dsir_log_weights(raw, raw, "text", "doc_id", alpha=0)
    with pytest.raises(ValueError, match="k="):
        dsir_gumbel_select(raw.select("doc_id", F.lit(0.0).alias("logw")), "doc_id", k=0)
