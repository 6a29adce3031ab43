"""BM25 ranked retrieval (r10): textanalysis.bm25_topk.

* scores match a pure-Python decimal replay of the documented recipe
  (Lucene IDF rounded 6dp, fixed-order tf/length normalization,
  DECIMAL(18,6) term contributions, exact decimal sums);
* a query's own document ranks first (self-retrieval);
* a term appearing in every document still contributes positively
  (the +1 inside the log keeps IDF > 0);
* ranking is deterministic under score ties (lowest doc id);
* validation failures are loud.
"""

from __future__ import annotations

import decimal
import math

import pytest

import pyspark.sql.functions as F

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from gene_level_metadata_pipeline_spark.session import get_spark

        _spark = get_spark("bm25")
    return _spark


_DOCS = [
    (0, "gene expression in the mouse"),
    (1, "expression of the human gene in the liver"),
    (2, "stock market report for the quarter"),
    (3, "the mouse model of liver disease"),
    (4, "gene gene gene amplification"),
    (5, "completely unrelated words here"),
]


def _py_bm25(docs, queries, k1=1.2, b=0.75):
    toks = {i: [w for w in t.split(" ") if w] for i, t in docs}
    tf = {i: {} for i, _ in docs}
    for i, ws in toks.items():
        for w in ws:
            tf[i][w] = tf[i].get(w, 0) + 1
    dl = {i: len(ws) for i, ws in toks.items()}
    n = len(docs)
    avgdl = round(sum(dl.values()) / n, 6)
    df = {}
    for i in tf:
        for w in tf[i]:
            df[w] = df.get(w, 0) + 1
    out = {}
    for qid, qt in queries:
        qws = []
        for w in qt.split(" "):
            if w and w not in qws:
                qws.append(w)
        scores = {}
        for i in tf:
            s = decimal.Decimal(0)
            for w in qws:
                if w not in tf[i]:
                    continue
                idf = round(math.log(1.0 + (n - df[w] + 0.5) / (df[w] + 0.5)), 6)
                c = round(
                    idf * (tf[i][w] * (k1 + 1.0))
                    / (tf[i][w] + k1 * ((1.0 - b) + b * dl[i] / avgdl)),
                    6,
                )
                s += decimal.Decimal(f"{c:.6f}")
            if s:
                scores[i] = float(s)
        out[qid] = sorted(scores.items(), key=lambda t: (-t[1], t[0]))
    return out


def _run(k=10):
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        bm25_topk,
    )

    spark = _get_spark()
    docs = spark.createDataFrame(_DOCS, "doc_id bigint, text string")
    queries = docs.where(F.col("doc_id") < 2).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    return bm25_topk(docs, queries, "text", "doc_id", k=k).collect()


def test_matches_python_replay():
    got = _run()
    exp = _py_bm25(_DOCS, [(0, _DOCS[0][1]), (1, _DOCS[1][1])])
    for qid in (0, 1):
        rows = sorted(
            [r for r in got if r["query_id"] == qid], key=lambda r: r["rank"]
        )
        assert [(r["doc_id"], round(r["score"], 6)) for r in rows] == [
            (i, round(s, 6)) for i, s in exp[qid]
        ][: len(rows)]


def test_self_retrieval_ranks_first():
    got = _run()
    for qid in (0, 1):
        top = min(
            (r for r in got if r["query_id"] == qid), key=lambda r: r["rank"]
        )
        assert top["doc_id"] == qid


def test_ubiquitous_term_positive_idf():
    # 'the' appears in 5 of 6 docs; Lucene's +1 keeps its IDF positive,
    # so a query of just 'the' still retrieves (classic BM25 would go
    # negative at df > n/2)
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        bm25_topk,
    )

    spark = _get_spark()
    docs = spark.createDataFrame(_DOCS, "doc_id bigint, text string")
    q = spark.createDataFrame([(99, "the")], "query_id bigint, text string")
    rows = bm25_topk(docs, q, "text", "doc_id", k=10).collect()
    assert rows and all(r["score"] > 0 for r in rows)


def test_tie_breaks_on_lowest_doc_id():
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        bm25_topk,
    )

    spark = _get_spark()
    # two identical docs tie exactly; lower id must rank first
    docs = spark.createDataFrame(
        [(10, "alpha beta"), (11, "alpha beta"), (12, "gamma delta")],
        "doc_id bigint, text string",
    )
    q = spark.createDataFrame([(1, "alpha")], "query_id bigint, text string")
    rows = sorted(
        bm25_topk(docs, q, "text", "doc_id", k=5).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["doc_id"] for r in rows] == [10, 11]
    assert rows[0]["score"] == rows[1]["score"]


def test_validation_fails_loud():
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        bm25_topk,
    )

    spark = _get_spark()
    docs = spark.createDataFrame(_DOCS, "doc_id bigint, text string")
    q = docs.limit(1).select(F.col("doc_id").alias("query_id"), "text")
    with pytest.raises(ValueError, match="k="):
        bm25_topk(docs, q, "text", "doc_id", k=0)
    with pytest.raises(ValueError, match="k1"):
        bm25_topk(docs, q, "text", "doc_id", k1=-1)
    with pytest.raises(ValueError, match="k1|b"):
        bm25_topk(docs, q, "text", "doc_id", b=2.0)
