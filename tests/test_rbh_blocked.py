"""Distributed blocked-BLAS RBH tier (r10, VERDICT r9 item 2):

* blocked == exact on randomized panels/corpora even with tiny block
  sizes (many cross-block merges exercised);
* results are BIT-EQUAL across different chunkings (the partial-argmax
  merge is chunking-invariant);
* cross-block ties break globally on (cos desc, id asc);
* degenerate vectors (NULL / NaN / inf elements, zero norm, wrong dim)
  are excluded — the shared all-tier contract;
* empty panel/corpus return an empty frame with the right schema.
"""

from __future__ import annotations

import random

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from gene_level_metadata_pipeline_spark.session import get_spark

        _spark = get_spark("rbh-blocked")
    return _spark


def _pairs(qs, cs, **kw):
    from gene_level_metadata_pipeline_spark.operators.similarity import (
        reciprocal_best_hits,
    )

    return sorted(
        map(tuple, reciprocal_best_hits(qs, cs, **kw).collect())
    )


def _blocked(qs, cs, chunk_rows, pack_rows):
    from pyspark.sql import functions as F

    from gene_level_metadata_pipeline_spark.operators import similarity

    q = qs.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("__qv"),
    ).withColumn(
        "__qn",
        F.sqrt(similarity._dot(F.col("__qv"), F.col("__qv"))),
    )
    c = cs.select(
        F.col("vec_id").alias("corpus_id"),
        F.col("embedding").cast("array<double>").alias("__cv"),
    ).withColumn(
        "__cn",
        F.sqrt(similarity._dot(F.col("__cv"), F.col("__cv"))),
    )
    return sorted(map(tuple, similarity._rbh_blocked(
        q, c, chunk_rows=chunk_rows, pack_rows=pack_rows
    ).collect()))


def _random_vectors(spark, n, dim, seed, id_start=0):
    rnd = random.Random(seed)
    rows = [
        (id_start + i,
         [round(rnd.uniform(-1, 1), 3) for _ in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


def test_blocked_matches_exact_small_blocks():
    """60 queries x 90 corpus at chunk_rows=7 / pack_rows=11: every
    argmax must merge across many blocks, and the result must equal the
    certified exact tier's."""
    spark = _get_spark()
    qs = _random_vectors(spark, 60, 6, seed=1)
    cs = _random_vectors(spark, 90, 6, seed=2, id_start=1000)
    want = _pairs(qs, cs, method="exact")
    got = _blocked(qs, cs, chunk_rows=7, pack_rows=11)
    assert got == want and len(got) > 0


def test_blocked_chunking_invariant():
    spark = _get_spark()
    qs = _random_vectors(spark, 40, 5, seed=3)
    cs = _random_vectors(spark, 70, 5, seed=4, id_start=500)
    a = _blocked(qs, cs, chunk_rows=3, pack_rows=13)
    b = _blocked(qs, cs, chunk_rows=17, pack_rows=4)
    c = _blocked(qs, cs, chunk_rows=1_000_000, pack_rows=1_000_000)
    assert a == b == c and len(a) > 0


def test_blocked_method_and_explicit_dispatch():
    spark = _get_spark()
    qs = _random_vectors(spark, 12, 4, seed=5)
    cs = _random_vectors(spark, 20, 4, seed=6, id_start=100)
    assert _pairs(qs, cs, method="blocked") == _pairs(
        qs, cs, method="exact"
    )


def test_blocked_cross_block_tiebreak():
    """Three corpus vectors IDENTICAL to the query (cosine 1.0 each)
    land in different packs under hashing; the winner must be the
    smallest corpus id, exactly as the exact tier breaks ties."""
    spark = _get_spark()
    v = [1.0, 2.0, 3.0]
    qs = spark.createDataFrame(
        [(5, v)], "vec_id bigint, embedding array<double>"
    )
    cs = spark.createDataFrame(
        [(11, v), (12, v), (13, v), (14, [-1.0, 0.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    got = _blocked(qs, cs, chunk_rows=1, pack_rows=1)
    want = _pairs(qs, cs, method="exact")
    assert got == want == [(5, 11, 1.0)]


def test_blocked_excludes_degenerate_vectors():
    """NULL / NaN / inf elements, zero norm and wrong-dim rows are
    invisible on both sides — the all-tier degenerate contract."""
    spark = _get_spark()
    nan, inf = float("nan"), float("inf")
    qs = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, None),
            (3, [nan, 1.0]),
            (4, [0.0, 0.0]),
            (5, [1.0, 2.0, 3.0]),  # wrong dim (dim fixed by qid 1)
        ],
        "vec_id bigint, embedding array<double>",
    )
    cs = spark.createDataFrame(
        [
            (10, [1.0, 0.1]),
            (11, [inf, 1.0]),
            (12, [1.0, None]),
            (13, [0.0, 0.0]),
        ],
        "vec_id bigint, embedding array<double>",
    )
    got = _blocked(qs, cs, chunk_rows=2, pack_rows=2)
    want = _pairs(
        qs.where("vec_id = 1"), cs.where("vec_id = 10"), method="exact"
    )
    assert got == want and len(got) == 1


def test_blocked_empty_inputs():
    spark = _get_spark()
    qs = _random_vectors(spark, 0, 4, seed=7)
    cs = _random_vectors(spark, 5, 4, seed=8)
    assert _blocked(qs, cs, chunk_rows=2, pack_rows=2) == []
    assert _blocked(cs, qs, chunk_rows=2, pack_rows=2) == []
