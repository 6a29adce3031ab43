"""NULL content must never collapse in exact dedup.

groupBy (like SQL GROUP BY) puts every NULL in one group, so the naive
hash-groupBy dedup silently treated ALL documents with NULL text as
duplicates of each other — one survivor per corpus. The operators now
group NULL-text rows under a per-row surrogate: each keeps itself, with
a NULL fingerprint.
"""

from __future__ import annotations


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "same text", 10),
            (2, None, 20),
            (3, "same text", 30),
            (4, None, 40),
            (5, "other text", 50),
        ],
        "doc_id bigint, text string, prio int",
    )


def test_dedup_exact_keeps_every_null_text_row(spark):
    from gene_level_metadata_pipeline_spark.operators.dedup import dedup_exact

    out = dedup_exact(_docs(spark), "text", "doc_id").collect()
    by_id = {r.canonical_id: r for r in out}
    # the two NULL-text docs each survive as their own singleton group
    assert set(by_id) == {1, 2, 4, 5}
    assert by_id[2].fingerprint is None and by_id[2].n_copies == 1
    assert by_id[4].fingerprint is None and by_id[4].n_copies == 1
    # real duplicates still collapse
    assert by_id[1].n_copies == 2


def test_dedup_keep_best_keeps_every_null_text_row(spark):
    from gene_level_metadata_pipeline_spark.operators.dedup import (
        dedup_exact_keep_best,
    )

    out = dedup_exact_keep_best(
        _docs(spark), "text", id_col="doc_id", priority_col="prio"
    ).collect()
    keep_ids = sorted(r.keep_id for r in out)
    # dup group (1,3) -> 3 (higher prio); NULL rows 2 and 4 both kept
    assert keep_ids == [2, 3, 4, 5]
