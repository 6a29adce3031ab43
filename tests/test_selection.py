"""Distributed prefix sum, budget selection, and sequence packing.

The load-bearing claim of operators/selection.py is that the two-phase
running sum (range repartition + per-partition cumsum + broadcast offsets)
equals the naive global window REGARDLESS of the physical partition count —
these tests pin that invariant at several partition counts, including more
partitions than rows.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gene_level_metadata_pipeline_spark.operators.selection import (
    budget_select,
    pack_sequences,
    running_sum,
)


def _docs(spark):
    rows = [(i, (i * 37) % 19 + 1) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_running_sum_matches_global_window_any_partitioning(spark):
    df = _docs(spark)
    naive = {
        r.doc_id: r.rt
        for r in df.withColumn(
            "rt",
            F.sum(F.col("n_tokens").cast("decimal(28,6)")).over(
                Window.orderBy("doc_id")
            ),
        ).collect()
    }
    for n in (1, 3, 8, 300):
        got = {
            r.doc_id: r.running_total
            for r in running_sum(
                df, ["doc_id"], "n_tokens", num_partitions=n
            ).collect()
        }
        assert got == naive, f"mismatch at num_partitions={n}"


def test_running_sum_descending_order(spark):
    df = _docs(spark)
    out = running_sum(
        df, [F.col("doc_id").desc()], "n_tokens", num_partitions=4
    ).collect()
    ordered = sorted(out, key=lambda r: -r.doc_id)
    acc = 0
    for r in ordered:
        acc += r.n_tokens
        assert int(r.running_total) == acc


def test_budget_select_inclusive_boundary(spark):
    df = _docs(spark)
    rows = sorted(
        budget_select(df, ["doc_id"], "n_tokens", 100).collect(),
        key=lambda r: r.doc_id,
    )
    # every selected prefix stays within budget...
    assert all(int(r.running_total) <= 100 for r in rows)
    # ...and the selection is a contiguous prefix: adding the next doc
    # in order would break the budget.
    all_rows = sorted(df.collect(), key=lambda r: r.doc_id)
    k = len(rows)
    assert [r.doc_id for r in rows] == [r.doc_id for r in all_rows[:k]]
    assert sum(r.n_tokens for r in all_rows[: k + 1]) > 100


def test_pack_sequences_bins_monotone_and_bounded(spark):
    df = _docs(spark)
    out = sorted(
        pack_sequences(df, ["doc_id"], "n_tokens", 64).collect(),
        key=lambda r: r.doc_id,
    )
    # bins are nondecreasing in document order and start at 0
    bins = [r.bin_id for r in out]
    assert bins[0] == 0
    assert all(b2 >= b1 for b1, b2 in zip(bins, bins[1:]))
    # each bin holds <= 64 tokens before its last (possibly straddling) doc
    from collections import defaultdict

    per_bin = defaultdict(list)
    for r in out:
        per_bin[r.bin_id].append(r.n_tokens)
    for _b, sizes in per_bin.items():
        assert sum(sizes[:-1]) < 64


def test_corpus_shuffle_partition_independent(spark):
    """Shuffle positions must be identical whatever the physical split,
    and re-salting must produce a different (but still deterministic)
    order."""
    from gene_level_metadata_pipeline_spark.operators.selection import (
        corpus_shuffle,
    )

    df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["shuffle_pos"]
         for r in corpus_shuffle(df.repartition(2), "doc_id").collect()}
    b = {r["doc_id"]: r["shuffle_pos"]
         for r in corpus_shuffle(df.repartition(17), "doc_id").collect()}
    assert a == b
    assert sorted(a.values()) == list(range(1, 201))  # dense 1..N
    epoch1 = {r["doc_id"]: r["shuffle_pos"]
              for r in corpus_shuffle(df, "doc_id", salt="epoch1").collect()}
    assert epoch1 != a                       # different epoch, different order
    assert sorted(epoch1.values()) == list(range(1, 201))


def test_materialize_packed_order_partition_independent(spark):
    """Packed text must be byte-identical whatever the physical split."""
    from gene_level_metadata_pipeline_spark.operators.selection import (
        materialize_packed,
    )

    df = spark.createDataFrame(
        [(0, 3, "cc"), (0, 1, "aa"), (0, 2, "bb"), (1, 9, "zz")],
        ["bin_id", "doc_id", "text"],
    )
    a = {r["bin"]: (r["n_docs"], r["packed_text"])
         for r in materialize_packed(df.repartition(1), "bin_id",
                                     ["doc_id"], "text").collect()}
    b = {r["bin"]: (r["n_docs"], r["packed_text"])
         for r in materialize_packed(df.repartition(7), "bin_id",
                                     ["doc_id"], "text").collect()}
    assert a == b == {
        0: (3, "aa<|eos|>bb<|eos|>cc"),
        1: (1, "zz"),
    }


def test_temperature_rates_compose_with_mixture_sample(spark):
    """alpha=0.5 upsamples small strata toward a flat mix, and the rate
    table drives mixture_sample directly (bounded per-domain collect)."""
    from pyspark.sql import functions as F

    from gene_level_metadata_pipeline_spark.operators.selection import (
        mixture_sample,
        temperature_mixture_rates,
    )

    df = spark.range(1100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1000, "big").otherwise("small").alias("dom"),
    )
    rates = {
        r.stratum: r.sample_rate
        for r in temperature_mixture_rates(df, "dom", alpha=0.5).collect()
    }
    # smallest stratum at rate 1.0; big stratum at sqrt(100/1000)
    assert rates["small"] == 1.0
    assert rates["big"] == round((100 / 1000) ** 0.5, 6)

    kept = mixture_sample(df, "doc_id", "dom", rates, salt="t").groupBy(
        "dom"
    ).count().collect()
    got = {r.dom: r["count"] for r in kept}
    assert got["small"] == 100  # rate 1.0 keeps everything
    # hash-Bernoulli at ~31.6% of 1000: generous deterministic bounds
    assert 250 < got["big"] < 400
    # alpha=1 keeps natural proportions: every rate 1.0
    flat = {
        r.stratum: r.sample_rate
        for r in temperature_mixture_rates(df, "dom", alpha=1.0).collect()
    }
    assert set(flat.values()) == {1.0}


def test_train_split_zero_test_fraction(spark):
    """fractions (0.9, 0.1, 0.0): the cumulative bound hits 1.0, which
    used to format to NINE hex chars and silently leak most of the val
    band into test. Now every row lands in train or val only."""
    from pyspark.sql import functions as F

    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        train_split,
    )

    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    got = {
        r.split: r["count"]
        for r in train_split(df, "doc_id", fractions=(0.9, 0.1, 0.0))
        .groupBy("split").count().collect()
    }
    assert "test" not in got
    assert got["train"] + got["val"] == 2000
    assert 1700 < got["train"] < 1900  # ~90% under hash-Bernoulli


def test_stratified_take_exact_k_and_nested(spark):
    """stratified_take: exactly min(k, |stratum|) rows per stratum, the
    k-sample is a strict prefix of the (k+m)-sample (nested-sample
    property), selection is partitioning-invariant, and k < 1 raises."""
    import pytest
    from pyspark.sql import functions as F

    from gene_level_metadata_pipeline_spark.operators.selection import (
        stratified_take,
    )

    rows = [(i, "a") for i in range(40)] + [(100 + i, "b") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    k5 = {(r["doc_id"]) for r in stratified_take(df, "doc_id", "lang", 5).collect()}
    sizes = {
        r["lang"]: r["n"]
        for r in stratified_take(df, "doc_id", "lang", 5)
        .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sizes == {"a": 5, "b": 3}  # small stratum keeps all it has

    k8 = {(r["doc_id"]) for r in stratified_take(df, "doc_id", "lang", 8).collect()}
    assert k5 <= k8  # nested samples

    rep = {(r["doc_id"]) for r in stratified_take(
        df.repartition(13), "doc_id", "lang", 5).collect()}
    assert rep == k5  # partitioning-invariant

    with pytest.raises(ValueError, match="k=0"):
        stratified_take(df, "doc_id", "lang", 0)


def test_weighted_take_k_bias_and_contract(spark):
    """Weight bias is real: across 40 salts, a row with 50x the weight
    of its 9 peers must win far more often than uniform; NULL/zero/
    negative weights are unsampleable; the plan is TakeOrdered (no
    global sort); k < 1 raises."""
    import pytest
    from pyspark.sql import functions as F

    from gene_level_metadata_pipeline_spark.operators.selection import (
        weighted_take_k,
    )

    rows = [(i, 1.0) for i in range(9)] + [(9, 50.0),
                                           (10, None), (11, 0.0), (12, -3.0)]
    df = spark.createDataFrame(rows, "id long, w double")
    wins = 0
    for s in range(40):
        got = weighted_take_k(df, "id", "w", k=1, salt=f"s{s}").collect()
        assert len(got) == 1 and got[0]["id"] <= 9  # 10-12 never sampled
        wins += got[0]["id"] == 9
    # P(heavy wins) = 50/59 ~ 0.85; 40 draws below 20 is astronomically
    # unlikely (and deterministic given the fixed salts anyway)
    assert wins >= 20

    out = weighted_take_k(df, "id", "w", k=100).collect()
    assert len(out) == 10  # only positive-weight rows are sampleable

    plan = weighted_take_k(
        df, "id", "w", k=5
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan

    with pytest.raises(ValueError, match="k=0"):
        weighted_take_k(df, "id", "w", k=0)


def test_stratified_weighted_take_budgets_and_nesting(spark):
    """Exact per-stratum budgets, weight bias within the stratum, NULL
    stratum forms its own group, and growing k only ADDS rows (nested
    samples)."""
    from pyspark.sql import functions as F

    from gene_level_metadata_pipeline_spark.operators.selection import (
        stratified_weighted_take,
    )

    rows = [(i, "en" if i < 40 else None, 1.0 + 9.0 * (i % 2)) for i in range(80)]
    df = spark.createDataFrame(rows, "id long, lang string, w double")
    out = stratified_weighted_take(df, "id", "lang", "w", k=10)
    got = {r["lang"]: 0 for r in out.collect()}
    for r in out.collect():
        got[r["lang"]] += 1
    assert got == {"en": 10, None: 10}
    # heavy rows (w=10) should dominate the selection
    heavy = sum(1 for r in out.collect() if r["w"] == 10.0)
    assert heavy >= 14  # 20 picks, ~10:1 odds per pick
    s5 = {r["id"] for r in
          stratified_weighted_take(df, "id", "lang", "w", k=5).collect()}
    s10 = {r["id"] for r in out.collect()}
    assert s5 <= s10  # nested


def test_running_sum_consistent_at_sampling_scale(spark):
    """Regression for the sf0.1 ks_value_drift corruption: with enough
    rows that repartitionByRange SAMPLES its bounds (rather than seeing
    every row), the offsets aggregate and the main join must observe
    the SAME partitioning — before the lazy-localCheckpoint pin, the
    two evaluations could draw different sampled bounds, mislabel
    _pid, and silently corrupt ~30% of prefix sums. 40k rows in a
    multi-partition source reproduces the regime; three repeats guard
    against the nondeterminism masking itself."""
    n = 40_000
    df = (
        spark.range(n)
        .repartition(16)
        .select(
            F.col("id").alias("k"),
            ((F.col("id") * 37) % 19 + 1).alias("w"),
        )
    )
    for _ in range(3):
        out = running_sum(df, ["k"], "w", out_col="rt")
        rows = out.select("k", "rt").collect()
        got = {r["k"]: int(r["rt"]) for r in rows}
        acc = 0
        for k in range(n):
            acc += (k * 37) % 19 + 1
            assert got[k] == acc, f"prefix sum wrong at k={k}"


def test_pack_concat_chunks_partitions_the_token_stream(spark):
    """r9: every span row partitions its document contiguously, every
    interior window holds EXACTLY `window` tokens (zero padding waste),
    the final window holds the remainder, and is_split marks exactly
    the documents emitting >1 span. Includes a zero-token doc (must
    vanish) and docs far larger than the window (multi-split)."""
    from collections import defaultdict

    from gene_level_metadata_pipeline_spark.operators.selection import (
        pack_concat_chunks,
    )

    rows = [(1, 5), (2, 0), (3, 23), (4, 7), (5, 1), (6, 40), (7, 4)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_concat_chunks(df, [F.col("doc_id")], "n_tokens", 8).collect()
    total = sum(n for _, n in rows)
    by_win = defaultdict(int)
    by_doc = defaultdict(list)
    for r in out:
        by_win[r["window_id"]] += r["tok_len"]
        by_doc[r["doc_id"]].append((r["tok_start"], r["tok_len"],
                                    r["is_split"]))
    assert 2 not in by_doc  # zero-token doc emits nothing
    n_windows = (total + 7) // 8
    assert sorted(by_win) == list(range(n_windows))
    for w, tks in by_win.items():
        assert tks == (8 if w < n_windows - 1 else total - 8 * w), w
    sizes = dict(rows)
    for doc, spans in by_doc.items():
        spans.sort()
        # spans tile [0, n) contiguously
        pos = 0
        for start, ln, split in spans:
            assert start == pos and ln >= 1
            assert split == (len(spans) > 1)
            pos += ln
        assert pos == sizes[doc]


def test_pack_concat_chunks_validates_window(spark):
    import pytest

    from gene_level_metadata_pipeline_spark.operators.selection import (
        pack_concat_chunks,
    )

    df = spark.createDataFrame([(1, 3)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError, match="window"):
        pack_concat_chunks(df, [F.col("doc_id")], "n_tokens", 0)


def test_materialize_chunks_interior_windows_exactly_full(spark):
    """r9 gather stage: every interior window's assembled text holds
    exactly `window` whitespace tokens, in stream order across split
    document boundaries."""
    from gene_level_metadata_pipeline_spark.operators.selection import (
        materialize_chunks,
        pack_concat_chunks,
    )

    rows = [(i, " ".join(f"d{i}t{j}" for j in range((i * 13) % 9 + 1)))
            for i in range(1, 31)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    counted = docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda x: x != ""))
        .cast("long").alias("n_tokens"),
    )
    mapping = pack_concat_chunks(counted, [F.col("doc_id")], "n_tokens", 7)
    out = {r["window_id"]: r for r in
           materialize_chunks(mapping, docs).collect()}
    total = sum((i * 13) % 9 + 1 for i in range(1, 31))
    n_windows = (total + 6) // 7
    assert sorted(out) == list(range(n_windows))
    stream = [t for _, text in rows for t in text.split(" ")]
    pos = 0
    for w in range(n_windows):
        toks = out[w]["window_text"].split(" ")
        want = stream[pos:pos + 7]
        assert toks == want, w
        assert out[w]["n_tokens"] == len(want)
        pos += len(want)


def test_materialize_chunks_non_id_order_stream_correct(spark):
    """ADVICE r9 (medium): the mapping carries win_off — the span's
    stream offset within its window — and the gather stage sorts on it,
    so window_text is in TRUE stream order even when the pack order_by
    is not ascending doc_id. The old doc-id sort scrambled exactly this
    case (quality-descending pack where id order inverts stream order)."""
    from gene_level_metadata_pipeline_spark.operators.selection import (
        materialize_chunks,
        pack_concat_chunks,
    )

    # quality DESC order reverses doc-id order: stream = doc 4,3,2,1
    rows = [
        (1, 1.0, "a1 a2 a3"),
        (2, 2.0, "b1 b2 b3 b4 b5"),
        (3, 3.0, "c1 c2"),
        (4, 4.0, "d1 d2 d3 d4"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, quality double, text string"
    )
    counted = docs.select(
        "doc_id", "quality",
        F.size(F.filter(F.split("text", " "), lambda x: x != ""))
        .cast("long").alias("n_tokens"),
    )
    order = [F.col("quality").desc(), F.col("doc_id")]
    mapping = pack_concat_chunks(counted, order, "n_tokens", 5)
    out = {r["window_id"]: r for r in
           materialize_chunks(mapping, docs).collect()}
    stream = [t for _, _, text in sorted(rows, key=lambda r: (-r[1], r[0]))
              for t in text.split(" ")]
    pos = 0
    for w in sorted(out):
        toks = out[w]["window_text"].split(" ")
        want = stream[pos:pos + 5]
        assert toks == want, (w, toks, want)
        pos += len(want)
    assert pos == len(stream)


def test_materialize_chunks_requires_win_off(spark):
    import pytest

    from gene_level_metadata_pipeline_spark.operators.selection import (
        materialize_chunks,
    )

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    legacy = spark.createDataFrame(
        [(0, 1, 0, 2, False)],
        "window_id long, doc_id long, tok_start long, tok_len long, "
        "is_split boolean",
    )
    with pytest.raises(ValueError, match="win_off"):
        materialize_chunks(legacy, docs)
