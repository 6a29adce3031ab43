"""Property-based tests (SURVEY.md §5 item 3): for ANY source frame x,
harmonize(spine, x, key) satisfies the three spine invariants."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gene_level_metadata_pipeline_spark.operators.harmonize import harmonize, spine

keys = st.one_of(st.none(), st.sampled_from(["A", "B", "C", "D", "E"]))
vals = st.one_of(st.none(), st.integers(min_value=0, max_value=3))

master_rows = st.lists(st.tuples(keys), min_size=1, max_size=12)
source_rows = st.lists(st.tuples(keys, vals), min_size=0, max_size=15)

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from gene_level_metadata_pipeline_spark.session import get_spark

        _spark = get_spark("property-tests")
    return _spark


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(master=master_rows, source=source_rows)
def test_spine_invariants(master, source):
    spark = _get_spark()
    mdf = spark.createDataFrame(master, "key: string")
    sdf = spark.createDataFrame(source, "key: string, val: int")
    spn = spine(mdf, "key")
    out = harmonize(spn, sdf, "key")
    rows = out.collect()

    spine_keys = {k for (k,) in master if k is not None}
    out_keys = {r["key"] for r in rows}

    # (a) output keyset == spine keyset (no source-only keys, none lost)
    assert out_keys == spine_keys

    # (b) keys absent from source appear exactly once, NULL-padded
    src_keys = {k for k, _ in source if k is not None}
    for k in spine_keys - src_keys:
        padded = [r for r in rows if r["key"] == k]
        assert len(padded) == 1 and padded[0]["val"] is None

    # (c) no duplicate full rows
    tuples = [tuple(r) for r in rows]
    assert len(tuples) == len(set(tuples))

    # (d) fan-out: every distinct (key, val) of a spine key survives
    distinct_src = {(k, v) for k, v in source if k in spine_keys}
    got = {(r["key"], r["val"]) for r in rows if r["val"] is not None}
    assert {(k, v) for k, v in distinct_src if v is not None} == got
