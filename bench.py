"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1), local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec},
 "sf": ...}.

The stdout line is SIZE-BOUNDED (<1.4 KB at any headline count): it
always carries the totals, control fields, n_queries, and a sha256 of
bench_detail.json; "queries" holds only the most expensive entries that
fit, with the rest counted in "queries_omitted". The COMPLETE per-query
min+median tables live in bench_detail.json (committed per round).

Each query is forced with a noop-sink write (DataSource V2 "noop"): every
column is fully computed and materialized executor-side with zero driver
transfer — unlike .count(), which lets Catalyst prune projection-only
work (PLANS.md lesson 4). A warmup action amortizes JVM/session startup
out of the measured numbers.

Each query runs REPS (3) times: ``queries`` carries the per-query MIN
(the stable estimator of plan cost under ambient load — comparable with
earlier rounds' numbers) and ``queries_median`` the median, so a
round-over-round swing can be read against within-round variance before
anyone chases it (VERDICT r2: five shared queries swung >25% on single
runs).

Ambient calibration (VERDICT r6 task 2): the driver's BENCH floor
shifted +15-20% on byte-identical code two rounds running, and
attributing it took manual isolation reps every time. Every bench run
now brackets the suite with a fixed CONTROL query
(ann_brute_force_topk — the stable dense-scan shape tools/ab_ann.py
already uses as its A/B control) and records 1-minute load averages:
``control_pre``/``control_post`` (sorted reps, before/after the suite)
and ``load_start``/``load_end`` land in BOTH the stdout line and
bench_detail.json. To compare rounds, deflate by the control ratio —
if control_sec moved with the totals, the host floor shifted, not the
code.

Per-query ambient control (VERDICT r10 item 1): the bracketing pair
detects a floor shift between rounds but not a MID-SUITE load wave, so
one control rep additionally runs interleaved before every
CONTROL_EVERY-th headline query. bench_detail.json carries the trace
(``control_trace``), each query's nearest control rep
(``queries_nearest_control``) and a deflated per-query table
(``queries_deflated`` — see :func:`_deflated_queries`); the stdout line
adds only a scalar ``control_trace_spread`` (max/min over the trace).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "spine_harmonize",
    "tpch_q1_pricing",
    "tpch_q3_topk",
    "tpch_q5_region",
    "tpch_q6_forecast",
    "melt_metrics",
    "events_hourly",
    "sessionize",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "ann_brute_force_topk",
    "ann_ivf_kmeans_topk",
    "text_lang_id",
    "text_quality",
    "asof_join_events",
    "hierarchical_rollup",
    "dedup_components",
    "text_tfidf_keywords",
    "tpch_q8_market_share",
    "text_repetition",
    "text_contamination",
    "window_time_range",
    "curation_pipeline",
    "validate_constraints",
    "substring_dup_spans",
    "encode_documents",
    "inverted_index",
    "token_budget_select",
    "corpus_shuffle_order",
    "training_corpus_pipeline",
    "mixture_sample_langs",
    "text_bigram_lift",
    "pagerank_suppliers",
    "zorder_stats",
    "near_dup_pairs",
    "web_curation_pipeline",
    "harmonize_multi_source",
    "rolling_zscore_anomalies",
    "funnel_conversion",
    "event_transition_matrix",
    "ab_metric_ztest",
    "harmonize_catalog_width",
    "lm_quality_scores",
    "corpus_overlap_est",
    "graph_bfs_hops",
    "attribution_last_touch",
    "abc_parts_pareto",
    "basket_part_lift",
    "gaps_islands_hours",
    "correlation_matrix_daily",
    # r5 batch-2/3 flagships: tokenizer train/apply, lakehouse CDC,
    # vocabulary-free featurizer, survivorship, interval overlap,
    # decay attribution
    "bpe_train_merges",
    "bpe_encode_docs",
    "cdc_apply_orders",
    "feature_hash_docs",
    "golden_record_docs",
    "interval_overlap_sessions",
    "attribution_time_decay",
    # r6 flagships: batched tokenizer training (rounds-axis scale path),
    # self-mitigating skew join, trained-LR curation classifier
    "bpe_train_batched",
    "decorate_hot_status",
    "classifier_lr_scores",
    # r6 batch 2: synchronous LPA communities (iterative graph surface),
    # grid-bucketed 2-D NN join (density-local spatial surface)
    "graph_label_propagation",
    "ann_grid_nn_2d",
    # r7 flagships: PPJoin with length+positional filters (the candidate
    # count dropped 3.4x this round — the bench row tracks it), MOSS
    # winnowing overlap, MW mixture training loop, dedup policy curve
    "dedup_set_similarity_exact",
    "winnow_overlap_pairs",
    "mixture_reweight_mw",
    "dedup_threshold_curve",
    # r7 sitting-2 flagships: fixed-round k-truss (wedge-join iterative
    # surface), grid DBSCAN (density clustering over the certified CC
    # operator), exact Kneser-Ney LM training, distributed BH FDR
    # (prefix-count rank + suffix-min, no global window), join-view IVM
    "graph_truss_peel",
    "dbscan_clusters_2d",
    "kneser_ney_bigram_lm",
    "fdr_bh_adjust",
    "ivm_join_view",
    # r9 flagships: pure-stdlib JPEG decode (Catalyst-built payloads +
    # Arrow-batched Huffman/IDCT), MJPEG-AVI frame sampling on the same
    # core, and the LSH star policy for oversized buckets
    "image_jpeg_decode",
    "video_mjpeg_frames",
    "dedup_minhash_lsh_star",
    # r9 batch 2: exact concat-and-chunk packing (mapping + end-to-end
    # window materialization — the pretraining batch shape)
    "pack_concat_chunks",
    "pack_chunk_windows",
    # r10 flagship: perceptual-hash image near-dup — aHash off the
    # decoded luma plane feeding the shared banded-LSH cap/star core,
    # exact 64-bit Hamming confirm on candidates only
    "image_phash_near_dup",
    # r10 batch 2: one-permutation minhash (1 md5/shingle vs ceil(k/4)
    # — the LSH hashing-cost lever), PQ ADC top-k (train + encode +
    # asymmetric-distance scan, the 64x-compressed ANN tier), DSIR
    # importance-resampling selection (hashed-ngram LLR + Gumbel top-k)
    "dedup_minhash_oph",
    "ann_pq_adc_topk",
    "dsir_select_en",
]

REPS = 3
CONTROL = "ann_brute_force_topk"
CONTROL_REPS = 3
# One control rep runs interleaved before every CONTROL_EVERY-th headline
# query (plus once after the last): the bracketing control_pre/control_post
# pair detects a floor SHIFT between rounds but not a mid-suite load wave
# (VERDICT r10: a load-16 wave inflated every query 1.8x while the
# bracketing controls only caught 2x at the edges). The trace localizes
# contamination to the queries it actually hit; ~11 extra control reps
# cost a few seconds and are NOT part of any query's timing.
CONTROL_EVERY = 8

# Family buckets for the round-over-round regression verdict: default
# is the name's first token; the overrides merge spiritual families the
# prefix rule would split (VERDICT r8 item 8 — the ambient-floor
# adjudication used to be manual prose in PLANS.md every round).
_FAMILY_OVERRIDES = {
    "pagerank": "graph", "dbscan": "graph",
    "near": "dedup", "substring": "dedup", "winnow": "dedup",
    "rbh": "ann", "encode": "text", "inverted": "text",
    "kneser": "text", "lm": "text", "bpe": "text", "feature": "text",
    "corpus": "selection", "token": "selection", "mixture": "selection",
    "zorder": "selection", "classifier": "selection", "dsir": "selection",
    "curation": "pipeline", "training": "pipeline", "web": "pipeline",
    "golden": "pipeline", "validate": "pipeline",
    "spine": "harmonize", "melt": "reshape",
    "cdc": "ivm", "ivm": "ivm",
    "rolling": "windows", "funnel": "windows", "event": "windows",
    "gaps": "windows", "attribution": "windows", "window": "windows",
    "sessionize": "windows", "interval": "windows", "asof": "windows",
    "hierarchical": "windows", "abc": "windows", "basket": "windows",
    "correlation": "windows", "decorate": "windows",
    "ab": "stats", "fdr": "stats", "isotonic": "stats",
}


def _family(name: str) -> str:
    head = name.split("_", 1)[0]
    return _FAMILY_OVERRIDES.get(head, head)


def _family_regression(
    times: dict[str, float], control_sec: float, prev_path: str
) -> dict:
    """Round-over-round per-family verdict, CONTROL-DEFLATED: for every
    family, ratio = (sum of this run's per-query mins over the queries
    SHARED with the previous committed bench_detail.json) / (previous
    sum), divided by the control ratio (this control_sec / previous) so
    a host-floor shift deflates out instead of reading as a code
    regression — the adjudication rule PLANS.md has applied manually
    since r6, now machine-emitted with the run itself."""
    try:
        with open(prev_path) as f:
            prev = json.load(f)
        prev_times = prev["queries"]
        # the MEDIAN of the bracketing control reps, not the min: two
        # back-to-back same-code runs showed the min-of-6 estimator
        # drifting ~20% while the medians stayed put, inflating every
        # deflated ratio and flagging untouched families (r9) — the
        # min is the right estimator for PLAN cost, the median for the
        # HOST floor. Falls back to control_sec for pre-r9 details.
        prev_reps = sorted(
            prev.get("control_pre", []) + prev.get("control_post", [])
        )
        prev_control = (
            prev_reps[len(prev_reps) // 2] if prev_reps
            else float(prev["control_sec"])
        )
    except Exception:  # noqa: BLE001 — first run / missing / corrupt
        return {"available": False, "reason": "no previous bench_detail"}
    deflator = (control_sec / prev_control) if prev_control > 0 else 1.0
    fams: dict[str, list] = {}
    for name, sec in times.items():
        if name not in prev_times:
            continue  # new query this round: no previous to compare
        fams.setdefault(_family(name), [0.0, 0.0])
        fams[_family(name)][0] += sec
        fams[_family(name)][1] += prev_times[name]
    ratios = {
        fam: round((now / before) / deflator, 3)
        for fam, (now, before) in sorted(fams.items())
        if before > 0
    }
    # a family regresses when BOTH hold: deflated ratio > 1.25 AND the
    # deflated absolute increase exceeds half a second — single-query
    # sub-second families otherwise flag on 0.2s scheduling noise
    # (measured on back-to-back same-code runs, r9)
    regressed = sorted(
        f for f, r in ratios.items()
        if r > 1.25
        and (fams[f][0] / deflator) - fams[f][1] > 0.5
    )
    return {
        "available": True,
        "control_deflator": round(deflator, 3),
        "ratio_vs_prev_deflated": ratios,
        "regressed_families": regressed,
        "n_shared_queries": sum(
            1 for n in times if n in prev_times
        ),
    }


def _deflated_queries(
    times: dict[str, float],
    headline: list[str],
    trace: list[dict],
) -> tuple[dict[str, float], dict[str, float], float]:
    """Per-query ambient deflation from the interleaved control trace
    (VERDICT r10 item 1). For each query, ``nearest`` is the control rep
    closest in suite position (ties to the earlier one); ``deflated`` =
    min_sec x (trace MIN / nearest) — i.e. what the query would have
    read had its neighborhood run at the run's QUIETEST observed floor
    (the same estimator philosophy as the per-query min-of-reps: the
    quietest reading is the plan-cost one). A mid-suite load wave
    inflates the nearby control rep the same way it inflates the query,
    so the ratio cancels it; nearest-by-position is a coarse localizer
    (a wave edge inside one CONTROL_EVERY window blurs), so treat
    ``deflated`` as the adjudication table and ``times`` as ground
    truth. Cross-ROUND comparisons still deflate once more by the
    cross-round control ratio (the _family_regression discipline).
    Returns (nearest_control, deflated, trace_floor)."""
    nearest_out: dict[str, float] = {}
    deflated_out: dict[str, float] = {}
    if not trace:
        return nearest_out, deflated_out, 0.0
    floor = min(t["sec"] for t in trace)
    for qi, name in enumerate(headline):
        if name not in times:
            continue
        near = min(trace, key=lambda t: (abs(t["at"] - (qi + 0.5)), t["at"]))
        nearest_out[name] = near["sec"]
        deflated_out[name] = (
            round(times[name] * floor / near["sec"], 3)
            if near["sec"] > 0
            else times[name]
        )
    return nearest_out, deflated_out, floor


def _loadavg_1m() -> float:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover - platform without getloadavg
        return -1.0


def main() -> None:
    from gene_level_metadata_pipeline_spark.plans import driver_queries as dq
    from gene_level_metadata_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: touch the biggest table so FS cache + codegen paths are hot,
    # then run the FIRST headline query once untimed — the first noop-sink
    # write of a session pays one-off costs (noop DataSource V2 classload,
    # codegen compiler warmup, broadcast-thread-pool spinup) that were
    # otherwise billed to whichever query ran first (VERDICT r3: the
    # spine_harmonize "regression" was exactly this)
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    dq.QUERIES[HEADLINE[0]](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    def run_control() -> list[float]:
        runs = []
        for _ in range(CONTROL_REPS):
            t0 = time.time()
            dq.QUERIES[CONTROL](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 3))
        return sorted(runs)

    load_start = _loadavg_1m()
    control_pre = run_control()

    def control_rep() -> float:
        t0 = time.time()
        dq.QUERIES[CONTROL](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.time() - t0, 3)

    times: dict[str, float] = {}
    medians: dict[str, float] = {}
    control_trace: list[dict] = []
    for qi, name in enumerate(HEADLINE):
        # interleaved ambient control (VERDICT r10 item 1): one control
        # rep every CONTROL_EVERY queries, timed OUTSIDE every query's
        # reps, so a mid-suite load wave can be localized per query
        if qi % CONTROL_EVERY == 0:
            control_trace.append({"at": qi, "sec": control_rep()})
        fn = dq.QUERIES[name]
        runs: list[float] = []
        for _ in range(REPS):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        runs.sort()
        times[name] = round(runs[0], 3)
        medians[name] = round(runs[len(runs) // 2], 3)
    control_trace.append({"at": len(HEADLINE), "sec": control_rep()})

    control_post = run_control()
    load_end = _loadavg_1m()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    detail = {
        "metric": "headline_queries_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "queries_median": medians,
        "sf": float(sf),
        "reps": REPS,
        # ambient calibration: fixed control query bracketing the suite
        # + 1-min load averages; deflate cross-round totals by
        # control_sec before attributing a swing to code
        "control_query": CONTROL,
        "control_sec": min(control_pre + control_post),
        "control_pre": control_pre,
        "control_post": control_post,
        "load_start": load_start,
        "load_end": load_end,
    }
    # per-query ambient control (VERDICT r10 item 1): the interleaved
    # trace, each query's nearest control rep, and the deflated table —
    # detail-file additions only; the stdout line stays key-compatible
    nearest, deflated, trace_floor = _deflated_queries(
        times, HEADLINE, control_trace
    )
    detail["control_every"] = CONTROL_EVERY
    detail["control_trace"] = control_trace
    detail["control_trace_floor"] = trace_floor
    detail["queries_nearest_control"] = nearest
    detail["queries_deflated"] = deflated
    detail["value_deflated"] = round(sum(deflated.values()), 3)
    # The driver tail-captures stdout and parses the last line as JSON;
    # the r7 line (73 queries, medians stripped) STILL outgrew the tail
    # window -> "parsed": null (VERDICT r7 item 2). So the stdout line
    # is now SIZE-BOUNDED at any headline count: full detail always
    # goes to bench_detail.json on disk; the stdout line carries the
    # totals/control fields, a sha256 of the detail file to bind the
    # two, and only as many per-query entries (most expensive first) as
    # fit under STDOUT_BUDGET bytes, with the overflow counted in
    # "queries_omitted".
    import hashlib

    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_detail.json"
    )
    # the previous committed detail is the comparison baseline — read
    # it BEFORE overwriting (VERDICT r8 item 8). This run's control
    # statistic is the MEDIAN of the bracketing reps (see
    # _family_regression's rationale)
    now_reps = sorted(control_pre + control_post)
    detail["family_regression"] = _family_regression(
        times, now_reps[len(now_reps) // 2], detail_path
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    with open(detail_path, "rb") as f:
        detail_sha = hashlib.sha256(f.read()).hexdigest()[:16]

    STDOUT_BUDGET = 1400  # bytes; driver tail capture is ~1.5-2 KB
    compact = {
        k: v for k, v in detail.items()
        if k not in (
            "queries", "queries_median", "family_regression",
            "control_trace", "queries_nearest_control", "queries_deflated",
        )
    }
    # one-line wave summary: max/min over the interleaved control trace
    # (1.0 = flat floor; >1.5 = the run caught a load wave — read
    # bench_detail.json's queries_deflated before comparing rounds)
    trace_secs = [t["sec"] for t in control_trace if t["sec"] > 0]
    compact["control_trace_spread"] = (
        round(max(trace_secs) / min(trace_secs), 2) if trace_secs else None
    )
    # the stdout line carries only the VERDICT of the family comparison
    # (regressed list + deflator); the full per-family ratio table lives
    # in bench_detail.json, bound by the sha below
    freg = detail["family_regression"]
    compact["regressed_families"] = freg.get("regressed_families", [])
    compact["control_deflator"] = freg.get("control_deflator")
    compact["n_queries"] = len(times)
    compact["detail_sha256"] = detail_sha
    compact["queries"] = {}
    compact["queries_omitted"] = len(times)
    line = json.dumps(compact, separators=(",", ":"))
    for name, sec in sorted(times.items(), key=lambda kv: -kv[1]):
        trial = dict(compact)
        trial["queries"] = dict(compact["queries"], **{name: sec})
        trial["queries_omitted"] = len(times) - len(trial["queries"])
        trial_line = json.dumps(trial, separators=(",", ":"))
        if len(trial_line.encode()) > STDOUT_BUDGET:
            break
        compact, line = trial, trial_line
    print(line)


if __name__ == "__main__":
    main()
