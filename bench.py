#!/usr/bin/env python
"""Benchmark harness: times the engine's headline queries at the bench
scale factor and prints ONE JSON line for the round driver.

Headline metrics align name-for-name with BASELINE.md so the judge can
compare directly:

    q_agg       -> q_agg_pricing_summary (TPC-H Q1-style agg, lineitem)
    q_join      -> q_join_broadcast      (orders x customer, group agg)
    q_wordcount -> q_wordcount           (flagship, reference client R14)
    q_window    -> q_events_hourly       (per-hour event counts)

plus a breadth set (joins, windows, dedup, similarity, minhash,
map_reduce, streaming) timed and reported under ``queries``.

Methodology: each query gets one untimed warm-up execution first.
HEADLINE queries (the four BASELINE.md metrics) are then timed
HEADLINE_RUNS (default 5) times and the MEDIAN is reported, plus a
``noise`` estimate (max relative half-spread across the headline
queries) — this box swings ±15% run-to-run, and median-of-5 keeps one
slow draw from reading as a code regression (round-3's 1.96 s
``q_embedding_topk_pairs`` reading was exactly that; the same commit
A/B'd at 0.67 s). Breadth queries are timed best-of-RUNS (default 2,
the BASELINE.md "warm, second run" definition) to keep total bench
time bounded. Session startup excluded; results materialized via the
``noop`` write sink — every output column is computed (a bare
``count()`` would let Spark prune expensive projections out of the
measured plan) but nothing is collected.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), BENCH_RUNS (default 2),
BENCH_HEADLINE_RUNS (default 5).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from os_ex_3_map_reduce_spark.plans import all_queries  # noqa: E402
from os_ex_3_map_reduce_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("BENCH_RUNS", "2"))
HEADLINE_RUNS = int(os.environ.get("BENCH_HEADLINE_RUNS", "5"))

#: BASELINE.md metric name -> catalog query name.
HEADLINE = {
    "q_agg": "q_agg_pricing_summary",
    "q_join": "q_join_broadcast",
    "q_wordcount": "q_wordcount",
    "q_window": "q_events_hourly",
}

#: Breadth set: representative of every operator family (SURVEY.md §2).
BREADTH = [
    "q_join_sortmerge",
    "q_join_bucketed",
    "q_join_semi",
    "q_join_asof",
    "q_join_range",
    "q_time_gapfill",
    "q_rollup_time",
    "q_embedding_neardup",
    "q_window_rank",
    "q_topk",
    "q_rollup",
    "q_json_extract",
    "q_dedup_exact",
    "q_minhash_neardup",
    "q_chargram_jaccard",
    "q_simhash_neardup",
    "q_similarity_topk",
    "q_embedding_topk_pairs",
    "q_ann_lsh_topk",
    "q_ann_ivf_topk",
    "q_mapreduce_wordcount",
    "q_sketch_heavyhitters",
    "q_hof_fns",
    "q_lateral",
    "q_window_range_frame",
    "q_salted_join",
    "q_contamination",
    "q_repetition",
    "q_sample_hash",
    "q_sample_stratified",
    "q_multimodal_bmp",
    "q_multimodal_wav",
    "q_multimodal_resize",
    "q_pack_chunks",
    "q_recursive_cte",
    "q_ann_lsh_recall",
    "q_stream_tumbling",
    "q_stream_stateful",
    "q_stream_static_join",
    "q_stream_outer_join",
    "q_stream_foreach_sink",
    # mutation surface (snapshot merge + streaming CDC apply): timings
    # include the snapshot parquet writes — the honest pipeline cost
    "q_merge_upsert",
    "q_stream_cdc_apply",
    # round-7 additions (VERDICT r6 #6): green correctness, first bench
    "q_dedup_keep_best",
    "q_binaryfile_ingest",
    "q_neardup_components",
    "q_variant_json",
    "q_percentiles_grouped",
    "q_histogram",
    "q_bloom_semijoin",
    "q_sessionize",
    "q_profile_stats",
    "q_pii_redact",
    "q_zorder_cluster",
    "q_incremental_agg",
    "q_setsim_prefix",
    "q_kmeans_assign",
    "q_pagerank",
    "q_time_interpolate",
    "q_sample_weighted",
    "q_histogram_equidepth",
    "q_cohort_retention",
    "q_outlier_zscore",
    "q_funnel",
    "q_drift_ks",
    "q_chi2_terms",
    "q_trend_ols",
    "q_event_transitions",
    "q_mad_robust",
    "q_gini",
    "q_multimodal_audio_frames",
    "q_data_contract",
    "q_sample_budget",
    # round-9 additions: batched ANN + BFS shortest path
    "q_ann_ivf_batch",
    "q_sssp",
    # late-r9 + round-10 additions: batch kernels, PQ, graph trio,
    # streaming full-outer, incremental IVF append, star-contraction CC
    "q_similarity_topk_batch",
    "q_ann_lsh_batch",
    "q_ann_pq_topk",
    "q_sssp_weighted",
    "q_labelprop",
    "q_triangles",
    "q_stream_full_outer_join",
    "q_ann_ivf_append",
    "q_cc_starcontract",
    "q_ann_ivfpq_topk",
    "q_dedup_ingest",
    "q_stream_dedup_ingest",
    "q_ann_ivfpq_residual",
    "q_shard_shuffle",
    "q_upsample_quality",
    "q_kcore",
    "q_ann_ivfpq_append",
    "q_corenumbers",
    # round-10 continuation additions: range search, distributed Lloyd,
    # link prediction, right-outer stream join, BPE merge training
    "q_range_search_batch",
    "q_ann_ivf_range",
    "q_kmeans_lloyd",
    "q_linkpred",
    "q_stream_right_outer_join",
    "q_bpe_merges",
    "q_gram_matrix",
    "q_pca_topk",
    "q_ann_sq_topk",
    "q_ppr",
    # second round-10 continuation: corpus-dedup + tokenizer surfaces
    "q_semdedup",
    "q_substring_dupes",
    "q_scd2_history",
    "q_lm_perplexity",
    "q_bpe_encode",
    # round 11: retrieval refine, data selection, graph, lakehouse,
    # secondary sort, quality, leakage-safe split
    "q_ann_rerank",
    "q_dsir_select",
    "q_hits",
    "q_time_travel",
    "q_mapreduce_secondary_sort",
    "q_entropy_quality",
    "q_group_split",
    "q_ann_filtered",
    "q_stream_versioned_ingest",
    "q_ann_opq_topk",
    "q_unigram_vocab",
    "q_stream_cdc_versioned",
    # round-11 third continuation (graph ANN, retrieval stack,
    # matching, lakehouse refs, compliance, tokenizer encode,
    # augmentation, layout, refinement). The index/graph BUILD
    # pipelines among these (q_ann_nsw_append, q_ann_hnsw_topk,
    # q_nn_descent) are build+verify pipelines like
    # q_ann_ivf_append — their registrations document that the
    # builds, not the searches, are the timed cost.
    "q_ann_nsw_topk",
    "q_ann_nsw_append",
    "q_bm25_topk",
    "q_hybrid_rrf",
    "q_matching",
    "q_neardup_linkage",
    "q_vt_branch",
    "q_vt_restore",
    "q_gdpr_erasure",
    "q_unigram_encode",
    "q_image_augment",
    "q_ann_matryoshka",
    "q_kcenter_sample",
    "q_ann_maxsim",
    "q_ann_hnsw_topk",
    "q_hilbert_layout",
    "q_nn_descent",
    "q_regional_volume",
    "q_stream_standing_query",
    "q_robust_prune",
    "q_ann_diskann",
    "q_stream_maxsim",
    "q_rank_metrics",
    "q_hilbert3d",
    "q_containment",
    "q_volume_shipping",
    "q_hard_negatives",
    "q_ktruss",
    "q_mmr_rerank",
    "q_chunk_overlap",
    "q_bm25_indexed",
    "q_bm25_append",
    "q_stream_bm25_ingest",
    "q_cust_order_distribution",
    "q_small_qty_revenue",
    "q_large_orders",
    "q_waiting_suppliers",
    "q_dormant_balance",
    "q_modularity",
    "q_phrase_search",
    "q_prf_expand",
    "q_corr_matrix",
    "q_skyline_parts",
    "q_louvain_sweep",
    "q_cusum_changepoint",
    "q_mahalanobis",
    "q_assortativity",
    "q_bloom_fileskip",
    "q_isotonic_calibration",
    "q_auc_ranks",
    "q_txn_multitable",
    "q_landmark_distance",
    "q_harmonic_centrality",
    "q_pmi_collocations",
    "q_stream_txn_ingest",
    "q_apriori_itemsets",
    "q_anova_hourofday",
    "q_bitemporal",
    "q_cuped",
    "q_kaplan_meier",
    "q_lift_deciles",
    "q_ivm_join_agg",
    "q_pattern_match",
    "q_k_anonymity",
    "q_theil_sen",
    "q_audio_fingerprint",
    "q_lsh_pr",
    "q_value_concentration",
    "q_priority_late_orders",
    "q_kendall_tau",
    # round-12 window completion: every DRIVER_PRIORITY name is timed
    # so BENCH_r12 carries the rotated backlog's evidence
    "q_mor_delete",
    "q_vt_schema_evolution",
    "q_vt_optimize",
    "q_vt_changes",
    "q_vt_fileskip",
    "q_sketch_theta_union",
    "q_sketch_quantile_merge",
    "q_sketch_intersect",
    "q_stream_kmv_distinct",
    "q_stream_cms_topk",
    "q_stream_semi_join",
    # round-13 window completion: the splitter-sweep names newly
    # rotated into the driver window plus the 8 never-rowed E6 names
    # and the whitespace tripwire, so BENCH_r13 times the full window
    "q_whitespace_audit",
    "q_attribution",
    "q_incremental_join",
    "q_join_interval",
    "q_join_not_in",
    "q_mixture_waterfill",
    "q_window_distinct",
    "q_fingerprint",
    "q_fingerprint_rolling",
    "q_job_control",
    "q_lang_id",
    "q_neardup_editdist",
    "q_normalize_text",
    "q_pipeline_clean_corpus",
    "q_text_quality",
    "q_tfidf_top_terms",
    "q_token_stats",
    "q_udtf_bigrams",
    "q_mapreduce_key_equiv",
    "q_tf_df",
    "q_token_stats_bpe",
    "q_textrank",
    # round-14 window completion: the stale-green refresh names newly
    # rotated into the driver window, so BENCH_r14 times the full window
    "q_string_fns",
    "q_date_parts",
    "q_date_trunc",
    "q_join_cross",
    "q_join_nullsafe",
    "q_map_fns",
    "q_math_fns",
    "q_percentiles",
    "q_regexp_fns",
    "q_set_ops_all",
    "q_shipping_priority",
    "q_unpivot",
    "q_window_misc",
    "q_agg_distinct",
    "q_cube",
    "q_dedup_stats",
    "q_filter_project",
    "q_grouping_sets",
    "q_having",
    "q_case_edit_audit",
    "q_betweenness_tree",
    "q_closeness_tree",
    "q_l_diversity",
    "q_t_closeness",
    "q_stream_late_data",
    # round-15 additions: weighted tree centralities + session-window
    # late-data proof
    "q_closeness_tree_weighted",
    "q_tree_diameter_weighted",
    "q_stream_late_data_session",
]


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _calibrate(spark) -> dict:
    """Fixed-cost host-speed canary, timed FIRST (VERDICT r8 #2): a
    pure-JVM whole-stage-codegen fold over 5e7 longs — no I/O, no
    Python, no shuffle, no code under test — so it measures the HOST,
    not the engine. Ambient slowdowns (downclocked boots confounded
    rounds 6 and 8) move this number by the same factor they move every
    unchanged query; cross-round comparisons should divide per-query
    times by the calibration medians before calling anything a
    regression (normalization rule: SURVEY.md §7.6)."""
    times = []
    for _ in range(4):  # one warm-up + three timed
        t0 = time.perf_counter()
        spark.range(50_000_000).selectExpr("sum(id)").collect()
        times.append(time.perf_counter() - t0)
    timed = sorted(times[1:])
    mhz: list[float] = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.lower().startswith("cpu mhz"):
                    mhz.append(float(line.split(":")[1]))
    except Exception:  # noqa: BLE001 — MHz is best-effort evidence
        pass
    return {
        "op": "spark.range(5e7).sum().collect, median-of-3 after warm-up",
        "sec": round(timed[1], 4),
        "min_max_sec": [round(timed[0], 4), round(timed[-1], 4)],
        "cpu_mhz_mean": round(sum(mhz) / len(mhz), 1) if mhz else None,
        "cpu_mhz_max": round(max(mhz), 1) if mhz else None,
    }


def _canary_probe(spark) -> float:
    """One cheap mid-sweep re-probe of the calibration op (min-of-2).

    The start-of-run canary is a blind spot the driver hit twice:
    BENCH_r10 and BENCH_r12 both read a healthy canary, then the breadth
    segment ran ~3x slow under an ambient throttle the single probe
    never saw (r12 verdict #3). Re-probing at every hygiene boundary
    stamps each breadth SEGMENT with its own host-speed evidence, so
    tools/bench_compare.py can normalize per-segment and flag polluted
    windows instead of reading them as code regressions."""
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        spark.range(50_000_000).selectExpr("sum(id)").collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def _time_query(fn, spark, sf_dir: str, runs: int) -> float:
    _materialize(fn(spark, sf_dir))  # per-query warm-up (untimed)
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        _materialize(fn(spark, sf_dir))
        best = min(best, time.perf_counter() - t0)
    return best


def _time_query_median(fn, spark, sf_dir: str, runs: int) -> tuple[float, float]:
    """Median of ``runs`` timed executions (after one untimed warm-up)
    plus the run's relative half-spread ((max-min)/2/median) — the
    ambient-noise estimate for this query."""
    _materialize(fn(spark, sf_dir))
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        _materialize(fn(spark, sf_dir))
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    spread = (times[-1] - times[0]) / 2 / med if med else 0.0
    return med, spread


def _healthy_query_priors() -> dict[str, float]:
    """Per-query rolling healthy prior from committed BENCH_LOCAL
    records — the breadth twin of :func:`_healthy_calibration_median`
    (r15 optimization: breadth self-defense against mid-sweep host
    stalls). Per-round MIN first (throttled re-draws are committed on
    purpose as evidence), then the median over the last 3 rounds that
    carry the query. Used only to decide whether a reading deserves
    EXTRA timed runs — never to replace a measurement."""
    import glob as _glob
    import re as _re
    import statistics

    here = os.path.dirname(os.path.abspath(__file__))
    rounds: dict[int, dict[str, float]] = {}
    for p in _glob.glob(os.path.join(here, "BENCH_LOCAL_r*.json")):
        m = _re.search(r"BENCH_LOCAL_r(\d+)", os.path.basename(p))
        if not m:
            continue
        try:
            with open(p) as f:
                qmap = json.load(f).get("queries", {})
        except Exception:  # noqa: BLE001 — evidence is best-effort
            continue
        rnd = rounds.setdefault(int(m.group(1)), {})
        for q, t in qmap.items():
            if isinstance(t, (int, float)) and t > 0:
                rnd[q] = min(rnd.get(q, t), t)
    priors: dict[str, float] = {}
    for q in {q for r in rounds.values() for q in r}:
        vals = [rounds[r][q] for r in sorted(rounds, reverse=True) if q in rounds[r]][:3]
        if vals:
            priors[q] = statistics.median(vals)
    return priors


def _healthy_calibration_median() -> float | None:
    """Rolling healthy-host estimate from committed full records
    (VERDICT r14 "What's wrong" #1): per-round BEST calibration probe
    across every BENCH_LOCAL_r{N}*.json, median over the last 5 rounds.
    Per-round min (not plain median over files) because throttled
    re-draws are committed on purpose as evidence — r14 alone has a
    0.2411 s clean draw and a 0.4644 s throttled one; the min is the
    round's actual host capability."""
    import glob as _glob
    import re as _re
    import statistics

    here = os.path.dirname(os.path.abspath(__file__))
    per_round: dict[int, float] = {}
    for p in _glob.glob(os.path.join(here, "BENCH_LOCAL_r*.json")):
        m = _re.search(r"BENCH_LOCAL_r(\d+)", os.path.basename(p))
        if not m:
            continue
        try:
            with open(p) as f:
                sec = json.load(f).get("calibration", {}).get("sec")
        except Exception:  # noqa: BLE001 — evidence is best-effort
            continue
        if isinstance(sec, (int, float)) and sec > 0:
            rnd = int(m.group(1))
            per_round[rnd] = min(per_round.get(rnd, sec), sec)
    if not per_round:
        return None
    recent = [per_round[r] for r in sorted(per_round)[-5:]]
    return round(statistics.median(recent), 4)


def _draw_headline(spark, qs, errors: dict[str, str]) -> tuple[dict, list]:
    """One full headline draw: median-of-HEADLINE_RUNS per metric."""
    timings: dict[str, float] = {}
    spreads: list[float] = []
    for metric, qname in HEADLINE.items():
        try:
            med, spread = _time_query_median(qs[qname], spark, SF_DIR, HEADLINE_RUNS)
            timings[metric] = round(med, 4)
            spreads.append(spread)
        except Exception as ex:  # noqa: BLE001
            errors[metric] = f"{type(ex).__name__}: {ex}"[:300]
    return timings, spreads


def main() -> None:
    spark = get_spark(app_name="bench")
    qs = all_queries()

    errors: dict[str, str] = {}

    # host-speed canary FIRST, before any query timing
    try:
        calibration = _calibrate(spark)
    except Exception as ex:  # noqa: BLE001
        calibration = {"error": f"{type(ex).__name__}: {ex}"[:300]}

    # One untimed session warm-up touching every bench table: JVM +
    # codegen + parquet footer caches warm before any timing starts.
    # Each warm-up is individually shielded — a broken query must never
    # cost the whole round's perf evidence (it did, twice: BENCH_r04/r05
    # were rc=1 with zero timings because one bare warm-up materialize
    # hit the events-dtype regression).
    for warm in ("q_wordcount", "q_events_hourly", "q_agg_pricing_summary"):
        try:
            _materialize(qs[warm](spark, SF_DIR))
        except Exception as ex:  # noqa: BLE001 — record, keep benching
            errors[f"warmup:{warm}"] = f"{type(ex).__name__}: {ex}"[:300]

    # Headline draw with throttle self-defense (VERDICT r14 "What's
    # wrong" #1): the r14 driver draw ran on a ~2.2x-throttled host
    # (calibration 0.4644 s vs the healthy 0.21-0.24 band) and burned
    # 6% of the 2x gate's margin on pure ambient noise. If the
    # calibration probe (taken before AND re-taken after the draw, so a
    # throttle that starts mid-headline is also caught) exceeds
    # REDRAW_THRESHOLD x the rolling median of prior committed healthy
    # probes, re-draw the 4-query headline set (up to
    # BENCH_HEADLINE_REDRAWS times, default 2, ~10 s each) and keep the
    # best-calibration attempt. Every attempt is recorded in the full
    # record — nothing is discarded, the gate just stops being hostage
    # to a transient host stall.
    REDRAW_THRESHOLD = float(os.environ.get("BENCH_REDRAW_THRESHOLD", "1.5"))
    max_redraws = int(os.environ.get("BENCH_HEADLINE_REDRAWS", "2"))
    healthy = _healthy_calibration_median()

    timings, spreads = _draw_headline(spark, qs, errors)
    try:
        post_probe = _canary_probe(spark)
    except Exception:  # noqa: BLE001
        post_probe = float("nan")
    cal0 = calibration.get("sec")
    sig0 = max(
        [v for v in (cal0, post_probe) if isinstance(v, (int, float)) and v == v],
        default=None,
    )
    attempts = [
        {
            "calibration_sec": cal0,
            "post_draw_probe_sec": round(post_probe, 4)
            if post_probe == post_probe
            else None,
            "throttle_signal_sec": sig0,
            "headline": dict(timings),
        }
    ]
    chosen = 0
    if healthy and sig0 is not None:
        n = 0
        sig = sig0
        while sig > REDRAW_THRESHOLD * healthy and n < max_redraws:
            n += 1
            try:
                re_cal = _calibrate(spark).get("sec")
            except Exception:  # noqa: BLE001
                re_cal = None
            re_timings, re_spreads = _draw_headline(spark, qs, errors)
            try:
                re_post = _canary_probe(spark)
            except Exception:  # noqa: BLE001
                re_post = float("nan")
            sig = max(
                [
                    v
                    for v in (re_cal, re_post)
                    if isinstance(v, (int, float)) and v == v
                ],
                default=sig,
            )
            attempts.append(
                {
                    "calibration_sec": re_cal,
                    "post_draw_probe_sec": round(re_post, 4)
                    if re_post == re_post
                    else None,
                    "throttle_signal_sec": sig,
                    "headline": dict(re_timings),
                }
            )
            if re_timings and (
                attempts[chosen]["throttle_signal_sec"] is None
                or sig < attempts[chosen]["throttle_signal_sec"]
            ):
                chosen = len(attempts) - 1
                timings, spreads = re_timings, re_spreads
    headline_redraw = {
        "policy": f"redraw headline up to {max_redraws}x when "
        f"max(calibration, post-draw probe) > {REDRAW_THRESHOLD}x rolling "
        "median of per-round best committed calibrations; keep the "
        "best-signal attempt; all attempts recorded",
        "healthy_calibration_median_sec": healthy,
        "attempts": attempts,
        "chosen_attempt": chosen,
    }
    # Session-hygiene between breadth families (VERDICT r9 #4): three
    # rounds running, best-of-2 inside a 100+-query accumulated session
    # produced >=2x phantom readings that never reproduced in a clean
    # session (r9: q_mad_robust 4.49 s bench vs 1.14 s clean median).
    # Dropping cached blocks + a GC + a short settle every few queries
    # keeps executor pressure flat across the sweep; the per-query
    # untimed warm-up re-materializes any shared relation before its
    # timed runs, so the clear never lands inside a measurement.
    clear_every = int(os.environ.get("BENCH_CLEAR_EVERY", "8"))
    # Per-query stall self-defense (r15 optimization, the breadth twin
    # of the r14-mandated headline redraw): two same-day r15 draws with
    # HEALTHY calibration probes each contained a *different* multi-
    # query stall window (draw 2: the segment-7 window family read
    # 3-7x its r14 values; draw 3: q_chunk_overlap/q_triangles/
    # q_ann_ivf_append read 5-10x — every flagged query read healthy in
    # the OTHER draw and in fresh-JVM isolation, and an interleaved
    # r14-tree-vs-r15-tree A/B read parity). Segment canaries bound
    # stalls but best-of-RUNS cannot reject one spanning both runs. So:
    # when a query's best-of-RUNS exceeds BENCH_QUERY_REDRAW_FACTOR x
    # its rolling committed prior (and by a meaningful absolute
    # margin), re-time it up to BENCH_QUERY_REDRAWS more runs after a
    # short settle and keep the MIN — still the same "warm best-of-N"
    # methodology with N adaptively extended, and a REAL regression
    # reproduces on re-run so it cannot be hidden; every attempt is
    # recorded under "query_redraws" in the full record.
    redraw_factor = float(os.environ.get("BENCH_QUERY_REDRAW_FACTOR", "3.0"))
    max_query_redraws = int(os.environ.get("BENCH_QUERY_REDRAWS", "2"))
    priors = _healthy_query_priors() if max_query_redraws else {}
    query_redraws: dict[str, list[float]] = {}
    segment_canaries: list[float] = []
    query_segments: dict[str, int] = {}
    for i, qname in enumerate(BREADTH):
        if qname not in qs:
            continue
        if clear_every and i and i % clear_every == 0:
            try:
                spark.catalog.clearCache()
                import gc

                gc.collect()
                spark.sparkContext._jvm.System.gc()
                time.sleep(0.5)
            except Exception:  # noqa: BLE001 — hygiene is best-effort
                pass
        # per-segment host-speed canary (r12 verdict #4): stamp each
        # hygiene window with its own probe, taken right after the
        # clear so it never lands inside a measurement
        seg = i // clear_every if clear_every else 0
        while len(segment_canaries) <= seg:
            try:
                segment_canaries.append(_canary_probe(spark))
            except Exception:  # noqa: BLE001 — evidence is best-effort
                segment_canaries.append(float("nan"))
        query_segments[qname] = seg
        try:
            t = _time_query(qs[qname], spark, SF_DIR, RUNS)
            prior = priors.get(qname)
            if prior and t > redraw_factor * prior and t > prior + 0.5:
                # q_attempts, NOT attempts: the r15 first cut rebound
                # the HEADLINE attempts list here, so any draw with a
                # chosen headline redraw (chosen != 0) plus >= 1 query
                # redraw crashed at the record-assembly isinstance
                # check (AttributeError on a float) AFTER the full
                # sweep ran — rc=1, zero output, the whole draw lost
                # (hit live in this round's mid-draw; every committed
                # r15 record survived only because its chosen attempt
                # happened to be 0, which short-circuits that check).
                q_attempts = [round(t, 4)]
                for _ in range(max_query_redraws):
                    time.sleep(0.5)
                    t2 = _time_query(qs[qname], spark, SF_DIR, 1)
                    q_attempts.append(round(t2, 4))
                    t = min(t, t2)
                    if t <= redraw_factor * prior:
                        break
                query_redraws[qname] = q_attempts
            timings[qname] = round(t, 4)
        except Exception as ex:  # noqa: BLE001
            errors[qname] = f"{type(ex).__name__}: {ex}"[:300]
    # closing probe: bounds the LAST segment from both sides, so a
    # throttle that began mid-sweep is visible even if it started after
    # the final boundary probe
    try:
        segment_canaries.append(_canary_probe(spark))
    except Exception:  # noqa: BLE001
        pass

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    headline_total = round(
        sum(timings[m] for m in HEADLINE if m in timings), 4
    )
    # Host-normalized per-query values (VERDICT r9 #4): t_q divided by
    # the calibration canary, so cross-round comparisons need no judge
    # forensics — a normalized value that moved is a plan change, one
    # that held while the raw value moved is ambient host speed.
    cal_sec = calibration.get("sec")
    normalized = (
        {q: round(t / cal_sec, 3) for q, t in timings.items()}
        if isinstance(cal_sec, (int, float)) and cal_sec > 0
        else {}
    )
    out = {
        "metric": "headline_total_warm_sec",
        "value": headline_total,
        "unit": "sec",
        "queries": timings,
        "queries_normalized_by_calibration": normalized,
        "segment_canaries": segment_canaries,
        "query_segments": query_segments,
        "query_redraws": query_redraws,
        "sf": sf_val,
        "methodology": f"headline median-of-{HEADLINE_RUNS}, "
        f"breadth best-of-{RUNS}, warm; clearCache+gc+settle every "
        f"{int(os.environ.get('BENCH_CLEAR_EVERY', '8'))} breadth queries; "
        "segment_canaries[i] = min-of-2 host probe at breadth segment i's "
        "start (one trailing probe closes the last segment); "
        "query_segments maps each breadth query to its segment; "
        f"a breadth reading > {redraw_factor}x its rolling committed "
        f"prior (and > prior+0.5s) gets up to {max_query_redraws} extra "
        "timed runs after a 0.5s settle, min kept, every attempt in "
        "query_redraws (stall self-defense — a real regression "
        "reproduces on re-run)",
        "noise_rel_halfspread": round(max(spreads), 4) if spreads else 0.0,
        "calibration": calibration,
        "headline_redraw": headline_redraw,
    }
    if chosen != 0 and isinstance(
        attempts[chosen].get("calibration_sec"), (int, float)
    ):
        # The kept headline came from a redraw; expose the probe that
        # accompanied IT so normalization reads the right host speed.
        calibration["headline_effective_sec"] = attempts[chosen]["calibration_sec"]
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    # Persist the FULL record to a committed file (VERDICT r13 "What's
    # wrong" #1): the driver's stdout capture keeps only a 2000-char
    # tail, and BENCH_r13.json truncated mid-``query_segments`` — the
    # per-query breadth map survived only in the builder's session log.
    # The repo file is the artifact of record; tools/bench_compare.py
    # reads files, never captures. Round number = current round =
    # latest driver BENCH_r{N}.json + 1 (the driver writes BENCH_r{N}
    # only AFTER capturing this run's output, so the inference is
    # order-safe regardless of whether correctness ran first; override:
    # BENCH_ROUND). Never overwrite — multiple draws in one round get
    # ``-2``, ``-3`` suffixes so an earlier (possibly cleaner) record
    # is never lost to a later throttled draw.
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        rnd = os.environ.get("BENCH_ROUND")
        if not rnd:
            import glob as _glob
            import re as _re

            # Regex, not join-all-digits: a suffixed driver record like
            # BENCH_r14-2.json must parse as round 14, not 142
            # (ADVICE r14).
            done = [
                int(m.group(1))
                for p in _glob.glob(os.path.join(here, "BENCH_r*.json"))
                if (m := _re.search(r"BENCH_r(\d+)", os.path.basename(p)))
            ]
            rnd = str(max(done) + 1 if done else 0)
        base = os.path.join(here, f"BENCH_LOCAL_r{int(rnd):02d}")
        path = base + ".json"
        k = 2
        while os.path.exists(path):
            path = f"{base}-{k}.json"
            k += 1
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")
        print(f"full record written: {path}", file=sys.stderr)
    except Exception as ex:  # noqa: BLE001 — stdout line already emitted
        print(f"full-record write failed: {ex}", file=sys.stderr)
    # The driver captures the LAST lines of output (a tail); as the
    # breadth set grew, the single full JSON line outran the capture and
    # BENCH_r07.json lost the headline numbers (VERDICT r7 "What's
    # wrong" #1). Emit a second, compact, headline-only line LAST so the
    # tail always retains a parseable headline record.
    print(
        json.dumps(
            {
                "metric": "headline_total_warm_sec",
                "value": headline_total,
                "unit": "sec",
                "sf": sf_val,
                "headline": {m: timings[m] for m in HEADLINE if m in timings},
                "noise_rel_halfspread": out["noise_rel_halfspread"],
                "calibration": calibration,
                "headline_redraws": len(attempts) - 1,
                "headline_chosen_attempt": chosen,
                "query_redraws_n": len(query_redraws),
                "segment_canaries": segment_canaries,
                "n_breadth_queries_timed": len(
                    [q for q in timings if q not in HEADLINE]
                ),
                "full_record": "previous line",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
