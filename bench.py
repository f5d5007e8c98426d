"""Per-round benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "headline_total", "value": N, "unit": "sec",
     "queries": {"q_...": sec, ...}, "sf": 0.1}

Each query is executed to completion with a ``noop`` datasource write
so the measurement covers the full distributed plan (scan → shuffle →
agg) without driver-side collect overhead skewing small results.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_traffict_prediction_spark import registry
from big_data_traffict_prediction_spark.session import get_spark

# Representative spread of the operator surface: flagship prediction,
# heavy aggregation, window functions, joins/top-k, time-series spine,
# TPC-H analytics, LLM-data-pipeline ops (dedup / ANN / text).
HEADLINE = [
    "q_predict_dow_hour",
    "q_pattern_matrix",
    "q_predict_decision",
    "q_camera_thresholds",
    "q_window_stats",
    "q_bucket_series_dense",
    "q_latest_per_camera",
    "q_running_totals",
    "q_topn_export",
    "q_datalake_daily_agg",
    "q_tpch_q1",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q6",
    "q_tpch_q10",
    "q_tpch_q18",
    "q_dedup_exact",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_ann_bruteforce",
    "q_token_count",
    "q_text_quality",
    "q_corpus_select",
    "q_asof_config_join",
]


# Round-2+ operators, timed separately (single warm run each) so the
# headline set — and its cross-round comparability — stays frozen.
EXTENDED = [
    "q_tpch_q12",
    "q_tpch_q16",
    "q_tpch_q17",
    "q_tpch_q19",
    "q_tpch_q21",
    "q_tpch_q22",
    "q_embedding_neardup",
    "q_embedding_quantize",
    "q_dedup_clusters",
    "q_funnel_sequence",
    "q_retention_cohorts",
    "q_lang_mixture",
    "q_bucket_series_day_aligned",
    "q_iou_dedup",
    "q_tfidf_top_terms",
    "q_inverted_index",
    "q_interval_join_alerts",
    "q_dedup_ngram_jaccard",
    "q_repetition_score",
    "q_contamination_check",
    "q_doc_chunks",
    "q_anomaly_zscore",
    "q_profile_correlation",
    "q_tpch_q9",
    "q_tpch_q20",
    "q_rolling_median",
    "q_camera_gaps",
    "q_count_histogram",
    "q_approx_quantile",
    "q_top_ngrams",
    "q_dup_rate_by_source",
    "q_part_affinity",
    "q_camera_quartiles",
    "q_tpch_q2",
    "q_tpch_q11",
    "q_semantic_dedup",
    "q_pack_sequences",
    "q_mixture_sample",
    "q_stream_congestion_episodes",
    "q_training_manifest",
    "q_props_variant_extract",
    "q_data_quality_report",
    "q_multimodal_phash_dedup",
    "q_ann_pq",
    "q_ses_forecast",
    "q_holt_forecast",
    "q_quality_percentile_filter",
    "q_substring_dedup",
    "q_bigram_familiarity",
    "q_domain_cap",
    "q_camera_reconcile_full",
    "q_time_weighted_avg",
    "q_ohlc_candles",
    "q_gap_fill_locf",
    "q_gap_fill_interp",
    "q_delta_series",
    "q_hybrid_rollup",
    "q_heavy_hitters",
    "q_embedding_centroids",
    "q_peak_hours",
    "q_skyline_pareto",
    "q_heavy_hitters_sketch",
    "q_stream_continuous_rollup",
    "q_first_touch_attribution",
    "q_markov_transitions",
    "q_camera_neighbors",
    "q_geo_cell_density",
    "q_reservoir_sample",
    "q_vocab_coverage",
    "q_rising_streaks",
    "q_volume_percentile_rank",
    "q_zorder_key",
    "q_similar_days",
    "q_pmi_collocations",
    "q_arrival_order_audit",
    "q_day_over_day",
    "q_kfold_assign",
    "q_gdpr_delete",
    "q_embedding_outliers",
    "q_salted_totals",
    "q_snapshot_diff",
    "q_cusum_changepoints",
    "q_top_paths",
    "q_engagement_stickiness",
    "q_seasonal_decompose",
    "q_rfm_segments",
    "q_audience_overlap",
    "q_cross_source_dup",
    "q_fano_dispersion",
    "q_order_cohort_repeat",
    "q_fulfillment_lag",
    "q_predict_scenario",
    "q_doc_winnow",
    # round 9
    "q_hll_distinct",
    "q_lpa_communities",
    "q_interval_join_binned",
    "q_ann_srp_lsh",
    "q_weighted_sample",
    "q_set_overlap_sketch",
    "q_hll_rolling_distinct",
    "q_stream_hll_cameras",
    "q_k_anonymity",
    "q_rolling_origin_eval",
    "q_negative_samples",
    "q_sql_supplier_scorecard",
    # round 10
    "q_cdc_merge",
    "q_stream_cdc_merge",
    "q_zone_map_stats",
    "q_compaction_plan",
    "q_l_diversity",
    "q_scd2_build",
    "q_embedding_jl_project",
    "q_join_size_sketch",
    # round 11
    "q_zone_map_merge",
    "q_scd2_apply",
    "q_mv_refresh",
    "q_drift_tvd",
    "q_stream_zone_map",
    "q_ann_ivf_delta",
    "q_ddsketch_quantiles",
    "q_stream_ddsketch",
    "q_analyze_table",
    "q_constraint_profile",
    "q_ann_recall_eval",
    "q_dedup_recall_eval",
    "q_selectivity_estimate",
    "q_histogram_stats",
    "q_histogram_merge",
    "q_selectivity_histogram",
    "q_selectivity_zone_sketch",
    "q_stream_interval_join_binned",
    "q_stream_histogram",
    "q_clustering_depth",
    "q_cc_delta",
    "q_trending_decay",
    # round 13
    "q_join_size_histogram",
    "q_selectivity_conjunction",
    "q_ann_pq_fixed",
    "q_stream_join_size_sketch",
    "q_analyze_sample",
    "q_join_order_rank",
    "q_bloom_skipping_eval",
    "q_ann_ivf_pq_fixed",
    "q_stream_analyze",
    "q_selectivity_equality",
    "q_t_closeness",
    "q_embedding_kmeans",
    "q_mcv_merge",
    "q_sample_histogram",
    "q_stream_mcv",
]


def _is_degraded_run(new_detail: dict, committed: dict, tol: float = 1.10) -> bool:
    """True when ``new_detail`` looks like a loaded-host run vs the
    committed record: its min-of-sweeps total over the SHARED headline
    queries exceeds the committed total by more than ``tol``.

    Compared over the key intersection so adding/removing a headline
    query between rounds doesn't poison the comparison. Conservative on
    missing data: un-comparable inputs are never called degraded.
    """
    new_q = new_detail.get("queries_min") or {}
    old_q = committed.get("queries_min") or {}
    # skip non-numeric cells (a corrupt record must degrade to "not
    # degraded", never TypeError at the end of an expensive sweep)
    shared = [
        k
        for k in set(new_q) & set(old_q)
        if isinstance(new_q[k], (int, float))
        and isinstance(old_q[k], (int, float))
        and not isinstance(new_q[k], bool)
        and not isinstance(old_q[k], bool)
    ]
    if not shared:
        return False
    new_total = sum(new_q[k] for k in shared)
    old_total = sum(old_q[k] for k in shared)
    return old_total > 0 and new_total > old_total * tol


def _committed_detail(repo_dir: str) -> dict | None:
    """The BENCH_DETAIL.json committed at HEAD, or None."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "show", "HEAD:BENCH_DETAIL.json"],
            cwd=repo_dir,
            capture_output=True,
            text=True,
            timeout=30,
        )
    except (OSError, subprocess.TimeoutExpired):
        return None
    if out.returncode != 0:
        return None
    try:
        data = json.loads(out.stdout)
    except ValueError:
        return None
    return data if isinstance(data, dict) else None


def resolve_detail_path(detail: dict, repo_dir: str) -> str:
    """Where to write this run's detail artifact.

    A loaded-host sweep (>10% slower than the committed record over the
    shared headline queries) must NOT clobber the committed idle-host
    record — it lands in ``BENCH_DETAIL.loaded.json`` instead, keeping
    the canonical file a monotone best-known-idle record.
    ``SPARK_BENCH_FORCE_DETAIL=1`` bypasses the guard (e.g. after an
    intentional headline-set change that makes totals incomparable).
    """
    canonical = os.path.join(repo_dir, "BENCH_DETAIL.json")
    if os.environ.get("SPARK_BENCH_FORCE_DETAIL") == "1":
        return canonical
    # guard against BOTH the committed record and a better
    # not-yet-committed record already sitting in the working tree
    # (e.g. an idle-host run earlier this round) — the canonical file
    # is a monotone best-known-idle record either way
    records = [_committed_detail(repo_dir)]
    try:
        with open(canonical) as fh:
            working = json.load(fh)
        if isinstance(working, dict):
            records.append(working)
    except (OSError, ValueError):
        pass
    if any(r is not None and _is_degraded_run(detail, r) for r in records):
        return os.path.join(repo_dir, "BENCH_DETAIL.loaded.json")
    return canonical


def _calibration_probe() -> float:
    """Fixed single-threaded CPU work (md5 over 256 MB) timed in
    seconds — a Spark-independent host-speed probe. ~0.3 s on this
    box when idle; scales with ambient load/frequency, so the driver
    artifact carries a machine-speed witness next to the query times.
    """
    import hashlib

    buf = b"\x5a" * (1 << 20)
    t0 = time.perf_counter()
    h = hashlib.md5()
    for _ in range(256):
        h.update(buf)
    h.digest()
    return round(time.perf_counter() - t0, 4)


def _calibration_probe_parallel(threads: int = 8) -> float:
    """The same md5 work run on `threads` concurrent threads (md5
    releases the GIL), wall-clock seconds — the MULTI-thread host
    witness the single-thread probe cannot provide: co-tenant CPU
    steal was observed inflating Spark 1.4-11x while calib_sec AND
    load average stayed at their idle values (r13). On an unloaded
    box this reads ≈ calib_sec (threads run in parallel); under
    steal it inflates roughly like the query times do, so the ratio
    calib_par_sec / calib_sec in the artifact separates "host was
    busy" from "the engine regressed"."""
    import hashlib
    import threading

    buf = b"\x5a" * (1 << 20)

    def work() -> None:
        h = hashlib.md5()
        for _ in range(256):
            h.update(buf)
        h.digest()

    ts = [threading.Thread(target=work) for _ in range(threads)]
    t0 = time.perf_counter()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return round(time.perf_counter() - t0, 4)


def _steal_probe(seconds: float = 4.0) -> float | None:
    """Hypervisor CPU-steal percentage measured from /proc/stat while
    saturating EVERY vCPU with the md5 work — the signal both calib
    probes miss: co-tenant steal only materializes when the guest
    actually asks for all its cores (observed r13-opt: calib_sec AND
    the 8-thread calib_par at their idle values while 32-way Spark ran
    1.5-5x slow; a 32-process burst read 12%+ steal at that moment).
    Returns None where /proc/stat is unavailable (non-Linux)."""
    import hashlib
    import multiprocessing
    import threading

    try:
        with open("/proc/stat") as fh:
            s0 = fh.readline().split()[1:]
    except OSError:
        return None
    buf = b"\x5a" * (1 << 20)
    stop = time.perf_counter() + seconds

    def work() -> None:
        h = hashlib.md5()
        while time.perf_counter() < stop:
            for _ in range(32):
                h.update(buf)
        h.digest()

    n = multiprocessing.cpu_count()
    ts = [threading.Thread(target=work) for _ in range(n)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    try:
        with open("/proc/stat") as fh:
            s1 = fh.readline().split()[1:]
    except OSError:
        return None
    d = [int(b) - int(a) for a, b in zip(s0, s1)]
    if len(d) < 8:
        return None
    # fields: user nice system idle iowait irq softirq steal guest
    # gnice — guest/gnice are already folded into user/nice by the
    # kernel, so summing all 10 would double-count them
    tot = sum(d[:8])
    if tot <= 0:
        return None
    return round(100.0 * d[7] / tot, 1)


def _membw_probe() -> float | None:
    """Single-process STREAM-triad memory bandwidth in GB/s (numpy add
    over 64 MB arrays — far beyond any cache). The third host witness:
    co-tenant MEMORY-BANDWIDTH contention degrades multi-core Spark
    while md5 calib (cache-resident) and /proc steal both read idle —
    the residual invisible mode observed this round (Spark at 1.5-1.8×
    the record with steal at 1-3% and calib at its idle value).
    Returns None when numpy is unavailable."""
    try:
        import numpy as np
    except ImportError:
        return None
    n = 64 * 1024 * 1024 // 8
    a = np.ones(n)
    b = np.ones(n)
    c = np.empty(n)
    np.add(a, b, out=c)  # warm the pages
    t0 = time.perf_counter()
    for _ in range(4):
        np.add(a, b, out=c)
    dt = time.perf_counter() - t0
    return round((3 * 8 * n * 4) / dt / 1e9, 1)


def _load_factor(timings_min: dict, committed: dict | None) -> float | None:
    """This run's min-of-sweeps headline total ÷ the committed idle
    record's, over the shared query names — >1.1 reads as ambient
    host load (or a real regression; per-query ratios disambiguate:
    a flat inflation across all queries is load, a single-query
    blowup is code). None when there is no comparable record."""
    if not committed:
        return None
    old_q = committed.get("queries_min") or {}
    shared = [
        k
        for k in timings_min
        if isinstance(old_q.get(k), (int, float)) and not isinstance(old_q.get(k), bool)
    ]
    if not shared:
        return None
    old_total = sum(old_q[k] for k in shared)
    if old_total <= 0:
        return None
    return round(sum(timings_min[k] for k in shared) / old_total, 3)


def run_one(spark, fn, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    warm_runs = int(os.environ.get("SPARK_BENCH_WARMUP", "1"))
    calib_sec = _calibration_probe()
    calib_par_sec = _calibration_probe_parallel()
    steal_pct = _steal_probe()
    membw_gbps = _membw_probe()
    spark = get_spark()

    queries = registry.all_queries()
    # Warm the JVM + file listing once so per-query numbers measure the
    # plan, not session startup.
    queries["q_lifetime_totals"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # Honest statistics: the first execution of each query is RECORDED
    # as its cold number (it doubles as the codegen/JIT warmup), then
    # each query is measured warm 3× and the MEDIAN reported — median
    # resists transient machine-load noise without the flattery of
    # min-statistics. SPARK_BENCH_WARMUP=0 reports the cold pass only.
    cold: dict[str, float] = {}
    for name in HEADLINE:
        cold[name] = round(run_one(spark, queries[name], sf_dir), 3)

    if warm_runs:
        # Three INTERLEAVED full sweeps, per-query median: a sustained
        # host-load window (minutes, observed on shared boxes) then
        # taxes each query in at most one sweep and the median shakes
        # it off; back-to-back runs of one query would eat the spike in
        # all three samples.
        sweeps = [
            {name: run_one(spark, queries[name], sf_dir) for name in HEADLINE}
            for _ in range(3)
        ]
        timings = {
            name: round(sorted(s[name] for s in sweeps)[1], 3) for name in HEADLINE
        }
        # min-of-sweeps published alongside: round 1's recorded 16.58 s
        # was a best-of-2 statistic, so cross-round comparisons need the
        # like-for-like floor next to the honest median.
        timings_min = {
            name: round(min(s[name] for s in sweeps), 3) for name in HEADLINE
        }
        stat = "median3"
    else:
        timings = cold
        timings_min = cold
        stat = "cold"

    # Extended set: same interleaved median-of-3 discipline — a single
    # measured run lets one transient host-load spike (observed 10× on
    # a shared box) masquerade as a 10× operator regression.
    # SPARK_BENCH_WARMUP=0 means "cold pass only" for this set too.
    if warm_runs:
        for name in EXTENDED:
            run_one(spark, queries[name], sf_dir)  # warm
        ext_sweeps = [
            {name: run_one(spark, queries[name], sf_dir) for name in EXTENDED}
            for _ in range(3)
        ]
        extended = {
            name: round(sorted(s[name] for s in ext_sweeps)[1], 3)
            for name in EXTENDED
        }
        # Per-query FLOOR over the sweeps, recorded alongside: timing
        # noise is one-sided (spikes only), so even the median-of-3
        # moved >15% on ~20% of sub-second extended names between two
        # idle r12 sweeps while the totals stayed flat. The min is the
        # stable cross-round regression denominator
        # (scripts/bench_compare.py keys extended diffs to it).
        extended_min = {
            name: round(min(s[name] for s in ext_sweeps), 3) for name in EXTENDED
        }
    else:
        extended = {
            name: round(run_one(spark, queries[name], sf_dir), 3) for name in EXTENDED
        }
        extended_min = extended

    # The driver keeps only the OUTPUT TAIL, so the compact headline
    # line MUST be printed last (round 2's artifact lost every headline
    # number when the enlarged single-line JSON got tail-truncated).
    # Bulky diagnostics go to a FILE artifact — per-query history must
    # not depend on what survives stdout capture — plus one stdout line
    # for eyeballing live runs.
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    load_factor = _load_factor(timings_min, _committed_detail(repo_dir))
    detail = {
        "metric": "headline_detail",
        "stat": stat,
        "value_min": round(sum(timings_min.values()), 3),
        "load_factor": load_factor,
        "calib_sec": calib_sec,
        "calib_par_sec": calib_par_sec,
        "steal_pct": steal_pct,
        "membw_gbps": membw_gbps,
        "queries_min": timings_min,
        "queries_cold": cold,
        "queries_extended": extended,
        "queries_extended_min": extended_min,
        "sf": sf,
    }
    detail_path = resolve_detail_path(detail, repo_dir)
    if detail_path.endswith(".loaded.json"):
        print(
            "bench: >10% slower than committed record — writing "
            "BENCH_DETAIL.loaded.json, keeping the idle-host record",
            file=sys.stderr,
        )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)
        fh.write("\n")
    print(json.dumps(detail))
    sys.stdout.flush()
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "stat": stat,
                "load_factor": load_factor,
                "calib_sec": calib_sec,
                "calib_par_sec": calib_par_sec,
                "steal_pct": steal_pct,
                "membw_gbps": membw_gbps,
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
