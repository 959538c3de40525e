#!/usr/bin/env python3
"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count of the result) — results
are small aggregates, so timing measures scan/shuffle/agg work, not
driver materialization of big data.

Output discipline (round-6 ask #1): the full per-query record
(median + spread for every headline query) exceeded the round
driver's stdout capture buffer in r6, so the single stdout line now
carries only the totals and the SLOWEST_N slowest per-query medians;
the COMPLETE record is written to $SPARK_GRAFT_BENCH_OUT (default
BENCH_FULL_LATEST.json at the repo root, committed per round) and the
stdout line points at it via "full_record".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from poet_cloud_cost_etl_spark.queries import QUERIES  # noqa: E402
from poet_cloud_cost_etl_spark.session import build_session  # noqa: E402

# Headline set: the flagship costs pipeline + the heaviest operator of
# each family (scan+agg, joins incl as-of, windows, streaming shapes,
# dedup/similarity/text).
HEADLINE = [
    "costs_by_service_30d",
    "costs_union_view",
    "costs_by_account",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "join_broadcast_dim",
    "join_left_outer",
    "join_asof",
    "window_topn_per_group",
    "window_running_total",
    "events_session_window",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "ann_topk_bruteforce",
    "text_quality_score",
    # analytics extensions (round 2): reshaping, time-series repair,
    # statistical windows, distribution ranks at scale
    "pivot_daily_services",
    "timeseries_gapfill",
    "anomaly_zscore",
    "window_distribution",
    # training-data pipeline extensions (round 2): clustering, IVF,
    # sampling, packing
    "dedup_clusters",
    "ann_ivf",
    "sample_stratified",
    "pack_token_budget",
    # round-3 additions: the join-heaviest TPC-H analogs (5-6 table
    # topologies) and the heaviest new X-op (Lloyd-refined IVF)
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "ann_ivf_refined",
    # round-6 additions (round-4 ask #6): the r4/r5 heavy hitters —
    # corpus-wide TF-IDF shuffle, the composed quality gate, SCD2
    # window chain, and the full-outer snapshot diff — so a
    # regression in any of them shows up in the round record.
    "tfidf_top_terms",
    "pipeline_quality_gate",
    "scd2_user_event_type",
    "snapshot_diff_orders",
    # round-6 new operators, benched from birth so they have timing
    # history from their first official round.
    "text_bigram_lm_score",
    "split_balance_tvd",
    "embedding_norm_outliers",
    "ann_recall_eval",
    "dataset_fingerprint",
    # round-7 new operators, benched from birth.
    "doc_chunks",
    "vocab_coverage",
    "dedup_incremental",
    "template_clusters",
    "costs_normalize_decimal",
    "shingle_novelty",
    "chunk_dedup_rate",
    "embedding_label_separation",
    "semantic_dedup",
    "source_overlap_matrix",
    "quality_ablation",
    "split_leakage_safe",
    "dedup_best_of_cluster",
    # round-7c additions (X33-X37), benched from birth.
    "importance_weights_dsir",
    "source_token_tvd",
    "curriculum_sample",
    "token_fertility",
    "effective_mixture_weights",
    # round-7d additions (X38-X42), benched from birth.
    "seqlen_truncation_plan",
    "length_drift_by_source",
    "classifier_hashed_logit",
    "hard_negative_mining",
    "embedding_pq_codes",
    # round-7e additions (X43/X44, X28b tree, X45), benched from birth.
    "mixture_token_sample",
    "training_order_shuffle",
    "semantic_dedup_tree",
    "dedup_lsh_recall",
    "embedding_random_projection",
    "curation_manifest",
    # round-8 additions (X48-X53), benched from birth.
    "collocation_lift",
    "charclass_by_source",
    "lexical_diversity",
    "padding_efficiency_plan",
    "embedding_dim_moments",
    "neardup_degree_hist",
    "ann_ivf_pq",
    "embedding_standardize",
    "text_trigram_backoff",
    # round-8b additions (X56-X58, X60), benched from birth.
    "bm25_retrieval",
    "bpe_merge_candidates",
    "doc_compressibility",
    "embedding_top_pc",
    "characteristic_terms",
    "vocab_kmv_estimate",
    "source_datacard",
    "neardup_probe_retrieval",
    "vocab_growth_curve",
    # round-8c additions (X66-X70), benched from birth.
    "substring_dup_coverage",
    "dedup_bloom_gate",
    "embedding_remove_top_pc",
    "dedup_containment",
    "snapshot_diff",
    "ann_index_shard_plan",
    "ann_mrr_eval",
    "dedup_bbit_minhash",
    "dedup_simhash_pairs",
    "dedup_lsh_plan",
    "multimodal_sniff_format",
    "neardup_pagerank",
    "license_propagation",
    "embedding_health_audit",
    "classifier_pr_curve",
    "dedup_cluster_density",
    "cms_heavy_hitters",
    "dedup_sorted_neighborhood",
    "classifier_pr_auc",
    "dedup_prefix_filter_join",
    "canary_leak_scan",
    "priority_sample_docs",
    "dedup_lsh_clusters_star",
    "events_k_anonymity",
    "classifier_agreement_kappa",
    # round-8f additions (X92-X95), benched from birth.
    "unimax_budget_allocation",
    "ivf_cluster_purity",
    "dedup_cluster_radius",
    "length_outliers_robust",
    # round-8g additions (X96-X103), benched from birth.
    "dedup_within_doc_blocks",
    "dedup_corpus_blocks",
    "encoding_artifacts",
    "distinct_ngram_diversity",
    "source_overlap_kmv",
    "good_turing_missing_mass",
    "quality_rank_fusion",
    "lm_gate_ablation",
    "neyman_audit_allocation",
    "length_tail_hill",
    "shuffle_key_skew_audit",
    "range_partition_plan",
    "benford_value_audit",
    "multimodal_image_dims",
    "dedup_levenshtein_block",
    "signal_correlation_matrix",
    "signal_spearman_by_source",
    "join_size_estimate",
    "embedding_similarity_profile",
    "documents_constraint_suite",
    "source_mean_bootstrap_ci",
    "heaps_law_fit",
    "length_rank_test_en_zh",
    "length_ks_test_en_zh",
    "multimodal_wav_info",
    "doc_span_merge",
    "embedding_mmr_select",
    "conformal_value_bound",
    "dedup_modularity",
    # round-8i additions (X125-X127), benched from birth.
    "ann_ndcg_eval",
    "classifier_calibration",
    "split_kfold_grouped",
    # round-9 batch-1 additions (X128/X134/X135/X136/X145),
    # benched from birth.
    "term_burstiness",
    "winsorized_length_stats",
    "output_file_plan",
    "zorder_locality",
    "freshness_decay_weights",
    # round-9 batch-2 additions (X130/X132/X133/X137/X144),
    # benched from birth.
    "ivf_cluster_silhouette",
    "kmeans_lloyd_step",
    "semantic_threshold_calibration",
    "ccnet_perplexity_buckets",
    "doc_lang_mixture",
    # round-9 batch-3 additions (X129/X131/X138-X143/X146/X147),
    # benched from birth.
    "domain_tag_mixture",
    "markup_density",
    "unique_token_mass",
    "boundary_overlap_chains",
    "quantile_sample_error",
    "bitext_margin_mining",
    "source_coverage_greedy",
    "contrastive_pairs_plan",
    "dedup_survivor_bias",
    "pc_variance_explained",
    # round-10 cohort (X148-X155), benched from birth.
    "pii_cooccurrence_audit",
    "uniform_group_sample",
    "dedup_survival_by_source",
    "lm_heldout_eval",
    "exact_substring_cut_spans",
    "exact_substring_rewrite",
    "langid_source_agreement",
    "embedding_participation_ratio",
    # round-11 cohort (X156-X163), benched from birth.
    "tfidf_cosine_pairs",
    "bag_jaccard_pairs",
    "cdc_chunk_stats",
    "embedding_drift_by_label",
    "duplication_gini",
    "line_dedup_by_source",
    "cluster_dilution_audit",
    "minhash_calibration",
    # round-12 cohort (X164-X171), benched from birth.
    "winnow_fingerprints",
    "source_containment_direction",
    "dup_span_position_profile",
    "semantic_decontamination",
    "ivf_nprobe_recall_curve",
    "source_crossentropy_matrix",
    "mixture_epoch_plan",
    "line_dedup_rewrite",
    # round-13 cohort (X172-X179), benched from birth.
    "events_markov_transitions",
    "purchase_attribution_last_touch",
    "events_seasonality_chi2",
    "events_rfm_segments",
    "vocab_hll_estimate",
    "vocab_chao1_richness",
    "knn_hubness_audit",
    "neardup_paradigm_agreement",
    # round-14 cohort (X180-X187), benched from birth.
    "session_path_trigrams",
    "cohort_ltv_curves",
    "encoding_artifact_rewrite",
    "mixture_design_effect",
    "srp_cosine_calibration",
    "pq_distortion_by_label",
    "mutual_knn_clusters",
    "source_overlap_hll",
]

# The first 18 names above are the round-1 headline set — the stable
# cross-round comparison subset, emitted separately as
# "r1_subset_sec" in the JSON line so round-over-round comparisons
# don't conflate set growth with regressions.
R1_SUBSET = 18

# Round-over-round anchors (sf0.1, local[32], measured on an
# otherwise-idle machine — driver-recorded BENCH_r{N} numbers can run
# ~1.4× higher under concurrent load, uniformly across queries):
#   r1: 18-query subset = 14.77s (BENCH_r01, idle machine).
#   r2: 18-query subset = 14.63s re-measured idle (0.99× r1 — no
#       reproducible regression; BENCH_r02's 20.35s for the same
#       subset was a loaded-machine artifact). 26-query total =
#       22.7s idle / 32.4s driver-recorded.
#   r6 variance note (round-5 ask #1): BENCH_r05's ann_ivf_refined
#       4.50s (+59% vs r04's 2.83s) did NOT reproduce idle — 3×
#       re-measure gave [3.17, 2.586, 2.604] (median 2.60s, at the
#       r04 level) with zero Spark-side diff, i.e. load noise.
#       Single-run timing was the root cause; this file now times
#       each query N_RUNS times and reports the median, so one
#       loaded run can no longer masquerade as a regression.
#   r9 drift A/B (round-8 verdict task 5): the apparent ~1.2×
#       round-over-round drift vs r7 (r1 subset 12.57s -> 16.02s in
#       the r8 driver record) is NOT an operator regression — it
#       conflates two things. (a) The r8 timed-action change from
#       count() to the noop sink deliberately measures MORE work
#       (count() let Catalyst prune unreferenced output columns),
#       so r7 medians are not comparable; the valid same-action
#       baseline is BENCH_PINNED (r8h idle full run). (b) Against
#       THOSE pins, an idle r9 re-measure of the r1 anchor + the 10
#       r7-overlap heavies summed to 1.04× (43.4s vs 41.7s pinned;
#       per-query 0.69–1.29× with the heavies ~1.0–1.2×, inside the
#       shared-JVM variance band; min-based gate: zero firings).
#       Idle r1-subset-only run: 15.29s vs 13.36s pin-sum (1.14×,
#       small-query JVM variance). Conclusion: no drift to bisect;
#       cross-round comparisons must use pin-era-matched numbers.

# Timing discipline (round-5 ask #3): one untimed warm-up per query
# (codegen/planning caches), then N_RUNS timed runs. "queries" in the
# full record carries the per-query MEDIAN (scalar — what round-over-
# round comparisons use); "query_stats" carries
# {median, spread, min, max} where spread = max - min.
N_RUNS = 3

# Round-6 ask #8: the heaviest queries carry the most absolute noise
# (dedup_clusters' r6 spread was 0.44s on a 3.63s median), so they
# get extra timed runs — the median of 5 keeps a single loaded run
# from moving the reported number by ≥10%.
HEAVY_N_RUNS = 5
HEAVY = {
    "dedup_clusters",
    "ann_ivf_refined",
    "text_bigram_lm_score",
    "window_distribution",
    "tfidf_top_terms",
    # round-7 heavy additions (>4s medians in the round-7 record):
    # the cluster-composition chain, the LSH-recall eval, and the
    # full-pipeline composition.
    "split_leakage_safe",
    "dedup_best_of_cluster",
    "dedup_lsh_recall",
    "curation_manifest",
    # round-8 heavy additions (>4s idle medians in the round-8i
    # record): the prefix-filter join, the banding planner, the
    # b-bit eval, the modularity/CC chain, the scaled tree dedup,
    # and the k-fold plan (embeds the X7 CC like its X31 sibling).
    "dedup_prefix_filter_join",
    "dedup_lsh_plan",
    "dedup_bbit_minhash",
    "dedup_modularity",
    "semantic_dedup_tree",
    "split_kfold_grouped",
    # round-10 heavy addition (>4s idle median at birth): the
    # per-source survival funnel recomputes the X2d+X7 cluster chain.
    "dedup_survival_by_source",
}

# How many of the slowest per-query medians make it onto the stdout
# line (the full set lives in the committed full-record file).
SLOWEST_N = 10


# Ceiling on the calibration scaling of the gate threshold: however
# slow the host mode, the effective gate never exceeds
# threshold_x * CAL_SCALE_CAP (2.0 * 3.0 = 6x with the shipped pins)
# — a genuine plan regression still flags even in the worst observed
# host mode, while host drift alone cannot.
CAL_SCALE_CAP = 3.0

# r14 (ADVICE r13 item 1): host fixed-cost drift is ADDITIVE (a few
# tenths of a second per Spark job), so the multiplicative scaling is
# only the right model where the fixed cost DOMINATES the pin.  Pins
# up to CAL_DOMINATED_X * pin_cal_best (~1.3s with the shipped pins)
# get the full scaled threshold (unchanged r13 behavior — exactly the
# stall-burst band the four same-day idle runs flagged); larger pins
# get the scaling only on that dominated slice as an ADDITIVE
# allowance, so a slow host day grants a 10s-pin query ~2.8x, not 6x
# — a genuine 3x regression in real work now flags on any host mode.
CAL_DOMINATED_X = 10.0

# r14 (the structural fix for the per-session stall bursts six idle
# runs documented across r13/r14): the bursts hit DISJOINT sub-second
# -pin names each run (r13: 1 name, then 8 others, then the r1
# anchor; r14: 3 names incl. two at 5-10x pin, then 5 different ones
# at 3.5-5.5x) and every standalone fresh-JVM re-measure read at or
# near pin — the burst adds an ABSOLUTE ~1-2s to whichever queries it
# lands on, regardless of their pin, and the calibration micro does
# NOT capture it (run 2's bursts came with fast calibration).  A
# multiplicative gate can never be robust to an additive disturbance
# on a 0.3s pin, and inflating pins to a "stall-burst envelope"
# (the r13 treatment of 23 names) is whack-a-mole: this round's
# bursts simply flagged OTHER names.  So the gate carries an
# absolute allowance instead: a query only flags when its best run
# exceeds max(scaled 2x gate, pin + STALL_ALLOWANCE_SEC).  For
# multi-second pins the 2x term dominates (unchanged behavior); for
# sub-second pins a catastrophic regression (0.3s -> >2.3s, ~8x)
# still flags while the documented 1-2s burst band cannot.  With
# this in place the r13 envelope pins are repealed (re-pinned back
# down to fast-mode medians — the dated r13 condition, executed).
STALL_ALLOWANCE_SEC = 2.0


def check_regressions(
    timings: dict[str, float],
    sf_val,
    pin: dict | None,
    best: dict[str, float] | None = None,
    cal_best: float | None = None,
) -> dict[str, dict[str, float]]:
    """Round-7 ask #7: flag any per-query time beyond ``threshold_x``
    times its pinned value. The pin only applies at its own sf;
    unpinned (newly added) queries are skipped — they get a pin once
    their first official record lands.

    The gate compares the BEST run (min), not the median, when run
    minima are available: a REAL regression slows every run, while a
    one-off GC storm / compaction pause in a long shared-JVM pass
    spikes one or two runs and leaves the best run at the true cost
    (observed r8: ann_ivf ran 1.0/4.9/5.2s in one bench pass and
    1.2s standalone — a median gate flags a phantom; a min gate
    doesn't, and still trips when the operator itself got slower).

    Calibration scaling (round 13): pins are medians recorded in a
    PARTICULAR host mode; this machine's per-job fixed cost is
    bimodal and drifted 0.34 → 0.45 → 0.80s best across THREE
    same-day idle full runs, each run flagging a DIFFERENT disjoint
    set of sub-second-pin names with zero code changes — the gate
    was measuring the host.  When both the pin file and the current
    run carry the 1-shuffle calibration micro, the threshold scales
    by the host-mode ratio ``cal_best / pin_cal_best``, floored at 1
    (a fast host never shrinks the gate) and capped at
    ``CAL_SCALE_CAP`` (a slow host cannot hide an unbounded
    regression).  A plan regression is calibration-neutral, so it
    still flags; host drift alone no longer does.

    Dominance-bounded scaling (round 14, ADVICE r13 item 1): the
    fixed cost is additive per job, so uniform multiplicative scaling
    over-grants multi-second pins (a 3x-slower host day would let a
    10s-pin query run 60s undetected).  The scaled threshold applies
    in full only to the fixed-cost-dominated slice of each pin
    (min(pin, CAL_DOMINATED_X * pin_cal_best)); beyond it the slack
    is additive: gate = thr*pin + (cal_scale-1)*thr*dominated_slice.
    Identical to r13 behavior for every pin inside the dominated band
    (which is where every observed host-drift flag lived); sharply
    tighter above it.

    Stall allowance (round 14, the structural replacement for the
    r13 envelope pins): the gate is additionally floored at
    ``pin + STALL_ALLOWANCE_SEC`` — see the constant's comment for
    the six-run evidence trail.  Purely additive, so multi-second
    pins are unaffected; a sub-second-pin query still flags on any
    genuine blow-up past the documented burst band."""
    if not pin or pin.get("sf") != sf_val:
        return {}
    thr = float(pin.get("threshold_x", 2.0))
    pin_cal = (pin.get("calibration_sec") or {}).get("best")
    cal_scale = 1.0
    if cal_best and pin_cal:
        cal_scale = min(max(cal_best / float(pin_cal), 1.0), CAL_SCALE_CAP)
    out: dict[str, dict[str, float]] = {}
    for name, med in timings.items():
        base = pin.get("medians", {}).get(name)
        probe = (best or {}).get(name, med)
        if base and cal_scale > 1.0:
            dominated = min(base, CAL_DOMINATED_X * float(pin_cal))
            gate = thr * base + (cal_scale - 1.0) * thr * dominated
        else:
            gate = thr * (base or 0.0)
        if base:
            gate = max(gate, base + STALL_ALLOWANCE_SEC)
        if base and probe > gate:
            out[name] = {
                "best": probe,
                "median": med,
                "pinned": base,
                "ratio": round(probe / base, 2),
            }
    return out


def main() -> None:
    from poet_cloud_cost_etl_spark.config import EngineConfig

    cfg = EngineConfig.from_env()
    sf_dir = cfg.sf_dir
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = build_session(app_name="bench", **cfg.session_kwargs())
    spark.sparkContext.setLogLevel("ERROR")

    # Host calibration (round 13): the per-job fixed cost of a
    # canonical data-free 1-shuffle job, reported alongside the query
    # timings.  The gate compares medians against pins recorded in a
    # PARTICULAR host mode; this machine is documented bimodal (r11
    # investigation) and in round 13 the slow mode was measured at
    # ~4x the pin era's per-job cost (~0.5s vs ~0.13s steady for this
    # exact micro) — enough to flag every multi-job sub-second-pin
    # query without any plan change.  Recording the micro with every
    # run makes the mode VISIBLE in the artifact: pin-era calibration
    # lives next to the pins (BENCH_PINNED.json "calibration_sec"),
    # and a re-pin note can point at the measured shift instead of
    # inferring it from control queries.  12 warm-up-inclusive reps;
    # the reported best/median use the last 5 (JIT steady state).
    from pyspark.sql import functions as _F

    _cal_df = spark.range(5000)
    _cal_df.count()
    _cal_runs = []
    for _ in range(12):
        _t = time.perf_counter()
        _cal_df.groupBy((_F.col("id") % 523).alias("g")).count().write.format(
            "noop"
        ).mode("overwrite").save()
        _cal_runs.append(time.perf_counter() - _t)
    _tail = sorted(_cal_runs[-5:])
    calibration = {
        "best": round(_tail[0], 4),
        "median": round(_tail[len(_tail) // 2], 4),
    }

    names = [n for n in HEADLINE if n in QUERIES]
    # Guard the cross-round anchor: if any of the first R1_SUBSET
    # headline names were renamed/removed, the subset would silently
    # shift to include later queries and corrupt r1_subset_sec.
    assert names[: R1_SUBSET] == HEADLINE[: R1_SUBSET], (
        "r1 anchor subset drifted: a renamed/removed headline query "
        "would silently corrupt r1_subset_sec"
    )
    # SPARK_GRAFT_BENCH_ONLY=a,b,c restricts the run to the named
    # headline queries (r9: for idle A/B re-measures of a suspect
    # subset without paying the full multi-minute pass).  Headline
    # order is preserved; r1_subset_sec is emitted only when the
    # whole anchor subset is present.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        wanted = {w.strip() for w in only.split(",") if w.strip()}
        unknown = wanted - set(names)
        assert not unknown, f"SPARK_GRAFT_BENCH_ONLY names not in HEADLINE: {sorted(unknown)}"
        names = [n for n in names if n in wanted]

    # Steady-state methodology: each query runs once to warm codegen/
    # planning caches (not counted), then N_RUNS timed runs; the
    # median is the reported number. Cold-start JVM/compile costs are
    # a per-process constant, not a property of the operators under
    # test; the median absorbs one-off load spikes that single-run
    # timing recorded as phantom regressions (see r6 variance note).
    import statistics

    def _release_persisted() -> None:
        # Operators that localCheckpoint (CC rounds, IVF centroid
        # refinement) leave pinned RDD blocks behind; across ~60
        # back-to-back queries those accumulate into GC pressure that
        # bleeds one query's cost into the next. Each query is timed
        # as if it ran alone.
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()

    # Timed action: write to the `noop` sink, NOT `.count()`.  Under
    # count() Catalyst prunes every column no operator references —
    # which legitimately deletes the final row-preserving join of a
    # unique-keyed aggregate AND the entire expression tree of
    # per-row-output operators (measured: doc_compressibility 0.24s
    # counted vs 3.32s materialized at sf0.1; substring_dup_coverage
    # 0.39s vs 2.02s).  The noop sink evaluates every output column
    # JVM-side with zero serialization to the driver — the number is
    # the cost a real consumer pays.  Round-8 change; all pins were
    # re-measured under the new action (BENCH_PINNED.json comment).
    timings: dict[str, float] = {}
    stats: dict[str, dict[str, float]] = {}
    for name in names:
        _release_persisted()
        df = QUERIES[name](spark, sf_dir)
        assert df.count() >= 0  # row-count sanity + warm-up, untimed
        df.write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(HEAVY_N_RUNS if name in HEAVY else N_RUNS):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 4)
        stats[name] = {
            "median": round(statistics.median(runs), 4),
            "spread": round(max(runs) - min(runs), 4),
            "min": round(min(runs), 4),
            "max": round(max(runs), 4),
            "n_runs": len(runs),
        }
    total = round(sum(timings.values()), 4)
    anchor = [n for n in HEADLINE[:R1_SUBSET] if n in timings]
    subset = (
        round(sum(timings[n] for n in anchor), 4)
        if len(anchor) == R1_SUBSET
        else None
    )
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    full = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "query_stats": stats,
        "sf": sf_val,
        "r1_subset_sec": subset,
        "n_runs": N_RUNS,
        "heavy_n_runs": HEAVY_N_RUNS,
        "host_calibration_sec": calibration,
    }
    # A SPARK_GRAFT_BENCH_ONLY subset run must NOT clobber the
    # committed full-pass record (observed r9: a 2-query A/B
    # overwrote the 168-query BENCH_FULL_LATEST) — subset runs only
    # write when SPARK_GRAFT_BENCH_OUT names an explicit target.
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT")
    if out_path is None and not os.environ.get("SPARK_GRAFT_BENCH_ONLY"):
        out_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "BENCH_FULL_LATEST.json",
        )
    if out_path is not None:
        try:
            with open(out_path, "w") as f:
                json.dump(full, f, indent=1, sort_keys=True)
                f.write("\n")
        except OSError:
            out_path = None  # read-only checkout: stdout line still valid
    # Per-query regression gate (round-7 ask #7): compare each median
    # against the committed pin (BENCH_PINNED.json — updated
    # DELIBERATELY after an idle re-measure, never by this script) and
    # exit non-zero on any >threshold_x regression. Only applies when
    # the run's sf matches the pin's sf; queries without a pinned
    # median (new this round) are skipped — they get pinned once their
    # first official record lands. SPARK_GRAFT_BENCH_NO_GATE=1
    # disables the gate (e.g. for deliberately-loaded experiments).
    regressions: dict[str, dict[str, float]] = {}
    pin_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_PINNED.json"
    )
    if not os.environ.get("SPARK_GRAFT_BENCH_NO_GATE"):
        try:
            with open(pin_path) as f:
                pin = json.load(f)
        except (OSError, ValueError):
            pin = None
        best = {n: s["min"] for n, s in stats.items()}
        regressions = check_regressions(
            timings, sf_val, pin, best, calibration["best"]
        )
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:SLOWEST_N]
    )
    line = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": slowest,
        "sf": sf_val,
        "r1_subset_sec": subset,
        "n_queries": len(timings),
        "n_runs": N_RUNS,
        "full_record": out_path,
        "host_calibration_sec": calibration,
    }
    if regressions:
        line["regressions"] = regressions
    print(json.dumps(line))
    spark.stop()
    if regressions:
        print(
            f"bench: {len(regressions)} per-query regression(s) beyond "
            f"the pinned 2x gate: {sorted(regressions)}",
            file=sys.stderr,
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
