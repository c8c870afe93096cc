"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized via the noop sink (count() would let
Catalyst prune the computed columns).

Timing methodology (round 4): one untimed warmup run per query (plan
compile, codegen, file-listing caches), then median of 3 timed runs —
single-shot numbers at this SF carried ±20-30% run-to-run noise on
identical code (r1 vs r3), bigger than most effects being measured.
"value" is the sum of per-query MEDIANS; "queries_min" carries the
per-query minima as the low-noise floor.

Multi-pass doctrine (round 15): the r14 closing ledger recorded four
same-day benches on byte-identical code spreading 16.6-23.8 s headline
— host weather, not code. The headline section now runs TWO full
passes separated by the extras section (minutes apart); each query
reports the median of its 6 timed runs, and the payload carries the
per-pass totals + spread ("headline_pass_totals"/"..._spread") so a
round-over-round mover can be read against the same-session spread
before anyone chases it. Pipeline e2e runs 3 passes, median reported,
all runs in the payload.

Payload budget (round 5): the driver records only a bounded TAIL of
stdout, and round 4's full payload outgrew it (BENCH_r04.json ended up
"parsed: null" — the headline number was unverifiable). The stdout line
now carries ONLY the driver-contract fields (metric/value/unit/queries/
sf) plus scalar summaries and the headline per-query minima ("queries_min",
r16 verdict order #7 — the noise floor PERF adjudicates movers against,
~700 bytes); everything else (extras, pipeline row counts, errors) goes
to BENCH_DETAIL.json at the repo root.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lakehouse_architecture_spark.session import get_spark  # noqa: E402

# Timed separately from HEADLINE (whose membership stays fixed so the
# headline total is comparable round over round); reported under
# "extra_queries" in the JSON payload.
EXTRA = [
    "q2_min_cost_supplier",
    "docs_tfidf_top_terms",
    "docs_novelty_score",
    # the loose 0.45/12x4 sign-LSH twin was retired in r11 (regime
    # mismatch — its lesson lives in emb_lsh_candidate_stats, which
    # still measures that config's candidate ratio). The production
    # 0.8/8x8 config is what gets measured.
    "emb_near_dup_lsh_strict",
    "emb_int8_quantization",
    "events_anomaly_zscore",
    "events_gapfilled_hourly",
    "window_percent_rank_cume",
    "agg_argmax_by_status",
    "stats_corr_price_qty",
    "emb_kmeans_clusters",
    "events_hll_sketch_rollup",
    "events_kmv_intersection_qa",
    "events_kmv_daily_rollup",
    # r11 additions: the set-difference member of the KMV family and
    # the mergeable histogram quantile rollup. customers_fuzzy_pairs_d2
    # is deliberately NOT benched: on this corpus's zero-dense
    # sequential names its candidate volume is the documented
    # adversarial case (~19 s/rep at sf0.1 for 4M verified pairs), so
    # an extras row would time the data pathology, not the plan;
    # customers_fuzzy_name_stats times the blocking family.
    # parts_coorder_kcore is also NOT benched: a driver-bounded
    # peeling loop times the iteration count, not a data-sized plan
    # (the BPE/pagerank doctrine) — parts_coorder_core_numbers (r12)
    # inherits the same exemption.
    "events_kmv_new_vs_returning",
    "events_value_quantile_rollup",
    # r12 additions: the d2 fuzzy plan is now TIMED, twice over —
    # docs_prefix_fuzzy_pairs_d2 runs the uncapped plan on a natural
    # corpus (max bucket 4, so the wall is the variant explode + one
    # keyed shuffle + SMJ, not a pathology), and
    # customers_fuzzy_pairs_d2_capped runs the max_bucket=16 regime on
    # the adversarial corpus (sum|bucket|^2 65M -> 1.13M). The full
    # uncapped customer-name row stays bench-exempt as before.
    "docs_prefix_fuzzy_pairs_d2",
    "customers_fuzzy_pairs_d2_capped",
    "events_value_quantile_rollup_by_type",
    "docs_bigram_cross_entropy",
    "emb_lsh_candidate_stats",
    "docs_chunk_manifest",
    "docs_curation_funnel",
    "docs_incremental_near_dups",
    "docs_incremental_near_dups_indexed",
    # round-5 additions
    "docs_dedup_keep_best",
    "docs_dedup_savings_report",
    "minhash_estimate_qa",
    "minhash_recall_curve",
    "emb_ivf_probe_stats",
    "emb_knn_ivf_md5",
    "events_trailing_24h_volume",
    "events_user_lifetime",
    "orders_rfm_segments",
    "lineitem_unpivot_measure_stats",
    "window_first_last_dense",
    "stats_skew_kurtosis_qty",
    # round-6 additions (changed plans worth tracking). emb_knn_ivf is
    # deliberately NOT benched: since r6 it is the recall-QA contract
    # (IVF + exact brute force + recall join), so its wall would say
    # nothing about the IVF plan — emb_knn_ivf_md5 times the actual
    # probe-pruned search.
    "events_value_p95_by_type",
    # round-7 additions: the corpus-profile analytics with real data
    # volume under them (the source-overlap matrix shuffles the whole
    # shingle stream; Pareto exercises the two-phase prefix sum)
    "docs_source_shingle_overlap",
    "docs_vocab_growth_by_source",
    "orders_pareto_concentration",
    "events_seasonal_anomaly",
    "lineitem_price_percentiles_by_flag",
    "events_session_length_percentiles",
    "events_user_volume_concentration",
    # round-7b additions. docs_bpe_encode_stats is deliberately NOT
    # benched: its wall is dominated by the 10 driver-bounded training
    # iterations (the same reason docs_bpe_merge_qa isn't benched), so
    # it would time the fixpoint loop, not a data-sized plan.
    "events_cms_topk_accuracy",
    "sql_bucketed_colocated_join",
    # round-7c additions: the new data-sized plans. The learned-filter
    # and HLL-intersection QAs are deliberately NOT benched (driver-
    # bounded iteration / multi-action certificate queries — the BPE
    # doctrine); scoring itself is a pure projection folded into
    # docs_learned_filter_apply's one training pass.
    "emb_semantic_dedup",
    "parts_coorder_triangles",
    "orders_bloom_prune_stats",
    "customers_fuzzy_name_stats",
    "lineitem_salted_agg_by_flag",
    "lineitem_ols_price_on_qty",
    "events_ab_test_value_ztest",
    "events_chi2_type_dow",
    "events_cusum_daily_drift",
    "orders_incremental_rollup_state",
    "orders_trend_by_segment",
    "lineitem_key_skew_profile",
    "orders_expectation_report",
    "scalar_array_funcs",
    "scalar_null_semantics",
    "scalar_bitwise_funcs",
    # r8 additions: substring-level dedup (DF-capped posting joins)
    "docs_shared_span_pairs",
    "docs_copied_span_profile",
    "docs_incremental_copied_spans",
    # r14 additions: all seven new rows are data-sized plans (no
    # driver-bounded loops): the prefix-filter set-similarity join
    # (warm ~7-8 s at sf0.1 — the documented low-threshold/dense-vocab
    # regime constant, see r14/prefix-filter-regime), the two
    # global_row_number consumers (length deciles, Gini determinants),
    # the integer-exact profile trio (Benford digits, supplier
    # concentration bands, Zipf slope), and the LATERAL top-N SQL
    # surface.
    "docs_prefix_filter_jaccard_join",
    "docs_length_decile_profile",
    "orders_customer_spend_gini",
    "parts_supplier_concentration",
    "orders_benford_first_digit",
    "docs_zipf_slope",
    "sql_lateral_top_orders",
    # late r14: the containment rung (one aggregate after the shared
    # posting join). parts_coorder_weighted_pagerank is deliberately
    # NOT benched: a 12-iteration driver-bounded loop times the
    # iteration count, not a data-sized plan (the pagerank doctrine).
    "docs_overlap_coefficient_pairs",
    # r15: the production-regime prefix twin (t=0.8 — the pruning
    # regime), the forward as-of, and the charset census
    # (lineitem_price_equidepth_bands moved to HEADLINE in r16)
    "docs_prefix_filter_jaccard_join_strict",
    "asof_join_forward_tolerance",
    "docs_script_census",
    # r16: the leakage audit and the two-phase per-source sample are
    # data-sized plans; lineitem_winsorized_price_stats doubles as the
    # bench tracker for the restated quantile machinery
    "docs_split_leakage_audit",
    "docs_sample_topk_per_source",
    "lineitem_winsorized_price_stats",
]

# EXTRAS BUDGET POLICY (r16, verdict order #7): the extras block grows
# linearly with the registry (78 rows / 95.3 s at r15) and was on course
# to dominate bench wall. Rows named in EXTRA_ALWAYS — standing
# regime/adjudication subjects whose figures bench notes cite, plus the
# newest two rounds' additions while they are fresh — are timed every
# run; the REMAINING rows rotate through a contiguous window of
# EXTRA_ROTATE_N, keyed on a 6-hour wall-clock index so consecutive
# driver rounds see different windows and every row is re-timed every
# ~3 benches. Per-query medians stay comparable across rounds (keyed by
# name); the extras TOTAL is only comparable between runs that timed
# the same subset, so the payload carries "extras_policy" + the subset
# size. The full EXTRA list remains append-only.
EXTRA_ALWAYS = [
    "docs_prefix_filter_jaccard_join",
    "docs_prefix_filter_jaccard_join_strict",
    "docs_curation_funnel",
    "customers_fuzzy_pairs_d2_capped",
    "emb_semantic_dedup",
    "docs_source_shingle_overlap",
    # newest-rounds block (r15-r16)
    "asof_join_forward_tolerance",
    "docs_script_census",
    "docs_split_leakage_audit",
    "docs_sample_topk_per_source",
    "lineitem_winsorized_price_stats",
]
EXTRA_ROTATE_N = 30


def extras_window(now: float | None = None) -> list[str]:
    """The extras subset this run times: EXTRA_ALWAYS + a rotating
    contiguous window (wrapping) of EXTRA_ROTATE_N over the rest, in
    EXTRA's order."""
    rest = [e for e in EXTRA if e not in EXTRA_ALWAYS]
    if len(rest) <= EXTRA_ROTATE_N:
        return [e for e in EXTRA if e in EXTRA_ALWAYS or e in rest]
    slot = int((now if now is not None else time.time()) // 21600)
    start = (slot * EXTRA_ROTATE_N) % len(rest)
    rotated = [
        rest[(start + i) % len(rest)] for i in range(EXTRA_ROTATE_N)
    ]
    keep = set(EXTRA_ALWAYS) | set(rotated)
    return [e for e in EXTRA if e in keep]

# Round-scoped measurement conclusions, recorded into BENCH_DETAIL.json
# so the numbers and their interpretation travel together. This list is
# the SOURCE OF TRUTH: the writer merge-preserves any extra notes found
# in the existing BENCH_DETAIL.json (a driver bench refresh in a fresh
# session must not drop a conclusion recorded mid-round — the r9
# adjudication was lost exactly that way).
NOTES: list[str] = [
    "r17/winsorized-sf1-receipt (r16 verdict order #6): the r16 one-persisted-frequency-relation restatement of lineitem_winsorized_price_stats, locally neutral at sf0.1, got its at-scale receipt: interleaved A/B at sf1 (tools/gen_testdata.py 1 /tmp/sf1 — lineitem 6M rows, 10x the bench corpus), 3 alternating reps, rows identical: old (r15 shape, old window-quantile operator) median 7.662 s / min 7.330 vs new 5.660 / 5.452 — 1.35x. The structural claim (10 -> 1 scan locations) is now measured where the data-proportional term dominates.",
    "r17/sign-lsh-shape-remeasured (r16 verdict order #6, verdict REVERSED per guide 'measure first'): the r16 grouped-generator rewrite of sign_lsh_candidates carried only an at-scale argument; measured where the quadratic term dominates (40k vectors / 94M strict-config candidates, interleaved, counts identical) the generator form lost in BOTH sessions: unhinted r15 SMJ 122.3 vs generators 148.7 s median (0.82x), and the final merge-hinted SMJ 58.8 vs generators 188.6 s median (3.2x) in its own interleaved session — explode(slice(vs,...)) copies O(|cell|^2) array elements per cell, and LSH cells are |corpus|/2^bits-sized by construction (unlike the small minhash/simhash buckets where the generator pattern wins). At sf1 (500k vectors) the r15 shape additionally died with an executor heap OOM from AQE broadcasting the statically-unsized generate output — the REAL r16 hazard. Resolution: sign_lsh_candidates reverted to the band self-join with a pinned merge hint (no broadcast build side possible, no array copying); bench-corpus wall unchanged (both forms were measured neutral at sf0.1 in r16). The loose 12x4 config remains corpus-pathological at 500k vectors in ANY shape (~n^2/16 candidates filled 80 GB of shuffle temp) — that is the documented negative-example geometry, not a plan property.",
    "r16/quadratic-oracle-midscale-receipt (verdict order #5): the only two registry rows never value-verified above sf0.01 — customers_entity_resolution and customers_fuzzy_pairs_d2, whose DUCKDB oracles are O(n^2) all-pairs scans and therefore skip the sf0.1 sweep (the Spark sides are fine and their production-regime twins ARE sf0.1-verified) — now carry a bounded-scale value receipt: both PASS a full value comparison at sf0.03 on a fresh-seed corpus (tools/gen_testdata.py 0.03 /tmp/sf003_2026 2026; ORACLE_CHECK_PLAIN=1 check_oracle, 2 pass / 0 fail), 3x the gate scale and within the band the r15 verdict asked to cover. No code change; evidence-only.",
    "r16/pq-drift-adjudication: CLOSED as host weather. The r12-r15 sweep drift of emb_pq_quantization_qa (9.0 -> 13.3 -> 11.8 -> 18.4 s, all single non-interleaved reads) got the interleaved A/B the doctrine requires: 6 alternating reps against a stable control (emb_near_dup_pairs) in one sf0.1 session read pq median 13.91 / min 9.86 s with the control flat at median 2.20 / min 1.75 s. The 9.86 s floor matches the r12-era 9.0 s baseline within single-run noise, the control shows no session-wide slowdown, and no code touched this path since the r11 HOF-fold fix — the 18.4 s sweep reading was contention on a non-interleaved read. The row's inherent ~10 s is the documented train+encode+ADC work; no regressing stage exists to fix.",
    "r16/quantile-anchor-restatement: approx_distinct_and_quantile (27.2 s, the slowest r15 sweep row and the one standing plan contradicting the 100x doctrine) and quantiles_exact no longer go through F.percentile's per-group value->count aggregation buffer (memory bounded by distinct prices per group — the executor-OOM shape the r7 bucketed rewrite removed from lineitem_price_percentiles_by_flag). Both now ride operators/quantiles.grouped_interpolated_quantiles: the same counts->coarse-bucket->running-count machinery as grouped_exact_percentiles, extended to the quantile_cont/F.percentile linear-interpolation convention by picking each target rank's two bracketing members off the rank-interval relation and interpolating in a |groups|x|qs|-row aggregate. Every window partitions by (group, bucket); no aggregation buffer grows with data. Compared surfaces unchanged, both rows oracle-green at sf0.01, plan assertion pins 'no percentile( in either optimized plan', value-identity unit test vs F.percentile covers ties/odd/even/single-row/null-value/null-group. Measured at sf0.1: 27.2 -> 2.5-3.5 s warm (11.6 cold), ~8x, removing the sweep's worst row.",
    "r16/extras-budget-policy (verdict order #7): the extras block (78 rows, 95.3 s at r15) grows linearly with the registry and had come to dominate bench wall. bench.py now times EXTRA_ALWAYS (8 standing regime/adjudication rows + the newest rounds' additions) every run plus a rotating contiguous 30-row window over the rest, keyed on a 6-hour wall-clock slot so consecutive driver rounds cover different thirds; every row is re-timed every ~3 benches. Per-query medians remain comparable round-over-round; the extras TOTAL is only comparable between runs timing the same subset, so the payload now carries extras_policy {always, rotate_n, timed, of}. EXTRA itself stays append-only. Also r16: lineitem_price_equidepth_bands moved from extras to HEADLINE (verdict order #4 — the global_row_number near-unique-key witness gets driver-grain regression coverage), so headline totals from r16 on carry one structural +~2-3 s vs r15; compare per-query medians across that boundary.",
    "r15/closing-ledger: final tree, 227 queries/227 oracles (+4 this round: docs_prefix_filter_jaccard_join_strict — the production-regime t=0.8 prefix-filter twin, 21% of postings indexed, 25 candidates vs 3,058 at t=0.3, 122x reduction with perfect precision; lineitem_price_equidepth_bands — equal-count 20-band price histogram, the third global_row_number consumer and the driver-gate witness for its near-unique-key regime; asof_join_forward_tolerance — FORWARD as-of with 1h tolerance, one-shuffle union-and-carry in descending time with strict-after tie handling; docs_script_census — per-source character-class census as regex MATCH COUNTS on both engines, never length arithmetic). Final-tree evidence: pytest 504/504 re-run on the closing tree (the three r15 test additions included); FIVE consecutive driver-order 50-window walks 50/50 in plain sessions (the r14 verdict's >=5x flake hunt — no flake found, consistent with the gini type-surface verdict); full plain sweeps 227/227 on FOUR corpora (driver sf0.01 + fresh seeds 1207, 4242, and the never-before-used 7777 generated this round); MAGNITUDE_r15.json — all 227 run at sf0.1, 0 errors, 478.7 s total (down from 555.9 at a larger registry, mostly the rcte fix); ORACLE_SF01_r15.json — 225/225 value-verified at sf0.1, 0 failures/timeouts, the 2 documented quadratic-oracle skips. Structural work: the r14 red killed (gini BIGINT restatement + decimal twin pinned), global_row_number two-phase range offsets (no unpartitioned window anywhere, property-tested across random corpora and partition counts), sql_recursive_cte_calendar carried-bounds fix (16.35 -> 0.84 s minima, 19x — a REAL plan defect found via the >10s-row audit), all four r14 ADVICE items closed in source, multipass bench doctrine encoded in bench.py. THREE multipass closing benches on the final tree: 15.454 s (pass totals 15.992/14.968), 15.382 s (16.106/14.570), and 19.941 s (29.821/13.619) — the third run is the doctrine CAUGHT WORKING: its first pass hit 29.8 s of host contention while the SAME session's second pass read 13.62 s, the round's floor, so the median-of-6 absorbed a 2.2x weather swing that a single-read bench would have minted as a regression (exactly the r13/r14 mover mechanism, now visible inside one payload). Six headline passes span 13.62-29.82 s with five of six in 13.6-16.1; pipeline e2e medians 7.417/7.919/7.187 s (all runs 6.85-10.81 — the r14 13.9 s watch item resolved WELL below the 9.64-13.69 spread), extras ~82 s while absorbing four new benched rows, 0 errors in all three. EXPLAIN.md regenerated byte-identical (headline plans untouched).",
    "r15/gini-red-adjudication: the r14 driver gate's ONE red (orders_customer_spend_gini, hash_match false with rows+schema true) adjudicated as a TYPE-SURFACE suspect and closed by restating the emitted determinants in plain BIGINT on both engines. Evidence for the verdict: the row passed every local harness before AND after the red — sf0.01 plain-session sweep, the exact 50-query driver-order window walk (twice in the builder's hands r14, twice in the judge's), the sf0.1 value sweep, two fresh-seed corpora — and the emitted surface was all-integer, so a deterministic cross-engine divergence would have reproduced somewhere; it never did. The ONLY property distinguishing this row from the 222 green ones was its type: the registry's sole decimal(38,0) aggregate (HUGEINT-cast on the oracle side), and the str()-normalizing local replica is structurally blind to a driver hasher that treats decimal128 scale/precision metadata or Decimal objects differently from int64. Remaining alternative (a rare driver-session nondeterminism) is made moot by the same fix: S0/S1 fit far below 2^63 at every shipped SF (sf0.1 S1 ~ 3.4e16; overflow needs ~sf100), the oracle keeps the rk*cents product in HUGEINT before the exact BIGINT cast, and the decimal(38,0) form of the SAME determinants stays pinned by tests/test_ranking.py as a value-identical twin so the wide-type doctrine path remains tested without riding the driver's hash.",
    "r15/global-row-number-range-offsets: the r14 verdict's scale flag on operators/ranking.global_row_number (the offsets running sum was a no-PARTITION window over the distinct-value relation — fine for deciles over doc lengths, but per-customer cents are NEAR-UNIQUE, and Spark logged 'WindowExec: No Partition Defined ... single partition' on the gini consumer: a billion-row single-task sort at 100x) closed with two-phase range offsets: repartitionByRange(value_cols) over the counts relation, per-range-partition totals (<= shuffle-partitions rows) collected as cumulative pid offsets and broadcast-joined back, within-partition running sum via Window.partitionBy(_pid). The range partitioning is pinned by an eager localCheckpoint because RangePartitioner samples with an RDD-id-derived seed — two separate jobs planning the same repartitionByRange can draw DIFFERENT boundaries, and the collected pid totals would then disagree with the pids the running-sum job sees, silently corrupting every rank (caught at design time, not by a failure). Rows bit-identical to the plain window on the mixed tied/near-unique test corpus; no unpartitioned window in either consumer's optimized plan (pinned by tests/test_ranking.py plan assertions on BOTH consumers).",
    "r15/prefix-filter-strict-receipt: the r14 verdict's order 5 shipped as docs_prefix_filter_jaccard_join_strict (t=0.8, 5*inter >= 4*union) — the production-regime twin of the deliberately-worst-regime t=0.3 row. Measured candidate reduction at sf0.01, same ordered relation both thresholds: t=0.8 indexes 5,533 of 26,136 postings (21%) and emits exactly 25 candidates — all 25 true pairs, perfect precision — vs t=0.3's 18,568 postings (71%) and 3,058 candidates into the same verify, a 122x reduction from the threshold alone. The persisted ordered-prefix relation was made threshold-independent (prefix_len computed at explode time) so both rows share one warm slot end-to-end; exactness unchanged (brute posting-join oracle at the same threshold + the t-parameterized hypothesis property test).",
    "r15/rcte-carried-bounds: sql_recursive_cte_calendar was the sweep's only unadjudicated >10 s row (14.7 s in MAGNITUDE_r14) and turned out to be a REAL plan defect, not contention: the recursive step joined months with the bounds CTE, and Spark INLINES non-recursive CTEs — so all ~80 recursion steps re-ran the min/max aggregate over the 150k-row orders table (DuckDB materializes bounds once, which is why the oracle side never showed the cost and the row stayed value-green throughout). Fix: carry the bound as a COLUMN of the recursive relation (months(m, hi) — the standard carried-constant recursion shape), aggregating orders once in the anchor. Interleaved same-session A/B at sf0.1: old 25.43/17.37/16.35 s vs new 1.24/0.89/0.84 s — 19x at the minima, rows identical. Both engine texts restated symmetrically; the lesson generalizes: any recursive CTE whose step references a non-recursive CTE re-evaluates it per step on Spark.",
    "r15/multipass-bench-doctrine: encoded the r14 closing ledger's 4-run rule into bench.py itself — the headline section runs TWO full passes separated by the extras block (minutes apart), per-query figures are medians of 6 timed runs, and the payload carries headline_pass_totals + headline_pass_spread; pipeline e2e runs 3 passes with the median reported and all runs recorded. The r14 pipeline watch item (13.883 s single read, untouched code, 9.64-13.69 s same-day spread) is resolved by construction: future rounds compare medians-with-spread, and a single high read can no longer mint a watch item.",
    "r14/closing-ledger: final tree, 223 queries/223 oracles (+9 this round: docs_prefix_filter_jaccard_join — EXACT prefix-filtered set-similarity join proved by row equality against the brute posting-join oracle; docs_overlap_coefficient_pairs — the asymmetric containment rung (overlap coefficient >= 0.8 as 5*inter >= 4*min) sharing the minhash family's warm slots; parts_coorder_weighted_pagerank — rank by co-order multiplicity via the new exchange-free weighted_pagerank operator, 12-stage unrolled oracle, 20k node scores value-verified at sf0.1; docs_length_decile_profile + orders_customer_spend_gini — the two consumers of the new operators/ranking.global_row_number, an exact distributed total-order rank with no single-partition window; orders_benford_first_digit + parts_supplier_concentration — all-integer forensics/concentration profiles with ppm shares via integer DIV; docs_zipf_slope — rank-frequency OLS with libm on integer args only; sql_lateral_top_orders — LATERAL correlated subquery with per-row ORDER BY + LIMIT, same ANSI text both engines). Final-tree evidence: pytest 490/490; full plain sweeps green on THREE corpora at the final registry (driver sf0.01 223/223 plain-session, fresh seeds 1207 + 4242 223/223 each); driver-order 50-window walk 50/50 plain (three times this round as the window grew); MAGNITUDE_r14.json — all 223 queries run at sf0.1, 0 errors, 555.9 s total; ORACLE_SF01_r14.json — 221/221 value-verified at sf0.1, 0 failures/timeouts, the 2 documented quadratic-oracle skips; every artifact regenerated on the final tree. Measured perf win: docs_bpe_encode_stats DICTIONARY-ENCODED (token counts folded once per DISTINCT word over the trainer's frequency relation, broadcast under a 2M vocab cap, joined back to the exploded instance stream instead of running the 10-deep merge fold per word instance) — interleaved same-session A/B median 15.21 -> 2.14 s on the encode stage, rows identical, gated on all four corpora. Structural work: connected_components routed through loop_round (per-round block release + reliable checkpoint_dir mode, cross-mode identity pinned), slot keys abspath-resolved at registration (r13 ADVICE), overlap-pair census integral end-to-end (r13 ADVICE). All three r13 watch items closed by measurement: TPC-H movers = host contention (controls moved 2-6x in lockstep inside one session; q1's session MIN returned to 1.08 s, inside its historical range), link-prediction HAVING probe refuted (anti-join already AQE-broadcast; the wedge aggregate IS the cost), BPE/k-means exchange audit found no stable relation to pin (31-row vocab, kxdim broadcast). Closing benches over the same final-day code read headline 22.29 / 23.77 / 16.60 / 23.16 s and pipeline 10.46 / 9.64 / 13.69 / 10.51 s — a +/-40% same-day host spread on byte-identical plans that IS the contention adjudication's evidence; compare r15 medians against the set, not any single run. Extras 106.1 s absorb the eight new benched rows (the weighted-pagerank loop is bench-exempt by the iteration doctrine). EXPLAIN.md regenerated byte-identical (headline plans unchanged).",
    "r14/prefix-filter-regime: docs_prefix_filter_jaccard_join (new) measured at sf0.1 — cold ~19 s (shared gram-array build dominates, same as the posting join's cold path), warm ~7-8 s vs docs_ngram_jaccard_pairs' ~2.8 s. Decomposition: at t=0.3 the prefix keeps 71% of postings (185,040 of 260,388; prefix length is |x|(1-t)+1) and the synthetic corpus's 31-word vocabulary makes every shingle common, so 597k candidate pairs reach the array_intersect verify. This is the documented regime tradeoff, not a defect: prefix filtering is a high-threshold (t>=0.7), heavy-tailed-df tool; at t=0.5 the result set here is IDENTICAL (256 pairs — the corpus's near-dups are all J>=0.5) and at web-scale thresholds the prefix index is what survives while the full posting join does not. The row's purpose is exactness proof (row equality vs the brute-force oracle at four corpora + the t-parameterized property test); the constant is documented in the docstring.",
    "r14/bpe-kmeans-exchange-audit: the r13 verdict's order 4 (extend the exchange-free round recipe to the BPE merge loop and the k-means Lloyd iterations — measure first, ship only at >=1.3x) closed by MEASUREMENT with NO change shipped, the core-numbers lesson applied: neither loop has a stable heavy relation being re-exchanged. BPE train at sf0.1: the corpus pass + vocab checkpoint is 3.6 s, then each merge round costs 0.42 s pair-aggregate + 0.18 s fold/checkpoint on a THIRTY-ONE-row vocabulary (the synthetic corpus's distinct whitespace tokens) — per-round job-scheduling overhead, zero exchange volume; structurally the recipe cannot apply because the vocab relation is REWRITTEN by the fold every round (nothing stable to persist-partition) and the aggregate key (the symbol pair) changes with the merges. k-means (kmeans_refine, emb_kmeans_clusters 1.99 s / IVF two-step training): assignment broadcasts the kxdim centroid relation into the corpus scan (no corpus shuffle), and the centroid update is a posexplode aggregate that map-side-combines to kxdim partials per partition — the exchanged bytes are partitions*k*dim regardless of corpus size, already the minimal shape. The remaining BPE wall (docs_bpe_encode_stats ~14 s) is Catalyst expression-fold latency on the apply path, documented since r10 — not an exchange.",
    "r14/link-prediction-decomposition: the r13 verdict's order 5 (try the two-pass HAVING threshold probe on parts_coorder_link_prediction's 25.2 s) closed by MEASUREMENT with the hypothesis refuted — no change shipped. Stage decomposition at sf0.1: edge build 5.0 s (1.196M edges), wedge explode+aggregate 15.2 s (59.99M distinct pairs from ~65M wedges — multiplicity ~1.08, so map-side partial aggregation collapses nothing and the hash-agg shuffle is the irreducible exact-count cost), anti-join + top-20 on the cached pair relation 8.5 s nominal BUT the executed plan shows AQE already converts it to BroadcastHashJoin LeftAnti BuildRight at BOTH sf0.01 and sf0.1 (the 1.2M-edge relation is ~19 MB) — the stage the HAVING probe would prune is already a scan-speed broadcast probe, and an interleaved A/B of an explicit F.broadcast hint vs the plain join read equal minima (15.7 vs 16.5 s end-to-end, rows identical). A limit-based candidate probe (top-4096 pairs then anti-join) was tried and is UNSAFE: the top-20 floor is n_common=7 with a tie group spanning far past any fixed candidate budget (measured result mismatch). Verdict: the 25 s row IS the wedge-aggregate cost, bounded by construction at 128*|adj|; the right lever at cluster scale is a lower center cap or sampling, both of which change the row's exact semantics — keep the documented cost.",
    "r14/tpch-movers-adjudication: the r13 verdict's order 2 (q1 2.854 / q3 1.300 / q5 1.586 s vs r12's 1.211/0.746/1.112 on byte-unchanged code, with q1's session MIN also above its historical range) closed as a HOST-CONTENTION verdict via two interleaved A/B sessions (7 alternating reps each, suspects + two byte-unchanged in-band controls q9/q10, one warmed sf0.1 session per run, 20 min apart): run 1 — q1 med 1.869 (BELOW its r13 bench read), q3 0.819, q5 1.479, while control q10 read 2.561 (2.0x ITS r13 level 1.262) and q9 1.982 (1.9x); run 2 — everything 2.5-6x historical (q1 5.868, q9 4.675, q10 3.202) with within-session spreads of 3.4-6.2 s and 15-min loadavg 4.8. Controls moving in lockstep with (and harder than) suspects inside one session, plus a 3x level shift between two identical sessions, is external host load, not a plan shape — a q1/q3/q5 regression cannot elevate q9/q10. Verdict: the r13 readings (including the raised min) were the same contention sampled at closing time; plans unchanged (git-verified r12->r14). Standing rule: adjudicate future movers against the in-session CONTROLS first; a >1.25x median trigger only stands if controls hold their level in the same session.",
    "r13/closing-ledger: final tree, 214 queries/214 oracles (+5 this round: docs_prefix_entity_resolution — the ER family's first value-verified-at-sf0.1 row, per-cluster census; parts_coorder_link_prediction — capped common-neighbor candidate expansion; events_concurrent_sessions + events_session_overlap_pairs — sweep-line peak concurrency and the overlap-join census proved against a brute-force-join oracle; events_daily_count_ewma — recursive per-series state via a dyadic-exact array fold). Final-tree evidence: pytest 476/476; full plain sweeps green on THREE corpora at the final registry (driver sf0.01 214/214 plain-session, fresh seeds 1207 + 4242 214/214 each); driver-order 50-window walk 50/50 plain (three times this round as the window grew); MAGNITUDE_r13.json — all 214 queries run at sf0.1, 0 errors; ORACLE_SF01_r13.json — 212/212 value-verified at sf0.1, 0 failures/timeouts, 2 documented quadratic-oracle skips. Perf work all measured cold A/B at sf0.1: exchange-free loop rounds (persist-partitioned stable relation + broadcast node-grain side, shuffle fallback above 2M) landed on core_numbers 76.4->41.2 s cold / 61.3->18.1 s warm-sweep, ppr 29.7->17.4, pagerank 27.1->24.2, components (ER 22.7->19.0, dup_components 8.5->7.2); the delta/worklist alternative measured and rejected with receipts. All five r12 ADVICE items and all r12 verdict orders closed.",
    "r13/minhash-adjudication: the r12 verdict's order 2 (minhash_lsh_near_dups 1.607 -> 2.282 s on untouched code, the only out-of-band mover) closed as a LEVEL-BAND verdict, not a regression: the r13 trigger fired (bench median 2.044 > 1.25x of r11's 1.607), so the interleaved protocol ran — 7 alternating reps against the stable docs_ngram_jaccard_pairs control in one warmed sf0.1 session: suspect median 2.099 (min 1.667, max 2.374), control median 1.191 (its long-standing level). Four independent sessions now agree on a ~2.0-2.1 s median (r12 1-GiB closing bench 2.282, r12 8-GiB heap A/B 2.096 min, r13 full bench 2.044, interleaved 2.099) while the interleaved MIN still reaches the r11 level — a plan regression cannot produce that floor, and the code is unchanged since r11 (git-verified). Verdict: r11's 1.607 was the low edge of the documented +/-20-30% single-query band and the sustained level is ~2.05 s; watch closes unless a future round moves the MEDIAN above ~2.6 s (1.25x of the adjudicated level).",
    "r13/pagerank-exchange-free: the core-numbers recipe generalized to the other fixpoint loops — pagerank/personalized_pagerank now persist the edge relation hash-partitioned by dst and broadcast the node-grain share relation per round (cap |V| <= 2M, plain shuffle join beyond), so the contribution join never exchanges |E| rows and the dst aggregate reuses the cached partitioning. Cold sf0.1 A/B on this tree: parts_coorder_ppr 29.65 -> 17.36 s (1.7x), parts_coorder_pagerank 27.09 -> 24.20 s (1.12x — that query's wall is dominated by its QA/invariant surface, not the loop).",
    "r13/core-numbers-sweep-cost: the r12 verdict's delta-iteration order closed by MEASUREMENT, with the hypothesis refuted and a bigger lever found. Decomposition at the sf0.1 co-order graph (2.39M adjacency rows, 20k nodes, depth 38, cold get_spark harness): per-round fixed cost (loop_round materialization + changed count) ~0.2 s, full h-index sweep ~1.45 s — so edge volume is the round cost, but the late 'near-converged' rounds are only near-converged in NODE count: the changed-set trace (19551...80, 55, 42...re-expanding to 7441 before round-38 convergence) shows correction waves living in the dense core, where a few thousand changed nodes touch a large share of all edges. A semi-join worklist re-shuffles the adjacency twice per round (measured 118 s vs 76 s baseline, 1.5x WORSE); a broadcast-frontier hybrid broke even (103 s). SHIPPED instead: adjacency node-partitioned + persisted (partitioning preserved; a localCheckpoint reports unknown partitioning and re-exchanges 2|E| rows at the window — observed in the executed plan) + per-sweep F.broadcast of the node-values relation capped at |V|<=2M with the pinned shuffle_hash as the at-scale fallback: sweep 1.45 -> 0.8 s, query wall 76.4 -> 41.2 s cold (1.85x). A count-based H-index (groupBy (node,value) + cumulative sum) was also tried and rejected: 1.3 s/sweep, the partial aggregate adds its own exchange. Plan shape pinned by tests/test_plans.py::test_hindex_round_pins_shuffle_hash_no_broadcast_of_adj.",
    'r12/sf01-oracle-sweep: FIRST full-registry oracle sweep at sf0.1 — every non-quadratic-oracle query VALUE-VERIFIED against DuckDB at 10x the gate scale (ORACLE_SF01_r12.json: per-query status + spark/duck walls; 8g session, 300 s per-oracle interrupt watchdog, 0 failures, 0 timeouts; regenerated at the final 209-query registry by tools/oracle_sf_sweep.py — 207/207). The only 2 skips are the documented quadratic-oracle rows (customers_fuzzy_pairs_d2: 112M-levenshtein brute force; customers_entity_resolution: recursive transitive closure over the zero-dense d1 graph, measured >60 s and unbounded — its sf0.01 row stays the correctness evidence) — both Spark sides run green in MAGNITUDE_r12.json. Upgrade over the magnitude sweep: executes-at-scale -> CORRECT-at-scale for the whole board.',
    'r12/heap-ab: same-session A/B of the 8 GiB heap against the 1 GiB closing bench — headline 16.825 -> 17.670 s (+5%), pipeline 9.276 -> 9.602 s, extras 72.8 -> 73.0 s, median per-query ratio 1.14 with movers in BOTH directions (0.74x-1.44x): the heap change is inside the documented session-noise band with no systematic effect at bench SF (it exists to stop task-level OOMs on wide SMJ tasks, not to speed anything). BENCH_DETAIL now carries the 8g numbers; compare r13 against these.',
    "r12/magnitude-sweep: FIRST full-registry sf0.1 run — all 208 queries executed at 10x gate scale in one session (MAGNITUDE_r12.json: per-query wall + row counts; 464 s total, 0 errors). The sweep is what caught the core-numbers AQE-broadcast OOM and depth shortfall, and the 1 GiB local-heap default (uncapped fuzzy-d2's SMJ task OOMed the JVM; fixed by spark.driver.memory=8g in DEFAULT_CONF). Post-fix heavy tail is all documented shapes: iterative loops (core_numbers 57.9 s/38 rounds, pagerank 14.2, kcore 8.7, BPE encode 16.9, power-iteration 10.3), the exact-anchor QA queries (approx_distinct_and_quantile 27.3 s — exact percentile + countDistinct expand on 3 groups IS the documented anchor cost), and recursive-CTE calendar 14.7 s.",
    'r12/local-heap: DEFAULT_CONF now sets spark.driver.memory=8g — local[N] hosts all N executor threads in the one driver JVM, and the 1 GiB JVM default left ~30 MB per task slot at local[32]; a single wide SMJ task (uncapped fuzzy-d2 at sf0.1) OOMed the whole JVM in the r12 magnitude sweep. Ignored on a real cluster and by already-running JVMs. BENCH ENVIRONMENT CHANGE: r13+ bench sessions run with the 8 GiB heap, so cross-round timing comparisons against r12 and earlier carry this delta (expect lower GC pressure, not plan changes; the r12 closing bench itself ran on the old 1 GiB heap).',
    "r12/closing-ledger: final tree, 209 queries/209 oracles (+6 this round: core-number degeneracy decomposition, personalized PageRank, per-type histogram-quantile rollup, the two fuzzy-d2 regime rows, bigram cross-entropy). Final-tree evidence: pytest 470/470; full plain sf0.01 sweeps green on THREE corpora (driver data, fresh seeds 1207 + 4242, 208/208 each at the pre-PPR registry; seed 1207 caught the levenshtein byte-vs-char divergence before any driver row could); PPR itself gated on all three corpora; driver-order 50-query window walk 50/50 four times, last on the final tree with PPR in the window; MAGNITUDE_r12.json (ALL 209 queries run at sf0.1, 0 errors — regenerated by tools/magnitude_sweep.py on the final tree) + ORACLE_SF01_r12.json (207/207 value-verified at sf0.1, 0 failures/timeouts, regenerated by tools/oracle_sf_sweep.py on the final tree — PPR's 20k node scores among them). Closing bench (1 GiB heap): headline 16.825 s, pipeline e2e 9.276 s (watch closed as noise), extras 72.8 s; 8 GiB heap A/B inside the noise band. All four r11 ADVICE items and all eight r11 verdict orders closed.",
    'r12/core-numbers-probe: the sf0.1 magnitude probe caught two real scale defects in the new h-index loop before they shipped — (1) AQE broadcast the 2|E|-row ADJACENCY side of the per-round join (lineage-truncated LogicalRDDs have no compile-time stats, and the compressed shuffle bytes squeezed under the threshold), OOMing a plain 1g driver; pinned shuffle_hash with the node-values side as build, the shape that holds at 100 TB. (2) the 26-round budget sized on sf0.01 (depth 19) was too shallow for sf0.1 (depth 38, measured cross-engine); the loop and oracle now run a 48-sweep budget. Post-fix: sf0.1 converges in 80.5 s / 38 rounds, kmax 84, 0 errors; sf0.01 gate and fresh-seed gate both green.',
    "r12/pipeline-e2e-watch: the r11 verdict's order 7 (pipeline e2e rose two rounds running 9.045 -> 9.375 -> 10.742 s; A/B ordered if r12 read >12 s): resolved as session noise without the trigger firing — the r12 full bench reads pipeline e2e 9.276 s on untouched pipeline code, back at the r9/r10 level, while the headline also moved down (19.196 -> 16.825 s, median per-query ratio 0.79, max mover q1 at 1.10x) — uniform session drift, nothing code-driven. New benched rows this round: docs_prefix_fuzzy_pairs_d2 2.63 s, customers_fuzzy_pairs_d2_capped 5.60 s, events_value_quantile_rollup_by_type 3.35 s, docs_bigram_cross_entropy 1.24 s.",
    "r12/lev-byte-vs-char: fresh-seed gate catch — Spark levenshtein "
    "counts CHARACTERS, DuckDB's counts BYTES, so multibyte text in a "
    "compared string diverges cross-engine (seed-1207 corpus: a CJK "
    "prefix pair at char-distance 2 / byte-distance 4+ made the Spark "
    "side report one more d2 pair than the brute-force oracle). Fix: "
    "docs_prefix_fuzzy_pairs_d2 defines its linkage key over the "
    "normalized-ASCII form (operators/dedup.normalize_text), where "
    "the definitions coincide; customer-name fuzzy rows were never "
    "exposed (ASCII by construction). Doctrine: any cross-engine "
    "levenshtein surface must compare single-byte-only strings.",
    "r12/fuzzy-d2-timed: the r11 verdict's order 3 closed by "
    "measurement — docs_prefix_fuzzy_pairs_d2 times the UNCAPPED d2 "
    "plan on a natural corpus (doc-text 25-char prefixes: max bucket "
    "4, sum|bucket|^2 = 1.1x|variants| at sf0.1; ~3.0 s warm) and "
    "customers_fuzzy_pairs_d2_capped times the max_bucket=16 regime "
    "on the adversarial corpus (sum|bucket|^2 65M -> 1.13M, 57x; "
    "~5.3 s warm). The capped row's recall is oracle-measured and "
    "brutal on purpose (4.4% d1 / 0.11% d2 at sf0.01): on zero-dense "
    "names the true-match buckets ARE the big buckets, so max_bucket "
    "is a boilerplate filter for sparse-match corpora, not a fix for "
    "pathological near-dup density — the natural-corpus row keeps "
    "100% recall by construction (its buckets never exceed 4).",
    "r11 closing ledger -- final tree, 203 queries/203 oracles: "
    "pytest 456/456; full plain sf0.01 sweeps green at every registry "
    "size this round (200, 201, 202, 203/203); fresh-seed full sweeps "
    "green on seeds 811 + 929 + 1111, including FINAL-TREE full "
    "sweeps on 811 (202/202) and 929 (203/203), with each late "
    "addition also gated individually on all three seeds; "
    "driver-order 50-query window 50/50 five times (last including "
    "all five new/changed rows); sf0.1 magnitude probe of the "
    "non-excluded changed surfaces green (exclusions and why: "
    "customers_fuzzy_pairs_d2's deliberate O(n^2) brute-force oracle; "
    "parts_coorder_kcore's driver-bounded loop is unbenched by the "
    "BPE doctrine but its Spark side runs 22 s/6 rounds at sf0.1); "
    "closing bench headline 15.6 s / pipeline 8.7 s / extras 58.1 s "
    "over 62 extras, 0 errors.",
    "r11 q5 watch verdict (the r10 item: q5_local_supplier_volume "
    "read 1.41x its r9 level, at the edge of the noise band, with an "
    "A/B ordered if it read >1.25x again): resolved as session noise "
    "without the A/B trigger firing — the r11 closing bench reads q5 "
    "at 0.891 s vs r9's 0.804 (1.11x), with the entire headline "
    "moving DOWN uniformly in the same session (15.7 s vs r10's 19.9 "
    "and r9's 17.0) on majority-untouched code; q5's plan (broadcast "
    "dims, single fact scan) is byte-unchanged since r6. Correction "
    "to the r10 record while closing it: recomputing BENCH_r10/r09 "
    "ratios, the full >1.25x mover set was EIGHT queries, not five — "
    "q6_forecast_revenue 1.43x (the actual largest, omitted from the "
    "r10 list), q5 1.41x, docs_ngram_jaccard_pairs 1.34x, "
    "docs_token_stats 1.33x, events_funnel 1.32x, q3 1.29x, "
    "docs_exact_dup_groups 1.27x, minhash_lsh_near_dups 1.25x; "
    "emb_near_dup_pairs (1.19x) was listed but sub-threshold. The "
    "same conclusion covers all eight: every one returned to (or "
    "below) its r9 level in the r11 closing session (q6 0.254 vs r9 "
    "0.256, q3 0.744 vs 0.711, docs_token_stats 0.234 vs 0.243, "
    "events_funnel 0.257 vs 0.299) on untouched plans — uniform "
    "session drift, not per-query regressions. Standing doctrine "
    "holds: compare driver-recorded rounds only.",
    "r11 PQ codegen-size adjudication (the r10 closing-ledger watch "
    "item: emb_pq_quantization_qa's literal-codebook projection falls "
    "back to interpreted mode): measured, real, and fixed — the fully "
    "unrolled 8x16x8 distance expression exceeds janino's method-size "
    "limit (compile ERROR each run), leaving a ~3000-node tree "
    "evaluated interpreted. Restructured to a literal "
    "array<array<double>> codebook + transform/zip_with/aggregate "
    "fold: interleaved A/B at sf0.1, 5 alternating reps one session, "
    "bit-identical results — unrolled 8.34 s vs HOF 1.36 s medians "
    "per encode+aggregate pass, spreads 1.23 vs 0.14. The "
    "dot_fixed-vs-zip_with lesson generalizes: past the codegen "
    "method-size limit, compact HOF trees beat unrolled scalar ones. "
    "Also r11: the extras list gains events_kmv_new_vs_returning "
    "(~1.2 s warm at sf0.1), so the extras total is expected ~1-2 s "
    "above the r10 standing 63.5 s on membership alone; the retired "
    "emb_near_dup_lsh was never benched, so its removal changes "
    "nothing in the totals.",
    "r10 triangles drift adjudication (the r9 watch item: "
    "parts_coorder_triangles 4.55 -> 6.88 s on untouched code, +51%, "
    "outside the noise band while TPC-H improved in the same session). "
    "Interleaved COLD A/B — 7 alternating reps, r8-tree function vs "
    "r10-tree function in ONE session, catalog cache + one-slot "
    "registry cleared before every rep, byte-identical rows asserted: "
    "r8 median 8.23 s (spread 1.61), r10 median 9.41 s (spread 3.18) "
    "at sf0.1. Verdict: NO plan regression — the deltas sit inside "
    "the spreads, and both trees read far above either round's bench "
    "number when forced cold, which exposes the real mechanism: the "
    "bench's warmup rep leaves the triangle intermediates cached, so "
    "its timed reps are WARM, and the r9 elevation tracks cache-state "
    "(the session's accumulated unreleased persists pressuring "
    "eviction), not the wedge join. Consistent with that, the r10 "
    "bench (bounded slots, no accumulation) reads triangles 5.40 s — "
    "below r9 — with the span family back at r8 warmth "
    "(docs_shared_span_pairs 2.49 -> 0.73 s, docs_copied_span_profile "
    "2.38 -> 0.59 s via the identity-keyed slots). FOLLOW-UP: after "
    "the adjudication, the closing step was rewritten edge-iterator "
    "(adjacency-array intersection, no 41M-row wedge relation) and "
    "the edge build single-scan (per-order sorted part sets, pairs "
    "array-side) — interleaved cold A/B vs the r8 function in one "
    "session: 10.71 vs 6.06 s medians (1.77x), spreads 3.47 vs 0.82 "
    "(the noisy wedge shuffle WAS the drift source), byte-identical "
    "rows.",
    "r10 (cache-bounding round): every remaining plain .cache() in "
    "lazy query functions (~20 sites: relational triangles/bloom/skew, "
    "dedup_sim grams/fuzzy/ER, events chi2/stickiness, embeddings "
    "semantic-dedup assignment, minhash/simhash operator internals, "
    "readers corrupt-split, pipeline curated references) now routes "
    "through operators/caching.one_slot_persist — bounded to one "
    "relation per static call site, each persist releasing its "
    "predecessor. The slots are identity-keyed where the input is "
    "nameable ((sf_dir, params)): consecutive same-input queries reuse "
    "the WARM slot instead of unpersist+rebuild, recovering the span "
    "family's r9 cold-rebuild cost (docs_shared_span_pairs / "
    "docs_copied_span_profile paid ~+1.8 s each at sf0.1 in r9) while "
    "staying bounded. Likely also closes the 198-query plain-sweep "
    "OOM flake documented in tools/check_oracle.py (GCLocker "
    "starvation under ~190 queries of accumulated session cache).",
    "r9 span-family bench delta (recorded late — the r9 verdict asked "
    "for this note): docs_copied_span_profile 0.58 -> 2.38 s and "
    "docs_shared_span_pairs 0.68 -> 2.49 s in BENCH_r09 vs r08 because "
    "the r9 one-slot conversion made each span query release its "
    "predecessor's posting relation — the r8 warmth WAS the leak. "
    "Deliberate bounded-beats-warm trade; the r10 identity-keyed slot "
    "restores warmth for same-(sf_dir,k) consecutive runs without "
    "unbounding the cache.",
    "r9 drift adjudication (the r8 watch item: two consecutive driver "
    "benches drifted up; 'if the r9 headline stays >=18 s on an "
    "untouched-plan round, bisect'). Data gathered that session: (1) "
    "code bisect — git diff r6..r9 on every hot path (tpch.py, "
    "sources/, session.py, functions/) is EMPTY except the r7 q2 "
    "semi-join optimization and bench.py's extras list; q1/q21/q9 are "
    "byte-identical to the r6 tree. (2) plan bisect — EXPLAIN.md "
    "regenerated that session is byte-identical (zero plan-shape "
    "changes, q21 included). (3) interleaved ab_check on q1/q21/q9 at "
    "sf0.1, 7 reps one session: medians 1.09/1.42/1.05 s; a fresh "
    "bench session 30 min later on the same machine read "
    "1.36/1.33/1.12 for the same three — a 25% q1 swing between "
    "back-to-back same-code sessions, which brackets the r6/r7-era "
    "driver readings (0.94-1.03) and the r8/r9-era ones (1.33-1.42). "
    "Conclusion: the elevation is HOST-ERA environment, not a repo "
    "regression — no repo change to bisect to, no single query moved "
    "relative to its peers. Standing doctrine: compare driver-recorded "
    "rounds only.",
    "r8 (precision round, no plan regressions intended): the only "
    "plan-shape changes are emb_int8_quantization's error fold going "
    "decimal -> pure-double (strictly cheaper: no BigDecimal in the "
    "per-element path; 0.28 s at sf0.1) and "
    "emb_kmeans_clusters/emb_centroid_norm_by_label gaining a "
    "k*dim-row collect_list+array_sort for the order-pinned norm fold "
    "(bounded by clusters x dimensions — 512 structs at k=8, dim=64 — "
    "never data-proportional; kmeans 1.77 s at sf0.1, unchanged from "
    "r7). Headline wall this session read ~11% above r7 UNIFORMLY "
    "(untouched TPC-H rows drifted the same ~10-20%) — the documented "
    "cross-session noise band; per doctrine only the driver-recorded "
    "rounds are compared, and no single query moved outside its "
    "interleaved spread.",
    "r6: interleaved A/B of the three r5 nominal regressions "
    "(agg_stats_by_status, validate_lineitem_fk_invalid, "
    "emb_near_dup_pairs): 7 alternating reps in one session gave "
    "within-session spreads of 0.45/0.62/0.89 s — each LARGER than "
    "the r4->r5 delta it was meant to explain (0.14/0.13/0.23 s per "
    "VERDICT r5's table; BENCH_r04.json itself parsed null, so "
    "ab_check's r04_median fields are null by construction). Plans "
    "unchanged (EXPLAIN.md). Verdict: measurement noise, no action. "
    "Raw interleaved medians in 'ab_check', stamped with the file "
    "mtime of the run that produced them.",
    "r7: q2_min_cost_supplier part-filter pushdown through the "
    "aggregates (broadcast semi-join on the fact scan): interleaved "
    "A/B 7 reps one session, median 1.499 -> 0.874 s, byte-identical "
    "rows. docs_source_shingle_overlap's first bench read 64 s: "
    "InferFiltersFromGenerate had pushed the inferred size/isnotnull "
    "filter (inlining the whole gram expression) below the "
    "spread_scan repartition, single-tasking the shingle work; "
    "explode_outer + post-explode null filter (explode_grams) fixed "
    "it to 1.1-1.9 s and cut shingles().count() 31.9 -> 4.7 s. The "
    "r7 bench's docs_ngram_jaccard_pairs 1.30 s reading re-measured "
    "at median 1.11 s over 7 reps in one session — noise, no action.",
    "r7: the bucketed grouped-percentile rewrite costs ~0.5-0.9 s "
    "more than the distinct-value-window version at sf0.1 "
    "(lineitem_price_percentiles_by_flag 1.44 -> ~2.3 s, p95 0.38 -> "
    "~0.87 s): one extra (group, bucket) join + window. Deliberate "
    "trade — the old plan's partitions were bounded by distinct "
    "values per group, which for near-unique columns (prices) meant "
    "~200k rows in ONE task and would not survive 100x; the overhead "
    "is a constant plan cost, not data-proportional.",
    "r7c: lineitem_ols_price_on_qty reads ~2.0 s at sf0.1 for a "
    "single aggregate — the wall is the six decimal(30,18) moment "
    "sums (BigDecimal accumulation outside codegen's primitive fast "
    "path), the deliberate price of bit-reproducible cross-engine "
    "moments; the plan is one scan + one 1-row combine, linear and "
    "map-side at any scale. A production fit that tolerates "
    "float-order variance can swap the casts for plain double sums. "
    "Also r7c: lineitem_salted_agg_by_flag's first plan hashed the "
    "whole row for the salt and read 11 columns for a 2-column "
    "aggregate; salts now hash explicit salt_cols (line identity) — "
    "cols read 11 -> 4, and NEVER (key, value) alone, which would "
    "collapse to one salt on a constant-measure hot key.",
    "r6: docs_curation_funnel keeps exact n-gram Jaccard for stage 5 "
    "instead of reusing the MinHash corpus index: banded LSH candidates "
    "are ~95% recall at J=0.3 (1-(1-J^2)^32 band math), which would "
    "break the funnel's exact cross-engine oracle; the warm wall is "
    "sequential stage latency at bench SF, not data volume.",
]

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q9_product_profit",
    "q13_customer_order_distribution",
    "q18_large_volume_customers",
    "q21_sole_late_supplier",
    "join_left_outer_order_counts",
    "agg_stats_by_status",
    "window_rank_orders",
    "dedup_latest_order_per_customer",
    "validate_lineitem_fk_invalid",
    "events_sessionization",
    "events_hourly_by_type",
    "docs_exact_dup_groups",
    "docs_token_stats",
    "minhash_lsh_near_dups",
    "docs_ngram_jaccard_pairs",
    "docs_hash_split_counts",
    "events_funnel",
    "emb_near_dup_pairs",
    "emb_knn_bruteforce",
    # r16: the ranking family enters the headline — the r15 verdict
    # ordered round-over-round regression coverage at driver grain for
    # the global_row_number two-phase rebuild, and the near-unique-key
    # consumer is its witness. Headline totals before/after r16 differ
    # structurally by this row's ~2-3 s; compare per-query medians.
    "lineitem_price_equidepth_bands",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


TIMED_RUNS = 3


def time_query(fn, spark, sf_dir: str) -> tuple[float, float, list[float]]:
    """(median, min, raw times) seconds over TIMED_RUNS
    materializations, after one untimed warmup run. The query DataFrame
    is rebuilt per run so each timing includes analysis/optimization
    like a real submission (only JVM JIT, codegen and FS-listing caches
    stay warm — which is exactly the steady state a long-lived cluster
    session runs in)."""
    materialize(fn(spark, sf_dir))  # warmup
    times = []
    for _ in range(TIMED_RUNS):
        start = time.perf_counter()
        materialize(fn(spark, sf_dir))
        times.append(time.perf_counter() - start)
    return (
        round(statistics.median(times), 3),
        round(min(times), 3),
        times,
    )


# CSV mapping of the TPC-H-ish testdata onto the reference's raw-zone
# shapes (products/orders/order_items), generated ONCE per scale factor
# outside the timed window. int32 ids cap this mapping at ~sf10 — fine
# for a bench fixture. Dates coarsen to month so the partitioned curated
# zone has tens of partitions, like the reference's daily layout.
_E2E_TABLES = ("products", "orders", "order_items")


def _ensure_pipeline_csvs(sf_dir: str) -> dict[str, str]:
    import pathlib

    import duckdb

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    base = pathlib.Path(f"/tmp/lakehouse_bench_csv/{tag}")
    marker = base / "_DONE"
    sql = {
        "products": f"""
            SELECT p_partkey AS product_id, p_size % 20 AS department_id,
                   p_brand AS department, p_name AS product_name
            FROM '{sf_dir}/part.parquet'""",
        "orders": f"""
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) AS INT) AS order_num,
                   CAST(o_orderkey AS INT) AS order_id,
                   CAST(o_custkey AS INT) AS user_id,
                   CAST(o_orderdate AS TIMESTAMP) AS order_timestamp,
                   o_totalprice AS total_amount,
                   CAST(date_trunc('month', o_orderdate) AS DATE) AS date
            FROM '{sf_dir}/orders.parquet'""",
        "order_items": f"""
            SELECT CAST(l.l_orderkey * 8 + l.l_linenumber AS INT) AS id,
                   CAST(l.l_orderkey AS INT) AS order_id,
                   CAST(o.o_custkey AS INT) AS user_id,
                   CAST(l.l_suppkey % 30 AS INT) AS days_since_prior_order,
                   CAST(l.l_partkey AS INT) AS product_id,
                   CAST(l.l_linenumber AS INT) AS add_to_cart_order,
                   CAST(l.l_linenumber % 2 AS INT) AS reordered,
                   CAST(o.o_orderdate AS TIMESTAMP) AS order_timestamp,
                   CAST(date_trunc('month', o.o_orderdate) AS DATE) AS date
            FROM '{sf_dir}/lineitem.parquet' l
            JOIN '{sf_dir}/orders.parquet' o ON l.l_orderkey = o.o_orderkey""",
    }
    if not marker.exists():
        con = duckdb.connect()
        for name in _E2E_TABLES:
            (base / name).mkdir(parents=True, exist_ok=True)
            con.sql(
                f"COPY ({sql[name]}) TO '{base / name / 'part.csv'}'"
                " (FORMAT CSV, HEADER)"
            )
        marker.touch()
    return {n: str(base / n / "*.csv") for n in _E2E_TABLES}


def run_pipeline_e2e(spark, sf_dir: str) -> dict:
    """Timed read->cast->validate->dedup->MERGE run over the raw CSVs —
    the direct analog of the reference's 180 s Glue ETL wall
    (BASELINE.md); CSV generation and target cleanup stay untimed."""
    import shutil
    import tempfile

    from lakehouse_architecture_spark.plans.pipeline import run_pipeline

    raw = _ensure_pipeline_csvs(sf_dir)
    work = tempfile.mkdtemp(prefix="lakehouse_bench_e2e_")
    try:
        start = time.perf_counter()
        results = run_pipeline(spark, raw, f"{work}/curated", f"{work}/rejected")
        wall = round(time.perf_counter() - start, 3)
        return {
            "value": wall,
            "unit": "sec",
            "rows": {
                n: {
                    "valid": r.stats.get("clean_rows"),
                    "rejected": r.stats.get("rejected_rows"),
                }
                for n, r in results.items()
            },
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _note_id(note: str) -> str:
    """Stable identity for a round conclusion. Preferred form (r12+):
    an explicit ``rN/slug:`` tag leading the note — the tag IS the
    identity, so rewording the headline after it replaces the note on
    merge instead of accumulating a duplicate, and two short notes can
    never collide. Legacy notes fall back to the old rule (headline
    before the first colon, else first 60 chars), kept so existing
    BENCH_DETAIL notes keep their identities across the transition."""
    m = re.match(r"(r\d+[a-z0-9_-]*/[a-z0-9_-]+):", note)
    if m:
        return m.group(1)
    prefix = note.split(":", 1)[0]
    return prefix[:80] if len(prefix) >= 20 else note[:60]


def _load_ab_check() -> dict | None:
    """Pick up the interleaved A/B re-measurement (tools/ab_check.py
    writes /tmp/ab_check.json) if one was run; the payload is stamped
    with the file's mtime so a stale prior-round measurement is
    self-describing rather than silently passing as current. The bench
    must not fail when no A/B was run."""
    try:
        with open("/tmp/ab_check.json") as fh:
            payload = json.load(fh)
        payload["measured_at_unix"] = int(os.path.getmtime("/tmp/ab_check.json"))
        return payload
    except Exception:
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from lakehouse_architecture_spark.queries import QUERIES

    # No console progress bars: they interleave with the one JSON line
    # the driver parses from the stdout/stderr tail.
    spark = get_spark(
        "lakehouse-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + file listing so per-query numbers measure the queries
    try:
        materialize(QUERIES["q6_forecast_revenue"](spark, sf_dir))
    except Exception as exc:  # warm-up failure must not kill the bench
        print(f"warmup failed: {exc}", file=sys.stderr)

    # Per-query error isolation: one broken query must never erase the
    # other N-1 timings — failures are recorded in "errors" and the JSON
    # line is always emitted.
    #
    # MULTI-PASS DOCTRINE (r15, from the r14 closing ledger): single
    # bench reads on byte-identical code spread 16.6-23.8 s headline on
    # this host, so one read per round kept generating phantom watch
    # items. The headline section now runs TWO full passes separated by
    # the extras section (minutes apart, so host weather differs
    # between them); each query's reported figure is the median of its
    # 6 timed runs, and the per-pass totals + spread land in the
    # payload so the round-over-round comparison can see contention
    # directly instead of inferring it.
    raw_times: dict[str, list[float]] = {}
    pass_totals: list[float] = []
    pass_run_counts: list[dict[str, int]] = []
    errors: dict[str, str] = {}

    def _headline_pass() -> None:
        total = 0.0
        counts: dict[str, int] = {}
        for name in HEADLINE:
            try:
                med, _mn, times = time_query(QUERIES[name], spark, sf_dir)
                raw_times.setdefault(name, []).extend(times)
                counts[name] = len(times)
                total += med
            except Exception as exc:
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                print(f"bench query {name} failed: {exc}", file=sys.stderr)
        pass_totals.append(round(total, 3))
        pass_run_counts.append(counts)

    _headline_pass()

    extra: dict[str, float] = {}
    extra_min: dict[str, float] = {}
    extras_subset = extras_window()
    for name in extras_subset:
        if name not in QUERIES:
            continue
        try:
            extra[name], extra_min[name], _ = time_query(
                QUERIES[name], spark, sf_dir
            )
        except Exception as exc:
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"bench extra query {name} failed: {exc}", file=sys.stderr)

    _headline_pass()

    timings = {
        n: round(statistics.median(ts), 3) for n, ts in raw_times.items()
    }
    minima = {n: round(min(ts), 3) for n, ts in raw_times.items()}
    # a query that failed in one pass but succeeded in the other has a
    # median of fewer runs than timing.stat claims, and makes the two
    # pass totals non-comparable — flag it explicitly (r15 ADVICE)
    full_runs = TIMED_RUNS * 2
    partial = sorted(
        n for n, ts in raw_times.items() if len(ts) < full_runs
    )

    # pipeline e2e: 3 passes, median reported (the r14 watch item was
    # a single 13.9 s read at the top of a 9.6-13.7 s same-day spread)
    e2e_runs: list[dict] = []
    for _ in range(3):
        try:
            e2e_runs.append(run_pipeline_e2e(spark, sf_dir))
        except Exception as exc:
            e2e_runs.append({"err": f"{type(exc).__name__}: {exc}"[:500]})
            print(f"pipeline_e2e failed: {exc}", file=sys.stderr)
    e2e_vals = [r["value"] for r in e2e_runs if "value" in r]
    if e2e_vals:
        # base the merged dict on the first SUCCESSFUL run: when run 0
        # errored but later passes succeeded, dict(e2e_runs[0]) carried
        # a stale 'err' alongside the median and lost the per-stage
        # fields (r15 ADVICE)
        e2e = dict(next(r for r in e2e_runs if "value" in r))
        e2e["value"] = round(statistics.median(e2e_vals), 3)
        e2e["runs"] = e2e_vals
        e2e["spread"] = round(max(e2e_vals) - min(e2e_vals), 3)
        if len(e2e_vals) < len(e2e_runs):
            e2e["failed_runs"] = len(e2e_runs) - len(e2e_vals)
    else:
        e2e = e2e_runs[0]

    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None
    # Compact driver-contract line: the driver keeps only a bounded tail
    # of stdout, so the ONE stdout JSON line carries the contract fields
    # and scalar summaries only (~1 KB). Full detail goes to a file.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    # Merge-preserve round conclusions: a bench refresh (e.g. the
    # driver's post-commit run) must never DROP a note or a committed
    # ab_check — regenerate numbers, carry interpretation forward.
    # Notes merge BY ID (the text before the first colon), not by exact
    # string: a reworded note REPLACES its old version instead of both
    # accumulating forever (r10 ADVICE — the exact-match merge made the
    # notes array grow monotonically).
    prev_notes: list[str] = []
    prev_ab = None
    try:
        with open(detail_path) as fh:
            prev = json.load(fh)
        prev_notes = [n for n in prev.get("notes", []) if isinstance(n, str)]
        prev_ab = prev.get("ab_check")
    except Exception:
        pass
    current_ids = {_note_id(n) for n in NOTES}
    ab = _load_ab_check()
    if isinstance(ab, dict) and ab.get("drop"):
        # explicit sentinel ({"drop": true} in /tmp/ab_check.json):
        # clear a superseded prior-round ab_check instead of carrying
        # it forward forever (previously impossible — r10 ADVICE).
        ab, prev_ab = None, None
    detail = {
        "queries_min": minima,
        "extra_queries": extra,
        "extra_queries_min": extra_min,
        "timing": {
            "warmup_runs": 1,
            "timed_runs": TIMED_RUNS,
            "passes": 2,
            "stat": "median-of-6",
        },
        "headline_pass_totals": pass_totals,
        "headline_pass_run_counts": pass_run_counts,
        "headline_partial_queries": partial,
        "pipeline_e2e": e2e,
        "errors": errors,
        "notes": NOTES
        + [n for n in prev_notes if _note_id(n) not in current_ids],
        "ab_check": ab or prev_ab,
    }
    try:
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
    except OSError as exc:  # a read-only checkout must not kill the bench
        print(f"detail write failed: {exc}", file=sys.stderr)
    payload = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        # Per-query MINIMA over the same 6 runs (additions-only, r16
        # verdict order #7): the low-noise floor PERF can adjudicate a
        # nominal regression against — a mover whose min matches the
        # prior round's level is host weather, not a plan change.
        "queries_min": minima,
        "sf": sf,
        "extra_queries_total": round(sum(extra.values()), 3),
        "extras_policy": {
            "always": len(EXTRA_ALWAYS),
            "rotate_n": min(
                EXTRA_ROTATE_N, len(EXTRA) - len(EXTRA_ALWAYS)
            ),
            "timed": len(extra),
            "of": len(EXTRA),
        },
        "pipeline_e2e_sec": e2e.get("value"),
        "pipeline_e2e_runs": e2e.get("runs"),
        "headline_pass_totals": pass_totals,
        "headline_pass_spread": (
            round(max(pass_totals) - min(pass_totals), 3)
            if len(pass_totals) >= 2
            else None
        ),
        "headline_partial_queries": partial,
        "n_errors": len(errors),
        "detail": "BENCH_DETAIL.json",
    }
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
