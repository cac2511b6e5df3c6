"""Golden physical-plan signatures for the scale-critical queries.

A plan *signature* is the ordered list of operator names (plus the
partitioning kind for every Exchange) extracted from the executed-plan
tree — expression ids, codegen stage numbers, and plan ids are noise
and are stripped. This pins exactly the properties the ad-hoc plan
tests assert (join strategy, exchange count/kind, scan type, no
surprise cartesians) for a much wider query set, as cheap regression
armor: an optimizer-visible code change that flips a broadcast to a
sort-merge join or adds a shuffle fails here first.

Regenerate after an INTENDED plan change with:

    SPARK_GRAFT_UPDATE_GOLDENS=1 python -m pytest tests/test_plan_goldens.py

and review the golden diff like any code diff.
"""

from __future__ import annotations

import os
import re

import pytest

SF = "/root/testdata/sf0.001"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens", "plans")

# Scale-critical set: every query whose plan shape round 1/2 argued
# about, one per family at minimum.
GOLDEN_QUERIES = [
    "flagship_incremental_load",
    "routing_1500_split",
    "rel_project_filter_predicates",
    "agg_pricing_summary",
    "agg_percentiles",
    "join_broadcast_dim",
    "join_shuffle_fact",
    "join_asof_last_click",
    "win_running_sum",
    "sort_top_k_global",
    "dedup_exact_normalized",
    "dedup_ngram_jaccard",
    "sim_embedding_neardup",
    "sim_quantized_topk",
    "src_rest_paged_scan",
    "src_rest_topn_pushdown",
    "text_tfidf_top_terms",
    "stream_sliding_window",
    # round-2 late additions: two-phase prefix-sum / carry shapes and
    # the CMS broadcast join — pin that no single-task window sneaks in
    "text_token_budget_alloc",
    "ts_resample_ffill",
    "text_cms_heavy_hitters",
    "win_cohort_retention",
    # round-2 wave 2: two-phase packing prefix sum, MERGE join shape,
    # z-order bucket agg, source-reputation window+agg, semantic dedup
    # over the cached IVF index
    "text_sequence_packing",
    "rel_merge_upsert",
    "layout_zorder_stats",
    "text_source_reputation",
    "sim_semantic_dedup",
    # round-3: the rest of the ANN family — pin broadcast centroid
    # routing and the absence of BroadcastNestedLoop so the round-1
    # BNLJ regression can't silently return, and pin the banded-bucket
    # shape of the two LSH variants
    "sim_ivf_topk",
    "sim_brp_lsh_topk",
    "dedup_minhash_lsh",
    # round-6: the shared BLAS shortlist kernel — pin the cogrouped
    # FlatMapCoGroupsInPandas + bounded-window shape for both the
    # brute-force truth baseline and the MMR pool so the retired
    # crossJoin/BNLJ pool can't silently return
    "sim_brute_force_topk",
    "sim_mmr_diversify",
    # round-3 perf fix: single from_json projection (no triplicated parse)
    "fn_json",
    # round-5: the VARIANT shred must stay ONE codegen projection over
    # the scan — no exchange, no sort, no second parse pass
    "fn_variant_shred",
    # round-3 OLAP suite: pin the join strategies the docstrings claim —
    # Q6 pure pushdown scan-agg (no exchange below the 1-row agg), Q5/Q8
    # forced-broadcast dims + single fact shuffle, Q18's aggregate-first
    # HAVING shape, Q21's shared-key semi/anti probe chain
    "olap_q6_forecast_revenue",
    "olap_q5_local_supplier_volume",
    "olap_q8_market_share",
    "olap_q18_large_volume_customers",
    "olap_q21_late_suppliers",
    # round-3 LLM additions: containment reuses the posting-list shape;
    # the daily z-score must stay a join+filter (no window, no sort)
    "dedup_containment",
    "ts_daily_zscore_anomalies",
    # round-3 session 2: DSIR's broadcast log-ratio scoring, the bloom
    # incremental dedup's broadcast-bitmap probe + semi-join, PQ's
    # broadcast LUT/codebook joins (no BNLJ anywhere in the ANN family)
    "text_dsir_importance",
    "dedup_bloom_incremental",
    "sim_pq_topk",
    "emb_dim_stats",
    # round-3 session 2 (later waves): filtered search must stay an
    # equi-join on the label (never a crossJoin + post-filter), the AQP
    # sample predicate must ride the scan, rerank keeps broadcast LUT
    # joins, perplexity tiers broadcast their 1-row cuts, the SQL
    # gateway plans like the DataFrame form, and the decode paths stay
    # single-pass mapInPandas
    "sim_filtered_topk",
    "agg_sample_estimate",
    "sim_rerank_two_stage",
    "text_perplexity_buckets",
    "sql_gateway_topn",
    "mm_ppm_decode_features",
    # round-3 session 3: the suite-completing TPC-H shapes — Q2's
    # decorrelated MIN must keep its partkey-grouped aggregates (no
    # window), Q9's five-way tree keeps three broadcast dims + one fact
    # shuffle, Q13's outer join must not degrade to a cartesian — and
    # BM25's inverted-index path (term filter BEFORE the tf aggregate,
    # broadcast df/stats, no full-corpus tf table)
    "olap_q2_min_cost_supplier",
    "olap_q9_product_profit",
    "olap_q13_customer_distribution",
    "text_bm25_topk",
    # round-3 session 4: equi-depth must stay the two-phase 64-bin
    # prefix-sum (no global-ORDER window / single-task exchange),
    # phrase search keeps the term filter under the explode (posting
    # lists only reach the shuffle), weighted sampling must plan as
    # TakeOrderedAndProject (per-partition heaps, no global sort), and
    # the cross-format federation must not degrade to a cartesian
    "agg_equidepth_histogram",
    "text_phrase_search",
    "text_weighted_sample",
    "src_federated_join",
    # round-3 session 4 (wave 2): PSI must bin with literal arithmetic
    # (no corpus BroadcastNestedLoopJoin against a bounds row), entropy
    # stays two narrow hash aggs off the cached token spine, and the
    # text-log parse is one codegen pass over a line-splittable scan
    # with a single event_type shuffle
    "diag_psi_drift",
    "text_token_entropy",
    "src_textlog_scan",
    # wave 3: the cardinality pre-flight must join COUNT TABLES (two
    # hash aggs feeding the join — never the fact relations), URL
    # canonicalization stays a zero-shuffle map-side projection, and
    # the verbatim GROUPING SETS statement plans as one Expand + a
    # single shuffle for all three levels
    "diag_join_cardinality",
    "text_url_canonicalize",
    "sql_gateway_grouping_sets",
    # wave 4: the transition matrix must do exactly one user-keyed
    # window shuffle, with the (from,to) rollup and its broadcast
    # row-total join downstream of it
    "win_event_transitions",
    # wave 5: both sequential detectors keep ONE corpus-sized shuffle
    # (the user/daily aggregate) with the recurrence downstream — Holt
    # as an in-array fold, CUSUM as pure window algebra
    "ts_holt_linear",
    "ts_cusum_changepoint",
    # generation must plan as a Range leaf (no file scan, no exchange
    # before the aggregate)
    "src_range_generator",
    # wave 6: basket pairs must stay the in-array explode (no basket
    # self-join), the spatial join must equi-join on grid cells (no
    # cartesian / BNLJ), rolling distinct keeps one corpus shuffle
    "join_market_basket",
    "join_geo_gridblock",
    "win_rolling_distinct_users",
    # wave 7: Theil-Sen pairs explode in-array off the daily aggregate
    # (never a daily self-join); chi-square is two aggregates, no join
    "ts_theil_sen",
    "diag_ab_chi_square",
    # session 5: the hashed classifier must stay a ZERO-exchange
    # per-row projection (its whole point); winnowing likewise; novelty
    # keeps 8-byte-key shuffles off the cached shingle spine; Benford
    # is one 9-group rollup + broadcast total; attribution keeps the
    # user-keyed equi-join with the range predicate as residual (never
    # a cartesian); RFM is one rollup + broadcast anchor; link
    # prediction must not plan a BNLJ anywhere
    "text_hashed_linear_classifier",
    "text_winnow_fingerprint",
    "text_ngram_novelty",
    "diag_benford_digit_audit",
    "win_attribution_linear",
    "agg_rfm_segments",
    # graph_jaccard_linkpred is NOT goldened: it shares the cached edge
    # relation with triangle_stats/kcore (Spark's cache manager matches
    # by logical plan), so its printed plan flips between the initial
    # and executed-adaptive form depending on which test materialized
    # the cache first (trap 14). test_plans asserts its no-BNLJ
    # property directly instead.
    "ts_seasonal_decompose",
    "ts_acf_lags",
    "agg_kmv_set_ops",
    # session 5 wave 2: the verbatim window statement keeps BOTH window
    # passes on one event_type shuffle; modularity is counts + broadcast
    # label joins (no BNLJ); RAKE keeps one doc-keyed window pass with
    # the vocabulary join broadcast
    "sql_gateway_window",
    "graph_label_modularity",
    "text_rake_keywords",
    # session 5 wave 3: ABC must keep the two-phase bucketed prefix
    # sum (64-way parallel within-bucket windows — no single-task
    # global cumulative window over the parts relation); MAD is two
    # tiny percentile aggregates + broadcast joins off ONE daily
    # rollup; the corrupt-recovery scan is one cached pass
    "win_pareto_abc",
    "ts_mad_anomalies",
    # Gini reuses the two-phase global-rank machinery — pin it
    "agg_gini_coefficient",
    # round-4 wave: KS rides the two-phase bucketed ECDF (pin: no
    # single-task global window); interval-union runs per-user windows
    # only; winsorized keeps one segment-partitioned rank window + a
    # broadcast cut join; bootstrap's replica ranking is the
    # triangular join, never a partitionless window; local clustering
    # must stay vertex-keyed joins (no BNLJ); trending's lag+rank
    # windows both run over the post-rollup relation
    "diag_ks_drift",
    "ts_interval_union_length",
    "agg_winsorized_stats",
    "agg_bootstrap_ci",
    # graph_local_clustering sits on the shared persisted edge
    # relation — cache-state-dependent golden (trap 14); test_plans
    # asserts its no-BNLJ property directly instead
    "stream_topk_trending",
    # weighted median must keep the two-phase bucketed prefix sum
    # (64-way windows within (flag, bucket), never per-flag global
    # windows); the bucketed interval join must stay a pure equi-join
    # (no non-equi condition may reach the join operator)
    "agg_weighted_median",
    "join_interval_bucketed",
    # round-4 session 2: the rebuilt exact percentiles must keep the
    # bucket-pruned rank window (one Union scan pair, no multiset
    # aggregate); target encoding is two broadcast joins + one rollup
    # (no window); l-diversity and the purged split are pure hash-agg
    # chains; MI keeps margins off the cells (one fact shuffle) with
    # the fxlog2 chain as per-row projection; portable SimHash is one
    # groupBy, zero joins. (pagerank/minhash_estimate/estimator_pr sit
    # on session caches - trap 14 - and are property-asserted in
    # test_plans instead.)
    "agg_target_encoding",
    "diag_l_diversity",
    "diag_mutual_information",
    "ts_purged_walkforward_split",
    "dedup_simhash_portable",
    # portable HLL: one 64-row register agg + 1-row rollup + scalar
    # frontier crossJoin; the fxlog2 chain is per-row projection
    "agg_hll_portable",
]

_EXCHANGE_KIND = re.compile(
    r"(hashpartitioning|rangepartitioning|SinglePartition|RoundRobinPartitioning)"
)

# Runtime artifacts of an *executed* adaptive plan (they appear inside
# InMemoryRelation once a cached relation has been materialized, which
# depends on test order) — signature-noise, not plan shape.
_RUNTIME_WRAPPERS = {
    "ResultQueryStage",
    "ShuffleQueryStage",
    "BroadcastQueryStage",
    "TableCacheQueryStage",
    "AQEShuffleRead",
    "ColumnarToRow",
    "ReusedExchange",
    "InputAdapter",
}


def _signature(plan: str) -> str:
    out = []
    for raw in plan.splitlines():
        # an executed inner AQE plan prints "== Final Plan ==" followed
        # by a duplicate "== Initial Plan ==" section — stop there
        if "== Initial Plan ==" in raw:
            break
        # strip tree decoration and whole-stage-codegen stage markers
        line = re.sub(r"^[\s+:*\-]*", "", raw)
        line = re.sub(r"^\(\d+\)\s*", "", line)
        if not line or line.startswith("=="):
            continue
        op = re.split(r"[ (]", line, 1)[0]
        if not op or not op[0].isupper() or op in _RUNTIME_WRAPPERS:
            continue
        if op == "InMemoryRelation":
            # a cached relation prints its STORED plan here — initial
            # vs executed-adaptive depending on whether some earlier
            # query materialized the cache (test-order dependent). The
            # relation is a leaf as far as plan shape is concerned;
            # everything under it is cache-state noise, and tree
            # decoration is already stripped, so stop the signature.
            out.append(op)
            break
        if op == "Exchange":
            kind = _EXCHANGE_KIND.search(line)
            out.append(f"Exchange {kind.group(1) if kind else '?'}")
        elif op == "FileScan":
            fmt = line.split(" ", 2)[1] if " " in line else "?"
            out.append(f"FileScan {fmt}")
        else:
            out.append(op)
    return "\n".join(out) + "\n"


@pytest.mark.parametrize("name", GOLDEN_QUERIES)
def test_plan_signature_matches_golden(spark, name):
    from seamless_sharepoint_etl_spark import registry

    df = registry.queries()[name](spark, SF)
    sig = _signature(df._jdf.queryExecution().executedPlan().toString())
    path = os.path.join(GOLDEN_DIR, f"{name}.txt")
    if os.environ.get("SPARK_GRAFT_UPDATE_GOLDENS"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as fh:
            fh.write(sig)
        return
    assert os.path.exists(path), (
        f"no golden for {name}; run SPARK_GRAFT_UPDATE_GOLDENS=1 pytest "
        "tests/test_plan_goldens.py"
    )
    with open(path) as fh:
        golden = fh.read()
    assert sig == golden, (
        f"plan signature drift for {name} — if intended, regenerate goldens\n"
        f"--- golden ---\n{golden}\n--- current ---\n{sig}"
    )


def test_refinement_family_goldens_pin_bounded_scan_count():
    """The round-4 percentile-family rebuild replaced the triangular
    self-join (10-16 FileScans re-executing the derived relation) with
    the collected bucket frontier + 256-way rank refinement: the final
    plan reads the fact table at most twice. Pin that invariant
    explicitly so the 16-scan shape (NOTES trap 22b) cannot silently
    return even if the goldens are regenerated."""
    import os

    gdir = os.path.join(os.path.dirname(__file__), "goldens", "plans")
    for name in ("agg_percentiles", "agg_weighted_median", "agg_winsorized_stats"):
        with open(os.path.join(gdir, f"{name}.txt")) as fh:
            n_scans = fh.read().count("FileScan")
        assert n_scans <= 2, f"{name}: {n_scans} FileScans (trap 22b regression)"
