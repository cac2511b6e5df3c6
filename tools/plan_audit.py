"""Registry-wide physical-plan audit: the mechanized version of the
scale review a human does with .explain("formatted").

For EVERY registered query (not just the plan-goldened subset) this
sweeps the executed plan for the three structural scale smells:

  cartesian   — CartesianProduct: both sides large, no key. Never
                acceptable in this repo.
  bnlj        — BroadcastNestedLoopJoin against a NON-scalar build
                side. A BNLJ whose broadcast side is a 1-row aggregate
                (a scalar frontier: bounds, totals, cut points) is the
                documented pattern and is NOT flagged; anything else
                is a join that degraded off its keys.
  global_win  — a Window with no PARTITION BY over unbounded input: a
                single task absorbs the whole relation. Windows over
                pre-aggregated / literal-bounded relations are fine —
                the allowlist names them with the reason.

Usage:  python tools/plan_audit.py [sf_dir]         # report
Exit 1 if any un-allowlisted smell is found. test_plans.py runs the
same sweep as a pytest gate so regressions can't land silently.
"""

from __future__ import annotations

import re
import sys

# (query, smell) -> reason the shape is acceptable. Keep reasons real:
# every entry documents a reviewed decision, not a mute button.
CENTROID = (
    "ANN index probe: crossJoin against the NLIST=16-row cached "
    "centroid/LUT relation (bounded by the index constant, never by data)"
)

ALLOWLIST: dict[tuple[str, str], str] = {
    ("sim_brute_force_topk", "cartesian"): (
        "declared exact-truth baseline: O(Q.N) crossJoin IS the spec; "
        "IVF/PQ/rerank are the serving paths"
    ),
    ("sim_brute_force_topk", "bnlj"): (
        "same declared baseline (Spark plans the crossJoin as BNLJ)"
    ),
    ("join_cross_small", "cartesian"): (
        "the operator under test IS a cross join of two pruned dims"
    ),
    ("join_cross_small", "bnlj"): (
        "the operator under test IS a cross join (planned as BNLJ)"
    ),
    ("sim_embedding_neardup", "cartesian"): (
        "block-pair relation: 16x16 BLOCK ids cross-joined (256 rows), "
        "never row-level; the row join is the blocked equi-join"
    ),
    ("emb_pca_top_component", "cartesian"): (
        "d x d Gram recombination: 64x64 index grid, data-independent"
    ),
    ("sim_ann_recall_curve", "cartesian"): (
        "nprobe-settings grid (4 rows) x per-query minima relation"
    ),
    ("sim_ann_recall_curve", "bnlj"): CENTROID,
    ("sim_ivf_topk", "bnlj"): CENTROID,
    ("sim_quantized_topk", "bnlj"): CENTROID,
    ("sim_semantic_dedup", "bnlj"): CENTROID,
    ("sim_pq_topk", "bnlj"): CENTROID,
    ("sim_rerank_two_stage", "bnlj"): CENTROID,
    ("sim_mmr_diversify", "bnlj"): CENTROID,
    ("emb_label_knn_accuracy", "bnlj"): CENTROID,
    ("emb_centroid_purity", "bnlj"): CENTROID,
    ("emb_silhouette_margin", "bnlj"): CENTROID,
    ("agg_brand_movers", "bnlj"): (
        "triangular league-table rank joins over the <=|brands|-row "
        "period rollups (bounded by brand cardinality)"
    ),
    ("diag_ks_drift", "bnlj"): (
        "triangular strictly-before offsets over the 64-row bucket "
        "relation (bounded by the bucket constant)"
    ),
    ("text_zipf_slope", "bnlj"): (
        "triangular rank join over the top-500 token relation "
        "(bounded by the fit-window constant)"
    ),
    ("text_bm25_topk", "bnlj"): (
        "cross vs the 1-row (N, avgdl) corpus-stats aggregate "
        "(scalar frontier; BuildRight puts it after the stream subtree, "
        "past the detector's lookahead)"
    ),
    ("text_perplexity_buckets", "bnlj"): (
        "cross vs the 1-row tercile-cuts aggregate (scalar frontier)"
    ),
    ("agg_gini_coefficient", "global_win"): (
        "ordered global window over the <=64-row bucket-totals "
        "relation (SinglePartition over a bounded rollup, by design)"
    ),
    ("win_pareto_abc", "global_win"): (
        "ordered global window over the <=64-row bucket-totals relation"
    ),
    ("ts_kaplan_meier", "global_win"): (
        "suffix-sum window over the <=31-row duration relation "
        "(bounded by the observation horizon)"
    ),
    ("emb_centroid_purity", "global_win"): (
        "ordering over the 16-row per-centroid relation"
    ),
    ("diag_cramers_v", "bnlj"): (
        "margin crossJoins vs 1-row total aggregates (scalar frontier; "
        "cache-inflated stream side can push keys=[] past the lookahead)"
    ),
    ("diag_mutual_information", "bnlj"): (
        "cells x broadcast 1-row total (scalar frontier over the "
        "persisted 15-cell relation)"
    ),
    ("text_tfidf_top_terms", "bnlj"): (
        "cross vs the 1-row corpus-size aggregate (scalar frontier)"
    ),
    ("text_token_budget_alloc", "bnlj"): (
        "cross vs the 1-row corpus-token-total aggregate (scalar frontier)"
    ),
    ("text_pmi_collocations", "bnlj"): (
        "cross vs the 1-row bigram-total aggregate (scalar frontier)"
    ),
}


def _is_global_ordered_window(line: str) -> bool:
    """True iff a Window plan line is ORDERED but UNPARTITIONED — the
    single-task-sequential shape. The physical text prints
    `Window [exprs], [partition], [order]` (3 groups) when both are
    present and `Window [exprs], [spec]` (2 groups) when only one is;
    a partition-only window (whole-partition frame) is parallel and
    fine, so a 2-group line is flagged only when its second group is
    an ORDER spec (contains ASC/DESC)."""
    depth = 0
    groups: list[str] = []
    buf = ""
    for ch in line:
        if ch == "[":
            if depth == 0:
                buf = ""
            depth += 1
        elif ch == "]":
            depth = max(0, depth - 1)
            if depth == 0:
                groups.append(buf)
        elif depth > 0:
            buf += ch
    if len(groups) >= 3:
        return False
    if len(groups) == 2:
        return " ASC" in groups[1] or " DESC" in groups[1]
    return False


def audit_plan(plan: str) -> list[str]:
    """Return smell tags found in one executed-plan string."""
    smells = []
    if "CartesianProduct" in plan:
        smells.append("cartesian")
    # BNLJ: flag only when the broadcast build side is not a 1-row
    # scalar frontier. The plan prints the build side beneath a
    # BroadcastExchange IdentityBroadcastMode node; a scalar frontier
    # shows a final (no-grouping) HashAggregate directly under it.
    for m in re.finditer(r"BroadcastNestedLoopJoin", plan):
        tail = plan[m.start() :]
        # the broadcast subtree appears below the join node; a scalar
        # frontier shows a grouping-free HashAggregate (keys=[]) or a
        # literal LocalTableScan. The lookahead must cover the STREAM
        # side first (BuildRight prints it before the build side), and
        # a materialized InMemoryRelation inflates that side with its
        # stored plan — hence 200 lines, not 40 (a warm token-cache
        # pushed five scalar frontiers past the shorter window).
        window = "\n".join(tail.splitlines()[:200])
        if "keys=[]" not in window and "LocalTableScan" not in window:
            smells.append("bnlj")
            break
    for line in plan.splitlines():
        stripped = re.sub(r"^[\s+:*\-]*(\(\d+\)\s*)?", "", line)
        if stripped.startswith("Window ") and _is_global_ordered_window(stripped):
            smells.append("global_win")
            break
    return smells


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sys.path.insert(0, ".")
    from seamless_sharepoint_etl_spark import registry, session

    spark = session.get_spark("plan-audit")
    bad = 0
    for name, fn in registry.queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # pragma: no cover - report, don't die
            print(f"ERROR {name}: {type(ex).__name__}: {ex}")
            bad += 1
            continue
        for smell in audit_plan(plan):
            reason = ALLOWLIST.get((name, smell))
            if reason:
                print(f"ALLOW {name}: {smell} — {reason}")
            else:
                print(f"SMELL {name}: {smell}")
                bad += 1
    print(f"AUDIT: {'FAIL' if bad else 'CLEAN'} ({bad} findings)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
