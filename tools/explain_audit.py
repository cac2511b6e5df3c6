"""Plan audit: physical-plan scorecard for the headline queries.

Usage: python tools/explain_audit.py [sf_dir]

For each headline query prints exchanges / broadcasts / codegen spans /
Python-eval nodes and the pushed-filter evidence — the at-a-glance
check that every plan still has the shape SCALE.md §2 claims.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from bench import HEADLINE
    from seamless_sharepoint_etl_spark import registry
    from seamless_sharepoint_etl_spark.session import get_spark

    spark = get_spark("explain-audit")
    queries = registry.queries()

    def walk(node, names: list[str]) -> None:
        # Genuine tree walk over the physical plan (toString/formatted
        # text both recurse into every cached relation's STORED build
        # plan — for the iteratively-trained ANN indexes that is ~3400
        # lines of Lloyd lineage around an 8-exchange query, so text
        # counting is hopeless). InMemoryTableScan is a leaf: whatever
        # is under it ran once at cache-fill, not per query.
        name = node.nodeName()
        names.append(name)
        if "InMemoryTableScan" in name:
            return
        if name == "AdaptiveSparkPlan":
            walk(node.initialPlan(), names)
            return
        kids = node.children()
        for i in range(kids.length()):
            walk(kids.apply(i), names)

    hdr = f"{'query':34} {'exch':>4} {'bcast':>5} {'wscg':>4} {'py':>3}  pushed filters"
    print(hdr)
    print("-" * len(hdr))
    for name in HEADLINE:
        try:
            df = queries[name](spark, sf_dir)
            root = df._jdf.queryExecution().executedPlan()
            nodes: list[str] = []
            walk(root, nodes)
            plan = root.toString()
        except Exception as e:  # noqa: BLE001
            print(f"{name:34} ERROR {type(e).__name__}")
            continue
        exch = sum(1 for n in nodes if n == "Exchange")
        bcast = sum(1 for n in nodes if n == "BroadcastExchange")
        wscg = sum(1 for n in nodes if n.startswith("WholeStageCodegen"))
        py = sum(
            1 for n in nodes if "EvalPython" in n or "InPandas" in n or "ArrowEval" in n
        )
        pushed = re.findall(r"PushedFilters: \[([^\]]{1,60})", plan)
        interesting = next(
            (p for p in pushed if p and not p.startswith("IsNotNull") or "Than" in p),
            pushed[0] if pushed else "",
        )
        print(f"{name:34} {exch:>4} {bcast:>5} {wscg:>4} {py:>3}  {interesting[:58]}")
    spark.stop()


if __name__ == "__main__":
    main()
