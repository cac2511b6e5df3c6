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

    def truncate_cached(plan: str) -> str:
        # A cached relation prints its STORED build plan (for iterative
        # index builds, recursively — the PQ plan text is ~3400 lines of
        # nested Lloyd lineage while the actual query runs 8 exchanges).
        # Same policy as the golden-plan signatures: the scorecard reads
        # the query-time plan down to its first cached leaf, and an AQE
        # "== Initial Plan ==" duplicate section ends the text.
        out = []
        for line in plan.splitlines():
            if "== Initial Plan ==" in line:
                break
            out.append(line)
            if "InMemoryRelation" in line:
                break
        return "\n".join(out)

    hdr = f"{'query':34} {'exch':>4} {'bcast':>5} {'wscg':>4} {'py':>3}  pushed filters"
    print(hdr)
    print("-" * len(hdr))
    for name in HEADLINE:
        try:
            df = queries[name](spark, sf_dir)
            plan = truncate_cached(df._jdf.queryExecution().executedPlan().toString())
        except Exception as e:  # noqa: BLE001
            print(f"{name:34} ERROR {type(e).__name__}")
            continue
        exch = len(re.findall(r"Exchange (hash|range|single)", plan))
        bcast = plan.count("BroadcastExchange")
        wscg = len(set(re.findall(r"\*\((\d+)\)", plan)))
        py = plan.count("EvalPython") + plan.count("InPandas")
        pushed = re.findall(r"PushedFilters: \[([^\]]{1,60})", plan)
        interesting = next(
            (p for p in pushed if p and not p.startswith("IsNotNull") or "Than" in p),
            pushed[0] if pushed else "",
        )
        print(f"{name:34} {exch:>4} {bcast:>5} {wscg:>4} {py:>3}  {interesting[:58]}")
    spark.stop()


if __name__ == "__main__":
    main()
