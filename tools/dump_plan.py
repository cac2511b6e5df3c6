"""Dump `.explain('formatted')` for named queries to plans/<dir>/<name>_<tag>.txt.

Usage: python tools/dump_plan.py <tag> <query>[,<query>...] [sf_dir] [outdir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    outdir = sys.argv[4] if len(sys.argv) > 4 else "plans/r09"

    from seamless_sharepoint_etl_spark import registry
    from seamless_sharepoint_etl_spark.session import get_spark

    spark = get_spark("dump-plan")
    queries = registry.queries()
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange lines)")


if __name__ == "__main__":
    main()
