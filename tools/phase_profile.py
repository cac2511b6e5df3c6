"""Per-query phase profile: where does a headline query's second go?

Usage: python tools/phase_profile.py [sf_dir] [query1,query2,... | TOPN]

For each query, after the same setup bench.py performs, measures:
  build_s   — Python-side DataFrame construction (py4j + incremental
              analysis of every withColumn/select step)
  plan_s    — executedPlan() materialization (optimizer + physical
              planning; AQE re-planning happens at run time, not here)
  run1_s    — first noop execution (includes AQE re-plans + codegen
              for this plan instance)
  run2_s    — second noop execution of a FRESH DataFrame (the bench's
              steady-state shape: build+plan+execute every pass)

The bench's timed number ≈ build + plan + run, so a query whose
build_s/plan_s dominate is a Catalyst/py4j overhead problem (fix the
construction pattern), while run-dominated queries need plan/shuffle
work (guide §2-§3).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sel = sys.argv[2] if len(sys.argv) > 2 else "20"

    from bench import HEADLINE
    from seamless_sharepoint_etl_spark import registry
    from seamless_sharepoint_etl_spark.session import get_spark
    from seamless_sharepoint_etl_spark import io as engine_io

    spark = get_spark("phase-profile")
    queries = registry.queries()

    if sel.isdigit():
        import json

        full = json.load(open(os.path.join(os.path.dirname(__file__), "..", "BENCH_FULL.json")))
        names = [
            n
            for n, _ in sorted(full["queries"].items(), key=lambda kv: -kv[1])
        ][: int(sel)]
    else:
        names = sel.split(",")

    # same warm state as bench.py setup
    for t in engine_io.TABLES:
        engine_io.load_table(spark, sf_dir, t).write.format("noop").mode(
            "overwrite"
        ).save()
    from seamless_sharepoint_etl_spark.sources import rest as rest_src
    from seamless_sharepoint_etl_spark.operators import joins as joins_ops
    from seamless_sharepoint_etl_spark.llm_ops import (
        dedup as dedup_ops,
        graph as graph_ops,
        similarity as sim_ops,
        text as text_ops,
    )

    rest_src.register(spark)
    rest_src.materialize_pages(spark, sf_dir, rest_src._endpoint_for(sf_dir))
    sim_ops._ivf_index(spark, sf_dir)[0].count()
    sim_ops._pq_index(spark, sf_dir)
    dedup_ops._hashed_shingles(spark, sf_dir).count()
    dedup_ops._portable_shingles(spark, sf_dir)
    text_ops._token_relation(spark, sf_dir).count()
    text_ops._bigram_relation(spark, sf_dir)
    for rel in (graph_ops._edges(spark, sf_dir), graph_ops._kcore_edges(spark, sf_dir)):
        rel.persist().count()

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # one warm pass so codegen/broadcast caches are hot
    for name in names:
        try:
            noop(queries[name](spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: warm ERROR {type(e).__name__}: {e}")

    hdr = f"{'query':34} {'build':>7} {'plan':>7} {'run1':>7} {'run2':>7} {'total':>7}"
    print(hdr)
    print("-" * len(hdr))
    for name in names:
        fn = queries[name]
        try:
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df._jdf.queryExecution().executedPlan()
            t2 = time.time()
            noop(df)
            t3 = time.time()
            df2 = fn(spark, sf_dir)
            noop(df2)
            t4 = time.time()
        except Exception as e:  # noqa: BLE001
            print(f"{name:34} ERROR {type(e).__name__}: {e}")
            continue
        print(
            f"{name:34} {t1 - t0:7.3f} {t2 - t1:7.3f} {t3 - t2:7.3f}"
            f" {t4 - t3:7.3f} {t3 - t0:7.3f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
