"""Per-query job/stage/task census: how many driver-synchronized jobs,
stages and tasks does one warm bench pass of a query cost?

Usage: python tools/job_census.py [sf_dir] [query1,query2,... | TOPN]

At fixture scale most headline queries are OVERHEAD-bound: wall time ~
(#jobs x job-launch latency) + (#stages x stage-launch latency) +
(#tasks x task overhead), not data movement. This census makes that
visible so guide §1.2 step 1 (fewer passes/shuffles) can be applied to
the queries where the count, not the bytes, is the wall.

Exchanges are counted from the executed plan string (post-AQE final
plans may differ; this is the static physical plan's count).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sel = sys.argv[2] if len(sys.argv) > 2 else "20"

    from seamless_sharepoint_etl_spark import registry
    from seamless_sharepoint_etl_spark.session import get_spark
    from seamless_sharepoint_etl_spark import io as engine_io

    spark = get_spark("job-census")
    queries = registry.queries()

    if sel.isdigit():
        import json

        full = json.load(
            open(os.path.join(os.path.dirname(__file__), "..", "BENCH_FULL.json"))
        )
        names = [
            n for n, _ in sorted(full["queries"].items(), key=lambda kv: -kv[1])
        ][: int(sel)]
    else:
        names = sel.split(",")

    # same warm state as bench.py setup
    for t in engine_io.TABLES:
        engine_io.load_table(spark, sf_dir, t).write.format("noop").mode(
            "overwrite"
        ).save()
    from seamless_sharepoint_etl_spark.sources import rest as rest_src
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
    for rel in (
        graph_ops._edges(spark, sf_dir),
        graph_ops._kcore_edges(spark, sf_dir),
    ):
        rel.persist().count()

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warm pass (codegen, broadcasts)
    for name in names:
        try:
            noop(queries[name](spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: warm ERROR {type(e).__name__}: {e}")

    tracker = spark.sparkContext.statusTracker()

    hdr = (
        f"{'query':34} {'jobs':>5} {'stages':>7} {'tasks':>6} {'exch':>5}"
        f" {'wall_s':>7}"
    )
    print(hdr)
    print("-" * len(hdr))
    for name in names:
        fn = queries[name]
        group = f"census-{name}"
        spark.sparkContext.setJobGroup(group, name)
        try:
            t0 = time.time()
            df = fn(spark, sf_dir)
            noop(df)
            t1 = time.time()
        except Exception as e:  # noqa: BLE001
            print(f"{name:34} ERROR {type(e).__name__}: {e}")
            continue
        finally:
            spark.sparkContext.setJobGroup(None, None)
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = 0
        n_tasks = 0
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            for sid in info.stageIds:
                sinfo = tracker.getStageInfo(sid)
                if sinfo is None:
                    continue
                # skipped stages report 0 tasks completed; count launched
                if sinfo.numTasks and (
                    sinfo.numActiveTasks
                    or sinfo.numCompletedTasks
                    or sinfo.numFailedTasks
                ):
                    n_stages += 1
                    n_tasks += sinfo.numCompletedTasks
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_exch = plan.count("Exchange")
        print(
            f"{name:34} {len(job_ids):5d} {n_stages:7d} {n_tasks:6d}"
            f" {n_exch:5d} {t1 - t0:7.3f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
