"""The bucketed co-located join must not shuffle either fact side."""

from __future__ import annotations

from seamless_sharepoint_etl_spark.operators import joins

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle_exchange(spark):
    # disable broadcast so the join strategy is the one that matters at
    # fact×fact scale (sort-merge); at sf0.001 AQE would broadcast it
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = joins.bucketed_colocated_join(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan, plan
    assert "SelectedBucketsCount: 8 out of 8" in plan, plan
    # bucketed scans supply the join partitioning: the ONLY exchange in
    # the whole plan is the final aggregation's (hashpartitioning on the
    # group key), never one on the join key
    join_key_exchanges = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
        and ("o_orderkey" in ln or "l_orderkey" in ln)
    ]
    assert join_key_exchanges == [], plan
