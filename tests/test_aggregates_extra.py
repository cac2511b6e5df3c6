"""Tests for the rows-only aggregate queries + idempotent append."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_approx_percentile_within_accuracy(spark):
    from seamless_sharepoint_etl_spark.operators import aggregates

    approx = {
        r["l_returnflag"]: [r["approx_p25"], r["approx_p50"], r["approx_p75"]]
        for r in aggregates.approx_percentile_price(spark, SF).collect()
    }
    exact = {
        r["l_returnflag"]: [r["p25"], r["p50"], r["p75"]]
        for r in aggregates.exact_percentiles(spark, SF).collect()
    }
    for flag, est in approx.items():
        for e, x in zip(est, exact[flag]):
            # 10000-accuracy sketch ⇒ rank error ≤ n/10000; translate to
            # a loose relative value bound for the fixture distribution
            assert abs(e - x) / max(abs(x), 1.0) < 0.05, (flag, est, exact[flag])


def test_approx_distinct_within_rsd(spark):
    from seamless_sharepoint_etl_spark.operators import aggregates
    from seamless_sharepoint_etl_spark import io

    est = {
        r["l_returnflag"]: r["approx_orders"]
        for r in aggregates.approx_distinct(spark, SF).collect()
    }
    li = io.load_table(spark, SF, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    for flag, e in est.items():
        assert abs(e - exact[flag]) / exact[flag] < 0.06  # 3× rsd=0.02


def test_incremental_append_idempotent_rerun(spark, tmp_path):
    """Same frontier re-run is a committed-txn no-op — no duplication
    (the exactly-once manifest-commit posture, SURVEY.md §7.3#5)."""
    from seamless_sharepoint_etl_spark import pipelines, sinks

    out = str(tmp_path / "sink")
    n1 = pipelines.run_incremental_append(spark, SF, out)
    n2 = pipelines.run_incremental_append(spark, SF, out)
    assert n1 == n2 > 0
    assert sinks.read_snapshot(spark, out).count() == n1


def test_hll_partial_merge_matches_exact(spark):
    """Two-level sketch rollup: merged estimates within HLL error of
    the exact distinct counts, and estimates must agree with a direct
    single-level sketch (merge loses nothing)."""
    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import aggregates

    est = {
        r["l_returnflag"]: r["approx_orders"]
        for r in aggregates.hll_partial_merge(spark, SF).collect()
    }
    li = io.load_table(spark, SF, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    direct = {
        r["l_returnflag"]: r["e"]
        for r in li.groupBy("l_returnflag")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("l_orderkey", 14)).alias("e"))
        .collect()
    }
    for flag, e in est.items():
        assert abs(e - exact[flag]) / exact[flag] < 0.05, (flag, e, exact[flag])
        assert e == direct[flag], "union-merge must equal single-level sketch"


def test_approx_topk_exactness_precondition(spark):
    """agg_approx_topk's hash-match against the plain GROUP BY oracle
    is only guaranteed while event_type cardinality ≤ the sketch's 100
    tracked slots (counts are then exact). Pin the precondition so a
    richer fixture surfaces as this assertion, not as a
    nondeterministic oracle mismatch."""
    from seamless_sharepoint_etl_spark import io

    e = io.load_table(spark, SF, "events")
    card = e.select("event_type").distinct().count()
    assert card <= 100, (
        f"event_type cardinality {card} > 100: approx_top_k counts are no "
        "longer exact — switch agg_approx_topk's oracle to a tolerance gate"
    )


def test_kmv_estimate_within_bound_and_merge_exact(spark):
    """KMV gates: (1) per-type estimate within 3σ ≈ 38% of exact
    countDistinct at K=64; (2) sketch merge is EXACT — the k smallest
    of the union of two halves' sketches equal the full sketch (any
    global top-k minimum lives in its half's top-k)."""
    from conftest import SF_DIR
    from pyspark.sql import functions as F

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import aggregates as agg

    est = {
        r["event_type"]: r["est_distinct"]
        for r in agg.kmv_distinct(spark, SF_DIR).collect()
    }
    ev = io.load_table(spark, SF_DIR, "events")
    exact = {
        r["event_type"]: r["d"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, e in exact.items():
        if e <= agg.KMV_K:
            assert est[k] == e  # below K the sketch IS exact
        else:
            assert abs(est[k] - e) / e < 0.38, (k, est[k], e)

    # merge exactness on raw hash sets (portable LCG, same as the op)
    from seamless_sharepoint_etl_spark import portable

    hashes = sorted(
        r["h"]
        for r in ev.select(portable.lcg31(F.col("user_id")).alias("h"))
        .distinct()
        .collect()
    )
    half_a = sorted(h for h in hashes if h % 2 == 0)[: agg.KMV_K]
    half_b = sorted(h for h in hashes if h % 2 != 0)[: agg.KMV_K]
    merged = sorted(half_a + half_b)[: agg.KMV_K]
    assert merged == hashes[: agg.KMV_K]


def test_sample_estimate_error_bound(spark):
    """AQP contract: the 5% deterministic-sample estimate lands within
    a sampling-theory-sized envelope of the exact per-flag answer (25%
    at this SF's ~100-row samples), and never misses a flag group."""
    from pyspark.sql import functions as F

    from conftest import SF_DIR
    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import aggregates

    est = {
        r["l_returnflag"]: (r["est_rows"], r["est_revenue"])
        for r in aggregates.sample_estimate(spark, SF_DIR).collect()
    }
    li = io.load_table(spark, SF_DIR, "lineitem")
    exact = {
        r["l_returnflag"]: (r["n"], r["rev"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
        .collect()
    }
    assert set(est) == set(exact)
    for flag, (n, rev) in exact.items():
        en, erev = est[flag]
        assert abs(en - n) / n <= 0.25, (flag, en, n)
        assert abs(erev - rev) / rev <= 0.25, (flag, erev, rev)


def test_percentile_refinement_loop_stays_exact_under_tiny_bound(
    spark, monkeypatch, tmp_path
):
    """The range-refinement loop in exact_percentiles never triggers at
    fixture scale (level-0 buckets are under the 2^18 bound); force it
    by shrinking the bound to 4 so EVERY target refines down to
    width-1 ranges, and assert the answers are unchanged — the loop is
    pure narrowing, never approximation."""
    import duckdb

    from seamless_sharepoint_etl_spark.operators import aggregates

    sf = "/root/testdata/sf0.001"
    monkeypatch.setattr(aggregates, "_PCTL_TASK_BOUND", 4)
    got = {
        r["l_returnflag"]: tuple(r)[1:]
        for r in aggregates.exact_percentiles(spark, sf).collect()
    }
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    want = {
        r[0]: tuple(r)[1:]
        for r in con.sql(aggregates.EXACT_PERCENTILES_SQL).fetchall()
    }
    con.close()
    assert got == want


def test_weighted_median_refinement_loop_stays_exact_under_tiny_bound(
    spark, monkeypatch
):
    """Force the weighted-median crossing-bucket refinement (never
    triggered at fixture scale) by shrinking the row bound to 4; the
    loop is pure range narrowing, so the answer must be unchanged."""
    import duckdb

    from seamless_sharepoint_etl_spark.operators import aggregates

    sf = "/root/testdata/sf0.001"
    monkeypatch.setattr(aggregates, "_PCTL_TASK_BOUND", 4)
    got = {
        r["flag"]: (r["weighted_median_cents"], r["total_weight"])
        for r in aggregates.weighted_median(spark, sf).collect()
    }
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    want = {r[0]: (r[1], r[2]) for r in con.sql(aggregates.WEIGHTED_MEDIAN_SQL).fetchall()}
    con.close()
    assert got == want


def test_hll_portable_error_and_branches(spark):
    """agg_hll_portable: the estimate must sit within ~2 sigma of
    HLL_64's standard error (1.04/sqrt(64) = 13%) against the exact
    count it carries, and at sf0.001 the small-range linear-counting
    branch (v_empty > 0, through the fixed-point log) must be the one
    that fires."""
    from seamless_sharepoint_etl_spark.operators import aggregates

    tiny = aggregates.hll_portable(spark, "/root/testdata/sf0.001").collect()[0]
    assert tiny["v_empty"] > 0  # linear-counting branch exercised
    assert tiny["err_bp"] <= 2600
    small = aggregates.hll_portable(spark, "/root/testdata/sf0.01").collect()[0]
    assert small["err_bp"] <= 2600
    assert small["hll_estimate"] > 0


def test_winsorized_refinement_loop_stays_exact_under_tiny_bound(
    spark, monkeypatch
):
    """agg_winsorized_stats (rebuilt on the frontier machinery): force
    the cut-rank refinement with a bound of 4 and assert the full
    result is unchanged vs the window-based oracle."""
    import duckdb

    from seamless_sharepoint_etl_spark.operators import aggregates

    sf = "/root/testdata/sf0.001"
    monkeypatch.setattr(aggregates, "_PCTL_TASK_BOUND", 4)
    got = sorted(
        tuple(r) for r in aggregates.winsorized_stats(spark, sf).collect()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW customer AS SELECT * FROM '{sf}/customer.parquet'")
    want = sorted(
        tuple(r) for r in con.sql(aggregates.WINSORIZED_STATS_SQL).fetchall()
    )
    con.close()
    assert got == want


def test_winsorized_raises_loudly_outside_shift_domain(spark, tmp_path):
    """A balance below the non-negative SHIFT domain must raise, not
    misbucket silently (truncating div is not order-preserving around
    zero)."""
    import os

    import pandas as pd
    import pytest

    from seamless_sharepoint_etl_spark.operators import aggregates

    d = str(tmp_path)
    pd.DataFrame(
        {
            "c_custkey": [1, 2],
            "c_name": ["a", "b"],
            "c_nationkey": [0, 0],
            "c_acctbal": [-20000.0, 5.0],
            "c_mktsegment": ["BUILDING", "BUILDING"],
        }
    ).to_parquet(os.path.join(d, "customer.parquet"))
    with pytest.raises(ValueError, match="SHIFT domain"):
        aggregates.winsorized_stats(spark, d)


def test_winsorized_raises_on_bucket_zero_underflow(spark, tmp_path):
    """Shifted values in (-W0, 0) — c_acctbal in (-10040.96, -10000.00)
    — land in bucket 0 under truncating div and so evade any bucket-id
    guard; the value guard must still raise (they would otherwise be
    silently excluded by the vs >= lo_v candidate filter, diverging
    from the oracle)."""
    import os

    import pandas as pd
    import pytest

    from seamless_sharepoint_etl_spark.operators import aggregates

    d = str(tmp_path)
    pd.DataFrame(
        {
            "c_custkey": [1, 2, 3],
            "c_name": ["a", "b", "c"],
            "c_nationkey": [0, 0, 0],
            # -10010.00 shifts to -1000 cents: bucket 0, negative value
            "c_acctbal": [-10010.0, 5.0, 7.0],
            "c_mktsegment": ["BUILDING"] * 3,
        }
    ).to_parquet(os.path.join(d, "customer.parquet"))
    with pytest.raises(ValueError, match="SHIFT domain"):
        aggregates.winsorized_stats(spark, d)
