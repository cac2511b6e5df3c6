"""Property and edge-case tests (SURVEY.md §5.2 — own additions beyond
the oracle harness): invariants that need no oracle, plus Spark↔DuckDB
semantic-drift checks on adversarial tiny inputs (null group keys,
duplicate join keys, empty relations)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# --- invariants over fixture-scale data -------------------------------------


def test_union_count_additive(spark):
    from seamless_sharepoint_etl_spark import io

    o = io.load_table(spark, SF, "orders")
    a = o.filter("o_totalprice >= 100000")
    b = o.filter("o_totalprice < 100000")
    assert a.unionByName(b).count() == o.count()


def test_watermark_frontier_strictness(spark):
    """Every flagship output key is strictly beyond the sink watermark —
    the reference's correctness core (A4/A11, strict-`>` idempotence)."""
    from seamless_sharepoint_etl_spark import io, pipelines

    wm = (
        io.sharepoint_rows(spark, SF)
        .agg(F.max("po_number").alias("wm"))
        .collect()[0]["wm"]
    )
    out = pipelines.incremental_load(spark, SF)
    assert out.filter(F.col("po_number") <= wm).count() == 0
    # and flagship ∪ sink = all items (no gaps, no overlap)
    n_items = io.seamless_items(spark, SF).count()
    n_sink = io.sharepoint_rows(spark, SF).count()
    assert out.count() + n_sink == n_items


def test_incremental_load_idempotent_when_caught_up(spark, tmp_path):
    """Re-running after a full catch-up moves zero rows (reference
    at-least-once-with-idempotence argument, SURVEY.md §4.2)."""
    from seamless_sharepoint_etl_spark import io, pipelines

    items = io.seamless_items(spark, SF)
    # simulate caught-up sink: wm == global max ⇒ empty increment
    wm = items.agg(F.max("po_number")).collect()[0][0]
    fresh = items.filter(F.col("po_number") > F.lit(wm))
    assert fresh.count() == 0
    assert fresh.columns == items.columns  # schema stable on empty


def test_exact_dedup_partitions_docs(spark):
    """Dedup groups partition the corpus: Σ n_copies = |documents|."""
    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.llm_ops import dedup

    total = io.load_table(spark, SF, "documents").count()
    groups = dedup.exact_dedup(spark, SF)
    assert groups.agg(F.sum("n_copies")).collect()[0][0] == total


def test_lsh_is_subset_of_exact_jaccard(spark):
    """LSH output ⊆ exact-Jaccard output (verify stage guarantees no
    false positives; recall is checked in test_llm_ops)."""
    from seamless_sharepoint_etl_spark.llm_ops import dedup

    exact = {
        (r["doc_lo"], r["doc_hi"])
        for r in dedup.ngram_jaccard_pairs(spark, SF).collect()
    }
    lsh = {
        (r["doc_lo"], r["doc_hi"])
        for r in dedup.minhash_lsh_pairs(spark, SF).collect()
    }
    assert lsh <= exact


# --- Spark ↔ DuckDB drift on adversarial tiny inputs ------------------------


@pytest.fixture(scope="module")
def drift_con():
    con = duckdb.connect()
    yield con
    con.close()


def _both(spark, con, pdf: pd.DataFrame, spark_df, sql: str):
    """Run the same computation both ways over the same pandas data."""
    con.register("t", pdf)
    duck = con.sql(sql).fetchall()
    con.unregister("t")
    got = [tuple(r) for r in spark_df.collect()]
    return sorted(got, key=repr), sorted([tuple(r) for r in duck], key=repr)


def test_null_group_keys_form_one_group(spark, drift_con):
    pdf = pd.DataFrame(
        {"k": ["a", None, "a", None, "b"], "v": [1.0, 2.0, 3.0, 4.0, 5.0]}
    )
    sdf = (
        spark.createDataFrame(pdf)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    )
    got, want = _both(
        spark, drift_con, pdf, sdf,
        "SELECT k, count(*) AS n, sum(v) AS s FROM t GROUP BY k",
    )
    assert got == want  # NULL keys group together in both engines


def test_duplicate_join_keys_multiply(spark, drift_con):
    pdf = pd.DataFrame({"k": [1, 1, 2], "v": ["x", "y", "z"]})
    left = spark.createDataFrame(pdf)
    right = spark.createDataFrame(pdf).withColumnRenamed("v", "w")
    sdf = left.join(right, "k").select("k", "v", "w")
    drift_con.register("t", pdf)
    want = sorted(
        [tuple(r) for r in drift_con.sql(
            "SELECT a.k, a.v, b.v FROM t a JOIN t b USING (k)"
        ).fetchall()],
        key=repr,
    )
    drift_con.unregister("t")
    got = sorted([tuple(r) for r in sdf.collect()], key=repr)
    assert got == want  # 1-keyed rows produce 2×2 pairs in both


def test_nulls_never_join(spark, drift_con):
    pdf = pd.DataFrame({"k": [1.0, None, 2.0], "v": ["a", "b", "c"]})
    left = spark.createDataFrame(pdf)
    joined = left.alias("l").join(
        left.alias("r"), F.col("l.k") == F.col("r.k")
    )
    assert joined.count() == 2  # null = null is not true in either engine


def test_empty_relation_through_agg_and_join(spark):
    from seamless_sharepoint_etl_spark import io

    o = io.load_table(spark, SF, "orders").filter("o_orderkey < 0")
    agg = o.groupBy("o_orderstatus").agg(F.sum("o_totalprice").alias("s"))
    assert agg.count() == 0
    # global agg over empty input: count=0, sum=NULL (SQL semantics)
    row = o.agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s")).collect()[0]
    assert row["n"] == 0 and row["s"] is None
    # join with empty side
    c = io.load_table(spark, SF, "customer")
    assert c.join(o, c.c_custkey == o.o_custkey).count() == 0
    assert c.join(o, c.c_custkey == o.o_custkey, "left").count() == c.count()


def test_sort_null_ordering_matches_declared(spark):
    """Spark asc_nulls_last must put NULLs last (DuckDB default differs —
    the oracle queries spell NULLS FIRST/LAST explicitly; this pins the
    Spark side of that contract)."""
    pdf = pd.DataFrame({"x": [2.0, None, 1.0]})
    got = [r["x"] for r in spark.createDataFrame(pdf).orderBy(F.asc_nulls_last("x")).collect()]
    assert got == [1.0, 2.0, None]
    got_first = [r["x"] for r in spark.createDataFrame(pdf).orderBy(F.asc_nulls_first("x")).collect()]
    assert got_first == [None, 1.0, 2.0]


def test_bench_headline_queries_exist():
    """bench.py's headline set must stay a subset of the registry."""
    import bench
    from seamless_sharepoint_etl_spark import registry

    assert set(bench.HEADLINE) <= set(registry.queries())


def test_stratified_sample_fractions_and_determinism(spark):
    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import relational

    totals = {
        r["o_orderstatus"]: r["n"]
        for r in io.load_table(spark, SF, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want_frac = {"O": 0.2, "F": 0.2, "P": 0.5}
    draw1 = {
        r["o_orderstatus"]: r["n_sampled"]
        for r in relational.stratified_sample(spark, SF).collect()
    }
    draw2 = {
        r["o_orderstatus"]: r["n_sampled"]
        for r in relational.stratified_sample(spark, SF).collect()
    }
    assert draw1 == draw2  # fixed seed + same layout ⇒ same draw
    for k, frac in want_frac.items():
        got = draw1.get(k, 0) / totals[k]
        assert abs(got - frac) < 0.1 + 2.0 / (totals[k] * frac) ** 0.5, (k, got)


def test_zorder_buckets_bound_both_dimensions(spark):
    """The point of a Morton layout: per-bucket key spans must be small
    on BOTH dimensions simultaneously (a 1-D sort bounds one dimension
    and leaves the other at full range)."""
    from seamless_sharepoint_etl_spark.operators import layout

    rows = layout.zorder_stats(spark, "/root/testdata/sf0.001").collect()
    multi = [r for r in rows if r["n_rows"] > 1]
    assert multi, "expected multi-row z-buckets"
    g_day = max(r["max_day"] for r in rows) - min(r["min_day"] for r in rows)
    g_ck = max(r["max_ck"] for r in rows) - min(r["min_ck"] for r in rows)
    day_spans = sorted(r["max_day"] - r["min_day"] for r in multi)
    ck_spans = sorted(r["max_ck"] - r["min_ck"] for r in multi)
    assert day_spans[len(day_spans) // 2] <= g_day / 4
    assert ck_spans[len(ck_spans) // 2] <= g_ck / 4


def test_compaction_reduces_file_count(spark):
    """layout_compaction_read's maintenance half: the planted
    small-file layout really compacts to the byte-sized target count,
    and no rows are lost or duplicated."""
    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import layout

    before, after = layout.compact_events(spark, SF_DIR)
    assert before == layout.FRAG_FILES
    assert after < before
    _, compact = layout._compaction_dirs(SF_DIR)
    n_src = io.load_table(spark, SF_DIR, "events").count()
    assert spark.read.parquet(compact).count() == n_src


def test_dynamic_partition_overwrite_preserves_other_partitions(spark):
    """Mechanism gate for layout_dynamic_overwrite: with
    partitionOverwriteMode=dynamic a rewrite touching one partition
    leaves the others' files byte-identical; the static default would
    have truncated them."""
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="sse_dynpart_gate_")
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b")], ["id", "p"]
    )
    df.write.mode("overwrite").partitionBy("p").parquet(d)

    def files(part):
        pd_ = os.path.join(d, f"p={part}")
        return {
            f: os.path.getmtime(os.path.join(pd_, f))
            for f in os.listdir(pd_)
            if f.endswith(".parquet")
        }

    before_b = files("b")
    spark.createDataFrame([(9, "a")], ["id", "p"]).write.mode(
        "overwrite"
    ).option("partitionOverwriteMode", "dynamic").partitionBy("p").parquet(d)
    assert files("b") == before_b  # untouched partition: same files, same mtimes
    rows = {(r["id"], r["p"]) for r in spark.read.parquet(d).collect()}
    assert rows == {(9, "a"), (3, "b"), (4, "b")}


def test_time_travel_versions_diverge_exactly_on_merged_month(spark):
    """layout_time_travel_read's other half: the LATEST snapshot must
    differ from version 1 on exactly the merged month (prices doubled)
    and match it everywhere else — time travel reads history, the head
    reads the MERGE result."""
    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark import sinks
    from seamless_sharepoint_etl_spark.operators import layout

    layout.time_travel_read(spark, SF_DIR)  # ensures both commits exist
    root = layout.timetravel_root(SF_DIR)
    om = F.date_format("o_orderdate", "yyyy-MM").alias("om")
    cents = F.sum(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    ).alias("c")

    def month_totals(version):
        df = sinks.read_snapshot(spark, root, version=version)
        return {
            r["om"]: r["c"] for r in df.groupBy(om).agg(cents).collect()
        }

    v1, head = month_totals(1), month_totals(None)
    assert set(v1) == set(head)
    for m in v1:
        if m == layout.TT_MONTH:
            assert head[m] == 2 * v1[m]  # merged month: doubled exactly
        else:
            assert head[m] == v1[m]  # untouched months carried over


def test_referential_integrity_clean_on_consistent_fixture(spark):
    """diag_referential_integrity: the TPC-H-ish fixture is FK-complete,
    so every edge must audit clean — and the audit's internal counts
    must be mutually consistent (keys ≤ rows, orphans ≤ keys)."""
    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark.operators import quality

    rows = quality.referential_integrity(spark, SF_DIR).collect()
    assert len(rows) == len(quality.FK_EDGES)
    for r in rows:
        assert r["n_orphan_keys"] == 0, r["edge"]
        assert r["n_null"] == 0, r["edge"]
        assert 0 < r["n_keys"] <= r["n_rows"], r["edge"]


def test_psi_drift_terms_nonnegative_and_bins_complete(spark):
    """diag_psi_drift: every PSI term is ≥ 0 by construction ((pₐ−pₑ)
    and ln(pₐ/pₑ) always share sign), and the fixed-width binning over
    a dense value range must populate the full bin range."""
    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark.operators import quality

    rows = quality.psi_drift(spark, SF_DIR).collect()
    assert [r["bin"] for r in rows] == list(range(quality.PSI_BINS))
    for r in rows:
        assert r["psi_ppm"] >= 0
        assert r["e_cnt"] + r["a_cnt"] > 0


def test_token_entropy_bounded_by_log2_n(spark):
    """text_token_entropy: 0 ≤ H ≤ log₂(n_tokens) for every doc —
    equality at the top only when all tokens are distinct."""
    import math

    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark.llm_ops import text as text_ops

    rows = text_ops.token_entropy(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        hi = math.log2(r["n_tokens"]) * 100 if r["n_tokens"] > 1 else 0
        assert 0 <= r["entropy_cb"] <= math.floor(hi + 0.5) + 1, r


def test_join_cardinality_prediction_is_exact(spark):
    """diag_join_cardinality: the count-product identity must equal the
    actually-executed join's row count — the estimator is exact math,
    not a heuristic."""
    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import quality

    pred = quality.join_cardinality(spark, SF_DIR).first()
    o = io.load_table(spark, SF_DIR, "orders")
    e = io.load_table(spark, SF_DIR, "events")
    actual = o.join(e, o.o_custkey == e.user_id).count()
    assert pred["predicted_rows"] == actual
    assert pred["max_contrib"] <= actual
    assert pred["n_common_keys"] > 0


def test_url_canonicalize_output_is_clean_and_collision_free(spark):
    """text_url_canonicalize: every canonical URL is lowercase-scheme/
    host, www/port/fragment/tracking-free, query params sorted — and
    distinct docs stay distinct (the id param survives)."""
    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark.llm_ops import text as text_ops

    rows = text_ops.url_canonicalize(spark, SF_DIR).collect()
    assert rows
    urls = [r["canon_url"] for r in rows]
    assert len(set(urls)) == len(urls)
    for r in rows:
        u = r["canon_url"]
        assert u.startswith("https://src")
        assert "www." not in u and ":443" not in u and "#" not in u
        assert "utm_" not in u.lower()
        assert r["n_tracking_dropped"] == 2
        q = u.split("?", 1)[1].split("&")
        assert q == sorted(q)


def test_gateway_grouping_sets_levels_reconcile(spark):
    """sql_gateway_grouping_sets: the grand-total row must equal the
    sum of the per-priority rows, which must equal the sum of the
    finest level — lossless re-aggregation across grouping sets."""
    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark.operators import relational

    rows = relational.sql_gateway_grouping_sets(spark, SF_DIR).collect()
    fine = [r for r in rows if r["g_pri"] == 0 and r["g_st"] == 0]
    mid = [r for r in rows if r["g_pri"] == 0 and r["g_st"] == 1]
    total = [r for r in rows if r["g_pri"] == 1 and r["g_st"] == 1]
    assert len(total) == 1
    for col in ("n_orders", "rev_cents"):
        assert (
            sum(r[col] for r in fine)
            == sum(r[col] for r in mid)
            == total[0][col]
        )


def test_bfs_depth_covers_every_node_contiguously(spark):
    """graph_bfs_depth: parent(n) < n makes every node reachable from
    0, so the depth histogram must account for EVERY document exactly
    once, with contiguous depths starting at 0 (a gap would mean a
    dropped frontier)."""
    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.llm_ops import graph

    rows = graph.bfs_depth(spark, SF_DIR).collect()
    n_docs = io.load_table(spark, SF_DIR, "documents").count()
    assert sum(r["n_nodes"] for r in rows) == n_docs
    assert [r["depth"] for r in rows] == list(range(len(rows)))
    assert rows[0]["n_nodes"] == 1 and rows[0]["min_node"] == 0


def test_event_transitions_rows_sum_to_totals(spark):
    """win_event_transitions: transition counts must total n_events −
    n_users-with-events (every event except each user's last emits one
    transition), and each from-row's probabilities must sum to ~10000
    bp (integer floor loses < |types| bp per row)."""
    from collections import defaultdict

    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import windows as win_ops

    rows = win_ops.event_transitions(spark, SF_DIR).collect()
    e = io.load_table(spark, SF_DIR, "events")
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    assert sum(r["n_transitions"] for r in rows) == n_events - n_users
    by_from = defaultdict(int)
    n_types = len({r["to_type"] for r in rows})
    for r in rows:
        by_from[r["from_type"]] += r["prob_bp"]
    for tot in by_from.values():
        assert 10000 - n_types <= tot <= 10000


def test_frontier_ops_survive_empty_inputs(spark, tmp_path):
    """equidepth/psi/join-cardinality/BFS use driver-side scalar
    frontiers (bounds/counts via .first()); on an EMPTY relation those
    scalars are NULL and naive int() conversion crashes. All four must
    instead return empty (or all-NULL aggregate) results."""
    import os

    import pandas as pd

    d = str(tmp_path / "empty")
    os.makedirs(d)
    pd.DataFrame(
        {
            "o_orderkey": pd.Series([], dtype="int64"),
            "o_custkey": pd.Series([], dtype="int64"),
            "o_totalprice": pd.Series([], dtype="float64"),
            "o_orderdate": pd.Series([], dtype="datetime64[us]"),
        }
    ).to_parquet(os.path.join(d, "orders.parquet"))
    pd.DataFrame(
        {
            "event_id": pd.Series([], dtype="int64"),
            "ts": pd.Series([], dtype="datetime64[us]"),
            "user_id": pd.Series([], dtype="int64"),
            "event_type": pd.Series([], dtype="object"),
            "value": pd.Series([], dtype="float64"),
            "props": pd.Series([], dtype="object"),
        }
    ).to_parquet(os.path.join(d, "events.parquet"))
    pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "text": pd.Series([], dtype="object"),
            "lang": pd.Series([], dtype="object"),
            "source": pd.Series([], dtype="object"),
            "n_chars": pd.Series([], dtype="int64"),
        }
    ).to_parquet(os.path.join(d, "documents.parquet"))
    pd.DataFrame(
        {
            "vec_id": pd.Series([], dtype="int64"),
            "embedding": pd.Series([], dtype="object"),
            "label": pd.Series([], dtype="int32"),
        }
    ).to_parquet(os.path.join(d, "embeddings.parquet"))

    from seamless_sharepoint_etl_spark.llm_ops import graph
    from seamless_sharepoint_etl_spark.llm_ops import similarity as sim
    from seamless_sharepoint_etl_spark.operators import aggregates, quality

    assert aggregates.equidepth_histogram(spark, d).count() == 0
    assert quality.psi_drift(spark, d).count() == 0
    card = quality.join_cardinality(spark, d).first()
    assert card["n_common_keys"] == 0 and card["predicted_rows"] is None
    assert graph.bfs_depth(spark, d).count() == 0
    assert sim.pca_top_component(spark, d).count() == 0


def test_holt_linear_matches_sequential_recurrence(spark):
    """ts_holt_linear: re-run the coupled (level, trend) recurrence
    sequentially in Python over each user's ordered values — the
    distributed fold must agree bit-for-bit (same double ops, same
    order)."""
    import math

    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import timeseries as ts

    got = {
        r["user_id"]: (r["level_cents"], r["trend_cents"], r["forecast_cents"])
        for r in ts.holt_linear(spark, SF_DIR).collect()
    }
    e = io.load_table(spark, SF_DIR, "events")
    rows = e.selectExpr(
        "user_id", "ts_ns div 1000 AS ts_us", "event_id", "value"
    ).collect()
    series = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts_us"], r["event_id"])):
        series.setdefault(r["user_id"], []).append(r["value"])
    a, b = ts.HOLT_ALPHA, ts.HOLT_BETA
    for u, vals in series.items():
        if len(vals) == 1:
            l, t = vals[0], 0.0
        else:
            l, t = vals[1], vals[1] - vals[0]
            for x in vals[2:]:
                nl = a * x + (1 - a) * (l + t)
                t = b * ((a * x + (1 - a) * (l + t)) - l) + (1 - b) * t
                l = nl
        want = tuple(
            int(math.floor(v * 100 + 0.5)) for v in (l, t, l + t)
        )
        assert got[u] == want, (u, got[u], want)


def test_cusum_identity_matches_clamped_recurrence(spark):
    """ts_cusum_changepoint: the window identity Sₜ = Pₜ − min(0,
    min Pₛ) must equal the textbook clamped recurrence
    Sₜ = max(0, Sₜ₋₁ + dₜ) re-run sequentially in Python, including
    the argmax day with earliest-day tie-break."""
    from collections import defaultdict

    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import timeseries as ts
    from pyspark.sql import functions as FF

    got = {
        r["event_type"]: (r["n_days"], r["max_cusum_scaled"], r["changepoint_day"])
        for r in ts.cusum_changepoint(spark, SF_DIR).collect()
    }
    e = io.load_table(spark, SF_DIR, "events")
    daily = (
        e.groupBy("event_type", FF.to_date("ts").alias("day"))
        .agg(
            FF.sum(
                FF.floor(FF.col("value") * 100 + FF.lit(0.5)).cast("long")
            ).alias("cents")
        )
        .collect()
    )
    series = defaultdict(list)
    for r in daily:
        series[r["event_type"]].append((r["day"], r["cents"]))
    for et, pts in series.items():
        pts.sort()
        n = len(pts)
        total = sum(c for _, c in pts)
        s, best, best_day = 0, None, None
        for day, c in pts:
            s = max(0, s + n * c - total)
            if best is None or s > best:
                best, best_day = s, day
        assert got[et] == (n, best, best_day), et


def test_sequential_smoothers_handle_short_series(spark, tmp_path):
    """ts_ewma / ts_holt_linear over users with 1, 2, and 3 events —
    the short-series cases the fixture lacks. Spark bracket indexing is
    0-based while slice() is 1-based; the original seeds used vals[1]/
    vals[2], which CRASHES under ANSI for n<=2 and silently mis-seeds
    n>=3 (caught by review). Checked against hand-computed values."""
    import os

    import pandas as pd

    d = str(tmp_path / "short")
    os.makedirs(d)
    base = pd.Timestamp("2024-01-01")
    rows = [
        # user 1: single event
        (1, base, 1, "view", 10.0, "{}"),
        # user 2: two events
        (2, base, 2, "view", 10.0, "{}"),
        (3, base + pd.Timedelta(hours=1), 2, "view", 20.0, "{}"),
        # user 3: three events
        (4, base, 3, "view", 1.0, "{}"),
        (5, base + pd.Timedelta(hours=1), 3, "view", 2.0, "{}"),
        (6, base + pd.Timedelta(hours=2), 3, "view", 3.0, "{}"),
    ]
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(os.path.join(d, "events.parquet"))

    from seamless_sharepoint_etl_spark.operators import timeseries as ts

    ew = {r["user_id"]: r["ewma_cents"] for r in ts.ewma_per_user(spark, d).collect()}
    # user1: ewma = 10.0; user2: 0.25*20 + 0.75*10 = 12.5; user3:
    # s1=0.25*2+0.75*1=1.25, s2=0.25*3+0.75*1.25=1.6875
    assert ew == {1: 1000, 2: 1250, 3: 169}

    ho = {
        r["user_id"]: (r["level_cents"], r["trend_cents"])
        for r in ts.holt_linear(spark, d).collect()
    }
    # user1: l=10, b=0; user2: seed l=20, b=10 (no fold); user3: seed
    # l=2, b=1 → x=3: l=0.5*3+0.5*3=3, b=0.25*(3-2)+0.75*1=1
    assert ho == {1: (1000, 0), 2: (2000, 1000), 3: (300, 100)}


def test_textlog_malformed_lines_are_counted_not_fatal(spark, tmp_path):
    """src_textlog_scan's audit claim: a line that doesn't match the
    log pattern must become a NULL-keyed counted row, not an ANSI cast
    exception (regexp_extract returns '' on no-match; plain cast of ''
    throws under Spark 4 ANSI — caught by review)."""
    import os

    from seamless_sharepoint_etl_spark.sources import formats

    d = str(tmp_path / "log")
    os.makedirs(d)
    with open(os.path.join(d, "part.txt"), "w") as f:
        f.write('7 - [2024-01-01T10:00:00] "view" 1234\n')
        f.write("THIS LINE IS GARBAGE\n")
        f.write('8 - [2024-01-01T11:00:00] "view" -50\n')
    raw = spark.read.text(d)
    parsed = formats._parse_log_lines(raw).collect()
    ok = [r for r in parsed if r["user_id"] is not None]
    bad = [r for r in parsed if r["user_id"] is None]
    assert len(ok) == 2 and len(bad) == 1
    assert {r["value_bp"] for r in ok} == {1234, -50}
    assert bad[0]["ts"] is None and bad[0]["value_bp"] is None


def test_rolling_distinct_users_dominates_daily(spark):
    """win_rolling_distinct_users: the trailing-7d distinct count must
    be ≥ the same-day distinct count for every day, and ≥ the max
    single-day count within any full window."""
    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark.operators import windows as win_ops

    rows = win_ops.rolling_distinct_users(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["u7"] >= r["u1"] > 0


def test_market_basket_support_and_lift_consistent(spark):
    """join_market_basket: every reported pair's support must be ≥ 1,
    pairs ordered pa < pb, and recomputing one pair's support by a
    direct join must agree — the in-array pair explode loses nothing."""
    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import joins

    rows = joins.market_basket(spark, SF_DIR).collect()
    assert rows
    assert all(r["pa"] < r["pb"] and r["support"] >= 1 for r in rows)
    top = rows[0]
    li = (
        io.load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.filter(F.col("l_partkey") == top["pa"]).select("l_orderkey")
    b = li.filter(F.col("l_partkey") == top["pb"]).select("l_orderkey")
    assert a.join(b, "l_orderkey").count() == top["support"]


def test_geo_gridblock_is_nonvacuous_and_within_radius(spark):
    """join_geo_gridblock: the blocked join must actually match pairs
    on this fixture (oracle equality would be vacuous on zero rows) —
    and every distance must honor the radius bound."""
    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark.operators import joins

    r = joins.geo_gridblock_join(spark, SF_DIR).first()
    assert r["n_pairs"] > 0
    assert 0 <= r["min_d2"] <= joins.GEO_R * joins.GEO_R
    assert r["n_customers_matched"] <= r["n_pairs"]


def test_ab_chi_square_matches_textbook_arithmetic(spark):
    """diag_ab_chi_square: recompute χ² from the returned contingency
    cells with plain Python floats — the in-plan expression must agree
    to the same ppm floor, and the cells must cover every user."""
    import math

    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import quality

    r = quality.ab_chi_square(spark, SF_DIR).first()
    a, b, c, d = r["a"], r["b"], r["c"], r["d"]
    n_users = (
        io.load_table(spark, SF_DIR, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert a + b + c + d == n_users
    den = (a + b) * (c + d) * (a + c) * (b + d)
    want = (
        0
        if den == 0
        else math.floor((a + b + c + d) * (a * d - b * c) ** 2 / den * 1e6 + 0.5)
    )
    assert r["chi2_ppm"] == want


def test_hilbert_chain_is_a_true_hilbert_curve(spark):
    """layout_hilbert_locality's expression chain: (a) matches a
    sequential Python xy2d on ALL 65536 grid points (exhaustive, via
    DuckDB evaluating the same chain text the oracle uses); (b) the
    curve is a bijection whose consecutive indexes are unit-Manhattan
    adjacent — the defining Hilbert property Z-order lacks; (c) on the
    real fixture, Hilbert's within-block locality beats Z-order's
    (the diagnostic's raison d'être)."""
    import duckdb

    from seamless_sharepoint_etl_spark.operators import layout as lo

    def xy2d(n, x, y):
        d = 0
        s = n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    n = 1 << lo.HB_BITS
    ctes = []
    prev = "pts"
    for j, (name, expr) in enumerate(lo._hilbert_steps()):
        ctes.append(f"h{j} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = f"h{j}"
    rows = duckdb.sql(
        f"""WITH pts AS (
              SELECT a.i AS x, b.i AS y
              FROM range(0, {n}) a(i), range(0, {n}) b(i)
            ), {', '.join(ctes)}
            SELECT x, y, hidx FROM {prev}"""
    ).fetchall()
    assert len(rows) == n * n
    seen = {}
    for x, y, d in rows:
        assert d == xy2d(n, x, y), (x, y, d)
        seen[d] = (x, y)
    assert len(seen) == n * n, "not a bijection"
    for d in range(n * n - 1):
        x1, y1 = seen[d]
        x2, y2 = seen[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, f"gap at d={d}"

    row = lo.hilbert_locality(spark, SF).collect()[0]
    assert row["n_points"] > 0 and row["h_pairs"] > 0
    assert row["h_avg_milli"] < row["z_avg_milli"], (
        "Hilbert locality should beat Z-order on the fixture grid"
    )


def test_sax_word_matches_hand_ranking(spark, tmp_path):
    """ts_sax_symbolic on crafted series: (a) an 8-day strictly
    increasing series maps one day per segment and rank-quartiles to
    'aabbccdd'; a decreasing one to 'ddccbbaa' (rank-based
    breakpoints, ties impossible); (b) a calendar gap drops its
    segment — 7-char word, quartiles over 7; (c) a constant series is
    DETERMINISTIC under the segment-index tie-break ('aabbccdd' —
    the documented equi-depth property, not a flap)."""
    import os

    import pandas as pd

    d = str(tmp_path / "sax")
    os.makedirs(d)
    base = pd.Timestamp("2024-03-01")
    rows = []
    eid = 0
    for day in range(8):  # increasing
        eid += 1
        rows.append((eid, base + pd.Timedelta(days=day), 1, "up",
                     10.0 * (day + 1), "{}"))
    for day in range(8):  # decreasing
        eid += 1
        rows.append((eid, base + pd.Timedelta(days=day), 1, "down",
                     10.0 * (8 - day), "{}"))
    for day in range(8):  # gap at day 3
        if day == 3:
            continue
        eid += 1
        rows.append((eid, base + pd.Timedelta(days=day), 1, "gap",
                     10.0 * (day + 1), "{}"))
    for day in range(8):  # constant
        eid += 1
        rows.append((eid, base + pd.Timedelta(days=day), 1, "flat",
                     42.0, "{}"))
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(os.path.join(d, "events.parquet"))

    from seamless_sharepoint_etl_spark.operators import timeseries as ts

    words = {
        r["event_type"]: (r["n_days"], r["n_segments"], r["sax_word"])
        for r in ts.sax_symbolic(spark, d).collect()
    }
    assert words["up"] == (8, 8, "aabbccdd")
    assert words["down"] == (8, 8, "ddccbbaa")
    # gap: day 3's segment absent; remaining 7 segments rank 1..7,
    # symbol = (rn-1)*4 // 7 -> a a b b c c d in segment order
    assert words["gap"] == (7, 7, "aabbccd")
    assert words["flat"] == (8, 8, "aabbccdd")


def test_theil_sen_median_is_a_real_pair_slope(spark):
    """ts_theil_sen: the reported median must equal the lower median of
    the exact pairwise-slope multiset recomputed in Python for one
    event type."""
    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import timeseries as ts
    from pyspark.sql import functions as FF

    got = {
        r["event_type"]: r["median_slope_e6"]
        for r in ts.theil_sen_slope(spark, SF_DIR).collect()
    }
    et = sorted(got)[0]
    daily = (
        io.load_table(spark, SF_DIR, "events")
        .filter(FF.col("event_type") == et)
        .groupBy(FF.to_date("ts").alias("d"))
        .agg(
            FF.sum(
                FF.floor(FF.col("value") * 100 + FF.lit(0.5)).cast("long")
            ).alias("cents")
        )
        .collect()
    )
    pts = sorted((r["d"], r["cents"]) for r in daily)
    slopes = []
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            dd = (pts[j][0] - pts[i][0]).days
            num = (pts[j][1] - pts[i][1]) * 1_000_000
            q = abs(num) // dd  # truncate-toward-zero like both engines
            slopes.append(q if num >= 0 else -q)
    slopes.sort()
    assert got[et] == slopes[(len(slopes) + 1) // 2 - 1]


def test_pca_top_component_matches_full_numpy(spark):
    """emb_pca_top_component: the distributed Gram-accumulation result
    must match numpy PCA of the fully collected matrix — eigenvalue to
    1e-6 relative and loading direction to |cos| ≈ 1."""
    import numpy as np

    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.llm_ops import similarity as sim

    got = sim.pca_top_component(spark, SF_DIR).first()
    x = np.asarray(
        [
            np.asarray(r["embedding"], dtype=np.float64)
            for r in io.load_table(spark, SF_DIR, "embeddings")
            .select("embedding")
            .collect()
        ]
    )
    cov = np.cov(x, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    assert got["n_vectors"] == len(x) and got["dim"] == x.shape[1]
    assert abs(got["top_eig_ppm"] / 1e6 - w[-1]) / w[-1] < 1e-4
    top = v[:, -1]
    assert got["top_dim"] == int(np.argmax(np.abs(top))) + 1
    assert abs(abs(top[got["top_dim"] - 1]) - abs(got["top_loading_ppm"]) / 1e6) < 1e-4


def test_unicode_nfc_recomposes_exactly_one_char(spark):
    """text_unicode_nfc: the planted decomposed suffix must shrink by
    EXACTLY one codepoint per doc (e+◌́ → é) and nothing else in the
    ASCII fixture may change."""
    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark.llm_ops import text as text_ops

    rows = text_ops.unicode_nfc(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_composed"] == 1
        assert r["len_nfc"] == r["len_raw"] - 1
        assert len(r["nfc_digest"]) == 32


def test_codec_stats_monotone_and_lossless(spark):
    """layout_codec_stats: every codec reads back every row, and the
    compressed variants genuinely compress (zstd <= snappy < uncompressed
    on this text-heavy table)."""
    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import layout

    rows = {r["codec"]: r for r in layout.codec_stats(spark, SF_DIR).collect()}
    assert set(rows) == set(layout.CODECS)
    n_src = io.load_table(spark, SF_DIR, "documents").count()
    for r in rows.values():
        assert r["n_rows"] == n_src
    assert rows["zstd"]["n_bytes"] <= rows["snappy"]["n_bytes"]
    assert rows["snappy"]["n_bytes"] < rows["uncompressed"]["n_bytes"]
    assert rows["uncompressed"]["size_ratio_bp"] == 10000


def test_lttb_downsample_shape_properties(spark):
    """LTTB gates: per series — exactly min(n, LTTB_POINTS) points,
    first/last input points kept, output ⊆ input, timestamps strictly
    increasing with pos, deterministic."""
    from conftest import SF_DIR

    from pyspark.sql import functions as F

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import timeseries as T

    ev = io.load_table(spark, SF_DIR, "events")
    hourly = {}
    for r in (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.floor(F.sum("value") * 100 + F.lit(0.5)).cast("long").alias("c"))
        .collect()
    ):
        hourly.setdefault(r["event_type"], {})[r["h"]] = r["c"]

    by_type = {}
    for r in T.lttb_downsample(spark, SF_DIR).collect():
        by_type.setdefault(r["event_type"], []).append((r["pos"], r["h"], r["cents"]))

    assert set(by_type) == set(hourly)
    for t, pts in by_type.items():
        pts.sort()
        src = sorted(hourly[t].items())
        assert len(pts) == min(len(src), T.LTTB_POINTS)
        assert (pts[0][1], pts[0][2]) == src[0]
        assert (pts[-1][1], pts[-1][2]) == src[-1]
        hs = [h for _, h, _ in pts]
        assert hs == sorted(hs) and len(set(hs)) == len(hs)
        for _, h, c in pts:
            assert hourly[t][h] == c

    again = [tuple(r) for r in T.lttb_downsample(spark, SF_DIR).collect()]
    first = [
        (t, h, c, p) for t, pts in by_type.items() for p, h, c in pts
    ]
    assert sorted(again) == sorted((t, h, c, p) for t, h, c, p in first)


def test_k_anonymity_audit_internally_consistent(spark):
    """diag_k_anonymity: the audit's counters must cohere — total rows
    equal the table count, k = the true minimum group size under the
    declared QI, and the below-k tallies bound each other."""
    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import quality

    r = quality.k_anonymity(spark, SF_DIR).collect()[0]
    n_customers = io.load_table(spark, SF_DIR, "customer").count()
    assert r["n_rows"] == n_customers
    assert 1 <= r["k_anonymity"]
    assert r["n_groups_below_k"] <= r["n_groups"]
    # every below-k group holds between 1 and K-1 rows
    assert r["n_groups_below_k"] <= r["n_rows_below_k"]
    assert r["n_rows_below_k"] <= r["n_groups_below_k"] * (quality.K_ANON_K - 1)


def test_ks_drift_statistic_bounded_and_exact_vs_python(spark):
    """diag_ks_drift: D ∈ [0, 1] (bp in [0, 10000]) and the two-phase
    distributed ECDF must equal a single-process Python KS on the same
    cent-quantized values."""
    from conftest import SF_DIR

    from pyspark.sql import functions as F

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import quality

    r = quality.ks_drift(spark, SF_DIR).collect()[0]
    assert 0 <= r["ks_d_bp"] <= 10000
    assert r["ks_num"] <= r["n1"] * r["n2"]

    o = io.load_table(spark, SF_DIR, "orders").select(
        F.year("o_orderdate").alias("y"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("v"),
    )
    s1 = sorted(
        x["v"] for x in o.filter(F.col("y") == quality.KS_BASE_YEAR).collect()
    )
    s2 = sorted(
        x["v"] for x in o.filter(F.col("y") == quality.KS_CUR_YEAR).collect()
    )
    assert (len(s1), len(s2)) == (r["n1"], r["n2"])
    import bisect

    best = 0
    for v in sorted(set(s1) | set(s2)):
        c1 = bisect.bisect_right(s1, v)
        c2 = bisect.bisect_right(s2, v)
        best = max(best, abs(c1 * len(s2) - c2 * len(s1)))
    assert best == r["ks_num"]


def test_cramers_v_bounded_and_matches_textbook(spark):
    """diag_cramers_v: V ∈ [0, 1], and the per-cell-floored χ²/n must
    sit within one floor-step per cell of the textbook float value."""
    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import quality

    r = quality.cramers_v(spark, SF_DIR).collect()[0]
    assert 0 <= r["cramers_v_bp"] <= 10000

    rows = io.load_table(spark, SF_DIR, "orders").collect()
    from collections import Counter

    cells = Counter((x["o_orderpriority"], x["o_orderstatus"]) for x in rows)
    rt = Counter()
    ct = Counter()
    for (a, b), n in cells.items():
        rt[a] += n
        ct[b] += n
    n = sum(cells.values())
    chi2_over_n = sum(
        (obs * n - rt[a] * ct[b]) ** 2 / (n * rt[a] * ct[b]) / n
        for (a, b), obs in cells.items()
    )
    assert r["n"] == n
    assert r["n_row_cats"] == len(rt) and r["n_col_cats"] == len(ct)
    # per-cell ppm floors each lose < 1 ppm
    assert abs(r["chi2_over_n_ppm"] - chi2_over_n * 1_000_000) <= len(cells)


def test_functional_deps_keys_hold_and_fanout_coheres(spark):
    """diag_functional_deps: primary-key determinants must hold; any
    candidate with max_fanout 1 must hold and vice versa."""
    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark.operators import quality

    rows = {r["candidate"]: r for r in quality.functional_deps(spark, SF_DIR).collect()}
    assert len(rows) == len(quality.FD_CANDIDATES)
    for pk in (
        "orders: o_orderkey -> o_orderstatus",
        "customer: c_custkey -> c_mktsegment",
        "nation: n_nationkey -> n_regionkey",
    ):
        assert rows[pk]["holds"] == 1, pk
        assert rows[pk]["max_fanout"] == 1, pk
    for r in rows.values():
        assert (r["holds"] == 1) == (r["max_fanout"] == 1)
        assert (r["holds"] == 1) == (r["n_violating_keys"] == 0)
        assert r["n_violating_keys"] <= r["n_keys"]


def test_ohlc_candles_internally_consistent(spark):
    """ts_ohlc_resample: high ≥ max(open, close), low ≤ min(open,
    close), and the per-candle point counts sum to the event count."""
    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import timeseries as T

    rows = T.ohlc_resample(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["high_cents"] >= max(r["open_cents"], r["close_cents"])
        assert r["low_cents"] <= min(r["open_cents"], r["close_cents"])
        assert r["n_points"] >= 1
        assert r["volume_cents"] >= r["low_cents"] * r["n_points"]
    assert sum(r["n_points"] for r in rows) == io.load_table(
        spark, SF_DIR, "events"
    ).count()


def test_interval_union_bounds_and_python_twin(spark):
    """ts_interval_union_length: coverage is bounded by [window,
    n_events·window] per user and equals a single-process sweep."""
    from conftest import SF_DIR

    from pyspark.sql import functions as F

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import timeseries as T

    got = {r["user_id"]: r for r in T.interval_union_length(spark, SF_DIR).collect()}
    ev = (
        io.load_table(spark, SF_DIR, "events")
        .select("user_id", F.expr("ts_ns div 1000").alias("us"))
        .collect()
    )
    by_user = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r["us"])
    W = T.COVERAGE_WINDOW_S * 1_000_000
    assert set(got) == set(by_user)
    for u, starts in by_user.items():
        starts.sort()
        covered = 0
        islands = 0
        cur_s = cur_e = None
        for s in starts:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    covered += cur_e - cur_s
                cur_s, cur_e = s, s + W
                islands += 1
            else:
                cur_e = max(cur_e, s + W)
        covered += cur_e - cur_s
        r = got[u]
        assert r["n_events"] == len(starts)
        assert r["n_islands"] == islands
        assert r["covered_s"] == covered // 1_000_000
        assert T.COVERAGE_WINDOW_S <= r["covered_s"] <= len(starts) * T.COVERAGE_WINDOW_S


def test_leakage_safe_split_partitions_everything_deterministically(spark):
    """text_leakage_safe_split: the three splits partition the corpus,
    the content-key count never exceeds doc count, and re-running
    yields byte-identical assignments (hash-keyed, not random)."""
    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.llm_ops import curation

    rows = {r["split"]: r for r in curation.leakage_safe_split(spark, SF_DIR).collect()}
    n_docs = io.load_table(spark, SF_DIR, "documents").count()
    assert set(rows) <= {"train", "val", "test"}
    assert sum(r["n_docs"] for r in rows.values()) == n_docs
    for r in rows.values():
        assert r["n_contents"] <= r["n_docs"]
    assert rows["train"]["n_docs"] > rows["val"]["n_docs"]
    again = {r["split"]: r for r in curation.leakage_safe_split(spark, SF_DIR).collect()}
    assert {k: tuple(v) for k, v in rows.items()} == {
        k: tuple(v) for k, v in again.items()
    }


def test_local_clustering_coheres_with_global_census(spark):
    """graph_local_clustering: Σ per-vertex triangles = 3 × the global
    triangle count, cc ∈ [0, 10000] bp, and degree-1 vertices get 0."""
    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark.llm_ops import graph as G

    local = G.local_clustering(spark, SF_DIR).collect()
    assert local
    stats = G.triangle_stats(spark, SF_DIR).collect()[0]
    assert sum(r["n_triangles"] for r in local) == 3 * stats["n_triangles"]
    assert len(local) == stats["n_vertices"]
    for r in local:
        assert 0 <= r["local_cc_bp"] <= 10000
        if r["degree"] < 2:
            assert r["local_cc_bp"] == 0 and r["n_triangles"] == 0


def test_winsorized_stats_clip_semantics(spark):
    """agg_winsorized_stats: k = n·pct div 100, cuts are real segment
    values, and the winsorized mean sits within [low_cut-influenced,
    high_cut-influenced] bounds — cross-checked against Python."""
    from conftest import SF_DIR

    from pyspark.sql import functions as F

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import aggregates as A

    got = {r["seg"]: r for r in A.winsorized_stats(spark, SF_DIR).collect()}
    raw = (
        io.load_table(spark, SF_DIR, "customer")
        .select(
            F.col("c_mktsegment").alias("seg"),
            "c_custkey",
            F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("v"),
        )
        .collect()
    )
    by_seg = {}
    for r in raw:
        by_seg.setdefault(r["seg"], []).append((r["v"], r["c_custkey"]))
    assert set(got) == set(by_seg)
    for seg, vals in by_seg.items():
        vals.sort()
        n = len(vals)
        k = n * A.WINSOR_PCT // 100
        low_cut, high_cut = vals[k][0], vals[n - k - 1][0]
        wv = [max(min(v, high_cut), low_cut) for v, _ in vals]
        r = got[seg]
        assert r["n"] == n and r["k_clipped_per_tail"] == k
        assert r["low_cut_cents"] == low_cut
        assert r["high_cut_cents"] == high_cut
        # rank-clip == value-clip here because cuts are order statistics;
        # Spark `div` truncates toward zero, so mirror that exactly
        def trunc_div(a, b):
            q = abs(a) // b
            return q if a >= 0 else -q

        assert r["win_mean_cents"] == trunc_div(sum(wv), n)
        assert r["raw_mean_cents"] == trunc_div(sum(v for v, _ in vals), n)


def test_boilerplate_prefix_is_true_common_prefix(spark):
    """text_source_boilerplate_prefix: the reported LCP length equals
    the exact longest common prefix over ALL docs of the source (the
    min/max identity), and the emitted prefix is that prefix."""
    import os

    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.llm_ops import curation

    got = {
        r["source"]: r
        for r in curation.source_boilerplate_prefix(spark, SF_DIR).collect()
    }
    docs = io.load_table(spark, SF_DIR, "documents").select("source", "text").collect()
    by_src = {}
    for r in docs:
        by_src.setdefault(r["source"], []).append(r["text"] or "")
    assert set(got) == set(by_src)
    for src, texts in by_src.items():
        lcp = os.path.commonprefix(texts)
        r = got[src]
        assert r["n_docs"] == len(texts)
        assert r["lcp_len"] == len(lcp), src
        assert r["lcp_prefix_40"] == lcp[:40]


def test_topk_trending_ranks_and_counts(spark):
    """stream_topk_trending: ≤K rows per window with contiguous ranks
    from 1, counts descending within a window, and counts agreeing
    with the tumbling rollup."""
    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark.streaming import windows as SW

    rows = SW.topk_trending(spark, SF_DIR).collect()
    assert rows
    tumb = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in SW.tumbling_window_agg(spark, SF_DIR).collect()
    }
    by_w = {}
    for r in rows:
        by_w.setdefault(r["window_start"], []).append(r)
    for w, rs in by_w.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= SW.TRENDING_K
        counts = [r["n_events"] for r in rs]
        assert counts == sorted(counts, reverse=True)
        for r in rs:
            assert tumb[(w, r["event_type"])] == r["n_events"]
            assert r["delta_n"] == r["n_events"] - r["prev_n"]


def test_bootstrap_ci_orders_and_brackets(spark):
    """agg_bootstrap_ci: lo ≤ hi, the bracket sits inside the replica
    min/max spread, and the whole readout is re-run deterministic."""
    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark.operators import aggregates as A

    r = A.bootstrap_ci(spark, SF_DIR).collect()[0]
    assert r["n_replicas"] == A.BOOT_B
    assert r["boot_lo_cents"] <= r["boot_hi_cents"]
    assert r["boot_range_cents"] >= r["boot_hi_cents"] - r["boot_lo_cents"] >= 0
    assert r["point_mean_cents"] > 0
    # hash-keyed weights: byte-identical on re-run
    again = A.bootstrap_ci(spark, SF_DIR).collect()[0]
    assert tuple(r) == tuple(again)


def test_event_study_counts_cohere(spark):
    """ts_event_study: anchors-with-neighbors ≤ purchases, and the
    delta column is exactly post−pre of the integer means."""
    from conftest import SF_DIR

    from pyspark.sql import functions as F

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import timeseries as T

    r = T.event_study(spark, SF_DIR).collect()[0]
    n_purch = (
        io.load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert r["n_purchases"] == n_purch
    assert r["n_anchors_with_neighbors"] <= n_purch
    assert r["delta_cents"] == r["post_mean_cents"] - r["pre_mean_cents"]
    assert r["n_pre_events"] >= 0 and r["n_post_events"] >= 0


def test_byte_entropy_bounds_and_python_twin(spark):
    """mm_byte_entropy: entropy ∈ [0, 4e6] ppm (4 bits max over 16
    nibble bins), and the numpy path equals a pure-Python recompute."""
    import math
    from collections import Counter

    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.llm_ops import multimodal as M

    got = {r["doc_id"]: r for r in M.byte_entropy(spark, SF_DIR).collect()}
    docs = io.load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    assert set(got) == {r["doc_id"] for r in docs}
    for row in docs[:50]:
        data = (row["text"] or "").encode("utf-8")
        r = got[row["doc_id"]]
        assert r["n_bytes"] == len(data)
        counts = Counter(b >> 4 for b in data)
        exp = sum(
            math.floor(-(c / len(data)) * math.log2(c / len(data)) * 1_000_000)
            for c in counts.values()
        ) if data else 0
        assert r["entropy_ppm"] == exp
        assert 0 <= r["entropy_ppm"] <= 4_000_000
        assert r["high_entropy"] == (1 if exp > M.ENTROPY_FLAG_PPM else 0)


def test_weighted_median_is_true_crossing_value(spark):
    """agg_weighted_median: equals the pure-Python lower weighted
    median, is a real data value, and degrades to the plain median when
    all weights are equal."""
    from conftest import SF_DIR

    from pyspark.sql import functions as F

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import aggregates as A

    got = {r["flag"]: r for r in A.weighted_median(spark, SF_DIR).collect()}
    raw = (
        io.load_table(spark, SF_DIR, "lineitem")
        .select(
            F.col("l_returnflag").alias("flag"),
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("v"),
            F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("w"),
            "l_orderkey",
            "l_linenumber",
        )
        .collect()
    )
    by_flag = {}
    for r in raw:
        by_flag.setdefault(r["flag"], []).append(
            (r["v"], r["l_orderkey"], r["l_linenumber"], r["w"])
        )
    assert set(got) == set(by_flag)
    for flag, rows in by_flag.items():
        rows.sort()
        tw = sum(w for *_, w in rows)
        cw = 0
        med = None
        for v, _, _, w in rows:
            cw += w
            if cw * 2 >= tw:
                med = v
                break
        assert got[flag]["weighted_median_cents"] == med, flag
        assert got[flag]["total_weight"] == tw
        assert med in {v for v, *_ in rows}  # a real value, not interpolated


def test_interval_bucketed_join_equals_plain_range_join(spark):
    """join_interval_bucketed: the bucket-replicated equi-join must
    produce exactly the pairs of the naive range predicate."""
    from conftest import SF_DIR

    from pyspark.sql import functions as F

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import joins as J

    got = {r["event_type"]: r for r in J.interval_bucketed_join(spark, SF_DIR).collect()}
    ev = io.load_table(spark, SF_DIR, "events").select(
        "event_type",
        "event_id",
        F.col("user_id").alias("ck"),
        F.expr("datediff(to_date(ts), DATE '1970-01-01')").alias("d_day"),
    )
    od = io.load_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("ck2"),
        F.expr("datediff(to_date(o_orderdate), DATE '1970-01-01')").alias("o_day"),
    )
    naive = (
        ev.join(
            od,
            (F.col("ck") == F.col("ck2"))
            & (F.abs(F.col("d_day") - F.col("o_day")) <= J.INTERVAL_BUCKET_DAYS),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("event_id").alias("n_events_matched"),
            F.countDistinct("o_orderkey").alias("n_orders_matched"),
        )
        .collect()
    )
    assert {r["event_type"]: (r["n_pairs"], r["n_events_matched"], r["n_orders_matched"]) for r in naive} == {
        k: (v["n_pairs"], v["n_events_matched"], v["n_orders_matched"])
        for k, v in got.items()
    }


def test_edge_support_histogram_coheres_with_census(spark):
    """graph_edge_support: Σ(support·n_edges) = 3 × triangles (each
    triangle supports its three edges once) and Σ n_edges = |E|."""
    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark.llm_ops import graph as G

    hist = G.edge_support_histogram(spark, SF_DIR).collect()
    stats = G.triangle_stats(spark, SF_DIR).collect()[0]
    assert sum(r["support"] * r["n_edges"] for r in hist) == 3 * stats["n_triangles"]
    assert sum(r["n_edges"] for r in hist) == stats["n_edges"]
    assert all(r["support"] >= 0 and r["n_edges"] > 0 for r in hist)


def test_duplicate_rows_audit_consistent(spark):
    """diag_duplicate_rows: distinct ≤ rows, excess arithmetic exact,
    and the generated fixtures carry no full-row duplicates."""
    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark.operators import quality

    rows = quality.duplicate_rows(spark, SF_DIR).collect()
    assert {r["tbl"] for r in rows} == set(quality.DUP_AUDIT_TABLES)
    for r in rows:
        assert r["n_distinct"] <= r["n_rows"]
        assert r["n_dup_excess"] == r["n_rows"] - r["n_distinct"]
        assert r["dup_excess_bp"] == r["n_dup_excess"] * 10000 // r["n_rows"]


def test_gateway_correlated_is_decorrelated(spark):
    """sql_gateway_correlated: Catalyst must rewrite all three
    correlated subqueries into joins — the executed plan contains no
    nested-loop fallback, and the result agrees with a hand-built
    window/join equivalent."""
    from conftest import SF_DIR

    from pyspark.sql import functions as F

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import relational as R

    df = R.sql_gateway_correlated(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    got = {r["o_orderpriority"]: (r["n_above_avg"], r["rev_cents"]) for r in df.collect()}

    o = io.load_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    per_cust = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("cents").alias("s")
    )
    returned = (
        io.load_table(spark, SF_DIR, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .distinct()
    )
    manual = (
        o.join(per_cust, "o_custkey")
        .filter(F.col("cents") * F.col("cnt") > F.col("s"))
        .join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("rev"))
        .collect()
    )
    assert {r["o_orderpriority"]: (r["n"], r["rev"]) for r in manual} == got


def test_entity_resolution_partition_and_edge_consistency(spark):
    """join_entity_resolution: entities partition the supplier set,
    every entity id is its own minimum member, and every fuzzy edge's
    endpoints share an entity."""
    from conftest import SF_DIR

    from pyspark.sql import functions as F

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import joins as J

    ents = J.entity_resolution(spark, SF_DIR).collect()
    n_sup = io.load_table(spark, SF_DIR, "supplier").count()
    assert sum(r["n_members"] for r in ents) == n_sup
    for r in ents:
        # entity_id is the min member key: with n members summing to
        # member_key_sum, the min is at most the mean
        assert r["entity_id"] * r["n_members"] <= r["member_key_sum"]
    # recompute the fuzzy edges and assert endpoint co-membership
    s = io.load_table(spark, SF_DIR, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    rows = s.collect()
    import itertools

    by_nation = {}
    for r in rows:
        by_nation.setdefault(r["s_nationkey"], []).append(r)

    def lev(a, b):
        import numpy as np

        d = np.arange(len(b) + 1)
        for i, ca in enumerate(a, 1):
            prev = d.copy()
            d[0] = i
            for j, cb in enumerate(b, 1):
                d[j] = min(prev[j] + 1, d[j - 1] + 1, prev[j - 1] + (ca != cb))
        return int(d[-1])

    # rebuild membership map from the Spark result via a second run of
    # the label relation: entity ids are min member keys, so co-member
    # test = same entity via a union-find over the same edges
    parent = {r["s_suppkey"]: r["s_suppkey"] for r in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    n_edges = 0
    for grp in by_nation.values():
        for x, y in itertools.combinations(grp, 2):
            if lev(x["s_name"], y["s_name"]) <= J.FUZZY_MAX_DIST:
                n_edges += 1
                rx, ry = find(x["s_suppkey"]), find(y["s_suppkey"])
                if rx != ry:
                    parent[max(rx, ry)] = min(rx, ry)
    comp = {}
    for k in parent:
        comp.setdefault(find(k), []).append(k)
    want = sorted(
        (root, len(ms), sum(ms)) for root, ms in comp.items()
    )
    got = sorted((r["entity_id"], r["n_members"], r["member_key_sum"]) for r in ents)
    assert got == want


def test_ivm_delta_join_merge_equals_recompute(spark):
    """layout_ivm_delta_join: staged-MV + delta maintenance must equal
    the full recompute, and the delta batch must be non-empty (the
    test would be vacuous otherwise)."""
    from conftest import SF_DIR

    from pyspark.sql import functions as F

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import layout as L

    got = {r["seg"]: (r["n_orders"], r["rev_cents"]) for r in L.ivm_delta_join_read(spark, SF_DIR).collect()}
    o = io.load_table(spark, SF_DIR, "orders")
    assert o.filter(F.col("o_orderkey") % L.IVM_DELTA_MOD == 0).count() > 0
    c = io.load_table(spark, SF_DIR, "customer")
    full = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("rev"),
        )
        .collect()
    )
    assert {r["seg"]: (r["n"], r["rev"]) for r in full} == got


def test_ks_drift_one_sided_inputs_emit_zero_rows(spark, tmp_path):
    """diag_ks_drift degenerate contract (review fix): when either
    year's sample is empty, BOTH the Spark plan and the oracle emit
    zero rows — a fabricated summary row on one side would break the
    driver's hash compare."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from seamless_sharepoint_etl_spark.operators import quality

    d = str(tmp_path)
    t = pa.table(
        {
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_custkey": pa.array([1, 1], pa.int64()),
            "o_orderstatus": ["O", "F"],
            "o_totalprice": [10.0, 20.0],
            "o_orderdate": pa.array(
                pd.to_datetime(["1995-01-01", "1995-06-01"]), pa.timestamp("ms")
            ),
            "o_orderpriority": ["1-URGENT", "1-URGENT"],
        }
    )
    pq.write_table(t, f"{d}/orders.parquet")
    assert quality.ks_drift(spark, d).count() == 0
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{d}/orders.parquet'")
    assert len(con.sql(quality.KS_DRIFT_SQL).fetchall()) == 0
    con.close()


def test_source_overlap_symmetric_bounds(spark):
    """text_source_overlap: Jaccard ∈ [0, 10000] bp, shared ≤ min(nₐ,
    n_b), every pair ordered src_a < src_b exactly once, and totals
    agree with the per-source distinct-shingle counts."""
    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark.llm_ops import curation, dedup

    rows = curation.source_overlap(spark, SF_DIR).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["src_a"] < r["src_b"]
        assert (r["src_a"], r["src_b"]) not in seen
        seen.add((r["src_a"], r["src_b"]))
        assert 0 < r["n_shared"] <= min(r["n_a"], r["n_b"])
        assert 0 <= r["jaccard_bp"] <= 10000
        assert r["jaccard_bp"] == r["n_shared"] * 10000 // (
            r["n_a"] + r["n_b"] - r["n_shared"]
        )
    # n_a is consistent across every row mentioning that source
    per_src = {}
    for r in rows:
        for s, n in ((r["src_a"], r["n_a"]), (r["src_b"], r["n_b"])):
            assert per_src.setdefault(s, n) == n


def _daily_cents(spark, sf):
    from pyspark.sql import functions as F

    from seamless_sharepoint_etl_spark import io

    rows = (
        io.load_table(spark, sf, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ).alias("x")
        )
        .collect()
    )
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append((r["d"], r["x"]))
    for v in by_type.values():
        v.sort()
    return by_type


def test_bollinger_breakouts_match_python_sweep(spark):
    """ts_bollinger_breakouts: the flagged set equals a pure-Python
    trailing-window sweep with the identical integer test."""
    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark.operators import timeseries as T

    got = {
        (r["event_type"], r["d"]): (r["day_cents"], r["band_mean_cents"])
        for r in T.bollinger_breakouts(spark, SF_DIR).collect()
    }
    want = {}
    W = T.BOLL_WINDOW
    for t, series in _daily_cents(spark, SF_DIR).items():
        xs = [x for _, x in series]
        for i in range(W - 1, len(series)):
            frame = xs[i - W + 1 : i + 1]
            n, s, s2 = len(frame), sum(frame), sum(v * v for v in frame)
            x = xs[i]
            if (x * n - s) ** 2 > 4 * (n * s2 - s * s):
                q = abs(s) // n
                want[(t, series[i][0])] = (x, q if s >= 0 else -q)
    assert got == want


def test_seasonal_residual_anomalies_match_python(spark):
    """ts_seasonal_residual_anomalies: flags equal a Python recompute
    of the DOW-deseasonalized 2.5σ test (double-from-exact-ints, the
    same arithmetic as both engines)."""
    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark.operators import timeseries as T

    got = {
        (r["event_type"], r["d"]): r["residual_cents"]
        for r in T.seasonal_residual_anomalies(spark, SF_DIR).collect()
    }
    want = {}
    for t, series in _daily_cents(spark, SF_DIR).items():
        by_dow = {}
        for d, x in series:
            by_dow.setdefault(d.isoweekday(), []).append(x)
        dow_mean = {
            k: (abs(sum(v)) // len(v) if sum(v) >= 0 else -(abs(sum(v)) // len(v)))
            for k, v in by_dow.items()
        }
        rs = [(d, x, x - dow_mean[d.isoweekday()]) for d, x in series]
        n = len(rs)
        sr = sum(r for _, _, r in rs)
        sr2 = sum(r * r for _, _, r in rs)
        for d, x, r in rs:
            if 4 * float(r * n - sr) * float(r * n - sr) > 25 * float(
                n * sr2 - sr * sr
            ):
                want[(t, d)] = r
    assert got == want


def test_time_to_convert_histogram_matches_python(spark):
    """win_time_to_convert: the latency histogram equals a pure-Python
    first-view → first-later-purchase sweep; buckets non-negative."""
    from conftest import SF_DIR

    from collections import Counter

    from pyspark.sql import functions as F

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import windows as W

    got = {
        r["ttc_hours"]: r["n_users"]
        for r in W.time_to_convert(spark, SF_DIR).collect()
    }
    ev = (
        io.load_table(spark, SF_DIR, "events")
        .select("user_id", "event_type", F.expr("ts_ns div 1000").alias("us"))
        .collect()
    )
    by_user = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append((r["event_type"], r["us"]))
    want = Counter()
    for evs in by_user.values():
        views = [us for t, us in evs if t == "view"]
        if not views:
            continue
        v0 = min(views)
        purch = [us for t, us in evs if t == "purchase" and us > v0]
        if not purch:
            continue
        want[(min(purch) - v0) // 3_600_000_000] += 1
    assert got == dict(want)
    assert all(k >= 0 for k in got)


def test_brand_movers_ranks_are_permutations(spark):
    """agg_brand_movers: both rank columns are 1..n permutations
    consistent with revenue order, and delta/growth arithmetic holds."""
    from conftest import SF_DIR

    from seamless_sharepoint_etl_spark.operators import aggregates as A

    rows = A.brand_movers(spark, SF_DIR).collect()
    n = len(rows)
    assert sorted(r["rank1"] for r in rows) == list(range(1, n + 1))
    assert sorted(r["rank2"] for r in rows) == list(range(1, n + 1))
    by_rank1 = sorted(rows, key=lambda r: r["rank1"])
    assert [r["rev1_cents"] for r in by_rank1] == sorted(
        (r["rev1_cents"] for r in rows), reverse=True
    )
    for r in rows:
        assert r["delta_cents"] == r["rev2_cents"] - r["rev1_cents"]
        assert r["rank_gain"] == r["rank1"] - r["rank2"]
        if r["rev1_cents"] > 0:
            q = abs(r["delta_cents"]) * 10000 // r["rev1_cents"]
            assert r["growth_bp"] == (q if r["delta_cents"] >= 0 else -q)


def test_l_diversity_consistent_with_k_anonymity(spark):
    """diag_l_diversity: counters cohere with the sibling audit — the
    customer row total matches diag_k_anonymity's, l is between 1 and
    the number of market segments, and below-l tallies are bounded by
    the group count / row total."""
    from seamless_sharepoint_etl_spark.operators import quality

    ld = quality.l_diversity(spark, SF).collect()[0]
    ka = quality.k_anonymity(spark, SF).collect()[0]
    assert ld["n_rows"] == ka["n_rows"]
    assert 1 <= ld["l_diversity"] <= 5
    assert 0 <= ld["n_groups_below_l"] <= ld["n_groups"]
    assert 0 <= ld["n_rows_below_l"] <= ld["n_rows"]
    # coarser QI (one column fewer) can only merge groups
    assert ld["n_groups"] <= ka["n_groups"]


def test_target_encoding_loo_identity(spark):
    """agg_target_encoding: replaying the leave-one-out definition on
    the collected rows must reproduce every encoding exactly — and no
    row's feature may depend on its own target (shifting one row's
    price changes that row's target but not its own encoding formula
    applied to the others' sum)."""
    from collections import defaultdict

    from seamless_sharepoint_etl_spark.operators import aggregates

    rows = aggregates.target_encoding(spark, SF).collect()
    seg_sum = defaultdict(int)
    seg_n = defaultdict(int)
    for r in rows:
        seg_sum[r["segment"]] += r["price_cents"]
        seg_n[r["segment"]] += 1
    for r in rows:
        s, n = seg_sum[r["segment"]], seg_n[r["segment"]]
        expect = (100 * (s - r["price_cents"])) // (n - 1) if n > 1 else None
        assert r["loo_enc_cc"] == expect


def test_mutual_information_close_to_float_mi(spark):
    """diag_mutual_information: the fixed-point-log MI must sit within
    a milli-bit of the float64 textbook MI (the fxlog2 truncation bias
    is ≲ 2^-10 bits per cell), and must be non-negative."""
    import math
    from collections import Counter

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import quality

    r = quality.mutual_information(spark, SF).collect()[0]
    rows = (
        io.load_table(spark, SF, "orders")
        .select("o_orderpriority", "o_orderstatus")
        .collect()
    )
    n = len(rows)
    cxy = Counter((x, y) for x, y in rows)
    cx = Counter(x for x, _ in rows)
    cy = Counter(y for _, y in rows)
    mi = sum(
        (c / n) * math.log2(c * n / (cx[x] * cy[y])) for (x, y), c in cxy.items()
    )
    assert r["n_rows"] == n
    assert r["n_cells"] == len(cxy)
    assert r["mi_micro_bits"] >= 0
    assert abs(r["mi_micro_bits"] / 1_000_000 - mi) < 1e-3


def test_purged_split_partitions_and_monotone(spark):
    """ts_purged_walkforward_split: every fold's four parts partition
    the order table exactly; train size strictly grows with the fold
    index (expanding window); the embargo is bounded by one month of
    rows; and a Python replay of the month arithmetic agrees."""
    from collections import Counter

    from seamless_sharepoint_etl_spark import io
    from seamless_sharepoint_etl_spark.operators import timeseries as ts

    folds = {r["fold"]: r for r in ts.purged_walkforward_split(spark, SF).collect()}
    months = [
        r["o_orderdate"].year * 12 + r["o_orderdate"].month - 1
        for r in io.load_table(spark, SF, "orders").select("o_orderdate").collect()
    ]
    n = len(months)
    m0 = min(months)
    span = 12 * ts._PURGED_YEARS_PER_FOLD
    for k, r in folds.items():
        assert r["n_train"] + r["n_embargo"] + r["n_test"] + r["n_future"] == n
        parts = Counter()
        for m in months:
            if m < m0 + (k + 1) * span - ts.PURGED_EMBARGO_MONTHS:
                parts["train"] += 1
            elif m < m0 + (k + 1) * span:
                parts["embargo"] += 1
            elif m < m0 + (k + 2) * span:
                parts["test"] += 1
            else:
                parts["future"] += 1
        assert r["n_train"] == parts["train"]
        assert r["n_embargo"] == parts["embargo"]
        assert r["n_test"] == parts["test"]
        assert r["n_future"] == parts["future"]
    sizes = [folds[k]["n_train"] for k in sorted(folds)]
    assert sizes == sorted(sizes)
    assert sizes[0] < sizes[-1]


def test_mutual_information_raises_past_fxlog2_domain(spark, monkeypatch):
    """Past max(n_xy)*N >= 2^43 Spark's non-ANSI BIGINT multiplication
    would WRAP silently (wrong MI) while the DuckDB oracle raises — the
    guard must fail loudly first (round-5 advice). Exercised by
    shrinking the module bound rather than materializing 3M rows, so
    the production collect-and-check path itself is what trips."""
    import pytest

    from seamless_sharepoint_etl_spark.operators import quality

    monkeypatch.setattr(quality, "_FXLOG2_DOMAIN_BOUND", 1)
    with pytest.raises(ValueError, match="fxlog2"):
        quality.mutual_information(spark, SF)
    monkeypatch.undo()
    # in-domain data still runs clean through the same path
    assert quality.mutual_information(spark, SF).count() == 1
