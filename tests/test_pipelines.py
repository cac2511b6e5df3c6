"""Reference-parity semantics of the incremental ETL (SURVEY.md §2 A1-A11)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR


def test_watermark_frontier_strictness(spark):
    """Every loaded row is strictly beyond the sink watermark (A4/A11)."""
    from seamless_sharepoint_etl_spark import io, pipelines

    sink = io.sharepoint_rows(spark, SF_DIR)
    wm = sink.agg(F.max("po_number")).first()[0]
    fresh = pipelines.incremental_load(spark, SF_DIR)
    assert fresh.filter(F.col("po_number") <= wm).count() == 0
    # union of sink + fresh covers the whole source exactly once
    items_n = io.seamless_items(spark, SF_DIR).count()
    assert sink.count() + fresh.count() == items_n


def test_rerun_idempotence(spark, tmp_path):
    """Re-running the same frontier does not duplicate rows (A11, §7.3#5)."""
    from seamless_sharepoint_etl_spark import pipelines

    out = str(tmp_path / "sink")
    n1 = pipelines.run_incremental_append(spark, SF_DIR, out)
    n2 = pipelines.run_incremental_append(spark, SF_DIR, out)
    assert n1 == n2
    assert spark.read.parquet(f"{out}/batch_from=*").count() == n1


def test_routing_split_covers_everything(spark):
    """A12: the two routes partition the source exactly."""
    from seamless_sharepoint_etl_spark import io, pipelines

    routed = pipelines.routed(spark, SF_DIR)
    total = io.seamless_items(spark, SF_DIR).count()
    by_route = dict(
        routed.groupBy("route").count().rdd.map(lambda r: (r[0], r[1])).collect()
    )
    assert sum(by_route.values()) == total
    assert set(by_route) <= {"over_1500", "under_1500"}


def test_routed_write_single_pass(spark, tmp_path):
    from seamless_sharepoint_etl_spark import pipelines

    out = str(tmp_path / "routed")
    counts = pipelines.write_routed(spark, SF_DIR, out)
    written = spark.read.parquet(out)
    assert written.count() == sum(counts.values())
    assert set(r["route"] for r in written.select("route").distinct().collect()) == set(
        counts
    )


def test_routed_write_partition_pruning(spark, tmp_path):
    """The $1500 split written with partitionBy(route) prunes at read:
    a route predicate becomes a PartitionFilter (directory skip), never
    a data filter — the physical evidence that the A12 split scales."""
    from seamless_sharepoint_etl_spark import pipelines

    out = str(tmp_path / "routed")
    counts = pipelines.write_routed(spark, SF_DIR, out)
    assert set(counts) == {"over_1500", "under_1500"}

    back = spark.read.parquet(out).filter("route = 'over_1500'")
    assert back.count() == counts["over_1500"]
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(route" in plan, plan
    # the route predicate must NOT appear as a pushed data filter —
    # it's resolved at directory level
    assert "PushedFilters: []" in plan, plan
