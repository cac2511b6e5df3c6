"""Reference-parity pipelines: incremental watermark ETL + $1500 routing.

These re-express the *entire* dataflow of the reference scripts
(SURVEY.md §2 Tier A, A1-A12) as single lazy Spark DAGs:

  flagship (A1-A11):  sink-max watermark → strict-`>` source filter
                      (pushed to the scan by Catalyst) → name-resolved
                      projection → ascending sort → append-shaped result
                      with an `observe` row count.
  routing  (A12):     one parameterized job splitting on the $1500
                      threshold instead of three deployed script copies.

Scale posture: the watermark is an aggregate (`max`), never a "last
row" readback (the reference re-reads its whole sink to look at one
cell — bin/copy-seamless-to-sharepoint.rb:63-66, and its `:52` TODO
admits the ordering workaround is broken). `max` is a partial-agg +
single-row exchange at any scale. The `>` filter is a plain comparison
Catalyst pushes into the parquet scan, so the incremental pass reads
only matching row groups via min/max stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import io

# Display-name → position contract at the sink (positional schema, the
# reference's Excel-table shape: bin/copy-seamless-to-sharepoint.rb:97-104).
SINK_COLUMNS = ("vendor", "description", "picker", "charge_code", "po_number")


def incremental_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A11: rows of `seamless_items` strictly beyond the sink watermark.

    The watermark is max(po_number) of the already-loaded sink table —
    a fixed-width zero-padded string key, so lexicographic `>` equals
    numeric `>` (the reference's string-compare trap, SURVEY.md §7.3#1).
    """
    items = io.seamless_items(spark, sf_dir)

    # A2 as an explicit aggregate: 1-row DataFrame, broadcast into the
    # filter join (no .collect(); the frontier never touches the driver).
    # Computed from a pure orders scan — max(po_number) of the sink view
    # equals format(max orderkey ≤ the 60% frontier), and po_number is a
    # function of o_orderkey alone, so the sink's customer join would be
    # dead weight here (Catalyst can't prove it away because the right
    # side isn't known unique). Scan 13 in .explain reads one column.
    orders = io.load_table(spark, sf_dir, "orders")
    frontier0 = orders.agg(
        F.floor(F.max("o_orderkey") * F.lit(0.6)).cast("long").alias("k0")
    )
    watermark = (
        orders.join(F.broadcast(frontier0), F.col("o_orderkey") <= F.col("k0"), "left_semi")
        .agg(F.format_string(io.PO_FORMAT, F.max("o_orderkey")).alias("wm"))
    )

    fresh = (
        items.join(F.broadcast(watermark), items.po_number > F.col("wm"), "left_semi")
        # A6-A8: name-resolved, canonically ordered projection (the
        # positional sink contract — schema IS the column order).
        .select(*SINK_COLUMNS)
        # A5: ascending sort on the watermark key (range-partitioned
        # global sort; cosmetic for the hash check, semantic for parity).
        .orderBy(F.asc("po_number"))
        # A9: row-count observability without a second job.
        .observe("incremental_load", F.count(F.lit(1)).alias("rows_loaded"))
    )
    return fresh


INCREMENTAL_LOAD_SQL = f"""
WITH items AS ({io.SEAMLESS_ITEMS_SQL}),
sink AS ({io.SHAREPOINT_ROWS_SQL}),
wm AS (SELECT max(po_number) AS wm FROM sink)
SELECT vendor, description, picker, charge_code, po_number
FROM items WHERE po_number > (SELECT wm FROM wm)
"""


def routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: the $1500 value-split as one job — a `route` column instead of
    three deployed script instances writing to two sink tables."""
    items = io.seamless_items(spark, sf_dir)
    return items.select(
        "po_number",
        "vendor",
        "charge_code",
        F.round("amount", 2).alias("amount"),
        F.when(F.col("amount") >= 1500.0, F.lit("over_1500"))
        .otherwise(F.lit("under_1500"))
        .alias("route"),
    )


ROUTED_SQL = f"""
WITH items AS ({io.SEAMLESS_ITEMS_SQL})
SELECT po_number, vendor, charge_code, round(amount, 2) AS amount,
       CASE WHEN amount >= 1500.0 THEN 'over_1500' ELSE 'under_1500' END AS route
FROM items
"""


def write_routed(spark: SparkSession, sf_dir: str, out_dir: str) -> dict[str, int]:
    """Materialize the A12 split to two append sinks (partitioned write).

    ``partitionBy('route')`` makes the split a *single* pass — one scan,
    one write, two physical table directories — instead of two filtered
    jobs scanning the source twice. At 100 TB this halves the read.
    """
    df = routed(spark, sf_dir)
    (
        df.write.mode("append")
        .partitionBy("route")
        .parquet(out_dir)
    )
    counts = {
        r["route"]: r["n"]
        for r in df.groupBy("route").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    return counts


def run_incremental_append(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> int:
    """Flagship load → TRANSACTIONAL exactly-once append (A10/A11).

    SURVEY.md §7.3#5 closed: the batch lands through the manifest-
    commit sink (``sinks.commit_append``) keyed by the batch frontier
    as the transaction id. A crash between the data write and the
    manifest flip leaves the sink logically unchanged (readers resolve
    files through the committed manifest only), and a re-run of the
    same frontier is a no-op instead of a duplicate — strictly stronger
    than round 2's key-range overwrite, which was idempotent but not
    atomic against concurrent readers.
    """
    from . import sinks

    fresh = incremental_load(spark, sf_dir)
    lo = fresh.agg(F.min("po_number").alias("lo")).first()["lo"]
    if lo is None:
        return 0
    sinks.commit_append(fresh, out_dir, txn_id=f"batch_from_{lo}")
    snap = sinks.read_snapshot(spark, out_dir)
    return snap.count() if snap is not None else 0
