"""Data-layout operators: space-filling-curve clustering statistics.

Provenance: SURVEY.md §2 Tier B scale posture (no reference counterpart
— the reference copies rows in arrival order). At 100 TB the dominant
scan cost is files touched, and multi-dimensional data skipping needs
rows co-located along EVERY filtered dimension at once. Z-ordering
(interleaving the bits of the dimension keys, then range-partitioning
by the interleaved value) is the standard answer — what Delta's
OPTIMIZE ZORDER BY and Iceberg's sort-order rewrite do before writing
files.

``layout_zorder_stats`` computes the 32-bit Morton code of
(customer, order-day), buckets rows by its high bits — one bucket ≈ one
file — and reports each bucket's min/max per dimension: exactly the
footer statistics a reader would prune against. Tight per-bucket spans
on BOTH dimensions are the proof the layout works; a single-dimension
sort gives tight spans on one and full-range spans on the other.

Everything is integer bit arithmetic — embarrassingly parallel, one
shuffle on the bucket key, bit-identical across engines.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import io

ZORDER_EPOCH = "1992-01-01"  # fixture o_orderdate range starts here
ZBITS = 16  # bits kept per dimension
ZBUCKET_SHIFT = 24  # z >> 24 → 256 buckets over the 32-bit curve (≈ files)


def _morton(x, y):
    """Interleave the low ZBITS bits of two non-negative longs
    (y takes even bit positions, x odd)."""
    terms = []
    for i in range(ZBITS):
        terms.append(
            F.shiftright(x, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
        )
        terms.append(
            F.shiftright(y, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        )
    return reduce(lambda a, b: a + b, terms).cast("long")


def zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-z-bucket row counts and per-dimension min/max spans for the
    (o_custkey, order-day) Morton layout of `orders` — the file-footer
    statistics a z-ordered write would produce, and the evidence any
    layout job is judged on: bounded spans in BOTH dimensions.

    Dimensions are scaled to fill the ZBITS space from a 1-row bounds
    aggregate (broadcast — same shape as the flagship's watermark
    frontier), so the curve is dense at every data scale; raw keys
    would leave the high bits zero and collapse the bucket count.
    """
    o = io.load_table(spark, sf_dir, "orders")
    raw = o.select(
        F.col("o_custkey").cast("long").alias("ck"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.to_date(F.lit(ZORDER_EPOCH))
        )
        .cast("long")
        .alias("day"),
    )
    bounds = raw.agg(
        F.max("ck").alias("ck_max"), F.max("day").alias("day_max")
    )
    scaled = raw.crossJoin(F.broadcast(bounds)).select(
        "ck",
        "day",
        F.expr(f"(ck * {(1 << ZBITS) - 1}) div greatest(ck_max, 1)").alias("sx"),
        F.expr(f"(day * {(1 << ZBITS) - 1}) div greatest(day_max, 1)").alias("sy"),
    )
    z = _morton(F.col("sx"), F.col("sy"))
    return (
        scaled.select(
            "ck", "day", F.shiftright(z, ZBUCKET_SHIFT).alias("zbucket")
        )
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("ck").alias("min_ck"),
            F.max("ck").alias("max_ck"),
            F.min("day").alias("min_day"),
            F.max("day").alias("max_day"),
        )
    )


def _morton_sql(x: str, y: str) -> str:
    terms = []
    for i in range(ZBITS):
        terms.append(f"((({x}) >> {i}) & 1) * {1 << (2 * i + 1)}")
        terms.append(f"((({y}) >> {i}) & 1) * {1 << (2 * i)}")
    return " + ".join(terms)


ZORDER_STATS_SQL = f"""
WITH raw AS (
  SELECT CAST(o_custkey AS BIGINT) AS ck,
         CAST(datediff('day', DATE '{ZORDER_EPOCH}', CAST(o_orderdate AS DATE)) AS BIGINT) AS day
  FROM orders
),
bounds AS (SELECT max(ck) AS ck_max, max(day) AS day_max FROM raw),
scaled AS (
  SELECT ck, day,
         (ck * {(1 << ZBITS) - 1}) // greatest(ck_max, 1) AS sx,
         (day * {(1 << ZBITS) - 1}) // greatest(day_max, 1) AS sy
  FROM raw, bounds
),
m AS (
  SELECT ck, day, ({_morton_sql("sx", "sy")}) >> {ZBUCKET_SHIFT} AS zbucket
  FROM scaled
)
SELECT zbucket, count(*) AS n_rows,
       min(ck) AS min_ck, max(ck) AS max_ck,
       min(day) AS min_day, max(day) AS max_day
FROM m
GROUP BY zbucket
"""


HB_BITS = 8  # Hilbert grid: 256×256 cells, index 0..65535
HB_BLOCK_CELLS = 256  # cells per locality block (= one "file")


def _hilbert_steps(nbits: int = HB_BITS) -> list[tuple[str, str]]:
    """Sequential (column, expression) pairs computing the Hilbert
    index ``hidx`` of non-negative integer columns ``x``/``y`` in
    [0, 2^nbits) — the textbook xy2d unrolled: per level s, extract
    the quadrant pair (rx, ry), accumulate s²·gray(rx,ry) (the XOR
    written as arithmetic since rx,ry ∈ {0,1}), then flip+swap the
    frame when ry = 0. Only &, *, -, +, CASE — one expression text
    serves BOTH engines (the fxlog2_steps pattern), so the index is
    bit-identical by construction. Verified exhaustively against a
    sequential Python xy2d on all 65536 grid points, plus the curve
    properties (bijection, unit-Manhattan adjacency) in pytest."""
    steps: list[tuple[str, str]] = [
        ("hx0", "x"),
        ("hy0", "y"),
        ("hd0", "CAST(0 AS BIGINT)"),
    ]
    for i in range(nbits):
        s = 1 << (nbits - 1 - i)
        steps.append(
            (f"rx{i}", f"CASE WHEN (hx{i} & {s}) > 0 THEN 1 ELSE 0 END")
        )
        steps.append(
            (f"ry{i}", f"CASE WHEN (hy{i} & {s}) > 0 THEN 1 ELSE 0 END")
        )
        steps.append(
            (
                f"hd{i + 1}",
                f"hd{i} + {s * s} *"
                f" (CASE WHEN rx{i} = 1 THEN 3 - ry{i} ELSE ry{i} END)",
            )
        )
        steps.append(
            (
                f"hx{i + 1}",
                f"CASE WHEN ry{i} = 1 THEN hx{i}"
                f" WHEN rx{i} = 1 THEN {s} - 1 - hy{i}"
                f" ELSE hy{i} END",
            )
        )
        steps.append(
            (
                f"hy{i + 1}",
                f"CASE WHEN ry{i} = 1 THEN hy{i}"
                f" WHEN rx{i} = 1 THEN {s} - 1 - hx{i}"
                f" ELSE hx{i} END",
            )
        )
    steps.append(("hidx", f"CAST(hd{nbits} AS BIGINT)"))
    return steps


def _morton8_sql(x: str, y: str) -> str:
    """8-bit Morton interleave via pure arithmetic (no shifts — Spark
    SQL's parser lacks >>), identical text for both engines."""
    terms = []
    for i in range(HB_BITS):
        p = 1 << i
        terms.append(f"((({x}) & {p}) * {1 << (i + 1)})")
        terms.append(f"((({y}) & {p}) * {1 << i})")
    return "(" + " + ".join(terms) + ")"


def hilbert_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout-curve shootout: order the (custkey, order-day) grid by
    the HILBERT index vs the Z-ORDER (Morton) index and measure
    locality — the average Manhattan distance between consecutive
    points within each 256-cell block (≈ one file). Hilbert's defining
    property (consecutive indexes are unit-adjacent cells) makes its
    clustering strictly tighter than Z's quadrant jumps; this query
    quantifies by how much on the real data, which is exactly the
    evidence a table-layout decision needs before an expensive
    rewrite.

    Exactness: the Hilbert chain (_hilbert_steps) and the Morton
    interleave are shared expression TEXT across engines — pure
    integer &/*/CASE arithmetic, bit-identical by construction.
    Locality sums are windowed lags PARTITIONED by curve block (never
    a global-sort window), with a deterministic (idx, ck, day) order;
    equal keys are identical grid cells, so their pair distance is 0
    regardless of tie order. At 100 TB both windows shuffle once on
    their block key; everything else is per-row arithmetic."""
    o = io.load_table(spark, sf_dir, "orders")
    raw = o.select(
        F.col("o_custkey").cast("long").alias("ck"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.to_date(F.lit(ZORDER_EPOCH))
        )
        .cast("long")
        .alias("day"),
    )
    bounds = raw.agg(
        F.max("ck").alias("ck_max"), F.max("day").alias("day_max")
    )
    pts = raw.crossJoin(F.broadcast(bounds)).select(
        "ck",
        "day",
        F.expr(
            f"(ck * {(1 << HB_BITS) - 1}) div greatest(ck_max, 1)"
        ).alias("x"),
        F.expr(
            f"(day * {(1 << HB_BITS) - 1}) div greatest(day_max, 1)"
        ).alias("y"),
    )
    # One lateral-alias select instead of ~44 chained withColumn calls:
    # identical expressions (the oracle keeps rendering _hilbert_steps as
    # a CTE chain), analyzed once — the fxlog2_select_items precedent
    # (guide §1.2 step 2: the per-step loop was pure driver/Catalyst
    # time, eagerly re-analyzing a growing plan each step).
    pts = pts.selectExpr(
        "ck",
        "day",
        "x",
        "y",
        *[f"{expr} AS {name}" for name, expr in _hilbert_steps()],
    )
    pts = pts.select(
        "ck",
        "day",
        "x",
        "y",
        "hidx",
        F.expr(_morton8_sql("x", "y")).cast("long").alias("zidx"),
    )

    # Both curves' lag distances ride ONE relation — two chained
    # window exchanges, a single orders scan, one final aggregate.
    # (The first cut aggregated each curve separately; the dup-scan
    # plan audit flagged 6 scan leaves, so at 100 TB the corpus would
    # have been read six times.)
    wh = Window.partitionBy(
        F.expr(f"hidx div {HB_BLOCK_CELLS}")
    ).orderBy("hidx", "ck", "day")
    wz = Window.partitionBy(
        F.expr(f"zidx div {HB_BLOCK_CELLS}")
    ).orderBy("zidx", "ck", "day")
    both = (
        pts.withColumn(
            "h_dist",
            F.abs(F.col("x") - F.lag("x").over(wh))
            + F.abs(F.col("y") - F.lag("y").over(wh)),
        )
        .withColumn(
            "z_dist",
            F.abs(F.col("x") - F.lag("x").over(wz))
            + F.abs(F.col("y") - F.lag("y").over(wz)),
        )
    )
    return both.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.count("h_dist").alias("h_pairs"),
        F.coalesce(F.sum("h_dist"), F.lit(0)).cast("long").alias("h_sum"),
        F.count("z_dist").alias("z_pairs"),
        F.coalesce(F.sum("z_dist"), F.lit(0)).cast("long").alias("z_sum"),
    ).select(
        "n_points",
        "h_pairs",
        "h_sum",
        F.expr("h_sum * 1000 div greatest(h_pairs, 1)").alias("h_avg_milli"),
        "z_pairs",
        "z_sum",
        F.expr("z_sum * 1000 div greatest(z_pairs, 1)").alias("z_avg_milli"),
    )


def _hilbert_locality_sql() -> str:
    ctes = []
    prev = "pts"
    for j, (name, expr) in enumerate(_hilbert_steps()):
        ctes.append(f"h{j} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = f"h{j}"
    return f"""
WITH raw AS (
  SELECT CAST(o_custkey AS BIGINT) AS ck,
         CAST(datediff('day', DATE '{ZORDER_EPOCH}',
                        CAST(o_orderdate AS DATE)) AS BIGINT) AS day
  FROM orders
),
bounds AS (SELECT max(ck) AS ck_max, max(day) AS day_max FROM raw),
pts AS (
  SELECT ck, day,
         (ck * {(1 << HB_BITS) - 1}) // greatest(ck_max, 1) AS x,
         (day * {(1 << HB_BITS) - 1}) // greatest(day_max, 1) AS y
  FROM raw, bounds
),
{", ".join(ctes)},
idx AS (
  SELECT ck, day, x, y, hidx,
         CAST({_morton8_sql("x", "y")} AS BIGINT) AS zidx
  FROM {prev}
),
hl AS (
  SELECT abs(x - lag(x) OVER w) + abs(y - lag(y) OVER w) AS dist
  FROM idx
  WINDOW w AS (PARTITION BY hidx // {HB_BLOCK_CELLS}
               ORDER BY hidx, ck, day)
),
zl AS (
  SELECT abs(x - lag(x) OVER w) + abs(y - lag(y) OVER w) AS dist
  FROM idx
  WINDOW w AS (PARTITION BY zidx // {HB_BLOCK_CELLS}
               ORDER BY zidx, ck, day)
),
ha AS (SELECT count(dist) AS h_pairs,
              CAST(coalesce(sum(dist), 0) AS BIGINT) AS h_sum FROM hl),
za AS (SELECT count(dist) AS z_pairs,
              CAST(coalesce(sum(dist), 0) AS BIGINT) AS z_sum FROM zl),
np AS (SELECT count(*) AS n_points FROM idx)
SELECT n_points, h_pairs, h_sum,
       h_sum * 1000 // greatest(h_pairs, 1) AS h_avg_milli,
       z_pairs, z_sum,
       z_sum * 1000 // greatest(z_pairs, 1) AS z_avg_milli
FROM np, ha, za
"""


HILBERT_LOCALITY_SQL = _hilbert_locality_sql()


SKEW_TOP_K = 10


def join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile for lineitem⋈orders: the heaviest
    SKEW_TOP_K keys with their row share in basis points — the
    diagnostic run before choosing a skew mitigation (salting, AQE
    skew-join, broadcast). A key above ~a few percent of a 100-TB fact
    table is the one that stalls a shuffle join's straggler task.

    One map-side-partial count per key, one broadcast of the 1-row
    total, and a TakeOrdered top-k — the profile costs a fraction of
    the join it protects.
    """
    li = io.load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "l_orderkey",
            F.col("c").alias("n_rows"),
            F.expr("(c * 10000) div t").alias("share_bp"),
        )
        .orderBy(F.desc("n_rows"), F.asc("l_orderkey"))
        .limit(SKEW_TOP_K)
    )


JOIN_KEY_SKEW_SQL = f"""
WITH counts AS (SELECT l_orderkey, count(*) AS c FROM lineitem GROUP BY l_orderkey),
t AS (SELECT sum(c) AS t FROM counts)
SELECT l_orderkey, c AS n_rows, CAST((c * 10000) // t.t AS BIGINT) AS share_bp
FROM counts, t
ORDER BY n_rows DESC, l_orderkey ASC
LIMIT {SKEW_TOP_K}
"""




PRUNE_MONTH = "1997-03"


def partition_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned write + partition-pruned read-back: orders are
    laid out ONCE per (session, sf) under ``om=yyyy-MM/`` directories,
    then a one-month query reads back through the partition column.

    The point is the scan: the month predicate binds to the PARTITION
    column, so Spark's file index prunes to one directory before any
    I/O — ``PartitionFilters: [om = 1997-03]`` in the plan, and data
    filters never even run (asserted in tests/test_plans.py). At
    100 TB with daily/monthly partitions this is the difference
    between scanning one partition and scanning the fleet. The write
    is idempotent via a _SUCCESS sentinel, mirroring the bucketed-join
    layout staging.
    """
    import os

    tag = _sf_tag(sf_dir)
    stage = f"/tmp/sse_part_orders-{tag}"
    if not os.path.exists(os.path.join(stage, "_SUCCESS")):
        (
            io.load_table(spark, sf_dir, "orders")
            .withColumn("om", F.date_format("o_orderdate", "yyyy-MM"))
            .write.mode("overwrite")
            .partitionBy("om")
            .parquet(stage)
        )
    back = spark.read.parquet(stage).filter(F.col("om") == PRUNE_MONTH)
    return (
        back.groupBy(F.to_date("o_orderdate").alias("order_day"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("day_revenue"),
        )
        .orderBy("order_day")
    )


PARTITION_PRUNED_SQL = f"""
SELECT CAST(o_orderdate AS DATE) AS order_day,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS day_revenue
FROM orders
WHERE strftime(o_orderdate, '%Y-%m') = '{PRUNE_MONTH}'
GROUP BY order_day
ORDER BY order_day
"""


def _sf_tag(sf_dir: str) -> str:
    """Filesystem tag for per-fixture /tmp staging dirs — ONE home for
    the naming convention every staged layout artifact shares (six
    call sites; a drifted copy would silently mix staged artifacts
    across fixtures). Embeds the fixture fingerprint so a regenerated
    fixture invalidates every staged artifact (io.fixture_token)."""
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1].replace(".", "_")
    return f"sf{sf}-{io.fixture_token(sf_dir)}"


FRAG_FILES = 64  # the planted small-file problem
COMPACT_TARGET_BYTES = 4 * 1024 * 1024  # target file size after compaction


def _compaction_dirs(sf_dir: str) -> tuple[str, str]:
    tag = _sf_tag(sf_dir)
    return f"/tmp/sse_frag_events-{tag}", f"/tmp/sse_compact_events-{tag}"


def compact_events(spark: SparkSession, sf_dir: str) -> tuple[int, int]:
    """The maintenance half of ``layout_compaction_read``: plant a
    small-file problem (events round-robined into FRAG_FILES shards),
    then compact to ceil(bytes / COMPACT_TARGET_BYTES) files. Returns
    (files_before, files_after); both steps are _SUCCESS-idempotent.

    Sizing reads the staged directory listing on the driver — a file-
    count decision is metadata-scale work (one NameNode/listing call at
    any corpus size); the DATA moves through one round-robin exchange,
    the minimum any rebalancing write costs. At 100 TB you run exactly
    this per partition-directory after every streaming/CDC ingest day.
    """
    import math
    import os

    frag, compact = _compaction_dirs(sf_dir)
    if not os.path.exists(os.path.join(frag, "_SUCCESS")):
        (
            io.load_table(spark, sf_dir, "events")
            .select("event_id", "event_type", "value")
            .repartition(FRAG_FILES)
            .write.mode("overwrite")
            .parquet(frag)
        )

    def _parquet_files(d: str) -> list[str]:
        return [
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        ]

    files_before = _parquet_files(frag)
    n_bytes = sum(os.path.getsize(f) for f in files_before)
    n_target = max(1, math.ceil(n_bytes / COMPACT_TARGET_BYTES))
    if not os.path.exists(os.path.join(compact, "_SUCCESS")):
        (
            spark.read.parquet(frag)
            .repartition(n_target)
            .write.mode("overwrite")
            .parquet(compact)
        )
    return len(files_before), len(_parquet_files(compact))


def compaction_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction + readback proof: the per-type totals out
    of the compacted layout must equal the source table exactly (the
    oracle checks THAT — file counts are filesystem facts the pytest
    gate owns). The readback scan now opens ~bytes/4 MiB files instead
    of FRAG_FILES tiny ones — footer/open overhead is the silent tax
    small files levy on every downstream query at 100 TB.
    """
    compact_events(spark, sf_dir)
    _, compact = _compaction_dirs(sf_dir)
    return (
        spark.read.parquet(compact)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("event_type")
    )


COMPACTION_READ_SQL = """
SELECT event_type, count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


RERUN_MONTH = "1997-06"


def dynamic_overwrite_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite: replay ONE ingest month into the
    partitioned lake table and prove the other partitions survived.

    Load 1 writes every month; the replay rewrites only RERUN_MONTH
    with ``partitionOverwriteMode=dynamic`` — Spark deletes exactly the
    partitions present in the incoming frame, which is how an
    idempotent daily batch re-run works on a 100 TB partitioned table
    (the static default would TRUNCATE the whole table first). The
    oracle is the full source aggregate, so if the replay had clobbered
    any other partition the row set itself would diverge — correctness
    of the overwrite semantics IS the checked result.
    """
    import os

    tag = _sf_tag(sf_dir)
    stage = f"/tmp/sse_dynpart_orders-{tag}"
    marker = os.path.join(stage, "_RERUN_DONE")
    om = F.date_format("o_orderdate", "yyyy-MM")
    if not os.path.exists(marker):
        o = io.load_table(spark, sf_dir, "orders").withColumn("om", om)
        o.write.mode("overwrite").partitionBy("om").parquet(stage)
        (
            o.filter(F.col("om") == RERUN_MONTH)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("om")
            .parquet(stage)
        )
        open(marker, "w").close()
    back = spark.read.parquet(stage)
    return (
        back.groupBy("om")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("om")
    )


DYNAMIC_OVERWRITE_SQL = """
SELECT strftime(o_orderdate, '%Y-%m') AS om,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY om
ORDER BY om
"""


TT_YEAR = 1995
TT_MONTH = "1995-03"


def timetravel_root(sf_dir: str) -> str:
    """Staging root for the time-travel sink — shared with the pytest
    gate so the operator and its test can't drift apart."""
    tag = _sf_tag(sf_dir)
    return f"/tmp/sse_timetravel-{tag}"


def time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel on the transactional manifest sink: commit
    v1 (append all {TT_YEAR} orders), commit v2 (MERGE that doubles
    {TT_MONTH}'s prices), then read **version 1** — the pre-MERGE state
    must still be byte-reproducible from the retained manifest log,
    exactly Delta/Iceberg `VERSION AS OF`.

    The oracle is the untouched source aggregate: if version-1 readback
    leaked ANY v2 file (or lost one of v1's), the month totals diverge
    — snapshot isolation of the commit protocol IS the checked result.
    The pytest gate additionally proves latest != v1 on the merged
    month. Revenue travels as exact integer cents so the check is
    bit-strict, not float-rounded. At 100 TB both reads are plain
    parquet scans over the manifest's file list; time travel costs one
    tiny JSON read, never a data copy (sinks.py:189).
    """
    import os

    from .. import sinks

    root = timetravel_root(sf_dir)
    marker = os.path.join(root, "_STAGED")
    if not os.path.exists(marker):
        o95 = io.load_table(spark, sf_dir, "orders").filter(
            F.year("o_orderdate") == TT_YEAR
        )
        sinks.commit_append(o95, root, txn_id="tt-base")
        upd = o95.filter(
            F.date_format("o_orderdate", "yyyy-MM") == TT_MONTH
        ).withColumn("o_totalprice", F.col("o_totalprice") * 2)
        sinks.commit_upsert(spark, upd, root, keys=["o_orderkey"], txn_id="tt-upd")
        open(marker, "w").close()
    v1 = sinks.read_snapshot(spark, root, version=1)
    return (
        v1.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("om"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("revenue_cents"),
        )
        .orderBy("om")
    )


TIME_TRAVEL_SQL = f"""
SELECT strftime(o_orderdate, '%Y-%m') AS om,
       count(*) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders
WHERE year(o_orderdate) = {TT_YEAR}
GROUP BY om ORDER BY om
"""


CODECS = ("uncompressed", "snappy", "zstd")


def codec_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-codec shootout over the documents table: write the same
    (sorted, single-shard — layout pinned so byte sizes are a codec
    property, not a partitioning accident) data under each parquet
    codec, report bytes + ratio vs uncompressed, and prove every
    variant reads back whole.

    At 100 TB the codec choice IS a top-three cost lever (storage +
    scan bandwidth vs decode CPU); this operator is the measurement a
    platform runs before fixing the table default. Writes stage once
    per (sf, codec) behind _SUCCESS markers. rows-only for the driver
    (byte sizes are filesystem facts no SQL oracle can know); pytest
    gates compression monotonicity and readback row counts.
    """
    import os

    tag = _sf_tag(sf_dir)
    d = (
        io.load_table(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .coalesce(1)
    )
    out = []
    for codec in CODECS:
        stage = f"/tmp/sse_codec_{codec}-{tag}"
        if not os.path.exists(os.path.join(stage, "_SUCCESS")):
            d.write.mode("overwrite").option("compression", codec).parquet(stage)
        n_bytes = sum(
            os.path.getsize(os.path.join(stage, f))
            for f in os.listdir(stage)
            if f.endswith(".parquet")
        )
        n_rows = spark.read.parquet(stage).count()
        out.append((codec, n_rows, n_bytes))
    # lossless-readback proof lives in the result: n_rows per codec is a
    # column, and the pytest gate compares it to the source count
    base = next(b for c, _, b in out if c == "uncompressed")
    return spark.createDataFrame(
        [
            (c, r, b, int(b * 10000 // base))
            for c, r, b in out
        ],
        "codec STRING, n_rows BIGINT, n_bytes BIGINT, size_ratio_bp BIGINT",
    ).orderBy("codec")


# (column, kind) — kind drives the numeric min/max encoding: bigint
# and double cast straight, timestamps profile as epoch days, strings
# carry NULL min/max (their value domain is the n_distinct column).
PROFILE_COLS = (
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "date"),
    ("o_orderpriority", "str"),
)


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiler over ``orders`` — the stats sweep a
    platform runs on every new table (null rates, exact cardinalities,
    numeric ranges) before choosing partition keys and join strategies.

    ALL columns profile in a single aggregation job: per-column
    count/min/max are one partial-agg pass, and the exact
    count-distincts share one Expand-based aggregate (Spark rewrites
    multiple DISTINCTs into an Expand ×6 + two-phase agg — one shuffle
    total, factor-of-columns map-side inflation, the standard
    trade for exactness; a 100 TB profile would swap in
    approx_count_distinct per column and lose the Expand). The 1-row
    aggregate then unpivots via ``stack`` into (column, stats) rows —
    never a per-column scan loop. The single-file fixture fans out
    (load_table_parallel) so the Expand×6 partial aggregation runs on
    every core, not one.
    """
    o = io.load_table_parallel(spark, sf_dir, "orders")

    def _num(col: str, kind: str):
        if kind == "num":
            return F.col(col).cast("double")
        if kind == "date":
            return F.datediff(F.col(col), F.lit("1970-01-01")).cast("double")
        return F.lit(None).cast("double")

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in PROFILE_COLS:
        aggs += [
            F.count(F.col(c)).alias(f"nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"nd_{c}"),
            F.min(_num(c, kind)).alias(f"mn_{c}"),
            F.max(_num(c, kind)).alias(f"mx_{c}"),
        ]
    one = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c, _ in PROFILE_COLS
    )
    return one.select(
        "n_rows",
        F.expr(
            f"stack({len(PROFILE_COLS)}, {stack_args}) AS "
            "(column_name, n_nonnull, n_distinct, min_num, max_num)"
        ),
    ).select(
        "column_name",
        "n_rows",
        (F.col("n_rows") - F.col("n_nonnull")).alias("n_nulls"),
        "n_distinct",
        "min_num",
        "max_num",
    ).orderBy("column_name")


def _profile_branch(col: str, kind: str) -> str:
    if kind == "num":
        mn, mx = f"min(CAST({col} AS DOUBLE))", f"max(CAST({col} AS DOUBLE))"
    elif kind == "date":
        mn = f"min(CAST(date_diff('day', DATE '1970-01-01', CAST({col} AS DATE)) AS DOUBLE))"
        mx = f"max(CAST(date_diff('day', DATE '1970-01-01', CAST({col} AS DATE)) AS DOUBLE))"
    else:
        mn = mx = "CAST(NULL AS DOUBLE)"
    return (
        f"SELECT '{col}' AS column_name, count(*) AS n_rows,\n"
        f"       count(*) - count({col}) AS n_nulls,\n"
        f"       count(DISTINCT {col}) AS n_distinct,\n"
        f"       {mn} AS min_num, {mx} AS max_num FROM orders"
    )


TABLE_PROFILE_SQL = "\nUNION ALL\n".join(
    _profile_branch(c, k) for c, k in PROFILE_COLS
) + "\nORDER BY column_name"


# ---------------------------------------------------------------------------
# Incremental (delta) maintenance of a materialized join view
# ---------------------------------------------------------------------------

IVM_DELTA_MOD = 10  # orders with key % 10 == 0 play the CDC delta batch


def _ivm_mv_dir(sf_dir: str) -> str:
    tag = _sf_tag(sf_dir)
    return f"/tmp/sse_ivm_mv-{tag}"


def ivm_delta_join_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a materialized JOIN view: the
    orders⋈customer MV is staged as of "yesterday" (all orders except
    the key%{IVM_DELTA_MOD}==0 batch), today's CDC delta joins ONLY
    its own rows against the broadcast dimension, and the merged view
    must equal a full recompute — which is exactly what the oracle
    checks. This is `agg_incremental_merge`'s JOIN-side sibling: at
    100 TB the refresh touches |Δ| rows + a broadcast dim, never the
    fact table (the staged MV is read back, not re-joined).

    Staging is _SUCCESS-idempotent (the compaction/codec pattern);
    the timed path is MV readback + Δ⋈dim + union + rollup.
    """
    import os

    mv_dir = _ivm_mv_dir(sf_dir)
    cust = io.load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    o = io.load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    if not os.path.exists(os.path.join(mv_dir, "_SUCCESS")):
        base = o.filter(F.col("o_orderkey") % IVM_DELTA_MOD != 0)
        base.join(F.broadcast(cust), base.o_custkey == cust.c_custkey).select(
            "o_orderkey", "c_mktsegment", "cents"
        ).write.mode("overwrite").parquet(mv_dir)
    delta = o.filter(F.col("o_orderkey") % IVM_DELTA_MOD == 0)
    delta_mv = delta.join(
        F.broadcast(cust), delta.o_custkey == cust.c_custkey
    ).select("o_orderkey", "c_mktsegment", "cents")
    merged = spark.read.parquet(mv_dir).unionByName(delta_mv)
    return (
        merged.groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("rev_cents"),
        )
        .orderBy("seg")
    )


IVM_DELTA_JOIN_SQL = """
SELECT c_mktsegment AS seg,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS rev_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY seg
"""


QUERIES = {
    "layout_zorder_stats": (zorder_stats, ZORDER_STATS_SQL),
    "layout_hilbert_locality": (hilbert_locality, HILBERT_LOCALITY_SQL),
    "diag_table_profile": (table_profile, TABLE_PROFILE_SQL),
    "diag_join_key_skew": (join_key_skew, JOIN_KEY_SKEW_SQL),
    "layout_partition_pruned_read": (partition_pruned_read, PARTITION_PRUNED_SQL),
    "layout_compaction_read": (compaction_read, COMPACTION_READ_SQL),
    "layout_dynamic_overwrite": (dynamic_overwrite_read, DYNAMIC_OVERWRITE_SQL),
    "layout_time_travel_read": (time_travel_read, TIME_TRAVEL_SQL),
    "layout_codec_stats": (codec_stats, None),
    "layout_ivm_delta_join": (ivm_delta_join_read, IVM_DELTA_JOIN_SQL),
}
