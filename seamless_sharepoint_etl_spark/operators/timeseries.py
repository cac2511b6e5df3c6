"""Time-series operators over `events`: resample + gap-fill, SCD2
interval construction.

Provenance: SURVEY.md §2 Tier B extension — temporal analytics a
warehouse replacing the reference ETL (bin/copy-seamless-to-sharepoint.rb
moves timestamped submissions) needs: regularized series for
monitoring/joins, and slowly-changing-dimension history for the
entities the reference syncs.

Scale posture: forward-fill is inherently a per-key sequential scan, so
the naive form (ONE window per key over the whole history) serializes
each key through a single task. Here the carry is two-phase, the same
trick as text.token_budget_alloc: per-(key, day) last values are a tiny
relation (keys × days), the cross-day carry is windowed over THAT, and
the per-hour fill runs partitioned by (key, day) — parallel within each
key's history. Same output as the global scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import io


def resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample of mean event value per type, dense grid from
    each key's first to last active hour, gaps forward-filled.

    Rounding: round(round(sum,2)/count,4) — never round(avg(..)), the
    engines' avg implementations drift ~1e-8 (NOTES.md trap 1), and the
    filled value must propagate bit-identically.
    """
    ev = io.load_table(spark, sf_dir, "events")
    agg = (
        ev.groupBy(
            F.col("event_type").alias("k"),
            F.date_trunc("hour", "ts").alias("h"),
        )
        .agg(
            F.round(F.round(F.sum("value"), 2) / F.count(F.lit(1)), 4).alias("v")
        )
    )
    bounds = agg.groupBy("k").agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = bounds.select(
        "k",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    j = grid.join(agg, ["k", "h"], "left").withColumn("d", F.to_date("h"))

    # Phase 1 — cross-day carry on the tiny (key, day) relation: last
    # non-null hourly value per day, then a windowed last-ignore-nulls
    # over days (strictly before) gives each day's incoming carry.
    day_grid = bounds.select(
        "k",
        F.explode(
            F.sequence(F.to_date("h0"), F.to_date("h1"), F.expr("INTERVAL 1 DAY"))
        ).alias("d"),
    )
    day_last = (
        agg.filter(F.col("v").isNotNull())
        .groupBy("k", F.to_date("h").alias("d"))
        .agg(F.max_by("v", "h").alias("day_last_v"))
    )
    wdays = (
        Window.partitionBy("k")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        day_grid.join(day_last, ["k", "d"], "left")
        .withColumn("carry_in", F.last("day_last_v", ignorenulls=True).over(wdays))
        .select("k", "d", "carry_in")
    )

    # Phase 2 — per-(key, day) fill, parallel across days of one key.
    wd = (
        Window.partitionBy("k", "d")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        j.join(F.broadcast(carry), ["k", "d"])
        .withColumn("in_day", F.last("v", ignorenulls=True).over(wd))
        .select(
            F.col("k").alias("event_type"),
            F.col("h").alias("hour_ts"),
            F.coalesce("in_day", "carry_in").alias("value_ffill"),
            F.when(F.col("v").isNull(), 1).otherwise(0).alias("was_gap"),
        )
    )


RESAMPLE_FFILL_SQL = """
WITH agg AS (
  SELECT event_type AS k, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         round(round(sum(value), 2) / count(*), 4) AS v
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT k, min(h) AS h0, max(h) AS h1 FROM agg GROUP BY 1),
grid AS (SELECT k, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
         FROM bounds),
j AS (SELECT g.k, g.h, a.v FROM grid g
      LEFT JOIN agg a ON a.k = g.k AND a.h = g.h)
SELECT k AS event_type, h AS hour_ts,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY k ORDER BY h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill,
       CASE WHEN v IS NULL THEN 1 ELSE 0 END AS was_gap
FROM j
"""


def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build: collapse each user's event stream into
    versioned rows — one row per run of consecutive same-type events,
    with valid_from / valid_to (next version's start) / is_current.

    The run-length collapse is the lag-change-flag + running-sum
    segment-id idiom; both windows and the final lead() share the
    user_id partitioning, so the whole history build is one shuffle of
    the (user, ts) stream plus one tiny per-segment shuffle.
    """
    ev = io.load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 0
    ).otherwise(1)
    seg = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("chg", chg)
        .withColumn(
            "seg_id",
            F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    rows = seg.groupBy("user_id", "seg_id").agg(
        F.min("event_type").alias("event_type"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wn = Window.partitionBy("user_id").orderBy("valid_from")
    nxt = F.lead("valid_from").over(wn)
    return rows.select(
        "user_id",
        "event_type",
        "valid_from",
        nxt.alias("valid_to"),
        "n_events",
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


SCD2_SQL = """
WITH e AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS tsc, event_id
  FROM events
),
flagged AS (
  SELECT user_id, event_type, tsc, event_id,
         CASE WHEN lag(event_type) OVER
                (PARTITION BY user_id ORDER BY tsc, event_id)
              IS NOT DISTINCT FROM event_type THEN 0 ELSE 1 END AS chg
  FROM e
),
seg AS (
  SELECT user_id, event_type, tsc, event_id,
         sum(chg) OVER (PARTITION BY user_id ORDER BY tsc, event_id
                        ROWS UNBOUNDED PRECEDING) AS seg_id
  FROM flagged
),
rows_ AS (
  SELECT user_id, seg_id, min(event_type) AS event_type,
         min(tsc) AS valid_from, count(*) AS n_events
  FROM seg GROUP BY 1, 2
)
SELECT user_id, event_type, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
         AS valid_to,
       n_events,
       CASE WHEN lead(valid_from) OVER (PARTITION BY user_id
                                        ORDER BY valid_from) IS NULL
            THEN 1 ELSE 0 END AS is_current
FROM rows_
"""


QUERIES = {
    "ts_resample_ffill": (resample_ffill, RESAMPLE_FFILL_SQL),
    "ts_scd2_intervals": (scd2_intervals, SCD2_SQL),
}
