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

    Rounding: the hourly mean goes to integer basis points,
    floor(x·10⁴ + 0.5), never round(x, 4) — round() is HALF_UP in
    Spark but effectively HALF_EVEN in DuckDB, and at sf0.1 one hour
    landed exactly on the .00005 boundary (47.25375 → 47.2538 vs
    47.2537). The floor form is the same IEEE ops in both engines on
    bit-identical inputs (NOTES.md trap 1); the filled value then
    propagates as an exact integer.
    """
    ev = io.load_table(spark, sf_dir, "events")
    agg = (
        ev.groupBy(
            F.col("event_type").alias("k"),
            F.date_trunc("hour", "ts").alias("h"),
        )
        .agg(
            F.floor(
                (F.round(F.sum("value"), 2) / F.count(F.lit(1))) * 10000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("v")
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
            F.coalesce("in_day", "carry_in").alias("value_ffill_bp"),
            F.when(F.col("v").isNull(), 1).otherwise(0).alias("was_gap"),
        )
    )


RESAMPLE_FFILL_SQL = """
WITH agg AS (
  SELECT event_type AS k, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         CAST(floor((round(sum(value), 2) / count(*)) * 10000 + 0.5) AS BIGINT)
           AS v
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
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill_bp,
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


def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: pairs of users whose active islands
    (gaps-and-islands runs) overlap in time, with total overlap days.

    Scale shape — the naive form is a non-equi theta join
    (a.start ≤ b.end AND b.start ≤ a.end), which Spark executes as a
    nested-loop cartesian. Instead each island explodes into its
    covered days and the pairing is an EQUI-join on the day bucket:
    cost is Σ_day k_day² (active-per-day, bounded) instead of N², and
    it shuffles on a uniform key. Exact overlap is then recomputed
    from the carried island bounds — the bucket join only *generates*
    candidates, the arithmetic stays exact. This is the standard
    bucketized interval-join strategy (cf. range-join binning).
    """
    from .windows import gaps_islands

    islands = gaps_islands(spark, sf_dir)
    days = islands.select(
        "user_id",
        "island_start",
        "island_end",
        F.explode(
            F.sequence("island_start", "island_end", F.expr("INTERVAL 1 DAY"))
        ).alias("d"),
    )
    a = days.select(
        F.col("user_id").alias("user_lo"),
        F.col("island_start").alias("s_lo"),
        F.col("island_end").alias("e_lo"),
        "d",
    )
    b = days.select(
        F.col("user_id").alias("user_hi"),
        F.col("island_start").alias("s_hi"),
        F.col("island_end").alias("e_hi"),
        "d",
    )
    pairs = (
        a.join(b, ["d"])
        .filter(F.col("user_lo") < F.col("user_hi"))
        .select("user_lo", "s_lo", "e_lo", "user_hi", "s_hi", "e_hi")
        .distinct()
    )
    overlap = (
        F.datediff(
            F.least("e_lo", "e_hi"), F.greatest("s_lo", "s_hi")
        )
        + 1
    )
    return pairs.groupBy("user_lo", "user_hi").agg(
        F.sum(overlap).alias("overlap_days"),
        F.count(F.lit(1)).alias("n_island_pairs"),
    )


# Oracle: the naive theta join over the SAME island derivation (the
# windows module's gaps-islands SQL embedded as a CTE, so the two
# definitions can't drift).
def _interval_overlap_sql() -> str:
    from .windows import GAPS_ISLANDS_SQL

    return f"""
WITH islands AS ({GAPS_ISLANDS_SQL})
SELECT a.user_id AS user_lo, b.user_id AS user_hi,
       CAST(sum(least(a.island_end, b.island_end)
                - greatest(a.island_start, b.island_start) + 1) AS BIGINT)
         AS overlap_days,
       count(*) AS n_island_pairs
FROM islands a JOIN islands b
  ON a.user_id < b.user_id
 AND a.island_start <= b.island_end
 AND b.island_start <= a.island_end
GROUP BY 1, 2
"""


EWMA_ALPHA = 0.25


def ewma_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of event values
    in time order — the sequential smoother every monitoring/feature
    pipeline needs, which windowed SQL cannot express (each step
    depends on the previous RESULT, not the previous rows).

    Shape: ONE shuffle (groupBy user) collecting each user's ordered
    (ts, value) list, then a per-row left fold — sequential per key,
    parallel across keys, which is the only available parallelism for
    a recurrence. Per-user event counts are bounded (session-scale),
    so the collected arrays are too; an unbounded key would call for
    the chunked two-phase carry used by ts_resample_ffill. The fold
    order is pinned by (ts_ns, event_id), so the double arithmetic is
    bit-identical across engines; output in integer cents.
    """
    e = io.load_table(spark, sf_dir, "events")
    # order on MICROsecond ts (ts_ns div 1000): the oracle's ts column
    # is micro-resolution, so a nanosecond-resolution sort key could
    # break ties differently across engines and reorder the fold
    vals = F.expr(
        "transform(array_sort(collect_list("
        "struct(ts_ns div 1000 AS ts_us, event_id, value))), s -> s.value)"
    )
    # NB: Spark bracket indexing is 0-BASED (vals[0] = first element)
    # while slice() is 1-based — an earlier draft seeded with vals[1]
    # (= x₂), double-folding x₂ and dropping x₁; masked on the fixture
    # only because (1-α)^45 shrinks the seed error below a cent, and an
    # OOB crash for 1-event users under ANSI. Seed = vals[0] matches
    # the oracle's list_reduce exactly at every series length.
    ewma = F.expr(
        f"""aggregate(
              slice(vals, 2, greatest(size(vals) - 1, 0)),
              CAST(vals[0] AS DOUBLE),
              (acc, x) -> {EWMA_ALPHA} * x + {1 - EWMA_ALPHA} * acc)"""
    )
    return (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), vals.alias("vals"))
        .select(
            "user_id",
            "n_events",
            F.floor(ewma * 100 + F.lit(0.5)).cast("long").alias("ewma_cents"),
        )
    )


HOLT_ALPHA = 0.5  # binary-exact smoothing weights: the recurrence's
HOLT_BETA = 0.25  # float ops are then exactly reproducible cross-engine


def holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend double exponential smoothing per user —
    EWMA's forecasting upgrade: a coupled (level, trend) recurrence
    lₜ = αxₜ + (1−α)(lₜ₋₁+bₜ₋₁); bₜ = β(lₜ−lₜ₋₁) + (1−β)bₜ₋₁, with the
    standard init l₁=x₁ (x₂ for n≥2), b₁=x₂−x₁; forecast = l+b.

    Same shape as ``ewma_per_user``: one user shuffle, ordered-array
    fold — but the accumulator is a STRUCT, exercising vector-state
    folds (Spark ``aggregate`` takes a struct seed directly). The
    DuckDB twin CANNOT use list_reduce here: in DuckDB 1.0.0 a
    struct-typed reduce evaluates later struct fields against the
    accumulator ALREADY UPDATED by earlier fields of the same
    iteration (verified: ``b := acc.l`` returns the new l — trap, see
    NOTES), so the oracle instead runs the recurrence as a
    WITH RECURSIVE step-join with textually identical arithmetic.
    α=1/2, β=1/4 are binary-exact, and the fold order is pinned by
    (ts_us, event_id), so every double op is bit-identical across
    engines; outputs floor to integer cents.
    """
    e = io.load_table(spark, sf_dir, "events")
    vals = F.expr(
        "transform(array_sort(collect_list("
        "struct(ts_ns div 1000 AS ts_us, event_id, value))), s -> s.value)"
    )
    a, b = HOLT_ALPHA, HOLT_BETA
    # bracket indexing is 0-BASED, slice() 1-based (same trap as the
    # EWMA seed): x₁ = vals[0], x₂ = vals[1]; the fold starts at x₃ =
    # slice(vals, 3, ·). An earlier vals[1]/vals[2] draft double-folded
    # x₃ and crashed on ≤2-event users under ANSI — caught by review,
    # masked on the fixture by α=1/2 seed decay over ≥45 events.
    state = F.expr(
        f"""CASE WHEN size(vals) = 1
              THEN struct(CAST(vals[0] AS DOUBLE) AS l, CAST(0 AS DOUBLE) AS b)
            ELSE aggregate(
              slice(vals, 3, greatest(size(vals) - 2, 0)),
              struct(CAST(vals[1] AS DOUBLE) AS l,
                     CAST(vals[1] - vals[0] AS DOUBLE) AS b),
              (acc, x) -> struct(
                {a} * x + {1 - a} * (acc.l + acc.b) AS l,
                {b} * (({a} * x + {1 - a} * (acc.l + acc.b)) - acc.l)
                  + {1 - b} * acc.b AS b))
            END"""
    )
    cents = lambda c: F.floor(c * 100 + F.lit(0.5)).cast("long")  # noqa: E731
    return (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), vals.alias("vals"))
        .withColumn("s", state)
        .select(
            "user_id",
            "n_events",
            cents(F.col("s.l")).alias("level_cents"),
            cents(F.col("s.b")).alias("trend_cents"),
            cents(F.col("s.l") + F.col("s.b")).alias("forecast_cents"),
        )
    )


HOLT_LINEAR_SQL = f"""
WITH RECURSIVE ord AS (
  SELECT user_id, CAST(value AS DOUBLE) AS value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS i,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events
),
rec AS (
  SELECT o1.user_id, o1.n,
         CASE WHEN o1.n = 1 THEN o1.value ELSE o2.value END AS l,
         CASE WHEN o1.n = 1 THEN CAST(0 AS DOUBLE)
              ELSE o2.value - o1.value END AS b,
         CAST(least(o1.n, 2) AS BIGINT) AS i
  FROM ord o1
  LEFT JOIN ord o2 ON o1.user_id = o2.user_id AND o2.i = 2
  WHERE o1.i = 1
  UNION ALL
  SELECT r.user_id, r.n,
         {HOLT_ALPHA} * o.value + {1 - HOLT_ALPHA} * (r.l + r.b),
         {HOLT_BETA} * (({HOLT_ALPHA} * o.value
             + {1 - HOLT_ALPHA} * (r.l + r.b)) - r.l)
           + {1 - HOLT_BETA} * r.b,
         r.i + 1
  FROM rec r JOIN ord o ON o.user_id = r.user_id AND o.i = r.i + 1
)
SELECT user_id, n AS n_events,
       CAST(floor(l * 100 + 0.5) AS BIGINT) AS level_cents,
       CAST(floor(b * 100 + 0.5) AS BIGINT) AS trend_cents,
       CAST(floor((l + b) * 100 + 0.5) AS BIGINT) AS forecast_cents
FROM rec WHERE i = n
"""


def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type over the daily-value
    series — the sequential drift detector that complements
    ``diag_psi_drift``'s batch comparison: S₀=0, Sₜ = max(0, Sₜ₋₁+dₜ)
    where dₜ is the deviation from the series mean; the peak Sₜ and its
    day are the strongest upward-shift candidate.

    The clamped recurrence looks sequential, but the classic identity
    Sₜ = Pₜ − min(0, min_{{s≤t}} Pₛ) (P = running deviation sum) makes
    it pure WINDOW algebra — no fold at all. Deviations are scaled by
    n (dₜ' = n·xₜ − total) so EVERYTHING stays in exact integers: no
    mean division, no floats, bit-identical across engines (report is
    n-scaled cents). Per-type day counts are calendar-bounded, so the
    per-type ordered windows are fine single-task-per-key (same
    posture as ``linear_interpolate``); the daily aggregate before
    them carries the one corpus-sized shuffle.
    """
    e = io.load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
            .alias("cents")
        )
    )
    wt = Window.partitionBy("event_type")
    wo = wt.orderBy("day")
    s = (
        daily.withColumn("n_days", F.count(F.lit(1)).over(wt))
        .withColumn("total", F.sum("cents").over(wt))
        .withColumn("d", F.col("n_days") * F.col("cents") - F.col("total"))
        .withColumn(
            "p",
            F.sum("d").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn(
            "s",
            F.col("p")
            - F.least(
                F.lit(0).cast("long"),
                F.min("p").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
            ),
        )
    )
    rn = F.row_number().over(wt.orderBy(F.col("s").desc(), F.col("day")))
    return (
        s.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            "n_days",
            F.col("s").alias("max_cusum_scaled"),
            F.col("day").alias("changepoint_day"),
        )
        .orderBy("event_type")
    )


CUSUM_SQL = """
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, day,
         count(*) OVER (PARTITION BY event_type) AS n_days,
         CAST(count(*) OVER (PARTITION BY event_type) * cents
              - sum(cents) OVER (PARTITION BY event_type) AS BIGINT) AS d
  FROM daily
),
p AS (
  SELECT event_type, day, n_days,
         CAST(sum(d) OVER (PARTITION BY event_type ORDER BY day
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p
  FROM w
),
s AS (
  SELECT event_type, day, n_days,
         CAST(p - least(CAST(0 AS BIGINT),
               min(p) OVER (PARTITION BY event_type ORDER BY day
                            ROWS UNBOUNDED PRECEDING)) AS BIGINT) AS s
  FROM p
)
SELECT event_type, n_days, s AS max_cusum_scaled, day AS changepoint_day
FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY s DESC, day) AS rn FROM s)
WHERE rn = 1 ORDER BY event_type
"""


EWMA_SQL = f"""
SELECT user_id, count(*) AS n_events,
       CAST(floor(list_reduce(list(value ORDER BY ts, event_id),
                              (acc, x) -> {EWMA_ALPHA} * x + {1 - EWMA_ALPHA} * acc)
                  * 100 + 0.5) AS BIGINT) AS ewma_cents
FROM events
GROUP BY user_id
"""



def linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with LINEAR interpolation across gaps — the
    numeric upgrade of ``resample_ffill`` for sensor-style series where
    a step function biases downstream features.

    Each gap hour gets prev + (next - prev) * dt_frac between its
    surrounding known hours (known hours pass through exactly). All
    interpolation inputs are exact integers (bp-quantized hourly means,
    hour distances), so the one double expression is bit-identical
    across engines and the output is floor-rounded back to bp ints.

    Scale note: the bidirectional carry windows run per event_type over
    the (key, hour) AGGREGATE (time-bounded: years x 8760 rows per key,
    not corpus-sized) — acceptable single-task-per-key; the two-phase
    bucketed-carry rewrite in ``resample_ffill`` is the pattern to
    lift to if per-key series length ever dominates.
    """
    ev = io.load_table(spark, sf_dir, "events")
    agg = ev.groupBy(
        F.col("event_type").alias("k"), F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.floor(
            (F.round(F.sum("value"), 2) / F.count(F.lit(1))) * 10000 + F.lit(0.5)
        )
        .cast("long")
        .alias("v")
    )
    bounds = agg.groupBy("k").agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = bounds.select(
        "k", F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    j = grid.join(agg, ["k", "h"], "left")
    wp = Window.partitionBy("k").orderBy("h").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = Window.partitionBy("k").orderBy("h").rowsBetween(
        0, Window.unboundedFollowing
    )
    # hour offsets as ROW offsets over the dense hourly grid (tz-proof:
    # no epoch arithmetic, so a DST-shifted session timezone cannot
    # change the interpolation weights — NOTES trap on tz-dependence)
    wr = Window.partitionBy("k").orderBy("h")
    j = j.withColumn("rn", F.row_number().over(wr).cast("long"))
    known_rn = F.when(F.col("v").isNotNull(), F.col("rn"))
    pv = F.last("v", ignorenulls=True).over(wp)
    prn = F.last(known_rn, ignorenulls=True).over(wp)
    nv = F.first("v", ignorenulls=True).over(wn)
    nrn = F.first(known_rn, ignorenulls=True).over(wn)
    # first/last grid hours are known (bounds come from the data), so
    # gap rows always have both neighbors
    interp = F.floor(
        pv + (nv - pv) * ((F.col("rn") - prn) / (nrn - prn)) + F.lit(0.5)
    ).cast("long")
    return j.select(
        F.col("k").alias("event_type"),
        F.col("h").alias("hour_ts"),
        F.when(F.col("v").isNotNull(), F.col("v")).otherwise(interp).alias(
            "value_interp_bp"
        ),
        F.when(F.col("v").isNull(), 1).otherwise(0).alias("was_gap"),
    )


LINEAR_INTERPOLATE_SQL = """
WITH agg AS (
  SELECT event_type AS k, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         CAST(floor((round(sum(value), 2) / count(*)) * 10000 + 0.5) AS BIGINT)
           AS v
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT k, min(h) AS h0, max(h) AS h1 FROM agg GROUP BY 1),
grid AS (SELECT k, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
         FROM bounds),
j AS (SELECT g.k, g.h, a.v FROM grid g
      LEFT JOIN agg a ON a.k = g.k AND a.h = g.h),
r AS (
  SELECT k, h, v,
         CAST(row_number() OVER (PARTITION BY k ORDER BY h) AS BIGINT) AS rn
  FROM j
),
c AS (
  SELECT k, h, v, rn,
         last_value(v IGNORE NULLS) OVER (
           PARTITION BY k ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER (
           PARTITION BY k ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prn,
         first_value(v IGNORE NULLS) OVER (
           PARTITION BY k ORDER BY h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER (
           PARTITION BY k ORDER BY h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nrn
  FROM r
)
SELECT k AS event_type, h AS hour_ts,
       CASE WHEN v IS NOT NULL THEN v
            ELSE CAST(floor(
              pv + (nv - pv) * ((rn - prn) / CAST(nrn - prn AS DOUBLE))
              + 0.5) AS BIGINT) END AS value_interp_bp,
       CASE WHEN v IS NULL THEN 1 ELSE 0 END AS was_gap
FROM c
"""


ZSCORE_FLAG_BP = 25000  # |z| >= 2.5 flags an anomaly


def daily_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events anomalous against their own (event_type, day) cohort:
    |z| >= 2.5 where z = (x - mean) / sample-stddev of that day's
    values for that type.

    Determinism: values are 2-decimal doubles, so mean and stddev are
    derived from EXACT integer sums (cents and squared cents) — the
    z expression is the same IEEE double ops in a fixed order on
    bit-identical inputs in both engines, making the flag set (not
    just the scores) exactly reproducible. Shape: one (type, day)
    hash agg (tiny), broadcast back onto the event stream; no windows,
    no sort — at 100 TB this is a scan + map-side-joined filter.
    """
    ev = io.load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    e = ev.select(
        "event_id",
        F.col("event_type").alias("k"),
        F.to_date("ts").alias("d"),
        cents.alias("c"),
    )
    stats = e.groupBy("k", "d").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    mu = F.col("s1") / F.col("n")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    z = (F.col("c") - mu) / F.sqrt(var)
    return (
        e.join(stats, ["k", "d"])
        .filter(F.col("n") >= 10)
        .withColumn("z_bp", F.floor(z * 10000 + F.lit(0.5)).cast("long"))
        .filter(F.abs(F.col("z_bp")) >= ZSCORE_FLAG_BP)
        .select(
            "event_id",
            F.col("k").alias("event_type"),
            F.col("d").alias("day"),
            "z_bp",
        )
    )


DAILY_ZSCORE_SQL = f"""
WITH e AS (
  SELECT event_id, event_type AS k, CAST(ts AS DATE) AS d,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
stats AS (
  SELECT k, d, count(*) AS n,
         CAST(sum(c) AS BIGINT) AS s1,
         CAST(sum(c * c) AS BIGINT) AS s2
  FROM e GROUP BY k, d
)
SELECT event_id, k AS event_type, d AS day,
       CAST(floor((c - s1 / CAST(n AS DOUBLE))
                  / sqrt((s2 - (s1 * s1) / CAST(n AS DOUBLE))
                         / (n - 1)) * 10000 + 0.5) AS BIGINT) AS z_bp
FROM e JOIN stats USING (k, d)
WHERE n >= 10
  AND abs(CAST(floor((c - s1 / CAST(n AS DOUBLE))
                     / sqrt((s2 - (s1 * s1) / CAST(n AS DOUBLE))
                            / (n - 1)) * 10000 + 0.5) AS BIGINT))
      >= {ZSCORE_FLAG_BP}
"""


def theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event type — the median of all
    pairwise daily-revenue slopes, the estimator that shrugs off the
    outlier days OLS (``ts_trend_slope``) gets dragged by (breakdown
    point 29% vs 0%).

    Exactness discipline: slopes are scaled integers — slope_e6 =
    (Δcents·10⁶) div Δdays — so the C(n,2) pair set and its LOWER
    MEDIAN (element ⌈m/2⌉ of the sorted slopes, a fixed deterministic
    pick) are bit-identical across engines; no float enters the plan.
    Shape: the daily aggregate carries the one corpus shuffle; each
    type's calendar-bounded series collects to an array and explodes
    its own pairs in-array (same posting discipline as the basket
    miner — C(730,2) ≈ 266k pairs per type at worst, map-side), then
    one percentile-free rank pick per type. At 100 TB the pair count
    depends on the CALENDAR, not the corpus.
    """
    ev = io.load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
            "cents"
        )
    )
    per = daily.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("d"), F.col("cents")))
        ).alias("pts")
    )
    pairs = per.select(
        "event_type",
        F.size("pts").alias("n_days"),
        F.explode(
            F.expr(
                "flatten(transform(pts, (a, i) ->"
                " transform(slice(pts, i + 2, size(pts)), b ->"
                " ((b.cents - a.cents) * 1000000L)"
                " div datediff(b.d, a.d))))"
            )
        ).alias("slope_e6"),
    )
    w = Window.partitionBy("event_type").orderBy("slope_e6")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "m", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
        )
        .filter(F.expr("rn = (m + 1) div 2"))
        .select("event_type", "n_days", F.col("slope_e6").alias("median_slope_e6"))
        .orderBy("event_type")
    )


THEIL_SEN_SQL = """
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type,
         CAST((b.cents - a.cents) * 1000000 // (b.d - a.d) AS BIGINT)
           AS slope_e6
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d < b.d
),
nd AS (SELECT event_type, count(*) AS n_days FROM daily GROUP BY 1),
r AS (
  SELECT event_type, slope_e6,
         row_number() OVER (PARTITION BY event_type ORDER BY slope_e6) AS rn,
         count(*) OVER (PARTITION BY event_type) AS m
  FROM pairs
)
SELECT r.event_type, nd.n_days, slope_e6 AS median_slope_e6
FROM r JOIN nd ON nd.event_type = r.event_type
WHERE rn = (m + 1) // 2
ORDER BY r.event_type
"""


SAX_SEGMENTS = 8  # PAA word length
SAX_ALPHA = 4  # alphabet size (a..d)


def sax_symbolic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolic representation (Lin/Keogh et al. 2003) of each
    event type's daily-revenue series: PAA-segment the calendar span
    into SAX_SEGMENTS pieces, then discretize each segment mean into a
    SAX_ALPHA-letter alphabet — the classic index for whole-series
    similarity search, motif discovery, and anomaly grouping over
    millions of series.

    This is the RANK-based (equi-depth) breakpoint variant: a segment's
    symbol is its segment-mean's rank quartile within the series,
    instead of the Gaussian-quantile z-cut. That choice is what makes
    the metric exact: segment means enter one IEEE double division
    each (identical bits in both engines), ranks are windowed
    row_numbers with a deterministic segment-index tie-break, and no
    libm call or float accumulation appears anywhere. Calendar gaps
    simply leave a segment absent (the word shortens); the segment map
    s = days_since_start · W div span is pure integer arithmetic.

    Shape: one corpus shuffle to the daily aggregate, one tiny
    (type × ≤W segments) relation after that — windows and the word
    assembly run on ≤ n_types·W rows. At 100 TB the post-daily cost
    depends on the CALENDAR and type count, not the corpus.
    """
    ev = io.load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        ).alias("cents")
    )
    bounds = daily.groupBy("event_type").agg(
        F.min("d").alias("d0"),
        F.max("d").alias("d1"),
        F.count(F.lit(1)).alias("n_days"),
    )
    seg = (
        daily.join(bounds, "event_type")
        .withColumn(
            "s",
            F.expr(
                f"datediff(d, d0) * {SAX_SEGMENTS}"
                " div (datediff(d1, d0) + 1)"
            ),
        )
        .groupBy("event_type", "s")
        .agg(
            F.sum("cents").alias("ss"),
            F.count(F.lit(1)).alias("sn"),
            F.max("n_days").alias("n_days"),
        )
        .withColumn("m", F.expr("CAST(ss AS DOUBLE) / sn"))
    )
    w_rank = Window.partitionBy("event_type").orderBy("m", "s")
    w_all = Window.partitionBy("event_type")
    sym = (
        seg.withColumn("rn", F.row_number().over(w_rank))
        .withColumn("nseg", F.count(F.lit(1)).over(w_all))
        .withColumn(
            "sym",
            F.expr(f"char(97 + (rn - 1) * {SAX_ALPHA} div nseg)"),
        )
    )
    return (
        sym.groupBy("event_type")
        .agg(
            F.max("n_days").alias("n_days"),
            F.count(F.lit(1)).alias("n_segments"),
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "struct(s, sym))), x -> x.sym), '')"
            ).alias("sax_word"),
        )
        .orderBy("event_type")
    )


SAX_SYMBOLIC_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, min(d) AS d0, max(d) AS d1, count(*) AS n_days
  FROM daily GROUP BY 1
),
seg AS (
  SELECT daily.event_type,
         (daily.d - d0) * {SAX_SEGMENTS} // (d1 - d0 + 1) AS s,
         CAST(sum(cents) AS BIGINT) AS ss,
         count(*) AS sn,
         max(n_days) AS n_days
  FROM daily JOIN bounds USING (event_type)
  GROUP BY 1, 2
),
sym AS (
  SELECT event_type, s, n_days,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY CAST(ss AS DOUBLE) / sn, s
         ) AS rn,
         count(*) OVER (PARTITION BY event_type) AS nseg
  FROM seg
)
SELECT event_type,
       CAST(max(n_days) AS BIGINT) AS n_days,
       count(*) AS n_segments,
       string_agg(chr(97 + CAST((rn - 1) * {SAX_ALPHA} // nseg AS INTEGER)),
                  '' ORDER BY s) AS sax_word
FROM sym
GROUP BY event_type
ORDER BY event_type
"""


def trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type OLS trend of daily revenue — the monitoring primitive
    behind "is this series drifting": slope of daily cents on day
    index, computed from the four classic sums (n, Σx, Σy, Σxy, Σx²)
    so the whole regression is ONE aggregation pass.

    Exactness discipline: x is the day offset from the TYPE'S OWN
    first day (centering keeps every product far from BIGINT range),
    y is exact integer cents, so n·Σxy−Σx·Σy and n·Σx²−(Σx)² are
    exact BIGINTs in both engines; the final ratio is one double
    division of identical integers (int→double conversion and IEEE
    division are deterministic), floored onto the micro grid.
    """
    ev = io.load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.floor(F.sum("value") * 100 + F.lit(0.5)).cast("long").alias("cents")
    )
    first = daily.groupBy("event_type").agg(F.min("d").alias("d0"))
    xy = daily.join(F.broadcast(first), "event_type").select(
        "event_type",
        F.datediff("d", "d0").cast("long").alias("x"),
        F.col("cents").alias("y"),
    )
    s = xy.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "event_type",
        "n",
        F.floor(num / den * 1000000 + F.lit(0.5)).cast("long").alias(
            "slope_micro_cents_per_day"
        ),
        F.expr("sy div n").alias("mean_daily_cents"),
    ).orderBy("event_type")


TREND_SLOPE_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS cents
  FROM events GROUP BY event_type, d
), first AS (
  SELECT event_type, min(d) AS d0 FROM daily GROUP BY event_type
), xy AS (
  SELECT daily.event_type,
         CAST(datediff('day', d0, d) AS BIGINT) AS x,
         cents AS y
  FROM daily JOIN first USING (event_type)
), s AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM xy GROUP BY event_type
)
SELECT event_type, n,
       CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                  / (n * sxx - sx * sx) * 1000000 + 0.5) AS BIGINT)
         AS slope_micro_cents_per_day,
       sy // n AS mean_daily_cents
FROM s
ORDER BY event_type
"""


LTTB_POINTS = 50


def lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013) —
    the standard visualization/monitoring reduction: each per-type
    hourly series shrinks to LTTB_POINTS points chosen to preserve the
    curve's visual shape (per bucket, keep the point forming the
    largest triangle with the previously kept point and the next
    bucket's centroid).

    LTTB is sequential within a series (choice i depends on choice
    i−1), so the Spark shape is groupBy(series).applyInPandas —
    state stays inside one Arrow batch per series, series run in
    parallel, and at 100 TB the reduction output (k points × series)
    is what ships to the dashboard store, not the raw telemetry.
    rows-only for the driver; pytest gates endpoints, count, subset,
    and monotonic timestamps.
    """
    ev = io.load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("h")
        )
        .agg(
            F.floor(F.sum("value") * 100 + F.lit(0.5)).cast("long").alias("cents")
        )
    )
    out_schema = "event_type STRING, h TIMESTAMP_NTZ, cents LONG, pos INT"

    def lttb(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("h").reset_index(drop=True)
        n, k = len(pdf), LTTB_POINTS
        if n <= k:
            keep = list(range(n))
        else:
            x = pdf["h"].astype("int64").to_numpy().astype(np.float64)
            y = pdf["cents"].to_numpy().astype(np.float64)
            keep = [0]
            # k-2 interior buckets over points 1..n-2
            bounds = np.linspace(1, n - 1, k - 1).astype(int)
            a = 0
            for b in range(k - 2):
                lo, hi = bounds[b], max(bounds[b + 1], bounds[b] + 1)
                nlo = bounds[b + 1]
                nhi = bounds[b + 2] if b + 2 < len(bounds) else n
                nhi = max(nhi, nlo + 1)
                cx, cy = x[nlo:nhi].mean(), y[nlo:nhi].mean()
                seg = slice(lo, hi)
                area = np.abs(
                    (x[a] - cx) * (y[seg] - y[a]) - (x[a] - x[seg]) * (cy - y[a])
                )
                a = lo + int(area.argmax())
                keep.append(a)
            keep.append(n - 1)
        res = pdf.iloc[keep].copy()
        res["pos"] = range(len(keep))
        return res[["event_type", "h", "cents", "pos"]]

    return hourly.groupBy("event_type").applyInPandas(lttb, out_schema)


def mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth per order status — the lag-based
    KPI readout every revenue dashboard runs (monthly rollup, previous
    month via lag, delta, growth rate).

    Provenance: SURVEY.md §2 Tier B temporal analytics; the reference
    syncs timestamped order rows (bin/copy-seamless-to-sharepoint.rb)
    and this is the first readout a consumer builds on them.

    Exactness: revenue is summed in integer cents
    (floor(price·100 + 0.5) — same IEEE ops both engines on identical
    doubles), and the growth rate is pure integer arithmetic,
    (delta·10⁴) div prev, where Spark `div` and DuckDB `//` both
    truncate toward zero — no float division to flap (NOTES trap 1).

    Scale posture: the monthly rollup is one map-side-combined
    groupBy to (status × months) rows — a few thousand rows at any
    corpus size — so the lag window over that tiny relation is free.
    The shuffle is on the AGGREGATED relation, never the fact table.
    """
    o = io.load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("month"),
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
        .alias("rev_cents")
    )
    w = Window.partitionBy("status").orderBy("month")
    return (
        monthly.withColumn("prev_cents", F.lag("rev_cents").over(w))
        .select(
            "status",
            "month",
            "rev_cents",
            "prev_cents",
            (F.col("rev_cents") - F.col("prev_cents")).alias("delta_cents"),
            F.expr(
                "(rev_cents - prev_cents) * 10000 div prev_cents"
            ).alias("growth_bp"),
        )
        .orderBy("status", "month")
    )


MOM_GROWTH_SQL = """
WITH monthly AS (
  SELECT o_orderstatus AS status,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_cents
  FROM orders GROUP BY 1, 2
),
lagged AS (
  SELECT status, month, CAST(rev_cents AS BIGINT) AS rev_cents,
         CAST(lag(rev_cents) OVER (PARTITION BY status ORDER BY month)
              AS BIGINT) AS prev_cents
  FROM monthly
)
-- every output CAST to BIGINT: DuckDB SUM(BIGINT) is HUGEINT (int128)
-- and the driver's value-hash is dtype-sensitive (round-2 repr-fail)
SELECT status, month, rev_cents, prev_cents,
       rev_cents - prev_cents AS delta_cents,
       (rev_cents - prev_cents) * 10000 // prev_cents AS growth_bp
FROM lagged ORDER BY status, month
"""


# ---------------------------------------------------------------------------
# Seasonal decomposition (day-of-week profile)
# ---------------------------------------------------------------------------


def seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal profile of daily revenue per event type —
    the seasonal-naive decomposition a KPI dashboard runs before any
    anomaly logic (Monday dips are seasonality, not incidents).

    Exactness discipline: per-row cent quantization then integer sums
    (the daily_zscore pattern — no float summation order anywhere);
    per-DOW and overall means are integer `div`; the seasonal ratio is
    one double division of exact BIGINTs floored onto the bp grid.
    DOW convention: ISO 1=Mon..7=Sun (Spark `weekday()+1` ==
    DuckDB `isodow`). Shape: one (type, day) rollup shuffle, one
    (type, dow) rollup, one broadcast join of the 5-row per-type
    totals — a 100 TB events table reduces at the first rollup.
    """
    ev = io.load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.sum(cents).alias("day_cents"))
    dowd = daily.groupBy(
        "event_type", (F.expr("weekday(d)") + 1).alias("dow")
    ).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("day_cents").alias("dow_cents"),
    )
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum("day_cents").alias("all_cents"),
    )
    j = dowd.join(F.broadcast(tot), "event_type")
    mean_dow = F.expr("dow_cents div n_days")
    mean_all = F.expr("all_cents div n_all")
    return j.select(
        "event_type",
        "dow",
        "n_days",
        mean_dow.alias("mean_dow_cents"),
        (mean_dow - mean_all).alias("seasonal_delta_cents"),
        F.floor(
            mean_dow.cast("double") / mean_all * 10000 + F.lit(0.5)
        ).cast("long").alias("seasonal_ratio_bp"),
    ).orderBy("event_type", "dow")


SEASONAL_DECOMPOSE_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS day_cents
  FROM events GROUP BY event_type, d
), dowd AS (
  SELECT event_type, isodow(d) AS dow, count(*) AS n_days,
         CAST(sum(day_cents) AS BIGINT) AS dow_cents
  FROM daily GROUP BY event_type, isodow(d)
), tot AS (
  SELECT event_type, count(*) AS n_all,
         CAST(sum(day_cents) AS BIGINT) AS all_cents
  FROM daily GROUP BY event_type
)
SELECT d.event_type, CAST(d.dow AS INTEGER) AS dow,
       CAST(d.n_days AS BIGINT) AS n_days,
       d.dow_cents // d.n_days AS mean_dow_cents,
       d.dow_cents // d.n_days - t.all_cents // t.n_all
         AS seasonal_delta_cents,
       CAST(floor(CAST(d.dow_cents // d.n_days AS DOUBLE)
                  / (t.all_cents // t.n_all) * 10000 + 0.5) AS BIGINT)
         AS seasonal_ratio_bp
FROM dowd d JOIN tot t USING (event_type)
ORDER BY event_type, dow
"""


# ---------------------------------------------------------------------------
# Autocorrelation (row-lag ACF over the observed daily series)
# ---------------------------------------------------------------------------

ACF_LAGS = (1, 2, 3)


def acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of daily revenue per event type at lags 1-3 —
    the seasonality/persistence probe behind forecast-model choice
    (high acf1 = momentum; acf7 spike = weekly cycle).

    Deterministic variant: residuals are centered on the TRUNCATED
    integer mean (Sy div n) so every product is an exact BIGINT —
    full-precision mean centering would put n²-scaled products beyond
    BIGINT at large SF. The ACF denominator is the full-series
    residual energy (standard estimator). Row-lag semantics: lag k
    means k OBSERVED days back (documented; the fixture grid is
    gap-free). Shape: one (type, day) rollup, one per-type window
    (partition-parallel across types), one final per-type aggregate.
    """
    ev = io.load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.sum(cents).alias("y"))
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("sum(y) div count(*)").alias("mean_trunc"),
    )
    r = daily.join(F.broadcast(m), "event_type").select(
        "event_type", "d", "n", (F.col("y") - F.col("mean_trunc")).alias("r")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = r.select(
        "event_type",
        "n",
        "r",
        *[F.lag("r", k).over(w).alias(f"r{k}") for k in ACF_LAGS],
    )
    num = [
        F.sum(
            F.when(F.col(f"r{k}").isNotNull(), F.col("r") * F.col(f"r{k}"))
            .otherwise(F.lit(0))
        ).alias(f"num{k}")
        for k in ACF_LAGS
    ]
    agg = lagged.groupBy("event_type", "n").agg(
        F.sum(F.col("r") * F.col("r")).alias("den"), *num
    )
    return agg.select(
        "event_type",
        "n",
        *[
            F.floor(
                F.col(f"num{k}").cast("double") / F.col("den") * 10000
                + F.lit(0.5)
            ).cast("long").alias(f"acf{k}_bp")
            for k in ACF_LAGS
        ],
    ).orderBy("event_type")


ACF_LAGS_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY event_type, d
), m AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(y) AS BIGINT) // count(*) AS mean_trunc
  FROM daily GROUP BY event_type
), r AS (
  SELECT daily.event_type, d, n, y - mean_trunc AS r
  FROM daily JOIN m USING (event_type)
), lagged AS (
  SELECT event_type, n, r,
         lag(r, 1) OVER (PARTITION BY event_type ORDER BY d) AS r1,
         lag(r, 2) OVER (PARTITION BY event_type ORDER BY d) AS r2,
         lag(r, 3) OVER (PARTITION BY event_type ORDER BY d) AS r3
  FROM r
), agg AS (
  SELECT event_type, n,
         CAST(sum(r * r) AS BIGINT) AS den,
         CAST(sum(CASE WHEN r1 IS NOT NULL THEN r * r1 ELSE 0 END) AS BIGINT) AS num1,
         CAST(sum(CASE WHEN r2 IS NOT NULL THEN r * r2 ELSE 0 END) AS BIGINT) AS num2,
         CAST(sum(CASE WHEN r3 IS NOT NULL THEN r * r3 ELSE 0 END) AS BIGINT) AS num3
  FROM lagged GROUP BY event_type, n
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(floor(CAST(num1 AS DOUBLE) / den * 10000 + 0.5) AS BIGINT) AS acf1_bp,
       CAST(floor(CAST(num2 AS DOUBLE) / den * 10000 + 0.5) AS BIGINT) AS acf2_bp,
       CAST(floor(CAST(num3 AS DOUBLE) / den * 10000 + 0.5) AS BIGINT) AS acf3_bp
FROM agg ORDER BY event_type
"""



# ---------------------------------------------------------------------------
# Robust anomaly detection (median absolute deviation)
# ---------------------------------------------------------------------------

MAD_K_BP = 44_478  # 3 × 1.4826 (normal-consistency constant) in bp


def mad_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-revenue anomalies per event type: flag days where
    |x − median| · 10⁴ > 44478 · MAD — the 3σ rule with median/MAD
    instead of mean/stddev, immune to the anomalies polluting their
    own threshold (the known failure mode of ts_daily_zscore on short
    series with big spikes).

    Exactness: daily cents are exact integers; median and MAD come
    from the exact interpolating percentile (Spark `percentile` ≡
    DuckDB `quantile_cont`, the agg_percentiles pairing), whose .5
    midpoints are exactly representable doubles at cent scale — the
    flag comparison multiplies integers by exact-dyadic doubles, so no
    1e-6 tolerance is needed. Shape: one daily rollup, two tiny
    per-type aggregates (second pass for MAD — deviations need the
    median first), one broadcast join back. At 100 TB the rollup is
    the only data-sized exchange; the percentile state is per-type
    daily values (bounded by the calendar).
    """
    ev = io.load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.sum(cents).alias("y"))
    med = daily.groupBy("event_type").agg(
        F.expr("percentile(y, 0.5)").alias("med")
    )
    # persist dev (NOT daily): mad and the flag pass both read it, so
    # caching here caps the fact scans at the two passes MAD inherently
    # needs (median before deviations). daily itself must stay
    # uncached — its canonicalized plan is the SAME daily-cents rollup
    # half the ts family builds, and Spark's cache manager matches
    # cached relations by canonical plan, so persisting it hijacks
    # ts_acf/seasonal/cusum/theil_sen plans (order-dependent golden
    # flips — the trap-17 variant where YOUR cache rewrites OTHER
    # queries). dev's med-join subtree is unique to this operator.
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("y") - F.col("med"))
    ).persist()
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    flagged = dev.join(F.broadcast(mad), "event_type").withColumn(
        "is_anomaly",
        (F.col("adev") * 10000 > F.lit(MAD_K_BP) * F.col("mad")).cast("int"),
    )
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("is_anomaly").alias("n_anomalies"),
        F.floor(F.min("med")).cast("long").alias("median_cents_floor"),
        F.floor(F.min("mad")).cast("long").alias("mad_cents_floor"),
        # -1 sentinel: a no-anomaly type must not emit NULL (NULL cells
        # sort/hash differently through value canonicalizers)
        F.coalesce(
            F.max(F.when(F.col("is_anomaly") == 1, F.col("y"))),
            F.lit(-1).cast("long"),
        ).alias("max_anomalous_cents"),
    ).orderBy("event_type")


MAD_ANOMALIES_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
med AS (
  SELECT event_type, quantile_cont(y, 0.5) AS med FROM daily GROUP BY event_type
),
dev AS (
  SELECT daily.event_type, y, abs(y - med) AS adev
  FROM daily JOIN med USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad
  FROM dev GROUP BY event_type
),
flagged AS (
  SELECT dev.event_type, y, adev, mad,
         CASE WHEN adev * 10000 > {MAD_K_BP} * mad THEN 1 ELSE 0 END
           AS is_anomaly
  FROM dev JOIN mad USING (event_type)
)
SELECT f.event_type,
       count(*) AS n_days,
       CAST(sum(is_anomaly) AS BIGINT) AS n_anomalies,
       CAST(floor(min(m.med)) AS BIGINT) AS median_cents_floor,
       CAST(floor(min(f.mad)) AS BIGINT) AS mad_cents_floor,
       coalesce(max(CASE WHEN is_anomaly = 1 THEN y END),
                CAST(-1 AS BIGINT)) AS max_anomalous_cents
FROM flagged f JOIN med m USING (event_type)
GROUP BY f.event_type ORDER BY f.event_type
"""


# ---------------------------------------------------------------------------
# Kaplan–Meier survival (user churn)
# ---------------------------------------------------------------------------

KM_CENSOR_DAYS = 3  # still active within the last 3 days → censored


def kaplan_meier_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve of user lifetimes: duration = days
    between a user's first and last event; users last seen within
    KM_CENSOR_DAYS of the corpus end are right-CENSORED (still alive),
    everyone else churned at their last day. S(t) = Π_{tᵢ≤t}
    (1 − dᵢ/nᵢ) — the estimator that makes censoring honest instead of
    counting still-active users as churned.

    Shape: one user rollup (the only data-sized exchange), a broadcast
    1-row anchor, then the whole lifetime distribution is a ≤31-row
    relation — risk sets via suffix sums and the survival product via
    a fixed-order array fold (pure IEEE multiplication, no libm, so
    the ppm floor is bit-identical across engines; DuckDB scalar-
    accumulator list_reduce is sound — trap 18 breaks only struct
    state). Output one row per observed churn/censor day.
    """
    ev = io.load_table(spark, sf_dir, "events")
    # persist: the anchor derives from this rollup (max last-day ==
    # max event day) and the lifetimes read it again — uncached, the
    # events scan would run once per reference
    user = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    ).persist()
    anchor = user.agg(F.max("d1").alias("dmax"))
    life = user.crossJoin(F.broadcast(anchor)).select(
        F.datediff("d1", "d0").cast("long").alias("t"),
        (F.datediff("dmax", "d1") < KM_CENSOR_DAYS).cast("int").alias("censored"),
    )
    per_t = life.groupBy("t").agg(
        F.sum(F.lit(1) - F.col("censored")).alias("d"),
        F.sum("censored").alias("c"),
    )
    # suffix sums on the ≤31-row duration relation (tiny-relation
    # exception to the no-global-window rule)
    wt = Window.orderBy(F.asc("t")).rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    risk = per_t.withColumn("n_at_risk", F.sum(F.col("d") + F.col("c")).over(wt))
    # survival product: collect the ordered (t, 1 - d/n) factors once
    # and fold prefixes — deterministic order, pure multiplication
    factors = risk.select(
        "t", "d", "c", "n_at_risk",
        (F.lit(1.0) - F.col("d").cast("double") / F.col("n_at_risk")).alias("f"),
    ).persist()  # referenced by all_f AND the output join
    all_f = factors.agg(
        F.array_sort(F.collect_list(F.struct("t", "f"))).alias("fs")
    )
    out = factors.crossJoin(F.broadcast(all_f)).select(
        "t",
        "d",
        "c",
        "n_at_risk",
        F.floor(
            F.expr(
                "aggregate(filter(fs, s -> s.t <= t), CAST(1.0 AS DOUBLE),"
                " (acc, s) -> acc * s.f)"
            )
            * 1000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("surv_ppm"),
    )
    return out.orderBy("t")


KAPLAN_MEIER_SQL = f"""
WITH user_life AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
  FROM events GROUP BY user_id
),
anchor AS (SELECT max(CAST(ts AS DATE)) AS dmax FROM events),
life AS (
  SELECT CAST(datediff('day', d0, d1) AS BIGINT) AS t,
         CASE WHEN datediff('day', d1, dmax) < {KM_CENSOR_DAYS}
              THEN 1 ELSE 0 END AS censored
  FROM user_life, anchor
),
per_t AS (
  SELECT t, CAST(sum(1 - censored) AS BIGINT) AS d,
         CAST(sum(censored) AS BIGINT) AS c
  FROM life GROUP BY t
),
risk AS (
  SELECT *, CAST(sum(d + c) OVER (ORDER BY t ASC
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
              AS n_at_risk
  FROM per_t
),
factors AS (
  SELECT t, d, c, n_at_risk,
         1.0 - CAST(d AS DOUBLE) / n_at_risk AS f
  FROM risk
),
fs AS (
  SELECT list(struct_pack(t := t, f := f) ORDER BY t) AS fs FROM factors
)
SELECT factors.t, d, c, n_at_risk,
       CAST(floor(list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
              list_transform(list_filter(fs, s -> s.t <= factors.t),
                             s -> s.f)),
              (acc, x) -> acc * x) * 1000000 + 0.5) AS BIGINT) AS surv_ppm
FROM factors, fs
ORDER BY factors.t
"""


# ---------------------------------------------------------------------------
# M4 visual downsampling
# ---------------------------------------------------------------------------

M4_BUCKETS = 16


def m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling per event type: split each series' time range
    into 16 equal pixel buckets and keep min/max/first/last value per
    bucket — the error-free line-chart reduction (M4 provably renders
    the identical pixel line), the exact counterpart to the heuristic
    LTTB twin (`ts_lttb_downsample`).

    Unlike LTTB (sequential triangle walk → applyInPandas), M4 is a
    PURE HASH AGGREGATE: bucket = (ts − t₀)·16/(t₁ − t₀ + 1) is a
    per-row expression off broadcast bounds, and min/max_by give the
    four anchors in one map-side-combining pass — the shape that
    downsamples a 100 TB series without any per-key sequential state.
    Integer cents + microsecond integers throughout; exactly oracled
    (ties on equal timestamps broken by event_id via min_by/max_by on
    the (ts, id) struct).
    """
    ev = io.load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    base = ev.select(
        "event_type",
        F.expr("ts_ns div 1000").alias("ts_us"),
        "event_id",
        cents.alias("v"),
    )
    bounds = base.groupBy("event_type").agg(
        F.min("ts_us").alias("t0"), F.max("ts_us").alias("t1")
    )
    b = base.join(F.broadcast(bounds), "event_type").withColumn(
        "bucket",
        F.expr(f"(ts_us - t0) * {M4_BUCKETS} div (t1 - t0 + 1)"),
    )
    # first/last with a composite (ts, id) tie-break via MIN/MAX over a
    # lexicographically-ordered struct — DuckDB 1.0's min_by only binds
    # scalar keys, but struct MIN orders field-by-field on both engines
    keyed = F.struct("ts_us", "event_id", "v")
    return (
        b.groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("v").alias("v_min"),
            F.max("v").alias("v_max"),
            F.min(keyed)["v"].alias("v_first"),
            F.max(keyed)["v"].alias("v_last"),
        )
        .orderBy("event_type", "bucket")
    )


M4_DOWNSAMPLE_SQL = f"""
WITH base AS (
  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
  FROM events
),
bounds AS (
  SELECT event_type, min(ts_us) AS t0, max(ts_us) AS t1
  FROM base GROUP BY event_type
),
b AS (
  SELECT base.event_type, ts_us, event_id, v,
         (ts_us - t0) * {M4_BUCKETS} // (t1 - t0 + 1) AS bucket
  FROM base JOIN bounds USING (event_type)
)
SELECT event_type, bucket,
       count(*) AS n_points,
       min(v) AS v_min,
       max(v) AS v_max,
       min(struct_pack(a := ts_us, b := event_id, v := v)).v AS v_first,
       max(struct_pack(a := ts_us, b := event_id, v := v)).v AS v_last
FROM b GROUP BY event_type, bucket
ORDER BY event_type, bucket
"""


# ---------------------------------------------------------------------------
# OHLC daily candlesticks
# ---------------------------------------------------------------------------


def ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC (open/high/low/close) candlesticks per event type —
    the canonical bar-chart resample for any metered value stream
    (finance candles, sensor rollups, billing meters).

    Pure ONE-PASS hash aggregate (the `ts_m4_downsample` shape): open
    and close are MIN/MAX over a lexicographically-ordered
    (ts, event_id, value) struct — a composite-key arg-min that both
    engines implement as field-by-field struct comparison, so equal
    timestamps break ties identically — and high/low/volume are plain
    min/max/sum. No window, no join: a 100 TB stream reduces map-side
    to (type × days) rows in a single exchange. Integer cents
    throughout (NOTES trap 1).
    """
    ev = io.load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    base = ev.select(
        "event_type",
        F.to_date("ts").alias("d"),
        F.expr("ts_ns div 1000").alias("ts_us"),
        "event_id",
        cents.alias("v"),
    )
    keyed = F.struct("ts_us", "event_id", "v")
    return (
        base.groupBy("event_type", "d")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min(keyed)["v"].alias("open_cents"),
            F.max("v").alias("high_cents"),
            F.min("v").alias("low_cents"),
            F.max(keyed)["v"].alias("close_cents"),
            F.sum("v").alias("volume_cents"),
        )
        .orderBy("event_type", "d")
    )


OHLC_RESAMPLE_SQL = """
WITH base AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
  FROM events
)
SELECT event_type, d,
       count(*) AS n_points,
       min(struct_pack(a := ts_us, b := event_id, v := v)).v AS open_cents,
       max(v) AS high_cents,
       min(v) AS low_cents,
       max(struct_pack(a := ts_us, b := event_id, v := v)).v AS close_cents,
       CAST(sum(v) AS BIGINT) AS volume_cents
FROM base GROUP BY event_type, d
ORDER BY event_type, d
"""


# ---------------------------------------------------------------------------
# Interval-union coverage (merge overlapping intervals, total length)
# ---------------------------------------------------------------------------

# every event opens a fixed activity interval [ts, ts + 5 min)
COVERAGE_WINDOW_S = 300


def interval_union_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity coverage: every event opens a
    [ts, ts+{COVERAGE_WINDOW_S}s) interval; overlapping intervals merge
    and the query reports each user's merged-island count and total
    covered seconds — the classic interval-union problem behind uptime,
    billing-meter, and session-coverage accounting (a plain SUM
    double-counts overlaps; DISTINCT on timestamps doesn't help).

    Shape: the standard gaps-and-islands sweep — per-user windows
    ordered by start: an interval starts a new island iff its start
    exceeds the running max of all previous ends (strictly-before
    ``max().over(rowsBetween(unboundedPreceding, -1))``), island id =
    running count of starts, then one aggregate per island and one per
    user. Both windows partition by user_id, so at 100 TB this is hash
    parallelism over users with no global window anywhere. Pure
    microsecond integers (NOTES trap 1).
    """
    ev = io.load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.expr("ts_ns div 1000").alias("s_us"),
        F.expr(f"ts_ns div 1000 + {COVERAGE_WINDOW_S} * 1000000").alias("e_us"),
    )
    w = Window.partitionBy("user_id").orderBy("s_us", "e_us")
    prev_max_end = F.max("e_us").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(
            prev_max_end.isNull() | (F.col("s_us") > prev_max_end), 1
        ).otherwise(0),
    ).withColumn(
        "island",
        F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    islands = flagged.groupBy("user_id", "island").agg(
        F.min("s_us").alias("i_start"),
        F.max("e_us").alias("i_end"),
        F.count(F.lit(1)).alias("n_iv"),
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.sum("n_iv").cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_islands"),
            F.expr("sum(i_end - i_start) div 1000000")
            .cast("long")
            .alias("covered_s"),
        )
        .orderBy("user_id")
    )


INTERVAL_UNION_SQL = f"""
WITH iv AS (
  SELECT user_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS s_us,
         epoch_us(CAST(ts AS TIMESTAMP)) + {COVERAGE_WINDOW_S} * 1000000
           AS e_us
  FROM events
),
flagged AS (
  SELECT user_id, s_us, e_us,
         CASE WHEN max(e_us) OVER (PARTITION BY user_id ORDER BY s_us, e_us
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) IS NULL
                   OR s_us > max(e_us) OVER (PARTITION BY user_id
                                             ORDER BY s_us, e_us
                                             ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
numbered AS (
  SELECT user_id, s_us, e_us,
         sum(new_island) OVER (PARTITION BY user_id ORDER BY s_us, e_us
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS island
  FROM flagged
),
islands AS (
  SELECT user_id, island, min(s_us) AS i_start, max(e_us) AS i_end,
         count(*) AS n_iv
  FROM numbered GROUP BY user_id, island
)
SELECT user_id,
       CAST(sum(n_iv) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(i_end - i_start) // 1000000 AS BIGINT) AS covered_s
FROM islands GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Event study (pre/post window contrast around an anchor event)
# ---------------------------------------------------------------------------

EVENT_STUDY_WINDOW_S = 3600  # ±1 h around each purchase


def event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-study contrast around purchases: for each user's purchase
    events, compare the user's OTHER event values in the hour before
    vs the hour after — the causal-ish readout (did behavior shift
    after the anchor?) every experimentation/monitoring stack builds
    from an event stream.

    Shape: anchors (purchases) band-join the same user's other events
    on user_id plus a ±window range predicate — an equi-key join whose
    range residual AQE evaluates inside the hash match, never a
    cross-product across users. Per-anchor pre/post counts and cent
    sums roll up to one global row of integer means and a delta — all
    BIGINT arithmetic (NOTES trap 1). At 100 TB the user-key shuffle
    is the only corpus exchange; a time-bucketed co-partitioning would
    bound per-key fan-out if single users spanned machines.
    """
    ev = io.load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_id",
        F.expr("ts_ns div 1000").alias("us"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("v"),
        "event_type",
    )
    anchors = base.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("a_user"),
        F.col("event_id").alias("a_id"),
        F.col("us").alias("a_us"),
    )
    W = EVENT_STUDY_WINDOW_S * 1_000_000
    joined = anchors.join(
        base,
        (F.col("a_user") == F.col("user_id"))
        & (F.col("event_id") != F.col("a_id"))
        & (F.col("us") >= F.col("a_us") - W)
        & (F.col("us") <= F.col("a_us") + W),
    )
    per_anchor = joined.groupBy("a_id").agg(
        F.sum(F.when(F.col("us") < F.col("a_us"), 1).otherwise(0)).alias("n_pre"),
        F.sum(F.when(F.col("us") < F.col("a_us"), F.col("v")).otherwise(0)).alias(
            "s_pre"
        ),
        F.sum(F.when(F.col("us") > F.col("a_us"), 1).otherwise(0)).alias("n_post"),
        F.sum(F.when(F.col("us") > F.col("a_us"), F.col("v")).otherwise(0)).alias(
            "s_post"
        ),
    )
    n_anchors = anchors.agg(F.count(F.lit(1)).alias("n_purchases"))
    return per_anchor.agg(
        F.count(F.lit(1)).cast("long").alias("n_anchors_with_neighbors"),
        F.sum("n_pre").cast("long").alias("n_pre_events"),
        F.sum("n_post").cast("long").alias("n_post_events"),
        F.expr("sum(s_pre) div greatest(sum(n_pre), 1)")
        .cast("long")
        .alias("pre_mean_cents"),
        F.expr("sum(s_post) div greatest(sum(n_post), 1)")
        .cast("long")
        .alias("post_mean_cents"),
        F.expr(
            "sum(s_post) div greatest(sum(n_post), 1)"
            " - sum(s_pre) div greatest(sum(n_pre), 1)"
        )
        .cast("long")
        .alias("delta_cents"),
    ).crossJoin(F.broadcast(n_anchors)).select(
        F.col("n_purchases").cast("long").alias("n_purchases"),
        "n_anchors_with_neighbors",
        "n_pre_events",
        "n_post_events",
        "pre_mean_cents",
        "post_mean_cents",
        "delta_cents",
    )


EVENT_STUDY_SQL = f"""
WITH base AS (
  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v, event_type
  FROM events
),
anchors AS (
  SELECT user_id AS a_user, event_id AS a_id, us AS a_us
  FROM base WHERE event_type = 'purchase'
),
joined AS (
  SELECT a_id, us, a_us, v
  FROM anchors JOIN base
    ON a_user = user_id AND event_id <> a_id
   AND us >= a_us - {EVENT_STUDY_WINDOW_S * 1_000_000}
   AND us <= a_us + {EVENT_STUDY_WINDOW_S * 1_000_000}
),
per_anchor AS (
  SELECT a_id,
         sum(CASE WHEN us < a_us THEN 1 ELSE 0 END) AS n_pre,
         sum(CASE WHEN us < a_us THEN v ELSE 0 END) AS s_pre,
         sum(CASE WHEN us > a_us THEN 1 ELSE 0 END) AS n_post,
         sum(CASE WHEN us > a_us THEN v ELSE 0 END) AS s_post
  FROM joined GROUP BY a_id
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM anchors) AS n_purchases,
       CAST(count(*) AS BIGINT) AS n_anchors_with_neighbors,
       CAST(sum(n_pre) AS BIGINT) AS n_pre_events,
       CAST(sum(n_post) AS BIGINT) AS n_post_events,
       CAST(sum(s_pre) // greatest(sum(n_pre), 1) AS BIGINT)
         AS pre_mean_cents,
       CAST(sum(s_post) // greatest(sum(n_post), 1) AS BIGINT)
         AS post_mean_cents,
       CAST(sum(s_post) // greatest(sum(n_post), 1)
            - sum(s_pre) // greatest(sum(n_pre), 1) AS BIGINT)
         AS delta_cents
FROM per_anchor
"""


# ---------------------------------------------------------------------------
# Bollinger-band breakouts (rolling mean ± 2σ, integer-exact test)
# ---------------------------------------------------------------------------

BOLL_WINDOW = 7  # trailing days incl. current


def bollinger_breakouts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days whose revenue breaks out of its trailing-{BOLL_WINDOW}-day
    Bollinger band (mean ± 2σ) per event type — the volatility-scaled
    breakout alert dashboards layer over any metered series.

    The band test never computes σ: |x−µ| > 2σ is cross-multiplied to
    (x·n − s)² > 4·(n·s₂ − s²) over the frame's exact integer sums
    (x, s = Σcents, s₂ = Σcents² — per-row cent quantization first,
    NOTES trap 1), so the flag set is bit-reproducible; the magnitudes
    stay under BIGINT because the frame is {BOLL_WINDOW} days of cent
    sums (squares ≤ ~5·10¹⁵ at 100× fixture scale — the docstring
    contract a wider frame must re-check). One (type, day) rollup
    shuffle; both window passes ride one type-keyed sort.
    """
    ev = io.load_table(spark, sf_dir, "events")
    cents_row = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(cents_row).alias("x")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-(BOLL_WINDOW - 1), 0)
    )
    framed = daily.select(
        "event_type",
        "d",
        "x",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("s"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("s2"),
    ).filter(F.col("n") == BOLL_WINDOW)
    lhs = (F.col("x") * F.col("n") - F.col("s")) * (
        F.col("x") * F.col("n") - F.col("s")
    )
    rhs = 4 * (F.col("n") * F.col("s2") - F.col("s") * F.col("s"))
    return (
        framed.filter(lhs > rhs)
        .select(
            "event_type",
            "d",
            F.col("x").alias("day_cents"),
            F.expr("s div n").cast("long").alias("band_mean_cents"),
            (lhs - rhs).cast("long").alias("breach_sq_margin"),
        )
        .orderBy("event_type", "d")
    )


BOLLINGER_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
framed AS (
  SELECT event_type, d, x,
         count(*) OVER w AS n,
         CAST(sum(x) OVER w AS BIGINT) AS s,
         CAST(sum(x * x) OVER w AS BIGINT) AS s2
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN {BOLL_WINDOW - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_type, d, x AS day_cents,
       s // n AS band_mean_cents,
       CAST((x * n - s) * (x * n - s)
            - 4 * (n * s2 - s * s) AS BIGINT) AS breach_sq_margin
FROM framed
WHERE n = {BOLL_WINDOW}
  AND (x * n - s) * (x * n - s) > 4 * (n * s2 - s * s)
ORDER BY event_type, d
"""


# ---------------------------------------------------------------------------
# Seasonal-residual anomalies (deseasonalize, then robust flag)
# ---------------------------------------------------------------------------


def seasonal_residual_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days anomalous AFTER removing day-of-week seasonality: residual
    r = daily cents − the type's integer DOW mean (the
    `ts_seasonal_decompose` profile), flagged when |r−µᵣ| > 2.5σᵣ —
    the detector that stops Monday dips from paging as incidents,
    which the raw-cohort `ts_daily_zscore_anomalies` cannot do.

    Exactness: residuals and their Σr/Σr² are exact BIGINTs; the 2.5σ
    test is cross-multiplied to 4·(r·n−Σr)² > 25·(n·Σr²−(Σr)²) and
    evaluated in DOUBLE from those exact integers (products exceed
    BIGINT at corpus scale; identical int→double conversions and IEEE
    multiplies on both engines — the `diag_cramers_v` discipline).
    Shape: one (type, day) rollup, one 7-row-per-type DOW rollup
    broadcast back, one per-type stats rollup broadcast back — the
    corpus reduces at the first aggregate.
    """
    ev = io.load_table(spark, sf_dir, "events")
    cents_row = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(cents_row).alias("x")
    )
    dowd = daily.groupBy(
        "event_type", (F.expr("weekday(d)") + 1).alias("dow")
    ).agg(
        F.count(F.lit(1)).alias("nd"), F.sum("x").alias("sx")
    ).select(
        "event_type", "dow", F.expr("sx div nd").alias("dow_mean")
    )
    resid = daily.select(
        "event_type", "d", (F.expr("weekday(d)") + 1).alias("dow"), "x"
    ).join(F.broadcast(dowd), ["event_type", "dow"]).select(
        "event_type", "d", "dow", "x", (F.col("x") - F.col("dow_mean")).alias("r")
    )
    stats = resid.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r").alias("sr"),
        F.sum(F.col("r") * F.col("r")).alias("sr2"),
    )
    j = resid.join(F.broadcast(stats), "event_type")
    dev = (F.col("r") * F.col("n") - F.col("sr")).cast("double")
    spread = (
        F.col("n") * F.col("sr2") - F.col("sr") * F.col("sr")
    ).cast("double")
    return (
        j.filter(4 * dev * dev > 25 * spread)
        .select(
            "event_type",
            "d",
            F.col("dow").cast("long").alias("dow"),
            F.col("x").alias("day_cents"),
            F.col("r").cast("long").alias("residual_cents"),
        )
        .orderBy("event_type", "d")
    )


SEASONAL_RESIDUAL_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
dowd AS (
  SELECT event_type, isodow(d) AS dow,
         CAST(sum(x) AS BIGINT) // count(*) AS dow_mean
  FROM daily GROUP BY event_type, isodow(d)
),
resid AS (
  SELECT daily.event_type, d, isodow(d) AS dow, x, x - dow_mean AS r
  FROM daily JOIN dowd
    ON daily.event_type = dowd.event_type AND isodow(d) = dowd.dow
),
stats AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(r) AS BIGINT) AS sr,
         CAST(sum(r * r) AS BIGINT) AS sr2
  FROM resid GROUP BY event_type
)
SELECT resid.event_type, d, CAST(dow AS BIGINT) AS dow,
       x AS day_cents, CAST(r AS BIGINT) AS residual_cents
FROM resid JOIN stats ON resid.event_type = stats.event_type
WHERE 4 * CAST(r * n - sr AS DOUBLE) * CAST(r * n - sr AS DOUBLE)
      > 25 * CAST(n * sr2 - sr * sr AS DOUBLE)
ORDER BY resid.event_type, d
"""


PURGED_FOLDS = 5
PURGED_EMBARGO_MONTHS = 1  # gap between train end and test start
_PURGED_YEARS_PER_FOLD = 1  # each fold's test window is 12 months


def purged_walkforward_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward (expanding-window) cross-validation split with an
    embargo — the time-series analog of ``text_leakage_safe_split``:
    fold k trains on everything BEFORE its test year minus an embargo
    month, tests on the year itself, and the embargo rows between them
    belong to NEITHER side, so trailing features computed on train rows
    can never overlap the test window (the purged-CV rule from the
    financial-ML literature).

    Everything is exact month-index arithmetic (year·12 + month, BIGINT)
    off a 1-row min-month frontier cross-joined onto the facts; the
    fold table is {PURGED_FOLDS} literal broadcast rows, so classifying
    every (row, fold) combination is a constant-factor row explode
    followed by a CASE — no window, no self-join. The output is the
    per-fold audit (train/embargo/test/future row counts) a pipeline
    logs before training. One fact scan, one map-side-combined
    (folds·4)-group aggregate. Exactly oracled.
    """
    o = io.load_table(spark, sf_dir, "orders").select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("m")
    )
    anchor = o.agg(F.min("m").alias("m0"))
    folds = spark.createDataFrame(
        [(k,) for k in range(PURGED_FOLDS)], "fold long"
    )
    span = 12 * _PURGED_YEARS_PER_FOLD
    classified = (
        o.join(F.broadcast(anchor))
        .join(F.broadcast(folds))
        .select(
            "fold",
            F.expr(
                f"""CASE
                  WHEN m <  m0 + (fold + 1) * {span} - {PURGED_EMBARGO_MONTHS}
                    THEN 'train'
                  WHEN m <  m0 + (fold + 1) * {span} THEN 'embargo'
                  WHEN m <  m0 + (fold + 2) * {span} THEN 'test'
                  ELSE 'future' END"""
            ).alias("part"),
        )
    )
    return (
        classified.groupBy("fold")
        .agg(
            F.count(F.when(F.col("part") == "train", 1)).cast("long").alias("n_train"),
            F.count(F.when(F.col("part") == "embargo", 1))
            .cast("long")
            .alias("n_embargo"),
            F.count(F.when(F.col("part") == "test", 1)).cast("long").alias("n_test"),
            F.count(F.when(F.col("part") == "future", 1))
            .cast("long")
            .alias("n_future"),
        )
        .orderBy("fold")
    )


def _purged_split_sql() -> str:
    span = 12 * _PURGED_YEARS_PER_FOLD
    fold_rows = ", ".join(f"({k})" for k in range(PURGED_FOLDS))
    return f"""
WITH m_ AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS m
  FROM orders
),
anchor AS (SELECT min(m) AS m0 FROM m_),
folds AS (SELECT * FROM (VALUES {fold_rows}) AS f(fold)),
classified AS (
  SELECT fold,
         CASE
           WHEN m <  m0 + (fold + 1) * {span} - {PURGED_EMBARGO_MONTHS}
             THEN 'train'
           WHEN m <  m0 + (fold + 1) * {span} THEN 'embargo'
           WHEN m <  m0 + (fold + 2) * {span} THEN 'test'
           ELSE 'future' END AS part
  FROM m_ CROSS JOIN anchor CROSS JOIN folds
)
SELECT CAST(fold AS BIGINT) AS fold,
       CAST(count(*) FILTER (part = 'train') AS BIGINT) AS n_train,
       CAST(count(*) FILTER (part = 'embargo') AS BIGINT) AS n_embargo,
       CAST(count(*) FILTER (part = 'test') AS BIGINT) AS n_test,
       CAST(count(*) FILTER (part = 'future') AS BIGINT) AS n_future
FROM classified GROUP BY fold ORDER BY fold
"""


PURGED_SPLIT_SQL = _purged_split_sql()


QUERIES = {
    "ts_resample_ffill": (resample_ffill, RESAMPLE_FFILL_SQL),
    "ts_mom_growth": (mom_growth, MOM_GROWTH_SQL),
    "ts_scd2_intervals": (scd2_intervals, SCD2_SQL),
    "ts_interval_overlap_join": (interval_overlap_join, _interval_overlap_sql()),
    "ts_ewma": (ewma_per_user, EWMA_SQL),
    "ts_holt_linear": (holt_linear, HOLT_LINEAR_SQL),
    "ts_cusum_changepoint": (cusum_changepoint, CUSUM_SQL),
    "ts_theil_sen": (theil_sen_slope, THEIL_SEN_SQL),
    "ts_sax_symbolic": (sax_symbolic, SAX_SYMBOLIC_SQL),
    "ts_linear_interpolate": (linear_interpolate, LINEAR_INTERPOLATE_SQL),
    "ts_daily_zscore_anomalies": (daily_zscore_anomalies, DAILY_ZSCORE_SQL),
    "ts_lttb_downsample": (lttb_downsample, None),
    "ts_trend_slope": (trend_slope, TREND_SLOPE_SQL),
    "ts_seasonal_decompose": (seasonal_decompose, SEASONAL_DECOMPOSE_SQL),
    "ts_acf_lags": (acf_lags, ACF_LAGS_SQL),
    "ts_mad_anomalies": (mad_anomalies, MAD_ANOMALIES_SQL),
    "ts_kaplan_meier": (kaplan_meier_churn, KAPLAN_MEIER_SQL),
    "ts_m4_downsample": (m4_downsample, M4_DOWNSAMPLE_SQL),
    "ts_ohlc_resample": (ohlc_resample, OHLC_RESAMPLE_SQL),
    "ts_interval_union_length": (interval_union_length, INTERVAL_UNION_SQL),
    "ts_event_study": (event_study, EVENT_STUDY_SQL),
    "ts_bollinger_breakouts": (bollinger_breakouts, BOLLINGER_SQL),
    "ts_seasonal_residual_anomalies": (
        seasonal_residual_anomalies,
        SEASONAL_RESIDUAL_SQL,
    ),
    "ts_purged_walkforward_split": (purged_walkforward_split, PURGED_SPLIT_SQL),
}
