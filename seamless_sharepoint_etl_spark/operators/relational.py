"""Projection / filter / CASE / null-handling operators (SURVEY.md §2 Tier B).

All pure Catalyst built-ins: predicates are written declaratively so
they reach the parquet scan (`PushedFilters`), and projections prune the
read schema. Nothing here shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import io


def validate(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Data-quality expectations: annotate each row with its failed rules.

    ``rules`` maps rule name → boolean Column (true = pass). Output adds
    ``failed_rules array<string>`` (empty = clean row). Callers split
    with ``filter(size(failed_rules) == 0)`` — one scan, two sinks, the
    quarantine pattern every ingestion pipeline needs at scale. Pure
    projection: no shuffle, pushdown-transparent.
    """
    failed = F.array_compact(
        F.array(
            *[
                F.when(~rule, F.lit(name)).otherwise(F.lit(None))
                for name, rule in rules.items()
            ]
        )
    )
    return df.withColumn("failed_rules", failed)


def project_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive + disjunctive + range + IN + LIKE predicates over lineitem.

    Mirrors the reference's pushed-down source filter (A3/A4,
    bin/copy-seamless-to-sharepoint.rb:76-84) generalized to a full
    predicate language. Every predicate is scan-pushable.
    """
    li = io.load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 25.0)
        & (F.col("l_discount").between(0.02, 0.08))
        & (F.col("l_returnflag").isin("A", "R") | (F.col("l_linestatus") == "O"))
        & F.col("l_shipdate").between("1995-01-01", "1998-12-31")
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
        "l_linestatus",
    )


PROJECT_FILTER_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag, l_linestatus
FROM lineitem
WHERE l_quantity > 25.0
  AND l_discount BETWEEN 0.02 AND 0.08
  AND (l_returnflag IN ('A', 'R') OR l_linestatus = 'O')
  AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1998-12-31'
"""


def project_derived_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived columns + LIKE + negation over part."""
    p = io.load_table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").like("%a%") & ~F.col("p_brand").like("Brand#1%"))
        .select(
            "p_partkey",
            "p_name",
            F.round(F.col("p_retailprice") * 1.1, 2).alias("price_with_tax"),
            (F.col("p_size") * 2).alias("double_size"),
            F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        )
    )


PROJECT_DERIVED_SQL = """
SELECT p_partkey, p_name,
       round(p_retailprice * 1.1, 2) AS price_with_tax,
       p_size * 2 AS double_size,
       concat_ws('/', p_brand, p_type) AS brand_type
FROM part
WHERE p_name LIKE '%a%' AND p_brand NOT LIKE 'Brand#1%'
"""


def case_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE / coalesce / nullif / null-safe predicates over orders.

    Nulls are *manufactured* with nullif (the fixtures are null-free;
    FIXTURES.md edge-case rules) so null propagation is actually
    exercised: nullif → CASE over null → coalesce fallback → IS NULL
    filter arm.
    """
    o = io.load_table(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select(
        "o_orderkey",
        status_or_null.alias("status_nullable"),
        F.coalesce(status_or_null, F.lit("PENDING")).alias("status_filled"),
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.when(status_or_null.isNull(), 1).otherwise(0).alias("is_pending"),
    )


CASE_NULL_SQL = """
SELECT o_orderkey,
       nullif(o_orderstatus, 'P') AS status_nullable,
       coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_filled,
       CASE WHEN o_totalprice > 200000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END AS price_band,
       CASE WHEN nullif(o_orderstatus, 'P') IS NULL THEN 1 ELSE 0 END AS is_pending
FROM orders
"""


def validate_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations over orders: three rules, per-rule failure counts +
    clean/quarantine split sizes — the audit summary a DQ gate emits."""
    o = io.load_table(spark, sf_dir, "orders")
    checked = validate(
        o,
        {
            "positive_price": F.col("o_totalprice") > 0,
            "known_status": F.col("o_orderstatus").isin("O", "F", "P"),
            "date_in_range": F.col("o_orderdate").between(
                "1992-01-01", "1998-12-31"
            ),
            "priority_wellformed": F.col("o_orderpriority").rlike("^[1-5]-"),
        },
    )
    return checked.select(
        F.explode(
            F.when(
                F.size("failed_rules") == 0, F.array(F.lit("__clean__"))
            ).otherwise(F.col("failed_rules"))
        ).alias("rule")
    ).groupBy("rule").agg(F.count(F.lit(1)).alias("n_rows"))


VALIDATE_QUARANTINE_SQL = """
WITH checked AS (
  SELECT CASE WHEN NOT (o_totalprice > 0) THEN 'positive_price' END AS r1,
         CASE WHEN NOT (o_orderstatus IN ('O','F','P')) THEN 'known_status' END AS r2,
         CASE WHEN NOT (o_orderdate BETWEEN TIMESTAMP '1992-01-01'
                                        AND TIMESTAMP '1998-12-31')
              THEN 'date_in_range' END AS r3,
         CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-')
              THEN 'priority_wellformed' END AS r4
  FROM orders
)
SELECT rule, count(*) AS n_rows FROM (
  SELECT unnest(
    CASE WHEN r1 IS NULL AND r2 IS NULL AND r3 IS NULL AND r4 IS NULL
         THEN ['__clean__']
         ELSE list_filter([r1, r2, r3, r4], x -> x IS NOT NULL) END
  ) AS rule
  FROM checked
) GROUP BY rule
"""


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling (sampleBy): per-status fractions with a fixed
    seed. rows-only for the driver (sample membership depends on
    partition layout, not SQL-expressible); pytest checks per-stratum
    fractions land within tolerance and the draw is deterministic
    within a session."""
    o = io.load_table(spark, sf_dir, "orders")
    s = o.sampleBy("o_orderstatus", {"O": 0.2, "F": 0.2, "P": 0.5}, seed=42)
    return s.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n_sampled"))


# Snapshot frontier: customers with any order before this date form the
# "current" dimension snapshot; later orders drive the CDC delta.
SNAP_FRONTIER = "1996-01-01"


def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (SCD1 upsert) as a pure DataFrame plan:
    target = per-customer order stats before the frontier, source = the
    same stats after it. WHEN MATCHED → update (merge the stats), WHEN
    NOT MATCHED → insert. The action column reports what MERGE would
    have done to each key.

    Spark-first shape: MERGE without a transactional table is ONE
    full-outer join on the key — never a row-at-a-time lookup. Both
    sides are pre-aggregated (map-side partial), so the join keys are
    unique and the shuffle is O(distinct keys). At 100 TB this is
    exactly how Delta/Iceberg execute MERGE under the hood (join +
    rewrite); the oracle proves action assignment and merged values.
    """
    o = io.load_table(spark, sf_dir, "orders")

    def stats(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("spend"),
        )

    target = stats(o.filter(F.col("o_orderdate") < SNAP_FRONTIER))
    source = stats(o.filter(F.col("o_orderdate") >= SNAP_FRONTIER))
    t = target.select(
        "o_custkey", F.col("n").alias("t_n"), F.col("spend").alias("t_spend")
    )
    s = source.select(
        "o_custkey", F.col("n").alias("s_n"), F.col("spend").alias("s_spend")
    )
    joined = t.join(s, "o_custkey", "full_outer")
    return joined.select(
        "o_custkey",
        F.when(F.col("s_n").isNull(), F.lit("keep"))
        .when(F.col("t_n").isNull(), F.lit("insert"))
        .otherwise(F.lit("update"))
        .alias("action"),
        (F.coalesce("t_n", F.lit(0)) + F.coalesce("s_n", F.lit(0))).alias(
            "n_orders"
        ),
        F.round(
            F.coalesce("t_spend", F.lit(0.0)) + F.coalesce("s_spend", F.lit(0.0)),
            2,
        ).alias("total_spend"),
    )


MERGE_UPSERT_SQL = f"""
WITH t AS (
  SELECT o_custkey, count(*) AS t_n, round(sum(o_totalprice), 2) AS t_spend
  FROM orders WHERE o_orderdate < TIMESTAMP '{SNAP_FRONTIER} 00:00:00'
  GROUP BY o_custkey
),
s AS (
  SELECT o_custkey, count(*) AS s_n, round(sum(o_totalprice), 2) AS s_spend
  FROM orders WHERE o_orderdate >= TIMESTAMP '{SNAP_FRONTIER} 00:00:00'
  GROUP BY o_custkey
)
SELECT coalesce(t.o_custkey, s.o_custkey) AS o_custkey,
       CASE WHEN s.s_n IS NULL THEN 'keep'
            WHEN t.t_n IS NULL THEN 'insert'
            ELSE 'update' END AS action,
       coalesce(t.t_n, 0) + coalesce(s.s_n, 0) AS n_orders,
       round(coalesce(t.t_spend, 0.0) + coalesce(s.s_spend, 0.0), 2) AS total_spend
FROM t FULL OUTER JOIN s USING (o_custkey)
"""


def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed generation: diff two snapshots of a per-customer
    state relation into (insert | delete | update_pre | update_post)
    rows — what a CDC producer emits when the upstream system only
    provides full snapshots.

    One full-outer join on the key + a change-type case split; rows
    identical in both snapshots are dropped (the no-op majority at
    100 TB never leaves the join stage). Content equality is compared
    on integer cents, never formatted floats.
    """
    o = io.load_table(spark, sf_dir, "orders")

    def snap(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.floor(F.sum("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("spend_cents")
        )

    old = snap(o.filter(F.col("o_orderdate") < SNAP_FRONTIER)).select(
        "o_custkey", F.col("spend_cents").alias("old_cents")
    )
    new = snap(o).select("o_custkey", F.col("spend_cents").alias("new_cents"))
    j = old.join(new, "o_custkey", "full_outer").filter(
        ~(F.col("old_cents").eqNullSafe(F.col("new_cents")))
    )
    pre = j.filter(F.col("old_cents").isNotNull()).select(
        "o_custkey",
        F.when(F.col("new_cents").isNull(), F.lit("delete"))
        .otherwise(F.lit("update_pre"))
        .alias("change"),
        F.col("old_cents").alias("spend_cents"),
    )
    post = j.filter(F.col("new_cents").isNotNull()).select(
        "o_custkey",
        F.when(F.col("old_cents").isNull(), F.lit("insert"))
        .otherwise(F.lit("update_post"))
        .alias("change"),
        F.col("new_cents").alias("spend_cents"),
    )
    return pre.unionByName(post)


SNAPSHOT_DIFF_SQL = f"""
WITH old AS (
  SELECT o_custkey,
         CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS old_cents
  FROM orders WHERE o_orderdate < TIMESTAMP '{SNAP_FRONTIER} 00:00:00'
  GROUP BY o_custkey
),
new AS (
  SELECT o_custkey,
         CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS new_cents
  FROM orders GROUP BY o_custkey
),
j AS (
  SELECT coalesce(old.o_custkey, new.o_custkey) AS o_custkey,
         old_cents, new_cents
  FROM old FULL OUTER JOIN new USING (o_custkey)
  WHERE old_cents IS DISTINCT FROM new_cents
)
SELECT o_custkey,
       CASE WHEN new_cents IS NULL THEN 'delete' ELSE 'update_pre' END AS change,
       old_cents AS spend_cents
FROM j WHERE old_cents IS NOT NULL
UNION ALL
SELECT o_custkey,
       CASE WHEN old_cents IS NULL THEN 'insert' ELSE 'update_post' END AS change,
       new_cents AS spend_cents
FROM j WHERE new_cents IS NOT NULL
"""


# ---------------------------------------------------------------------------
# SQL gateway: one portable ANSI statement, executed verbatim by BOTH
# engines — Spark runs it through spark.sql over the registered fixture
# views (io.register_sql_views), the driver's oracle runs the SAME text
# in DuckDB. Proof that the SQL surface and the DataFrame registry are
# one engine, and that a reference user can bring ad-hoc ANSI SQL
# untranslated.
# ---------------------------------------------------------------------------

PORTABLE_TOPN_SQL = """
WITH r AS (
  SELECT c_nationkey, o_custkey,
         round(sum(o_totalprice), 2) AS cust_rev,
         count(*) AS n_orders
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE o_orderstatus <> 'P'
  GROUP BY c_nationkey, o_custkey
)
SELECT c_nationkey, o_custkey, cust_rev, n_orders, rnk
FROM (
  SELECT c_nationkey, o_custkey, cust_rev, n_orders,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY cust_rev DESC, o_custkey ASC) AS rnk
  FROM r
) ranked
WHERE rnk <= 5
"""


def sql_gateway_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 customers by revenue per nation — executed via
    ``spark.sql`` on the EXACT text the DuckDB oracle runs. Catalyst
    plans it identically to the DataFrame form (filter pushdown, AQE
    join pick, window per nation partition)."""
    io.register_sql_views(spark, sf_dir)
    return spark.sql(PORTABLE_TOPN_SQL)


# Second gateway surface: GROUPING SETS + grouping() markers + HAVING +
# NULLS FIRST — the OLAP-dialect corners a BI tool emits, verbatim in
# both engines. Revenue travels as exact integer cents (trap 1) and the
# grouping() flags disambiguate real NULL groups from rollup rows.
PORTABLE_GSETS_SQL = """
SELECT o_orderpriority, o_orderstatus,
       grouping(o_orderpriority) AS g_pri,
       grouping(o_orderstatus) AS g_st,
       count(*) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS rev_cents
FROM orders
WHERE year(o_orderdate) = 1997
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                        (o_orderpriority), ())
HAVING count(*) > 0
ORDER BY g_pri, g_st,
         o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
"""


def sql_gateway_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One portable GROUPING SETS statement executed VERBATIM by both
    engines (see PORTABLE_GSETS_SQL) — Spark plans it as a single
    Expand + hash aggregate, one shuffle for all three grouping
    levels."""
    io.register_sql_views(spark, sf_dir)
    return spark.sql(PORTABLE_GSETS_SQL)


# Third gateway surface: the window-function dialect a BI tool emits —
# ROWS frames, lag with an explicit default, percent_rank, row_number —
# verbatim in both engines. Revenue is exact integer cents (trap 1);
# the window sum is CAST back to BIGINT because DuckDB widens window
# sums to HUGEINT exactly like plain sums (round-2 repr-fail class);
# percent_rank's (rank−1)/(n−1) is one IEEE division of small ints,
# deterministic on both engines, floored onto the bp grid.
PORTABLE_WINDOW_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY event_type, CAST(ts AS DATE)
)
SELECT event_type, d, cents,
       CAST(sum(cents) OVER (PARTITION BY event_type ORDER BY d
                             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS trailing7_cents,
       lag(cents, 1, CAST(0 AS BIGINT))
         OVER (PARTITION BY event_type ORDER BY d) AS prev_cents,
       CAST(floor(percent_rank()
                    OVER (PARTITION BY event_type ORDER BY cents, d)
                  * 10000 + 0.5) AS BIGINT) AS pr_bp,
       row_number() OVER (PARTITION BY event_type ORDER BY cents DESC, d)
         AS rev_rank
FROM daily
ORDER BY event_type, d
"""


def sql_gateway_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One portable window-function statement executed VERBATIM by both
    engines (see PORTABLE_WINDOW_SQL) — frames, lag defaults,
    percent_rank, row_number over the daily rollup; Spark runs both
    window passes on the one event_type shuffle."""
    io.register_sql_views(spark, sf_dir)
    return spark.sql(PORTABLE_WINDOW_SQL)


# Fourth gateway surface: the correlated-subquery dialect — two scalar
# correlated subqueries plus a correlated EXISTS, verbatim in both
# engines, exercising Catalyst's decorrelation (rewrite to aggregated
# joins). The above-average test is the classic trap-1 hazard (engine
# avg() drifts ~1e-8), so it is cross-multiplied onto exact integers:
# cents · count > sum_cents — no float ever enters the predicate.
PORTABLE_CORRELATED_SQL = """
WITH o1 AS (
  SELECT o_orderkey, o_custkey, o_orderpriority,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_above_avg,
       CAST(sum(cents) AS BIGINT) AS rev_cents
FROM o1
WHERE cents * (SELECT count(*) FROM orders o2
               WHERE o2.o_custkey = o1.o_custkey)
      > (SELECT CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                     AS BIGINT)
         FROM orders o3 WHERE o3.o_custkey = o1.o_custkey)
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o1.o_orderkey
                AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def sql_gateway_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One portable correlated-subquery statement executed VERBATIM by
    both engines (see PORTABLE_CORRELATED_SQL): orders strictly above
    their customer's average value (integer cross-multiplied) that
    also have a returned line item, rolled up by priority. Catalyst
    decorrelates all three subqueries into aggregate + semi joins —
    no per-row re-execution survives in the plan."""
    io.register_sql_views(spark, sf_dir)
    return spark.sql(PORTABLE_CORRELATED_SQL)


QUERIES = {
    "rel_project_filter_predicates": (project_filter_predicates, PROJECT_FILTER_SQL),
    "rel_project_derived_like": (project_derived_like, PROJECT_DERIVED_SQL),
    "rel_case_null_handling": (case_null_handling, CASE_NULL_SQL),
    "rel_validate_quarantine": (validate_quarantine, VALIDATE_QUARANTINE_SQL),
    "rel_stratified_sample": (stratified_sample, None),
    "rel_merge_upsert": (merge_upsert, MERGE_UPSERT_SQL),
    "rel_snapshot_diff": (snapshot_diff, SNAPSHOT_DIFF_SQL),
    "sql_gateway_topn": (sql_gateway_topn, PORTABLE_TOPN_SQL),
    "sql_gateway_grouping_sets": (
        sql_gateway_grouping_sets,
        PORTABLE_GSETS_SQL,
    ),
    "sql_gateway_window": (sql_gateway_window, PORTABLE_WINDOW_SQL),
    "sql_gateway_correlated": (sql_gateway_correlated, PORTABLE_CORRELATED_SQL),
}
