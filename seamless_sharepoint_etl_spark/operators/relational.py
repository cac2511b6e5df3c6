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


QUERIES = {
    "rel_project_filter_predicates": (project_filter_predicates, PROJECT_FILTER_SQL),
    "rel_project_derived_like": (project_derived_like, PROJECT_DERIVED_SQL),
    "rel_case_null_handling": (case_null_handling, CASE_NULL_SQL),
    "rel_validate_quarantine": (validate_quarantine, VALIDATE_QUARANTINE_SQL),
    "rel_stratified_sample": (stratified_sample, None),
}
