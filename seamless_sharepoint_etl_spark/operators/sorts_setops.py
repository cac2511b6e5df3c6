"""Sort / limit / top-k and set operators.

Provenance: SURVEY.md §2 Tier B, Sort/Set rows; the reference's only
sort is the source-pushed ORDER BY (A5, bin/copy-seamless-to-
sharepoint.rb:85-86), generalized here.

Scale posture: global top-k is ``orderBy().limit(k)`` — Spark plans
TakeOrderedAndProject (per-partition heap + driver merge of k rows),
NOT a full global sort; this is the 100 TB-safe global-rank shape.
Set ops are hash-based (distinct = hash agg on the whole row); unions
are plan-level concatenations with no shuffle of their own.

Determinism: every LIMIT rides on a total order (unique tie-break) so
the selected set — not just its order — is stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import io


def top_k_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 orders by price (TakeOrderedAndProject, not a sort)."""
    o = io.load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("price"))
    )


TOP_K_GLOBAL_SQL = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
"""


def multikey_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit NULLS FIRST + limit (null ordering is
    where engines default differently — always explicit)."""
    o = io.load_table(spark, sf_dir, "orders")
    nullable = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return (
        o.select(
            "o_orderkey",
            nullable.alias("status_nullable"),
            F.round("o_totalprice", 2).alias("price"),
        )
        .orderBy(
            F.asc_nulls_first("status_nullable"),
            F.desc("price"),
            F.asc("o_orderkey"),
        )
        .limit(200)
    )


MULTIKEY_SORT_SQL = """
SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status_nullable,
       round(o_totalprice, 2) AS price
FROM orders
ORDER BY status_nullable ASC NULLS FIRST, price DESC, o_orderkey ASC
LIMIT 200
"""


def union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL preserves duplicates: urgent orders ∪ high-value orders,
    then count per key (orders matching both predicates count twice)."""
    o = io.load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    big = o.filter(F.col("o_totalprice") > 300000).select("o_orderkey")
    return urgent.unionByName(big).groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_appearances")
    )


UNION_ALL_SQL = """
SELECT o_orderkey, count(*) AS n_appearances FROM (
  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
  UNION ALL
  SELECT o_orderkey FROM orders WHERE o_totalprice > 300000
) GROUP BY o_orderkey
"""


def intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers with both open and finished orders."""
    o = io.load_table(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fin = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_.intersect(fin)


INTERSECT_SQL = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


def except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers with orders but none finished."""
    o = io.load_table(spark, sf_dir, "orders")
    all_ = o.select("o_custkey")
    fin = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return all_.subtract(fin)  # EXCEPT (distinct) semantics


EXCEPT_SQL = """
SELECT DISTINCT o_custkey FROM orders
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


def except_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL / INTERSECT ALL (multiset semantics): per-customer
    order-count difference survives — a customer with 3 orders of which
    1 finished appears 2× in the EXCEPT ALL branch."""
    o = io.load_table(spark, sf_dir, "orders")
    all_ = o.select("o_custkey")
    fin = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    diff = all_.exceptAll(fin).groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_unfinished")
    )
    both = all_.intersectAll(fin).groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_finished")
    )
    return diff.join(both, "o_custkey", "full").select(
        "o_custkey",
        F.coalesce("n_unfinished", F.lit(0)).alias("n_unfinished"),
        F.coalesce("n_finished", F.lit(0)).alias("n_finished"),
    )


EXCEPT_ALL_SQL = """
WITH diff AS (
  SELECT o_custkey, count(*) AS n_unfinished FROM (
    SELECT o_custkey FROM orders
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
  ) GROUP BY o_custkey
),
isect AS (
  SELECT o_custkey, count(*) AS n_finished FROM (
    SELECT o_custkey FROM orders
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
  ) GROUP BY o_custkey
)
SELECT o_custkey,
       coalesce(n_unfinished, 0) AS n_unfinished,
       coalesce(n_finished, 0) AS n_finished
FROM diff FULL JOIN isect USING (o_custkey)
"""


def distinct_dropdup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on a key subset (exact dedup, A12-adjacent)."""
    o = io.load_table(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()


DISTINCT_SQL = """
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
"""


QUERIES = {
    "sort_top_k_global": (top_k_global, TOP_K_GLOBAL_SQL),
    "sort_multikey_nulls": (multikey_sort_nulls, MULTIKEY_SORT_SQL),
    "set_union_all_counts": (union_all_counts, UNION_ALL_SQL),
    "set_intersect": (intersect_keys, INTERSECT_SQL),
    "set_except": (except_keys, EXCEPT_SQL),
    "set_distinct": (distinct_dropdup, DISTINCT_SQL),
    "set_except_intersect_all": (except_all_multiset, EXCEPT_ALL_SQL),
}
