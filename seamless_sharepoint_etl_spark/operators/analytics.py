"""Classic multi-join OLAP queries (TPC-H Q3/Q5/Q10/Q18 shapes).

The single-table aggregates (``aggregates.pricing_summary`` = Q1) and
two-table joins prove operators in isolation; these prove the engine
composes them the way real analytics do — 3-to-6-way join trees with
selective filters, aggregation above the join, and top-k on a computed
measure. That composition is exactly where Catalyst earns its keep
(join reordering, filter pushdown through joins, AQE broadcast
conversion), so each query's docstring states the plan we expect and
the goldens pin it.

Scale posture shared by all four: region/nation are forced broadcast
(constant-size dims); customer/supplier are left to AQE (broadcastable
at fixture SF, shuffle-join at 100 TB — same graceful degradation as
the PMI unigram join); orders⋈lineitem is always a shuffle join on the
orderkey, the one unavoidable data-sized exchange. Revenue sums follow
trap-1 discipline: ``round(sum(...), 2)`` in BOTH engines, ties broken
by a key column so float order never decides row identity.

Fixture date ranges are 1995-01-01..2001-11-04 (driver-generated, not
TPC-H's 1992-98), so the filter constants are chosen to keep each
query's selectivity meaningful at every SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import io

Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-07-01"
Q3_TOP = 10


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: unshipped high-value orders for one market segment.

    customer(filter segment) ⋈ orders(filter date) ⋈ lineitem(filter
    date) → groupBy order → top-10 revenue. Expected plan: both date
    filters reach their parquet scans (PushedFilters), customer is an
    AQE-broadcast build side, lineitem⋈orders shuffles on orderkey,
    and the top-10 is TakeOrderedAndProject (never a global sort).
    """
    c = io.load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == Q3_SEGMENT
    )
    o = io.load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < Q3_DATE)
    li = io.load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > Q3_DATE
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(Q3_TOP)
    )


Q3_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_DATE}'
  AND l_shipdate > TIMESTAMP '{Q3_DATE}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT {Q3_TOP}
"""


Q5_REGION = "ASIA"
Q5_FROM = "1996-01-01"
Q5_TO = "1997-01-01"


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: revenue by nation where the supplier is the customer's
    compatriot — the canonical 6-way join tree.

    region(filter) ⋈ nation ⋈ customer ⋈ orders(date range) ⋈
    lineitem ⋈ supplier, with the *local* constraint expressed as the
    supplier join carrying ``s_nationkey = c_nationkey`` — a join
    condition spanning two dimension branches, which is what makes Q5
    the classic optimizer test. region+nation are forced broadcast;
    the orderkey shuffle dominates and is unavoidable.
    """
    r = io.load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q5_REGION)
    n = io.load_table(spark, sf_dir, "nation")
    c = io.load_table(spark, sf_dir, "customer")
    s = io.load_table(spark, sf_dir, "supplier")
    o = io.load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= Q5_FROM) & (F.col("o_orderdate") < Q5_TO)
    )
    li = io.load_table(spark, sf_dir, "lineitem")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


Q5_SQL = f"""
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
WHERE r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q5_FROM}'
  AND o_orderdate < TIMESTAMP '{Q5_TO}'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


Q10_FROM = "1997-01-01"
Q10_TO = "1997-07-01"
Q10_TOP = 20


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: customers who returned the most revenue in a quarter-ish
    window — join tree with the selective filter on the FACT side
    (l_returnflag = 'R'), aggregation keyed by the customer dim.
    Top-20 is TakeOrderedAndProject.
    """
    c = io.load_table(spark, sf_dir, "customer")
    n = io.load_table(spark, sf_dir, "nation")
    o = io.load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= Q10_FROM) & (F.col("o_orderdate") < Q10_TO)
    )
    li = io.load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.round(F.max("c_acctbal"), 2).alias("c_acctbal"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(Q10_TOP)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       round(max(c_acctbal), 2) AS c_acctbal
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '{Q10_FROM}'
  AND o_orderdate < TIMESTAMP '{Q10_TO}'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT {Q10_TOP}
"""


Q18_QTY = 250
Q18_TOP = 20


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: customers with any single order above a quantity threshold
    — aggregate-filter-join (HAVING over the fact, then join back to
    the dims). The HAVING aggregate runs FIRST and only qualifying
    orderkeys (a tiny set) flow into the dim joins — at 100 TB the
    big table is aggregated once and the join fan-in is thousands of
    rows, not billions. Expected plan: lineitem groupBy → filter →
    joins where the *filtered aggregate* is the AQE-broadcast side.
    """
    li = io.load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > Q18_QTY)
    )
    o = io.load_table(spark, sf_dir, "orders")
    c = io.load_table(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(Q18_TOP)
    )


Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       round(o_totalprice, 2) AS o_totalprice, total_qty
FROM (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > {Q18_QTY}
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT {Q18_TOP}
"""


QUERIES = {
    "olap_q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "olap_q5_local_supplier_volume": (q5_local_supplier_volume, Q5_SQL),
    "olap_q10_returned_items": (q10_returned_items, Q10_SQL),
    "olap_q18_large_volume_customers": (q18_large_volume_customers, Q18_SQL),
}
