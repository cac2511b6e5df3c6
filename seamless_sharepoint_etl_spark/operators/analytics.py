"""Classic multi-join OLAP queries — the full 22-shape TPC-H suite.

Q1 lives in ``aggregates.pricing_summary``; the other 21 shapes are
here, each adapted to the fixture schema (no partsupp / commitdate /
shipmode columns — the adaptations keep every query's *plan shape*:
Q2's decorrelated scalar-MIN subquery, Q4's non-equi EXISTS, Q9's
five-way profit tree, Q11's global-scalar HAVING, Q12's conditional
aggregation, Q13's filtered outer join + agg-of-agg, Q20's
semi-join against an aggregating subquery, and so on).

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




# ---------------------------------------------------------------------------
# Round-3 extension: the rest of the TPC-H shapes expressible on this
# star schema (no partsupp table, no shipmode/commitdate/receiptdate
# columns — Q2/Q4/Q9/Q11/Q12/Q13/Q20 are either unexpressible or
# already covered by join_semi_exists / join_left_null_histogram).
# Where TPC-H compares a value against an AVG, the comparison is
# re-expressed in exact integer space (quantities are integral doubles,
# balances are 2-decimal) so a 1e-8 cross-engine avg() drift can never
# flip a row in or out of the result (NOTES trap 1).
# ---------------------------------------------------------------------------

Q6_FROM = "1997-01-01"
Q6_TO = "1998-01-01"


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: pure scan-aggregate — the predicate-pushdown showcase.

    No join at all: a year of shipments in a discount band under a
    quantity cap, summed. Expected plan: ONE parquet scan with all
    three predicates in PushedFilters, ReadSchema limited to the four
    referenced columns, and a partial+final agg — at 100 TB this query
    is bounded purely by scan bandwidth. Discount bounds sit between
    the 2-decimal grid points (0.045/0.075) so double-literal equality
    can never go wrong at the band edge.
    """
    li = io.load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= Q6_FROM)
            & (F.col("l_shipdate") < Q6_TO)
            & (F.col("l_discount") > 0.045)
            & (F.col("l_discount") < 0.075)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q6_SQL = f"""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_FROM}'
  AND l_shipdate < TIMESTAMP '{Q6_TO}'
  AND l_discount > 0.045 AND l_discount < 0.075
  AND l_quantity < 24
"""


Q7_NATION_A = "NATION_3"
Q7_NATION_B = "NATION_7"


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: shipping volume between two nations by year — the two-copy
    dimension join (nation joined once on the supplier branch, once on
    the customer branch) plus a symmetric pair predicate.

    Both nation copies are forced broadcast (25 rows); the pair filter
    ((A,B) or (B,A)) lands above the joins and prunes to two nation
    pairs before the groupBy. The orderkey shuffle joining the fact to
    orders dominates at scale, as in Q5.
    """
    li = io.load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = io.load_table(spark, sf_dir, "orders")
    c = io.load_table(spark, sf_dir, "customer")
    s = io.load_table(spark, sf_dir, "supplier")
    n = io.load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == Q7_NATION_A) & (F.col("cust_nation") == Q7_NATION_B)
    ) | ((F.col("supp_nation") == Q7_NATION_B) & (F.col("cust_nation") == Q7_NATION_A))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
    AND ((n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
      OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}'))
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


Q8_REGION = "ASIA"
Q8_NATION = "NATION_3"
Q8_TYPE = "ECONOMY"


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: one nation's market share of a part type inside one region,
    by order year — the widest join tree here (7 full relations, nation
    twice), with a conditional-aggregate ratio on top.

    The share is emitted as integer basis points via floor(x*1e4+0.5):
    the two revenue sums agree across engines to ~1e-11 relative, so
    the ratio is stable far below the 1e-4 grid — exact-integer output
    with no float hashing (NOTES trap 1).
    """
    p = io.load_table(spark, sf_dir, "part").filter(F.col("p_type") == Q8_TYPE)
    li = io.load_table(spark, sf_dir, "lineitem")
    s = io.load_table(spark, sf_dir, "supplier")
    o = io.load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = io.load_table(spark, sf_dir, "customer")
    n = io.load_table(spark, sf_dir, "nation")
    r = io.load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q8_REGION)
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_rkey")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_rkey") == r.r_regionkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.floor(
                F.sum(F.when(F.col("supp_nation") == Q8_NATION, vol).otherwise(0.0))
                / F.sum(vol)
                * 10000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("mkt_share_bp"),
            F.round(F.sum(vol), 2).alias("total_volume"),
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
SELECT year(o_orderdate) AS o_year,
       CAST(floor(sum(CASE WHEN n1.n_name = '{Q8_NATION}'
                           THEN l_extendedprice * (1 - l_discount)
                           ELSE 0.0 END)
                  / sum(l_extendedprice * (1 - l_discount)) * 10000 + 0.5)
            AS BIGINT) AS mkt_share_bp,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_volume
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region ON n2.n_regionkey = r_regionkey
WHERE p_type = '{Q8_TYPE}' AND r_name = '{Q8_REGION}'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY year(o_orderdate)
ORDER BY o_year
"""


Q14_FROM = "1997-09-01"
Q14_TO = "1997-10-01"


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: share of one month's revenue that came from promo parts —
    fact⋈dim join with a conditional-aggregate ratio.

    part is the broadcast side (it is a dimension at every SF); the
    share is integer basis points (see Q8's rationale). Expected plan:
    the shipdate range is pushed to the lineitem scan, and the join is
    a single BroadcastHashJoin with no shuffle at all below the
    2-row-ish final aggregate.
    """
    p = io.load_table(spark, sf_dir, "part")
    li = io.load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= Q14_FROM) & (F.col("l_shipdate") < Q14_TO)
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        F.floor(
            F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
            / F.sum(vol)
            * 10000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("promo_share_bp"),
        F.round(F.sum(vol), 2).alias("total_revenue"),
    )


Q14_SQL = f"""
SELECT CAST(floor(sum(CASE WHEN p_type = 'PROMO'
                           THEN l_extendedprice * (1 - l_discount)
                           ELSE 0.0 END)
                  / sum(l_extendedprice * (1 - l_discount)) * 10000 + 0.5)
            AS BIGINT) AS promo_share_bp,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '{Q14_FROM}'
  AND l_shipdate < TIMESTAMP '{Q14_TO}'
"""


Q15_FROM = "1997-01-01"
Q15_TO = "1997-04-01"


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: the supplier(s) with the maximum quarterly revenue — an
    aggregate reused twice (once per supplier, once for the global
    max), i.e. TPC-H's CREATE VIEW pattern.

    The per-supplier revenue relation is built once and joined against
    its own 1-row max via a broadcast; revenue is rounded to cents
    BEFORE the max/equality so the tie comparison is exact on both
    engines. At 100 TB the revenue relation is supplier-cardinality
    (small) — both the scalar max and the equality join are cheap;
    only the groupBy over the fact shuffles.
    """
    li = io.load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= Q15_FROM) & (F.col("l_shipdate") < Q15_TO)
    )
    s = io.load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("mx"))
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_FROM}'
    AND l_shipdate < TIMESTAMP '{Q15_TO}'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


Q16_BRAND = "Brand#13"
Q16_SIZES = (1, 5, 10, 15, 20, 25, 30, 35)


def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16: how many distinct suppliers can deliver each part profile —
    dim filters + NOT IN supplier exclusion + count-distinct per group.

    Without a partsupp table, lineitem serves as the observed
    part↔supplier relation. The excluded-supplier set (a deterministic
    suppkey%10 stand-in for TPC-H's comment scan) is applied as a
    broadcast anti-join BEFORE the distinct aggregation. The
    countDistinct shuffles (partkey-grouped profile keys); at 100 TB
    that is one exchange over (brand,type,size,suppkey) pairs — far
    smaller than the fact.
    """
    p = io.load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != Q16_BRAND) & F.col("p_size").isin(*Q16_SIZES)
    )
    li = io.load_table(spark, sf_dir, "lineitem")
    bad = io.load_table(spark, sf_dir, "supplier").filter(
        F.col("s_suppkey") % 10 == 7
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
        .limit(30)
    )


Q16_SQL = f"""
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{Q16_BRAND}'
  AND p_size IN {Q16_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 10 = 7)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
LIMIT 30
"""


Q17_BRAND = "Brand#22"


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue lost to small orders — each lineitem compared to
    20% of ITS part's average quantity, i.e. the classic correlated
    scalar subquery, decorrelated into a per-part aggregate join.

    The avg comparison runs in exact integer space: quantities are
    integral doubles, so ``qty < 0.2 * sum/cnt`` becomes
    ``5*qty*cnt < sum`` over BIGINTs — a 1e-8 cross-engine avg()
    drift can never flip a row (NOTES trap 1). The per-part aggregate
    is partkey-grouped (same shuffle key as the join that consumes
    it); at 100 TB AQE keeps the brand-filtered branch broadcast.
    """
    p = io.load_table(spark, sf_dir, "part").filter(F.col("p_brand") == Q17_BRAND)
    li = io.load_table(spark, sf_dir, "lineitem")
    base = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        "l_extendedprice",
    )
    per_part = base.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("qty").alias("sum_qty"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        base.join(per_part, base.l_partkey == F.col("pk"))
        .filter(F.lit(5) * F.col("qty") * F.col("cnt") < F.col("sum_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
    )


Q17_SQL = f"""
WITH base AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{Q17_BRAND}'
), per_part AS (
  SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS sum_qty, count(*) AS cnt
  FROM base GROUP BY l_partkey
)
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
       count(*) AS n_small_lines
FROM base JOIN per_part USING (l_partkey)
WHERE 5 * qty * cnt < sum_qty
"""


def q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: revenue matched by an OR of three brand/size/quantity
    conjunctions — the disjunctive join-predicate shape whose point is
    that the per-branch part filters must NOT block the single
    part⋈lineitem equi-join.

    Expressed as one equi-join on partkey with the disjunction as a
    residual filter above it — Catalyst keeps the hash join and
    evaluates the OR post-join, instead of degenerating into three
    scans or a nested-loop. part stays the broadcast build side.
    """
    p = io.load_table(spark, sf_dir, "part")
    li = io.load_table(spark, sf_dir, "lineitem")
    branch = (
        (
            (F.col("p_brand") == "Brand#13")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 20))
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & (F.col("p_size").between(10, 25))
            & (F.col("l_quantity").between(10, 30))
        )
        | (
            (F.col("p_brand") == "Brand#25")
            & (F.col("p_size").between(20, 50))
            & (F.col("l_quantity").between(20, 50))
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 25
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#25' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 50)
"""


Q21_LATE_DAYS = 90
Q21_TOP = 20


def q21_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 (adapted): suppliers who were the SOLE late shipper on a
    finished multi-supplier order — EXISTS + NOT EXISTS correlated
    subqueries, decorrelated into a semi-join and an anti-join.

    "Late" is shipdate > orderdate + 90 days (the fixture has no
    commit/receipt dates). The lineitem relation joined to finished
    orders is built once and reused three times (self semi/anti joins
    on orderkey); all three exchanges share the orderkey shuffle key,
    so at 100 TB this is one fact shuffle plus two co-partitioned
    probes, then a supplier-cardinality aggregate.
    """
    o = (
        io.load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = io.load_table(spark, sf_dir, "lineitem")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAYS")
        ).alias("late"),
    )
    l1 = lo.filter(F.col("late")).select("l_orderkey", "l_suppkey")
    others = lo.select(
        F.col("l_orderkey").alias("o2_key"), F.col("l_suppkey").alias("s2_key")
    )
    late_others = lo.filter(F.col("late")).select(
        F.col("l_orderkey").alias("o3_key"), F.col("l_suppkey").alias("s3_key")
    )
    s = io.load_table(spark, sf_dir, "supplier")
    return (
        l1.join(
            others,
            (F.col("l_orderkey") == F.col("o2_key"))
            & (F.col("l_suppkey") != F.col("s2_key")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("o3_key"))
            & (F.col("l_suppkey") != F.col("s3_key")),
            "left_anti",
        )
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(Q21_TOP)
    )


Q21_SQL = f"""
WITH lo AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
)
SELECT s_name, count(*) AS numwait
FROM lo l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.late
  AND EXISTS (SELECT 1 FROM lo l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lo l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT {Q21_TOP}
"""


Q22_SEGMENTS = (1, 2, 4, 6)
Q22_DORMANT_SINCE = "1999-01-01"


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 (adapted): well-funded customers with no recent order,
    bucketed by a key-derived segment — scalar-subquery threshold + anti-join.

    The above-average test runs in exact cents: balances are 2-decimal
    doubles, so ``bal > avg(bal WHERE bal > 0)`` becomes
    ``cents*cnt > sum_cents`` over BIGINTs (floor(x*100+0.5) on both
    engines) — engine-order avg drift cannot flip a customer in or out
    (NOTES trap 1). The 1-row threshold is a broadcast; the anti-join
    against orders shuffles on custkey only.
    """
    c = io.load_table(spark, sf_dir, "customer").filter(
        (F.col("c_custkey") % 7).isin(*Q22_SEGMENTS)
    )
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
    stats = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            F.sum(cents).alias("sum_cents"),
            F.count(F.lit(1)).alias("cnt_pos"),
        )
    )
    o = (
        io.load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= Q22_DORMANT_SINCE)
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(stats))
        .filter(cents * F.col("cnt_pos") > F.col("sum_cents"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy((F.col("c_custkey") % 7).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


Q22_SQL = f"""
WITH seg AS (
  SELECT c_custkey, c_acctbal,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
  FROM customer WHERE c_custkey % 7 IN {Q22_SEGMENTS}
), thr AS (
  SELECT CAST(sum(cents) AS BIGINT) AS sum_cents, count(*) AS cnt_pos
  FROM seg WHERE c_acctbal > 0.0
)
SELECT c_custkey % 7 AS cntrycode,
       count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM seg, thr
WHERE cents * cnt_pos > sum_cents
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '{Q22_DORMANT_SINCE}')
GROUP BY cntrycode
ORDER BY cntrycode
"""


Q2_REGION = "EUROPE"
Q2_TYPE = "ECONOMY"
Q2_MAX_SIZE = 10
Q2_TOP = 20


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each qualifying part, the supplier in one region
    with the minimum observed cost — TPC-H's correlated scalar MIN
    subquery, decorrelated into a per-part aggregate joined back.

    Without a partsupp table the observed part↔supplier cost relation
    is built from lineitem (total cents per pair — exact BIGINTs, so
    the min and its tie-break can never flap cross-engine; NOTES
    trap 1). The decorrelation is the point: ``min per part`` is a
    partkey-grouped aggregate reusing the same shuffle key as the
    join that consumes it, and ties resolve to the lowest suppkey via
    a second tiny aggregate rather than a window. region/nation/part
    filters are broadcast; the single fact shuffle is on partkey.
    """
    n = io.load_table(spark, sf_dir, "nation")
    r = io.load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q2_REGION)
    sup = (
        io.load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )
    pts = io.load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == Q2_TYPE) & (F.col("p_size") <= Q2_MAX_SIZE)
    ).select("p_partkey", "p_name")
    li = io.load_table(spark, sf_dir, "lineitem")
    offers = (
        li.join(F.broadcast(pts), li.l_partkey == pts.p_partkey)
        .join(F.broadcast(sup.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("cents")
        )
    )
    mins = offers.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.min("cents").alias("min_cents")
    )
    best = (
        offers.join(
            mins,
            (offers.l_partkey == F.col("pk"))
            & (offers.cents == F.col("min_cents")),
        )
        .groupBy("l_partkey", "min_cents")
        .agg(F.min("l_suppkey").alias("best_suppkey"))
    )
    return (
        best.join(F.broadcast(pts), best.l_partkey == pts.p_partkey)
        .join(F.broadcast(sup), best.best_suppkey == sup.s_suppkey)
        .select(
            "p_partkey",
            "p_name",
            F.round(F.col("min_cents") / 100.0, 2).alias("best_cost"),
            F.col("best_suppkey").alias("s_suppkey"),
            "s_name",
            "n_name",
        )
        .orderBy(F.asc("min_cents"), F.asc("p_partkey"))
        .limit(Q2_TOP)
    )


Q2_SQL = f"""
WITH sup AS (
  SELECT s_suppkey, s_name, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q2_REGION}'
), pts AS (
  SELECT p_partkey, p_name FROM part
  WHERE p_type = '{Q2_TYPE}' AND p_size <= {Q2_MAX_SIZE}
), offers AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem
  JOIN pts ON l_partkey = p_partkey
  JOIN sup ON l_suppkey = s_suppkey
  GROUP BY l_partkey, l_suppkey
), mins AS (
  SELECT l_partkey, min(cents) AS min_cents FROM offers GROUP BY l_partkey
), best AS (
  SELECT o.l_partkey, m.min_cents, min(o.l_suppkey) AS best_suppkey
  FROM offers o JOIN mins m
    ON o.l_partkey = m.l_partkey AND o.cents = m.min_cents
  GROUP BY o.l_partkey, m.min_cents
)
SELECT p_partkey, p_name,
       round(min_cents / 100.0, 2) AS best_cost,
       best_suppkey AS s_suppkey, s_name, n_name
FROM best
JOIN pts ON l_partkey = p_partkey
JOIN sup ON best_suppkey = s_suppkey
ORDER BY min_cents ASC, p_partkey ASC
LIMIT {Q2_TOP}
"""


Q4_FROM = "1997-01-01"
Q4_TO = "1997-04-01"


def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: order-priority counts over orders with at least one
    late line — the canonical EXISTS → left-semi join.

    The fixture has no commit/receipt dates, so "late" is a lineitem
    shipped after its order date — which makes the semi-join condition
    deliberately NON-equi on top of the orderkey equi-key
    (``l_shipdate > o_orderdate``), proving residual predicates ride
    the semi-join. One shuffle on orderkey; the quarter filter reaches
    the orders scan.
    """
    o = io.load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= Q4_FROM) & (F.col("o_orderdate") < Q4_TO)
    )
    li = io.load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_cnt"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = f"""
SELECT o_orderpriority, count(*) AS order_cnt
FROM orders
WHERE o_orderdate >= TIMESTAMP '{Q4_FROM}'
  AND o_orderdate < TIMESTAMP '{Q4_TO}'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


Q9_NAME_FRAGMENT = "ge"


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit by supplier nation × order year over a
    name-filtered part family — the widest join tree in the suite
    (lineitem ⋈ part ⋈ supplier ⋈ nation ⋈ orders) with an
    expression-level measure combining columns from three tables.

    Supply cost stands in as ``0.6 × p_retailprice × quantity``
    (no partsupp table). nation/part/supplier broadcast; orders join
    shuffles on orderkey — the one fact-sized exchange. The profit
    sum runs entirely in exact integer space (1e-4-dollar units:
    ``cents × (100 - discount_bp) - 60 × retail_cents × qty`` as
    BIGINT — prices are 2dp, discounts are whole basis-hundredths,
    quantities integral), then divides by 10000.0 once: both engines
    produce the identical IEEE double with NO round() boundary to
    flap (NOTES trap 1 — round(sum-of-floats, 2) flapped at the .005
    boundary on this very query at sf0.01). At 1e12-row scale the
    BIGINT partial sums approach 2^63; a 100 TB deployment would sum
    as DECIMAL(38,0) — same plan shape.
    """
    p = io.load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains(Q9_NAME_FRAGMENT)
    )
    s = io.load_table(spark, sf_dir, "supplier")
    n = io.load_table(spark, sf_dir, "nation")
    o = io.load_table(spark, sf_dir, "orders")
    li = io.load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            (
                F.sum(
                    F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
                    * (
                        F.lit(100)
                        - F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
                    )
                    - F.lit(60)
                    * F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)).cast("long")
                    * F.col("l_quantity").cast("long")
                )
                / F.lit(10000.0)
            ).alias("profit")
        )
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


Q9_SQL = f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
         - 60 * CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
             * CAST(l_quantity AS BIGINT)
       ) AS BIGINT) / 10000.0 AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%{Q9_NAME_FRAGMENT}%'
GROUP BY n_name, year(o_orderdate)
ORDER BY n_name ASC, year(o_orderdate) DESC
"""


Q11_NATION = "NATION_7"
Q11_TOP = 100


def q11_important_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose value held by one nation's suppliers
    exceeds a fraction of that nation's total — HAVING against a
    global scalar subquery.

    Value is exact cents (BIGINT), the global total is a 1-row
    aggregate cross-joined (broadcast) into the HAVING filter, and the
    threshold compares ``cents * n_parts > 2 * total`` in integer
    space — the scale-free "more than 2× the mean part" test that
    cannot flap and keeps selectivity stable as SF grows. Two
    shuffles: the partkey aggregate and nothing else; the 1-row total
    is a broadcast.
    """
    n = io.load_table(spark, sf_dir, "nation").filter(F.col("n_name") == Q11_NATION)
    sup = (
        io.load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey")
    )
    li = io.load_table(spark, sf_dir, "lineitem")
    value = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("cents")
        )
    )
    total = value.agg(
        F.sum("cents").alias("tot"), F.count(F.lit(1)).alias("n_parts")
    )
    return (
        value.crossJoin(F.broadcast(total))
        .filter(F.col("cents") * F.col("n_parts") > 2 * F.col("tot"))
        .select(
            "l_partkey",
            F.round(F.col("cents") / 100.0, 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
        .limit(Q11_TOP)
    )


Q11_SQL = f"""
WITH sup AS (
  SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = '{Q11_NATION}'
), v AS (
  SELECT l_partkey,
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem JOIN sup ON l_suppkey = s_suppkey
  GROUP BY l_partkey
), t AS (
  SELECT CAST(sum(cents) AS BIGINT) AS tot, count(*) AS n_parts FROM v
)
SELECT l_partkey, round(cents / 100.0, 2) AS part_value
FROM v, t
WHERE cents * n_parts > 2 * tot
ORDER BY part_value DESC, l_partkey ASC
LIMIT {Q11_TOP}
"""


Q12_FROM = "1997-01-01"
Q12_TO = "1998-01-01"
Q12_MODES = ("R", "A")
Q12_HIGH = ("1-URGENT", "2-HIGH")


def q12_priority_by_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: per-shipmode counts of high- vs low-priority orders —
    the join + conditional-aggregation (CASE inside SUM) pattern.

    l_returnflag stands in for l_shipmode (the fixture carries no mode
    column). The CASE branches are evaluated post-join JVM-side;
    orders⋈lineitem shuffles on orderkey; the year + flag filters
    reach the lineitem scan as pushed predicates.
    """
    o = io.load_table(spark, sf_dir, "orders")
    li = io.load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= Q12_FROM)
        & (F.col("l_shipdate") < Q12_TO)
        & F.col("l_returnflag").isin(*Q12_MODES)
    )
    high = F.col("o_orderpriority").isin(*Q12_HIGH)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("ship_mode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_mode")
    )


Q12_SQL = f"""
SELECT l_returnflag AS ship_mode,
       CAST(sum(CASE WHEN o_orderpriority IN {Q12_HIGH} THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN {Q12_HIGH} THEN 0 ELSE 1 END) AS BIGINT)
         AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{Q12_FROM}'
  AND l_shipdate < TIMESTAMP '{Q12_TO}'
  AND l_returnflag IN {Q12_MODES}
GROUP BY ship_mode
ORDER BY ship_mode
"""


Q13_EXCLUDED = "4-NOT SPECIFIED"


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: distribution of per-customer order counts — a LEFT
    OUTER join whose JOIN CONDITION carries a non-key filter (so
    customers with only excluded orders still appear with count 0),
    followed by aggregation over an aggregate.

    ``count(o_orderkey)`` counts non-null keys in both engines, which
    is what makes the outer join visible in the result. Two shuffles
    (custkey join+agg, then the tiny count-of-counts); the second
    aggregate's input is at most one row per customer and its output
    at most the distinct-count values — trivially scale-safe.
    """
    c = io.load_table(spark, sf_dir, "customer")
    o = io.load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != Q13_EXCLUDED
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = f"""
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '{Q13_EXCLUDED}'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


Q20_TYPE = "PROMO"
Q20_FROM = "1997-01-01"
Q20_TO = "1998-01-01"


def q20_supplier_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers whose shipped volume of one part family in
    one year beats a quota — IN over an aggregating subquery, i.e. a
    semi-join against a derived aggregate.

    The quota is scale-free ("more than 1.5× the mean supplier's
    volume"), compared in exact integer space
    (``2 * qty * n > 3 * total`` over BIGINT quantity sums — the
    fixture's quantities are integral doubles). The aggregate subquery
    shuffles on suppkey; its result (≤ |supplier| rows) semi-joins
    back as a broadcast. part filter broadcasts into the fact scan.
    """
    p = io.load_table(spark, sf_dir, "part").filter(F.col("p_type") == Q20_TYPE)
    li = io.load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= Q20_FROM) & (F.col("l_shipdate") < Q20_TO)
    )
    shipped = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    )
    total = shipped.agg(
        F.sum("qty").alias("tot"), F.count(F.lit(1)).alias("n_sup")
    )
    heavy = (
        shipped.crossJoin(F.broadcast(total))
        .filter(F.lit(2) * F.col("qty") * F.col("n_sup") > 3 * F.col("tot"))
        .select("l_suppkey")
    )
    s = io.load_table(spark, sf_dir, "supplier")
    n = io.load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(heavy), s.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


Q20_SQL = f"""
WITH shipped AS (
  SELECT l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = '{Q20_TYPE}'
    AND l_shipdate >= TIMESTAMP '{Q20_FROM}'
    AND l_shipdate < TIMESTAMP '{Q20_TO}'
  GROUP BY l_suppkey
), t AS (
  SELECT CAST(sum(qty) AS BIGINT) AS tot, count(*) AS n_sup FROM shipped
)
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM shipped, t WHERE 2 * qty * n_sup > 3 * tot
)
ORDER BY s_suppkey
"""


QUERIES = {
    "olap_q2_min_cost_supplier": (q2_min_cost_supplier, Q2_SQL),
    "olap_q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "olap_q4_priority_exists": (q4_priority_exists, Q4_SQL),
    "olap_q5_local_supplier_volume": (q5_local_supplier_volume, Q5_SQL),
    "olap_q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "olap_q7_nation_volume": (q7_nation_volume, Q7_SQL),
    "olap_q8_market_share": (q8_market_share, Q8_SQL),
    "olap_q9_product_profit": (q9_product_profit, Q9_SQL),
    "olap_q10_returned_items": (q10_returned_items, Q10_SQL),
    "olap_q11_important_share": (q11_important_share, Q11_SQL),
    "olap_q12_priority_by_mode": (q12_priority_by_mode, Q12_SQL),
    "olap_q13_customer_distribution": (q13_customer_distribution, Q13_SQL),
    "olap_q14_promo_share": (q14_promo_share, Q14_SQL),
    "olap_q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "olap_q16_supplier_variety": (q16_supplier_variety, Q16_SQL),
    "olap_q17_small_qty_revenue": (q17_small_qty_revenue, Q17_SQL),
    "olap_q18_large_volume_customers": (q18_large_volume_customers, Q18_SQL),
    "olap_q19_disjunctive_join": (q19_disjunctive_join, Q19_SQL),
    "olap_q20_supplier_quota": (q20_supplier_quota, Q20_SQL),
    "olap_q21_late_suppliers": (q21_late_suppliers, Q21_SQL),
    "olap_q22_dormant_customers": (q22_dormant_customers, Q22_SQL),
}
