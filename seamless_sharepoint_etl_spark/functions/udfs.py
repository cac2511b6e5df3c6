"""Arrow-vectorized Python UDF surface (SURVEY.md §2 Tier B, UDF row).

Three flavors, each as an oracle-checked query so the Arrow round-trip
itself is value-verified:

* scalar ``pandas_udf`` — batch-vectorized column transform;
* grouped-aggregate ``pandas_udf`` — one scalar per group, usable
  inside a normal ``groupBy().agg()`` next to JVM aggregates;
* ``applyInPandas`` — full group-map (UDTF-ish) with a changed schema.

UDFs are the engine's slow path by policy (SURVEY.md §4.3): everything
expressible with Catalyst built-ins lives in functions/scalar.py; this
module exists to prove the escape hatch works and stays Arrow-batched
(never row-at-a-time Python). Each docstring notes the 100 TB posture:
Arrow batch size bounds Python memory; grouped flavors shuffle once on
the group key, identical to a JVM aggregate's exchange.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .. import io


# --- scalar pandas_udf ------------------------------------------------------


def _weighted_margin_udf():
    # built lazily: pandas_udf parses its DDL return type against the
    # active session, so module import must stay session-free
    @pandas_udf("double")
    def weighted_margin(
        extended: pd.Series, discount: pd.Series, tax: pd.Series
    ) -> pd.Series:
        """Vectorized: revenue after discount and tax, pandas arithmetic."""
        return extended * (1.0 - discount) * (1.0 + tax)

    return weighted_margin


def scalar_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row margin via a scalar pandas_udf over lineitem, aggregated
    per return-flag so the oracle compares a small stable result.

    100 TB: the UDF is a narrow map over Arrow batches (no shuffle);
    the aggregate's exchange is on 3 keys — partial aggregation
    map-side keeps it tiny.
    """
    li = io.load_table(spark, sf_dir, "lineitem")
    margin = _weighted_margin_udf()
    return (
        li.withColumn(
            "margin", margin("l_extendedprice", "l_discount", "l_tax")
        )
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum("margin"), 2).alias("sum_margin"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


SCALAR_PANDAS_UDF_SQL = """
SELECT l_returnflag,
       round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_margin,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --- grouped-aggregate pandas_udf ------------------------------------------


def _iqr_udf():
    @pandas_udf("double")
    def interquartile_range(v: pd.Series) -> float:
        """Grouped-agg: IQR of the group (quantile(.75)-quantile(.25),
        linear interpolation — matches DuckDB's continuous quantile_cont)."""
        return float(v.quantile(0.75) - v.quantile(0.25))

    return interquartile_range


def grouped_agg_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-price IQR per priority — a statistic Catalyst has no exact
    built-in for (percentile_approx is approximate), mixed in the same
    agg with JVM-side avg/count.

    100 TB: one shuffle on the group key; each group's values stream to
    Python as Arrow chunks. For heavy-tailed group sizes, pre-salting
    or a two-level t-digest sketch replaces exact quantiles — noted,
    not needed at fixture scale.
    """
    o = io.load_table(spark, sf_dir, "orders")
    iqr = _iqr_udf()
    # Catalyst forbids mixing grouped-agg pandas UDFs with JVM aggregates
    # in one agg() — compute each and broadcast-join the 5-row results.
    py_side = o.groupBy("o_orderpriority").agg(
        F.round(iqr(F.col("o_totalprice")), 4).alias("price_iqr")
    )
    jvm_side = o.groupBy("o_orderpriority").agg(
        F.round(F.round(F.sum("o_totalprice"), 2) / F.count(F.lit(1)), 4).alias("price_avg"),
        F.count("*").alias("n"),
    )
    return py_side.join(F.broadcast(jvm_side), "o_orderpriority").orderBy(
        "o_orderpriority"
    )


GROUPED_AGG_PANDAS_UDF_SQL = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.75) - quantile_cont(o_totalprice, 0.25), 4)
           AS price_iqr,
       round(round(sum(o_totalprice), 2) / count(*), 4) AS price_avg,
       count(*) AS n
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --- applyInPandas (group map) ---------------------------------------------


def _zscore_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    """Group map: z-score each supplier's account balance within its
    nation; population stddev (ddof=0) to match the oracle's stddev_pop."""
    mu = pdf["s_acctbal"].mean()
    sd = pdf["s_acctbal"].std(ddof=0)
    out = pdf[["s_suppkey", "s_nationkey", "s_acctbal"]].copy()
    z = 0.0 if sd == 0 else (pdf["s_acctbal"] - mu) / sd
    out["bal_z"] = z if sd == 0 else z.round(6) + 0.0  # -0.0 → +0.0
    return out


def apply_in_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-nation z-score via ``applyInPandas`` — the group-map shape
    (input rows → whole pandas frame per group → new schema out).

    100 TB: shuffles once on s_nationkey; each group materializes in
    one Python worker, so the group key must bound group size (here:
    suppliers per nation). For unbounded groups, window functions
    (see operators/windows.py) do this without materializing a group.
    """
    s = io.load_table(spark, sf_dir, "supplier")
    return (
        s.select("s_suppkey", "s_nationkey", "s_acctbal")
        .groupBy("s_nationkey")
        .applyInPandas(
            _zscore_frame,
            "s_suppkey bigint, s_nationkey int, s_acctbal double, bal_z double",
        )
    )


APPLY_IN_PANDAS_ZSCORE_SQL = """
SELECT s_suppkey, s_nationkey, s_acctbal,
       CASE WHEN stddev_pop(s_acctbal) OVER w = 0 THEN 0.0
            ELSE round((s_acctbal - avg(s_acctbal) OVER w)
                       / (stddev_pop(s_acctbal) OVER w), 6) + 0.0
       END AS bal_z
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey)
"""


QUERIES = {
    "udf_scalar_pandas": (scalar_pandas_udf, SCALAR_PANDAS_UDF_SQL),
    "udf_grouped_agg_pandas": (grouped_agg_pandas_udf, GROUPED_AGG_PANDAS_UDF_SQL),
    "udf_apply_in_pandas": (apply_in_pandas_zscore, APPLY_IN_PANDAS_ZSCORE_SQL),
}


# --- Python UDTF (table function) ------------------------------------------


def python_udtf_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-evaluated Python UDTF, LATERAL-joined per input row: each
    order explodes into one row per price bucket it clears — the
    table-function shape (0..n output rows per input, new schema) that
    scalar UDFs can't express.

    100 TB: UDTFs stream Arrow batches like pandas_udfs; the lateral
    correlation is a per-row generate, no shuffle.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="bucket STRING, floor_v INT")
    class PriceBuckets:
        def eval(self, price: float):
            for name, lo in (("small", 0), ("mid", 100000), ("large", 200000)):
                if price is not None and price >= lo:
                    yield name, lo

    spark.udtf.register("sse_price_buckets", PriceBuckets)
    io.load_table(spark, sf_dir, "orders").createOrReplaceTempView("sse_orders_u")
    return spark.sql(
        """
        SELECT o_orderkey, b.bucket, b.floor_v
        FROM sse_orders_u, LATERAL sse_price_buckets(o_totalprice) AS b
        """
    )


PYTHON_UDTF_SQL = """
SELECT o_orderkey, b.bucket, b.floor_v
FROM orders
JOIN (VALUES ('small', 0), ('mid', 100000), ('large', 200000)) AS b(bucket, floor_v)
  ON o_totalprice >= b.floor_v
"""

QUERIES["udf_python_udtf"] = (python_udtf_buckets, PYTHON_UDTF_SQL)


# --- iterator-of-series pandas_udf -----------------------------------------


def _zscore_iter_udf(mean: float, std: float):
    @pandas_udf("double")
    def zscore(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        """SCALAR_ITER form: per-worker setup runs ONCE per partition
        (here trivially binding the broadcast stats; in production this
        is where a model/tokenizer loads), then every Arrow batch
        streams through the same state — the 4th vectorized-UDF surface
        next to scalar / grouped-agg / applyInPandas."""
        for batch in batches:
            yield (batch - mean) / std

    return zscore


def scalar_iter_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Account-balance z-scores via an iterator pandas_udf: the scalar
    stats come from one tiny JVM aggregate (collected as the one
    legitimate scalar frontier), are closed over by the UDF, and every
    batch reuses them without re-binding per row or per batch.

    100 TB: narrow Arrow map, no shuffle; the final agg exchanges
    |nations| rows. Population stddev is computed from sum/count (the
    mergeable form) to match the oracle bit-for-bit.
    """
    c = io.load_table(spark, sf_dir, "customer")
    stats = c.agg(
        F.sum("c_acctbal").alias("s"),
        F.sum(F.col("c_acctbal") * F.col("c_acctbal")).alias("s2"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    mean = stats["s"] / stats["n"]
    var = stats["s2"] / stats["n"] - mean * mean
    std = var**0.5
    z = _zscore_iter_udf(mean, std)
    return (
        c.withColumn("z", z("c_acctbal"))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.when(F.abs(F.col("z")) > 1.5, 1)).alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("c_nationkey")
    )


SCALAR_ITER_SQL = """
WITH stats AS (
  SELECT sum(c_acctbal) / count(*) AS mean,
         sqrt(sum(c_acctbal * c_acctbal) / count(*)
              - (sum(c_acctbal) / count(*)) * (sum(c_acctbal) / count(*))) AS std
  FROM customer
)
SELECT c_nationkey,
       count(CASE WHEN abs((c_acctbal - mean) / std) > 1.5 THEN 1 END) AS n_outliers,
       count(*) AS n
FROM customer, stats
GROUP BY c_nationkey ORDER BY c_nationkey
"""

QUERIES["udf_scalar_iter_pandas"] = (scalar_iter_pandas_udf, SCALAR_ITER_SQL)
