"""Scalar function surface: string / date / math / array / JSON.

Provenance: SURVEY.md §2 Tier B, Scalar-fns rows (the reference has no
expression language — SURVEY.md §2 "Notably absent").

All JVM-side Catalyst built-ins inside whole-stage codegen — no Python
in these paths. Cross-engine parity traps handled explicitly in the
oracles (documented per query): 0- vs 1-based array indexing, dayofweek
origins, date_trunc return types, global regexp_replace flags.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import io


def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/trim/substring/concat/split/regexp/replace/pad over part."""
    p = io.load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.trim(F.lit("  padded  ")).alias("trimmed"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_pipe_type"),
        # split + element access: Spark getItem is 0-based (oracle's
        # string_split is 1-based).
        F.split(F.col("p_brand"), "#").getItem(1).alias("brand_num"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_digits"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("name_devoweled"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("-")).alias("type_dashed"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
        F.reverse(F.col("p_brand")).alias("brand_reversed"),
        F.instr(F.col("p_name"), "a").alias("first_a_pos"),
    )


STRING_FUNCTIONS_SQL = """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       lower(p_brand) AS brand_lower,
       trim('  padded  ') AS trimmed,
       substring(p_type, 1, 5) AS type_prefix,
       length(p_name) AS name_len,
       concat_ws('|', p_brand, p_type) AS brand_pipe_type,
       string_split(p_brand, '#')[2] AS brand_num,
       regexp_extract(p_brand, '([0-9]+)', 1) AS brand_digits,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devoweled,
       replace(p_type, ' ', '-') AS type_dashed,
       lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
       reverse(p_brand) AS brand_reversed,
       strpos(p_name, 'a') AS first_a_pos
FROM part
"""


def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/dayofweek/date_trunc/datediff/last_day/date_add.

    dayofweek origin differs: Spark Sunday=1 … DuckDB Sunday=0, so the
    oracle adds 1. date_trunc is CAST back to TIMESTAMP in the oracle
    so both sides yield naive datetimes.
    """
    o = io.load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.quarter("o_orderdate").alias("qtr"),
        # NTZ cast: date_trunc returns session-tz TIMESTAMP (collects
        # as process-local naive values under a non-UTC driver)
        F.date_trunc("month", F.col("o_orderdate")).cast("timestamp_ntz").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch95"
        ),
        F.last_day("o_orderdate").alias("month_end"),
        F.date_add(F.to_date("o_orderdate"), 30).alias("due_date"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


DATE_FUNCTIONS_SQL = """
SELECT o_orderkey,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mo,
       dayofmonth(o_orderdate) AS dom,
       dayofweek(o_orderdate) + 1 AS dow,
       quarter(o_orderdate) AS qtr,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch95,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(o_orderdate AS DATE) + 30 AS due_date,
       strftime(o_orderdate, '%Y-%m') AS ym
FROM orders
"""


def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/floor/ceil/mod/power/sqrt/ln/log10/sign/greatest/least."""
    li = io.load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") / 3.0, 4).alias("third"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_quantity").cast("long").alias("qty_floor"),
        F.ceil(F.col("l_extendedprice") / 1000.0).cast("long").alias("price_k_ceil"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.round(F.pow(F.col("l_quantity"), 2), 4).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1.0), 6).alias("price_ln"),
        F.round(F.log10(F.col("l_extendedprice") + 1.0), 6).alias("price_log10"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


MATH_FUNCTIONS_SQL = """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice / 3.0, 4) AS third,
       abs(l_discount - 0.05) AS disc_dev,
       CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
       CAST(ceil(l_extendedprice / 1000.0) AS BIGINT) AS price_k_ceil,
       l_orderkey % 7 AS key_mod7,
       round(pow(l_quantity, 2), 4) AS qty_sq,
       round(sqrt(l_extendedprice), 6) AS price_sqrt,
       round(ln(l_extendedprice + 1.0), 6) AS price_ln,
       round(log10(l_extendedprice + 1.0), 6) AS price_log10,
       CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
       greatest(l_tax, l_discount) AS max_rate,
       least(l_tax, l_discount) AS min_rate
FROM lineitem
"""


def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element_at/slice/sort + transform/aggregate lambdas over vectors.

    Oracle indexing is 1-based lists; lambdas compute in DOUBLE on both
    sides with identical (sequential) fold order, so sums match exactly.
    """
    e = io.load_table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(F.col("embedding"), 1).cast("double"), 6).alias("first_dim"),
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x), 4
        ).alias("sq_norm"),
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + F.abs(x)), 4
        ).alias("l1_norm"),
        F.round(
            F.element_at(F.array_sort(F.slice(dbl, 1, 8)), 1), 6
        ).alias("min_of_first8"),
        F.size(F.filter(dbl, lambda x: x > 0)).alias("n_positive"),
    )


ARRAY_FUNCTIONS_SQL = """
SELECT vec_id,
       len(embedding) AS dim,
       round(CAST(embedding[1] AS DOUBLE), 6) AS first_dim,
       round(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS sq_norm,
       round(list_sum(list_transform(embedding,
             x -> abs(CAST(x AS DOUBLE)))), 4) AS l1_norm,
       round(list_sort(list_transform(embedding[1:8],
             x -> CAST(x AS DOUBLE)))[1], 6) AS min_of_first8,
       len(list_filter(embedding, x -> x > 0)) AS n_positive
FROM embeddings
"""


def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object + from_json(schema) over events.props.

    The parse is hoisted into its own projection so ``from_json`` runs
    ONCE per row: inlining it into the three consumers left three
    copies in the final Project (CollapseProject duplicates cheap exprs
    only — but the single-Project form was already triplicated at
    source). Hoisting also lets the consumer Project stay in
    whole-stage codegen; measured ~20% faster warm at sf0.1.
    """
    # parallel load (r9): single-file scan → one task for the whole
    # JSON parse otherwise (same fix as fn_variant_shred; no-op at
    # real scale where the scan has ≥cores splits)
    ev = io.load_table_parallel(spark, sf_dir, "events")
    p = ev.select(
        "event_id",
        "props",
        F.from_json(F.col("props"), "k INT").getField("k").alias("k"),
    )
    return p.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.col("k").alias("k_int"),
        (F.col("k") % 10).alias("k_mod10"),
        F.when(F.col("k") > 50, "high").otherwise("low").alias("k_band"),
    )


JSON_FUNCTIONS_SQL = """
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
       CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod10,
       CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
            THEN 'high' ELSE 'low' END AS k_band
FROM events
"""


def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: build → lookup → transform → concat → introspect.

    Outputs are plain scalars/arrays so the DuckDB oracle can state the
    expected values without sharing Spark's map representation — the
    check proves the map operators compute, not how they serialize.
    """
    li = io.load_table(spark, sf_dir, "lineitem")
    m = F.map_from_arrays(
        F.array(F.lit("qty"), F.lit("price")),
        F.array(F.col("l_quantity"), F.col("l_extendedprice")),
    )
    doubled = F.transform_values(m, lambda _k, v: v * 2)
    merged = F.map_concat(m, F.create_map(F.lit("disc"), F.col("l_discount")))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.element_at(m, "qty").alias("qty_lookup"),
        F.element_at(doubled, "price").alias("price_doubled"),
        # joined digest, not the raw array (driver canonicalizer hazard)
        F.array_join(F.map_keys(merged), ",").alias("keys3"),
        F.size(merged).alias("n_entries"),
        F.element_at(F.map_values(merged), 3).alias("third_value"),
    )


MAP_FUNCTIONS_SQL = """
SELECT l_orderkey, l_linenumber,
       l_quantity AS qty_lookup,
       l_extendedprice * 2 AS price_doubled,
       'qty,price,disc' AS keys3,
       3 AS n_entries,
       l_discount AS third_value
FROM lineitem
"""


def try_safe_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI error-safe arithmetic/casts: try_divide / try_cast /
    nullif-guarded modulo — NULL instead of exceptions on bad input.
    At 100 TB a single malformed row must never kill a 6-hour job; the
    try_* family is the engine's posture for dirty data.
    """
    o = io.load_table(spark, sf_dir, "orders")
    zero_when_f = F.when(F.col("o_orderstatus") == "F", 0).otherwise(
        F.month("o_orderdate")
    )
    return o.select(
        "o_orderkey",
        # integer ten-thousandths, not round(,4): Spark rounds HALF_UP,
        # DuckDB HALF_EVEN — exact .00005 boundaries would flap
        F.floor(
            F.try_divide(F.col("o_totalprice"), zero_when_f) * 10000 + F.lit(0.5)
        ).cast("long").alias("price_per_month_e4"),
        F.col("o_orderstatus").try_cast("int").alias("status_as_int"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("prio_digit"),
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
    )


TRY_SAFE_SQL = """
SELECT o_orderkey,
       CAST(floor(CASE WHEN (CASE WHEN o_orderstatus = 'F' THEN 0
                                  ELSE month(o_orderdate) END) = 0
                       THEN NULL
                       ELSE o_totalprice / (CASE WHEN o_orderstatus = 'F' THEN 0
                                                 ELSE month(o_orderdate) END)
                  END * 10000 + 0.5) AS BIGINT) AS price_per_month_e4,
       TRY_CAST(o_orderstatus AS INTEGER) AS status_as_int,
       TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_digit,
       nullif(o_orderstatus, 'P') AS status_or_null
FROM orders
"""


def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide numeric columns → long (measure, value) rows —
    the inverse of agg_pivot, a plan-level expansion with no shuffle."""
    s = io.load_table(spark, sf_dir, "supplier")
    wide = s.select(
        "s_suppkey",
        F.col("s_acctbal").cast("double").alias("acctbal"),
        F.col("s_nationkey").cast("double").alias("nationkey"),
    )
    return wide.unpivot("s_suppkey", ["acctbal", "nationkey"], "measure", "value")


UNPIVOT_SQL = """
SELECT s_suppkey, 'acctbal' AS measure, CAST(s_acctbal AS DOUBLE) AS value FROM supplier
UNION ALL
SELECT s_suppkey, 'nationkey', CAST(s_nationkey AS DOUBLE) FROM supplier
"""


def table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed per-group digest of the supplier table: each
    row hashes to md5(canonical '|'-joined string form), the first 15
    hex chars parse to a 60-bit integer, and the group digest is the
    ORDER-INDEPENDENT sum of row hashes mod 2³² — the cheap
    cross-engine/cross-cluster equality check a 100-TB migration runs
    instead of shipping both copies to one place (this is the same
    trick the round driver's value-hash gate uses).

    One narrow shuffle on the group key; everything else is per-row
    JVM expression. The oracle recomputes the digest in DuckDB — a
    hash-match proves byte-level content agreement.
    """
    s = io.load_table(spark, sf_dir, "supplier")
    canon = F.concat_ws(
        "|",
        F.col("s_suppkey").cast("string"),
        F.col("s_name"),
        F.col("s_nationkey").cast("string"),
        # integer cents, not formatted decimals: float→string formatting
        # rounds HALF_EVEN vs HALF_UP differently across engines (trap 1)
        F.floor(F.col("s_acctbal") * 100 + F.lit(0.5)).cast("long").cast("string"),
    )
    row_h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    return (
        s.select(F.col("s_nationkey").alias("nationkey"), (row_h % 4294967296).alias("h"))
        .groupBy("nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("h").alias("digest"),
        )
    )


TABLE_FINGERPRINT_SQL = """
WITH rows_h AS (
  SELECT s_nationkey AS nationkey,
         list_reduce(
           list_transform(
             string_split_regex(substr(md5(
               concat_ws('|', CAST(s_suppkey AS VARCHAR), s_name,
                         CAST(s_nationkey AS VARCHAR),
                         CAST(CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS VARCHAR))), 1, 15), ''),
             c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
           (a, b) -> a * 16 + b) % 4294967296 AS h
  FROM supplier
)
SELECT nationkey, count(*) AS n_rows, CAST(sum(h) AS BIGINT) AS digest
FROM rows_h
GROUP BY nationkey
"""


def variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 VARIANT semi-structured surface: build a nested JSON
    document per event JVM-side (known construction — the PNG-decoder
    proof pattern), ``parse_json`` it into a true VARIANT cell, then
    shred it back out with typed ``variant_get`` path extraction
    (nested object, array index, top-level field), ``try_variant_get``
    on a missing path, and ``schema_of_variant`` introspection of the
    fixture's own props JSON.

    The DuckDB oracle derives every output straight from the source
    columns (the construction is known), so a hash match proves the
    VARIANT encode→shred round-trip reconstructed each typed value
    exactly — the engine-native semi-structured path a 100 TB event
    pipeline would use instead of per-query from_json re-parsing
    (VARIANT parses ONCE at ingest; extraction is binary-offset
    navigation, not text parsing).

    Monetary values ride as integer cents so no float crosses the
    JSON text boundary (NOTES trap 1).
    """
    # parallel load (r9): events arrives as ONE parquet file → one scan
    # split, so the whole JSON-build + variant-parse projection ran in
    # a single task (census: 1 job / 1 task / 1.8 s). The round-robin
    # fan-out costs one narrow exchange of the five consumed columns
    # and is a no-op at real scale (≥cores splits already).
    ev = io.load_table_parallel(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    payload = F.to_json(
        F.struct(
            F.col("event_type").alias("et"),
            F.struct(F.col("user_id").alias("uid"), cents.alias("cents")).alias(
                "nested"
            ),
            F.array(F.col("event_type"), F.lit("fixed")).alias("tags"),
        )
    )
    v = ev.select(
        "event_id",
        F.parse_json(payload).alias("v"),
        F.parse_json(F.col("props")).alias("pv"),
    )
    return v.select(
        "event_id",
        F.expr("variant_get(v, '$.et', 'string')").alias("et"),
        F.expr("variant_get(v, '$.nested.uid', 'bigint')").alias("uid"),
        F.expr("variant_get(v, '$.nested.cents', 'bigint')").alias("cents"),
        F.expr("variant_get(v, '$.tags[1]', 'string')").alias("tag1"),
        F.expr("try_variant_get(v, '$.absent', 'bigint')").alias("absent"),
        F.expr("variant_get(pv, '$.k', 'bigint')").alias("k"),
        F.expr("schema_of_variant(pv)").alias("props_schema"),
    )  # no orderBy: the shred is a pure projection — a global sort
    # would add a range exchange for nothing (driver compare is
    # order-insensitive)


VARIANT_SHRED_SQL = """
SELECT event_id,
       event_type AS et,
       user_id AS uid,
       CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
       'fixed' AS tag1,
       CAST(NULL AS BIGINT) AS absent,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       'OBJECT<k: BIGINT>' AS props_schema
FROM events
ORDER BY event_id
"""


QUERIES = {
    "fn_string": (string_functions, STRING_FUNCTIONS_SQL),
    "fn_date": (date_functions, DATE_FUNCTIONS_SQL),
    "fn_math": (math_functions, MATH_FUNCTIONS_SQL),
    "fn_array_lambda": (array_functions, ARRAY_FUNCTIONS_SQL),
    "fn_json": (json_functions, JSON_FUNCTIONS_SQL),
    "fn_variant_shred": (variant_shred, VARIANT_SHRED_SQL),
    "fn_map": (map_functions, MAP_FUNCTIONS_SQL),
    "fn_try_safe": (try_safe_functions, TRY_SAFE_SQL),
    "rel_unpivot_melt": (unpivot_melt, UNPIVOT_SQL),
    "fn_table_fingerprint": (table_fingerprint, TABLE_FINGERPRINT_SQL),
}
