"""Data-quality audit operators: referential integrity and drift.

Provenance: SURVEY.md §2 Tier B scale posture (no reference counterpart
— the reference trusts its source lists blindly; `bin/copy-seamless-to-
sharepoint.rb` has no constraint checking at all). At 100 TB a lake is
fed by many producers and the two audits every warehouse runs nightly
are (a) do the foreign keys still line up, and (b) did a column's
distribution move. Both must be expressible as single declarative
plans, not row-at-a-time validators.

``diag_referential_integrity`` audits every FK edge of the TPC-H-ish
schema in one statement: per edge it reports row count, NULL-key count,
distinct-key count, and the number of distinct child keys with no
parent (orphans). The orphan probe is distinct-then-anti-join — the
distinct shrinks the probe side to |keys| before the join, so the
shuffle carries key cardinality, not table cardinality; Catalyst
broadcasts the small parents (nation/region/supplier) on its own.

``diag_psi_drift`` computes the Population Stability Index of the order
value distribution between two adjacent years over 10 fixed equi-width
bins. The bin edges come from a 1-row driver-side bounds pass (the
scalar-frontier pattern — binning is then map-side literal arithmetic),
and the PSI terms are computed on Laplace-smoothed proportions so empty
bins stay finite. One corpus scan + one 10-row shuffle; the ln rides on
exact integer-count ratios and the result is floored to ppm, the same
cross-engine determinism recipe as the log-likelihood family.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import io

# (child_table, child_key, parent_table, parent_key) — every FK edge of
# the schema. Shared by the Spark plan and the generated oracle SQL so
# the two can never drift.
FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-statement FK audit over all {len(FK_EDGES)} edges: row /
    NULL-key / distinct-key / orphan-key counts per edge (see module
    docstring for the scale shape)."""
    parts = []
    for child, ckey, parent, pkey in FK_EDGES:
        c = io.load_table(spark, sf_dir, child).select(ckey)
        p = io.load_table(spark, sf_dir, parent).select(pkey)
        stats = c.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col(ckey).isNull(), 1)).alias("n_null"),
            F.countDistinct(ckey).alias("n_keys"),
        )
        orphans = (
            c.filter(F.col(ckey).isNotNull())
            .distinct()
            .join(p, F.col(ckey) == F.col(pkey), "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphan_keys"))
        )
        parts.append(
            stats.crossJoin(orphans).select(
                F.lit(f"{child}.{ckey}->{parent}.{pkey}").alias("edge"),
                "n_rows",
                "n_null",
                "n_keys",
                "n_orphan_keys",
            )
        )
    return reduce(DataFrame.unionAll, parts).orderBy("edge")


def _ri_edge_sql(child: str, ckey: str, parent: str, pkey: str) -> str:
    return f"""
SELECT '{child}.{ckey}->{parent}.{pkey}' AS edge,
       (SELECT count(*) FROM {child}) AS n_rows,
       (SELECT count(*) FROM {child} WHERE {ckey} IS NULL) AS n_null,
       (SELECT count(DISTINCT {ckey}) FROM {child}) AS n_keys,
       (SELECT count(*) FROM (SELECT DISTINCT {ckey} AS k FROM {child}
                              WHERE {ckey} IS NOT NULL) c
        WHERE NOT EXISTS (SELECT 1 FROM {parent} WHERE {pkey} = c.k))
         AS n_orphan_keys
"""


REFERENTIAL_INTEGRITY_SQL = (
    "\nUNION ALL\n".join(_ri_edge_sql(*e) for e in FK_EDGES)
    + "\nORDER BY edge"
)


# --- PSI drift --------------------------------------------------------

PSI_BASE_YEAR = 1995  # "expected" distribution
PSI_CUR_YEAR = 1996  # "actual" distribution
PSI_BINS = 10


def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of order value, {PSI_BASE_YEAR}
    (expected) vs {PSI_CUR_YEAR} (actual), over {PSI_BINS} fixed
    equi-width cent bins spanning both years' range. PSI =
    Σ (pₐ−pₑ)·ln(pₐ/pₑ) with Laplace-smoothed proportions; the standard
    alert thresholds are 0.1 (drifting) / 0.25 (shifted). Emitted
    per-bin in ppm so the alerting total is a trivial downstream sum
    and the driver hash stays integer-exact."""
    o = io.load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(PSI_BASE_YEAR, PSI_CUR_YEAR)
    )
    c = o.select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        F.year("o_orderdate").alias("y"),
    )
    lo, hi, n_e, n_a = c.agg(
        F.min("cents"),
        F.max("cents"),
        F.count(F.when(F.col("y") == PSI_BASE_YEAR, 1)),
        F.count(F.when(F.col("y") == PSI_CUR_YEAR, 1)),
    ).first()
    if lo is None:  # neither year present: emit empty, don't crash on NULL bounds
        return spark.createDataFrame(
            [], "bin BIGINT, e_cnt BIGINT, a_cnt BIGINT, psi_ppm BIGINT"
        )
    span = max(hi - lo + 1, 1)
    g = (
        c.select(
            "y",
            F.expr(
                f"least(((cents - {int(lo)}) * {PSI_BINS})"
                f" div {int(span)}, {PSI_BINS - 1})"
            ).alias("bin"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.when(F.col("y") == PSI_BASE_YEAR, 1)).alias("e_cnt"),
            F.count(F.when(F.col("y") == PSI_CUR_YEAR, 1)).alias("a_cnt"),
        )
    )
    p_e = (F.col("e_cnt") + 1).cast("double") / F.lit(float(n_e + PSI_BINS))
    p_a = (F.col("a_cnt") + 1).cast("double") / F.lit(float(n_a + PSI_BINS))
    return g.select(
        "bin",
        "e_cnt",
        "a_cnt",
        F.floor((p_a - p_e) * F.log(p_a / p_e) * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("psi_ppm"),
    ).orderBy("bin")


PSI_DRIFT_SQL = f"""
WITH c AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         year(o_orderdate) AS y
  FROM orders WHERE year(o_orderdate) IN ({PSI_BASE_YEAR}, {PSI_CUR_YEAR})
),
b AS (
  SELECT min(cents) AS lo,
         greatest(max(cents) - min(cents) + 1, 1) AS span,
         count(*) FILTER (y = {PSI_BASE_YEAR}) AS n_e,
         count(*) FILTER (y = {PSI_CUR_YEAR}) AS n_a
  FROM c
),
g AS (
  SELECT least(((cents - lo) * {PSI_BINS}) // span, {PSI_BINS - 1}) AS bin,
         count(*) FILTER (y = {PSI_BASE_YEAR}) AS e_cnt,
         count(*) FILTER (y = {PSI_CUR_YEAR}) AS a_cnt
  FROM c, b GROUP BY 1
)
SELECT bin, e_cnt, a_cnt,
       CAST(floor(((a_cnt + 1.0) / (n_a + {PSI_BINS})
                   - (e_cnt + 1.0) / (n_e + {PSI_BINS}))
                  * ln(((a_cnt + 1.0) / (n_a + {PSI_BINS}))
                       / ((e_cnt + 1.0) / (n_e + {PSI_BINS})))
                  * 1000000 + 0.5) AS BIGINT) AS psi_ppm
FROM g, b ORDER BY bin
"""


# --- join-cardinality pre-flight -------------------------------------


def join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight join-size prediction for the M:N join
    ``orders ⋈ events ON o_custkey = user_id`` WITHOUT executing it:
    |A ⋈ B| = Σₖ c_A(k)·c_B(k) exactly, so the estimate needs only the
    two per-key count tables — the shuffles carry key cardinality, not
    fact cardinality, and the count-table join is tiny. This is the
    planner statistic you compute before committing a 100 TB fact-fact
    join: predicted output rows, matched-key count, and the heaviest
    key's contribution (the salting/skew-remedy trigger, complementing
    ``diag_join_key_skew``'s one-sided profile). The pytest gate
    proves predicted == the actually-executed join's count.
    """
    a = (
        io.load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("ca"))
    )
    b = (
        io.load_table(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("k"))
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    j = a.join(b, "k").select(
        "k", (F.col("ca") * F.col("cb")).alias("contrib")
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_common_keys"),
        F.sum("contrib").alias("predicted_rows"),
        F.max("contrib").alias("max_contrib"),
    )


JOIN_CARDINALITY_SQL = """
WITH a AS (SELECT o_custkey AS k, count(*) AS ca FROM orders GROUP BY 1),
b AS (SELECT user_id AS k, count(*) AS cb FROM events GROUP BY 1),
j AS (SELECT a.k, ca * cb AS contrib FROM a JOIN b USING (k))
SELECT count(*) AS n_common_keys,
       CAST(sum(contrib) AS BIGINT) AS predicted_rows,
       CAST(max(contrib) AS BIGINT) AS max_contrib
FROM j
"""


# --- experimentation: 2x2 chi-square -------------------------------


def ab_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B conversion significance: split users into two cohorts by
    key parity, outcome = "ever fired a purchase event", and compute
    the 2×2 chi-square statistic χ² = N·(ad−bc)² / ((a+b)(c+d)(a+c)
    (b+d)) — the experimentation readout every event pipeline serves.

    Shape: one user-level aggregate (the only corpus shuffle: events →
    per-user converted flag), then ONE global 1-row aggregate of four
    conditional counts. The statistic is computed in DOUBLE from the
    four counts — int64 products look tempting but den ≈ n⁴/16
    overflows BIGINT past ~110k users and ANSI mode turns that into a
    query-killing ARITHMETIC_OVERFLOW (caught by review); doubles are
    exact for counts < 2^53 per cell and both engines make identical
    IEEE decisions on identical inputs, so the ppm floor still
    hash-matches. The pytest gate cross-checks against scipy-free
    textbook arithmetic.
    """
    ev = io.load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    )
    counts = users.agg(
        F.count(F.when((F.col("user_id") % 2 == 0) & (F.col("conv") == 1), 1)).alias("a"),
        F.count(F.when((F.col("user_id") % 2 == 0) & (F.col("conv") == 0), 1)).alias("b"),
        F.count(F.when((F.col("user_id") % 2 == 1) & (F.col("conv") == 1), 1)).alias("c"),
        F.count(F.when((F.col("user_id") % 2 == 1) & (F.col("conv") == 0), 1)).alias("d"),
    )
    a, b = F.col("a").cast("double"), F.col("b").cast("double")
    c, d = F.col("c").cast("double"), F.col("d").cast("double")
    num = (a + b + c + d) * (a * d - b * c) * (a * d - b * c)
    den = (a + b) * (c + d) * (a + c) * (b + d)
    return counts.select(
        "a",
        "b",
        "c",
        "d",
        F.when(den == 0, F.lit(0).cast("long"))  # degenerate margin: no test
        .otherwise(
            F.floor(num / den * 1_000_000 + F.lit(0.5)).cast("long")
        )
        .alias("chi2_ppm"),
    )


AB_CHI_SQUARE_SQL = """
WITH u AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
t AS (
  SELECT count(*) FILTER (user_id % 2 = 0 AND conv = 1) AS a,
         count(*) FILTER (user_id % 2 = 0 AND conv = 0) AS b,
         count(*) FILTER (user_id % 2 = 1 AND conv = 1) AS c,
         count(*) FILTER (user_id % 2 = 1 AND conv = 0) AS d
  FROM u
)
SELECT a, b, c, d,
       CASE WHEN (CAST(a AS DOUBLE) + b) * (CAST(c AS DOUBLE) + d)
                 * (CAST(a AS DOUBLE) + c) * (CAST(b AS DOUBLE) + d) = 0
            THEN CAST(0 AS BIGINT)
       ELSE CAST(floor(
              (CAST(a AS DOUBLE) + b + c + d)
              * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)
              * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)
              / ((CAST(a AS DOUBLE) + b) * (CAST(c AS DOUBLE) + d)
                 * (CAST(a AS DOUBLE) + c) * (CAST(b AS DOUBLE) + d))
              * 1000000 + 0.5) AS BIGINT)
       END AS chi2_ppm
FROM t
"""


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------

# Expected Benford proportions in ppm, precomputed once in Python and
# embedded as LITERALS in both plans — computing log10() inside each
# engine would tie the oracle to two libm implementations (NOTES trap
# 1's sibling); a shared constant cannot drift.
BENFORD_EXP_PPM = [301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757]


def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs
    Benford's law — the classic books-level fraud/synthesis screen
    (fabricated amounts over-sample middle digits).

    Exact pipeline: cents = floor(price·100 + 0.5) per row, first
    digit = leading character of the cents integer (every total is
    ≥ $1, so cents ≥ 100 and the lead digit is significant), observed
    share in ppm by integer division. One 9-group hash aggregate over
    the scan — at 100 TB this is a map-side-combined rollup with a
    9-row exchange, nothing else.
    """
    o = io.load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    d = o.select(
        F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit")
    )
    counts = d.groupBy("digit").agg(F.count(F.lit(1)).alias("observed"))
    total = counts.agg(F.sum("observed").alias("total"))
    exp = F.array(*[F.lit(v) for v in BENFORD_EXP_PPM])
    j = counts.crossJoin(F.broadcast(total))
    obs_ppm = F.expr("observed * 1000000 div total")
    exp_ppm_col = F.element_at(exp, F.col("digit")).cast("long")
    return j.select(
        "digit",
        "observed",
        obs_ppm.alias("obs_ppm"),
        exp_ppm_col.alias("exp_ppm"),
        (obs_ppm - exp_ppm_col).alias("delta_ppm"),
    ).orderBy("digit")


_BENFORD_CASE = " ".join(
    "WHEN {d} THEN {v}".format(d=i + 1, v=v)
    for i, v in enumerate(BENFORD_EXP_PPM)
)

BENFORD_DIGIT_AUDIT_SQL = """
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM orders
), counts AS (
  SELECT digit, count(*) AS observed FROM digits GROUP BY digit
), tot AS (SELECT CAST(sum(observed) AS BIGINT) AS total FROM counts)
SELECT digit, CAST(observed AS BIGINT) AS observed,
       observed * 1000000 // total AS obs_ppm,
       CAST(CASE digit {case} END AS BIGINT) AS exp_ppm,
       observed * 1000000 // total - CASE digit {case} END AS delta_ppm
FROM counts, tot
ORDER BY digit
""".format(case=_BENFORD_CASE)


QUERIES = {
    "diag_referential_integrity": (
        referential_integrity,
        REFERENTIAL_INTEGRITY_SQL,
    ),
    "diag_psi_drift": (psi_drift, PSI_DRIFT_SQL),
    "diag_join_cardinality": (join_cardinality, JOIN_CARDINALITY_SQL),
    "diag_ab_chi_square": (ab_chi_square, AB_CHI_SQUARE_SQL),
    "diag_benford_digit_audit": (benford_digit_audit, BENFORD_DIGIT_AUDIT_SQL),
}
