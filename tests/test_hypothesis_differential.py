"""Generative differential tests: random tiny relations through the
same logical query in Spark and DuckDB (sqllogictest-style fuzzing of
the semantics the whole oracle harness rests on: grouping, null
handling, join multiplicity, string comparison).

Examples are kept small and bounded (Spark job per example), with
deadlines disabled — throughput comes from minimal example counts, the
value from hypothesis's shrinking when a semantic drift IS found.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

keys = st.lists(
    st.one_of(st.none(), st.sampled_from(["a", "b", "c", "U0001D", "U0010D"])),
    min_size=1,
    max_size=8,
)
vals = st.lists(
    st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=8
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _pdf(ks, vs):
    n = min(len(ks), len(vs))
    return pd.DataFrame({"k": ks[:n], "v": pd.array(vs[:n], dtype="int64")})


def _duck(pdf, sql):
    con = duckdb.connect()
    con.register("t", pdf)
    out = sorted([tuple(r) for r in con.sql(sql).fetchall()], key=repr)
    con.close()
    return out


@given(keys, vals)
@SETTINGS
def test_groupby_sum_count_matches(spark, ks, vs):
    pdf = _pdf(ks, vs)
    import pyspark.sql.functions as F

    got = sorted(
        [
            tuple(r)
            for r in spark.createDataFrame(pdf)
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
            .collect()
        ],
        key=repr,
    )
    want = _duck(pdf, "SELECT k, count(*) AS n, sum(v) AS s FROM t GROUP BY k")
    assert got == want


@given(keys, vals)
@SETTINGS
def test_string_watermark_filter_matches(spark, ks, vs):
    """Lexicographic `>` on the watermark-key domain (the reference's
    string-compare semantics, SURVEY.md §7.3#1)."""
    pdf = _pdf(ks, vs)
    import pyspark.sql.functions as F

    got = sorted(
        [
            tuple(r)
            for r in spark.createDataFrame(pdf)
            .filter(F.col("k") > "U0001D")
            .collect()
        ],
        key=repr,
    )
    want = _duck(pdf, "SELECT k, v FROM t WHERE k > 'U0001D'")
    assert got == want


@given(keys, vals)
@SETTINGS
def test_self_join_multiplicity_matches(spark, ks, vs):
    pdf = _pdf(ks, vs)
    sdf = spark.createDataFrame(pdf)
    got = sorted(
        [
            tuple(r)
            for r in sdf.alias("a")
            .join(sdf.alias("b"), "k")
            .select("k")
            .collect()
        ],
        key=repr,
    )
    want = _duck(pdf, "SELECT a.k FROM t a JOIN t b USING (k)")
    assert got == want


@given(keys, vals)
@SETTINGS
def test_distinct_matches(spark, ks, vs):
    pdf = _pdf(ks, vs)
    got = sorted(
        [tuple(r) for r in spark.createDataFrame(pdf).distinct().collect()],
        key=repr,
    )
    want = _duck(pdf, "SELECT DISTINCT k, v FROM t")
    assert got == want


@given(keys, vals)
@SETTINGS
def test_window_rank_with_ties_matches(spark, ks, vs):
    """rank/dense_rank over duplicate order keys — tie semantics must
    agree; row_number needs the unique tie-break the engine's
    determinism policy mandates (so it is keyed by (v, k) here)."""
    pdf = _pdf(ks, vs).fillna({"k": "zz"})
    from pyspark.sql import Window
    import pyspark.sql.functions as F

    w = Window.orderBy("v", "k")
    sdf = spark.createDataFrame(pdf).select(
        "k",
        "v",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
    )
    got = sorted([tuple(r) for r in sdf.collect()], key=repr)
    want = _duck(
        pdf,
        """
        SELECT k, v,
               rank() OVER (ORDER BY v, k) AS rnk,
               dense_rank() OVER (ORDER BY v, k) AS drnk,
               row_number() OVER (ORDER BY v, k) AS rn
        FROM t
        """,
    )
    assert got == want


unicode_strings = st.lists(
    st.text(
        alphabet=st.sampled_from(list("aA àé九🎉 \t-_") ),
        min_size=0,
        max_size=8,
    ),
    min_size=1,
    max_size=6,
)


@given(unicode_strings)
@SETTINGS
def test_string_functions_unicode_matches(spark, texts):
    """upper/length/trim/reverse on unicode (codepoints, not bytes)."""
    pdf = pd.DataFrame({"s": texts})
    import pyspark.sql.functions as F

    sdf = spark.createDataFrame(pdf).select(
        F.length("s").alias("n"),
        F.upper("s").alias("up"),
        F.trim(F.col("s")).alias("tr"),
        F.reverse(F.col("s")).alias("rv"),
    )
    got = sorted([tuple(r) for r in sdf.collect()], key=repr)
    want = _duck(
        pdf,
        "SELECT length(s) AS n, upper(s) AS up, trim(s) AS tr, reverse(s) AS rv FROM t",
    )
    assert got == want
