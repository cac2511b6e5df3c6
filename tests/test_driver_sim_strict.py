"""Dtype-strictness gate for the driver simulator (round-2 verdict #2).

The driver's canonicalizer hashes dtypes, not just values: DuckDB
HUGEINT/DECIMAL outputs that are value-identical to Spark's
BIGINT/DOUBLE still produce ``hash_match: false``. This cost green
rows in rounds 1 AND 2, so ``tools/driver_sim.py`` must now fail on a
deliberately HUGEINT-returning oracle — these tests pin that.
"""

from __future__ import annotations

import duckdb


def _duck_types(sql):
    con = duckdb.connect()
    rel = con.sql(sql)
    return list(rel.columns), rel.types


def test_hugeint_oracle_rejected():
    from driver_sim import dtype_violations

    # list_sum over ints is the exact shape that burned round 2
    cols, types = _duck_types("SELECT list_sum([1, 2, 3]) AS s")
    assert str(types[0]).upper() == "HUGEINT"  # the trap is real
    viol = dtype_violations([("s", "bigint")], cols, types)
    assert viol and "HUGEINT" in viol[0]


def test_decimal_oracle_rejected():
    from driver_sim import dtype_violations

    cols, types = _duck_types("SELECT CAST(1.5 AS DECIMAL(12,2)) AS d")
    viol = dtype_violations([("d", "double")], cols, types)
    assert viol and "DECIMAL" in viol[0]


def test_spark_decimal_rejected():
    from driver_sim import dtype_violations

    cols, types = _duck_types("SELECT CAST(1.5 AS DOUBLE) AS d")
    viol = dtype_violations([("d", "decimal(12,2)")], cols, types)
    assert viol and "DECIMAL" in viol[0]


def test_kind_mismatch_rejected():
    from driver_sim import dtype_violations

    # int on one side, float on the other: values may compare equal at
    # 1e-6 but pandas hashes int64 vs float64 columns differently
    cols, types = _duck_types("SELECT CAST(1 AS DOUBLE) AS x")
    viol = dtype_violations([("x", "bigint")], cols, types)
    assert viol and "mismatch" in viol[0]


def test_matching_kinds_clean():
    from driver_sim import dtype_violations

    cols, types = _duck_types(
        "SELECT CAST(1 AS BIGINT) AS a, CAST(1.5 AS DOUBLE) AS b,"
        " 'x' AS c, TIMESTAMP '2024-01-01' AS t"
    )
    viol = dtype_violations(
        [("a", "bigint"), ("b", "double"), ("c", "string"), ("t", "timestamp_ntz")],
        cols,
        types,
    )
    assert viol == []


def test_fixed_oracles_are_bigint_now():
    """The five round-2 repr-fail oracles must emit driver-hashable types."""
    from seamless_sharepoint_etl_spark.llm_ops.text import (
        CORPUS_CURATION_SQL,
        FINGERPRINT_SQL,
    )
    from seamless_sharepoint_etl_spark.llm_ops.multimodal import (
        BYTE_HISTOGRAM_SQL,
        FRAME_SAMPLE_SQL,
    )
    from seamless_sharepoint_etl_spark.sources.formats import CSV_SCAN_SUPPLIER_SQL

    con = duckdb.connect()
    for t in ("documents", "supplier"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'"
        )
    for sql in (FINGERPRINT_SQL, FRAME_SAMPLE_SQL, BYTE_HISTOGRAM_SQL,
                CORPUS_CURATION_SQL, CSV_SCAN_SUPPLIER_SQL):
        rel = con.sql(sql)
        bad = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if str(t).upper() == "HUGEINT" or str(t).upper().startswith("DECIMAL")
        ]
        assert not bad, bad
