"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``seamless_sharepoint_etl_spark``; this module
only adapts the engine's registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from seamless_sharepoint_etl_spark import pipelines, registry, session


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference-parity incremental watermark load
    (SURVEY.md §7.1 slice 0 — operators A1-A11 as one lazy DAG).
    """
    session.configure(spark)
    return pipelines.incremental_load(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    regs = registry.queries()

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            session.configure(spark)  # nanosAsLong etc. on the driver's session
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in regs.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-checkable query."""
    return registry.oracle_sql()
