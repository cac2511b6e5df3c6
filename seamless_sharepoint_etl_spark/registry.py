"""Central query registry: name → (Spark builder, DuckDB oracle SQL | None).

Every operator module contributes a ``QUERIES`` dict of
``name: (builder, oracle_sql)`` where ``builder(spark, sf_dir) ->
DataFrame`` and ``oracle_sql`` is equivalent ANSI SQL for DuckDB over
the same parquet tables (or ``None`` for genuinely non-SQL-expressible
ops — the driver then records a rows-only check).

``__spark_entry__`` exposes exactly this registry to the driver; tests
mirror the driver's hash-compare locally at sf0.001.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]
Entry = tuple[QueryFn, str | None]


def _collect() -> dict[str, Entry]:
    from . import pipelines
    from .operators import aggregates, joins, relational, sorts_setops, windows
    from .functions import scalar, udfs
    from .sources import formats, rest
    from .streaming import windows as stream_windows
    from .llm_ops import dedup, multimodal, similarity, text

    registry: dict[str, Entry] = {
        "flagship_incremental_load": (
            pipelines.incremental_load,
            pipelines.INCREMENTAL_LOAD_SQL,
        ),
        "routing_1500_split": (pipelines.routed, pipelines.ROUTED_SQL),
    }
    for mod in (
        relational,
        aggregates,
        joins,
        windows,
        sorts_setops,
        scalar,
        udfs,
        formats,
        rest,
        stream_windows,
        dedup,
        similarity,
        text,
        multimodal,
    ):
        overlap = registry.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names from {mod.__name__}: {overlap}")
        registry.update(mod.QUERIES)
    return registry


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _sql) in _collect().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _collect().items() if sql is not None}
