"""Portable cross-engine primitives.

Deterministic integer arithmetic that Spark and DuckDB reproduce
bit-for-bit — the foundation of every oracle that synthesizes keys,
positions, samples, or sketches. The same (A, C, M) digits previously
lived hard-coded in six call sites (KMV, the spatial join, the range
generator, BFS, plus their SQL mirrors and a test); a single edited
copy with an un-edited mirror is a silent cross-engine drift, so both
the Spark Column and the SQL text come from here.

The 31-bit constants keep every product far below BIGINT overflow
(x·A ≲ 2^47 for x < 2^17-scale keys; callers with larger domains must
pre-reduce) — Spark 4 runs ANSI mode, where a 64-bit wrap THROWS
rather than wrapping.
"""

from __future__ import annotations

from pyspark.sql import Column

LCG_A = 1_103_515_245
LCG_C = 12_345
LCG_M = 2_147_483_648  # 2^31

# independent second stream (MINSTD-style multiplier) for callers that
# need two decorrelated draws per key (e.g. lat/lon)
LCG2_A = 69_069
LCG2_C = 1


def lcg31(col: Column) -> Column:
    """31-bit LCG mix of an integer Column — Spark side."""
    return (col * LCG_A + LCG_C) % LCG_M


def lcg31_sql(expr: str) -> str:
    """The digit-identical DuckDB/ANSI text for :func:`lcg31`."""
    return f"({expr} * {LCG_A} + {LCG_C}) % {LCG_M}"


def lcg31b(col: Column) -> Column:
    """Second-stream 31-bit LCG mix — Spark side."""
    return (col * LCG2_A + LCG2_C) % LCG_M


def lcg31b_sql(expr: str) -> str:
    """The digit-identical DuckDB/ANSI text for :func:`lcg31b`."""
    return f"({expr} * {LCG2_A} + {LCG2_C}) % {LCG_M}"
