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


# ---------------------------------------------------------------------------
# Portable fixed-point binary logarithm
# ---------------------------------------------------------------------------
#
# fxlog2(a, b) ≈ log2(a / b) · 2^FXLOG2_FRAC_BITS for BIGINT a, b ≥ 1,
# computed with PURE integer arithmetic — multiply, truncating integer
# division, comparisons, and the minimal-binary-string length both
# engines expose as `length(bin(x))` (verified digit-identical). The
# classic digit-extraction scheme: normalize the q20 fixed-point ratio
# to [1, 2), then each squaring step yields one fraction bit. Because
# every operation is exact integer arithmetic, the result is
# bit-identical across engines BY CONSTRUCTION — unlike log()/log2(),
# whose libm implementations are not correctly rounded and may differ
# by an ulp (the residual hazard mm_byte_entropy / diag_benford have
# to document). The value is an approximation of log2 — truncation
# bias ≈ 1.44/q + 2^-17 where q = (a·2^20) div b, i.e. ≲ 2^-17 of a
# bit for ratios ≥ 1 and degrading as the ratio shrinks below 1 (a
# ratio of 2^-k keeps only ~20-k mantissa bits) — but the METRIC is
# defined as this algorithm, so cross-engine agreement is exact, not
# probabilistic. Weight tiny-ratio terms by tiny masses (as MI does)
# or pre-scale if small-ratio precision matters.
#
# Domain: a, b ≥ 1 and a·2^20 < 2^63 (a < 2^43) and a·2^20 ≥ b
# (ratio ≥ 2^-20). Callers with wider ranges must pre-scale.

FXLOG2_FRAC_BITS = 16
_FX_ONE = 1 << 20  # q20 mantissa scale


def fxlog2_steps(div: str, a: str = "a", b: str = "b") -> list[tuple[str, str]]:
    """Sequential (column_name, expression) pairs computing
    ``fxlog2`` ≈ log2(a/b)·2^{FXLOG2_FRAC_BITS} from columns `a`, `b`.

    `div` is the engine's truncating integer-division token (Spark
    ``div``, DuckDB ``//`` — both truncate toward zero, verified).
    Apply as chained withColumn calls (Spark) or a generated CTE chain
    (SQL); each expression references only earlier names, so the two
    renderings are the same arithmetic by construction.
    """
    pabs_ladder = " ".join(
        f"WHEN {k} THEN CAST({1 << k} AS BIGINT)" for k in range(46)
    )
    steps: list[tuple[str, str]] = [
        ("fx_q", f"({a} * {_FX_ONE}) {div} {b}"),
        ("fx_e", "length(bin(fx_q)) - 21"),
        ("fx_pabs", f"CASE abs(fx_e) {pabs_ladder} END"),
        (
            "fx_v0",
            f"CASE WHEN fx_e >= 0 THEN fx_q {div} fx_pabs"
            " ELSE fx_q * fx_pabs END",
        ),
        ("fx_f0", "CAST(0 AS BIGINT)"),
    ]
    for i in range(FXLOG2_FRAC_BITS):
        steps.append((f"fx_w{i}", f"(fx_v{i} * fx_v{i}) {div} {_FX_ONE}"))
        steps.append(
            (
                f"fx_v{i + 1}",
                f"CASE WHEN fx_w{i} >= {2 * _FX_ONE} THEN fx_w{i} {div} 2"
                f" ELSE fx_w{i} END",
            )
        )
        steps.append(
            (
                f"fx_f{i + 1}",
                f"fx_f{i} * 2 + CASE WHEN fx_w{i} >= {2 * _FX_ONE}"
                " THEN 1 ELSE 0 END",
            )
        )
    steps.append(
        (
            "fxlog2",
            f"fx_e * {1 << FXLOG2_FRAC_BITS} + fx_f{FXLOG2_FRAC_BITS}",
        )
    )
    return steps


def fxlog2_select_items(div: str, a: str = "a", b: str = "b") -> list[str]:
    """The same ``fxlog2_steps`` chain as ``"expr AS name"`` items for a
    SINGLE ``selectExpr`` using lateral column aliases (each item may
    reference aliases defined earlier in the same list; Spark 3.4+
    resolves these in one analysis pass).

    Why it exists (r9, guide §1.2 step 2): the original per-step
    ``withColumn`` loop creates 54 Dataset objects, each EAGERLY
    analyzed over a growing plan — ~0.5-1 s of pure driver/Catalyst
    time per query call. One lateral-alias select is the identical
    arithmetic (verified ``exceptAll``-empty both ways) analyzed once.
    The DuckDB oracle keeps rendering ``fxlog2_steps`` as a CTE chain —
    same expressions, same results, one implementation of the math."""
    return [f"{expr} AS {name}" for name, expr in fxlog2_steps(div, a, b)]
