"""DataFrame-native Bloom filter: distributed build, broadcast probe.

Spark's own ``bloom_filter_agg`` is optimizer-internal (runtime filter
injection) and not SQL-registered, so the engine owns the mechanism as
plain DataFrame aggregates — which also means it works identically for
runtime join pruning (``joins.bloom_prefilter_join``) and incremental
corpus dedup (``dedup.bloom_incremental_dedup``):

  build:  keys → H seeded xxhash64 positions → bit-OR per 64-bit word
          (distributed hash agg, ≤ m/64 rows) → ONE dense
          ``array<long>`` row.
  probe:  the bitmap rides a 1-row broadcast; each probe row tests all
          H positions with pure JVM shift/mask expressions and dies at
          the scan stage on a miss.

No false negatives by construction; false positives are expected and
must be removed by an exact join/semi-join downstream (which is what
keeps every consumer's result oracle-identical to the plain-join
answer). Size ``m_bits`` with the build-side key count — at 100 TB
history scale the classic m ≈ 1.44·n·log2(1/fp) sizing applies and the
bitmap broadcast is a few hundred MB at most, still far cheaper than
shuffling the probe side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_bitmap(keys: DataFrame, key_col: str, m_bits: int, h: int) -> DataFrame:
    """One-row DataFrame holding the dense bitmap as ``bm array<long>``.

    ``keys[key_col]`` may be any xxhash64-able type. The only exchange
    is the ≤ m/64-row word aggregate; partial aggregation does the
    heavy bit-OR map-side.
    """
    n_words = m_bits // 64
    seeds = F.array(*[F.lit(s) for s in range(h)])
    pos = keys.select(
        F.explode(
            F.transform(
                seeds,
                lambda s: F.pmod(F.xxhash64(F.col(key_col), s), F.lit(m_bits)),
            )
        ).alias("p")
    )
    words = pos.groupBy((F.col("p") / 64).cast("int").alias("w")).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))")
        ).alias("mask")
    )
    return words.agg(
        F.map_from_arrays(F.collect_list("w"), F.collect_list("mask")).alias("wm")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda w: F.coalesce(F.element_at(F.col("wm"), w), F.lit(0).cast("long")),
        ).alias("bm")
    )


def bloom_hit(key_col: str, m_bits: int, h: int) -> Column:
    """Predicate: all H bits set in the broadcast ``bm`` column for
    ``key_col``'s value — pure JVM shift/mask, whole-stage codegen."""
    hit: Column | None = None
    for s in range(h):
        test = F.expr(
            f"((shiftrightunsigned(element_at(bm,"
            f" CAST(pmod(xxhash64({key_col}, {s}), {m_bits}) / 64 AS INT) + 1),"
            f" CAST(pmod(xxhash64({key_col}, {s}), {m_bits}) % 64 AS INT))"
            f" & CAST(1 AS BIGINT)) = 1)"
        )
        hit = test if hit is None else (hit & test)
    assert hit is not None
    return hit
