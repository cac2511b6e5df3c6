"""Deduplication operators over `documents` (north-star tier).

Four tiers, matching the standard pretraining-dedup ladder:

  exact        — hash groupBy on (normalized) text. One shuffle on the
                 text hash; at 100 TB group by a 128-bit digest of the
                 text, not the text itself, to keep shuffle rows small.
  n-gram       — exact Jaccard over word-5-gram sets for candidate
    Jaccard      pairs that share ≥1 shingle. The shingle join IS the
                 candidate pruning: pair cost is proportional to true
                 overlap, never O(n²). SQL-expressible ⇒ oracle-checked.
  MinHash+LSH  — xxhash64 signatures → banded bucket join → verify.
                 The 100 TB path: candidate generation touches only
                 (doc, band-bucket) pairs. Deterministic (seeded hash
                 family = xxhash64(shingle, seed_i)); no SQL oracle
                 (DuckDB lacks xxhash64) ⇒ rows-only + pytest recall
                 gate against the exact-Jaccard truth.
  SimHash      — 32-bit sign-aggregated token-hash fingerprint; near-
                 dups land within small Hamming distance. rows-only +
                 pytest Hamming check on the planted near-dup pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import io

JACCARD_THRESHOLD = 0.8
SHINGLE_K = 5
N_MINHASH = 16
LSH_BANDS = 8  # × 2 rows/band = 16 hashes


def _norm_text():
    return F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text: canonical doc per group + dup count."""
    d = io.load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", _norm_text().alias("norm"))
        .groupBy("norm")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select(
            "canonical_doc_id",
            "n_copies",
            F.substring(F.sha2(F.col("norm").cast("binary"), 256), 1, 16).alias(
                "text_digest"
            ),
        )
    )


EXACT_DEDUP_SQL = """
SELECT min(doc_id) AS canonical_doc_id,
       count(*) AS n_copies,
       sha256(norm)[:16] AS text_digest
FROM (SELECT doc_id,
             regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm
      FROM documents)
GROUP BY norm
"""


def _shingles_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) relation: distinct word-5-grams per document."""
    d = io.load_table(spark, sf_dir, "documents")
    shingles = F.array_distinct(
        F.expr(
            f"""
            transform(sequence(1, greatest(size(split(text, ' ')) - {SHINGLE_K - 1}, 1)),
                      i -> concat_ws('_', slice(split(text, ' '), i, {SHINGLE_K})))
            """
        )
    )
    return d.select("doc_id", F.explode(shingles).alias("shingle"))


_SHINGLES_SQL = f"""
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(string_split(text, ' ')) - {SHINGLE_K - 2}, 2)),
           i -> array_to_string(string_split(text, ' ')[i:i+{SHINGLE_K - 1}], '_')
         ))) AS shingle
  FROM documents
"""


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with exact 5-gram Jaccard ≥ 0.8.

    Candidates come from the shingle self-join (pairs sharing ≥1
    shingle); intersection size falls out of the same join, so Jaccard
    is exact with no second pass over the texts.
    """
    sh = _shingles_df(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_lo"), F.col("b.doc_id").alias("doc_hi"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_lo"), F.col("n_sh").alias("n_lo"))
    sb = sizes.select(F.col("doc_id").alias("doc_hi"), F.col("n_sh").alias("n_hi"))
    jac = F.col("n_inter") / (F.col("n_lo") + F.col("n_hi") - F.col("n_inter"))
    return (
        inter.join(sa, "doc_lo")
        .join(sb, "doc_hi")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_lo", "doc_hi", F.round(jac, 4).alias("jaccard"))
    )


NGRAM_JACCARD_SQL = f"""
WITH sh AS ({_SHINGLES_SQL}),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_lo, b.doc_id AS doc_hi, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_lo, doc_hi,
       round(n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_lo
JOIN sizes sb ON sb.doc_id = doc_hi
WHERE n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter) >= {JACCARD_THRESHOLD}
"""


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N_MINHASH-wide MinHash signature per doc from the seeded xxhash64
    family (hash_i(s) = xxhash64(s, seed=i)) — fully deterministic.

    Computed as array lambdas over the per-doc shingle array (array_min
    of transform) — a narrow map with NO explode/groupBy shuffle. At
    100 TB the signature stage is embarrassingly parallel.
    """
    d = io.load_table(spark, sf_dir, "documents")
    shingles = F.array_distinct(
        F.expr(
            f"""
            transform(sequence(1, greatest(size(split(text, ' ')) - {SHINGLE_K - 1}, 1)),
                      i -> concat_ws('_', slice(split(text, ' '), i, {SHINGLE_K})))
            """
        )
    )
    def mh(i: int):
        # closure, not a 2-arg lambda (Spark reads those as (elem, idx))
        return F.array_min(
            F.transform(F.col("sh"), lambda s: F.xxhash64(s, F.lit(i)))
        ).alias(f"mh{i}")

    return d.select("doc_id", shingles.alias("sh")).select(
        "doc_id", *[mh(i) for i in range(N_MINHASH)]
    )


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs, verified with exact Jaccard ≥ 0.8.

    Pipeline: signatures → band keys (2 rows/band, 8 bands) → bucket
    self-join per band → distinct candidates → exact-Jaccard verify.
    P(candidate | J=0.8) ≈ 1−(1−0.8²)^8 ≈ 0.9997, so recall against the
    exact query is ~1 (pytest enforces ≥0.9). rows-only for the driver.
    """
    sig = minhash_signatures(spark, sf_dir)
    rows_per_band = N_MINHASH // LSH_BANDS
    band_cols = [
        F.xxhash64(
            *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        ).alias(f"band{b}")
        for b in range(LSH_BANDS)
    ]
    banded = sig.select("doc_id", *band_cols)
    # candidates: union of per-band bucket joins (stack bands → one join)
    stacked = banded.unpivot(
        "doc_id", [f"band{b}" for b in range(LSH_BANDS)], "band", "bucket"
    )
    a = stacked.alias("a")
    b = stacked.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_lo"), F.col("b.doc_id").alias("doc_hi")
        )
        .distinct()
    )
    # verify candidates with exact Jaccard (same join as ngram_jaccard but
    # restricted to the candidate set — the cheap final pass)
    sh = _shingles_df(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("doc_lo"), F.col("shingle"))
    sb = sh.select(F.col("doc_id").alias("doc_hi"), F.col("shingle"))
    inter = (
        candidates.join(sa, "doc_lo")
        .join(sb, ["doc_hi", "shingle"])
        .groupBy("doc_lo", "doc_hi")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_lo"), F.col("n_sh").alias("n_lo"))
    zb = sizes.select(F.col("doc_id").alias("doc_hi"), F.col("n_sh").alias("n_hi"))
    jac = F.col("n_inter") / (F.col("n_lo") + F.col("n_hi") - F.col("n_inter"))
    return (
        inter.join(za, "doc_lo")
        .join(zb, "doc_hi")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_lo", "doc_hi", F.round(jac, 4).alias("jaccard"))
    )


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document (sign-aggregated token hashes).

    bit_j(doc) = 1 iff Σ_tokens (2·bit_j(xxhash64(tok)) − 1) > 0.
    Near-dups differ in few bits (pytest checks Hamming ≤ 6 for the
    planted pairs); bucketing on 8-bit prefixes gives the LSH variant.
    """
    d = io.load_table(spark, sf_dir, "documents")
    exploded = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).select("doc_id", F.xxhash64("tok").alias("h"))
    bit_sums = [
        F.sum(
            (F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"s{j}")
        for j in range(32)
    ]
    per_doc = exploded.groupBy("doc_id").agg(*bit_sums)
    fingerprint = None
    for j in range(32):
        bit = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fingerprint = bit if fingerprint is None else fingerprint + bit
    return per_doc.select(
        "doc_id",
        fingerprint.cast("long").alias("simhash32"),
        (fingerprint.cast("long") % 256).alias("bucket8"),
    )


QUERIES = {
    "dedup_exact_normalized": (exact_dedup, EXACT_DEDUP_SQL),
    "dedup_ngram_jaccard": (ngram_jaccard_pairs, NGRAM_JACCARD_SQL),
    "dedup_minhash_lsh": (minhash_lsh_pairs, None),
    "dedup_simhash": (simhash_fingerprints, None),
}
