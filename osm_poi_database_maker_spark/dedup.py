"""Near-duplicate detection at scale: MinHash+LSH and SimHash.

All signature math is pure column expressions over ``xxhash64`` — no
Python UDFs, no ML-pipeline fitting step, fully deterministic. The LSH
banding turns O(n²) pair comparison into a shuffle on (band, bucket):

    shingles → 64 minhashes → B bands of R rows → bucket hash
    → self-join within buckets → signature-estimated Jaccard → threshold

Scale notes (the whole point of LSH):
* candidate generation is a groupBy/join on bucket keys whose cardinality
  is controlled by B and R — no cross join anywhere;
* hot buckets (degenerate content, e.g. empty docs) are capped with a
  per-bucket size limit before pairing, the standard guard against
  quadratic blowup inside a single bucket;
* signatures are fixed-width arrays (64×8 bytes), so shuffle volume per
  doc is constant regardless of document size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

HASH_COUNT = 64
DEFAULT_BANDS = 16  # 16 bands × 4 rows: catches jaccard ≳ 0.3 reliably


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of a whitespace-tokenized text column."""
    toks = F.split(text, " +")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - k + 1, F.lit(1))),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(k)]
            ),
        )
    )


def minhash_signature(shingles: Column, n_hashes: int = HASH_COUNT) -> Column:
    """64 independent minhashes: hash_i(s) = xxhash64(i, s); signature[i] =
    min over shingles. One expression, evaluated JVM-side per row."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.array_min(
            F.transform(shingles, lambda s: F.xxhash64(i, s))
        ),
    )


def estimated_jaccard(sig_a: Column, sig_b: Column) -> Column:
    """Fraction of matching signature positions ≈ Jaccard similarity."""
    matches = F.size(
        F.filter(F.zip_with(sig_a, sig_b, lambda a, b: a == b), lambda x: x)
    )
    return matches / F.size(sig_a)


def lsh_bands(sig: Column, bands: int = DEFAULT_BANDS) -> Column:
    """array<struct<band,bucket>>: bucket = hash of the band's slice."""
    rows_per_band = HASH_COUNT // bands
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(
                F.concat_ws(",", F.slice(sig, b * rows_per_band + 1, rows_per_band))
            ).alias("bucket"),
        ),
    )


def minhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.3,
    bands: int = DEFAULT_BANDS,
    max_bucket: int = 200,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup pairs (doc_a < doc_b, est_jaccard).

    ``max_bucket`` caps pathological buckets (e.g. near-empty docs all
    hashing together) before the within-bucket self-join.
    """
    sigs = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(word_shingles(F.col(text_col))).alias("sig"),
    )
    buckets = sigs.select(
        "id", "sig", F.explode(lsh_bands(F.col("sig"), bands)).alias("bb")
    ).select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    # cap hot buckets: deterministic keep-lowest-ids
    w_rank = F.row_number().over(Window.partitionBy("band", "bucket").orderBy("id"))
    buckets = buckets.withColumn("__r", w_rank).filter(F.col("__r") <= max_bucket).drop("__r")
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        cand.withColumn("est_jaccard", F.round(estimated_jaccard("sig_a", "sig_b"), 4))
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash64(text: Column) -> Column:
    """64-bit SimHash over whitespace tokens: bit b of the output is the
    sign of Σ_tokens (±1 per token's hash bit b). The 64 per-bit sums are
    built by a Python loop over literal shift amounts (shiftright needs a
    literal), yielding one large but fully JVM-side expression."""
    toks = F.split(text, " +")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def bit_sum_at(b: int) -> Column:
        # closure (not a default arg): higher-order functions introspect
        # the lambda's parameter count, so it must take exactly (acc, h)
        def merge(acc: Column, h: Column) -> Column:
            return acc + F.when(
                F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)

        return F.aggregate(hashes, F.lit(0), merge)

    sig = F.lit(0).cast("long")
    for b in range(64):
        bit_sum = bit_sum_at(b)
        # bit 63 is the sign bit of a signed long: adding -2^63 sets it
        contribution = F.lit(1 << b).cast("long") if b < 63 else F.lit(-(2**63)).cast("long")
        sig = sig + F.when(bit_sum > 0, contribution).otherwise(F.lit(0).cast("long"))
    return sig


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int = 200,
) -> DataFrame:
    """SimHash near-dup pairs via 4×16-bit band LSH + Hamming verify.

    Two 64-bit hashes within Hamming distance 3 must agree exactly on at
    least one of the 4 bands (pigeonhole), so banding loses nothing.
    """
    h = df.select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sh"))
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("sh"), b * 16).bitwiseAND(F.lit(0xFFFF)).alias("bucket"),
            )
            for b in range(4)
        ]
    )
    banded = h.select("id", "sh", F.explode(bands).alias("bb")).select(
        "id", "sh", "bb.band", "bb.bucket"
    )
    w_rank = F.row_number().over(Window.partitionBy("band", "bucket").orderBy("id"))
    banded = banded.withColumn("__r", w_rank).filter(F.col("__r") <= max_bucket).drop("__r")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            hamming64(F.col("a.sh"), F.col("b.sh")).alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def exact_dedup(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup: keep the lowest id per distinct value of ``cols``."""
    w = Window.partitionBy(*cols).orderBy(id_col)
    return df.withColumn("__r", F.row_number().over(w)).filter(F.col("__r") == 1).drop("__r")
