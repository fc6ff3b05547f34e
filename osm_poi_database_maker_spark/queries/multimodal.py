"""Multimodal plumbing queries: binary payload columns through
mapInPandas feature extraction and frame-sampling explode.

The decode step is stubbed deterministically (no image/audio codecs in
this environment — see :mod:`..multimodal`), which makes BOTH queries
oracle-checkable: the stub's arithmetic is reproduced in SQL over the
same payload bytes. The Spark plumbing (binary columns, Arrow batches,
schema) is the real production path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..multimodal import documents_as_image_table, extract_image_features, sample_frames


def q_mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return extract_image_features(documents_as_image_table(d))


# fixture text is ASCII, so byte values == codepoints; the oracle computes
# the same stub arithmetic from character codes
ORACLE_IMAGE_FEATURES = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(16 + octet_length(encode(text)) % 64 AS INTEGER) AS width,
       CAST(16 + CAST(floor(octet_length(encode(text)) / 64.0) AS BIGINT) % 64 AS INTEGER) AS height,
       3 AS channels,
       round(list_sum(list_transform(list_filter(string_split(text, ''), c -> c <> ''),
                                     c -> ascii(c)::DOUBLE))
             / octet_length(encode(text)) / 255.0, 6) AS mean_intensity
FROM documents
"""


def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    frames = sample_frames(documents_as_image_table(d), every_n_bytes=128)
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.col("byte_offset").cast("long").alias("byte_offset"),
    )


ORACLE_FRAME_SAMPLE = """
SELECT doc_id,
       CAST(f AS BIGINT) AS frame_idx,
       CAST(f * 128 AS BIGINT) AS byte_offset
FROM (
  SELECT doc_id,
         unnest(range(CAST(floor(octet_length(encode(text)) / 128.0) AS BIGINT) + 1)) AS f
  FROM documents
)
"""


RESIZE_W, RESIZE_H = 8, 8


_OUT_LEN = RESIZE_W * RESIZE_H * 3


def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stub resize to a fixed 8×8×3 payload (mapInPandas). The
    oracle-compared digest is CHARACTER-based (first codepoint +
    codepoint at the cyclic wrap position) so both engines compute
    identically for any text; the payload's actual bytes (a byte-level
    cycle) are asserted by tests/test_similarity.py determinism and
    shape checks."""
    from ..multimodal import documents_as_image_table, resize_images

    d = load_table(spark, sf_dir, "documents")
    out = resize_images(documents_as_image_table(d), RESIZE_W, RESIZE_H)
    nchars = F.length("text")
    digest = d.select(
        "doc_id",
        F.when(nchars == 0, 0)
        .otherwise(F.ascii(F.substring("text", 1, 1)))
        .alias("first_cp"),
        F.when(nchars == 0, 0)
        .otherwise(
            F.expr(f"ascii(substring(text, (({_OUT_LEN} - 1) % length(text)) + 1, 1))")
        )
        .alias("cycle_cp"),
    )
    return out.join(digest, "doc_id").select(
        "doc_id",
        "width",
        "height",
        F.octet_length("payload").alias("n_out_bytes"),
        "first_cp",
        "cycle_cp",
    )


ORACLE_RESIZE = f"""
SELECT doc_id,
       {RESIZE_W} AS width, {RESIZE_H} AS height,
       {_OUT_LEN} AS n_out_bytes,
       CASE WHEN length(text) = 0 THEN 0 ELSE ascii(substring(text, 1, 1)) END AS first_cp,
       CASE WHEN length(text) = 0 THEN 0
            ELSE ascii(substring(text, (({_OUT_LEN} - 1) % length(text)) + 1, 1)) END AS cycle_cp
FROM documents
"""


def q_mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc audio energy profile over raw-PCM16 frames — REAL DSP
    through the multimodal plumbing (numpy in mapInPandas), not a codec
    stub: frame count, mean/max RMS, and the peak-energy frame.

    Cross-engine determinism: the frame table carries exact int64
    energies, rms = sqrt(sum_sq/16.0) is a single bit-identical IEEE
    op, and the peak frame ranks on (sum_sq, frame_idx) — pure integer
    ordering. Docs are restricted to ASCII-clean text on BOTH sides so
    the oracle's character codes equal the engine's payload bytes.

    Plan: one mapInPandas over the payload column, then a doc_id window
    + aggregate sharing a single shuffle."""
    from pyspark.sql import Window

    from ..multimodal import (
        PCM_FRAME_SAMPLES,
        documents_as_audio_table,
        pcm_frame_energy,
    )

    d = load_table(spark, sf_dir, "documents").filter(
        F.octet_length(F.encode("text", "UTF-8")) == F.length("text")
    )
    frames = pcm_frame_energy(documents_as_audio_table(d))
    rms = F.sqrt(F.col("sum_sq") / F.lit(float(PCM_FRAME_SAMPLES)))
    w = Window.partitionBy("doc_id").orderBy(F.desc("sum_sq"), F.asc("frame_idx"))
    return (
        frames.withColumn("rms", rms)
        .withColumn("rk", F.row_number().over(w))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.round(F.avg("rms"), 4).alias("mean_rms"),
            F.round(F.max("rms"), 4).alias("max_rms"),
            F.max(F.when(F.col("rk") == 1, F.col("frame_idx"))).alias("peak_frame"),
        )
    )


ORACLE_AUDIO_ENERGY = """
WITH d AS (
  SELECT doc_id, text FROM documents
  WHERE octet_length(encode(text)) = length(text)
),
par AS (
  SELECT doc_id, text, CAST(floor(length(text) / 2) AS BIGINT) AS n_samples
  FROM d
),
s AS (
  SELECT doc_id, i,
         ascii(substring(text, CAST(2 * i + 1 AS BIGINT), 1))
         + 256 * ascii(substring(text, CAST(2 * i + 2 AS BIGINT), 1)) AS raw
  FROM (SELECT doc_id, text, unnest(range(n_samples)) AS i FROM par)
),
sv AS (
  SELECT doc_id, i,
         CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS v
  FROM s
),
fr AS (
  SELECT doc_id, CAST(i // 16 AS BIGINT) AS frame_idx,
         CAST(sum(v * v) AS BIGINT) AS sum_sq
  FROM sv
  GROUP BY 1, 2
  HAVING count(*) = 16
),
r AS (
  SELECT doc_id, frame_idx, sum_sq, sqrt(sum_sq / 16.0) AS rms,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY sum_sq DESC, frame_idx ASC) AS rk
  FROM fr
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_frames,
       round(avg(rms), 4) AS mean_rms,
       round(max(rms), 4) AS max_rms,
       max(CASE WHEN rk = 1 THEN frame_idx END) AS peak_frame
FROM r
GROUP BY doc_id
"""


def q_mm_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte statistics over binary payloads through the Arrow-NATIVE
    batch path (mapInArrow — RecordBatch in/out, no pandas copy), with
    an exact-integer core (length, sum, min, max of the raw bytes).
    ASCII-restricted on both sides so the oracle's character codes equal
    the engine's payload bytes (the audio-energy precedent)."""
    from ..multimodal import documents_as_image_table, payload_stats_arrow

    d = load_table(spark, sf_dir, "documents").filter(
        F.octet_length(F.encode("text", "UTF-8")) == F.length("text")
    )
    return payload_stats_arrow(documents_as_image_table(d))


ORACLE_PAYLOAD_STATS = """
WITH d AS (
  SELECT doc_id, text FROM documents
  WHERE octet_length(encode(text)) = length(text)
),
codes AS (
  SELECT doc_id,
         list_transform(list_filter(string_split(text, ''), c -> c <> ''),
                        c -> ascii(c)) AS cs
  FROM d
)
SELECT doc_id,
       CAST(len(cs) AS BIGINT) AS n_bytes,
       CAST(coalesce(list_sum(cs), 0) AS BIGINT) AS byte_sum,
       CAST(list_min(cs) AS INTEGER) AS min_byte,
       CAST(list_max(cs) AS INTEGER) AS max_byte
FROM codes
"""


def q_mm_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rational 3:2 PCM16 downsample (48 kHz → 32 kHz shape) with an
    exact integer audit — the sample-rate normalization every audio
    corpus runs before training. Linear interpolation is kept in the
    L-scaled integer domain (out = v[pos]·(L−fm) + v[pos+1]·fm, fm =
    j·M mod L), so the per-doc output count and scaled sum/min/max are
    bit-reproducible and the DuckDB oracle re-derives the SAME samples
    from the text bytes' character codes (the audio-energy precedent).
    Pure per-row batch work, zero shuffles."""
    from ..multimodal import documents_as_audio_table, pcm_resample_stats

    d = load_table(spark, sf_dir, "documents").filter(
        F.octet_length(F.encode("text", "UTF-8")) == F.length("text")
    )
    return pcm_resample_stats(documents_as_audio_table(d))


ORACLE_AUDIO_RESAMPLE = """
WITH d AS (
  SELECT doc_id, text FROM documents
  WHERE octet_length(encode(text)) = length(text)
),
par AS (
  SELECT doc_id, text, CAST(floor(length(text) / 2) AS BIGINT) AS n_samples
  FROM d
),
s AS (
  SELECT doc_id, i,
         ascii(substring(text, CAST(2 * i + 1 AS BIGINT), 1))
         + 256 * ascii(substring(text, CAST(2 * i + 2 AS BIGINT), 1)) AS raw
  FROM (SELECT doc_id, text, unnest(range(n_samples)) AS i FROM par)
),
sv AS (
  SELECT doc_id, i,
         CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS v
  FROM s
),
sized AS (SELECT doc_id, n_samples FROM par WHERE n_samples >= 2),
grid AS (
  SELECT doc_id, n_samples,
         unnest(range(((n_samples - 1) * 2) // 3 + 1)) AS j
  FROM sized
),
t AS (
  SELECT doc_id, n_samples, j,
         (j * 3) // 2 AS pos, (j * 3) % 2 AS fm
  FROM grid
),
o AS (
  SELECT t.doc_id, a.v * (2 - t.fm) + b.v * t.fm AS outv
  FROM t
  JOIN sv a ON a.doc_id = t.doc_id AND a.i = t.pos
  JOIN sv b ON b.doc_id = t.doc_id
           AND b.i = least(t.pos + 1, t.n_samples - 1)
)
SELECT o.doc_id,
       CAST(max(z.n_samples) AS BIGINT) AS n_in,
       CAST(count(*) AS BIGINT) AS n_out,
       CAST(sum(outv) AS BIGINT) AS out_sum,
       CAST(min(outv) AS BIGINT) AS out_min,
       CAST(max(outv) AS BIGINT) AS out_max
FROM o JOIN sized z ON z.doc_id = o.doc_id
GROUP BY o.doc_id
"""


def q_mm_ahash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash (aHash) near-duplicate image pairs, HASH-GATED
    (r10 verdict #2 — the mm_phash_pairs precedent applied to the
    strictly simpler transform): 64-bit average-hash signatures whose
    mean-threshold bits are EXACT int64 cross-multiplications
    (``multimodal.image_ahash``), 8×8-bit banded LSH candidates
    (pigeonhole-complete at the Hamming ≤6 threshold), exact bit_count
    verify. The DuckDB oracle replays the ENTIRE transform — pixels via
    ascii(), array_split block boundaries via the position→block
    inverse map, the threshold as the cleared-denominator integer
    comparison, pairs as exact all-pairs bit_count(xor) ≤ 6
    (pigeonhole makes banded and all-pairs equal below 8 bands).
    ASCII docs ≥ 64 bytes only, so substr() codepoints equal payload
    bytes in both engines and every block has a nonzero length.

    Scale: the Spark side is the banded-LSH plan (bucket-capped at
    200); past SF≈0.25 tools/check.py swaps in the cap-replicating
    ORACLES_BIG twin, since the exact oracle is quadratic."""
    from ..multimodal import ahash_near_dups, documents_as_image_table

    d = load_table(spark, sf_dir, "documents").filter(
        (F.octet_length(F.encode("text", "UTF-8")) == F.length("text"))
        & (F.length("text") >= 64)
    )
    return ahash_near_dups(documents_as_image_table(d)).select(
        "doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming")
    )


# --- silence segmentation (gaps-and-islands over the frame table) ----------

_SILENCE_SUMSQ = 9_200_000_000  # ≈ p12 of the fixture's frame energies


def q_mm_audio_silence_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence segmentation over the PCM16 frame table — the
    trim/segment pass an audio-curation pipeline runs before expensive
    transcription: frames whose exact int64 energy falls below a fixed
    threshold are "silent", and consecutive silent frames merge into
    runs via gaps-and-islands (frame_idx − row_number is constant
    within a run — pure window math, no self-join). Per doc: silent
    frame count, run count, and the longest run with its start frame
    (ties broken to the earliest start).

    The frame energies are the SAME exact int64 sums as
    ``mm_audio_energy`` (numpy mapInPandas over the payload bytes), and
    the silence predicate is an integer compare, so the whole
    segmentation is hash-gated against the DuckDB oracle. Plan: one
    mapInPandas, then a doc_id window + two doc_id aggregates sharing
    one shuffle — per-doc-linear, and at 100 TB the frame table is the
    artifact you'd persist anyway."""
    from pyspark.sql import Window

    from ..multimodal import documents_as_audio_table, pcm_frame_energy

    d = load_table(spark, sf_dir, "documents").filter(
        F.octet_length(F.encode("text", "UTF-8")) == F.length("text")
    )
    frames = pcm_frame_energy(documents_as_audio_table(d))
    silent = frames.filter(F.col("sum_sq") < _SILENCE_SUMSQ).select(
        "doc_id", "frame_idx"
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    runs = (
        silent.withColumn("grp", F.col("frame_idx") - F.row_number().over(w))
        .groupBy("doc_id", "grp")
        .agg(F.count("*").alias("run_len"), F.min("frame_idx").alias("run_start"))
    )
    rk = Window.partitionBy("doc_id").orderBy(
        F.desc("run_len"), F.asc("run_start")
    )
    return (
        runs.withColumn("rk", F.row_number().over(rk))
        .groupBy("doc_id")
        .agg(
            F.sum("run_len").alias("n_silent_frames"),
            F.count("*").alias("n_runs"),
            F.max(F.when(F.col("rk") == 1, F.col("run_len"))).alias("longest_run"),
            F.max(F.when(F.col("rk") == 1, F.col("run_start"))).alias("longest_start"),
        )
    )


ORACLE_SILENCE = f"""
WITH d AS (
  SELECT doc_id, text FROM documents
  WHERE octet_length(encode(text)) = length(text)
),
par AS (
  SELECT doc_id, text, CAST(floor(length(text) / 2) AS BIGINT) AS n_samples
  FROM d
),
s AS (
  SELECT doc_id, i,
         ascii(substring(text, CAST(2 * i + 1 AS BIGINT), 1))
         + 256 * ascii(substring(text, CAST(2 * i + 2 AS BIGINT), 1)) AS raw
  FROM (SELECT doc_id, text, unnest(range(n_samples)) AS i FROM par)
),
sv AS (
  SELECT doc_id, i,
         CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS v
  FROM s
),
fr AS (
  SELECT doc_id, CAST(i // 16 AS BIGINT) AS frame_idx,
         CAST(sum(v * v) AS BIGINT) AS sum_sq
  FROM sv
  GROUP BY 1, 2
  HAVING count(*) = 16
),
silent AS (
  SELECT doc_id, frame_idx,
         frame_idx - row_number() OVER (PARTITION BY doc_id ORDER BY frame_idx) AS grp
  FROM fr WHERE sum_sq < {_SILENCE_SUMSQ}
),
runs AS (
  SELECT doc_id, grp, count(*) AS run_len, min(frame_idx) AS run_start
  FROM silent GROUP BY 1, 2
),
rk AS (
  SELECT doc_id, run_len, run_start,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY run_len DESC, run_start ASC) AS rk
  FROM runs
)
SELECT doc_id,
       CAST(sum(run_len) AS BIGINT) AS n_silent_frames,
       count(*) AS n_runs,
       max(CASE WHEN rk = 1 THEN run_len END) AS longest_run,
       max(CASE WHEN rk = 1 THEN run_start END) AS longest_start
FROM rk GROUP BY 1
"""



_FD_BYTES = 128


def q_mm_frame_diff_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection on the fake video payload: consecutive-frame
    L1 byte differences (exact int64, multimodal.frame_diff_energies)
    with a cut verdict where a pair's difference exceeds 1.5× the
    doc's mean — compared as the INTEGER cross-product
    ``2·diff·n_pairs > 3·total`` so the threshold is exact in both
    engines. The oracle replays the byte arithmetic at the codepoint
    level (the fixture corpus is ASCII, so codepoints ≡ bytes — the
    same equivalence the resize digest leans on); a real pipeline
    swaps byte frames for decoded luma planes behind the identical
    mapInPandas signature."""
    from ..multimodal import documents_as_image_table, frame_diff_energies

    d = load_table(spark, sf_dir, "documents")
    diffs = frame_diff_energies(documents_as_image_table(d), _FD_BYTES)
    tot = diffs.groupBy("doc_id").agg(
        F.sum("diff_energy").alias("total"), F.count("*").alias("np")
    )
    return (
        diffs.join(tot, "doc_id")
        .select(
            "doc_id",
            "frame_idx",
            "diff_energy",
            (2 * F.col("diff_energy") * F.col("np") > 3 * F.col("total")).alias(
                "is_cut"
            ),
        )
    )


ORACLE_FRAME_DIFF = f"""
WITH pos AS (
  SELECT doc_id, text, unnest(range(1, CAST(floor(length(text) / {_FD_BYTES})
                                          AS BIGINT))) AS fi
  FROM documents
  WHERE floor(length(text) / {_FD_BYTES}) >= 2
),
d AS (
  SELECT doc_id, fi AS frame_idx,
         CAST(sum(abs(
           ascii(substr(text, CAST(fi * {_FD_BYTES} + j + 1 AS BIGINT), 1))
           - ascii(substr(text, CAST((fi - 1) * {_FD_BYTES} + j + 1 AS BIGINT), 1))
         )) AS BIGINT) AS diff_energy
  FROM (SELECT doc_id, text, fi, unnest(range({_FD_BYTES})) AS j FROM pos)
  GROUP BY 1, 2
),
tot AS (
  SELECT doc_id, CAST(sum(diff_energy) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS np
  FROM d GROUP BY 1
)
SELECT d.doc_id, d.frame_idx, d.diff_energy,
       2 * d.diff_energy * tot.np > 3 * tot.total AS is_cut
FROM d JOIN tot USING (doc_id)
"""


_VIT_PATCH = 16
_VIT_TOKEN_BUDGET = 32  # patches-per-image cap the packing plan enforces


def q_mm_vit_tiling_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT patch-grid accounting per image — the dataloader arithmetic
    a vision-encoder pipeline runs before any pixel is touched: patch
    counts (⌈w/P⌉×⌈h/P⌉ at P=16), the right/bottom padding the tiling
    implies, the +1-CLS token total, and whether the image fits the
    per-image token budget or must be downscaled (the over-budget flag
    feeds the resize stage's worklist). Dims come from the SAME
    deterministic decode stub as mm_image_features, so the plan is
    hash-gated end-to-end; the arithmetic is pure integer expressions
    on metadata — at 100 TB this runs on the catalog, never the bytes."""
    d = load_table(spark, sf_dir, "documents")
    feats = extract_image_features(documents_as_image_table(d)).select(
        "doc_id", "width", "height"
    )
    p = F.lit(_VIT_PATCH)
    npx = F.ceil(F.col("width") / p).cast("long")
    npy = F.ceil(F.col("height") / p).cast("long")
    n_patches = (npx * npy).alias("n_patches")
    return feats.select(
        "doc_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        npx.alias("n_px"),
        npy.alias("n_py"),
        n_patches,
        (npx * p - F.col("width")).cast("long").alias("pad_right"),
        (npy * p - F.col("height")).cast("long").alias("pad_bottom"),
        (npx * npy + 1).cast("long").alias("n_tokens"),
        (npx * npy > _VIT_TOKEN_BUDGET).alias("over_budget"),
    )


ORACLE_VIT_TILING = f"""
WITH dims AS (
  SELECT doc_id,
         CAST(16 + octet_length(encode(text)) % 64 AS BIGINT) AS width,
         CAST(16 + CAST(floor(octet_length(encode(text)) / 64.0) AS BIGINT)
              % 64 AS BIGINT) AS height
  FROM documents
)
SELECT doc_id, width, height,
       CAST(ceil(width / {_VIT_PATCH}.0) AS BIGINT) AS n_px,
       CAST(ceil(height / {_VIT_PATCH}.0) AS BIGINT) AS n_py,
       CAST(ceil(width / {_VIT_PATCH}.0) * ceil(height / {_VIT_PATCH}.0)
            AS BIGINT) AS n_patches,
       CAST(ceil(width / {_VIT_PATCH}.0) * {_VIT_PATCH} - width AS BIGINT)
         AS pad_right,
       CAST(ceil(height / {_VIT_PATCH}.0) * {_VIT_PATCH} - height AS BIGINT)
         AS pad_bottom,
       CAST(ceil(width / {_VIT_PATCH}.0) * ceil(height / {_VIT_PATCH}.0) + 1
            AS BIGINT) AS n_tokens,
       ceil(width / {_VIT_PATCH}.0) * ceil(height / {_VIT_PATCH}.0)
         > {_VIT_TOKEN_BUDGET} AS over_budget
FROM dims
"""


# --- pHash near-dup pairs (integer DCT — the ORACLED perceptual hash) ------


def q_mm_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DCT perceptual-hash near-duplicate image pairs, HASH-GATED: the
    scaled-integer DCT-II (multimodal.PHASH_DCT_C, 14 fractional bits)
    makes the signature exact int64 arithmetic end to end, so unlike
    mm_ahash_pairs (rows-only: numpy float means) the DuckDB oracle can
    replay the ENTIRE transform — pixels via ascii(), the two matrix-
    multiply stages as relational joins against the 64-literal basis
    table, the median as the 32nd order statistic, the banded-LSH
    result as an exact all-pairs bit_count(xor) ≤ 7 (pigeonhole makes
    the two algorithms equal). ASCII docs ≥ 64 bytes only, so substr()
    bytes equal payload bytes in both engines.

    Scale: the Spark side is the banded-LSH plan (8 bands × 8 bits,
    bucket-capped) — shuffle rides band occupancy (85 max at sf0.1,
    cap 200); past SF 0.1 tools/check.py swaps in the registered
    cap-replicating ORACLES_BIG twin (the exact oracle is quadratic),
    and tests/test_r11_queries.py pins both the occupancy-under-cap
    precondition and banded==exact agreement at the gate SF."""
    from ..multimodal import documents_as_image_table, phash_near_dups

    d = load_table(spark, sf_dir, "documents").filter(
        (F.octet_length(F.encode("text", "UTF-8")) == F.length("text"))
        & (F.length("text") >= 64)
    )
    return phash_near_dups(documents_as_image_table(d)).select(
        "doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming")
    )


def _banded_pairs_tail(
    hash_col: str, bands: int, max_hamming: int, max_bucket: int
) -> str:
    """Cap-replicating banded-LSH pair tail over a ``sig`` CTE — the
    DuckDB twin of ``multimodal._banded_hamming_pairs`` for the
    ORACLES_BIG variants: same band split ((h >> b·width) & mask — a
    negative int64's arithmetic shift then mask equals the unsigned
    shift for every in-word band), same deterministic lowest-doc_ids
    cap, same DISTINCT multi-band collapse. Candidate volume rides
    band-bucket occupancy instead of going quadratic, so the gate
    stays honest past the SF where all-pairs blows up."""
    width = 64 // bands
    mask = (1 << width) - 1
    return f"""
banded AS (
  SELECT doc_id, {hash_col}, t.band,
         ({hash_col} >> (t.band * {width})) & {mask} AS val
  FROM sig, (SELECT unnest(range({bands})) AS band) t
),
capped AS (
  SELECT doc_id, {hash_col}, band, val FROM (
    SELECT *, row_number() OVER (PARTITION BY band, val ORDER BY doc_id) AS rn
    FROM banded)
  WHERE rn <= {max_bucket}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.{hash_col}, b.{hash_col})) AS BIGINT) AS hamming
FROM capped a JOIN capped b
  ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.{hash_col}, b.{hash_col})) <= {max_hamming}
"""


def _allpairs_tail(hash_col: str, max_hamming: int) -> str:
    """Exact all-pairs tail over a ``sig`` CTE — the independent-
    algorithm gate (banded LSH on the Spark side vs brute force here;
    pigeonhole at hamming < bands makes them equal). Quadratic by
    construction: sf≤0.1 batteries only."""
    return f"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.{hash_col}, b.{hash_col})) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.{hash_col}, b.{hash_col})) <= {max_hamming}
"""


def _phash_oracle_sql(banded: bool = False) -> str:
    from ..multimodal import PHASH_DCT_C, PHASH_MAX_HAMMING

    cmat_rows = ", ".join(
        f"({u}, {x}, {PHASH_DCT_C[u][x]})" for u in range(8) for x in range(8)
    )
    return f"""
WITH ascii_docs AS (
  SELECT doc_id, text FROM documents
  WHERE octet_length(encode(text)) = length(text) AND length(text) >= 64
),
pix AS (
  SELECT doc_id,
         CAST((t.i - 1) // 8 AS BIGINT) AS x,
         CAST((t.i - 1) % 8 AS BIGINT) AS y,
         CAST(ascii(substr(text, CAST(t.i AS INTEGER), 1)) AS BIGINT) AS p
  FROM ascii_docs, (SELECT unnest(range(1, 65)) AS i) t
),
cmat(u, x, c) AS (VALUES {cmat_rows}),
g AS MATERIALIZED (
  SELECT pix.doc_id, c1.u, pix.y, sum(c1.c * pix.p) AS gval
  FROM pix JOIN cmat c1 ON c1.x = pix.x
  GROUP BY 1, 2, 3
),
f AS MATERIALIZED (
  SELECT g.doc_id, g.u, c2.u AS v, CAST(sum(c2.c * g.gval) AS BIGINT) AS fval
  FROM g JOIN cmat c2 ON c2.x = g.y
  GROUP BY 1, 2, 3
),
ac AS MATERIALIZED (
  SELECT doc_id, u, v, fval FROM f WHERE NOT (u = 0 AND v = 0)
),
med AS (
  SELECT doc_id, fval AS m
  FROM (SELECT doc_id, fval,
               row_number() OVER (PARTITION BY doc_id ORDER BY fval) AS rn
        FROM ac)
  WHERE rn = 32
),
sig AS MATERIALIZED (
  SELECT ac.doc_id,
         CAST(sum(CASE WHEN ac.fval > med.m
                       THEN CAST(1 AS BIGINT) << CAST(ac.u * 8 + ac.v - 1 AS INTEGER)
                       ELSE 0 END) AS BIGINT) AS phash
  FROM ac JOIN med ON med.doc_id = ac.doc_id
  GROUP BY 1
){"," if banded else ""}""" + (
        _banded_pairs_tail("phash", 8, PHASH_MAX_HAMMING, 200)
        if banded
        else _allpairs_tail("phash", PHASH_MAX_HAMMING)
    )


ORACLE_PHASH_PAIRS = _phash_oracle_sql()
ORACLE_PHASH_PAIRS_BIG = _phash_oracle_sql(banded=True)


def _ahash_oracle_sql(banded: bool = False) -> str:
    """DuckDB replay of ``multimodal.image_ahash`` + pair join over the
    ASCII ≥64-byte document slice: positions map to their array_split
    block by the closed-form inverse (p < rem·(base+1) → p÷(base+1),
    else rem + (p−rem·(base+1))÷base), block byte-sums aggregate
    exactly, and each bit is the cleared-denominator integer
    comparison 64·b·(b+1)·sᵢ > cᵢ·(A·b + B·(b+1)) — the same exact
    rational form the numpy side computes. First block → MSB: bit 0
    lands on −2⁶³ via two's complement (DuckDB sums BIGINT through
    HUGEINT, so the fold is a plain signed add then a checked cast)."""
    from ..multimodal import AHASH_BANDS, AHASH_MAX_HAMMING

    return f"""
WITH ascii_docs AS (
  SELECT doc_id, text,
         CAST(length(text) AS BIGINT) AS L,
         CAST(length(text) // 64 AS BIGINT) AS base,
         CAST(length(text) % 64 AS BIGINT) AS rem
  FROM documents
  WHERE octet_length(encode(text)) = length(text) AND length(text) >= 64
),
pix AS (
  SELECT d.doc_id, d.base, d.rem,
         CASE WHEN t.p < d.rem * (d.base + 1)
              THEN t.p // (d.base + 1)
              ELSE d.rem + (t.p - d.rem * (d.base + 1)) // d.base END AS i,
         CAST(ascii(substr(d.text, CAST(t.p + 1 AS INTEGER), 1)) AS BIGINT) AS v
  FROM ascii_docs d, (SELECT unnest(range(d.L)) AS p) t
),
sums AS MATERIALIZED (
  SELECT doc_id, i, base, rem,
         base + CASE WHEN i < rem THEN 1 ELSE 0 END AS cnt,
         CAST(sum(v) AS BIGINT) AS s
  FROM pix GROUP BY 1, 2, 3, 4
),
tot AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN i < rem THEN s ELSE 0 END) AS BIGINT) AS a_hi,
         CAST(sum(CASE WHEN i >= rem THEN s ELSE 0 END) AS BIGINT) AS b_lo
  FROM sums GROUP BY 1
),
sig AS MATERIALIZED (
  SELECT s.doc_id,
         CAST(sum(CASE WHEN 64 * s.base * (s.base + 1) * s.s
                            <= s.cnt * (t.a_hi * s.base + t.b_lo * (s.base + 1))
                       THEN 0
                       WHEN s.i = 0 THEN -9223372036854775808
                       ELSE CAST(1 AS BIGINT) << CAST(63 - s.i AS INTEGER)
                  END) AS BIGINT) AS ahash
  FROM sums s JOIN tot t USING (doc_id)
  GROUP BY 1
){"," if banded else ""}""" + (
        _banded_pairs_tail("ahash", AHASH_BANDS, AHASH_MAX_HAMMING, 200)
        if banded
        else _allpairs_tail("ahash", AHASH_MAX_HAMMING)
    )


ORACLE_AHASH_PAIRS = _ahash_oracle_sql()
ORACLE_AHASH_PAIRS_BIG = _ahash_oracle_sql(banded=True)


QUERIES = {
    "mm_vit_tiling_plan": q_mm_vit_tiling_plan,
    "mm_phash_pairs": q_mm_phash_pairs,
    "mm_image_features": q_mm_image_features,
    "mm_ahash_pairs": q_mm_ahash_pairs,
    "mm_frame_sample": q_mm_frame_sample,
    "mm_frame_diff_cuts": q_mm_frame_diff_cuts,
    "mm_resize": q_mm_resize,
    "mm_audio_energy": q_mm_audio_energy,
    "mm_audio_resample": q_mm_audio_resample,
    "mm_audio_silence_segments": q_mm_audio_silence_segments,
    "mm_payload_stats": q_mm_payload_stats,
}

ORACLES = {
    "mm_vit_tiling_plan": ORACLE_VIT_TILING,
    "mm_phash_pairs": ORACLE_PHASH_PAIRS,
    "mm_ahash_pairs": ORACLE_AHASH_PAIRS,
    "mm_image_features": ORACLE_IMAGE_FEATURES,
    "mm_frame_sample": ORACLE_FRAME_SAMPLE,
    "mm_frame_diff_cuts": ORACLE_FRAME_DIFF,
    "mm_resize": ORACLE_RESIZE,
    "mm_audio_energy": ORACLE_AUDIO_ENERGY,
    "mm_audio_resample": ORACLE_AUDIO_RESAMPLE,
    "mm_audio_silence_segments": ORACLE_SILENCE,
    "mm_payload_stats": ORACLE_PAYLOAD_STATS,
}

# SF ≥ 0.25 oracle overrides: the exact all-pairs perceptual-hash
# oracles are quadratic; these replicate the Spark side's banded-LSH
# plan (including the 200-member bucket cap) so the gate's cost rides
# band occupancy. tools/check.py swaps them in for large-SF batteries.
ORACLES_BIG = {
    "mm_phash_pairs": ORACLE_PHASH_PAIRS_BIG,
    "mm_ahash_pairs": ORACLE_AHASH_PAIRS_BIG,
}
