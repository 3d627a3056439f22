"""Multimodal-column queries: binary payloads + typed metadata, with the
decode step as an Arrow-batched mapInPandas (deterministic fake — the
container has no media libs; see operators.multimodal)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    attach_binary,
    decode_image_meta,
    frame_sample,
    resize_meta,
)
from ..sources.readers import read_table


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan over a binary table — the plan must never
    deserialize payload bytes for this query shape."""
    b = attach_binary(read_table(spark, sf_dir, "documents"))
    return b.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.origin").alias("origin"),
    )


_MULTIMODAL_META_SQL = """
SELECT doc_id, 'text/plain' AS mime,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       source AS origin
FROM documents
"""


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched fake decode (deterministic, byte-derived): mirrored
    in SQL because the fake derives width/height from payload bytes."""
    b = attach_binary(read_table(spark, sf_dir, "documents"))
    return decode_image_meta(b)


_MULTIMODAL_DECODE_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       CAST((ascii(substr(text, 1, 1)) % 64 + 1) * 16 AS INTEGER) AS width,
       CAST((octet_length(encode(text)) % 64 + 1) * 16 AS INTEGER) AS height,
       1 AS n_frames
FROM documents
"""


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving fit-resize metadata (stubbed pixels, real
    integer geometry — mirrored exactly in SQL)."""
    b = attach_binary(read_table(spark, sf_dir, "documents"))
    return resize_meta(b, 224, 224)


_MULTIMODAL_RESIZE_SQL = """
WITH m AS (
  SELECT doc_id,
         CAST((ascii(substr(text, 1, 1)) % 64 + 1) * 16 AS BIGINT) AS src_w,
         CAST((octet_length(encode(text)) % 64 + 1) * 16 AS BIGINT) AS src_h
  FROM documents
)
SELECT doc_id,
       CAST(src_w AS INTEGER) AS src_w, CAST(src_h AS INTEGER) AS src_h,
       CAST(224 AS INTEGER) AS dst_w, CAST(224 AS INTEGER) AS dst_h,
       CAST(least(src_w * 224 // src_h, 224) AS INTEGER) AS fit_w,
       CAST(least(src_h * 224 // src_w, 224) AS INTEGER) AS fit_h
FROM m
"""


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: one row fans out to n_frames/4 rows through the
    Arrow stream (row-generating media op)."""
    b = attach_binary(read_table(spark, sf_dir, "documents"))
    return frame_sample(b, every_n=4)


_MULTIMODAL_FRAMES_SQL = """
WITH m AS (
  SELECT doc_id, octet_length(encode(text)) AS nb,
         octet_length(encode(text)) % 29 + 1 AS nf
  FROM documents
)
SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
       (nb * 2654435761 + i) % 2147483647 AS frame_tag
FROM (SELECT doc_id, nb, UNNEST(range(0, nf, 4)) AS i FROM m)
"""


def q_multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-dup pairs
    (operators.multimodal.phash_near_dup_pairs): 64-bit dHash
    fingerprints over the binary payloads + the exact-recall pigeonhole
    hamming join shared with SimHash — the media twin of text
    near-dedup.  Radius 12: this corpus's planted near-dups carry
    scattered edits (shingle-Jaccard 0.6), so their byte-grid dHashes
    sit ~12-14 bits apart.  Recall stays EXACT at any radius; wide
    radii route through the multi-probe plan (7 chunks of 9-10 bits +
    single-bit-flip probes, multi-index hashing) instead of the classic
    h+1 narrow chunks whose 4-5-bit buckets went near-quadratic (the
    r07 VERDICT finding: ~5 s at sf0.1; now ~2 s, candidates bounded by
    ~n·probes·n/2^9).  Rows-only contract (the numpy grid/bit-packing
    kernel is not SQL); recall-exactness vs brute-force signature
    comparison — including through the multi-probe path — and
    edit-locality are pytest-pinned (tests/test_llm_ops.py)."""
    from ..operators.multimodal import phash_near_dup_pairs

    b = attach_binary(read_table(spark, sf_dir, "documents"))
    return phash_near_dup_pairs(b, max_hamming=12).orderBy("id_a", "id_b")


def q_multimodal_phash_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs over the 128-bit TWO-ORIENTATION perceptual
    signature (operators.multimodal.perceptual_dhash128: horizontal +
    vertical dHash words) at radius 24 — the doubled radius matches the
    doubled signature, so the match set tracks the 64-bit radius-12
    semantics while the multi-word pigeonhole join
    (dedup.hamming_pairs_from_hashes, 13 chunks of 9-10 bits + 1-flip
    probes) keeps buckets wide.  Rows-only contract (numpy kernel);
    the multi-word brute-force recall pytest covers the exact-recall
    claim."""
    from ..operators.dedup import hamming_pairs_from_hashes
    from ..operators.multimodal import perceptual_dhash128

    b = attach_binary(read_table(spark, sf_dir, "documents"))
    # cache: the pigeonhole join scans the signature twice (see
    # phash_near_dup_pairs)
    sig = perceptual_dhash128(b).cache()
    return hamming_pairs_from_hashes(
        sig, "doc_id", ("dhash", "dhash_v"), 24, n_chunks=13
    ).orderBy("id_a", "id_b")


def q_multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type silence statistics from short-time audio frame energy
    (operators.multimodal.audio_frame_energy over the binary payloads):
    frames, silent frames, and the exact integer energy total per
    document-source — the voice-activity screen of an audio pipeline.
    Rows-only contract (the PCM framing kernel is numpy); exact-integer
    energies and a numpy differential are pytest-pinned."""
    from ..operators.multimodal import audio_frame_energy

    b = attach_binary(read_table(spark, sf_dir, "documents"))
    fr = audio_frame_energy(b, frame=1024, hop=512, silence_threshold=1000)
    return (
        fr.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.count(F.when(F.col("is_silence"), 1)).alias("n_silent"),
            F.sum("energy").alias("total_energy"),
        )
        .orderBy("doc_id")
    )


def q_multimodal_bmp_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BMP tier's VALUE-CHECKABLE face: deterministic 24-bit BMP
    payloads are generated per doc_id (operators.multimodal.
    synth_bmp_bytes — closed-form geometry/pixels, stride padding,
    alternating bottom-up/top-down storage), REALLY decoded by
    parse_bmp, and reduced to exact-integer features (true dims, file
    size, total BT.601 luma, integer cross-product 9×9-grid dHash
    words).  The oracle never parses a byte: it recomputes every
    feature analytically from the same closed forms, so any
    mis-decode — wrong stride, BGR swap, row-order flip, luma
    rounding — breaks the driver's value hash.  First multimodal query
    with a full hash row; the byte-stream stand-in queries stay
    rows-only by design."""
    from ..operators.multimodal import bmp_exact_features, synth_bmp_table

    d = read_table(spark, sf_dir, "documents").select("doc_id")
    return bmp_exact_features(synth_bmp_table(d)).orderBy("doc_id")


# Mirrors synth_bmp_bytes + bmp_exact_features analytically: pixels are
# enumerated with lateral range() and every feature is exact integer
# arithmetic (HUGEINT bit-packing, signed fold at 2^63).
_MULTIMODAL_BMP_EXACT_SQL = """
WITH d AS (
  SELECT doc_id,
         16 + (doc_id % 5) * 7 AS w,
         8 + (doc_id % 3) * 9 AS h
  FROM documents
),
px AS (
  SELECT d.doc_id, d.w, d.h, r.r, c.c,
         299 * ((d.doc_id + 2 * r.r + 3 * c.c) % 256)
       + 587 * ((d.doc_id // 3 + 5 * r.r + c.c) % 256)
       + 114 * ((7 * d.doc_id + r.r + 4 * c.c) % 256) AS lum
  FROM d, unnest(range(0, d.h)) AS r(r), unnest(range(0, d.w)) AS c(c)
),
cells AS (
  SELECT doc_id, (r * 9) // h AS gi, (c * 9) // w AS gj,
         SUM(lum) AS s, COUNT(*) AS n
  FROM px GROUP BY 1, 2, 3
),
gridkeys AS (
  SELECT d.doc_id, gi.gi, gj.gj
  FROM d
  CROSS JOIN (SELECT unnest(range(0, 9)) AS gi) gi
  CROSS JOIN (SELECT unnest(range(0, 9)) AS gj) gj
),
grid AS (
  SELECT k.doc_id, k.gi, k.gj,
         COALESCE(c.s, 0)::BIGINT AS s,
         GREATEST(COALESCE(c.n, 0), 1)::BIGINT AS n
  FROM gridkeys k
  LEFT JOIN cells c ON c.doc_id = k.doc_id AND c.gi = k.gi AND c.gj = k.gj
),
bits AS (
  SELECT a.doc_id,
         SUM(CASE WHEN bh.s * a.n > a.s * bh.n
                  THEN (1::HUGEINT) << (63 - (a.gi * 8 + a.gj)) ELSE 0 END) AS uh,
         SUM(CASE WHEN bv.s * a.n > a.s * bv.n
                  THEN (1::HUGEINT) << (63 - (a.gi * 8 + a.gj)) ELSE 0 END) AS uv
  FROM grid a
  JOIN grid bh ON bh.doc_id = a.doc_id AND bh.gi = a.gi AND bh.gj = a.gj + 1
  JOIN grid bv ON bv.doc_id = a.doc_id AND bv.gi = a.gi + 1 AND bv.gj = a.gj
  WHERE a.gi < 8 AND a.gj < 8
  GROUP BY a.doc_id
),
tot AS (SELECT doc_id, SUM(lum)::BIGINT AS luma_total FROM px GROUP BY doc_id)
SELECT d.doc_id,
       CAST(d.w AS INTEGER) AS width,
       CAST(d.h AS INTEGER) AS height,
       CAST(54 + ((d.w * 3 + 3) // 4 * 4) * d.h AS INTEGER) AS n_bytes,
       t.luma_total,
       CAST(CASE WHEN b.uh >= (1::HUGEINT) << 63
                 THEN b.uh - ((1::HUGEINT) << 64) ELSE b.uh END AS BIGINT) AS dhash_h,
       CAST(CASE WHEN b.uv >= (1::HUGEINT) << 63
                 THEN b.uv - ((1::HUGEINT) << 64) ELSE b.uv END AS BIGINT) AS dhash_v
FROM d JOIN tot t USING (doc_id) JOIN bits b USING (doc_id)
ORDER BY doc_id
"""


def q_multimodal_wav_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio tier's VALUE-CHECKABLE face: deterministic 16-bit PCM
    WAV payloads are generated per doc_id (operators.multimodal.
    synth_wav_bytes — closed-form samples, varying sample rates, a junk
    LIST chunk on ids % 5 == 0), REALLY parsed by parse_wav (RIFF chunk
    walk, fmt-chunk field reads, int16-LE decode), and reduced to exact
    integer features: sample_rate-as-read, n_samples, hop-strided frame
    count, total/max frame energy, silent-frame count.  The oracle
    never parses a byte — it recomputes every feature analytically from
    the same closed forms — so a chunk-walk shortcut, endianness or
    sign slip, or framing off-by-one breaks the driver's value hash.
    First audio query with a full hash row; audio_frame_energy's
    byte-stream stand-in stays rows-only by design."""
    from ..operators.multimodal import synth_wav_table, wav_exact_features

    d = read_table(spark, sf_dir, "documents").select("doc_id")
    return wav_exact_features(synth_wav_table(d)).orderBy("doc_id")


# Mirrors synth_wav_bytes + wav_exact_features analytically: samples are
# enumerated with lateral range() from the closed forms (all operands
# nonnegative before the one subtraction, so // can never hit the
# floor-vs-trunc divide on negatives); each sample belongs to frames
# i//128 and i//128 - 1 clamped to [0, fmax] where fmax = the first
# hop start whose frame reaches the end (the kernel's break contract).
_MULTIMODAL_WAV_EXACT_SQL = """
WITH d AS (
  SELECT doc_id,
         600 + (doc_id % 7) * 256 AS n,
         8000 + (doc_id % 3) * 4000 AS rate
  FROM documents
),
f AS (
  SELECT doc_id, n, rate, (n - 256 + 127) // 128 AS fmax FROM d
),
s AS (
  SELECT f.doc_id, f.fmax, i.i,
         ((f.doc_id * 31 + i.i * 17 + (i.i * i.i) % 97) % 4001)
           // (1 + 3 * ((i.i // 256 + f.doc_id) % 3))
         - 2000 // (1 + 3 * ((i.i // 256 + f.doc_id) % 3)) AS sv
  FROM f, unnest(range(0, f.n)) AS i(i)
),
memb AS (
  SELECT doc_id, (i // 128 - k.k) AS fr, sv
  FROM s, (VALUES (0), (1)) k(k)
  WHERE i // 128 - k.k >= 0 AND i // 128 - k.k <= fmax
),
fe AS (
  SELECT doc_id, fr, SUM(sv * sv) AS e, COUNT(*) AS ns
  FROM memb GROUP BY 1, 2
),
agg AS (
  SELECT doc_id, COUNT(*) AS n_frames,
         SUM(e) AS total_energy, MAX(e) AS max_frame_energy,
         COUNT(CASE WHEN e < 100000 * ns THEN 1 END) AS n_silent
  FROM fe GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(d.rate AS INTEGER) AS sample_rate,
       CAST(d.n AS INTEGER) AS n_samples,
       CAST(a.n_frames AS INTEGER) AS n_frames,
       CAST(a.total_energy AS BIGINT) AS total_energy,
       CAST(a.max_frame_energy AS BIGINT) AS max_frame_energy,
       CAST(a.n_silent AS BIGINT) AS n_silent
FROM d JOIN agg a USING (doc_id)
ORDER BY doc_id
"""


def q_multimodal_png_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PNG tier's VALUE-CHECKABLE face — the bmp_exact discipline
    on a COMPRESSED container: deterministic 8-bit RGB PNGs are
    generated per doc_id (operators.multimodal.synth_png_bytes —
    closed-form pixels, per-row None/Sub/Up filters, a junk tEXt chunk
    on ids%5==0, a split double-IDAT on ids%4==0), REALLY decoded by
    parse_png (signature, chunk walk with CRC32 verification,
    unknown-chunk skip, multi-IDAT concat, zlib inflate, filter
    reversal — all stdlib, no Pillow), and reduced to exact integer
    features (true dims, chunk count, total + position-weighted BT.601
    luma).  The oracle never parses a byte: it recomputes every
    feature analytically from the same closed forms, so any slip in
    the chunk walk, inflate, or unfiltering breaks the value hash.
    Compressed size is zlib-implementation-defined and deliberately
    NOT a feature."""
    from ..operators.multimodal import png_exact_features, synth_png_table

    d = read_table(spark, sf_dir, "documents").select("doc_id")
    return png_exact_features(synth_png_table(d)).orderBy("doc_id")


# Mirrors synth_png_bytes + png_exact_features analytically: pixels are
# enumerated with lateral range(); the filter chain is invertible by
# construction so the oracle skips straight to the raw pixel forms.
_MULTIMODAL_PNG_EXACT_SQL = """
WITH d AS (
  SELECT doc_id,
         12 + (doc_id % 4) * 5 AS w,
         9 + (doc_id % 3) * 6 AS h
  FROM documents
),
px AS (
  SELECT d.doc_id, d.w, d.h, r.r, c.c,
         299 * ((d.doc_id + 3 * r.r + 5 * c.c) % 256)
       + 587 * ((d.doc_id // 2 + 7 * r.r + 2 * c.c) % 256)
       + 114 * ((11 * d.doc_id + r.r + 6 * c.c) % 256) AS lum
  FROM d, unnest(range(0, d.h)) AS r(r), unnest(range(0, d.w)) AS c(c)
),
tot AS (
  SELECT doc_id,
         SUM(lum)::BIGINT AS luma_total,
         SUM(lum * (r * w + c + 1))::BIGINT AS luma_wsum
  FROM px GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(d.w AS INTEGER) AS width,
       CAST(d.h AS INTEGER) AS height,
       CAST(3 + CASE WHEN d.doc_id % 5 = 0 THEN 1 ELSE 0 END
              + CASE WHEN d.doc_id % 4 = 0 THEN 1 ELSE 0 END AS INTEGER)
         AS n_chunks,
       t.luma_total,
       t.luma_wsum
FROM d JOIN tot t USING (doc_id)
ORDER BY doc_id
"""


def q_multimodal_gif_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GIF tier's VALUE-CHECKABLE face — the png_exact discipline
    on a PALETTE + LZW container: deterministic 16-color GIF89a
    payloads are generated per doc_id (operators.multimodal.
    synth_gif_bytes — closed-form palette and index grid, a Comment
    Extension to skip on ids%5==0, dictionary growth through two LZW
    code-width bumps), REALLY decoded by parse_gif (header + screen
    descriptor, global color table, extension skip, image descriptor,
    full GIF-LZW with variable width and CLEAR/EOI), and reduced to
    exact integer features (true dims, color-table size, total +
    position-weighted BT.601 luma of the palette-mapped pixels).  The
    oracle never parses a byte: it recomputes the features from the
    same closed forms, so any slip in the block walk, the LZW width
    schedule, or the palette lookup breaks the value hash."""
    from ..operators.multimodal import gif_exact_features, synth_gif_table

    d = read_table(spark, sf_dir, "documents").select("doc_id")
    return gif_exact_features(synth_gif_table(d)).orderBy("doc_id")


# Mirrors synth_gif_bytes + gif_exact_features analytically: the pixel
# index and palette entries are closed forms, so luma is enumerable
# with lateral range() — no GIF bytes on the oracle side at all.
_MULTIMODAL_GIF_EXACT_SQL = """
WITH d AS (
  SELECT doc_id,
         10 + (doc_id % 4) * 4 AS w,
         8 + (doc_id % 3) * 5 AS h
  FROM documents
),
px AS (
  SELECT d.doc_id, d.w, d.h, r.r, c.c,
         (d.doc_id + 2 * r.r + 3 * c.c) % 16 AS p
  FROM d, unnest(range(0, d.h)) AS r(r), unnest(range(0, d.w)) AS c(c)
),
lum AS (
  SELECT doc_id, w, h, r, c,
         299 * ((doc_id + 17 * p) % 256)
       + 587 * ((3 * doc_id + 29 * p) % 256)
       + 114 * ((7 * doc_id + 11 * p) % 256) AS lm
  FROM px
),
tot AS (
  SELECT doc_id,
         SUM(lm)::BIGINT AS luma_total,
         SUM(lm * (r * w + c + 1))::BIGINT AS luma_wsum
  FROM lum GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(d.w AS INTEGER) AS width,
       CAST(d.h AS INTEGER) AS height,
       CAST(16 AS INTEGER) AS n_colors,
       t.luma_total,
       t.luma_wsum
FROM d JOIN tot t USING (doc_id)
ORDER BY doc_id
"""


QUERIES = {
    "multimodal_gif_exact": q_multimodal_gif_exact,
    "multimodal_png_exact": q_multimodal_png_exact,
    "multimodal_bmp_exact": q_multimodal_bmp_exact,
    "multimodal_wav_exact": q_multimodal_wav_exact,
    "multimodal_phash_dedup": q_multimodal_phash_dedup,
    "multimodal_phash_wide": q_multimodal_phash_wide,
    "multimodal_audio_energy": q_multimodal_audio_energy,
    "multimodal_meta": q_multimodal_meta,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_resize": q_multimodal_resize,
    "multimodal_frames": q_multimodal_frames,
}
ORACLES = {
    "multimodal_gif_exact": _MULTIMODAL_GIF_EXACT_SQL,
    "multimodal_png_exact": _MULTIMODAL_PNG_EXACT_SQL,
    "multimodal_bmp_exact": _MULTIMODAL_BMP_EXACT_SQL,
    "multimodal_wav_exact": _MULTIMODAL_WAV_EXACT_SQL,
    "multimodal_meta": _MULTIMODAL_META_SQL,
    "multimodal_decode": _MULTIMODAL_DECODE_SQL,
    "multimodal_resize": _MULTIMODAL_RESIZE_SQL,
    "multimodal_frames": _MULTIMODAL_FRAMES_SQL,
}
