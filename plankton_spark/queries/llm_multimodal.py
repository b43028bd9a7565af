"""Multimodal-column queries (SURVEY.md §2.11 q_multimodal_meta +
decode plumbing check). The binary payload is manufactured from the
documents fixture (n_bytes == n_chars — ASCII verified), so the
oracle shadows every metadata computation via n_chars."""

from __future__ import annotations

from pyspark.sql import functions as F

from plankton_spark import multimodal
from plankton_spark.io import read_table
from plankton_spark.registry import query


@query(
    "q_multimodal_meta",
    oracle="""
    SELECT CASE WHEN lang IN ('en', 'de') THEN 'image/png'
                WHEN lang IN ('es', 'fr') THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           COUNT(*) AS n_blobs,
           CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
           CAST(MAX(n_chars) AS BIGINT) AS max_bytes
    FROM documents
    GROUP BY 1
    """,
)
def q_multimodal_meta(spark, sf_dir):
    """Binary payload + typed metadata struct; filter/aggregate on
    metadata only — the payload column is pruned from the scan."""
    media = multimodal.attach_media(read_table(spark, sf_dir, "documents"))
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_blobs"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.max("n_bytes").cast("long").alias("max_bytes"),
    )


@query(
    "q_multimodal_decode",
    oracle="""
    SELECT CASE WHEN lang IN ('en', 'de') THEN 'image/png'
                WHEN lang IN ('es', 'fr') THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           CAST(SUM(16 + n_chars % 64) AS BIGINT) AS sum_width,
           CAST(SUM(9 + n_chars % 36) AS BIGINT) AS sum_height,
           CAST(SUM(CASE WHEN lang IN ('zh',) THEN 24 ELSE 1 END) AS BIGINT) AS total_frames
    FROM documents
    GROUP BY 1
    """,
)
def q_multimodal_decode(spark, sf_dir):
    """mapInPandas decode plumbing (deterministic fake decoder — real
    codecs are absent in this container; see plankton_spark.multimodal):
    schema, batching and aggregation are the real pipeline."""
    media = multimodal.attach_media(read_table(spark, sf_dir, "documents"))
    decoded = multimodal.decode_media(media)
    return decoded.groupBy("media_type").agg(
        F.sum("width").cast("long").alias("sum_width"),
        F.sum("height").cast("long").alias("sum_height"),
        F.sum("n_frames").cast("long").alias("total_frames"),
    )


@query(
    "q_multimodal_decode_bin",
    oracle="""
    WITH m AS (
      SELECT doc_id, n_chars,
             CASE WHEN doc_id % 2 = 0 THEN 'image/bmp'
                  ELSE 'audio/wav' END AS media_type
      FROM documents
    )
    SELECT media_type,
           COUNT(*) AS n_blobs,
           CAST(SUM(CASE WHEN media_type = 'image/bmp'
                         THEN 4 + n_chars % 32 ELSE 0 END) AS BIGINT) AS sum_width,
           CAST(SUM(CASE WHEN media_type = 'image/bmp'
                         THEN 3 + n_chars % 24 ELSE 0 END) AS BIGINT) AS sum_height,
           CAST(SUM(CASE WHEN media_type = 'audio/wav'
                         THEN 1 + n_chars % 2 ELSE 0 END) AS BIGINT) AS sum_channels,
           CAST(SUM(CASE WHEN media_type = 'audio/wav'
                         THEN 8000 * (1 + n_chars % 3) ELSE 0 END) AS BIGINT)
             AS sum_rate,
           CAST(SUM(CASE WHEN media_type = 'audio/wav'
                         THEN 100 + n_chars % 1000 ELSE 0 END) AS BIGINT)
             AS sum_samples
    FROM m GROUP BY media_type
    """,
)
def q_multimodal_decode_bin(spark, sf_dir):
    """REAL-bytes decode: author uncompressed BMP/PCM-WAV payloads in
    pure Python (struct layouts need no codec library), then parse the
    actual binary headers back in an Arrow-batched mapInPandas stage.
    Every aggregated value is read out of the payload bytes; the oracle
    shadows the authoring arithmetic, so a wrong writer or parser
    breaks the value hash — unlike q_multimodal_decode's documented
    fake-decoder stand-in."""
    docs = read_table(spark, sf_dir, "documents")
    media = multimodal.author_media_corpus(docs)
    decoded = multimodal.decode_media_bin(media)
    return decoded.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_blobs"),
        F.sum("width").cast("long").alias("sum_width"),
        F.sum("height").cast("long").alias("sum_height"),
        F.sum("n_channels").cast("long").alias("sum_channels"),
        F.sum("sample_rate").cast("long").alias("sum_rate"),
        F.sum("n_samples").cast("long").alias("sum_samples"),
    )


FRAME_STRIDE = 6  # sample every 6th frame
RESIZE_MAX_SIDE = 32


@query(
    "q_multimodal_framesample",
    oracle=f"""
    WITH meta AS (
      SELECT doc_id,
             CASE WHEN lang IN ('en', 'de') THEN 'image/png'
                  WHEN lang IN ('es', 'fr') THEN 'audio/wav'
                  ELSE 'video/mp4' END AS media_type,
             16 + n_chars % 64 AS w,
             9 + n_chars % 36 AS h,
             CASE WHEN lang IN ('en','de','es','fr') THEN 1 ELSE 24 END AS n_frames
      FROM documents
    ),
    frames AS (
      SELECT doc_id, media_type, w, h, unnest(generate_series(0, n_frames - 1,
             {FRAME_STRIDE})) AS frame_idx
      FROM meta
    )
    SELECT media_type,
           CAST(COUNT(*) AS BIGINT) AS n_frames_sampled,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(SUM(frame_idx) AS BIGINT) AS frame_idx_sum,
           CAST(SUM(CASE WHEN w >= h THEN {RESIZE_MAX_SIDE}
                         ELSE GREATEST(1, (w * {RESIZE_MAX_SIDE}) // h) END)
                AS BIGINT) AS resized_w_sum,
           CAST(SUM(CASE WHEN w >= h THEN GREATEST(1, (h * {RESIZE_MAX_SIDE}) // w)
                         ELSE {RESIZE_MAX_SIDE} END) AS BIGINT) AS resized_h_sum
    FROM frames GROUP BY media_type
    """,
)
def q_multimodal_framesample(spark, sf_dir):
    """Frame sampling + resize planning over multimodal metadata:
    every {stride}-th frame index per blob (videos: 24 fake-decoded
    frames; images/audio: the single frame 0), with aspect-preserving
    resize targets (max side {maxside}, integer arithmetic so both
    engines agree exactly).

    Scale shape: frame INDEX fan-out is pure Spark
    (explode(sequence(...)) — no Python), so Catalyst sees the
    per-frame cardinality; the actual pixel extraction would be the
    Arrow-batched mapInPandas stage that consumes (payload,
    frame_idx) — stubbed like decode (no codecs in this container),
    while everything around it is the real pipeline."""
    media = multimodal.attach_media(read_table(spark, sf_dir, "documents"))
    decoded = multimodal.decode_media(media)
    frames = decoded.select(
        "doc_id",
        "media_type",
        F.col("width").alias("w"),
        F.col("height").alias("h"),
        F.explode(
            F.sequence(
                F.lit(0), F.col("n_frames") - 1, F.lit(FRAME_STRIDE)
            )
        ).alias("frame_idx"),
    )
    wide = F.col("w") >= F.col("h")
    rw = F.when(wide, F.lit(RESIZE_MAX_SIDE)).otherwise(
        F.greatest(F.lit(1), F.expr(f"(w * {RESIZE_MAX_SIDE}) DIV h"))
    )
    rh = F.when(wide, F.greatest(F.lit(1), F.expr(f"(h * {RESIZE_MAX_SIDE}) DIV w"))).otherwise(
        F.lit(RESIZE_MAX_SIDE)
    )
    return frames.groupBy("media_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames_sampled"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.sum("frame_idx").cast("long").alias("frame_idx_sum"),
        F.sum(rw).cast("long").alias("resized_w_sum"),
        F.sum(rh).cast("long").alias("resized_h_sum"),
    )


q_multimodal_framesample.__doc__ = q_multimodal_framesample.__doc__.format(
    stride=FRAME_STRIDE, maxside=RESIZE_MAX_SIDE
)


@query(
    "q_audio_features",
    oracle="""
    WITH toned AS (
      SELECT doc_id,
             CAST(POWER(2, 3 + doc_id % 8) AS BIGINT) AS f
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           CAST(4096 AS BIGINT) AS n_samples,
           CAST(8192 AS BIGINT) AS sample_rate,
           f AS dom_freq_hz
    FROM toned
    """,
)
def q_audio_features(spark, sf_dir):
    """REAL distributed audio analysis, no codec required: each doc
    becomes a PCM16 WAV carrying an actual int16 sine tone at
    2^(3 + doc_id%8) Hz; the executors parse the PCM bytes and run a
    numpy rFFT per payload (Arrow-batched mapInPandas), and the
    dominant-bin frequency must equal the synthesized one EXACTLY —
    frequencies divide the sample rate, so there is zero spectral
    leakage and the oracle recomputes the answer in closed form.
    zcr / rms are validated against analytic ground truth in
    tests/test_multimodal.py (their exact values depend on int16
    quantization, which SQL can't replay)."""
    from plankton_spark.multimodal import audio_features, author_tone_corpus

    docs = read_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    feats = audio_features(author_tone_corpus(docs))
    return feats.select("doc_id", "n_samples", "sample_rate", "dom_freq_hz")


@query(
    "q_image_features",
    oracle="""
    WITH docs AS (
      SELECT doc_id,
             16 + doc_id % 16 AS w,
             12 + doc_id % 12 AS h
      FROM documents WHERE doc_id < 120
    ),
    cells AS (
      SELECT d.doc_id, d.w, d.h, gx.x, gy.y,
             (gx.x * 17 + gy.y * 29) % 256 AS p
      FROM docs d,
           UNNEST(generate_series(0, d.w - 1)) AS gx(x),
           UNNEST(generate_series(0, d.h - 1)) AS gy(y)
    )
    SELECT doc_id,
           CAST(ANY_VALUE(w) AS BIGINT) AS width,
           CAST(ANY_VALUE(h) AS BIGINT) AS height,
           CAST(SUM(p) AS BIGINT) AS pixel_sum,
           CAST(SUM(CASE WHEN x < w - 1
                THEN ABS(((x + 1) * 17 + y * 29) % 256 - p)
                ELSE 0 END) AS BIGINT) AS edge_sum
    FROM cells GROUP BY doc_id
    """,
)
def q_image_features(spark, sf_dir):
    """REAL distributed image analysis with zero codecs: each doc
    becomes a 24bpp BMP whose gray pixel at (x,y) is the closed-form
    gradient (x*17 + y*29) % 256 — ACTUAL pixel bytes, 4-byte row
    padding, bottom-up row order. Executors parse the pixel rows with
    numpy and reduce to total brightness + horizontal L1 gradient
    energy; the oracle recomputes both by brute-force enumeration of
    the same grid in SQL — every value exact-integer, so any parsing
    slip (padding, row order, channel offset) is a hash mismatch."""
    from plankton_spark.multimodal import author_gradient_corpus, image_features

    docs = read_table(spark, sf_dir, "documents").where(F.col("doc_id") < 120)
    return image_features(author_gradient_corpus(docs))


@query(
    "q_video_motion",
    oracle="""
    WITH docs AS (
      SELECT doc_id,
             8 + doc_id % 8 AS w,
             6 + doc_id % 6 AS h,
             3 + doc_id % 3 AS nf
      FROM documents WHERE doc_id < 120
    ),
    cells AS (
      SELECT d.doc_id, d.w, d.h, d.nf, gx.x, gy.y, gk.k,
             (gx.x * 17 + gy.y * 29 + gk.k * 31) % 256 AS p
      FROM docs d,
           UNNEST(generate_series(0, d.w - 1)) AS gx(x),
           UNNEST(generate_series(0, d.h - 1)) AS gy(y),
           UNNEST(generate_series(0, d.nf - 1)) AS gk(k)
    )
    SELECT doc_id,
           CAST(ANY_VALUE(w) AS BIGINT) AS width,
           CAST(ANY_VALUE(h) AS BIGINT) AS height,
           CAST(ANY_VALUE(nf) AS BIGINT) AS n_frames,
           CAST(SUM(CASE WHEN k < nf - 1
                THEN ABS((x * 17 + y * 29 + (k + 1) * 31) % 256 - p)
                ELSE 0 END) AS BIGINT) AS motion_sum,
           CAST(SUM(CASE WHEN k = 0 THEN p ELSE 0 END) AS BIGINT)
             AS frame0_sum
    FROM cells GROUP BY doc_id
    """,
)
def q_video_motion(spark, sf_dir):
    """REAL distributed video analysis: raw-gray clips with actual
    per-frame pixel bytes (closed-form phase shift per frame);
    executors parse every frame with numpy and reduce to inter-frame
    L1 motion energy + first-frame brightness, exact integers. The
    oracle brute-force enumerates the same (x, y, frame) grid in SQL
    — completing the image/audio/video triple where the math on the
    bytes is real and the answer is provable."""
    from plankton_spark.multimodal import author_video_corpus, video_features

    docs = read_table(spark, sf_dir, "documents").where(F.col("doc_id") < 120)
    return video_features(author_video_corpus(docs))


@query(
    "q_media_dedup",
    oracle="""
    WITH sig AS (
      SELECT doc_id,
             16 + doc_id % 16 AS w,
             12 + doc_id % 12 AS h
      FROM documents WHERE doc_id < 300
    ),
    grp AS (
      SELECT w, h, COUNT(*) AS n, MIN(doc_id) AS keeper
      FROM sig GROUP BY w, h
    )
    SELECT COUNT(*) AS n_unique,
           CAST(SUM(n) AS BIGINT) AS n_payloads,
           CAST(SUM(n - 1) AS BIGINT) AS n_dupes,
           CAST(MAX(n) AS BIGINT) AS max_group,
           CAST(SUM(keeper) AS BIGINT) AS keeper_sum
    FROM grp
    """,
)
def q_media_dedup(spark, sf_dir):
    """Exact BINARY dedup over media payloads: sha2 of the raw bytes
    groups identical blobs, keep-min elects a canonical copy — the
    multimodal twin of q_dedup_exact (dedup by content hash is how a
    100 TB media lake drops re-uploads before any decode). The
    gradient corpus makes payload identity a closed-form function of
    (width, height), so the oracle re-derives group structure —
    counts, dupes, max group, keeper ids — without hashing a byte:
    the hash path and the combinatorics must agree exactly."""
    from plankton_spark.multimodal import author_gradient_corpus

    docs = read_table(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    media = author_gradient_corpus(docs)
    groups = media.groupBy(F.sha2("payload", 256).alias("h")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_id").alias("keeper"),
    )
    return groups.agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.sum("n").cast("long").alias("n_payloads"),
        F.sum(F.col("n") - 1).cast("long").alias("n_dupes"),
        F.max("n").cast("long").alias("max_group"),
        F.sum("keeper").cast("long").alias("keeper_sum"),
    )
