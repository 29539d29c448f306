"""Multimodal entries (m*): container sniffing, chunking, feature stubs.

Split from the flat suite.py (r6); entries register into the shared
SUITE/ORACLES dicts via the @query decorator from suite.common.
"""

from __future__ import annotations

from logverzcore_spark.suite.common import *  # noqa: F401,F403

@query(
    "m01_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
)
def m01_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: opaque binary column + mapInPandas metadata
    extraction (decode stage stubbed — see operators/multimodal.py)."""
    from logverzcore_spark.operators.multimodal import extract_binary_meta

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return extract_binary_meta(docs, payload_col="payload", id_col="doc_id")


@query(
    "m02_resize_planning",
    oracle="""
    WITH meta AS (
      SELECT doc_id,
             CAST(100 + doc_id % 1900 AS INTEGER) AS width,
             CAST(100 + (doc_id * 7) % 1900 AS INTEGER) AS height
      FROM documents
    )
    SELECT doc_id, width, height,
           CAST(FLOOR(width * LEAST(1.0, 512.0 / GREATEST(width, height))) AS INTEGER) AS out_width,
           CAST(FLOOR(height * LEAST(1.0, 512.0 / GREATEST(width, height))) AS INTEGER) AS out_height
    FROM meta
    """,
)
def m02_resize_planning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata-only planning (resize dims capped at 512,
    aspect preserved): operates purely on the typed metadata struct, so
    column pruning never touches the binary payload. Meta is synthesized
    deterministically from doc_id (no image codecs in the container)."""
    from logverzcore_spark.operators.multimodal import fake_resize_meta

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.struct(
            (100 + F.col("doc_id") % 1900).cast("int").alias("width"),
            (100 + (F.col("doc_id") * 7) % 1900).cast("int").alias("height"),
        ).alias("meta"),
    )
    return fake_resize_meta(docs, meta_col="meta", max_side=512).select(
        "doc_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        "out_width",
        "out_height",
    )


@query(
    "m03_frame_sample_plan",
    oracle="""
    WITH meta AS (
      SELECT doc_id, CAST(1000 + (doc_id * 13) % 59000 AS BIGINT) AS duration_ms
      FROM documents
    )
    SELECT doc_id, CAST(s AS BIGINT) AS sample_ms,
           CAST(s * 30 // 1000 AS BIGINT) AS frame_idx
    FROM meta, unnest(generate_series(0, duration_ms, 1000)) AS t(s)
    """,
)
def m03_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-fanning multimodal stage: one output row per sampled video
    frame timestamp (operators/multimodal.plan_frame_samples, real
    mapInPandas; decode stubbed — no codecs). Duration is synthesized
    deterministically from doc_id."""
    from logverzcore_spark.operators.multimodal import plan_frame_samples

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", (1000 + (F.col("doc_id") * 13) % 59000).cast("long").alias("duration_ms")
    )
    return plan_frame_samples(docs, "duration_ms", "doc_id", every_ms=1000, fps=30)


@query(
    "m04_decode_batch_plan",
    oracle="""
    SELECT doc_id, source, n_chars AS n_bytes,
           CAST(FLOOR((SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING) - n_chars) / 10000.0) AS INTEGER)
             AS batch_id
    FROM documents
    """,
)
def m04_decode_batch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-batch packing (multimodal.plan_decode_batches): payloads
    greedily packed into ≤10 KB batches per source via an exclusive
    prefix sum — the task-sizing step before a GPU/codec stage. n_chars
    stands in for payload bytes (no codecs in the container)."""
    from logverzcore_spark.operators.multimodal import plan_decode_batches

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").alias("n_bytes")
    )
    return plan_decode_batches(
        docs, bytes_col="n_bytes", budget_bytes=10_000, part_col="source", id_col="doc_id"
    )


@query(
    "m05_audio_frame_features",
    oracle="""
    WITH pos AS (
      SELECT doc_id, text, i
      FROM documents, LATERAL (SELECT UNNEST(range(0, length(text))) AS i)
    ), vals AS (
      SELECT doc_id, CAST(i // 32 AS INTEGER) AS frame_idx,
             unicode(substr(text, CAST(i + 1 AS INTEGER), 1)) AS v
      FROM pos
    )
    SELECT doc_id, frame_idx, COUNT(*) AS n_bytes,
           ROUND(SQRT(AVG(CAST(v AS DOUBLE) * v)), 6) AS rms,
           CAST(MAX(v) AS INTEGER) AS peak
    FROM vals GROUP BY doc_id, frame_idx
    """,
)
def m05_audio_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal audio featurization: payload bytes as header-less 8-bit
    PCM, framed into 32-byte windows; per-frame RMS + peak via a 1→N
    numpy mapInPandas (operators/multimodal.py). The payloads are the
    UTF-8 document bytes (pure ASCII in the synthetic corpus), so the
    oracle replays the byte values as character codes — frame sums are
    exact integers in float64, making RMS bit-identical across engines."""
    from logverzcore_spark.operators.multimodal import audio_frame_features

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return audio_frame_features(docs, payload_col="payload", id_col="doc_id")


@query(
    "m06_cdc_neardup",
    oracle="""
    WITH d AS (
      SELECT doc_id, text, length(text) AS sz FROM documents
    ), pos AS (
      SELECT doc_id, text, sz, UNNEST(range(1, GREATEST(1, sz - 16 + 1) + 1)) AS p
      FROM d
    ), bounds AS (
      SELECT doc_id, text, sz, p FROM pos
      WHERE p = 1
         OR substring(md5(substring(text, CAST(p AS BIGINT), 16)), 1, 2) = 'ff'
    ), chunks AS (
      SELECT doc_id,
             md5(substring(text, CAST(p AS BIGINT),
                 CAST(COALESCE(LEAD(p) OVER (PARTITION BY doc_id ORDER BY p),
                               sz + 1) - p AS BIGINT))) AS chunk_md5
      FROM bounds
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           COUNT(*) AS n_shared_chunks
    FROM chunks a JOIN chunks b
      ON a.chunk_md5 = b.chunk_md5 AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    """,
)
def m06_cdc_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-free binary near-dup via content-defined chunking
    (multimodal.cdc_neardup_pairs): rolling-window hashes open chunk
    boundaries that re-synchronize across byte insertions, so spliced /
    re-muxed payload variants still share their unchanged chunks —
    unlike fixed-position banding. Candidates come from a bucketed
    equi-join on 16-byte chunk hashes (payload bytes pruned first;
    never all-pairs). The oracle replays the identical boundary rule
    (char slicing == byte slicing: the corpus is ASCII)."""
    from logverzcore_spark.operators import multimodal

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return multimodal.cdc_neardup_pairs(docs, min_shared_chunks=2)


@query(
    "m07_cdc_dedup_corpus",
    oracle="""
    WITH RECURSIVE d AS (
      SELECT doc_id, text, length(text) AS sz FROM documents
    ), pos AS (
      SELECT doc_id, text, sz, UNNEST(range(1, GREATEST(1, sz - 16 + 1) + 1)) AS p
      FROM d
    ), bounds AS (
      SELECT doc_id, text, sz, p FROM pos
      WHERE p = 1
         OR substring(md5(substring(text, CAST(p AS BIGINT), 16)), 1, 2) = 'ff'
    ), chunks AS (
      SELECT doc_id,
             md5(substring(text, CAST(p AS BIGINT),
                 CAST(COALESCE(LEAD(p) OVER (PARTITION BY doc_id ORDER BY p),
                               sz + 1) - p AS BIGINT))) AS chunk_md5
      FROM bounds
    ), pairs AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2
      FROM chunks a JOIN chunks b
        ON a.chunk_md5 = b.chunk_md5 AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    ), edges AS (
      SELECT id1 AS a, id2 AS b FROM pairs UNION ALL SELECT id2, id1 FROM pairs
    ), reach(src, dst) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    ), labels AS (
      SELECT d.doc_id,
             LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS cluster_id
      FROM d LEFT JOIN reach r ON r.src = d.doc_id
      GROUP BY d.doc_id
    )
    SELECT dd.doc_id, dd.source, dd.n_chars
    FROM documents dd JOIN labels l ON dd.doc_id = l.doc_id
    WHERE l.cluster_id = dd.doc_id
    """,
)
def m07_cdc_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary dedup MATERIALIZED (the media analog of d08): CDC chunk
    pairs → connected components (transitivity: a re-muxed variant of a
    spliced variant collapses with the original even if the end-to-end
    pair misses the threshold) → keep each cluster's min-id
    representative, returning the cleaned corpus. Decode-free end to
    end."""
    from logverzcore_spark.operators import multimodal

    docs = _t(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    pairs = multimodal.cdc_neardup_pairs(payloads, min_shared_chunks=2).select(
        F.col("id_a").alias("id1"), F.col("id_b").alias("id2")
    )
    clusters = dedup.dup_clusters(payloads, pairs)
    reps = clusters.where(F.col("is_rep")).select("doc_id")
    return docs.join(reps, "doc_id", "left_semi").select("doc_id", "source", "n_chars")


@query(
    "m08_audio_segments",
    oracle="""
    WITH pos AS (
      SELECT doc_id, text, i
      FROM documents, LATERAL (SELECT UNNEST(range(0, length(text))) AS i)
    ), vals AS (
      SELECT doc_id, CAST(i // 32 AS INTEGER) AS frame_idx,
             unicode(substr(text, CAST(i + 1 AS INTEGER), 1)) AS v
      FROM pos
    ), frames AS (
      SELECT doc_id, frame_idx,
             ROUND(SQRT(AVG(CAST(v AS DOUBLE) * v)), 6) AS rms
      FROM vals GROUP BY doc_id, frame_idx
    ), active AS (
      SELECT doc_id, frame_idx, rms,
             frame_idx - row_number() OVER (PARTITION BY doc_id
                                            ORDER BY frame_idx) AS grp
      FROM frames WHERE rms >= 100.0
    )
    SELECT doc_id,
           CAST(MIN(frame_idx) AS INTEGER) AS start_frame,
           CAST(MAX(frame_idx) AS INTEGER) AS end_frame,
           COUNT(*) AS n_frames,
           MAX(rms) AS peak_rms
    FROM active GROUP BY doc_id, grp
    HAVING COUNT(*) >= 2
    """,
)
def m08_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VAD-style energy segmentation over the PCM featurizer's frames
    (m05): contiguous runs of frames with RMS ≥ threshold become
    segments — the gaps-and-islands pattern (island id = frame_idx −
    row_number per payload) that turns per-frame features into
    utterance/asset spans. One window pass over the FRAME table (already
    ~32× smaller than the payload bytes), then a map-side-combined
    groupBy; the payload bytes never reach the segmentation stages."""
    from logverzcore_spark.operators.multimodal import audio_frame_features

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    frames = audio_frame_features(docs, payload_col="payload", id_col="doc_id")
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    active = (
        frames.where(F.col("rms") >= 100.0)
        .withColumn("grp", F.col("frame_idx") - F.row_number().over(w))
    )
    return (
        active.groupBy("doc_id", "grp")
        .agg(
            F.min("frame_idx").cast("int").alias("start_frame"),
            F.max("frame_idx").cast("int").alias("end_frame"),
            F.count(F.lit(1)).alias("n_frames"),
            F.max("rms").alias("peak_rms"),
        )
        .where(F.col("n_frames") >= 2)
        .drop("grp")
    )


@query(
    "m09_image_header_probe",
    oracle="""
    SELECT doc_id,
      CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                      ELSE 'unknown' END AS format,
      CASE WHEN doc_id % 3 < 2
           THEN CAST(16 + doc_id % 2032 AS INTEGER) END AS width,
      CASE WHEN doc_id % 3 < 2
           THEN CAST(16 + (doc_id * 5) % 2032 AS INTEGER) END AS height,
      CASE WHEN doc_id % 3 < 2
           THEN CAST(16 + doc_id % 2032 AS BIGINT)
                * (16 + (doc_id * 5) % 2032) END AS n_pixels
    FROM documents
    """,
)
def m09_image_header_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec-free image-dimension sniffing over binary payloads
    (``multimodal.sniff_image_meta``): PNG IHDR big-endian and GIF
    little-endian dims parsed from header bytes with codegen'd
    expressions — no decoder, no Python. The graded round trip BUILDS
    genuine PNG/GIF headers from doc_id (byte-exact signatures + packed
    dims), parses them back, and the oracle restates the expected dims
    arithmetically — a packing or parsing bug on either side breaks the
    hash. Every third doc carries non-image bytes and must sniff as
    'unknown' with NULL dims (the honest fixed-offset answer; JPEG's
    variable-offset SOF goes to the real decode stage)."""
    from logverzcore_spark.operators.multimodal import sniff_image_meta

    docs = _t(spark, sf_dir, "documents")
    w = (16 + F.col("doc_id") % 2032).cast("int")
    h = (16 + (F.col("doc_id") * 5) % 2032).cast("int")

    def be32(c):
        return F.unhex(F.lpad(F.hex(c), 8, "0"))

    def le16(c):
        lo = F.lpad(F.hex(c % 256), 2, "0")
        hi = F.lpad(F.hex(F.floor(c / 256).cast("int")), 2, "0")
        return F.unhex(F.concat(lo, hi))

    # PNG: signature + IHDR length/tag, then width/height (BE32).
    png = F.concat(
        F.unhex(F.lit("89504E470D0A1A0A0000000D49484452")), be32(w), be32(h)
    )
    gif = F.concat(F.encode(F.lit("GIF89a"), "UTF-8"), le16(w), le16(h))
    payload = (
        F.when(F.col("doc_id") % 3 == 0, png)
        .when(F.col("doc_id") % 3 == 1, gif)
        .otherwise(F.encode("text", "UTF-8"))
    )
    return sniff_image_meta(
        docs.select("doc_id", payload.alias("payload"))
    )


@query(
    "m11_jpeg_header_probe",
    oracle="""
    SELECT doc_id,
      CASE WHEN doc_id % 3 < 2 THEN 'jpeg' ELSE 'unknown' END AS format,
      CASE WHEN doc_id % 3 < 2
           THEN CAST(16 + doc_id % 4080 AS INTEGER) END AS width,
      CASE WHEN doc_id % 3 < 2
           THEN CAST(16 + (doc_id * 7) % 4080 AS INTEGER) END AS height,
      CASE WHEN doc_id % 3 < 2 THEN CAST(3 AS INTEGER) END AS n_components,
      CASE WHEN doc_id % 3 < 2 THEN doc_id % 2 = 1 END AS progressive
    FROM documents
    """,
)
def m11_jpeg_header_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG frame-header walk over binary payloads
    (``multimodal.parse_jpeg_meta``): unlike m09's fixed-offset PNG/GIF
    sniffing, the SOF marker floats behind a variable-length segment
    chain, so the graded round trip BUILDS genuine JFIF byte streams
    with a doc_id-dependent chain (APP0 + a COM segment padded by
    ``doc_id % 7`` bytes → the SOF offset varies row to row), half
    baseline (SOF0) and half progressive (SOF2), parses them back with
    the bounded segment walker, and the oracle restates the packed
    dims/flags arithmetically — an off-by-one anywhere in the walk
    breaks the hash. Every third doc carries text bytes and must report
    'unknown' with NULL fields."""
    from logverzcore_spark.operators.multimodal import parse_jpeg_meta

    docs = _t(spark, sf_dir, "documents")
    w = (16 + F.col("doc_id") % 4080).cast("int")
    h = (16 + (F.col("doc_id") * 7) % 4080).cast("int")
    pad = (F.col("doc_id") % 7).cast("int")

    def be16(c):
        return F.unhex(F.lpad(F.hex(c), 4, "0"))

    app0 = F.unhex(F.lit("FFE000104A46494600010100000100010000"))
    com = F.concat(
        F.unhex(F.lit("FFFE")), be16(pad + 2), F.encode(F.repeat(F.lit("A"), pad), "UTF-8")
    )
    sof_marker = F.when(F.col("doc_id") % 2 == 1, F.unhex(F.lit("FFC2"))).otherwise(
        F.unhex(F.lit("FFC0"))
    )
    sof = F.concat(
        sof_marker, F.unhex(F.lit("001108")), be16(h), be16(w),
        F.unhex(F.lit("03012200021101031101")),
    )
    jpeg = F.concat(F.unhex(F.lit("FFD8")), app0, com, sof, F.unhex(F.lit("FFD9")))
    payload = (
        F.when(F.col("doc_id") % 3 < 2, jpeg)
        .otherwise(F.encode("text", "UTF-8"))
    )
    return parse_jpeg_meta(docs.select("doc_id", payload.alias("payload")))


@query(
    "m12_webp_header_probe",
    oracle="""
    SELECT doc_id,
      CASE WHEN doc_id % 4 < 3 THEN 'webp' ELSE 'unknown' END AS format,
      CASE WHEN doc_id % 4 < 3
           THEN CAST(1 + doc_id % 16383 AS INTEGER) END AS width,
      CASE WHEN doc_id % 4 < 3
           THEN CAST(1 + (doc_id * 3) % 16383 AS INTEGER) END AS height,
      CASE WHEN doc_id % 4 < 3
           THEN CAST(1 + doc_id % 16383 AS BIGINT)
                * (1 + (doc_id * 3) % 16383) END AS n_pixels
    FROM documents
    """,
)
def m12_webp_header_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebP dimension sniffing across ALL THREE first-chunk layouts
    (``multimodal.sniff_image_meta``): VP8X extended (24-bit LE
    canvas-1), VP8L lossless (14+14-bit packed dims-1 behind the 0x2F
    signature), VP8 lossy (14-bit dims behind the 9D012A sync code) —
    each still a FIXED-offset parse, so the sniffer stays codegen-only
    (no Python in the plan, same as m09). The graded round trip builds
    byte-exact container bytes per layout from doc_id (cycling layouts
    with doc_id % 4; every fourth doc is text → 'unknown'), parses them
    back, and the oracle restates the dims arithmetically — a bit-shift
    or offset error in any layout breaks the hash."""
    from logverzcore_spark.operators.multimodal import sniff_image_meta

    docs = _t(spark, sf_dir, "documents")
    w = (1 + F.col("doc_id") % 16383).cast("int")
    h = (1 + (F.col("doc_id") * 3) % 16383).cast("int")

    def le_pack(c, nbytes):
        parts = [
            F.lpad(F.hex((c / (256 ** i)).cast("long") % 256), 2, "0")
            for i in range(nbytes)
        ]
        return F.unhex(F.concat(*parts))

    riff = F.concat(
        F.encode(F.lit("RIFF"), "UTF-8"), le_pack(F.lit(30), 4),
        F.encode(F.lit("WEBP"), "UTF-8"),
    )
    vp8x = F.concat(
        riff, F.encode(F.lit("VP8X"), "UTF-8"), le_pack(F.lit(10), 4),
        F.unhex(F.lit("00000000")),  # flags + reserved
        le_pack(w - 1, 3), le_pack(h - 1, 3),
    )
    vp8l = F.concat(
        riff, F.encode(F.lit("VP8L"), "UTF-8"), le_pack(F.lit(5), 4),
        F.unhex(F.lit("2F")),
        le_pack((w - 1) + 16384 * (h - 1).cast("long"), 4),
    )
    vp8 = F.concat(
        riff, F.encode(F.lit("VP8 "), "UTF-8"), le_pack(F.lit(10), 4),
        F.unhex(F.lit("000000")),  # frame tag
        F.unhex(F.lit("9D012A")),  # sync code
        le_pack(w, 2), le_pack(h, 2),
    )
    payload = (
        F.when(F.col("doc_id") % 4 == 0, vp8x)
        .when(F.col("doc_id") % 4 == 1, vp8l)
        .when(F.col("doc_id") % 4 == 2, vp8)
        .otherwise(F.encode("text", "UTF-8"))
    )
    return sniff_image_meta(docs.select("doc_id", payload.alias("payload")))


@query(
    "m10_wav_header_probe",
    oracle="""
    SELECT doc_id,
      CASE WHEN doc_id % 3 < 2 THEN 'wav' ELSE 'unknown' END AS format,
      CASE WHEN doc_id % 3 < 2
           THEN CAST(1 + doc_id % 2 AS INTEGER) END AS channels,
      CASE WHEN doc_id % 3 < 2 THEN CAST(
        CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                        WHEN 2 THEN 44100 ELSE 48000 END AS BIGINT)
        END AS sample_rate,
      CASE WHEN doc_id % 3 < 2
           THEN CAST(CASE WHEN doc_id % 2 = 0 THEN 16 ELSE 24 END
                     AS INTEGER) END AS bits_per_sample
    FROM documents
    """,
)
def m10_wav_header_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec-free WAV metadata sniffing (``multimodal.sniff_wav_meta``)
    — m09's audio sibling: byte-exact RIFF/WAVE headers are BUILT from
    doc_id (channels, sample rate, bit depth packed little-endian at the
    canonical fmt-chunk offsets), parsed back with codegen'd binary
    expressions, and the oracle restates the expected fields
    arithmetically — the round trip breaks if either the packing or the
    parsing mis-addresses a byte. Every third doc carries non-audio
    bytes and must sniff 'unknown'."""
    from logverzcore_spark.operators.multimodal import sniff_wav_meta

    docs = _t(spark, sf_dir, "documents")
    ch = (1 + F.col("doc_id") % 2).cast("int")
    rate = (
        F.when(F.col("doc_id") % 4 == 0, 8000)
        .when(F.col("doc_id") % 4 == 1, 16000)
        .when(F.col("doc_id") % 4 == 2, 44100)
        .otherwise(48000)
        .cast("long")
    )
    bits = F.when(F.col("doc_id") % 2 == 0, 16).otherwise(24).cast("int")

    def le(c, nbytes: int):
        hexed = F.lpad(F.hex(c.cast("long")), nbytes * 2, "0")
        # reverse byte order: take hex pairs from the END forward
        pairs = [
            F.substring(hexed, (nbytes - 1 - i) * 2 + 1, 2) for i in range(nbytes)
        ]
        return F.unhex(F.concat(*pairs))

    header = F.concat(
        F.encode(F.lit("RIFF"), "UTF-8"),
        le(F.lit(36), 4),
        F.encode(F.lit("WAVEfmt "), "UTF-8"),
        le(F.lit(16), 4),  # fmt chunk size
        le(F.lit(1), 2),  # PCM
        le(ch, 2),
        le(rate, 4),
        le(rate * ch * bits / 8, 4),  # byte rate
        le(ch * bits / 8, 2),  # block align
        le(bits, 2),
    )
    payload = F.when(F.col("doc_id") % 3 < 2, header).otherwise(
        F.encode("text", "UTF-8")
    )
    return sniff_wav_meta(docs.select("doc_id", payload.alias("payload")))


@query(
    "m13_mp4_box_walk",
    oracle="""
    SELECT doc_id,
      CASE WHEN doc_id % 3 < 2 THEN 'mp4' ELSE 'unknown' END AS format,
      CASE WHEN doc_id % 3 < 2 THEN
        CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END END AS major_brand,
      CASE WHEN doc_id % 3 < 2 THEN
        CAST(((doc_id * 37) % 100000) * 1000 // 600 AS BIGINT) END AS duration_ms,
      CASE WHEN doc_id % 3 < 2 THEN
        CAST(CASE WHEN doc_id % 5 = 0 THEN 2 ELSE 1 END AS INTEGER) END AS n_tracks,
      CASE WHEN doc_id % 3 < 2
           THEN CAST(16 + doc_id % 4080 AS INTEGER) END AS width,
      CASE WHEN doc_id % 3 < 2
           THEN CAST(16 + (doc_id * 11) % 4080 AS INTEGER) END AS height,
      CASE WHEN doc_id % 3 < 2 THEN
        CASE WHEN doc_id % 2 = 0 THEN 'avc1' ELSE 'mp4v' END END AS codec
    FROM documents
    """,
)
def m13_mp4_box_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP4/ISO-BMFF box-chain walk (``multimodal.parse_mp4_meta``) —
    the video sibling of m11's JPEG segment walk and the last big
    container the multimodal tier can sniff codec-free. The graded
    round trip BUILDS genuine BMFF byte streams per doc with codegen'd
    binary expressions: ftyp (brand alternating isom/mp42) + a free
    box padded by ``doc_id % 7`` bytes (so the moov offset varies row
    to row) + moov{mvhd(timescale 600, doc-varying duration) +
    trak{tkhd(16.16 fixed dims) + mdia→minf→stbl→stsd(avc1/mp4v)} +
    an extra dimension-less audio trak on every fifth doc} + an mdat
    body the walker must SKIP by length — then parses them back and
    the oracle restates every field arithmetically: an off-by-one in
    any box size, the 64-bit/to-end size rules, the fixed-point dims,
    or the duration/timescale division breaks the hash. Every third
    doc carries text bytes and must report 'unknown' with NULLs."""
    from logverzcore_spark.operators.multimodal import parse_mp4_meta

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    dur = (did * 37) % 100000
    w = (16 + did % 4080).cast("int")
    h = (16 + (did * 11) % 4080).cast("int")
    pad = (did % 7).cast("int")

    def be32(c):
        return F.unhex(F.lpad(F.hex(c.cast("long")), 8, "0"))

    def hx(s):
        return F.unhex(F.lit(s))

    def fourcc(s):
        return s.encode("ascii").hex().upper()

    z = "00"
    ftyp = hx("00000014" + fourcc("ftyp"))
    brand = F.when(did % 2 == 0, hx(fourcc("isom"))).otherwise(hx(fourcc("mp42")))
    ftyp = F.concat(ftyp, brand, hx("00000200" + fourcc("mp41")))
    free = F.concat(
        be32(pad + 8), hx(fourcc("free")),
        F.encode(F.repeat(F.lit("A"), pad), "UTF-8"),
    )
    # mvhd v0 (108B): ctime/mtime 0, timescale 600, doc-varying
    # duration, rate/volume, 8B reserved + 36B matrix + 24B predefined
    # zeros, next_track 2
    mvhd = F.concat(
        hx("0000006C" + fourcc("mvhd") + z * 4 + z * 8 + "00000258"),
        be32(dur),
        hx("00010000" + "0100" + z * 2 + z * 8 + z * 36 + z * 24 + "00000002"),
    )

    def tkhd(track_id, width_col, height_col):
        return F.concat(
            hx("0000005C" + fourcc("tkhd") + z * 4 + z * 8
               + f"{track_id:08X}" + z * 4),
            be32(dur),
            hx(z * 8 + z * 8 + z * 36),
            be32(width_col.cast("long") * 65536),
            be32(height_col.cast("long") * 65536),
        )

    codec = F.when(did % 2 == 0, hx(fourcc("avc1"))).otherwise(hx(fourcc("mp4v")))
    stsd = F.concat(
        hx("00000020" + fourcc("stsd") + z * 4 + "00000001" + "00000010"),
        codec, hx(z * 6 + "0001"),
    )
    stbl = F.concat(hx("00000028" + fourcc("stbl")), stsd)
    minf = F.concat(hx("00000030" + fourcc("minf")), stbl)
    mdia = F.concat(hx("00000038" + fourcc("mdia")), minf)
    trak = F.concat(hx("0000009C" + fourcc("trak")), tkhd(1, w, h), mdia)
    zero = F.lit(0).cast("int")
    trak2 = F.when(
        did % 5 == 0,
        F.concat(hx("00000064" + fourcc("trak")), tkhd(2, zero, zero)),
    ).otherwise(hx(""))
    moov_size = F.when(did % 5 == 0, F.lit(8 + 108 + 156 + 100)).otherwise(
        F.lit(8 + 108 + 156)
    )
    moov = F.concat(be32(moov_size), hx(fourcc("moov")), mvhd, trak, trak2)
    mdat = F.concat(hx("0000000C" + fourcc("mdat")), hx("DEADBE"))
    mp4 = F.concat(ftyp, free, moov, mdat)
    payload = F.when(did % 3 < 2, mp4).otherwise(F.encode("text", "UTF-8"))
    return parse_mp4_meta(docs.select("doc_id", payload.alias("payload")))


@query(
    "m14_raster_decode",
    oracle="""
    SELECT doc_id,
      CASE WHEN doc_id % 4 < 3 THEN 'ppm' ELSE 'unknown' END AS format,
      CASE WHEN doc_id % 4 < 3
           THEN CAST(4 + doc_id % 13 AS INTEGER) END AS width,
      CASE WHEN doc_id % 4 < 3
           THEN CAST(3 + doc_id % 7 AS INTEGER) END AS height,
      CASE WHEN doc_id % 4 < 3 THEN CAST(3 AS INTEGER) END AS channels,
      CASE WHEN doc_id % 4 < 3
           THEN CAST((4 + doc_id % 13) * (3 + doc_id % 7) AS BIGINT)
      END AS n_pixels,
      CASE WHEN doc_id % 4 < 3
           THEN CAST((4 + doc_id % 13) * (3 + doc_id % 7)
                * ((doc_id % 256) + ((doc_id * 7) % 256)
                   + ((doc_id * 13) % 256)) AS BIGINT)
      END AS pixel_sum,
      CASE WHEN doc_id % 4 < 3
           THEN CAST(doc_id % 256 AS INTEGER) END AS first_px,
      CASE WHEN doc_id % 4 < 3
           THEN CAST((doc_id * 13) % 256 AS INTEGER) END AS last_px
    FROM documents
    """,
)
def m14_raster_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel decode for codec-free rasters
    (``multimodal.decode_image_raw``): the graded round trip builds
    genuine binary-PPM (P6) byte streams per doc with codegen
    expressions — doc-varying header dims and a doc-varying RGB fill
    pattern repeated width×height times — decodes them back to actual
    pixel values, and the oracle restates dims and the exact integer
    pixel-byte sum arithmetically: a header-parse off-by-one, a raster
    length error, or a channel-order bug breaks the hash. The
    BMP↔PPM normalization equivalence (bottom-up BGR padded rows →
    the same top-down RGB stream) is pytest-graded; the remaining
    ``decode_image`` stub now covers only entropy-coded formats whose
    codecs this container lacks. Every fourth doc carries text bytes
    and reports 'unknown' with NULLs."""
    from logverzcore_spark.operators.multimodal import decode_image_raw

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    w = (4 + did % 13).cast("int")
    h = (3 + did % 7).cast("int")

    def byte_hex(c):
        return F.lpad(F.hex(c.cast("long") % 256), 2, "0")

    pattern = F.unhex(
        F.concat(byte_hex(did), byte_hex(did * 7), byte_hex(did * 13))
    )
    header = F.encode(
        F.concat(
            F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"),
            F.lit("\n255\n"),
        ),
        "UTF-8",
    )
    # repeat() is string-typed: hex-encode the 3-byte pattern, repeat
    # the hex text w*h times, unhex once — binary-safe replication.
    raster = F.unhex(F.repeat(F.hex(pattern), w * h))
    img = F.concat(header, raster)
    payload = F.when(did % 4 < 3, img).otherwise(F.encode("text", "UTF-8"))
    return decode_image_raw(docs.select("doc_id", payload.alias("payload")))


@query(
    "m15_audio_container_probe",
    oracle="""
    SELECT doc_id,
      CASE doc_id % 4 WHEN 0 THEN 'mp3' WHEN 1 THEN 'flac'
                      WHEN 2 THEN 'ogg' ELSE 'unknown' END AS format,
      CASE WHEN doc_id % 4 IN (1, 2)
           THEN CAST(1 + doc_id % 2 AS INTEGER) END AS channels,
      CASE WHEN doc_id % 4 = 0 THEN CAST(
             CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                             ELSE 32000 END AS BIGINT)
           WHEN doc_id % 4 = 1 THEN CAST(
             CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                             ELSE 96000 END AS BIGINT)
           WHEN doc_id % 4 = 2 THEN CAST(8000 * (1 + doc_id % 5) AS BIGINT)
      END AS sample_rate,
      CASE WHEN doc_id % 4 = 0 THEN CAST(
             CASE doc_id % 3 WHEN 0 THEN 128 WHEN 1 THEN 160
                             ELSE 192 END AS INTEGER) END AS bitrate_kbps,
      CASE WHEN doc_id % 4 = 1
           THEN CAST(CASE WHEN doc_id % 2 = 0 THEN 16 ELSE 24 END
                     AS INTEGER) END AS bits_per_sample,
      CASE WHEN doc_id % 4 = 0
           THEN CAST(120 + doc_id % 20 AS BIGINT) END AS tag_bytes
    FROM documents
    """,
)
def m15_audio_container_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3/FLAC/Ogg metadata sniffing (multimodal.sniff_audio_meta) —
    m10's siblings for the remaining common audio containers. Byte-exact
    headers are BUILT from doc_id (ID3v2 syncsafe tag size crossing the
    7-bit boundary + MPEG1-L3 frame header; FLAC STREAMINFO with the
    20/3/5-bit packed rate/channels/bps word; a canonical one-segment
    Ogg page with the \\x01vorbis ident packet), parsed back with
    codegen'd binary expressions, and the oracle restates every field
    arithmetically — any mis-addressed byte or shift breaks the round
    trip. Every fourth doc carries junk bytes and must sniff 'unknown'."""
    from logverzcore_spark.operators.multimodal import sniff_audio_meta

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")

    def hx(col, nbytes: int = 1):
        return F.lpad(F.hex(col.cast("long")), nbytes * 2, "0")

    # mp3: ID3v2.4 header, tag size 120+d%20 (crosses the syncsafe 7-bit
    # boundary), zero padding, then FF FB frame header
    ts = (F.lit(120) + d % 20).cast("long")
    mp3_hex = F.concat(
        F.lit("4944330400" + "00" + "0000"),
        hx(F.floor(ts / 128)), hx(ts % 128),
        F.repeat(F.lit("00"), ts.cast("int")),
        F.lit("fffb"),
        hx((F.lit(9) + d % 3) * 16 + (d % 3) * 4),
        F.lit("00"),
    )
    # flac: fLaC + STREAMINFO(34) with packed rate/ch/bps
    fsr = (
        F.when(d % 3 == 0, 44100).when(d % 3 == 1, 48000).otherwise(96000)
    ).cast("long")
    fch = (1 + d % 2).cast("long")
    fbps = F.when(d % 2 == 0, 16).otherwise(24).cast("long")
    flac_hex = F.concat(
        F.lit("664c6143" + "00" + "000022"),
        F.lit("00" * 10),
        hx(F.shiftright(fsr.cast("int"), 12)),
        hx(F.shiftright(fsr.cast("int"), 4).bitwiseAND(F.lit(255))),
        hx(fsr.bitwiseAND(F.lit(15)) * 16 + (fch - 1) * 2
           + F.shiftright((fbps - 1).cast("int"), 4)),
        hx((fbps - 1).bitwiseAND(F.lit(15)) * 16),
        F.lit("00" * 20),
    )
    # ogg: one-segment page + \x01vorbis ident packet
    osr = (8000 * (1 + d % 5)).cast("long")
    ogg_hex = F.concat(
        F.lit("4f676753" + "00" + "02" + "00" * 20 + "01" + "1e"),
        F.lit("01" + "766f72626973" + "00000000"),
        hx(1 + d % 2),
        hx(osr.bitwiseAND(F.lit(255))),
        hx(F.shiftright(osr.cast("int"), 8).bitwiseAND(F.lit(255))),
        hx(F.shiftright(osr.cast("int"), 16).bitwiseAND(F.lit(255))),
        hx(F.shiftright(osr.cast("int"), 24).bitwiseAND(F.lit(255))),
        F.lit("0000"),
    )
    payload = F.unhex(
        F.when(d % 4 == 0, mp3_hex)
        .when(d % 4 == 1, flac_hex)
        .when(d % 4 == 2, ogg_hex)
        .otherwise(F.md5(d.cast("string")))
    )
    return sniff_audio_meta(docs.select("doc_id", payload.alias("payload")))


@query(
    "m16_tiff_ifd_probe",
    oracle="""
    SELECT doc_id,
      CASE WHEN doc_id % 4 = 3 THEN 'unknown' ELSE 'tiff' END AS format,
      CASE WHEN doc_id % 4 <> 3
           THEN CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END
      END AS byte_order,
      CASE WHEN doc_id % 4 <> 3
           THEN CAST(16 + doc_id % 2000 AS INTEGER) END AS width,
      CASE WHEN doc_id % 4 <> 3
           THEN CAST(16 + (doc_id * 5) % 2000 AS INTEGER) END AS height,
      CASE WHEN doc_id % 4 <> 3
           THEN CAST(1 + doc_id % 8 AS INTEGER) END AS orientation,
      CASE WHEN doc_id % 4 <> 3
           THEN CAST(3 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS INTEGER)
      END AS n_ifd_entries,
      CASE WHEN doc_id % 4 <> 3 THEN doc_id % 3 = 0 END AS has_exif
    FROM documents
    """,
)
def m16_tiff_ifd_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIFF/EXIF IFD walk (multimodal.parse_tiff_meta): byte-exact TIFF
    headers BUILT from doc_id in BOTH byte orders — variable pre-IFD
    padding moves the directory pointer, SHORT values left-justified in
    the 4-byte field per spec, an EXIF sub-IFD pointer tag on every
    third doc — parsed back by the bounded Arrow walk; the oracle
    restates every field arithmetically. Any endian slip, mis-sized
    entry stride, or wrong value-justification breaks the hash. Every
    fourth doc is junk and must sniff 'unknown'."""
    from logverzcore_spark.operators.multimodal import parse_tiff_meta

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    is_le = d % 2 == 0

    def hx(col, nbytes: int):
        return F.lpad(F.hex(col.cast("long")), nbytes * 2, "0")

    def num(col, nbytes: int):
        """Endian-aware hex of an integer field."""
        be = hx(col, nbytes)
        pairs = [F.substring(be, (nbytes - 1 - i) * 2 + 1, 2) for i in range(nbytes)]
        le = F.concat(*pairs)
        return F.when(is_le, le).otherwise(be)

    w = (16 + d % 2000).cast("long")
    h = (16 + (d * 5) % 2000).cast("long")
    orient = (1 + d % 8).cast("long")
    pad = (d % 5).cast("int")
    ifd_off = (F.lit(8) + pad).cast("long")
    with_exif = d % 3 == 0
    n_entries = F.when(with_exif, 4).otherwise(3).cast("long")

    def entry(tag: int, typ: int, val):
        # 12-byte record: tag, type, count=1, value (SHORT left-justified)
        value_field = (
            F.concat(num(val, 2), F.lit("0000"))
            if typ == 3
            else num(val, 4)
        )
        return F.concat(
            num(F.lit(tag), 2), num(F.lit(typ), 2), num(F.lit(1), 4), value_field
        )

    header = F.concat(
        F.when(is_le, F.lit("4949")).otherwise(F.lit("4D4D")),
        num(F.lit(42), 2),
        num(ifd_off, 4),
        F.repeat(F.lit("00"), pad),
        num(n_entries, 2),
        entry(0x0100, 3, w),
        entry(0x0101, 3, h),
        entry(0x0112, 3, orient),
        F.when(with_exif, entry(0x8769, 4, F.lit(0x7FF0))).otherwise(F.lit("")),
        F.lit("00000000"),
    )
    payload = F.when(d % 4 == 3, F.encode("text", "UTF-8")).otherwise(F.unhex(header))
    return parse_tiff_meta(docs.select("doc_id", payload.alias("payload")))


@query(
    "m17_jpeg_exif_probe",
    oracle="""
    SELECT doc_id,
      CASE WHEN doc_id % 4 = 3 THEN 'unknown'
           WHEN doc_id % 5 = 4 THEN 'jpeg'
           ELSE 'jpeg-exif' END AS format,
      CASE WHEN doc_id % 4 <> 3 AND doc_id % 5 <> 4
           THEN CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END
      END AS byte_order,
      CASE WHEN doc_id % 4 <> 3 AND doc_id % 5 <> 4
           THEN CAST(1 + doc_id % 8 AS INTEGER) END AS orientation,
      CASE WHEN doc_id % 4 <> 3 AND doc_id % 5 <> 4
           THEN 'CAM' || CAST(doc_id % 7 AS VARCHAR) END AS make,
      CASE WHEN doc_id % 4 <> 3 AND doc_id % 5 <> 4
           THEN 'MDL-' || CAST(doc_id % 13 AS VARCHAR) END AS model,
      CASE WHEN doc_id % 4 <> 3 AND doc_id % 5 <> 4
           THEN doc_id % 3 = 0 END AS has_exif_ifd
    FROM documents
    """,
)
def m17_jpeg_exif_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF-in-JPEG probe (multimodal.parse_jpeg_exif): byte-exact JPEGs
    built from doc_id — APP0 first on even docs, APP1 carrying an
    ``Exif\\0\\0`` TIFF block in BOTH byte orders, Make/Model as
    OFFSET-VALUED variable-length ASCII tags (the value area follows the
    IFD, so every string length shift moves the offsets), Orientation a
    left-justified SHORT, an EXIF sub-IFD pointer every third doc —
    parsed back by the two-level walk; the oracle restates every field
    arithmetically. Every fourth doc is junk ('unknown'); every fifth a
    plain JPEG without EXIF ('jpeg' + NULLs). Any endian slip, segment
    stride error, or offset-vs-inline confusion breaks the hash."""
    from logverzcore_spark.operators.multimodal import parse_jpeg_exif

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    is_le = d % 2 == 0

    def hx(col, nbytes: int):
        return F.lpad(F.hex(col.cast("long")), nbytes * 2, "0")

    def num(col, nbytes: int):
        """TIFF-endian-aware hex of an integer field."""
        be = hx(col, nbytes)
        pairs = [F.substring(be, (nbytes - 1 - i) * 2 + 1, 2) for i in range(nbytes)]
        le = F.concat(*pairs)
        return F.when(is_le, le).otherwise(be)

    make_s = F.concat(F.lit("CAM"), (d % 7).cast("string"))
    model_s = F.concat(F.lit("MDL-"), (d % 13).cast("string"))
    make_cnt = (F.length(make_s) + 1).cast("long")   # + trailing NUL
    model_cnt = (F.length(model_s) + 1).cast("long")
    orient = (1 + d % 8).cast("long")
    with_exif = d % 3 == 0
    n_entries = F.when(with_exif, 4).otherwise(3).cast("long")
    val_base = (F.lit(10) + 12 * n_entries + 4).cast("long")
    make_off = val_base
    model_off = (val_base + make_cnt).cast("long")

    def entry(tag: int, typ: int, count, value_field):
        return F.concat(num(F.lit(tag), 2), num(F.lit(typ), 2), num(count, 4), value_field)

    tiff = F.concat(
        F.when(is_le, F.lit("4949")).otherwise(F.lit("4D4D")),
        num(F.lit(42), 2),
        num(F.lit(8), 4),
        num(n_entries, 2),
        entry(0x010F, 2, make_cnt, num(make_off, 4)),
        entry(0x0110, 2, model_cnt, num(model_off, 4)),
        entry(0x0112, 3, F.lit(1).cast("long"), F.concat(num(orient, 2), F.lit("0000"))),
        F.when(
            with_exif, entry(0x8769, 4, F.lit(1).cast("long"), num(F.lit(0x7FF0), 4))
        ).otherwise(F.lit("")),
        F.lit("00000000"),
        F.hex(F.encode(make_s, "UTF-8")), F.lit("00"),
        F.hex(F.encode(model_s, "UTF-8")), F.lit("00"),
    )
    tiff_bytes = (F.length(tiff) / 2).cast("long")
    app0 = F.lit("FFE0" "0010" "4A4649460001020000480048" "0000")
    sof0 = F.lit("FFC0" "000B" "08" "0010" "0010" "01" "011100")
    app1 = F.concat(F.lit("FFE1"), hx(tiff_bytes + 8, 2), F.lit("457869660000"), tiff)
    jpeg_exif = F.concat(
        F.lit("FFD8"),
        F.when(is_le, app0).otherwise(F.lit("")),
        app1, sof0, F.lit("FFD9"),
    )
    jpeg_plain = F.concat(F.lit("FFD8"), app0, sof0, F.lit("FFD9"))
    payload = (
        F.when(d % 4 == 3, F.encode("text", "UTF-8"))
        .when(d % 5 == 4, F.unhex(jpeg_plain))
        .otherwise(F.unhex(jpeg_exif))
    )
    return parse_jpeg_exif(docs.select("doc_id", payload.alias("payload")))


@query(
    "m18_gif_anim_probe",
    oracle="""
    SELECT doc_id,
      CASE WHEN doc_id % 4 = 3 THEN 'unknown' ELSE 'gif' END AS format,
      CASE WHEN doc_id % 4 <> 3 THEN CAST(10 + doc_id % 100 AS INTEGER) END AS width,
      CASE WHEN doc_id % 4 <> 3
           THEN CAST(20 + (doc_id * 3) % 100 AS INTEGER) END AS height,
      CASE WHEN doc_id % 4 <> 3 THEN CAST(1 + doc_id % 4 AS INTEGER) END AS n_frames,
      CASE WHEN doc_id % 4 <> 3
           THEN CAST((1 + doc_id % 4) * (2 + doc_id % 7) AS INTEGER)
      END AS duration_cs,
      CASE WHEN doc_id % 4 <> 3 AND doc_id % 3 = 0
           THEN CAST(doc_id % 5 AS INTEGER) END AS loop_count
    FROM documents
    """,
)
def m18_gif_anim_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Animated-GIF walk (multimodal.parse_gif_anim): byte-exact GIF89a
    files built from doc_id — global color table on even docs (moving
    every later offset), a NETSCAPE2.0 loop extension every third doc,
    1-4 frames each carrying a GCE delay and a length-prefixed pixel
    sub-block chain the parser must SKIP by length, never decode. The
    oracle restates frames / total duration / loop count
    arithmetically; every fourth doc is junk ('unknown')."""
    from logverzcore_spark.operators.multimodal import parse_gif_anim

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")

    def le16(col):
        be = F.lpad(F.hex(col.cast("long")), 4, "0")
        return F.concat(F.substring(be, 3, 2), F.substring(be, 1, 2))

    w = (10 + d % 100).cast("long")
    h = (20 + (d * 3) % 100).cast("long")
    n_frames = (1 + d % 4).cast("int")
    delay = (2 + d % 7).cast("long")
    loops = (d % 5).cast("long")
    has_gct = d % 2 == 0
    has_loop = d % 3 == 0

    lsd = F.concat(
        le16(w), le16(h),
        F.when(has_gct, F.lit("80")).otherwise(F.lit("00")),
        F.lit("0000"),
        F.when(has_gct, F.lit("000000FFFFFF")).otherwise(F.lit("")),
    )
    netscape = F.when(
        has_loop,
        F.concat(
            F.lit("21FF0B"), F.lit("4E45545343415045322E30"),
            F.lit("0301"), le16(loops), F.lit("00"),
        ),
    ).otherwise(F.lit(""))
    frame = F.concat(
        F.lit("21F904" "00"), le16(delay), F.lit("00" "00"),       # GCE
        F.lit("2C"), F.lit("0000" "0000"), le16(w), le16(h),        # descriptor
        F.lit("00"),                                                # no LCT
        F.lit("02"), F.lit("01" "00" "00"),                         # LZW min + 1-byte sub-block
    )
    gif = F.concat(
        F.lit("474946383961"), lsd, netscape, F.repeat(frame, n_frames), F.lit("3B")
    )
    payload = F.when(d % 4 == 3, F.encode("text", "UTF-8")).otherwise(F.unhex(gif))
    return parse_gif_anim(docs.select("doc_id", payload.alias("payload")))


@query(
    "m19_png_chunk_probe",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             doc_id % 5 = 4 AS junk,
             CASE doc_id % 4 WHEN 0 THEN 0 WHEN 1 THEN 2
                             WHEN 2 THEN 3 ELSE 6 END AS ct,
             doc_id % 3 AS ntext,
             (1 + doc_id % 2) * (5 + doc_id % 7) AS idat,
             1 + doc_id % 2 AS nidat
      FROM documents
    )
    SELECT doc_id,
      CASE WHEN junk THEN 'unknown' ELSE 'png' END AS format,
      CASE WHEN NOT junk THEN CAST(16 + doc_id % 512 AS INTEGER) END AS width,
      CASE WHEN NOT junk THEN CAST(16 + (doc_id * 7) % 512 AS INTEGER) END AS height,
      CASE WHEN NOT junk THEN 8 END AS bit_depth,
      CASE WHEN NOT junk THEN CAST(ct AS INTEGER) END AS color_type,
      CASE WHEN NOT junk THEN ct = 3 END AS has_palette,
      CASE WHEN NOT junk AND doc_id % 3 = 0
           THEN CAST(1000 + doc_id % 500 AS INTEGER) END AS ppu_x,
      CASE WHEN NOT junk THEN CAST(ntext AS INTEGER) END AS n_text_chunks,
      CASE WHEN NOT junk THEN CAST(idat AS BIGINT) END AS idat_bytes,
      CASE WHEN NOT junk THEN CAST(
        2 + CASE WHEN ct = 3 THEN 1 ELSE 0 END
          + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
          + ntext + nidat AS INTEGER) END AS n_chunks
    FROM p
    """,
)
def m19_png_chunk_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG chunk walk (multimodal.parse_png_chunks): byte-exact PNGs
    built from doc_id — indexed-color docs carry a PLTE, every third a
    pHYs density, 0-2 tEXt chunks, IDAT split across 1-2 chunks whose
    lengths vary per doc (every later offset moves) — the oracle
    restates every field arithmetically, including the total chunk
    count to IEND. Every fifth doc is junk ('unknown')."""
    from logverzcore_spark.operators.multimodal import parse_png_chunks

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")

    def be32(col):
        return F.lpad(F.hex(col.cast("long")), 8, "0")

    w = (16 + d % 512).cast("long")
    h = (16 + (d * 7) % 512).cast("long")
    ct = (
        F.when(d % 4 == 0, 0).when(d % 4 == 1, 2).when(d % 4 == 2, 3).otherwise(6)
    ).cast("long")
    ppu = (1000 + d % 500).cast("long")
    n_text = (d % 3).cast("int")
    idat_len = (5 + d % 7).cast("long")
    n_idat = (1 + d % 2).cast("int")
    crc = F.lit("00000000")

    ihdr = F.concat(
        F.lit("0000000D" "49484452"), be32(w), be32(h),
        F.lit("08"), F.lpad(F.hex(ct), 2, "0"), F.lit("000000"), crc,
    )
    plte = F.when(
        ct == 3,
        F.concat(F.lit("00000009" "504C5445" "000000FFFFFF808080"), crc),
    ).otherwise(F.lit(""))
    phys = F.when(
        d % 3 == 0,
        F.concat(F.lit("00000009" "70485973"), be32(ppu), be32(ppu), F.lit("01"), crc),
    ).otherwise(F.lit(""))
    text_chunk = F.concat(F.lit("00000007" "74455874" "6B657900" "76616C"), crc)
    idat = F.concat(
        be32(idat_len), F.lit("49444154"), F.repeat(F.lit("00"), idat_len.cast("int")), crc
    )
    png = F.concat(
        F.lit("89504E470D0A1A0A"), ihdr, plte, phys,
        F.repeat(text_chunk, n_text), F.repeat(idat, n_idat),
        F.lit("00000000" "49454E44"), crc,
    )
    payload = F.when(d % 5 == 4, F.encode("text", "UTF-8")).otherwise(F.unhex(png))
    return parse_png_chunks(docs.select("doc_id", payload.alias("payload")))


@query(
    "m20_srt_cue_parse",
    oracle="""
    WITH g AS (
      SELECT doc_id, unnest(range(0, 1 + doc_id % 4)) AS i FROM documents
    )
    SELECT doc_id,
           CAST(i + CASE WHEN doc_id % 5 = 4 THEN 1 ELSE 0 END AS INTEGER)
             AS cue_idx,
           CAST(i * 5000 + doc_id % 1000 AS BIGINT) AS start_ms,
           CAST(i * 5000 + doc_id % 1000 + 2000 + doc_id % 500 AS BIGINT)
             AS end_ms,
           'cue ' || i || ' of doc ' || doc_id AS caption
    FROM g
    """,
)
def m20_srt_cue_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRT subtitle parsing (multimodal.parse_srt_cues): per-doc SRT
    sidecars BUILT from doc_id (1-4 cues, doc-varying offsets and
    durations, millisecond-exact timecodes rendered with pure lpad
    arithmetic), every fifth doc opening with a MALFORMED block the
    parser must drop while keeping the true posexplode cue index, and
    every doc trailing a junk block. The oracle restates the parsed
    rows arithmetically — any timecode-arithmetic slip or index drift
    breaks the hash. All codegen: split, posexplode, regexp captures,
    integer math."""
    from logverzcore_spark.operators.multimodal import parse_srt_cues

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    n = (1 + d % 4).cast("int")

    def tc(ms):
        return F.concat(
            F.lpad(F.floor(ms / 3600000).cast("string"), 2, "0"), F.lit(":"),
            F.lpad(F.floor(ms % 3600000 / 60000).cast("string"), 2, "0"), F.lit(":"),
            F.lpad(F.floor(ms % 60000 / 1000).cast("string"), 2, "0"), F.lit(","),
            F.lpad((ms % 1000).cast("string"), 3, "0"),
        )

    def block(i):
        start = i.cast("long") * 5000 + d % 1000
        end = start + 2000 + d % 500
        return F.concat(
            (i + 1).cast("string"), F.lit("\n"),
            tc(start), F.lit(" --> "), tc(end), F.lit("\n"),
            F.lit("cue "), i.cast("string"), F.lit(" of doc "), d.cast("string"),
        )

    body = F.concat_ws("\n\n", F.transform(F.sequence(F.lit(0), n - 1), block))
    srt = F.concat(
        F.when(d % 5 == 4, F.lit("0\nnot a timecode line\ngarbage\n\n")).otherwise(
            F.lit("")
        ),
        body,
        F.lit("\n\ntrailing junk block without any timing"),
    )
    return parse_srt_cues(docs.select("doc_id", srt.alias("srt")))


@query(
    "m21_zip_central_dir",
    oracle="""
    WITH g AS (
      SELECT doc_id, unnest(range(0, 1 + doc_id % 3)) AS k
      FROM documents WHERE doc_id % 7 <> 6
    )
    SELECT doc_id,
           CAST(k AS INTEGER) AS entry_idx,
           'f' || CAST(k AS VARCHAR) || '.txt' AS name,
           CAST(CASE WHEN doc_id % 3 = 2 THEN 8 ELSE 0 END AS INTEGER) AS method,
           CAST(3 + (doc_id + k) % 6 AS BIGINT) AS comp_bytes,
           CAST((3 + (doc_id + k) % 6)
                * (CASE WHEN doc_id % 3 = 2 THEN 3 ELSE 1 END) AS BIGINT)
             AS uncomp_bytes,
           printf('%08x', ((doc_id % 1000000) * 2654435761 + k) % 4294967296) AS crc_hex
    FROM g
    """,
)
def m21_zip_central_dir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIP member listing (multimodal.parse_zip_central_dir): byte-exact
    STORED-layout archives built from doc_id — 1-3 members with
    per-member data lengths that shift every later offset, deflate
    method codes on every third doc (sizes from the CD, data never
    inflated), and a trailing archive COMMENT on every fifth doc that
    displaces the EOCD off its no-comment position (exercising the
    mandatory backward signature scan). Every seventh doc is junk text
    → zero rows (a listing, not a sniffer). The oracle restates each
    member arithmetically."""
    from logverzcore_spark.operators.multimodal import parse_zip_central_dir

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")

    def le16(col):
        be = F.lpad(F.hex(col.cast("long")), 4, "0")
        return F.concat(F.substring(be, 3, 2), F.substring(be, 1, 2))

    def le32(col):
        be = F.lpad(F.hex(col.cast("long")), 8, "0")
        return F.concat(
            F.substring(be, 7, 2), F.substring(be, 5, 2),
            F.substring(be, 3, 2), F.substring(be, 1, 2),
        )

    n = (1 + d % 3).cast("int")
    method = F.when(d % 3 == 2, F.lit(8)).otherwise(F.lit(0)).cast("long")
    mult = F.when(d % 3 == 2, F.lit(3)).otherwise(F.lit(1)).cast("long")

    def dlen(k):
        return (3 + (d + F.lit(k)) % 6).cast("long")

    def crc(k):
        # doc_id bounded first: scale replicas offset ids by 1e9 per
        # copy and the raw multiply would overflow BIGINT (found by the
        # 10x probe's ANSI overflow error)
        return ((d % 1000000) * F.lit(2654435761) + F.lit(k)) % F.lit(4294967296)

    def name_hex(k):
        return "66" + format(0x30 + k, "02X") + "2E747874"  # 'f{k}.txt'

    locals_, cds, offs = [], [], []
    off = F.lit(0).cast("long")
    for k in range(3):
        common = F.concat(
            le16(method), F.lit("00000000"),           # mod time+date
            le32(crc(k)), le32(dlen(k)), le32(dlen(k) * mult),
            F.lit("0600"), F.lit("0000"),              # name len 6, extra 0
        )
        loc = F.concat(
            F.lit("504B0304" "1400" "0000"), common,
            F.lit(name_hex(k)), F.repeat(F.lit("00"), dlen(k).cast("int")),
        )
        cd = F.concat(
            F.lit("504B0102" "1400" "1400" "0000"), common,
            F.lit("0000"),                             # file comment len
            F.lit("0000" "0000" "00000000"),           # disk, int/ext attrs
            le32(off), F.lit(name_hex(k)),
        )
        in_n = F.lit(k) < n
        locals_.append(F.when(in_n, loc).otherwise(F.lit("")))
        cds.append(F.when(in_n, cd).otherwise(F.lit("")))
        off = off + F.when(in_n, 36 + dlen(k)).otherwise(F.lit(0))
    cd_off = off  # total bytes of local sections
    cd_size = (52 * n).cast("long")
    has_comment = d % 5 == 0
    eocd = F.concat(
        F.lit("504B0506" "0000" "0000"), le16(n), le16(n),
        le32(cd_size), le32(cd_off),
        F.when(has_comment, F.lit("0700" "61726368697665"))
         .otherwise(F.lit("0000")),
    )
    zip_hex = F.concat(*locals_, *cds, eocd)
    payload = F.when(d % 7 == 6, F.encode("text", "UTF-8")).otherwise(F.unhex(zip_hex))
    return parse_zip_central_dir(docs.select("doc_id", payload.alias("payload")))


@query(
    "m22_tar_entries",
    oracle="""
    WITH g AS (
      SELECT doc_id, unnest(range(0, 1 + doc_id % 3)) AS k
      FROM documents WHERE doc_id % 7 <> 6
    )
    SELECT doc_id,
           CAST(k AS INTEGER) AS entry_idx,
           'f' || CAST(k AS VARCHAR) || '.txt' AS name,
           CASE WHEN doc_id % 4 = 0 AND k = 0 THEN '2' ELSE '0' END AS typeflag,
           CAST(CASE WHEN doc_id % 4 = 0 AND k = 0 THEN 0
                     ELSE 3 + (doc_id + k) % 5 END AS BIGINT) AS size,
           CAST(doc_id % 8 AS BIGINT) AS mtime,
           CASE WHEN doc_id % 4 = 0 AND k = 0 THEN 'target' END AS linkname
    FROM g
    """,
)
def m22_tar_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """USTAR member listing (multimodal.parse_tar_entries): byte-exact
    tar streams built from doc_id — 1-3 members whose data lengths
    move every later block, a SYMLINK first member (typeflag 2,
    size 0, linkname, no data block) on every fourth doc, octal
    size/mtime fields, end-of-archive zero blocks. Every seventh doc
    is junk text (no ustar magic) → zero rows. The oracle restates
    each member arithmetically."""
    from logverzcore_spark.operators.multimodal import parse_tar_entries

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    n = (1 + d % 3).cast("int")

    def octal1(val):
        # 11-field octal: ten '0's + one octal digit + NUL (values 0-7)
        return F.concat(F.lit("30" * 10), F.lpad(F.hex(val + 0x30), 2, "0"), F.lit("00"))

    pieces = []
    for k in range(3):
        is_link = (d % 4 == 0) & (F.lit(k) == 0)
        dlen = F.when(is_link, F.lit(0)).otherwise(3 + (d + F.lit(k)) % 5).cast("long")
        name_hex = "66" + format(0x30 + k, "02X") + "2E747874"  # f{k}.txt
        hdr = F.concat(
            F.lit(name_hex), F.lit("00" * 94),                # name (100)
            F.lit("30" * 7 + "00"),                           # mode (8)
            F.lit("30" * 7 + "00"), F.lit("30" * 7 + "00"),   # uid gid
            octal1(dlen),                                     # size (12)
            octal1((d % 8).cast("long")),                     # mtime (12)
            F.lit("20" * 8),                                  # chksum: spaces
            F.when(is_link, F.lit("32")).otherwise(F.lit("30")),  # typeflag
            F.when(is_link, F.lit("746172676574" + "00" * 94))
             .otherwise(F.lit("00" * 100)),                   # linkname
            F.lit("7573746172" "00" "3030"),                  # ustar\0 00
            F.lit("00" * 64),                                 # uname gname
            F.lit("00" * 16),                                 # dev major/minor
            F.lit("00" * 167),                                # prefix + pad
        )
        data = F.when(dlen > 0, F.lit("00" * 512)).otherwise(F.lit(""))
        in_n = F.lit(k) < n
        pieces.append(F.when(in_n, F.concat(hdr, data)).otherwise(F.lit("")))
    tar_hex = F.concat(*pieces, F.lit("00" * 1024))
    payload = F.when(d % 7 == 6, F.encode("text", "UTF-8")).otherwise(F.unhex(tar_hex))
    return parse_tar_entries(docs.select("doc_id", payload.alias("payload")))


#: IEEE-754 big-endian hex for the m23 duration literals — computed once
#: at import (deterministic), restated as plain doubles in the oracle.
import struct as _struct

_M23_DURS = (1000.0, 1234.5, 86400.0)
_M23_DUR_HEX = tuple(_struct.pack(">d", v).hex().upper() for v in _M23_DURS)


@query(
    "m23_ebml_meta",
    oracle=f"""
    SELECT doc_id,
      CASE WHEN doc_id % 6 = 5 THEN 'unknown' ELSE 'mkv' END AS format,
      CASE WHEN doc_id % 6 = 5 THEN NULL
           WHEN doc_id % 2 = 0 THEN 'matroska' ELSE 'webm' END AS doctype,
      CASE WHEN doc_id % 6 <> 5
           THEN CAST((1 + doc_id % 3) * 500000 AS BIGINT) END AS timescale,
      CASE WHEN doc_id % 6 = 5 THEN NULL
           WHEN doc_id % 3 = 0 THEN {_M23_DURS[0]}
           WHEN doc_id % 3 = 1 THEN {_M23_DURS[1]}
           ELSE {_M23_DURS[2]} END AS duration,
      CASE WHEN doc_id % 6 <> 5
           THEN CAST(1 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS INTEGER)
      END AS n_tracks,
      CASE WHEN doc_id % 6 <> 5 THEN 1 END AS n_video,
      CASE WHEN doc_id % 6 <> 5
           THEN CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS INTEGER)
      END AS n_audio,
      CASE WHEN doc_id % 6 <> 5 THEN 'V_VP9' END AS codec_first,
      CASE WHEN doc_id % 6 <> 5
           THEN CAST(320 + (doc_id % 5) * 16 AS INTEGER) END AS width,
      CASE WHEN doc_id % 6 <> 5
           THEN CAST(180 + (doc_id % 7) * 16 AS INTEGER) END AS height
    FROM documents
    """,
)
def m23_ebml_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EBML/Matroska walk (multimodal.parse_ebml_meta): byte-exact
    MKV/WebM headers built from doc_id — VINT-length elements, a
    doctype that flips matroska/webm, an UNKNOWN-SIZE Segment on every
    fourth doc (the live-muxing case: walk must run to EOF), an Info
    block with a big-endian uint timescale and an 8-byte FLOAT
    duration (literal IEEE hex, restated as plain doubles), and 1-2
    TrackEntries (video with dims + codec; audio on every third doc).
    Every sixth doc is junk ('unknown')."""
    from logverzcore_spark.operators.multimodal import parse_ebml_meta

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")

    def be16(col):
        return F.lpad(F.hex(col.cast("long")), 4, "0")

    def be32(col):
        return F.lpad(F.hex(col.cast("long")), 8, "0")

    doctype_hex = F.when(d % 2 == 0, F.lit("88" "6D6174726F736B61")) \
                   .otherwise(F.lit("84" "7765626D"))
    header = F.concat(
        F.lit("1A45DFA3"),
        F.when(d % 2 == 0, F.lit("8B")).otherwise(F.lit("87")),
        F.lit("4282"), doctype_hex,
    )
    ts = ((1 + d % 3) * 500000).cast("long")
    dur_hex = F.when(d % 3 == 0, F.lit(_M23_DUR_HEX[0])) \
               .when(d % 3 == 1, F.lit(_M23_DUR_HEX[1])) \
               .otherwise(F.lit(_M23_DUR_HEX[2]))
    info = F.concat(
        F.lit("1549A966" "93" "2AD7B1" "84"), be32(ts),
        F.lit("4489" "88"), dur_hex,
    )
    w = (320 + (d % 5) * 16).cast("long")
    h = (180 + (d % 7) * 16).cast("long")
    video_track = F.concat(
        F.lit("AE" "94" "83" "81" "01" "86" "85" "565F565039"
              "E0" "88" "B0" "82"), be16(w), F.lit("BA" "82"), be16(h),
    )
    audio_track = F.lit("AE" "8B" "83" "81" "02" "86" "86" "415F4F505553")
    has_audio = d % 3 == 0
    tracks = F.concat(
        F.lit("1654AE6B"),
        F.when(has_audio, F.lit("A3")).otherwise(F.lit("96")),
        video_track,
        F.when(has_audio, audio_track).otherwise(F.lit("")),
    )
    seg_size = F.when(d % 4 == 0, F.lit("01FFFFFFFFFFFFFF")).otherwise(
        F.when(has_audio, F.lit("C0")).otherwise(F.lit("B3"))
    )
    mkv = F.concat(header, F.lit("18538067"), seg_size, info, tracks)
    payload = F.when(d % 6 == 5, F.encode("text", "UTF-8")).otherwise(F.unhex(mkv))
    return parse_ebml_meta(docs.select("doc_id", payload.alias("payload")))


@query(
    "m24_pdf_probe",
    oracle="""
    SELECT doc_id,
      CASE WHEN doc_id % 7 = 6 THEN 'unknown' ELSE 'pdf' END AS format,
      CASE WHEN doc_id % 7 <> 6
           THEN '1.' || CAST(4 + doc_id % 4 AS VARCHAR) END AS version,
      CASE WHEN doc_id % 7 <> 6 THEN CAST(
        (1 + doc_id % 3) + 2
        + (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS INTEGER)
      END AS n_objects,
      CASE WHEN doc_id % 7 <> 6
           THEN CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS INTEGER)
      END AS n_streams,
      CASE WHEN doc_id % 7 <> 6
           THEN CAST(1 + doc_id % 3 AS INTEGER) END AS n_pages,
      CASE WHEN doc_id % 7 <> 6 THEN doc_id % 5 = 0 END AS encrypted,
      CASE WHEN doc_id % 7 <> 6 THEN doc_id % 6 <> 3 END AS complete
    FROM documents
    """,
)
def m24_pdf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF triage (multimodal.probe_pdf): ASCII PDFs built from doc_id —
    1-3 page objects plus a Pages tree and a catalog, a content stream
    on even docs, an /Encrypt trailer ref on every fifth, and a MISSING
    %%EOF on every sixth (the truncated-tail case). Every seventh doc
    is junk text. All counts restated arithmetically."""
    from logverzcore_spark.operators.multimodal import probe_pdf

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    n_pages = 1 + d % 3
    page = F.lit("3 0 obj\n<< /Type /Page /Parent 2 0 R >>\nendobj\n")
    pdf = F.concat(
        F.lit("%PDF-1."), (4 + d % 4).cast("string"), F.lit("\n"),
        F.lit("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"),
        F.lit("2 0 obj\n<< /Type /Pages /Count "), n_pages.cast("string"),
        F.lit(" >>\nendobj\n"),
        F.repeat(page, n_pages.cast("int")),
        F.when(
            d % 2 == 0,
            F.lit("4 0 obj\n<< /Length 9 >>\nstream\nBT ET q Q\nendstream\nendobj\n"),
        ).otherwise(F.lit("")),
        F.lit("trailer\n<< /Root 1 0 R"),
        F.when(d % 5 == 0, F.lit(" /Encrypt 7 0 R")).otherwise(F.lit("")),
        F.lit(" >>\n"),
        F.when(d % 6 == 3, F.lit("")).otherwise(F.lit("%%EOF\n")),
    )
    payload = F.when(d % 7 == 6, F.encode("text", "UTF-8")).otherwise(
        F.encode(pdf, "UTF-8")
    )
    return probe_pdf(docs.select("doc_id", payload.alias("payload")))


@query(
    "m25_avi_riff_probe",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             doc_id % 4 = 3 AS junk,
             doc_id % 9 = 1 AS trunc,
             10000 + doc_id % 50000 AS uspf,
             10 + doc_id % 240 AS frames,
             1 + doc_id % 3 AS streams,
             160 + doc_id % 640 AS w,
             120 + (doc_id * 3) % 480 AS h
      FROM documents
    )
    SELECT doc_id,
      CASE WHEN junk THEN 'unknown' ELSE 'avi' END AS format,
      CASE WHEN NOT junk AND NOT trunc THEN CAST(uspf AS BIGINT) END AS us_per_frame,
      CASE WHEN NOT junk AND NOT trunc THEN CAST(frames AS BIGINT) END AS n_frames,
      CASE WHEN NOT junk AND NOT trunc THEN CAST(streams AS INTEGER) END AS n_streams,
      CASE WHEN NOT junk AND NOT trunc THEN CAST(w AS INTEGER) END AS width,
      CASE WHEN NOT junk AND NOT trunc THEN CAST(h AS INTEGER) END AS height,
      CASE WHEN NOT junk AND NOT trunc
           THEN CAST((uspf * frames) // 1000 AS BIGINT) END AS duration_ms,
      CASE WHEN NOT junk AND NOT trunc
           THEN CAST(1000000000 // uspf AS BIGINT) END AS fps_milli
    FROM p
    """,
)
def m25_avi_riff_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVI RIFF walk (multimodal.parse_avi_meta): byte-exact AVIs built
    from doc_id — every third doc carries an odd-sized JUNK chunk before
    LIST/hdrl (so the walker must skip by length AND honor RIFF's
    even-byte padding), avih carries timing/frames/streams/dims, and a
    LIST/movi trails. The oracle restates every field plus the derived
    integer duration/fps arithmetically; every fourth doc is junk
    ('unknown'), every ninth truncates after the RIFF magic ('avi' with
    NULL fields)."""
    from logverzcore_spark.operators.multimodal import parse_avi_meta

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")

    def le32(col):
        be = F.lpad(F.hex(col.cast("long")), 8, "0")
        return F.concat(
            F.substring(be, 7, 2),
            F.substring(be, 5, 2),
            F.substring(be, 3, 2),
            F.substring(be, 1, 2),
        )

    uspf = (10000 + d % 50000).cast("long")
    frames = (10 + d % 240).cast("long")
    streams = (1 + d % 3).cast("long")
    w = (160 + d % 640).cast("long")
    h = (120 + (d * 3) % 480).cast("long")
    zero4 = F.lit("00000000")
    avih_data = F.concat(
        le32(uspf), zero4, zero4, zero4,
        le32(frames), zero4, le32(streams), zero4,
        le32(w), le32(h),
        zero4, zero4, zero4, zero4,
    )
    hdrl = F.concat(
        F.lit("4C495354"), le32(F.lit(68).cast("long")), F.lit("6864726C"),
        F.lit("61766968"), le32(F.lit(56).cast("long")), avih_data,
    )
    movi = F.concat(F.lit("4C495354"), le32(F.lit(4).cast("long")), F.lit("6D6F7669"))
    js = (5 + d % 7).cast("long")                      # 5..11, odd sizes too
    jpad = js + (js % 2)
    junk = F.when(
        d % 3 == 0,
        F.concat(F.lit("4A554E4B"), le32(js), F.repeat(F.lit("00"), jpad.cast("int"))),
    ).otherwise(F.lit(""))
    riff_size = (
        F.lit(4).cast("long")
        + F.when(d % 3 == 0, 8 + jpad).otherwise(F.lit(0))
        + F.lit(76)
        + F.lit(12)
    )
    full = F.concat(
        F.lit("52494646"), le32(riff_size), F.lit("41564920"), junk, hdrl, movi
    )
    trunc = F.concat(F.lit("52494646"), le32(F.lit(4).cast("long")), F.lit("41564920"))
    payload = (
        F.when(d % 4 == 3, F.encode("text", "UTF-8"))
        .when(d % 9 == 1, F.unhex(trunc))
        .otherwise(F.unhex(full))
    )
    return parse_avi_meta(docs.select("doc_id", payload.alias("payload")))


@query(
    "m26_dataset_file_probe",
    oracle="""
    WITH p AS (
      SELECT doc_id, doc_id % 5 AS v, doc_id % 7 = 0 AS tr,
             16 + doc_id % 100 AS md, 4 + doc_id % 20 AS psl
      FROM documents
    )
    SELECT doc_id,
      CASE v WHEN 0 THEN 'parquet' WHEN 1 THEN 'arrow' WHEN 2 THEN 'orc'
             WHEN 3 THEN 'avro' ELSE 'unknown' END AS format,
      CASE WHEN v = 4 THEN false
           WHEN v = 0 AND tr THEN false
           ELSE true END AS complete,
      CASE WHEN v = 0 AND NOT tr THEN CAST(md AS BIGINT)
           WHEN v = 1 THEN CAST(md AS BIGINT)
           WHEN v = 2 THEN CAST(psl AS BIGINT) END AS meta_len
    FROM p
    """,
)
def m26_dataset_file_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-lake envelope triage (multimodal.sniff_dataset_meta):
    byte-exact parquet / Arrow-IPC / ORC / Avro-OCF envelopes built from
    doc_id (variable filler and metadata lengths move every trailing
    offset; every 7th parquet is truncated after the head magic — the
    upload-died case the probe exists to catch). The oracle restates
    format, completeness, and the trailing-metadata length
    arithmetically; every fifth doc is junk ('unknown')."""
    from logverzcore_spark.operators.multimodal import sniff_dataset_meta

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")

    def le32(col):
        be = F.lpad(F.hex(col.cast("long")), 8, "0")
        return F.concat(
            F.substring(be, 7, 2), F.substring(be, 5, 2),
            F.substring(be, 3, 2), F.substring(be, 1, 2),
        )

    fl = (10 + d % 50).cast("int")
    md = (16 + d % 100).cast("long")
    psl = (4 + d % 20).cast("long")
    filler = F.repeat(F.lit("00"), fl)
    footer = F.repeat(F.lit("AA"), md.cast("int"))
    pq = F.concat(F.lit("50415231"), filler, footer, le32(md), F.lit("50415231"))
    pq_tr = F.concat(F.lit("50415231"), filler)
    ar = F.concat(
        F.lit("4152524F57310000"), filler, footer, le32(md), F.lit("4152524F5731")
    )
    orc = F.concat(
        F.lit("4F5243"), filler,
        F.repeat(F.lit("BB"), (psl - 3).cast("int")), F.lit("4F5243"),
        F.lpad(F.hex(psl), 2, "0"),
    )
    avro = F.concat(F.lit("4F626A01"), filler)
    payload = (
        F.when((d % 5 == 0) & (d % 7 == 0), F.unhex(pq_tr))
        .when(d % 5 == 0, F.unhex(pq))
        .when(d % 5 == 1, F.unhex(ar))
        .when(d % 5 == 2, F.unhex(orc))
        .when(d % 5 == 3, F.unhex(avro))
        .otherwise(F.encode("text", "UTF-8"))
    )
    return sniff_dataset_meta(docs.select("doc_id", payload.alias("payload")))


@query(
    "m27_npy_tensor_probe",
    oracle="""
    WITH p AS (
      SELECT doc_id, doc_id % 5 = 4 AS junk, doc_id % 6 = 0 AS trunc,
             1 + doc_id % 3 AS nd,
             1 + doc_id % 7 AS a, 2 + doc_id % 5 AS b, 1 + doc_id % 3 AS c,
             CASE WHEN doc_id % 2 = 0 THEN '<f4' ELSE '<i8' END AS descr,
             CASE WHEN doc_id % 2 = 0 THEN 4 ELSE 8 END AS ib
      FROM documents
    ), e AS (
      SELECT *,
             CASE nd WHEN 1 THEN a WHEN 2 THEN a*b ELSE a*b*c END AS ne,
             CASE nd WHEN 1 THEN CAST(a AS VARCHAR)
                     WHEN 2 THEN a || 'x' || b
                     ELSE a || 'x' || b || 'x' || c END AS shp
      FROM p
    )
    SELECT doc_id,
      CASE WHEN junk THEN 'unknown' ELSE 'npy' END AS format,
      CASE WHEN NOT junk THEN descr END AS dtype,
      CASE WHEN NOT junk THEN false END AS fortran_order,
      CASE WHEN NOT junk THEN shp END AS shape,
      CASE WHEN NOT junk THEN CAST(ne AS BIGINT) END AS n_elems,
      CASE WHEN NOT junk THEN CAST(ib AS BIGINT) END AS item_bytes,
      (NOT junk AND NOT trunc) AS complete
    FROM e
    """,
)
def m27_npy_tensor_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NumPy tensor-file triage (multimodal.parse_npy_meta): byte-exact
    v1.0 .npy files built from doc_id — 1/2/3-dim shapes, f4/i8 dtypes,
    header lengths that move with the shape text, payload zeros sized
    n_elems·itemsize; every 6th file keeps only half its data (the
    truncated-upload case completeness must catch), every 5th is junk.
    The oracle restates dtype/shape/counts/completeness
    arithmetically."""
    from logverzcore_spark.operators.multimodal import parse_npy_meta

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")

    def le16(col):
        be = F.lpad(F.hex(col.cast("long")), 4, "0")
        return F.concat(F.substring(be, 3, 2), F.substring(be, 1, 2))

    nd = (1 + d % 3).cast("int")
    a = (1 + d % 7).cast("long")
    b = (2 + d % 5).cast("long")
    c = (1 + d % 3).cast("long")
    descr = F.when(d % 2 == 0, F.lit("<f4")).otherwise(F.lit("<i8"))
    ib = F.when(d % 2 == 0, F.lit(4)).otherwise(F.lit(8)).cast("long")
    ne = (
        F.when(nd == 1, a).when(nd == 2, a * b).otherwise(a * b * c)
    ).cast("long")
    shp_txt = (
        F.when(nd == 1, F.concat(a.cast("string"), F.lit(",")))
        .when(nd == 2, F.concat(a.cast("string"), F.lit(", "), b.cast("string")))
        .otherwise(
            F.concat(
                a.cast("string"), F.lit(", "), b.cast("string"),
                F.lit(", "), c.cast("string"),
            )
        )
    )
    header = F.concat(
        F.lit("{'descr': '"), descr,
        F.lit("', 'fortran_order': False, 'shape': ("), shp_txt, F.lit("), }"),
    )
    hlen = F.length(header).cast("long")
    data_hex = F.repeat(F.lit("00"), (ne * ib).cast("int"))
    data_trunc = F.repeat(F.lit("00"), ((ne * ib) / 2).cast("int"))
    npy = F.concat(
        F.lit("934E554D5059"), F.lit("0100"), le16(hlen),
        F.hex(F.encode(header, "UTF-8")),
        F.when(d % 6 == 0, data_trunc).otherwise(data_hex),
    )
    payload = F.when(d % 5 == 4, F.encode("text", "UTF-8")).otherwise(F.unhex(npy))
    return parse_npy_meta(docs.select("doc_id", payload.alias("payload")))


@query(
    "m28_warc_record_walk",
    oracle="""
    WITH w AS (
      SELECT doc_id, 10 + doc_id % 50 AS n
      FROM documents WHERE doc_id % 4 <> 3
    )
    SELECT doc_id, CAST(1 AS INTEGER) AS rec_idx, 'warc' AS format,
           'warcinfo' AS warc_type, CAST(NULL AS VARCHAR) AS target_uri,
           CAST(18 AS BIGINT) AS content_length
    FROM w
    UNION ALL
    SELECT doc_id, CAST(2 AS INTEGER), 'warc', 'response',
           'https://ex.com/' || CAST(doc_id AS VARCHAR), CAST(n AS BIGINT)
    FROM w
    UNION ALL
    SELECT doc_id, CAST(NULL AS INTEGER), 'unknown',
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS BIGINT)
    FROM documents WHERE doc_id % 4 = 3
    """,
)
def m28_warc_record_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC record-header walk (multimodal.parse_warc_records) — the
    Common Crawl container, completing the crawl→clean(t32/t52)→dedup
    story end-to-end. The graded round trip BUILDS genuine two-record
    WARC files per doc with codegen string expressions (a warcinfo
    record with a fixed 18-byte block, then a response record whose
    Target-URI and Content-Length vary by doc and whose block is
    exactly that many filler bytes) and parses them back; the oracle
    restates every field arithmetically, so an off-by-one anywhere in
    the version-line / header / blank-line / block-skip / separator
    math breaks the hash. Every fourth doc carries plain text and must
    report one 'unknown' row (the m26 triage contract). The gzip
    member-per-record variant and truncation windows are pytest-graded
    (python-built fixtures — gzip bytes cannot be codegen'd)."""
    from logverzcore_spark.operators.multimodal import parse_warc_records

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    n = (did % 50 + 10).cast("int")
    crlf = "\r\n"
    rec1 = F.lit(
        "WARC/1.0" + crlf
        + "WARC-Type: warcinfo" + crlf
        + "Content-Length: 18" + crlf + crlf
        + "software: logverz\n" + crlf + crlf
    )
    rec2 = F.concat(
        F.lit("WARC/1.0" + crlf),
        F.lit("WARC-Type: response" + crlf),
        F.lit("WARC-Target-URI: https://ex.com/"),
        did.cast("string"),
        F.lit(crlf + "Content-Length: "),
        n.cast("string"),
        F.lit(crlf + crlf),
        F.repeat(F.lit("x"), n),
        F.lit(crlf + crlf),
    )
    warc = F.encode(F.concat(rec1, rec2), "UTF-8")
    payload = F.when(did % 4 == 3, F.encode("text", "UTF-8")).otherwise(warc)
    return parse_warc_records(docs.select("doc_id", payload.alias("payload")))


@query(
    "m29_warc_http_extract",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN 404 ELSE 200 END AS status,
             '<html><body>page ' || CAST(doc_id AS VARCHAR)
               || '</body></html>' AS body
      FROM documents WHERE doc_id % 4 <> 3
    )
    SELECT doc_id, CAST(2 AS INTEGER) AS rec_idx,
           'https://ex.com/' || CAST(doc_id AS VARCHAR) AS target_uri,
           CAST(status AS INTEGER) AS status,
           'text/html' AS content_type,
           CAST(length(body) AS BIGINT) AS n_body_bytes,
           body AS body_text
    FROM w
    """,
)
def m29_warc_http_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC → HTTP body extraction (multimodal.extract_warc_http): the
    m28 fixture extended so each response block is a REAL HTTP response
    (status line varying 200/404 per doc, Content-Type header, HTML
    body) — the extractor must skip the warcinfo record by length,
    parse the HTTP envelope inside the response block, and return the
    exact body; the oracle restates status/uri/length/body
    arithmetically, so any off-by-one across the WARC and HTTP header
    boundaries breaks the hash. Non-WARC docs (every 4th) produce no
    rows — extraction, not triage."""
    from logverzcore_spark.operators.multimodal import extract_warc_http

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    crlf = "\r\n"
    status = F.when(did % 7 == 0, F.lit("404 Not Found")).otherwise(
        F.lit("200 OK")
    )
    body = F.concat(
        F.lit("<html><body>page "), did.cast("string"), F.lit("</body></html>")
    )
    http = F.concat(
        F.lit("HTTP/1.1 "), status, F.lit(crlf),
        F.lit("Content-Type: text/html" + crlf + crlf),
        body,
    )
    rec1 = F.lit(
        "WARC/1.0" + crlf + "WARC-Type: warcinfo" + crlf
        + "Content-Length: 18" + crlf + crlf
        + "software: logverz\n" + crlf + crlf
    )
    rec2 = F.concat(
        F.lit("WARC/1.0" + crlf + "WARC-Type: response" + crlf),
        F.lit("WARC-Target-URI: https://ex.com/"), did.cast("string"),
        F.lit(crlf + "Content-Length: "), F.length(http).cast("string"),
        F.lit(crlf + crlf), http, F.lit(crlf + crlf),
    )
    payload = F.when(
        did % 4 == 3, F.encode("text", "UTF-8")
    ).otherwise(F.encode(F.concat(rec1, rec2), "UTF-8"))
    return extract_warc_http(docs.select("doc_id", payload.alias("payload")))


#: Shared by m30 (batch cascade) and st36 (the same cascade
#: on-stream): the exhaustive batch replay over everything seen.
_M30_ORACLE = """
    WITH tok AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents WHERE doc_id % 7 <> 0
    ), built AS (
      SELECT doc_id,
             list_transform(range(CAST(((len(t)-1)//6)+1 AS BIGINT)),
                            i -> array_to_string(t[(i*6+1):(i*6+6)], ' ')) AS L
      FROM tok
    ), modl AS (
      SELECT doc_id,
             list_transform(range(CAST(len(L) AS BIGINT)), i ->
               (CASE WHEN (doc_id*7 + i) % 11 = 0 THEN 'javascript ' ELSE '' END)
               || L[CAST(i+1 AS BIGINT)]
               || (CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END)) AS L2
      FROM built
    ), page AS (
      SELECT doc_id,
             CASE WHEN doc_id % 6 = 5
                  THEN 'please accept our cookie policy before reading. '
                       || 'this site uses tracking pixels on every page. '
                       || 'subscribe to the newsletter for weekly updates.'
                  ELSE array_to_string(L2, ' ') END AS pg
      FROM modl
    ), html AS (
      SELECT doc_id,
             '<html><head><script>var tracker = 1;</script><style>.m{margin:0}'
             || '</style></head><body class="m"><h1>Crawl</h1><p>' || pg
             || ' Offered cafe' || chr(769)
             || ' &amp; more today here.</p><!-- crawl --></body></html>' AS t
      FROM page
    ), h1 AS (
      SELECT doc_id, regexp_replace(t, '(?s)<!--.*?-->', ' ', 'g') AS t FROM html
    ), h2 AS (
      SELECT doc_id,
             regexp_replace(t, '(?is)<script\\b[^>]*>.*?</script>', ' ', 'g') AS t
      FROM h1
    ), h3 AS (
      SELECT doc_id,
             regexp_replace(t, '(?is)<style\\b[^>]*>.*?</style>', ' ', 'g') AS t
      FROM h2
    ), h4 AS (
      SELECT doc_id, regexp_replace(t, '(?s)<[^>]+>', ' ', 'g') AS t FROM h3
    ), h5 AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(regexp_replace(t,
               '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
               '&#39;', chr(39), 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g')
             AS t
      FROM h4
    ), stripped AS (
      SELECT doc_id, trim(regexp_replace(t, '\\s+', ' ', 'g')) AS t FROM h5
    ), nfc AS (
      SELECT doc_id, nfc_normalize(t) AS t FROM stripped
    ), scrub AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(
               regexp_replace(regexp_replace(t, '[​‌‍⁠﻿­]', '', 'g'),
                 '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x{80}-\\x{9F}]', '', 'g'),
               '[   -   　]', ' ', 'g'), '\\s+', ' ', 'g')) AS t
      FROM nfc
    ), lined AS (
      SELECT doc_id,
             regexp_replace(t, '([.!?]) ', '\\1' || chr(10), 'g') AS t
      FROM scrub
    ), f AS (
      SELECT doc_id, string_split(t, chr(10)) AS lns,
             (contains(lower(t), 'lorem ipsum') OR contains(t, '{')) AS page_bad
      FROM lined
    ), k AS (
      SELECT doc_id, page_bad,
             list_filter(lns, l -> regexp_matches(l, '[.!?"]$')
               AND len(list_filter(regexp_split_to_array(l, '\\s+'),
                                   x -> x <> '')) >= 5
               AND NOT contains(lower(l), 'javascript')) AS kept
      FROM f
    ), keptd AS (
      SELECT doc_id, array_to_string(kept, chr(10)) AS t
      FROM k WHERE NOT page_bad AND len(kept) >= 3
    ), fps AS (
      SELECT doc_id, t,
             md5(regexp_replace(lower(trim(t)), '\\s+', ' ', 'g')) AS f
      FROM keptd
    ), ranked AS (
      SELECT doc_id, t,
             row_number() OVER (PARTITION BY f ORDER BY doc_id) AS rn
      FROM fps
    )
    SELECT doc_id, md5(t) AS fp, CAST(length(t) AS BIGINT) AS n_chars
    FROM ranked WHERE rn = 1
    """


@query("m30_crawl_curate_e2e", oracle=_M30_ORACLE)
def m30_crawl_curate_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full crawl→curated-corpus story in ONE lazy cascade (r7
    VERDICT task 5 — the m29 payoff): WARC container → HTTP extraction
    (m29, 404s dropped) → HTML boilerplate strip (t33) → unicode
    scrub/NFC (t31) → sentence re-lining → C4 line/page rules (t52) →
    exact dedup keep-first (d01) — pipeline.curate's discipline with a
    real container at the head. The fixture is m29's WARC/HTTP
    arithmetic carrying sentence-structured HTML pages (t52's
    enrichment grammar: 6-token lines, 2/3 punctuated, planted
    javascript lines) plus a shared cookie-boilerplate body on every
    6th doc — the dedup mass the keep-first collapses; a decomposed
    cafe+combining-acute and an &amp; entity make the NFC and decode
    stages load-bearing. The oracle restates the extracted body
    arithmetically (the WARC/HTTP byte math is m28/m29's own
    hash-verified ground) and replays strip → NFC/scrub → re-line → C4
    → fingerprint keep-first in one SQL. Plan gate
    (test_plan_quality): ZERO exchange until the dedup window — one
    Arrow mapInPandas walk (the container bytes), then codegen
    projections all the way to the fingerprint shuffle.

    100 TB shape: per-row container walk + per-row projections scale
    with bytes scanned; the single shuffle is the dedup's fingerprint
    hash partition — the minimum any cross-doc dedup needs."""
    from logverzcore_spark.operators import dedup
    from logverzcore_spark.pipeline import crawl_curate

    docs = _t(spark, sf_dir, "documents")
    kept = crawl_curate(_m30_warc_payload(docs))
    final = dedup.dedup_keep_first(kept)
    return final.select(
        "doc_id",
        F.md5("text").alias("fp"),
        F.length("text").cast("long").alias("n_chars"),
    )
def _m30_warc_payload(docs) -> "DataFrame":
    """m30/st36's shared crawl FIXTURE: each documents row becomes a
    two-record WARC (warcinfo + response) whose HTTP body is a
    sentence-structured HTML page (t52's enrichment grammar: 6-token
    lines, 2/3 punctuated, planted javascript lines), every 6th doc a
    shared cookie-boilerplate body (the dedup mass), every 7th a 404,
    plus a decomposed cafe+combining-acute and an &amp; entity so the
    NFC and entity-decode stages are load-bearing. Pure projections —
    valid on batch AND streaming frames, which is how st36 streams the
    byte-identical corpus m30 grades in batch. Returns (doc_id,
    payload)."""
    did = F.col("doc_id")
    crlf = "\r\n"
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    n = F.size(toks)
    lines = F.transform(
        F.sequence(F.lit(0), ((n - 1) / 6).cast("int")),
        lambda i: F.concat_ws(" ", F.slice(toks, i * 6 + 1, 6)),
    )
    l2 = F.transform(
        lines,
        lambda l, i: F.concat(
            F.when((did * 7 + i) % 11 == 0, F.lit("javascript ")).otherwise(
                F.lit("")
            ),
            l,
            F.when((did + i) % 3 != 0, F.lit(".")).otherwise(F.lit("")),
        ),
    )
    boiler = (
        "please accept our cookie policy before reading. "
        "this site uses tracking pixels on every page. "
        "subscribe to the newsletter for weekly updates."
    )
    page = F.when(did % 6 == 5, F.lit(boiler)).otherwise(F.array_join(l2, " "))
    html = F.concat(
        F.lit(
            "<html><head><script>var tracker = 1;</script><style>.m{margin:0}"
            '</style></head><body class="m"><h1>Crawl</h1><p>'
        ),
        page,
        F.lit(
            " Offered café &amp; more today here.</p>"
            "<!-- crawl --></body></html>"
        ),
    )
    status = F.when(did % 7 == 0, F.lit("404 Not Found")).otherwise(
        F.lit("200 OK")
    )
    http = F.concat(
        F.lit("HTTP/1.1 "), status, F.lit(crlf),
        F.lit("Content-Type: text/html" + crlf + crlf), html,
    )
    rec1 = F.lit(
        "WARC/1.0" + crlf + "WARC-Type: warcinfo" + crlf
        + "Content-Length: 18" + crlf + crlf
        + "software: logverz\n" + crlf + crlf
    )
    rec2 = F.concat(
        F.lit("WARC/1.0" + crlf + "WARC-Type: response" + crlf),
        F.lit("WARC-Target-URI: https://crawl.example/"), did.cast("string"),
        # Content-Length is BYTES: the body carries a 2-byte combining
        # acute, so octet_length, never length.
        F.lit(crlf + "Content-Length: "),
        F.octet_length(http).cast("string"),
        F.lit(crlf + crlf), http, F.lit(crlf + crlf),
    )
    payload = F.encode(F.concat(rec1, rec2), "UTF-8")
    return docs.select("doc_id", payload.alias("payload"))


@query(
    "m31_webdataset_roundtrip",
    oracle="""
    WITH s AS (
      SELECT doc_id, text,
             CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 8 AS shard
      FROM documents
    ), r AS (
      SELECT doc_id, text, shard,
             row_number() OVER (PARTITION BY shard ORDER BY doc_id) - 1 AS rk
      FROM s
    )
    SELECT CAST(shard AS INTEGER) AS shard,
           CAST(2 * rk AS INTEGER) AS entry_idx,
           CAST(doc_id AS VARCHAR) || '.txt' AS name,
           CAST(octet_length(encode(text)) AS BIGINT) AS size
    FROM r
    UNION ALL
    SELECT CAST(shard AS INTEGER), CAST(2 * rk + 1 AS INTEGER),
           CAST(doc_id AS VARCHAR) || '.json',
           CAST(octet_length(encode('{"id": ' || doc_id || ', "n": '
                || octet_length(encode(text)) || '}')) AS BIGINT)
    FROM r
    """,
)
def m31_webdataset_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset tar-shard round trip: export.export_webdataset_shards
    writes the corpus as 8 deterministic USTAR shards (md5 shard
    assignment, key-ordered members, pinned header fields — byte-
    reproducible files), and the EXISTING tar lister
    (multimodal.parse_tar_entries, m22) reads the shard bytes back —
    member order, names, and sizes must restate arithmetically from
    doc_id/text alone. The write is executor-parallel (one
    applyInPandas group per shard after a single shard-key exchange);
    the read is the binaryFile scan feeding the Arrow block walk. One
    operator verifies the other — the m29→m30 discipline applied to
    the training-loader interchange format."""
    import tempfile
    import uuid as _uuid

    from logverzcore_spark import export
    from logverzcore_spark.operators.multimodal import parse_tar_entries

    docs = _t(spark, sf_dir, "documents")
    out_dir = os.path.join(
        tempfile.gettempdir(), f"wds_{_uuid.uuid4().hex[:8]}"
    )
    export.export_webdataset_shards(
        docs.select("doc_id", "text"), out_dir, n_shards=8
    ).count()  # materialize the write
    tars = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(out_dir)
        .select(
            F.regexp_extract(F.col("path"), r"shard-(\d+)\.tar", 1)
            .cast("int")
            .alias("shard"),
            F.col("content").alias("payload"),
        )
    )
    return parse_tar_entries(tars, id_col="shard").select(
        "shard", "entry_idx", "name", "size"
    )
