"""Multimodal-column queries (SURVEY.md §2.3): binary payload +
metadata projection, and the Arrow-batched feature-extraction pipeline
(deterministic fake kernel — the codecs aren't in the container, the
Spark plumbing is real).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.operators.multimodal import (
    attach_binary,
    extract_features,
)
from aether_firebase_consumer_spark.plans import register
from aether_firebase_consumer_spark.tables import fan_out_for_compute, load_table


@register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           encode(text) AS payload,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           'application/octet-stream' AS mime,
           'mem://doc/' || CAST(doc_id AS VARCHAR) AS source_uri
    FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary column + typed metadata struct — the multimodal
    storage pattern (blob stays columnar; metadata queryable without
    touching bytes thanks to parquet column pruning)."""
    docs = load_table(spark, sf_dir, "documents")
    out = attach_binary(docs)
    return out.select(
        "doc_id", "payload",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.mime").alias("mime"),
        F.col("media_meta.source_uri").alias("source_uri"),
    )


@register(
    "multimodal_feature_extract",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           ascii(substr(text, 1, 1)) AS first_byte,
           md5(text) AS content_md5
    FROM documents
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow batch
    in/out — the decode-kernel distribution path, with a deterministic
    fake kernel standing in for the absent codecs)."""
    docs = fan_out_for_compute(load_table(spark, sf_dir, "documents"))
    return extract_features(attach_binary(docs))


@register(
    "multimodal_resize",
    oracle="""
    -- fixture text is pure ASCII (verified), so char slicing == byte
    -- slicing and substring-then-encode equals the kernel's byte clamp
    SELECT doc_id, 8 AS width, 8 AS height,
           encode(substring(text, 1, 64)) AS payload
    FROM documents
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pipeline (1→1 Arrow transform): bounded per-row output —
    the oracle mirrors the deterministic fake kernel (byte-budget clamp)
    so the Spark-side plumbing is value-checked end to end."""
    from aether_firebase_consumer_spark.operators.multimodal import (
        resize_images,
    )
    docs = fan_out_for_compute(load_table(spark, sf_dir, "documents"))
    return resize_images(attach_binary(docs), target_w=8, target_h=8)


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id, CAST(i AS INT) AS frame_idx,
           encode(substring(text, i * 64 + 1, 64)) AS frame
    FROM documents,
         unnest(range(0, greatest(octet_length(encode(text)) // 64, 1), 2))
           AS t(i)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (1→N Arrow flatMap): every blob fans out to its
    every-2nd 64-byte chunk — row-multiplying Python stage, oracle-
    mirrored with a lateral range unnest."""
    from aether_firebase_consumer_spark.operators.multimodal import (
        sample_frames,
    )
    docs = fan_out_for_compute(load_table(spark, sf_dir, "documents"))
    return sample_frames(attach_binary(docs), frame_bytes=64, every_n=2)


@register(
    "multimodal_ppm_decode_stats",
    oracle="""
    WITH px AS (
      SELECT doc_id,
             md5(text) || substr(md5(text), 1, 16) AS hex48
      FROM documents
    ),
    chans AS (
      SELECT doc_id,
             list_transform(generate_series(0, 15),
                            i -> ascii(substr(hex48, i*3 + 1, 1))) AS r,
             list_transform(generate_series(0, 15),
                            i -> ascii(substr(hex48, i*3 + 2, 1))) AS g,
             list_transform(generate_series(0, 15),
                            i -> ascii(substr(hex48, i*3 + 3, 1))) AS b
      FROM px
    )
    SELECT doc_id, 4 AS width, 4 AS height,
           CAST(list_sum(r) AS DOUBLE) / 16 AS avg_r,
           CAST(list_sum(g) AS DOUBLE) / 16 AS avg_g,
           CAST(list_sum(b) AS DOUBLE) / 16 AS avg_b
    FROM chans
    """,
)
def multimodal_ppm_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode inside an oracle-gated query: every document
    gets a deterministic 4x4 PPM payload (pixel bytes = 48 hex chars
    of md5(text), so the oracle can recompute them arithmetically),
    and the Arrow kernel runs the engine's native ``decode_ppm`` on
    the actual bytes — header parse, body extraction, per-channel
    means over the decoded pixels. The decode path under test is the
    one a real image corpus would take; only the payload synthesis is
    fixture-deterministic. No shuffle; kernel parallelism = scan
    parallelism."""
    import pandas as pd
    from typing import Iterator

    from aether_firebase_consumer_spark.operators.multimodal import (
        decode_ppm,
    )
    docs = fan_out_for_compute(load_table(spark, sf_dir, "documents"))
    hex48 = F.concat(F.md5("text"), F.substring(F.md5("text"), 1, 16))
    with_payload = docs.select(
        "doc_id",
        F.concat(F.lit(b"P6\n4 4\n255\n"),
                 F.encode(hex48, "UTF-8")).alias("payload"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, raw = decode_ppm(bytes(payload))
                n = w * h
                out.append((int(doc_id), w, h,
                            sum(raw[0::3]) / n,
                            sum(raw[1::3]) / n,
                            sum(raw[2::3]) / n))
            yield pd.DataFrame(out, columns=[
                "doc_id", "width", "height", "avg_r", "avg_g", "avg_b"])

    return with_payload.mapInPandas(
        kernel,
        "doc_id bigint, width int, height int, "
        "avg_r double, avg_g double, avg_b double")


#: Constant 44-byte RIFF/WAVE header for 16 mono int16 frames @ 8 kHz
#: (chunk sizes precomputed — the payload below always carries exactly
#: 16 samples).
_WAV16_HEADER = bytes.fromhex(
    "524946464400000057415645666d7420100000000100010040"
    "1f0000803e0000020010006461746120000000")


@register(
    "multimodal_wav_decode_stats",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             list_transform(generate_series(1, 16),
                            i -> ascii(substr(md5(text), i, 1))) AS amp
      FROM documents
    )
    SELECT doc_id, 8000 AS rate, 1 AS channels, 16 AS n_frames,
           CAST(list_sum(amp) AS DOUBLE) / 16 AS mean_amp,
           CAST(list_max(amp) AS INT) AS max_amp
    FROM s
    """,
)
def multimodal_wav_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode inside an oracle-gated query: every document
    gets a deterministic 16-frame PCM WAV (sample values = ascii codes
    of md5(text) hex chars, little-endian int16 with zero high byte,
    so the oracle recomputes them arithmetically); the Arrow kernel
    runs the stdlib-``wave``-backed ``decode_wav`` on the actual RIFF
    bytes and reduces the decoded frames to amplitude stats. No
    shuffle; kernel parallelism = scan parallelism."""
    import pandas as pd
    import struct as _struct
    from typing import Iterator

    from aether_firebase_consumer_spark.operators.multimodal import (
        decode_wav,
    )
    docs = fan_out_for_compute(load_table(spark, sf_dir, "documents"))
    # body: 16 little-endian int16 samples (hex-char byte, 0 high byte)
    body_parts = []
    for i in range(1, 17):
        body_parts.append(F.encode(F.substring(F.md5("text"), i, 1), "UTF-8"))
        body_parts.append(F.lit(b"\x00"))
    with_payload = docs.select(
        "doc_id",
        F.concat(F.lit(_WAV16_HEADER), *body_parts).alias("payload"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, ch, n, raw = decode_wav(bytes(payload))
                amps = _struct.unpack(f"<{n}h", raw)
                out.append((int(doc_id), rate, ch, n,
                            sum(amps) / n, max(amps)))
            yield pd.DataFrame(out, columns=[
                "doc_id", "rate", "channels", "n_frames",
                "mean_amp", "max_amp"])

    return with_payload.mapInPandas(
        kernel,
        "doc_id bigint, rate int, channels int, n_frames int, "
        "mean_amp double, max_amp int")


@register(
    "multimodal_frame_sample_stats",
    oracle="""
    WITH f AS (
      SELECT doc_id, frame_idx,
             list_transform(generate_series(1, 12),
                            i -> ascii(substr(md5(text) ||
                                              substr(md5(text), 1, 16),
                                              frame_idx * 12 + i, 1)))
               AS px
      FROM documents,
           (SELECT unnest([0, 2]) AS frame_idx)
    )
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           2 AS width, 2 AS height,
           CAST(list_sum(px) AS DOUBLE) / 12 AS mean_byte
    FROM f
    """,
)
def multimodal_frame_sample_stats(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """REAL video-style frame sampling inside an oracle-gated query:
    each document gets a deterministic 3-frame concatenated-PPM stream
    (2x2 frames, pixel bytes = md5 hex chars at per-frame offsets);
    the Arrow kernel runs the native ``frame_sample(every_n=2)`` on
    the actual bytes — stream walk, per-frame header parse — keeping
    frames 0 and 2, and reduces each sampled frame to its mean byte.
    1-to-N fan-out with no shuffle."""
    import pandas as pd
    from typing import Iterator

    from aether_firebase_consumer_spark.operators.multimodal import (
        frame_sample,
    )
    docs = fan_out_for_compute(load_table(spark, sf_dir, "documents"))
    hex48 = F.concat(F.md5("text"), F.substring(F.md5("text"), 1, 16))
    parts = []
    for fr in range(3):
        parts.append(F.lit(b"P6\n2 2\n255\n"))
        parts.append(F.encode(
            F.substring(hex48, fr * 12 + 1, 12), "UTF-8"))
    with_payload = docs.select(
        "doc_id", F.concat(*parts).alias("payload"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for k, (w, h, raw) in enumerate(
                        frame_sample(bytes(payload), every_n=2)):
                    out.append((int(doc_id), k * 2, w, h,
                                sum(raw) / len(raw)))
            yield pd.DataFrame(out, columns=[
                "doc_id", "frame_idx", "width", "height", "mean_byte"])

    return with_payload.mapInPandas(
        kernel,
        "doc_id bigint, frame_idx int, width int, height int, "
        "mean_byte double")


@register(
    "multimodal_png_decode_stats",
    oracle="""
    WITH px AS (
      SELECT doc_id, md5(text) AS hx FROM documents
    )
    SELECT doc_id, 2 AS width, 2 AS height, 3 AS channels,
           CAST(ascii(substr(hx, 1, 1)) + ascii(substr(hx, 4, 1))
              + ascii(substr(hx, 7, 1)) + ascii(substr(hx, 10, 1))
              AS DOUBLE) / 4 AS avg_r,
           CAST(ascii(substr(hx, 2, 1)) + ascii(substr(hx, 5, 1))
              + ascii(substr(hx, 8, 1)) + ascii(substr(hx, 11, 1))
              AS DOUBLE) / 4 AS avg_g,
           CAST(ascii(substr(hx, 3, 1)) + ascii(substr(hx, 6, 1))
              + ascii(substr(hx, 9, 1)) + ascii(substr(hx, 12, 1))
              AS DOUBLE) / 4 AS avg_b
    FROM px
    """,
)
def multimodal_png_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG encode+decode inside an oracle-gated query: each
    document's 2x2 RGB pixels are the first 12 md5(text) hex-char
    bytes; the Arrow kernel runs the engine's pure-Python
    ``encode_png`` (scanline filter varies per row, doc_id % 5, so all
    five PNG filters are exercised against real zlib streams) then
    ``decode_png`` — signature, chunk CRCs, inflate, per-row unfilter —
    and reduces the decoded pixels to channel means the oracle
    recomputes arithmetically. No shuffle; parallelism = scan splits.
    Codec: operators/image_codecs.py (PNG spec, RFC 2083)."""
    import pandas as pd
    from typing import Iterator

    from aether_firebase_consumer_spark.operators.image_codecs import (
        decode_png,
        encode_png,
    )
    docs = fan_out_for_compute(load_table(spark, sf_dir, "documents"))
    with_pixels = docs.select(
        "doc_id",
        F.encode(F.substring(F.md5("text"), 1, 12), "UTF-8").alias("pixels"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, pixels in zip(pdf["doc_id"], pdf["pixels"]):
                png = encode_png(2, 2, bytes(pixels),
                                 filter_type=int(doc_id) % 5)
                w, h, ch, raw = decode_png(png)
                n = w * h
                out.append((int(doc_id), w, h, ch,
                            sum(raw[0::3]) / n,
                            sum(raw[1::3]) / n,
                            sum(raw[2::3]) / n))
            yield pd.DataFrame(out, columns=[
                "doc_id", "width", "height", "channels",
                "avg_r", "avg_g", "avg_b"])

    return with_pixels.mapInPandas(
        kernel,
        "doc_id bigint, width int, height int, channels int, "
        "avg_r double, avg_g double, avg_b double")


@register(
    "multimodal_bmp_decode_stats",
    oracle="""
    WITH px AS (
      SELECT doc_id, md5(text) AS hx FROM documents
    )
    SELECT doc_id, 2 AS width, 2 AS height,
           CAST(ascii(substr(hx, 13, 1)) + ascii(substr(hx, 16, 1))
              + ascii(substr(hx, 19, 1)) + ascii(substr(hx, 22, 1))
              AS DOUBLE) / 4 AS avg_r,
           CAST(ascii(substr(hx, 14, 1)) + ascii(substr(hx, 17, 1))
              + ascii(substr(hx, 20, 1)) + ascii(substr(hx, 23, 1))
              AS DOUBLE) / 4 AS avg_g,
           CAST(ascii(substr(hx, 15, 1)) + ascii(substr(hx, 18, 1))
              + ascii(substr(hx, 21, 1)) + ascii(substr(hx, 24, 1))
              AS DOUBLE) / 4 AS avg_b
    FROM px
    """,
)
def multimodal_bmp_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BMP encode+decode inside an oracle-gated query: 2x2 RGB
    pixels from md5(text) hex chars 13-24; the Arrow kernel runs the
    engine's ``encode_bmp`` (bottom-up rows, BGR order, 4-byte pad)
    then ``decode_bmp`` and reduces to channel means. The row-order and
    channel-swap inversions are exactly what the oracle's arithmetic
    would catch if wrong. Codec: operators/image_codecs.py."""
    import pandas as pd
    from typing import Iterator

    from aether_firebase_consumer_spark.operators.image_codecs import (
        decode_bmp,
        encode_bmp,
    )
    docs = fan_out_for_compute(load_table(spark, sf_dir, "documents"))
    with_pixels = docs.select(
        "doc_id",
        F.encode(F.substring(F.md5("text"), 13, 12), "UTF-8").alias("pixels"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, pixels in zip(pdf["doc_id"], pdf["pixels"]):
                bmp = encode_bmp(2, 2, bytes(pixels))
                w, h, raw = decode_bmp(bmp)
                n = w * h
                out.append((int(doc_id), w, h,
                            sum(raw[0::3]) / n,
                            sum(raw[1::3]) / n,
                            sum(raw[2::3]) / n))
            yield pd.DataFrame(out, columns=[
                "doc_id", "width", "height", "avg_r", "avg_g", "avg_b"])

    return with_pixels.mapInPandas(
        kernel,
        "doc_id bigint, width int, height int, "
        "avg_r double, avg_g double, avg_b double")


@register(
    "multimodal_gif_decode_stats",
    oracle="""
    WITH px AS (
      SELECT doc_id,
             list_transform(generate_series(1, 16),
               i -> ascii(substr(md5(text), i, 1)) % 4) AS idx
      FROM documents
    )
    SELECT doc_id, 4 AS width, 4 AS height,
           CAST(list_sum(list_transform(idx,
                i -> CASE i WHEN 0 THEN 255 WHEN 1 THEN 0
                            WHEN 2 THEN 0 ELSE 9 END)) AS BIGINT) AS sum_r,
           CAST(list_sum(list_transform(idx,
                i -> CASE i WHEN 0 THEN 0 WHEN 1 THEN 255
                            WHEN 2 THEN 0 ELSE 8 END)) AS BIGINT) AS sum_g,
           CAST(len(list_filter(idx, i -> i = 3)) AS BIGINT) AS n_pal3
    FROM px
    """,
)
def multimodal_gif_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF encode+decode inside an oracle-gated query: each
    document gets a 4x4 palette-indexed frame (palette positions =
    md5 hex-char codes mod 4), the Arrow kernel runs the engine's
    ``encode_gif`` (real LZW with dictionary growth) then
    ``decode_gif`` (variable-width LZW, block walk, palette lookup)
    and reduces decoded pixels to channel sums the oracle recomputes
    from the palette arithmetic. Third native image codec after
    PNG/BMP; same no-shuffle scan-parallel kernel shape."""
    import pandas as pd
    from typing import Iterator

    from aether_firebase_consumer_spark.operators.image_codecs import (
        decode_gif,
        encode_gif,
    )
    docs = fan_out_for_compute(load_table(spark, sf_dir, "documents"))
    with_hex = docs.select("doc_id", F.md5("text").alias("hx"))
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 8, 7])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, hx in zip(pdf["doc_id"], pdf["hx"]):
                idx = [ord(c) % 4 for c in hx[:16]]
                gif = encode_gif(4, 4, palette, idx)
                w, h, rgb = decode_gif(gif)
                out.append((int(doc_id), w, h,
                            sum(rgb[0::3]), sum(rgb[1::3]),
                            sum(1 for i in range(0, len(rgb), 3)
                                if rgb[i:i + 3] == b"\x09\x08\x07")))
            yield pd.DataFrame(out, columns=[
                "doc_id", "width", "height", "sum_r", "sum_g", "n_pal3"])

    return with_hex.mapInPandas(
        kernel,
        "doc_id bigint, width int, height int, "
        "sum_r bigint, sum_g bigint, n_pal3 bigint")


@register(
    "multimodal_jpeg_decode_stats",
    oracle="""
    WITH v AS (
      SELECT doc_id,
             ascii(substr(md5(text), 1, 1)) * 2 AS v1,
             ascii(substr(md5(text), 2, 1)) * 2 AS v2
      FROM documents
    )
    SELECT doc_id, 16 AS width, 8 AS height,
           CAST((v1 + v2) * 64 AS BIGINT) AS sum_px,
           CAST(least(v1, v2) AS INT) AS min_px,
           CAST(greatest(v1, v2) AS INT) AS max_px
    FROM v
    """,
)
def multimodal_jpeg_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG encode+decode inside an oracle-gated query: each
    document gets a 16x8 grayscale image of two flat 8x8 blocks
    (values = md5 hex-char codes x2, so DC DIFFERENCE coding between
    blocks — incl. negative diffs — is exercised); the Arrow kernel
    runs the engine's baseline JPEG codec (``operators/jpeg_codec.py``:
    Annex-K Huffman tables, real DCT, bitstream stuffing) end to end.
    Flat blocks are DC-only, so the lossy pipeline is bit-exact here
    and the oracle recomputes pixel stats arithmetically; non-flat
    content is PSNR-bounded in ``tests/test_jpeg_codec.py``. Fourth
    native image codec (PPM/PNG/BMP/GIF/JPEG); same no-shuffle
    scan-parallel kernel shape."""
    import pandas as pd
    from typing import Iterator

    from aether_firebase_consumer_spark.operators.jpeg_codec import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )
    docs = fan_out_for_compute(load_table(spark, sf_dir, "documents"))
    with_hex = docs.select("doc_id", F.md5("text").alias("hx"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, hx in zip(pdf["doc_id"], pdf["hx"]):
                v1, v2 = ord(hx[0]) * 2, ord(hx[1]) * 2
                px = bytearray(16 * 8)
                for y in range(8):
                    for x in range(16):
                        px[y * 16 + x] = v1 if x < 8 else v2
                jpg = encode_jpeg_gray(16, 8, bytes(px))
                w, h, raw = decode_jpeg_gray(jpg)
                out.append((int(doc_id), w, h,
                            sum(raw), min(raw), max(raw)))
            yield pd.DataFrame(out, columns=[
                "doc_id", "width", "height", "sum_px", "min_px", "max_px"])

    return with_hex.mapInPandas(
        kernel,
        "doc_id bigint, width int, height int, "
        "sum_px bigint, min_px int, max_px int")


@register(
    "multimodal_jpeg_color_stats",
    oracle="""
    WITH c AS (
      SELECT doc_id,
             ascii(substr(md5(text), 1, 1)) * 2 AS r,
             ascii(substr(md5(text), 2, 1)) * 2 AS g,
             ascii(substr(md5(text), 3, 1)) * 2 AS b
      FROM documents
    ),
    ycc AS (
      -- every literal cast to DOUBLE: DuckDB's bare decimals run exact
      -- DECIMAL math, which can flip floor() vs the kernel's IEEE
      -- doubles near integer boundaries
      SELECT doc_id, r, g, b,
             floor(0.299::DOUBLE * r + 0.587::DOUBLE * g
                   + 0.114::DOUBLE * b + 0.5::DOUBLE) AS y,
             floor(128 - 0.168736::DOUBLE * r - 0.331264::DOUBLE * g
                   + 0.5::DOUBLE * b + 0.5::DOUBLE) AS cb,
             floor(128 + 0.5::DOUBLE * r - 0.418688::DOUBLE * g
                   - 0.081312::DOUBLE * b + 0.5::DOUBLE) AS cr
      FROM c
    )
    SELECT doc_id, 8 AS width, 8 AS height, 3 AS channels,
           CAST(greatest(0, least(255,
                floor(y + 1.402::DOUBLE * (cr - 128) + 0.5::DOUBLE)))
                AS INT) AS r_out,
           CAST(greatest(0, least(255,
                floor(y - 0.344136::DOUBLE * (cb - 128)
                        - 0.714136::DOUBLE * (cr - 128) + 0.5::DOUBLE)))
                AS INT) AS g_out,
           CAST(greatest(0, least(255,
                floor(y + 1.772::DOUBLE * (cb - 128) + 0.5::DOUBLE)))
                AS INT) AS b_out
    FROM ycc
    """,
)
def multimodal_jpeg_color_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL color-JPEG encode+decode inside an oracle-gated query:
    each document gets a flat-color 8x8 RGB image (channels =
    md5-derived), and the kernel runs the full baseline color pipeline
    — JFIF YCbCr forward transform, three interleaved DC-only
    components through real Huffman streams, inverse transform with
    clamping. Flat color makes every DCT stage exact, so the oracle
    reproduces the decoded RGB purely from the JFIF arithmetic
    (floor(+0.5) convention on both engines — Spark round/DuckDB
    round never enter). Codec: operators/jpeg_codec.py."""
    import pandas as pd
    from typing import Iterator

    from aether_firebase_consumer_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_rgb,
    )
    docs = fan_out_for_compute(load_table(spark, sf_dir, "documents"))
    with_hex = docs.select("doc_id", F.md5("text").alias("hx"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, hx in zip(pdf["doc_id"], pdf["hx"]):
                rgb = bytes([ord(hx[0]) * 2, ord(hx[1]) * 2,
                             ord(hx[2]) * 2] * 64)
                w, h, n, raw = decode_jpeg(encode_jpeg_rgb(8, 8, rgb))
                assert raw[:3] * 64 == raw  # flat in, flat out
                out.append((int(doc_id), w, h, n,
                            raw[0], raw[1], raw[2]))
            yield pd.DataFrame(out, columns=[
                "doc_id", "width", "height", "channels",
                "r_out", "g_out", "b_out"])

    return with_hex.mapInPandas(
        kernel,
        "doc_id bigint, width int, height int, channels int, "
        "r_out int, g_out int, b_out int")


@register(
    "multimodal_tiff_compressed_stats",
    oracle="""
    WITH px AS (
      SELECT doc_id, md5(text) AS hx FROM documents
    )
    SELECT doc_id, 4 AS width, 2 AS height,
           CASE doc_id % 3 WHEN 0 THEN 'lzw' WHEN 1 THEN 'deflate'
                ELSE 'packbits' END AS compression,
           CAST(1 + doc_id % 2 AS INT) AS predictor,
           CAST(ascii(substr(hx, 17, 1)) + ascii(substr(hx, 18, 1))
              + ascii(substr(hx, 19, 1)) + ascii(substr(hx, 20, 1))
              + ascii(substr(hx, 21, 1)) + ascii(substr(hx, 22, 1))
              + ascii(substr(hx, 23, 1)) + ascii(substr(hx, 24, 1))
              AS DOUBLE) / 8 AS avg_v
    FROM px
    """,
)
def multimodal_tiff_compressed_stats(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """REAL compressed-TIFF encode+decode inside an oracle-gated
    query: each document's 4x2 grayscale pixels are md5(text) hex
    chars 17-24; the Arrow kernel encodes with a per-row-varying
    compression (doc_id % 3 → LZW / Deflate / PackBits) and predictor
    (doc_id % 2 → none / horizontal differencing), decodes through
    the strip-decompress + predictor-accumulate path, and reduces to
    a mean the oracle recomputes arithmetically — so all three
    compressors, both predictors, and their IFD tags are exercised
    under the value-hash gate. Codec: operators/image_codecs.py
    (TIFF 6.0 spec: early-change LZW, tag-8 Deflate, PackBits,
    predictor tag 317)."""
    import pandas as pd
    from typing import Iterator

    from aether_firebase_consumer_spark.operators.image_codecs import (
        decode_tiff,
        encode_tiff,
    )
    docs = fan_out_for_compute(load_table(spark, sf_dir, "documents"))
    with_pixels = docs.select(
        "doc_id",
        F.encode(F.substring(F.md5("text"), 17, 8), "UTF-8").alias("pixels"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        comps = ("lzw", "deflate", "packbits")
        for pdf in batches:
            out = []
            for doc_id, pixels in zip(pdf["doc_id"], pdf["pixels"]):
                comp = comps[int(doc_id) % 3]
                pred = 1 + int(doc_id) % 2
                tif = encode_tiff(4, 2, bytes(pixels), channels=1,
                                  compression=comp, predictor=pred)
                w, h, ch, raw = decode_tiff(tif)
                assert ch == 1
                out.append((int(doc_id), w, h, comp, pred,
                            sum(raw) / (w * h)))
            yield pd.DataFrame(out, columns=[
                "doc_id", "width", "height", "compression", "predictor",
                "avg_v"])

    return with_pixels.mapInPandas(
        kernel,
        "doc_id bigint, width int, height int, compression string, "
        "predictor int, avg_v double")


@register(
    "multimodal_wav_adpcm_stats",
    oracle="""
    WITH v AS (
      SELECT doc_id,
             ('0x' || substr(md5(text), 1, 4))::BIGINT - 32768 AS v0,
             ('0x' || substr(md5(text), 5, 4))::BIGINT - 32768 AS v1
      FROM documents
    )
    SELECT doc_id, 8000 AS rate,
           CAST(1 + doc_id % 2 AS INT) AS channels,
           25 AS n_frames,
           CAST(v0 AS INT) AS v0_out,
           CAST(CASE WHEN doc_id % 2 = 1 THEN v1 END AS INT) AS v1_out
    FROM v
    """,
)
def multimodal_wav_adpcm_stats(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """REAL IMA-ADPCM encode+decode inside an oracle-gated query
    (round 7 — restores the repo convention that every codec path
    carries an oracle, like PCM WAV and compressed TIFF): each
    document becomes a 25-frame mono-or-stereo constant signal whose
    per-channel int16 values are md5-derived. Constant input is the
    codec's EXACT point — the cold-start quantizer picks step index 0
    (delta 0), so every nibble decodes diff 0 and reconstruction is
    bit-perfect — which lets the oracle predict the decoded samples
    arithmetically despite the codec being lossy in general. The
    9-samples-per-block layout forces multi-block files with a padded
    tail, so the fact-chunk frame trim (n_frames = 25, not 27) is
    under the value-hash gate too. Codec: operators/multimodal.py
    (decode_wav_ima_adpcm / encode_wav_ima_adpcm)."""
    import pandas as pd
    from typing import Iterator

    from aether_firebase_consumer_spark.operators.multimodal import (
        decode_wav_ima_adpcm,
        encode_wav_ima_adpcm,
    )
    docs = fan_out_for_compute(load_table(spark, sf_dir, "documents"))
    with_hex = docs.select("doc_id", F.md5("text").alias("hx"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, hx in zip(pdf["doc_id"], pdf["hx"]):
                v0 = int(hx[0:4], 16) - 32768
                v1 = int(hx[4:8], 16) - 32768
                ch = 1 + int(doc_id) % 2
                frames = [v0] * 25 if ch == 1 else [v0, v1] * 25
                wav = encode_wav_ima_adpcm(8000, ch, frames,
                                           samples_per_block=9)
                rate, ch2, n, got = decode_wav_ima_adpcm(wav)
                assert got == frames        # constant in, constant out
                out.append((int(doc_id), rate, ch2, n, got[0],
                            got[1] if ch2 == 2 else None))
            yield pd.DataFrame(out, columns=[
                "doc_id", "rate", "channels", "n_frames",
                "v0_out", "v1_out"])

    return with_hex.mapInPandas(
        kernel,
        "doc_id bigint, rate int, channels int, n_frames int, "
        "v0_out int, v1_out int")


@register(
    "multimodal_flac_stats",
    oracle="""
    WITH v AS (
      SELECT doc_id,
             ('0x' || substr(md5(text), 1, 4))::BIGINT AS v0,
             ('0x' || substr(md5(text), 5, 4))::BIGINT AS v1,
             CAST(1 + doc_id % 2 AS INT) AS channels
      FROM documents
    ),
    s AS (
      SELECT doc_id, channels,
             ((v0 * i + v1) % 65536) - 32768 AS smp
      FROM v, LATERAL (SELECT unnest(generate_series(1, 25 * channels))
                       AS i)
    )
    SELECT doc_id, 8000 AS rate, channels, 25 AS n_frames,
           CAST(MIN(smp) AS INT) AS s_min,
           CAST(MAX(smp) AS INT) AS s_max,
           CAST(SUM(smp) AS BIGINT) AS s_sum
    FROM s GROUP BY doc_id, channels
    """,
)
def multimodal_flac_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL FLAC encode+decode inside an oracle-gated query (round 7):
    each document becomes a 25-frame mono-or-stereo int16 signal (an
    md5-seeded arithmetic series — NOT constant, so the fixed
    predictors and Rice residuals do real work), encoded with a
    9-sample block size (multi-frame stream, coded frame numbers,
    per-frame CRCs) and decoded back. FLAC is lossless, so the kernel
    asserts decoded == input and the oracle predicts the stats purely
    from the generating arithmetic — the whole codec path sits under
    the value-hash gate, stronger than the ADPCM query's
    constant-signal exact point. Codec: operators/flac_codec.py
    (RFC 9639 subset: CONSTANT/VERBATIM/FIXED subframes,
    partitioned Rice, CRC-8/CRC-16)."""
    import pandas as pd
    from typing import Iterator

    from aether_firebase_consumer_spark.operators.flac_codec import (
        decode_flac,
        encode_flac,
    )
    docs = fan_out_for_compute(load_table(spark, sf_dir, "documents"))
    with_hex = docs.select("doc_id", F.md5("text").alias("hx"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, hx in zip(pdf["doc_id"], pdf["hx"]):
                v0 = int(hx[0:4], 16)
                v1 = int(hx[4:8], 16)
                ch = 1 + int(doc_id) % 2
                sig = [((v0 * i + v1) % 65536) - 32768
                       for i in range(1, 25 * ch + 1)]
                flac = encode_flac(8000, ch, sig, block_size=9)
                rate, ch2, n, got = decode_flac(flac)
                assert got == sig          # lossless, bit-exact
                out.append((int(doc_id), rate, ch2, n,
                            min(sig), max(sig), sum(sig)))
            yield pd.DataFrame(out, columns=[
                "doc_id", "rate", "channels", "n_frames",
                "s_min", "s_max", "s_sum"])

    return with_hex.mapInPandas(
        kernel,
        "doc_id bigint, rate int, channels int, n_frames int, "
        "s_min int, s_max int, s_sum bigint")


@register(
    "multimodal_webp_stats",
    oracle="""
    WITH px AS (
      SELECT doc_id, md5(text) AS hx FROM documents
    ),
    b AS (
      SELECT doc_id,
             ascii(substr(hx, i, 1)) AS v
      FROM px, LATERAL (SELECT unnest(generate_series(1, 32)) AS i)
    )
    SELECT doc_id, 4 AS width, 2 AS height, 4 AS channels,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS INT)
             AS subtract_green,
           CAST(SUM(v) AS DOUBLE) / 32 AS avg_v,
           CAST(MIN(v) AS INT) AS min_v,
           CAST(MAX(v) AS INT) AS max_v
    FROM b GROUP BY doc_id
    """,
)
def multimodal_webp_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossless-WebP (VP8L) encode+decode inside an oracle-gated
    query (round 7): each document's 4×2 RGBA pixels are the 32
    ascii codes of md5(text); the Arrow kernel encodes with the
    subtract-green transform on even doc_ids and without on odd ones
    (both spec paths under one value hash), decodes through the
    canonical-prefix-code + LZ77 pipeline, asserts the lossless round
    trip, and reduces to stats the oracle recomputes arithmetically.
    Codec: operators/webp_codec.py (VP8L bitstream spec: simple and
    code-length-coded prefix codes, 2D distance mapping, color cache
    and color-indexing on the decode side)."""
    import pandas as pd
    from typing import Iterator

    from aether_firebase_consumer_spark.operators.webp_codec import (
        decode_webp_lossless,
        encode_webp_lossless,
    )
    docs = fan_out_for_compute(load_table(spark, sf_dir, "documents"))
    with_hex = docs.select("doc_id", F.md5("text").alias("hx"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, hx in zip(pdf["doc_id"], pdf["hx"]):
                rgba = hx.encode("ascii")        # 32 bytes = 4*2*4
                sg = int(doc_id) % 2 == 0
                webp = encode_webp_lossless(4, 2, rgba,
                                            use_subtract_green=sg)
                w, h, got = decode_webp_lossless(webp)
                assert got == rgba               # lossless
                out.append((int(doc_id), w, h, 4, int(sg),
                            sum(rgba) / 32, min(rgba), max(rgba)))
            yield pd.DataFrame(out, columns=[
                "doc_id", "width", "height", "channels",
                "subtract_green", "avg_v", "min_v", "max_v"])

    return with_hex.mapInPandas(
        kernel,
        "doc_id bigint, width int, height int, channels int, "
        "subtract_green int, avg_v double, min_v int, max_v int")


@register(
    "multimodal_mp4_demux_stats",
    oracle="""
    WITH px AS (
      SELECT doc_id, md5(text) AS hx FROM documents
    ),
    b AS (
      SELECT doc_id, i, ascii(substr(hx, i, 1)) AS v
      FROM px, LATERAL (SELECT unnest(generate_series(1, 8)) AS i)
    )
    SELECT doc_id,
           CAST(8 AS INT) AS n_samples,
           CAST(SUM(v % 17 + 1) AS BIGINT) AS total_bytes,
           CAST(SUM(v % 3 + 1) AS BIGINT) AS total_dur,
           CAST(SUM(CASE WHEN v % 2 = 0 THEN 1 ELSE 0 END) AS INT)
             AS n_sync,
           CAST(SUM((v % 17 + 1) * v) AS BIGINT) AS payload_weight
    FROM b GROUP BY doc_id
    """,
)
def multimodal_mp4_demux_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MP4 container mux+demux inside an oracle-gated query
    (round 7): each document becomes an 8-sample video track whose
    sizes/durations/keyframes derive from md5(text) (size = v%17+1,
    duration = v%3+1, sync = v even, payload = byte v repeated), muxed
    into an ISO-BMFF file with 3-sample chunks (ragged stsc tail run)
    and demuxed back. The kernel asserts payload bytes, durations,
    cumulative dts and sync flags all round-trip exactly, then reduces
    to stats the oracle predicts arithmetically — the full sample-table
    compression/expansion path (stts/stsz/stsc/stco/stss) sits under
    the value-hash gate. Codec: operators/mp4_codec.py (ISO/IEC
    14496-12 subset). Reference consumed media only as opaque blobs
    (capability-gap category, SURVEY.md §2.3 multimodal)."""
    import pandas as pd
    from typing import Iterator

    from aether_firebase_consumer_spark.operators.mp4_codec import (
        demux_mp4,
        mux_mp4,
        read_samples,
    )
    docs = fan_out_for_compute(load_table(spark, sf_dir, "documents"))
    with_hex = docs.select("doc_id", F.md5("text").alias("hx"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, hx in zip(pdf["doc_id"], pdf["hx"]):
                vs = [ord(hx[i]) for i in range(8)]
                samples = [(bytes([v]) * (v % 17 + 1), v % 3 + 1,
                            v % 2 == 0) for v in vs]
                blob = mux_mp4(
                    [dict(handler="vide", timescale=30, samples=samples,
                          width=4, height=2)],
                    samples_per_chunk=3)
                t = demux_mp4(blob)[0]
                assert read_samples(blob, t) == [p for p, _d, _s in samples]
                assert [s["duration"] for s in t["samples"]] == \
                    [d for _p, d, _s in samples]
                dts = 0
                for smp, (_p, d, sy) in zip(t["samples"], samples):
                    assert smp["dts"] == dts and smp["sync"] == sy
                    dts += d
                out.append((int(doc_id), 8,
                            sum(len(p) for p, _d, _s in samples),
                            sum(d for _p, d, _s in samples),
                            sum(1 for _p, _d, s in samples if s),
                            sum(len(p) * v
                                for (p, _d, _s), v in zip(samples, vs))))
            yield pd.DataFrame(out, columns=[
                "doc_id", "n_samples", "total_bytes", "total_dur",
                "n_sync", "payload_weight"])

    return with_hex.mapInPandas(
        kernel,
        "doc_id bigint, n_samples int, total_bytes bigint, "
        "total_dur bigint, n_sync int, payload_weight bigint")


@register(
    "multimodal_mp3_framing_stats",
    oracle="""
    WITH px AS (
      SELECT doc_id, md5(text) AS hx FROM documents
    ),
    f AS (
      SELECT doc_id,
             list_extract([32,40,48,56,64,80,96,112,128,160,192,224,
                           256,320], 1 + (v % 14)) AS kbps,
             list_extract([44100,48000,32000], 1 + (v % 3)) AS rate,
             v % 2 AS pad
      FROM (SELECT doc_id, ascii(substr(hx, i, 1)) AS v
            FROM px, LATERAL (SELECT unnest(generate_series(1, 6))
                              AS i))
    ),
    sz AS (
      SELECT doc_id, pad,
             (144 * kbps * 1000) // rate + pad AS fsize
      FROM f
    )
    SELECT doc_id, CAST(6 AS INT) AS n_frames,
           CAST(SUM(fsize) AS BIGINT) AS total_bytes,
           CAST(SUM(pad) AS INT) AS n_pad,
           CAST(MIN(fsize) AS INT) AS min_size,
           CAST(MAX(fsize) AS INT) AS max_size
    FROM sz GROUP BY doc_id
    """,
)
def multimodal_mp3_framing_stats(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """REAL MPEG-audio framing inside an oracle-gated query (round 7):
    each document becomes a 6-frame MPEG1 Layer III stream whose
    bitrate/rate indices and padding derive from md5(text); the Arrow
    kernel emits spec-valid framing (operators/mpeg_audio.py), walks
    it back with the independent parser, asserts every frame boundary,
    and reduces to stats the DuckDB oracle recomputes from the SAME
    public frame-length formula (144·bitrate/rate + padding) and
    bitrate/sample-rate tables — two independent spellings of ISO
    11172-3 §2.4.1.3 under one value hash."""
    import pandas as pd
    from typing import Iterator

    from aether_firebase_consumer_spark.operators.mpeg_audio import (
        build_mp3,
        parse_mp3_frames,
    )
    docs = fan_out_for_compute(load_table(spark, sf_dir, "documents"))
    with_hex = docs.select("doc_id", F.md5("text").alias("hx"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, hx in zip(pdf["doc_id"], pdf["hx"]):
                vs = [ord(hx[i]) for i in range(6)]
                specs = [("1", 3, 1 + v % 14, v % 3, v % 2) for v in vs]
                info = parse_mp3_frames(build_mp3(specs))
                sizes = [f["size"] for f in info["frames"]]
                assert len(sizes) == 6
                for a, b in zip(info["frames"], info["frames"][1:]):
                    assert a["offset"] + a["size"] == b["offset"]
                out.append((int(doc_id), 6, sum(sizes),
                            sum(v % 2 for v in vs),
                            min(sizes), max(sizes)))
            yield pd.DataFrame(out, columns=[
                "doc_id", "n_frames", "total_bytes", "n_pad",
                "min_size", "max_size"])

    return with_hex.mapInPandas(
        kernel,
        "doc_id bigint, n_frames int, total_bytes bigint, n_pad int, "
        "min_size int, max_size int")


@register(
    "multimodal_mp3_sideinfo_stats",
    oracle="""
    WITH px AS (
      SELECT doc_id, md5(text) AS hx,
             CAST(doc_id % 2 AS INT) AS lsf
      FROM documents
    ),
    c AS (
      SELECT doc_id, hx, lsf,
             CASE WHEN lsf = 1 THEN 195 ELSE 187 END AS avail,
             CASE WHEN lsf = 1 THEN 1 ELSE 2 END AS ngr
      FROM px
    ),
    granule AS (
      SELECT doc_id, lsf, avail, j, g,
             8 * (10 + (('0x' || substr(hx, 2 * (2 * j + g) + 1, 2))
                        ::BIGINT % 80)) AS p,
             ('0x' || substr(hx, 2 * (6 + 2 * j + g) + 1, 2))::BIGINT
               AS gg,
             (('0x' || substr(hx, 2 * (2 * j + g) + 1, 2))::BIGINT * 7
              + ('0x' || substr(hx, 2 * (6 + 2 * j + g) + 1, 2))
                ::BIGINT) % 288 AS bv,
             ('0x' || substr(hx, 2 * (6 + 2 * j + g) + 1, 2))::BIGINT
               % 16 AS scf
      FROM c,
           LATERAL (SELECT unnest(generate_series(0, 2)) AS j),
           LATERAL (SELECT unnest(generate_series(0, 1)) AS g)
      WHERE g < ngr
    ),
    perframe AS (
      SELECT doc_id, lsf, avail, j, SUM(p) // 8 AS u, SUM(p) AS p_s,
             SUM(gg) AS gg_s, SUM(bv) AS bv_s, SUM(scf) AS scf_s
      FROM granule GROUP BY doc_id, lsf, avail, j
    ),
    agg AS (
      SELECT doc_id, lsf, avail,
             SUM(CASE WHEN j = 0 THEN u END) AS u0,
             SUM(CASE WHEN j = 1 THEN u END) AS u1,
             SUM(p_s) AS total_main_bits, SUM(gg_s) AS sum_gg,
             SUM(bv_s) AS sum_bv, SUM(scf_s) AS sum_scf
      FROM perframe GROUP BY doc_id, lsf, avail
    ),
    m AS (
      SELECT a.*,
             CASE WHEN ('0x' || substr(px.hx, 25, 2))::BIGINT % 4 = 0
                  THEN 0 ELSE LEAST(a.avail - a.u0, 200) END AS mdb1
      FROM agg a JOIN px USING (doc_id)
    ),
    m2 AS (
      SELECT *, LEAST(avail + mdb1 - u1, 200) AS mdb2 FROM m
    )
    SELECT doc_id, lsf, CAST(3 AS INT) AS n_frames,
           CAST(1 + CASE WHEN mdb1 = 0 THEN 1 ELSE 0 END
                  + CASE WHEN mdb2 = 0 THEN 1 ELSE 0 END AS INT)
             AS n_cut_safe,
           CAST(GREATEST(mdb1, mdb2) AS INT) AS resv_max,
           CAST(total_main_bits AS BIGINT) AS total_main_bits,
           CAST(3 * avail AS BIGINT) AS total_main_bytes,
           CAST(sum_gg AS BIGINT) AS sum_gg,
           CAST(sum_bv AS BIGINT) AS sum_bv,
           CAST(sum_scf AS BIGINT) AS sum_scf
    FROM m2
    """,
)
def multimodal_mp3_sideinfo_stats(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """REAL Layer III side-info + bit-reservoir choreography inside an
    oracle-gated query (round 10 — one level past the round-7 framing
    query): each document becomes a 3-frame Layer III stream — MPEG1
    two-granule (even doc_ids) or MPEG2-LSF one-granule (odd) — whose
    per-granule part2_3_length / global_gain / big_values /
    scalefac_compress and a genuine bit-reservoir layout
    (main_data_begin reaching back into earlier frames' slots, one
    frame per doc sometimes reservoir-free) all derive from md5(text).
    The Arrow kernel BUILDS the stream (real side-info bit layout,
    operators/mpeg_audio.py build_mp3_l3), re-parses it with the
    independent walker (parse_mp3_sideinfo — the parser validated
    frame-by-frame against real LAME output in tests), asserts the
    spec reservoir invariants, and emits the PARSED values; the DuckDB
    oracle re-derives them arithmetically. Builder and parser are two
    independent spellings of ISO 11172-3 §2.4.1.7 / ISO 13818-3 under
    one value hash."""
    import pandas as pd
    from typing import Iterator

    from aether_firebase_consumer_spark.operators.mpeg_audio import (
        build_mp3_l3,
        parse_mp3_sideinfo,
    )
    docs = fan_out_for_compute(load_table(spark, sf_dir, "documents"))
    with_hex = docs.select("doc_id", F.md5("text").alias("hx"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, hx in zip(pdf["doc_id"], pdf["hx"]):
                b = [int(hx[2 * i:2 * i + 2], 16) for i in range(16)]
                lsf = int(doc_id) % 2 == 1
                version = "2" if lsf else "1"
                bidx = 8 if lsf else 5     # 64 kbps in both tables
                avail = 195 if lsf else 187
                ngr = 1 if lsf else 2

                def gran(j, g):
                    return {
                        "part2_3_length": 8 * (10 + b[2 * j + g] % 80),
                        "global_gain": b[6 + 2 * j + g],
                        "big_values": (b[2 * j + g] * 7
                                       + b[6 + 2 * j + g]) % 288,
                        "scalefac_compress": b[6 + 2 * j + g] % 16,
                    }

                u = [sum(gran(j, g)["part2_3_length"]
                         for g in range(ngr)) // 8 for j in range(3)]
                mdb1 = 0 if b[12] % 4 == 0 \
                    else min(avail - u[0], 200)
                mdb2 = min(avail + mdb1 - u[1], 200)
                specs = [
                    {"version": version, "bitrate_index": bidx,
                     "rate_index": 0, "channels": 1,
                     "main_data_begin": [0, mdb1, mdb2][j],
                     # mono: granule g's channel list is one dict
                     "granules": [[gran(j, g)] for g in range(ngr)]}
                    for j in range(3)]
                info = parse_mp3_sideinfo(build_mp3_l3(specs))
                fr = info["frames"]
                assert len(fr) == 3
                gs = [g for f in fr for chs in f["granules"]
                      for g in chs]
                out.append((
                    int(doc_id), int(lsf), 3, info["n_cut_safe"],
                    info["reservoir_max_bytes"],
                    info["total_main_bits"], info["total_main_bytes"],
                    sum(g["global_gain"] for g in gs),
                    sum(g["big_values"] for g in gs),
                    sum(g["scalefac_compress"] for g in gs)))
            yield pd.DataFrame(out, columns=[
                "doc_id", "lsf", "n_frames", "n_cut_safe", "resv_max",
                "total_main_bits", "total_main_bytes", "sum_gg",
                "sum_bv", "sum_scf"])

    return with_hex.mapInPandas(
        kernel,
        "doc_id bigint, lsf int, n_frames int, n_cut_safe int, "
        "resv_max int, total_main_bits bigint, total_main_bytes "
        "bigint, sum_gg bigint, sum_bv bigint, sum_scf bigint")


@register(
    "multimodal_id3_tags",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN '2.3' ELSE '2.4' END
             AS id3_version,
           CAST(91 AS INT) AS tag_bytes,
           CAST(3 AS INT) AS n_tag_frames,
           substr(md5(text), 1, 8) AS title,
           substr(md5(text), 9, 8) AS artist,
           substr(md5(text), 17, 12) AS comment,
           CAST(2 AS INT) AS n_mp3_frames
    FROM documents
    """,
)
def multimodal_id3_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL ID3v2 tag metadata extraction inside an oracle-gated query
    (round 10): each document becomes an MP3 stream opening with an
    ID3v2 tag — v2.3 (u32 frame sizes) for even doc_ids, v2.4
    (synchsafe frame sizes) for odd — holding TIT2/TPE1 text frames
    and a COMM comment whose strings derive from md5(text). The Arrow
    kernel BUILDS the tag + framing (build_id3v2 / build_mp3), parses
    the tag back with the independent frame walker (parse_id3v2) and
    the audio framing with parse_mp3_frames (whose synchsafe tag-skip
    must agree with the tag's own declared size), and emits the PARSED
    strings; the DuckDB oracle re-derives them arithmetically — the
    metadata-extraction column a 100 TB audio corpus queries without
    touching payloads. Codec: operators/mpeg_audio.py (id3v2.3.0 /
    id3v2.4.0 informal standards)."""
    import pandas as pd
    from typing import Iterator

    from aether_firebase_consumer_spark.operators.mpeg_audio import (
        build_id3v2,
        build_mp3,
        parse_id3v2,
        parse_mp3_frames,
    )
    docs = fan_out_for_compute(load_table(spark, sf_dir, "documents"))
    with_hex = docs.select("doc_id", F.md5("text").alias("hx"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, hx in zip(pdf["doc_id"], pdf["hx"]):
                major = 3 if int(doc_id) % 2 == 0 else 4
                tag = build_id3v2(
                    [("TIT2", hx[0:8]), ("TPE1", hx[8:16]),
                     ("COMM", hx[16:28])], major=major)
                audio = build_mp3([("1", 3, 5, 0, 0)] * 2)
                stream = tag + audio
                parsed = parse_id3v2(stream)
                framing = parse_mp3_frames(stream)
                assert framing["id3v2_bytes"] == parsed["tag_bytes"]
                texts = {f["id"]: f["text"]
                         for f in parsed["frames"]}
                out.append((
                    int(doc_id), parsed["version"],
                    parsed["tag_bytes"], len(parsed["frames"]),
                    texts["TIT2"], texts["TPE1"], texts["COMM"],
                    len(framing["frames"])))
            yield pd.DataFrame(out, columns=[
                "doc_id", "id3_version", "tag_bytes", "n_tag_frames",
                "title", "artist", "comment", "n_mp3_frames"])

    return with_hex.mapInPandas(
        kernel,
        "doc_id bigint, id3_version string, tag_bytes int, "
        "n_tag_frames int, title string, artist string, "
        "comment string, n_mp3_frames int")


@register(
    "multimodal_vorbis_comment_stats",
    oracle="""
    WITH px AS (
      SELECT doc_id, md5(text) AS hx,
             ('0x' || substr(md5(text), 1, 2))::BIGINT AS b0,
             ('0x' || substr(md5(text), 3, 2))::BIGINT AS b1
      FROM documents
    )
    SELECT doc_id,
           CAST(1 + doc_id % 2 AS INT) AS channels,
           CAST(8000 + 100 * b0 AS INT) AS sample_rate,
           CAST(2 + b1 % 3 AS INT) AS n_comments,
           substr(hx, 5, 10) AS artist,
           substr(hx, 15, 10) AS title,
           CAST(CASE WHEN 1 + doc_id % 2 = 1 THEN 256 ELSE 512 END
                AS INT) AS blocksize_0,
           CAST(2048 AS INT) AS blocksize_1
    FROM px
    """,
)
def multimodal_vorbis_comment_stats(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """REAL Ogg/Vorbis header + VorbisComment extraction inside an
    oracle-gated query (round 10): each document becomes the first two
    packets of a Vorbis stream — identification header (channels,
    rate, blocksizes) and comment header (ARTIST/TITLE plus a
    variable number of extra fields), all md5-derived — MUXED through
    real Ogg pages (mux_ogg: lacing, CRC, BOS) and read back through
    demux_ogg (CRCs verified) + parse_vorbis_headers. The kernel
    emits the PARSED values; the oracle re-derives them. This is the
    Vorbis metadata layer (the tagging standard FLAC/Opus reuse);
    sample decode stays env-gated as documented. Codec:
    operators/mpeg_audio.py (Vorbis I spec §4.2, RFC 3533)."""
    import pandas as pd
    from typing import Iterator

    from aether_firebase_consumer_spark.operators.mpeg_audio import (
        build_vorbis_headers,
        demux_ogg,
        mux_ogg,
        parse_vorbis_headers,
    )
    docs = fan_out_for_compute(load_table(spark, sf_dir, "documents"))
    with_hex = docs.select("doc_id", F.md5("text").alias("hx"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, hx in zip(pdf["doc_id"], pdf["hx"]):
                b0, b1 = int(hx[0:2], 16), int(hx[2:4], 16)
                ch = 1 + int(doc_id) % 2
                rate = 8000 + 100 * b0
                comments = [("ARTIST", hx[4:14]), ("TITLE", hx[14:24])]
                for i in range(b1 % 3):
                    comments.append((f"KEY{i}", hx[24 + i:28 + i]))
                pkts = build_vorbis_headers(
                    ch, rate, comments,
                    blocksize_0=256 if ch == 1 else 512)
                ogg = mux_ogg([(p, -1) for p in pkts], serial=7)
                stream = demux_ogg(ogg)[7]
                assert stream["bos"] and stream["eos"]
                hdr = parse_vorbis_headers(
                    [p for p, _g in stream["packets"]])
                cm = dict(hdr["comments"])
                out.append((
                    int(doc_id), hdr["channels"], hdr["sample_rate"],
                    len(hdr["comments"]), cm["ARTIST"], cm["TITLE"],
                    hdr["blocksize_0"], hdr["blocksize_1"]))
            yield pd.DataFrame(out, columns=[
                "doc_id", "channels", "sample_rate", "n_comments",
                "artist", "title", "blocksize_0", "blocksize_1"])

    return with_hex.mapInPandas(
        kernel,
        "doc_id bigint, channels int, sample_rate int, "
        "n_comments int, artist string, title string, "
        "blocksize_0 int, blocksize_1 int")


@register(
    "multimodal_ogg_demux_stats",
    oracle="""
    WITH px AS (
      SELECT doc_id, md5(text) AS hx FROM documents
    ),
    p AS (
      SELECT doc_id, i, (ascii(substr(hx, i, 1)) * 5) % 700 AS psize
      FROM px, LATERAL (SELECT unnest(generate_series(1, 8)) AS i)
    )
    SELECT doc_id, CAST(8 AS INT) AS n_packets,
           CAST(8 AS INT) AS n_pages,
           CAST(SUM(psize) AS BIGINT) AS total_bytes,
           CAST(SUM(psize // 255 + 1) AS INT) AS n_lacing,
           CAST(SUM(i * psize) AS BIGINT) AS weight
    FROM p GROUP BY doc_id
    """,
)
def multimodal_ogg_demux_stats(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """REAL Ogg container mux+demux inside an oracle-gated query
    (round 7): each document becomes an 8-packet logical stream with
    md5-derived packet sizes (0–695 bytes — exercising 1-, 2- and
    3-segment lacing and empty packets), paged with the RFC 3533
    255-lacing rule and spec CRC-32, then demuxed back. The kernel
    asserts the packets and granule positions round-trip exactly
    (every page CRC re-verified on read) and reduces to stats the
    oracle predicts arithmetically — including the lacing-value count
    ``size // 255 + 1``, the spec segmentation law restated in SQL.
    Codec: operators/mpeg_audio.py."""
    import pandas as pd
    from typing import Iterator

    from aether_firebase_consumer_spark.operators.mpeg_audio import (
        demux_ogg,
        mux_ogg,
    )
    docs = fan_out_for_compute(load_table(spark, sf_dir, "documents"))
    with_hex = docs.select("doc_id", F.md5("text").alias("hx"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, hx in zip(pdf["doc_id"], pdf["hx"]):
                vs = [ord(hx[i]) for i in range(8)]
                pkts = [(bytes((v + j) % 256 for j in range(v * 5 % 700)),
                         100 + i) for i, v in enumerate(vs)]
                streams = demux_ogg(mux_ogg(pkts, serial=3))
                got = streams[3]
                assert [p for p, _g in got["packets"]] == \
                    [p for p, _g in pkts]
                assert [g for _p, g in got["packets"]] == \
                    [100 + i for i in range(8)]
                assert got["bos"] and got["eos"]
                sizes = [len(p) for p, _g in pkts]
                out.append((int(doc_id), 8, got["n_pages"], sum(sizes),
                            sum(s // 255 + 1 for s in sizes),
                            sum((i + 1) * s
                                for i, s in enumerate(sizes))))
            yield pd.DataFrame(out, columns=[
                "doc_id", "n_packets", "n_pages", "total_bytes",
                "n_lacing", "weight"])

    return with_hex.mapInPandas(
        kernel,
        "doc_id bigint, n_packets int, n_pages int, total_bytes bigint, "
        "n_lacing int, weight bigint")
