"""Multimodal columns (SURVEY.md §2.3): image/audio/video as opaque
``binary`` columns with typed metadata, decoded/feature-extracted via
Arrow-batched ``mapInPandas``.

Design for 100 TB: blobs stay columnar (parquet BinaryType) or become
*pointers* (uri + byte-range) when objects exceed the row-group sweet
spot; decode runs executor-side in Arrow batches — the only Python in
the engine's hot paths, because codec work is genuinely imperative.

Codecs: the engine ships its OWN pure-Python decoders — PPM (P6),
PNG (all five filters + palette), 24-bit BMP, GIF87a/89a (full LZW),
baseline JPEG gray+color with 4:2:0 and restart intervals
(``operators/jpeg_codec.py``), PCM WAV (stdlib ``wave``) and G.711
mu-law — so ``decode_image``/``decode_audio`` run REAL decodes with no
PIL/soundfile. Container/framing layers are native too: MP4/ISO-BMFF
sample-table demux (``operators/mp4_codec.py``), MPEG-audio frame
walking and Ogg paging (``operators/mpeg_audio.py``). Only the
psychoacoustic/motion sample decodes (MP3/AAC/H.26x) remain env-gated
(``NotImplementedError`` with a clear message). ``scan_image_files``
ingests real files via binaryFile with corrupt-blob quarantine.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# metadata struct carried next to every blob column
MEDIA_META_SCHEMA = "struct<n_bytes:bigint, mime:string, source_uri:string>"

FEATURE_SCHEMA = ("doc_id bigint, n_bytes bigint, first_byte int, "
                  "content_md5 string")


def attach_binary(df: DataFrame, text_col: str = "text",
                  mime: str = "application/octet-stream") -> DataFrame:
    """Build the (payload, media_meta) column pair from a source column.
    In production the payload arrives as parquet binary or via a
    pointer fetch; here it's derived so the fixtures can drive it."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.length(payload).cast("bigint").alias("n_bytes"),
            F.lit(mime).alias("mime"),
            F.concat(F.lit("mem://doc/"), F.col("doc_id").cast("string"))
             .alias("source_uri"),
        ))


# --------------------------------------------------------------- kernels

def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Pure-Python decode of binary PPM (P6) — the no-dependency image
    format: returns (width, height, raw RGB bytes). Real pixels, no
    PIL: header is ASCII "P6 <w> <h> <maxval>" (with #-comments), body
    is w*h*3 bytes. Raises ValueError on malformed input."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # tokenize the header: 4 ASCII fields, comments run to end of line
    fields: list[bytes] = []
    i = 2
    while len(fields) < 3 and i < len(payload):
        c = payload[i:i + 1]
        if c == b"#":
            i = payload.index(b"\n", i) + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j:j + 1].isspace():
                j += 1
            fields.append(payload[i:j])
            i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = (int(f) for f in fields)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    raw = payload[i:i + w * h * 3]
    if len(raw) != w * h * 3:
        raise ValueError("truncated PPM body")
    return w, h, raw


def resize_rgb_nearest(w: int, h: int, raw: bytes,
                       tw: int, th: int) -> bytes:
    """Nearest-neighbor resample of raw RGB bytes — the dependency-free
    resize kernel behind ``resize_images`` when payloads are PPM."""
    out = bytearray(tw * th * 3)
    for y in range(th):
        sy = y * h // th
        row = sy * w * 3
        for x in range(tw):
            sx = x * w // tw
            src = row + sx * 3
            dst = (y * tw + x) * 3
            out[dst:dst + 3] = raw[src:src + 3]
    return bytes(out)


def decode_image(payload: bytes) -> "object":
    """Image decode. PPM (P6), PNG (8-bit gray/RGB/RGBA), and 24-bit
    BMP decode with the engine's own pure-Python codecs (no
    dependencies — see ``operators/image_codecs.py``); other formats
    need PIL, which is absent from the v1 container — those raise with
    a clear error."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from aether_firebase_consumer_spark.operators.image_codecs import (
            decode_png,
        )
        return decode_png(payload)
    if payload[:2] == b"BM":
        from aether_firebase_consumer_spark.operators.image_codecs import (
            decode_bmp,
        )
        return decode_bmp(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from aether_firebase_consumer_spark.operators.image_codecs import (
            decode_gif,
        )
        return decode_gif(payload)
    if payload[:2] in (b"II", b"MM") and payload[2:4] in (b"*\x00",
                                                          b"\x00*"):
        from aether_firebase_consumer_spark.operators.image_codecs import (
            decode_tiff,
        )
        return decode_tiff(payload)
    if payload[:2] == b"\xff\xd8":
        from aether_firebase_consumer_spark.operators.jpeg_codec import (
            decode_jpeg,
        )
        return decode_jpeg(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from aether_firebase_consumer_spark.operators.webp_codec import (
            decode_webp_lossless,
        )
        w, h, rgba = decode_webp_lossless(payload)
        return w, h, 4, rgba
    try:
        from PIL import Image  # noqa: F401
        import io
        return Image.open(io.BytesIO(payload))
    except ImportError as err:
        raise NotImplementedError(
            "lossy-WebP/AVIF/HEIF decode requires PIL (not in this "
            "environment); PPM/PNG/BMP/GIF/TIFF (none/LZW/Deflate/"
            "PackBits), baseline JPEG, and LOSSLESS WebP (VP8L) decode "
            "natively via operators.image_codecs / operators.jpeg_codec "
            "/ operators.webp_codec") from err


def decode_wav(payload: bytes) -> tuple[int, int, int, bytes]:
    """Pure-stdlib decode of PCM WAV (RIFF): returns (sample_rate,
    n_channels, n_frames, raw PCM frames). Real samples, no
    soundfile — ``wave`` ships with Python."""
    import io
    import wave
    with wave.open(io.BytesIO(payload), "rb") as w:
        return (w.getframerate(), w.getnchannels(), w.getnframes(),
                w.readframes(w.getnframes()))


def mulaw_expand(byte_val: int) -> int:
    """G.711 µ-law expansion: one encoded byte -> linear int16 sample.
    Exact integer arithmetic per the spec (bias 0x84, 3-bit exponent,
    4-bit mantissa), matching the standard lookup tables."""
    u = ~byte_val & 0xFF
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    sample = ((mantissa << 3) + 0x84) << exponent
    sample -= 0x84
    return -sample if sign else sample


def decode_wav_mulaw(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Decode a µ-law (format code 7) RIFF/WAVE file to linear int16
    samples — the telephony-audio format stdlib ``wave`` refuses.
    Walks the RIFF chunks directly (fmt + data), then applies the
    exact integer µ-law expansion per byte."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAVE missing fmt or data chunk")
    code = int.from_bytes(fmt[0:2], "little")
    if code != 7:
        raise ValueError(f"not mu-law (format code {code}; PCM decodes "
                         "via decode_wav)")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    samples = [mulaw_expand(b) for b in data]
    return rate, channels, len(samples) // channels, samples


#: IMA ADPCM quantizer tables (public spec: IMA Digital Audio Focus
#: and Technology Working Groups, "Recommended Practices for
#: Enhancing Digital Audio Compatibility", 1992; also Microsoft's
#: WAVE format tag 0x0011 documentation)
_IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8,
                    -1, -1, -1, -1, 2, 4, 6, 8)
_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767)


def _ima_decode_nibble(n: int, pred: int, idx: int) -> tuple[int, int]:
    """One 4-bit ADPCM code → (new predictor, new step index). Exact
    integer arithmetic per the spec's bit-shift reconstruction."""
    step = _IMA_STEP_TABLE[idx]
    diff = step >> 3
    if n & 1:
        diff += step >> 2
    if n & 2:
        diff += step >> 1
    if n & 4:
        diff += step
    if n & 8:
        diff = -diff
    pred = max(-32768, min(32767, pred + diff))
    idx = max(0, min(88, idx + _IMA_INDEX_TABLE[n]))
    return pred, idx


def decode_wav_ima_adpcm(payload: bytes) -> tuple[int, int, int,
                                                  list[int]]:
    """Decode an IMA ADPCM (format code 0x11) RIFF/WAVE file to
    linear int16 samples — 4:1-compressed speech/audio stdlib
    ``wave`` refuses. Block-structured per the public layout: each
    block carries a per-channel 4-byte header (int16 initial sample —
    which IS the block's first output sample — uint8 step index,
    reserved), then nibble data low-nibble-first, stereo interleaved
    in 4-byte words per channel. Returns (rate, channels, n_frames,
    samples interleaved by frame)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data, fact_frames = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        elif cid == b"fact" and size >= 4:
            # total frames per channel — authoritative for compressed
            # WAV: the final block's pad samples must not be emitted
            fact_frames = int.from_bytes(body[0:4], "little")
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("WAVE missing fmt or data chunk")
    code = int.from_bytes(fmt[0:2], "little")
    if code != 0x11:
        raise ValueError(f"not IMA ADPCM (format code {code})")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    block_align = int.from_bytes(fmt[12:14], "little")
    if channels not in (1, 2):
        raise ValueError(f"{channels}-channel IMA ADPCM not supported")
    per_block = (block_align - 4 * channels) * 2 // channels + 1
    out: list[list[int]] = [[] for _ in range(channels)]
    # iterate ALL blocks including a trailing PARTIAL one (encoders
    # that don't pad emit a short final block; its sample count
    # derives from its length — silently dropping it loses the tail)
    for b0 in range(0, len(data), block_align):
        block = data[b0:b0 + block_align]
        if len(block) < 4 * channels:
            raise ValueError(
                f"IMA ADPCM trailing fragment of {len(block)} bytes is "
                f"shorter than the {4 * channels}-byte block header")
        preds, idxs = [], []
        local: list[list[int]] = []
        for c in range(channels):
            p = int.from_bytes(block[c * 4:c * 4 + 2], "little",
                               signed=True)
            i = block[c * 4 + 2]
            if i > 88:
                raise ValueError(f"IMA ADPCM step index {i} out of range")
            preds.append(p)
            idxs.append(i)
            local.append([p])              # header sample is sample 0
        body = block[4 * channels:]
        # mono: sequential nibbles; stereo: 4-byte words alternate
        # channels, 8 nibbles (= 8 samples) per word
        for wpos in range(0, len(body), 4):
            c = (wpos // 4) % channels
            for byte in body[wpos:wpos + 4]:
                for n in (byte & 0x0F, byte >> 4):
                    preds[c], idxs[c] = _ima_decode_nibble(
                        n, preds[c], idxs[c])
                    local[c].append(preds[c])
        for c in range(channels):
            out[c].extend(local[c][:per_block])
    n_frames = min(len(ch) for ch in out)
    if fact_frames is not None and fact_frames < n_frames:
        # fact chunk trims final-block padding to the true length
        n_frames = fact_frames
    interleaved: list[int] = []
    for f in range(n_frames):
        for c in range(channels):
            interleaved.append(out[c][f])
    return rate, channels, n_frames, interleaved


def encode_wav_ima_adpcm(rate: int, channels: int,
                         samples: list[int],
                         samples_per_block: int = 505) -> bytes:
    """Encode linear int16 samples (interleaved by frame) as an IMA
    ADPCM RIFF/WAVE file (format 0x11). The standard encoder state
    machine: each block's first sample ships verbatim in the header;
    every later sample quantizes its delta against the decoder's own
    reconstruction, so encoder and decoder states stay locked. Lossy
    by design — tests bound reconstruction error, not equality."""
    if channels not in (1, 2):
        raise ValueError("channels must be 1 or 2")
    if (samples_per_block - 1) % 8:
        raise ValueError("samples_per_block must be 1 mod 8")
    frames = [samples[i:i + channels]
              for i in range(0, len(samples), channels)]
    block_align = 4 * channels + (samples_per_block - 1) * channels // 2
    blocks = bytearray()
    run_idxs: list[int] | None = None      # adapted index carries over
    for b0 in range(0, len(frames), samples_per_block):
        chunk = frames[b0:b0 + samples_per_block]
        # pad the tail block with its last frame (decoder emits per
        # block_align, so keep blocks full)
        while len(chunk) < samples_per_block:
            chunk.append(chunk[-1])
        preds = [chunk[0][c] for c in range(channels)]
        if run_idxs is None:
            # cold start: pick each channel's initial step near the
            # first delta so the quantizer needn't ramp from step 7
            # (the header ships the index, so any choice decodes)
            run_idxs = []
            for c in range(channels):
                d = abs(chunk[1][c] - chunk[0][c]) if len(chunk) > 1 else 0
                i = 0
                while i < 88 and _IMA_STEP_TABLE[i] < d:
                    i += 1
                run_idxs.append(i)
        idxs = list(run_idxs)
        for c in range(channels):
            blocks += preds[c].to_bytes(2, "little", signed=True)
            blocks += bytes([idxs[c], 0])
        nibbles: list[list[int]] = [[] for _ in range(channels)]
        for frame in chunk[1:]:
            for c in range(channels):
                step = _IMA_STEP_TABLE[idxs[c]]
                diff = frame[c] - preds[c]
                n = 0
                if diff < 0:
                    n = 8
                    diff = -diff
                if diff >= step:
                    n |= 4
                    diff -= step
                if diff >= step >> 1:
                    n |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    n |= 1
                preds[c], idxs[c] = _ima_decode_nibble(
                    n, preds[c], idxs[c])
                nibbles[c].append(n)
        run_idxs = list(idxs)              # next block starts adapted
        # pack: per channel, 8 nibbles per 4-byte word, words
        # interleaved across channels
        for w0 in range(0, samples_per_block - 1, 8):
            for c in range(channels):
                eight = nibbles[c][w0:w0 + 8]
                for k in range(0, 8, 2):
                    blocks.append(eight[k] | (eight[k + 1] << 4))
    per_block = samples_per_block
    byte_rate = rate * block_align // per_block
    fmt = (int(0x11).to_bytes(2, "little")
           + channels.to_bytes(2, "little")
           + rate.to_bytes(4, "little")
           + byte_rate.to_bytes(4, "little")
           + block_align.to_bytes(2, "little")
           + (4).to_bytes(2, "little")
           + (2).to_bytes(2, "little")
           + per_block.to_bytes(2, "little"))
    # fact chunk (mandatory for compressed WAV per RIFF spec): true
    # frame count, so decoders trim the final block's pad frames
    chunks = (b"fmt " + len(fmt).to_bytes(4, "little") + fmt
              + b"fact" + (4).to_bytes(4, "little")
              + len(frames).to_bytes(4, "little")
              + b"data" + len(blocks).to_bytes(4, "little") + blocks)
    return (b"RIFF" + (4 + len(chunks)).to_bytes(4, "little")
            + b"WAVE" + chunks)


def decode_audio(payload: bytes):
    """Audio decode. PCM WAV decodes with the stdlib ``wave`` module;
    µ-law and IMA ADPCM WAVs decode via the native expanders (they
    return sample LISTS, not PCM byte frames); FLAC decodes via the
    native lossless codec (``operators/flac_codec.py``); other
    compressed formats need soundfile, absent from the v1 container —
    those raise with a clear error."""
    if payload[:4] == b"fLaC":
        from aether_firebase_consumer_spark.operators.flac_codec import (
            decode_flac,
        )
        return decode_flac(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        # peek the fmt tag to route compressed WAV variants
        pos = 12
        while pos + 8 <= len(payload):
            cid = payload[pos:pos + 4]
            size = int.from_bytes(payload[pos + 4:pos + 8], "little")
            if cid == b"fmt ":
                code = int.from_bytes(payload[pos + 8:pos + 10], "little")
                if code == 7:
                    return decode_wav_mulaw(payload)
                if code == 0x11:
                    return decode_wav_ima_adpcm(payload)
                break
            pos += 8 + size + (size & 1)
        return decode_wav(payload)
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    try:
        import soundfile  # noqa: F401
    except ImportError as err:
        raise NotImplementedError(
            "non-WAV audio decode requires soundfile (not in this "
            "environment); PCM WAV decodes natively via decode_wav"
        ) from err


def decode_ppm_stream(payload: bytes) -> list[tuple[int, int, bytes]]:
    """Parse a concatenated-PPM stream (the simplest self-describing
    multi-frame container: back-to-back P6 images, an MJPEG-style
    layout) into per-frame (width, height, raw RGB). Each frame's
    length comes from its own header, so the walk is sequential and
    exact; malformed frames raise rather than resync silently."""
    frames = []
    pos = 0
    while pos < len(payload):
        if payload[pos:pos + 2] != b"P6":
            raise ValueError(f"frame boundary not P6 at offset {pos}")
        w, h, raw = decode_ppm(payload[pos:])
        frames.append((w, h, raw))
        # re-walk this frame's header to find the body start
        rest = payload[pos:]
        fields = 0
        i = 2
        while fields < 3:
            c = rest[i:i + 1]
            if c == b"#":
                i = rest.index(b"\n", i) + 1
            elif c.isspace():
                i += 1
            else:
                while not rest[i:i + 1].isspace():
                    i += 1
                fields += 1
        pos += i + 1 + w * h * 3
    return frames


def frame_sample(payload: bytes, every_n: int = 10):
    """Video frame sampling. Concatenated-PPM streams decode with the
    engine's own parser (every ``every_n``-th frame, real pixels, no
    dependencies); MP4/ISO-BMFF containers demux natively via
    operators.mp4_codec (sample-table expansion, still-encoded frame
    payloads — the shape a downstream decoder pool consumes); other
    containers need PyAV, absent from the v1 container — those raise
    with a clear error."""
    if payload[:2] == b"P6":
        return decode_ppm_stream(payload)[::every_n]
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        from aether_firebase_consumer_spark.operators.mp4_codec import (
            sample_video_frames,
        )
        return sample_video_frames(payload, every_n=every_n)
    try:
        import av  # noqa: F401
    except ImportError as err:
        raise NotImplementedError(
            "non-MP4 container frame sampling requires PyAV (not in "
            "this environment); concatenated-PPM streams and MP4 "
            "containers decode natively via decode_ppm_stream / "
            "operators.mp4_codec") from err


# --------------------------------------------------------------- pipeline

def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column via
    mapInPandas — the real distribution path a codec kernel would use.
    The deterministic fake kernel computes (n_bytes, first_byte, md5)
    so tests (and the DuckDB oracle) can verify the plumbing exactly."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len),
                "first_byte": payloads.map(lambda b: b[0] if len(b) else -1),
                "content_md5": payloads.map(
                    lambda b: hashlib.md5(b).hexdigest()),
            })

    return df.select("doc_id", "payload").mapInPandas(kernel, FEATURE_SCHEMA)


RESIZE_SCHEMA = ("doc_id bigint, width int, height int, payload binary")


def resize_images(df: DataFrame, target_w: int = 64,
                  target_h: int = 64) -> DataFrame:
    """Image resize over binary payloads — the 1→1 transform shape of a
    decode kernel. With PIL present the kernel decodes/resizes/re-
    encodes; in this environment a deterministic fake stands in
    (pseudo-dims + truncated payload) so the Arrow batch plumbing,
    schema contract, and partition behavior are fully tested. Each
    output row is bounded (target size), so batch memory is
    target_w·target_h·batch_size regardless of input blob size."""
    try:
        from PIL import Image  # noqa: F401
        have_pil = True
    except ImportError:
        have_pil = False

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if have_pil:  # pragma: no cover - codec not in this image
                import io
                from PIL import Image as I
                resized = []
                for b in pdf["payload"]:
                    img = I.open(io.BytesIO(b)).resize((target_w, target_h))
                    buf = io.BytesIO()
                    img.save(buf, "PNG")
                    resized.append(buf.getvalue())
                out_payload = resized
            else:
                # deterministic fake: clamp payload to target byte budget
                out_payload = [bytes(b[:target_w * target_h])
                               for b in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": target_w,
                "height": target_h,
                "payload": out_payload,
            })

    return df.select("doc_id", "payload").mapInPandas(kernel, RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame binary"


def sample_frames(df: DataFrame, frame_bytes: int = 256,
                  every_n: int = 4) -> DataFrame:
    """Video frame sampling — the 1→N flatMap shape: each input blob
    yields multiple frame rows (every Nth frame). With PyAV present the
    kernel demuxes real frames; the deterministic fake treats the blob
    as fixed-size chunks. mapInPandas naturally expresses the fan-out
    (output batch rows ≠ input batch rows) while staying Arrow-batched;
    at 100 TB the fan-out factor multiplies rows, not blob bytes, since
    each frame row carries only its own slice."""
    try:
        import av  # noqa: F401
        have_av = True
    except ImportError:
        have_av = False

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                if have_av:  # pragma: no cover - codec not in this image
                    raise NotImplementedError("real demux path untested here")
                n_chunks = max(1, len(b) // frame_bytes)
                for i in range(0, n_chunks, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(bytes(b[i * frame_bytes:(i + 1) * frame_bytes]))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.select("doc_id", "payload").mapInPandas(kernel, FRAME_SCHEMA)


IMAGE_SCAN_SCHEMA = ("path string, fmt string, width int, height int, "
                     "channels int, n_pixel_bytes bigint, ok boolean, "
                     "error string")


def scan_image_files(spark, path: str,
                     glob: str = "*.{png,bmp,gif,jpg,jpeg,ppm,tif,tiff}"):
    """Real-file multimodal ingestion: list + ship image files via the
    ``binaryFile`` datasource (executor-side content, parallelism =
    file count) and decode each with the engine's native codecs
    (PNG/BMP/GIF/JPEG/PPM — ``decode_image`` dispatch) inside an Arrow
    kernel. Returns one metadata row per file; corrupt/unsupported
    files are QUARANTINED as ok=false rows with the error message —
    a 100 TB crawl must never die on one bad blob."""
    import pandas as pd
    from typing import Iterator

    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", glob).load(path)
             .select("path", "content"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                b = bytes(content)
                fmt = ("png" if b[:8] == b"\x89PNG\r\n\x1a\n" else
                       "bmp" if b[:2] == b"BM" else
                       "gif" if b[:6] in (b"GIF87a", b"GIF89a") else
                       "jpeg" if b[:2] == b"\xff\xd8" else
                       "tiff" if (b[:2] in (b"II", b"MM")
                                  and b[2:4] in (b"*\x00", b"\x00*")) else
                       "ppm" if b[:2] == b"P6" else "unknown")
                try:
                    decoded = decode_image(b)
                    if len(decoded) == 4:
                        w, h, ch, raw = decoded
                    else:  # ppm/bmp return (w, h, raw) rgb
                        w, h, raw = decoded
                        ch = 3
                    rows.append((p, fmt, w, h, ch, len(raw), True, None))
                except Exception as err:  # noqa: BLE001 — quarantine,
                    # never die: truncated files raise struct.error /
                    # IndexError / zlib.error, not just ValueError
                    rows.append((p, fmt, None, None, None, None, False,
                                 f"{type(err).__name__}: {err}"))
            yield pd.DataFrame(rows, columns=[
                "path", "fmt", "width", "height", "channels",
                "n_pixel_bytes", "ok", "error"])

    return files.mapInPandas(kernel, IMAGE_SCAN_SCHEMA)
