"""Pure-Python PNG and BMP codecs (stdlib only: zlib + struct).

Closes more of the multimodal codec gap (SURVEY.md §2.3) without PIL:
after PPM (P6) and PCM WAV, these add the two most common uncompressed/
losslessly-compressed image containers a training corpus actually
carries. Real bytes in, real pixels out — the Arrow ``mapInPandas``
kernels in ``plans/multimodal_queries.py`` run these codecs inside
oracle-gated queries.

Scope (raised as ``ValueError`` outside it, never silently wrong):

* PNG: 8-bit depth, color types 0 (grayscale), 2 (RGB), 6 (RGBA);
  all five scanline filters (None/Sub/Up/Average/Paeth) on decode,
  palette (color type 3, PLTE) expanded to RGB, Adam7 interlacing;
  no 16-bit. That covers the vast
  majority of ML-corpus PNGs; the rest raise with a clear message.
* BMP: BITMAPINFOHEADER, 24-bit BI_RGB (uncompressed), bottom-up or
  top-down, 4-byte row padding.

The PNG format is public (RFC 2083 / ISO 15948): signature, length-
tag-data-CRC chunks, IDAT = zlib stream of filter-tagged scanlines.
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: Adam7 interlace lattice: (x_init, y_init, x_step, y_step) per pass
ADAM7_PASSES = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

#: channels per pixel for the supported PNG color types
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


# ------------------------------------------------------------------ PNG

def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", crc32(tag + data) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_scanline(ftype: int, row: bytes, prev: bytes, bpp: int) -> bytes:
    """Apply PNG filter ``ftype`` to a raw scanline (encode side)."""
    n = len(row)
    if ftype == 0:
        return bytes(row)
    out = bytearray(n)
    for i in range(n):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        elif ftype == 4:
            pred = _paeth(a, b, c)
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[i] = (row[i] - pred) & 0xFF
    return bytes(out)


def _unfilter_scanline(ftype: int, row: bytearray, prev: bytes,
                       bpp: int) -> None:
    """Undo PNG filter ``ftype`` in place (decode side)."""
    n = len(row)
    if ftype == 0:
        return
    if ftype == 1:
        for i in range(bpp, n):
            row[i] = (row[i] + row[i - bpp]) & 0xFF
    elif ftype == 2:
        for i in range(n):
            row[i] = (row[i] + prev[i]) & 0xFF
    elif ftype == 3:
        for i in range(n):
            a = row[i - bpp] if i >= bpp else 0
            row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
    elif ftype == 4:
        for i in range(n):
            a = row[i - bpp] if i >= bpp else 0
            c = prev[i - bpp] if i >= bpp else 0
            row[i] = (row[i] + _paeth(a, prev[i], c)) & 0xFF
    else:
        raise ValueError(f"bad PNG filter type {ftype}")


def encode_png(w: int, h: int, raw: bytes, color_type: int = 2,
               filter_type: int = 0, compress_level: int = 6) -> bytes:
    """Encode raw 8-bit pixel bytes as a PNG. ``raw`` is row-major,
    ``w*h*channels`` bytes. ``filter_type`` applies one filter to every
    scanline (0..4) — the per-row-different-filter case is what the
    decoder's round-trip tests exercise."""
    ch = _PNG_CHANNELS.get(color_type)
    if ch is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if len(raw) != w * h * ch:
        raise ValueError("raw pixel buffer does not match w*h*channels")
    stride = w * ch
    lines = bytearray()
    prev = bytes(stride)
    for y in range(h):
        row = raw[y * stride:(y + 1) * stride]
        lines.append(filter_type)
        lines += _filter_scanline(filter_type, row, prev, ch)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (PNG_SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(lines), compress_level))
            + _chunk(b"IEND", b""))


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG: returns (width, height, channels, raw pixel bytes,
    row-major). Verifies the signature and per-chunk CRCs; supports
    8-bit gray/RGB/RGBA and palette (PLTE, expanded to RGB) with any
    mix of scanline filters, plus Adam7 interlaced layouts; raises
    ``ValueError`` for 16-bit/gray+alpha (out of scope)."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos = 8
    w = h = ch = None
    palette = None
    color_type = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length:pos + 12 + length])
        if crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data)
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if comp or filt:
                raise ValueError("nonstandard PNG compression/filter method")
            if color_type == 3:
                ch = 1  # palette indices; expanded to RGB after unfilter
            else:
                ch = _PNG_CHANNELS.get(color_type)
            if ch is None:
                raise ValueError(
                    f"unsupported PNG color type {color_type} "
                    "(gray+alpha out of scope)")
        elif tag == b"PLTE":
            if length % 3:
                raise ValueError("PLTE length not a multiple of 3")
            palette = bytes(data)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    lines = zlib.decompress(bytes(idat))
    stride = w * ch
    out = bytearray(h * stride)
    if interlace:
        # Adam7: seven sub-images, each with its own filtered
        # scanlines, scattered onto the (x_init, y_init, x_step,
        # y_step) lattice
        pos2 = 0
        for (xi, yi, xs, ys) in ADAM7_PASSES:
            wp = -(-(w - xi) // xs) if w > xi else 0
            hp = -(-(h - yi) // ys) if h > yi else 0
            if wp == 0 or hp == 0:
                continue
            sp = wp * ch
            prev = bytes(sp)
            for ry in range(hp):
                if pos2 + 1 + sp > len(lines):
                    raise ValueError("PNG scanline data length mismatch")
                ftype = lines[pos2]
                row = bytearray(lines[pos2 + 1:pos2 + 1 + sp])
                pos2 += 1 + sp
                _unfilter_scanline(ftype, row, prev, ch)
                y = yi + ry * ys
                for rx in range(wp):
                    x = xi + rx * xs
                    out[(y * w + x) * ch:(y * w + x + 1) * ch] = \
                        row[rx * ch:(rx + 1) * ch]
                prev = bytes(row)
        if pos2 != len(lines):
            raise ValueError("PNG scanline data length mismatch")
    else:
        if len(lines) != h * (stride + 1):
            raise ValueError("PNG scanline data length mismatch")
        prev = bytes(stride)
        for y in range(h):
            base = y * (stride + 1)
            ftype = lines[base]
            row = bytearray(lines[base + 1:base + 1 + stride])
            _unfilter_scanline(ftype, row, prev, ch)
            out[y * stride:(y + 1) * stride] = row
            prev = bytes(row)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE chunk")
        rgb = bytearray(w * h * 3)
        for i, ci in enumerate(out):
            if ci * 3 + 3 > len(palette):
                raise ValueError(f"palette index {ci} out of range")
            rgb[i * 3:i * 3 + 3] = palette[ci * 3:ci * 3 + 3]
        return w, h, 3, bytes(rgb)
    return w, h, ch, bytes(out)


# ------------------------------------------------------------------ GIF

def _lzw_decode(min_code_size: int, data: bytes) -> list[int]:
    """GIF-variant LZW: variable-width codes LSB-first, CLEAR resets
    the dictionary, widths grow at dictionary size 2^width up to 12
    bits. Returns the decoded index stream."""
    clear = 1 << min_code_size
    end = clear + 1

    def reset():
        return {i: (i,) for i in range(clear)}, min_code_size + 1

    table, width = reset()
    next_code = end + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    acc = nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                return out  # missing END: tolerate truncated streams
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table, width = reset()
            next_code = end + 1
            prev = None
            continue
        if code == end:
            return out
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            raise ValueError(f"corrupt LZW stream (code {code})")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry


def _lzw_encode(min_code_size: int, indexes: "list[int]") -> bytes:
    """GIF-variant LZW encode (dictionary growth, width bumps) — the
    inverse of :func:`_lzw_decode`; round-trip property-tested against
    an independent encoder in the test suite."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    table = {(i,): i for i in range(clear)}
    next_code, width = end + 1, min_code_size + 1
    out_bits: list[int] = []

    def emit(code: int, w: int) -> None:
        for b in range(w):
            out_bits.append((code >> b) & 1)

    emit(clear, width)
    prev: tuple[int, ...] = ()
    for ix in indexes:
        cur = prev + (ix,)
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        if next_code < 4096:
            table[cur] = next_code
            next_code += 1
        prev = (ix,)
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
    if prev:
        emit(table[prev], width)
    emit(end, width)
    by = bytearray()
    for i in range(0, len(out_bits), 8):
        by.append(sum(bit << j for j, bit in enumerate(out_bits[i:i + 8])))
    return bytes(by)


def encode_gif(w: int, h: int, palette: bytes,
               indexes: "list[int]",
               min_code_size: int | None = None) -> bytes:
    """Encode one palette-indexed frame as a GIF89a (global color
    table, real LZW compression). ``palette`` is RGB triples; indexes
    are row-major pixel palette positions. ``min_code_size`` defaults
    to the palette's bit width — an explicit smaller value would leave
    high palette indexes unencodable (KeyError in the LZW root
    table)."""
    if len(indexes) != w * h:
        raise ValueError("index buffer does not match w*h")
    n = max(4, len(palette) // 3)
    bits = max(2, (n - 1).bit_length())
    if min_code_size is None:
        min_code_size = bits
    pal = bytearray(palette) + b"\x00" * (3 * (1 << bits) - len(palette))
    gif = bytearray(b"GIF89a")
    gif += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    gif += bytes([0x80 | (bits - 1), 0, 0]) + pal
    gif += (b"\x2c\x00\x00\x00\x00" + w.to_bytes(2, "little")
            + h.to_bytes(2, "little") + b"\x00")
    gif += bytes([min_code_size])
    lzw = _lzw_encode(min_code_size, indexes)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        gif += bytes([len(chunk)]) + chunk
    gif += b"\x00\x3b"
    return bytes(gif)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> tuple[int, int, bytes]:
    """Decode the FIRST frame of a GIF87a/89a: returns (width, height,
    raw RGB bytes row-major). Full LZW (dictionary growth, variable
    code widths, KwKwK, CLEAR) and Adam-style interlacing; extensions
    (incl. GCE transparency, ignored for the RGB render) are skipped
    per spec. Later animation frames raise nothing — the first image
    descriptor wins, as for thumbnailing."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw = int.from_bytes(payload[6:8], "little")  # noqa: F841 (screen size)
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[pos:pos + 3 * n]
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos]:
                pos += payload[pos] + 1
            pos += 1
        elif b == 0x2C:  # image descriptor
            w = int.from_bytes(payload[pos + 5:pos + 7], "little")
            h = int.from_bytes(payload[pos + 7:pos + 9], "little")
            ipacked = payload[pos + 9]
            pos += 10
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                ct = payload[pos:pos + 3 * n]
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF image has no color table")
            min_code = payload[pos]
            pos += 1
            lzw = bytearray()
            while payload[pos]:
                size = payload[pos]
                lzw += payload[pos + 1:pos + 1 + size]
                pos += size + 1
            idx = _lzw_decode(min_code, bytes(lzw))[:w * h]
            if len(idx) < w * h:
                raise ValueError("truncated GIF pixel data")
            if ipacked & 0x40:  # interlaced: remap row order
                rows = []
                for start, step in _GIF_INTERLACE_PASSES:
                    rows.extend(range(start, h, step))
                remapped = [0] * (w * h)
                for src_row, dst_row in enumerate(rows):
                    remapped[dst_row * w:(dst_row + 1) * w] = \
                        idx[src_row * w:(src_row + 1) * w]
                idx = remapped
            out = bytearray(w * h * 3)
            for i, ci in enumerate(idx):
                if ci * 3 + 3 > len(ct):
                    raise ValueError(f"palette index {ci} out of range")
                out[i * 3:i * 3 + 3] = ct[ci * 3:ci * 3 + 3]
            return w, h, bytes(out)
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image data")


# ------------------------------------------------------------------ BMP

def encode_bmp(w: int, h: int, raw_rgb: bytes) -> bytes:
    """Encode raw RGB bytes (row-major, top-down) as a 24-bit BI_RGB
    BMP with the conventional bottom-up row order and 4-byte padding."""
    if len(raw_rgb) != w * h * 3:
        raise ValueError("raw pixel buffer does not match w*h*3")
    pad = (-(w * 3)) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = raw_rgb[y * w * 3:(y + 1) * w * 3]
        # BMP stores BGR
        for x in range(w):
            body += row[x * 3 + 2:x * 3 + 3]
            body += row[x * 3 + 1:x * 3 + 2]
            body += row[x * 3:x * 3 + 1]
        body += b"\x00" * pad
    pixel_off = 14 + 40
    size = pixel_off + len(body)
    header = (b"BM" + struct.pack("<IHHI", size, 0, 0, pixel_off)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(body), 2835, 2835, 0, 0))
    return header + bytes(body)


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a 24-bit BI_RGB BMP: returns (width, height, raw RGB
    bytes row-major top-down). Handles bottom-up (positive height) and
    top-down (negative height) layouts and row padding; compressed or
    non-24-bit BMPs raise ``ValueError``."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pixel_off,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER BMP not supported")
    w, h_signed = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only 24-bit BI_RGB supported (got bpp={bpp}, "
            f"compression={compression})")
    top_down = h_signed < 0
    h = abs(h_signed)
    pad = (-(w * 3)) % 4
    stride = w * 3 + pad
    out = bytearray(w * h * 3)
    for i in range(h):
        y = i if top_down else h - 1 - i
        base = pixel_off + i * stride
        row = payload[base:base + w * 3]
        if len(row) != w * 3:
            raise ValueError("truncated BMP pixel data")
        dst = y * w * 3
        for x in range(w):
            out[dst + x * 3] = row[x * 3 + 2]      # R <- B slot
            out[dst + x * 3 + 1] = row[x * 3 + 1]  # G
            out[dst + x * 3 + 2] = row[x * 3]      # B <- R slot
    return w, h, bytes(out)


# ------------------------------------------------------------------ TIFF

_TIFF_TAGS = {256: "width", 257: "height", 258: "bits_per_sample",
              259: "compression", 262: "photometric",
              273: "strip_offsets", 277: "samples_per_pixel",
              278: "rows_per_strip", 279: "strip_byte_counts",
              317: "predictor"}

#: TIFF 6.0 Compression tag values this codec speaks
_TIFF_COMP_NONE, _TIFF_COMP_LZW, _TIFF_COMP_DEFLATE = 1, 5, 8
_TIFF_COMP_PACKBITS, _TIFF_COMP_DEFLATE_OLD = 32773, 32946


def _packbits_decode(data: bytes) -> bytes:
    """TIFF PackBits (Apple RLE): n in 0..127 → copy n+1 literals;
    n in 129..255 (signed -1..-127) → repeat next byte 257-n times;
    n == 128 → no-op."""
    out = bytearray()
    pos, n = 0, len(data)
    while pos < n:
        c = data[pos]
        pos += 1
        if c < 128:
            end = pos + c + 1
            if end > n:
                raise ValueError("PackBits: truncated literal run")
            out += data[pos:end]
            pos = end
        elif c > 128:
            if pos >= n:
                raise ValueError("PackBits: truncated replicate run")
            out += bytes([data[pos]]) * (257 - c)
            pos += 1
    return bytes(out)


def _packbits_encode_row(row: bytes) -> bytes:
    """One scanline → PackBits (spec: rows compress independently)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        # find run length at i
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(row[i])
            i += run
            continue
        # literal stretch: until a >=3 run starts (2-runs stay literal,
        # matching common writers) or 128 bytes
        j = i + 1
        while j < n and j - i < 128:
            if j + 2 < n and row[j] == row[j + 1] == row[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += row[i:j]
        i = j
    return bytes(out)


def _tiff_lzw_decode(data: bytes) -> bytes:
    """TIFF 6.0 LZW: MSB-first code packing, Clear=256, EOI=257, new
    entries from 258, EARLY code-width change (width bumps when the
    next entry to be added is 2^width - 1 — the spec's famous
    off-by-one vs GIF)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None
    acc = nbits = 0
    pos, n = 0, len(data)

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)          # missing EOI: tolerate EOF
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            reset()
            continue
        if code == EOI:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError("TIFF LZW: first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):           # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("TIFF LZW: code out of range")
        out += entry
        prev = entry
        # early change, decoder side: the decoder's table lags the
        # encoder's by exactly one entry (the entry linking THIS code
        # to the next one is not known yet), so it must bump one entry
        # earlier than the encoder's nxt == 2^w - 1 rule
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF 6.0 LZW encoder (mirror of the decoder's early change:
    width bumps when the NEXT code to be assigned is 2^width - 1;
    table resets via Clear at 4094 entries)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {}
    width = 9
    nxt = 258

    def reset() -> None:
        nonlocal table, width, nxt
        table = {bytes([i]): i for i in range(256)}
        width = 9
        nxt = 258

    reset()
    emit(CLEAR, width)
    omega = b""
    for i in range(len(data)):
        k = data[i:i + 1]
        if omega + k in table:
            omega += k
            continue
        emit(table[omega], width)
        table[omega + k] = nxt
        nxt += 1
        if nxt == (1 << width) - 1 and width < 12:          # early change
            width += 1
        omega = k
        if nxt >= 4094:                    # spec: clear before overflow
            emit(CLEAR, width)
            reset()
    if omega:
        emit(table[omega], width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _hdiff(raw: bytes, w: int, ch: int, *, decode: bool) -> bytes:
    """TIFF predictor 2 (horizontal differencing), per scanline: each
    sample stores (decode: accumulates) the delta vs the same sample
    of the previous pixel, mod 256."""
    out = bytearray(raw)
    stride = w * ch
    for r in range(0, len(raw), stride):
        if decode:
            for i in range(r + ch, r + stride):
                out[i] = (out[i] + out[i - ch]) & 0xFF
        else:
            for i in range(r + stride - 1, r + ch - 1, -1):
                out[i] = (out[i] - out[i - ch]) & 0xFF
    return bytes(out)


def decode_tiff(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline TIFF (both byte orders): returns (width,
    height, channels, raw pixels row-major). Scope: 8-bit grayscale
    or RGB, strip-organized, first IFD only; compression 1 (none),
    5 (LZW, with predictor 2 horizontal differencing), 8/32946
    (Deflate), or 32773 (PackBits) — each strip decompresses
    independently per the spec. JPEG-in-TIFF, tiles, and planar
    configs raise ``ValueError``. The format is public (TIFF 6.0
    spec): II/MM magic, 42, IFD of (tag, type, count, value) entries,
    pixel data addressed by StripOffsets/StripByteCounts."""
    if payload[:2] == b"II":
        endian = "little"
    elif payload[:2] == b"MM":
        endian = "big"
    else:
        raise ValueError("not a TIFF payload")

    def u16(off: int) -> int:
        return int.from_bytes(payload[off:off + 2], endian)

    def u32(off: int) -> int:
        return int.from_bytes(payload[off:off + 4], endian)

    if u16(2) != 42:
        raise ValueError("bad TIFF magic number")
    ifd = u32(4)
    n = u16(ifd)
    tags: dict[str, list[int]] = {}
    for i in range(n):
        e = ifd + 2 + i * 12
        tag, typ, count = u16(e), u16(e + 2), u32(e + 4)
        if tag not in _TIFF_TAGS:
            continue
        size = {1: 1, 3: 2, 4: 4}.get(typ)
        if size is None:
            continue
        total = size * count
        off = e + 8 if total <= 4 else u32(e + 8)
        vals = [int.from_bytes(payload[off + k * size:
                                       off + (k + 1) * size], endian)
                for k in range(count)]
        tags[_TIFF_TAGS[tag]] = vals
    try:
        w = tags["width"][0]
        h = tags["height"][0]
        offsets = tags["strip_offsets"]
        counts = tags["strip_byte_counts"]
    except KeyError as err:
        raise ValueError(f"TIFF missing required tag: {err}") from err
    comp = tags.get("compression", [_TIFF_COMP_NONE])[0]
    if comp not in (_TIFF_COMP_NONE, _TIFF_COMP_LZW, _TIFF_COMP_DEFLATE,
                    _TIFF_COMP_DEFLATE_OLD, _TIFF_COMP_PACKBITS):
        raise ValueError(f"TIFF compression {comp} not supported "
                         "(none/LZW/Deflate/PackBits)")
    ch = tags.get("samples_per_pixel", [1])[0]
    if ch not in (1, 3):
        raise ValueError(f"{ch} samples/pixel not supported")
    bps = tags.get("bits_per_sample", [8])
    if any(b != 8 for b in bps):
        raise ValueError("only 8-bit samples supported")
    predictor = tags.get("predictor", [1])[0]
    if predictor not in (1, 2):
        raise ValueError(f"TIFF predictor {predictor} not supported")
    data = bytearray()
    for off, cnt in zip(offsets, counts):
        strip = payload[off:off + cnt]
        if comp == _TIFF_COMP_LZW:
            strip = _tiff_lzw_decode(strip)
        elif comp in (_TIFF_COMP_DEFLATE, _TIFF_COMP_DEFLATE_OLD):
            import zlib as _zlib
            strip = _zlib.decompress(strip)
        elif comp == _TIFF_COMP_PACKBITS:
            strip = _packbits_decode(strip)
        data += strip
    if len(data) < w * h * ch:
        raise ValueError("truncated TIFF strip data")
    raw = bytes(data[:w * h * ch])
    if predictor == 2:
        raw = _hdiff(raw, w, ch, decode=True)
    return w, h, ch, raw


_TIFF_COMP_NAMES = {"none": _TIFF_COMP_NONE, "lzw": _TIFF_COMP_LZW,
                    "deflate": _TIFF_COMP_DEFLATE,
                    "packbits": _TIFF_COMP_PACKBITS}


def encode_tiff(w: int, h: int, raw: bytes, channels: int = 3,
                endian: str = "little", compression: str = "none",
                predictor: int = 1) -> bytes:
    """Encode 8-bit gray/RGB pixels as a single-strip baseline TIFF
    (II or MM byte order). ``compression``: "none", "lzw" (TIFF 6.0
    early-change LZW), "deflate" (tag 8, zlib), or "packbits" (rows
    compressed independently, per the spec). ``predictor=2`` applies
    horizontal differencing before compression (tag 317; its wins
    come with lzw/deflate)."""
    if len(raw) != w * h * channels:
        raise ValueError("pixel buffer does not match w*h*channels")
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    comp = _TIFF_COMP_NAMES.get(compression)
    if comp is None:
        raise ValueError(f"unknown TIFF compression {compression!r}")
    if predictor not in (1, 2):
        raise ValueError("predictor must be 1 or 2")
    order = endian
    magic = b"II" if order == "little" else b"MM"

    def p16(v: int) -> bytes:
        return v.to_bytes(2, order)

    def p32(v: int) -> bytes:
        return v.to_bytes(4, order)

    strip = raw if predictor == 1 else _hdiff(raw, w, channels,
                                              decode=False)
    if comp == _TIFF_COMP_LZW:
        strip = _tiff_lzw_encode(strip)
    elif comp == _TIFF_COMP_DEFLATE:
        import zlib as _zlib
        strip = _zlib.compress(strip)
    elif comp == _TIFF_COMP_PACKBITS:
        stride = w * channels
        strip = b"".join(_packbits_encode_row(strip[r:r + stride])
                         for r in range(0, len(strip), stride))

    # layout: header(8) | pixel data | IFD
    data_off = 8
    ifd_off = data_off + len(strip)
    entries = [
        (256, 3, 1, w), (257, 3, 1, h),
        (259, 3, 1, comp),
        (262, 3, 1, 1 if channels == 1 else 2),
        (273, 4, 1, data_off),             # single strip
        (277, 3, 1, channels),
        (278, 3, 1, h),
        (279, 4, 1, len(strip)),
    ]
    if predictor == 2:
        entries.append((317, 3, 1, 2))
    bps_extra = b""
    if channels == 3:
        # bits_per_sample needs 3 shorts -> external value area after IFD
        bps_off = ifd_off + 2 + 12 * (len(entries) + 1) + 4
        entries.append((258, 3, 3, bps_off))
        bps_extra = p16(8) + p16(8) + p16(8)
    else:
        entries.append((258, 3, 1, 8))
    entries.sort()
    ifd = p16(len(entries))
    for (tag, typ, count, val) in entries:
        size = {3: 2, 4: 4}[typ]
        if size * count <= 4:
            packed = val.to_bytes(size, order) if count == 1 else b""
            packed = packed + b"\x00" * (4 - len(packed))
        else:
            packed = p32(val)
        ifd += p16(tag) + p16(typ) + p32(count) + packed
    ifd += p32(0)  # no next IFD
    return magic + p16(42) + p32(ifd_off) + strip + ifd + bps_extra
