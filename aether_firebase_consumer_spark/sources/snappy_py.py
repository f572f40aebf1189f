"""Pure-Python Snappy block-format codec (stdlib only).

Kafka record batches (magic 2) mark compression in the batch
attributes' low bits; codec id 2 is Snappy over the records section
in Snappy's RAW BLOCK format (no xerial/streaming framing — that
wrapper applies only to legacy magic-0/1 message sets). The image has
no ``python-snappy``/``cramjam``, so this module implements the block
format from the public specification
(github.com/google/snappy/blob/main/format_description.txt) exactly
like ``kafka_wire`` implements the wire protocol and ``avro_codec``
the Avro spec — so the jar-free Kafka stack gains the second of the
two codecs real brokers serve most (gzip landed earlier; zstd/lz4
stay env-gated, their formats are not stdlib-reproducible in
reasonable space).

Format recap (all public):

- preamble: uncompressed length as a little-endian base-128 varint;
- a sequence of elements, each starting with a tag byte whose low two
  bits select the type:

  - ``00`` literal: length-1 in the high 6 bits; values 60..63 mean
    the length-1 follows in 1..4 little-endian bytes;
  - ``01`` copy, 1-byte offset: length-4 in bits 2..4, offset's high
    3 bits in bits 5..7 plus one trailing byte (len 4..11,
    offset 1..2047);
  - ``10`` copy, 2-byte offset: length-1 in the high 6 bits, offset
    in 2 trailing LE bytes (len 1..64, offset 1..65535);
  - ``11`` copy, 4-byte offset: same but 4 offset bytes.

Copies may overlap their output (offset < length) — the RLE idiom —
so the decoder appends byte-ranges in bounded chunks rather than one
slice.

The compressor is the reference scheme reduced to its core: a 1-entry-
per-bucket hash table over 4-byte sequences, greedy match extension,
64-byte-capped copy emission. Any literal/copy partition of the input
is valid Snappy, so correctness never depends on match quality;
``decompress(compress(x)) == x`` is property-tested, and the
decompressor is additionally pinned against fixed spec-built vectors
(see tests/test_snappy_py.py) so both directions are anchored
independently.
"""

from __future__ import annotations

__all__ = ["compress", "decompress"]

_MAX_COPY_LEN = 64
_MIN_MATCH = 4


def _uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    """Little-endian base-128 varint at ``pos`` → (value, next_pos)."""
    result = shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("snappy: truncated varint preamble")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy: varint too long")


def _put_uvarint(n: int) -> bytes:
    out = bytearray()
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out)


def decompress(data: bytes) -> bytes:
    """Decode one Snappy block. Raises ``ValueError`` on any framing
    error or on an output-length mismatch with the preamble."""
    expect, pos = _uvarint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        typ = tag & 0x03
        if typ == 0:                                 # literal
            ln = tag >> 2
            if ln >= 60:                             # 1..4 extra bytes
                extra = ln - 59
                if pos + extra > n:
                    raise ValueError("snappy: truncated literal length")
                ln = int.from_bytes(data[pos:pos + extra], "little")
                pos += extra
            ln += 1
            if pos + ln > n:
                raise ValueError("snappy: truncated literal body")
            out += data[pos:pos + ln]
            pos += ln
            continue
        if typ == 1:                                 # copy, 1-byte offset
            ln = ((tag >> 2) & 0x07) + 4
            if pos >= n:
                raise ValueError("snappy: truncated copy-1 offset")
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif typ == 2:                               # copy, 2-byte offset
            ln = (tag >> 2) + 1
            if pos + 2 > n:
                raise ValueError("snappy: truncated copy-2 offset")
            off = int.from_bytes(data[pos:pos + 2], "little")
            pos += 2
        else:                                        # copy, 4-byte offset
            ln = (tag >> 2) + 1
            if pos + 4 > n:
                raise ValueError("snappy: truncated copy-4 offset")
            off = int.from_bytes(data[pos:pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy: copy offset out of range")
        # overlapping copies re-read bytes this same copy produced
        start = len(out) - off
        while ln > 0:
            chunk = out[start:start + min(ln, off)]
            out += chunk
            start += len(chunk)
            ln -= len(chunk)
    if len(out) != expect:
        raise ValueError(
            f"snappy: output length {len(out)} != preamble {expect}")
    return bytes(out)


def _emit_literal(out: bytearray, data: bytes, start: int, end: int) -> None:
    ln = end - start
    if ln <= 0:
        return
    n = ln - 1
    if n < 60:
        out.append(n << 2)
    else:
        nbytes = (n.bit_length() + 7) // 8
        out.append((59 + nbytes) << 2)
        out += n.to_bytes(nbytes, "little")
    out += data[start:end]


def _emit_copy(out: bytearray, off: int, ln: int) -> None:
    # split long matches into <=64-byte copies, keeping every fragment
    # >= 4 so the copy-1 form stays encodable (spec's 4..11 window)
    while ln > 0:
        this = min(ln, _MAX_COPY_LEN)
        if ln - this in (1, 2, 3):
            this = ln - _MIN_MATCH       # leave a >=4-byte remainder
        if 4 <= this <= 11 and off < 2048:
            out.append(0x01 | ((this - 4) << 2) | ((off >> 8) << 5))
            out.append(off & 0xFF)
        elif off < 65536:
            out.append(0x02 | ((this - 1) << 2))
            out += off.to_bytes(2, "little")
        else:
            out.append(0x03 | ((this - 1) << 2))
            out += off.to_bytes(4, "little")
        ln -= this


def compress(data: bytes) -> bytes:
    """Encode one Snappy block (greedy hash-table matcher). Output is
    always valid Snappy; for inputs under 4 bytes it is the preamble
    plus one literal."""
    out = bytearray(_put_uvarint(len(data)))
    n = len(data)
    if n < _MIN_MATCH:
        _emit_literal(out, data, 0, n)
        return bytes(out)
    table: dict[bytes, int] = {}
    pos = lit_start = 0
    limit = n - _MIN_MATCH + 1
    while pos < limit:
        key = data[pos:pos + _MIN_MATCH]
        cand = table.get(key)
        table[key] = pos
        if cand is None or pos - cand > 0xFFFFFFFF:
            pos += 1
            continue
        # extend the match forward
        ln = _MIN_MATCH
        while pos + ln < n and data[cand + ln] == data[pos + ln]:
            ln += 1
        _emit_literal(out, data, lit_start, pos)
        _emit_copy(out, pos - cand, ln)
        pos += ln
        lit_start = pos
    _emit_literal(out, data, lit_start, n)
    return bytes(out)
