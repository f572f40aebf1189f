"""Pure-Python MPEG-audio framing + Ogg container layer (stdlib only).

Closes the compressed-audio DEMUX residue the same way
``mp4_codec`` closed video containers: the framing/container layer —
what a corpus pipeline needs to count, slice, deduplicate and
duration-estimate audio blobs — is implemented for real from the
public specs; only the psychoacoustic sample decode (out of scope,
like H.264) stays behind the soundfile gate.

- MP3 / MPEG audio (ISO/IEC 11172-3 §2.4.1.3, 13818-3): 4-byte frame
  headers — sync, version (1/2/2.5), layer (I/II/III), the public
  bitrate and sample-rate index tables, padding — and the spec frame
  length formulae (Layer I: ``(12·bitrate/rate + pad)·4``; Layer
  II/III: ``samples/8·bitrate/rate + pad``). The walker skips ID3v2
  (synchsafe size) and ID3v1 tags, reads a Xing/Info VBR frame count
  when present, and yields per-frame (offset, size, …) — enough to
  re-cut a stream at frame boundaries. ``build_mp3`` emits spec-valid
  framing around arbitrary payload bytes (a framer, not an encoder),
  giving tests and the DuckDB oracle an independent check of the same
  length formula.

- Ogg (RFC 3533): page header parse/write incl. the 255-lacing
  packet segmentation rule, continued-packet reassembly across pages,
  granule positions, and the spec CRC-32 (poly 0x04C11DB7, init 0,
  no reflection — NOT zlib's crc32), verified on read.

Reference consumed media only as opaque blobs (capability-gap
category, SURVEY.md §2.3 multimodal).
"""

from __future__ import annotations

import struct
from typing import Any, Dict, List, Optional, Sequence, Tuple

# ---------------------------------------------------------------- MP3

# Public tables, ISO/IEC 11172-3 / 13818-3. Index 0 = "free", 15 = bad.
# kbit/s, by (version-group, layer): V1 = MPEG1, V2 = MPEG2/2.5.
_BITRATE_KBPS = {
    ("V1", 1): [0, 32, 64, 96, 128, 160, 192, 224,
                256, 288, 320, 352, 384, 416, 448],
    ("V1", 2): [0, 32, 48, 56, 64, 80, 96, 112,
                128, 160, 192, 224, 256, 320, 384],
    ("V1", 3): [0, 32, 40, 48, 56, 64, 80, 96,
                112, 128, 160, 192, 224, 256, 320],
    ("V2", 1): [0, 32, 48, 56, 64, 80, 96, 112,
                128, 144, 160, 176, 192, 224, 256],
    ("V2", 2): [0, 8, 16, 24, 32, 40, 48, 56,
                64, 80, 96, 112, 128, 144, 160],
    ("V2", 3): [0, 8, 16, 24, 32, 40, 48, 56,
                64, 80, 96, 112, 128, 144, 160],
}
# Hz by version: MPEG1, MPEG2, MPEG2.5 (index 3 reserved).
_SAMPLE_RATE = {
    "1": [44100, 48000, 32000],
    "2": [22050, 24000, 16000],
    "2.5": [11025, 12000, 8000],
}
# samples per frame by (version-group, layer)
_SAMPLES = {("V1", 1): 384, ("V1", 2): 1152, ("V1", 3): 1152,
            ("V2", 1): 384, ("V2", 2): 1152, ("V2", 3): 576}


def _frame_length(vgroup: str, layer: int, bitrate_bps: int,
                  rate: int, padding: int) -> int:
    """Spec frame length in bytes (slot = 4 bytes for Layer I)."""
    if layer == 1:
        return (12 * bitrate_bps // rate + padding) * 4
    samples = _SAMPLES[(vgroup, layer)]
    return samples // 8 * bitrate_bps // rate + padding


def parse_mp3_frames(payload: bytes) -> Dict[str, Any]:
    """Walk an MPEG audio stream → frame table + summary.

    Returns ``{"frames": [{"offset","size","version","layer",
    "bitrate_kbps","sample_rate","samples","padding","channels"}],
    "duration_s", "avg_bitrate_kbps", "vbr", "xing_frames",
    "id3v2_bytes", "id3v1"}``. Raises ValueError on desync or a
    malformed header — a walker, not a salvager.
    """
    pos = 0
    id3v2 = 0
    if payload[:3] == b"ID3":
        if len(payload) < 10:
            raise ValueError("mp3: truncated ID3v2 header")
        # synchsafe 28-bit size, excludes the 10-byte header
        sz = 0
        for b in payload[6:10]:
            if b & 0x80:
                raise ValueError("mp3: non-synchsafe ID3v2 size")
            sz = (sz << 7) | b
        id3v2 = 10 + sz
        pos = id3v2
    end = len(payload)
    id3v1 = False
    if end - pos >= 128 and payload[end - 128:end - 125] == b"TAG":
        id3v1 = True
        end -= 128

    frames = []
    xing_frames: Optional[int] = None
    while pos < end:
        if end - pos < 4:
            raise ValueError(f"mp3: trailing garbage at {pos}")
        h = struct.unpack(">I", payload[pos:pos + 4])[0]
        if (h >> 21) & 0x7FF != 0x7FF:
            raise ValueError(f"mp3: lost frame sync at {pos}")
        vbits = (h >> 19) & 3            # 0=2.5, 2=MPEG2, 3=MPEG1
        if vbits == 1:
            raise ValueError("mp3: reserved MPEG version")
        version = {0: "2.5", 2: "2", 3: "1"}[vbits]
        vgroup = "V1" if version == "1" else "V2"
        lbits = (h >> 17) & 3            # 1=III, 2=II, 3=I
        if lbits == 0:
            raise ValueError("mp3: reserved layer")
        layer = 4 - lbits
        bidx = (h >> 12) & 0xF
        if bidx in (0, 15):
            raise ValueError("mp3: free/bad bitrate index")
        ridx = (h >> 10) & 3
        if ridx == 3:
            raise ValueError("mp3: reserved sample-rate index")
        padding = (h >> 9) & 1
        mode = (h >> 6) & 3              # 3 = mono
        kbps = _BITRATE_KBPS[(vgroup, layer)][bidx]
        rate = _SAMPLE_RATE[version][ridx]
        size = _frame_length(vgroup, layer, kbps * 1000, rate, padding)
        if size < 4 or pos + size > end:
            raise ValueError(f"mp3: frame at {pos} overruns stream")
        body = payload[pos + 4:pos + size]
        if not frames:
            # Xing/Info sits after the side-info block of frame 1
            for tag in (b"Xing", b"Info"):
                at = body.find(tag)
                if 0 <= at and at + 12 <= len(body):
                    flags = struct.unpack(
                        ">I", body[at + 4:at + 8])[0]
                    if flags & 1:
                        xing_frames = struct.unpack(
                            ">I", body[at + 8:at + 12])[0]
                    break
        frames.append({
            "offset": pos, "size": size, "version": version,
            "layer": layer, "bitrate_kbps": kbps, "sample_rate": rate,
            "samples": _SAMPLES[(vgroup, layer)], "padding": padding,
            "channels": 1 if mode == 3 else 2,
        })
        pos += size
    if not frames:
        raise ValueError("mp3: no frames")
    dur = sum(f["samples"] / f["sample_rate"] for f in frames)
    payload_bits = sum(f["size"] for f in frames) * 8
    return {
        "frames": frames, "duration_s": dur,
        "avg_bitrate_kbps": payload_bits / dur / 1000 if dur else 0.0,
        "vbr": len({f["bitrate_kbps"] for f in frames}) > 1,
        "xing_frames": xing_frames, "id3v2_bytes": id3v2, "id3v1": id3v1,
    }


def build_mp3(specs: Sequence[Tuple[str, int, int, int, int]],
              fill: int = 0x55, id3v2: bytes = b"",
              id3v1: bool = False) -> bytes:
    """Emit spec-valid MPEG-audio FRAMING around filler payloads (a
    framer for tests/oracles, not an encoder). ``specs`` entries:
    ``(version, layer, bitrate_index, rate_index, padding)``."""
    out = bytearray()
    if id3v2:
        sz = len(id3v2)
        if sz >= 1 << 28:
            raise ValueError("mp3: ID3v2 body too large")
        ss = bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                    (sz >> 7) & 0x7F, sz & 0x7F])
        out += b"ID3" + b"\x04\x00\x00" + ss + id3v2
    for version, layer, bidx, ridx, padding in specs:
        if version not in ("1", "2", "2.5"):
            raise ValueError(f"mp3: bad version {version!r}")
        if not (1 <= layer <= 3 and 1 <= bidx <= 14 and 0 <= ridx <= 2
                and padding in (0, 1)):
            raise ValueError("mp3: index out of table range")
        vgroup = "V1" if version == "1" else "V2"
        kbps = _BITRATE_KBPS[(vgroup, layer)][bidx]
        rate = _SAMPLE_RATE[version][ridx]
        size = _frame_length(vgroup, layer, kbps * 1000, rate, padding)
        vbits = {"2.5": 0, "2": 2, "1": 3}[version]
        h = (0x7FF << 21) | (vbits << 19) | ((4 - layer) << 17) | \
            (1 << 16) | (bidx << 12) | (ridx << 10) | (padding << 9) | \
            (3 << 6)                     # CRC off, mono
        out += struct.pack(">I", h) + bytes([fill]) * (size - 4)
    if id3v1:
        out += b"TAG" + bytes(125)
    return bytes(out)


# ------------------------------------------- Layer III coded layer
#
# Round 10: one level PAST framing — the Layer III side-information
# and bit-reservoir layer (ISO/IEC 11172-3 §2.4.1.7 / 13818-3 for the
# LSF variant). This is the part of the coded stream a corpus pipeline
# needs to slice, validate, and fingerprint audio at scale:
#
# - side-info parse: main_data_begin, scfsi, and per-granule
#   (part2_3_length, big_values, global_gain, scalefac_compress,
#   block type, table selects, region counts, ...) for MPEG1 (two
#   granules, 17/32-byte side info) and MPEG2/2.5 LSF (one granule,
#   9/17-byte);
# - bit-reservoir accounting: each frame's coded bits may begin up to
#   main_data_begin bytes BEFORE its own slot; the parser reconstructs
#   the reservoir layout and validates the spec invariants (start ≥ 0,
#   no read past the slot end, sequential non-overlap) — invariants a
#   mis-parse violates almost immediately on real encoder output;
# - reservoir-safe slicing: a stream may only be cut at frames with
#   main_data_begin == 0 (the frame depends on no earlier bytes);
#   cut_safe marks them.
#
# Full sample synthesis (Huffman spectrum decode → IMDCT → polyphase)
# is deliberately NOT implemented: it requires the ISO Huffman code
# tables and the synthesis-window coefficient table, which are spec
# DATA, not derivable structure — no copy exists in this image and
# reproducing them from memory would risk a silently-wrong decoder
# (worse than a declared edge). The structural layer below is instead
# fully self-validating against real encoder output.

_SIDEINFO_BYTES = {("V1", 1): 17, ("V1", 2): 32,
                   ("V2", 1): 9, ("V2", 2): 17}


class _Bits:
    """MSB-first bit reader (same shape as flac_codec's)."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data, self.byte, self.bit = data, pos, 0

    def read(self, bits: int) -> int:
        out = 0
        for _ in range(bits):
            if self.byte >= len(self.data):
                raise ValueError("mp3: side info truncated")
            out = (out << 1) | ((self.data[self.byte]
                                 >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit, self.byte = 0, self.byte + 1
        return out


def _parse_granule(br: _Bits, lsf: bool) -> Dict[str, Any]:
    g: Dict[str, Any] = {
        "part2_3_length": br.read(12),
        "big_values": br.read(9),
        "global_gain": br.read(8),
        "scalefac_compress": br.read(9 if lsf else 4),
    }
    if br.read(1):                       # window switching
        g["block_type"] = br.read(2)
        g["mixed_block"] = br.read(1)
        g["table_select"] = [br.read(5) for _ in range(2)]
        g["subblock_gain"] = [br.read(3) for _ in range(3)]
        if g["block_type"] == 0:
            raise ValueError(
                "mp3: window switching with block_type 0 is reserved")
    else:
        g["block_type"] = 0
        g["mixed_block"] = 0
        g["table_select"] = [br.read(5) for _ in range(3)]
        g["region0_count"] = br.read(4)
        g["region1_count"] = br.read(3)
    if not lsf:
        g["preflag"] = br.read(1)
    g["scalefac_scale"] = br.read(1)
    g["count1table_select"] = br.read(1)
    return g


def parse_mp3_sideinfo(payload: bytes) -> Dict[str, Any]:
    """Parse a Layer III stream one level past framing: per-frame side
    information plus a validated bit-reservoir layout.

    Returns ``{"frames": [...], "total_main_bytes", "total_main_bits",
    "n_cut_safe", "reservoir_max_bytes"}``; each frame entry extends
    the :func:`parse_mp3_frames` row with ``crc_protected``,
    ``main_data_begin``, ``granules`` (list over granules of lists
    over channels of side-info dicts), ``main_avail_bytes`` (this
    frame's slot size), ``main_start_byte`` / ``main_bits_used``
    (position/extent of this frame's coded bits in the reassembled
    reservoir stream), ``ancillary_bits`` (slack between this frame's
    coded bits and the next frame's start) and ``cut_safe``.

    Raises ValueError on any reservoir-invariant violation — the
    checks that make this layer self-validating: a frame reaching
    before byte 0 of the reservoir, past the end of its own slot, or
    overlapping the previous frame's coded bits."""
    info = parse_mp3_frames(payload)
    frames = []
    cum = 0                              # main-data bytes before slot
    prev_end_bits = 0
    for f in info["frames"]:
        if f["layer"] != 3:
            raise ValueError(
                "mp3: side-info parse is Layer III only (Layer "
                f"{f['layer']} frame at {f['offset']})")
        h = struct.unpack(
            ">I", payload[f["offset"]:f["offset"] + 4])[0]
        crc = (h >> 16) & 1 == 0         # protection bit 0 = CRC on
        lsf = f["version"] != "1"
        nch = f["channels"]
        si_len = _SIDEINFO_BYTES[("V2" if lsf else "V1", nch)]
        si_start = f["offset"] + 4 + (2 if crc else 0)
        br = _Bits(payload[si_start:si_start + si_len])
        mdb = br.read(8 if lsf else 9)
        br.read({(False, 1): 5, (False, 2): 3,
                 (True, 1): 1, (True, 2): 2}[(lsf, nch)])
        scfsi = None
        if not lsf:
            scfsi = [[br.read(1) for _ in range(4)]
                     for _ in range(nch)]
        ngr = 1 if lsf else 2
        granules = [[_parse_granule(br, lsf) for _ in range(nch)]
                    for _ in range(ngr)]
        avail = f["size"] - 4 - (2 if crc else 0) - si_len
        if avail < 0:
            raise ValueError(
                f"mp3: frame at {f['offset']} smaller than its own "
                "header + side info")
        used = sum(g["part2_3_length"]
                   for chs in granules for g in chs)
        # reservoir invariants (ISO 11172-3 §2.4.2.7): the coded bits
        # start main_data_begin bytes back, never before byte 0 ...
        if mdb > cum:
            raise ValueError(
                f"mp3: frame at {f['offset']} reaches {mdb} bytes "
                f"into the reservoir but only {cum} exist")
        start_bits = (cum - mdb) * 8
        end_bits = start_bits + used
        # ... never past the end of the frame's own slot ...
        if end_bits > (cum + avail) * 8:
            raise ValueError(
                f"mp3: frame at {f['offset']} consumes {used} bits "
                "past the end of its main-data slot")
        # ... and never overlapping the previous frame's coded bits
        # (encoders write main data sequentially; ancillary slack is
        # allowed, overlap is not)
        if start_bits < prev_end_bits:
            raise ValueError(
                f"mp3: frame at {f['offset']} overlaps the previous "
                "frame's coded bits in the reservoir")
        if frames:
            frames[-1]["ancillary_bits"] = start_bits - prev_end_bits
        frames.append({
            **f, "crc_protected": crc, "main_data_begin": mdb,
            "scfsi": scfsi, "granules": granules,
            "main_avail_bytes": avail,
            "main_start_byte": start_bits // 8,
            "main_bits_used": used,
            "cut_safe": mdb == 0,
            "ancillary_bits": None,      # filled by the NEXT frame
        })
        prev_end_bits = end_bits
        cum += avail
    if frames:
        frames[-1]["ancillary_bits"] = cum * 8 - prev_end_bits
    return {
        "frames": frames,
        "total_main_bytes": cum,
        "total_main_bits": sum(fr["main_bits_used"] for fr in frames),
        "n_cut_safe": sum(fr["cut_safe"] for fr in frames),
        "reservoir_max_bytes": max(
            (fr["main_data_begin"] for fr in frames), default=0),
    }


def mp3_cut_points(payload: bytes) -> List[int]:
    """Byte offsets where the stream can be cut so the RIGHT side is
    decodable on its own: frames whose main_data_begin is 0 depend on
    no earlier reservoir bytes. (The left side is always safe — coded
    bits never reach forward.) Offset 0 is included iff the first
    frame is cut-safe, which a conforming stream's must be."""
    return [f["offset"] for f in parse_mp3_sideinfo(payload)["frames"]
            if f["cut_safe"]]


class _BitsW:
    """MSB-first bit writer (same shape as flac_codec's)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc, self._n = 0, 0

    def write(self, value: int, bits: int) -> None:
        self._acc = (self._acc << bits) | (value & ((1 << bits) - 1))
        self._n += bits
        while self._n >= 8:
            self._n -= 8
            self.buf.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1


def _write_granule(bw: _BitsW, g: Dict[str, Any], lsf: bool) -> None:
    bw.write(g["part2_3_length"], 12)
    bw.write(g.get("big_values", 0), 9)
    bw.write(g.get("global_gain", 0), 8)
    bw.write(g.get("scalefac_compress", 0), 9 if lsf else 4)
    bw.write(0, 1)                       # no window switching
    for t in g.get("table_select", [0, 0, 0]):
        bw.write(t, 5)
    bw.write(g.get("region0_count", 0), 4)
    bw.write(g.get("region1_count", 0), 3)
    if not lsf:
        bw.write(g.get("preflag", 0), 1)
    bw.write(g.get("scalefac_scale", 0), 1)
    bw.write(g.get("count1table_select", 0), 1)


def build_mp3_l3(frames: Sequence[Dict[str, Any]],
                 fill: int = 0xA5) -> bytes:
    """Emit a Layer III stream with REAL side info and a consistent
    bit-reservoir layout (normal-window granules; coded bits are
    deterministic filler — a side-info/reservoir builder for tests and
    oracles, not an encoder, the same split as :func:`build_mp3`).

    Each entry: ``{"version", "bitrate_index", "rate_index",
    "padding", "channels", "main_data_begin", "granules": [[granule
    dict per channel] per granule]}`` with granule dicts as in
    :func:`parse_mp3_sideinfo`. The builder validates the same
    reservoir invariants the parser enforces, so a spec-violating
    choreography fails at build time, not parse time."""
    out = bytearray()
    cum = 0
    prev_end_bits = 0
    for spec in frames:
        version = spec["version"]
        lsf = version != "1"
        nch = spec.get("channels", 1)
        ngr = 1 if lsf else 2
        vgroup = "V2" if lsf else "V1"
        bidx, ridx = spec["bitrate_index"], spec["rate_index"]
        padding = spec.get("padding", 0)
        kbps = _BITRATE_KBPS[(vgroup, 3)][bidx]
        rate = _SAMPLE_RATE[version][ridx]
        size = _frame_length(vgroup, 3, kbps * 1000, rate, padding)
        si_len = _SIDEINFO_BYTES[(vgroup, nch)]
        avail = size - 4 - si_len
        mdb = spec.get("main_data_begin", 0)
        used = sum(g["part2_3_length"]
                   for chs in spec["granules"] for g in chs)
        if mdb > min(cum, 255 if lsf else 511):
            raise ValueError("mp3: main_data_begin exceeds reservoir")
        start_bits = (cum - mdb) * 8
        if start_bits + used > (cum + avail) * 8:
            raise ValueError("mp3: coded bits overrun main-data slot")
        if start_bits < prev_end_bits:
            raise ValueError("mp3: coded bits overlap previous frame")
        vbits = {"2.5": 0, "2": 2, "1": 3}[version]
        h = (0x7FF << 21) | (vbits << 19) | (1 << 17) | (1 << 16) \
            | (bidx << 12) | (ridx << 10) | (padding << 9) \
            | ((3 if nch == 1 else 0) << 6)
        out += struct.pack(">I", h)
        bw = _BitsW()
        bw.write(mdb, 8 if lsf else 9)
        bw.write(0, {(False, 1): 5, (False, 2): 3,
                     (True, 1): 1, (True, 2): 2}[(lsf, nch)])
        if not lsf:
            bw.write(0, 4 * nch)         # scfsi
        if len(spec["granules"]) != ngr \
                or any(len(chs) != nch for chs in spec["granules"]):
            raise ValueError(
                f"mp3: need {ngr} granules x {nch} channels")
        for chs in spec["granules"]:
            for g in chs:
                _write_granule(bw, g, lsf)
        if len(bw.buf) != si_len or bw._n:
            raise AssertionError("mp3: side-info length drift")
        out += bw.buf
        out += bytes([(fill + i) & 0xFF for i in range(avail)])
        prev_end_bits = start_bits + used
        cum += avail
    return bytes(out)


# ------------------------------------------------------- ID3v2 frames
#
# Round 10 (metadata-extraction layer, same story as the side-info
# parse): the framing walker SKIPS ID3v2 tags; a corpus pipeline wants
# what is IN them — title/artist/album text frames, comments — as
# queryable columns. id3.org's informal standards (id3v2.3.0,
# id3v2.4.0) specify everything needed: synchsafe sizes, frame
# headers, text encodings (Latin-1, UTF-16 w/ BOM, UTF-16BE, UTF-8),
# and the v2.4 per-frame synchsafe size change.

_ID3_ENCODINGS = {0: "latin-1", 1: "utf-16", 2: "utf-16-be",
                  3: "utf-8"}


def _decode_id3_text(enc: int, data: bytes) -> str:
    codec = _ID3_ENCODINGS.get(enc)
    if codec is None:
        raise ValueError(f"id3: unknown text encoding {enc}")
    # text frames are null-terminated per spec; terminator optional
    # in practice — strip it in the right width
    if enc in (1, 2):
        data = data.split(b"\x00\x00", 1)[0]
        if len(data) % 2:                # split landed mid-codepoint
            data += b"\x00"
    else:
        data = data.split(b"\x00", 1)[0]
    return data.decode(codec)


def _synchsafe(n: int) -> bytes:
    return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                  (n >> 7) & 0x7F, n & 0x7F])


def parse_id3v2(payload: bytes) -> Dict[str, Any]:
    """Parse an ID3v2.3/2.4 tag at the start of ``payload`` into
    ``{"version", "tag_bytes", "frames": [{"id", "size", "text"}]}``
    — ``text`` decoded for T??? text frames and COMM comments (None
    for binary frames like APIC). Raises on malformed headers; a
    stream with no tag returns ``{"version": None, "tag_bytes": 0,
    "frames": []}``."""
    if payload[:3] != b"ID3":
        return {"version": None, "tag_bytes": 0, "frames": []}
    if len(payload) < 10:
        raise ValueError("id3: truncated tag header")
    major, flags = payload[3], payload[5]
    if major not in (3, 4):
        raise ValueError(f"id3: unsupported version 2.{major}")
    if flags & 0x80:
        raise ValueError("id3: unsynchronised tags not supported")
    size = 0
    for b in payload[6:10]:
        if b & 0x80:
            raise ValueError("id3: non-synchsafe tag size")
        size = (size << 7) | b
    end = 10 + size
    pos = 10
    if flags & 0x40:                     # extended header: skip it
        if major == 4:
            ext = (payload[pos] << 21) | (payload[pos + 1] << 14) \
                | (payload[pos + 2] << 7) | payload[pos + 3]
        else:
            ext = struct.unpack(">I", payload[pos:pos + 4])[0] + 4
        pos += ext
    frames = []
    while pos + 10 <= end:
        fid = payload[pos:pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break                        # padding
        if not all(65 <= c <= 90 or 48 <= c <= 57 for c in fid):
            raise ValueError(f"id3: bad frame id at {pos}")
        raw = payload[pos + 4:pos + 8]
        if major == 4:                   # v2.4: synchsafe frame size
            fsize = 0
            for b in raw:
                if b & 0x80:
                    raise ValueError("id3v2.4: non-synchsafe "
                                     "frame size")
                fsize = (fsize << 7) | b
        else:
            fsize = struct.unpack(">I", raw)[0]
        pos += 10
        if pos + fsize > end:
            raise ValueError("id3: frame overruns tag")
        body = payload[pos:pos + fsize]
        text = None
        if fid[:1] == b"T" and fsize >= 1:
            text = _decode_id3_text(body[0], body[1:])
        elif fid == b"COMM" and fsize >= 4:
            # enc byte + 3-char language + short desc \0 + text
            enc = body[0]
            rest = body[4:]
            term = b"\x00\x00" if enc in (1, 2) else b"\x00"
            parts = rest.split(term, 1)
            text = _decode_id3_text(enc, parts[1]) \
                if len(parts) == 2 else _decode_id3_text(enc, rest)
        frames.append({"id": fid.decode("ascii"), "size": fsize,
                       "text": text})
        pos += fsize
    return {"version": f"2.{major}", "tag_bytes": end,
            "frames": frames}


def build_id3v2(frames: Sequence[Tuple[str, str]], major: int = 3,
                encoding: int = 3, padding: int = 16) -> bytes:
    """Emit an ID3v2.3/2.4 tag holding text frames — the test/oracle
    twin of :func:`parse_id3v2` (same split as build_mp3 / the frame
    walker). ``frames``: (frame_id, text) pairs; ``encoding`` is the
    spec text-encoding byte (3 = UTF-8; v2.3 strictly allows only
    0/1, but parsers — including ours — accept all four)."""
    body = bytearray()
    for fid, text in frames:
        if len(fid) != 4:
            raise ValueError(f"id3: frame id must be 4 chars: {fid!r}")
        codec = _ID3_ENCODINGS[encoding]
        data = bytes([encoding]) + text.encode(codec)
        if fid == "COMM":
            data = bytes([encoding]) + b"eng" \
                + (b"\x00\x00" if encoding in (1, 2) else b"\x00") \
                + text.encode(codec)
        size = _synchsafe(len(data)) if major == 4 \
            else struct.pack(">I", len(data))
        body += fid.encode("ascii") + size + b"\x00\x00" + data
    body += bytes(padding)
    return b"ID3" + bytes([major, 0, 0]) + _synchsafe(len(body)) \
        + bytes(body)


# ------------------------------------------------- Vorbis headers
#
# Round 10: the Vorbis I identification and comment headers (Xiph
# spec §4.2) — the metadata layer of an Ogg/Vorbis stream, and the
# VorbisComment tagging standard (ARTIST=..., TITLE=...) that FLAC
# and Opus reuse. Entirely procedural little-endian parsing — none of
# the codebook/floor table data that keeps sample decode env-gated.


def parse_vorbis_headers(packets: Sequence[bytes]) -> Dict[str, Any]:
    """Parse a Vorbis stream's first packets: the identification
    header (type 1) and comment header (type 3). Returns
    ``{"channels", "sample_rate", "bitrate_nominal", "blocksize_0",
    "blocksize_1", "vendor", "comments": [(key, value)]}``. Raises on
    malformed headers (bad magic, zero channels/rate, blocksizes out
    of the spec's 64..8192 power-of-two range, missing framing bit,
    comment lengths overrunning the packet)."""
    if len(packets) < 2:
        raise ValueError("vorbis: need identification + comment "
                         "packets")
    ident, comment = packets[0], packets[1]
    if len(ident) < 30 or ident[0] != 1 or ident[1:7] != b"vorbis":
        raise ValueError("vorbis: bad identification header")
    version, = struct.unpack("<I", ident[7:11])
    if version != 0:
        raise ValueError(f"vorbis: unknown version {version}")
    channels = ident[11]
    rate, = struct.unpack("<I", ident[12:16])
    br_max, br_nom, br_min = struct.unpack("<iii", ident[16:28])
    bs = ident[28]
    bs0, bs1 = 1 << (bs & 0xF), 1 << (bs >> 4)
    if channels == 0 or rate == 0:
        raise ValueError("vorbis: zero channels or sample rate")
    for b in (bs0, bs1):
        if not 64 <= b <= 8192:
            raise ValueError(f"vorbis: blocksize {b} out of range")
    if bs0 > bs1:
        raise ValueError("vorbis: blocksize_0 > blocksize_1")
    if not ident[29] & 1:
        raise ValueError("vorbis: identification framing bit unset")

    if len(comment) < 7 or comment[0] != 3 \
            or comment[1:7] != b"vorbis":
        raise ValueError("vorbis: bad comment header")
    pos = 7
    vlen, = struct.unpack("<I", comment[pos:pos + 4])
    pos += 4
    vendor = comment[pos:pos + vlen].decode("utf-8")
    pos += vlen
    count, = struct.unpack("<I", comment[pos:pos + 4])
    pos += 4
    comments: List[Tuple[str, str]] = []
    for _ in range(count):
        if pos + 4 > len(comment):
            raise ValueError("vorbis: comment count overruns packet")
        clen, = struct.unpack("<I", comment[pos:pos + 4])
        pos += 4
        if pos + clen > len(comment):
            raise ValueError("vorbis: comment length overruns packet")
        entry = comment[pos:pos + clen].decode("utf-8")
        pos += clen
        if "=" not in entry:
            raise ValueError(f"vorbis: comment without '=': {entry!r}")
        k, v = entry.split("=", 1)
        comments.append((k.upper(), v))  # field names case-insensitive
    if pos >= len(comment) or not comment[pos] & 1:
        raise ValueError("vorbis: comment framing bit unset")
    return {"channels": channels, "sample_rate": rate,
            "bitrate_nominal": br_nom, "bitrate_max": br_max,
            "bitrate_min": br_min, "blocksize_0": bs0,
            "blocksize_1": bs1, "vendor": vendor,
            "comments": comments}


def build_vorbis_headers(channels: int, sample_rate: int,
                         comments: Sequence[Tuple[str, str]],
                         vendor: str = "spark-graft",
                         bitrate_nominal: int = 0,
                         blocksize_0: int = 256,
                         blocksize_1: int = 2048) -> List[bytes]:
    """The identification + comment packets — the test/oracle twin of
    :func:`parse_vorbis_headers` (mux with :func:`mux_ogg` for a
    container-level round trip)."""
    for b in (blocksize_0, blocksize_1):
        if b & (b - 1) or not 64 <= b <= 8192:
            raise ValueError(f"vorbis: blocksize {b} invalid")
    bs = (blocksize_1.bit_length() - 1) << 4 \
        | (blocksize_0.bit_length() - 1)
    ident = (bytes([1]) + b"vorbis" + struct.pack("<I", 0)
             + bytes([channels]) + struct.pack("<I", sample_rate)
             + struct.pack("<iii", 0, bitrate_nominal, 0)
             + bytes([bs, 1]))
    vb = vendor.encode("utf-8")
    body = bytearray(bytes([3]) + b"vorbis"
                     + struct.pack("<I", len(vb)) + vb
                     + struct.pack("<I", len(comments)))
    for k, v in comments:
        entry = f"{k}={v}".encode("utf-8")
        body += struct.pack("<I", len(entry)) + entry
    body += bytes([1])
    return [ident, bytes(body)]


# ---------------------------------------------------------------- Ogg

def _ogg_crc_table() -> List[int]:
    table = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7 if r & 0x80000000 else r << 1) \
                & 0xFFFFFFFF
        table.append(r)
    return table


_CRC_TABLE = _ogg_crc_table()


def ogg_crc(data: bytes) -> int:
    """RFC 3533 §6 checksum: CRC-32, poly 0x04C11DB7, init 0, no
    reflection, no final XOR (deliberately not zlib.crc32)."""
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((r >> 24) & 0xFF) ^ b]
    return r


def _page(serial: int, seq: int, granule: int, htype: int,
          segments: List[bytes]) -> bytes:
    lacing = bytearray()
    body = bytearray()
    for seg in segments:
        lacing.append(len(seg))
        body += seg
    hdr = (b"OggS\x00" + bytes([htype]) +
           struct.pack("<qIII", granule, serial, seq, 0) +
           bytes([len(lacing)]) + bytes(lacing))
    crc = ogg_crc(hdr + bytes(body))
    hdr = hdr[:22] + struct.pack("<I", crc) + hdr[26:]
    return hdr + bytes(body)


def mux_ogg(packets: Sequence[Tuple[bytes, int]],
            serial: int = 1) -> bytes:
    """One logical stream, one packet per page (pages carry the full
    255-lacing segmentation: a packet of n bytes becomes
    ``n // 255 + 1`` lacing values, last one < 255). ``packets``:
    (payload, granule_position) pairs. First page gets BOS, last EOS;
    packets over 255·255 bytes span continuation pages per the spec.
    """
    if not packets:
        raise ValueError("ogg: at least one packet required")
    out = bytearray()
    seq = 0
    for pi, (payload, granule) in enumerate(packets):
        segs = [payload[i:i + 255] for i in range(0, len(payload), 255)]
        if not segs or len(segs[-1]) == 255:
            segs.append(b"")             # terminating short lacing
        cont = 0
        while segs:
            head, segs = segs[:255], segs[255:]
            htype = cont
            if pi == 0 and seq == 0:
                htype |= 2               # BOS
            if pi == len(packets) - 1 and not segs:
                htype |= 4               # EOS
            # granule: -1 on pages that don't end a packet
            g = granule if not segs else -1
            out += _page(serial, seq, g, htype, head)
            seq += 1
            cont = 1                     # continuation flag
    return bytes(out)


def demux_ogg(payload: bytes) -> Dict[int, Dict[str, Any]]:
    """Parse Ogg pages → logical streams.

    Returns ``{serial: {"packets": [(bytes, granule)], "n_pages",
    "bos", "eos"}}``. Verifies every page CRC and the lacing
    continuation rules; incomplete trailing packets raise.
    """
    streams: Dict[int, Dict[str, Any]] = {}
    partial: Dict[int, bytearray] = {}
    pos = 0
    while pos < len(payload):
        if payload[pos:pos + 4] != b"OggS":
            raise ValueError(f"ogg: lost capture pattern at {pos}")
        if payload[pos + 4] != 0:
            raise ValueError("ogg: unknown stream structure version")
        htype = payload[pos + 5]
        granule, serial, seq, crc = struct.unpack(
            "<qIII", payload[pos + 6:pos + 26])
        nseg = payload[pos + 26]
        lacing = payload[pos + 27:pos + 27 + nseg]
        if len(lacing) < nseg:
            raise ValueError("ogg: truncated lacing table")
        body_start = pos + 27 + nseg
        body_len = sum(lacing)
        body = payload[body_start:body_start + body_len]
        if len(body) < body_len:
            raise ValueError("ogg: truncated page body")
        page = bytearray(payload[pos:body_start + body_len])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc:
            raise ValueError(f"ogg: CRC mismatch on page {seq}")
        st = streams.setdefault(serial, {
            "packets": [], "n_pages": 0, "bos": False, "eos": False})
        st["n_pages"] += 1
        if htype & 2:
            st["bos"] = True
        if htype & 4:
            st["eos"] = True
        buf = partial.setdefault(serial, bytearray())
        if (htype & 1) and not buf:
            raise ValueError("ogg: continuation page without partial")
        # RFC 3533 §6: the page granule belongs to the LAST packet
        # that completes on this page (later lacing values may start
        # a packet that continues onto the next page)
        last_complete = max((li for li, lv in enumerate(lacing)
                             if lv < 255), default=None)
        off = 0
        for li, lv in enumerate(lacing):
            buf += body[off:off + lv]
            off += lv
            if lv < 255:                 # packet boundary
                g = granule if li == last_complete else -1
                st["packets"].append((bytes(buf), g))
                buf.clear()
        pos = body_start + body_len
    for serial, buf in partial.items():
        if buf:
            raise ValueError(
                f"ogg: stream {serial} ends mid-packet")
    if not streams:
        raise ValueError("ogg: no pages")
    return streams
