"""Pure-Python MP4 / ISO BMFF container mux+demux (stdlib only) —
video/audio as opaque sample streams for the multimodal column family.

Implements the subset of the public ISO/IEC 14496-12 specification
(ISO base media file format; same box grammar as QuickTime's public
spec) that covers sample-level demux of progressive files, the same
way ``flac_codec``/``webp_codec`` implement their formats from spec:

- muxer: ``ftyp`` + ``mdat`` + ``moov`` with one ``trak`` per input
  track — ``tkhd``/``mdhd``/``hdlr``, ``minf`` with the correct
  ``vmhd``/``smhd`` header and a self-contained ``dref``, and a full
  sample table: ``stsd`` (VisualSampleEntry / AudioSampleEntry),
  ``stts`` run-length deltas, ``stsz`` per-sample sizes, ``stsc``
  chunk runs (samples are grouped into multi-sample chunks so the
  chunk-mapping logic is exercised, not degenerate), ``stco``
  absolute chunk offsets, and ``stss`` sync samples for video;
- demuxer: box-tree walk (32-bit and 64-bit ``largesize`` headers,
  ``co64``), per-track expansion of the compressed tables back to a
  flat per-sample list — (offset, size, dts, duration, sync) — plus
  payload extraction from ``mdat`` via the absolute offsets.

Codec payloads stay opaque bytes (decoding H.264 etc. is genuinely
out of scope); the CONTAINER layer — the part a frame-sampling
pipeline needs before handing compressed samples to a decoder pool —
is real and spec-complete for this subset. This closes the "video
demux env-gated" row: ``frame_sample`` now natively samples MP4
video tracks (reference consumed media only as opaque blobs;
capability-gap category, SURVEY.md §2.3 multimodal).

No third-party code; written from the public spec. Box layouts
cross-checked against ISO/IEC 14496-12 §8 field tables.
"""

from __future__ import annotations

import struct
from typing import Any, Dict, List, Optional, Sequence, Tuple

# (payload, duration_in_timescale, is_sync)
Sample = Tuple[bytes, int, bool]

_MATRIX = struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0,
                      0, 0, 0x40000000)


def _box(btype: bytes, payload: bytes) -> bytes:
    """Plain box: 32-bit size header (size includes the header)."""
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    """FullBox: version byte + 24-bit flags before the payload."""
    return _box(btype, bytes([version]) + flags.to_bytes(3, "big") + payload)


# ------------------------------------------------------------------ mux

def mux_mp4(tracks: Sequence[Dict[str, Any]],
            movie_timescale: int = 1000,
            samples_per_chunk: int = 3) -> bytes:
    """Write a progressive MP4. Each track dict:

    ``{"handler": "vide"|"soun", "timescale": int,
       "samples": [(payload_bytes, duration, is_sync), ...],
       "width": int, "height": int,          # video, optional
       "sample_rate": int, "channels": int}  # audio, optional

    Samples are stored in per-track chunks of ``samples_per_chunk``
    (last chunk ragged) so ``stsc`` carries a real run table. ``mdat``
    precedes ``moov`` is NOT done here — ``moov`` last means offsets
    are known only after layout, so we place ``ftyp`` + ``mdat`` first
    and compute absolute ``stco`` offsets from that layout, the
    standard progressive-download arrangement."""
    if not tracks:
        raise ValueError("mp4: at least one track required")
    for t in tracks:
        if t["handler"] not in ("vide", "soun"):
            raise ValueError(f"mp4: unsupported handler {t['handler']!r}")
        if not t["samples"]:
            raise ValueError("mp4: track with no samples")

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isomiso2")

    # ---- mdat layout: per-track, chunked
    mdat_body = bytearray()
    # chunk_offsets[ti] = list of offsets RELATIVE to mdat body start
    chunk_offsets: List[List[int]] = []
    for t in tracks:
        offs = []
        samples: List[Sample] = t["samples"]
        for c0 in range(0, len(samples), samples_per_chunk):
            offs.append(len(mdat_body))
            for payload, _dur, _sync in samples[c0:c0 + samples_per_chunk]:
                mdat_body += payload
        chunk_offsets.append(offs)
    mdat = _box(b"mdat", bytes(mdat_body))
    body_base = len(ftyp) + 8     # file offset of mdat body

    # ---- moov
    traks = []
    max_dur_movie = 0
    for ti, t in enumerate(tracks):
        samples = t["samples"]
        tid = ti + 1
        tscale = int(t["timescale"])
        dur = sum(d for _p, d, _s in samples)
        max_dur_movie = max(
            max_dur_movie, dur * movie_timescale // max(tscale, 1))

        # stts: run-length (count, delta)
        runs: List[Tuple[int, int]] = []
        for _p, d, _s in samples:
            if runs and runs[-1][1] == d:
                runs[-1] = (runs[-1][0] + 1, d)
            else:
                runs.append((1, d))
        stts = _full(b"stts", 0, 0, struct.pack(">I", len(runs)) +
                     b"".join(struct.pack(">II", c, d) for c, d in runs))

        # stsz: per-sample sizes (sample_size field 0 → table follows)
        stsz = _full(b"stsz", 0, 0, struct.pack(
            ">II", 0, len(samples)) +
            b"".join(struct.pack(">I", len(p)) for p, _d, _s in samples))

        # stsc: one run if every chunk (except possibly the last) holds
        # samples_per_chunk; a second run describes a ragged tail
        n_chunks = len(chunk_offsets[ti])
        tail = len(samples) - (n_chunks - 1) * samples_per_chunk
        sruns: List[Tuple[int, int]] = [(1, min(samples_per_chunk,
                                                len(samples)))]
        if n_chunks > 1 and tail != samples_per_chunk:
            sruns.append((n_chunks, tail))
        stsc = _full(b"stsc", 0, 0, struct.pack(">I", len(sruns)) +
                     b"".join(struct.pack(">III", fc, spc, 1)
                              for fc, spc in sruns))

        stco = _full(b"stco", 0, 0, struct.pack(
            ">I", n_chunks) + b"".join(
            struct.pack(">I", body_base + o) for o in chunk_offsets[ti]))

        # stsd: one sample entry of the right family
        if t["handler"] == "vide":
            w, h = int(t.get("width", 16)), int(t.get("height", 16))
            entry = _box(b"mp4v",
                         bytes(6) + struct.pack(">H", 1) +      # dref idx
                         bytes(16) +                            # pre_defined
                         struct.pack(">HH", w, h) +
                         struct.pack(">II", 0x00480000, 0x00480000) +
                         struct.pack(">I", 0) +
                         struct.pack(">H", 1) +                 # frame_count
                         bytes(32) +                            # compressor
                         struct.pack(">Hh", 0x0018, -1))
            mhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        else:
            sr = int(t.get("sample_rate", 8000))
            ch = int(t.get("channels", 1))
            entry = _box(b"mp4a",
                         bytes(6) + struct.pack(">H", 1) +
                         bytes(8) +                             # reserved
                         struct.pack(">HHI", ch, 16, 0) +
                         struct.pack(">I", sr << 16))
            mhd = _full(b"smhd", 0, 0, struct.pack(">Hh", 0, 0))
        stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)

        stbl_children = [stsd, stts, stsc, stsz, stco]
        if t["handler"] == "vide":
            syncs = [i + 1 for i, (_p, _d, s) in enumerate(samples) if s]
            if len(syncs) != len(samples):   # all-sync → omit stss
                stbl_children.append(_full(
                    b"stss", 0, 0, struct.pack(">I", len(syncs)) +
                    b"".join(struct.pack(">I", n) for n in syncs)))
        stbl = _box(b"stbl", b"".join(stbl_children))

        dref = _full(b"dref", 0, 0, struct.pack(">I", 1) +
                     _full(b"url ", 0, 1, b""))   # flag 1: self-contained
        minf = _box(b"minf", mhd + _box(b"dinf", dref) + stbl)

        hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) +
                     t["handler"].encode() + bytes(12) + b"eng\x00")
        mdhd = _full(b"mdhd", 0, 0, struct.pack(
            ">IIIIHH", 0, 0, tscale, dur, 0x55C4, 0))  # lang 'und'
        mdia = _box(b"mdia", mdhd + hdlr + minf)

        if t["handler"] == "vide":
            wh = struct.pack(">II", int(t.get("width", 16)) << 16,
                             int(t.get("height", 16)) << 16)
        else:
            wh = struct.pack(">II", 0, 0)
        tkhd = _full(b"tkhd", 0, 7, struct.pack(
            ">IIIII", 0, 0, tid, 0,
            dur * movie_timescale // max(tscale, 1)) +
            bytes(8) + struct.pack(">hhHH", 0, 0,
                                   0x0100 if t["handler"] == "soun" else 0,
                                   0) + _MATRIX + wh)
        traks.append(_box(b"trak", tkhd + mdia))

    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, movie_timescale, max_dur_movie) +
        struct.pack(">IH", 0x00010000, 0x0100) + bytes(10) + _MATRIX +
        bytes(24) + struct.pack(">I", len(tracks) + 1))
    moov = _box(b"moov", mvhd + b"".join(traks))
    return ftyp + mdat + moov


# ---------------------------------------------------------------- demux

def _walk(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in [start, end).
    Handles size==1 (64-bit largesize) and size==0 (to end)."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError(f"mp4: truncated box header at {pos}")
        size = struct.unpack(">I", data[pos:pos + 4])[0]
        btype = data[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("mp4: truncated largesize header")
            size = struct.unpack(">Q", data[pos + 8:pos + 16])[0]
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(
                f"mp4: box {btype!r} size {size} overruns container")
        yield btype, pos + hdr, pos + size
        pos += size


def _children(data: bytes, start: int, end: int) -> Dict[bytes, Tuple[int, int]]:
    return {t: (s, e) for t, s, e in _walk(data, start, end)}


def _full_body(data: bytes, span: Tuple[int, int],
               want_versions: Tuple[int, ...]) -> Tuple[int, int, int]:
    s, e = span
    if e - s < 4:
        raise ValueError("mp4: truncated FullBox")
    version = data[s]
    if version not in want_versions:
        raise ValueError(f"mp4: unsupported FullBox version {version}")
    return version, s + 4, e


def demux_mp4(payload: bytes) -> List[Dict[str, Any]]:
    """Parse an MP4/ISO-BMFF file → per-track sample tables.

    Returns one dict per trak:
    ``{"track_id", "handler", "timescale", "format",
       "samples": [{"offset", "size", "dts", "duration", "sync"}]}``
    Offsets are absolute file offsets (``stco``/``co64`` + intra-chunk
    layout), so ``payload[o:o+size]`` is the sample's bytes.
    """
    top = _children(payload, 0, len(payload))
    if b"moov" not in top:
        raise ValueError("mp4: no moov box")
    tracks: List[Dict[str, Any]] = []
    for btype, s, e in _walk(payload, *top[b"moov"]):
        if btype != b"trak":
            continue
        kids = _children(payload, s, e)
        if b"tkhd" not in kids or b"mdia" not in kids:
            raise ValueError("mp4: trak missing tkhd/mdia")
        ver, ts, _te = _full_body(payload, kids[b"tkhd"], (0, 1))
        tid = struct.unpack(">I", payload[ts + (16 if ver else 8):
                                          ts + (20 if ver else 12)])[0]
        mdia = _children(payload, *kids[b"mdia"])
        ver, ms, _me = _full_body(payload, mdia[b"mdhd"], (0, 1))
        if ver:
            timescale = struct.unpack(">I", payload[ms + 16:ms + 20])[0]
        else:
            timescale = struct.unpack(">I", payload[ms + 8:ms + 12])[0]
        _v, hs, _he = _full_body(payload, mdia[b"hdlr"], (0,))
        handler = payload[hs + 4:hs + 8].decode("latin1")
        minf = _children(payload, *mdia[b"minf"])
        stbl = _children(payload, *minf[b"stbl"])

        # stsd → first entry's format fourcc
        _v, ds, de = _full_body(payload, stbl[b"stsd"], (0,))
        fmt = None
        if struct.unpack(">I", payload[ds:ds + 4])[0] >= 1:
            for t2, s2, _e2 in _walk(payload, ds + 4, de):
                fmt = t2.decode("latin1")
                break

        # stsz → sizes
        _v, zs, _ze = _full_body(payload, stbl[b"stsz"], (0,))
        fixed, count = struct.unpack(">II", payload[zs:zs + 8])
        if fixed:
            sizes = [fixed] * count
        else:
            sizes = list(struct.unpack(
                f">{count}I", payload[zs + 8:zs + 8 + 4 * count]))

        # stts → durations/dts
        _v, ts2, _te2 = _full_body(payload, stbl[b"stts"], (0,))
        n_runs = struct.unpack(">I", payload[ts2:ts2 + 4])[0]
        durations: List[int] = []
        p = ts2 + 4
        for _ in range(n_runs):
            c, d = struct.unpack(">II", payload[p:p + 8])
            durations.extend([d] * c)
            p += 8
        if len(durations) < count:
            raise ValueError("mp4: stts covers fewer samples than stsz")

        # stco/co64 → chunk base offsets
        if b"stco" in stbl:
            _v, cs, _ce = _full_body(payload, stbl[b"stco"], (0,))
            nc = struct.unpack(">I", payload[cs:cs + 4])[0]
            chunks = list(struct.unpack(
                f">{nc}I", payload[cs + 4:cs + 4 + 4 * nc]))
        elif b"co64" in stbl:
            _v, cs, _ce = _full_body(payload, stbl[b"co64"], (0,))
            nc = struct.unpack(">I", payload[cs:cs + 4])[0]
            chunks = list(struct.unpack(
                f">{nc}Q", payload[cs + 4:cs + 4 + 8 * nc]))
        else:
            raise ValueError("mp4: no stco/co64")

        # stsc runs → samples-per-chunk for each chunk index
        _v, scs, _sce = _full_body(payload, stbl[b"stsc"], (0,))
        n_sruns = struct.unpack(">I", payload[scs:scs + 4])[0]
        sruns = [struct.unpack(">III", payload[scs + 4 + 12 * i:
                                               scs + 16 + 12 * i])
                 for i in range(n_sruns)]
        spc_by_chunk: List[int] = []
        for ri, (fc, spc, _sdi) in enumerate(sruns):
            last = sruns[ri + 1][0] - 1 if ri + 1 < n_sruns else len(chunks)
            if fc < 1 or last < fc - 1:
                raise ValueError("mp4: non-monotonic stsc runs")
            spc_by_chunk.extend([spc] * (last - (fc - 1)))
        if len(spc_by_chunk) != len(chunks):
            raise ValueError("mp4: stsc does not cover all chunks")

        # stss → sync set (absent = every sample is sync)
        sync: Optional[set] = None
        if b"stss" in stbl:
            _v, ss, _se = _full_body(payload, stbl[b"stss"], (0,))
            ns = struct.unpack(">I", payload[ss:ss + 4])[0]
            sync = set(struct.unpack(
                f">{ns}I", payload[ss + 4:ss + 4 + 4 * ns]))

        # expand: walk chunks, lay samples consecutively inside each
        samples = []
        si = 0
        dts = 0
        for ci, base in enumerate(chunks):
            off = base
            for _ in range(spc_by_chunk[ci]):
                if si >= count:
                    break
                samples.append({
                    "offset": off, "size": sizes[si], "dts": dts,
                    "duration": durations[si],
                    "sync": (sync is None) or (si + 1 in sync),
                })
                off += sizes[si]
                dts += durations[si]
                si += 1
        if si != count:
            raise ValueError(
                f"mp4: chunk map places {si} of {count} samples")
        for smp in samples:
            if smp["offset"] + smp["size"] > len(payload):
                raise ValueError("mp4: sample extends past end of file")
        tracks.append({"track_id": tid, "handler": handler,
                       "timescale": timescale, "format": fmt,
                       "samples": samples})
    if not tracks:
        raise ValueError("mp4: moov contains no trak")
    return tracks


def read_samples(payload: bytes, track: Dict[str, Any]) -> List[bytes]:
    """Extract a demuxed track's sample payloads from the file bytes."""
    return [payload[s["offset"]:s["offset"] + s["size"]]
            for s in track["samples"]]


def sample_video_frames(payload: bytes, every_n: int = 10,
                        sync_only: bool = False) -> List[bytes]:
    """Frame sampling over the FIRST video track: every ``every_n``-th
    sample's (still-encoded) payload bytes — the shape a downstream
    decoder pool consumes. ``sync_only`` restricts to keyframes, the
    cheap-seek strategy real samplers use."""
    for track in demux_mp4(payload):
        if track["handler"] != "vide":
            continue
        samples = track["samples"]
        if sync_only:
            samples = [s for s in samples if s["sync"]]
        return [payload[s["offset"]:s["offset"] + s["size"]]
                for s in samples[::max(every_n, 1)]]
    raise ValueError("mp4: no video track")
