"""MP4/ISO-BMFF container mux+demux (operators/mp4_codec.py).

The muxer and demuxer are independent spec implementations of the
same box grammar (ISO/IEC 14496-12): mux writes run-length stts,
chunked stsc/stco, per-sample stsz and stss; demux re-expands them.
Round trips therefore check the table compression logic from both
sides, plus hand-built boxes pin decode-only paths (co64, largesize,
fixed stsz, malformed rejects).
"""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aether_firebase_consumer_spark.operators.mp4_codec import (
    demux_mp4,
    mux_mp4,
    read_samples,
    sample_video_frames,
)


def _vid(samples, **kw):
    return dict(handler="vide", timescale=30, samples=samples,
                width=4, height=2, **kw)


def _payloads(spec):
    """spec: list of (size, duration, sync) → deterministic samples."""
    return [(bytes((i * 7 + j) % 256 for j in range(sz)), dur, sync)
            for i, (sz, dur, sync) in enumerate(spec)]


def test_roundtrip_single_video_track():
    samples = _payloads([(5, 1, True), (9, 1, False), (3, 2, False),
                         (7, 1, True), (4, 1, False)])
    blob = mux_mp4([_vid(samples)], samples_per_chunk=2)
    tracks = demux_mp4(blob)
    assert len(tracks) == 1
    t = tracks[0]
    assert (t["track_id"], t["handler"], t["timescale"], t["format"]) \
        == (1, "vide", 30, "mp4v")
    assert read_samples(blob, t) == [p for p, _d, _s in samples]
    assert [s["duration"] for s in t["samples"]] == [1, 1, 2, 1, 1]
    assert [s["dts"] for s in t["samples"]] == [0, 1, 2, 4, 5]
    assert [s["sync"] for s in t["samples"]] == \
        [True, False, False, True, False]


def test_roundtrip_av_two_tracks():
    vid = _payloads([(6, 1, True), (2, 1, False), (8, 1, False),
                     (1, 1, True)])
    aud = _payloads([(4, 160, True), (4, 160, True), (5, 160, True)])
    blob = mux_mp4([
        _vid(vid),
        dict(handler="soun", timescale=8000, samples=aud,
             sample_rate=8000, channels=2),
    ], samples_per_chunk=3)
    tracks = demux_mp4(blob)
    assert [(t["track_id"], t["handler"]) for t in tracks] == \
        [(1, "vide"), (2, "soun")]
    assert tracks[1]["format"] == "mp4a"
    assert tracks[1]["timescale"] == 8000
    assert read_samples(blob, tracks[0]) == [p for p, _d, _s in vid]
    assert read_samples(blob, tracks[1]) == [p for p, _d, _s in aud]
    # audio has no stss → everything sync
    assert all(s["sync"] for s in tracks[1]["samples"])


def test_all_sync_video_omits_stss():
    samples = _payloads([(3, 1, True), (3, 1, True)])
    blob = mux_mp4([_vid(samples)])
    assert b"stss" not in blob
    assert all(s["sync"] for s in demux_mp4(blob)[0]["samples"])


def test_frame_sampling_every_n_and_sync_only():
    spec = [(4, 1, i % 3 == 0) for i in range(10)]
    samples = _payloads(spec)
    blob = mux_mp4([_vid(samples)], samples_per_chunk=4)
    every3 = sample_video_frames(blob, every_n=3)
    assert every3 == [samples[i][0] for i in (0, 3, 6, 9)]
    keys = sample_video_frames(blob, every_n=1, sync_only=True)
    assert keys == [samples[i][0] for i in (0, 3, 6, 9)]
    with pytest.raises(ValueError, match="no video track"):
        sample_video_frames(mux_mp4([dict(
            handler="soun", timescale=8000,
            samples=_payloads([(3, 1, True)]))]))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 40), st.integers(1, 5),
                          st.booleans()), min_size=1, max_size=25),
       st.integers(1, 7))
def test_roundtrip_property(spec, spc):
    samples = _payloads(spec)
    blob = mux_mp4([_vid(samples)], samples_per_chunk=spc)
    t = demux_mp4(blob)[0]
    assert read_samples(blob, t) == [p for p, _d, _s in samples]
    assert [s["duration"] for s in t["samples"]] == \
        [d for _p, d, _s in samples]
    want_sync = [s for _p, _d, s in samples]
    if all(want_sync):
        assert all(s["sync"] for s in t["samples"])
    else:
        assert [s["sync"] for s in t["samples"]] == want_sync


def test_co64_and_largesize_and_fixed_stsz():
    """Decode-only paths the muxer never writes: a hand-built minimal
    file with a 64-bit mdat header, co64 offsets and fixed-size
    stsz."""
    def box(t, b):
        return struct.pack(">I", 8 + len(b)) + t + b

    def full(t, b):
        return box(t, b"\x00\x00\x00\x00" + b)

    ftyp = box(b"ftyp", b"isom" + b"\x00" * 4 + b"isom")
    body = bytes(range(12))                     # 3 samples × 4 bytes
    mdat = struct.pack(">I", 1) + b"mdat" + \
        struct.pack(">Q", 16 + len(body)) + body
    base = len(ftyp) + 16
    stsd = full(b"stsd", struct.pack(">I", 1) +
                box(b"mp4v", bytes(6) + struct.pack(">H", 1) + bytes(70)))
    stts = full(b"stts", struct.pack(">III", 1, 3, 1))
    stsz = full(b"stsz", struct.pack(">III", 4, 3, 0)[:8])   # fixed=4,n=3
    stsc = full(b"stsc", struct.pack(">IIII", 1, 1, 3, 1))
    co64 = full(b"co64", struct.pack(">IQ", 1, base))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + co64)
    dref = full(b"dref", struct.pack(">I", 1) +
                struct.pack(">I", 12) + b"url \x00\x00\x00\x01")
    minf = box(b"minf", full(b"vmhd", bytes(8)) + box(b"dinf", dref) + stbl)
    hdlr = full(b"hdlr", bytes(4) + b"vide" + bytes(12) + b"\x00")
    mdhd = full(b"mdhd", struct.pack(">IIIIHH", 0, 0, 30, 3, 0x55C4, 0))
    mdia = box(b"mdia", mdhd + hdlr + minf)
    tkhd = full(b"tkhd", struct.pack(">IIIII", 0, 0, 9, 0, 3) + bytes(60))
    trak = box(b"trak", tkhd + mdia)
    mvhd = full(b"mvhd", struct.pack(">IIII", 0, 0, 1000, 100) + bytes(96))
    moov = box(b"moov", mvhd + trak)
    blob = ftyp + mdat + moov
    t = demux_mp4(blob)[0]
    assert t["track_id"] == 9
    assert [s["size"] for s in t["samples"]] == [4, 4, 4]
    assert read_samples(blob, t) == [bytes(range(0, 4)), bytes(range(4, 8)),
                                     bytes(range(8, 12))]


def test_malformed_rejects():
    samples = _payloads([(4, 1, True), (4, 1, False)])
    blob = mux_mp4([_vid(samples)])
    with pytest.raises(ValueError, match="no moov"):
        demux_mp4(blob[:24])          # just the 24-byte ftyp box
    # box size overrunning the container
    bad = bytearray(blob)
    bad[0:4] = struct.pack(">I", len(blob) + 100)
    with pytest.raises(ValueError, match="overruns"):
        demux_mp4(bytes(bad))
    # truncated file: moov's declared size now overruns
    with pytest.raises(ValueError):
        demux_mp4(blob[:-10])
    with pytest.raises(ValueError, match="at least one track"):
        mux_mp4([])
    with pytest.raises(ValueError, match="unsupported handler"):
        mux_mp4([dict(handler="text", timescale=1,
                      samples=_payloads([(1, 1, True)]))])
    with pytest.raises(ValueError, match="no samples"):
        mux_mp4([dict(handler="vide", timescale=1, samples=[])])


def test_frame_sample_dispatch_mp4():
    """multimodal.frame_sample routes MP4 to the native demuxer."""
    from aether_firebase_consumer_spark.operators.multimodal import (
        frame_sample,
    )
    samples = _payloads([(4, 1, True) for _ in range(6)])
    blob = mux_mp4([_vid(samples)])
    assert frame_sample(blob, every_n=2) == \
        [samples[i][0] for i in (0, 2, 4)]
