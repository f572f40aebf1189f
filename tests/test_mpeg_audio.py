"""MPEG-audio framing + Ogg container layer (operators/mpeg_audio.py).

build_mp3/parse_mp3_frames and mux_ogg/demux_ogg are independent
implementations of the same public formulae (ISO 11172-3 frame
lengths; RFC 3533 lacing + CRC), so round trips check both sides;
hand-built streams pin the decode-only paths (ID3 tags, Xing, CRC
corruption, continuation pages).
"""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aether_firebase_consumer_spark.operators.mpeg_audio import (
    build_mp3,
    demux_ogg,
    mux_ogg,
    ogg_crc,
    parse_mp3_frames,
)


# ------------------------------------------------------------- MP3

def test_mp3_frame_lengths_spec_vectors():
    """Known-good frame sizes, hand-computed from the spec formula."""
    # MPEG1 Layer III, 128 kbps @ 44100, no padding: 144000*128/44100
    info = parse_mp3_frames(build_mp3([("1", 3, 9, 0, 0)]))
    assert info["frames"][0]["size"] == 417
    assert info["frames"][0]["samples"] == 1152
    # padding adds exactly one byte for Layer III
    info = parse_mp3_frames(build_mp3([("1", 3, 9, 0, 1)]))
    assert info["frames"][0]["size"] == 418
    # MPEG1 Layer I, 32 kbps @ 32000 Hz with padding: (12*32000/32000+1)*4
    info = parse_mp3_frames(build_mp3([("1", 1, 1, 2, 1)]))
    assert info["frames"][0]["size"] == 52
    assert info["frames"][0]["samples"] == 384
    # MPEG2 Layer III halves the samples per frame (576)
    info = parse_mp3_frames(build_mp3([("2", 3, 1, 1, 0)]))
    f = info["frames"][0]
    assert (f["samples"], f["sample_rate"]) == (576, 24000)
    assert f["size"] == 576 // 8 * 8000 // 24000  # 24


def test_mp3_multi_frame_walk_and_summary():
    specs = [("1", 3, 9, 0, i % 2) for i in range(20)]
    blob = build_mp3(specs)
    info = parse_mp3_frames(blob)
    assert len(info["frames"]) == 20
    assert not info["vbr"]
    assert info["duration_s"] == pytest.approx(20 * 1152 / 44100)
    assert info["avg_bitrate_kbps"] == pytest.approx(128, rel=0.01)
    # offsets chain exactly (re-cuttable at frame boundaries)
    for a, b in zip(info["frames"], info["frames"][1:]):
        assert a["offset"] + a["size"] == b["offset"]
    # mixed bitrates → VBR
    vbr = parse_mp3_frames(build_mp3(
        [("1", 3, 9, 0, 0), ("1", 3, 11, 0, 0)]))
    assert vbr["vbr"] and vbr["avg_bitrate_kbps"] > 128


def test_mp3_id3_tags_skipped():
    blob = build_mp3([("1", 3, 9, 0, 0)], id3v2=b"x" * 1000, id3v1=True)
    info = parse_mp3_frames(blob)
    assert info["id3v2_bytes"] == 1010
    assert info["id3v1"] is True
    assert len(info["frames"]) == 1
    assert info["frames"][0]["offset"] == 1010


def test_mp3_xing_header_read():
    base = build_mp3([("1", 3, 9, 0, 0)])
    body = bytearray(base[4:])
    # place Xing after a fake 17-byte mono side-info block
    body[17:29] = b"Xing" + struct.pack(">II", 1, 4321)
    info = parse_mp3_frames(base[:4] + bytes(body))
    assert info["xing_frames"] == 4321


def test_mp3_rejects():
    with pytest.raises(ValueError, match="no frames"):
        parse_mp3_frames(b"")
    with pytest.raises(ValueError, match="sync"):
        parse_mp3_frames(b"\x00\x00\x00\x00")
    blob = build_mp3([("1", 3, 9, 0, 0)])
    with pytest.raises(ValueError, match="overruns"):
        parse_mp3_frames(blob[:-5])
    with pytest.raises(ValueError, match="trailing garbage"):
        parse_mp3_frames(blob + b"\xff")
    # free-bitrate header (index 0)
    h = struct.pack(">I", (0x7FF << 21) | (3 << 19) | (1 << 17) |
                    (1 << 16) | (0 << 12) | (0 << 10) | (3 << 6))
    with pytest.raises(ValueError, match="bitrate"):
        parse_mp3_frames(h + bytes(100))
    with pytest.raises(ValueError, match="table range"):
        build_mp3([("1", 3, 15, 0, 0)])


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["1", "2", "2.5"]),
                          st.integers(1, 3), st.integers(1, 14),
                          st.integers(0, 2), st.integers(0, 1)),
                min_size=1, max_size=12))
def test_mp3_roundtrip_property(specs):
    info = parse_mp3_frames(build_mp3(specs))
    assert len(info["frames"]) == len(specs)
    for f, (v, layer, _b, _r, pad) in zip(info["frames"], specs):
        assert (f["version"], f["layer"], f["padding"]) == (v, layer, pad)


# ------------------------------------------------------------- Ogg

def test_ogg_crc_not_zlib():
    import zlib
    data = b"the quick brown fox"
    assert ogg_crc(data) != zlib.crc32(data)
    assert ogg_crc(b"") == 0


def _pkts(sizes):
    return [(bytes((i * 11 + j) % 256 for j in range(n)), 1000 + i)
            for i, n in enumerate(sizes)]


def test_ogg_roundtrip_lacing_shapes():
    # short, exactly-255 (needs terminating 0 lacing), multi-segment,
    # empty, and page-spanning (> 255*255) packets
    sizes = [10, 255, 700, 0, 255 * 255 + 10]
    pkts = _pkts(sizes)
    blob = mux_ogg(pkts, serial=7)
    streams = demux_ogg(blob)
    assert list(streams) == [7]
    st7 = streams[7]
    assert st7["bos"] and st7["eos"]
    assert [p for p, _g in st7["packets"]] == [p for p, _g in pkts]
    assert [g for _p, g in st7["packets"]] == [1000 + i
                                               for i in range(len(sizes))]
    # the 65035-byte packet forced a continuation page
    assert st7["n_pages"] > len(sizes)


def test_ogg_crc_corruption_detected():
    blob = bytearray(mux_ogg(_pkts([40])))
    blob[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        demux_ogg(bytes(blob))


def test_ogg_rejects():
    with pytest.raises(ValueError, match="no pages"):
        demux_ogg(b"")
    with pytest.raises(ValueError, match="capture pattern"):
        demux_ogg(b"NotOggData" * 3)
    with pytest.raises(ValueError, match="at least one packet"):
        mux_ogg([])
    # truncate mid-packet: drop the final page of the spanning packet
    blob = mux_ogg(_pkts([255 * 255 + 10]))
    last_page = blob.rfind(b"OggS")
    with pytest.raises(ValueError, match="mid-packet|truncated"):
        demux_ogg(blob[:last_page])


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 1200), min_size=1, max_size=10))
def test_ogg_roundtrip_property(sizes):
    pkts = _pkts(sizes)
    streams = demux_ogg(mux_ogg(pkts))
    assert [p for p, _g in streams[1]["packets"]] == \
        [p for p, _g in pkts]


def test_decode_audio_gate_mentions_native_paths():
    """decode_audio still gates true compressed decode, but the
    framing layer is importable and the gate message stays honest."""
    from aether_firebase_consumer_spark.operators.multimodal import (
        decode_audio,
    )
    with pytest.raises(NotImplementedError, match="soundfile"):
        decode_audio(build_mp3([("1", 3, 9, 0, 0)]))


def test_ogg_multi_packet_page_granule_rule():
    """Foreign-file shape our muxer never writes: several packets on
    ONE page, the last lacing value continuing onto the next page.
    RFC 3533 gives the page granule to the last packet COMPLETED on
    the page — here packet 2 of 3, not the continuing tail."""
    from aether_firebase_consumer_spark.operators.mpeg_audio import _page
    pa, pb = b"a" * 10, b"b" * 20
    pc = b"c" * 260                      # spans both pages
    page1 = _page(5, 0, 111, 2, [pa, pb, pc[:255]])
    page2 = _page(5, 1, 222, 1 | 4, [pc[255:]])
    st5 = demux_ogg(page1 + page2)[5]
    assert st5["packets"] == [(pa, -1), (pb, 111), (pc, 222)]
    assert st5["bos"] and st5["eos"]
    assert st5["n_pages"] == 2


# ------------------------- Layer III side info + bit reservoir (r10)

REAL_MP3 = ("/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/"
            "test_data/test.mp3")


def _g(p23=96, gg=100, bv=5, scf=3, **kw):
    return {"part2_3_length": p23, "global_gain": gg,
            "big_values": bv, "scalefac_compress": scf, **kw}


def _frame(version="1", mdb=0, grans=None, channels=1, bidx=5):
    from aether_firebase_consumer_spark.operators.mpeg_audio import (
        _SIDEINFO_BYTES,  # noqa: F401 - documents the layout source
    )
    ngr = 1 if version != "1" else 2
    if grans is None:
        grans = [[_g() for _ in range(channels)] for _ in range(ngr)]
    return {"version": version, "bitrate_index": bidx, "rate_index": 0,
            "channels": channels, "main_data_begin": mdb,
            "granules": grans}


def test_sideinfo_roundtrip_mpeg1_and_lsf():
    """build_mp3_l3 → parse_mp3_sideinfo recovers every side-info
    field for both layouts (MPEG1 two-granule stereo 32-byte, LSF
    one-granule mono 9-byte), including the 9-bit LSF
    scalefac_compress."""
    from aether_firebase_consumer_spark.operators.mpeg_audio import (
        build_mp3_l3,
        parse_mp3_sideinfo,
    )
    g = _g(p23=160, gg=201, bv=288 - 1, scf=15, table_select=[7, 8, 9],
           region0_count=11, region1_count=5, preflag=1,
           scalefac_scale=1, count1table_select=1)
    st = build_mp3_l3([_frame(
        "1", 0, [[g, _g(p23=80)], [_g(p23=64), _g(p23=72)]],
        channels=2)])
    f = parse_mp3_sideinfo(st)["frames"][0]
    got = f["granules"][0][0]
    assert got["table_select"] == [7, 8, 9]
    assert (got["region0_count"], got["region1_count"]) == (11, 5)
    assert (got["preflag"], got["scalefac_scale"],
            got["count1table_select"]) == (1, 1, 1)
    assert got["global_gain"] == 201 and got["big_values"] == 287
    assert f["main_bits_used"] == 160 + 80 + 64 + 72

    lsf = build_mp3_l3([_frame(
        "2", 0, [[_g(p23=96, scf=400)]])])
    f2 = parse_mp3_sideinfo(lsf)["frames"][0]
    assert f2["granules"][0][0]["scalefac_compress"] == 400
    assert "preflag" not in f2["granules"][0][0]  # LSF: no preflag


def test_sideinfo_reservoir_choreography_and_cuts():
    """A 3-frame stream whose middle frame reaches back into frame 1's
    slot: reservoir offsets, ancillary slack, and cut-safe flags all
    line up; mp3_cut_points returns exactly the mdb==0 offsets."""
    from aether_firebase_consumer_spark.operators.mpeg_audio import (
        build_mp3_l3,
        mp3_cut_points,
        parse_mp3_sideinfo,
    )
    st = build_mp3_l3([
        _frame("1", 0),
        _frame("1", 40),
        _frame("1", 0),
    ])
    info = parse_mp3_sideinfo(st)
    f0, f1, f2 = info["frames"]
    # MPEG1 mono @64kbps/44.1k: 208-byte frame, 187-byte slot
    assert f0["main_avail_bytes"] == 187
    assert (f0["cut_safe"], f1["cut_safe"], f2["cut_safe"]) \
        == (True, False, True)
    assert f1["main_start_byte"] == 187 - 40
    # frame 0 used 2 granules x 96 bits = 24 bytes; slack to frame
    # 1's start
    assert f0["ancillary_bits"] == (187 - 40 - 24) * 8
    assert info["reservoir_max_bytes"] == 40
    assert info["n_cut_safe"] == 2
    assert mp3_cut_points(st) == [f0["offset"], f2["offset"]]


def test_sideinfo_invariant_violations_raise():
    """Each spec invariant fails loudly: reaching before reservoir
    byte 0, overrunning the slot, overlapping the previous frame's
    coded bits — at build time AND at parse time (via a hand-corrupted
    stream)."""
    import pytest

    from aether_firebase_consumer_spark.operators.mpeg_audio import (
        build_mp3_l3,
        parse_mp3_sideinfo,
    )
    with pytest.raises(ValueError, match="exceeds reservoir"):
        build_mp3_l3([_frame("1", 10)])     # nothing accumulated yet
    big = [[_g(p23=4000), _g(p23=4000)], [_g(p23=4000), _g(p23=4000)]]
    with pytest.raises(ValueError, match="overrun"):
        build_mp3_l3([_frame("1", 0, big)])
    with pytest.raises(ValueError, match="overlap"):
        # frame 0 consumes 48 bytes; frame 1 reaches 187 bytes back
        # into bytes frame 0 already used
        build_mp3_l3([_frame("1", 0), _frame("1", 187)])

    # parse-side: corrupt a valid stream's mdb field (first 9 bits
    # after the 4-byte header) to reach before byte 0
    st = bytearray(build_mp3_l3([_frame("1", 0)]))
    st[4] = 0xFF                            # mdb high bits
    with pytest.raises(ValueError, match="reservoir"):
        parse_mp3_sideinfo(bytes(st))


def test_sideinfo_real_lame_file_golden():
    """The parser against REAL encoder output (gsutil's test.mp3 —
    LAME, MPEG2-LSF mono 64 kbps, digital silence): every frame's
    side info parses, every reservoir invariant holds, and the
    file-level shape is pinned. Manually-verified bits: frame 5's
    side info bytes ff0000034800000000 decode to mdb=255,
    part2_3_length=0, global_gain=210 — matching this parse."""
    import os

    import pytest

    if not os.path.exists(REAL_MP3):
        pytest.skip("gsutil test.mp3 not in this image")
    from aether_firebase_consumer_spark.operators.mpeg_audio import (
        parse_mp3_sideinfo,
    )
    with open(REAL_MP3, "rb") as fh:
        info = parse_mp3_sideinfo(fh.read())
    assert len(info["frames"]) == 45
    # LAME silence: zero coded bits everywhere, reservoir pointer
    # pinned at the LSF cap
    assert info["total_main_bits"] == 0
    assert info["reservoir_max_bytes"] == 255
    assert all(g["global_gain"] == 210
               for f in info["frames"]
               for chs in f["granules"] for g in chs)
    assert info["frames"][5]["main_data_begin"] == 255
    # 195-byte slots, 196 on padded frames
    assert all(f["main_avail_bytes"] - 195 == f["padding"]
               for f in info["frames"])


# ------------------------------- ID3v2 frames + Vorbis headers (r10)

def test_id3v2_roundtrip_versions_and_encodings():
    """build_id3v2 → parse_id3v2 recovers text frames and comments in
    both tag versions (v2.3 u32 sizes, v2.4 synchsafe sizes) and all
    four spec text encodings, including non-Latin text through the
    UTF-16 BOM path."""
    from aether_firebase_consumer_spark.operators.mpeg_audio import (
        build_id3v2,
        parse_id3v2,
    )
    frames = [("TIT2", "Grüße — überall"), ("TPE1", "spark"),
              ("COMM", "a comment"), ("TALB", "日本語タイトル")]
    for major in (3, 4):
        for enc in (0, 1, 2, 3):
            use = frames if enc != 0 else [("TIT2", "plain"),
                                           ("COMM", "latin only")]
            tag = build_id3v2(use, major=major, encoding=enc)
            got = parse_id3v2(tag)
            assert got["version"] == f"2.{major}"
            texts = {f["id"]: f["text"] for f in got["frames"]}
            for fid, txt in use:
                assert texts[fid] == txt, (major, enc, fid)


def test_id3v2_prepended_to_frames_walks_consistently():
    """A tag ahead of audio frames: the framing walker's synchsafe
    skip and the tag parser's declared size agree, and the audio
    frame count is unaffected."""
    from aether_firebase_consumer_spark.operators.mpeg_audio import (
        build_id3v2,
        build_mp3,
        parse_id3v2,
        parse_mp3_frames,
    )
    stream = build_id3v2([("TIT2", "t")]) + build_mp3(
        [("1", 3, 5, 0, 0)] * 3)
    info = parse_mp3_frames(stream)
    assert info["id3v2_bytes"] == parse_id3v2(stream)["tag_bytes"]
    assert len(info["frames"]) == 3


def test_id3v2_rejects_malformed():
    import pytest

    from aether_firebase_consumer_spark.operators.mpeg_audio import (
        build_id3v2,
        parse_id3v2,
    )
    assert parse_id3v2(b"no tag here") == {
        "version": None, "tag_bytes": 0, "frames": []}
    tag = bytearray(build_id3v2([("TIT2", "x")]))
    tag[3] = 2                            # ID3v2.2: unsupported
    with pytest.raises(ValueError, match="unsupported version"):
        parse_id3v2(bytes(tag))
    tag = bytearray(build_id3v2([("TIT2", "x")]))
    tag[10] = 0x7E                        # '~': not A-Z0-9
    with pytest.raises(ValueError, match="bad frame id"):
        parse_id3v2(bytes(tag))
    tag = bytearray(build_id3v2([("TIT2", "x")], padding=0))
    tag[17] = 0xFF                        # frame size overruns tag
    with pytest.raises(ValueError, match="overruns|non-synchsafe"):
        parse_id3v2(bytes(tag))


def test_id3v2_real_lavf_tag_golden():
    """The real file's tag (written by libavformat): ID3v2.4 with a
    TSSE encoder-settings frame — parsed text pinned."""
    import os

    import pytest

    if not os.path.exists(REAL_MP3):
        pytest.skip("gsutil test.mp3 not in this image")
    from aether_firebase_consumer_spark.operators.mpeg_audio import (
        parse_id3v2,
    )
    with open(REAL_MP3, "rb") as fh:
        got = parse_id3v2(fh.read())
    assert got["version"] == "2.4"
    assert got["tag_bytes"] == 32
    assert got["frames"] == [
        {"id": "TSSE", "size": 12, "text": "Lavf53.5.0"}]


def test_vorbis_headers_roundtrip_through_ogg():
    """build_vorbis_headers → mux_ogg → demux_ogg →
    parse_vorbis_headers recovers the identification fields and every
    comment, including non-ASCII UTF-8 values and key case folding."""
    from aether_firebase_consumer_spark.operators.mpeg_audio import (
        build_vorbis_headers,
        demux_ogg,
        mux_ogg,
        parse_vorbis_headers,
    )
    pkts = build_vorbis_headers(
        2, 48000, [("artist", "Ärzte — 日本"), ("TITLE", "x=y=z"),
                   ("TRACKNUMBER", "7")],
        bitrate_nominal=128000, blocksize_0=256, blocksize_1=2048)
    stream = demux_ogg(mux_ogg([(p, -1) for p in pkts], serial=3))[3]
    hdr = parse_vorbis_headers([p for p, _g in stream["packets"]])
    assert (hdr["channels"], hdr["sample_rate"]) == (2, 48000)
    assert hdr["bitrate_nominal"] == 128000
    assert (hdr["blocksize_0"], hdr["blocksize_1"]) == (256, 2048)
    assert hdr["vendor"] == "spark-graft"
    # keys fold to upper case; '=' splits on the FIRST occurrence
    assert ("ARTIST", "Ärzte — 日本") in hdr["comments"]
    assert ("TITLE", "x=y=z") in hdr["comments"]


def test_vorbis_headers_reject_malformed():
    import struct

    import pytest

    from aether_firebase_consumer_spark.operators.mpeg_audio import (
        build_vorbis_headers,
        parse_vorbis_headers,
    )
    good = build_vorbis_headers(1, 8000, [("A", "b")])
    with pytest.raises(ValueError, match="identification"):
        parse_vorbis_headers([b"\x02vorbis" + good[0][7:], good[1]])
    bad0 = bytearray(good[0]); bad0[11] = 0     # zero channels
    with pytest.raises(ValueError, match="zero channels"):
        parse_vorbis_headers([bytes(bad0), good[1]])
    bad1 = bytearray(good[1])
    # inflate a comment length so it overruns the packet
    vlen = struct.unpack("<I", good[1][7:11])[0]
    clen_at = 7 + 4 + vlen + 4
    bad1[clen_at:clen_at + 4] = struct.pack("<I", 10_000)
    with pytest.raises(ValueError, match="overruns"):
        parse_vorbis_headers([good[0], bytes(bad1)])
    with pytest.raises(ValueError, match="blocksize"):
        build_vorbis_headers(1, 8000, [], blocksize_0=100)
