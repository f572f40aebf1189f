"""Pure-Python FLAC codec (stdlib only) — lossless audio for the
multimodal column family.

Implements the subset of the public FLAC specification (RFC 9639 /
xiph.org/flac/format.html) that covers real 16-bit PCM archival use,
the same way ``image_codecs``/``jpeg_codec``/``multimodal`` implement
PNG/JPEG/ADPCM from their specs:

- encoder: STREAMINFO + fixed-blocksize frames, independent channels,
  per-subframe FIXED predictors (order 0-2 chosen by minimal absolute
  residual sum, CONSTANT short-circuit), partitioned-Rice residuals
  (partition order 0, escape code for incompressible partitions),
  frame CRC-8/CRC-16 per spec;
- decoder: CONSTANT / VERBATIM / FIXED order 0-4 subframes, any Rice
  partition order, both 4-bit and 5-bit Rice methods, escape
  partitions, wasted bits, UTF-8-style coded frame numbers, header
  CRC-8 and frame CRC-16 validation. Stereo joint coding
  (left/right/mid-side) and arbitrary-order LPC subframes are not
  emitted by this encoder and raise a clear error on decode — the
  honest subset boundary, like the TIFF/JPEG codecs'.

Lossless means round trips are EXACT for any int16 signal — which is
what lets ``multimodal_flac_stats`` put the whole encode→decode path
under the driver's value-hash oracle gate (the decoded samples are
arithmetically predictable from the inputs; contrast the ADPCM query,
which needed the codec's constant-signal exact point).
"""

from __future__ import annotations

__all__ = ["encode_flac", "decode_flac"]

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    """CRC-8 with polynomial x^8+x^2+x^1+1 (0x07), init 0 — the FLAC
    frame-header checksum."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16 with polynomial 0x8005, init 0 — the FLAC frame
    checksum."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, bits: int) -> None:
        self._acc = (self._acc << bits) | (value & ((1 << bits) - 1))
        self._n += bits
        while self._n >= 8:
            self._n -= 8
            self.buf.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def write_unary(self, q: int) -> None:
        # q zero bits terminated by a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        out = 0
        for _ in range(bits):
            if self.byte >= len(self.data):
                raise ValueError("flac: bitstream truncated")
            out = (out << 1) | ((self.data[self.byte]
                                 >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return out

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _utf8_coded(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame/sample index): the
    smallest nbytes whose capacity (7-nbytes leading-byte bits +
    6 per continuation; 36 for the 7-byte form) fits the value."""
    if n < 0x80:
        return bytes([n])
    for nbytes in range(2, 8):
        cap = 36 if nbytes == 7 else (7 - nbytes) + 6 * (nbytes - 1)
        if n.bit_length() <= cap:
            break
    shift = 6 * (nbytes - 1)
    first = ((0xFF << (8 - nbytes)) & 0xFF) | (n >> shift)
    out = [first & 0xFF]
    for _ in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_coded(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("flac: invalid coded frame number")
    n = first & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        b = br.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("flac: invalid coded-number continuation")
        n = (n << 6) | (b & 0x3F)
    return n


def _zigzag(r: int) -> int:
    return (r << 1) if r >= 0 else (((-r) << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _best_rice_param(residuals: list[int]) -> int:
    total = sum(_zigzag(r) for r in residuals)
    if not residuals:
        return 0
    mean = total / len(residuals)
    p = 0
    while (1 << (p + 1)) < mean + 1 and p < 14:
        p += 1
    return p


def encode_flac(rate: int, channels: int, samples: list[int],
                block_size: int = 4096) -> bytes:
    """Encode interleaved int16 frames as a FLAC stream (independent
    channels, FIXED predictors ≤ order 2, one Rice partition)."""
    if channels < 1 or channels > 8:
        raise ValueError("flac: 1..8 channels")
    if len(samples) % channels:
        raise ValueError("flac: samples not a multiple of channels")
    n_frames_total = len(samples) // channels
    chans = [samples[c::channels] for c in range(channels)]

    # STREAMINFO
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)            # min frame size (unknown)
    si.write(0, 24)            # max frame size (unknown)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(15, 5)            # bits per sample - 1 = 15
    si.write(n_frames_total, 36)
    si.align()
    streaminfo = bytes(si.buf) + b"\x00" * 16   # md5 unset (all zero)
    out = bytearray(b"fLaC")
    out.append(0x80)           # last metadata block, type 0 STREAMINFO
    out += len(streaminfo).to_bytes(3, "big")
    out += streaminfo

    for fi, b0 in enumerate(range(0, n_frames_total, block_size)):
        bs = min(block_size, n_frames_total - b0)
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)        # reserved
        hdr.write(0, 1)        # fixed-blocksize strategy
        hdr.write(0b0111, 4)   # blocksize: 16-bit value-1 follows
        hdr.write(0b0000, 4)   # sample rate: from STREAMINFO
        hdr.write(channels - 1, 4)   # independent channels
        hdr.write(0b100, 3)    # 16 bits per sample
        hdr.write(0, 1)        # reserved
        hdr.align()
        head = bytes(hdr.buf) + _utf8_coded(fi) \
            + (bs - 1).to_bytes(2, "big")
        head += bytes([_crc8(head)])

        body = _BitWriter()
        for c in range(channels):
            x = chans[c][b0:b0 + bs]
            if all(v == x[0] for v in x):
                body.write(0, 1)
                body.write(0b000000, 6)      # CONSTANT
                body.write(0, 1)             # no wasted bits
                body.write(x[0] & 0xFFFF, 16)
                continue
            # pick the fixed order with the smallest |residual| mass
            best_order, best_res, best_cost = 0, x, None
            for order in (0, 1, 2):
                if bs <= order:
                    break
                res = list(x[:order])
                for i in range(order, bs):
                    pred = sum(co * x[i - 1 - k] for k, co in
                               enumerate(_FIXED_COEFS[order]))
                    res.append(x[i] - pred)
                cost = sum(abs(r) for r in res[order:])
                if best_cost is None or cost < best_cost:
                    best_order, best_res, best_cost = order, res, cost
            order, res = best_order, best_res
            body.write(0, 1)
            body.write(0b001000 | order, 6)  # FIXED, order
            body.write(0, 1)                 # no wasted bits
            for w in res[:order]:            # warmup verbatim
                body.write(w & 0xFFFF, 16)
            tail = res[order:]
            body.write(0b00, 2)              # 4-bit Rice params
            body.write(0, 4)                 # partition order 0
            p = _best_rice_param(tail)
            # escape if unary parts would blow up (worst residual)
            if tail and max(_zigzag(r) >> p for r in tail) > 1 << 16:
                body.write(0b1111, 4)        # escape code
                body.write(18, 5)            # raw bits per residual
                for r in tail:
                    body.write(r & 0x3FFFF, 18)
            else:
                body.write(p, 4)
                for r in tail:
                    u = _zigzag(r)
                    body.write_unary(u >> p)
                    body.write(u & ((1 << p) - 1), p)
        body.align()
        frame = head + bytes(body.buf)
        frame += _crc16(frame).to_bytes(2, "big")
        out += frame
    return bytes(out)


_BLOCK_SIZE_CODES = {1: 192, **{i: 576 << (i - 2) for i in range(2, 6)},
                     **{i: 256 << (i - 8) for i in range(8, 16)}}


def decode_flac(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Decode a FLAC stream → (rate, channels, n_frames, samples
    interleaved by frame). Validates magic, STREAMINFO, header CRC-8
    and frame CRC-16."""
    if payload[:4] != b"fLaC":
        raise ValueError("flac: bad stream marker")
    pos = 4
    rate = channels = bps = total = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("flac: truncated metadata")
        last = payload[pos] & 0x80
        btype = payload[pos] & 0x7F
        size = int.from_bytes(payload[pos + 1:pos + 4], "big")
        block = payload[pos + 4:pos + 4 + size]
        pos += 4 + size
        if btype == 0:
            br = _BitReader(block)
            br.read(16)
            br.read(16)
            br.read(24)
            br.read(24)
            rate = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
        if last:
            break
    if rate is None:
        raise ValueError("flac: missing STREAMINFO")
    if bps != 16:
        raise ValueError(f"flac: {bps}-bit streams not supported "
                         "(this codec: 16)")
    out: list[list[int]] = [[] for _ in range(channels)]
    while pos < len(payload) and sum(len(o) for o in out) \
            < total * channels:
        br = _BitReader(payload, pos)
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise ValueError("flac: lost frame sync")
        br.read(1)
        br.read(1)                      # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)
        if ch_code >= 8:
            raise ValueError(
                "flac: joint-stereo channel assignments not supported "
                "(this codec: independent channels)")
        if ch_code + 1 != channels:
            raise ValueError("flac: frame channel count mismatch")
        _read_utf8_coded(br)
        if bs_code == 0b0110:
            bs = br.read(8) + 1
        elif bs_code == 0b0111:
            bs = br.read(16) + 1
        elif bs_code in _BLOCK_SIZE_CODES:
            bs = _BLOCK_SIZE_CODES[bs_code]
        else:
            raise ValueError(f"flac: reserved blocksize code {bs_code}")
        if sr_code == 0b1100:
            br.read(8)
        elif sr_code in (0b1101, 0b1110):
            br.read(16)
        elif sr_code == 0b1111:
            raise ValueError("flac: invalid sample-rate code")
        br.align()
        head_end = br.byte
        if _crc8(payload[pos:head_end]) != payload[head_end]:
            raise ValueError("flac: frame header CRC-8 mismatch")
        br = _BitReader(payload, head_end + 1)

        if ss_code == 0b100:
            f_bps = 16
        elif ss_code == 0b000:
            f_bps = bps
        else:
            raise ValueError("flac: only 16-bit sample size supported")

        for c in range(channels):
            if br.read(1):
                raise ValueError("flac: bad subframe sync bit")
            stype = br.read(6)
            wasted = 0
            if br.read(1):
                wasted = 1 + br.read_unary()
            eff = f_bps - wasted
            if stype == 0:                       # CONSTANT
                v = br.read(eff)
                if v >= 1 << (eff - 1):
                    v -= 1 << eff
                x = [v << wasted] * bs
            elif stype == 1:                     # VERBATIM
                x = []
                for _ in range(bs):
                    v = br.read(eff)
                    if v >= 1 << (eff - 1):
                        v -= 1 << eff
                    x.append(v << wasted)
            elif 8 <= stype <= 12:               # FIXED order 0-4
                order = stype - 8
                warm = []
                for _ in range(order):
                    v = br.read(eff)
                    if v >= 1 << (eff - 1):
                        v -= 1 << eff
                    warm.append(v)
                res = _read_residual(br, bs, order)
                x = list(warm)
                coefs = _FIXED_COEFS[order]
                for i in range(order, bs):
                    pred = sum(co * x[i - 1 - k]
                               for k, co in enumerate(coefs))
                    x.append(res[i - order] + pred)
                if wasted:
                    x = [v << wasted for v in x]
            elif stype >= 32:
                raise ValueError(
                    "flac: LPC subframes not supported (this codec: "
                    "constant/verbatim/fixed)")
            else:
                raise ValueError(f"flac: reserved subframe type {stype}")
            out[c].extend(x)
        br.align()
        if _crc16(payload[pos:br.byte]) != int.from_bytes(
                payload[br.byte:br.byte + 2], "big"):
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = br.byte + 2
    n_frames = min(len(o) for o in out) if out else 0
    if total:
        n_frames = min(n_frames, total)
    inter: list[int] = []
    for f in range(n_frames):
        for c in range(channels):
            inter.append(out[c][f])
    return rate, channels, n_frames, inter


def _read_residual(br: _BitReader, bs: int, order: int) -> list[int]:
    method = br.read(2)
    if method not in (0, 1):
        raise ValueError(f"flac: reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if bs % nparts:
        raise ValueError("flac: partition count does not divide "
                         "block size")
    res: list[int] = []
    for part in range(nparts):
        n = bs // nparts - (order if part == 0 else 0)
        p = br.read(pbits)
        if p == escape:
            raw = br.read(5)
            for _ in range(n):
                v = br.read(raw) if raw else 0
                if raw and v >= 1 << (raw - 1):
                    v -= 1 << raw
                res.append(v)
        else:
            for _ in range(n):
                q = br.read_unary()
                u = (q << p) | (br.read(p) if p else 0)
                res.append(_unzigzag(u))
    return res
