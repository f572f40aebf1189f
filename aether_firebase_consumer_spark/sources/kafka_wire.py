"""Pure-Python Kafka wire protocol: client + in-process mini broker.

The image has neither a Kafka broker nor the spark-sql-kafka jar, so
the reference's actual input path (a consumer poll loop,
``firebase/app/artifacts.py:263-285``) has never been exercisable
end-to-end. This module closes that gap from first principles: it
implements the PUBLIC Kafka wire protocol (kafka.apache.org/protocol —
the v0 APIs with magic-0 message sets) in stdlib Python, giving

* :class:`KafkaWireClient` — a minimal socket client speaking
  Metadata / Produce / Fetch / ListOffsets v0, usable from Spark
  executors (each partition reader opens its own connection), and
* :class:`MiniKafkaBroker` — an in-memory, thread-per-connection
  broker serving the same four APIs, so tests and the registered
  queries can run a REAL produce→fetch round trip over TCP.

``sources/kafka_pysource.py`` builds a PySpark DataSource (batch +
streaming) on top of this client; together they are the jar-free
Kafka source. Against a real cluster the JVM spark-sql-kafka source
remains the production path (``readers.kafka_source_options``
assembles its options) — this module is the proof-of-semantics and
the no-jar escape hatch, exactly like ``avro_codec`` is for Avro.

Beyond the v0 core, the broker/client pair speaks the later protocol
pieces a production deployment leans on, all from the public spec:
magic-2 record batches (Produce v3 / Fetch v4, CRC32C, per-record
timestamps, gzip/Snappy/LZ4/zstd codecs), consumer-group membership
(JoinGroup/SyncGroup/Heartbeat/LeaveGroup with negotiated protocols,
KIP-345 static membership via JoinGroup v5), KIP-98 idempotent
produce (InitProducerId + sequence fencing), and secured listeners
(SASL/PLAIN over the framed SaslHandshake v1 / SaslAuthenticate flow,
TLS or SASL_SSL via stdlib ``ssl``).

Wire format notes:
  request  = int32 size ++ int16 api_key ++ int16 api_version ++
             int32 correlation_id ++ STRING client_id ++ body
  response = int32 size ++ int32 correlation_id ++ body
  STRING   = int16 len (-1 null) ++ utf8 bytes
  BYTES    = int32 len (-1 null) ++ bytes
  ARRAY    = int32 count ++ items
  message  = int32 crc32(magic..end) ++ int8 magic=0 ++ int8 attrs=0
             ++ BYTES key ++ BYTES value
  message set = repeat(int64 offset ++ int32 size ++ message)

Two wire dialects are spoken, negotiated via ApiVersions exactly like
a real client (``KafkaWireClient`` caches the broker's advertised
ranges and picks the highest it knows):

* the v0 APIs with magic-0 message sets (above) — the simplest stable
  dialect, kept for compatibility and as the fallback, and
* the modern record-batch dialect: Produce v3 / Fetch v4 with MAGIC-2
  RECORD BATCHES (CRC32C over the batch, zigzag-varint records,
  per-record TIMESTAMPS and headers — kafka.apache.org/documentation
  #recordbatch) plus ListOffsets v1 (timestamp→offset lookup), which
  is what lets ``kafka_py`` surface the JVM source's ``timestamp``
  column.

Consumer GROUPS: OffsetCommit/OffsetFetch v0 persist positions, and
the full v0 membership protocol — FindCoordinator, JoinGroup,
SyncGroup, Heartbeat, LeaveGroup — runs broker-side rebalancing: the
broker elects the first-sorted member leader, the leader computes the
(client-side, range) assignment from every member's subscription, and
death or departure of a member triggers a generation bump the
survivors observe as REBALANCE_IN_PROGRESS on their next heartbeat.
"""

from __future__ import annotations

import bisect
import socket
import socketserver
import struct
import threading
import time as _time
import zlib
from typing import Iterable, Optional

API_PRODUCE = 0
API_FETCH = 1
API_LIST_OFFSETS = 2
API_METADATA = 3
API_OFFSET_COMMIT = 8
API_OFFSET_FETCH = 9
API_FIND_COORDINATOR = 10
API_JOIN_GROUP = 11
API_HEARTBEAT = 12
API_LEAVE_GROUP = 13
API_SYNC_GROUP = 14
API_SASL_HANDSHAKE = 17
API_VERSIONS = 18
API_INIT_PRODUCER_ID = 22
API_ADD_PARTITIONS_TO_TXN = 24
API_ADD_OFFSETS_TO_TXN = 25
API_END_TXN = 26
API_TXN_OFFSET_COMMIT = 28
API_SASL_AUTHENTICATE = 36

EARLIEST = -2
LATEST = -1

ERR_NONE = 0
ERR_OFFSET_OUT_OF_RANGE = 1
ERR_UNKNOWN_TOPIC_OR_PARTITION = 3
ERR_ILLEGAL_GENERATION = 22
ERR_INCONSISTENT_GROUP_PROTOCOL = 23
ERR_UNKNOWN_MEMBER_ID = 25
ERR_REBALANCE_IN_PROGRESS = 27
ERR_UNSUPPORTED_SASL_MECHANISM = 33
ERR_ILLEGAL_SASL_STATE = 34
ERR_OUT_OF_ORDER_SEQUENCE = 45
ERR_DUPLICATE_SEQUENCE = 46
ERR_INVALID_PRODUCER_EPOCH = 47        # KIP-98 zombie fencing
ERR_INVALID_TXN_STATE = 48
ERR_INVALID_PRODUCER_ID_MAPPING = 49
ERR_CONCURRENT_TRANSACTIONS = 51
ERR_SASL_AUTHENTICATION_FAILED = 58


class GroupRebalanceError(RuntimeError):
    """The group entered a rebalance — the member must rejoin."""


class GroupMembershipError(RuntimeError):
    """Unknown member id or stale generation — rejoin from scratch."""


class ProducerFencedError(RuntimeError):
    """A newer producer instance claimed this transactional.id (its
    InitProducerId bumped the epoch); this instance is a zombie and
    must stop — its writes and EndTxn are rejected broker-side."""


# ---------------------------------------------------------------------------
# primitive codec
# ---------------------------------------------------------------------------

class _Writer:
    def __init__(self) -> None:
        self.buf = bytearray()

    def i8(self, v): self.buf += struct.pack(">b", v)
    def i16(self, v): self.buf += struct.pack(">h", v)
    def i32(self, v): self.buf += struct.pack(">i", v)
    def i64(self, v): self.buf += struct.pack(">q", v)

    def string(self, s: Optional[str]):
        if s is None:
            self.i16(-1)
        else:
            raw = s.encode("utf-8")
            self.i16(len(raw))
            self.buf += raw

    def bytes_(self, b: Optional[bytes]):
        if b is None:
            self.i32(-1)
        else:
            self.i32(len(b))
            self.buf += b

    def raw(self, b: bytes):
        self.buf += b


class _Reader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def _take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise EOFError("short read")
        out = self.data[self.pos:self.pos + n]
        self.pos += n
        return out

    def i8(self): return struct.unpack(">b", self._take(1))[0]
    def i16(self): return struct.unpack(">h", self._take(2))[0]
    def i32(self): return struct.unpack(">i", self._take(4))[0]
    def i64(self): return struct.unpack(">q", self._take(8))[0]

    def string(self) -> Optional[str]:
        n = self.i16()
        return None if n < 0 else self._take(n).decode("utf-8")

    def bytes_(self) -> Optional[bytes]:
        n = self.i32()
        return None if n < 0 else bytes(self._take(n))

    def remaining(self) -> int:
        return len(self.data) - self.pos


# ---------------------------------------------------------------------------
# message sets (magic 0)
# ---------------------------------------------------------------------------

def encode_message(key: Optional[bytes], value: Optional[bytes]) -> bytes:
    """One magic-0 message: crc ++ magic ++ attrs ++ key ++ value."""
    body = _Writer()
    body.i8(0)            # magic
    body.i8(0)            # attributes (no compression)
    body.bytes_(key)
    body.bytes_(value)
    crc = zlib.crc32(bytes(body.buf)) & 0xFFFFFFFF
    out = _Writer()
    out.buf += struct.pack(">I", crc)
    out.raw(bytes(body.buf))
    return bytes(out.buf)


def encode_message_set(
        entries: Iterable[tuple[int, Optional[bytes], Optional[bytes]]]
) -> bytes:
    """(offset, key, value)* → wire message set."""
    w = _Writer()
    for offset, key, value in entries:
        msg = encode_message(key, value)
        w.i64(offset)
        w.i32(len(msg))
        w.raw(msg)
    return bytes(w.buf)


def decode_message_set(data: bytes, *, validate_crc: bool = True
                       ) -> list[tuple[int, Optional[bytes], Optional[bytes]]]:
    """Wire message set → [(offset, key, value)]. A trailing partial
    message (legal in Kafka fetch responses when max_bytes truncates)
    is silently dropped, mirroring consumer behavior."""
    out: list[tuple[int, Optional[bytes], Optional[bytes]]] = []
    r = _Reader(data)
    while r.remaining() >= 12:
        offset = r.i64()
        size = r.i32()
        if size <= 0:
            raise ValueError(
                f"message at offset {offset}: non-positive size {size}")
        if r.remaining() < size:
            break  # partial trailing message
        msg = r._take(size)
        mr = _Reader(msg)
        crc = struct.unpack(">I", mr._take(4))[0]
        rest = msg[4:]
        if validate_crc and (zlib.crc32(rest) & 0xFFFFFFFF) != crc:
            raise ValueError(f"message at offset {offset}: CRC mismatch")
        magic = mr.i8()
        if magic != 0:
            raise ValueError(f"unsupported message magic {magic}")
        mr.i8()  # attributes
        key = mr.bytes_()
        value = mr.bytes_()
        out.append((offset, key, value))
    return out


# ---------------------------------------------------------------------------
# record batches (magic 2)
# ---------------------------------------------------------------------------

def _crc32c_table() -> list[int]:
    # CRC-32C (Castagnoli), reflected polynomial 0x82F63B78 — the
    # checksum magic-2 record batches carry (zlib.crc32 is CRC-32/ISO,
    # a different polynomial; Kafka switched for v2)
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
        table.append(c)
    return table


_CRC32C_TABLE = _crc32c_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    tab = _CRC32C_TABLE
    for b in data:
        crc = tab[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _put_varint(buf: bytearray, n: int) -> None:
    v = _zigzag(n)
    while v >= 0x80:
        buf.append((v & 0x7F) | 0x80)
        v >>= 7
    buf.append(v)


def _get_varint(data: bytes, pos: int) -> tuple[int, int]:
    shift = v = 0
    while True:
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(v), pos
        shift += 7


ATTR_TIMESTAMP_LOG_APPEND = 1 << 3
#: magic-2 attributes bit 4 — this batch is part of an (open-until-
#: EndTxn) transaction; read_committed fetches must not surface it
#: before the commit marker lands
ATTR_TRANSACTIONAL = 1 << 4
#: bit 5 — control batch (commit/abort marker). This broker keeps
#: markers out of the record log (they occupy an offset, leaving the
#: same gap consumers already tolerate from compaction) so the
#: constant documents the wire format; fetch responses never carry it
ATTR_CONTROL = 1 << 5


#: attributes bits 0-2: compression codec ids from the public spec
CODEC_NONE, CODEC_GZIP, CODEC_SNAPPY, CODEC_LZ4, CODEC_ZSTD = \
    0, 1, 2, 3, 4


def encode_record_batch(
        entries: list[tuple[int, int, Optional[bytes], Optional[bytes]]],
        *, log_append_time: bool = False,
        codec: Optional[str] = None,
        producer_id: int = -1, producer_epoch: int = -1,
        base_sequence: int = -1, transactional: bool = False) -> bytes:
    """(offset, timestamp_ms, key, value)* → one magic-2 record batch.

    Offsets need not be dense (log compaction leaves gaps; deltas
    carry them). Timestamps are per-record; the batch stores base/max
    and zigzag deltas. ``log_append_time`` sets the attributes bit
    real brokers use to mark broker-stamped (vs producer CreateTime)
    timestamps. ``codec="gzip"``/``"snappy"``/``"lz4"``/``"zstd"``
    compress the
    RECORDS section (only — the header stays plain, per the spec); the
    CRC32C covers the batch body as stored, compressed bytes included.
    Snappy here is the raw block format (``sources/snappy_py``) —
    magic-2 batches never use the legacy xerial framing — LZ4 is
    the standard FRAME format (``sources/lz4_py``), per the magic-≥1
    convention real brokers follow, and zstd is the standard RFC 8878
    frame (``sources/zstd_py``; our producer emits store-only frames,
    and the decoder accepts anything a real broker serves)."""
    if codec not in (None, "gzip", "snappy", "lz4", "zstd"):
        raise ValueError(f"unsupported record-batch codec {codec!r} "
                         "(this image: gzip, snappy, lz4, or zstd)")
    if not entries:
        return b""
    base_off = entries[0][0]
    base_ts = entries[0][1]
    max_ts = max(e[1] for e in entries)
    records = bytearray()
    for entry in entries:
        # 4-tuple (off, ts, key, value) or 5-tuple + headers, where
        # headers is a sequence of (str key, bytes|None value) — the
        # record-level key/value pairs KIP-82 added for metadata
        off, ts, key, value = entry[:4]
        headers = entry[4] if len(entry) > 4 else ()
        rec = bytearray()
        rec.append(0)                      # record attributes
        _put_varint(rec, ts - base_ts)     # timestampDelta
        _put_varint(rec, off - base_off)   # offsetDelta
        if key is None:
            _put_varint(rec, -1)
        else:
            _put_varint(rec, len(key))
            rec += key
        if value is None:
            _put_varint(rec, -1)
        else:
            _put_varint(rec, len(value))
            rec += value
        _put_varint(rec, len(headers))
        for hk, hv in headers:
            hkb = hk.encode("utf-8")
            _put_varint(rec, len(hkb))     # header keys are non-null
            rec += hkb
            if hv is None:
                _put_varint(rec, -1)
            else:
                _put_varint(rec, len(hv))
                rec += hv
        _put_varint(records, len(rec))
        records += rec
    attrs = ATTR_TIMESTAMP_LOG_APPEND if log_append_time else 0
    if transactional:
        attrs |= ATTR_TRANSACTIONAL
    payload = bytes(records)
    if codec == "gzip":
        import gzip as _gzip
        attrs |= CODEC_GZIP
        payload = _gzip.compress(payload, mtime=0)  # deterministic
    elif codec == "snappy":
        from aether_firebase_consumer_spark.sources import snappy_py
        attrs |= CODEC_SNAPPY
        payload = snappy_py.compress(payload)
    elif codec == "lz4":
        from aether_firebase_consumer_spark.sources import lz4_py
        attrs |= CODEC_LZ4
        payload = lz4_py.compress_frame(payload)
    elif codec == "zstd":
        from aether_firebase_consumer_spark.sources import zstd_py
        attrs |= CODEC_ZSTD
        payload = zstd_py.compress(payload)
    body = _Writer()                       # attributes .. records
    body.i16(attrs)
    body.i32(entries[-1][0] - base_off)    # lastOffsetDelta
    body.i64(base_ts)
    body.i64(max_ts)
    body.i64(producer_id)                  # KIP-98 idempotence fields
    body.i16(producer_epoch)
    body.i32(base_sequence)
    body.i32(len(entries))
    body.raw(payload)
    crc = crc32c(bytes(body.buf))
    w = _Writer()
    w.i64(base_off)
    w.i32(4 + 1 + 4 + len(body.buf))       # batchLength: epoch..end
    w.i32(-1)                              # partitionLeaderEpoch
    w.i8(2)                                # magic
    w.buf += struct.pack(">I", crc)
    w.raw(bytes(body.buf))
    return bytes(w.buf)


def peek_batch_producer(data: bytes) -> tuple[int, int, int, int, int]:
    """(producerId, producerEpoch, baseSequence, record count,
    attributes) of the FIRST record batch in ``data`` — the fields the
    broker's KIP-98 duplicate/transaction checks read before any
    decompression. Fixed offsets per the magic-2 layout: body starts
    at 21; attributes at body+0; producerId at body+30."""
    if len(data) < 61:
        raise ValueError("record batch shorter than its header")
    if data[16] != 2:
        raise ValueError(f"unsupported record-batch magic {data[16]}")
    attrs, = struct.unpack_from(">h", data, 21)
    pid, = struct.unpack_from(">q", data, 43)
    epoch, = struct.unpack_from(">h", data, 51)
    base_seq, = struct.unpack_from(">i", data, 53)
    count, = struct.unpack_from(">i", data, 57)
    return pid, epoch, base_seq, count, attrs


def decode_record_batches(data: bytes, *, validate_crc: bool = True,
                          with_headers: bool = False
                          ) -> list[tuple]:
    """Concatenated magic-2 record batches → [(offset, timestamp_ms,
    key, value)] — or 5-tuples ending in a (key, value) header tuple
    when ``with_headers`` (KIP-82 record headers; parsed either way,
    surfaced on request so existing 4-tuple callers stay unchanged).
    A trailing partial batch (max_bytes truncation) is dropped,
    mirroring consumer behavior."""
    out: list[tuple] = []
    pos = 0
    while len(data) - pos >= 12:
        base_off, batch_len = struct.unpack_from(">qi", data, pos)
        end = pos + 12 + batch_len
        if batch_len <= 0 or end > len(data):
            break  # partial trailing batch
        magic = data[pos + 16]
        if magic != 2:
            raise ValueError(f"unsupported record-batch magic {magic}")
        (crc,) = struct.unpack_from(">I", data, pos + 17)
        body = data[pos + 21:end]
        if validate_crc and crc32c(body) != crc:
            raise ValueError(
                f"record batch at offset {base_off}: CRC32C mismatch")
        attrs, _last_delta, base_ts = struct.unpack_from(">hiq", body, 0)
        comp = attrs & 0x07
        if comp not in (CODEC_NONE, CODEC_GZIP, CODEC_SNAPPY,
                        CODEC_LZ4, CODEC_ZSTD):
            raise ValueError(
                f"compressed record batch codec {comp} unsupported "
                "(this image decodes none/gzip/snappy/lz4/zstd)")
        (count,) = struct.unpack_from(">i", body, 36)
        recs = body[40:]
        if comp == CODEC_GZIP:
            import gzip as _gzip
            recs = _gzip.decompress(recs)
        elif comp == CODEC_SNAPPY:
            from aether_firebase_consumer_spark.sources import snappy_py
            recs = snappy_py.decompress(bytes(recs))
        elif comp == CODEC_LZ4:
            from aether_firebase_consumer_spark.sources import lz4_py
            recs = lz4_py.decompress_frame(bytes(recs))
        elif comp == CODEC_ZSTD:
            from aether_firebase_consumer_spark.sources import zstd_py
            recs = zstd_py.decompress(bytes(recs))
        p = 0
        for _ in range(count):
            rec_len, p = _get_varint(recs, p)
            rec_end = p + rec_len
            p += 1  # record attributes
            ts_delta, p = _get_varint(recs, p)
            off_delta, p = _get_varint(recs, p)
            klen, p = _get_varint(recs, p)
            key = None if klen < 0 else bytes(recs[p:p + klen])
            p += max(klen, 0)
            vlen, p = _get_varint(recs, p)
            value = None if vlen < 0 else bytes(recs[p:p + vlen])
            p += max(vlen, 0)
            if with_headers:
                nh, p = _get_varint(recs, p)
                hdrs = []
                for _ in range(nh):
                    hkl, p = _get_varint(recs, p)
                    hk = bytes(recs[p:p + hkl]).decode("utf-8")
                    p += hkl
                    hvl, p = _get_varint(recs, p)
                    hv = None if hvl < 0 else bytes(recs[p:p + hvl])
                    p += max(hvl, 0)
                    hdrs.append((hk, hv))
                out.append((base_off + off_delta, base_ts + ts_delta,
                            key, value, tuple(hdrs)))
            else:
                out.append((base_off + off_delta, base_ts + ts_delta,
                            key, value))
            p = rec_end  # headers skipped unless requested
        pos = end
    return out


# ---------------------------------------------------------------------------
# consumer-protocol payloads (the opaque BYTES inside JoinGroup/SyncGroup)
# ---------------------------------------------------------------------------

def encode_subscription(topics: list[str]) -> bytes:
    """ConsumerProtocolSubscription v0: the metadata a member attaches
    to its JoinGroup 'range'/'roundrobin' protocol entry."""
    w = _Writer()
    w.i16(0)                   # version
    w.i32(len(topics))
    for t in topics:
        w.string(t)
    w.bytes_(b"")              # userdata
    return bytes(w.buf)


def decode_subscription(data: bytes) -> list[str]:
    r = _Reader(data)
    r.i16()
    return [r.string() or "" for _ in range(r.i32())]


def encode_assignment(parts: dict[str, list[int]]) -> bytes:
    """ConsumerProtocolAssignment v0: what the leader hands each
    member through SyncGroup."""
    w = _Writer()
    w.i16(0)
    w.i32(len(parts))
    for topic in sorted(parts):
        w.string(topic)
        w.i32(len(parts[topic]))
        for p in parts[topic]:
            w.i32(p)
    w.bytes_(b"")
    return bytes(w.buf)


def decode_assignment(data: bytes) -> dict[str, list[int]]:
    if not data:
        return {}
    r = _Reader(data)
    r.i16()
    out: dict[str, list[int]] = {}
    for _ in range(r.i32()):
        topic = r.string() or ""
        out[topic] = [r.i32() for _ in range(r.i32())]
    return out


def range_assignment(members: dict[str, list[str]],
                     topo: dict[str, list[int]]
                     ) -> dict[str, dict[str, list[int]]]:
    """The RangeAssignor every leader runs client-side: per topic,
    partitions sorted and split into contiguous ranges over the
    members subscribed to it (sorted by member id), earlier members
    absorbing the remainder — the public algorithm from Kafka's
    RangeAssignor javadoc."""
    out: dict[str, dict[str, list[int]]] = {m: {} for m in members}
    topics = sorted({t for subs in members.values() for t in subs})
    for topic in topics:
        parts = sorted(topo.get(topic, []))
        subs = sorted(m for m, ts in members.items() if topic in ts)
        if not parts or not subs:
            continue
        per, extra = divmod(len(parts), len(subs))
        pos = 0
        for i, m in enumerate(subs):
            n = per + (1 if i < extra else 0)
            if n:
                out[m][topic] = parts[pos:pos + n]
            pos += n
    return out


# ---------------------------------------------------------------------------
# client
# ---------------------------------------------------------------------------

def _recv_exact(sock: socket.socket, n: int) -> bytes:
    chunks = []
    while n:
        chunk = sock.recv(n)
        if not chunk:
            raise ConnectionError("broker closed connection")
        chunks.append(chunk)
        n -= len(chunk)
    return b"".join(chunks)


class KafkaWireClient:
    """Minimal blocking Kafka client (v0 APIs). One TCP connection;
    NOT thread-safe — Spark partition readers each construct their
    own, which is exactly the consumer-per-task model."""

    def __init__(self, host: str, port: int,
                 client_id: str = "afcs", timeout: float = 30.0,
                 ssl_context=None,
                 sasl_plain: Optional[tuple[str, str]] = None) -> None:
        self.host, self.port = host, port
        self.client_id = client_id
        self._corr = 0
        self._vers: Optional[dict[int, tuple[int, int]]] = None
        self._sock = socket.create_connection((host, port), timeout=timeout)
        if ssl_context is not None:
            # TLS wraps the raw socket; every Kafka frame after this
            # point rides the encrypted channel (SSL or SASL_SSL)
            self._sock = ssl_context.wrap_socket(
                self._sock, server_hostname=host)
        if sasl_plain is not None:
            self._sasl_plain(*sasl_plain)

    def _sasl_plain(self, username: str, password: str) -> None:
        """SASL/PLAIN (RFC 4616) over the Kafka-framed flow:
        SaslHandshake v1 negotiates the mechanism, SaslAuthenticate v0
        carries the NUL-delimited credentials. Until this succeeds a
        SASL broker answers nothing but the handshake APIs."""
        w = _Writer()
        w.string("PLAIN")
        r = self._call(API_SASL_HANDSHAKE, bytes(w.buf), version=1)
        err = r.i16()
        mechs = [r.string() for _ in range(r.i32())]
        if err != ERR_NONE:
            raise RuntimeError(
                f"SASL handshake rejected (error {err}); broker "
                f"offers {mechs}")
        w = _Writer()
        w.bytes_(b"\x00" + username.encode() + b"\x00"
                 + password.encode())
        r = self._call(API_SASL_AUTHENTICATE, bytes(w.buf))
        err = r.i16()
        msg = r.string()
        if err != ERR_NONE:
            raise RuntimeError(
                f"SASL authentication failed: {msg or f'error {err}'}")

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- framing ----------------------------------------------------------
    def _call(self, api_key: int, body: bytes, version: int = 0) -> _Reader:
        self._corr += 1
        head = _Writer()
        head.i16(api_key)
        head.i16(version)
        head.i32(self._corr)
        head.string(self.client_id)
        payload = bytes(head.buf) + body
        self._sock.sendall(struct.pack(">i", len(payload)) + payload)
        (size,) = struct.unpack(">i", _recv_exact(self._sock, 4))
        resp = _Reader(_recv_exact(self._sock, size))
        corr = resp.i32()
        if corr != self._corr:
            raise ValueError(f"correlation mismatch {corr} != {self._corr}")
        return resp

    def _max_version(self, api_key: int) -> int:
        """Highest version the broker advertises for ``api_key`` (one
        cached ApiVersions round trip — the negotiation every real
        client does before its first request). A broker that cannot
        answer ApiVersions at all is treated as v0-everything."""
        if self._vers is None:
            try:
                self._vers = self.api_versions()
            except (RuntimeError, ValueError, ConnectionError, EOFError):
                self._vers = {}
        return self._vers.get(api_key, (0, 0))[1]

    # -- apis -------------------------------------------------------------
    def metadata(self, topics: Optional[list[str]] = None
                 ) -> dict[str, list[int]]:
        """topic → sorted partition ids. ``topics=None`` lists all."""
        w = _Writer()
        names = topics or []
        w.i32(len(names))
        for t in names:
            w.string(t)
        r = self._call(API_METADATA, bytes(w.buf))
        for _ in range(r.i32()):      # brokers
            r.i32(); r.string(); r.i32()
        out: dict[str, list[int]] = {}
        for _ in range(r.i32()):      # topics
            err = r.i16()
            name = r.string() or ""
            parts = []
            for _ in range(r.i32()):
                r.i16()               # partition error
                pid = r.i32()
                r.i32()               # leader
                for _ in range(r.i32()):
                    r.i32()           # replicas
                for _ in range(r.i32()):
                    r.i32()           # isr
                parts.append(pid)
            if err == ERR_NONE:
                out[name] = sorted(parts)
        return out

    def produce(self, topic: str, partition: int,
                messages: list[tuple[Optional[bytes], Optional[bytes]]]
                ) -> int:
        """Append (key, value) messages; returns the base offset.
        Broker stamps LogAppendTime timestamps (v0 carries none on the
        wire); use :meth:`produce_records` to ship producer
        CreateTime timestamps."""
        mset = encode_message_set((0, k, v) for k, v in messages)
        w = _Writer()
        w.i16(1)      # acks
        w.i32(10000)  # timeout
        w.i32(1)      # one topic
        w.string(topic)
        w.i32(1)      # one partition
        w.i32(partition)
        w.i32(len(mset))
        w.raw(mset)
        r = self._call(API_PRODUCE, bytes(w.buf))
        r.i32()       # topic count (1)
        r.string()
        r.i32()       # partition count (1)
        r.i32()       # partition id
        err = r.i16()
        base = r.i64()
        if err != ERR_NONE:
            raise RuntimeError(f"produce failed: error {err}")
        return base

    def produce_records(
            self, topic: str, partition: int,
            messages: list[tuple[Optional[bytes], Optional[bytes], int]],
            codec: Optional[str] = None,
            producer_id: int = -1, producer_epoch: int = -1,
            base_sequence: int = -1,
            transactional_id: Optional[str] = None) -> int:
        """Append (key, value, timestamp_ms) via Produce v3 (magic-2
        record batch, producer CreateTime timestamps); returns the
        base offset. ``codec="gzip"``/``"snappy"``/``"lz4"``/``"zstd"`` ships the
        batch compressed. ``producer_id``/``producer_epoch``/
        ``base_sequence`` stamp the KIP-98 idempotence fields (see
        :class:`IdempotentProducer`); the broker then discards
        duplicate retries of the same sequence. A non-null
        ``transactional_id`` marks the batch transactional (attrs bit
        4) — it stays invisible to read_committed fetches until the
        producer's EndTxn writes the commit marker (see
        :class:`TransactionalProducer`).
        Requires a broker advertising Produce ≥ v3 — raises otherwise
        rather than silently dropping timestamps."""
        if self._max_version(API_PRODUCE) < 3:
            raise RuntimeError(
                "broker does not support Produce v3 (record batches); "
                "use produce() for the magic-0 path")
        batch = encode_record_batch(
            [(i, m[2], m[0], m[1]) + ((m[3],) if len(m) > 3 else ())
             for i, m in enumerate(messages)],
            codec=codec, producer_id=producer_id,
            producer_epoch=producer_epoch, base_sequence=base_sequence,
            transactional=transactional_id is not None)
        w = _Writer()
        w.string(transactional_id)
        w.i16(1)        # acks
        w.i32(10000)    # timeout
        w.i32(1)
        w.string(topic)
        w.i32(1)
        w.i32(partition)
        w.i32(len(batch))
        w.raw(batch)
        r = self._call(API_PRODUCE, bytes(w.buf), version=3)
        r.i32()         # topic count
        r.string()
        r.i32()         # partition count
        r.i32()         # partition id
        err = r.i16()
        base = r.i64()
        r.i64()         # log_append_time
        r.i32()         # throttle_time_ms
        if err == ERR_OUT_OF_ORDER_SEQUENCE:
            raise RuntimeError(
                "produce rejected: out-of-order sequence number (a "
                "prior batch from this producer was lost — KIP-98 "
                "gap fencing)")
        if err == ERR_DUPLICATE_SEQUENCE:
            raise RuntimeError(
                "produce rejected: duplicate sequence number below "
                "the broker's deduplication window")
        if err == ERR_INVALID_PRODUCER_EPOCH:
            raise ProducerFencedError(
                "produce rejected: producer epoch is stale — another "
                "producer with the same transactional.id has since "
                "called InitProducerId (KIP-98 zombie fencing)")
        if err == ERR_INVALID_TXN_STATE:
            raise RuntimeError(
                "produce rejected: transactional batch for a "
                "partition not added to the ongoing transaction "
                "(AddPartitionsToTxn must precede the produce)")
        if err != ERR_NONE:
            raise RuntimeError(f"produce failed: error {err}")
        return base

    def init_producer_id(self, transactional_id: Optional[str] = None
                         ) -> tuple[int, int]:
        """InitProducerId v0 (KIP-98): a broker-assigned
        (producer_id, epoch). With a ``transactional_id`` the id is
        STABLE across calls for that id and the epoch BUMPS each call
        — the fencing handshake: the newest caller holds the highest
        epoch and every older producer instance's produce/EndTxn is
        rejected with INVALID_PRODUCER_EPOCH. Any transaction the
        previous instance left open is aborted broker-side before the
        response returns."""
        w = _Writer()
        w.string(transactional_id)
        w.i32(60000)     # transaction_timeout_ms
        r = self._call(API_INIT_PRODUCER_ID, bytes(w.buf))
        r.i32()          # throttle_time_ms
        err = r.i16()
        pid = r.i64()
        epoch = r.i16()
        if err != ERR_NONE:
            raise RuntimeError(f"init_producer_id failed: error {err}")
        return pid, epoch

    # -- transactions (KIP-98 part 2) ---------------------------------

    def _txn_err(self, err: int, what: str) -> None:
        if err == ERR_NONE:
            return
        if err == ERR_INVALID_PRODUCER_EPOCH:
            raise ProducerFencedError(
                f"{what} rejected: stale producer epoch (fenced by a "
                "newer InitProducerId for this transactional.id)")
        if err == ERR_INVALID_PRODUCER_ID_MAPPING:
            raise RuntimeError(
                f"{what} rejected: producer id does not match the "
                "coordinator's mapping for this transactional.id")
        if err == ERR_INVALID_TXN_STATE:
            raise RuntimeError(
                f"{what} rejected: no ongoing transaction in the "
                "state this request requires")
        raise RuntimeError(f"{what} failed: error {err}")

    def add_partitions_to_txn(self, transactional_id: str, pid: int,
                              epoch: int,
                              parts: dict[str, list[int]]) -> None:
        """AddPartitionsToTxn v0: register the partitions the ongoing
        transaction will produce to — the coordinator needs the set up
        front so EndTxn knows where to write markers."""
        w = _Writer()
        w.string(transactional_id)
        w.i64(pid)
        w.i16(epoch)
        w.i32(len(parts))
        for topic, plist in parts.items():
            w.string(topic)
            w.i32(len(plist))
            for p in plist:
                w.i32(p)
        r = self._call(API_ADD_PARTITIONS_TO_TXN, bytes(w.buf))
        r.i32()          # throttle_time_ms
        for _ in range(r.i32()):
            topic = r.string() or ""
            for _ in range(r.i32()):
                p = r.i32()
                self._txn_err(r.i16(),
                              f"add_partitions_to_txn {topic}/{p}")

    def add_offsets_to_txn(self, transactional_id: str, pid: int,
                           epoch: int, group: str) -> None:
        """AddOffsetsToTxn v0: declare that this transaction will also
        commit consumer-group offsets (the consume-transform-produce
        loop's read position) atomically with its produced records."""
        w = _Writer()
        w.string(transactional_id)
        w.i64(pid)
        w.i16(epoch)
        w.string(group)
        r = self._call(API_ADD_OFFSETS_TO_TXN, bytes(w.buf))
        r.i32()          # throttle_time_ms
        self._txn_err(r.i16(), "add_offsets_to_txn")

    def txn_offset_commit(self, transactional_id: str, group: str,
                          pid: int, epoch: int,
                          offsets: dict[tuple[str, int], int]) -> None:
        """TxnOffsetCommit v0: stage consumer offsets inside the
        ongoing transaction — they become the group's committed
        positions only when EndTxn commits, and vanish on abort."""
        by_topic: dict[str, list[tuple[int, int]]] = {}
        for (topic, p), off in offsets.items():
            by_topic.setdefault(topic, []).append((p, off))
        w = _Writer()
        w.string(transactional_id)
        w.string(group)
        w.i64(pid)
        w.i16(epoch)
        w.i32(len(by_topic))
        for topic, plist in by_topic.items():
            w.string(topic)
            w.i32(len(plist))
            for p, off in plist:
                w.i32(p)
                w.i64(off)
                w.string(None)   # metadata
        r = self._call(API_TXN_OFFSET_COMMIT, bytes(w.buf))
        r.i32()          # throttle_time_ms
        for _ in range(r.i32()):
            topic = r.string() or ""
            for _ in range(r.i32()):
                p = r.i32()
                self._txn_err(r.i16(), f"txn_offset_commit {topic}/{p}")

    def end_txn(self, transactional_id: str, pid: int, epoch: int,
                commit: bool) -> None:
        """EndTxn v0: commit or abort the ongoing transaction. The
        broker writes a control marker to every added partition
        (occupying an offset — committed consumption sees the same
        offset gaps log compaction already creates), applies or drops
        the staged consumer offsets, and unblocks read_committed
        fetches past the transaction's first offset."""
        w = _Writer()
        w.string(transactional_id)
        w.i64(pid)
        w.i16(epoch)
        w.i8(1 if commit else 0)
        r = self._call(API_END_TXN, bytes(w.buf))
        r.i32()          # throttle_time_ms
        self._txn_err(r.i16(), "end_txn")

    def fetch(self, topic: str, partition: int, offset: int,
              max_bytes: int = 1 << 20
              ) -> list[tuple[int, Optional[bytes], Optional[bytes]]]:
        """Fetch from ``offset``; returns [(offset, key, value)]."""
        w = _Writer()
        w.i32(-1)     # replica_id
        w.i32(0)      # max_wait_ms (broker answers immediately)
        w.i32(0)      # min_bytes
        w.i32(1)
        w.string(topic)
        w.i32(1)
        w.i32(partition)
        w.i64(offset)
        w.i32(max_bytes)
        r = self._call(API_FETCH, bytes(w.buf))
        r.i32()       # topic count
        r.string()
        r.i32()       # partition count
        r.i32()       # partition id
        err = r.i16()
        r.i64()       # high watermark
        size = r.i32()
        raw = r._take(size)
        if err != ERR_NONE:
            raise RuntimeError(f"fetch failed: error {err}")
        return decode_message_set(raw)

    def fetch_records(self, topic: str, partition: int, offset: int,
                      max_bytes: int = 1 << 20,
                      isolation: str = "read_uncommitted"
                      ) -> list[tuple[int, Optional[int],
                                      Optional[bytes], Optional[bytes]]]:
        """Fetch with timestamps: [(offset, timestamp_ms, key, value)].

        Uses Fetch v4 (magic-2 record batches) when the broker
        advertises it; falls back to v0 message sets with
        ``timestamp=None`` (magic-0 carries no timestamp) — so callers
        get one shape either way and the timestamp column degrades to
        null instead of failing against an old broker.
        ``isolation="read_committed"`` surfaces only records of
        COMMITTED transactions below the last stable offset (requires
        Fetch v4)."""
        if self._max_version(API_FETCH) < 4:
            if isolation == "read_committed":
                raise RuntimeError(
                    "read_committed requires Fetch v4 (isolation "
                    "levels); this broker tops out below it")
            return [(off, None, k, v)
                    for off, k, v in self.fetch(topic, partition, offset,
                                                max_bytes)]
        recs, _hw, _lso = self.fetch_records_meta(
            topic, partition, offset, max_bytes, isolation)
        return recs

    def fetch_records_meta(self, topic: str, partition: int,
                           offset: int, max_bytes: int = 1 << 20,
                           isolation: str = "read_uncommitted",
                           include_headers: bool = False
                           ) -> tuple[list[tuple], int, int]:
        """Fetch v4 returning (records, high_watermark,
        last_stable_offset). A read_committed consumer needs the LSO
        to advance past a span whose every record belonged to aborted
        transactions (the fetch legitimately returns zero records
        while the position is still behind the log end)."""
        if isolation not in ("read_uncommitted", "read_committed"):
            raise ValueError(f"unknown isolation level {isolation!r}")
        if self._max_version(API_FETCH) < 4:
            raise RuntimeError(
                "fetch_records_meta requires Fetch v4 (record batches "
                "+ isolation levels); this broker tops out below it — "
                "use fetch()/fetch_records() for the v0 path")
        w = _Writer()
        w.i32(-1)            # replica_id
        w.i32(0)             # max_wait_ms
        w.i32(0)             # min_bytes
        w.i32(max_bytes)     # request-level max_bytes (v3+)
        w.i8(1 if isolation == "read_committed" else 0)
        w.i32(1)
        w.string(topic)
        w.i32(1)
        w.i32(partition)
        w.i64(offset)
        w.i32(max_bytes)
        r = self._call(API_FETCH, bytes(w.buf), version=4)
        r.i32()              # throttle_time_ms
        r.i32()              # topic count
        r.string()
        r.i32()              # partition count
        r.i32()              # partition id
        err = r.i16()
        hw = r.i64()         # high watermark
        lso = r.i64()        # last_stable_offset
        for _ in range(r.i32()):   # aborted_transactions
            r.i64(); r.i64()
        size = r.i32()
        raw = r._take(size)
        if err != ERR_NONE:
            raise RuntimeError(f"fetch failed: error {err}")
        return (decode_record_batches(
                    raw, with_headers=include_headers),
                hw, lso)

    def list_offsets(self, topic: str, partition: int, time: int) -> int:
        """EARLIEST (-2) → log start, LATEST (-1) → log end offset."""
        out = self.list_offsets_bulk({topic: [partition]}, time)
        return out[(topic, partition)]

    def list_offsets_bulk(self, topics: dict[str, list[int]], time: int
                          ) -> dict[tuple[str, int], int]:
        """All requested (topic, partition) positions in ONE request —
        the v0 wire format batches topics and partitions natively, so a
        1000-partition subscription costs one round trip per offset
        poll, not one per partition (the per-trigger driver cost that
        actually matters at scale)."""
        w = _Writer()
        w.i32(-1)     # replica_id
        w.i32(len(topics))
        for topic, parts in topics.items():
            w.string(topic)
            w.i32(len(parts))
            for p in parts:
                w.i32(p)
                w.i64(time)
                w.i32(1)  # max offsets
        r = self._call(API_LIST_OFFSETS, bytes(w.buf))
        out: dict[tuple[str, int], int] = {}
        for _ in range(r.i32()):
            name = r.string() or ""
            for _ in range(r.i32()):
                pid = r.i32()
                err = r.i16()
                offs = [r.i64() for _ in range(r.i32())]
                if err != ERR_NONE:
                    raise RuntimeError(
                        f"list_offsets {name}/{pid} failed: error {err}")
                out[(name, pid)] = offs[0] if offs else 0
        return out

    def offsets_for_times(self, targets: dict[tuple[str, int], int]
                          ) -> dict[tuple[str, int],
                                    Optional[tuple[int, int]]]:
        """ListOffsets v1: (topic, partition) → timestamp_ms targets;
        returns the (timestamp, offset) of the FIRST message at-or-
        after each target, or None when no such message exists — the
        ``startingOffsetsByTimestamp`` primitive. EARLIEST/LATEST
        sentinels also work (offset with timestamp -1)."""
        if self._max_version(API_LIST_OFFSETS) < 1:
            raise RuntimeError(
                "broker does not support ListOffsets v1 "
                "(timestamp lookup)")
        w = _Writer()
        w.i32(-1)
        by_topic: dict[str, list[tuple[int, int]]] = {}
        for (t, p), ts in targets.items():
            by_topic.setdefault(t, []).append((p, ts))
        w.i32(len(by_topic))
        for t, parts in by_topic.items():
            w.string(t)
            w.i32(len(parts))
            for p, ts in parts:
                w.i32(p)
                w.i64(ts)
        r = self._call(API_LIST_OFFSETS, bytes(w.buf), version=1)
        out: dict[tuple[str, int], Optional[tuple[int, int]]] = {}
        for _ in range(r.i32()):
            name = r.string() or ""
            for _ in range(r.i32()):
                pid = r.i32()
                err = r.i16()
                ts = r.i64()
                off = r.i64()
                if err != ERR_NONE:
                    raise RuntimeError(
                        f"offsets_for_times {name}/{pid}: error {err}")
                out[(name, pid)] = None if off < 0 else (ts, off)
        return out

    def offset_commit(self, group: str, topic: str, partition: int,
                      offset: int, metadata: str = "") -> None:
        """Commit a consumer-group position broker-side (the
        reference's manual-commit model: ``enable.auto.commit: false``
        + explicit commit after processing. Spark's own readers never
        call this — checkpoints own their offsets — but non-Spark
        poll-loop consumers do, and O19's group isolation lives
        here)."""
        w = _Writer()
        w.string(group)
        w.i32(1)
        w.string(topic)
        w.i32(1)
        w.i32(partition)
        w.i64(offset)
        w.string(metadata)
        r = self._call(API_OFFSET_COMMIT, bytes(w.buf))
        r.i32()       # topic count
        r.string()
        r.i32()       # partition count
        r.i32()       # partition id
        err = r.i16()
        if err != ERR_NONE:
            raise RuntimeError(f"offset_commit failed: error {err}")

    def offset_fetch(self, group: str, topic: str, partition: int) -> int:
        """Fetch the committed position; -1 when the group has none
        (the v0 unknown-offset convention — the caller falls back to
        its auto.offset.reset policy)."""
        w = _Writer()
        w.string(group)
        w.i32(1)
        w.string(topic)
        w.i32(1)
        w.i32(partition)
        r = self._call(API_OFFSET_FETCH, bytes(w.buf))
        r.i32()
        r.string()
        r.i32()
        r.i32()
        offset = r.i64()
        r.string()    # metadata
        err = r.i16()
        if err != ERR_NONE:
            raise RuntimeError(f"offset_fetch failed: error {err}")
        return offset

    # -- group membership (v0) --------------------------------------------
    @staticmethod
    def _group_err(err: int, what: str) -> None:
        if err == ERR_NONE:
            return
        if err == ERR_REBALANCE_IN_PROGRESS:
            raise GroupRebalanceError(f"{what}: rebalance in progress")
        if err in (ERR_UNKNOWN_MEMBER_ID, ERR_ILLEGAL_GENERATION):
            raise GroupMembershipError(f"{what}: error {err}")
        if err == ERR_INCONSISTENT_GROUP_PROTOCOL:
            raise RuntimeError(
                f"{what}: inconsistent group protocol — this member's "
                "protocol list shares no entry with the group's")
        raise RuntimeError(f"{what} failed: error {err}")

    def find_coordinator(self, group: str) -> tuple[str, int]:
        """GroupCoordinator v0: which broker coordinates ``group``
        (always this one for the mini broker — kept for protocol
        fidelity; real clients must ask before any group API)."""
        w = _Writer()
        w.string(group)
        r = self._call(API_FIND_COORDINATOR, bytes(w.buf))
        err = r.i16()
        r.i32()                     # node id
        host = r.string() or ""
        port = r.i32()
        self._group_err(err, "find_coordinator")
        return host, port

    def join_group(self, group: str, member_id: str, topics: list[str],
                   session_timeout_ms: int = 10000,
                   protocol: str = "range",
                   protocols: Optional[list[str]] = None,
                   group_instance_id: Optional[str] = None
                   ) -> tuple[str, int, str, dict[str, list[str]]]:
        """JoinGroup v0. Blocks while the broker gathers the
        generation's members. Returns (member_id, generation,
        leader_id, members) where ``members`` maps member_id → its
        subscribed topics — non-empty ONLY for the leader, which must
        compute the assignment and deliver it via :meth:`sync_group`;
        followers get ``{}`` and sync with no assignments.
        First-time callers pass ``member_id=""`` (the broker assigns
        one). ``protocols`` sends a multi-entry preference list (the
        broker negotiates the first leader-preferred entry every
        member supports, rejecting non-intersecting joiners).
        ``group_instance_id`` (KIP-345 static membership, JoinGroup
        v5) lets a restarting process reclaim its member id and
        assignment without triggering a rebalance, as long as it
        returns within the session timeout."""
        version = 0
        if group_instance_id is not None:
            if self._max_version(API_JOIN_GROUP) < 5:
                raise RuntimeError(
                    "broker does not support JoinGroup v5 "
                    "(group.instance.id needs KIP-345)")
            version = 5
        names = protocols if protocols else [protocol]
        w = _Writer()
        w.string(group)
        w.i32(session_timeout_ms)
        if version >= 1:
            w.i32(session_timeout_ms)   # rebalance_timeout_ms
        w.string(member_id)
        if version >= 5:
            w.string(group_instance_id)
        w.string("consumer")
        w.i32(len(names))
        for name in names:
            w.string(name)
            w.bytes_(encode_subscription(topics))
        r = self._call(API_JOIN_GROUP, bytes(w.buf), version=version)
        if version >= 2:
            r.i32()                     # throttle_time_ms
        err = r.i16()
        generation = r.i32()
        self.last_group_protocol = r.string()   # negotiated protocol
        leader = r.string() or ""
        me = r.string() or ""
        members = {}
        for _ in range(r.i32()):
            mid = r.string() or ""
            if version >= 5:
                r.string()              # group_instance_id
            meta = r.bytes_() or b""
            members[mid] = decode_subscription(meta)
        self._group_err(err, "join_group")
        return me, generation, leader, members

    def sync_group(self, group: str, generation: int, member_id: str,
                   assignments: Optional[dict[str,
                                              dict[str, list[int]]]] = None
                   ) -> dict[str, list[int]]:
        """SyncGroup v0: the leader passes ``assignments``
        (member_id → topic → partitions); followers pass None and
        block until the leader syncs. Returns THIS member's
        assignment."""
        w = _Writer()
        w.string(group)
        w.i32(generation)
        w.string(member_id)
        items = assignments or {}
        w.i32(len(items))
        for mid, parts in items.items():
            w.string(mid)
            w.bytes_(encode_assignment(parts))
        r = self._call(API_SYNC_GROUP, bytes(w.buf))
        err = r.i16()
        assignment = r.bytes_() or b""
        self._group_err(err, "sync_group")
        return decode_assignment(assignment)

    def heartbeat(self, group: str, generation: int,
                  member_id: str) -> None:
        """Heartbeat v0 — raises :class:`GroupRebalanceError` when the
        broker wants the member to rejoin."""
        w = _Writer()
        w.string(group)
        w.i32(generation)
        w.string(member_id)
        r = self._call(API_HEARTBEAT, bytes(w.buf))
        self._group_err(r.i16(), "heartbeat")

    def leave_group(self, group: str, member_id: str) -> None:
        """LeaveGroup v0 — clean departure triggers an immediate
        rebalance for the survivors (vs waiting out the session
        timeout)."""
        w = _Writer()
        w.string(group)
        w.string(member_id)
        r = self._call(API_LEAVE_GROUP, bytes(w.buf))
        self._group_err(r.i16(), "leave_group")

    def api_versions(self) -> dict[int, tuple[int, int]]:
        """api_key → (min, max) supported versions — the negotiation
        request real clients send first; everything this broker speaks
        is v0."""
        r = self._call(API_VERSIONS, b"")
        err = r.i16()
        if err != ERR_NONE:
            raise RuntimeError(f"api_versions failed: error {err}")
        out = {}
        for _ in range(r.i32()):
            key = r.i16()
            out[key] = (r.i16(), r.i16())
        return out


class IdempotentProducer:
    """KIP-98 idempotent produce (the non-transactional half): an
    InitProducerId-assigned (producer_id, epoch) plus per-partition
    sequence numbers let the broker discard duplicate retries, so a
    network-retried batch appends EXACTLY once per partition — the
    upgrade over the plain producer's at-least-once, without needing
    the downstream MERGE to absorb replays.

    ``send`` advances the sequence only after the broker accepts the
    batch; ``retry_last`` re-sends the previous batch verbatim (what a
    real client does on a timed-out request) and is test-pinned to be
    a broker-side no-op."""

    def __init__(self, client: "KafkaWireClient") -> None:
        self._c = client
        self.producer_id, self.epoch = client.init_producer_id()
        self._seq: dict[tuple[str, int], int] = {}
        self._last: dict[tuple[str, int], tuple[int, list]] = {}

    def send(self, topic: str, partition: int,
             messages: list[tuple[Optional[bytes], Optional[bytes],
                                  int]],
             codec: Optional[str] = None) -> int:
        seq = self._seq.get((topic, partition), 0)
        base = self._c.produce_records(
            topic, partition, messages, codec=codec,
            producer_id=self.producer_id, producer_epoch=self.epoch,
            base_sequence=seq)
        self._seq[(topic, partition)] = seq + len(messages)
        self._last[(topic, partition)] = (seq, messages)
        return base

    def retry_last(self, topic: str, partition: int,
                   codec: Optional[str] = None) -> int:
        """Re-send the last batch with its ORIGINAL sequence (the
        ambiguous-outcome retry); the broker deduplicates."""
        seq, messages = self._last[(topic, partition)]
        return self._c.produce_records(
            topic, partition, messages, codec=codec,
            producer_id=self.producer_id, producer_epoch=self.epoch,
            base_sequence=seq)


class TransactionalProducer:
    """KIP-98 transactions (the second half, on top of idempotence):
    batches produced between ``begin_transaction`` and
    ``commit_transaction`` become visible to read_committed consumers
    atomically — all of them when the commit marker lands, none of
    them after ``abort_transaction``. ``send_offsets_to_transaction``
    stages consumer-group positions inside the same transaction, which
    is the exactly-once consume-transform-produce loop: the output
    records and the input offsets commit or vanish together, so a
    crash between them can neither drop nor double-process input.

    Construction claims ``transactional_id`` via InitProducerId; any
    previous holder of the id is fenced (its epoch goes stale and the
    broker aborts whatever it left open). Sequence numbers continue
    across transactions per the spec — the idempotence dedupe window
    spans commits."""

    def __init__(self, client: "KafkaWireClient",
                 transactional_id: str) -> None:
        if transactional_id is None:
            raise ValueError("transactional_id is required — use "
                             "IdempotentProducer for the id-less mode")
        self._c = client
        self.transactional_id = transactional_id
        self.producer_id, self.epoch = \
            client.init_producer_id(transactional_id)
        self._seq: dict[tuple[str, int], int] = {}
        self._in_txn = False
        self._txn_parts: set[tuple[str, int]] = set()
        self._offsets_group: Optional[str] = None

    def begin_transaction(self) -> None:
        if self._in_txn:
            raise RuntimeError("transaction already in progress")
        self._in_txn = True
        self._txn_parts = set()
        self._offsets_group = None

    def send(self, topic: str, partition: int,
             messages: list[tuple[Optional[bytes], Optional[bytes],
                                  int]],
             codec: Optional[str] = None) -> int:
        """Produce inside the current transaction. First touch of a
        partition registers it with the coordinator
        (AddPartitionsToTxn), like a real client's lazy add."""
        if not self._in_txn:
            raise RuntimeError("send outside a transaction — call "
                               "begin_transaction first")
        tp = (topic, partition)
        if tp not in self._txn_parts:
            self._c.add_partitions_to_txn(
                self.transactional_id, self.producer_id, self.epoch,
                {topic: [partition]})
            self._txn_parts.add(tp)
        seq = self._seq.get(tp, 0)
        base = self._c.produce_records(
            topic, partition, messages, codec=codec,
            producer_id=self.producer_id, producer_epoch=self.epoch,
            base_sequence=seq, transactional_id=self.transactional_id)
        self._seq[tp] = seq + len(messages)
        return base

    def send_offsets_to_transaction(
            self, offsets: dict[tuple[str, int], int],
            group: str) -> None:
        """Stage consumer-group offsets in the transaction (the input
        positions of a consume-transform-produce loop)."""
        if not self._in_txn:
            raise RuntimeError("send_offsets_to_transaction outside a "
                               "transaction")
        self._c.add_offsets_to_txn(
            self.transactional_id, self.producer_id, self.epoch, group)
        self._c.txn_offset_commit(
            self.transactional_id, group, self.producer_id, self.epoch,
            offsets)
        self._offsets_group = group

    def commit_transaction(self) -> None:
        self._end(True)

    def abort_transaction(self) -> None:
        self._end(False)

    def _end(self, commit: bool) -> None:
        if not self._in_txn:
            raise RuntimeError("no transaction in progress")
        self._c.end_txn(self.transactional_id, self.producer_id,
                        self.epoch, commit)
        self._in_txn = False
        self._txn_parts = set()
        self._offsets_group = None


# ---------------------------------------------------------------------------
# broker
# ---------------------------------------------------------------------------

class MiniKafkaBroker:
    """In-memory single-node broker for the four v0 APIs.

    Topics auto-create on first produce (1 partition) or explicitly via
    :meth:`create_topic`. Message logs are per-(topic, partition) lists
    of (offset, key, value) with a per-partition next-offset counter —
    offsets are dense from 0 until :meth:`compact` runs, after which
    the log keeps only the LAST entry per key with its ORIGINAL offset
    (Kafka log compaction): consumers must tolerate offset gaps, and
    the tests pin that the reader does.

    Threading: ``ThreadingTCPServer`` (connection-per-thread) with one
    lock around the log dict — correct for the test/bench scale this
    serves; the point is wire fidelity, not broker throughput."""

    #: how long JoinGroup waits for the rest of the generation before
    #: evicting stragglers and completing the rebalance (the broker's
    #: group.initial.rebalance.delay / rebalance-timeout analogue)
    rebalance_timeout: float = 5.0

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 clock=None, fetch_codec: Optional[str] = None,
                 sasl_users: Optional[dict[str, str]] = None,
                 ssl_context=None,
                 state: Optional[dict] = None) -> None:
        #: (topic, partition) → list of (offset, timestamp_ms, key,
        #: value), offsets strictly increasing (gaps after compaction).
        #: v0 produces are stamped with ``clock`` (LogAppendTime);
        #: v3 produces carry producer CreateTime timestamps.
        self._logs: dict[tuple[str, int],
                         list[tuple[int, int, Optional[bytes],
                                    Optional[bytes]]]] = {}
        self._next: dict[tuple[str, int], int] = {}
        #: (group, topic, partition) → committed consumer offset
        self._group_offsets: dict[tuple[str, str, int], int] = {}
        #: KIP-98 idempotence: next producer id to hand out, and per
        #: (pid, topic, partition) the last accepted batch's
        #: (base_sequence, count, base_offset) for duplicate replies
        self._next_pid = 1000
        self._pid_state: dict[tuple[int, str, int],
                              tuple[int, int, int]] = {}
        #: KIP-98 transactions. transactional_id → stable producer id
        #: and current epoch (the fencing counter: InitProducerId for
        #: an already-known id bumps it, staling every older holder)
        self._txn_pids: dict[str, int] = {}
        self._txn_epoch: dict[str, int] = {}
        #: transactional_id → OPEN transaction: the partitions added
        #: so far, each partition's first produced offset (the LSO
        #: floor), the exact record offsets produced (what an abort
        #:  must hide), and offsets staged via TxnOffsetCommit
        self._txns: dict[str, dict] = {}
        #: (topic, partition) → offsets of records whose transaction
        #: ABORTED — read_committed fetches skip exactly these
        self._aborted_recs: dict[tuple[str, int], set[int]] = {}
        #: (topic, partition) → control markers as (offset, pid,
        #: committed). Markers occupy a log offset without a record —
        #: the same gap shape compaction leaves — and are durable
        #: state (snapshot/restore keeps them across a restart)
        self._markers: dict[tuple[str, int],
                            list[tuple[int, int, bool]]] = {}
        self._lock = threading.Lock()
        if state is not None:
            self._load_state(state)
        #: injectable ms clock — tests pin deterministic timestamps
        self._clock = clock or (lambda: int(_time.time() * 1000))
        #: compress v4 fetch responses ("gzip"/"snappy"/"lz4"/"zstd") — real brokers serve
        #: batches in the topic's codec; this exercises the client's
        #: compressed-decode path end-to-end
        self._fetch_codec = fetch_codec
        #: group_id → membership state; guarded by _gcond's lock
        self._groups: dict[str, dict] = {}
        self._gcond = threading.Condition()
        self._member_seq = 0
        #: SASL/PLAIN credentials (user → password); None = PLAINTEXT
        #: listener. TLS: pass a server-side SSLContext.
        self._sasl_users = sasl_users
        self._ssl_context = ssl_context
        broker = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self) -> None:
                sock = self.request
                try:
                    if broker._ssl_context is not None:
                        sock = broker._ssl_context.wrap_socket(
                            sock, server_side=True)
                    # per-connection SASL state, like a real listener
                    conn = {"authenticated": broker._sasl_users is None,
                            "mechanism": None}
                    while True:
                        raw = _recv_exact(sock, 4)
                        (size,) = struct.unpack(">i", raw)
                        req = _Reader(_recv_exact(sock, size))
                        resp = broker._dispatch(req, conn)
                        sock.sendall(
                            struct.pack(">i", len(resp)) + resp)
                except (ConnectionError, EOFError, OSError):
                    return
                except ValueError:
                    # protocol violation (incl. unauthenticated API
                    # use): close the connection, real-broker style
                    return
                finally:
                    if sock is not self.request:
                        try:
                            sock.close()
                        except OSError:
                            pass

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.host, self.port = self._server.server_address
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)

    # -- lifecycle --------------------------------------------------------
    def start(self) -> "MiniKafkaBroker":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    @property
    def bootstrap(self) -> str:
        return f"{self.host}:{self.port}"

    def create_topic(self, topic: str, partitions: int = 1) -> None:
        with self._lock:
            for p in range(partitions):
                self._logs.setdefault((topic, p), [])

    def log_end_offset(self, topic: str, partition: int) -> int:
        with self._lock:
            return self._next.get((topic, partition), 0)

    def compact(self, topic: str) -> int:
        """Kafka log compaction: keep only the LAST message per key in
        every partition of ``topic`` (null-key messages always
        survive), preserving original offsets — creating gaps. Returns
        the number of messages removed."""
        removed = 0
        with self._lock:
            for (t, p), log in self._logs.items():
                if t != topic:
                    continue
                last: dict[bytes, int] = {}
                for off, _ts, k, _v, _h in log:
                    if k is not None:
                        last[bytes(k)] = off
                kept = [e for e in log
                        if e[2] is None or last[bytes(e[2])] == e[0]]
                removed += len(log) - len(kept)
                self._logs[(t, p)] = kept
        return removed

    def txn_markers(self, topic: str, partition: int
                    ) -> list[tuple[int, int, bool]]:
        """Control markers on a partition as (offset, producer_id,
        committed) — inspection hook for tests; real consumers observe
        markers only as offset gaps."""
        with self._lock:
            return list(self._markers.get((topic, partition), []))

    def snapshot(self) -> dict:
        """The broker's durable state — what a real broker recovers
        from its partition logs plus the __transaction_state log on
        restart: records, offsets, committed group positions, producer
        id/epoch mappings, idempotence sequences, control markers and
        aborted-record sets, and any transaction still open. Feed the
        returned dict to ``MiniKafkaBroker(state=...)`` to restart
        with identical visible behavior (read_committed filtering
        included)."""
        with self._lock:
            return {
                "logs": {k: list(v) for k, v in self._logs.items()},
                "next": dict(self._next),
                "group_offsets": dict(self._group_offsets),
                "next_pid": self._next_pid,
                "pid_state": dict(self._pid_state),
                "txn_pids": dict(self._txn_pids),
                "txn_epoch": dict(self._txn_epoch),
                "txns": {tid: {"pid": t["pid"], "epoch": t["epoch"],
                               "parts": set(t["parts"]),
                               "first": dict(t["first"]),
                               "recs": {tp: list(o) for tp, o
                                        in t["recs"].items()},
                               "pending": dict(t["pending"]),
                               "groups": set(t["groups"])}
                         for tid, t in self._txns.items()},
                "aborted_recs": {k: set(v) for k, v
                                 in self._aborted_recs.items()},
                "markers": {k: list(v) for k, v
                            in self._markers.items()},
            }

    def _load_state(self, state: dict) -> None:
        self._logs = {k: list(v) for k, v in state["logs"].items()}
        self._next = dict(state["next"])
        self._group_offsets = dict(state["group_offsets"])
        self._next_pid = state["next_pid"]
        self._pid_state = dict(state["pid_state"])
        self._txn_pids = dict(state["txn_pids"])
        self._txn_epoch = dict(state["txn_epoch"])
        self._txns = {tid: {"pid": t["pid"], "epoch": t["epoch"],
                            "parts": set(t["parts"]),
                            "first": dict(t["first"]),
                            "recs": {tp: list(o) for tp, o
                                     in t["recs"].items()},
                            "pending": dict(t["pending"]),
                            "groups": set(t["groups"])}
                      for tid, t in state["txns"].items()}
        self._aborted_recs = {k: set(v) for k, v
                              in state["aborted_recs"].items()}
        self._markers = {k: list(v) for k, v
                         in state["markers"].items()}

    #: (api_key → (min, max)) — what ApiVersions advertises and what
    #: _dispatch accepts
    SUPPORTED: dict[int, tuple[int, int]] = {
        API_PRODUCE: (0, 3),         # v3 = magic-2 record batches
        API_FETCH: (0, 4),           # v4 = record batches + isolation
        API_LIST_OFFSETS: (0, 1),    # v1 = timestamp→offset lookup
        API_METADATA: (0, 0),
        API_OFFSET_COMMIT: (0, 0),
        API_OFFSET_FETCH: (0, 0),
        API_FIND_COORDINATOR: (0, 0),
        API_JOIN_GROUP: (0, 5),   # v5 adds group.instance.id (KIP-345)
        API_HEARTBEAT: (0, 0),
        API_LEAVE_GROUP: (0, 0),
        API_SYNC_GROUP: (0, 0),
        API_VERSIONS: (0, 0),
        API_INIT_PRODUCER_ID: (0, 0),   # KIP-98 idempotent produce
        API_ADD_PARTITIONS_TO_TXN: (0, 0),   # KIP-98 transactions
        API_ADD_OFFSETS_TO_TXN: (0, 0),
        API_END_TXN: (0, 0),
        API_TXN_OFFSET_COMMIT: (0, 0),
        API_SASL_HANDSHAKE: (1, 1),     # framed SASL/PLAIN flow
        API_SASL_AUTHENTICATE: (0, 0),
    }

    # -- dispatch ---------------------------------------------------------
    def _dispatch(self, req: _Reader,
                  conn: Optional[dict] = None) -> bytes:
        conn = conn if conn is not None else {"authenticated": True,
                                              "mechanism": None}
        api_key = req.i16()
        api_version = req.i16()
        corr = req.i32()
        client_id = req.string() or ""
        w = _Writer()
        w.i32(corr)
        lo, hi = self.SUPPORTED.get(api_key, (0, -1))
        if not lo <= api_version <= hi:
            raise ValueError(
                f"api {api_key} v{api_version} unsupported")
        if (not conn["authenticated"]
                and api_key not in (API_VERSIONS, API_SASL_HANDSHAKE,
                                    API_SASL_AUTHENTICATE)):
            # a SASL listener serves nothing else pre-auth; real
            # brokers drop the connection
            raise ValueError(
                f"api {api_key} before SASL authentication")
        if api_key == API_SASL_HANDSHAKE:
            if api_version != 1:
                # v0's follow-up tokens are raw (unframed) — only the
                # framed v1 flow is spoken here
                raise ValueError("SaslHandshake v0 unsupported (v1 "
                                 "frames the authenticate tokens)")
            mech = req.string() or ""
            if mech != "PLAIN":
                w.i16(ERR_UNSUPPORTED_SASL_MECHANISM)
            else:
                conn["mechanism"] = mech
                w.i16(ERR_NONE)
            w.i32(1)
            w.string("PLAIN")
            return bytes(w.buf)
        if api_key == API_SASL_AUTHENTICATE:
            self._handle_sasl_authenticate(req, w, conn)
            return bytes(w.buf)
        # intermediate versions this broker never emitted (e.g.
        # Produce v1/v2, Fetch v1-v3) are not implemented — the
        # paired client only negotiates v0 or the advertised max
        if api_key == API_METADATA:
            self._handle_metadata(req, w)
        elif api_key == API_PRODUCE:
            if api_version not in (0, 3):
                raise ValueError(f"produce v{api_version} unimplemented")
            self._handle_produce(req, w, api_version)
        elif api_key == API_FETCH:
            if api_version not in (0, 4):
                raise ValueError(f"fetch v{api_version} unimplemented")
            self._handle_fetch(req, w, api_version)
        elif api_key == API_LIST_OFFSETS:
            self._handle_list_offsets(req, w, api_version)
        elif api_key == API_OFFSET_COMMIT:
            self._handle_offset_commit(req, w)
        elif api_key == API_OFFSET_FETCH:
            self._handle_offset_fetch(req, w)
        elif api_key == API_FIND_COORDINATOR:
            self._handle_find_coordinator(req, w)
        elif api_key == API_JOIN_GROUP:
            if api_version not in (0, 5):
                raise ValueError(
                    f"join_group v{api_version} unimplemented")
            self._handle_join_group(req, w, client_id, api_version)
        elif api_key == API_SYNC_GROUP:
            self._handle_sync_group(req, w)
        elif api_key == API_HEARTBEAT:
            self._handle_heartbeat(req, w)
        elif api_key == API_LEAVE_GROUP:
            self._handle_leave_group(req, w)
        elif api_key == API_VERSIONS:
            self._handle_api_versions(w)
        elif api_key == API_INIT_PRODUCER_ID:
            self._handle_init_producer_id(req, w)
        elif api_key == API_ADD_PARTITIONS_TO_TXN:
            self._handle_add_partitions_to_txn(req, w)
        elif api_key == API_ADD_OFFSETS_TO_TXN:
            self._handle_add_offsets_to_txn(req, w)
        elif api_key == API_END_TXN:
            self._handle_end_txn(req, w)
        elif api_key == API_TXN_OFFSET_COMMIT:
            self._handle_txn_offset_commit(req, w)
        else:
            raise ValueError(f"api key {api_key} unsupported")
        return bytes(w.buf)

    def _handle_sasl_authenticate(self, req: _Reader, w: _Writer,
                                  conn: dict) -> None:
        token = req.bytes_() or b""
        if conn.get("mechanism") != "PLAIN":
            w.i16(ERR_ILLEGAL_SASL_STATE)
            w.string("SaslHandshake must precede SaslAuthenticate")
            w.bytes_(b"")
            return
        parts = token.split(b"\x00")
        users = self._sasl_users or {}
        if (len(parts) == 3
                and users.get(parts[1].decode("utf-8", "replace"))
                == parts[2].decode("utf-8", "replace")):
            conn["authenticated"] = True
            w.i16(ERR_NONE)
            w.string(None)
            w.bytes_(b"")
        else:
            w.i16(ERR_SASL_AUTHENTICATION_FAILED)
            w.string("invalid PLAIN credentials")
            w.bytes_(b"")

    def _handle_init_producer_id(self, req: _Reader, w: _Writer) -> None:
        txn_id = req.string()   # null = idempotence-only
        req.i32()               # transaction_timeout_ms
        with self._lock:
            if txn_id is None:
                pid = self._next_pid
                self._next_pid += 1
                epoch = 0
            else:
                # stable pid per transactional.id; every re-init bumps
                # the epoch — the fencing handshake. A transaction the
                # previous holder left open is aborted first, so the
                # new instance starts from a clean slate and
                # read_committed readers never see the zombie's writes.
                pid = self._txn_pids.get(txn_id)
                if pid is None:
                    pid = self._next_pid
                    self._next_pid += 1
                    self._txn_pids[txn_id] = pid
                    self._txn_epoch[txn_id] = 0
                else:
                    self._txn_epoch[txn_id] += 1
                epoch = self._txn_epoch[txn_id]
                stale = self._txns.pop(txn_id, None)
                if stale is not None:
                    self._finish_txn_locked(stale, committed=False)
        w.i32(0)       # throttle_time_ms
        w.i16(ERR_NONE)
        w.i64(pid)
        w.i16(epoch)

    # -- transaction coordination (KIP-98 part 2) ----------------------

    def _txn_check_locked(self, txn_id: Optional[str], pid: int,
                          epoch: int) -> int:
        """Shared validation: id known, pid mapped, epoch current."""
        if txn_id is None or txn_id not in self._txn_pids:
            return ERR_INVALID_PRODUCER_ID_MAPPING
        if self._txn_pids[txn_id] != pid:
            return ERR_INVALID_PRODUCER_ID_MAPPING
        if epoch != self._txn_epoch[txn_id]:
            # stale epoch = fenced zombie; a FUTURE epoch is equally
            # invalid (nobody was ever issued it)
            return ERR_INVALID_PRODUCER_EPOCH
        return ERR_NONE

    def _open_txn_locked(self, txn_id: str, pid: int,
                         epoch: int) -> dict:
        return self._txns.setdefault(txn_id, {
            "pid": pid, "epoch": epoch, "parts": set(),
            "first": {}, "recs": {}, "pending": {}, "groups": set()})

    def _finish_txn_locked(self, txn: dict, committed: bool) -> None:
        """Write a control marker to every added partition (one offset
        each, no record — committed consumption tolerates the gap),
        then either expose or hide the transaction's effects: staged
        group offsets apply on commit and vanish on abort; produced
        record offsets join the aborted set on abort so read_committed
        fetches skip them forever."""
        pid = txn["pid"]
        for tp in sorted(txn["parts"]):
            off = self._next.setdefault(tp, 0)
            self._next[tp] = off + 1
            self._logs.setdefault(tp, [])
            self._markers.setdefault(tp, []).append(
                (off, pid, committed))
            if not committed:
                self._aborted_recs.setdefault(tp, set()).update(
                    txn["recs"].get(tp, ()))
        if committed:
            for (group, topic, p), off in txn["pending"].items():
                self._group_offsets[(group, topic, p)] = off

    def _lso_locked(self, tp: tuple[str, int]) -> int:
        """Last stable offset: the first offset of the OLDEST open
        transaction touching this partition, else the high watermark —
        read_committed fetches stop here."""
        firsts = [t["first"][tp] for t in self._txns.values()
                  if tp in t["first"]]
        lso = min(firsts) if firsts else self._next.get(tp, 0)
        return lso

    def _handle_add_partitions_to_txn(self, req: _Reader,
                                      w: _Writer) -> None:
        txn_id = req.string()
        pid = req.i64()
        epoch = req.i16()
        wanted: list[tuple[str, list[int]]] = []
        for _ in range(req.i32()):
            topic = req.string() or ""
            wanted.append(
                (topic, [req.i32() for _ in range(req.i32())]))
        with self._lock:
            err = self._txn_check_locked(txn_id, pid, epoch)
            if err == ERR_NONE:
                txn = self._open_txn_locked(txn_id, pid, epoch)
                for topic, parts in wanted:
                    for p in parts:
                        txn["parts"].add((topic, p))
        w.i32(0)   # throttle_time_ms
        w.i32(len(wanted))
        for topic, parts in wanted:
            w.string(topic)
            w.i32(len(parts))
            for p in parts:
                w.i32(p)
                w.i16(err)

    def _handle_add_offsets_to_txn(self, req: _Reader,
                                   w: _Writer) -> None:
        txn_id = req.string()
        pid = req.i64()
        epoch = req.i16()
        group = req.string() or ""
        with self._lock:
            err = self._txn_check_locked(txn_id, pid, epoch)
            if err == ERR_NONE:
                txn = self._open_txn_locked(txn_id, pid, epoch)
                txn["groups"].add(group)
        w.i32(0)   # throttle_time_ms
        w.i16(err)

    def _handle_txn_offset_commit(self, req: _Reader,
                                  w: _Writer) -> None:
        txn_id = req.string()
        group = req.string() or ""
        pid = req.i64()
        epoch = req.i16()
        wanted: list[tuple[str, list[tuple[int, int]]]] = []
        for _ in range(req.i32()):
            topic = req.string() or ""
            plist = []
            for _ in range(req.i32()):
                p = req.i32()
                off = req.i64()
                req.string()   # metadata
                plist.append((p, off))
            wanted.append((topic, plist))
        with self._lock:
            err = self._txn_check_locked(txn_id, pid, epoch)
            if err == ERR_NONE:
                txn = self._txns.get(txn_id)
                if txn is None or group not in txn["groups"]:
                    # protocol order: AddOffsetsToTxn first
                    err = ERR_INVALID_TXN_STATE
                else:
                    for topic, plist in wanted:
                        for p, off in plist:
                            txn["pending"][(group, topic, p)] = off
        w.i32(0)   # throttle_time_ms
        w.i32(len(wanted))
        for topic, plist in wanted:
            w.string(topic)
            w.i32(len(plist))
            for p, _off in plist:
                w.i32(p)
                w.i16(err)

    def _handle_end_txn(self, req: _Reader, w: _Writer) -> None:
        txn_id = req.string()
        pid = req.i64()
        epoch = req.i16()
        committed = req.i8() != 0
        with self._lock:
            err = self._txn_check_locked(txn_id, pid, epoch)
            if err == ERR_NONE:
                txn = self._txns.pop(txn_id, None)
                if txn is None:
                    err = ERR_INVALID_TXN_STATE   # nothing ongoing
                else:
                    self._finish_txn_locked(txn, committed)
        w.i32(0)   # throttle_time_ms
        w.i16(err)

    def _handle_metadata(self, req: _Reader, w: _Writer) -> None:
        names = [req.string() for _ in range(req.i32())]
        with self._lock:
            known = sorted({t for t, _ in self._logs})
            if names:
                known = [t for t in known if t in names]
            topo = {t: sorted(p for tt, p in self._logs if tt == t)
                    for t in known}
        w.i32(1)                  # brokers
        w.i32(0)                  # node id
        w.string(self.host)
        w.i32(self.port)
        w.i32(len(topo))          # topics
        for t, parts in topo.items():
            w.i16(ERR_NONE)
            w.string(t)
            w.i32(len(parts))
            for p in parts:
                w.i16(ERR_NONE)
                w.i32(p)
                w.i32(0)          # leader
                w.i32(1); w.i32(0)  # replicas [0]
                w.i32(1); w.i32(0)  # isr [0]

    def _handle_produce(self, req: _Reader, w: _Writer,
                        version: int) -> None:
        txn_id = None
        if version >= 3:
            txn_id = req.string()   # transactional_id
        req.i16()  # acks
        req.i32()  # timeout
        now = self._clock()
        results = []
        for _ in range(req.i32()):
            topic = req.string() or ""
            for _ in range(req.i32()):
                partition = req.i32()
                size = req.i32()
                mset = req._take(size)
                pid = -1
                epoch = -1
                attrs = 0
                if version >= 3:
                    # magic-2 record batch with producer timestamps
                    pid, epoch, base_seq, count, attrs = \
                        peek_batch_producer(mset)
                    msgs = [(ts, k, v, h) for _, ts, k, v, h
                            in decode_record_batches(
                                mset, with_headers=True)]
                else:
                    # magic-0: no wire timestamp → LogAppendTime;
                    # the format carries no headers
                    msgs = [(now, k, v, ()) for _, k, v
                            in decode_message_set(mset)]
                with self._lock:
                    txn = None
                    if attrs & ATTR_TRANSACTIONAL:
                        # transactional batch: the producer must hold
                        # the current epoch for its transactional.id
                        # (fencing) and must have added this partition
                        # to the ongoing transaction
                        terr = self._txn_check_locked(txn_id, pid,
                                                      epoch)
                        if terr == ERR_NONE:
                            txn = self._txns.get(txn_id)
                            if (txn is None or (topic, partition)
                                    not in txn["parts"]):
                                terr = ERR_INVALID_TXN_STATE
                        if terr != ERR_NONE:
                            results.append((topic, partition,
                                            terr, -1))
                            continue
                    if pid >= 0:
                        # KIP-98 idempotence: dedupe retries, fence
                        # sequence gaps
                        key = (pid, topic, partition)
                        prev = self._pid_state.get(key)
                        if prev is not None and len(prev) == 4 \
                                and prev[3] != epoch:
                            # KIP-98: an epoch bump RESETS the
                            # sequence space — the fenced zombie's
                            # last-batch state must not shadow the new
                            # instance's seq-0 batch as a "retry"
                            prev = None
                        expected = prev[0] + prev[1] if prev else 0
                        if prev and base_seq == prev[0]:
                            # verbatim retry of the last batch —
                            # answer with the ORIGINAL base offset,
                            # append nothing
                            results.append((topic, partition,
                                            ERR_NONE, prev[2]))
                            continue
                        if base_seq != expected:
                            err = (ERR_DUPLICATE_SEQUENCE
                                   if base_seq < expected
                                   else ERR_OUT_OF_ORDER_SEQUENCE)
                            results.append((topic, partition, err, -1))
                            continue
                    log = self._logs.setdefault((topic, partition), [])
                    base = self._next.setdefault((topic, partition), 0)
                    for i, (ts, k, v, h) in enumerate(msgs):
                        log.append((base + i, ts, k, v, h))
                    self._next[(topic, partition)] = base + len(msgs)
                    if pid >= 0:
                        self._pid_state[(pid, topic, partition)] = \
                            (base_seq, count, base, epoch)
                    if txn is not None:
                        tp = (topic, partition)
                        # first produced offset floors the LSO; the
                        # exact offsets are what an abort must hide
                        txn["first"].setdefault(tp, base)
                        txn["recs"].setdefault(tp, []).extend(
                            range(base, base + len(msgs)))
                results.append((topic, partition, ERR_NONE, base))
        w.i32(len(results))
        for topic, partition, err, base in results:
            w.string(topic)
            w.i32(1)
            w.i32(partition)
            w.i16(err)
            w.i64(base)
            if version >= 3:
                w.i64(-1)   # log_append_time (-1: CreateTime batch)
        if version >= 3:
            w.i32(0)        # throttle_time_ms

    def _handle_fetch(self, req: _Reader, w: _Writer,
                      version: int) -> None:
        req.i32()  # replica
        req.i32()  # max_wait
        req.i32()  # min_bytes
        isolation = 0
        if version >= 4:
            req.i32()  # request-level max_bytes
            isolation = req.i8()   # 0=read_uncommitted 1=read_committed
        out = []
        for _ in range(req.i32()):
            topic = req.string() or ""
            for _ in range(req.i32()):
                partition = req.i32()
                offset = req.i64()
                max_bytes = req.i32()
                with self._lock:
                    log = self._logs.get((topic, partition))
                    if log is None:
                        out.append((topic, partition,
                                    ERR_UNKNOWN_TOPIC_OR_PARTITION,
                                    0, 0, b""))
                        continue
                    hw = self._next.get((topic, partition), 0)
                    lso = self._lso_locked((topic, partition))
                    # read_committed: nothing past the LSO (an open
                    # transaction's records are not yet decided), and
                    # nothing an aborted transaction wrote. Filtering
                    # happens here rather than client-side because
                    # this broker re-encodes fetched entries into one
                    # plain batch (per-record producer ids are gone) —
                    # wire shape is unchanged, aborted_transactions
                    # simply stays empty.
                    limit = lso if isolation == 1 else hw
                    aborted = (self._aborted_recs.get(
                        (topic, partition), ()) if isolation == 1
                        else ())
                    entries = []
                    size = 0
                    # first entry with offset >= requested (offsets are
                    # sorted; gaps possible after compaction/markers)
                    i = bisect.bisect_left(log, offset,
                                           key=lambda e: e[0])
                    for off, ts, k, v, h in log[i:]:
                        if off >= limit:
                            break
                        if off in aborted:
                            continue
                        size += (26 + len(k or b"") + len(v or b"")
                                 if version >= 4
                                 else 12 + len(encode_message(k, v)))
                        if entries and size > max_bytes:
                            break
                        entries.append((off, ts, k, v, h))
                if version >= 4:
                    mset = encode_record_batch(entries,
                                               codec=self._fetch_codec)
                else:
                    mset = encode_message_set(
                        (off, k, v) for off, _ts, k, v, _h in entries)
                out.append((topic, partition, ERR_NONE, hw, lso, mset))
        if version >= 4:
            w.i32(0)   # throttle_time_ms
        w.i32(len(out))
        for topic, partition, err, hw, lso, mset in out:
            w.string(topic)
            w.i32(1)
            w.i32(partition)
            w.i16(err)
            w.i64(hw)
            if version >= 4:
                w.i64(lso)  # last_stable_offset
                w.i32(0)    # aborted_transactions (broker-filtered)
            w.i32(len(mset))
            w.raw(mset)

    def _handle_list_offsets(self, req: _Reader, w: _Writer,
                             version: int) -> None:
        req.i32()  # replica
        out = []
        for _ in range(req.i32()):
            topic = req.string() or ""
            for _ in range(req.i32()):
                partition = req.i32()
                time = req.i64()
                if version == 0:
                    req.i32()  # max offsets (v0 only)
                with self._lock:
                    log = self._logs.get((topic, partition))
                    end = self._next.get((topic, partition), 0)
                if log is None:
                    out.append((topic, partition,
                                ERR_UNKNOWN_TOPIC_OR_PARTITION, -1, []))
                elif time == EARLIEST:
                    first = log[0][0] if log else end
                    out.append((topic, partition, ERR_NONE, -1, [first]))
                elif time == LATEST:
                    out.append((topic, partition, ERR_NONE, -1, [end]))
                elif version >= 1:
                    # v1: first message with timestamp >= target
                    hit = next(((ts, off) for off, ts, *_ in log
                                if ts >= time), None)
                    if hit is None:
                        out.append((topic, partition, ERR_NONE, -1, []))
                    else:
                        out.append((topic, partition, ERR_NONE,
                                    hit[0], [hit[1]]))
                else:  # v0 has no timestamp index → log end
                    out.append((topic, partition, ERR_NONE, -1, [end]))
        w.i32(len(out))
        for topic, partition, err, ts, offs in out:
            w.string(topic)
            w.i32(1)
            w.i32(partition)
            w.i16(err)
            if version >= 1:
                w.i64(ts)
                w.i64(offs[0] if offs else -1)
            else:
                w.i32(len(offs))
                for o in offs:
                    w.i64(o)

    def _handle_offset_commit(self, req: _Reader, w: _Writer) -> None:
        group = req.string() or ""
        out = []
        for _ in range(req.i32()):
            topic = req.string() or ""
            for _ in range(req.i32()):
                partition = req.i32()
                offset = req.i64()
                req.string()  # metadata
                with self._lock:
                    self._group_offsets[(group, topic, partition)] = offset
                out.append((topic, partition))
        w.i32(len(out))
        for topic, partition in out:
            w.string(topic)
            w.i32(1)
            w.i32(partition)
            w.i16(ERR_NONE)

    def _handle_offset_fetch(self, req: _Reader, w: _Writer) -> None:
        group = req.string() or ""
        out = []
        for _ in range(req.i32()):
            topic = req.string() or ""
            for _ in range(req.i32()):
                partition = req.i32()
                with self._lock:
                    off = self._group_offsets.get(
                        (group, topic, partition), -1)
                out.append((topic, partition, off))
        w.i32(len(out))
        for topic, partition, off in out:
            w.string(topic)
            w.i32(1)
            w.i32(partition)
            w.i64(off)
            w.string("")   # metadata
            w.i16(ERR_NONE)

    def _handle_api_versions(self, w: _Writer) -> None:
        w.i16(ERR_NONE)
        w.i32(len(self.SUPPORTED))
        for key in sorted(self.SUPPORTED):
            lo, hi = self.SUPPORTED[key]
            w.i16(key)
            w.i16(lo)
            w.i16(hi)

    # -- group coordination (v0 membership protocol) ----------------------
    #
    # State machine per group (the public coordinator protocol,
    # kafka.apache.org/protocol #group-membership):
    #   Empty → Joining → AwaitSync → Stable → (member change) → Joining
    # JoinGroup BLOCKS the handler thread (thread-per-connection makes
    # that safe) until every known member has rejoined or the
    # rebalance timeout evicts stragglers; the completing thread bumps
    # the generation and elects the first-sorted member leader. The
    # LEADER computes assignments client-side and distributes them via
    # SyncGroup; followers block in SyncGroup until it does. Heartbeat
    # renews the session and is the channel rebalances are signalled
    # on (REBALANCE_IN_PROGRESS → member rejoins).

    def _group(self, group: str) -> dict:
        return self._groups.setdefault(group, {
            "state": "Empty", "generation": 0, "leader": "",
            "protocol": "", "members": {},  # id → member dict
            "pending": set(), "deadline": 0.0, "assignments": {},
        })

    def _expire_members(self, g: dict) -> None:
        """Evict members whose session lapsed (no heartbeat); a death
        noticed while Stable triggers a rebalance the survivors see."""
        now = _time.monotonic()
        dead = [mid for mid, m in g["members"].items()
                if m["expires"] < now]
        for mid in dead:
            del g["members"][mid]
            g["pending"].discard(mid)
        if dead and g["members"] and g["state"] in ("Stable", "AwaitSync"):
            self._begin_rebalance(g)
        elif not g["members"]:
            g["state"] = "Empty"

    def _begin_rebalance(self, g: dict) -> None:
        g["state"] = "Joining"
        g["pending"] = set(g["members"])
        g["deadline"] = _time.monotonic() + self.rebalance_timeout
        g["assignments"] = {}
        self._gcond.notify_all()

    def _handle_join_group(self, req: _Reader, w: _Writer,
                           client_id: str, version: int = 0) -> None:
        group = req.string() or ""
        session_ms = req.i32()
        if version >= 1:
            req.i32()  # rebalance_timeout_ms (broker-wide here)
        member_id = req.string() or ""
        instance_id = req.string() if version >= 5 else None
        req.string()  # protocol_type
        protos = []
        for _ in range(req.i32()):
            protos.append((req.string() or "", req.bytes_() or b""))
        if not protos:
            protos = [("range", b"")]

        def respond(err, generation=-1, protocol="", leader="",
                    me="", members=()):
            if version >= 2:
                w.i32(0)           # throttle_time_ms
            w.i16(err)
            w.i32(generation)
            w.string(protocol)
            w.string(leader)
            w.string(me)
            w.i32(len(members))
            for mid, m in members:
                w.string(mid)
                if version >= 5:
                    w.string(m.get("instance_id"))
                w.bytes_(m["protocols"].get(protocol, b""))

        with self._gcond:
            g = self._group(group)
            self._expire_members(g)
            if instance_id:
                known = next((mid for mid, m in g["members"].items()
                              if m.get("instance_id") == instance_id),
                             None)
                if known is not None and g["state"] == "Stable":
                    # KIP-345 static rejoin: a restarting member with
                    # the same group.instance.id reclaims its member
                    # id, generation, and assignment WITHOUT a
                    # rebalance — survivors never notice
                    m = g["members"][known]
                    m["protocols"] = dict(protos)
                    m["proto_order"] = [n for n, _x in protos]
                    m["session_ms"] = session_ms
                    m["expires"] = (_time.monotonic()
                                    + session_ms / 1000.0)
                    members = ([(mid, mm) for mid, mm in
                                sorted(g["members"].items())]
                               if known == g["leader"] else [])
                    respond(ERR_NONE, g["generation"], g["protocol"],
                            g["leader"], known, members)
                    return
                if known is not None:
                    # mid-rebalance restart: rejoin under the SAME
                    # member id so the group doesn't grow a ghost
                    member_id = known
            # protocol negotiation (real-broker rule): a joiner whose
            # protocol list doesn't intersect every current member's
            # is rejected with INCONSISTENT_GROUP_PROTOCOL instead of
            # the old arbitrary last-completer-wins pick
            names = [n for n, _m in protos]
            if any(not set(names) & set(m["proto_order"])
                   for mid, m in g["members"].items()
                   if mid != member_id):
                respond(ERR_INCONSISTENT_GROUP_PROTOCOL,
                        me=member_id)
                return
            if not member_id:
                self._member_seq += 1
                member_id = f"{client_id or 'member'}-{self._member_seq}"
            g["members"][member_id] = {
                "protocols": dict(protos), "proto_order": names,
                "session_ms": session_ms, "instance_id": instance_id,
                "expires": _time.monotonic() + session_ms / 1000.0,
            }
            if g["state"] != "Joining":
                self._begin_rebalance(g)
            g["pending"].discard(member_id)
            self._gcond.notify_all()
            while (g["state"] == "Joining" and g["pending"]
                   and _time.monotonic() < g["deadline"]):
                self._gcond.wait(0.05)
            if g["state"] == "Joining":
                # this thread completes the join phase: stragglers out
                for mid in g["pending"]:
                    g["members"].pop(mid, None)
                g["pending"] = set()
                g["generation"] += 1
                g["leader"] = min(g["members"])
                # the protocol is NEGOTIATED: first entry in the
                # leader's preference order every member supports
                # (join-time validation guarantees one exists)
                leader_m = g["members"][g["leader"]]
                g["protocol"] = next(
                    n for n in leader_m["proto_order"]
                    if all(n in m["proto_order"]
                           for m in g["members"].values()))
                g["state"] = "AwaitSync"
                self._gcond.notify_all()
            generation = g["generation"]
            leader = g["leader"]
            protocol = g["protocol"]
            members = [(mid, m)
                       for mid, m in sorted(g["members"].items())] \
                if member_id == leader else []
            err = ERR_NONE if member_id in g["members"] \
                else ERR_UNKNOWN_MEMBER_ID
            respond(err, generation, protocol, leader, member_id,
                    members)

    def _handle_sync_group(self, req: _Reader, w: _Writer) -> None:
        group = req.string() or ""
        generation = req.i32()
        member_id = req.string() or ""
        assignments = {}
        for _ in range(req.i32()):
            mid = req.string() or ""
            assignments[mid] = req.bytes_() or b""
        err = ERR_NONE
        assignment = b""
        with self._gcond:
            g = self._group(group)
            self._expire_members(g)
            m = g["members"].get(member_id)
            if m is None:
                err = ERR_UNKNOWN_MEMBER_ID
            elif generation != g["generation"]:
                err = ERR_ILLEGAL_GENERATION
            elif g["state"] == "Joining":
                err = ERR_REBALANCE_IN_PROGRESS
            else:
                m["expires"] = _time.monotonic() + m["session_ms"] / 1000.0
                if member_id == g["leader"] and assignments:
                    g["assignments"] = assignments
                    g["state"] = "Stable"
                    self._gcond.notify_all()
                deadline = _time.monotonic() + self.rebalance_timeout
                while (g["state"] == "AwaitSync"
                       and g["generation"] == generation
                       and _time.monotonic() < deadline):
                    self._gcond.wait(0.05)
                if g["state"] == "Stable" and g["generation"] == generation:
                    assignment = g["assignments"].get(member_id, b"")
                else:
                    err = ERR_REBALANCE_IN_PROGRESS
        w.i16(err)
        w.bytes_(assignment)

    def _handle_heartbeat(self, req: _Reader, w: _Writer) -> None:
        group = req.string() or ""
        generation = req.i32()
        member_id = req.string() or ""
        with self._gcond:
            g = self._group(group)
            self._expire_members(g)
            m = g["members"].get(member_id)
            if m is None:
                err = ERR_UNKNOWN_MEMBER_ID
            elif generation != g["generation"]:
                err = ERR_ILLEGAL_GENERATION
            elif g["state"] != "Stable":
                err = ERR_REBALANCE_IN_PROGRESS
            else:
                m["expires"] = _time.monotonic() + m["session_ms"] / 1000.0
                err = ERR_NONE
        w.i16(err)

    def _handle_leave_group(self, req: _Reader, w: _Writer) -> None:
        group = req.string() or ""
        member_id = req.string() or ""
        with self._gcond:
            g = self._group(group)
            if member_id in g["members"]:
                del g["members"][member_id]
                g["pending"].discard(member_id)
                if g["members"]:
                    self._begin_rebalance(g)
                else:
                    g["state"] = "Empty"
                err = ERR_NONE
            else:
                err = ERR_UNKNOWN_MEMBER_ID
        w.i16(err)

    def _handle_find_coordinator(self, req: _Reader, w: _Writer) -> None:
        req.string()  # group — single-node: always this broker
        w.i16(ERR_NONE)
        w.i32(0)      # node id
        w.string(self.host)
        w.i32(self.port)
