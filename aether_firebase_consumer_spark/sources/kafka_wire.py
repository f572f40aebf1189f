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

Wire format notes (v0 everywhere — the simplest stable dialect):
  request  = int32 size ++ int16 api_key ++ int16 api_version ++
             int32 correlation_id ++ STRING client_id ++ body
  response = int32 size ++ int32 correlation_id ++ body
  STRING   = int16 len (-1 null) ++ utf8 bytes
  BYTES    = int32 len (-1 null) ++ bytes
  ARRAY    = int32 count ++ items
  message  = int32 crc32(magic..end) ++ int8 magic=0 ++ int8 attrs=0
             ++ BYTES key ++ BYTES value
  message set = repeat(int64 offset ++ int32 size ++ message)
"""

from __future__ import annotations

import bisect
import socket
import socketserver
import struct
import threading
import zlib
from typing import Iterable, Optional

API_PRODUCE = 0
API_FETCH = 1
API_LIST_OFFSETS = 2
API_METADATA = 3
API_OFFSET_COMMIT = 8
API_OFFSET_FETCH = 9
API_VERSIONS = 18

EARLIEST = -2
LATEST = -1

ERR_NONE = 0
ERR_UNKNOWN_TOPIC_OR_PARTITION = 3
ERR_OFFSET_OUT_OF_RANGE = 1


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
                 client_id: str = "afcs", timeout: float = 30.0) -> None:
        self.host, self.port = host, port
        self.client_id = client_id
        self._corr = 0
        self._sock = socket.create_connection((host, port), timeout=timeout)

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
    def _call(self, api_key: int, body: bytes) -> _Reader:
        self._corr += 1
        head = _Writer()
        head.i16(api_key)
        head.i16(0)  # api_version 0 everywhere
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
        """Append (key, value) messages; returns the base offset."""
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

    def __init__(self, host: str = "127.0.0.1", port: int = 0) -> None:
        #: (topic, partition) → list of (offset, key, value), offsets
        #: strictly increasing (gaps after compaction)
        self._logs: dict[tuple[str, int],
                         list[tuple[int, Optional[bytes],
                                    Optional[bytes]]]] = {}
        self._next: dict[tuple[str, int], int] = {}
        #: (group, topic, partition) → committed consumer offset
        self._group_offsets: dict[tuple[str, str, int], int] = {}
        self._lock = threading.Lock()
        broker = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self) -> None:
                try:
                    while True:
                        raw = _recv_exact(self.request, 4)
                        (size,) = struct.unpack(">i", raw)
                        req = _Reader(_recv_exact(self.request, size))
                        resp = broker._dispatch(req)
                        self.request.sendall(
                            struct.pack(">i", len(resp)) + resp)
                except (ConnectionError, EOFError, OSError):
                    return

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
                for off, k, _ in log:
                    if k is not None:
                        last[bytes(k)] = off
                kept = [(off, k, v) for off, k, v in log
                        if k is None or last[bytes(k)] == off]
                removed += len(log) - len(kept)
                self._logs[(t, p)] = kept
        return removed

    # -- dispatch ---------------------------------------------------------
    def _dispatch(self, req: _Reader) -> bytes:
        api_key = req.i16()
        api_version = req.i16()
        corr = req.i32()
        req.string()  # client_id
        w = _Writer()
        w.i32(corr)
        if api_version != 0:
            raise ValueError(f"api version {api_version} unsupported")
        if api_key == API_METADATA:
            self._handle_metadata(req, w)
        elif api_key == API_PRODUCE:
            self._handle_produce(req, w)
        elif api_key == API_FETCH:
            self._handle_fetch(req, w)
        elif api_key == API_LIST_OFFSETS:
            self._handle_list_offsets(req, w)
        elif api_key == API_OFFSET_COMMIT:
            self._handle_offset_commit(req, w)
        elif api_key == API_OFFSET_FETCH:
            self._handle_offset_fetch(req, w)
        elif api_key == API_VERSIONS:
            self._handle_api_versions(w)
        else:
            raise ValueError(f"api key {api_key} unsupported")
        return bytes(w.buf)

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

    def _handle_produce(self, req: _Reader, w: _Writer) -> None:
        req.i16()  # acks
        req.i32()  # timeout
        results = []
        for _ in range(req.i32()):
            topic = req.string() or ""
            for _ in range(req.i32()):
                partition = req.i32()
                size = req.i32()
                mset = req._take(size)
                msgs = decode_message_set(mset)
                with self._lock:
                    log = self._logs.setdefault((topic, partition), [])
                    base = self._next.setdefault((topic, partition), 0)
                    for i, (_, k, v) in enumerate(msgs):
                        log.append((base + i, k, v))
                    self._next[(topic, partition)] = base + len(msgs)
                results.append((topic, partition, ERR_NONE, base))
        w.i32(len(results))
        for topic, partition, err, base in results:
            w.string(topic)
            w.i32(1)
            w.i32(partition)
            w.i16(err)
            w.i64(base)

    def _handle_fetch(self, req: _Reader, w: _Writer) -> None:
        req.i32()  # replica
        req.i32()  # max_wait
        req.i32()  # min_bytes
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
                                    ERR_UNKNOWN_TOPIC_OR_PARTITION, 0, b""))
                        continue
                    hw = self._next.get((topic, partition), 0)
                    entries = []
                    size = 0
                    # first entry with offset >= requested (offsets are
                    # sorted; gaps possible after compaction)
                    i = bisect.bisect_left(log, offset,
                                           key=lambda e: e[0])
                    for off, k, v in log[i:]:
                        msg = encode_message(k, v)
                        size += 12 + len(msg)
                        if entries and size > max_bytes:
                            break
                        entries.append((off, k, v))
                mset = encode_message_set(entries)
                out.append((topic, partition, ERR_NONE, hw, mset))
        w.i32(len(out))
        for topic, partition, err, hw, mset in out:
            w.string(topic)
            w.i32(1)
            w.i32(partition)
            w.i16(err)
            w.i64(hw)
            w.i32(len(mset))
            w.raw(mset)

    def _handle_list_offsets(self, req: _Reader, w: _Writer) -> None:
        req.i32()  # replica
        out = []
        for _ in range(req.i32()):
            topic = req.string() or ""
            for _ in range(req.i32()):
                partition = req.i32()
                time = req.i64()
                req.i32()  # max offsets
                with self._lock:
                    log = self._logs.get((topic, partition))
                if log is None:
                    out.append((topic, partition,
                                ERR_UNKNOWN_TOPIC_OR_PARTITION, []))
                elif time == EARLIEST:
                    first = log[0][0] if log else \
                        self._next.get((topic, partition), 0)
                    out.append((topic, partition, ERR_NONE, [first]))
                else:  # LATEST or a timestamp → log end (no index in v0)
                    out.append((topic, partition, ERR_NONE,
                                [self._next.get((topic, partition), 0)]))
        w.i32(len(out))
        for topic, partition, err, offs in out:
            w.string(topic)
            w.i32(1)
            w.i32(partition)
            w.i16(err)
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
        supported = [API_PRODUCE, API_FETCH, API_LIST_OFFSETS,
                     API_METADATA, API_OFFSET_COMMIT, API_OFFSET_FETCH,
                     API_VERSIONS]
        w.i16(ERR_NONE)
        w.i32(len(supported))
        for key in supported:
            w.i16(key)
            w.i16(0)   # min version
            w.i16(0)   # max version
