"""Pluggable external document-store connector for ``foreachBatch``.

The reference writes each message to a hierarchical document store at
``{target_path}/{id}`` via an accumulating batch — ``batch.set(ref,
doc)`` per doc, ``batch.commit()`` every ``MAX_SUBMIT = 50``
(``firebase/app/artifacts.py:302-327``; refs built at
``firebase/app/helpers.py:98-103``), and it refuses to fetch messages
while the sink is unreachable (``artifacts.py:258-278``: connection
test → ``RECONFIGURE`` + delay, "don't fetch messages if we can't post
them").

This module re-expresses that contract Spark-first:

* :class:`DocumentStoreConnector` — the minimal store SPI (atomic-ish
  ``write_batch`` of (path, doc) pairs + ``test_connection``). A real
  Firestore/RTDB/DynamoDB client implements exactly these two methods.
* :func:`commit_with_retry` — exponential backoff around one batch
  commit; transient errors (:class:`TransientStoreError`) retry,
  anything else propagates.
* :func:`foreach_batch_document_writer` — the ``foreachBatch`` hook:
  each PARTITION builds its own connector (connectors hold sockets, so
  they are created executor-side via a picklable factory, never
  serialized), accumulates ``max_per_commit`` docs per commit, and
  retries each commit with backoff. At-least-once replay from a
  restarted micro-batch converges because writes are set-by-path —
  the same effectively-once argument the reference gets from
  deterministic document ids.

Scale posture: the writer is embarrassingly parallel (one connector and
one in-flight batch per partition, no driver round-trip, no collect);
throughput scales with partitions × store write QPS, and the commit
size bounds executor memory.
"""

from __future__ import annotations

import abc
import json
import os
import time
from typing import Any, Callable, Iterable, Mapping

from pyspark.sql import DataFrame


class TransientStoreError(Exception):
    """A retryable store failure (timeout, 429/503, leader election)."""


class DocumentStoreConnector(abc.ABC):
    """SPI for a hierarchical document store addressed by path."""

    @abc.abstractmethod
    def write_batch(self, docs: list[tuple[str, Mapping[str, Any]]]) -> None:
        """Upsert every (path, doc) pair; raise TransientStoreError for
        retryable failures. Must be idempotent by path (set, not append)."""

    def test_connection(self) -> None:
        """Raise when the store is unreachable — called once per
        partition BEFORE any work, mirroring the reference's don't-
        fetch-if-you-can't-post gate (``artifacts.py:258-262``)."""

    def close(self) -> None:
        """Release sockets/sessions (best-effort)."""


class FileSystemDocumentStore(DocumentStoreConnector):
    """Self-contained hierarchical store: ``{path}`` → ``{root}/{path}.json``
    (atomic tmp+rename per doc). The test stand-in for Firestore/RTDB —
    works across local-mode Python worker processes; a real connector
    swaps in with no change to the writer."""

    def __init__(self, root: str):
        self.root = root

    def write_batch(self, docs: list[tuple[str, Mapping[str, Any]]]) -> None:
        for path, doc in docs:
            full = os.path.join(self.root, path.strip("/") + ".json")
            os.makedirs(os.path.dirname(full), exist_ok=True)
            tmp = full + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(doc, fh, sort_keys=True)
            os.replace(tmp, full)

    def test_connection(self) -> None:
        if not os.path.isdir(self.root):
            raise TransientStoreError(f"store root {self.root} unavailable")

    def read(self, path: str) -> dict | None:
        full = os.path.join(self.root, path.strip("/") + ".json")
        try:
            with open(full) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return None


class HttpDocumentStore(DocumentStoreConnector):
    """Concrete NETWORK connector: a REST document store over stdlib
    HTTP — the shape a real Firestore/RTDB/Elasticsearch client takes
    (the reference's store is Firestore via its SDK,
    ``firebase/app/helpers.py:93-114``; no such SDK ships here, so
    this speaks the generic protocol every hosted document store
    fronts: batched POST upserts + a health endpoint).

    Wire contract:

    * ``POST {base_url}/batch`` with JSON ``[{"path": p, "doc": d},
      ...]`` — atomic-enough batched set-by-path upsert; 2xx = commit.
    * ``GET {base_url}/health`` — the connection test.

    Retryability mapping: HTTP 408/429/5xx and socket-level failures
    (refused, reset, timeout) raise :class:`TransientStoreError` —
    ``commit_with_retry`` backs off and retries, and an unreachable
    store at partition start trips the don't-fetch-if-you-can't-post
    gate. Any other HTTP error (400, 403, 404...) propagates: bad
    requests don't become infinite retries.

    Executor-side lifecycle: one instance per partition via the
    factory (urllib keeps no persistent socket, so the connector is
    trivially picklable-safe — but the factory pattern is kept so a
    session-pooling client drops in unchanged)."""

    RETRYABLE = frozenset({408, 429, 500, 502, 503, 504})

    def __init__(self, base_url: str, timeout: float = 10.0) -> None:
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    def _post(self, path: str, body: bytes) -> None:
        import socket
        import urllib.error
        import urllib.request
        req = urllib.request.Request(
            self.base_url + path, data=body, method="POST",
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=self.timeout):
                pass
        except urllib.error.HTTPError as e:
            if e.code in self.RETRYABLE:
                raise TransientStoreError(
                    f"store returned {e.code} for {path}") from e
            raise
        except (urllib.error.URLError, socket.timeout,
                ConnectionError, OSError) as e:
            raise TransientStoreError(
                f"store unreachable at {self.base_url}{path}: {e}") from e

    def write_batch(self, docs: list[tuple[str, Mapping[str, Any]]]) -> None:
        payload = json.dumps(
            [{"path": p, "doc": dict(d)} for p, d in docs],
            sort_keys=True).encode()
        self._post("/batch", payload)

    def test_connection(self) -> None:
        import socket
        import urllib.error
        import urllib.request
        try:
            with urllib.request.urlopen(self.base_url + "/health",
                                        timeout=self.timeout):
                pass
        except (urllib.error.URLError, socket.timeout,
                ConnectionError, OSError) as e:
            raise TransientStoreError(
                f"health check failed for {self.base_url}: {e}") from e


def commit_with_retry(store: DocumentStoreConnector,
                      batch: list[tuple[str, Mapping[str, Any]]],
                      max_retries: int = 5,
                      base_backoff: float = 0.1,
                      sleep: Callable[[float], None] = time.sleep) -> int:
    """Commit one batch with exponential backoff on transient errors
    (0.1s, 0.2s, 0.4s, ... by default). Returns the attempt count that
    succeeded (0 = first try). Non-transient errors propagate
    immediately; exhausting retries re-raises the last transient error
    — Spark then retries the task, which is safe because writes are
    idempotent by path."""
    attempt = 0
    while True:
        try:
            store.write_batch(batch)
            return attempt
        except TransientStoreError:
            if attempt >= max_retries:
                raise
            sleep(base_backoff * (2 ** attempt))
            attempt += 1


def write_rows_through_store(rows: Iterable,
                             factory: Callable[[], DocumentStoreConnector],
                             path_col: str, id_col: str,
                             max_per_commit: int = 50,
                             max_retries: int = 5,
                             base_backoff: float = 0.1) -> None:
    """Drain one partition's rows into a fresh connector: doc path is
    ``{row[path_col]}/{row[id_col]}`` (``helpers.py:98-103``), commits
    every ``max_per_commit`` docs plus a final flush — the reference's
    MAX_SUBMIT loop (``artifacts.py:304,323-327``), per partition."""
    store = factory()
    store.test_connection()
    try:
        buf: list[tuple[str, Mapping[str, Any]]] = []
        for row in rows:
            doc = row.asDict(recursive=True)
            path = f"{doc[path_col]}/{doc[id_col]}"
            buf.append((path, doc))
            if len(buf) >= max_per_commit:
                commit_with_retry(store, buf, max_retries, base_backoff)
                buf = []
        if buf:
            commit_with_retry(store, buf, max_retries, base_backoff)
    finally:
        store.close()


def foreach_batch_document_writer(
        factory: Callable[[], DocumentStoreConnector],
        path_col: str = "target_path", id_col: str = "id",
        max_per_commit: int = 50, max_retries: int = 5,
        base_backoff: float = 0.1) -> Callable[[DataFrame, int], None]:
    """Build the ``writeStream.foreachBatch`` hook that ships every
    micro-batch through the connector, partition-parallel."""

    def write_micro_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.foreachPartition(
            lambda rows: write_rows_through_store(
                rows, factory, path_col, id_col,
                max_per_commit, max_retries, base_backoff))

    return write_micro_batch
