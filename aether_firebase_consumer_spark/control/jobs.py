"""Job lifecycle (reference O18) + log ring buffer + introspection
(O15/O16).

The reference job is a long-lived poll loop with status transitions
(RECONFIGURE + backoff on connectivity errors, ``firebase/app/
artifacts.py:263-285``), pause/resume/status via the SDK
(``README.md:158-177``), a last-100-entries log ring
(``artifacts.py:225,434-443``), and per-tenant consumer groups
(``artifacts.py:226-232``).

Spark-first: a job IS a named StreamingQuery. pause/resume = stop/start
(checkpoint preserves offsets, so resume continues exactly where it
paused — stronger than the reference's in-memory pause). Status maps
from ``StreamingQuery.status``; logs come from a bounded deque fed by
job events. Parallelism: one query per job; executor-side parallelism
comes from source partitions (the Spark analogue of consumer-group
rebalancing, O19) — checkpoint dir is per tenant+job exactly like the
reference's group id ``{tenant}.firebaseconsumer.{job_id}``.
"""

from __future__ import annotations

import time
from collections import deque
from dataclasses import dataclass, field
from enum import Enum
from typing import Callable

from pyspark.sql.streaming import StreamingQuery


class JobStatus(str, Enum):
    STOPPED = "stopped"
    NORMAL = "normal"
    PAUSED = "paused"
    RECONFIGURE = "reconfigure"
    DEAD = "dead"


@dataclass
class LogRing:
    """Last-N log entries (``callback_logger('JOB', log_stack, 100)``,
    ``firebase/app/artifacts.py:225``)."""

    limit: int = 100
    _entries: deque = field(default_factory=deque)

    def __post_init__(self) -> None:
        # deque itself enforces the bound — no manual trim loop to
        # drift out of sync with the limit
        self._entries = deque(self._entries, maxlen=self.limit)

    def log(self, level: str, message: str) -> None:
        self._entries.append((time.time(), level, message))

    def get_logs(self) -> list[tuple[float, str, str]]:
        """(``get_logs``, ``firebase/app/artifacts.py:434-443``)."""
        return list(self._entries)


class SparkJob:
    """A named streaming job: builds (or rebuilds) a StreamingQuery via
    ``start_fn`` and tracks lifecycle + logs."""

    def __init__(self, tenant: str, job_id: str,
                 start_fn: Callable[[str], StreamingQuery],
                 checkpoint_root: str):
        self.tenant = tenant
        self.job_id = job_id
        self._start_fn = start_fn
        # per-tenant+job checkpoint = the consumer-group analogue (O19);
        # quote() each part: 'a.b'+'c' and 'a'+'b.c' must NOT collide,
        # and ids containing '/' must not nest surprise directories
        from urllib.parse import quote
        self.checkpoint = (f"{checkpoint_root}/{quote(tenant, safe='')}"
                           f"__{quote(job_id, safe='')}")
        self.logs = LogRing(100)
        self.query: StreamingQuery | None = None
        self._paused = False

    # -- lifecycle (O18) ------------------------------------------------
    def start(self) -> None:
        self.query = self._start_fn(self.checkpoint)
        self._paused = False
        self.logs.log("INFO", f"job {self.job_id} started")

    def pause(self) -> None:
        if self.query is not None:
            self.query.stop()
            self._paused = True
            self.logs.log("INFO", f"job {self.job_id} paused")

    def resume(self) -> None:
        """Restart from the checkpoint — offsets resume exactly."""
        if self._paused:
            self.start()
            self.logs.log("INFO", f"job {self.job_id} resumed")

    def stop(self) -> None:
        if self.query is not None:
            self.query.stop()
            self.query = None
        self._paused = False
        self.logs.log("INFO", f"job {self.job_id} stopped")

    def reconfigure(self, start_fn: Callable[[str], StreamingQuery]) -> None:
        """Reconcile: the subscription set changed (the reference's
        poll-loop reconcile, ``firebase/app/artifacts.py:287-300``) —
        stop the running query, swap in the new pipeline builder,
        restart on the SAME checkpoint. Source offsets live in the
        checkpoint, so the restarted query continues exactly after the
        last committed batch: nothing reprocessed, nothing missed."""
        if self.query is not None:
            self.query.stop()
        self._start_fn = start_fn
        self.logs.log("INFO",
                      f"job {self.job_id} reconfigure: definition changed")
        if self._paused:
            # an operator's explicit pause outranks a config change:
            # stage the new builder but stay stopped until resume()
            self.logs.log("INFO",
                          f"job {self.job_id} paused: restart deferred "
                          "to resume()")
            return
        self.start()

    def get_status(self) -> JobStatus:
        if self._paused:
            return JobStatus.PAUSED
        if self.query is None:
            return JobStatus.STOPPED
        try:
            if self.query.exception() is not None:
                return JobStatus.DEAD
            return JobStatus.NORMAL
        except Exception:
            return JobStatus.DEAD

    def get_logs(self) -> list[tuple[float, str, str]]:
        return self.logs.get_logs()

    # -- introspection (O15/O16) -----------------------------------------
    def test_connection(self, ping: Callable[[], bool]) -> bool:
        """Connection test wrapper (``firebase/app/artifacts.py:112-124``):
        failures are logged and re-raised as a control-plane error."""
        try:
            return bool(ping())
        except Exception as err:
            self.logs.log("ERROR", f"connection test failed: {err}")
            raise ConnectionError(str(err)) from err


class JobManager:
    """All jobs for all tenants; list_topics-style introspection over a
    provided topic lister (Kafka AdminClient in production; a callable
    here so tests can inject one — the broker is out of scope for the
    v1 image)."""

    def __init__(self, checkpoint_root: str):
        self.checkpoint_root = checkpoint_root
        self.jobs: dict[tuple[str, str], SparkJob] = {}

    def add_job(self, tenant: str, job_id: str,
                start_fn: Callable[[str], StreamingQuery]) -> SparkJob:
        if (tenant, job_id) in self.jobs:
            # silent overwrite would orphan the old job's running
            # query (unreachable from the manager, still consuming)
            # and contend for the shared checkpoint dir
            raise ValueError(
                f"job {tenant}/{job_id} already registered; stop and "
                "remove it first, or use reconfigure()")
        job = SparkJob(tenant, job_id, start_fn, self.checkpoint_root)
        self.jobs[(tenant, job_id)] = job
        return job

    def get(self, tenant: str, job_id: str) -> SparkJob | None:
        return self.jobs.get((tenant, job_id))

    def list_jobs(self, tenant: str) -> list[str]:
        return sorted(j for (t, j) in self.jobs if t == tenant)

    def resume_all(self, registry, start_fn_factory,
                   start: bool = True) -> list[tuple[str, str]]:
        """Resume-on-boot: rebuild every job persisted in ``registry``
        (the reference restarts its Redis-persisted jobs when the SDK
        boots, ``firebase/app/consumer.py:9-18``; job defs survive in
        Redis, ``firebase/tests/__init__.py:169-175``).

        ``start_fn_factory(tenant, job_def)`` returns the job's
        ``start_fn(checkpoint) -> StreamingQuery``. Because the
        checkpoint dir is derived from (tenant, job_id) — stable across
        process restarts — each resumed query continues from its
        recorded offsets: nothing is reprocessed, nothing is skipped.
        Returns the (tenant, job_id) pairs resumed."""
        resumed: list[tuple[str, str]] = []
        for tenant in registry.tenants():
            for jid in registry.list(tenant, "job"):
                job_def = registry.get(tenant, "job", jid)
                job = self.add_job(tenant, jid,
                                   start_fn_factory(tenant, job_def))
                if start:
                    job.start()
                resumed.append((tenant, jid))
        return resumed

    @staticmethod
    def list_topics(all_topics: list[str], tenant: str) -> list[str]:
        """Tenant-scoped topic listing (``firebase/app/artifacts.py:
        409-424``) with an *anchored prefix* strip — fixing the
        reference's ``split(f'{tenant}.')`` mid-name bug
        (``artifacts.py:421``)."""
        prefix = tenant + "."
        return sorted(t[len(prefix):] for t in all_topics
                      if t.startswith(prefix))

    @staticmethod
    def list_topics_from_broker(bootstrap: str, tenant: str) -> list[str]:
        """E3 against a LIVE broker: one Metadata round trip over the
        wire client, then the same tenant-scoped anchored strip. With
        the spark-sql-kafka jar the JVM AdminClient would serve this;
        the wire client keeps the endpoint real in jar-free images."""
        from aether_firebase_consumer_spark.sources.kafka_wire import (
            KafkaWireClient,
        )

        host, _, port = bootstrap.rpartition(":")
        with KafkaWireClient(host, int(port)) as c:
            topics = list(c.metadata())
        return JobManager.list_topics(topics, tenant)

    @staticmethod
    def consumer_lag(bootstrap: str, group: str,
                     tenant: str) -> dict[str, int]:
        """Per-topic-partition consumer lag (log end − committed) for a
        group over the tenant's topics — the falling-behind signal the
        reference surfaces as a processed-message counter
        (``artifacts.py:305,322,327``), computed from broker state
        instead of a hand tally. A group with no committed position
        reports lag from offset 0 (everything pending)."""
        from aether_firebase_consumer_spark.sources.kafka_wire import (
            LATEST,
            KafkaWireClient,
        )

        host, _, port = bootstrap.rpartition(":")
        prefix = tenant + "."
        out: dict[str, int] = {}
        with KafkaWireClient(host, int(port)) as c:
            meta = {t: ps for t, ps in c.metadata().items()
                    if t.startswith(prefix)}
            if not meta:
                return out
            ends = c.list_offsets_bulk(meta, LATEST)
            for (topic, p), end in sorted(ends.items()):
                committed = c.offset_fetch(group, topic, p)
                out[f"{topic},{p}"] = end - max(committed, 0)
        return out
