"""Change-feed follower: incremental, crash-safe consumption of a
:class:`~aether_firebase_consumer_spark.sinks.upsert.ParquetUpsertTable`
change feed — the OUTBOUND half of the CDC story (round 10).

The inbound half (``streaming/cdc.py``) lets tombstones flow INTO the
ingest jobs; this module lets changes flow OUT of a table and into
downstream consumers — most importantly takedown propagation: a
delete applied to a corpus table (by key or by
:meth:`~.upsert.ParquetUpsertTable.delete_where` retention predicate)
must reach every derived index that serves those ids, without a side
channel and without replaying the whole table.

Design — versions ARE the offsets. The table's commit protocol makes
version numbers a total order of atomic commits, so the follower's
cursor is a single integer in a checkpoint file:

- :meth:`poll` computes the change feed ``(cursor, current]`` with
  the table's existing Spark-side diff (distributed; nothing here
  collects data to the driver) and does NOT advance the cursor;
- :meth:`commit` advances it (atomic tmp+rename), AFTER the consumer
  has durably applied the batch — at-least-once delivery, which
  composes exactly with the downstream operations this engine offers
  (MERGE and delete are both idempotent, so replays converge);
- :meth:`process` is the poll→handle→commit loop step.

Falling behind further than the table's ``retain_versions`` raises
(via ``change_feed``) instead of silently skipping history — the same
contract a Kafka consumer has with topic retention.

The reference pushes every change 1-by-1 to its sink as it polls
(``/root/reference/firebase/app/artifacts.py:302-327``) and has no
way to re-derive what changed after the fact; the versioned table
plus this follower is the lake-native replacement.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable


class ChangeFeedFollower:
    """Cursor over a table's change feed.

    ``from_version=None`` (default) starts AFTER the version current
    at construction — only future changes are delivered, the
    tail-the-log mode a newly attached consumer wants. Pass ``0`` to
    replay all retained history first.
    """

    def __init__(self, table: ParquetUpsertTable, checkpoint_path: str,
                 from_version: int | None = None):
        self.table = table
        self.checkpoint_path = checkpoint_path
        if self._read_cursor() is None:
            start = (table.current_version() if from_version is None
                     else from_version - 1)
            self._write_cursor(start)

    # -- cursor ---------------------------------------------------------
    def _read_cursor(self) -> int | None:
        try:
            with open(self.checkpoint_path) as fh:
                return int(fh.read().strip())
        except (OSError, ValueError):
            return None

    def _write_cursor(self, v: int) -> None:
        tmp = f"{self.checkpoint_path}.tmp"
        with open(tmp, "w") as fh:
            fh.write(str(v))
        os.replace(tmp, self.checkpoint_path)

    # -- consumption ----------------------------------------------------
    def poll(self, values: bool = False,
             images: bool = False) -> tuple[DataFrame, int] | None:
        """``(changes, up_to_version)`` for everything committed since
        the cursor, or None when caught up. Does NOT advance the
        cursor — re-polling before :meth:`commit` re-delivers the same
        batch (at-least-once). ``changes`` has the table's change-feed
        schema: key columns + ``change_type`` (insert/update/delete)
        + ``version``; with ``values=True`` it additionally carries
        the post-image value columns for inserts/updates
        (:meth:`~.upsert.ParquetUpsertTable.change_feed_with_values`)
        — what a derived-table maintainer needs to replicate without
        re-reading the source; with ``images=True`` it carries pre-
        AND post-images (:meth:`~.upsert.ParquetUpsertTable.
        change_feed_with_images`) — the retraction feed incremental
        aggregate maintenance consumes
        (``streaming/incremental_agg.py``)."""
        cursor = self._read_cursor()
        if cursor is None:
            # the constructor wrote a cursor; None here means the
            # checkpoint was deleted or corrupted SINCE — resuming at
            # a guessed position would silently skip or replay
            # history, so refuse loudly (recreate the follower, or
            # bootstrap() after a retention gap)
            raise RuntimeError(
                f"change-feed checkpoint {self.checkpoint_path} is "
                "missing or corrupt — re-create the follower with an "
                "explicit from_version, or bootstrap() to resync from "
                "the current snapshot")
        current = self.table.current_version()
        if current <= cursor:
            return None
        if images:
            feed = self.table.change_feed_with_images(cursor + 1)
        elif values:
            feed = self.table.change_feed_with_values(cursor + 1)
        else:
            feed = self.table.change_feed(cursor + 1)
        return feed, current

    def commit(self, version: int) -> None:
        """Durably advance the cursor past ``version`` — call only
        after the polled batch is applied downstream."""
        self._write_cursor(version)

    def bootstrap(self, handler) -> int:
        """Recovery past the retention window: when the cursor
        predates the oldest retained version, :meth:`poll` rightly
        raises (the in-between history is gone) — the only sound
        resync is a SNAPSHOT re-sync. ``handler(inserts_df, version)``
        receives every CURRENT row's keys as ``insert`` change rows
        (same schema as a poll batch: key cols + change_type +
        version); the consumer must treat the batch as authoritative —
        rebuild, or delete-all-then-apply — because deletions that
        happened inside the gap are represented only by ABSENCE from
        the snapshot. The cursor then jumps to the snapshot version,
        so the next poll resumes incremental. Returns the version
        bootstrapped to. Crash-safe like :meth:`process`: the cursor
        moves only after the handler returns."""
        current = self.table.current_version()
        if current < 0:
            raise ValueError("cannot bootstrap from an empty table")
        snapshot = (self.table.read_version(current)
                    .select(*self.table.key_cols)
                    .withColumn("change_type", F.lit("insert"))
                    .withColumn("version", F.lit(current)))
        handler(snapshot, current)
        self.commit(current)
        return current

    def process(self, handler, values: bool = False) -> int | None:
        """One loop step: poll; if there are changes, run
        ``handler(changes_df, up_to_version)`` and commit. Returns the
        version processed up to, or None when caught up. A handler
        crash leaves the cursor untouched, so the batch re-delivers."""
        got = self.poll(values=values)
        if got is None:
            return None
        changes, up_to = got
        handler(changes, up_to)
        self.commit(up_to)
        return up_to


def propagate_deletes(follower: ChangeFeedFollower, job) -> int:
    """Takedown propagation: apply the delete rows of one change-feed
    batch to a downstream ingest job (`AnnIndexJob`,
    `SemanticIngestJob`, `EmbeddingIngestJob`, `DedupIngestJob`) via
    its partition-pruned ``delete(ids)``, then commit the cursor.
    Returns the number of ids deleted downstream (0 when caught up or
    when the batch held no deletes). Idempotent end to end: replaying
    the batch after a crash re-deletes already-absent ids, a no-op.

    This is the e2e arc the takedown story needs: retention
    `delete_where` (or a tombstone) lands on the CORPUS table →
    change feed records explicit deletes → every derived index
    follows and stops serving those ids — no side channel, no full
    rebuild."""
    state = {"n": 0}

    def handler(changes: DataFrame, _up_to: int) -> None:
        dead = (changes.filter(F.col("change_type") == "delete")
                .select(job.id_col).distinct())
        state["n"] = job.delete(dead)

    return 0 if follower.process(handler) is None else state["n"]


def mirror_changes(follower: ChangeFeedFollower,
                   target) -> int | None:
    """Derived-table maintenance from the feed ALONE (round 11): apply
    one polled batch of value-carrying changes to ``target`` (another
    :class:`~.upsert.ParquetUpsertTable` with the same key columns) —
    MERGE the post-images, delete the tombstoned keys — and commit the
    cursor. The source table must carry value recordings
    (``record_change_values=True``) for this to stay O(changed rows);
    keys-only feeds fall back to version-sized image derivation inside
    ``changes_with_values``.

    Per-key collapse first: one poll can span several versions, and a
    key updated in v5 then deleted in v6 must end ABSENT — the same
    latest-per-key-by-order rule the CDC tombstone mixin applies to
    Kafka offsets (``streaming/cdc.py``), with the version as the
    order. Deletes apply before merges (end-of-state semantics), and
    both downstream ops are idempotent, so an at-least-once replay of
    the batch converges — exactly-once EFFECT on the mirror.

    Returns the version mirrored up to, or None when caught up. This
    is log-shipped replication in the lake: the reference has nothing
    like it (its sink is write-only, per-doc pushes with no history —
    ``/root/reference/firebase/app/artifacts.py:302-327``)."""
    from aether_firebase_consumer_spark.sinks.upsert import (
        latest_per_key,
    )

    keys = follower.table.key_cols

    def handler(changes: DataFrame, _up_to: int) -> None:
        final = latest_per_key(changes, keys, "version")
        dead = (final.filter(F.col("change_type") == "delete")
                .select(*keys))
        live = (final.filter(F.col("change_type") != "delete")
                .drop("change_type", "version"))
        if not dead.isEmpty():
            target.delete_keys(dead)
        target.merge(live)

    return follower.process(handler, values=True)
