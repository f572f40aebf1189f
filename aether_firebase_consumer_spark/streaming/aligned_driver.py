"""Streaming-driven SNAPSHOT-ALIGNED join-view maintenance (round
13): bind :meth:`CdfJoinView.refresh_aligned` into the
``foreachBatch`` / ``StreamingQuery`` path so a RUNNING job under the
``SparkJob`` lifecycle (the reference's job model — a long-lived
supervised loop with pause/resume,
/root/reference/firebase/app/artifacts.py:263-285) maintains
consistent ``(fact_version, dim_version)`` snapshots, not just the
poll loop.

Why not two per-side streams: ``fold_fact_batch``/``fold_dim_batch``
are inherently one-sided — each fold joins the OTHER side's current
state, which is exactly the eventually-consistent mode. A cross-
source snapshot needs ONE serialized decision point that captures
(fv, dv) together. So the streaming binding inverts the roles:

- the STREAM is a change-TICK source — the union of both sides'
  ``table_changes`` feeds, projected to a common minimal schema. Its
  only job is to wake the driver exactly when either source commits
  a version (no polling cadence to tune, no busy loop);
- the BATCH CALLBACK ignores the tick rows and runs one
  :meth:`~CdfJoinView.refresh_aligned` — which re-polls both feeds
  through the view's own ``ChangeFeedFollower`` checkpoints, pins
  (fv, dv) = both sources' current versions, folds both sides at
  that pair, and commits the followers at exactly (fv, dv).

Correctness under the weaker tick contract: the streaming checkpoint
only guarantees every committed source version eventually produces a
tick AT OR AFTER it. A tick batch may cover versions the view
already folded (replay after crash/restart — the fence filters
``version > applied``, idempotent) or FEWER versions than
``refresh_aligned`` ends up applying (a merge landing between tick
and capture — the next tick's refresh finds its feed already drained
and no-ops). Every state the view table publishes still equals
``fact@fv ⟕ dim@dv`` at the committed cursor pair, because each
refresh is the same serialized aligned fold the poll loop runs —
``foreachBatch`` callbacks of one query never overlap.

Pause/resume (``SparkJob.pause``/``resume``) stops and restarts the
query on the same checkpoint: fold progress lives in the view's
follower cursors and the view table's ``commit_meta`` fence, so a
resume re-delivers unseen ticks and the first refresh catches the
view up — nothing reprocessed into the table, nothing missed.

:func:`view_chain_start_fn` generalizes the same tick-then-refresh
inversion to a whole DAG of views (source → top-k → enrich join →
aggregate, any mix): one job, roots tick it, hops refresh in
topological order, each fenced by its own cursor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from aether_firebase_consumer_spark.streaming.join_view import CdfJoinView


def _tick_stream(spark: SparkSession, table, side: str) -> DataFrame:
    """A minimal change-tick stream over one source table: version +
    side tag only (keys projected away — the callback never reads
    tick contents, it re-polls the feeds itself)."""
    return (spark.readStream.format("table_changes")
            .option("path", table.path)
            .option("keyCols", ",".join(table.key_cols))
            .option("startingVersion", 0)
            .load()
            .select(F.col("version"), F.lit(side).alias("side")))


def aligned_refresh_start_fn(spark: SparkSession, view: CdfJoinView):
    """A ``start_fn(checkpoint) -> StreamingQuery`` factory for
    :class:`~aether_firebase_consumer_spark.control.jobs.SparkJob`:
    the returned callable starts the aligned-maintenance query on the
    job's checkpoint dir, so the view rides the full O18 lifecycle
    (start/pause/resume/reconfigure/status/logs) like any ingest job.

    Requires the view in poll-loop mode (both ``fact_checkpoint`` and
    ``dim_checkpoint`` set): the STREAM checkpoint only schedules
    ticks; fold progress rides the view's own followers + fence.
    ``register_table_changes(spark)`` must have been called once per
    session (same requirement as any table_changes stream)."""
    if view.fact_follower is None or view.dim_follower is None:
        raise ValueError(
            "streaming aligned maintenance needs the view in "
            "poll-loop mode (both fact_checkpoint and dim_checkpoint "
            "set) — the stream provides ticks, the followers carry "
            "fold progress")

    ticks = _tick_stream(spark, view.fact, "fact").unionByName(
        _tick_stream(spark, view.dim, "dim"))

    def _on_tick(_batch: DataFrame, _epoch: int | None = None) -> None:
        view.refresh_aligned()

    def start_fn(checkpoint: str) -> StreamingQuery:
        return (ticks.writeStream
                .foreachBatch(_on_tick)
                .option("checkpointLocation", checkpoint)
                .start())

    return start_fn


def view_chain_start_fn(spark: SparkSession, tick_tables: list,
                        views: list):
    """A ``start_fn(checkpoint) -> StreamingQuery`` factory that
    maintains a whole CHAIN (DAG) of incremental views under one
    ``SparkJob``: every change committed to any of ``tick_tables``
    (the chain's ROOT inputs — external ingest tables, not the
    intermediate view tables) wakes the job, which refreshes
    ``views`` IN ORDER. List views in topological order (upstream
    before downstream): each hop's refresh folds its source's new
    changes and commits its own table, so the hop after it sees those
    changes in the same wakeup — one tick drains the whole chain.

    ``views`` items are either a view object with a ``refresh()``
    method (``CdfAggregateView``, ``CdfTopKView``, ``CdfJoinView`` in
    poll-loop mode — every view needs its checkpoint/follower paths,
    since fold progress rides the followers exactly as in
    :func:`aligned_refresh_start_fn`) or a ``(view, "aligned")`` pair
    to run a ``CdfJoinView`` snapshot-aligned.

    Crash/pause semantics are per-hop and inherited from the views:
    each hop is fenced by its own cursor, so a crash mid-chain
    replays only the hops that had not committed; a paused job
    freezes every view at a committed state; resume re-delivers
    unseen ticks and the first wakeup catches the whole chain up."""
    if not tick_tables:
        raise ValueError("view_chain_start_fn needs at least one "
                         "root table to tick on")
    refreshers = []
    for item in views:
        if isinstance(item, tuple):
            view, mode = item
            if mode != "aligned":
                raise ValueError(f"unknown view mode {mode!r} — "
                                 "use a bare view or (view, 'aligned')")
            if view.fact_follower is None or view.dim_follower is None:
                raise ValueError(
                    "an aligned chain member needs both checkpoint "
                    "paths (poll-loop mode)")
            refreshers.append(view.refresh_aligned)
        else:
            # fail at CONFIGURATION time, not as a dead StreamingQuery
            # on the first tick: a bare view must be in poll-loop mode
            # (its refresh() would raise RuntimeError mid-stream)
            if getattr(item, "follower", "absent") is None or \
                    getattr(item, "fact_follower", "absent") is None or \
                    getattr(item, "dim_follower", "absent") is None:
                raise ValueError(
                    f"chain member {type(item).__name__} was built "
                    "without its checkpoint path(s) (streaming mode) "
                    "— chain members need poll-loop mode, like the "
                    "aligned driver")
            refreshers.append(item.refresh)

    ticks = None
    for i, t in enumerate(tick_tables):
        s = _tick_stream(spark, t, f"root{i}")
        ticks = s if ticks is None else ticks.unionByName(s)

    def _on_tick(_batch: DataFrame, _epoch: int | None = None) -> None:
        for refresh in refreshers:
            refresh()

    def start_fn(checkpoint: str) -> StreamingQuery:
        return (ticks.writeStream
                .foreachBatch(_on_tick)
                .option("checkpointLocation", checkpoint)
                .start())

    return start_fn
