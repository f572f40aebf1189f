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
    intermediate view tables) wakes the job, which refreshes every
    view in TOPOLOGICAL order — derived HERE (round 14) from each
    member's own source/table edges, not trusted from the caller's
    list order: a mis-ordered list is silently corrected, a cycle or
    a member whose source is neither a tick root nor an upstream
    member's table raises at CONFIGURATION time (it would leave
    downstream hops one tick stale on every wakeup, or permanently
    stale, with no error to see). Each hop's refresh folds its
    source's new changes and commits its own table, so the hop after
    it sees those changes in the same wakeup — one tick drains the
    whole chain.

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
    import os

    def _norm(p: str) -> str:
        return os.path.normpath(os.path.abspath(p))

    if not tick_tables:
        raise ValueError("view_chain_start_fn needs at least one "
                         "root table to tick on")
    members = []  # (refresh_fn, input paths, output path, label)
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
            refresh = view.refresh_aligned
        else:
            view = item
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
            refresh = item.refresh
        if hasattr(view, "fact") and hasattr(view, "dim"):
            inputs = {_norm(view.fact.path), _norm(view.dim.path)}
        else:
            inputs = {_norm(view.source.path)}
        label = f"{type(view).__name__}({view.table.path})"
        members.append((refresh, inputs, _norm(view.table.path),
                        label))

    roots = {_norm(t.path) for t in tick_tables}
    outputs: dict[str, int] = {}
    for i, (_r, _in, out, label) in enumerate(members):
        if out in outputs:
            raise ValueError(
                f"two chain members maintain the same table: {label} "
                f"and {members[outputs[out]][3]} — a chain refreshes "
                "each view table exactly once per tick")
        outputs[out] = i
    for _r, inputs, _out, label in members:
        for inp in inputs:
            if inp not in roots and inp not in outputs:
                raise ValueError(
                    f"chain member {label} reads {inp}, which is "
                    "neither a tick root nor another member's table "
                    "— its changes would never wake the job and the "
                    "hop would serve permanently stale state. Add "
                    "the table to tick_tables or add the view that "
                    "maintains it to the chain.")
    # Kahn toposort, stable within the caller's order: a member is
    # ready once every member-maintained input has been scheduled
    order: list[int] = []
    scheduled: set[int] = set()
    pending = list(range(len(members)))
    while pending:
        ready = [i for i in pending
                 if {outputs[p] for p in members[i][1]
                     if p in outputs} <= scheduled]
        if not ready:
            stuck = ", ".join(members[i][3] for i in pending)
            raise ValueError(
                f"view chain has a dependency cycle among: {stuck} "
                "— a view cannot (transitively) read its own output")
        for i in ready:
            order.append(i)
            scheduled.add(i)
            pending.remove(i)
    refreshers = [members[i][0] for i in order]

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
