"""Incremental TOP-K / argmax-per-group view maintenance (round 12):
a materialized ``per-group top-N rows by an order column`` kept exact
under inserts, updates, AND deletes from the source table's
retraction feed — the serving shape of ``events_latest_per_user``
(N=1 is argmax/latest-state-per-id, which is the reference's entire
sink semantics: latest document per id,
/root/reference/firebase/app/helpers.py:93-114 — here it is a
maintained lake table instead of a per-doc remote write).

Top-K is holistic, like MIN/MAX: an insert can only IMPROVE a group's
membership (fold additively — rank the new candidates against the
stored members, no source read), but a retraction can EVICT a current
member whose replacement (the old rank N+1 row) is not in the view's
state. So the two-regime treatment of
``incremental_agg.CdfAggregateView``'s min/max applies, lifted from
scalar extrema to row sets:

- INSERT-ONLY groups fold additively: candidates = stored members ∪
  new post-images, re-ranked, top N kept, displaced members deleted.
  Zero source reads — the overwhelmingly common append case.
- Any group that RETRACTS a row (delete, or an update's pre-image —
  including the intermediate groups of a multi-hop within-slice group
  move, read from EVERY retraction row in the slice, not just the
  per-key-collapsed final one) is DIRTY: its membership is recomputed
  from the source AT THE PINNED VERSION the fold covers
  (``read_version(up_to)``, partition-pruned when a group column is
  the source's partition column; raises when vacuumed — rebuild()).
  Dirty sets derive from the immutable FEED, never from current view
  state, so a crash-replayed slice re-derives the same dirty set and
  converges (view-state-derived dirtiness would be lost by a partial
  first attempt).

Determinism: membership is ``ROW_NUMBER() OVER (PARTITION BY groups
ORDER BY order_col [DESC] NULLS LAST, key_cols NULLS LAST) <= n`` —
ties break on the key columns, nulls sort last in both directions
(matching DuckDB's defaults, pinned by the ``docs_incremental_topk``
oracle), so the maintained set is a pure function of source state.

Exactly-once EFFECT: the applied-through version rides the final
MERGE's ``commit_meta`` (``cdf_cursor``), each fold applies only feed
rows ``version > applied``, and every sub-step (delete stale, merge
recomputed, delete evicted, merge candidates) is idempotent per
slice — the same fence as ``CdfAggregateView``.

Scale shape: a refresh reads O(changed rows) of recordings, ranks
O(|touched groups| × (n + changed rows per group)) candidates, and
the dirty recompute scans only dirty groups' source rows. The view
table itself is O(n × |groups|) — constant per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.sinks.upsert import (
    ParquetUpsertTable,
    latest_per_key,
)
from aether_firebase_consumer_spark.streaming.change_follower import (
    ChangeFeedFollower,
)


class CdfTopKView:
    """Per-group top-``n`` source rows by ``order_col``, maintained
    from the source's pre+post image retraction feed.

    The view table is keyed by the SOURCE's key columns (each source
    row appears at most once across all groups) and stores full
    post-image rows, so it serves point reads like any other table.
    The source must record ``record_change_values`` and
    ``record_change_preimages`` for O(changed rows) refreshes."""

    def __init__(self, spark: SparkSession, path: str,
                 source: ParquetUpsertTable, group_cols: list[str],
                 order_col: str, n: int, descending: bool = True,
                 checkpoint_path: str | None = None,
                 partition_col: str | None = None,
                 from_version: int = 0,
                 table_kwargs: dict | None = None):
        if n < 1:
            raise ValueError(f"top-k needs n >= 1 (got {n})")
        if order_col in group_cols:
            raise ValueError("order_col cannot be a group column")
        for c in group_cols + [order_col]:
            if c in source.key_cols:
                # key cols are immutable per row, so a key-col group
                # never moves and a key-col order never retracts —
                # legal in principle, but the pre-image plumbing
                # special-cases them; keep the contract simple
                raise ValueError(
                    f"{c!r} is a source KEY column — group/order "
                    "columns must be value columns (keys never "
                    "change, so there is nothing incremental to "
                    "maintain on them)")
        self.spark = spark
        self.source = source
        self.group_cols = list(group_cols)
        self.order_col = order_col
        self.n = int(n)
        self.descending = bool(descending)
        self.follower = None if checkpoint_path is None else \
            ChangeFeedFollower(source, checkpoint_path,
                               from_version=from_version)
        self.table = ParquetUpsertTable(spark, path, source.key_cols,
                                        partition_col=partition_col,
                                        **(table_kwargs or {}))

    # -- ordering ----------------------------------------------------------
    def _order_exprs(self):
        """The deterministic membership order: order_col (nulls
        last either direction, DuckDB-compatible), key columns as the
        tie-break."""
        lead = (F.col(self.order_col).desc_nulls_last()
                if self.descending
                else F.col(self.order_col).asc_nulls_last())
        return [lead] + [F.col(k).asc_nulls_last()
                         for k in self.source.key_cols]

    def _topn(self, rows: DataFrame) -> DataFrame:
        w = (W.partitionBy(*self.group_cols)
             .orderBy(*self._order_exprs()))
        return (rows.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") <= self.n).drop("_rk"))

    # -- fold helpers ------------------------------------------------------
    def _null_safe_on(self, a: str, b: str, cols: list[str]):
        cond = None
        for c in cols:
            e = F.col(f"{a}.{c}").eqNullSafe(F.col(f"{b}.{c}"))
            cond = e if cond is None else cond & e
        return cond

    def _semi_groups(self, rows: DataFrame,
                     groups: DataFrame) -> DataFrame:
        """Null-safe LEFT SEMI of ``rows`` against a frame of group
        values (NULL is a legal group)."""
        r, g = rows.alias("r"), F.broadcast(groups.alias("g"))
        on = self._null_safe_on("r", "g", self.group_cols)
        return r.join(g, on, "left_semi")

    def _anti_groups(self, rows: DataFrame,
                     groups: DataFrame) -> DataFrame:
        r, g = rows.alias("r"), F.broadcast(groups.alias("g"))
        on = self._null_safe_on("r", "g", self.group_cols)
        return r.join(g, on, "left_anti")

    def _dirty_groups(self, feed: DataFrame) -> DataFrame:
        """Group values that RETRACTED a row anywhere in the slice:
        the pre-image groups of every update/delete row — from ALL
        slice rows, not the per-key collapse, so every intermediate
        group of a multi-hop within-slice move is covered. Derived
        from the immutable feed (replay-stable)."""
        retract = feed.filter(F.col("change_type") != "insert")
        missing = [g for g in self.group_cols
                   if f"_pre_{g}" not in feed.columns]
        if missing and not retract.isEmpty():
            raise ValueError(
                f"feed slice retracts rows but carries no pre-images "
                f"for group columns {missing} — the source table "
                "needs record_change_preimages=True for top-k "
                "maintenance")
        if missing:
            return retract.select(
                *[F.lit(None).alias(g) for g in self.group_cols])
        return (retract
                .select(*[F.col(f"_pre_{g}").alias(g)
                          for g in self.group_cols])
                .distinct())

    def _applied(self) -> int:
        meta = self.table.commit_meta() or {}
        v = meta.get("cdf_cursor")
        return -1 if v is None else int(v)

    # -- fold --------------------------------------------------------------
    def _fold(self, feed: DataFrame, up_to: int) -> None:
        meta = {"cdf_cursor": up_to}
        final = latest_per_key(feed, self.source.key_cols, "version")
        # 1) every changed key's OLD stored row leaves the view (the
        #    post-image re-enters below if it still ranks)
        if self.table.read() is not None:
            self.table.delete_keys(final.select(*self.source.key_cols))
        dirty = self._dirty_groups(feed)
        have_dirty = not dirty.isEmpty()
        # 2) dirty groups: authoritative recompute at the PINNED
        #    version this fold covers (replays converge; raises when
        #    vacuumed — same contract as CdfAggregateView min/max)
        if have_dirty:
            try:
                src = self.source.read_version(up_to)
            except ValueError as exc:
                raise ValueError(
                    f"top-k dirty-group recompute needs source "
                    f"version {up_to} but it is not retained "
                    "(vacuumed) — raise retain_versions on the "
                    "source, or rebuild() the view") from exc
            recomputed = self._topn(self._semi_groups(src, dirty))
            cur = self.table.read()
            if cur is not None:
                stale = self._semi_groups(cur, dirty) \
                    .select(*self.source.key_cols)
                if not stale.isEmpty():
                    self.table.delete_keys(stale)
            if not recomputed.isEmpty():
                self.table.merge(recomputed)
        # 3) insert-only groups fold additively: stored members ∪ new
        #    post-images, re-ranked — zero source reads
        post_cols = [c for c in final.columns
                     if c not in ("change_type", "version")
                     and not c.startswith("_pre_")]
        live = (final.filter(F.col("change_type") != "delete")
                .select(*post_cols))
        has_values = all(c in live.columns for c in
                         [*self.group_cols, self.order_col])
        if not has_values or live.isEmpty():
            # delete-only slice (no post images): nothing to fold
            # additively. The fence rides the next value-carrying
            # merge — folds are idempotent per slice, progress lives
            # in the follower cursor, and an unadvanced fence only
            # ever re-applies (converging) work, never skips it.
            return
        cand_groups = live.select(*self.group_cols).distinct()
        if have_dirty:
            cand_groups = self._anti_groups(cand_groups, dirty)
        cand = self._semi_groups(live, cand_groups)
        cur = self.table.read()
        if cur is not None:
            stored = self._semi_groups(cur, cand_groups)
            # replays may re-deliver rows already merged: keep ONE
            # copy per key (the feed's post-image is authoritative)
            stored = stored.alias("s").join(
                F.broadcast(cand.select(*self.source.key_cols)
                            .alias("c")),
                self._null_safe_on("s", "c", self.source.key_cols),
                "left_anti")
            # allowMissingColumns: the source may have evolved a new
            # column mid-feed — older stored rows union as nulls
            cand = cand.unionByName(stored, allowMissingColumns=True)
        new_members = self._topn(cand)
        if cur is not None:
            evicted = (self._semi_groups(cur, cand_groups).alias("v")
                       .join(new_members
                             .select(*self.source.key_cols)
                             .alias("m"),
                             self._null_safe_on(
                                 "v", "m", self.source.key_cols),
                             "left_anti")
                       .select(*self.source.key_cols))
            if not evicted.isEmpty():
                self.table.delete_keys(evicted)
        if not new_members.isEmpty():
            self.table.merge(new_members, commit_meta=meta)

    # -- refresh / rebuild ---------------------------------------------------
    def refresh(self) -> int | None:
        """One maintenance step: poll the image feed, fold the
        not-yet-applied suffix, commit the follower cursor. Returns
        the version refreshed up to, or None when caught up."""
        if self.follower is None:
            raise RuntimeError(
                "this view was built without a checkpoint_path "
                "(streaming mode) — drive it from a table_changes "
                "includeImages stream via fold_stream_batch, or pass "
                "checkpoint_path for poll-loop refreshes")
        got = self.follower.poll(images=True)
        if got is None:
            return None
        feed, up_to = got
        applied = self._applied()
        if applied < up_to:
            self._fold(feed.filter(F.col("version") > applied), up_to)
        self.follower.commit(up_to)
        return up_to

    def fold_stream_batch(self, batch_df: DataFrame,
                          _epoch_id: int | None = None) -> None:
        """``foreachBatch`` adapter for a ``table_changes`` stream
        with ``includeImages`` — same fence as :meth:`refresh`."""
        if batch_df.isEmpty():
            return
        up_to = batch_df.agg(
            F.max("version").alias("v")).collect()[0][0]
        if up_to is None:
            return
        applied = self._applied()
        if int(up_to) <= applied:
            return
        self._fold(batch_df.filter(F.col("version") > applied),
                   int(up_to))

    def rebuild(self) -> int:
        """Recovery past the retention window: full recompute at the
        source's current version, replacing the view atomically with
        the cursor pinned (the view analogue of
        ``ChangeFeedFollower.bootstrap``)."""
        src = self.source.read()
        v = self.source.current_version()
        if src is None or v < 0:
            raise ValueError("cannot rebuild a top-k view over an "
                             "empty source table")
        self.table.replace(self._topn(src),
                           commit_meta={"cdf_cursor": v})
        if self.follower is not None:
            self.follower.commit(v)
        return v

    # -- read ---------------------------------------------------------------
    def read(self, with_rank: bool = False) -> DataFrame | None:
        """The maintained membership; ``with_rank=True`` adds the
        1-based ``rank`` column (recomputed over the O(n × groups)
        view rows — cheap, and storing it would churn sibling rows on
        every membership change)."""
        t = self.table.read()
        if t is None:
            return None
        if not with_rank:
            return t
        w = (W.partitionBy(*self.group_cols)
             .orderBy(*self._order_exprs()))
        return t.withColumn("rank", F.row_number().over(w))
