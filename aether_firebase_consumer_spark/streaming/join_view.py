"""Incremental enrich-join view maintenance (round 11): a
materialized ``fact LEFT JOIN dim ON join_key`` kept current from
BOTH tables' change feeds — the denormalization step every serving /
feature pipeline runs, maintained without ever re-joining the full
fact table.

Two independent maintenance regimes, one per side:

- FACT changes are 1:1 with view rows (the view is keyed by the fact
  key): deleted fact keys delete view rows; insert/update post-images
  re-enrich by joining ONLY the changed rows against the dim's
  current state — O(changed fact rows) per refresh.
- DIM changes fan out: every fact row whose join key was touched
  needs re-enrichment. Up to ``dim_fanin_cap`` touched keys (the
  common incremental case) they are collected and the fact rows are
  fetched through ``read_where(join_key IN ...)`` — the r10
  data-skipping path, so a fact table with ``stats_cols``/
  ``bloom_cols`` on the join key (or partitioned by it) reads only
  the files that can hold affected rows, never the table. Past the
  cap (a dim-wide backfill) the fold switches to a DISTRIBUTED semi-
  join of the fact against the feed's key frame — no driver-side key
  list, no million-literal plan, bounded at any dim size (round 12).
  Dim deletes null the enrichment columns (LEFT JOIN semantics), dim
  updates rewrite them.

Consistency model — two refresh modes (round 12):

- :meth:`refresh`: each fold joins against the OTHER side's current
  snapshot, so between refreshes the view is eventually consistent
  (the standard contract of an async denormalizer); after a refresh
  with both feeds drained it equals ``fact.read() LEFT JOIN
  dim.read()`` exactly — which is what the tests and the
  ``docs_join_view`` oracle pin.
- :meth:`refresh_aligned`: every fold pins to one captured
  (fact_version, dim_version) pair via time travel, so EVERY refresh
  point equals a consistent cross-source snapshot ``fact@fv ⟕
  dim@dv`` — the semantics a point-in-time feature store needs, at
  the cost of requiring both versions retained.

Exactly-once EFFECT: each side's applied-through version rides
the view's ``commit_meta`` (``fact_cursor`` / ``dim_cursor``), and
each fold applies only feed rows newer than its own cursor — the
same fence ``incremental_agg.py`` uses, doubled because the two
sources version independently.

The reference has no join capability at all (single-stream 1-by-1
forwards, /root/reference/firebase/app/artifacts.py:302-327); this is
the lake-native replacement for the "look up the dim in the sink per
document" pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable
from aether_firebase_consumer_spark.streaming.change_follower import (
    ChangeFeedFollower,
)


class CdfJoinView:
    """A materialized ``fact LEFT JOIN dim ON join_key``, keyed by the
    fact table's key columns, maintained from both retraction feeds.

    ``dim_prefix`` names the enrichment columns (``<prefix><col>`` for
    every non-join-key dim column) so fact and dim columns never
    collide. The fact table should carry ``record_change_values``
    (post-images drive re-enrichment); the dim feed only needs keys +
    change_type (its values are read from the dim table itself). For
    the dim-side fan-in to prune, give the FACT table stats/bloom
    coverage (or partitioning) on the join key."""

    def __init__(self, spark: SparkSession, path: str,
                 fact: ParquetUpsertTable, dim: ParquetUpsertTable,
                 join_key: str,
                 fact_checkpoint: str | None = None,
                 dim_checkpoint: str | None = None,
                 dim_prefix: str = "dim_",
                 partition_col: str | None = None,
                 table_kwargs: dict | None = None,
                 dim_fanin_cap: int = 10_000):
        if join_key in fact.key_cols:
            raise ValueError(
                "join_key must be a fact VALUE column (a key column "
                "never changes per row, so dim fan-in would be "
                "per-key — use the fact feed alone)")
        if dim.key_cols != [join_key]:
            raise ValueError(
                f"dim table must be keyed by exactly [{join_key!r}] "
                f"(has {dim.key_cols})")
        self.spark = spark
        self.fact = fact
        self.dim = dim
        self.join_key = join_key
        self.dim_prefix = dim_prefix
        #: above this many touched join keys, a dim fold switches from
        #: the driver-collected IN-list (file-pruned read) to a
        #: distributed semi-join — see _fold_dim
        self.dim_fanin_cap = int(dim_fanin_cap)
        self.fact_follower = None if fact_checkpoint is None else \
            ChangeFeedFollower(fact, fact_checkpoint, from_version=0)
        self.dim_follower = None if dim_checkpoint is None else \
            ChangeFeedFollower(dim, dim_checkpoint, from_version=0)
        #: table_kwargs passes through to the view's own table —
        #: record_change_values/record_change_preimages make the
        #: enriched table emit its OWN retraction feed, so views
        #: CHAIN: e.g. a CdfAggregateView grouping by a dim attribute
        #: over this denormalized table, each hop O(its changed rows)
        self.table = ParquetUpsertTable(spark, path, fact.key_cols,
                                        partition_col=partition_col,
                                        **(table_kwargs or {}))

    # -- enrichment -------------------------------------------------------
    def _dim_enriched(self, version: int | None = None) -> DataFrame:
        """The dim's rows (current, or pinned at ``version`` for
        snapshot-aligned refreshes) with value columns renamed to the
        prefixed enrichment names."""
        if version is None:
            d = self.dim.read()
        elif version < 0:
            d = None    # pinned to "before the dim existed"
        else:
            d = self.dim.read_version(version)
        if d is None:
            # empty dim: LEFT JOIN yields all-null enrichment; a
            # zero-column frame can't express that, so synthesize the
            # join-key-only frame (joins nothing -> nulls)
            return None
        return d.select(
            self.join_key,
            *[F.col(c).alias(f"{self.dim_prefix}{c}")
              for c in d.columns if c != self.join_key])

    def _enrich(self, fact_rows: DataFrame,
                dim_version: int | None = None) -> DataFrame:
        """LEFT JOIN ``fact_rows`` against the dim's current state (or
        the state pinned at ``dim_version``).
        Deliberately NO explicit broadcast hint: ``F.broadcast`` is a
        HARD hint Spark honors even for a dim too big to fit the
        driver (OOM, not a graceful fallback). Catalyst/AQE already
        auto-broadcasts sides under
        ``spark.sql.autoBroadcastJoinThreshold`` at plan/run time —
        the common small-dim case gets the broadcast join anyway, and
        a genuinely large dim gets a sound shuffle join instead of a
        blown driver."""
        dim = self._dim_enriched(dim_version)
        if dim is None:
            # no dim yet: the view is the bare fact rows; enrichment
            # columns appear on a later dim fold via the MERGE's
            # schema evolution (unionByName allowMissingColumns)
            return fact_rows
        return fact_rows.join(dim, self.join_key, "left")

    # -- cursors ----------------------------------------------------------
    def _cursors(self) -> dict:
        meta = self.table.commit_meta() or {}
        return {"fact": int(meta.get("fact_cursor", -1)),
                "dim": int(meta.get("dim_cursor", -1))}

    def _meta(self, side: str, up_to: int):
        """Publish-time commit_meta closure for one fold: re-read BOTH
        cursors inside the retrying merge body (``_publish`` evaluates
        callables per attempt) and stamp max(snapshot, current), so in
        concurrent two-stream mode an interleaved fold of the OTHER
        side can never be regressed by this fold publishing a
        pre-merge snapshot of its cursor. A regression was only ever
        redundant idempotent replay (folds filter version > applied),
        but it silently inflated work — this closes it."""
        other = "dim" if side == "fact" else "fact"

        def meta() -> dict:
            cur = self._cursors()
            return {f"{side}_cursor": max(up_to, cur[side]),
                    f"{other}_cursor": cur[other]}
        return meta

    # -- folds ------------------------------------------------------------
    def _fold_fact(self, feed: DataFrame, up_to: int,
                   dim_version: int | None = None) -> None:
        """Apply one fact feed slice: per-key latest-by-version
        collapse (a key updated then deleted inside one poll must end
        absent), deletes first, then MERGE the re-enriched
        post-images. ``dim_version`` pins the enrichment snapshot
        (aligned mode); None joins the dim's current state."""
        from aether_firebase_consumer_spark.sinks.upsert import (
            latest_per_key,
        )

        meta = self._meta("fact", up_to)
        final = latest_per_key(feed, self.fact.key_cols, "version")
        dead = (final.filter(F.col("change_type") == "delete")
                .select(*self.fact.key_cols))
        live = (final.filter(F.col("change_type") != "delete")
                .drop("change_type", "version"))
        live = live.drop(*[c for c in live.columns
                           if c.startswith("_pre_")])
        if live.isEmpty():
            # DELETE-ONLY slice: there is no merge for the cursor to
            # ride, but the deletes DO advance state — the fence must
            # advance with them (an empty merge is a table no-op), or
            # refresh_aligned would publish a cursor pair OLDER than
            # the state it just created, breaking its view ==
            # rejoin(cursor pair) contract (found by the seed-29
            # chained-aligned property script)
            if not dead.isEmpty():
                self.table.delete_keys(dead, commit_meta=meta)
            return
        if not dead.isEmpty():
            self.table.delete_keys(dead)
        self.table.merge(self._enrich(live, dim_version),
                         commit_meta=meta)

    def _fold_dim(self, feed: DataFrame, up_to: int,
                  fact_version: int | None = None,
                  dim_version: int | None = None) -> None:
        """Apply one dim feed slice: find the touched join keys
        (bounded by the dim delta), fetch ONLY the affected fact rows,
        re-enrich against the dim's current state, MERGE. Dim deletes
        fall out naturally: the LEFT JOIN nulls the enrichment columns
        for keys that no longer exist.

        Two fan-in regimes, switched on the touched-key COUNT (one
        cheap distributed count, no driver data):

        - ``<= dim_fanin_cap`` (the overwhelmingly common incremental
          case): collect the keys and fetch through
          ``read_where(join_key IN ...)`` — the data-skipping read, so
          a fact table with stats/bloom coverage on the join key opens
          only the files that can hold affected rows.
        - ``> dim_fanin_cap`` (a dim-wide backfill/rewrite): NO driver
          collect, NO million-literal IN-list plan, NO O(files ×
          members) bloom pass — the affected fact rows come from a
          distributed LEFT SEMI join of the fact against the feed's
          key frame instead. Not file-pruned, but a change touching
          most dim keys re-enriches most fact rows anyway, so the scan
          is proportional to the work."""
        meta = self._meta("dim", up_to)
        if fact_version is not None and fact_version < 0:
            return  # pinned to "before the fact existed": no rows
        # a null dim key can never equi-enrich any fact row — drop it
        keys = (feed.select(self.join_key)
                .filter(F.col(self.join_key).isNotNull()).distinct())
        n_touched = keys.count()
        if n_touched == 0:
            return  # fence note below: skipping is safe
        if n_touched <= self.dim_fanin_cap:
            non_null = [r[0] for r in keys.collect()]
            affected = self.fact.read_where(
                (self.join_key, "in", non_null),
                version=fact_version)
        else:
            fact = self.fact.read() if fact_version is None else \
                (None if fact_version < 0
                 else self.fact.read_version(fact_version))
            affected = None if fact is None else \
                fact.join(keys, self.join_key, "left_semi")
        if affected is None:
            return
        # Fence semantics: the cursor in commit_meta advances only on
        # folds that MERGE rows (an empty merge is a table no-op by
        # design). That is sufficient because both folds are
        # IDEMPOTENT per slice — replaying one converges — and the
        # fence's real job is blocking REGRESSION: an old crash-
        # replayed slice must not overwrite newer post-images, which
        # the version > applied filter on merged folds guarantees.
        # Progress tracking itself lives in the follower cursor /
        # streaming checkpoint, so an unadvanced fence never loops.
        self.table.merge(self._enrich(affected, dim_version),
                         commit_meta=meta)

    # -- refresh ----------------------------------------------------------
    def refresh(self) -> dict:
        """One maintenance step over BOTH feeds: fold the fact slice,
        then the dim slice, each fenced by its own cursor, then commit
        both followers. Returns {"fact": v|None, "dim": v|None} — the
        versions refreshed up to (None = that side was caught up).
        Fact first so a brand-new fact row still gets enriched by the
        dim fold when both changed in one step; the final state after
        any refresh with both feeds drained equals the full re-join,
        whatever the interleaving (each fold joins current state)."""
        out = {"fact": None, "dim": None}
        if self.fact_follower is None or self.dim_follower is None:
            raise RuntimeError(
                "this view was built without checkpoint paths — "
                "drive it from table_changes streams via "
                "fold_fact_batch/fold_dim_batch, or pass both "
                "checkpoint paths for poll-loop refreshes")
        got = self.fact_follower.poll(values=True)
        if got is not None:
            feed, up_to = got
            applied = self._cursors()["fact"]
            if applied < up_to:
                self._fold_fact(
                    feed.filter(F.col("version") > applied), up_to)
            self.fact_follower.commit(up_to)
            out["fact"] = up_to
        got = self.dim_follower.poll()
        if got is not None:
            feed, up_to = got
            applied = self._cursors()["dim"]
            if applied < up_to:
                self._fold_dim(
                    feed.filter(F.col("version") > applied), up_to)
            self.dim_follower.commit(up_to)
            out["dim"] = up_to
        return out

    def refresh_aligned(self) -> dict:
        """SNAPSHOT-ALIGNED refresh (round 12): one maintenance step
        whose result is a consistent cross-source snapshot — after it
        returns, the view equals ``fact@fv LEFT JOIN dim@dv`` EXACTLY,
        where (fv, dv) are the two source versions captured at entry
        (and stamped as the committed cursors). :meth:`refresh` joins
        each fold against the other side's *current* state, so between
        refreshes a chained downstream view can observe a fact batch
        enriched by a dim version NEWER than the dim cursor (a torn
        intermediate state — fine for an async denormalizer, wrong
        for point-in-time feature serving). This mode pins every read
        to the captured pair instead:

        - the fact fold applies only feed rows ``<= fv`` and enriches
          against ``dim@dv`` (time travel);
        - the dim fold applies only feed rows ``<= dv``, fetches
          affected fact rows at ``fact@fv`` (the data-skipping read
          accepts a version), and re-enriches against ``dim@dv``;
        - both followers commit at exactly (fv, dv) — changes that
          landed after capture re-deliver next time.

        Why the result is exact: inductively the pre-refresh view is
        some earlier aligned pair (f0, d0) — or even a torn state
        whose every enrichment came from dim versions in [d0, dv],
        which this refresh REPAIRS: any fact row whose enrichment
        could differ between those versions has its join key in the
        dim feed (d0, dv] and is re-enriched at dv; rows not
        re-enriched provably enrich identically at d0 and dv. Fact
        rows changed in (f0, fv] carry post-images at fv. So every
        view row equals its (fact@fv ⟕ dim@dv) image.

        Raises (via ``read_version``) when fv or dv was vacuumed
        between capture and use — an aligned refresh cannot be
        answered from missing history; rebuild() instead. Requires
        both checkpoint paths (poll-loop mode), like
        :meth:`refresh`."""
        if self.fact_follower is None or self.dim_follower is None:
            raise RuntimeError(
                "refresh_aligned needs both checkpoint paths "
                "(poll-loop mode) — streaming foreachBatch folds are "
                "inherently per-side and cannot pin a cross-source "
                "snapshot")
        fv = self.fact.current_version()
        dv = self.dim.current_version()
        out = {"fact": None, "dim": None}
        got = self.fact_follower.poll(values=True)
        if got is not None and fv >= 0:
            feed, _head = got
            applied = self._cursors()["fact"]
            if applied < fv:
                self._fold_fact(
                    feed.filter((F.col("version") > applied)
                                & (F.col("version") <= fv)),
                    fv, dim_version=dv)
            # commit at fv, NOT the poll head: anything that landed
            # after capture re-delivers on the next refresh
            self.fact_follower.commit(fv)
            out["fact"] = fv
        got = self.dim_follower.poll()
        if got is not None and dv >= 0:
            feed, _head = got
            applied = self._cursors()["dim"]
            if applied < dv:
                self._fold_dim(
                    feed.filter((F.col("version") > applied)
                                & (F.col("version") <= dv)),
                    dv, fact_version=fv, dim_version=dv)
            self.dim_follower.commit(dv)
            out["dim"] = dv
        return out

    def rebuild(self) -> dict:
        """Recovery past either side's retention window: a FULL
        re-enrich of the fact's current state against the dim's
        current state, replacing the view atomically with both
        cursors pinned to the snapshot versions, then jumping both
        followers — the view analogue of ``ChangeFeedFollower.
        bootstrap``. Crash-safe by rerun. In streaming mode restart
        both streams from fresh checkpoints with
        ``startingVersion = cursor + 1``."""
        fv = self.fact.current_version()
        dv = self.dim.current_version()
        f = self.fact.read()
        if f is None or fv < 0:
            raise ValueError("cannot rebuild a join view over an "
                             "empty fact table")
        meta = {"fact_cursor": fv, "dim_cursor": dv}
        self.table.replace(self._enrich(f), commit_meta=meta)
        if self.fact_follower is not None:
            self.fact_follower.commit(fv)
        if self.dim_follower is not None:
            self.dim_follower.commit(dv)
        return {"fact": fv, "dim": dv}

    def fold_fact_batch(self, batch_df: DataFrame,
                        _epoch_id: int | None = None) -> None:
        """``foreachBatch`` adapter for a fact-side ``table_changes``
        stream with ``includeValues`` — same fence as
        :meth:`refresh`'s fact fold."""
        if batch_df.isEmpty():
            return
        up_to = batch_df.agg(F.max("version").alias("v")) \
            .collect()[0][0]
        applied = self._cursors()["fact"]
        if up_to is None or int(up_to) <= applied:
            return
        self._fold_fact(batch_df.filter(F.col("version") > applied),
                        int(up_to))

    def fold_dim_batch(self, batch_df: DataFrame,
                       _epoch_id: int | None = None) -> None:
        """``foreachBatch`` adapter for a dim-side ``table_changes``
        stream (keys + change_type suffice)."""
        if batch_df.isEmpty():
            return
        up_to = batch_df.agg(F.max("version").alias("v")) \
            .collect()[0][0]
        applied = self._cursors()["dim"]
        if up_to is None or int(up_to) <= applied:
            return
        self._fold_dim(batch_df.filter(F.col("version") > applied),
                       int(up_to))

    # -- read -------------------------------------------------------------
    def read(self) -> DataFrame | None:
        return self.table.read()
