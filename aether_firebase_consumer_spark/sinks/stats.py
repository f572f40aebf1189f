"""Per-file column-statistics manifest — Delta-style data skipping
for :class:`~aether_firebase_consumer_spark.sinks.upsert.ParquetUpsertTable`
(round 10).

At 100 TB three layers of pruning matter, and the table already had
two: partition pruning (the ``partition_col`` IN-lists every probe
pushes) and parquet row-group pruning (footer min/max, applied AFTER
a file is opened). The missing layer is the one between them — *file*
skipping from a manifest, so a selective scan never LISTS-OPENS the
files that can't match. That is exactly what Delta/Iceberg keep
add-file stats in the commit log for; here the manifest is a
``_STATS.json`` inside each version directory (underscore-prefixed,
so data readers ignore it), committed atomically with the data by the
existing staged-dir + CAS protocol.

Incremental by construction: only files NEW in a commit pay a
driver-side footer read (cost ∝ batch, the same shape as the
hardlink carry-forward itself); files carried from the parent version
keep their relpath and inherit the parent's entry verbatim. Spark's
part-file names embed a per-job UUID, so a relpath collision between
a carried file and a rewritten one cannot happen.

Safety: skipping must never DROP a matching row, so every uncertain
case keeps the file — a column absent from a file's footer (schema
evolution), a NaN bound (parquet NaN stats are unreliable), a
non-scalar stat type, or a string bound long enough that a writer may
have truncated it (``_MAX_STR`` — parquet writers truncate long
binary stats; a truncated max is not a true max). The reader
re-applies the predicate as a real filter regardless, so pruning is
purely an I/O optimization and results stay exact even if the
manifest is missing entirely.

The reference has no storage layer at all (1-by-1 Firestore writes,
``/root/reference/firebase/app/helpers.py:93-114``); this is the
lake-native replacement's scan-cost story.
"""

from __future__ import annotations

import json
import math
import os

_MANIFEST = "_STATS.json"
#: string bounds at least this long may have been truncated by the
#: writer — keep the file rather than trust an inexact max
_MAX_STR = 64

_OPS = ("<", "<=", ">", ">=", "=", "==", "in")

_EPOCH_DT = None  # initialized lazily to keep the import cheap


def _to_epoch(v):
    """datetime AND date → epoch MICROSECONDS (a date is its midnight
    UTC instant, days × 86_400_000_000) — exact integer math (float
    total_seconds loses sub-µs precision at 2026 epochs),
    order-preserving, and ONE unit for both temporal types: Spark
    coerces a date literal against a timestamp column (and vice
    versa) by promoting the date to its midnight timestamp, so a
    shared micros scale makes cross-type interval pruning agree with
    the coerced filter. (Pre-r11 manifests stored dates as epoch
    DAYS — a plain int indistinguishable from micros, which could
    false-skip on a cross-typed literal; bounds are now unit-TAGGED,
    see ``_scalar``, and untagged legacy epoch bounds are simply
    never compared against temporal literals.) The engine pins the
    Spark session timezone to UTC (session.py:38), matching parquet's
    UTC-adjusted timestamps; an aware datetime is normalized to UTC
    first."""
    import datetime as dt
    global _EPOCH_DT
    if _EPOCH_DT is None:
        _EPOCH_DT = (dt.datetime(1970, 1, 1), dt.date(1970, 1, 1))
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        d = v - _EPOCH_DT[0]
        return ((d.days * 86400 + d.seconds) * 1_000_000
                + d.microseconds)
    if isinstance(v, dt.date):
        return (v - _EPOCH_DT[1]).days * 86_400_000_000
    return v


def _scalar(v):
    """Footer stat → JSON-safe scalar, or None when it can't be
    trusted for pruning (conservative keep). Timestamps/dates are
    stored UNIT-TAGGED as ``{"us": epoch_micros}`` so a temporal
    bound can never be confused with a plain int column's bound (or,
    pre-r11, a days-scaled date bound) — ``keeps`` only compares
    bounds and literals whose tags agree, and treats any mismatch as
    incomparable (keep the file)."""
    import datetime as dt
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, (dt.datetime, dt.date)):
        if getattr(v, "nanosecond", 0):
            # sub-µs precision (pd.Timestamp from a TIMESTAMP(NANOS)
            # footer) would truncate — a truncated MAX understates the
            # bound, which could skip wrongly; don't trust it
            return None
        return {"us": _to_epoch(v)}
    if isinstance(v, int):
        return v
    if isinstance(v, float):
        return None if (math.isnan(v) or math.isinf(v)) else v
    if isinstance(v, str):
        return None if len(v) >= _MAX_STR else v
    if isinstance(v, bytes):
        try:
            s = v.decode("utf-8")
        except UnicodeDecodeError:
            return None
        return None if len(s) >= _MAX_STR else s
    return None


# -- bloom filters (equality skipping) -------------------------------
#
# Interval stats prune RANGE predicates; a point lookup on a
# high-cardinality column (the takedown-by-id case) needs set
# membership. Per-file bloom filters live in the same manifest under
# the reserved "__bloom__" key: ~9.6 bits/row for a 1% false-positive
# rate, k=7 double-hashed probes derived from one md5 (portable and
# seed-stable — python's hash() is seed-randomized and must never
# feed a persisted structure). False positives only cost a wasted
# file read; false negatives are impossible for the serialized types
# (int/str), and any other type refuses to answer (keep the file).

_BLOOM_BITS_PER_ROW = 10   # ~0.9% fp at k=7
_BLOOM_K = 7


def _bloom_key(v) -> bytes | None:
    """Type-tagged serialization so int 5 and str "5" can't alias a
    stored value into a false negative. None → not bloomable."""
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, int):
        return b"i:%d" % v
    if isinstance(v, str):
        return b"s:" + v.encode("utf-8")
    return None


def _bloom_probes(key: bytes, m: int):
    import hashlib
    d = hashlib.md5(key).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1
    return ((h1 + i * h2) % m for i in range(_BLOOM_K))


def build_bloom(values) -> dict | None:
    """``{"m": bits, "b64": bitset}`` over the values, or None if any
    value isn't bloomable (conservative: no bloom → file kept)."""
    import base64
    vals = list(values)
    m = max(64, len(vals) * _BLOOM_BITS_PER_ROW)
    bits = bytearray((m + 7) // 8)
    for v in vals:
        key = _bloom_key(v)
        if key is None:
            if v is None:   # null rows never match an equality
                continue
            return None
        for p in _bloom_probes(key, m):
            bits[p >> 3] |= 1 << (p & 7)
    return {"m": m, "b64": base64.b64encode(bytes(bits)).decode()}


#: decoded-bitset cache keyed by the b64 payload itself (hashable,
#: content-addressed — identical blooms share). An IN-list takedown
#: probes every file's bloom once PER MEMBER; without the cache that
#: is members × files base64 decodes (measured 18 s for one point
#: probe over a 1M-file manifest; ~0.13 s at 10k files). Wholesale
#: clear on overflow keeps it bounded without LRU bookkeeping.
_BLOOM_CACHE: dict = {}
_BLOOM_CACHE_MAX = 4096


def bloom_might_contain(bloom: dict, value) -> bool:
    """False ONLY when the value is provably absent from the file."""
    import base64
    key = _bloom_key(value)
    if key is None:
        return True
    b64 = bloom["b64"]
    bits = _BLOOM_CACHE.get(b64)
    if bits is None:
        if len(_BLOOM_CACHE) >= _BLOOM_CACHE_MAX:
            _BLOOM_CACHE.clear()
        bits = _BLOOM_CACHE[b64] = base64.b64decode(b64)
    return all(bits[p >> 3] & (1 << (p & 7))
               for p in _bloom_probes(key, bloom["m"]))


def file_column_stats(file_path: str, cols: list[str]) -> dict:
    """``{col: [min, max]}`` for ``cols`` from one parquet file's
    footer — metadata only, no data pages. Columns whose bounds can't
    be trusted are omitted (the file is then never skipped on them).
    The reserved ``__rows__`` key records the footer's exact row
    count — free here, and it makes the manifest answer COUNT(*) (and
    per-partition counts, via the shard meta) without any scan."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(file_path).metadata
    want = set(cols)
    lo: dict = {}
    hi: dict = {}
    seen_all = set()
    for rg in range(md.num_row_groups):
        for ci in range(md.num_columns):
            col = md.row_group(rg).column(ci)
            name = col.path_in_schema
            if name not in want or name in seen_all:
                continue
            s = col.statistics
            mn = _scalar(s.min) if s is not None and s.has_min_max \
                else None
            mx = _scalar(s.max) if s is not None and s.has_min_max \
                else None
            if mn is None or mx is None:
                # one untrusted row group poisons the whole file's
                # entry for this column — partial bounds would skip
                # rows living in the untrusted group
                seen_all.add(name)
                lo.pop(name, None)
                hi.pop(name, None)
                continue
            # tagged temporal bounds ({"us": n}) don't support dict
            # min/max — compare on the inner value (tags are uniform
            # within a column: one parquet type per column)
            def _bkey(b):
                return b["us"] if isinstance(b, dict) else b
            if name not in lo or _bkey(mn) < _bkey(lo[name]):
                lo[name] = mn
            if name not in hi or _bkey(mx) > _bkey(hi[name]):
                hi[name] = mx
    out = {c: [lo[c], hi[c]] for c in lo if c in hi}
    out["__rows__"] = md.num_rows
    return out


def file_blooms(file_path: str, bloom_cols: list[str]) -> dict:
    """Per-column bloom filters over one file's values — a
    column-pruned data read (unlike interval stats this must see the
    values; cost ∝ new-file rows, still ∝ batch per commit). Columns
    absent from the file or with un-bloomable types are omitted."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(file_path)
    present = [c for c in bloom_cols
               if c in pf.schema_arrow.names]
    out = {}
    if not present:
        return out
    tb = pf.read(columns=present)
    for c in present:
        bloom = build_bloom(tb.column(c).to_pylist())
        if bloom is not None:
            out[c] = bloom
    return out


def build_manifest(staged_dir: str, cols: list[str],
                   parent_manifest: dict | None,
                   bloom_cols: list[str] | None = None) -> dict:
    """Walk the staged version directory and assemble its manifest:
    carried files (relpath present in the parent manifest) inherit
    their entry; new files pay one footer read each. Every parquet
    file gets a key, even with an empty stats dict, so the manifest
    doubles as the version's authoritative file list."""
    parent_files = (parent_manifest or {}).get("files", {})
    files: dict = {}
    for root, dirs, names in os.walk(staged_dir):
        # hidden dirs (the version's _changes recording) hold
        # bookkeeping parquet, not data — Spark's reader skips them
        # and so must the manifest's file list
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for name in names:
            if not name.endswith(".parquet"):
                continue
            full = os.path.join(root, name)
            rel = os.path.relpath(full, staged_dir)
            if rel in parent_files:
                files[rel] = parent_files[rel]
            else:
                entry = file_column_stats(full, cols)
                if bloom_cols:
                    bl = file_blooms(full, bloom_cols)
                    if bl:
                        entry["__bloom__"] = bl
                files[rel] = entry
    return {"cols": list(cols), "files": files,
            "bloom_cols": list(bloom_cols or [])}


# -- sharded manifests (round 11) -------------------------------------
#
# One JSON per version works until the file count does: the scale
# probe (`tools/manifest_scale_probe.py`) measured a 1M-file manifest
# at 1.8 GB / ~9 s to parse — and the flat writer RE-SERIALIZES every
# entry on every commit even when the commit touched one partition.
# Delta's answer is sharded parquet checkpoints; the equivalent here
# is one shard JSON per hive partition directory under `_STATS.d/`,
# with the root `_STATS.json` holding only per-shard file counts and
# content signatures. Two costs become proportional to the work:
#   * WRITE — a shard whose relpath set is unchanged from the parent
#     version is HARDLINKED (same trick as the data files): zero
#     parse, zero serialization; only touched shards are rebuilt.
#   * READ — a probe carrying an equality predicate on the partition
#     column parses only the shards whose DIRECTORY NAME admits it
#     (`prune_files(..., partition_col=...)`); everything else stays
#     unopened. Interval/bloom pruning then applies per file within
#     the parsed shards, exactly as before.
# Unpartitioned layouts keep the flat single-JSON format, and flat
# manifests written before this change load and prune unchanged.

_SHARD_DIR = "_STATS.d"


def _shard_of(rel: str) -> str:
    """Top-level hive partition dir of a relpath, or '' (root)."""
    head, sep, _ = rel.partition(os.sep)
    return head if sep and "=" in head else ""


def _shard_fname(shard: str) -> str:
    # shard names always contain '='; the root sentinel never does,
    # so the two can't collide
    return (shard or "__root__") + ".json"


def _shard_sig(rels: list[str]) -> str:
    """Content signature of a shard's file LIST (not stats): equal
    sig ⇒ identical relpaths ⇒ every entry inherits verbatim, so the
    parent's shard JSON is byte-correct for the child too."""
    import hashlib
    h = hashlib.md5()
    for r in sorted(rels):
        h.update(r.encode("utf-8"))
        h.update(b"\0")
    return h.hexdigest()


class ShardedManifest:
    """Lazy view over a sharded per-version manifest. Shard file→stats
    maps parse on first touch; ``loaded`` records which shards paid a
    parse (tests pin the only-my-shard claim). ``get``/``[]`` keep the
    flat-dict contract (``man["files"]`` merges all shards) for
    callers that want the whole file list."""

    def __init__(self, version_dir: str, doc: dict):
        self._dir = version_dir
        self._doc = doc
        self.shards: dict = doc.get("shards", {})
        self.loaded: set = set()
        self._cache: dict = {}
        self._all: dict | None = None

    def shard_path(self, shard: str) -> str:
        return os.path.join(self._dir, _SHARD_DIR, _shard_fname(shard))

    def shard_files(self, shard: str) -> dict:
        files = self._cache.get(shard)
        if files is None:
            # load_manifest verified every declared shard exists, so a
            # read failure here is real corruption — raise rather than
            # silently treating the shard as empty (the manifest is
            # the authoritative file list; an "empty" shard would DROP
            # its files from pruned reads)
            with open(self.shard_path(shard)) as fh:
                files = json.load(fh).get("files", {})
            self._cache[shard] = files
            self.loaded.add(shard)
        return files

    @property
    def total_files(self) -> int:
        return sum(m.get("n", 0) for m in self.shards.values())

    def _all_files(self) -> dict:
        if self._all is None:
            merged: dict = {}
            for s in self.shards:
                merged.update(self.shard_files(s))
            self._all = merged
        return self._all

    def get(self, key, default=None):
        if key == "files":
            return self._all_files()
        return self._doc.get(key, default)

    def __getitem__(self, key):
        if key == "files":
            return self._all_files()
        return self._doc[key]

    def __contains__(self, key) -> bool:
        return key == "files" or key in self._doc


def _shard_admits(shard: str, partition_col: str | None,
                  predicates: list[tuple]) -> bool:
    """Name-level shard pruning: False only when the hive directory
    name PROVES no row under it satisfies the conjunction. Only
    equality ops on the partition column prune (range ops would need
    a typed compare against a string dir name — keep). Exactness: the
    dir name is Spark's %-escaped rendering of the partition value;
    unescaping and comparing against ``hive_partition_value(literal)``
    is the same value→string map the merge path trusts for partition
    identity, and the null directory never equi-matches anything
    (SQL: ``pc = x`` is never true for null pc)."""
    if not shard or not partition_col:
        return True
    col, _, dirval = shard.partition("=")
    if col != partition_col:
        return True
    from urllib.parse import unquote

    from aether_firebase_consumer_spark.sinks.upsert import (
        HIVE_DEFAULT_PARTITION,
        hive_partition_value,
    )
    is_null_dir = dirval == HIVE_DEFAULT_PARTITION
    val = None if is_null_dir else unquote(dirval)
    for c, op, v in predicates:
        if c != partition_col:
            continue
        if op in ("=", "=="):
            if is_null_dir or hive_partition_value(v) != val:
                return False
        elif op == "in":
            if is_null_dir or \
                    val not in {hive_partition_value(x) for x in v}:
                return False
    return True


def _write_sharded(staged_dir: str, cols: list[str],
                   bloom_cols: list[str] | None,
                   by_shard: dict, parent) -> None:
    sdir = os.path.join(staged_dir, _SHARD_DIR)
    os.makedirs(sdir, exist_ok=True)
    parent_sharded = isinstance(parent, ShardedManifest)
    parent_by_shard: dict = {}
    if parent is not None and not parent_sharded:
        # one-time transition from a flat parent: group its entries
        for rel, e in parent.get("files", {}).items():
            parent_by_shard.setdefault(_shard_of(rel), {})[rel] = e
    shards_meta: dict = {}
    for shard, rels in by_shard.items():
        sig = _shard_sig(rels)
        out = os.path.join(sdir, _shard_fname(shard))
        pmeta = parent.shards.get(shard) if parent_sharded else None
        if pmeta is not None and pmeta.get("sig") == sig:
            try:
                # identical file list → inherit the shard VERBATIM as
                # a hardlink: zero parse, zero serialization — the
                # manifest-side twin of the data files' carry
                os.link(parent.shard_path(shard), out)
                shards_meta[shard] = dict(pmeta)
                continue
            except OSError:
                pass  # cross-device / missing: rebuild below
        if parent_sharded and pmeta is not None:
            pfiles = parent.shard_files(shard)
        else:
            pfiles = parent_by_shard.get(shard, {})
        files: dict = {}
        for rel in rels:
            if rel in pfiles:
                files[rel] = pfiles[rel]
            else:
                full = os.path.join(staged_dir, rel)
                entry = file_column_stats(full, cols)
                if bloom_cols:
                    bl = file_blooms(full, bloom_cols)
                    if bl:
                        entry["__bloom__"] = bl
                files[rel] = entry
        with open(out, "w") as fh:
            json.dump({"files": files}, fh)
        meta = {"n": len(rels), "sig": sig}
        if all("__rows__" in e for e in files.values()):
            # exact shard row count from footer metadata — lets the
            # root doc answer COUNT(*) / per-partition counts without
            # opening a single shard (entries inherited from pre-rows
            # manifests may lack it; then the shard just doesn't know)
            meta["rows"] = sum(e["__rows__"] for e in files.values())
        shards_meta[shard] = meta
    root = {"cols": list(cols), "bloom_cols": list(bloom_cols or []),
            "sharded": True, "shards": shards_meta}
    with open(os.path.join(staged_dir, _MANIFEST), "w") as fh:
        json.dump(root, fh)


def write_manifest(staged_dir: str, cols: list[str],
                   parent_dir: str | None,
                   bloom_cols: list[str] | None = None) -> None:
    parent = load_manifest(parent_dir) if parent_dir else None
    by_shard: dict = {}
    for root, dirs, names in os.walk(staged_dir):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for name in names:
            if name.endswith(".parquet"):
                rel = os.path.relpath(os.path.join(root, name),
                                      staged_dir)
                by_shard.setdefault(_shard_of(rel), []).append(rel)
    if set(by_shard) <= {""}:
        # unpartitioned layout: flat single-JSON manifest
        manifest = build_manifest(staged_dir, cols, parent, bloom_cols)
        with open(os.path.join(staged_dir, _MANIFEST), "w") as fh:
            json.dump(manifest, fh)
        return
    _write_sharded(staged_dir, cols, bloom_cols, by_shard, parent)


def load_manifest(version_dir: str | None):
    """The version's manifest: a flat dict (unpartitioned / pre-shard
    format) or a lazy :class:`ShardedManifest`. None when absent or
    structurally incomplete — skipping then degrades to a full
    filtered read, which is always correct."""
    if not version_dir:
        return None
    try:
        with open(os.path.join(version_dir, _MANIFEST)) as fh:
            doc = json.load(fh)
    except OSError:
        return None
    if not doc.get("sharded"):
        return doc
    sdir = os.path.join(version_dir, _SHARD_DIR)
    try:
        have = set(os.listdir(sdir))
    except OSError:
        return None
    if any(_shard_fname(s) not in have for s in doc.get("shards", {})):
        return None  # partial/corrupt: the file list can't be trusted
    return ShardedManifest(version_dir, doc)


def _norm(x) -> tuple | None:
    """Bound-or-literal → ``(unit_tag, comparable_value)`` or None
    when it can't participate in interval pruning. Tags: ``"num"``
    (plain int/float column), ``"str"``, ``"us"`` (temporal, epoch
    micros — stored as ``{"us": n}``, literals as datetime/date).
    ``keeps`` compares two values ONLY when their tags agree; a
    mismatch (including a pre-r11 manifest's untagged epoch int
    against a temporal literal) is incomparable → keep the file —
    never compare epoch days to micros or micros to a plain int
    column again (the r10 ADVICE false-skip)."""
    import datetime as dt
    if isinstance(x, dict):
        return ("us", x["us"]) if set(x) == {"us"} else None
    if isinstance(x, bool):
        return None
    if isinstance(x, (dt.datetime, dt.date)):
        return ("us", _to_epoch(x))
    if isinstance(x, (int, float)):
        return ("num", x)
    if isinstance(x, str):
        return ("str", x)
    return None


def keeps(stats: dict, col: str, op: str, value) -> bool:
    """Can a file with these bounds contain a row satisfying
    ``col op value``? Missing/incomparable bounds → True (keep)."""
    if op not in _OPS:
        raise ValueError(f"unsupported skip operator {op!r} "
                         f"(supported: {_OPS})")
    if op == "in":
        # disjunction: keep iff ANY member might be present. The id-
        # LIST takedown shape — one manifest pass, not one per id.
        return any(keeps(stats, col, "=", v) for v in value)
    if op in ("=", "=="):
        bloom = stats.get("__bloom__", {}).get(col)
        if bloom is not None and not bloom_might_contain(bloom, value):
            return False  # provably absent, regardless of intervals
    bounds = stats.get(col)
    if not bounds:
        return True
    mn, mx, val = _norm(bounds[0]), _norm(bounds[1]), _norm(value)
    if mn is None or mx is None or val is None \
            or mn[0] != val[0] or mx[0] != val[0]:
        return True  # unit/type mismatch → incomparable → keep
    mn, mx, value = mn[1], mx[1], val[1]
    if op == "<":
        return mn < value
    if op == "<=":
        return mn <= value
    if op == ">":
        return mx > value
    if op == ">=":
        return mx >= value
    return mn <= value <= mx  # "=" / "=="


def row_count(manifest) -> int | None:
    """Exact total row count from metadata alone — the manifest's
    file list is authoritative and parquet footer row counts are
    exact, so this is COUNT(*) with zero file scans. None when any
    entry predates row recording (callers fall back to a real
    count)."""
    if isinstance(manifest, ShardedManifest):
        total = 0
        for m in manifest.shards.values():
            r = m.get("rows")
            if r is None:
                return None
            total += r
        return total
    total = 0
    for st in manifest.get("files", {}).values():
        r = st.get("__rows__")
        if r is None:
            return None
        total += r
    return total


def partition_row_counts(manifest) -> list[tuple] | None:
    """``[(partition value STRING, exact rows), ...]`` straight from
    the sharded root doc — ``SELECT pc, COUNT(*) GROUP BY pc`` with
    zero file opens (exact because every row under ``pc=v`` has
    pc = v by layout). The null partition reports value None. None on
    flat manifests, root-level files, or pre-rows shard meta; typed
    reconstruction of the value string is the caller's job."""
    if not isinstance(manifest, ShardedManifest):
        return None
    from urllib.parse import unquote

    from aether_firebase_consumer_spark.sinks.upsert import (
        HIVE_DEFAULT_PARTITION,
    )
    out = []
    for shard, m in sorted(manifest.shards.items()):
        r = m.get("rows")
        if r is None or not shard:
            return None
        _, _, dirval = shard.partition("=")
        val = None if dirval == HIVE_DEFAULT_PARTITION \
            else unquote(dirval)
        out.append((val, r))
    return out


def prune_files(manifest, predicates: list[tuple],
                partition_col: str | None = None) -> tuple[list[str],
                                                           int]:
    """Relpaths whose stats admit the conjunction of
    ``(col, op, value)`` predicates, plus the version's total file
    count. On a :class:`ShardedManifest`, shards whose directory name
    excludes an equality predicate on ``partition_col`` are pruned
    WITHOUT being parsed — a point probe on a 10k-partition table
    parses one shard, not one 1.8 GB document."""
    preds = list(predicates)
    if isinstance(manifest, ShardedManifest):
        kept = []
        for shard in manifest.shards:
            if not _shard_admits(shard, partition_col, preds):
                continue
            kept += [rel for rel, stats
                     in manifest.shard_files(shard).items()
                     if all(keeps(stats, c, op, v)
                            for c, op, v in preds)]
        return sorted(kept), manifest.total_files
    files = manifest.get("files", {})
    kept = [rel for rel, stats in files.items()
            if all(keeps(stats, c, op, v) for c, op, v in preds)]
    return sorted(kept), len(files)
