"""Property tests for the data-skipping decision logic (round 10):
the ONE invariant that must never break is no-false-skip — a file
whose rows contain a predicate match is never pruned. Wrong skips
silently drop rows from read_where/delete_where; wrong keeps only
cost I/O. Pure-Python (the decision layer is), so hypothesis can
hammer it."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from aether_firebase_consumer_spark.sinks.stats import (
    _scalar,
    _to_epoch,
    build_bloom,
    bloom_might_contain,
    keeps,
)

_OPS = ["<", "<=", ">", ">=", "="]


def _matches(v, op, lit):
    if v is None:
        return False
    try:
        return {"<": v < lit, "<=": v <= lit, ">": v > lit,
                ">=": v >= lit, "=": v == lit}[op]
    except TypeError:
        return False


ints = st.integers(min_value=-10**12, max_value=10**12)
strs = st.text(min_size=0, max_size=40)


@settings(max_examples=300, deadline=None)
@given(st.lists(ints, min_size=1, max_size=50), _ops := st.sampled_from(_OPS), ints)
def test_interval_never_false_skips_ints(values, op, lit):
    stats = {"c": [min(values), max(values)]}
    if any(_matches(v, op, lit) for v in values):
        assert keeps(stats, "c", op, lit)


@settings(max_examples=300, deadline=None)
@given(st.lists(strs, min_size=1, max_size=30), st.sampled_from(_OPS), strs)
def test_interval_never_false_skips_strings(values, op, lit):
    # the manifest layer drops >=64-char bounds itself; here we model
    # the decision on trusted bounds only
    stats = {"c": [min(values), max(values)]}
    if any(_matches(v, op, lit) for v in values):
        assert keeps(stats, "c", op, lit)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.one_of(ints, strs, st.none()),
                min_size=1, max_size=60),
       st.one_of(ints, strs))
def test_bloom_never_false_negative(values, probe):
    bloom = build_bloom(values)
    if bloom is None:
        return  # unbloomable contents → whole-file keep upstream
    if probe in [v for v in values if v is not None]:
        assert bloom_might_contain(bloom, probe)
    # bloom consulted through keeps(): present value always kept
    stats = {"__bloom__": {"c": bloom}}
    for v in values:
        if v is not None:
            assert keeps(stats, "c", "=", v)


@settings(max_examples=200, deadline=None)
@given(st.datetimes(min_value=dt.datetime(1901, 1, 1),
                    max_value=dt.datetime(2200, 1, 1)),
       st.datetimes(min_value=dt.datetime(1901, 1, 1),
                    max_value=dt.datetime(2200, 1, 1)))
def test_epoch_mapping_is_order_isomorphic(a, b):
    ea, eb = _to_epoch(a), _to_epoch(b)
    assert isinstance(ea, int) and isinstance(eb, int)
    assert (a < b) == (ea < eb) and (a == b) == (ea == eb)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.datetimes(min_value=dt.datetime(1970, 1, 2),
                             max_value=dt.datetime(2100, 1, 1)),
                min_size=1, max_size=40),
       st.sampled_from(_OPS),
       st.datetimes(min_value=dt.datetime(1970, 1, 2),
                    max_value=dt.datetime(2100, 1, 1)))
def test_timestamp_interval_never_false_skips(values, op, lit):
    # _scalar models what the manifest actually stores: unit-tagged
    # {"us": micros} bounds
    stats = {"c": [_scalar(min(values)), _scalar(max(values))]}
    if any(_matches(v, op, lit) for v in values):
        assert keeps(stats, "c", op, lit)


def _promote(v):
    """Spark's date→timestamp coercion for a mixed comparison: a date
    is its midnight instant."""
    if isinstance(v, dt.datetime):
        return v
    return dt.datetime(v.year, v.month, v.day)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.one_of(
           st.dates(min_value=dt.date(1970, 1, 2),
                    max_value=dt.date(2100, 1, 1)),
           st.datetimes(min_value=dt.datetime(1970, 1, 2),
                        max_value=dt.datetime(2100, 1, 1))),
           min_size=1, max_size=40),
       st.sampled_from(_OPS),
       st.one_of(
           st.dates(min_value=dt.date(1970, 1, 2),
                    max_value=dt.date(2100, 1, 1)),
           st.datetimes(min_value=dt.datetime(1970, 1, 2),
                        max_value=dt.datetime(2100, 1, 1))))
def test_cross_typed_temporal_never_false_skips(values, op, lit):
    """The r10 ADVICE defect: a date literal against a timestamp
    column (or vice versa) compared epoch DAYS to epoch MICROS and
    could false-skip. Bounds and literals now share one micros scale,
    so pruning agrees with Spark's date→timestamp promotion for every
    type mixture. (A homogeneous-date column vs a datetime literal
    exercises the date-bounds-as-micros path; mixtures model a column
    plus a differently-typed literal.)"""
    vals = [_promote(v) for v in values]
    plit = _promote(lit)
    stats = {"c": [_scalar(min(vals)), _scalar(max(vals))]}
    if any(_matches(v, op, plit) for v in vals):
        assert keeps(stats, "c", op, lit)


def test_legacy_untagged_epoch_bounds_always_keep():
    """A pre-r11 manifest stored temporal bounds as PLAIN ints (days
    or micros) — indistinguishable from an int column's bounds, so a
    temporal literal must never be compared against them (either unit
    guess can false-skip). Tag mismatch → keep."""
    legacy_days = {"c": [19_700, 19_710]}            # epoch days
    legacy_us = {"c": [1_700_000_000_000_000, 1_700_086_400_000_000]}
    for stats in (legacy_days, legacy_us):
        for lit in (dt.date(2023, 12, 15),
                    dt.datetime(2023, 12, 15, 12, 0, 0)):
            for op in _OPS:
                assert keeps(stats, "c", op, lit)
    # and the converse: tagged temporal bounds vs a plain-int literal
    tagged = {"c": [{"us": 0}, {"us": 86_400_000_000}]}
    for op in _OPS:
        assert keeps(tagged, "c", op, 5)


def test_int_str_never_alias_in_bloom():
    """Type tags: a bloom over ints can say "absent" for the string
    form and vice versa — but never falsely for the same-typed
    value."""
    bloom = build_bloom([5, 17, 239])
    assert bloom_might_contain(bloom, 5)
    assert bloom_might_contain(bloom, 17)
    sbloom = build_bloom(["5", "17"])
    assert bloom_might_contain(sbloom, "5")


@settings(max_examples=300, deadline=None)
@given(st.lists(ints, min_size=1, max_size=50),
       st.lists(ints, min_size=0, max_size=8))
def test_in_list_never_false_skips(values, probes):
    stats = {"c": [min(values), max(values)]}
    bloom = build_bloom(values)
    if bloom is not None:
        stats["__bloom__"] = {"c": bloom}
    if any(v in probes for v in values):
        assert keeps(stats, "c", "in", probes)
