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
    stats = {"c": [_to_epoch(min(values)), _to_epoch(max(values))]}
    if any(_matches(v, op, lit) for v in values):
        assert keeps(stats, "c", op, lit)


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
