"""Property tests for the shared Misra-Gries kernel (functions/mg.py):
the textbook guarantees must hold for ANY stream, since both the batch
heavy_hitters sketch pass and the windowed streaming monitor ride on
them."""

import collections

from hypothesis import given, settings, strategies as st

from great_expectations_spark.functions.mg import mg_update

_streams = st.lists(
    st.sampled_from([f"w{i}" for i in range(40)]), max_size=2000
)
_caps = st.integers(min_value=1, max_value=12)


@given(_streams, _caps)
@settings(max_examples=200, deadline=None)
def test_mg_invariants(stream, capacity):
    counters: dict = {}
    mg_update(counters, stream, capacity)
    exact = collections.Counter(stream)
    n = len(stream)
    # size bound
    assert len(counters) <= capacity
    # every stored count is a lower bound, off by at most n/capacity
    for w, c in counters.items():
        assert 1 <= c <= exact[w]
        assert exact[w] - c <= n / capacity
    # heavy-hitter containment: count > n/capacity => present
    for w, c in exact.items():
        if c > n / capacity:
            assert w in counters, (w, c, n, capacity)


@given(_streams, st.integers(min_value=1, max_value=50))
@settings(max_examples=100, deadline=None)
def test_mg_exact_when_vocab_fits(stream, extra_capacity):
    # capacity >= observed vocabulary: no decrement ever fires, so the
    # summary IS the exact counter (the regime the batch oracle and
    # the streaming exactness tests rely on)
    exact = collections.Counter(stream)
    counters: dict = {}
    mg_update(counters, stream, len(exact) + extra_capacity)
    assert counters == dict(exact)


@given(_streams, _caps, st.integers(min_value=0, max_value=2000))
@settings(max_examples=100, deadline=None)
def test_mg_incremental_equals_one_shot(stream, capacity, split):
    # feeding a stream in two calls == one call (the property that
    # lets the streaming monitor fold micro-batches into one state)
    split = min(split, len(stream))
    a: dict = {}
    mg_update(a, stream[:split], capacity)
    mg_update(a, stream[split:], capacity)
    b: dict = {}
    mg_update(b, stream, capacity)
    assert a == b
