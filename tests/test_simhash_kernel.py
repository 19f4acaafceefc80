"""Property tests for the pure-pandas simhash64 kernel (no Spark session).

The Spark path wraps this kernel in an Arrow-batched pandas_udf; the DuckDB
oracle recomputes it from md5 bytes — so the kernel's algebraic properties
(order invariance, multiset-duplication invariance, single-token identity)
are exactly what keeps the two engines' signatures byte-equal on any corpus,
not just the fixtures."""

from __future__ import annotations

import hashlib

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from cognee_spark.operators.dedup import simhash64 as _simhash64_udf

# the raw Arrow-batch kernel behind the pandas_udf — callable without a
# SparkContext (the udf wrapper only adds the executor-side plumbing)
simhash64 = _simhash64_udf.func

# no whitespace (tokens), no lone surrogates (Cs): Arrow string columns are
# valid UTF-8, so a surrogate can never reach the kernel from a Spark plan
token = st.text(
    alphabet=st.characters(blacklist_categories=("Zs", "Zl", "Zp", "Cc", "Cs")),
    min_size=1,
    max_size=8,
)
token_lists = st.lists(token, min_size=0, max_size=30)


def _sig(text: str) -> int:
    return int(simhash64(pd.Series([text])).iloc[0])


@settings(max_examples=60, deadline=None)
@given(token_lists)
def test_signature_is_signed64_and_deterministic(tokens):
    text = " ".join(tokens)
    s1, s2 = _sig(text), _sig(text)
    assert s1 == s2
    assert -(1 << 63) <= s1 < (1 << 63)


@settings(max_examples=60, deadline=None)
@given(token_lists, st.randoms(use_true_random=False))
def test_token_order_invariance(tokens, rnd):
    shuffled = list(tokens)
    rnd.shuffle(shuffled)
    assert _sig(" ".join(tokens)) == _sig(" ".join(shuffled))


@settings(max_examples=60, deadline=None)
@given(token_lists)
def test_uniform_duplication_invariance(tokens):
    # doubling every token doubles both `ones` and `n`, so the per-bit
    # majority 2*ones > n is unchanged — SimHash is a multiset-ratio vote
    assert _sig(" ".join(tokens)) == _sig(" ".join(tokens + tokens))


@settings(max_examples=60, deadline=None)
@given(token)
def test_single_token_signature_is_its_md5_prefix(t):
    # one token: every bit's majority is that token's own bit, so the
    # signature IS the first 8 md5 bytes big-endian (as a signed long) —
    # the identity the DuckDB oracle's hash step relies on
    v = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
    expected = v - (1 << 64) if v >= 1 << 63 else v
    assert _sig(t) == expected


def test_empty_and_whitespace_only_are_zero():
    assert _sig("") == 0
    assert _sig("   \t  ") == 0
    assert int(simhash64(pd.Series([None])).iloc[0]) == 0
