"""Property-based differential tests (hypothesis) for the string-sim kernels.

The numpy Arrow-batch kernels in ``functions/jw_numpy`` claim bit-identical
results to the scalar reference implementations in ``functions/sim``
(``jaro_winkler_py`` / ``monge_elkan_py``, simfunc.cc:318-412 semantics).
Hypothesis hammers that claim over arbitrary unicode — including spaces
(Monge-Elkan token splits), astral code points (forces the uint32 path),
empties, and strings that straddle the ``VEC_MAX_LEN`` scalar-fallback
boundary — plus batch-composition invariance: a row's score must not
depend on what else shares its Arrow batch (padding width, dtype choice).

Pure-Python/numpy: no SparkSession, so the suite is cheap and deterministic.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from entityblockingbysimilarityjoins_spark.functions.jw_numpy import (
    VEC_MAX_LEN,
    jw_batch,
    monge_elkan_batch,
)
from entityblockingbysimilarityjoins_spark.functions.sim import (
    jaro_winkler_py,
    monge_elkan_py,
)

# ascii + spaces + punctuation + diacritics + CJK + an astral emoji
# (U+1F600 forces the uint32 code-matrix path; " " exercises ME splits)
_ALPHA = st.one_of(
    st.characters(min_codepoint=32, max_codepoint=126),
    st.sampled_from("  日本語中文한éüßß\U0001f600"),
)
text = st.text(alphabet=_ALPHA, max_size=40)
# short alphabet -> frequent partial matches / transpositions / shared prefixes
clash = st.text(alphabet="ab c", max_size=12)


@settings(max_examples=300, deadline=None)
@given(st.one_of(text, clash), st.one_of(text, clash))
def test_jw_batch_equals_scalar(a: str, b: str) -> None:
    assert jw_batch([a], [b])[0] == jaro_winkler_py(a, b)


@settings(max_examples=200, deadline=None)
@given(st.one_of(text, clash), st.one_of(text, clash))
def test_monge_elkan_batch_equals_scalar(a: str, b: str) -> None:
    assert monge_elkan_batch([a], [b])[0] == monge_elkan_py(a, b)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(text, text), min_size=1, max_size=16))
def test_jw_batch_composition_invariance(pairs: list[tuple[str, str]]) -> None:
    """Padding width / dtype are batch-global; scores must not be."""
    got = jw_batch([a for a, _ in pairs], [b for _, b in pairs])
    want = np.array([jaro_winkler_py(a, b) for a, b in pairs])
    assert np.array_equal(got, want)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(text, text), min_size=1, max_size=8))
def test_monge_elkan_batch_composition_invariance(pairs) -> None:
    got = monge_elkan_batch([a for a, _ in pairs], [b for _, b in pairs])
    want = np.array([monge_elkan_py(a, b) for a, b in pairs])
    assert np.array_equal(got, want)


@settings(max_examples=30, deadline=None)
@given(
    st.text(alphabet="abc", min_size=VEC_MAX_LEN - 2, max_size=VEC_MAX_LEN + 8),
    st.text(alphabet="abc", min_size=VEC_MAX_LEN - 2, max_size=VEC_MAX_LEN + 8),
)
def test_jw_scalar_fallback_boundary(a: str, b: str) -> None:
    """Rows longer than VEC_MAX_LEN take the scalar fallback inside the
    batch kernel; both sides of the boundary must agree with the oracle."""
    assert jw_batch([a], [b])[0] == jaro_winkler_py(a, b)
    # mixed batch: one vectorizable row + one fallback row
    got = jw_batch([a, "abc"], [b, "acb"])
    assert got[0] == jaro_winkler_py(a, b)
    assert got[1] == jaro_winkler_py("abc", "acb")


@settings(max_examples=200, deadline=None)
@given(st.one_of(text, clash), st.one_of(text, clash))
def test_jw_metamorphic(a: str, b: str) -> None:
    """JW is symmetric, bounded in [0,1], 1.0 on equal non-empty inputs,
    0.0 when either side is empty (simfunc.cc join-time convention)."""
    w = jaro_winkler_py(a, b)
    assert 0.0 <= w <= 1.0
    assert w == jaro_winkler_py(b, a)
    if a and a == b:
        assert w == 1.0
    if not a or not b:
        assert w == 0.0
