"""Property-based tests (reference _strategies/ + tests/datasets/test_strategies.py).

Hypothesis generators for SGRID metadata round-trips, padding arithmetic,
time intervals and the 1-D search bracket invariants.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from parcels_tpu import _sgrid as sgrid
from parcels_tpu._strategies import paddings as _paddings, sgrid_metadata
from parcels_tpu._core.timeutils import TimeInterval, timedelta_to_float


@given(sgrid_metadata())
@settings(max_examples=50, deadline=None)
def test_sgrid_metadata_attrs_roundtrip(meta):
    assert sgrid.SGrid2DMetadata.from_attrs(meta.to_attrs()) == meta


@given(st.integers(min_value=2, max_value=10_000), _paddings)
def test_face_node_count_inverse(n_nodes, padding):
    assert sgrid.get_n_nodes(sgrid.get_n_faces(n_nodes, padding), padding) == n_nodes


@given(
    st.integers(min_value=0, max_value=10**9),
    st.integers(min_value=1, max_value=10**9),
)
def test_time_interval_contains_and_length(start_s, length_s):
    left = np.datetime64("2000-01-01", "ns") + np.timedelta64(start_s, "s")
    right = left + np.timedelta64(length_s, "s")
    ti = TimeInterval(left, right)
    assert left in ti and right in ti
    assert ti.time_length_as_flt == float(length_s)
    mid = left + np.timedelta64(length_s // 2, "s")
    assert mid in ti
    assert (left - np.timedelta64(1, "s")) not in ti


@given(
    st.integers(min_value=0, max_value=10**6),
    st.integers(min_value=1, max_value=10**6),
    st.integers(min_value=0, max_value=10**6),
    st.integers(min_value=1, max_value=10**6),
)
def test_time_interval_intersection_commutes(a0, al, b0, bl):
    base = np.datetime64("2000-01-01", "ns")
    t1 = TimeInterval(base + np.timedelta64(a0, "s"), base + np.timedelta64(a0 + al, "s"))
    t2 = TimeInterval(base + np.timedelta64(b0, "s"), base + np.timedelta64(b0 + bl, "s"))
    assert t1.intersection(t2) == t2.intersection(t1)


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=2, max_size=50, unique=True
    ),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
)
@settings(max_examples=100, deadline=None)
def test_search_1d_bracket_invariant(arr, q):
    """Wherever search_1d returns a non-sentinel index, the bracket holds."""
    import jax.numpy as jnp

    from parcels_tpu._core.index_search import search_1d

    arr = np.sort(np.asarray(arr, dtype=np.float64))
    # grid axes are f32 on device: require f32-representable spacing
    if np.any(np.diff(arr.astype(np.float32)) <= 1e-6):
        return
    idx, bc = search_1d(jnp.asarray(arr), jnp.asarray([q]))
    i = int(idx[0])
    if i >= 0:
        assert arr[i] <= q <= arr[i + 1] or np.isclose(q, arr[i]) or np.isclose(q, arr[i + 1])
        assert -1e-6 <= float(bc[0]) <= 1 + 1e-6
    else:
        assert q < arr[0] or q > arr[-1]


@given(st.integers(min_value=-10**8, max_value=10**8))
def test_timedelta_roundtrip(seconds):
    assert timedelta_to_float(np.timedelta64(seconds, "s")) == float(seconds)
