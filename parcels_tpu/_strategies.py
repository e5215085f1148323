"""Hypothesis strategies for property-based testing (reference _strategies/).

Public so downstream users can property-test their own pipelines, mirroring
the reference's ``parcels._strategies`` package (sgrid.py:11, time.py:29-58).
"""

from __future__ import annotations

import numpy as np

try:
    from hypothesis import strategies as st
except ImportError as e:  # pragma: no cover
    raise ImportError("parcels_tpu._strategies requires the 'hypothesis' package") from e

from parcels_tpu import _sgrid as sgrid
from parcels_tpu._core.timeutils import TimeInterval

__all__ = ["paddings", "sgrid_metadata", "time_intervals"]

_dim_names = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu"), max_codepoint=122),
    min_size=1,
    max_size=8,
).filter(str.isidentifier)

paddings = st.sampled_from(list(sgrid.Padding))


@st.composite
def sgrid_metadata(draw):
    """Random valid SGrid2DMetadata with unique dimension names."""
    names = draw(st.lists(_dim_names, min_size=7, max_size=7, unique=True))
    xn, yn, xf, yf, zn, zf, cx = names
    return sgrid.SGrid2DMetadata(
        node_dimensions=(xn, yn),
        node_coordinates=(cx, cx + "y"),
        face_dimensions=(
            sgrid.FaceNodePadding(xf, xn, draw(paddings)),
            sgrid.FaceNodePadding(yf, yn, draw(paddings)),
        ),
        vertical_dimensions=(sgrid.FaceNodePadding(zf, zn, draw(paddings)),),
    )


@st.composite
def time_intervals(draw, max_start_s: int = 10**9, max_length_s: int = 10**9):
    """Random TimeInterval over np.datetime64 nanoseconds."""
    start = draw(st.integers(min_value=0, max_value=max_start_s))
    length = draw(st.integers(min_value=1, max_value=max_length_s))
    left = np.datetime64("2000-01-01", "ns") + np.timedelta64(start, "s")
    return TimeInterval(left, left + np.timedelta64(length, "s"))
