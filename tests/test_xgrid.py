"""XGrid unit tests (reference tests/test_xgrid.py parity tier).

Covers axis discovery from SGRID metadata, staggering offsets from padding,
ravel/unravel round-trips, uniform-spacing detection, and coordinate
validation — the grid plumbing under every structured simulation.
"""

import numpy as np
import pytest

import parcels_tpu._sgrid as sgrid
import parcels_tpu.xrlite as xr
from parcels_tpu import XGrid
from parcels_tpu.datasets import (
    curvilinear_rotated_dataset,
    moving_eddy_dataset,
    peninsula_dataset,
    simple_UV_dataset,
)
from parcels_tpu.datasets.structured import _wrap_sgrid


def test_axes_discovery_3d():
    grid = XGrid(simple_UV_dataset(dims=(4, 3, 8, 10), mesh="flat"), mesh="flat")
    assert grid.axes == ["Z", "Y", "X"]
    assert (grid.zdim, grid.ydim, grid.xdim) == (2, 7, 9)
    assert grid.spec.time_uniform is not None


def test_axes_discovery_2d_no_depth():
    ds = _wrap_sgrid(_base_ds(ydim=4, xdim=5), 5, 4, with_z=False)
    grid = XGrid(ds, mesh="flat")
    assert grid.axes == ["Y", "X"]
    assert grid.zdim == 0


def test_padding_offsets_low_vs_high():
    # _wrap_sgrid puts X on LOW padding always; Y configurable
    ds_low = _wrap_sgrid(
        _base_ds(ydim=8, xdim=10), 10, 8, y_padding=sgrid.Padding.LOW, with_z=False
    )
    ds_high = _wrap_sgrid(
        _base_ds(ydim=8, xdim=10), 10, 8, y_padding=sgrid.Padding.HIGH, with_z=False
    )
    g_low = XGrid(ds_low, mesh="flat")
    g_high = XGrid(ds_high, mesh="flat")
    assert g_low.spec.offset_x == 1
    assert g_low.spec.offset_y == 1
    assert g_high.spec.offset_y == 0  # HIGH padding -> no low-side shift


def _base_ds(ydim, xdim, tdim=2):
    lon = np.linspace(0.0, 1e4, xdim)
    lat = np.linspace(0.0, 1e4, ydim)
    time = np.array([np.timedelta64(i * 3600, "s") for i in range(tdim)])
    return xr.Dataset(
        {
            "U": (["time", "YG", "XG"], np.zeros((tdim, ydim, xdim))),
            "V": (["time", "YG", "XG"], np.zeros((tdim, ydim, xdim))),
        },
        coords={
            "lon": (("XG",), lon, {"units": "m", "axis": "X"}),
            "lat": (("YG",), lat, {"units": "m", "axis": "Y"}),
            "time": (("time",), time, {"axis": "T"}),
        },
    )


def test_ravel_unravel_roundtrip():
    grid = XGrid(simple_UV_dataset(dims=(2, 4, 9, 11), mesh="flat"), mesh="flat")
    rng = np.random.default_rng(3)
    zi = rng.integers(0, grid.zdim, 50)
    yi = rng.integers(0, grid.ydim, 50)
    xi = rng.integers(0, grid.xdim, 50)
    ei = grid.ravel_index(zi, yi, xi)
    z2, y2, x2 = grid.unravel_index(ei)
    np.testing.assert_array_equal(z2, zi)
    np.testing.assert_array_equal(y2, yi)
    np.testing.assert_array_equal(x2, xi)
    # distinct cells map to distinct element indices
    assert len(np.unique(grid.ravel_index(*np.meshgrid(np.arange(grid.zdim), np.arange(grid.ydim), np.arange(grid.xdim), indexing="ij")).ravel())) == grid.zdim * grid.ydim * grid.xdim


def test_uniform_spacing_detected_and_used():
    grid = XGrid(moving_eddy_dataset(xdim=5, ydim=4), mesh="flat")
    assert grid.spec.lon_uniform is not None
    assert grid.spec.lat_uniform is not None
    origin, step, last = grid.spec.lon_uniform
    np.testing.assert_allclose(origin, grid.lon[0])
    np.testing.assert_allclose(step, grid.lon[1] - grid.lon[0])


def test_nonuniform_spacing_not_marked_uniform():
    ds = _base_ds(ydim=6, xdim=8)
    ds.coords["lon"].values[:] = np.array([0, 1, 2, 4, 8, 16, 32, 64], float)
    ds = _wrap_sgrid(ds, 8, 6, with_z=False)
    grid = XGrid(ds, mesh="flat")
    assert grid.spec.lon_uniform is None


def test_depth_must_increase():
    ds = simple_UV_dataset(dims=(2, 3, 6, 6), mesh="flat")
    ds.coords["depth"].values[:] = ds.coords["depth"].values[::-1]
    with pytest.raises(ValueError, match="[Dd]epth"):
        XGrid(ds, mesh="flat")


def test_curvilinear_grid_builds_lookup():
    grid = XGrid(curvilinear_rotated_dataset(), mesh="flat")
    assert grid.spec.curvilinear
    assert grid.spec.has_lookup
    assert grid.lon.ndim == 2


def test_cgrid_peninsula_metadata():
    ds = peninsula_dataset(grid_type="C")
    grid = XGrid(ds, mesh="flat")
    # C-grid: U and V live on different dims than the tracer points
    assert set(ds["U"].dims) != set(ds["V"].dims)
    assert grid.xdim > 0 and grid.ydim > 0


def test_spherical_mesh_deg2m():
    grid = XGrid(simple_UV_dataset(dims=(2, 2, 6, 6), mesh="spherical"), mesh="spherical")
    assert grid.spec.spherical
    np.testing.assert_allclose(grid.deg2m, 6_366_707 * np.pi / 180.0, rtol=1e-6)


def test_time_values_are_seconds_from_interval_start():
    grid = XGrid(moving_eddy_dataset(), mesh="flat")
    assert grid.time[0] == 0.0
    assert np.all(np.diff(grid.time) > 0)
    assert grid.time.dtype == np.float64


def test_localize_padding_variants():
    """Reference localize semantics across padding layouts
    (reference tests/test_xgrid.py:295-335, xgrid.py:233-281).

    At the exact origin node (bcoord 0 on every axis), a variable on a
    face dim localizes to bcoord 0.5 with the index shifted per padding:
    HIGH (MITgcm 'left') keeps borrowed index -1; LOW (NEMO 'right')
    cancels the borrow to index 0."""
    from parcels_tpu import FieldSet
    from parcels_tpu.datasets import padded_variant_dataset

    for variant, exp_idx in (("left", -1), ("right", 0)):
        ds = padded_variant_dataset(variant)
        fs = FieldSet.from_sgrid_conventions(
            ds, mesh="flat", vector_fields={"UV": ("U_A_grid", "V_A_grid")}
        )
        grid = fs._gridset[0]
        pos = grid.search(0.0, 0.0, 0.0)
        # V_C_grid lives on (ZG, YG, XC): only X is face-placed
        loc = grid.localize({ax: (int(p["index"][0]), float(p["bcoord"][0]))
                             for ax, p in pos.items()}, ("time", "ZG", "YG", "XC"))
        assert loc["XC"] == (exp_idx, 0.5), (variant, loc)
        assert loc["YG"] == (0, 0.0)
        assert loc["ZG"] == (0, 0.0)
        # U_C_grid: only Y is face-placed
        loc_u = grid.localize({ax: (int(p["index"][0]), float(p["bcoord"][0]))
                               for ax, p in pos.items()}, ("time", "ZG", "YC", "XG"))
        assert loc_u["YC"] == (exp_idx, 0.5), (variant, loc_u)
        assert loc_u["XG"] == (0, 0.0)


def test_localize_interior_point_and_arrays():
    from parcels_tpu import FieldSet
    from parcels_tpu.datasets import padded_variant_dataset

    ds = padded_variant_dataset("right", dx=1000.0)
    fs = FieldSet.from_sgrid_conventions(
        ds, mesh="flat", vector_fields={"UV": ("U_A_grid", "V_A_grid")}
    )
    grid = fs._gridset[0]
    pos = grid.search(0.0, 3250.0, 2750.0)  # cell (3, 2), bcoords (0.25, 0.75)
    loc = grid.localize(pos, ("ZG", "YC", "XC"))
    yi, yb = loc["YC"]
    xi, xb = loc["XC"]
    # face frame: bcoord-0.5 (borrow when negative) then +1 for LOW padding
    np.testing.assert_allclose(yb, 0.75, atol=1e-6)  # 0.25-0.5 -> borrow -> 0.75, idx 3-1+1=3
    np.testing.assert_array_equal(yi, 3)
    np.testing.assert_allclose(xb, 0.25, atol=1e-6)  # 0.75-0.5 -> 0.25, idx 2+1=3
    np.testing.assert_array_equal(xi, 3)
