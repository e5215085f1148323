"""Curvilinear grid search + advection validation.

Mirrors the reference's curvilinear tier (reference test_xgrid.py cell
search + NEMO curvilinear golden trajectories): a rotated rectilinear grid
gives genuinely 2-D lon/lat with closed-form trajectories, exercising the
warm-start point-in-cell check, the raster-seeded cold start, and the
directed cell walk (index_search.curvilinear_search).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from parcels_tpu import FieldSet, ParticleSet
from parcels_tpu import xrlite as xr
from parcels_tpu.datasets.structured import _wrap_sgrid, curvilinear_rotated_dataset
from parcels_tpu.kernels import AdvectionEE, AdvectionRK4


def test_cold_start_search_finds_cells():
    ds = curvilinear_rotated_dataset()
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    grid = fs.gridset[0]
    assert grid.spec.curvilinear
    view = grid.make_view(grid.device_arrays())

    # query points generated INSIDE the rotated grid by construction
    rng = np.random.default_rng(5)
    th = np.deg2rad(30.0)
    gx = rng.uniform(2000, 55000, 100)
    gy = rng.uniform(2000, 35000, 100)
    x = np.cos(th) * gx - np.sin(th) * gy
    y = np.sin(th) * gx + np.cos(th) * gy

    gpos = view.search(
        jnp.zeros(100, jnp.float32),
        jnp.asarray(y, dtype=jnp.float32),
        jnp.asarray(x, dtype=jnp.float32),
    )
    yi = np.asarray(gpos["Y"]["index"])
    xi = np.asarray(gpos["X"]["index"])
    assert (yi >= 0).all() and (xi >= 0).all()
    # the continuous cell coordinate (index + bcoord) must reconstruct the
    # analytic pre-rotation position (points on edges may land in either
    # neighbor cell, so exact integer equality is not required)
    xsi = np.asarray(gpos["X"]["bcoord"])
    eta = np.asarray(gpos["Y"]["bcoord"])
    np.testing.assert_allclose((xi + xsi) * 1000.0, gx, atol=2.0)
    np.testing.assert_allclose((yi + eta) * 1000.0, gy, atol=2.0)


def test_uniform_flow_advection_on_curvilinear_grid():
    """Uniform eastward flow: straight-line trajectories through the rotated
    grid, crossing many cells (warm-start + walk under jit)."""
    ds = curvilinear_rotated_dataset()
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    th = np.deg2rad(30.0)
    gx = np.array([5000.0, 20000.0])
    gy = np.array([10000.0, 25000.0])
    x0 = np.cos(th) * gx - np.sin(th) * gy
    y0 = np.sin(th) * gx + np.cos(th) * gy
    pset = ParticleSet(fs, x=x0.copy(), y=y0.copy(), t=[0.0, 0.0])
    pset.execute(AdvectionRK4, dt=np.timedelta64(5, "m"), runtime=np.timedelta64(4, "h"))
    np.testing.assert_allclose(pset.x, x0 + 4 * 3600.0, rtol=1e-5)
    np.testing.assert_allclose(pset.y, y0, atol=0.5)


def test_out_of_grid_flags_oob():
    from parcels_tpu import FieldOutOfBoundError, GridSearchingError

    ds = curvilinear_rotated_dataset()
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    # start near the east edge; uniform u pushes it out of the rotated grid
    th = np.deg2rad(30.0)
    x0 = np.cos(th) * 58000 - np.sin(th) * 20000
    y0 = np.sin(th) * 58000 + np.cos(th) * 20000
    pset = ParticleSet(fs, x=[x0], y=[y0], t=[0.0])
    with pytest.raises((FieldOutOfBoundError, GridSearchingError)):
        pset.execute(AdvectionEE, dt=np.timedelta64(30, "m"), runtime=np.timedelta64(1, "D"))


def test_spherical_curvilinear_search():
    ds = curvilinear_rotated_dataset(mesh="spherical")
    fs = FieldSet.from_sgrid_conventions(ds)
    grid = fs.gridset[0]
    assert grid.spec.spherical and grid.spec.curvilinear
    view = grid.make_view(grid.device_arrays())
    th = np.deg2rad(30.0)
    # mid-cell points (edge-exact queries may legitimately land either side)
    gx, gy = np.array([1.012, 2.031]), np.array([0.722, 1.118])
    x = np.cos(th) * gx - np.sin(th) * gy + 2.0
    y = np.sin(th) * gx + np.cos(th) * gy + 45.0
    gpos = view.search(
        jnp.zeros(2, jnp.float32), jnp.asarray(y, jnp.float32), jnp.asarray(x, jnp.float32)
    )
    xi = np.asarray(gpos["X"]["index"])
    yi = np.asarray(gpos["Y"]["index"])
    np.testing.assert_array_equal(xi, (gx / 0.05).astype(int))
    np.testing.assert_array_equal(yi, (gy / 0.05).astype(int))


def test_cgrid_velocity_on_curvilinear_grid():
    """C-grid fluxes on a rotated 2-D grid: uniform flux through x-faces is a
    physical velocity along the grid's (rotated) x-direction."""
    from parcels_tpu import _sgrid as sgrid
    from parcels_tpu import xrlite as xr

    xdim, ydim, s = 40, 30, 1000.0
    th = np.deg2rad(30.0)
    xg, yg = np.meshgrid(np.arange(xdim) * s, np.arange(ydim) * s)
    lon2d = np.cos(th) * xg - np.sin(th) * yg
    lat2d = np.sin(th) * xg + np.cos(th) * yg

    u0 = 1.0  # m/s through the x-faces, uniform
    U = np.full((2, 1, ydim, xdim), u0, np.float32)
    V = np.zeros((2, 1, ydim, xdim), np.float32)
    time = np.array([np.timedelta64(0, "s"), np.timedelta64(10, "D")])
    ds = xr.Dataset(
        {"U": (["time", "depth", "YG", "XC"], U), "V": (["time", "depth", "YC", "XG"], V)},
        coords={
            "time": (["time"], time, {"axis": "T"}),
            "depth": (["depth"], np.array([0.0]), {"axis": "Z"}),
            "YC": (["YC"], np.arange(ydim) - 0.5, {"axis": "Y"}),
            "YG": (["YG"], np.arange(ydim, dtype=np.float64), {"axis": "Y"}),
            "XC": (["XC"], np.arange(xdim) - 0.5, {"axis": "X"}),
            "XG": (["XG"], np.arange(xdim, dtype=np.float64), {"axis": "X"}),
            "lat": (["YG", "XG"], lat2d, {"axis": "Y", "units": "m"}),
            "lon": (["YG", "XG"], lon2d, {"axis": "X", "units": "m"}),
        },
    )
    meta = sgrid.SGrid2DMetadata(
        node_dimensions=("XG", "YG"),
        node_coordinates=("lon", "lat"),
        face_dimensions=(
            sgrid.FaceNodePadding("XC", "XG", sgrid.Padding.LOW),
            sgrid.FaceNodePadding("YC", "YG", sgrid.Padding.LOW),
        ),
        vertical_dimensions=(sgrid.FaceNodePadding("ZC", "depth", sgrid.Padding.BOTH),),
    )
    ds = sgrid.attach_sgrid_metadata(ds, meta)
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    from parcels_tpu import CGrid_Velocity

    assert isinstance(fs.fields["UV"].interp_method, CGrid_Velocity)

    gx, gy = np.array([5000.0, 12000.0]), np.array([8000.0, 20000.0])
    x0 = np.cos(th) * gx - np.sin(th) * gy
    y0 = np.sin(th) * gx + np.cos(th) * gy
    pset = ParticleSet(fs, x=x0.copy(), y=y0.copy(), t=[0.0, 0.0])
    runtime = 4 * 3600
    pset.execute(AdvectionRK4, dt=np.timedelta64(5, "m"), runtime=np.timedelta64(runtime, "s"))
    # displacement u0*t along the rotated +x direction
    np.testing.assert_allclose(pset.x, x0 + np.cos(th) * u0 * runtime, rtol=1e-4)
    np.testing.assert_allclose(pset.y, y0 + np.sin(th) * u0 * runtime, rtol=1e-4)


def test_antimeridian_curvilinear_search_and_advection():
    """Cells straddling the 180-degree meridian (wrapped lon storage): both
    search and cross-seam advection must be seam-transparent (reference
    index_search.py:171-239 tangent-plane projection is 360-periodic)."""
    xdim, ydim, sp = 20, 10, 0.4
    xg, yg = np.meshgrid(np.arange(xdim) * sp, np.arange(ydim) * sp)
    lon2d = 176.0 + xg  # 176 .. 183.6 across the seam
    lon2d = np.where(lon2d > 180.0, lon2d - 360.0, lon2d)
    lat2d = 45.0 + yg
    U = np.ones((2, 1, ydim, xdim), np.float32)
    V = np.zeros((2, 1, ydim, xdim), np.float32)
    time = np.array([np.timedelta64(0, "s"), np.timedelta64(10, "D")])
    ds = xr.Dataset(
        {"U": (["time", "depth", "YG", "XG"], U), "V": (["time", "depth", "YG", "XG"], V)},
        coords={
            "time": (["time"], time, {"axis": "T"}),
            "depth": (["depth"], np.array([0.0]), {"axis": "Z"}),
            "YC": (["YC"], np.arange(ydim) + 0.5, {"axis": "Y"}),
            "YG": (["YG"], np.arange(ydim, dtype=np.float64), {"axis": "Y"}),
            "XC": (["XC"], np.arange(xdim) + 0.5, {"axis": "X"}),
            "XG": (["XG"], np.arange(xdim, dtype=np.float64), {"axis": "X"}),
            "lat": (["YG", "XG"], lat2d, {"axis": "Y", "units": "degrees_north"}),
            "lon": (["YG", "XG"], lon2d, {"axis": "X", "units": "degrees_east"}),
        },
    )
    ds = _wrap_sgrid(ds, xdim, ydim)
    fs = FieldSet.from_sgrid_conventions(ds)
    grid = fs.gridset[0]
    view = grid.make_view(grid.device_arrays())

    qx = np.array([179.8, -179.8], np.float32)  # one cell west / east of the seam
    qy = np.array([45.2, 45.2], np.float32)
    gpos = view.search(jnp.zeros(2, jnp.float32), jnp.asarray(qy), jnp.asarray(qx))
    np.testing.assert_array_equal(np.asarray(gpos["X"]["index"]), [9, 10])
    np.testing.assert_array_equal(np.asarray(gpos["Y"]["index"]), [0, 0])

    # advect eastward across the seam: uniform u=1 m/s at 45.2N for 1 day
    from parcels_tpu._core.mesh import EARTH_RADIUS

    pset = ParticleSet(fs, x=[179.8], y=[45.2], t=[np.timedelta64(0, "s")])
    pset.execute(AdvectionRK4, dt=np.timedelta64(10, "m"), runtime=np.timedelta64(1, "D"))
    deg_per_day = 86400.0 / (EARTH_RADIUS * np.pi / 180.0 * np.cos(np.deg2rad(45.2)))
    expected = 179.8 + deg_per_day
    x_end = float(pset.x[0])
    x_end_wrapped = x_end if x_end <= 180 else x_end - 360.0
    exp_wrapped = expected if expected <= 180 else expected - 360.0
    assert expected > 180.0, "flow must actually cross the seam"
    np.testing.assert_allclose(x_end_wrapped, exp_wrapped, atol=5e-3)
    assert float(pset.y[0]) == pytest.approx(45.2, abs=1e-3)


def test_near_pole_curvilinear_search():
    """High-latitude (89.9N) curvilinear search: the tangent-plane bilinear
    inverse must stay well-conditioned near the pole (reference
    index_search.py:171-239)."""
    xdim, ydim = 36, 8
    lon1d = np.linspace(-180, 170, xdim)
    lat1d = np.linspace(89.0, 89.9, ydim)
    lon2d, lat2d = np.meshgrid(lon1d, lat1d)
    U = np.ones((2, 1, ydim, xdim), np.float32)
    V = np.zeros((2, 1, ydim, xdim), np.float32)
    time = np.array([np.timedelta64(0, "s"), np.timedelta64(10, "D")])
    ds = xr.Dataset(
        {"U": (["time", "depth", "YG", "XG"], U), "V": (["time", "depth", "YG", "XG"], V)},
        coords={
            "time": (["time"], time, {"axis": "T"}),
            "depth": (["depth"], np.array([0.0]), {"axis": "Z"}),
            "YC": (["YC"], np.arange(ydim) + 0.5, {"axis": "Y"}),
            "YG": (["YG"], np.arange(ydim, dtype=np.float64), {"axis": "Y"}),
            "XC": (["XC"], np.arange(xdim) + 0.5, {"axis": "X"}),
            "XG": (["XG"], np.arange(xdim, dtype=np.float64), {"axis": "X"}),
            "lat": (["YG", "XG"], lat2d, {"axis": "Y", "units": "degrees_north"}),
            "lon": (["YG", "XG"], lon2d, {"axis": "X", "units": "degrees_east"}),
        },
    )
    ds = _wrap_sgrid(ds, xdim, ydim)
    fs = FieldSet.from_sgrid_conventions(ds)
    grid = fs.gridset[0]
    view = grid.make_view(grid.device_arrays())
    qx = np.array([5.1, -100.0], np.float32)
    qy = np.array([89.85, 89.15], np.float32)
    gpos = view.search(jnp.zeros(2, jnp.float32), jnp.asarray(qy), jnp.asarray(qx))
    np.testing.assert_array_equal(
        np.asarray(gpos["X"]["index"]), np.floor((qx + 180) / (350 / 35)).astype(int)
    )
    np.testing.assert_array_equal(
        np.asarray(gpos["Y"]["index"]), np.floor((qy - 89.0) / (0.9 / 7)).astype(int)
    )


def test_edge_oscillation_rescued():
    """A point riding a cell edge whose f32 local coords compute fractionally
    outside BOTH neighbouring cells must not error out of the walk.

    Regression: on the MOi-shaped global grid, lane (-106.19034, 29.881557)
    computed xsi = 1.000018 in cell 40 and xsi = -2.0e-5 in cell 41 and
    oscillated to GRID_SEARCH_ERROR under the old 1e-5 acceptance margin."""
    import jax.numpy as jnp

    from parcels_tpu._core import index_search as isr
    from parcels_tpu.datasets import moi_like_fieldset

    fs = moi_like_fieldset(xdim=200, ydim=150, zdim=4, u=0.1, v=0.0)
    g = fs._gridset[0]
    garrs = g.device_arrays(np.float32)
    lon2d, lat2d = garrs["lon"], garrs["lat"]

    # the original failing lane plus points exactly on node lines
    lon_nodes = np.asarray(g.lon)
    lat_nodes = np.asarray(g.lat)
    xs = [np.float32(-106.19034)] + [np.float32(lon_nodes[60, i]) for i in (1, 50, 120)]
    ys = [np.float32(29.881557)] + [np.float32(lat_nodes[60, i]) for i in (1, 50, 120)]
    y = jnp.asarray(ys, jnp.float32)
    x = jnp.asarray(xs, jnp.float32)
    yi_g = jnp.zeros(len(xs), jnp.int32)
    xi_g = jnp.zeros(len(xs), jnp.int32)
    lk = g.lookup_meta()
    lookup = {**lk, "yi": garrs["lookup_yi"], "xi": garrs["lookup_xi"]} if lk else None
    yi, eta, xi, xsi = isr.curvilinear_search(
        lon2d, lat2d, y, x, yi_g, xi_g, spherical=True, lookup=lookup
    )
    yi, xi = np.asarray(yi), np.asarray(xi)
    assert (yi >= 0).all(), (yi, xi)
    assert (xi >= 0).all(), (yi, xi)
    # local coords within the (tolerance-widened) cell
    assert np.all(np.asarray(xsi) > -1e-2) and np.all(np.asarray(xsi) < 1 + 1e-2)
    assert np.all(np.asarray(eta) > -1e-2) and np.all(np.asarray(eta) < 1 + 1e-2)


def test_pic_table_matches_direct_path():
    """The per-cell tangent-frame table (one row-gather per lane) reproduces
    the direct XYZ-projection point-in-cell to f32 tolerance, spherical and
    flat, including walk convergence from cold seeds."""
    import jax.numpy as jnp

    from parcels_tpu._core import index_search as isr
    from parcels_tpu.datasets import curvilinear_rotated_dataset, moi_like_fieldset
    from parcels_tpu import FieldSet

    rng = np.random.default_rng(3)

    # spherical MOi grid
    fs = moi_like_fieldset(xdim=80, ydim=60, zdim=3, u=0.0, v=0.0)
    g = fs._gridset[0]
    garrs = g.device_arrays(np.float32)
    n = 500
    x = jnp.asarray(rng.uniform(-170, 170, n), jnp.float32)
    y = jnp.asarray(rng.uniform(-70, 80, n), jnp.float32)
    lk = g.lookup_meta()
    lookup = {**lk, "yi": garrs["lookup_yi"], "xi": garrs["lookup_xi"]}
    zero = jnp.zeros(n, jnp.int32)
    args = (garrs["lon"], garrs["lat"], y, x, zero, zero)
    yi_a, eta_a, xi_a, xsi_a = isr.curvilinear_search(*args, spherical=True, lookup=lookup)
    yi_b, eta_b, xi_b, xsi_b = isr.curvilinear_search(
        *args, spherical=True, lookup=lookup, pic_table=garrs["pic_table"]
    )
    np.testing.assert_array_equal(np.asarray(yi_a), np.asarray(yi_b))
    np.testing.assert_array_equal(np.asarray(xi_a), np.asarray(xi_b))
    ok = np.asarray(yi_a) >= 0
    np.testing.assert_allclose(np.asarray(eta_a)[ok], np.asarray(eta_b)[ok], atol=2e-4)
    np.testing.assert_allclose(np.asarray(xsi_a)[ok], np.asarray(xsi_b)[ok], atol=2e-4)

    # flat rotated curvilinear grid
    ds = curvilinear_rotated_dataset(xdim=50, ydim=40)
    fs2 = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    g2 = fs2._gridset[0]
    ga2 = g2.device_arrays(np.float32)
    lon2, lat2 = np.asarray(g2.lon), np.asarray(g2.lat)
    m = 400
    ci = rng.integers(0, lon2.shape[0] - 1, m)
    cj = rng.integers(0, lon2.shape[1] - 1, m)
    a = rng.uniform(0.05, 0.95, m)
    b = rng.uniform(0.05, 0.95, m)
    x2 = jnp.asarray((1 - a) * (1 - b) * lon2[ci, cj] + a * (1 - b) * lon2[ci, cj + 1]
                     + a * b * lon2[ci + 1, cj + 1] + (1 - a) * b * lon2[ci + 1, cj], jnp.float32)
    y2 = jnp.asarray((1 - a) * (1 - b) * lat2[ci, cj] + a * (1 - b) * lat2[ci, cj + 1]
                     + a * b * lat2[ci + 1, cj + 1] + (1 - a) * b * lat2[ci + 1, cj], jnp.float32)
    lk2 = g2.lookup_meta()
    lookup2 = {**lk2, "yi": ga2["lookup_yi"], "xi": ga2["lookup_xi"]}
    zero2 = jnp.zeros(m, jnp.int32)
    args2 = (ga2["lon"], ga2["lat"], y2, x2, zero2, zero2)
    res_a = isr.curvilinear_search(*args2, spherical=False, lookup=lookup2)
    res_b = isr.curvilinear_search(*args2, spherical=False, lookup=lookup2,
                                   pic_table=ga2["pic_table"])
    ok2 = np.asarray(res_a[0]) >= 0
    assert ok2.mean() > 0.9
    np.testing.assert_array_equal(np.asarray(res_a[0]), np.asarray(res_b[0]))
    np.testing.assert_array_equal(np.asarray(res_a[2]), np.asarray(res_b[2]))
    np.testing.assert_allclose(np.asarray(res_a[1])[ok2], np.asarray(res_b[1])[ok2], atol=2e-4)
    np.testing.assert_allclose(np.asarray(res_a[3])[ok2], np.asarray(res_b[3])[ok2], atol=2e-4)
