"""Unstructured (UGRID triangular mesh) validation tests.

Mirrors the reference validation tier (reference tests/validation/test_ux.py):
uniform translation must be exact (to f32) for all placement combinations;
solid-body rotation is exact only for node/barycentric placements (isolating
interpolator error from integrator error); 3-D helix checks the vertical.
"""

import numpy as np
import pytest

from parcels_tpu import FieldSet, ParticleSet
from parcels_tpu.datasets.unstructured import delaunay_flow_dataset
from parcels_tpu.kernels import AdvectionRK4, AdvectionRK4_3D

DAY = 86400


def _fs(flow, placement, vertical, **kw):
    ds = delaunay_flow_dataset(flow=flow, placement=placement, vertical=vertical, **kw)
    return FieldSet.from_ugrid_conventions(ds, mesh="flat")


@pytest.mark.parametrize("placement", ["node", "face"])
@pytest.mark.parametrize("vertical", ["zc", "zf"])
def test_uniform_translation_exact(placement, vertical):
    fs = _fs("uniform", placement, vertical)
    rng = np.random.default_rng(3)
    x0 = rng.uniform(2e4, 4e4, 16)
    y0 = rng.uniform(2e4, 4e4, 16)
    pset = ParticleSet(fs, x=x0, y=y0, z=np.full(16, 10.0), t=np.zeros(16))
    pset.execute(AdvectionRK4, dt=np.timedelta64(30, "m"), runtime=np.timedelta64(6, "h"))
    secs = 6 * 3600.0
    np.testing.assert_allclose(pset.x, x0 + 1.0 * secs, rtol=1e-5)
    np.testing.assert_allclose(pset.y, y0 + 0.5 * secs, rtol=1e-5)


def test_rotation_node_placement():
    """Solid-body rotation: node/barycentric lateral interp reproduces circles."""
    fs = _fs("rotation", "node", "zc", nx=40, ny=40)
    c = 5e4
    x0 = np.array([c + 1e4, c, c - 2e4])
    y0 = np.array([c, c + 1.5e4, c])
    r0 = np.sqrt((x0 - c) ** 2 + (y0 - c) ** 2)
    pset = ParticleSet(fs, x=x0.copy(), y=y0.copy(), z=np.full(3, 10.0), t=np.zeros(3))
    pset.execute(AdvectionRK4, dt=np.timedelta64(2, "m"), runtime=np.timedelta64(6, "h"))
    r1 = np.sqrt((pset.x - c) ** 2 + (pset.y - c) ** 2)
    # radius conserved; angle advanced by omega*t (clockwise)
    np.testing.assert_allclose(r1, r0, rtol=2e-3)
    ang = 2 * np.pi * (6 * 3600) / DAY
    th0 = np.arctan2(y0 - c, x0 - c)
    th1 = np.arctan2(pset.y - c, pset.x - c)
    dth = np.mod(th0 - th1, 2 * np.pi)
    np.testing.assert_allclose(dth, ang, rtol=2e-3)


def test_helix_3d():
    """Rotation + constant downwelling: the vertical advances linearly."""
    fs = _fs("helix", "node", "zf", nx=30, ny=30, w0=0.001, with_w=True)
    c = 5e4
    pset = ParticleSet(fs, x=[c + 1e4], y=[c], z=[10.0], t=[0.0])
    pset.execute(AdvectionRK4_3D, dt=np.timedelta64(2, "m"), runtime=np.timedelta64(6, "h"))
    np.testing.assert_allclose(pset.z, 10.0 + 0.001 * 6 * 3600, rtol=1e-4)
    r1 = np.sqrt((pset.x - c) ** 2 + (pset.y - c) ** 2)
    np.testing.assert_allclose(r1, 1e4, rtol=2e-3)


def test_out_of_mesh_is_oob():
    from parcels_tpu import FieldOutOfBoundError

    fs = _fs("uniform", "node", "zc", u0=10.0, v0=0.0)
    # starts near the east edge, exits the mesh quickly
    pset = ParticleSet(fs, x=[9.9e4], y=[5e4], z=[10.0], t=[0.0])
    with pytest.raises(FieldOutOfBoundError):
        pset.execute(
            AdvectionRK4, dt=np.timedelta64(30, "m"), runtime=np.timedelta64(1, "D")
        )


def test_ux_search_warm_and_cold():
    """Cold start finds faces from the raster; warm start sticks to cache."""
    import jax.numpy as jnp

    from parcels_tpu.datasets.unstructured import delaunay_flow_dataset

    ds = delaunay_flow_dataset(flow="uniform", placement="face", vertical="zc")
    fs = FieldSet.from_ugrid_conventions(ds, mesh="flat")
    grid = fs.gridset[0]
    garrs = grid.device_arrays()
    view = grid.make_view(garrs)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(1e3, 9.9e4, 200).astype(np.float32))
    y = jnp.asarray(rng.uniform(1e3, 9.9e4, 200).astype(np.float32))
    z = jnp.zeros(200, dtype=jnp.float32)
    gpos = view.search(z, y, x)
    fi = np.asarray(gpos["FACE"]["index"])
    assert (fi >= 0).all()
    bc = np.asarray(gpos["FACE"]["bcoord"])
    np.testing.assert_allclose(bc.sum(axis=1), 1.0, atol=1e-4)
    # verify the found faces actually contain the points (host check)
    conn = np.asarray(grid.face_node_connectivity)
    nlon, nlat = np.asarray(grid.node_lon), np.asarray(grid.node_lat)
    tx, ty = nlon[conn[fi]], nlat[conn[fi]]
    a = (tx[:, 1] - tx[:, 0]) * (ty[:, 2] - ty[:, 0]) - (ty[:, 1] - ty[:, 0]) * (tx[:, 2] - tx[:, 0])
    b0 = ((tx[:, 1] - np.asarray(x)) * (ty[:, 2] - np.asarray(y)) - (ty[:, 1] - np.asarray(y)) * (tx[:, 2] - np.asarray(x))) / a
    assert (b0 > -1e-4).all()
    # warm start from the found faces hits immediately
    gpos2 = view.search(z, y, x, ei=jnp.asarray(fi))
    np.testing.assert_array_equal(np.asarray(gpos2["FACE"]["index"]), fi)


def test_edge_riding_particle_survives():
    """A particle advected exactly along a mesh edge must not error (f32
    membership-tolerance regression guard, cf. curvilinear analogue)."""
    ds = delaunay_flow_dataset(flow="uniform", placement="node", vertical="zc",
                               u0=1.0, v0=0.0)
    fs = FieldSet.from_ugrid_conventions(ds, mesh="flat")
    # the unjittered boundary rows of the Delaunay mesh run exactly along
    # y = const gridlines: advect along one for many cells
    grid = fs.gridset[0]
    ys = np.unique(np.round(np.asarray(grid.node_lat), 6))
    y_edge = ys[len(ys) // 2]
    pset = ParticleSet(fs, x=[5e3], y=[float(y_edge)], z=[10.0], t=[0.0])
    pset.execute(AdvectionRK4, dt=np.timedelta64(10, "m"), runtime=np.timedelta64(12, "h"))
    np.testing.assert_allclose(pset.x, 5e3 + 12 * 3600.0, rtol=1e-5)


@pytest.mark.slow
def test_fesom2_scale_e2e_advection():
    """End-to-end advection at a realistic FESOM2-like mesh size (~78k
    triangles; reference tests/test_uxarray_fieldset.py tier): ingest via
    from_ugrid_conventions, advect a cloud with RK4, check the closed form."""
    fs = _fs("uniform", "face", "zc", nx=200, ny=200, extent=1e6)
    n_face = fs.gridset[0].spec.n_face
    assert n_face > 70_000, n_face
    rng = np.random.default_rng(5)
    n = 2000
    x0 = rng.uniform(2e5, 7e5, n)
    y0 = rng.uniform(2e5, 7e5, n)
    pset = ParticleSet(fs, x=x0.copy(), y=y0.copy(), z=np.full(n, 50.0), t=np.zeros(n))
    pset.execute(AdvectionRK4, dt=np.timedelta64(30, "m"), runtime=np.timedelta64(1, "D"))
    order = np.argsort(pset.particle_id)
    np.testing.assert_allclose(pset.x[order], x0 + 1.0 * DAY, rtol=1e-6, atol=0.5)
    np.testing.assert_allclose(pset.y[order], y0 + 0.5 * DAY, rtol=1e-6, atol=0.5)


@pytest.mark.slow
def test_million_face_cold_start():
    """Cold-start stress: ingest a ~1M-triangle mesh (exercising the C++
    coverage-raster path in native/ at scale) and locate 100k particles from
    scratch; every in-mesh particle must land in a face containing it."""
    import time as _time

    t0 = _time.perf_counter()
    ds = delaunay_flow_dataset(flow="uniform", placement="face", vertical="zc",
                               nx=710, ny=710, extent=1e6)
    fs = FieldSet.from_ugrid_conventions(ds, mesh="flat")
    ingest_s = _time.perf_counter() - t0
    grid = fs.gridset[0]
    assert grid.spec.n_face > 950_000, grid.spec.n_face

    rng = np.random.default_rng(6)
    n = 100_000
    x = rng.uniform(1e4, 9.9e5, n)
    y = rng.uniform(1e4, 9.9e5, n)
    pset = ParticleSet(fs, x=x, y=y, z=np.full(n, 50.0), t=np.zeros(n))
    t0 = _time.perf_counter()
    pset.populate_indices()
    search_s = _time.perf_counter() - t0

    # verify containment by barycentric coords of the assigned faces
    import jax.numpy as jnp

    garrs = grid.device_arrays()
    gpos = grid.make_view(garrs).search(
        jnp.asarray(np.full(n, 50.0, np.float32)), jnp.asarray(y.astype(np.float32)),
        jnp.asarray(x.astype(np.float32)),
    )
    fi = np.asarray(gpos["FACE"]["index"])
    assert (fi >= 0).mean() > 0.999  # interior points resolve
    bc = np.asarray(gpos["FACE"]["bcoord"])
    ok = fi >= 0
    assert bc[ok].min() > -1e-3 and bc[ok].max() < 1 + 1e-3
    print(f"1M-face ingest {ingest_s:.1f}s, 100k cold search {search_s:.1f}s")
