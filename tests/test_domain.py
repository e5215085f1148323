"""Y-band domain decomposition: trajectory invariance vs. single-device runs.

The reference has no distributed backend; the correctness contract for the
TPU scaling layer is SURVEY.md §4 "multi-node testing": migration must not
change trajectories. Runs on the 8-device virtual CPU mesh from conftest.

The flat ``simple_UV_dataset`` spans [-1e6, 1e6] m in x/y (cell ~64.5 km at
32 nodes); 8 bands are 250 km each, so a 10 m/s meridional flow over a day
(864 km) crosses ~3.5 band boundaries.
"""

import numpy as np
import pytest

import jax

from parcels_tpu import FieldSet, ParticleSet
from parcels_tpu.datasets import radial_rotation_dataset, simple_UV_dataset
from parcels_tpu.kernels import AdvectionEE, AdvectionRK4
from parcels_tpu.parallel import YBandDomain, shard_particleset

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs a multi-device mesh"
)

DAY = 86400


def _uniform_flow_fieldset(u, v, dims=(2, 2, 32, 32)):
    ds = simple_UV_dataset(dims=dims, mesh="flat")
    ds["U"].values[:] = u
    ds["V"].values[:] = v
    return FieldSet.from_sgrid_conventions(ds, mesh="flat")


def _run(fieldset, x, y, kernel, runtime_s, dt_s, domain=None):
    pset = ParticleSet(fieldset, x=x.copy(), y=y.copy(), t=np.zeros(x.size))
    if domain is not None:
        shard_particleset(pset, domain)
    pset.execute(kernel, dt=np.timedelta64(dt_s, "s"), runtime=np.timedelta64(runtime_s, "s"))
    order = np.argsort(pset.particle_id)
    return pset.x[order], pset.y[order]


def test_meridional_flow_crosses_bands():
    """Northward flow pushes every particle across several band boundaries."""
    fs_single = _uniform_flow_fieldset(0.0, 10.0)
    fs_domain = _uniform_flow_fieldset(0.0, 10.0)
    rng = np.random.default_rng(42)
    x = rng.uniform(-9e5, 9e5, 64)
    y = rng.uniform(-9e5, -5e5, 64)

    xs, ys = _run(fs_single, x, y, AdvectionRK4, DAY, 600)
    dom = YBandDomain(fs_domain, n_bands=8, halo=2)
    xd, yd = _run(fs_domain, x, y, AdvectionRK4, DAY, 600, domain=dom)

    np.testing.assert_allclose(ys, y + 10.0 * DAY, rtol=1e-5, atol=0.1)
    # banded search brackets via local searchsorted vs. the global analytic
    # uniform path -> last-ulp bcoord differences accumulate over 144 steps;
    # 0.1 m over a 2000 km domain is f32 roundoff, not a physics difference.
    np.testing.assert_allclose(xd, xs, rtol=1e-6, atol=0.1)
    np.testing.assert_allclose(yd, ys, rtol=1e-6, atol=0.1)


def test_rotation_trajectories_match_single_device():
    """Solid-body rotation on a banded grid: decomposed == single device."""
    fs_single = FieldSet.from_sgrid_conventions(radial_rotation_dataset(), mesh="flat")
    fs_domain = FieldSet.from_sgrid_conventions(radial_rotation_dataset(), mesh="flat")

    rng = np.random.default_rng(7)
    x = rng.uniform(25.0, 55.0, 32)
    y = rng.uniform(25.0, 55.0, 32)

    xs, ys = _run(fs_single, x, y, AdvectionRK4, 3600 * 6, 60)
    dom = YBandDomain(fs_domain, n_bands=8, halo=3)
    xd, yd = _run(fs_domain, x, y, AdvectionRK4, 3600 * 6, 60, domain=dom)

    np.testing.assert_allclose(xd, xs, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(yd, ys, rtol=1e-5, atol=1e-4)


def test_migration_preserves_particle_identity():
    """Cross-band particles keep their id; none lost or duplicated."""
    fs = _uniform_flow_fieldset(0.0, 10.0)
    n = 40
    x = np.linspace(-8e5, 8e5, n)
    y = np.full(n, -8e5)
    pset = ParticleSet(fs, x=x, y=y, t=np.zeros(n))
    dom = YBandDomain(fs, n_bands=8, halo=2)
    shard_particleset(pset, dom)
    pset.execute(AdvectionEE, dt=np.timedelta64(600, "s"), runtime=np.timedelta64(DAY, "s"))

    ids = np.sort(pset.particle_id)
    np.testing.assert_array_equal(ids, np.arange(n))
    np.testing.assert_allclose(np.sort(pset.y), np.full(n, -8e5 + 10.0 * DAY), rtol=1e-5)


def test_global_oob_still_raised_on_banded_grid():
    """A particle leaving the global domain errors exactly as single-device."""
    from parcels_tpu import FieldOutOfBoundError

    fs = _uniform_flow_fieldset(0.0, 50.0)
    pset = ParticleSet(fs, x=[0.0], y=[8e5], t=[0.0])
    dom = YBandDomain(fs, n_bands=8, halo=2)
    shard_particleset(pset, dom)
    with pytest.raises(FieldOutOfBoundError):
        pset.execute(
            AdvectionEE, dt=np.timedelta64(600, "s"), runtime=np.timedelta64(DAY, "s")
        )


def test_band_assignment():
    fs = _uniform_flow_fieldset(1.0, 0.0)
    dom = YBandDomain(fs, n_bands=8, halo=2)
    y = np.array([-9.9e5, -1e4, 1e4, 9.9e5])
    bands = dom.band_of(y)
    assert bands[0] == 0
    assert bands[-1] == 7
    assert np.all(np.diff(bands) >= 0)
    # band edges cover the domain monotonically
    assert np.all(np.diff(dom._interior_edges) > 0)


def test_windowed_domain_matches_resident():
    """Windowed streaming + Y-band decomposition: trajectories match the
    resident-in-full banded run, and only window-sized slabs are read."""
    dims = (40, 2, 32, 32)  # 40 time levels
    fs_res = _uniform_flow_fieldset(3.0, 10.0, dims=dims)
    fs_win = _uniform_flow_fieldset(3.0, 10.0, dims=dims)
    fs_win.set_time_window(6)

    rng = np.random.default_rng(9)
    x = rng.uniform(-9e5, 6e5, 48)
    y = rng.uniform(-9e5, -5e5, 48)

    dom_res = YBandDomain(fs_res, n_bands=8, halo=2)
    xr_, yr_ = _run(fs_res, x, y, AdvectionRK4, DAY, 600, domain=dom_res)

    dom_win = YBandDomain(fs_win, n_bands=8, halo=2)
    xw, yw = _run(fs_win, x, y, AdvectionRK4, DAY, 600, domain=dom_win)

    np.testing.assert_allclose(xw, xr_, rtol=1e-6, atol=0.1)
    np.testing.assert_allclose(yw, yr_, rtol=1e-6, atol=0.1)
    stats = fs_win.window_stats
    assert stats["loads"] >= 2  # the window advanced
    # each load is a 6-level slab, far below the full 40-level field
    per_load = 6 * 2 * 32 * 32 * 4
    assert stats["bytes_read"] <= stats["loads"] * per_load


def test_windowed_pmesh_matches_resident():
    """Windowed streaming + replicated-field particle mesh."""
    from parcels_tpu.parallel import ParticleMesh

    dims = (40, 2, 32, 32)
    fs_res = _uniform_flow_fieldset(3.0, 10.0, dims=dims)
    fs_win = _uniform_flow_fieldset(3.0, 10.0, dims=dims)
    fs_win.set_time_window(6)

    rng = np.random.default_rng(10)
    x = rng.uniform(-9e5, 6e5, 48)
    y = rng.uniform(-9e5, -5e5, 48)

    xs, ys = _run(fs_res, x, y, AdvectionRK4, DAY, 600)

    pm = ParticleMesh(8)
    pset = ParticleSet(fs_win, x=x.copy(), y=y.copy(), t=np.zeros(x.size))
    shard_particleset(pset, pm)
    pset.execute(AdvectionRK4, dt=np.timedelta64(600, "s"), runtime=np.timedelta64(DAY, "s"))
    order = np.argsort(pset.particle_id)
    np.testing.assert_allclose(pset.x[order], xs, rtol=1e-6, atol=0.1)
    np.testing.assert_allclose(pset.y[order], ys, rtol=1e-6, atol=0.1)


def test_curvilinear_banded_matches_single_device():
    """Index-space banding of a curvilinear grid: zonal flow on a rotated
    grid drives particles ACROSS row bands (global-east motion decreases the
    grid row index); trajectories must match the single-device run."""
    from parcels_tpu.datasets import curvilinear_rotated_dataset

    def build():
        # zonal drift adds cos(30)*86400 = +74.8 km grid-x and -43.2 km
        # grid-y over the day, so the grid must be wide enough in x
        ds = curvilinear_rotated_dataset(xdim=200, ydim=64)
        return FieldSet.from_sgrid_conventions(ds, mesh="flat")

    rng = np.random.default_rng(3)
    n = 48
    th = np.deg2rad(30.0)
    # seed in rotated-frame interior, leaving room for 1 day of 1 m/s drift
    sx = rng.uniform(5e3, 5e4, n)
    sy = rng.uniform(45e3, 58e3, n)
    x = np.cos(th) * sx - np.sin(th) * sy
    y = np.sin(th) * sx + np.cos(th) * sy

    fs_single = build()
    xs, ys = _run(fs_single, x, y, AdvectionRK4, DAY, 600)
    np.testing.assert_allclose(xs, x + DAY, rtol=1e-5, atol=0.5)  # U=1 zonal
    np.testing.assert_allclose(ys, y, rtol=1e-5, atol=0.5)

    fs_dom = build()
    dom = YBandDomain(fs_dom, n_bands=8, halo=3)
    assert dom.curvilinear
    xd, yd = _run(fs_dom, x, y, AdvectionRK4, DAY, 600, domain=dom)
    np.testing.assert_allclose(xd, xs, rtol=1e-6, atol=0.5)
    np.testing.assert_allclose(yd, ys, rtol=1e-6, atol=0.5)


def test_curvilinear_banded_off_grid_errors():
    """A particle advected off the global curvilinear grid errors out, as on
    a single device (degenerate pad rows make the search fail)."""
    from parcels_tpu import GridSearchingError, FieldOutOfBoundError
    from parcels_tpu.datasets import curvilinear_rotated_dataset

    ds = curvilinear_rotated_dataset(xdim=96, ydim=64)
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    dom = YBandDomain(fs, n_bands=8, halo=3)
    th = np.deg2rad(30.0)
    # start near the rotated-frame east edge: U=1 zonal pushes it off-grid
    sx, sy = 94e3, 30e3
    pset = ParticleSet(
        fs,
        x=[np.cos(th) * sx - np.sin(th) * sy],
        y=[np.sin(th) * sx + np.cos(th) * sy],
        t=[0.0],
    )
    shard_particleset(pset, dom)
    with pytest.raises((GridSearchingError, FieldOutOfBoundError)):
        pset.execute(
            AdvectionRK4, dt=np.timedelta64(600, "s"), runtime=np.timedelta64(DAY, "s")
        )


def _uniform_cgrid_fieldset(u=0.3, v=0.5, xdim=32, ydim=32):
    """Flat uniform-flow C-grid dataset (LOW padding, stommel-style layout)."""
    from parcels_tpu import _sgrid as sgrid
    from parcels_tpu import xrlite as xr
    from parcels_tpu.datasets.structured import _cgrid_coords

    lon = np.linspace(0, 2e6, xdim, dtype=np.float32)
    lat = np.linspace(0, 2e6, ydim, dtype=np.float32)
    U = np.full((ydim, xdim), u, np.float32)
    V = np.full((ydim, xdim), v, np.float32)
    ds = xr.Dataset(
        {"U": (["YG", "XC"], U), "V": (["YC", "XG"], V)},
        coords=_cgrid_coords(lon, lat, xdim, ydim),
    )
    meta = sgrid.SGrid2DMetadata(
        node_dimensions=("XG", "YG"),
        node_coordinates=("lon", "lat"),
        face_dimensions=(
            sgrid.FaceNodePadding("XC", "XG", sgrid.Padding.LOW),
            sgrid.FaceNodePadding("YC", "YG", sgrid.Padding.LOW),
        ),
    )
    return FieldSet.from_sgrid_conventions(sgrid.attach_sgrid_metadata(ds, meta), mesh="flat")


def test_cgrid_banded_matches_single_device_with_geom_table():
    """Banded C-grid keeps the one-row-gather geometry-table fast path
    (per-band tables rebuilt from halo-extended slab coords) and produces
    trajectories identical to the single-device run across band crossings."""
    from parcels_tpu.interpolators import CGrid_Velocity

    rng = np.random.default_rng(7)
    n = 32
    x = rng.uniform(2e5, 1.7e6, n)  # u=0.3 m/s: +207 km over 8 days, stays inside
    y = rng.uniform(2e5, 1.0e6, n)  # v=0.5 m/s: +43 km/day, crosses 250km bands over 8 days

    fs_single = _uniform_cgrid_fieldset()
    assert isinstance(fs_single.fields["UV"].interp_method, CGrid_Velocity)
    xs, ys = _run(fs_single, x, y, AdvectionRK4, 8 * DAY, 3600)
    np.testing.assert_allclose(xs, x + 0.3 * 8 * DAY, rtol=1e-5, atol=1.0)
    np.testing.assert_allclose(ys, y + 0.5 * 8 * DAY, rtol=1e-5, atol=1.0)

    fs_dom = _uniform_cgrid_fieldset()
    dom = YBandDomain(fs_dom, n_bands=8, halo=3)
    # the fast path survives banding: per-band geometry tables are shipped
    grids = dom.stacked_farrays()["grids"]
    assert any("cgrid_geom" in g for g in grids)
    geom = next(g["cgrid_geom"] for g in grids if "cgrid_geom" in g)
    assert geom.ndim == 3 and geom.shape[2] == 9  # (bands, local_cells, 9)
    xd, yd = _run(fs_dom, x, y, AdvectionRK4, 8 * DAY, 3600, domain=dom)
    np.testing.assert_allclose(xd, xs, rtol=1e-6, atol=0.5)
    np.testing.assert_allclose(yd, ys, rtol=1e-6, atol=0.5)


def test_curvilinear_cgrid_banded_matches_single_device():
    """NEMO-style (curvilinear coords, spherical, C-grid) banded run matches
    single-device — the BASELINE config-5 grid shape."""
    from parcels_tpu import convert
    from parcels_tpu.datasets.circulation_models import nemo_style

    def build():
        fields, coords = nemo_style(nx=48, ny=64, u=0.25, v=0.12)
        ds = convert.nemo_to_sgrid(fields=fields, coords=coords)
        return FieldSet.from_sgrid_conventions(ds)

    rng = np.random.default_rng(11)
    n = 24
    x = rng.uniform(1.0, 6.0, n)
    y = rng.uniform(41.0, 44.0, n)

    fs_single = build()
    assert fs_single._gridset[0].spec.curvilinear
    xs, ys = _run(fs_single, x, y, AdvectionRK4, DAY, 1800)

    fs_dom = build()
    dom = YBandDomain(fs_dom, n_bands=8, halo=3)
    assert dom.curvilinear
    grids = dom.stacked_farrays()["grids"]
    assert any("cgrid_geom" in g for g in grids)
    xd, yd = _run(fs_dom, x, y, AdvectionRK4, DAY, 1800, domain=dom)
    np.testing.assert_allclose(xd, xs, rtol=1e-6, atol=1e-4)
    np.testing.assert_allclose(yd, ys, rtol=1e-6, atol=1e-4)


def test_rk45_banded_matches_single_device():
    """RK45 per-lane adaptive dt + Repeat resubmission across band-crossing
    migration (VERDICT r3: RK45 x YBandDomain was untested). Northward flow
    pushes every particle across several band boundaries while RK45 adapts
    each lane's dt independently."""
    from parcels_tpu import Particle, Variable
    from parcels_tpu.kernels import AdvectionRK45

    def build():
        fs = _uniform_flow_fieldset(2.0, 10.0)
        fs.add_context("RK45_tol", 1e-4)
        fs.add_context("RK45_min_dt", 10)
        fs.add_context("RK45_max_dt", 3600)
        return fs

    pclass = Particle.add_variable(
        Variable("next_dt", dtype=np.float64, initial=600.0, to_write=False)
    )
    rng = np.random.default_rng(21)
    n = 48
    x = rng.uniform(-9e5, 6e5, n)
    y = rng.uniform(-9e5, -5e5, n)

    def run(fs, domain=None):
        pset = ParticleSet(fs, pclass=pclass, x=x.copy(), y=y.copy(), t=np.zeros(n))
        if domain is not None:
            shard_particleset(pset, domain)
        pset.execute(
            AdvectionRK45, dt=np.timedelta64(600, "s"), runtime=np.timedelta64(DAY, "s")
        )
        order = np.argsort(pset.particle_id)
        return pset.x[order], pset.y[order]

    xs, ys = run(build())
    np.testing.assert_allclose(ys, y + 10.0 * DAY, rtol=1e-4, atol=1.0)

    fs_dom = build()
    xd, yd = run(fs_dom, domain=YBandDomain(fs_dom, n_bands=8, halo=3))
    np.testing.assert_allclose(xd, xs, rtol=1e-6, atol=0.5)
    np.testing.assert_allclose(yd, ys, rtol=1e-6, atol=0.5)


def test_analytical_under_particle_mesh():
    """AdvectionAnalytical (per-lane cell-transit dt writes) under an 8-way
    ParticleMesh matches the unsharded run (VERDICT r3: Analytical under
    sharding was untested)."""
    from parcels_tpu.datasets import stommel_gyre_dataset
    from parcels_tpu.kernels import AdvectionAnalytical
    from parcels_tpu.parallel import ParticleMesh

    def build():
        return FieldSet.from_sgrid_conventions(
            stommel_gyre_dataset(grid_type="C"), mesh="flat"
        )

    x0 = np.array([3e6, 4e6, 5e6, 2.5e6, 4.5e6, 3.5e6, 2e6, 5.5e6])
    y0 = np.array([3e6, 5e6, 7e6, 4e6, 3e6, 6e6, 5e6, 4.5e6])

    def run(fs, pmesh=None):
        pset = ParticleSet(fs, x=x0.copy(), y=y0.copy())
        if pmesh is not None:
            shard_particleset(pset, pmesh)
        pset.execute(
            AdvectionAnalytical,
            dt=np.timedelta64(6, "h"),
            runtime=np.timedelta64(2, "D"),
        )
        order = np.argsort(pset.particle_id)
        return pset.x[order], pset.y[order]

    xs, ys = run(build())
    xd, yd = run(build(), pmesh=ParticleMesh(8))
    assert not np.allclose(xs, x0, atol=1.0)  # particles actually moved
    np.testing.assert_allclose(xd, xs, rtol=1e-6, atol=1.0)
    np.testing.assert_allclose(yd, ys, rtol=1e-6, atol=1.0)


def test_halo_violation_raises():
    """dt*v larger than the halo slab must raise, not silently clamp
    interpolation at the slab edge (VERDICT: halo CFL condition enforced)."""
    # cell ~64.5 km; halo=1 -> slab edge ~1 cell beyond the band. v=20 m/s
    # with dt=2h moves 144 km ~ 2.2 cells per step: outruns the halo.
    fs = _uniform_flow_fieldset(0.0, 20.0)
    dom = YBandDomain(fs, n_bands=8, halo=1)
    pset = ParticleSet(fs, x=[0.0], y=[-9e5], t=[0.0])
    shard_particleset(pset, dom)
    with pytest.raises(RuntimeError, match="[Hh]alo"):
        pset.execute(
            AdvectionEE, dt=np.timedelta64(2, "h"), runtime=np.timedelta64(2, "D")
        )


def test_curvilinear_halo_violation_raises():
    """Curvilinear twin of test_halo_violation_raises: a lane out-running its
    band's halo slab surfaces the actionable increase-halo message, not a
    bare GridSearchingError (the walk fails, but the position is still
    findable on the GLOBAL grid — that is a halo breach, not off-grid)."""
    from parcels_tpu.datasets import curvilinear_rotated_dataset

    # 1 km cells rotated 30 deg: U=1 m/s zonal with dt=2h moves 7.2 km,
    # -3.6 grid rows per step — far beyond halo=1 while staying well inside
    # the global grid.
    ds = curvilinear_rotated_dataset(xdim=200, ydim=64)
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    dom = YBandDomain(fs, n_bands=8, halo=1)
    assert dom.curvilinear
    th = np.deg2rad(30.0)
    sx, sy = 2e4, 50e3
    pset = ParticleSet(
        fs,
        x=[np.cos(th) * sx - np.sin(th) * sy],
        y=[np.sin(th) * sx + np.cos(th) * sy],
        t=[0.0],
    )
    shard_particleset(pset, dom)
    with pytest.raises(RuntimeError, match="[Hh]alo"):
        pset.execute(
            AdvectionRK4, dt=np.timedelta64(2, "h"), runtime=np.timedelta64(1, "D")
        )


def test_halo_sufficient_does_not_raise():
    """Same flow with an adequate halo completes and matches the closed form."""
    fs = _uniform_flow_fieldset(0.0, 20.0)
    dom = YBandDomain(fs, n_bands=8, halo=3)
    pset = ParticleSet(fs, x=[0.0], y=[-9e5], t=[0.0])
    shard_particleset(pset, dom)
    pset.execute(AdvectionEE, dt=np.timedelta64(2, "h"), runtime=np.timedelta64(1, "D"))
    np.testing.assert_allclose(pset.y, -9e5 + 20.0 * DAY, rtol=1e-6)


def test_moi_shaped_banded_matches_single_device():
    """Config-5 shape end-to-end: the MOi-like global curvilinear C-grid
    fieldset (datasets/moi.py, mimicking the reference's MOi benchmark
    registry entry at _datasets/remote.py:252-257) under 8-way Y-band
    decomposition with migration reproduces the single-device trajectories,
    and uniform flow matches the spherical closed form."""
    from parcels_tpu import EARTH_RADIUS
    from parcels_tpu.datasets import moi_like_fieldset

    u = 0.25
    rng = np.random.default_rng(5)
    n = 32
    x = rng.uniform(-150.0, 150.0, n)
    y = rng.uniform(-60.0, 70.0, n)

    fs_single = moi_like_fieldset(xdim=96, ydim=64, zdim=3, u=u, v=0.05)
    assert fs_single._gridset[0].spec.curvilinear
    assert fs_single._gridset[0].spec.spherical
    xs, ys = _run(fs_single, x, y, AdvectionRK4, DAY, 1800)

    # closed-form check away from the distorted northern rows
    deg2m = EARTH_RADIUS * np.pi / 180.0
    south = y < 0.0
    exp_y = y + 0.05 * DAY / deg2m
    np.testing.assert_allclose(ys[south], exp_y[south], atol=2e-3)

    fs_dom = moi_like_fieldset(xdim=96, ydim=64, zdim=3, u=u, v=0.05)
    dom = YBandDomain(fs_dom, n_bands=8, halo=3)
    assert dom.curvilinear
    grids = dom.stacked_farrays()["grids"]
    assert any("cgrid_geom" in g for g in grids)
    xd, yd = _run(fs_dom, x, y, AdvectionRK4, DAY, 1800, domain=dom)
    np.testing.assert_allclose(xd, xs, rtol=1e-6, atol=1e-4)
    np.testing.assert_allclose(yd, ys, rtol=1e-6, atol=1e-4)


# ---------------------------------------------------------------------------
# Load-balanced (non-uniform) band edges — round-3 VERDICT missing #4
# ---------------------------------------------------------------------------


def test_balanced_bands_skewed_seeding():
    """All particles clustered in one uniform band: balanced edges spread
    them ~evenly over 8 devices, shrink lane capacity, and preserve the
    closed form with zero migration overflow."""
    fs_uni = _uniform_flow_fieldset(0.0, 10.0)
    fs_bal = _uniform_flow_fieldset(0.0, 10.0)
    rng = np.random.default_rng(11)
    n = 256
    x = rng.uniform(-9e5, 9e5, n)
    y = rng.uniform(-4.6e5, -2.5e5, n)  # one narrow strip inside a uniform band

    dom_uni = YBandDomain(fs_uni, n_bands=8, halo=2)
    counts_uni = np.bincount(dom_uni.band_of(y, x), minlength=8)
    assert counts_uni.max() >= n * 0.8  # the skew is real

    dom_bal = YBandDomain(
        fs_bal, n_bands=8, halo=2,
        row_edges=YBandDomain(fs_bal, n_bands=8, halo=2).balanced_row_edges(y, x),
        headroom=6.0, migration_capacity=256,
    )
    counts_bal = np.bincount(dom_bal.band_of(y, x), minlength=8)
    # the strip only spans ~4 grid rows, so perfect 8-way balance is
    # impossible; halving the worst band is the realizable win
    assert counts_bal.max() <= counts_uni.max() // 2, counts_bal
    pdata = {"y": y, "x": x, "_active": np.ones(n, bool)}
    assert dom_bal.lane_capacity(pdata) < dom_uni.lane_capacity(pdata)

    xs, ys = _run(fs_uni, x, y, AdvectionRK4, DAY, 600)
    xd, yd = _run(fs_bal, x, y, AdvectionRK4, DAY, 600, domain=dom_bal)
    np.testing.assert_allclose(ys, y + 10.0 * DAY, rtol=1e-5, atol=0.1)
    np.testing.assert_allclose(xd, xs, rtol=1e-6, atol=0.1)
    np.testing.assert_allclose(yd, ys, rtol=1e-6, atol=0.1)


def test_rebalance_midrun_preserves_closed_form():
    """rebalance() between execute calls: new edges track the drifted
    cluster, the executor is reused (same compiled shapes), trajectories
    stay on the closed form."""
    fs = _uniform_flow_fieldset(0.0, 10.0)
    rng = np.random.default_rng(13)
    n = 128
    x = rng.uniform(-9e5, 9e5, n)
    y = rng.uniform(-8e5, -6e5, n)

    # construct WITH balanced edges (max band 8 rows) so the slab-size lock
    # leaves rebalance() real room to move edges later
    probe = YBandDomain(fs, n_bands=8, halo=2)
    edges0 = probe.balanced_row_edges(y, x, max_rows=8)
    # generous headroom/capacity: a coherent northward drift marches whole
    # bands' populations through narrow balanced bands each transit
    dom = YBandDomain(
        fs, n_bands=8, halo=2, row_edges=edges0, headroom=6.0, migration_capacity=256
    )
    pset = ParticleSet(fs, x=x.copy(), y=y.copy(), t=np.zeros(n))
    shard_particleset(pset, dom)
    half = DAY // 2
    pset.execute(AdvectionRK4, dt=np.timedelta64(600, "s"), runtime=np.timedelta64(half, "s"))

    edges1 = dom.rebalance(np.asarray(pset.y), np.asarray(pset.x))
    assert not np.array_equal(edges0, edges1)  # the cluster moved ~430 km north
    pset.execute(AdvectionRK4, dt=np.timedelta64(600, "s"), runtime=np.timedelta64(half, "s"))

    order = np.argsort(pset.particle_id)
    np.testing.assert_allclose(
        pset.y[order], y + 10.0 * DAY, rtol=1e-5, atol=0.2
    )
    np.testing.assert_allclose(pset.x[order], x, rtol=1e-6, atol=0.2)


def test_balanced_curvilinear_bands():
    """Non-uniform row edges on a curvilinear banded grid: migration rebase
    across unequal bands preserves trajectories."""
    from parcels_tpu.datasets import curvilinear_rotated_dataset

    def build():
        ds = curvilinear_rotated_dataset(xdim=200, ydim=64)
        return FieldSet.from_sgrid_conventions(ds, mesh="flat")

    rng = np.random.default_rng(5)
    n = 48
    th = np.deg2rad(30.0)
    sx = rng.uniform(5e3, 5e4, n)
    sy = rng.uniform(45e3, 58e3, n)
    x = np.cos(th) * sx - np.sin(th) * sy
    y = np.sin(th) * sx + np.cos(th) * sy

    fs_single = build()
    xs, ys = _run(fs_single, x, y, AdvectionRK4, DAY, 600)

    fs_dom = build()
    probe = YBandDomain(fs_dom, n_bands=8, halo=3)
    edges = probe.balanced_row_edges(y, x, max_rows=probe._Yl_locks[probe._main_igrid] - 6)
    fs_dom2 = build()
    dom = YBandDomain(fs_dom2, n_bands=8, halo=3, row_edges=edges)
    assert dom.curvilinear
    assert np.any(np.diff(edges) != np.diff(edges)[0])  # genuinely non-uniform
    xd, yd = _run(fs_dom2, x, y, AdvectionRK4, DAY, 600, domain=dom)
    np.testing.assert_allclose(xd, xs, rtol=1e-6, atol=0.5)
    np.testing.assert_allclose(yd, ys, rtol=1e-6, atol=0.5)


# ---------------------------------------------------------------------------
# Ragged all_to_all migration (comm-backend generality, SURVEY §2.2)
# ---------------------------------------------------------------------------


def test_all2all_matches_neighbor_uniform_bands():
    """Forced all2all on uniform bands reproduces the ppermute-hop result."""
    fs_a = _uniform_flow_fieldset(0.0, 10.0)
    fs_b = _uniform_flow_fieldset(0.0, 10.0)
    rng = np.random.default_rng(21)
    x = rng.uniform(-9e5, 9e5, 64)
    y = rng.uniform(-9e5, -5e5, 64)
    xa, ya = _run(fs_a, x, y, AdvectionRK4, DAY, 600,
                  domain=YBandDomain(fs_a, n_bands=8, halo=2, migration="neighbor"))
    xb, yb = _run(fs_b, x, y, AdvectionRK4, DAY, 600,
                  domain=YBandDomain(fs_b, n_bands=8, halo=2, migration="all2all"))
    np.testing.assert_array_equal(xb, xa)
    np.testing.assert_array_equal(yb, ya)


def test_all2all_curvilinear_matches_neighbor():
    """Curvilinear index-space bands: all2all rebase == neighbor rebase."""
    from parcels_tpu.datasets import curvilinear_rotated_dataset

    def build():
        ds = curvilinear_rotated_dataset(xdim=200, ydim=64)
        return FieldSet.from_sgrid_conventions(ds, mesh="flat")

    rng = np.random.default_rng(23)
    n = 32
    th = np.deg2rad(30.0)
    sx = rng.uniform(5e3, 5e4, n)
    sy = rng.uniform(45e3, 58e3, n)
    x = np.cos(th) * sx - np.sin(th) * sy
    y = np.sin(th) * sx + np.cos(th) * sy

    fs_a = build()
    xa, ya = _run(fs_a, x, y, AdvectionRK4, DAY, 600,
                  domain=YBandDomain(fs_a, n_bands=8, halo=3, migration="neighbor"))
    fs_b = build()
    xb, yb = _run(fs_b, x, y, AdvectionRK4, DAY, 600,
                  domain=YBandDomain(fs_b, n_bands=8, halo=3, migration="all2all"))
    np.testing.assert_allclose(xb, xa, rtol=1e-6, atol=1e-3)
    np.testing.assert_allclose(yb, ya, rtol=1e-6, atol=1e-3)


def test_all2all_delivers_multiband_crossers():
    """A step displacement spanning >1 (narrow) band: the ±1 neighbor hop
    cannot keep up (halo breach), all_to_all delivers directly and holds
    the closed form — the case load-balanced narrow bands create."""
    # bands rows: [0,12) big, then six 1-row bands, rest big — seeds start
    # south and sweep through the narrow bands at ~2.2 bands per step
    edges = np.array([0, 12, 13, 14, 15, 16, 17, 18, 31])
    n = 24
    rng = np.random.default_rng(29)
    x = rng.uniform(-8e5, 8e5, n)
    y = rng.uniform(-3.1e5, -2.7e5, n)  # inside band 0, near its top edge
    dt_s, steps = 14400, 8  # 144 km/step vs 64.5 km bands; halo 3 covers

    fs_ref = _uniform_flow_fieldset(0.0, 10.0)
    xs, ys = _run(fs_ref, x, y, AdvectionRK4, dt_s * steps, dt_s)

    fs_a2a = _uniform_flow_fieldset(0.0, 10.0)
    dom = YBandDomain(
        fs_a2a, n_bands=8, halo=3, row_edges=edges,
        migration="all2all", headroom=8.0, migration_capacity=64,
    )
    assert dom.migration_mode == "all2all"
    xd, yd = _run(fs_a2a, x, y, AdvectionRK4, dt_s * steps, dt_s, domain=dom)
    np.testing.assert_allclose(yd, ys, rtol=1e-6, atol=0.2)
    np.testing.assert_allclose(xd, xs, rtol=1e-6, atol=0.2)
