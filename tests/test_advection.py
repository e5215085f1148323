"""Physics validation against closed-form trajectories.

Mirrors the reference test strategy (reference tests/test_advection.py):
uniform flows (exact), radial rotation (exact circles), moving/decaying
eddies vs. the Fabbroni (2009) closed forms with a per-integrator rtol
ladder, and streamfunction conservation on the Stommel gyre / peninsula.
"""

import numpy as np
import pytest

from parcels_tpu import FieldSet, ParticleSet, StatusCode, Variable
from parcels_tpu.datasets import (
    decaying_moving_eddy_dataset,
    moving_eddy_dataset,
    peninsula_dataset,
    radial_rotation_dataset,
    simple_UV_dataset,
    stommel_gyre_dataset,
)
from parcels_tpu.kernels import (
    AdvectionEE,
    AdvectionRK2,
    AdvectionRK4,
    AdvectionRK4_3D,
    AdvectionRK45,
)
from tests.conftest import uniform_flow_fieldset

KERNELS = {
    "EE": AdvectionEE,
    "RK2": AdvectionRK2,
    "RK4": AdvectionRK4,
    "RK45": AdvectionRK45,
}


@pytest.mark.parametrize("mesh", ["flat", "spherical"])
def test_advection_zonal(mesh):
    """Uniform zonal flow; on a sphere dlon/dt scales with 1/cos(lat)."""
    npart = 10
    fs = uniform_flow_fieldset(u=1.0, v=0.0, mesh=mesh)
    lat = np.linspace(-60, 60, npart) if mesh == "spherical" else np.linspace(1e5, 9e5, npart)
    lon = np.zeros(npart) if mesh == "spherical" else np.full(npart, 1e5)
    pset = ParticleSet(fs, x=lon, y=lat)
    runtime = np.timedelta64(2, "h")
    pset.execute(AdvectionRK4, dt=np.timedelta64(30, "m"), runtime=runtime)

    secs = 7200.0
    if mesh == "spherical":
        expected = lon + secs / (1852 * 60 * np.cos(np.deg2rad(lat)))
        assert np.allclose(pset.x, expected, rtol=1e-4)
    else:
        assert np.allclose(pset.x, lon + secs, rtol=1e-5)
    assert np.allclose(pset.y, lat, atol=1e-4)


@pytest.mark.parametrize("mesh", ["flat", "spherical"])
def test_advection_meridional(mesh):
    npart = 10
    fs = uniform_flow_fieldset(u=0.0, v=1.0, mesh=mesh)
    if mesh == "spherical":
        lat = np.linspace(-60, 60, npart)
        lon = np.linspace(-60, 60, npart)
    else:
        lat = np.full(npart, 1e5)
        lon = np.linspace(1e5, 9e5, npart)
    pset = ParticleSet(fs, x=lon, y=lat)
    pset.execute(AdvectionRK4, dt=np.timedelta64(30, "m"), runtime=np.timedelta64(2, "h"))
    secs = 7200.0
    expected = lat + (secs / (1852 * 60) if mesh == "spherical" else secs)
    assert np.allclose(pset.y, expected, rtol=1e-4)


def test_radial_rotation():
    """Solid-body rotation: a particle returns to its start after one period."""
    ds = radial_rotation_dataset()
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    pset = ParticleSet(fs, x=[40.0, 30.0], y=[30.0, 40.0])
    pset.execute(AdvectionRK4, dt=np.timedelta64(30, "s"), runtime=np.timedelta64(1, "D"))
    assert np.allclose(pset.x, [40.0, 30.0], atol=5e-2)
    assert np.allclose(pset.y, [30.0, 40.0], atol=5e-2)


def truth_moving(x0, y0, t, u_0, u_g, f):
    lon = x0 + u_g * t + (u_0 - u_g) / f * np.sin(f * t)
    lat = y0 - (u_0 - u_g) / f * (1 - np.cos(f * t))
    return lon, lat


@pytest.mark.parametrize(
    "method, rtol",
    [("EE", 1e-2), ("RK2", 1e-4), ("RK4", 1e-5), ("RK45", 1e-4)],
)
def test_moving_eddy(method, rtol):
    ds = moving_eddy_dataset()
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    if method == "RK45":
        fs.add_context("RK45_tol", rtol)
        fs.add_context("RK45_min_dt", 1)
        fs.add_context("RK45_max_dt", 24 * 60 * 60)
    pclass = _pclass_for(method)
    pset = ParticleSet(fs, pclass=pclass, x=[12000.0], y=[12500.0], t=[np.timedelta64(0, "s")])
    pset.execute(
        KERNELS[method], dt=np.timedelta64(30, "m"), runtime=np.timedelta64(1, "h")
    )
    t = 3600.0
    exp_x, exp_y = truth_moving(
        12000.0, 12500.0, t, ds.attrs["u_0"], ds.attrs["u_g"], ds.attrs["f"]
    )
    assert np.allclose(pset.x, exp_x, rtol=rtol)
    assert np.allclose(pset.y, exp_y, rtol=rtol)


def truth_decaying(x0, y0, t, u_0, u_g, f, gamma, gamma_g):
    lon = x0 + (
        u_g / gamma_g * (1 - np.exp(-gamma_g * t))
        + (u_0 - u_g)
        * f
        / (f**2 + gamma**2)
        * (gamma / f + np.exp(-gamma * t) * (np.sin(f * t) - gamma / f * np.cos(f * t)))
    )
    lat = y0 - (u_0 - u_g) * f / (f**2 + gamma**2) * (
        1 - np.exp(-gamma * t) * (np.cos(f * t) + gamma / f * np.sin(f * t))
    )
    return lon, lat


@pytest.mark.parametrize("method, rtol", [("EE", 1e-1), ("RK2", 3e-3), ("RK4", 1e-5)])
def test_decaying_moving_eddy(method, rtol):
    ds = decaying_moving_eddy_dataset()
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    pset = ParticleSet(fs, x=[10000.0], y=[10000.0], t=[np.timedelta64(0, "s")])
    pset.execute(KERNELS[method], dt=np.timedelta64(60, "m"), runtime=np.timedelta64(23, "h"))
    t = 23 * 3600.0
    exp_x, exp_y = truth_decaying(
        10000.0,
        10000.0,
        t,
        ds.attrs["u_0"],
        ds.attrs["u_g"],
        ds.attrs["f"],
        ds.attrs["gamma"],
        ds.attrs["gamma_g"],
    )
    assert np.allclose(pset.x, exp_x, rtol=rtol)
    assert np.allclose(pset.y, exp_y, rtol=rtol)


def _pclass_for(method):
    from parcels_tpu import Particle

    if method == "RK45":
        return Particle.add_variable(
            Variable("next_dt", dtype=np.float64, initial=60.0, to_write=False)
        )
    return Particle


def SampleP(particles, fieldset):  # noqa: N802
    particles.p = fieldset.P[particles]


@pytest.mark.parametrize("grid_type", ["A", "C"])
def test_stommel_gyre_streamfunction_conservation(grid_type):
    from parcels_tpu import Particle

    ds = stommel_gyre_dataset(grid_type=grid_type)
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    pclass = Particle.add_variable(Variable("p", dtype=np.float32))
    x0 = [3e6, 4e6, 5e6]
    y0 = [3e6, 5e6, 7e6]
    pset = ParticleSet(fs, pclass=pclass, x=x0, y=y0)
    pset.execute(
        [AdvectionRK4, SampleP], dt=np.timedelta64(30, "m"), runtime=np.timedelta64(1, "D")
    )
    p_start = _sample_p(fs, x0, y0)
    assert np.allclose(pset.p, p_start, rtol=2e-2)


@pytest.mark.parametrize("grid_type", ["A", "C"])
def test_peninsula_streamfunction_conservation(grid_type):
    from parcels_tpu import Particle

    ds = peninsula_dataset(grid_type=grid_type)
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    pclass = Particle.add_variable(Variable("p", dtype=np.float32))
    npart = 5
    x0 = np.full(npart, 3000.0)
    y0 = np.linspace(5e3, 4.5e4, npart)
    pset = ParticleSet(fs, pclass=pclass, x=x0, y=y0)
    pset.execute(
        [AdvectionRK4, SampleP], dt=np.timedelta64(5, "m"), runtime=np.timedelta64(1, "D")
    )
    p_start = _sample_p(fs, x0, y0)
    # relative to the dynamic range of P along the section
    err = np.abs(pset.p - p_start) / np.abs(p_start).max()
    assert np.all(err < 2e-2)


def _sample_p(fs, x0, y0):
    import jax.numpy as jnp

    from parcels_tpu._core.field import FieldView, GridView

    farrays = fs.device_arrays()
    fsv = fs.build_views(farrays)
    return np.asarray(
        fsv.P.eval(
            jnp.zeros(len(x0)),
            jnp.zeros(len(x0)),
            jnp.asarray(np.asarray(y0, dtype=np.float32)),
            jnp.asarray(np.asarray(x0, dtype=np.float32)),
        )
    )


def test_advection_3d():
    """3-D uniform flow with vertical velocity advects in all three axes."""
    dims = (2, 5, 20, 20)
    ds = simple_UV_dataset(dims=dims, maxdepth=1000.0, mesh="flat")
    ds["U"].values[:] = 1.0
    ds["V"].values[:] = 0.5
    ds["W"] = (["time", "depth", "YG", "XG"], np.full(dims, 0.01))
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    pset = ParticleSet(fs, x=[1e5], y=[1e5], z=[10.0])
    pset.execute(AdvectionRK4_3D, dt=np.timedelta64(5, "m"), runtime=np.timedelta64(2, "h"))
    assert np.allclose(pset.x, 1e5 + 7200.0, rtol=1e-5)
    assert np.allclose(pset.y, 1e5 + 3600.0, rtol=1e-5)
    assert np.allclose(pset.z, 10.0 + 72.0, rtol=1e-4)


def test_out_of_bounds_raises():
    from parcels_tpu import FieldOutOfBoundError

    fs = uniform_flow_fieldset(u=1000.0, v=0.0, mesh="flat", dims=(2, 2, 8, 8))
    # domain x in [-1e6, 1e6]; strong flow pushes particle out quickly
    pset = ParticleSet(fs, x=[9.9e5], y=[0.0])
    with pytest.raises(FieldOutOfBoundError):
        pset.execute(AdvectionEE, dt=np.timedelta64(1, "h"), runtime=np.timedelta64(30, "D"))


def test_out_of_bounds_recovery_delete():
    """A recovery kernel can turn OOB errors into deletions (reference idiom)."""
    import jax.numpy as jnp

    def DeleteOOB(particles, fieldset):  # noqa: N802
        particles.state = jnp.where(
            particles.state == StatusCode.ErrorOutOfBounds,
            StatusCode.Delete,
            particles.state,
        )

    fs = uniform_flow_fieldset(u=10.0, v=0.0, mesh="flat", dims=(2, 2, 8, 8))
    pset = ParticleSet(fs, x=[9.9e5, 0.0], y=[0.0, 0.0])
    # particle 1 exits the +x boundary after ~1000 s; particle 2 stays inside
    pset.execute([AdvectionEE, DeleteOOB], dt=np.timedelta64(10, "m"), runtime=np.timedelta64(2, "h"))
    assert len(pset) == 1  # the OOB particle was deleted, the other survived
    assert np.allclose(pset.x, 7200.0 * 10.0, rtol=1e-5)


def test_analytical_advection_stommel_c_grid():
    """Analytical (Ariane/TRACMASS) advection follows streamlines exactly on
    steady C-grid flows: streamfunction is conserved along the trajectory."""
    from parcels_tpu import Particle
    from parcels_tpu.kernels import AdvectionAnalytical

    ds = stommel_gyre_dataset(grid_type="C")
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    pclass = Particle.add_variable(Variable("p", dtype=np.float32))
    x0 = [3e6, 4e6, 5e6]
    y0 = [3e6, 5e6, 7e6]
    pset = ParticleSet(fs, pclass=pclass, x=x0, y=y0)
    pset.execute(
        [AdvectionAnalytical, SampleP],
        dt=np.timedelta64(6, "h"),
        runtime=np.timedelta64(2, "D"),
    )
    p_start = _sample_p(fs, x0, y0)
    assert np.allclose(pset.p, p_start, rtol=2e-2)
    # particles must actually have moved
    assert not np.allclose(pset.x, x0, atol=1.0)


def test_analytical_advection_uniform_flow_c_grid():
    """Analytical advection reproduces uniform translation on a C-grid."""
    from parcels_tpu.kernels import AdvectionAnalytical

    ds = peninsula_dataset(grid_type="C")
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    # seed well upstream of the peninsula: flow there is ~uniform u0
    x0 = np.full(3, 3e3)
    y0 = np.array([10e3, 25e3, 40e3])
    pset = ParticleSet(fs, x=x0, y=y0)
    pset.execute(
        AdvectionAnalytical, dt=np.timedelta64(30, "m"), runtime=np.timedelta64(3, "h")
    )
    assert np.all(pset.x > x0 + 1e3), pset.x


@pytest.mark.parametrize("grid_type", ["A", "C"])
def test_peninsula_spherical_streamfunction_conservation(grid_type):
    """Spherical-mesh peninsula: exercises the deg<->m velocity conversion on
    both staggering variants (reference tests/test_advection.py peninsula
    sphere variants)."""
    from parcels_tpu import Particle

    ds = peninsula_dataset(grid_type=grid_type, mesh="spherical")
    fs = FieldSet.from_sgrid_conventions(ds)
    assert fs.gridset[0].mesh.is_spherical()
    pclass = Particle.add_variable(Variable("p", dtype=np.float32))
    deg = 1852.0 * 60.0
    x0 = np.array([3e3] * 3) / deg
    y0 = np.array([1.2e4, 2.5e4, 4.0e4]) / deg
    pset = ParticleSet(fs, pclass=pclass, x=x0, y=y0)
    pset.execute(
        [AdvectionRK4, SampleP], dt=np.timedelta64(30, "m"), runtime=np.timedelta64(12, "h")
    )
    p_start = _sample_p(fs, x0, y0)
    err = np.abs(pset.p - p_start) / np.abs(p_start).max()
    assert np.all(err < 2e-2), err
    # flow is eastward upstream: all particles must progress in lon
    assert np.all(pset.x > x0 + 1e4 / deg)


def test_analytical_advection_3d_with_w():
    """AdvectionAnalytical withW: uniform (u, 0, w) C-grid flow gives linear
    trajectories in x and z (exponential-in-cell degenerates to linear)."""
    from parcels_tpu import _sgrid as sgrid
    from parcels_tpu import xrlite as xr
    from parcels_tpu.kernels import AdvectionAnalytical

    xdim, ydim, nz = 30, 20, 6
    s = 1000.0
    lon = np.arange(xdim) * s
    lat = np.arange(ydim) * s
    depth = np.linspace(0.0, 120.0, nz)
    u0, w0 = 0.05, 0.002
    shape = (2, nz, ydim, xdim)
    time = np.array([np.timedelta64(0, "s"), np.timedelta64(10, "D")])
    ds = xr.Dataset(
        {
            "U": (["time", "depth", "YG", "XC"], np.full(shape, u0, np.float32)),
            "V": (["time", "depth", "YC", "XG"], np.zeros(shape, np.float32)),
            "W": (["time", "depth", "YC", "XC"], np.full(shape, w0, np.float32)),
        },
        coords={
            "time": (["time"], time, {"axis": "T"}),
            "depth": (["depth"], depth, {"axis": "Z"}),
            "YC": (["YC"], np.arange(ydim) - 0.5, {"axis": "Y"}),
            "YG": (["YG"], np.arange(ydim, dtype=np.float64), {"axis": "Y"}),
            "XC": (["XC"], np.arange(xdim) - 0.5, {"axis": "X"}),
            "XG": (["XG"], np.arange(xdim, dtype=np.float64), {"axis": "X"}),
            "lat": (["YG"], lat, {"axis": "Y", "units": "m"}),
            "lon": (["XG"], lon, {"axis": "X", "units": "m"}),
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

    runtime = 6 * 3600
    pset = ParticleSet(fs, x=[2500.0], y=[9500.0], z=[10.0], t=[0.0])
    pset.execute(
        AdvectionAnalytical, dt=np.timedelta64(30, "m"), runtime=np.timedelta64(runtime, "s")
    )
    np.testing.assert_allclose(pset.x, 2500.0 + u0 * runtime, rtol=1e-4)
    np.testing.assert_allclose(pset.z, 10.0 + w0 * runtime, rtol=1e-3)
    np.testing.assert_allclose(pset.y, 9500.0, atol=1.0)
