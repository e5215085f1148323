"""Mixed rectilinear + curvilinear banded fieldsets (VERDICT r5 task 5).

The config-5-adjacent composition the reference handles freely
(reference fieldset.py:381-400 mixed-mesh handling): NEMO curvilinear
C-grid ocean UV plus a rectilinear A-grid wind/Stokes product in ONE
simulation. Under YBandDomain the curvilinear grid is the ownership main
(index-space bands) and the rectilinear grid is banded by COVERAGE of
each main band's slab latitude range — banded trajectories must match
the single-device run.
"""

import numpy as np
import pytest

import jax

from parcels_tpu import FieldSet, ParticleSet, convert
from parcels_tpu._core.field import Field, VectorField
from parcels_tpu.datasets import simple_UV_dataset
from parcels_tpu.datasets.circulation_models import nemo_style
from parcels_tpu.interpolators.xinterp import XLinear_Velocity
from parcels_tpu.parallel import YBandDomain, shard_particleset

needs_mesh = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device virtual mesh"
)

U_OC, V_OC = 0.15, 0.08
U_ST, V_ST = -0.05, 0.04


def _build_mixed(ny=32):
    """Curvilinear NEMO-style C-grid UV + rectilinear A-grid Stokes UV."""
    fields, coords = nemo_style(nx=12, ny=ny, u=U_OC, v=V_OC)
    fs = FieldSet.from_sgrid_conventions(
        convert.nemo_to_sgrid(fields=fields, coords=coords)
    )
    # rectilinear A-grid product on its OWN (uniform lat/lon) grid covering
    # the NEMO patch; deliberately a different ydim/extent than the C-grid
    ds = simple_UV_dataset(dims=(2, 2, 24, 16), mesh="spherical")
    ds["U"].values[:] = U_ST
    ds["V"].values[:] = V_ST
    fs2 = FieldSet.from_sgrid_conventions(ds, mesh="spherical")
    us = Field("Ustokes", np.asarray(fs2.U.data), fs2.U.grid)
    vs = Field("Vstokes", np.asarray(fs2.V.data), fs2.V.grid)
    fs.add_field(us)
    fs.add_field(vs)
    fs.add_field(
        VectorField("UVstokes", us, vs, interp_method=XLinear_Velocity())
    )
    return fs


def AdvectionRK4_PlusStokes(particles, fieldset):
    import jax.numpy as jnp  # noqa: F401

    from parcels_tpu.kernels import AdvectionRK4 as _rk4

    _rk4(particles, fieldset)
    us, vs = fieldset.UVstokes[particles]
    particles.dx = particles.dx + us * particles.dt
    particles.dy = particles.dy + vs * particles.dt


def _run(fs, x, y, domain=None):
    n = x.size
    pset = ParticleSet(fs, x=x.copy(), y=y.copy(), t=np.zeros(n))
    if domain is not None:
        shard_particleset(pset, domain)
    pset.execute(
        AdvectionRK4_PlusStokes,
        dt=np.timedelta64(1800, "s"),
        runtime=np.timedelta64(6 * 3600, "s"),
    )
    assert len(pset) == n, "mixed banded run lost particles"
    order = np.argsort(pset.particle_id)
    return pset.x[order], pset.y[order]


@needs_mesh
def test_mixed_banded_matches_single_device():
    rng = np.random.default_rng(3)
    n = 64
    x0 = rng.uniform(1.5, 5.5, n)
    y0 = rng.uniform(40.8, 44.2, n)
    xs, ys = _run(_build_mixed(), x0, y0)
    fs = _build_mixed()
    dom = YBandDomain(fs, n_bands=8, halo=2)
    assert dom.curvilinear  # ownership judged on the NEMO grid
    plans = dom._grid_plans
    kinds = {bool(p.get("curvilinear", False)) for p in plans if p["banded"]}
    assert kinds == {True, False}, "both grid kinds must be banded"
    xd, yd = _run(fs, x0, y0, domain=dom)
    np.testing.assert_allclose(xd, xs, rtol=1e-6, atol=1e-4)
    np.testing.assert_allclose(yd, ys, rtol=1e-6, atol=1e-4)
    # and the composed uniform-flow closed form
    from parcels_tpu import EARTH_RADIUS

    deg2m = EARTH_RADIUS * np.pi / 180.0
    T = 6 * 3600.0
    exp_y = y0 + (V_OC + V_ST) * T / deg2m
    np.testing.assert_allclose(yd, exp_y, atol=2e-3)


@needs_mesh
def test_mixed_banded_rect_main_two_extents():
    """Two RECTILINEAR banded grids of different ydim/extent: the secondary
    is coverage-banded (the old proportional row scaling silently clamped
    samples when extents differed — ADVICE r4 #1)."""
    ds = simple_UV_dataset(dims=(2, 2, 32, 8), mesh="flat")
    ds["U"].values[:] = 0.0
    ds["V"].values[:] = 5.0
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    ds2 = simple_UV_dataset(dims=(2, 2, 24, 8), mesh="flat")
    ds2["U"].values[:] = 3.0
    ds2["V"].values[:] = 0.0
    fs2 = FieldSet.from_sgrid_conventions(ds2, mesh="flat")
    us = Field("Ustokes", np.asarray(fs2.U.data), fs2.U.grid)
    vs = Field("Vstokes", np.asarray(fs2.V.data), fs2.V.grid)
    fs.add_field(us)
    fs.add_field(vs)
    fs.add_field(VectorField("UVstokes", us, vs, interp_method=XLinear_Velocity()))

    n = 32
    x0 = np.linspace(-6e5, 6e5, n)
    y0 = np.full(n, -7e5)
    pset = ParticleSet(fs, x=x0.copy(), y=y0.copy(), t=np.zeros(n))
    dom = YBandDomain(fs, n_bands=8, halo=2)
    assert not dom.curvilinear
    shard_particleset(pset, dom)
    pset.execute(
        AdvectionRK4_PlusStokes,
        dt=np.timedelta64(600, "s"),
        runtime=np.timedelta64(86400, "s"),
    )
    order = np.argsort(pset.particle_id)
    # V=5 northward from the ocean grid, U=3 eastward from the wind grid
    np.testing.assert_allclose(pset.y[order], y0 + 5.0 * 86400, rtol=1e-5)
    np.testing.assert_allclose(pset.x[order], x0 + 3.0 * 86400, rtol=1e-5, atol=1.0)
