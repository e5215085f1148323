"""Statistical validation of the SDE (advection-diffusion) kernels.

Mirrors the reference's tests/test_diffusion.py idiom: large ensembles whose
displacement statistics must match the Fokker-Planck moments —
mean = u*t, variance = 2*Kh*t — plus determinism of the counter-based RNG.
"""

import numpy as np
import pytest

from parcels_tpu import FieldSet, ParticleSet
from parcels_tpu.datasets import simple_UV_dataset
from parcels_tpu.kernels import (
    AdvectionDiffusionEM,
    AdvectionDiffusionM1,
    DiffusionUniformKh,
)

KH = 100.0  # m^2/s
N = 4000
HOURS = 6
T = HOURS * 3600.0


def _flow_fs(u=0.0, v=0.0):
    ds = simple_UV_dataset(dims=(2, 2, 32, 32), mesh="flat")
    ds["U"].values[:] = u
    ds["V"].values[:] = v
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    fs.add_constant_field("Kh_zonal", KH, mesh="flat")
    fs.add_constant_field("Kh_meridional", KH, mesh="flat")
    return fs


def _run(fs, kernel, seed=1, dt_m=10):
    pset = ParticleSet(fs, x=np.zeros(N), y=np.zeros(N), t=np.zeros(N), seed=seed)
    pset.execute(kernel, dt=np.timedelta64(dt_m, "m"), runtime=np.timedelta64(HOURS, "h"))
    return pset


def test_uniform_kh_variance():
    """Pure diffusion: Var[x] = 2 Kh t; mean stays at the origin."""
    pset = _run(_flow_fs(), DiffusionUniformKh)
    for arr in (pset.x, pset.y):
        assert abs(arr.mean()) < 4 * np.sqrt(2 * KH * T / N)
        np.testing.assert_allclose(arr.var(), 2 * KH * T, rtol=0.1)


@pytest.mark.parametrize("kernel", [AdvectionDiffusionEM, AdvectionDiffusionM1])
def test_advection_diffusion_moments(kernel):
    """Uniform flow + constant Kh: mean = u t, variance = 2 Kh t."""
    u = 0.2
    fs = _flow_fs(u=u)
    fs.add_context("dres", 10000.0)
    pset = _run(fs, kernel)
    np.testing.assert_allclose(pset.x.mean(), u * T, rtol=0.05)
    np.testing.assert_allclose(pset.x.var(), 2 * KH * T, rtol=0.12)
    np.testing.assert_allclose(pset.y.var(), 2 * KH * T, rtol=0.12)


def test_rng_reproducible_and_seed_sensitive():
    a = _run(_flow_fs(), DiffusionUniformKh, seed=7)
    b = _run(_flow_fs(), DiffusionUniformKh, seed=7)
    c = _run(_flow_fs(), DiffusionUniformKh, seed=8)
    np.testing.assert_array_equal(a.x, b.x)
    assert not np.allclose(a.x, c.x)


def test_zero_kh_is_pure_advection():
    ds = simple_UV_dataset(dims=(2, 2, 32, 32), mesh="flat")
    ds["U"].values[:] = 1.0
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    fs.add_constant_field("Kh_zonal", 0.0, mesh="flat")
    fs.add_constant_field("Kh_meridional", 0.0, mesh="flat")
    pset = ParticleSet(fs, x=np.zeros(4), y=np.zeros(4), t=np.zeros(4))
    pset.execute(
        DiffusionUniformKh, dt=np.timedelta64(10, "m"), runtime=np.timedelta64(1, "h")
    )
    np.testing.assert_allclose(pset.x, 0.0, atol=1e-6)


def test_diffusion_spherical_moments():
    """Euler-Maruyama on a spherical mesh: displacement variance matches
    2*Kh*t after the m^2 -> deg^2 conversion (reference
    _advectiondiffusion.py:11-18 helpers; zonal variance scales by
    1/cos(lat)^2)."""
    from parcels_tpu import EARTH_RADIUS, FieldSet, ParticleSet
    from parcels_tpu.datasets import simple_UV_dataset
    from parcels_tpu.kernels import AdvectionDiffusionEM

    KH = 50.0  # m^2/s
    lat0 = 45.0
    ds = simple_UV_dataset(dims=(2, 2, 30, 30), mesh="spherical")
    fs = FieldSet.from_sgrid_conventions(ds, mesh="spherical")
    fs.add_constant_field("Kh_zonal", KH)  # spherical (default)
    fs.add_constant_field("Kh_meridional", KH)
    fs.add_context("dres", 0.01)

    n = 4000
    pset = ParticleSet(fs, x=np.zeros(n), y=np.full(n, lat0), t=np.zeros(n))
    T = 12 * 3600.0
    pset.execute(AdvectionDiffusionEM, dt=np.timedelta64(600, "s"),
                 runtime=np.timedelta64(12, "h"))

    deg2m = EARTH_RADIUS * np.pi / 180.0
    var_x_m = np.var(pset.x * deg2m * np.cos(np.deg2rad(lat0)))
    var_y_m = np.var((pset.y - lat0) * deg2m)
    exp = 2 * KH * T
    assert abs(var_x_m - exp) / exp < 0.15, (var_x_m, exp)
    assert abs(var_y_m - exp) / exp < 0.15, (var_y_m, exp)
