"""CROCO terrain-following (sigma) grid kernels.

Mirrors reference tests/test_sigmagrids.py (z->sigma conversion + RK2-3D
advection on sigma layers), but against a synthetic idealized CROCO dataset
instead of the pooch-downloaded one (this container has no network).
"""

import numpy as np

from parcels_tpu import FieldSet, Particle, ParticleSet, Variable, convert
from parcels_tpu import xrlite as xr
from parcels_tpu.kernels import (
    AdvectionRK2_3D_CROCO,
    SampleOmegaCroco,
    convert_z_to_sigma_croco,
)

HC = 20.0
H0 = 126.0


def _croco_idealized(nx=8, ny=8, nz=6, nt=2, u=1.0, zeta0=0.0, omega0=3.3, extent=200e3):
    """Idealized CROCO output: uniform u, flat bottom, cubic Cs_w stretching."""
    x_rho = np.broadcast_to(np.linspace(0, extent, nx), (ny, nx)).copy()
    y_rho = np.broadcast_to(np.linspace(0, extent, ny)[:, None], (ny, nx)).copy()
    s_w = np.linspace(-1.0, 0.0, nz)
    cs_w = s_w**3  # satisfies Cs(-1)=-1, Cs(0)=0, nonlinear in between
    fields = {
        "U": xr.DataArray(
            np.full((nt, nz, ny, nx - 1), u, np.float32),
            dims=("time", "s_rho", "eta_rho", "xi_u"),
            name="U",
        ),
        "V": xr.DataArray(
            np.zeros((nt, nz, ny - 1, nx), np.float32),
            dims=("time", "s_rho", "eta_v", "xi_rho"),
            name="V",
        ),
        "W": xr.DataArray(
            np.zeros((nt, nz, ny, nx), np.float32),
            dims=("time", "s_w", "eta_rho", "xi_rho"),
            name="W",
        ),
        "h": xr.DataArray(
            np.full((ny, nx), H0, np.float32), dims=("eta_rho", "xi_rho"), name="h"
        ),
        "zeta": xr.DataArray(
            np.full((nt, ny, nx), zeta0, np.float32),
            dims=("time", "eta_rho", "xi_rho"),
            name="zeta",
        ),
        "Cs_w": xr.DataArray(cs_w.astype(np.float32), dims=("s_w",), name="Cs_w"),
        "omega": xr.DataArray(
            np.full((nt, nz, ny, nx), omega0, np.float32),
            dims=("time", "s_w", "eta_rho", "xi_rho"),
            name="omega",
        ),
    }
    coords = xr.Dataset(
        coords={
            "time": (("time",), np.arange(nt) * 20000.0, {"units": "seconds"}),
            "x_rho": (("eta_rho", "xi_rho"), x_rho, {"units": "m"}),
            "y_rho": (("eta_rho", "xi_rho"), y_rho, {"units": "m"}),
            "s_w": (("s_w",), s_w),
        }
    )
    return fields, coords


def _z_of_sigma(sigma, h=H0, zeta=0.0):
    """Forward CROCO stretching z(sigma) at w-levels (Cs_w = sigma^3)."""
    z0 = HC * sigma + (h - HC) * sigma**3
    return z0 + zeta * (1.0 + z0 / h)


def _fieldset(fields, coords):
    ds = convert.croco_to_sgrid(fields=fields, coords=coords)
    fs = FieldSet.from_sgrid_conventions(ds)
    fs.add_context("hc", HC)
    return fs


def test_conversion_3DCROCO():
    # reference tests/test_sigmagrids.py:9-45 with the xroms-derived truth
    # replaced by the closed-form inverse of the synthetic stretching curve
    fields, coords = _croco_idealized(zeta0=0.25)
    fs = _fieldset(fields, coords)

    s_levels = np.linspace(-1.0, 0.0, 6, dtype=np.float32)
    z_levels = _z_of_sigma(s_levels.astype(np.float64), zeta=0.25).astype(np.float32)
    time = np.zeros_like(z_levels)
    lon = np.full_like(z_levels, 100e3)
    lat = np.full_like(z_levels, 100e3)

    sigma = np.asarray(convert_z_to_sigma_croco(fs, time, z_levels, lat, lon, None))
    np.testing.assert_allclose(sigma, s_levels, atol=1e-3)

    # off-level depths: piecewise-linear inverse must stay within the bracket
    zmid = 0.5 * (z_levels[:-1] + z_levels[1:])
    smid = np.asarray(convert_z_to_sigma_croco(fs, time[:-1], zmid, lat[:-1], lon[:-1], None))
    assert ((smid > s_levels[:-1]) & (smid < s_levels[1:])).all(), smid


def test_advection_3DCROCO():
    # reference tests/test_sigmagrids.py:71-103: with w == 0 the particle
    # must hold depth exactly while advecting at u in x
    fields, coords = _croco_idealized(u=1.0, omega0=3.3)
    fs = _fieldset(fields, coords)

    runtime = 10_000.0
    X, Z = np.meshgrid([40e3, 80e3, 120e3], [-10.0, -100.0])
    X, Z = X.flatten(), Z.flatten()
    Y = np.full(X.size, 100e3)

    pclass = Particle.add_variable(Variable("omega"))
    pset = ParticleSet(fs, pclass=pclass, x=X, y=Y, z=Z, t=np.zeros(X.size))
    pset.execute(
        [AdvectionRK2_3D_CROCO, SampleOmegaCroco],
        runtime=np.timedelta64(int(runtime), "s"),
        dt=np.timedelta64(100, "s"),
    )
    np.testing.assert_allclose(pset.z, Z, atol=1e-3)
    np.testing.assert_allclose(pset.x, X + runtime, atol=1e-2)
    np.testing.assert_allclose(pset.y, Y, atol=1e-3)
    np.testing.assert_allclose(pset.omega, 3.3, rtol=1e-6)
