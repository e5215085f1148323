"""C-grid RK-stage cell cache (ops/stagecache.py) parity tests.

The cache must be semantically invisible: identical trajectories, identical
error escalation, on hits AND on the compacted miss fix-up path.
"""

import numpy as np
import pytest

from parcels_tpu import ParticleSet
from parcels_tpu.datasets import moi_like_fieldset
from parcels_tpu.kernels import AdvectionRK4, AdvectionRK4_3D

DAY = 86400


def _run(fs, kernel, x, y, z=None, dt_s=1800, runtime_s=DAY):
    n = x.size
    kw = {} if z is None else {"z": z.copy()}
    pset = ParticleSet(fs, x=x.copy(), y=y.copy(), t=np.zeros(n), **kw)
    pset.execute(
        kernel, dt=np.timedelta64(dt_s, "s"), runtime=np.timedelta64(runtime_s, "s")
    )
    order = np.argsort(pset.particle_id)
    return pset.x[order], pset.y[order], pset.z[order]


@pytest.mark.parametrize("dt_s", [1800, 21600])  # small dt: hits; 6h: cell-crossing misses
def test_stagecache_matches_plain_2d(monkeypatch, dt_s):
    rng = np.random.default_rng(0)
    n = 512
    x = rng.uniform(-150, 150, n)
    y = rng.uniform(-55, 60, n)

    def build():
        return moi_like_fieldset(xdim=96, ydim=64, zdim=3, seed=2)

    monkeypatch.setenv("PARCELS_TPU_STAGECACHE", "off")
    ref = _run(build(), AdvectionRK4, x, y, dt_s=dt_s)
    monkeypatch.setenv("PARCELS_TPU_STAGECACHE", "force")
    got = _run(build(), AdvectionRK4, x, y, dt_s=dt_s)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g, r, rtol=1e-6, atol=1e-5)


def test_stagecache_matches_plain_3d(monkeypatch):
    rng = np.random.default_rng(1)
    n = 256
    x = rng.uniform(-150, 150, n)
    y = rng.uniform(-55, 60, n)

    def build():
        return moi_like_fieldset(xdim=96, ydim=64, zdim=6, seed=3, with_w=True)

    z = rng.uniform(5.0, 800.0, n)
    monkeypatch.setenv("PARCELS_TPU_STAGECACHE", "off")
    ref = _run(build(), AdvectionRK4_3D, x, y, z)
    monkeypatch.setenv("PARCELS_TPU_STAGECACHE", "force")
    got = _run(build(), AdvectionRK4_3D, x, y, z)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g, r, rtol=1e-6, atol=1e-5)


def test_stagecache_closed_form_uniform_flow(monkeypatch):
    from parcels_tpu import EARTH_RADIUS

    monkeypatch.setenv("PARCELS_TPU_STAGECACHE", "force")
    u = 0.25
    fs = moi_like_fieldset(xdim=96, ydim=64, zdim=3, u=u, v=0.0)
    rng = np.random.default_rng(2)
    n = 64
    x = rng.uniform(-150, 150, n)
    y = rng.uniform(-50, 40, n)
    xs, ys, _ = _run(fs, AdvectionRK4, x, y)
    deg2m = EARTH_RADIUS * np.pi / 180.0
    np.testing.assert_allclose(xs, x + u * DAY / (deg2m * np.cos(np.deg2rad(y))), atol=2e-3)
    np.testing.assert_allclose(ys, y, atol=2e-3)


def _add_stokes(fs, uscale=-0.5, vscale=0.25):
    """Second curvilinear C-grid vector field on the SAME grid (e.g. Stokes
    drift next to the ocean UV) — the persistent-cache contamination setup."""
    from parcels_tpu._core.field import Field, VectorField
    from parcels_tpu.interpolators.xinterp import CGrid_Velocity

    us = Field("Ustokes", np.asarray(fs.U.data) * uscale, fs.U.grid)
    vs = Field("Vstokes", np.asarray(fs.V.data) * vscale, fs.V.grid)
    fs.add_field(us)
    fs.add_field(vs)
    fs.add_field(VectorField("UVstokes", us, vs, interp_method=CGrid_Velocity()))
    return fs


def AdvectionEE_TwoFields(particles, fieldset):
    u1, v1 = fieldset.UV[particles]
    u2, v2 = fieldset.UVstokes[particles]
    particles.dx = particles.dx + (u1 + u2) * particles.dt
    particles.dy = particles.dy + (v1 + v2) * particles.dt


def test_stagecache_two_vector_fields_no_crosstalk(monkeypatch):
    """Two C-grid vector fields sharing one grid must not blend each
    other's cached face values (round-3 advisor high finding: the shared
    SoA columns were last-writer-wins across views)."""
    rng = np.random.default_rng(7)
    n = 256
    x = rng.uniform(-150, 150, n)
    y = rng.uniform(-55, 60, n)

    def build():
        return _add_stokes(moi_like_fieldset(xdim=96, ydim=64, zdim=3, seed=2))

    monkeypatch.setenv("PARCELS_TPU_STAGECACHE", "off")
    ref = _run(build(), AdvectionEE_TwoFields, x, y, dt_s=1800, runtime_s=6 * 3600)
    monkeypatch.setenv("PARCELS_TPU_STAGECACHE", "force")
    got = _run(build(), AdvectionEE_TwoFields, x, y, dt_s=1800, runtime_s=6 * 3600)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g, r, rtol=1e-6, atol=1e-5)


def test_pset_add_after_execute(monkeypatch):
    """execute() injects _sc_* cache columns; merging a fresh (never
    executed) set afterwards must still work (round-3 advisor medium)."""
    monkeypatch.setenv("PARCELS_TPU_STAGECACHE", "force")
    fs = moi_like_fieldset(xdim=96, ydim=64, zdim=3, seed=2)
    rng = np.random.default_rng(3)
    pset = ParticleSet(fs, x=rng.uniform(-50, 50, 8), y=rng.uniform(-40, 40, 8), t=np.zeros(8))
    pset.execute(AdvectionRK4, dt=np.timedelta64(1800, "s"), runtime=np.timedelta64(3600, "s"))
    assert "_sc_key" in pset._data
    fresh = ParticleSet(fs, x=rng.uniform(-50, 50, 5), y=rng.uniform(-40, 40, 5), t=np.zeros(5))
    n_before = len(pset)
    pset += fresh
    assert len(pset) == n_before + 5
    # merged-in lanes carry an INVALID persistent-cache key
    assert (np.asarray(pset._data["_sc_key"])[n_before:, 0] == -1).all()
    # and the merged set can execute again
    pset.execute(AdvectionRK4, dt=np.timedelta64(1800, "s"), runtime=np.timedelta64(3600, "s"))


def test_stagecache_oob_error_preserved(monkeypatch):
    """A particle leaving the global grid raises the same typed error with
    the cache on as with it off."""

    def run():
        fs = moi_like_fieldset(xdim=96, ydim=64, zdim=3, u=0.0, v=20.0)
        # 20 m/s north: ~15.5 deg/day, exits the top edge (lat ~85) mid-day
        pset = ParticleSet(fs, x=[0.0], y=[78.0], t=[0.0])
        try:
            pset.execute(
                AdvectionRK4, dt=np.timedelta64(1, "h"), runtime=np.timedelta64(1, "D")
            )
        except Exception as e:  # noqa: BLE001 - comparing exception classes
            return type(e).__name__
        return None

    monkeypatch.setenv("PARCELS_TPU_STAGECACHE", "off")
    ref = run()
    monkeypatch.setenv("PARCELS_TPU_STAGECACHE", "force")
    got = run()
    assert ref is not None, "scenario must error on the plain path"
    assert got == ref, (got, ref)
