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
