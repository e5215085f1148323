"""Per-face ux stage cache (ops/uxcache.py) parity tests.

Mirror of test_stagecache.py for the unstructured tier: the cache must be
semantically invisible — identical trajectories and error escalation vs
the uncached path, on hits AND through the compacted miss rounds.
"""

import numpy as np
import pytest

from parcels_tpu import FieldSet, ParticleSet
from parcels_tpu.datasets.unstructured import delaunay_flow_dataset
from parcels_tpu.kernels import AdvectionRK4, AdvectionRK4_3D

DAY = 86400


def _build(flow="rotation", placement="node", vertical="zf", with_w=False, nz=5):
    ds = delaunay_flow_dataset(
        flow=flow, placement=placement, vertical=vertical, nx=24, ny=24,
        extent=1e5, maxdepth=100.0, nz=nz, with_w=with_w,
    )
    return FieldSet.from_ugrid_conventions(ds, mesh="flat")


def _run(fs, kernel, x, y, z, dt_s=900, runtime_s=DAY // 4):
    n = x.size
    pset = ParticleSet(fs, x=x.copy(), y=y.copy(), z=z.copy(), t=np.zeros(n))
    pset.execute(
        kernel, dt=np.timedelta64(dt_s, "s"), runtime=np.timedelta64(runtime_s, "s")
    )
    order = np.argsort(pset.particle_id)
    return pset.x[order], pset.y[order], pset.z[order], pset.state[order]


@pytest.mark.parametrize("placement,vertical", [
    ("node", "zf"), ("node", "zc"), ("face", "zf"), ("face", "zc"),
])
def test_uxcache_matches_plain(monkeypatch, placement, vertical):
    rng = np.random.default_rng(0)
    n = 256
    x = rng.uniform(2e4, 8e4, n)
    y = rng.uniform(2e4, 8e4, n)
    z = rng.uniform(10.0, 90.0, n)

    monkeypatch.setenv("PARCELS_TPU_UXCACHE", "off")
    ref = _run(_build(placement=placement, vertical=vertical), AdvectionRK4, x, y, z)
    monkeypatch.setenv("PARCELS_TPU_UXCACHE", "force")
    monkeypatch.setenv("PARCELS_TPU_UXCOL", "force")  # face table on CPU
    got = _run(_build(placement=placement, vertical=vertical), AdvectionRK4, x, y, z)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g, r, rtol=1e-6, atol=1e-4)


def test_uxcache_matches_plain_3d_helix(monkeypatch):
    rng = np.random.default_rng(1)
    n = 128
    x = rng.uniform(3e4, 7e4, n)
    y = rng.uniform(3e4, 7e4, n)
    z = rng.uniform(20.0, 60.0, n)

    def build():
        return _build(flow="helix", with_w=True)

    monkeypatch.setenv("PARCELS_TPU_UXCACHE", "off")
    ref = _run(build(), AdvectionRK4_3D, x, y, z, dt_s=600, runtime_s=DAY // 8)
    monkeypatch.setenv("PARCELS_TPU_UXCACHE", "force")
    monkeypatch.setenv("PARCELS_TPU_UXCOL", "force")
    got = _run(build(), AdvectionRK4_3D, x, y, z, dt_s=600, runtime_s=DAY // 8)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g, r, rtol=1e-6, atol=1e-4)


def test_uxcache_rotation_closed_form(monkeypatch):
    """Solid-body rotation: radius conserved over a quarter turn."""
    monkeypatch.setenv("PARCELS_TPU_UXCACHE", "force")
    monkeypatch.setenv("PARCELS_TPU_UXCOL", "force")
    fs = _build()
    c = 5e4
    x = np.array([c + 1.5e4, c, c - 2e4])
    y = np.array([c, c + 1.0e4, c])
    z = np.full(3, 50.0)
    xs, ys, _, st = _run(fs, AdvectionRK4, x, y, z, dt_s=450, runtime_s=DAY // 4)
    r0 = np.hypot(x - c, y - c)
    r1 = np.hypot(xs - c, ys - c)
    np.testing.assert_allclose(r1, r0, rtol=2e-3)


def test_uxcache_out_of_mesh_error_preserved(monkeypatch):
    """A lane leaving the mesh raises the same typed error in both modes."""
    from parcels_tpu import FieldOutOfBoundError

    ds = delaunay_flow_dataset(
        flow="uniform", placement="node", vertical="zf", nx=16, ny=16,
        extent=1e4, nz=4, u0=5.0, v0=0.0,
    )
    for mode in ("off", "force"):
        monkeypatch.setenv("PARCELS_TPU_UXCACHE", mode)
        monkeypatch.setenv("PARCELS_TPU_UXCOL", "force")
        fs = FieldSet.from_ugrid_conventions(ds, mesh="flat")
        pset = ParticleSet(fs, x=[9.5e3], y=[5e3], z=[50.0], t=[0.0])
        with pytest.raises(FieldOutOfBoundError):
            pset.execute(
                AdvectionRK4,
                dt=np.timedelta64(300, "s"),
                runtime=np.timedelta64(3600, "s"),
            )
