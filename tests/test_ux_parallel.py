"""Unstructured scale-out: ux fieldsets under ParticleMesh (VERDICT r5 #4).

The triangular mesh (face table, lookup raster, adjacency, node columns)
is replicated across the device mesh; the particle SoA — including the
per-face stage-cache columns — is sharded. The jitted engine then runs
SPMD with only the while-condition ANY-reductions crossing chips, and
results must match the single-device run exactly.
"""

import numpy as np
import pytest

import jax

from parcels_tpu import FieldSet, ParticleSet
from parcels_tpu.datasets.unstructured import delaunay_flow_dataset
from parcels_tpu.kernels import AdvectionRK4, AdvectionRK4_3D
from parcels_tpu.parallel import ParticleMesh, shard_particleset

needs_mesh = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device virtual mesh"
)


def _build(flow="rotation", with_w=False):
    ds = delaunay_flow_dataset(
        flow=flow, placement="node", vertical="zf", nx=20, ny=20,
        extent=1e5, maxdepth=100.0, nz=5, with_w=with_w,
    )
    return FieldSet.from_ugrid_conventions(ds, mesh="flat")


def _run(fs, kernel, x, y, z, pmesh=None, dt_s=600, runtime_s=6 * 3600):
    pset = ParticleSet(fs, x=x.copy(), y=y.copy(), z=z.copy(), t=np.zeros(x.size))
    if pmesh is not None:
        shard_particleset(pset, pmesh)
    pset.execute(
        kernel, dt=np.timedelta64(dt_s, "s"), runtime=np.timedelta64(runtime_s, "s")
    )
    order = np.argsort(pset.particle_id)
    return pset.x[order], pset.y[order], pset.z[order]


@needs_mesh
def test_ux_particlemesh_matches_single_device():
    rng = np.random.default_rng(0)
    n = 111  # deliberately NOT a multiple of 8: exercises capacity padding
    x = rng.uniform(2.5e4, 7.5e4, n)
    y = rng.uniform(2.5e4, 7.5e4, n)
    z = rng.uniform(10.0, 90.0, n)
    ref = _run(_build(), AdvectionRK4, x, y, z)
    got = _run(_build(), AdvectionRK4, x, y, z, pmesh=ParticleMesh(n_devices=8))
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g, r, rtol=1e-6, atol=1e-4)


@needs_mesh
def test_ux_particlemesh_3d_helix_with_cache_columns(monkeypatch):
    """3-D UVW ux run, sharded, with the per-face cache columns forced on:
    the cache SoA columns must shard/pad/unshard transparently."""
    monkeypatch.setenv("PARCELS_TPU_UXCACHE", "force")
    monkeypatch.setenv("PARCELS_TPU_UXCOL", "force")
    rng = np.random.default_rng(1)
    n = 64
    x = rng.uniform(3e4, 7e4, n)
    y = rng.uniform(3e4, 7e4, n)
    z = rng.uniform(20.0, 60.0, n)
    ref = _run(_build(flow="helix", with_w=True), AdvectionRK4_3D, x, y, z,
               dt_s=450, runtime_s=2 * 3600)
    got = _run(_build(flow="helix", with_w=True), AdvectionRK4_3D, x, y, z,
               pmesh=ParticleMesh(n_devices=8), dt_s=450, runtime_s=2 * 3600)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g, r, rtol=1e-6, atol=1e-4)


@needs_mesh
def test_ux_particlemesh_rotation_closed_form():
    rng = np.random.default_rng(2)
    n = 96
    c = 5e4
    th = rng.uniform(0, 2 * np.pi, n)
    r = rng.uniform(5e3, 3e4, n)
    x = c + r * np.cos(th)
    y = c + r * np.sin(th)
    z = np.full(n, 40.0)
    xs, ys, _ = _run(_build(), AdvectionRK4, x, y, z, pmesh=ParticleMesh(n_devices=8))
    np.testing.assert_allclose(np.hypot(xs - c, ys - c), r, rtol=5e-3)
