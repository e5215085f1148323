"""2-D (Y x X) tile decomposition (parallel/tiles.py; VERDICT r5 task 8).

A (2, 4) tile grid over the 8-device virtual mesh must reproduce the
single-device trajectories exactly, including diagonal (corner-neighbor)
migration, and keep the halo diagnostic of the band path.
"""

import numpy as np
import pytest

import jax

from parcels_tpu import FieldSet, ParticleSet
from parcels_tpu.datasets import simple_UV_dataset
from parcels_tpu.kernels import AdvectionRK4
from parcels_tpu.parallel import XYTileDomain, shard_particleset

needs_mesh = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device virtual mesh"
)


def _build(u, v, dims=(2, 2, 16, 32)):
    ds = simple_UV_dataset(dims=dims, mesh="flat")
    ds["U"].values[:] = u
    ds["V"].values[:] = v
    return FieldSet.from_sgrid_conventions(ds, mesh="flat")


def _run(fs, x, y, domain=None, dt_s=600, runtime_s=86400):
    pset = ParticleSet(fs, x=x.copy(), y=y.copy(), t=np.zeros(x.size))
    if domain is not None:
        shard_particleset(pset, domain)
    pset.execute(
        AdvectionRK4, dt=np.timedelta64(dt_s, "s"), runtime=np.timedelta64(runtime_s, "s")
    )
    assert len(pset) == x.size, "tiled run lost particles"
    order = np.argsort(pset.particle_id)
    return pset.x[order], pset.y[order]


@needs_mesh
def test_tiles_2x4_matches_single_device_diagonal_flow():
    """Diagonal flow: every mover crosses tile CORNERS — the direct
    all_to_all delivery must route them in one exchange."""
    u, v = 7.0, 10.0
    rng = np.random.default_rng(0)
    n = 96
    x0 = rng.uniform(-9e5, 1.5e5, n)
    y0 = rng.uniform(-9e5, 0.5e5, n)
    xs, ys = _run(_build(u, v), x0, y0)
    fs = _build(u, v)
    dom = XYTileDomain(fs, tiles=(2, 4), halo=2)
    assert dom.migration_mode == "all2all"
    xd, yd = _run(fs, x0, y0, domain=dom)
    np.testing.assert_allclose(xd, xs, rtol=1e-6, atol=1e-3)
    np.testing.assert_allclose(yd, ys, rtol=1e-6, atol=1e-3)
    # closed form
    np.testing.assert_allclose(xd, x0 + u * 86400, rtol=1e-5)
    np.testing.assert_allclose(yd, y0 + v * 86400, rtol=1e-5)


@needs_mesh
def test_tiles_4x2_rotation_matches_single_device():
    """Solid-body-like shear flow exercising migration in all directions."""
    ds = simple_UV_dataset(dims=(2, 2, 24, 24), mesh="flat")
    ny, nx = 24, 24
    yy = np.linspace(-1, 1, ny)[None, None, :, None]
    xx = np.linspace(-1, 1, nx)[None, None, None, :]
    omega = 2 * np.pi / 86400.0
    ds["U"].values[:] = (-yy * omega * 1e6 * np.ones((2, 2, ny, nx))).astype(np.float32)
    ds["V"].values[:] = (xx * omega * 1e6 * np.ones((2, 2, ny, nx))).astype(np.float32)

    def build():
        return FieldSet.from_sgrid_conventions(ds, mesh="flat")

    rng = np.random.default_rng(1)
    n = 64
    x0 = rng.uniform(-4e5, 4e5, n)
    y0 = rng.uniform(-4e5, 4e5, n)
    xs, ys = _run(build(), x0, y0, dt_s=450, runtime_s=86400 // 4)
    dom = XYTileDomain(build(), tiles=(4, 2), halo=3)
    xd, yd = _run(dom.fieldset, x0, y0, domain=dom, dt_s=450, runtime_s=86400 // 4)
    # local-slab searchsorted vs global uniform bracket: f32 rounding at
    # the ~3e-6 relative level on meter-scale coordinates
    np.testing.assert_allclose(xd, xs, rtol=1e-5, atol=1.0)
    np.testing.assert_allclose(yd, ys, rtol=1e-5, atol=1.0)


@needs_mesh
def test_tiles_halo_violation_raises():
    """A lane out-running its tile's halo in one step must raise the
    actionable increase-halo message, never silently clamp."""
    fs = _build(2000.0, 0.0)  # 2 km/s: crosses several tiles per step
    x0 = np.full(8, -9e5)
    y0 = np.linspace(-9e5, 9e5, 8)
    pset = ParticleSet(fs, x=x0, y=y0, t=np.zeros(8))
    shard_particleset(pset, XYTileDomain(fs, tiles=(2, 4), halo=1))
    with pytest.raises(RuntimeError, match="[Hh]alo|overflow"):
        pset.execute(
            AdvectionRK4,
            dt=np.timedelta64(600, "s"),
            runtime=np.timedelta64(86400, "s"),
        )
