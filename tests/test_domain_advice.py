"""Pins for the round-4 ADVICE findings on the band machinery.

- mis-sized custom row_edges must raise (not silently fall back)
- slab_headroom gives rebalance() room under the compiled slab lock, and
  a locked domain warns instead of silently no-opping
- set_row_edges() flipping the resolved migration transport must not
  reuse a stale compiled executor (the transport keys the cache)
"""

import numpy as np
import pytest

import jax

from parcels_tpu import FieldSet, ParticleSet
from parcels_tpu.datasets import simple_UV_dataset
from parcels_tpu.kernels import AdvectionRK4
from parcels_tpu.parallel import YBandDomain, shard_particleset

needs_mesh = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device virtual mesh"
)


def _fs(ny=32, v=10.0):
    ds = simple_UV_dataset(dims=(2, 2, ny, 8), mesh="flat")
    ds["U"].values[:] = 0.0
    ds["V"].values[:] = v
    return FieldSet.from_sgrid_conventions(ds, mesh="flat")


@needs_mesh
def test_bad_row_edges_raise():
    fs = _fs(ny=32)
    # wrong ydim endpoint
    with pytest.raises(ValueError, match="row_edges"):
        YBandDomain(fs, n_bands=8, halo=2, row_edges=np.arange(9) * 3)  # ends at 24 != 31
    # wrong length
    with pytest.raises(ValueError, match="row_edges"):
        YBandDomain(fs, n_bands=8, halo=2, row_edges=[0, 16, 32])
    # non-monotone
    bad = [0, 8, 4, 12, 16, 20, 24, 28, 32]
    with pytest.raises(ValueError, match="row_edges"):
        YBandDomain(fs, n_bands=8, halo=2, row_edges=bad)


@needs_mesh
def test_rebalance_locked_uniform_warns():
    """Uniform edges that divide ydim lock the slab with no slack: the
    documented rebalance() silent no-op must warn. (ny nodes = ny-1
    cells; 33 nodes = 32 cells = 4 rows/band exactly.)"""
    fs = _fs(ny=33)
    dom = YBandDomain(fs, n_bands=8, halo=2)
    dom.stacked_farrays()
    y = np.full(64, -7e5)
    x = np.zeros(64)
    with pytest.warns(UserWarning, match="slab_headroom"):
        dom.rebalance(y, x)


@needs_mesh
def test_slab_headroom_lets_rebalance_move_edges():
    fs = _fs(ny=33)
    dom = YBandDomain(fs, n_bands=8, halo=2, slab_headroom=4)
    dom.stacked_farrays()
    rng = np.random.default_rng(0)
    y = rng.uniform(-9.5e5, -6e5, 256)  # clustered south
    x = rng.uniform(-5e5, 5e5, 256)
    edges = dom.rebalance(y, x)
    assert np.any(np.diff(edges) != np.diff(edges)[0]), edges


@needs_mesh
def test_set_row_edges_transport_flip_recompiles():
    """auto migration on uniform edges compiles the neighbor transport;
    switching to non-uniform edges must NOT reuse it (all2all required) —
    the transport is part of the executor cache key."""
    fs = _fs(ny=33)  # 33 rows / 8 bands: ceil lock leaves slack for edits
    dom = YBandDomain(
        fs, n_bands=8, halo=2, headroom=8.0, migration_capacity=64,
        slab_headroom=3,
    )
    n = 32
    x = np.linspace(-6e5, 6e5, n)
    y = np.full(n, -9e5)
    pset = ParticleSet(fs, x=x, y=y, t=np.zeros(n))
    shard_particleset(pset, dom)
    assert dom.migration_mode == "neighbor"
    pset.execute(AdvectionRK4, dt=np.timedelta64(600, "s"),
                 runtime=np.timedelta64(14400, "s"))
    # non-uniform partition within the slab lock (32 cells; max band 7
    # rows <= locked 11 - 2*halo)
    edges = np.array([0, 4, 8, 12, 16, 19, 22, 25, 32])
    dom.set_row_edges(edges)
    assert dom.migration_mode == "all2all"
    pset.execute(AdvectionRK4, dt=np.timedelta64(600, "s"),
                 runtime=np.timedelta64(72000, "s"))
    order = np.argsort(pset.particle_id)
    # multiband crossers delivered correctly through the rebuilt executor
    np.testing.assert_allclose(pset.y[order], -9e5 + 10.0 * 86400, rtol=1e-5)
    assert len(pset) == n
