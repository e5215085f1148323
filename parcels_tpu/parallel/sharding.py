"""Multi-chip scaling: particle sharding over a jax device mesh.

The reference has no distributed backend (SURVEY.md §2.2); this layer is
designed TPU-first:

- **Particle data parallelism**: the SoA pytree is sharded over a 1-D (or
  the 'particles' axis of an N-D) `jax.sharding.Mesh`. Every per-particle
  op in the jitted engine is embarrassingly parallel; XLA inserts only the
  tiny cross-chip ANY-reductions for the while-loop condition, which ride
  ICI. Capacity is padded to a multiple of the axis size with inactive
  lanes (static shapes).
- **Field replication / domain decomposition**: small forcing fields are
  replicated; large fields can be domain-decomposed along Y with halo rows
  (see `parcels_tpu.parallel.domain`), with particles migrating between
  bands via the deterministic mask-resort in `migrate_sorted`.

Works identically on a virtual 8-device CPU mesh
(``--xla_force_host_platform_device_count=8``) and a real TPU slice;
multi-host runs only need `jax.distributed.initialize` before mesh creation.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ParticleMesh", "init_distributed", "shard_particleset"]


def init_distributed(**kwargs) -> int:
    """Initialize the multi-host JAX runtime (call before building meshes).

    Thin wrapper over ``jax.distributed.initialize`` (coordinator address,
    process id/count from env or kwargs). Returns the process index. On a
    single host this is a no-op returning 0, so scripts are portable between
    1 host and N hosts.
    """
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        # single-process / already-initialized runs
        pass
    return jax.process_index()


class ParticleMesh:
    """A 1-D device mesh for particle data parallelism."""

    def __init__(self, n_devices: int | None = None, axis: str = "particles", devices=None):
        if devices is None:
            devices = jax.devices()
            if n_devices is not None:
                devices = devices[:n_devices]
        self.axis = axis
        self.mesh = Mesh(np.asarray(devices), (axis,))

    @property
    def n(self) -> int:
        return self.mesh.devices.size

    def particle_sharding(self, ndim: int = 1) -> NamedSharding:
        spec = (self.axis,) + (None,) * (ndim - 1)
        return NamedSharding(self.mesh, P(*spec))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def shard_soa(self, pdata: dict) -> dict:
        """Pad the SoA to a multiple of the axis size and shard every array.

        Padding lanes are marked inactive (validity mask False), so the
        engine never advances or writes them.

        Multi-process (``jax.process_count() > 1``): every process passes the
        SAME global host SoA (seeding is deterministic); each process ships
        only its own slice and the result is a global ``jax.Array`` over the
        full mesh — the standard SPMD construction
        (``jax.make_array_from_process_local_data``).
        """
        n = next(v.shape[0] for k, v in pdata.items() if k != "_rng")
        pad = (-n) % self.n
        multiproc = jax.process_count() > 1
        out = {}
        for k, v in pdata.items():
            v = np.asarray(v)
            if k == "_rng":
                out[k] = self._put_replicated(jnp.asarray(v))
                continue
            if pad:
                fill = np.zeros((pad,) + v.shape[1:], dtype=v.dtype)
                if k in ("particle_id", "_sc_key", "_uxc_key"):
                    # -1 sentinels: padded lanes must never look like live
                    # ids or valid persistent-cache cells (cell 0 is real)
                    fill = fill - 1
                v = np.concatenate([v, fill], axis=0)
            if k == "_active" and pad:
                v[n:] = False
            sh = self.particle_sharding(v.ndim)
            if multiproc:
                total = v.shape[0]
                per_proc = total // jax.process_count()
                lo = jax.process_index() * per_proc
                out[k] = jax.make_array_from_process_local_data(
                    sh, v[lo : lo + per_proc], v.shape
                )
            else:
                out[k] = jax.device_put(jnp.asarray(v), sh)
        return out

    def gather_soa(self, pdata: dict) -> dict:
        """Pull the sharded SoA back to host numpy on every process.

        Single-process: plain device-to-host copies. Multi-process: a
        ``process_allgather`` so every host sees the full global SoA
        (trajectory output and host-side seeding need global state)."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            return {
                k: np.asarray(multihost_utils.process_allgather(v, tiled=True))
                if k != "_rng"
                else np.asarray(v)
                for k, v in pdata.items()
            }
        return {k: np.asarray(v) for k, v in pdata.items()}

    def _put_replicated(self, a):
        rep = self.replicated()
        if jax.process_count() > 1:
            return jax.make_array_from_callback(a.shape, rep, lambda idx: np.asarray(a)[idx])
        return jax.device_put(a, rep)

    def shard_fields(self, farrays: dict) -> dict:
        """Replicate field/grid arrays across the mesh (multi-process safe)."""
        return jax.tree_util.tree_map(self._put_replicated, farrays)


def shard_particleset(pset, pmesh):
    """Bind a ParticleSet to a ParticleMesh or YBandDomain: future execute()
    calls run sharded over the corresponding device mesh."""
    from parcels_tpu.parallel.domain import YBandDomain
    from parcels_tpu.parallel.tiles import XYTileDomain

    if isinstance(pmesh, (YBandDomain, XYTileDomain)):
        pset._domain = pmesh
    else:
        pset._pmesh = pmesh
    return pset
