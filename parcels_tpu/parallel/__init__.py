"""Multi-chip / multi-host scaling over jax.sharding meshes.

Two scaling modes (composable with every kernel/interpolator):

- :class:`ParticleMesh` — particle data parallelism with replicated fields.
  Right when the forcing fields fit on every chip.
- :class:`YBandDomain` — Y-band field domain decomposition with halo slabs
  and per-step neighbor particle migration over ICI. Right when fields are
  too large to replicate.

Bind either to a ParticleSet with :func:`shard_particleset`; subsequent
``execute()`` calls run sharded. Multi-host runs additionally call
``jax.distributed.initialize()`` before constructing the mesh.
"""

from parcels_tpu.parallel.domain import YBandDomain, build_domain_executor
from parcels_tpu.parallel.sharding import ParticleMesh, init_distributed, shard_particleset

__all__ = ["ParticleMesh", "YBandDomain", "build_domain_executor", "init_distributed", "shard_particleset"]
