"""Multi-chip / multi-host scaling over jax.sharding meshes.

Two scaling modes (composable with every kernel/interpolator):

- :class:`ParticleMesh` — particle data parallelism with replicated fields.
  Right when the forcing fields fit on every chip.
- :class:`YBandDomain` — Y-band field domain decomposition with halo slabs
  and per-step neighbor particle migration over ICI. Right when fields are
  too large to replicate.
- :class:`XYTileDomain` — 2-D (lat x lon) tile decomposition with corner
  halos and direct all_to_all migration. Right at high device counts on
  wide-aspect grids, where thin Y-bands inflate the halo fraction.

Bind either to a ParticleSet with :func:`shard_particleset`; subsequent
``execute()`` calls run sharded. Multi-host runs additionally call
``jax.distributed.initialize()`` before constructing the mesh.
"""

from parcels_tpu.parallel.domain import YBandDomain, build_domain_executor
from parcels_tpu.parallel.sharding import ParticleMesh, init_distributed, shard_particleset
from parcels_tpu.parallel.tiles import XYTileDomain, build_tile_executor

__all__ = [
    "ParticleMesh",
    "XYTileDomain",
    "YBandDomain",
    "build_domain_executor",
    "build_tile_executor",
    "init_distributed",
    "shard_particleset",
]
