"""Multi-chip / multi-host scaling over jax.sharding meshes."""

from parcels_tpu.parallel.sharding import ParticleMesh, shard_particleset

__all__ = ["ParticleMesh", "shard_particleset"]
