"""The ``particles`` object passed to kernels inside the jitted engine.

Replaces the reference's masked write-through ParticleSetView
(src/parcels/_core/particlesetview.py). Attribute reads return the full
traced array; attribute writes are merged back into the shared SoA dict
under the engine-supplied lane mask, which reproduces the reference's
"kernel runs on the masked subset, writes go to the parent SoA" semantics
without any dynamic shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["Particles"]


class Particles:
    """Masked write-through view over the particle SoA used inside kernels."""

    __slots__ = ("_data", "_mask", "_sorted_hint", "_lockstep_hint", "_z_occ_hint")

    def __init__(
        self,
        data: dict,
        mask,
        sorted_hint: bool = False,
        lockstep_hint: int = 0,
        z_occ_hint: float | None = None,
    ):
        object.__setattr__(self, "_data", data)
        object.__setattr__(self, "_mask", mask)
        # static trace-time hint: the engine keeps the SoA spatially sorted,
        # enabling the binned slab sampler (ops/binned_sample.py)
        object.__setattr__(self, "_sorted_hint", sorted_hint)
        # static trace-time hint: evaluated lanes bracket within this many
        # time levels, enabling the cond-free windowed sample
        # (ops/interp_kernels.py linear_sample_windowed)
        object.__setattr__(self, "_lockstep_hint", lockstep_hint)
        # static trace-time hint: quantized occupied-z fraction of the batch,
        # captured at executor-build time (binned-sampler bin planning)
        object.__setattr__(self, "_z_occ_hint", z_occ_hint)

    def __getattr__(self, name):
        try:
            return self._data[name]
        except KeyError as e:
            raise AttributeError(f"Particles have no variable {name!r}") from e

    def __setattr__(self, name, value):
        d = self._data
        if name not in d:
            raise AttributeError(
                f"Particles have no variable {name!r}; add it to the ParticleClass first."
            )
        old = d[name]
        value = jnp.asarray(value)
        if value.dtype != old.dtype:
            value = value.astype(old.dtype)
        value = jnp.broadcast_to(value, old.shape)
        mask = self._mask
        if old.ndim == 2:  # e.g. ei (n, ngrids)
            mask = mask[:, None]
        d[name] = jnp.where(mask, value, old)

    # -- engine/internal helpers -------------------------------------------
    def _set_ei(self, igrid: int, values):
        """Masked update of the cached element index for one grid."""
        d = self._data
        ei = d["ei"]
        new_col = jnp.where(self._mask, values.astype(ei.dtype), ei[:, igrid])
        d["ei"] = ei.at[:, igrid].set(new_col)

    def _get_ei(self, igrid: int):
        return self._data["ei"][:, igrid]

    def random_normal(self, dtype=jnp.float32):
        """Per-particle standard normals from the counter-based engine RNG.

        TPU-native replacement for the reference kernels' np.random.normal
        (reference kernels/_advectiondiffusion.py:37): the key lives in the
        SoA, is split on every draw, and therefore gives deterministic,
        reproducible streams under jit and across shardings.
        """
        d = self._data
        key = d["_rng"]
        new_key, sub = jax.random.split(jax.random.wrap_key_data(key, impl="threefry2x32"))
        d["_rng"] = jax.random.key_data(new_key)
        n = d["state"].shape[0]
        return jax.random.normal(sub, (n,), dtype=dtype)

    def random_uniform(self, dtype=jnp.float32):
        """Per-particle uniform(0,1) draws from the engine RNG."""
        d = self._data
        key = d["_rng"]
        new_key, sub = jax.random.split(jax.random.wrap_key_data(key, impl="threefry2x32"))
        d["_rng"] = jax.random.key_data(new_key)
        n = d["state"].shape[0]
        return jax.random.uniform(sub, (n,), dtype=dtype)

    def __len__(self):
        return self._data["state"].shape[0]

    def __repr__(self):
        return f"Particles(n={len(self)}, vars={list(self._data)})"
