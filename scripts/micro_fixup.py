"""Probe: cost of the binned-sampler overflow fix-up pieces on TPU."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n = 2_000_000
    K = n // 48
    shape4 = (2, 50, 500, 500)
    key = jax.random.PRNGKey(0)
    kd, ko, ki = jax.random.split(key, 3)
    data = jax.random.uniform(kd, shape4, jnp.float32)
    ov = jax.random.uniform(ko, (n,)) < 0.01
    idxs = jax.random.randint(ki, (4, K), 0, 400)

    @jax.jit
    def cumsum(ov):
        return jnp.cumsum(ov.astype(jnp.int32))

    t = timed(cumsum, ov)
    print(f"cumsum 2M:            {t*1e3:7.2f} ms", flush=True)

    @jax.jit
    def compact(ov):
        cum = jnp.cumsum(ov.astype(jnp.int32))
        pos = jnp.where(ov, cum - 1, K)
        return jnp.zeros((K,), jnp.int32).at[pos].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop"
        )

    t = timed(compact, ov)
    print(f"cumsum+scatter 2M->K: {t*1e3:7.2f} ms", flush=True)

    from parcels_tpu.ops import binned_sample as bs

    @jax.jit
    def g16(data, idxs):
        gidx = {
            ax: (idxs[i] % dim, jnp.full((K,), 0.3, jnp.float32))
            for i, (ax, dim) in enumerate(zip("TZYX", shape4))
        }
        return bs._gather16(data, gidx)

    t = timed(g16, data, idxs)
    print(f"gather16 at K={K}:  {t*1e3:7.2f} ms", flush=True)

    @jax.jit
    def scatter_back(vals, idx, fixed):
        return vals.at[idx].set(fixed)

    vals = jnp.zeros((n,), jnp.float32)
    idx = jax.random.randint(ki, (K,), 0, n)
    fixed = jnp.ones((K,), jnp.float32)
    t = timed(scatter_back, vals, idx, fixed)
    print(f"scatter-back K->2M:   {t*1e3:7.2f} ms", flush=True)

    @jax.jit
    def searchsorted_compact(ov):
        cum = jnp.cumsum(ov.astype(jnp.int32))
        return jnp.searchsorted(cum, jnp.arange(1, K + 1, dtype=jnp.int32))

    t = timed(searchsorted_compact, ov)
    print(f"cumsum+searchsorted:  {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
