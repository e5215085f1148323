"""Microbenchmarks for the binned large-field sampler design (TPU).

Measures, on the attached chip, the primitives the sorted-slab sampler
needs (see ops/interp_kernels.py docstring):
  1. sort_key_val of 10M int32 keys + payload (bin the particles)
  2. take (permute) of 10M f32 (reorder the SoA / scatter results back)
  3. segment offsets via searchsorted over sorted keys
  4. baseline: 16-corner flat gather from a ~100 MB field (status quo)
All data generated on device (the tunnel stalls on large transfers).
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 10_000_000


def timed(fn, *args, n=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    # host read to defeat any async-return weirdness over the tunnel
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print("backend:", jax.default_backend(), jax.devices())
    key = jax.random.PRNGKey(0)
    kk, kv, kf = jax.random.split(key, 3)
    keys = jax.random.randint(kk, (N,), 0, 16384, dtype=jnp.int32)
    vals = jnp.arange(N, dtype=jnp.int32)
    payload = jax.random.uniform(kv, (N,), jnp.float32)

    f_sort = jax.jit(lambda k, v: jax.lax.sort_key_val(k, v))
    t = timed(f_sort, keys, vals)
    print(f"sort_key_val 10M int32: {t*1e3:.1f} ms")

    skeys, sorder = f_sort(keys, vals)

    f_take = jax.jit(lambda p, o: jnp.take(p, o))
    t = timed(f_take, payload, sorder)
    print(f"take 10M f32 by permutation: {t*1e3:.1f} ms")

    f_scatter = jax.jit(lambda p, o: jnp.zeros_like(p).at[o].set(p))
    t = timed(f_scatter, payload, sorder)
    print(f"scatter 10M f32 by permutation: {t*1e3:.1f} ms")

    f_seg = jax.jit(lambda sk: jnp.searchsorted(sk, jnp.arange(16384, dtype=jnp.int32)))
    t = timed(f_seg, skeys)
    print(f"searchsorted 16k bins over 10M sorted keys: {t*1e3:.1f} ms")

    # argsort comparison (single-op path)
    f_argsort = jax.jit(lambda k: jnp.argsort(k))
    t = timed(f_argsort, keys)
    print(f"argsort 10M int32: {t*1e3:.1f} ms")

    # status quo: 16-corner gather from a (2, 50, 500, 500) field
    field = jax.random.uniform(kf, (2, 50, 500, 500), jnp.float32)
    T, Z, Y, X = field.shape
    ky, kx, kz = jax.random.split(kv, 3)
    n2 = 2_000_000
    yi = jax.random.randint(ky, (n2,), 0, Y - 1)
    xi = jax.random.randint(kx, (n2,), 0, X - 1)
    zi = jax.random.randint(kz, (n2,), 0, Z - 1)

    def corner16(f, zi, yi, xi):
        flat = f.reshape(-1)
        val = jnp.zeros(zi.shape, jnp.float32)
        for dt_ in (0, 1):
            for dz in (0, 1):
                for dy in (0, 1):
                    for dx in (0, 1):
                        idx = ((dt_ * Z + zi + dz) * Y + yi + dy) * X + xi + dx
                        val = val + jnp.take(flat, idx, mode="clip")
        return val

    f_g = jax.jit(lambda f, zi, yi, xi: corner16(f, zi, yi, xi))
    t = timed(f_g, field, zi, yi, xi)
    print(f"16-corner gather, 2M samples, 100MB field: {t*1e3:.1f} ms -> {n2/t/1e6:.1f} M samples/s")


if __name__ == "__main__":
    main()
