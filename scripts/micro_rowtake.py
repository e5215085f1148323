"""Row-gather microbench: permute a packed (N, C) SoA vs C separate takes."""

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
    key = jax.random.PRNGKey(0)
    order = jax.random.permutation(key, N).astype(jnp.int32)
    for C in (4, 8, 16):
        mat = jax.random.uniform(key, (N, C), jnp.float32)
        f = jax.jit(lambda m, o: jnp.take(m, o, axis=0))
        t = timed(f, mat, order)
        print(f"row-take (N,{C}) f32: {t*1e3:.1f} ms ({N*C*4/t/1e9:.1f} GB/s)")
        fs = jax.jit(lambda m, o: jnp.stack([jnp.take(m[:, i], o) for i in range(m.shape[1])], 1))
        t = timed(fs, mat, order)
        print(f"  vs {C} col-takes:  {t*1e3:.1f} ms")
    # nearly-sorted order (realistic steady state)
    near = jnp.clip(jnp.arange(N, dtype=jnp.int32) + jax.random.randint(key, (N,), -64, 64), 0, N - 1)
    mat = jax.random.uniform(key, (N, 8), jnp.float32)
    f = jax.jit(lambda m, o: jnp.take(m, o, axis=0))
    t = timed(f, mat, near)
    print(f"row-take (N,8) nearly-sorted: {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
