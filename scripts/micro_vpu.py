"""What does a fused elementwise pass actually cost at 10M lanes?

The hit-path micro showed ~100-140 ms for the stage-cache hit core — far
above both the flop bound (~2 ms) and the bandwidth bound (~3 ms at
saxpy-measured 652 GB/s). This ladder isolates: (a) streams (input
array count), (b) op depth, (c) transcendental count, (d) the (4, n)
stack pattern from _bilinear_inverse, (e) select/where chains — to find
which dimension the real cost scales with.

Run: python scripts/micro_vpu.py  (env: N)
"""

import os
import sys
import time

_d = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [_d, os.path.dirname(_d)]  # scripts dir + repo root

import numpy as np

import jax
import jax.numpy as jnp

N = int(os.environ.get("N", 10_000_000))


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
    print(f"device={jax.devices()[0].platform} n={N}")
    key = jax.random.PRNGKey(0)

    # (a) streams: s input arrays, 1 multiply-add each
    for s in (2, 8, 16, 32):
        arrs = [jax.random.uniform(jax.random.fold_in(key, i), (N,), jnp.float32) for i in range(s)]
        jax.block_until_ready(arrs)

        def f(*xs):
            acc = xs[0]
            for a in xs[1:]:
                acc = acc * 1.0001 + a
            return acc

        t = timed(jax.jit(f), *arrs)
        gb = s * N * 4 / 2**30
        print(f"streams={s:3d} (1 fma each):   {t*1e3:7.1f} ms  ({gb/t:6.1f} GiB/s)")

    # (b) op depth: 2 streams, k fmas
    a = jax.random.uniform(key, (N,), jnp.float32)
    b = jax.random.uniform(jax.random.fold_in(key, 1), (N,), jnp.float32)
    for k in (8, 32, 128, 512):
        def f(a, b, k=k):
            acc = a
            for i in range(k):
                acc = acc * 1.0000001 + b
            return acc

        t = timed(jax.jit(f), a, b)
        print(f"depth={k:4d} fma, 2 streams:  {t*1e3:7.1f} ms  ({k*N/t/1e12:5.2f} Tflop-pair/s)")

    # (c) transcendentals
    for k in (2, 8, 16):
        def f(a, k=k):
            acc = a
            for i in range(k):
                acc = jnp.cos(acc * 0.9)
            return acc

        t = timed(jax.jit(f), a)
        print(f"cos x{k:3d}:                   {t*1e3:7.1f} ms  ({k*N/t/1e9:5.2f} G transc/s)")

    # (d) the (4, n) stack + reduce pattern
    rows = [jax.random.uniform(jax.random.fold_in(key, 10 + i), (N,), jnp.float32) for i in range(4)]
    jax.block_until_ready(rows)

    def f_stack(*rs):
        px = jnp.stack([jnp.zeros_like(rs[0]), rs[0], rs[1], rs[2]])
        return (px * 1.5).sum(axis=0) + rs[3]

    t = timed(jax.jit(f_stack), *rows)
    print(f"(4,n) stack+reduce:          {t*1e3:7.1f} ms")

    def f_flat(*rs):
        return (rs[0] + rs[1] + rs[2]) * 1.5 + rs[3]

    t = timed(jax.jit(f_flat), *rows)
    print(f"same math, flat:             {t*1e3:7.1f} ms")

    # (e) select chains
    m = a > 0.5
    for k in (4, 16):
        def f(a, b, m, k=k):
            acc = a
            for i in range(k):
                acc = jnp.where(m, acc * 1.01, acc + b)
            return acc

        t = timed(jax.jit(f), a, b, m)
        print(f"where x{k:3d}:                 {t*1e3:7.1f} ms")

    # (f) div + sqrt + rsqrt
    for name, op in (("sqrt", jnp.sqrt), ("div", lambda z: 1.0 / (z + 1.5))):
        def f(a, op=op):
            acc = a
            for i in range(8):
                acc = op(acc * acc + 1.0)
            return acc

        t = timed(jax.jit(f), a)
        print(f"{name} x8:                     {t*1e3:7.1f} ms")

    # (g) int32 compare/convert mix (the hit-check bookkeeping flavor)
    ti = jax.random.randint(key, (N,), 0, 50, jnp.int32)

    def f_book(ti, a):
        hit = (ti == 25) & (a > 0.2) & jnp.isfinite(a)
        cnt = jnp.sum(hit.astype(jnp.int32))
        return cnt, jnp.where(hit, a, 0.0)

    t = timed(jax.jit(f_book), ti, a)
    print(f"bookkeeping (cmp+sum+where): {t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
