"""Row gather/scatter layout shootout (round-4, trace-driven).

The config-5 trace shows XLA storing every (n, C) f32 table col-major
({0,1:T(8,128)}, avoiding minor-dim tile padding) — so a "row" gather or
scatter touches C words strided n*4 B apart. Candidates to beat it:

  - flat 1-D table (cells*32,) + vmap(dynamic_slice) of 32 contiguous
    words (lowers to gather with slice_sizes=(32,))
  - flat 1-D scatter of (K, 32) contiguous windows (lax.scatter with
    update_window_dims)
  vs the jnp.take / .at[].set baselines, random and sorted index order.

All timings are k-chained inside ONE jit with data dependencies
(single-call timings over the tunnel carry ~47 ms fixed dispatch cost).

Run: python scripts/micro_rowio.py  (env: N, CELLS)
"""

import os
import sys
import time

_d = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [_d, os.path.dirname(_d)]  # scripts dir + repo root

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

N = int(os.environ.get("N", 10_000_000))
CELLS = int(os.environ.get("CELLS", 1499 * 1999))
C = 32


def chain_timed(make_fn, k_lo=1, k_hi=5, reps=3):
    """Per-iteration seconds of make_fn(k)'s chained body, tunnel-latency-free."""

    def run(fn):
        out = fn()
        jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
            np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
            best = min(best, time.perf_counter() - t0)
        return best

    lo = run(make_fn(k_lo))
    hi = run(make_fn(k_hi))
    return (hi - lo) / (k_hi - k_lo)


def main():
    print(f"device={jax.devices()[0].platform} n={N} cells={CELLS} width={C}")
    key = jax.random.PRNGKey(0)
    tbl2d = jax.random.uniform(key, (CELLS, C), jnp.float32)
    tbl1d = tbl2d.reshape(-1)
    idx_rand = jax.random.randint(jax.random.fold_in(key, 1), (N,), 0, CELLS, jnp.int32)
    idx_sort = jnp.sort(idx_rand)
    jax.block_until_ready((tbl2d, tbl1d, idx_rand, idx_sort))

    def dep(idx, out):
        # cheap data dependency to serialize chained iterations
        return (idx + out[:, 0].astype(jnp.int32)) % CELLS

    # ---- gathers ----------------------------------------------------------
    def mk_take(idx):
        def make(k):
            @jax.jit
            def f(tbl, idx):
                out = jnp.zeros((N, C), jnp.float32)
                for _ in range(k):
                    out = jnp.take(tbl, idx, axis=0)
                    idx = dep(idx, out)
                return out

            return lambda: f(tbl2d, idx)

        return make

    def mk_slice1d(idx):
        def make(k):
            @jax.jit
            def f(tbl, idx):
                out = jnp.zeros((N, C), jnp.float32)
                for _ in range(k):
                    out = jax.vmap(lambda i: lax.dynamic_slice(tbl, (i * C,), (C,)))(idx)
                    idx = dep(idx, out)
                return out

            return lambda: f(tbl1d, idx)

        return make

    for name, mk in (("jnp.take (cells,32)", mk_take), ("1-D 32-word slice gather", mk_slice1d)):
        for order, idx in (("rand", idx_rand), ("sort", idx_sort)):
            t = chain_timed(mk(idx))
            print(f"gather {name:26s} {order}: {t*1e3:7.1f} ms ({N/t/1e6:7.1f} M rows/s, {N*C*4/t/2**30:6.1f} GiB/s)")

    # ---- scatters ---------------------------------------------------------
    K = N // 64
    kidx_rand = jax.random.randint(jax.random.fold_in(key, 2), (K,), 0, N, jnp.int32)
    kidx_sort = jnp.sort(kidx_rand)
    sub = jax.random.uniform(jax.random.fold_in(key, 3), (K, C), jnp.float32)
    dst2d = jax.random.uniform(jax.random.fold_in(key, 4), (N, C), jnp.float32)
    dst1d = dst2d.reshape(-1)
    jax.block_until_ready((kidx_rand, kidx_sort, sub, dst2d, dst1d))

    def mk_set2d(kidx):
        def make(k):
            @jax.jit
            def f(dst, kidx, sub):
                for _ in range(k):
                    dst = dst.at[kidx].set(sub)
                    kidx = (kidx + dst[0, 0].astype(jnp.int32) + 1) % N
                return dst

            return lambda: f(dst2d, kidx, sub)

        return make

    def mk_scatter1d(kidx):
        dn = lax.ScatterDimensionNumbers(
            update_window_dims=(1,), inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0,),
        )

        def make(k):
            @jax.jit
            def f(dst, kidx, sub):
                for _ in range(k):
                    dst = lax.scatter(
                        dst, (kidx * C)[:, None], sub, dn,
                        indices_are_sorted=False, unique_indices=False,
                    )
                    kidx = (kidx + dst[0].astype(jnp.int32) + 1) % N
                return dst

            return lambda: f(dst1d, kidx, sub)

        return make

    for name, mk, idxs in (
        (".at[].set (n,32)", mk_set2d, (("rand", kidx_rand), ("sort", kidx_sort))),
        ("1-D 32-word window scatter", mk_scatter1d, (("rand", kidx_rand), ("sort", kidx_sort))),
    ):
        for order, kidx in idxs:
            t = chain_timed(mk(kidx))
            print(f"scatter {name:26s} {order}: {t*1e3:7.1f} ms ({K/t/1e6:7.2f} M rows/s)")

    # correctness spot-checks
    g1 = jnp.take(tbl2d, idx_rand[:1000], axis=0)
    g2 = jax.vmap(lambda i: lax.dynamic_slice(tbl1d, (i * C,), (C,)))(idx_rand[:1000])
    assert bool(jnp.all(g1 == g2)), "slice gather mismatch"
    dn = lax.ScatterDimensionNumbers(
        update_window_dims=(1,), inserted_window_dims=(), scatter_dims_to_operand_dims=(0,)
    )
    s1 = dst2d.at[kidx_sort[:1000]].set(sub[:1000])
    s2 = lax.scatter(dst1d, (kidx_sort[:1000] * C)[:, None], sub[:1000], dn).reshape(N, C)
    assert bool(jnp.all(s1 == s2)), "window scatter mismatch"
    print("correctness OK")


if __name__ == "__main__":
    main()
