"""Row gather/scatter, part 2: the 128-wide row-major table hypothesis.

(cells, C<128) f32 tables get col-major layouts (XLA avoids tile padding)
making every row-take C scattered granule fetches (~1 G words/s = 4 GB/s
effective, measured). A (cells, 128) f32 row = exactly one 512 B HBM
granule and needs no padding, so XLA should keep it row-major and a
row-take should approach granule bandwidth. NOTE: the 1-D
vmap(dynamic_slice) variant from micro_rowio.py CRASHES the TPU worker
(kernel fault) — do not re-add it.

Run: python scripts/micro_rowio2.py  (env: N, CELLS)
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
CELLS = int(os.environ.get("CELLS", 1499 * 1999))


def chain_timed(make_fn, k_lo=1, k_hi=5, reps=3):
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
    print(f"device={jax.devices()[0].platform} n={N} cells={CELLS}")
    key = jax.random.PRNGKey(0)
    idx_rand = jax.random.randint(jax.random.fold_in(key, 1), (N,), 0, CELLS, jnp.int32)
    jax.block_until_ready(idx_rand)

    for W, take_cols in ((128, 25), (64, 25), (32, 32), (100, 25)):
        tbl = jax.random.uniform(key, (CELLS, W), jnp.float32)
        jax.block_until_ready(tbl)

        def make(k, tbl=tbl, W=W, take_cols=take_cols):
            @jax.jit
            def f(tbl, idx):
                out = jnp.zeros((N, take_cols), jnp.float32)
                for _ in range(k):
                    r = jnp.take(tbl, idx, axis=0)
                    out = r[:, :take_cols]
                    idx = (idx + out[:, 0].astype(jnp.int32)) % CELLS
                return out

            return lambda: f(tbl, idx_rand)

        t = chain_timed(make)
        print(f"take (cells,{W:3d})[: , :{take_cols}]: {t*1e3:7.1f} ms "
              f"({N/t/1e6:7.1f} M rows/s, {N*W*4/t/2**30:6.1f} GiB/s logical)")
        del tbl

    # consumer-fused variant: gather feeds arithmetic, no materialized slice
    tbl = jax.random.uniform(key, (CELLS, 128), jnp.float32)
    jax.block_until_ready(tbl)

    def make_fused(k):
        @jax.jit
        def f(tbl, idx, q):
            acc = q
            for _ in range(k):
                r = jnp.take(tbl, idx, axis=0)
                acc = r[:, 0] * q + r[:, 3] * acc + r[:, 24]
                idx = (idx + acc.astype(jnp.int32)) % CELLS
            return acc

        q = jnp.ones((N,), jnp.float32)
        return lambda: f(tbl, idx_rand, q)

    t = chain_timed(make_fused)
    print(f"take (cells,128) fused-consume:  {t*1e3:7.1f} ms ({N/t/1e6:7.1f} M rows/s)")

    # scatter: narrow quads (K,4) into (n,4) vs packed (K,16) into (n,16)
    from jax import lax

    K = N // 64
    kidx = jax.random.randint(jax.random.fold_in(key, 2), (K,), 0, N, jnp.int32)
    for W in (1, 4, 16):
        dst = jax.random.uniform(jax.random.fold_in(key, 3), (N, W), jnp.float32)
        sub = jax.random.uniform(jax.random.fold_in(key, 4), (K, W), jnp.float32)
        jax.block_until_ready((dst, sub))

        def make(k, dst=dst, sub=sub):
            @jax.jit
            def f(dst, kidx, sub):
                for _ in range(k):
                    dst = dst.at[kidx].set(sub)
                    kidx = (kidx + dst[0, 0].astype(jnp.int32) + 1) % N
                return dst

            return lambda: f(dst, kidx, sub)

        t = chain_timed(make)
        print(f"scatter K=n/64 (n,{W:2d}) .at.set:  {t*1e3:7.1f} ms ({K*W/t/1e6:7.1f} M words/s)")


if __name__ == "__main__":
    main()
