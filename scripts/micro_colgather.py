"""Microbench: corner-column row-gather sampler vs 16-corner scalar gather.

Hypothesis (round-3 perf attack): XLA scalar gathers on TPU are
instruction-bound (~100M elements/s), so the reference-style 16-corner
multilinear gather caps at ~5-7M samples/s regardless of locality. (n, C)
ROW gathers (jnp.take axis=0) move C*4 contiguous bytes per gathered index
— close to the 512 B HBM granule — so a sampler built on 4 corner-row
gathers plus a VPU hat-weight reduce should approach the granule-adjusted
bandwidth bound.

Layout: transpose the field (T, Z, Y, X) -> (Y*X, T*Z) so each (y, x)
node's full time/depth column is ONE contiguous row (T*Z*4 bytes). A
trilinear+time sample then needs 4 corner-row gathers and no per-element
gathers:

    v = sum_c w_yx(c) * sum_j hat(z_j - pz) * hat(t_j - pt) * row_c[j]

Caveats measured here: lane blocking (lax.map over 1M-lane blocks) bounds
the (block, T*Z) intermediates — without it XLA materializes (10M, C) f32
and OOMs; a .sum(axis=1) WITHOUT per-lane weights gets factored by XLA
into rowsum-then-scalar-gather, so the reduce must use the real per-lane
hat weights to measure anything.
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import time

import jax
import jax.numpy as jnp
import numpy as np

T, Z, Y, X = 2, 50, 1500, 2000
N = 10_000_000
BLOCK = 1_000_000


def _force(out):
    # axon tunnel: block_until_ready returns at enqueue; a 1-element host
    # pull is the only reliable completion barrier (see micro_rowtake.py)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return out


def timed(fn, *args, n=3):
    out = _force(fn(*args))
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = _force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def corner_column_block(table, yi, xi, by, bx, pz, pt):
    """One block of lanes: 4 corner-row gathers + fused hat-weight reduce."""
    ncol = X
    i00 = yi * ncol + xi
    j = jax.lax.broadcasted_iota(jnp.int32, (1, T * Z), 1)
    tj = (j // Z).astype(jnp.float32)
    zj = (j % Z).astype(jnp.float32)
    wrow = jnp.maximum(0.0, 1.0 - jnp.abs(tj - pt[:, None])) * jnp.maximum(
        0.0, 1.0 - jnp.abs(zj - pz[:, None])
    )  # (n, T*Z)
    val = 0.0
    for dy, wy in ((0, 1.0 - by), (1, by)):
        for dx, wx in ((0, 1.0 - bx), (1, bx)):
            r = jnp.take(table, i00 + dy * ncol + dx, axis=0)  # (n, T*Z)
            val = val + (wy * wx) * jnp.sum(r * wrow, axis=1)
    return val


def corner_column_sample(table, yi, xi, by, bx, pz, pt):
    blocks = jax.tree_util.tree_map(
        lambda a: a.reshape(N // BLOCK, BLOCK), (yi, xi, by, bx, pz, pt)
    )
    out = jax.lax.map(lambda b: corner_column_block(table, *b), blocks)
    return out.reshape(-1)


def gather16_block(flat, ti, bt, zi, bz, yi, by, xi, bx):
    val = 0.0
    for dt_, wt in ((0, 1.0 - bt), (1, bt)):
        for dz, wz in ((0, 1.0 - bz), (1, bz)):
            for dy, wy in ((0, 1.0 - by), (1, by)):
                for dx, wx in ((0, 1.0 - bx), (1, bx)):
                    lin = (((ti + dt_) * Z + (zi + dz)) * Y + (yi + dy)) * X + (xi + dx)
                    val = val + (wt * wz * wy * wx) * jnp.take(flat, lin, mode="clip")
    return val


def gather16(data, ti, bt, zi, bz, yi, by, xi, bx):
    flat = data.reshape(-1)
    blocks = jax.tree_util.tree_map(
        lambda a: a.reshape(N // BLOCK, BLOCK), (ti, bt, zi, bz, yi, by, xi, bx)
    )
    out = jax.lax.map(lambda b: gather16_block(flat, *b), blocks)
    return out.reshape(-1)


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    print(f"backend={jax.default_backend()} shape=({T},{Z},{Y},{X}) N={N} block={BLOCK}")

    data = jax.random.uniform(k1, (T, Z, Y, X), jnp.float32)
    table = jnp.moveaxis(data.reshape(T * Z, Y, X), 0, -1).reshape(Y * X, T * Z)
    jax.block_until_ready(table)

    yi = jax.random.randint(k2, (N,), 0, Y - 2, jnp.int32)
    xi = jax.random.randint(k3, (N,), 0, X - 2, jnp.int32)
    zi = jax.random.randint(k4, (N,), 0, Z - 2, jnp.int32)
    by = jax.random.uniform(k5, (N,), jnp.float32)
    bx = jax.random.uniform(k2, (N,), jnp.float32)
    bz = jax.random.uniform(k3, (N,), jnp.float32)
    bt = jax.random.uniform(k4, (N,), jnp.float32)
    ti = jnp.zeros((N,), jnp.int32)

    for name in ("random", "sorted"):
        order = (
            jnp.arange(N, dtype=jnp.int32)
            if name == "random"
            else jnp.argsort(yi * X + xi).astype(jnp.int32)
        )
        yis, xis, zis, tis = (jnp.take(a, order) for a in (yi, xi, zi, ti))
        bys, bxs, bzs, bts = (jnp.take(a, order) for a in (by, bx, bz, bt))
        pz = zis.astype(jnp.float32) + bzs
        pt = tis.astype(jnp.float32) + bts

        fcol = jax.jit(corner_column_sample)
        t, v1 = timed(fcol, table, yis, xis, bys, bxs, pz, pt)
        print(f"[{name}] corner-column: {t*1e3:7.1f} ms  {N/t/1e6:8.2f} M samples/s")

        fg = jax.jit(gather16)
        t, v2 = timed(fg, data, tis, bts, zis, bzs, yis, bys, xis, bxs)
        print(f"[{name}] gather16:      {t*1e3:7.1f} ms  {N/t/1e6:8.2f} M samples/s")
        err = float(jnp.max(jnp.abs(v1 - v2)))
        print(f"[{name}] max |diff| = {err:.2e}")


if __name__ == "__main__":
    main()
