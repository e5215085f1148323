"""A/B the SoA permute gather: (n, C) row-take vs flat 1-D strided gather.

The device trace (r5) shows the chunk-boundary sort permute running at
18 GB/s: XLA lays the packed (n, 26) i32 matrix COLUMN-major (to make the
stack/unpack free), so the row gather touches 26 separate 512 B granules
per row. Expressing the same permute as a gather of C-length slices from
the FLAT (n*C,) vector pins contiguous rows (a 1-D array has only one
layout) at the cost of an explicit pack copy.
"""
import os
import sys
import time

_d = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [_d, os.path.dirname(_d)]

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import bench_config5 as c5


def timeit(fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x[:1]) if hasattr(x, "shape") else x, out)

    def run(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = fn(*args)
        np.asarray(o.reshape(-1)[:1])
        return time.perf_counter() - t0

    run(1)
    return (run(9) - run(1)) / 8


def main():
    c5._cache()
    n = int(os.environ.get("N", 2_000_000))
    C = int(os.environ.get("C", 26))
    key = jax.random.PRNGKey(0)
    cols = [jax.random.normal(jax.random.fold_in(key, i), (n,)).astype(jnp.float32)
            for i in range(C)]
    # locality-rich permutation like the engine's bin sort
    keys = jax.random.randint(jax.random.fold_in(key, 99), (n,), 0, 4096)
    _, order = lax.sort_key_val(keys, jnp.arange(n, dtype=jnp.int32))

    @jax.jit
    def take_rows(order, *cols):
        mat = jnp.stack(cols, axis=1)
        return jnp.take(mat, order, axis=0)

    @jax.jit
    def take_pad32(order, *cols):
        cols = cols + tuple(jnp.zeros_like(cols[0]) for _ in range(32 - len(cols)))
        mat = jnp.stack(cols, axis=1)
        return jnp.take(mat, order, axis=0)[:, :C]

    @jax.jit
    def take_via_transpose(order, *cols):
        mat_t = jnp.stack(cols, axis=0)  # (C, n): each col contiguous
        mat = lax.transpose(mat_t, (1, 0))
        mat = lax.optimization_barrier(mat)  # force the physical row-major copy
        return jnp.take(mat, order, axis=0)

    @jax.jit
    def multisort(keys, *cols):
        out = lax.sort((keys,) + cols, dimension=0, num_keys=1)
        return jnp.stack(out[1:], axis=1)

    @jax.jit
    def take_flat_rm(order, *cols):
        cols = cols + tuple(jnp.zeros_like(cols[0]) for _ in range(32 - len(cols)))
        mat = jnp.stack(cols, axis=1)
        flat = lax.optimization_barrier(mat.reshape(-1))
        mat2 = flat.reshape(n, 32)
        return jnp.take(mat2, order, axis=0)[:, :C]

    @jax.jit
    def take_pad64(order, *cols):
        cols = cols + tuple(jnp.zeros_like(cols[0]) for _ in range(64 - len(cols)))
        mat = jnp.stack(cols, axis=1)
        flat = lax.optimization_barrier(mat.reshape(-1))
        mat2 = flat.reshape(n, 64)
        return jnp.take(mat2, order, axis=0)[:, :C]

    @jax.jit
    def take_pad64_nb(order, *cols):
        cols = cols + tuple(jnp.zeros_like(cols[0]) for _ in range(64 - len(cols)))
        mat = jnp.stack(cols, axis=1)
        return jnp.take(mat, order, axis=0)[:, :C]

    variants = {
        "take-pad64-nb": lambda: take_pad64_nb(order, *cols),
        "take-flat-rm": lambda: take_flat_rm(order, *cols),
        "take-pad64": lambda: take_pad64(order, *cols),
        "row-take": lambda: take_rows(order, *cols),
        "take-pad32": lambda: take_pad32(order, *cols),
        "take-via-T": lambda: take_via_transpose(order, *cols),
        "multisort": lambda: multisort(keys, *cols),
    }
    only = os.environ.get("ONLY")
    nbytes = n * C * 4
    print(f"n={n} C={C}  payload {nbytes/2**20:.0f} MiB", flush=True)
    for name, fn in variants.items():
        if only and name != only:
            continue
        t = timeit(fn)
        print(f"{name:11s}: {t*1e3:7.2f} ms  ({2*nbytes/t/1e9:6.1f} GB/s r+w)", flush=True)


if __name__ == "__main__":
    main()
