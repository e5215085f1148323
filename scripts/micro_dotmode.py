"""A/B the binned-sampler MXU contraction precision: 3-pass bf16 split vs
HIGHEST (6-pass) on the 100 MB sparse-3D case. Decides which _dot3 to ship."""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import time

import jax
import jax.numpy as jnp
import numpy as np

from parcels_tpu.ops import binned_sample as bs


def highest_dot(a, b):
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def make_case(shape4, n, seed=0):
    rng = np.random.default_rng(seed)
    T, Z, Y, X = shape4
    data = jnp.asarray(rng.uniform(-1, 1, shape4).astype(np.float32))
    zi = rng.integers(0, max(Z - 1, 1), n)
    yi = rng.integers(0, Y - 1, n)
    xi = rng.integers(0, X - 1, n)
    bc = rng.uniform(0, 1, (4, n)).astype(np.float32)
    # sort by the plan's bin key (lexicographic z-bin, y-bin, x-bin) — raw
    # cell-raster order interleaves bins and overflows to the gather path
    _, _, _, _, bz, by, bx = bs.slab_geometry(shape4, n)
    nby, nbx = -(-Y // by), -(-X // bx)
    skey = ((zi // bz) * nby + yi // by) * nbx + xi // bx
    order = np.argsort(skey, kind="stable")
    zi, yi, xi = zi[order], yi[order], xi[order]
    gpos = {
        "T": {"index": jnp.zeros(n, jnp.int32), "bcoord": jnp.asarray(bc[0])},
        "Z": {"index": jnp.asarray(zi, dtype=jnp.int32), "bcoord": jnp.asarray(bc[1])},
        "Y": {"index": jnp.asarray(yi, dtype=jnp.int32), "bcoord": jnp.asarray(bc[2])},
        "X": {"index": jnp.asarray(xi, dtype=jnp.int32), "bcoord": jnp.asarray(bc[3])},
    }
    return data, gpos


def timed(f, *args):
    out = jax.block_until_ready(f(*args))
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(f(*args))
    return (time.perf_counter() - t0) / n, out


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    shape4, n = (2, 50, 500, 500), 2_000_000
    data, gpos = make_case(shape4, n)

    fn = jax.jit(lambda d: bs.binned_linear_sample(d, gpos))
    t, v3 = timed(fn, data)
    print(f"_dot3 (3-pass bf16): {t*1e3:7.1f} ms -> {n/t/1e6:8.1f} M samples/s", flush=True)

    orig = bs._dot3
    bs._dot3 = highest_dot
    try:
        fn2 = jax.jit(lambda d: bs.binned_linear_sample(d, gpos))
        t, vh = timed(fn2, data)
        print(f"HIGHEST (6-pass)  : {t*1e3:7.1f} ms -> {n/t/1e6:8.1f} M samples/s", flush=True)
    finally:
        bs._dot3 = orig
    print("max |dot3 - HIGHEST| =", float(jnp.max(jnp.abs(v3 - vh))))


if __name__ == "__main__":
    main()
