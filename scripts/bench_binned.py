"""Large-field throughput: binned slab sampler vs 16-corner gather (TPU).

The BASELINE config 4/5 regime: an HBM-resident forcing field far beyond
VMEM. Measures raw sample rate of both paths and an end-to-end engine run
with sorted-chunk mode. All data generated on device.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(fn, *args, n=3):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = min(best, time.perf_counter() - t0)
    return best, out


def run_case(shape4, n, label):
    from parcels_tpu.ops import binned_sample as bs

    print(f"--- {label}: field {shape4}, n={n} ---", flush=True)
    T, Z, Y, X = shape4

    key = jax.random.PRNGKey(0)
    kd, kz, ky, kx, kb = jax.random.split(key, 5)
    data = jax.random.uniform(kd, shape4, jnp.float32)

    zi = jax.random.randint(kz, (n,), 0, Z - 1)
    yi = jax.random.randint(ky, (n,), 0, Y - 1)
    xi = jax.random.randint(kx, (n,), 0, X - 1)
    bc = jax.random.uniform(kb, (4, n), jnp.float32)

    # engine-sorted order
    geom = bs.slab_geometry(shape4, n)
    _, _, _, _, bz, by, bx = geom
    print("geometry (WT,SZ,SY,SX,bz,by,bx):", geom)
    skey = bs.sort_key_for(
        None,
        {ax: {"index": v} for ax, v in (("Z", zi), ("Y", yi), ("X", xi))},
        shape4,
        n,
    )
    _, order = jax.lax.sort_key_val(skey.astype(jnp.int32), jnp.arange(n, dtype=jnp.int32))
    zi, yi, xi = (jnp.take(a, order) for a in (zi, yi, xi))

    def mkgpos(lockstep_t=False):
        tbc = jnp.full(n, 0.375, jnp.float32) if lockstep_t else bc[0]
        return {
            "T": {"index": jnp.zeros(n, jnp.int32), "bcoord": tbc},
            "Z": {"index": zi.astype(jnp.int32), "bcoord": bc[1]},
            "Y": {"index": yi.astype(jnp.int32), "bcoord": bc[2]},
            "X": {"index": xi.astype(jnp.int32), "bcoord": bc[3]},
            "_sorted": True,
        }

    @jax.jit
    def binned(data):
        return bs.binned_linear_sample(data, mkgpos())

    t, vb = timed(binned, data)
    print(f"binned slab sampler: {t*1e3:7.1f} ms -> {n/t/1e6:8.1f} M samples/s", flush=True)

    @jax.jit
    def binned_lock(data):
        return bs.binned_linear_sample(data, mkgpos(lockstep_t=True))

    t, _ = timed(binned_lock, data)
    print(f"binned (lockstep t): {t*1e3:7.1f} ms -> {n/t/1e6:8.1f} M samples/s", flush=True)

    @jax.jit
    def gather(data):
        gpos = mkgpos()
        gidx = {
            ax: (gpos[ax]["index"], gpos[ax]["bcoord"]) for ax in "TZYX"
        }
        return bs._gather16(data, gidx)

    t, vg = timed(gather, data)
    print(f"16-corner gather:    {t*1e3:7.1f} ms -> {n/t/1e6:8.1f} M samples/s")

    err = float(jnp.max(jnp.abs(vb - vg)))
    print(f"max |binned - gather| = {err:.2e}")

    # overflow diagnostics
    plan = bs._build_plan(shape4, mkgpos())
    ovf = float(jnp.mean(plan["overflow"].astype(jnp.float32)))
    print(f"overflow fraction (sorted): {ovf:.4f}")


def main():
    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    run_case((2, 50, 500, 500), 2_000_000, "sparse 3-D (100 MB)")
    run_case((2, 1, 3000, 4000), 10_000_000, "dense surface, config-5-like (96 MB)")


if __name__ == "__main__":
    main()
