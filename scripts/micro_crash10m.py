"""Isolate the 10M-lane TPU worker crash seen in config-5 benches.

Runs suspect ops one by one at N lanes, syncing after each, so the log
shows exactly which op kills the worker:

  1. sort_key_val over N int32 keys + SoA reorder via take
  2. curvilinear_search over N lanes (pic-table and direct variants)
  3. binned_linear_sample over N lanes against a (2,50,1000,1000) field
  4. one full engine step (the composite)

Env: N (default 10_000_000).
"""

import os
import time

import numpy as np


def sync(x, label):
    v = np.asarray(x[:1] if hasattr(x, "shape") and x.shape else x)
    print(f"  ok: {label} -> {v!r}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n = int(os.environ.get("N", 10_000_000))
    print(f"device={jax.devices()[0].platform} n={n}", flush=True)
    key = jax.random.PRNGKey(0)

    # 1. global sort + reorder
    print("1. sort_key_val + reorder", flush=True)
    keys = jax.random.randint(key, (n,), 0, 2**26, jnp.int32)
    iota = jnp.arange(n, dtype=jnp.int32)

    @jax.jit
    def sort_and_take(keys, iota):
        _, order = jax.lax.sort_key_val(keys, iota)
        outs = []
        for i in range(14):
            arr = (iota + i).astype(jnp.float32)
            outs.append(jnp.take(arr, order))
        return outs[0]

    t0 = time.perf_counter()
    sync(sort_and_take(keys, iota), f"sort in {time.perf_counter()-t0:.1f}s")

    # 2. curvilinear search
    print("2. curvilinear_search", flush=True)
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from bench_config5 import build_fieldset

    from parcels_tpu._core import index_search as isr

    fs = build_fieldset((2, 50, 1000, 1000))
    g = fs._gridset[0]
    garrs = g.device_arrays(np.float32)
    kx, ky = jax.random.split(key)
    x = jax.random.uniform(kx, (n,), jnp.float32, -170.0, 170.0)
    y = jax.random.uniform(ky, (n,), jnp.float32, -60.0, 70.0)
    lk = g.lookup_meta()
    lookup = {**lk, "yi": garrs["lookup_yi"], "xi": garrs["lookup_xi"]}
    zero = jnp.zeros(n, jnp.int32)

    @jax.jit
    def search_table(y, x, zero):
        return isr.curvilinear_search(
            garrs["lon"], garrs["lat"], y, x, zero, zero, spherical=True,
            lookup=lookup, pic_table=garrs["pic_table"]
        )[0]

    t0 = time.perf_counter()
    sync(search_table(y, x, zero), f"search(table) in {time.perf_counter()-t0:.1f}s")

    @jax.jit
    def search_direct(y, x, zero):
        return isr.curvilinear_search(
            garrs["lon"], garrs["lat"], y, x, zero, zero, spherical=True, lookup=lookup
        )[0]

    t0 = time.perf_counter()
    sync(search_direct(y, x, zero), f"search(direct) in {time.perf_counter()-t0:.1f}s")

    # 3. binned sample at n lanes
    print("3. binned_linear_sample", flush=True)
    os.environ["PARCELS_TPU_BINNED"] = "force"
    os.environ["PARCELS_TPU_SORT_MODE"] = "force"
    from parcels_tpu.ops.binned_sample import binned_linear_sample, sort_key_for

    data = jax.random.uniform(key, (2, 50, 1000, 1000), jnp.float32)
    yi, eta, xi, xsi = (jnp.zeros(n, jnp.int32),) * 2 + (jnp.zeros(n, jnp.float32),) * 2

    @jax.jit
    def sample(y, x, zero):
        yi, eta, xi, xsi = isr.curvilinear_search(
            garrs["lon"], garrs["lat"], y, x, zero, zero, spherical=True,
            lookup=lookup, pic_table=garrs["pic_table"]
        )
        gpos = {
            "T": {"index": jnp.zeros(n, jnp.int32), "bcoord": jnp.zeros(n, jnp.float32)},
            "Z": {"index": jnp.zeros(n, jnp.int32), "bcoord": jnp.zeros(n, jnp.float32)},
            "Y": {"index": jnp.clip(yi, 0, 998), "bcoord": jnp.clip(eta, 0, 1)},
            "X": {"index": jnp.clip(xi, 0, 998), "bcoord": jnp.clip(xsi, 0, 1)},
            "_sorted": True,
        }
        key_s = sort_key_for(fs._gridset[0].spec, gpos, (2, 50, 1000, 1000), n)
        _, order = jax.lax.sort_key_val(key_s, jnp.arange(n, dtype=jnp.int32))
        gpos2 = {
            ax: {k: jnp.take(v, order) for k, v in d.items()}
            for ax, d in gpos.items() if isinstance(d, dict)
        }
        gpos2["_sorted"] = True
        return binned_linear_sample(data, gpos2)

    t0 = time.perf_counter()
    sync(sample(y, x, zero), f"binned sample in {time.perf_counter()-t0:.1f}s")
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
