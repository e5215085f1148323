"""Isolate the 10M-lane TPU worker crash seen in config-5 benches.

All grid/field arrays are passed as ARGUMENTS (closure-captured device
arrays bake into the HLO as literals and blow past the axon remote-compile
HTTP body limit — that was this micro's own first bug, not the engine's).

Steps, each synced so the log shows exactly which op dies:
  1. sort_key_val + 14-array reorder at N
  2. curvilinear_search (pic-table) at N, timed twice
  3. binned_linear_sample composite at N
  4. engine composite at N: gather+nosort, gather+sort, binned+sort

Env: N (default 10_000_000), SHAPE (default 2,50,1000,1000).
"""

import os
import sys
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
    shape = tuple(int(s) for s in os.environ.get("SHAPE", "2,50,1000,1000").split(","))
    print(f"device={jax.devices()[0].platform} n={n} shape={shape}", flush=True)
    key = jax.random.PRNGKey(0)

    print("1. sort_key_val + reorder", flush=True)
    keys = jax.random.randint(key, (n,), 0, 2**26, jnp.int32)

    @jax.jit
    def sort_and_take(keys):
        iota = jnp.arange(n, dtype=jnp.int32)
        _, order = jax.lax.sort_key_val(keys, iota)
        out = None
        for i in range(14):
            arr = (iota + i).astype(jnp.float32)
            out = jnp.take(arr, order)
        return out

    t0 = time.perf_counter()
    sync(sort_and_take(keys), f"sort in {time.perf_counter()-t0:.1f}s")

    print("2. curvilinear_search (pic table), grid as args", flush=True)
    sys.path.insert(0, os.path.dirname(__file__))
    from bench_config5 import build_fieldset, device_farrays, device_pdata

    from parcels_tpu._core import index_search as isr

    fs = build_fieldset(shape)
    g = fs._gridset[0]
    farrays = device_farrays(fs)
    garrs = farrays["grids"][0]
    lkm = g.lookup_meta()
    kx, ky = jax.random.split(key)
    x = jax.random.uniform(kx, (n,), jnp.float32, -170.0, 170.0)
    y = jax.random.uniform(ky, (n,), jnp.float32, -60.0, 70.0)

    @jax.jit
    def search_table(garrs, y, x):
        zero = jnp.zeros(y.shape, jnp.int32)
        lookup = {**lkm, "yi": garrs["lookup_yi"], "xi": garrs["lookup_xi"]}
        return isr.curvilinear_search(
            garrs["lon"], garrs["lat"], y, x, zero, zero, spherical=True,
            lookup=lookup, pic_table=garrs["pic_table"]
        )[0]

    t0 = time.perf_counter()
    sync(search_table(garrs, y, x), f"search compile+run in {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    sync(search_table(garrs, y, x), f"search warm in {time.perf_counter()-t0:.2f}s")

    print("3. engine composite bisect", flush=True)
    import jax.numpy as jnp

    from parcels_tpu._core.engine import build_chunk_executor
    from parcels_tpu.kernels import AdvectionRK4
    from parcels_tpu.ops.binned_sample import set_z_occupancy_hint

    set_z_occupancy_hint(1.0 / max(shape[1] - 1, 1))

    for label, mode in (("gather+nosort", "off"), ("binned+sort", "force")):
        os.environ["PARCELS_TPU_SORT_MODE"] = mode
        os.environ["PARCELS_TPU_BINNED"] = mode
        fs2 = build_fieldset(shape)
        fa2 = device_farrays(fs2)
        try:
            ex = build_chunk_executor(
                (AdvectionRK4,), fs2, sign_dt=1, rk45_mode=False, donate=False,
                block_size=n if n <= 2_500_000 else 2_500_000 if n % 2_500_000 == 0 else n,
            )
            pd = device_pdata(n, dt=600.0)
            t0 = time.perf_counter()
            out = ex(fa2, pd, jnp.float32(600.0), jnp.float32(600.0))
            np.asarray(out["t"][:1])
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = ex(fa2, out, jnp.float32(600.0 * 4), jnp.float32(600.0))
            np.asarray(out["t"][:1])
            t2 = time.perf_counter() - t0
            rate = 3 * n / max(t2, 1e-9)
            print(f"  ok: engine {label}: compile+1step {t1:.1f}s, 3 steps {t2:.1f}s "
                  f"({rate/1e6:.2f} M steps/s)", flush=True)
        except Exception as e:
            print(f"  FAIL engine {label}: {type(e).__name__}: {str(e)[:160]}", flush=True)
    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()
