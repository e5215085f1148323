"""Device-trace the unstructured (FESOM2-scale) RK4 chunk; see analyze_trace.

Env: N (default 2M), NX (default 1200), NZ (48), STEPS (default 4),
OUT (default /tmp/trace_ux). Uses the uxcol corner-row tier (auto).
"""
import os
import sys
import time

_d = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [_d, os.path.dirname(_d)]

import numpy as np

import bench_ux


def main():
    import jax
    import jax.numpy as jnp

    from parcels_tpu._core.engine import build_chunk_executor
    from parcels_tpu.kernels import AdvectionRK4

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    npart = int(os.environ.get("N", 2_000_000))
    nx = int(os.environ.get("NX", 1200))
    nz = int(os.environ.get("NZ", 48))
    steps = int(os.environ.get("STEPS", 4))
    out_dir = os.environ.get("OUT", "/tmp/trace_ux")
    os.makedirs(out_dir, exist_ok=True)
    dt = 120.0

    fs = bench_ux.build_fieldset(nx, nz)
    key = jax.random.PRNGKey(2)
    kx, ky = jax.random.split(key)
    extent = 1e6
    pdata = {
        "x": jax.random.uniform(kx, (npart,), jnp.float32, 0.3 * extent, 0.7 * extent),
        "y": jax.random.uniform(ky, (npart,), jnp.float32, 0.3 * extent, 0.7 * extent),
        "z": jnp.full((npart,), 100.0, jnp.float32),
        "t": jnp.zeros((npart,), jnp.float32),
        "_tc": jnp.zeros((npart,), jnp.float32),
        "dt": jnp.full((npart,), dt, jnp.float32),
        "dx": jnp.zeros((npart,), jnp.float32),
        "dy": jnp.zeros((npart,), jnp.float32),
        "dz": jnp.zeros((npart,), jnp.float32),
        "particle_id": jnp.arange(npart, dtype=jnp.int32),
        "state": jnp.zeros((npart,), jnp.int32),
        "_active": jnp.ones((npart,), bool),
        "ei": jnp.zeros((npart, 1), jnp.int32),
    }
    from parcels_tpu.ops import uxcache as _uxc

    uxc_ok, uxc_meta = _uxc.soa_cache_applicable(fs)
    if uxc_ok:
        pdata.update(_uxc.make_soa_cache_device(npart, uxc_meta))
        print("persistent per-face cache: on", flush=True)
    nblocks = 1
    while npart // nblocks > 2**21 or npart % nblocks:
        nblocks += 1
    executor = build_chunk_executor(
        (AdvectionRK4,), fs, sign_dt=1, rk45_mode=False, donate=False,
        block_size=npart // nblocks,
    )
    farrays = fs.device_arrays()
    # two warm steps: compile + ei cache warm (steady-state misses only)
    pdata = executor(farrays, pdata, jnp.float32(dt), jnp.float32(dt))
    np.asarray(pdata["t"][:1])
    pdata = executor(farrays, pdata, jnp.float32(2 * dt), jnp.float32(dt))
    np.asarray(pdata["t"][:1])

    t0 = time.perf_counter()
    with jax.profiler.trace(out_dir):
        out = executor(farrays, pdata, jnp.float32(dt * (2 + steps)), jnp.float32(dt))
        np.asarray(out["t"][:1])
    wall = time.perf_counter() - t0
    print(
        f"traced {steps} steps of {npart} in {wall:.2f}s wall "
        f"-> {npart*steps/wall/1e6:.2f} M steps/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
