"""Unstructured (FESOM2-style) throughput bench: gather vs corner-row tier.

Round-3 VERDICT item 5: the first unstructured perf number. A
FESOM2-baroclinic-gyre-shaped triangular mesh (reference registry
`Benchmarks_FESOM2-baroclinic-gyre`; here generated at matching scale) with
node-registered velocities over zf interfaces, N particles advected with
RK4, measured in both sampling tiers (PARCELS_TPU_UXCOL).

Env: N (default 2_000_000), NX (mesh nodes per side, default 1200 ->
~2.9M faces), NZ (default 48), STEPS (default 10), MODES (default
"off,auto").
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def build_fieldset(nx, nz):
    from parcels_tpu import FieldSet
    from parcels_tpu.datasets.unstructured import delaunay_flow_dataset

    t0 = time.perf_counter()
    ds = delaunay_flow_dataset(
        flow="rotation", placement="node", vertical="zf",
        nx=nx, ny=nx, nz=nz, extent=1e6, maxdepth=1000.0,
    )
    fs = FieldSet.from_ugrid_conventions(ds, mesh="flat")
    grid = fs.UV.U.grid
    print(
        f"mesh: {grid.spec.n_face} faces, {grid.spec.n_node} nodes, nz={nz}, "
        f"built in {time.perf_counter()-t0:.1f}s", flush=True,
    )
    return fs


def run(fs, npart, steps, dt=120.0):
    from parcels_tpu._core.engine import build_chunk_executor
    from parcels_tpu.kernels import AdvectionRK4

    grid = fs.UV.U.grid
    extent = 1e6
    key = jax.random.PRNGKey(2)
    kx, ky = jax.random.split(key)
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
        print("  persistent per-face cache: on", flush=True)
    nblocks = 1
    while npart // nblocks > 2**21 or npart % nblocks:
        nblocks += 1
    executor = build_chunk_executor(
        (AdvectionRK4,), fs, sign_dt=1, rk45_mode=False, donate=False,
        block_size=npart // nblocks,
    )
    farrays = fs.device_arrays()

    t0 = time.perf_counter()
    out = executor(farrays, pdata, jnp.float32(dt), jnp.float32(dt))
    np.asarray(out["t"][:1])
    compile_s = time.perf_counter() - t0

    # multi-step launches (the public execute() path runs chunked
    # while-loops too). Per-step launches made sense when one ux step ran
    # seconds (r4); at current speeds their per-launch SoA copies and
    # dispatches dominate. Stall-robust differenced timing cancels the
    # fixed per-launch cost (bench_config5._robust_elapsed).
    from bench_config5 import _robust_elapsed

    def run(k):
        t0 = time.perf_counter()
        o = executor(farrays, out, jnp.float32(dt * (k + 1)), jnp.float32(dt))
        np.asarray(o["t"][:1])
        return time.perf_counter() - t0

    k0 = max(steps // 10, 1)
    elapsed = _robust_elapsed(run, k0, steps)
    rate = npart * steps / elapsed
    print(
        f"  compile+first {compile_s:.1f}s; {steps} steps in {elapsed:.2f}s "
        f"-> {rate/1e6:.2f} M particle-steps/s", flush=True,
    )
    return rate


def main():
    npart = int(os.environ.get("N", 2_000_000))
    nx = int(os.environ.get("NX", 1200))
    nz = int(os.environ.get("NZ", 48))
    steps = int(os.environ.get("STEPS", 10))
    modes = os.environ.get("MODES", "off,auto").split(",")
    print(f"device={jax.devices()[0].platform} n={npart} steps={steps}", flush=True)
    rates = {}
    for mode in modes:
        os.environ["PARCELS_TPU_UXCOL"] = mode
        fs = build_fieldset(nx, nz)
        print(f"mode uxcol={mode}:", flush=True)
        try:
            rates[mode] = run(fs, npart, steps)
        except Exception as e:  # noqa: BLE001
            print(f"  FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
    if len(rates) > 1 and "off" in rates:
        base = rates.pop("off")
        for m, r in rates.items():
            print(f"speedup {m} vs gather: {r/base:.2f}x", flush=True)


if __name__ == "__main__":
    main()
