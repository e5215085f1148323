"""Config-5-shaped benchmark: 10M particles, RK4, global 1/12-degree-like
curvilinear C-grid (MOi-shaped) forcing — single-chip, with HBM roofline
accounting.

BASELINE.json config 5 is "Global NEMO 1/12deg forcing, 10M particles sharded
across N>=2 hosts with particle migration"; multi-host hardware is not
available in this container, so this measures the per-chip term (the
numerator of scaling efficiency) on the real TPU, while the 8-way virtual
mesh correctness lives in tests/test_domain.py::
test_moi_shaped_banded_matches_single_device.

Roofline model (the "interpolation gather at HBM-bandwidth-bound speed" gate
in BASELINE.json): the minimum HBM traffic per particle-step for C-grid RK4
with the geometry table, assuming every needed word is read exactly once at
perfect granularity:

    per RK stage and component: 4 face velocities x 2 time levels x 4 B
    per RK stage: geometry row 9 x 4 B
    => (2 comps x 32 B + 36 B) x 4 stages = 400 B / particle-step

That model gives an upper-bound rate = BW / 400 B. Real gathers fetch
512-byte granules, so the *achievable* bound is far lower unless lanes are
sorted so neighbors share granules — which is exactly what the binned+sorted
engine mode restores. The script also measures streamed HBM bandwidth
on-chip (saxpy over ~2 GB) so the roofline denominator is the machine's own
number, not a datasheet's.

Env knobs: N (default 10_000_000), STEPS (default 10), MODES (default
"off,force"), SHAPE
(default 2,50,1500,2000 ~ 1.2 GB/component f32), DT (default 600 s).
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import os
import time

import numpy as np


def _cache():
    import jax

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def measured_hbm_bw(nbytes=2 << 30):
    """Streamed read+write bandwidth via jitted saxpy over nbytes of f32."""
    import jax
    import jax.numpy as jnp

    n = nbytes // 4
    x = jnp.ones((n,), jnp.float32)

    @jax.jit
    def saxpy(x):
        return x * 1.0001 + 0.5

    y = saxpy(x)
    np.asarray(y[:1])

    def run(k):
        t0 = time.perf_counter()
        z = x
        for _ in range(k):
            z = saxpy(z)
        np.asarray(z[:1])
        return time.perf_counter() - t0

    elapsed = run(9) - run(1)
    # 8 saxpy passes, each reads + writes nbytes
    return 8 * 2 * nbytes / max(elapsed, 1e-9)


def build_fieldset(shape, with_w: bool = False):
    """MOi-shaped fieldset with near-free host data (broadcast zeros); the
    device field arrays are generated on-chip afterwards to keep gigabytes
    off the (slow) TPU tunnel. ``with_w`` adds vovecrtz (3-D, RK4_3D)."""
    from parcels_tpu import FieldSet
    from parcels_tpu.convert import nemo_to_sgrid
    from parcels_tpu.datasets.moi import moi_like_inputs

    tdim, zdim, ydim, xdim = shape
    fields, coords = moi_like_inputs(
        xdim=xdim, ydim=ydim, zdim=zdim, tdim=tdim, zero_data=True, with_w=with_w
    )
    ds = nemo_to_sgrid(fields=fields, coords=coords)
    return FieldSet.from_sgrid_conventions(ds)


def device_farrays(fs, seed=3):
    """grids via the normal host path (coords + geometry table, ~150 MB);
    U/V generated directly on device."""
    import jax
    import jax.numpy as jnp

    from parcels_tpu._core.field import Field

    farrays = {"grids": [g.device_arrays(np.float32) for g in fs._gridset], "fields": {}}
    key = jax.random.PRNGKey(seed)
    for name, f in fs._fields.items():
        if isinstance(f, Field):
            key, k = jax.random.split(key)
            # vertical velocities are ~1e-4 m/s in the ocean; +-0.3 would
            # drive the whole batch through the surface within a few steps
            amp = 3e-5 if name == "W" else 0.3
            farrays["fields"][name] = jax.random.uniform(
                k, f.data.shape, jnp.float32, -amp, amp
            )
    from parcels_tpu.ops.stagecache import attach_derived_tables

    attach_derived_tables(fs, farrays)
    object.__setattr__(fs, "_device_cache", farrays)
    return farrays


def device_pdata(npart, seed=1, dt=600.0, z_spread: float | None = None):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    kx, ky = jax.random.split(key)
    if z_spread:
        kz = jax.random.fold_in(key, 7)
        z = jax.random.uniform(kz, (npart,), jnp.float32, 1.0, z_spread)
    else:
        z = jnp.full(npart, 1.0, jnp.float32)
    return {
        "t": jnp.zeros(npart, jnp.float32),
        "z": z,
        "y": jax.random.uniform(ky, (npart,), jnp.float32, -60.0, 70.0),
        "x": jax.random.uniform(kx, (npart,), jnp.float32, -170.0, 170.0),
        "dz": jnp.zeros(npart, jnp.float32),
        "dy": jnp.zeros(npart, jnp.float32),
        "dx": jnp.zeros(npart, jnp.float32),
        "particle_id": jnp.arange(npart, dtype=jnp.int32),
        "dt": jnp.full(npart, dt, jnp.float32),
        "state": jnp.full(npart, 10, jnp.int32),
        "ei": jnp.zeros((npart, 1), jnp.int32),
        "_tc": jnp.zeros(npart, jnp.float32),
        "_active": jnp.ones(npart, bool),
        "_rng": jnp.asarray(np.array([12345, 6789], np.uint32)),
    }


def _robust_elapsed(run, k0, steps, reps=3):
    """Stall-robust differenced wall time for ``steps`` device steps.

    ``run(k)`` launches a k-step chunk and syncs with a 1-element host
    read. Two failure modes corrupt a single ``run(steps+k0) - run(k0)``
    difference (BENCH_r04's 44x phantom regression): a one-time ~5 s stall
    on the FIRST post-warmup launch (measured, scripts/probe_driver_shape),
    and multi-second tunnel stalls on any individual sync. Both only ADD
    time, so: flush one launch, take ``reps`` samples of each length, and
    difference the minima. A median-vs-min spread > 1.5x flags the run as
    stall-polluted (reported, not fatal — the min difference stands).
    """
    run(k0)  # flush the one-time post-warmup stall
    shorts = [run(k0) for _ in range(reps)]
    longs = [run(k0 + steps) for _ in range(reps)]
    for name, ts in (("short", shorts), ("long", longs)):
        if np.median(ts) > 1.5 * min(ts) + 0.05:
            print(
                f"bench: tunnel stalls detected in {name} launches "
                f"(min {min(ts):.2f}s median {np.median(ts):.2f}s); using min",
                flush=True,
            )
    elapsed = min(longs) - min(shorts)
    if elapsed <= 0:  # pathological: fall back to the long launches' slope
        elapsed = max(min(longs) * steps / (steps + k0), 1e-9)
    return elapsed


def run_bench(fs, npart, steps, dt, kernel=None, z_spread=None):
    import jax.numpy as jnp

    from parcels_tpu._core.engine import build_chunk_executor
    from parcels_tpu.kernels import AdvectionRK4
    from parcels_tpu.ops.binned_sample import set_z_occupancy_hint

    if kernel is None:
        kernel = AdvectionRK4
    if z_spread:
        set_z_occupancy_hint(1.0)
    else:
        # all bench lanes sit in the surface z-cell (device_pdata z=1.0)
        zdim = fs._gridset[0].depth.size
        set_z_occupancy_hint(1.0 / max(zdim - 1, 1))

    # largest divisor of npart that fits the BLOCK target (the engine maps
    # lanes in equal blocks; transient search/interp memory scales with the
    # block, not with npart)
    target = int(os.environ.get("BLOCK", 2**22))
    nblocks = max(1, -(-npart // target))
    while npart % nblocks:
        nblocks += 1
    executor = build_chunk_executor(
        (kernel,), fs, sign_dt=1, rk45_mode=False, donate=False,
        block_size=npart // nblocks,
    )
    farrays = device_farrays(fs)
    pdata0 = device_pdata(npart, dt=dt, z_spread=z_spread)
    # persistent C-grid cell cache columns (the public execute() injects
    # these; the bench drives the executor directly)
    from parcels_tpu.ops import stagecache as _sc

    sc_ok, sc_w = _sc.soa_cache_applicable(fs)
    if sc_ok:
        pdata0.update(_sc.make_soa_cache_device(npart, sc_w))
    pdata = executor(farrays, pdata0, jnp.float32(dt), jnp.float32(dt))
    np.asarray(pdata["t"][:1])  # compile + ei-cache warm, tunnel-safe sync
    # free the seed SoA: at 10M lanes each copy is ~2 GB of HBM, and three
    # (seed + warm + out) alongside the gather tables exhausts the chip
    for k in list(pdata0):
        pdata0[k] = None
    del pdata0

    def run(k):
        t0 = time.perf_counter()
        out = executor(farrays, pdata, jnp.float32(dt * (k + 1)), jnp.float32(dt))
        np.asarray(out["t"][:1])
        return time.perf_counter() - t0

    k0 = max(steps // 10, 1)
    elapsed = _robust_elapsed(run, k0, steps)

    out = executor(farrays, pdata, jnp.float32(dt * (steps + 1)), jnp.float32(dt))
    ok = jnp.all(jnp.where(out["_active"], out["t"] == np.float32(dt * (steps + 1)), True))
    frac = float(np.asarray(jnp.mean(out["_active"].astype(jnp.float32))))
    assert bool(np.asarray(ok)), "clock did not advance uniformly"
    return npart * steps / max(elapsed, 1e-9), frac


GATHER_BYTES_PER_STEP = (2 * 4 * 2 * 4 + 9 * 4) * 4  # = 400 B, see module docstring


def run_streamed(shape, npart, dt, days):
    """Zarr-backed windowed streaming at scale vs the resident run.

    Writes a random MOi-shaped SGRID dataset to /tmp as zarr (tensorstore),
    opens it lazily, streams a 2-level window through the PUBLIC execute()
    path, and reports rate + window_stats (does I/O hide behind compute?).
    """
    import shutil

    import numpy as np

    from parcels_tpu import FieldSet, ParticleSet
    from parcels_tpu.convert import nemo_to_sgrid
    from parcels_tpu.datasets.moi import moi_like_inputs
    from parcels_tpu.io import open_zarr_dataset, write_zarr_dataset
    from parcels_tpu.kernels import AdvectionRK4

    tdim, zdim, ydim, xdim = shape
    path = "/tmp/bench_c5_stream.zarr"
    shutil.rmtree(path, ignore_errors=True)
    fields, coords = moi_like_inputs(xdim=xdim, ydim=ydim, zdim=zdim, tdim=tdim)
    ds = nemo_to_sgrid(fields=fields, coords=coords)
    t0 = time.perf_counter()
    write_zarr_dataset(ds, path)
    print(f"wrote {path} in {time.perf_counter()-t0:.1f}s", flush=True)

    def seed(fs):
        rng = np.random.default_rng(4)
        return ParticleSet(
            fs,
            x=rng.uniform(-170, 170, npart),
            y=rng.uniform(-60, 70, npart),
            t=np.zeros(npart),
        )

    results = {}
    for label, fs in (
        ("resident", FieldSet.from_sgrid_conventions(ds)),
        ("streamed", FieldSet.from_sgrid_conventions(open_zarr_dataset(path))),
    ):
        if label == "streamed":
            fs.set_time_window(2)
        pset = seed(fs)
        t0 = time.perf_counter()
        pset.execute(
            AdvectionRK4,
            dt=np.timedelta64(int(dt), "s"),
            runtime=np.timedelta64(days, "D"),
        )
        wall = time.perf_counter() - t0
        steps = days * 86400 / dt
        rate = npart * steps / wall
        stats = getattr(fs, "window_stats", None)
        print(
            f"{label}: {rate/1e6:6.2f} M particle-steps/s (wall {wall:.1f}s)"
            + (f" window_stats={stats}" if label == "streamed" and stats else ""),
            flush=True,
        )
        results[label] = rate
        # free this leg's device residency (fields + derived tables +
        # executor-held SoA copies) before the next leg: both legs sharing
        # one 16 GB chip in one process measured ResourceExhausted (r5)
        import gc

        object.__setattr__(fs, "_device_cache", None)
        fs._executor_cache.clear()
        del pset
        gc.collect()
    ratio = results["streamed"] / max(results["resident"], 1e-9)
    print(f"streaming overhead: streamed/resident = {ratio:.2f}", flush=True)
    return results


def main():
    import jax

    _cache()
    npart = int(os.environ.get("N", 10_000_000))
    steps = int(os.environ.get("STEPS", 10))
    dt = float(os.environ.get("DT", 600.0))
    shape = tuple(int(s) for s in os.environ.get("SHAPE", "2,50,1500,2000").split(","))
    dev = jax.devices()[0]
    per_comp = np.prod(shape) * 4 / 2**30
    print(f"device={dev.platform} field {shape} (~{per_comp:.2f} GiB/component), "
          f"n={npart}, {steps} steps, dt={dt}s", flush=True)

    if os.environ.get("SKIP_BW"):
        bw = float(os.environ.get("HBM_BW_GBPS", "652")) * 1e9  # prior measured value
        print(f"using prior measured HBM bandwidth: {bw/1e9:.0f} GB/s", flush=True)
    else:
        bw = measured_hbm_bw()
        print(f"measured streamed HBM bandwidth: {bw/1e9:.0f} GB/s", flush=True)

    if os.environ.get("STREAMED"):
        sshape = tuple(
            int(s) for s in os.environ.get("STREAM_SHAPE", "6,50,1000,1000").split(",")
        )
        run_streamed(sshape, int(os.environ.get("STREAM_N", 2_000_000)), dt,
                     int(os.environ.get("STREAM_DAYS", 1)))
        return

    with_w = bool(os.environ.get("W3D"))
    kernel = None
    z_spread = None
    if with_w:
        from parcels_tpu.kernels import AdvectionRK4_3D

        kernel = AdvectionRK4_3D
        z_spread = float(os.environ.get("ZSPREAD", 1000.0))
        print("3-D variant: U,V,W + RK4_3D, z in [1, %g] m" % z_spread, flush=True)

    results = {}
    modes = tuple(os.environ.get("MODES", "off,force").split(","))
    for mode in modes:
        os.environ["PARCELS_TPU_SORT_MODE"] = mode
        os.environ["PARCELS_TPU_BINNED"] = mode
        fs = build_fieldset(shape, with_w=with_w)
        try:
            rate, frac = run_bench(fs, npart, steps, dt, kernel=kernel, z_spread=z_spread)
        except Exception as e:  # tunnel/worker crashes kill one mode, not the run
            print(f"mode {mode} failed: {type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        label = "binned+sorted" if mode == "force" else "gather"
        results[label] = rate
        implied = rate * GATHER_BYTES_PER_STEP
        bound = bw / GATHER_BYTES_PER_STEP
        print(
            f"C-grid RK4 {label:>13}: {rate/1e6:8.2f} M particle-steps/s "
            f"(active {frac:.3f}) | min-traffic model: {implied/1e9:6.1f} GB/s implied, "
            f"bound {bound/1e6:.1f} M steps/s, at {100*rate/bound:5.1f}% of bound",
            flush=True,
        )

    import json

    print(json.dumps({
        "metric": "config5 particle-steps/sec/chip (RK4, 10M, MOi-shaped C-grid)",
        "gather": round(results.get("gather", 0.0), 1),
        "binned_sorted": round(results.get("binned+sorted", 0.0), 1),
        "hbm_bw_measured_GBps": round(bw / 1e9, 1),
        "gather_model_bytes_per_step": GATHER_BYTES_PER_STEP,
    }))


if __name__ == "__main__":
    main()
