"""Config-4-style benchmark: 1M particles, RK4_3D, HBM-scale 3-D field.

Runs the production engine executor (build_chunk_executor) over a
(2, 50, 500, 500) ~100 MB/component rectilinear 3-D UVW fieldset — the
regime where the binned slab sampler + sorted-chunk mode replaces the
16-corner gather — and reports particle-steps/s for both modes.

BASELINE.json config 4 is "3D curvilinear NEMO C-grid subset, 1M
particles"; this synthetic case isolates the large-field sampling cost on
a rectilinear grid (the curvilinear search itself is benchmarked
separately) at the same data scale.

Env knobs: N (default 1_000_000), STEPS (default 10), SHAPE (t,z,y,x).
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import os
import time

import numpy as np


def build_fieldset(shape):
    import parcels_tpu.xrlite as xr
    from parcels_tpu import FieldSet
    from parcels_tpu.datasets.structured import _coords_2d, _wrap_sgrid

    tdim, zdim, ydim, xdim = shape
    lon = np.linspace(0.0, 1e6, xdim)
    lat = np.linspace(0.0, 1e6, ydim)
    time_ = np.array(
        [np.datetime64("2000-01-01") + np.timedelta64(i * 3600, "s") for i in range(tdim)]
    )
    depth = np.linspace(0.0, 500.0, zdim)
    rng = np.random.default_rng(7)
    mk = lambda s: rng.uniform(-0.3, 0.3, shape).astype(np.float32) * s
    ds = xr.Dataset(
        {
            "U": (["time", "depth", "YG", "XG"], mk(1.0)),
            "V": (["time", "depth", "YG", "XG"], mk(1.0)),
            "W": (["time", "depth", "YG", "XG"], mk(1e-3)),
        },
        coords=_coords_2d(lon, lat, time=time_, depth=depth, mesh="flat"),
    )
    ds = _wrap_sgrid(ds, xdim, ydim)
    return FieldSet.from_sgrid_conventions(ds, mesh="flat")


def device_pdata(npart, seed=1):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    kx, ky, kz = jax.random.split(key, 3)
    return {
        "t": jnp.zeros(npart, jnp.float32),
        "z": jax.random.uniform(kz, (npart,), jnp.float32, 10.0, 490.0),
        "y": jax.random.uniform(ky, (npart,), jnp.float32, 1e5, 9e5),
        "x": jax.random.uniform(kx, (npart,), jnp.float32, 1e5, 9e5),
        "dz": jnp.zeros(npart, jnp.float32),
        "dy": jnp.zeros(npart, jnp.float32),
        "dx": jnp.zeros(npart, jnp.float32),
        "particle_id": jnp.arange(npart, dtype=jnp.int32),
        "dt": jnp.full(npart, 60.0, jnp.float32),
        "state": jnp.full(npart, 10, jnp.int32),
        "ei": jnp.zeros((npart, 1), jnp.int32),
        "_tc": jnp.zeros(npart, jnp.float32),
        "_active": jnp.ones(npart, bool),
        "_rng": jnp.asarray(np.array([12345, 6789], np.uint32)),
    }


def run_mode(fs, npart, steps, dt=60.0, kernel=None):
    import jax.numpy as jnp

    from parcels_tpu._core.engine import build_chunk_executor
    from parcels_tpu.kernels import AdvectionRK4_3D

    if kernel is None:
        kernel = AdvectionRK4_3D
    executor = build_chunk_executor(
        (kernel,),
        fs,
        sign_dt=1,
        rk45_mode=False,
        donate=False,
        block_size=max(npart, 2**21),
    )
    farrays = fs.device_arrays()
    pdata0 = device_pdata(npart)
    # warmup compiles AND populates the ei cache (the engine's bin-sort keys
    # come from ei; a cold all-zero cache would overflow the first chunk)
    pdata = executor(farrays, pdata0, jnp.float32(dt), jnp.float32(dt))
    np.asarray(pdata["t"][:1])  # host-read sync (tunnel-safe)

    def run(k):
        t0 = time.perf_counter()
        out = executor(farrays, pdata, jnp.float32(dt * (k + 1)), jnp.float32(dt))
        np.asarray(out["t"][:1])
        return time.perf_counter() - t0

    # difference two run lengths: cancels the tunnel's per-sync latency
    k0 = max(steps // 10, 1)
    elapsed = run(steps + k0) - run(k0)

    out = executor(farrays, pdata, jnp.float32(dt * (steps + 1)), jnp.float32(dt))
    ok = jnp.all(jnp.where(out["_active"], out["t"] == np.float32(dt * (steps + 1)), True))
    frac = float(np.asarray(jnp.mean(out["_active"].astype(jnp.float32))))
    assert bool(np.asarray(ok)), "clock did not advance uniformly"
    return npart * steps / max(elapsed, 1e-9), frac


def build_cgrid_fieldset(shape, geom_table=True):
    """Large 3-D C-grid fieldset (U on (YG,XC), V on (YC,XG) faces)."""
    import parcels_tpu._sgrid as sgrid
    import parcels_tpu.xrlite as xr
    from parcels_tpu import FieldSet
    from parcels_tpu.datasets.structured import _cgrid_coords

    tdim, zdim, ydim, xdim = shape
    lon = np.linspace(0.0, 1e6, xdim)
    lat = np.linspace(0.0, 1e6, ydim)
    rng = np.random.default_rng(8)
    mk = lambda: rng.uniform(-0.3, 0.3, shape).astype(np.float32)
    coords = _cgrid_coords(lon, lat, xdim, ydim)
    coords["time"] = (
        ["time"],
        np.array([np.timedelta64(i * 3600, "s") for i in range(tdim)]),
        {"axis": "T"},
    )
    coords["depth"] = (["depth"], np.linspace(0.0, 500.0, zdim), {"axis": "Z"})
    ds = xr.Dataset(
        {
            "U": (["time", "depth", "YG", "XC"], mk()),
            "V": (["time", "depth", "YC", "XG"], mk()),
        },
        coords=coords,
    )
    meta = sgrid.SGrid2DMetadata(
        node_dimensions=("XG", "YG"),
        node_coordinates=("lon", "lat"),
        face_dimensions=(
            sgrid.FaceNodePadding("XC", "XG", sgrid.Padding.LOW),
            sgrid.FaceNodePadding("YC", "YG", sgrid.Padding.LOW),
        ),
        vertical_dimensions=(sgrid.FaceNodePadding("ZC", "depth", sgrid.Padding.BOTH),),
    )
    ds = sgrid.attach_sgrid_metadata(ds, meta)
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    if not geom_table:
        fs._gridset[0]._needs_cgrid_geom = False  # force corner-gather fallback
    return fs


def main():
    import jax

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    npart = int(os.environ.get("N", 1_000_000))
    steps = int(os.environ.get("STEPS", 10))
    shape = tuple(int(s) for s in os.environ.get("SHAPE", "2,50,500,500").split(","))
    print(f"field {shape} (~{np.prod(shape)*4/2**20:.0f} MB/component), n={npart}, {steps} steps")

    for mode in ("off", "force"):
        os.environ["PARCELS_TPU_SORT_MODE"] = mode
        os.environ["PARCELS_TPU_BINNED"] = mode
        fs = build_fieldset(shape)
        rate, frac = run_mode(fs, npart, steps)
        label = "binned+sorted" if mode == "force" else "gather       "
        print(f"A-grid {label}: {rate/1e6:8.2f} M particle-steps/s  (active {frac:.3f})", flush=True)

    from parcels_tpu.kernels import AdvectionRK4

    for mode, geom in (("off", False), ("off", True), ("force", True)):
        os.environ["PARCELS_TPU_SORT_MODE"] = mode
        os.environ["PARCELS_TPU_BINNED"] = mode
        fs = build_cgrid_fieldset(shape, geom_table=geom)
        rate, frac = run_mode(fs, npart, steps, kernel=AdvectionRK4)
        label = f"geom={'Y' if geom else 'N'} {'binned+sorted' if mode == 'force' else 'gather       '}"
        print(f"C-grid {label}: {rate/1e6:8.2f} M particle-steps/s  (active {frac:.3f})", flush=True)


if __name__ == "__main__":
    main()
