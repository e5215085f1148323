"""Probe: per-launch wall vs chunk steps at the driver bench shape.

Separates fixed per-launch cost (table builds, sort, tunnel sync) from the
per-step slope, which is the number bench.py's differenced timing is meant
to isolate. Prints wall seconds for k in K_LIST, twice each.

Env: SHAPE (default driver 2,50,1000,1000), N (default 2M), MODE (sort mode).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

mode = os.environ.get("MODE", "auto")
if mode != "auto":
    os.environ["PARCELS_TPU_SORT_MODE"] = mode
    os.environ["PARCELS_TPU_BINNED"] = mode

import bench_config5 as c5  # noqa: E402  (scripts/ on path via __file__ parent)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    from parcels_tpu._core.engine import build_chunk_executor
    from parcels_tpu.kernels import AdvectionRK4
    from parcels_tpu.ops.binned_sample import set_z_occupancy_hint

    c5._cache()
    shape = tuple(int(s) for s in os.environ.get("SHAPE", "2,50,1000,1000").split(","))
    npart = int(os.environ.get("N", 2_000_000))
    dt = 600.0
    fs = c5.build_fieldset(shape)
    zdim = fs._gridset[0].depth.size
    set_z_occupancy_hint(1.0 / max(zdim - 1, 1))
    executor = build_chunk_executor(
        (AdvectionRK4,), fs, sign_dt=1, rk45_mode=False, donate=False,
        block_size=npart,
    )
    farrays = c5.device_farrays(fs)
    pdata0 = c5.device_pdata(npart, dt=dt)
    from parcels_tpu.ops import stagecache as _sc

    sc_ok, sc_w = _sc.soa_cache_applicable(fs)
    if sc_ok:
        pdata0.update(_sc.make_soa_cache_device(npart, sc_w))
    t0 = time.perf_counter()
    pdata = executor(farrays, pdata0, jnp.float32(dt), jnp.float32(dt))
    np.asarray(pdata["t"][:1])
    print(f"mode={mode} shape={shape} n={npart} warm+compile {time.perf_counter()-t0:.1f}s",
          flush=True)

    def run(k):
        t0 = time.perf_counter()
        out = executor(farrays, pdata, jnp.float32(dt * (k + 1)), jnp.float32(dt))
        np.asarray(out["t"][:1])
        return time.perf_counter() - t0

    for rep in range(2):
        walls = {}
        for k in (1, 2, 4, 8, 16, 32, 64):
            walls[k] = run(k)
        line = " ".join(f"k={k}:{w:.2f}s" for k, w in walls.items())
        # slope from the two largest
        slope = (walls[64] - walls[16]) / 48
        fixed = walls[16] - 16 * slope
        print(f"rep{rep}: {line} | slope {slope*1e3:.1f} ms/step "
              f"({npart/max(slope,1e-9)/1e6:.1f} M steps/s), fixed {fixed:.2f}s",
              flush=True)


if __name__ == "__main__":
    main()
