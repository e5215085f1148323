"""Ablation: where does config-5 curvilinear C-grid step time go?

Runs N-particle RK4 chunks on the SAME MOi-shaped grid in one process,
toggling one dimension at a time:

  a) C-grid velocity, binned+sorted sampler     (the config-5 path)
  b) C-grid velocity, plain gather sampler
  c) A-grid XLinear_Velocity, binned+sorted     (same curvilinear search)
  d) A-grid XLinear_Velocity, gather
  (the rectilinear no-search comparison is scripts/bench_large3d.py at the
   same SHAPE)

Differences between adjacent rows attribute time to the binned sampler, the
C-grid face-flux math, and the curvilinear search respectively. All runs are
timed with the same diff-of-two-chunk-lengths scheme so tunnel latency
cancels; rows run back-to-back in one process so tunnel *throughput* drift
between rows is minimized.

Env: N (default 2_000_000), STEPS (5), SHAPE (2,50,1000,1000).
"""

import os
import time

import numpy as np


def main():
    import jax

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from bench_config5 import build_fieldset, device_farrays, device_pdata

    from parcels_tpu._core.engine import build_chunk_executor
    from parcels_tpu.interpolators import XLinear_Velocity
    from parcels_tpu.kernels import AdvectionRK4

    npart = int(os.environ.get("N", 2_000_000))
    steps = int(os.environ.get("STEPS", 5))
    dt = 600.0
    shape = tuple(int(s) for s in os.environ.get("SHAPE", "2,50,1000,1000").split(","))
    print(f"device={jax.devices()[0].platform} shape={shape} n={npart} steps={steps}", flush=True)

    def run_case(label, mode, agrid=False):
        os.environ["PARCELS_TPU_SORT_MODE"] = mode
        os.environ["PARCELS_TPU_BINNED"] = mode
        fs = build_fieldset(shape)
        if agrid:
            fs.fields["UV"].interp_method = XLinear_Velocity()
        try:
            executor = build_chunk_executor(
                (AdvectionRK4,), fs, sign_dt=1, rk45_mode=False, donate=False,
                block_size=max(npart, 2**21),
            )
            farrays = device_farrays(fs)
            pdata = device_pdata(npart, dt=dt)
            pdata = executor(farrays, pdata, jnp.float32(dt), jnp.float32(dt))
            np.asarray(pdata["t"][:1])

            def run(k):
                t0 = time.perf_counter()
                out = executor(farrays, pdata, jnp.float32(dt * (k + 1)), jnp.float32(dt))
                np.asarray(out["t"][:1])
                return time.perf_counter() - t0

            el = run(steps + 1) - run(1)
            rate = npart * steps / max(el, 1e-9)
            print(f"{label:42s} {rate/1e6:8.2f} M steps/s", flush=True)
        except Exception as e:
            print(f"{label:42s} FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)

    run_case("a) C-grid + binned+sorted (config-5 path)", "force")
    run_case("b) C-grid + gather", "off")
    run_case("c) A-grid XLinear + binned+sorted", "force", agrid=True)
    run_case("d) A-grid XLinear + gather", "off", agrid=True)


if __name__ == "__main__":
    main()
