"""Regression: 10M full-config-5-shape runs COMPLETE in every sampler mode
(round-3 VERDICT #2 "kill, don't cap, the long-program worker crash").

Drives the PUBLIC ParticleSet.execute path — the adaptive cost-model
chunker (EngineOptions.chunk_target_seconds) sizes device launches from a
measured seconds-per-step estimate, so even the slow forced-gather mode
runs short launches instead of the multi-minute XLA programs that killed
the TPU worker in rounds 2-3.

Env: N (default 10_000_000), SHAPE (default 2,50,1500,2000), STEPS (6),
MODES (default "auto,gather,binned").
"""

import os
import sys
import time

_d = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [_d, os.path.dirname(_d)]

import numpy as np


def main():
    import jax

    import bench_config5 as c5
    from parcels_tpu import EngineOptions, ParticleSet

    c5._cache()
    shape = tuple(int(s) for s in os.environ.get("SHAPE", "2,50,1500,2000").split(","))
    npart = int(os.environ.get("N", 10_000_000))
    steps = int(os.environ.get("STEPS", 6))
    modes = os.environ.get("MODES", "auto,gather,binned").split(",")
    dt = 600.0
    print(f"device={jax.devices()[0].platform} n={npart} shape={shape} steps={steps}", flush=True)

    from parcels_tpu.kernels import AdvectionRK4

    for mode in modes:
        colgather = "off" if mode == "gather" else "auto"
        opts = EngineOptions(sampler=mode if mode != "gather" else "gather",
                             colgather=colgather)
        fs = c5.build_fieldset(shape)
        rng = np.random.default_rng(1)
        pset = ParticleSet(
            fs,
            x=rng.uniform(-170, 170, npart).astype(np.float32),
            y=rng.uniform(-60, 70, npart).astype(np.float32),
            t=np.zeros(npart, np.float32),
        )
        t0 = time.perf_counter()
        try:
            pset.execute(
                AdvectionRK4,
                dt=np.timedelta64(int(dt), "s"),
                runtime=np.timedelta64(int(dt) * steps, "s"),
                options=opts,
            )
        except Exception as e:  # noqa: BLE001
            print(f"mode {mode}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
            raise SystemExit(1)
        wall = time.perf_counter() - t0
        stats = pset.last_run_stats
        print(
            f"mode {mode}: COMPLETED {steps} steps in {wall:.0f}s wall; "
            f"chunks={stats['chunks']} chunk_steps_final={stats['chunk_steps_final']} "
            f"est={stats['est_seconds_per_step']}s/step", flush=True,
        )
    print("ALL MODES COMPLETED", flush=True)


if __name__ == "__main__":
    main()
