"""Config-3-style benchmark: 1M particles, Euler-Maruyama advection-diffusion
with out-of-bounds delete recovery (BASELINE.json config 3).

Runs the production executor over a small time-varying 2-D fieldset with
uniform Kh fields, a recovery kernel deleting OOB particles, and the
on-device counter-based RNG. Prints particle-steps/s with the same
latency-cancelling two-length timing as bench.py.

Env knobs: N (default 1_000_000), STEPS (default 20).
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from parcels_tpu import FieldSet, ParticleSet, StatusCode
    from parcels_tpu.datasets import moving_eddy_dataset
    from parcels_tpu.kernels import AdvectionDiffusionEM

    npart = int(os.environ.get("N", 1_000_000))
    steps = int(os.environ.get("STEPS", 20))
    dt = 60.0

    fs = FieldSet.from_sgrid_conventions(moving_eddy_dataset(), mesh="flat")
    fs.add_constant_field("Kh_zonal", 10.0, mesh="flat")
    fs.add_constant_field("Kh_meridional", 10.0, mesh="flat")
    fs.add_context("dres", 0.01)

    def DeleteOOB(particles, fieldset):
        particles[particles.state >= 50].state = StatusCode.Delete

    rng = np.random.default_rng(3)
    pset = ParticleSet(
        fs,
        x=rng.uniform(4000, 21000, npart),
        y=rng.uniform(4000, 21000, npart),
        t=np.zeros(npart),
    )

    def run(k):
        t0 = time.perf_counter()
        pset.execute(
            [AdvectionDiffusionEM, DeleteOOB],
            dt=np.timedelta64(int(dt), "s"),
            runtime=np.timedelta64(int(dt * k), "s"),
        )
        return time.perf_counter() - t0

    run(1)  # compile + warm
    k0 = max(steps // 10, 1)
    elapsed = run(steps + k0) - run(k0)
    rate = npart * steps / max(elapsed, 1e-9)
    frac = len(pset) / npart
    print(
        f"EM diffusion + OOB recovery: {rate/1e6:8.1f} M particle-steps/s "
        f"(n={npart}, {steps} steps, surviving {frac:.3f})"
    )


if __name__ == "__main__":
    main()
