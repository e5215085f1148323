"""Scaling-efficiency harness: banded domain execution over 1..N devices.

BASELINE.json's north-star gate is ">90% scaling efficiency 1 -> N hosts".
This script measures particle-steps/s for the SAME total workload on
1, 2, 4, ... devices of whatever mesh is attached (YBandDomain + per-step
ICI migration), and prints per-size throughput + efficiency vs the
single-device run.

On this container only one real TPU chip is reachable, so CI runs it on
the virtual CPU mesh (JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_
platform_device_count=8) — that validates the mechanics and measures the
collective/migration *overhead* structure, not TPU ICI performance. On a
real pod slice it runs unchanged and produces the honest number.

Timing uses the two-length difference trick from bench.py to cancel
host-sync latency.

Env knobs: N (total particles, default 200_000), STEPS (default 20),
YDIM/XDIM (grid nodes, default 256/64).
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

    from parcels_tpu import FieldSet, ParticleSet
    from parcels_tpu.datasets import simple_UV_dataset
    from parcels_tpu.kernels import AdvectionRK4
    from parcels_tpu.parallel import YBandDomain
    from parcels_tpu.parallel.domain import build_domain_executor

    npart = int(os.environ.get("N", 200_000))
    steps = int(os.environ.get("STEPS", 20))
    ydim = int(os.environ.get("YDIM", 256))
    xdim = int(os.environ.get("XDIM", 64))
    dt = 600.0

    ndev = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= ndev]
    print(f"devices={ndev} ({jax.devices()[0].platform}), n={npart}, {steps} steps")

    rng = np.random.default_rng(0)
    x = rng.uniform(-9e5, 9e5, npart)
    y = rng.uniform(-9e5, 9e5, npart)

    base = None
    for n_bands in sizes:
        ds = simple_UV_dataset(dims=(2, 2, ydim, xdim), mesh="flat")
        ds["U"].values[:] = 0.1
        ds["V"].values[:] = 5.0  # northward drift forces steady migration
        fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
        dom = YBandDomain(fs, n_bands=n_bands, halo=2)
        pset = ParticleSet(fs, x=x.copy(), y=y.copy(), t=np.zeros(npart))
        executor = build_domain_executor(
            (AdvectionRK4,), dom, sign_dt=1, rk45_mode=False
        )
        farrays = dom.stacked_farrays()
        dev = dom.shard_soa(pset._data)

        def run(k):
            t0 = time.perf_counter()
            out = executor(farrays, dev, np.float32(dt * k), np.float32(dt))
            np.asarray(out["t"][:1])
            return time.perf_counter() - t0

        run(1)  # compile
        k0 = max(steps // 10, 1)
        elapsed = run(steps + k0) - run(k0)
        rate = npart * steps / max(elapsed, 1e-9)
        if base is None:
            base = rate
        eff = rate / (base * n_bands) if n_bands > 1 else 1.0
        print(
            f"bands={n_bands:2d}: {rate/1e6:9.2f} M particle-steps/s"
            f"  efficiency vs 1-dev ideal: {eff:6.1%}",
            flush=True,
        )


if __name__ == "__main__":
    main()
