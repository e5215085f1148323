"""Output-cost bench: public execute at N lanes with vs without ParticleFile.

Measures the per-outputdt cost of trajectory output (device->host pull of
the output columns + async parquet write) against the same run without an
output file. VERDICT r5 task 7's measurement.

Env: N (default 10M), STEPS (default 60), OUTEVERY (steps per outputdt,
default 10).
"""
import os
import sys
import time

_d = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [_d, os.path.dirname(_d)]

import numpy as np


def main():
    import jax

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from parcels_tpu import FieldSet, ParticleFile, ParticleSet
    from parcels_tpu.datasets import moving_eddy_dataset
    from parcels_tpu.kernels import AdvectionRK4

    n = int(os.environ.get("N", 10_000_000))
    steps = int(os.environ.get("STEPS", 60))
    outevery = int(os.environ.get("OUTEVERY", 10))
    dt = 60.0
    ds = moving_eddy_dataset()
    rng = np.random.default_rng(1)

    def run(with_output):
        fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
        pset = ParticleSet(
            fs,
            x=rng.uniform(4000, 21000, n),
            y=rng.uniform(4000, 21000, n),
            t=np.zeros(n),
        )
        kw = {}
        pf = None
        if with_output:
            path = "/tmp/bench_output.parquet"
            if os.path.exists(path):
                os.unlink(path)
            pf = ParticleFile(path, outputdt=np.timedelta64(int(dt * outevery), "s"))
            kw["output_file"] = pf
        t0 = time.perf_counter()
        pset.execute(
            AdvectionRK4,
            dt=np.timedelta64(int(dt), "s"),
            runtime=np.timedelta64(int(dt * steps), "s"),
            **kw,
        )
        if pf is not None:
            pf.close()
        wall = time.perf_counter() - t0
        return wall

    run(False)  # compile warm
    w_off = run(False)
    w_on = run(True)
    nout = steps // outevery + 1
    print(
        f"n={n} steps={steps} outputs={nout}: no-output {w_off:.2f}s, "
        f"with-output {w_on:.2f}s -> +{(w_on-w_off):.2f}s total, "
        f"{(w_on-w_off)/nout*1e3:.0f} ms/output-step "
        f"({n*steps/w_on/1e6:.1f} M steps/s with output)",
        flush=True,
    )


if __name__ == "__main__":
    main()
