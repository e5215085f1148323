"""Within-process sweep of the stage-cache fix-up round capacity (_K_DIV)
at the config-5 shape — tunnel-variance-immune A/B for the rounds design."""

import os
import sys

_d = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [_d, os.path.dirname(_d)]  # scripts dir + repo root

import bench_config5 as c5


def main():
    import jax
    import jax.numpy as jnp

    from parcels_tpu.ops import stagecache

    c5._cache()
    shape = tuple(int(s) for s in os.environ.get("SHAPE", "2,50,1500,2000").split(","))
    npart = int(os.environ.get("N", 10_000_000))
    steps = int(os.environ.get("STEPS", 10))
    divs = [int(d) for d in os.environ.get("DIVS", "16,64,256").split(",")]

    fs = c5.build_fieldset(shape)
    print(f"n={npart} shape={shape} divs={divs}", flush=True)
    for d in divs:
        stagecache._K_DIV = d
        rate, _ = c5.run_bench(fs, npart, steps, 600.0)
        print(f"K_DIV={d:4d}: {rate/1e6:8.2f} M particle-steps/s", flush=True)


if __name__ == "__main__":
    main()
