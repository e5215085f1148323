"""Device-trace one config-5 engine chunk and print the per-HLO-op costs.

jax.profiler works over the axon tunnel (round-4 discovery): device-side
XLA op durations land in the trace JSON under the TPU pid, which turns
the "what does a 193 ms RK stage actually spend" question into a table.
Single-call wall timings over the tunnel carry a ~47 ms fixed dispatch
latency, so ONLY in-trace device durations (or diffed multi-step runs)
are trustworthy.

Env: N (default 10M), SHAPE (default 2,50,1500,2000), STEPS (default 4),
MODE (sampler env already applied), OUT (trace dir).
"""

import gzip
import json
import os
import sys
import time
from collections import defaultdict

_d = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [_d, os.path.dirname(_d)]  # scripts dir + repo root

import numpy as np

import bench_config5 as c5


def main():
    import jax
    import jax.numpy as jnp

    c5._cache()
    shape = tuple(int(s) for s in os.environ.get("SHAPE", "2,50,1500,2000").split(","))
    npart = int(os.environ.get("N", 10_000_000))
    steps = int(os.environ.get("STEPS", 4))
    out_dir = os.environ.get("OUT", "/tmp/trace_config5")
    os.makedirs(out_dir, exist_ok=True)

    from parcels_tpu._core.engine import build_chunk_executor
    from parcels_tpu.kernels import AdvectionRK4
    from parcels_tpu.ops import stagecache as _sc
    from parcels_tpu.ops.binned_sample import set_z_occupancy_hint

    fs = c5.build_fieldset(shape)
    zdim = fs._gridset[0].depth.size
    set_z_occupancy_hint(1.0 / max(zdim - 1, 1))
    nblocks = max(1, -(-npart // 2**22))
    while npart % nblocks:
        nblocks += 1
    executor = build_chunk_executor(
        (AdvectionRK4,), fs, sign_dt=1, rk45_mode=False, donate=False,
        block_size=npart // nblocks,
    )
    farrays = c5.device_farrays(fs)
    pdata = c5.device_pdata(npart, dt=600.0)
    sc_ok, sc_w = _sc.soa_cache_applicable(fs)
    if sc_ok:
        pdata.update(_sc.make_soa_cache_device(npart, sc_w))
    print(f"n={npart} shape={shape} persist={sc_ok}", flush=True)

    # warm: compile + populate the persistent cache (steady state)
    pdata = executor(farrays, pdata, jnp.float32(600.0), jnp.float32(600.0))
    np.asarray(pdata["t"][:1])
    pdata = executor(farrays, pdata, jnp.float32(1200.0), jnp.float32(600.0))
    np.asarray(pdata["t"][:1])

    t0 = time.perf_counter()
    with jax.profiler.trace(out_dir):
        out = executor(
            farrays, pdata, jnp.float32(600.0 * (2 + steps)), jnp.float32(600.0)
        )
        np.asarray(out["t"][:1])
    wall = time.perf_counter() - t0
    print(f"traced {steps} steps in {wall:.2f}s wall", flush=True)

    # newest trace dir
    base = os.path.join(out_dir, "plugins", "profile")
    run = sorted(os.listdir(base))[-1]
    tp = [f for f in os.listdir(os.path.join(base, run)) if f.endswith(".trace.json.gz")][0]
    with gzip.open(os.path.join(base, run, tp)) as f:
        d = json.load(f)
    ev = d.get("traceEvents", [])
    dev_pids = {
        e["pid"]
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in ev:
        if e.get("ph") == "X" and "dur" in e and e.get("pid") in dev_pids:
            tot[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    total = sum(tot.values())
    # the jit_chunk umbrella event double-counts its children
    inner = {k: v for k, v in tot.items() if not k.startswith("jit_")}
    itotal = sum(inner.values())
    print(f"\ndevice total (incl umbrella): {total/1e3:.1f} ms; op sum: {itotal/1e3:.1f} ms; "
          f"per step: {itotal/1e3/steps:.1f} ms -> {npart*steps/(itotal*1e-6)/1e6:.1f} M steps/s")
    print(f"{'ms':>10} {'ms/step':>9} {'x':>6}  op")
    for k, v in sorted(inner.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{v/1e3:10.2f} {v/1e3/steps:9.2f} {cnt[k]:6d}  {k[:110]}")


if __name__ == "__main__":
    main()
