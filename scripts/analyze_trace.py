"""Aggregate a jax.profiler device trace into per-source time + HBM bytes.

Reads the newest trace under OUT (default /tmp/trace_config5), filters to
TPU-pid leaf ops (whiles and jit_ umbrellas excluded — they double-count
their bodies), and groups device time and ``bytes_accessed`` by the
``source`` file:line XLA recorded. Prints a table plus the measured
bytes/particle-step and the % of the measured HBM roofline the chunk
achieved — the honest replacement for the static 400 B/step model
(VERDICT r4 task 2).

Env: OUT (trace dir), N (lanes, default 10M), STEPS (default 8),
HBM_BW_GBPS (default 662).
"""

import gzip
import json
import os
import sys
from collections import defaultdict


def load_events(out_dir):
    base = os.path.join(out_dir, "plugins", "profile")
    run = sorted(os.listdir(base))[-1]
    d = os.path.join(base, run)
    tp = [f for f in os.listdir(d) if f.endswith(".trace.json.gz")][0]
    with gzip.open(os.path.join(d, tp)) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    dev_pids = {
        e["pid"]
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    return [e for e in ev if e.get("ph") == "X" and e.get("pid") in dev_pids]


def main():
    out_dir = os.environ.get("OUT", "/tmp/trace_config5")
    npart = int(os.environ.get("N", 10_000_000))
    steps = int(os.environ.get("STEPS", 8))
    bw = float(os.environ.get("HBM_BW_GBPS", 662.0)) * 1e9

    ev = load_events(out_dir)
    t_by_src = defaultdict(float)
    b_by_src = defaultdict(float)
    n_by_src = defaultdict(int)
    total_t = 0.0
    total_b = 0.0
    for e in ev:
        name = e.get("name", "")
        if name.startswith(("jit_", "while")):  # umbrellas double-count bodies
            continue
        args = e.get("args") or {}
        dur = e.get("dur", 0)  # us
        cat = args.get("hlo_category", "?")
        if cat == "while":
            continue
        src = args.get("source", "")
        if src:
            src = "/".join(src.rsplit("/", 2)[-2:])
        else:
            src = f"<{cat}>"
        by = float(args.get("bytes_accessed", 0) or 0)
        t_by_src[src] += dur
        b_by_src[src] += by
        n_by_src[src] += 1
        total_t += dur
        total_b += by

    print(
        f"leaf-op device time {total_t/1e3:.1f} ms over {steps} steps of {npart} lanes: "
        f"{npart*steps/(total_t*1e-6)/1e6:.1f} M steps/s"
    )
    bps = total_b / (npart * steps)
    ach = total_b / (total_t * 1e-6)
    print(
        f"measured HBM traffic {total_b/2**30:.2f} GiB -> {bps:.0f} B/particle-step; "
        f"achieved {ach/1e9:.0f} GB/s = {100*ach/bw:.0f}% of {bw/1e9:.0f} GB/s roofline"
    )
    print(f"{'ms':>9} {'%t':>5} {'GiB':>8} {'GB/s':>6} {'ops':>6}  source")
    for src in sorted(t_by_src, key=lambda s: -t_by_src[s])[:30]:
        t = t_by_src[src]
        b = b_by_src[src]
        print(
            f"{t/1e3:9.1f} {100*t/total_t:5.1f} {b/2**30:8.2f} "
            f"{b/(t*1e-6)/1e9 if t else 0:6.0f} {n_by_src[src]:6d}  {src}"
        )


if __name__ == "__main__":
    sys.exit(main())
