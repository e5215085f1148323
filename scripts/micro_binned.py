"""Probe: binned-sampler kernel vs fixup cost with latency-cancelling timing.

The tunnel adds ~30 ms to every host sync, so single-shot timings are
meaningless. Each variant runs k iterations inside one jitted fori_loop;
rate = n*(k2-k1)/(t2-t1).

Usage: python scripts/micro_binned.py [n_millions]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def loop_rate(step_fn, n, k1=2, k2=10):
    """Particles/s of step_fn via differenced k-iteration loops."""

    def many(k):
        @jax.jit
        def run(d, bc):
            def body(i, acc):
                # i-dependent indices AND weights: nothing index-derived
                # (plan, compaction, gathers) can be hoisted out of the loop
                return acc + step_fn(d, bc + i.astype(jnp.float32) * 1e-7, i % 2)[
                    ::65536
                ].sum()

            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        return run

    run1, run2 = many(k1), many(k2)

    def t(run):
        out = run(*_args)
        float(out)
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            out = run(*_args)
            float(out)
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = t(run1), t(run2)
    return n * (k2 - k1) / max(t2 - t1, 1e-9)


def main():
    global _args
    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    shape4 = (2, 50, 500, 500)
    n = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 2_000_000
    key = jax.random.PRNGKey(0)
    kd, kz, ky, kx, kb = jax.random.split(key, 5)
    data = jax.random.uniform(kd, shape4, jnp.float32)
    T, Z, Y, X = shape4
    zi = jax.random.randint(kz, (n,), 0, Z - 1)
    yi = jax.random.randint(ky, (n,), 0, Y - 1)
    xi = jax.random.randint(kx, (n,), 0, X - 1)
    bc0 = jax.random.uniform(kb, (4, n), jnp.float32, 0.0, 0.9)

    from parcels_tpu.ops import binned_sample as bs

    skey = bs.sort_key_for(
        None,
        {ax: {"index": v} for ax, v in (("Z", zi), ("Y", yi), ("X", xi))},
        shape4,
        n,
    )
    _, order = jax.lax.sort_key_val(skey.astype(jnp.int32), jnp.arange(n, dtype=jnp.int32))
    zs, ys, xs = (jnp.take(a, order) for a in (zi, yi, xi))
    _args = (data, bc0)

    def mkgpos(bc, di=0):
        return {
            "T": {"index": jnp.zeros(n, jnp.int32), "bcoord": bc[0]},
            "Z": {"index": zs.astype(jnp.int32), "bcoord": bc[1]},
            "Y": {"index": ys.astype(jnp.int32), "bcoord": bc[2]},
            "X": {
                "index": jnp.clip(xs.astype(jnp.int32) + di, 0, X - 2),
                "bcoord": bc[3],
            },
            "_sorted": True,
        }

    geom = bs.slab_geometry(shape4, n)
    plan = bs._build_plan(shape4, mkgpos(bc0))
    ovf = float(jnp.mean(plan["overflow"].astype(jnp.float32)))
    print(f"geometry {geom}  overflow {ovf:.4f}", flush=True)

    r = loop_rate(
        lambda d, bc, di: bs._run_kernel(d, bs._build_plan(shape4, mkgpos(bc, di))), n
    )
    print(f"kernel only:      {r/1e6:8.1f} M samples/s", flush=True)

    r = loop_rate(lambda d, bc, di: bs.binned_linear_sample(d, mkgpos(bc, di)), n)
    print(f"kernel + fixup:   {r/1e6:8.1f} M samples/s", flush=True)

    def gather_step(d, bc, di):
        gpos = mkgpos(bc, di)
        gidx = {ax: (gpos[ax]["index"], gpos[ax]["bcoord"]) for ax in "TZYX"}
        return bs._gather16(d, gidx)

    r = loop_rate(gather_step, n)
    print(f"16-corner gather: {r/1e6:8.1f} M samples/s", flush=True)


if __name__ == "__main__":
    main()
