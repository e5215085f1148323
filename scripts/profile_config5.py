"""Per-stage device-time breakdown of one config-5 RK4 step (VERDICT r3 #1).

Times, diff-style (tunnel-latency-cancelling) on the real chip at the
flagship shape/population:

  1. curvilinear search, warm-started (the per-RK-stage cost in steady state)
  2. C-grid velocity eval = search + geometry row-gather + U/V samples
  3. one full engine RK4 step (kernel chain + state machine + clock)

and derives the interp-only and engine-overhead shares. Run with
PARCELS_TPU_COLGATHER=off to see the old gather path's breakdown.

Env: N (default 10_000_000), SHAPE (default 2,50,1500,2000), REPS.
"""

import os
import sys
import time

_d = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [_d, os.path.dirname(_d)]  # scripts dir + repo root

import numpy as np

import bench_config5 as c5


def timed(fn, *args, reps=3):
    import jax

    out = jax.block_until_ready(fn(*args))
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    c5._cache()
    shape = tuple(int(s) for s in os.environ.get("SHAPE", "2,50,1500,2000").split(","))
    npart = int(os.environ.get("N", 10_000_000))
    reps = int(os.environ.get("REPS", 3))
    print(f"shape={shape} n={npart} colgather={os.environ.get('PARCELS_TPU_COLGATHER','auto')}",
          flush=True)

    fs = c5.build_fieldset(shape)
    farrays = c5.device_farrays(fs)
    grid = fs._gridset[0]
    garrs = farrays["grids"][0]

    key = jax.random.PRNGKey(1)
    ky, kx = jax.random.split(key)
    y = jax.random.uniform(ky, (npart,), jnp.float32, -60.0, 70.0)
    x = jax.random.uniform(kx, (npart,), jnp.float32, -170.0, 170.0)
    z = jnp.full((npart,), 1.0, jnp.float32)
    t = jnp.zeros((npart,), jnp.float32)

    # warm ei from one cold search; garrs as args (see eval_uv note)
    def cold_fn(garrs, z, y, x):
        return grid.make_view(garrs).search(z, y, x)

    cold = jax.jit(cold_fn)
    g0 = cold(garrs, z, y, x)
    spec = grid.spec
    ydim, xdim = max(spec.ydim, 1), max(spec.xdim, 1)
    yi = jnp.clip(g0["Y"]["index"], 0, ydim - 1)
    xi = jnp.clip(g0["X"]["index"], 0, xdim - 1)
    zi = jnp.clip(g0["Z"]["index"], 0, max(spec.zdim - 1, 0))
    ei = ((zi * ydim + yi) * xdim + xi).astype(jnp.int32)
    jax.block_until_ready(ei)

    def warm_fn(garrs, z, y, x, ei):
        return grid.make_view(garrs).search(z, y, x, ei=ei)

    warm = jax.jit(warm_fn)
    t_search = timed(warm, garrs, z, y, x, ei, reps=reps)
    print(f"search (warm-started):        {t_search*1e3:8.1f} ms "
          f"({npart/t_search/1e6:7.1f} M lanes/s)", flush=True)
    t_cold = timed(cold, garrs, z, y, x, reps=reps)
    print(f"search (cold, raster+walk):   {t_cold*1e3:8.1f} ms "
          f"({npart/t_cold/1e6:7.1f} M lanes/s)", flush=True)

    def eval_uv(farrays, t, z, y, x):
        # search + C-grid geometry + U/V samples, as one RK stage does
        # (no particle-state writes: measures the pure compute path).
        # farrays passed as ARGUMENTS: closure-captured device arrays bake
        # into the HLO as constants and blow the remote-compile body limit.
        fsview = fs.build_views(farrays)
        return fsview.UV.eval(t, z, y, x)

    t_eval = timed(jax.jit(eval_uv), farrays, t, z, y, x, reps=reps)
    print(f"C-grid UV eval (cold search): {t_eval*1e3:8.1f} ms "
          f"({npart/t_eval/1e6:7.1f} M lanes/s)", flush=True)

    from parcels_tpu._core.engine import build_chunk_executor
    from parcels_tpu.kernels import AdvectionRK4

    nblocks = max(1, -(-npart // 2**22))
    while npart % nblocks:
        nblocks += 1
    executor = build_chunk_executor(
        (AdvectionRK4,), fs, sign_dt=1, rk45_mode=False, donate=False,
        block_size=npart // nblocks,
    )
    pdata = c5.device_pdata(npart, dt=600.0)
    warm_out = executor(farrays, pdata, jnp.float32(600.0), jnp.float32(600.0))
    np.asarray(warm_out["t"][:1])

    def chunk(k):
        return executor(farrays, warm_out, jnp.float32(600.0 * (k + 1)), jnp.float32(600.0))

    t1 = timed(chunk, 1, reps=reps)
    t5 = timed(chunk, 5, reps=reps)
    t_step = (t5 - t1) / 4
    print(f"engine RK4 step (4 stages):   {t_step*1e3:8.1f} ms "
          f"({npart/t_step/1e6:7.1f} M steps/s)", flush=True)

    interp = t_eval - t_cold  # uv.eval's internal search is the cold one
    stage = t_search + interp  # steady-state stage = warm search + interp
    overhead = t_step - 4 * stage
    print("\n-- stage shares per RK4 step (approx) --", flush=True)
    print(f"search  4x (warm): {4*t_search*1e3:8.1f} ms ({400*t_search/t_step:5.1f}%)")
    print(f"interp  4x:        {4*interp*1e3:8.1f} ms ({400*interp/t_step:5.1f}%)")
    print(f"engine/state/other:{overhead*1e3:8.1f} ms ({100*overhead/t_step:5.1f}%)")


if __name__ == "__main__":
    main()
