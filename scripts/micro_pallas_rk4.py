"""A/B: fused RK4 hit-path step — Pallas megakernel vs XLA (VERDICT r5 #9).

The r5 device trace shows the config-5 chunk is bandwidth-bound at
~10 KB/lane-step, dominated by per-lane STATE re-materialized at fusion
boundaries between the 4 RK stages — not by field gathers. The north-star
question: how much would fusing search+interp+RK into one kernel (state
lives in VMEM across stages; HBM sees each operand once) buy?

This measures the cache-HIT path (the steady-state 97%+ of lanes): given
the per-lane cached cell row (pic frame + C-grid geometry, 25 f32) and
face-value quads (u4/v4), run all 4 RK stages — bilinear inverse +
Delandmeter & van Sebille (2019) blend per stage — and emit (dx, dy).

Three variants on identical math and layout ((C, n) column-major planes):
- pallas  : one kernel, per-block operands read once into VMEM
- xla     : jnp, jit — XLA free to fuse everything
- xla-barrier : jnp with optimization_barrier after each stage,
  emulating the engine's per-stage materialization boundaries

Min traffic: read 32+8+8 planes + write 8 = 224 B/lane.
Env: N (default 10M), REPS (default 3).
"""
import os
import sys
import time

_d = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [_d, os.path.dirname(_d)]

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


# ---------------------------------------------------------------------------
# shared math (mirrors index_search._bilinear_inverse + stagecache._blend,
# flat mesh)
# ---------------------------------------------------------------------------


def _bilinear_inverse(p1u, p1v, p2u, p2v, p3u, p3v, xq, yq):
    a1 = p1u
    a2 = p3u
    a3 = -p1u + p2u - p3u
    b1 = p1v
    b2 = p3v
    b3 = p1v - p1v + p2v - p3v  # p0 = 0 in the projected frame
    b3 = p2v - p1v - p3v
    aa = a3 * b2 - a2 * b3
    bb = a1 * b2 - a2 * b1 + xq * b3 - yq * a3
    cc = xq * b1 - yq * a1
    det2 = bb * bb - 4 * aa * cc
    det = jnp.sqrt(jnp.maximum(det2, 0.0))
    sign_bb = jnp.where(bb >= 0, 1.0, -1.0)
    q = -0.5 * (bb + sign_bb * det)
    r1 = q / jnp.where(aa == 0.0, 1.0, aa)
    r2 = cc / jnp.where(q == 0.0, 1.0, q)
    r1 = jnp.where(aa == 0.0, r2, r1)
    r2 = jnp.where(q == 0.0, 0.0, r2)
    pick1 = jnp.abs(r1 - 0.5) <= jnp.abs(r2 - 0.5)
    eta = jnp.where(pick1, r1, r2)
    denx = a1 + a3 * eta
    deny = b1 + b3 * eta
    use_x = jnp.abs(denx) >= jnp.abs(deny)
    xsi = jnp.where(
        use_x,
        (xq - a2 * eta) / jnp.where(denx == 0.0, 1.0, denx),
        (yq - b2 * eta) / jnp.where(deny == 0.0, 1.0, deny),
    )
    return xsi, eta


def _stage(r, u4, v4, x, y, tau):
    """One RK stage from cached operands: (u, v) at (x, y, tau)."""
    dx = x - r[0]
    dy = y - r[1]
    qu = dx * r[3] + dy * r[4]
    qv = dx * r[6] + dy * r[7]
    xsi, eta = _bilinear_inverse(r[9], r[10], r[11], r[12], r[13], r[14], qu, qv)
    g = 16
    dlon10, dlon23, dlon30, dlon21 = r[g], r[g + 1], r[g + 2], r[g + 3]
    dlat10, dlat23, dlat30, dlat21 = r[g + 4], r[g + 5], r[g + 6], r[g + 7]
    c1 = jnp.sqrt(dlon10**2 + dlat10**2)
    c2 = jnp.sqrt(dlon21**2 + dlat21**2)
    c3 = jnp.sqrt(dlon23**2 + dlat23**2)
    c4 = jnp.sqrt(dlon30**2 + dlat30**2)
    u_w = u4[0] * (1.0 - tau) + u4[1] * tau
    u_e = u4[2] * (1.0 - tau) + u4[3] * tau
    v_s = v4[0] * (1.0 - tau) + v4[1] * tau
    v_n = v4[2] * (1.0 - tau) + v4[3] * tau
    Uvel = (1.0 - xsi) * c4 * u_w + xsi * c2 * u_e
    Vvel = (1.0 - eta) * c1 * v_s + eta * c3 * v_n
    dxdxsi = (1.0 - eta) * dlon10 + eta * dlon23
    dxdeta = (1.0 - xsi) * dlon30 + xsi * dlon21
    dydxsi = (1.0 - eta) * dlat10 + eta * dlat23
    dydeta = (1.0 - xsi) * dlat30 + xsi * dlat21
    jac = dxdxsi * dydeta - dxdeta * dydxsi
    jac = jnp.where(jac == 0.0, 1.0, jac)
    u = (Uvel * dxdxsi + Vvel * dxdeta) / jac
    v = (Uvel * dydxsi + Vvel * dydeta) / jac
    return u, v


def _rk4_step(row, uv, scal, barrier=False):
    """row (32, B), uv (8, B) [u4|v4], scal (8, B) [x,y,t,dt,...] -> (8, B)."""
    r = [row[i] for i in range(25)]
    u4 = [uv[i] for i in range(4)]
    v4 = [uv[4 + i] for i in range(4)]
    x, y, t, dt = scal[0], scal[1], scal[2], scal[3]
    tau0 = t * 0.0  # single-bracket synthetic case
    u1, v1 = _stage(r, u4, v4, x, y, tau0)
    if barrier:
        u1, v1 = jax.lax.optimization_barrier((u1, v1))
    u2, v2 = _stage(r, u4, v4, x + 0.5 * dt * u1, y + 0.5 * dt * v1, tau0)
    if barrier:
        u2, v2 = jax.lax.optimization_barrier((u2, v2))
    u3, v3 = _stage(r, u4, v4, x + 0.5 * dt * u2, y + 0.5 * dt * v2, tau0)
    if barrier:
        u3, v3 = jax.lax.optimization_barrier((u3, v3))
    u4_, v4_ = _stage(r, u4, v4, x + dt * u3, y + dt * v3, tau0)
    ddx = (u1 + 2 * u2 + 2 * u3 + u4_) / 6.0 * dt
    ddy = (v1 + 2 * v2 + 2 * v3 + v4_) / 6.0 * dt
    zero = jnp.zeros_like(ddx)
    return jnp.stack([ddx, ddy, zero, zero, zero, zero, zero, zero])


def _kernel(row_ref, uv_ref, scal_ref, out_ref):
    out_ref[...] = _rk4_step(row_ref[...], uv_ref[...], scal_ref[...])


def run_pallas(row, uv, scal, B=2048):
    n = row.shape[1]

    @jax.jit
    def f(row, uv, scal):
        return pl.pallas_call(
            _kernel,
            grid=(n // B,),
            in_specs=[
                pl.BlockSpec((32, B), lambda i: (0, i)),
                pl.BlockSpec((8, B), lambda i: (0, i)),
                pl.BlockSpec((8, B), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((8, B), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        )(row, uv, scal)

    return f


def run_xla(barrier):
    @jax.jit
    def f(row, uv, scal):
        return _rk4_step(row, uv, scal, barrier=barrier)

    return f


def timeit(f, args, reps):
    out = f(*args)
    np.asarray(out[0, :1])

    def run(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = f(*args)
        np.asarray(o[0, :1])
        return time.perf_counter() - t0

    run(1)
    ts = [run(5) - run(1) for _ in range(reps)]
    return min(ts) / 4


def main():
    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    n = int(os.environ.get("N", 10_000_000))
    n = (n // 2048) * 2048
    reps = int(os.environ.get("REPS", 3))
    rng = np.random.default_rng(0)

    # synthetic unit cells: origin (cx, cy), identity tangent frame,
    # projected corners of the unit square, unit geometry
    row = np.zeros((32, n), np.float32)
    row[0] = rng.uniform(0, 1000, n)
    row[1] = rng.uniform(0, 1000, n)
    row[3] = 1.0
    row[7] = 1.0
    row[9], row[10] = 1.0, 0.0  # p1
    row[11], row[12] = 1.0, 1.0  # p2
    row[13], row[14] = 0.0, 1.0  # p3
    row[16] = 1.0  # dlon10
    row[19 + 2] = 1.0  # dlat30 (col 22)
    row[17 + 3] = 1.0  # dlat21? keep square: dlon23
    row[17] = 1.0  # dlon23
    row[23] = 1.0  # dlat21
    uv = rng.uniform(-0.3, 0.3, (8, n)).astype(np.float32)
    scal = np.zeros((8, n), np.float32)
    scal[0] = row[0] + rng.uniform(0.3, 0.7, n)
    scal[1] = row[1] + rng.uniform(0.3, 0.7, n)
    scal[3] = 0.3  # dt small: stays in cell

    row, uv, scal = jnp.asarray(row), jnp.asarray(uv), jnp.asarray(scal)

    fx = run_xla(False)
    fb = run_xla(True)
    fp = run_pallas(row, uv, scal)

    # parity first
    ox = np.asarray(fx(row, uv, scal))
    op = np.asarray(fp(row, uv, scal))
    err = np.max(np.abs(ox[:2] - op[:2]))
    print(f"n={n}  max |pallas - xla| = {err:.3e}", flush=True)

    nbytes = (32 + 8 + 8 + 8) * 4 * n  # read row+uv+scal, write out
    for name, f in (("xla-fused", fx), ("xla-barrier", fb), ("pallas", fp)):
        t = timeit(f, (row, uv, scal), reps)
        print(
            f"{name:12s}: {t*1e3:7.2f} ms/step  {n/t/1e6:8.1f} M lane-steps/s  "
            f"({nbytes/t/1e9:5.0f} GB/s effective)",
            flush=True,
        )


if __name__ == "__main__":
    main()
