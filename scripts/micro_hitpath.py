"""Stage-cache HIT-path ablation at 10M lanes (round-4 perf attack).

The round-3 profile put the all-hit RK stages 2-4 at ~193 ms each at 10M
lanes — on paper pure VPU work (~100 flops/lane, sub-ms at VPU rates), so
something structural dominates. Suspects, each measured here in isolation:

  (a) tile padding: (n, C) f32 arrays with C < 128 pad the minor dim to
      128 lanes on TPU -> the (n,16) pic row / (n,9) geom / (n,4) quads
      could cost 8-32x their logical bytes every time they are
      materialized (cond boundaries, cache pytree outputs)
  (b) the lax.cond fix-up tiers: every cond output materializes the
      whole cache pytree even on the all-hit path
  (c) the unconditional cumsum over 10M lanes
  (d) the hit-check + blend VPU math itself

Run on the real TPU: python scripts/micro_hitpath.py  (env: N)
"""

import os
import sys
import time

_d = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [_d, os.path.dirname(_d)]  # scripts dir + repo root

import numpy as np

import jax
import jax.numpy as jnp

N = int(os.environ.get("N", 10_000_000))


def timed(fn, *args, n=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = min(best, time.perf_counter() - t0)
    return best


def mem_probe():
    dev = jax.devices()[0]

    def used():
        s = dev.memory_stats()
        return (s or {}).get("bytes_in_use", 0)

    if dev.memory_stats() is None:
        print("-- memory_stats unavailable on this backend (tunnel); skipping probe --")
        return
    print("-- physical memory per logical layout (tile-padding probe) --")
    for shape in [(N,), (N, 4), (N, 9), (N, 16), (N, 128), (16, N)]:
        before = used()
        a = jnp.zeros(shape, jnp.float32) + 1.0  # +1: defeat lazy zeros
        a.block_until_ready()
        got = used() - before
        logical = int(np.prod(shape)) * 4
        print(f"  f32 {str(shape):>12}: logical {logical/2**20:8.1f} MB, "
              f"physical {got/2**20:8.1f} MB  ({got/max(logical,1):4.1f}x)")
        del a


def main():
    from parcels_tpu._core import index_search

    dev = jax.devices()[0]
    print(f"device={dev.platform} n={N}")
    mem_probe()

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    y = jax.random.uniform(ks[0], (N,), jnp.float32, -60.0, 70.0)
    x = jax.random.uniform(ks[1], (N,), jnp.float32, -170.0, 170.0)
    row = jax.random.uniform(ks[2], (N, 16), jnp.float32)
    geom = jax.random.uniform(ks[3], (N, 9), jnp.float32)
    u4 = jax.random.uniform(ks[4], (N, 4), jnp.float32)
    v4 = jax.random.uniform(ks[5], (N, 4), jnp.float32)
    tau = jax.random.uniform(ks[6], (N,), jnp.float32)
    cells = 1499 * 1999
    cell = jax.random.randint(ks[7], (N,), 0, cells, jnp.int32)
    tbl = jax.random.uniform(key, (cells, 16), jnp.float32)

    deg2m = 111194.92664455874

    def blend_rowmajor(geom, xsi, eta, tau, u4, v4, y):
        dlon10, dlon23, dlon30, dlon21 = geom[:, 0], geom[:, 1], geom[:, 2], geom[:, 3]
        dlat10, dlat23, dlat30, dlat21 = geom[:, 4], geom[:, 5], geom[:, 6], geom[:, 7]
        py0 = geom[:, 8]
        rad = jnp.pi / 180.0

        def edge_len(dlon, dlat, lat_edge):
            return jnp.sqrt((dlon * deg2m * jnp.cos(rad * lat_edge)) ** 2 + (dlat * deg2m) ** 2)

        c1 = edge_len(dlon10, dlat10, py0 + xsi * dlat10)
        c2 = edge_len(dlon21, dlat21, py0 + dlat10 + eta * dlat21)
        c3 = edge_len(dlon23, dlat23, py0 + dlat30 + xsi * dlat23)
        c4 = edge_len(dlon30, dlat30, py0 + eta * dlat30)
        u_w = u4[:, 0] * (1.0 - tau) + u4[:, 1] * tau
        u_e = u4[:, 2] * (1.0 - tau) + u4[:, 3] * tau
        v_s = v4[:, 0] * (1.0 - tau) + v4[:, 1] * tau
        v_n = v4[:, 2] * (1.0 - tau) + v4[:, 3] * tau
        Uvel = (1.0 - xsi) * c4 * u_w + xsi * c2 * u_e
        Vvel = (1.0 - eta) * c1 * v_s + eta * c3 * v_n
        dxdxsi = (1.0 - eta) * dlon10 + eta * dlon23
        dxdeta = (1.0 - xsi) * dlon30 + xsi * dlon21
        dydxsi = (1.0 - eta) * dlat10 + eta * dlat23
        dydeta = (1.0 - xsi) * dlat30 + xsi * dlat21
        jac = (dxdxsi * dydeta - dxdeta * dydxsi) * deg2m
        u = (Uvel * dxdxsi + Vvel * dxdeta) / jac
        v = (Uvel * dydxsi + Vvel * dydeta) / jac
        conversion = deg2m * jnp.cos(jnp.deg2rad(y))
        return u / conversion, v / conversion

    # --- (d) the hit-path VPU math, row-major inputs --------------------
    def hit_rowmajor(row, geom, u4, v4, y, x, tau):
        q = index_search.query_xyz(y, x, True)
        ok, xsi, eta = index_search.pic_from_rows(row, q)
        u, v = blend_rowmajor(geom, xsi, eta, tau, u4, v4, y)
        return jnp.where(ok, u, 0.0), v

    t = timed(jax.jit(hit_rowmajor), row, geom, u4, v4, y, x, tau)
    print(f"hit path (row-major (n,C) inputs):   {t*1e3:8.1f} ms ({N/t/1e6:7.1f} M lanes/s)")

    # --- same math, 1-D column inputs (no padded arrays anywhere) -------
    rowc = tuple(row[:, i] for i in range(16))
    geomc = tuple(geom[:, i] for i in range(9))
    u4c = tuple(u4[:, i] for i in range(4))
    v4c = tuple(v4[:, i] for i in range(4))
    for a in (rowc, geomc, u4c, v4c):
        jax.block_until_ready(a)

    def pic_from_cols(rc, q):
        qX, qY, qZ = q
        dx = qX - rc[0]
        dy = qY - rc[1]
        dz = qZ - rc[2]
        qu = dx * rc[3] + dy * rc[4] + dz * rc[5]
        qv = dx * rc[6] + dy * rc[7] + dz * rc[8]
        pu = jnp.stack([jnp.zeros_like(qu), rc[9], rc[11], rc[13]])
        pv = jnp.stack([jnp.zeros_like(qv), rc[10], rc[12], rc[14]])
        xsi, eta = index_search._bilinear_inverse(pu, pv, qu, qv)
        return index_search._tol_check(xsi, eta), xsi, eta

    def blend_cols(gc, xsi, eta, tau, uc, vc, y):
        dlon10, dlon23, dlon30, dlon21, dlat10, dlat23, dlat30, dlat21, py0 = gc
        rad = jnp.pi / 180.0

        def edge_len(dlon, dlat, lat_edge):
            return jnp.sqrt((dlon * deg2m * jnp.cos(rad * lat_edge)) ** 2 + (dlat * deg2m) ** 2)

        c1 = edge_len(dlon10, dlat10, py0 + xsi * dlat10)
        c2 = edge_len(dlon21, dlat21, py0 + dlat10 + eta * dlat21)
        c3 = edge_len(dlon23, dlat23, py0 + dlat30 + xsi * dlat23)
        c4 = edge_len(dlon30, dlat30, py0 + eta * dlat30)
        u_w = uc[0] * (1.0 - tau) + uc[1] * tau
        u_e = uc[2] * (1.0 - tau) + uc[3] * tau
        v_s = vc[0] * (1.0 - tau) + vc[1] * tau
        v_n = vc[2] * (1.0 - tau) + vc[3] * tau
        Uvel = (1.0 - xsi) * c4 * u_w + xsi * c2 * u_e
        Vvel = (1.0 - eta) * c1 * v_s + eta * c3 * v_n
        dxdxsi = (1.0 - eta) * dlon10 + eta * dlon23
        dxdeta = (1.0 - xsi) * dlon30 + xsi * dlon21
        dydxsi = (1.0 - eta) * dlat10 + eta * dlat23
        dydeta = (1.0 - xsi) * dlat30 + xsi * dlat21
        jac = (dxdxsi * dydeta - dxdeta * dydxsi) * deg2m
        u = (Uvel * dxdxsi + Vvel * dxdeta) / jac
        v = (Uvel * dydxsi + Vvel * dydeta) / jac
        conversion = deg2m * jnp.cos(jnp.deg2rad(y))
        return u / conversion, v / conversion

    def hit_cols(rc, gc, uc, vc, y, x, tau):
        q = index_search.query_xyz(y, x, True)
        ok, xsi, eta = pic_from_cols(rc, q)
        u, v = blend_cols(gc, xsi, eta, tau, uc, vc, y)
        return jnp.where(ok, u, 0.0), v

    t = timed(jax.jit(hit_cols), rowc, geomc, u4c, v4c, y, x, tau)
    print(f"hit path (1-D column inputs):        {t*1e3:8.1f} ms ({N/t/1e6:7.1f} M lanes/s)")

    # --- (b) cond passthrough of the cache pytree, all-hit --------------
    cache = {"row": row, "geom": geom, "u4": u4, "v4": v4,
             "cell": cell, "esc": jnp.zeros((N,), jnp.int32)}

    def cond_passthrough(c, cnt):
        def keep(c):
            out = dict(c)
            out["esc"] = jnp.zeros_like(c["esc"])
            return out

        def fix(c):
            out = dict(c)
            out["u4"] = c["u4"] + 1.0
            return out

        c = jax.lax.cond(cnt == 0, keep, fix, c)
        return c["u4"][:, 0] + c["row"][:, 0]

    t = timed(jax.jit(cond_passthrough), cache, jnp.int32(0))
    print(f"cond passthrough (cache pytree):     {t*1e3:8.1f} ms")

    def nested_cond(c, cnt):
        def keep(c):
            out = dict(c)
            out["esc"] = jnp.zeros_like(c["esc"])
            return out

        def fix(c):
            out = dict(c)
            out["u4"] = c["u4"] + 1.0
            return out

        def tier2(c):
            return jax.lax.cond(cnt <= 10, fix, keep, c)

        c = jax.lax.cond(cnt == 0, keep, lambda c: jax.lax.cond(cnt <= 5, fix, tier2, c), c)
        return c["u4"][:, 0] + c["row"][:, 0]

    t = timed(jax.jit(nested_cond), cache, jnp.int32(0))
    print(f"3-tier nested cond (cache pytree):   {t*1e3:8.1f} ms")

    # --- (c) the unconditional miss bookkeeping -------------------------
    def miss_book(row, y, x, cell):
        q = index_search.query_xyz(y, x, True)
        ok, xsi, eta = index_search.pic_from_rows(row, q)
        miss = ~ok & (cell >= 0)
        cum = jnp.cumsum(miss.astype(jnp.int32))
        return cum[-1], xsi

    t = timed(jax.jit(miss_book), row, y, x, cell)
    print(f"hit-check + cumsum bookkeeping:      {t*1e3:8.1f} ms")

    def cumsum_only(m):
        return jnp.cumsum(m)

    t = timed(jax.jit(cumsum_only), (cell % 7 == 0).astype(jnp.int32))
    print(f"cumsum alone (n i32):                {t*1e3:8.1f} ms")

    # --- (a) row-take with materialized (padded?) output vs fused -------
    def take_mat(tbl, cell):
        return jnp.take(tbl, cell, axis=0)

    t = timed(jax.jit(take_mat), tbl, cell)
    print(f"row-take (cells,16) -> (n,16) mat:   {t*1e3:8.1f} ms ({N/t/1e6:7.1f} M rows/s)")

    def take_fused(tbl, cell, y, x):
        row = jnp.take(tbl, cell, axis=0)
        q = index_search.query_xyz(y, x, True)
        ok, xsi, eta = index_search.pic_from_rows(row, q)
        return xsi, eta

    t = timed(jax.jit(take_fused), tbl, cell, y, x)
    print(f"row-take fused into pic (no mat):    {t*1e3:8.1f} ms ({N/t/1e6:7.1f} M rows/s)")

    # scatter fix-up into a padded row-major cache vs 1-D columns
    K = N // 64
    idx = jnp.arange(K, dtype=jnp.int32) * 13 % N
    sub = jax.random.uniform(key, (K, 16), jnp.float32)

    def scatter_rows(row, idx, sub):
        return row.at[idx].set(sub)

    t = timed(jax.jit(scatter_rows), row, idx, sub)
    print(f"scatter K=n/64 rows into (n,16):     {t*1e3:8.1f} ms")

    subc = tuple(sub[:, i] for i in range(16))

    def scatter_cols(rc, idx, subc):
        return tuple(r.at[idx].set(s) for r, s in zip(rc, subc))

    t = timed(jax.jit(scatter_cols), rowc, idx, subc)
    print(f"scatter K=n/64 into 16x (n,) cols:   {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
