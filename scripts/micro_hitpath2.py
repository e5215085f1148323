"""Round-4 hit-path optimization candidates, measured in isolation.

From micro_hitpath.py: a 193 ms all-hit stage at 10M lanes decomposes as
~100 ms VPU math (13 transcendentals/lane) + ~50 ms cond pytree copy +
~50 ms unconditional cumsum. Candidates:

  (1) Taylor-from-cell-anchor trig: every cos/sin in the hit path is of
      (anchor + delta) with |delta| <= a few cells (<= 0.05 rad); with
      per-cell cos/sin anchors stored in the fused row, 3rd-order Taylor
      of cos(delta)/sin(delta) is f32-exact (error ~ delta^4/24 < 1e-7).
  (2) Two-level blocked cumsum vs jnp.cumsum for the miss compaction.
  (3) Fused (cells, 32) row take vs 2 separate takes (pic + geom).

Run: python scripts/micro_hitpath2.py  (env: N)
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


def main():
    from parcels_tpu._core import index_search

    print(f"device={jax.devices()[0].platform} n={N}")
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 10)
    y = jax.random.uniform(ks[0], (N,), jnp.float32, -60.0, 70.0)
    x = jax.random.uniform(ks[1], (N,), jnp.float32, -170.0, 170.0)
    row = jax.random.uniform(ks[2], (N, 16), jnp.float32)
    geom = jax.random.uniform(ks[3], (N, 9), jnp.float32)
    u4 = jax.random.uniform(ks[4], (N, 4), jnp.float32)
    v4 = jax.random.uniform(ks[5], (N, 4), jnp.float32)
    tau = jax.random.uniform(ks[6], (N,), jnp.float32)
    # anchors: per-lane (gathered-from-row in real life)
    lat0 = jnp.round(y * 12.0) / 12.0
    lon0 = jnp.round(x * 12.0) / 12.0
    cl0, sl0 = jnp.cos(jnp.deg2rad(lat0)), jnp.sin(jnp.deg2rad(lat0))
    cn0, sn0 = jnp.cos(jnp.deg2rad(lon0)), jnp.sin(jnp.deg2rad(lon0))
    jax.block_until_ready((cl0, sl0, cn0, sn0))

    deg2m = 111194.92664455874
    rad = jnp.pi / 180.0

    # ---- exact trig reference: current query_xyz + edge lens --------------
    def hit_exact(row, geom, u4, v4, y, x, tau):
        q = index_search.query_xyz(y, x, True)
        ok, xsi, eta = index_search.pic_from_rows(row, q)
        dlat10 = geom[:, 4]
        py0 = geom[:, 8]

        def edge(dlon, dlat, lat_edge):
            return jnp.sqrt((dlon * deg2m * jnp.cos(rad * lat_edge)) ** 2 + (dlat * deg2m) ** 2)

        c1 = edge(geom[:, 0], geom[:, 4], py0 + xsi * dlat10)
        c2 = edge(geom[:, 3], geom[:, 7], py0 + dlat10 + eta * geom[:, 7])
        c3 = edge(geom[:, 1], geom[:, 5], py0 + geom[:, 6] + xsi * geom[:, 5])
        c4 = edge(geom[:, 2], geom[:, 6], py0 + eta * geom[:, 6])
        conv = deg2m * jnp.cos(jnp.deg2rad(y))
        u = (c4 * (1 - xsi) * (u4[:, 0] * (1 - tau) + u4[:, 1] * tau)
             + c2 * xsi * (u4[:, 2] * (1 - tau) + u4[:, 3] * tau)) / conv
        v = (c1 * (1 - eta) * (v4[:, 0] * (1 - tau) + v4[:, 1] * tau)
             + c3 * eta * (v4[:, 2] * (1 - tau) + v4[:, 3] * tau)) / conv
        return jnp.where(ok, u, 0.0), v, xsi, eta

    t = timed(jax.jit(hit_exact), row, geom, u4, v4, y, x, tau)
    print(f"hit core, exact trig:            {t*1e3:8.1f} ms ({N/t/1e6:7.1f} M lanes/s)")

    # ---- Taylor trig: cos/sin(anchor+delta) from per-cell anchors ---------
    def cs_taylor(d):
        # 3rd-order: exact to f32 for |d| <= 0.05 rad
        d2 = d * d
        c = 1.0 - 0.5 * d2 * (1.0 - d2 * (1.0 / 12.0))
        s = d * (1.0 - d2 * (1.0 / 6.0))
        return c, s

    def hit_taylor(row, geom, u4, v4, y, x, tau, cl0, sl0, cn0, sn0, lat0, lon0):
        dlat = rad * (y - lat0)
        dlon = x - lon0
        dlon = dlon - 360.0 * jnp.round(dlon / 360.0)
        dlon = rad * dlon
        cdt, sdt = cs_taylor(dlat)
        cdn, sdn = cs_taylor(dlon)
        cl = cl0 * cdt - sl0 * sdt  # cos(lat)
        sl = sl0 * cdt + cl0 * sdt  # sin(lat)
        cn = cn0 * cdn - sn0 * sdn  # cos(lon)
        sn = sn0 * cdn + cn0 * sdn  # sin(lon)
        q = (cn * cl, sn * cl, sl)
        ok, xsi, eta = index_search.pic_from_rows(row, q)
        dlat10 = geom[:, 4]
        py0 = geom[:, 8]

        def edge(dlon_, dlat_, dlat_edge):
            # cos(rad*(py0+d)) from the lat anchor (py0 == lat0 in the real
            # table; delta <= one cell)
            cd, sd = cs_taylor(rad * dlat_edge)
            ce = cl0 * cd - sl0 * sd
            return jnp.sqrt((dlon_ * deg2m * ce) ** 2 + (dlat_ * deg2m) ** 2)

        c1 = edge(geom[:, 0], geom[:, 4], xsi * dlat10)
        c2 = edge(geom[:, 3], geom[:, 7], dlat10 + eta * geom[:, 7])
        c3 = edge(geom[:, 1], geom[:, 5], geom[:, 6] + xsi * geom[:, 5])
        c4 = edge(geom[:, 2], geom[:, 6], eta * geom[:, 6])
        conv = deg2m * cl
        u = (c4 * (1 - xsi) * (u4[:, 0] * (1 - tau) + u4[:, 1] * tau)
             + c2 * xsi * (u4[:, 2] * (1 - tau) + u4[:, 3] * tau)) / conv
        v = (c1 * (1 - eta) * (v4[:, 0] * (1 - tau) + v4[:, 1] * tau)
             + c3 * eta * (v4[:, 2] * (1 - tau) + v4[:, 3] * tau)) / conv
        return jnp.where(ok, u, 0.0), v, xsi, eta

    t = timed(jax.jit(hit_taylor), row, geom, u4, v4, y, x, tau, cl0, sl0, cn0, sn0, lat0, lon0)
    print(f"hit core, Taylor-anchor trig:    {t*1e3:8.1f} ms ({N/t/1e6:7.1f} M lanes/s)")

    # accuracy: Taylor q vs exact q
    qx, qy_, qz = index_search.query_xyz(y, x, True)
    dlat = rad * (y - lat0)
    dlon = x - lon0
    dlon = dlon - 360.0 * jnp.round(dlon / 360.0)
    dlon = rad * dlon
    cdt, sdt = cs_taylor(dlat)
    cdn, sdn = cs_taylor(dlon)
    cl = cl0 * cdt - sl0 * sdt
    sl = sl0 * cdt + cl0 * sdt
    cn = cn0 * cdn - sn0 * sdn
    sn = sn0 * cdn + cn0 * sdn
    err = jnp.max(jnp.abs(jnp.stack([cn * cl - qx, sn * cl - qy_, sl - qz])))
    print(f"Taylor query max abs error vs exact xyz: {float(err):.2e}")

    # ---- cumsum alternatives ---------------------------------------------
    miss = (jax.random.uniform(ks[7], (N,)) < 0.01)

    def cum_plain(m):
        return jnp.cumsum(m.astype(jnp.int32))

    t = timed(jax.jit(cum_plain), miss)
    print(f"jnp.cumsum (n,) i32:             {t*1e3:8.1f} ms")

    def cum_blocked(m):
        B = 4096
        nb = N // B
        m2 = m.astype(jnp.int32).reshape(nb, B)
        intra = jnp.cumsum(m2, axis=1)
        block_tot = intra[:, -1]
        offs = jnp.cumsum(block_tot) - block_tot
        return (intra + offs[:, None]).reshape(-1)

    t = timed(jax.jit(cum_blocked), miss)
    print(f"two-level blocked cumsum:        {t*1e3:8.1f} ms")
    a = jax.jit(cum_plain)(miss)
    b = jax.jit(cum_blocked)(miss)
    print(f"blocked == plain: {bool(jnp.all(a == b))}")

    # K-th index extraction on top (the real consumer)
    K = N // 64

    def compact_plain(m):
        cum = jnp.cumsum(m.astype(jnp.int32))
        idx = jnp.searchsorted(cum, jnp.arange(1, K + 1, dtype=cum.dtype))
        return jnp.minimum(idx, N - 1).astype(jnp.int32)

    def compact_blocked(m):
        cum = cum_blocked(m)
        idx = jnp.searchsorted(cum, jnp.arange(1, K + 1, dtype=cum.dtype))
        return jnp.minimum(idx, N - 1).astype(jnp.int32)

    t = timed(jax.jit(compact_plain), miss)
    print(f"compaction, plain cumsum:        {t*1e3:8.1f} ms")
    t = timed(jax.jit(compact_blocked), miss)
    print(f"compaction, blocked cumsum:      {t*1e3:8.1f} ms")
    same = bool(jnp.all(jax.jit(compact_plain)(miss) == jax.jit(compact_blocked)(miss)))
    print(f"compaction equal: {same}")

    # ---- fused row take vs 2 takes ---------------------------------------
    cells = 1499 * 1999
    cell = jax.random.randint(ks[8], (N,), 0, cells, jnp.int32)
    pic_tbl = jax.random.uniform(ks[9], (cells, 16), jnp.float32)
    geom_tbl = jax.random.uniform(ks[9], (cells, 9), jnp.float32)
    fused_tbl = jnp.concatenate([pic_tbl, geom_tbl, jnp.zeros((cells, 7), jnp.float32)], axis=1)
    jax.block_until_ready(fused_tbl)

    def two_takes(pic_tbl, geom_tbl, cell):
        return jnp.take(pic_tbl, cell, axis=0), jnp.take(geom_tbl, cell, axis=0)

    t = timed(jax.jit(two_takes), pic_tbl, geom_tbl, cell)
    print(f"2 takes (16 + 9 cols):           {t*1e3:8.1f} ms ({N/t/1e6:7.1f} M lanes/s)")

    def one_take(fused_tbl, cell):
        r = jnp.take(fused_tbl, cell, axis=0)
        return r[:, :16], r[:, 16:25]

    t = timed(jax.jit(one_take), fused_tbl, cell)
    print(f"1 fused take (32 cols):          {t*1e3:8.1f} ms ({N/t/1e6:7.1f} M lanes/s)")


if __name__ == "__main__":
    main()
