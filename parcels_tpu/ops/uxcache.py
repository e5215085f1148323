"""Per-face persistent stage cache for unstructured (UGRID) velocity fields.

The ux analog of ops/stagecache.py (round-5 VERDICT task 3). The gather
tier re-runs the warm barycentric check + the full-batch adjacency walk +
6 corner-column row-takes at EVERY RK stage; at FESOM2 scale that moved
~115 KB/lane-step (r5 device trace) for a ~10% per-stage face-miss rate.
This cache makes the hit path gather-free:

- The particle SoA persists, per lane: the face id, the (ti, zi) bracket
  key, and the 4 corner data values [(z_lo,t0),(z_lo,t1),(z_hi,t0),
  (z_hi,t1)] per lateral tap (3 nodes barycentric / 1 face constant) per
  velocity component.
- A stage whose lane is still inside the cached face (one VPU barycentric
  check against the cached triangle frame) with the same (ti, zi) bracket
  blends the cached corners with fresh (tau, zeta, bc) weights — ZERO
  gathers, pure VPU.
- Misses are repaired in compacted fixed-K rounds inside one while_loop
  (the structured stagecache pattern, stagecache.py:787-822): each round
  walks K lanes (uxgrid.ux_walk on the compacted sub-batch) and re-gathers
  their corner columns, so full-batch work never scales with the walk.

An earlier compacted-rounds trial on the ux GATHER path measured slower
(BASELINE.md r4) because it compacted only the walk while still paying
full-batch sample takes per stage; caching removes those takes entirely,
which is what makes the compaction pay.

Reference semantics preserved: barycentric lateral + zf/zc vertical blends
mirror reference interpolators/_uxinterpolators.py:18-181 and the search
sentinels mirror spatialhash.py:389-535 (via uxgrid.ux_walk). Parity is
pinned by tests/test_uxcache.py against the uncached tier.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from parcels_tpu._core import index_search
from parcels_tpu._core.statuscodes import StatusCode

__all__ = [
    "UXC_KEY",
    "enabled",
    "flush_one",
    "make_soa_cache",
    "make_soa_cache_device",
    "soa_cache_applicable",
    "soa_cache_owner",
    "ux_cached_eval",
]

UXC_KEY = "_uxc_key"  # (n, 4) i32: [face | -1, ti, zi, 0]
UXC_U = "_uxc_u"  # (n, 4*ntaps) f32 corner values, U component
UXC_V = "_uxc_v"  # (n, 4*ntaps) f32, V component
UXC_W = "_uxc_w"  # (n, 4*ntaps_w) f32, W component (3-D ux fieldsets)

#: fix-up round capacity divisor (K = n / _K_DIV, min 1024) — the ux miss
#: rate (~10%/stage steady state) is 100x the structured path's, so rounds
#: are bigger than stagecache's n/1024
_K_DIV = int(os.environ.get("PARCELS_TPU_UXCACHE_KDIV", 32))


def _mode() -> str:
    return os.environ.get("PARCELS_TPU_UXCACHE", "auto")


def _comp_meta(comp):
    """(supported, node, zf) for one scalar field's ux interpolator."""
    from parcels_tpu.interpolators.uxinterp import (
        UxConstantFaceConstantZC,
        UxConstantFaceLinearZF,
        UxLinearNodeConstantZC,
        UxLinearNodeLinearZF,
    )

    m = comp.interp_method
    if isinstance(m, UxLinearNodeLinearZF):
        return True, True, True
    if isinstance(m, UxLinearNodeConstantZC):
        return True, True, False
    if isinstance(m, UxConstantFaceLinearZF):
        return True, False, True
    if isinstance(m, UxConstantFaceConstantZC):
        return True, False, False
    return False, False, False


def _vf_meta(vf):
    """Static cache meta for a ux vector field/view, or None if unsupported.

    Returns dict(node_u, zf_u, node_w, zf_w, has_w): U and V must share one
    placement (from_ugrid_conventions always does); W may differ.
    """
    from parcels_tpu.interpolators.uxinterp import Ux_Velocity
    from parcels_tpu.ops import uxcol

    if not isinstance(vf.interp_method, Ux_Velocity):
        return None
    ok_u, node_u, zf_u = _comp_meta(vf.U)
    ok_v, node_v, zf_v = _comp_meta(vf.V)
    if not (ok_u and ok_v) or (node_u, zf_u) != (node_v, zf_v):
        return None
    if not uxcol.col_usable(vf.U.data.shape):
        return None
    meta = {"node_u": node_u, "zf_u": zf_u, "has_w": vf.W is not None,
            "node_w": False, "zf_w": False}
    if vf.W is not None:
        ok_w, node_w, zf_w = _comp_meta(vf.W)
        if not ok_w or not uxcol.col_usable(vf.W.data.shape):
            return None
        meta["node_w"] = node_w
        meta["zf_w"] = zf_w
    return meta


def soa_cache_owner(fieldset):
    """(registered name | None, meta) of the ux vector field owning the
    persistent SoA columns. One owner only — the columns hold one field's
    corner values (same rule as stagecache.soa_cache_owner)."""
    from parcels_tpu._core.field import VectorField

    if _mode() in ("0", "off"):
        return None, None
    if os.environ.get("PARCELS_TPU_STAGECACHE_PERSIST", "1") in ("0", "off"):
        return None, None
    if _mode() != "force" and jax.default_backend() in ("cpu",):
        return None, None
    for name, f in fieldset.fields.items():
        if not isinstance(f, VectorField):
            continue
        if getattr(f.grid.spec, "n_face", 0) <= 0:
            continue
        meta = _vf_meta(f)
        if meta is not None:
            return name, meta
    return None, None


def soa_cache_applicable(fieldset):
    name, meta = soa_cache_owner(fieldset)
    return name is not None, meta


def _widths(meta):
    wu = 4 * (3 if meta["node_u"] else 1)
    ww = 4 * (3 if meta["node_w"] else 1) if meta["has_w"] else 0
    return wu, ww


def make_soa_cache(n: int, meta) -> dict:
    import numpy as np

    wu, ww = _widths(meta)
    out = {
        UXC_KEY: np.full((n, 4), -1, dtype=np.int32),
        UXC_U: np.zeros((n, wu), dtype=np.float32),
        UXC_V: np.zeros((n, wu), dtype=np.float32),
    }
    if ww:
        out[UXC_W] = np.zeros((n, ww), dtype=np.float32)
    return out


def make_soa_cache_device(n: int, meta) -> dict:
    wu, ww = _widths(meta)
    out = {
        UXC_KEY: jnp.full((n, 4), -1, dtype=jnp.int32),
        UXC_U: jnp.zeros((n, wu), dtype=jnp.float32),
        UXC_V: jnp.zeros((n, wu), dtype=jnp.float32),
    }
    if ww:
        out[UXC_W] = jnp.zeros((n, ww), dtype=jnp.float32)
    return out


def invalidate_soa_cache(dev: dict) -> dict:
    """Mark every lane's ux cache invalid (windowed chunk rollover)."""
    if UXC_KEY in dev:
        dev = dict(dev)
        dev[UXC_KEY] = jnp.asarray(dev[UXC_KEY]).at[:, 0].set(-1)
    return dev


def enabled(vf) -> bool:
    """Trace-time gate: is the cached eval used for this vector view?"""
    mode = _mode()
    if mode in ("0", "off"):
        return False
    if getattr(vf.grid.spec, "n_face", 0) <= 0:
        return False
    if "face_table" not in vf.grid.garrs:
        return False
    if _vf_meta(vf) is None:
        return False
    if mode == "force":
        return True
    return jax.default_backend() not in ("cpu",)


# ---------------------------------------------------------------------------
# corner gathers (compacted batches only)
# ---------------------------------------------------------------------------


def _corner4(comp, taps_idx, ti, t1i, zlo, zhi):
    """(k, 4*ntaps) corner values for one component.

    ``taps_idx`` is a list of per-lane node/face ids; corners per tap are
    [(zlo,t0), (zlo,t1), (zhi,t0), (zhi,t1)], flattened tap-major.

    Two granule-sized row-takes per tap from the (N*T, pad64(Z)) table —
    the time level rides the TAKE INDEX — plus two narrow (k, Z) z one-hot
    reduces shared across taps. The earlier (N, T*Z)-table variant needed
    four (k, T*Z) one-hot mask products per tap, whose materialized
    intermediates dominated the repair traffic (r5 device trace).
    """
    from parcels_tpu.ops import uxcol

    T, Z, N = comp.data.shape
    tbl = uxcol.ux_colT_table(comp)
    j = jax.lax.broadcasted_iota(jnp.int32, (1, tbl.shape[1]), 1)
    m_lo = (j == zlo[:, None]).astype(jnp.float32)
    m_hi = (j == zhi[:, None]).astype(jnp.float32)
    cols = []
    for idx in taps_idx:
        base = jnp.clip(idx, 0, N - 1) * T
        r0 = jnp.take(tbl, base + ti, axis=0)
        r1 = jnp.take(tbl, base + t1i, axis=0)
        cols.append(jnp.sum(r0 * m_lo, axis=1))
        cols.append(jnp.sum(r1 * m_lo, axis=1))
        cols.append(jnp.sum(r0 * m_hi, axis=1))
        cols.append(jnp.sum(r1 * m_hi, axis=1))
    return jnp.stack(cols, axis=1)


def _corner4_uv(vf, taps_idx, ti, t1i, zlo, zhi):
    """(u4, v4) corner values via the fused [U | V] z-row table — one
    512 B take per (tap, time level) serves both components."""
    from parcels_tpu.ops import uxcol

    T, Z, N = vf.U.data.shape
    tbl = uxcol.ux_colT_uv_table(vf)
    P = tbl.shape[1] // 2
    j = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    m_lo = (j == zlo[:, None]).astype(jnp.float32)
    m_hi = (j == zhi[:, None]).astype(jnp.float32)
    ucols, vcols = [], []
    for idx in taps_idx:
        base = jnp.clip(idx, 0, N - 1) * T
        r0 = jnp.take(tbl, base + ti, axis=0)
        r1 = jnp.take(tbl, base + t1i, axis=0)
        u0, v0 = r0[:, :P], r0[:, P:]
        u1, v1 = r1[:, :P], r1[:, P:]
        ucols += [jnp.sum(u0 * m_lo, axis=1), jnp.sum(u1 * m_lo, axis=1),
                  jnp.sum(u0 * m_hi, axis=1), jnp.sum(u1 * m_hi, axis=1)]
        vcols += [jnp.sum(v0 * m_lo, axis=1), jnp.sum(v1 * m_lo, axis=1),
                  jnp.sum(v0 * m_hi, axis=1), jnp.sum(v1 * m_hi, axis=1)]
    return jnp.stack(ucols, axis=1), jnp.stack(vcols, axis=1)


def _z_brackets(vf, meta, zi_c):
    """Per-component (zlo, zhi) data-space z taps from the clipped interface
    bracket ``zi_c`` (zf: linear between interfaces zi, zi+1 — reference
    _uxinterpolators.py:66-83; zc: pinned layer center)."""

    def taps(comp, zf):
        Zd = comp.data.shape[1]
        if zf:
            lo = jnp.clip(zi_c, 0, max(Zd - 2, 0))
            return lo, jnp.clip(lo + 1, 0, Zd - 1)
        lo = jnp.clip(zi_c, 0, Zd - 1)
        return lo, lo

    out = {"u": taps(vf.U, meta["zf_u"]), "v": taps(vf.V, meta["zf_u"])}
    if meta["has_w"]:
        out["w"] = taps(vf.W, meta["zf_w"])
    return out


def _ux_full(vf, meta, y, x, ti, t1i, zi_c, fi_stale):
    """Walk + corner gathers for one (possibly compacted) batch of lanes."""
    from parcels_tpu._core.uxgrid import _in_cell, _query_points, ux_walk
    from parcels_tpu.ops import uxcol

    grid = vf.grid
    spec = grid.spec
    garrs = grid.garrs
    nf = spec.n_face
    pts = _query_points(garrs, y, x, spec.spherical)
    ftbl = garrs["face_table"]

    # warm-start from the stale cached face; raster-seed lanes whose stale
    # face no longer contains them (uxgrid.ux_search cold path)
    fi0 = jnp.clip(fi_stale, 0, nf - 1)
    bc0 = uxcol.bary_from_rows(uxcol.face_rows(ftbl, fi0), pts, spec.spherical)
    hit0 = _in_cell(bc0) & (fi_stale >= 0)
    (oy, ox) = spec.lookup_origin
    (sy, sx) = spec.lookup_step
    ny, nx = spec.lookup_shape
    ry = jnp.clip(jnp.floor((y - oy) / sy).astype(jnp.int32), 0, ny - 1)
    rx = jnp.clip(jnp.floor((x - ox) / sx).astype(jnp.int32), 0, nx - 1)
    seed = garrs["lookup_fi"][ry, rx]
    fi_init = jnp.where(hit0, fi0, jnp.clip(seed, 0, nf - 1))
    fi, _ = ux_walk(spec, garrs, pts, fi_init)

    esc = jnp.where(
        fi == index_search.RIGHT_OUT_OF_BOUNDS,
        jnp.int32(StatusCode.ErrorOutOfBounds),
        jnp.int32(0),
    )
    esc = jnp.maximum(
        esc,
        jnp.where(
            fi == index_search.GRID_SEARCH_ERROR,
            jnp.int32(StatusCode.ErrorGridSearching),
            jnp.int32(0),
        ),
    )
    valid = fi >= 0
    fic = jnp.clip(fi, 0, nf - 1)
    row = uxcol.face_rows(ftbl, fic)
    verts = uxcol.verts_from_rows(row, spec.spherical)
    nids = uxcol.nids_from_rows(row)

    zb = _z_brackets(vf, meta, zi_c)
    taps_u = [nids[:, 0], nids[:, 1], nids[:, 2]] if meta["node_u"] else [fic]
    u4, v4 = _corner4_uv(vf, taps_u, ti, t1i, *zb["u"])
    out = {
        "face": jnp.where(valid, fic, jnp.int32(-1)),
        "verts": verts,
        "u": u4,
        "v": v4,
        "esc": esc,
        "oob": ~valid,
    }
    if meta["has_w"]:
        taps_w = taps_u if meta["node_w"] == meta["node_u"] else (
            [nids[:, 0], nids[:, 1], nids[:, 2]] if meta["node_w"] else [fic]
        )
        out["w"] = _corner4(vf.W, taps_w, ti, t1i, *zb["w"])
    return out


def _load_soa_cache(particles, vf):
    """Stage-1 load: persistent columns + ONE row-take for the triangle frame."""
    from parcels_tpu.ops import uxcol

    pd = particles._data
    key = pd[UXC_KEY]
    spec = vf.grid.spec
    fic = jnp.clip(key[:, 0], 0, spec.n_face - 1)
    row = uxcol.face_rows(vf.grid.garrs["face_table"], fic)
    return {
        "face": key[:, 0],
        "ti": key[:, 1],
        "zi": key[:, 2],
        "verts": uxcol.verts_from_rows(row, spec.spherical),
        "u": pd[UXC_U],
        "v": pd[UXC_V],
        "w": pd.get(UXC_W),
        "esc": jnp.zeros_like(key[:, 0]),
        "oob": jnp.zeros_like(key[:, 0], dtype=bool),
    }


def flush_one(c, pd) -> None:
    """Write a ux view's final kernel-call cache back into the SoA."""
    pd[UXC_KEY] = jnp.stack(
        [c["face"], c["ti"], c["zi"], jnp.zeros_like(c["face"])], axis=1
    ).astype(jnp.int32)
    pd[UXC_U] = c["u"]
    pd[UXC_V] = c["v"]
    if c.get("w") is not None and UXC_W in pd:
        pd[UXC_W] = c["w"]


# ---------------------------------------------------------------------------
# blend
# ---------------------------------------------------------------------------


def _z_weights(vf, meta, comp_key, z, zi_c, garrs):
    """(w_lo, w_hi) vertical tap weights for one component at positions z."""
    zf = meta["zf_u"] if comp_key in ("u", "v") else meta["zf_w"]
    if not zf:
        one = jnp.ones(jnp.shape(z), jnp.float32)
        return one, jnp.zeros_like(one)
    depth = garrs["depth"]
    nzd = depth.shape[0]
    lo = jnp.clip(zi_c, 0, max(nzd - 2, 0))
    hi = jnp.clip(lo + 1, 0, nzd - 1)
    j = jnp.arange(nzd, dtype=jnp.int32)
    if nzd <= 128:  # VPU one-hot instead of per-lane gathers (index_search)
        zk = jnp.sum((j == lo[:, None]).astype(depth.dtype) * depth, axis=-1)
        zk1 = jnp.sum((j == hi[:, None]).astype(depth.dtype) * depth, axis=-1)
    else:
        zk = jnp.take(depth, lo)
        zk1 = jnp.take(depth, hi)
    denom = jnp.where(zk1 == zk, 1.0, zk1 - zk)
    return (zk1 - z) / denom, (z - zk) / denom


def _blend_comp(vals, ntaps, lat_w, tau, w_lo, w_hi, T):
    """Blend (n, 4*ntaps) cached corners with fresh weights."""
    out = None
    t1w = jnp.zeros_like(tau) if T == 1 else tau
    t0w = 1.0 - t1w
    for k in range(ntaps):
        c00 = vals[:, 4 * k + 0]
        c10 = vals[:, 4 * k + 1]
        c01 = vals[:, 4 * k + 2]
        c11 = vals[:, 4 * k + 3]
        v = w_lo * (t0w * c00 + t1w * c10) + w_hi * (t0w * c01 + t1w * c11)
        if lat_w is not None:
            v = v * lat_w[:, k]
        out = v if out is None else out + v
    return out


# ---------------------------------------------------------------------------
# the cached eval
# ---------------------------------------------------------------------------


def ux_cached_eval(vf, t, z, y, x, particles):
    """Drop-in replacement for VectorFieldView.eval on triangular meshes."""
    from parcels_tpu._core.field import _escalate
    from parcels_tpu._core.uxgrid import _in_cell, _query_points
    from parcels_tpu.ops import uxcol

    meta = _vf_meta(vf)
    grid = vf.grid
    spec = grid.spec
    garrs = grid.garrs
    t = jnp.asarray(t)
    z = jnp.asarray(z)
    y = jnp.asarray(y)
    x = jnp.asarray(x)
    n = y.shape[0]

    if vf.U.has_time:
        ti, tau, t_oob = index_search.search_time(garrs["time"], t, spec.time_uniform)
    else:
        ti = jnp.zeros(jnp.shape(t), dtype=jnp.int32)
        tau = jnp.zeros(jnp.shape(t), dtype=jnp.float32)
        t_oob = None
    T = vf.U.data.shape[0]
    t1i = jnp.clip(ti + 1, 0, T - 1)

    zi_raw, _zeta = index_search.search_1d(garrs["depth"], z, spec.depth_uniform)
    nzd = garrs["depth"].shape[0]
    zi_c = jnp.clip(zi_raw, 0, max(nzd - 2, 0))

    esc_zt = jnp.where(
        zi_raw == index_search.RIGHT_OUT_OF_BOUNDS,
        jnp.int32(StatusCode.ErrorOutOfBounds),
        jnp.int32(0),
    )
    esc_zt = jnp.maximum(
        esc_zt,
        jnp.where(
            zi_raw == index_search.LEFT_OUT_OF_BOUNDS,
            jnp.int32(StatusCode.ErrorThroughSurface),
            jnp.int32(0),
        ),
    )
    if t_oob is not None:
        esc_zt = jnp.maximum(
            esc_zt,
            jnp.where(t_oob, jnp.int32(StatusCode.ErrorOutsideTimeInterval), jnp.int32(0)),
        )
    z_oob = zi_raw < 0

    # hoist col tables into the main trace scope (cf. cgrid_cached_eval)
    uxcol.ux_colT_uv_table(vf)
    if vf.W is not None:
        uxcol.ux_colT_table(vf.W)

    c = vf._stage_cache
    if (
        c is None
        and particles is not None
        and UXC_KEY in particles._data
        and getattr(vf, "_sc_owner", False)
    ):
        c = _load_soa_cache(particles, vf)

    pts = _query_points(garrs, y, x, spec.spherical)

    if c is None:
        # first eval of this kernel invocation: full batch, warm-started
        # from the ei face cache
        ei = particles._get_ei(vf.igrid) if particles is not None else None
        fi_stale = ei if ei is not None else jnp.zeros(y.shape, dtype=jnp.int32)
        c = _ux_full(vf, meta, y, x, ti, t1i, zi_c, fi_stale)
        c["ti"] = ti
        c["zi"] = zi_c
        if particles is not None:
            c.setdefault("w", None)
            vf._stage_cache = c
        bc = uxcol.bary_from_verts(c["verts"], pts, spec.spherical)
    else:
        c.setdefault("w", None)
        bc0 = uxcol.bary_from_verts(c["verts"], pts, spec.spherical)
        finite = jnp.isfinite(y) & jnp.isfinite(x)
        hit = _in_cell(bc0) & (ti == c["ti"]) & (zi_c == c["zi"]) & (c["face"] >= 0)
        miss = ~hit & finite
        if particles is not None:
            miss = miss & particles._mask
        cnt = jnp.sum(miss.astype(jnp.int32))
        if os.environ.get("PARCELS_TPU_UXCACHE_DEBUG"):
            jax.debug.print("uxcache miss cnt={c} of n={n}", c=cnt, n=n)
        K = min(n, max(1024, n // _K_DIV))
        c["esc"] = jnp.zeros_like(c["esc"])

        # Dual-path repair. The ux miss fraction is FLOW-dependent: ~0 for
        # the stages whose displacement since the last repair is tiny
        # (RK4 stages 1 and 3), but 30-100% when a half/full step crosses
        # a triangle (fast flows / fine meshes). Compacted rounds are the
        # structured-stagecache shape and win in the sparse regime; at
        # dense miss fractions ceil(cnt/K) full-cum searchsorteds + big
        # scatters measured 11 GB/s and ~2s per 4 steps (r5 device trace),
        # so a whole-batch warm-started rebuild (each lane re-walks from
        # its cached face — hit lanes converge at hop 0) + where-merge is
        # the cheaper shape there.
        def repair_rounds(c):
            from parcels_tpu.ops.stagecache import _blocked_cumsum

            cum = _blocked_cumsum(miss.astype(jnp.int32))
            nrounds = jax.lax.div(cnt + (K - 1), jnp.int32(K))

            def round_body(carry):
                r, c = carry
                base = (r * K).astype(cum.dtype)
                idx = jnp.searchsorted(cum, base + jnp.arange(1, K + 1, dtype=cum.dtype))
                idx = jnp.minimum(idx, n - 1).astype(jnp.int32)

                def g(a):
                    return jnp.take(a, idx, axis=0)

                sub = _ux_full(vf, meta, g(y), g(x), g(ti), g(t1i), g(zi_c), g(c["face"]))
                out = dict(c)
                for k in ("face", "verts", "u", "v"):
                    out[k] = c[k].at[idx].set(sub[k])
                if c["w"] is not None:
                    out["w"] = c["w"].at[idx].set(sub["w"])
                out["esc"] = c["esc"].at[idx].set(sub["esc"])
                out["oob"] = c["oob"].at[idx].set(sub["oob"])
                out["ti"] = c["ti"].at[idx].set(g(ti))
                out["zi"] = c["zi"].at[idx].set(g(zi_c))
                return r + 1, out

            _, c = jax.lax.while_loop(
                lambda carry: carry[0] < nrounds, round_body, (jnp.int32(0), c)
            )
            return c

        def repair_full(c):
            sub = _ux_full(vf, meta, y, x, ti, t1i, zi_c, c["face"])
            out = dict(c)

            def m(new, old):
                cond = miss if new.ndim == 1 else miss[:, None]
                return jnp.where(cond, new, old)

            for k in ("face", "verts", "u", "v", "esc", "oob"):
                out[k] = m(sub[k], c[k])
            if c["w"] is not None:
                out["w"] = m(sub["w"], c["w"])
            out["ti"] = jnp.where(miss, ti, c["ti"])
            out["zi"] = jnp.where(miss, zi_c, c["zi"])
            return out

        c = jax.lax.cond(cnt <= jnp.int32(K), repair_rounds, repair_full, c)
        if particles is not None:
            vf._stage_cache = c
        bc = uxcol.bary_from_verts(c["verts"], pts, spec.spherical)

    ntaps_u = 3 if meta["node_u"] else 1
    lat_u = bc if meta["node_u"] else None
    wlo_u, whi_u = _z_weights(vf, meta, "u", z, zi_c, garrs)
    u = _blend_comp(c["u"], ntaps_u, lat_u, tau, wlo_u, whi_u, T)
    v = _blend_comp(c["v"], ntaps_u, lat_u, tau, wlo_u, whi_u, T)
    if spec.spherical:
        deg2m = spec.deg2m
        u = u / (deg2m * jnp.cos(jnp.deg2rad(y)))
        v = v / deg2m
    if meta["has_w"]:
        ntaps_w = 3 if meta["node_w"] else 1
        lat_w = bc if meta["node_w"] else None
        wlo_w, whi_w = _z_weights(vf, meta, "w", z, zi_c, garrs)
        w = _blend_comp(c["w"], ntaps_w, lat_w, tau, wlo_w, whi_w, T)
    else:
        w = jnp.zeros_like(u)

    if particles is not None:
        esc = jnp.maximum(esc_zt, c["esc"])
        particles.state = jnp.maximum(particles.state, esc)
        bad_val = jnp.isnan(u) | jnp.isnan(v) | jnp.isnan(w)
        _escalate(particles, bad_val, StatusCode.ErrorInterpolation)
        # refresh the warm-start ei cache (mirror _update_particles_ei)
        particles._set_ei(vf.igrid, jnp.clip(c["face"], 0, spec.n_face - 1))

    mask0 = c["oob"] | z_oob
    u = jnp.where(mask0, 0.0, u)
    v = jnp.where(mask0, 0.0, v)
    w = jnp.where(mask0, 0.0, w)
    if vf.vector_type == "3D":
        return (u, v, w)
    return (u, v)
