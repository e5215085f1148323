"""C-grid RK-stage cell cache: reuse search + face reads across stages.

The config-5 profile (scripts/profile_config5.py, v5e, 10M lanes at
(2,50,1500,2000)) puts ~38% of an RK4 step in the 4 warm-started
curvilinear searches and ~46% in the 4 C-grid interpolation passes — and
both are bound by the same primitive, the ~115M rows/s row-gather issue
rate (pic row, geometry row, and 2 corner-column rows per velocity
component, ~6 takes per stage).

But RK stages revisit the same cell: with dt under the advective CFL the
2nd-4th stage positions (and usually the next step's 1st) lie in the
1st stage's cell, at the same time bracket and depth level. Everything
those stages gather is therefore already known:

- the cell's tangent-frame pic row        -> in-cell check + (xsi, eta)
  (index_search.pic_from_rows — pure VPU against the cached row)
- the cell's C-grid geometry row          -> edge lengths + Jacobian
- the 4 U/V face values x 2 time levels   -> re-blend with fresh
  (xsi, eta, tau) weights
- the W column's 2 z-levels x 2 times     -> re-blend with fresh zeta

so a cache-hit stage eval is gather-free VPU arithmetic. The cache lives
on the VectorFieldView for the duration of ONE kernel invocation (the
engine resets it before every kernel call, engine.py) — it never persists
across engine steps, so migration/sorting/checkpointing cannot observe it.

Stage-2+ misses (lanes that crossed a cell edge or a time/depth bracket
mid-step) are repaired with the same tiered compacted-gather pattern as
the binned sampler's overflow fix-up: capacity-K sub-batches run the full
search+gather path and scatter results + fresh cache entries; if misses
exceed the big tier the whole batch recomputes.

Reference semantics preserved exactly: the full path is the same
curvilinear search (sentinels included) + Delandmeter & van Sebille (2019)
face-flux interpolation as interpolators/xinterp.CGrid_Velocity; the hit
path evaluates the identical formula from cached operands. Out-of-bounds
samples return 0 and escalate states as field.py does.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from parcels_tpu._core import index_search
from parcels_tpu._core.statuscodes import StatusCode

__all__ = ["cgrid_cached_eval", "enabled", "reset"]

#: miss fix-up round capacity, as n/DIV (floor 1024 lanes); ceil(misses/K)
#: rounds run per stage (1-2 in the steady state). Swept on-device at the
#: config-5 shape (scripts/sweep_kdiv.py): per-round cost scales with K, so
#: small rounds win decisively — n/16: 5.0, n/64: 16.2, n/256: 28.7,
#: n/512: 32.6, n/1024: 34.5, n/2048: 31.2 M steps/s.
_K_DIV = int(os.environ.get("PARCELS_TPU_STAGECACHE_K_DIV", 1024))


def _mode() -> str:
    return os.environ.get("PARCELS_TPU_STAGECACHE", "auto")


def enabled(vf) -> bool:
    """Static gate: C-grid velocity on a curvilinear grid with tables."""
    from parcels_tpu.interpolators.xinterp import CGrid_Velocity

    mode = _mode()
    if mode in ("0", "off"):
        return False
    if not isinstance(vf.interp_method, CGrid_Velocity):
        return False
    spec = vf.grid.spec
    garrs = vf.grid.garrs
    if not (spec.curvilinear and "pic_table" in garrs and "cgrid_geom" in garrs):
        return False
    if mode == "force":
        return True
    return jax.default_backend() not in ("cpu",)


def reset(fsview) -> None:
    """Drop stage caches on every vector-field view (engine: before each
    kernel invocation — the cache must never cross a kernel-call boundary,
    both semantically and because its tracers belong to one trace scope)."""
    for v in fsview._views.values():
        if hasattr(v, "_stage_cache"):
            v._stage_cache = None


#: fused-row layout: cols 0-15 pic row (index_search.PIC_TABLE_COLS),
#: cols 16-24 the C-grid geometry row (grid.cgrid_geometry)
GEOM_OFF = 16
#: fused rows live in ROW slots of this width. Width matters enormously:
#: XLA lays (cells, C<=32) f32 tables out COL-major (avoiding tile
#: padding), which turns a "row" gather into C scattered 4-byte reads,
#: each costing a full 512 B HBM granule — measured 44 M rows/s. At width
#: >= 64 the layout stays row-major and a row-take reads 1-2 contiguous
#: granules: measured 211 M rows/s (micro_rowio2.py), a 5x on the
#: dominant per-stage gather.
CELL_TABLE_WIDTH = 64


def cell_table(vf):
    """Fused, width-padded per-cell row table: [pic (16) | geometry (9) | 0-pad].

    One (cells, 64) take per lane-batch replaces the pic + geometry table
    pair, at the row-major gather rate (see CELL_TABLE_WIDTH). Built on
    device once per chunk trace (concat of the shipped tables) and pinned
    with an optimization barrier so XLA neither refuses to hoist it out of
    the step loop nor re-derives layouts per block-step. Memory: 256 B per
    cell (~0.77 GB at the config-5 grid).
    """
    tbl = getattr(vf, "_cell_table", None)
    if tbl is None:
        garrs = vf.grid.garrs
        pic = garrs["pic_table"].reshape(-1, index_search.PIC_TABLE_COLS)
        cells = pic.shape[0]
        pad = CELL_TABLE_WIDTH - pic.shape[1] - garrs["cgrid_geom"].shape[1]
        tbl = jnp.concatenate(
            [pic, garrs["cgrid_geom"], jnp.zeros((cells, pad), pic.dtype)], axis=1
        )
        tbl = jax.lax.optimization_barrier(tbl)
        vf._cell_table = tbl
    return tbl


def attach_derived_tables(fieldset, farrays) -> None:
    """Materialize the derived gather tables ONCE per farrays pytree.

    The fused cell table and the corner-column tables are pure functions of
    the shipped field/grid arrays; built lazily inside the chunk executor
    they are re-derived at EVERY chunk call — the config-5 col-table
    transposes alone cost ~453 ms/chunk (device trace r4). Building them
    here (eager, outside any trace) and shipping them under
    ``farrays["coltables"][name]`` / ``farrays["celltables"][igrid]`` pays
    the transpose once per farrays (per time window when streaming);
    ``FieldSet.build_views`` pre-seeds the view caches from these entries.
    CPU backends skip (the tables are a TPU row-gather optimization).
    """
    import jax

    if jax.default_backend() in ("cpu",):
        return
    from parcels_tpu._core.field import Field, VectorField
    from parcels_tpu.interpolators.xinterp import CGrid_Velocity
    from parcels_tpu.ops import uxcol
    from parcels_tpu.ops.colgather import _mode as _colgather_mode
    from parcels_tpu.ops.colgather import colgather_table, colgather_usable

    # Eager builds need NO optimization_barrier (that pin only matters
    # inside a trace — these are concrete device arrays that enter the
    # executor as jit INPUTS, which cannot be fused away). Each build is
    # synced before the next so only one transpose's transient is live —
    # overlapping 1.12 GiB transients tipped the full config-5 shape into
    # ResourceExhausted.
    #
    # The ROW-MAJOR device_put below is the whole point: an eager
    # jnp.moveaxis result keeps the SOURCE's physical layout (the
    # "transpose" is lazy — compiled HLO showed the tables entering as
    # column-major parameters and the chunk program re-copying each to
    # row-major EVERY call: 2 x 227 ms + 59 ms at config-5). Forcing
    # major_to_minor=(0, 1) materializes the physical transpose once here
    # and the executor adopts the parameter layout copy-free.
    def _row_major(tbl):
        try:
            from jax.experimental.layout import Format, Layout
            from jax.sharding import SingleDeviceSharding

            fmt = Format(
                Layout(major_to_minor=tuple(range(tbl.ndim))),
                SingleDeviceSharding(next(iter(tbl.devices()))),
            )
            return jax.block_until_ready(jax.device_put(tbl, fmt))
        except Exception:  # noqa: BLE001 - layout API drift: fall back
            return jax.block_until_ready(tbl)

    colt = farrays.setdefault("coltables", {})
    cellt = farrays.setdefault("celltables", {})
    for name, f in fieldset.fields.items():
        if not isinstance(f, Field) or name in colt:
            continue
        data = farrays["fields"].get(name)
        if data is None:
            continue
        if (
            data.ndim == 4
            and colgather_usable(data.shape)
            # honor the documented escape hatches: with BOTH colgather and
            # the stagecache (its only consumers) off, shipping a second
            # full-field table would double field memory exactly in the
            # OOM-margin configs the hatches exist for (ADVICE r4)
            and (_colgather_mode() not in ("0", "off") or _mode() not in ("0", "off"))
        ):
            T, Z, Y, X = data.shape
            tbl = jnp.moveaxis(data.reshape(T * Z, Y * X), 0, -1)
            colt[name] = _row_major(tbl)
        elif data.ndim == 3 and uxcol.col_usable(data.shape) and uxcol.enabled(
            getattr(f.grid.spec, "n_face", 0)
        ):
            T, Z, N = data.shape
            tbl = jnp.moveaxis(data.reshape(T * Z, N), 0, -1)
            if T * Z < uxcol.ROW_WIDTH:
                tbl = jnp.pad(tbl, ((0, 0), (0, uxcol.ROW_WIDTH - T * Z)))
            colt[name] = _row_major(tbl)
    if _mode() not in ("0", "off"):
        for f in fieldset.fields.values():
            if not (
                isinstance(f, VectorField)
                and isinstance(f.interp_method, CGrid_Velocity)
                and getattr(f.grid.spec, "curvilinear", False)
            ):
                continue
            ig = f.igrid
            garrs = farrays["grids"][ig]
            if ig in cellt or "pic_table" not in garrs or "cgrid_geom" not in garrs:
                continue
            pic = garrs["pic_table"].reshape(-1, index_search.PIC_TABLE_COLS)
            cells = pic.shape[0]
            pad = CELL_TABLE_WIDTH - pic.shape[1] - garrs["cgrid_geom"].shape[1]
            tbl = jnp.concatenate(
                [pic, garrs["cgrid_geom"], jnp.zeros((cells, pad), pic.dtype)], axis=1
            )
            cellt[ig] = _row_major(tbl)


def prebuild_tables(fsview) -> None:
    """Materialize fused cell tables + corner-column tables OUTSIDE the
    engine's step while-loop (engine calls this right after build_views).

    Left to lazy first-eval construction these land inside the loop body,
    where XLA was observed re-deriving table layouts per block per step
    (~100 ms/step of dynamic-update-slice churn at the config-5 shape)."""
    from parcels_tpu.ops import uxcol
    from parcels_tpu.ops.colgather import colgather_usable

    for v in fsview._views.values():
        comps = (v.U, v.V, v.W) if hasattr(v, "U") else (v,)
        for comp in comps:
            if comp is None:
                continue
            if (
                comp.data.ndim == 3
                and "face_table" in comp.grid.garrs
                and uxcol.col_usable(comp.data.shape)
            ):
                from parcels_tpu.ops import uxcache

                if hasattr(v, "U") and uxcache.enabled(v):
                    # cached tier's corner tables
                    uxcol.ux_colT_uv_table(v)
                    if v.W is not None:
                        uxcol.ux_colT_table(v.W)
                else:
                    uxcol.ux_col_table(comp)
        if not hasattr(v, "_stage_cache") or not enabled(v):
            continue
        cell_table(v)
        if jax.default_backend() not in ("cpu",):
            for comp in (v.U, v.V, v.W):
                if comp is not None and colgather_usable(comp.data.shape):
                    comp.col_table()


def _blocked_cumsum(m_i32):
    """Two-level cumsum: jnp.cumsum lowers to an expensive reduce-window on
    long 1-D arrays; a (blocks, B) reshape with a tiny inter-block pass is
    several times cheaper at 10M lanes."""
    n = m_i32.shape[0]
    B = 1024
    if n < 4 * B:
        return jnp.cumsum(m_i32)
    nb = -(-n // B)
    pad = nb * B - n
    m2 = jnp.pad(m_i32, (0, pad)).reshape(nb, B)
    intra = jnp.cumsum(m2, axis=1)
    tot = intra[:, -1]
    offs = jnp.cumsum(tot) - tot
    return (intra + offs[:, None]).reshape(-1)[:n]


# ---------------------------------------------------------------------------
# cross-step persistence: the cache lives on in the particle SoA
# ---------------------------------------------------------------------------
#
# The kernel-invocation cache makes RK stages 2-4 gather-free, but stage 1
# of every step still runs the full search+gather pass — even though in
# steady state the particle is still in LAST step's cell. Persisting the
# cache columns in the SoA (all 4-byte lanes: sortable, migratable,
# checkpointable) lets stage 1 start from the previous step's entries, so
# full passes happen only for the few lanes that crossed a cell per step.
# The ParticleSet injects these variables before a run when the fieldset
# qualifies; the engine flushes the final kernel-call cache back after each
# kernel. Windowed chunks invalidate the key between chunks (the cached
# face values refer to the previous window's data); curvilinear band
# migration invalidates sent lanes (their cell index is band-local).

SC_KEY = "_sc_key"  # (n, 4) i32: [cell | -1, ti, zi, wzi]
# Only the key and the face-value quads persist (64 B/lane at 10M lanes =
# 0.64 GB): the pic/geometry rows are re-gathered from their tables by the
# cached cell at stage 1 (2 row-takes/step vs the full search+gather pass;
# persisting them too cost 1.6 GB and tipped the full config-5 shape into
# HBM exhaustion).
SC_ARRAYS = {"_sc_u4": 4, "_sc_v4": 4}
SC_W = "_sc_w4"  # (n, 4) f32, only for 3-D (UVW) fieldsets


def soa_cache_owner(fieldset):
    """Host-side: the single vector field that OWNS the persistent cache.

    The SoA columns (_sc_key/_sc_u4/...) hold one field's face values; a
    second C-grid vector field reading them would blend the wrong data
    into its velocities, so exactly one designated owner may load/flush
    them (other qualifying fields still get the per-kernel-invocation
    cache). Preference order: the first 3-D (UVW) curvilinear C-grid
    vector field (the advection workhorse — its W column rides the cache),
    else the first 2-D one. Returns (registered_name | None, has_w).
    """
    from parcels_tpu._core.field import VectorField
    from parcels_tpu.interpolators.xinterp import CGrid_Velocity

    mode = _mode()
    if mode in ("0", "off"):
        return None, False
    # memory escape hatch: 64 B/lane of SoA columns is the difference
    # between fitting and HBM exhaustion for 3-D forcing at the full
    # config-5 shape on one 16 GB chip (the kernel-invocation cache alone
    # still runs; banded multi-chip runs fit either way)
    if os.environ.get("PARCELS_TPU_STAGECACHE_PERSIST", "1") in ("0", "off"):
        return None, False
    if mode != "force" and jax.default_backend() in ("cpu",):
        return None, False
    owner = None
    for name, f in fieldset.fields.items():
        if (
            isinstance(f, VectorField)
            and isinstance(f.interp_method, CGrid_Velocity)
            and f.grid.spec.curvilinear
        ):
            if f.W is not None:
                return name, True
            owner = owner or name
    return owner, False


def soa_cache_applicable(fieldset):
    """Host-side: does this fieldset qualify for the persistent cache?

    Returns (applicable, has_w) for the designated owner vector field
    (see soa_cache_owner).
    """
    owner, has_w = soa_cache_owner(fieldset)
    return owner is not None, has_w


def make_soa_cache(n: int, has_w: bool) -> dict:
    """Fresh (invalid) cache columns for ``n`` lanes (host numpy)."""
    import numpy as np

    out = {SC_KEY: np.full((n, 4), -1, dtype=np.int32)}
    for k, w in SC_ARRAYS.items():
        out[k] = np.zeros((n, w), dtype=np.float32)
    if has_w:
        out[SC_W] = np.zeros((n, 4), dtype=np.float32)
    return out


def make_soa_cache_device(n: int, has_w: bool) -> dict:
    """Device-resident twin of make_soa_cache (benches keep GBs off the
    host->device tunnel by allocating the SoA on-chip)."""
    out = {SC_KEY: jnp.full((n, 4), -1, dtype=jnp.int32)}
    for k, w in SC_ARRAYS.items():
        out[k] = jnp.zeros((n, w), dtype=jnp.float32)
    if has_w:
        out[SC_W] = jnp.zeros((n, 4), dtype=jnp.float32)
    return out


def invalidate_soa_cache(dev: dict) -> dict:
    """Mark every lane's persistent cache invalid (windowed chunk rollover)."""
    if SC_KEY in dev:
        dev = dict(dev)
        dev[SC_KEY] = jnp.asarray(dev[SC_KEY]).at[:, 0].set(-1)
    from parcels_tpu.ops import uxcache

    return uxcache.invalidate_soa_cache(dev)


def _load_soa_cache(particles, vf):
    pd = particles._data
    key = pd[SC_KEY]
    cell = jnp.maximum(key[:, 0], 0)
    # the pic/geometry rows are not persisted: re-gather the fused row by
    # the cached cell (ONE 1-granule row-take — stage 1's only gather on
    # the all-hit path); the cache carries only the meaningful columns
    row = jnp.take(cell_table(vf), cell, axis=0)[:, : GEOM_OFF + 9]
    cx = max(vf.grid.spec.xdim, 1)
    # zeros derived from varying inputs (zeros_like) so the cache pytree has
    # consistent varying-manual-axes under shard_map (cf. engine walk carry)
    return {
        "cell": key[:, 0],
        "ti": key[:, 1],
        "zi": key[:, 2],
        "wzi": key[:, 3],
        "yi": (cell // cx).astype(jnp.int32),
        "xi": (cell % cx).astype(jnp.int32),
        "row": row,
        "u4": pd["_sc_u4"],
        "v4": pd["_sc_v4"],
        "w4": pd.get(SC_W) if vf.W is not None else None,
        "esc": jnp.zeros_like(key[:, 0]),
        "oob": jnp.zeros_like(key[:, 0], dtype=bool),
    }


def flush(fsview, pd) -> None:
    """Write the OWNER view's final kernel-call cache back into the SoA
    (engine: after every kernel call). All-lane writes: entries for
    non-evaluated lanes were loaded unchanged from the SoA. Only the
    designated owner flushes — another C-grid vector field's cache holds
    different face values and must never land in the shared columns."""
    from parcels_tpu.ops import uxcache

    if SC_KEY not in pd and uxcache.UXC_KEY not in pd:
        return
    for v in fsview._views.values():
        if not getattr(v, "_sc_owner", False):
            continue
        c = getattr(v, "_stage_cache", None)
        if c is None:
            continue
        if "face" in c:  # unstructured per-face cache (ops/uxcache.py)
            if uxcache.UXC_KEY in pd:
                uxcache.flush_one(c, pd)
            continue
        if SC_KEY not in pd:
            continue
        pd[SC_KEY] = jnp.stack(
            [c["cell"], c["ti"], c["zi"], c["wzi"]], axis=1
        ).astype(jnp.int32)
        pd["_sc_u4"] = c["u4"]
        pd["_sc_v4"] = c["v4"]
        if c["w4"] is not None and SC_W in pd:
            pd[SC_W] = c["w4"]


# ---------------------------------------------------------------------------
# face-value quads
# ---------------------------------------------------------------------------


def _col_quad(field, ti, t1i, zcol, i0, i1):
    """[(i0,t0), (i0,t1), (i1,t0), (i1,t1)] values at depth column ``zcol``
    via 2 corner-column row-gathers + one-hot VPU reduces."""
    T, Z, Y, X = field.data.shape
    tbl = field.col_table()  # (Y*X, T*Z)
    r0 = jnp.take(tbl, i0, axis=0)
    r1 = jnp.take(tbl, i1, axis=0)
    j = jax.lax.broadcasted_iota(jnp.int32, (1, T * Z), 1)
    m0 = (j == (ti * Z + zcol)[:, None]).astype(jnp.float32)
    m1 = (j == (t1i * Z + zcol)[:, None]).astype(jnp.float32)
    return jnp.stack(
        [
            jnp.sum(r0 * m0, axis=1),
            jnp.sum(r0 * m1, axis=1),
            jnp.sum(r1 * m0, axis=1),
            jnp.sum(r1 * m1, axis=1),
        ],
        axis=1,
    )


def _flat_quad(field, ti, t1i, zcol, y0, x0, y1, x1):
    """Same quad via 4 scalar gathers (fields without a corner-column table)."""
    from parcels_tpu.interpolators.xinterp import _flat_gather

    d = field.data
    return jnp.stack(
        [
            _flat_gather(d, ti, zcol, y0, x0),
            _flat_gather(d, t1i, zcol, y0, x0),
            _flat_gather(d, ti, zcol, y1, x1),
            _flat_gather(d, t1i, zcol, y1, x1),
        ],
        axis=1,
    )


def _quad(field, ti, t1i, zcol, y0, x0, y1, x1):
    from parcels_tpu.ops.colgather import colgather_usable

    T, Z, Y, X = field.data.shape
    if colgather_usable(field.data.shape) and jax.default_backend() not in ("cpu",):
        return _col_quad(field, ti, t1i, zcol, y0 * X + x0, y1 * X + x1)
    return _flat_quad(field, ti, t1i, zcol, y0, x0, y1, x1)


# ---------------------------------------------------------------------------
# the blended C-grid velocity from cache columns (mirror of
# interpolators/xinterp.CGrid_Velocity's geometry-table fast path)
# ---------------------------------------------------------------------------


def _blend(spec, row, xsi, eta, tau, zeta, u4, v4, w4, Zw, y_deg):
    """C-grid blend from the fused cell row (geometry at cols GEOM_OFF+)."""
    deg2m = spec.deg2m
    spherical = spec.spherical
    g = GEOM_OFF
    dlon10, dlon23, dlon30, dlon21 = row[:, g], row[:, g + 1], row[:, g + 2], row[:, g + 3]
    dlat10, dlat23, dlat30, dlat21 = row[:, g + 4], row[:, g + 5], row[:, g + 6], row[:, g + 7]
    py0 = row[:, g + 8]

    def edge_len(dlon, dlat, lat_edge):
        if spherical:
            rad = jnp.pi / 180.0
            return jnp.sqrt(
                (dlon * deg2m * jnp.cos(rad * lat_edge)) ** 2 + (dlat * deg2m) ** 2
            )
        return jnp.sqrt(dlon**2 + dlat**2)

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
    jac = dxdxsi * dydeta - dxdeta * dydxsi
    if spherical:
        jac = jac * deg2m
    u = (Uvel * dxdxsi + Vvel * dxdeta) / jac
    v = (Uvel * dydxsi + Vvel * dydeta) / jac
    if spherical:
        conversion = deg2m * jnp.cos(jnp.deg2rad(y_deg))
        u = u / conversion
        v = v / conversion

    if w4 is not None:
        zb = jnp.clip(zeta, 0.0, 1.0) if Zw > 1 else jnp.zeros_like(zeta)
        w_lo = w4[:, 0] * (1.0 - tau) + w4[:, 1] * tau
        w_hi = w4[:, 2] * (1.0 - tau) + w4[:, 3] * tau
        w = w_lo * (1.0 - zb) + w_hi * zb
    else:
        w = jnp.zeros_like(u)
    return u, v, w


# ---------------------------------------------------------------------------
# full path: search + gathers for a (possibly compacted) batch
# ---------------------------------------------------------------------------


def _full(vf, y, x, ti, t1i, zc, wzi, yi_g, xi_g):
    """Search + gather every cached operand for one batch of lanes.

    Returns the cache-column dict plus the X/Y escalation code per lane.
    """
    grid = vf.grid
    spec = grid.spec
    garrs = grid.garrs
    lkm = grid.lookup_meta
    lookup = None
    if spec.has_lookup and lkm is not None:
        lookup = {
            "origin": lkm["origin"],
            "step": lkm["step"],
            "yi": garrs["lookup_yi"],
            "xi": garrs["lookup_xi"],
        }
    yi, eta, xi, xsi = index_search.curvilinear_search(
        garrs["lon"], garrs["lat"], y, x, yi_g, xi_g,
        spherical=spec.spherical, lookup=lookup,
        # the padded fused table: walk pic gathers run at the row-major
        # 1-granule rate instead of 16 scattered reads per iteration
        pic_table=cell_table(vf),
    )

    esc = jnp.where(
        (yi == index_search.RIGHT_OUT_OF_BOUNDS) | (xi == index_search.RIGHT_OUT_OF_BOUNDS),
        jnp.int32(StatusCode.ErrorOutOfBounds),
        jnp.int32(0),
    )
    esc = jnp.maximum(
        esc,
        jnp.where(
            (yi == index_search.GRID_SEARCH_ERROR) | (xi == index_search.GRID_SEARCH_ERROR),
            jnp.int32(StatusCode.ErrorGridSearching),
            jnp.int32(0),
        ),
    )

    cy, cx = max(spec.ydim, 1), max(spec.xdim, 1)
    yi_cl = jnp.clip(yi, 0, cy - 1)
    xi_cl = jnp.clip(xi, 0, cx - 1)
    cell = yi_cl * cx + xi_cl
    valid = (yi >= 0) & (xi >= 0)

    row = jnp.take(cell_table(vf), cell, axis=0)[:, : GEOM_OFF + 9]

    T, Z, Y, X = vf.U.data.shape
    off_x, off_y = spec.offset_x, spec.offset_y
    yi_o = jnp.clip(yi + off_y, 0, Y - 1)
    xw = jnp.clip(xi, 0, max(X - 2, 0))
    u4 = _quad(vf.U, ti, t1i, zc, yi_o, xw, yi_o, xw + 1)
    xi_o = jnp.clip(xi + off_x, 0, X - 1)
    yv = jnp.clip(yi, 0, max(Y - 2, 0))
    v4 = _quad(vf.V, ti, t1i, zc, yv, xi_o, yv + 1, xi_o)

    if vf.W is not None:
        w4a = _col_or_flat_w(vf.W, ti, t1i, wzi, yi_o, xi_o)
    else:
        w4a = None

    return {
        "cell": jnp.where(valid, cell, jnp.int32(-1)),
        "yi": yi_cl.astype(jnp.int32),
        "xi": xi_cl.astype(jnp.int32),
        "row": row,
        "u4": u4,
        "v4": v4,
        "w4": w4a,
        "esc": esc,
        "oob": ~valid,
    }


def _col_or_flat_w(field, ti, t1i, wzi, yi_o, xi_o):
    """W quad: [(z, t0), (z, t1), (z+1, t0), (z+1, t1)] at one column."""
    from parcels_tpu.interpolators.xinterp import _flat_gather
    from parcels_tpu.ops.colgather import colgather_usable

    T, Z, Y, X = field.data.shape
    z1 = jnp.clip(wzi + 1, 0, Z - 1)
    if colgather_usable(field.data.shape) and jax.default_backend() not in ("cpu",):
        tbl = field.col_table()
        r = jnp.take(tbl, yi_o * X + xi_o, axis=0)
        j = jax.lax.broadcasted_iota(jnp.int32, (1, T * Z), 1)

        def pick(tix, zix):
            return jnp.sum(r * (j == (tix * Z + zix)[:, None]).astype(jnp.float32), axis=1)

        return jnp.stack(
            [pick(ti, wzi), pick(t1i, wzi), pick(ti, z1), pick(t1i, z1)], axis=1
        )
    d = field.data
    return jnp.stack(
        [
            _flat_gather(d, ti, wzi, yi_o, xi_o),
            _flat_gather(d, t1i, wzi, yi_o, xi_o),
            _flat_gather(d, ti, z1, yi_o, xi_o),
            _flat_gather(d, t1i, z1, yi_o, xi_o),
        ],
        axis=1,
    )


# ---------------------------------------------------------------------------
# the cached eval
# ---------------------------------------------------------------------------


def cgrid_cached_eval(vf, t, z, y, x, particles):
    """Drop-in replacement for VectorFieldView.eval on curvilinear C-grids."""
    from parcels_tpu._core.field import _escalate

    grid = vf.grid
    spec = grid.spec
    garrs = grid.garrs
    t = jnp.asarray(t)
    z = jnp.asarray(z)
    y = jnp.asarray(y)
    x = jnp.asarray(x)

    if vf.U.has_time:
        ti, tau, t_oob = index_search.search_time(garrs["time"], t, spec.time_uniform)
    else:
        ti = jnp.zeros(jnp.shape(t), dtype=jnp.int32)
        tau = jnp.zeros(jnp.shape(t), dtype=jnp.float32)
        t_oob = None
    T = vf.U.data.shape[0]
    t1i = jnp.clip(ti + 1, 0, T - 1)

    if "Z" in spec.axes:
        zi_raw, zeta = index_search.search_1d(garrs["depth"], z, spec.depth_uniform)
    else:
        zi_raw = jnp.zeros(z.shape, dtype=jnp.int32)
        zeta = jnp.zeros(z.shape, dtype=jnp.float32)
    Z = vf.U.data.shape[1]
    zc = jnp.clip(zi_raw, 0, Z - 1)
    if vf.W is not None:
        Zw = vf.W.data.shape[1]
        wzi = jnp.clip(zi_raw + spec.offset_z, 0, max(Zw - 2, 0))
    else:
        Zw = 1
        wzi = jnp.zeros_like(zc)

    # escalations independent of the X/Y search (mirror field.py
    # _update_state_position's Z/T sentinel handling)
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

    # hoist the corner-column tables into the MAIN trace scope: the first
    # col_table() call must not happen inside a lax.cond branch (the cached
    # table tracer would escape its scope when another branch reuses it)
    from parcels_tpu.ops.colgather import colgather_usable

    if jax.default_backend() not in ("cpu",):
        for comp in (vf.U, vf.V, vf.W):
            if comp is not None and colgather_usable(comp.data.shape):
                comp.col_table()

    c = vf._stage_cache
    n = y.shape[0]

    if (
        c is None
        and particles is not None
        and SC_KEY in particles._data
        and getattr(vf, "_sc_owner", False)
    ):
        # cross-step persistence: stage 1 starts from LAST step's cache
        # (steady state: the particle is still in yesterday's cell).
        # Owner-only: the SoA columns hold ONE field's face values.
        c = _load_soa_cache(particles, vf)

    if c is None:
        # first eval of this kernel invocation: full batch
        ei = particles._get_ei(vf.igrid) if particles is not None else None
        cy, cx = max(spec.ydim, 1), max(spec.xdim, 1)
        if ei is not None:
            xi_g = ei % cx
            yi_g = (ei // cx) % cy
        else:
            yi_g = jnp.zeros(y.shape, dtype=jnp.int32)
            xi_g = jnp.zeros(x.shape, dtype=jnp.int32)
        c = _full(vf, y, x, ti, t1i, zc, wzi, yi_g, xi_g)
        c["ti"] = ti
        c["zi"] = zc
        c["wzi"] = wzi
        if particles is not None:
            # only engine-driven evals cache: a host-side fieldset.eval may
            # reuse one view across traces, where stored tracers would leak
            vf._stage_cache = c
        q = index_search.query_xyz(y, x, spec.spherical)
        _, xsi, eta = index_search.pic_from_rows(c["row"], q)
    else:
        q = index_search.query_xyz(y, x, spec.spherical)
        ok, xsi0, eta0 = index_search.pic_from_rows(c["row"], q)
        finite = jnp.isfinite(y) & jnp.isfinite(x)
        hit = (
            ok
            & (ti == c["ti"]) & (zc == c["zi"]) & (wzi == c["wzi"])
            & (c["cell"] >= 0)
        )
        # dead/NaN lanes can never resolve: treat as hits (garbage values,
        # masked by the caller) so they don't consume fix-up capacity
        miss = ~hit & finite
        if particles is not None:
            miss = miss & particles._mask
        cnt = jnp.sum(miss.astype(jnp.int32))
        if os.environ.get("PARCELS_TPU_STAGECACHE_DEBUG"):
            jax.debug.print("stagecache miss cnt={c} of n={n}", c=cnt, n=n)
        K = min(n, max(1024, n // _K_DIV))

        cum = _blocked_cumsum(miss.astype(jnp.int32))

        # Cond-free miss repair (round-3 VERDICT weak #1: "collapse the
        # fix-up cond tiers"): ceil(cnt / K) ROUNDS of a fixed-K compacted
        # fix-up inside one while_loop — 1 round in the steady state, more
        # only at invalidation bursts (chunk rollover, migration). The old
        # nested lax.cond tier tree forced XLA to materialize branch copies
        # of the whole per-lane cache dict (~180 B/lane) at EVERY stage
        # (device trace r4: the 8 conditionals were ~60% of step time);
        # while_loop carries alias in place, so a round costs only its own
        # compacted search + gathers + scatters.
        nrounds = jax.lax.div(cnt + (K - 1), jnp.int32(K))
        c["esc"] = jnp.zeros_like(c["esc"])

        def round_body(carry):
            r, c = carry
            # compact this round's K miss indices by binary search into the
            # miss cumsum: O(K log n) scattered READS. Both scatter-based
            # alternatives measured slower on device (sweep_kdiv ladders):
            # an n-length scatter per round re-pays the batch every round,
            # and even ONE n-scatter per stage (~2.5M writes at the ~500M
            # elem/s scatter issue rate) costs more than all the small
            # searchsorteds combined at the optimal K = n/1024.
            base = (r * K).astype(cum.dtype)
            idx = jnp.searchsorted(cum, base + jnp.arange(1, K + 1, dtype=cum.dtype))
            idx = jnp.minimum(idx, n - 1).astype(jnp.int32)

            def g(a):
                return jnp.take(a, idx, axis=0)

            # warm-start the sub-search from the stale cached cell
            sub = _full(
                vf, g(y), g(x), g(ti), g(t1i), g(zc), g(wzi),
                g(c["yi"]), g(c["xi"]),
            )
            out = dict(c)
            for k in ("cell", "yi", "xi", "row", "u4", "v4"):
                out[k] = c[k].at[idx].set(sub[k])
            if c["w4"] is not None:
                out["w4"] = c["w4"].at[idx].set(sub["w4"])
            out["esc"] = c["esc"].at[idx].set(sub["esc"])
            out["oob"] = c["oob"].at[idx].set(sub["oob"])
            out["ti"] = c["ti"].at[idx].set(g(ti))
            out["zi"] = c["zi"].at[idx].set(g(zc))
            out["wzi"] = c["wzi"].at[idx].set(g(wzi))
            return r + 1, out

        _, c = jax.lax.while_loop(
            lambda carry: carry[0] < nrounds, round_body, (jnp.int32(0), c)
        )
        vf._stage_cache = c
        _, xsi, eta = index_search.pic_from_rows(c["row"], q)

    u, v, w = _blend(
        spec, c["row"], xsi, eta, tau, zeta, c["u4"], c["v4"], c["w4"], Zw, y
    )

    if particles is not None:
        esc = jnp.maximum(esc_zt, c["esc"])
        particles.state = jnp.maximum(particles.state, esc)
        bad_val = jnp.isnan(u) | jnp.isnan(v) | jnp.isnan(w)
        _escalate(particles, bad_val, StatusCode.ErrorInterpolation)
        # refresh the warm-start ei cache (mirror _update_particles_ei)
        ydim = max(spec.ydim, 1)
        xdim = max(spec.xdim, 1)
        ei_new = (zc * ydim + c["yi"]) * xdim + c["xi"]
        particles._set_ei(vf.igrid, ei_new)

    # OOB samples return 0 (reference field.py:359-370)
    mask0 = c["oob"] | z_oob
    u = jnp.where(mask0, 0.0, u)
    v = jnp.where(mask0, 0.0, v)
    w = jnp.where(mask0, 0.0, w)
    if vf.vector_type == "3D":
        return (u, v, w)
    return (u, v)
