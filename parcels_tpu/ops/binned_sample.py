"""Binned slab sampler: multilinear interpolation of HBM-scale fields.

The missing performance tier between the VMEM hat-weight fold
(ops/interp_kernels.py — fields whose window fits on-chip) and the XLA
16-corner gather (reference hot path, _xinterpolators.py:25-75), which on
TPU is instruction-bound at ~5-7 M samples/s regardless of locality
(measured on v5e, see BASELINE.md).

Design. The engine keeps the particle SoA approximately sorted by
(spatial bin, z-cell) (engine.py sorts at chunk boundaries with one packed
row-gather). The domain is partitioned into bins of ``(bz, by, bx)`` cells,
sized at trace time from the particle density so a bin holds a few CHUNKs of
particles; each Pallas program handles CHUNK consecutive sorted particles,
which span at most two bins in the common case. The program DMAs the two
bins' field slabs HBM→VMEM (double-buffered across programs; the second DMA
is skipped when both lanes' bins coincide) and samples its particles with
hat-weight MXU contractions against slab windows — no per-element random
access anywhere.

The contraction is *windowed per sub-block of 128 lanes*: because lanes are
sorted by (bin, z), the 128 lanes of a sub-block share one slab half and one
z-cell (±1), so each MXU pass contracts only a (WZ·SY, SX) window of WZ=3
z-planes selected by a dynamic row offset, instead of the full slab:

    value_p = Σ_t hat(t−t_p) · [ window(z0)ᵀ · (hat(z_r−z_p)·hat(y_r−y_p)) ]
              · hat(x_cols − x_p)                       (MXU + VPU reduce)

This cuts MXU FLOPs/particle by ~SZ/WZ versus a dense whole-slab
contraction while keeping the contraction depth (WZ·SY ≥ 128) at full MXU
utilization, and it decouples the bin's z extent (particle-population
driven) from the compute cost — bins can be tall in z, so the geometry
stays feasible at realistic particle densities.

Slab extents exceed the bin by the interpolation stencil (+1 cell) and by
the (8, 128) HBM-tiling alignment of DMA origins, so a particle inside a
bin never reads outside its slab.

Particles outside their sub-block's slab/z-window ("overflow": chunks
straddling three bins, sub-blocks straddling a bin or z transition,
stale/just-migrated lanes, or an unsorted SoA) are corrected with a
capacity-K compacted gather; if overflow exceeds K the whole batch falls
back to the plain gather path — correctness never depends on sortedness.

Reference semantics preserved: per-axis linear blend with clipped upper
index, degenerate (len-1) axes pinned (reference
interpolators/_xinterpolators.py:112-153); out-of-bounds masking stays in
field.py's `_mask_oob_values`.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "CHUNK",
    "LANE",
    "binned_usable",
    "binned_linear_sample",
    "slab_geometry",
    "sort_key_for",
]

#: particles per Pallas program (one slab pair per chunk)
CHUNK = int(os.environ.get("PARCELS_TPU_BINNED_CHUNK", 1024))

#: lanes per MXU sub-block (one z-window per sub-block)
LANE = 128

#: want at least this many particles per bin (in CHUNK units)
_BIN_FILL = 3

#: overflow fix-up tier capacities, as n/DIV (see binned_linear_sample)
_K_SMALL_DIV = int(os.environ.get("PARCELS_TPU_BINNED_KSMALL_DIV", 48))
_K_BIG_DIV = int(os.environ.get("PARCELS_TPU_BINNED_KBIG_DIV", 8))

#: FLOPs-per-byte exchange rate for the DMA term of the geometry cost
#: (v5e: ~197 Tf/s bf16 MXU over ~819 GB/s HBM)
_FLOPS_PER_BYTE = 240.0


def _padded_dims(shape4):
    """Y/X padded up to the HBM (8, 128) tiling (DMA origins must align)."""
    T, Z, Y, X = shape4
    return T, Z, -(-Y // 8) * 8, -(-X // 128) * 128


def binned_usable(shape4) -> bool:
    """Static check: is the slab geometry worthwhile for this field shape?"""
    T, Z, Y, X = shape4
    return Y >= 8 and X >= 128


def _zwin(SZ: int) -> int:
    """z-planes per MXU window (the full slab when the slab is that thin).

    4 planes = 3 z-cells: the window anchors one cell BELOW the sub-block's
    sorted z-cell, so lanes that drift +-1 z-cell between engine re-sorts
    stay covered instead of spilling to the overflow fix-up (drift was
    measured to cross the fix-up capacity tier after ~6 steps at WZ=3,
    cliffing the whole batch onto the gather fallback).
    """
    return min(4, SZ)


# Occupancy hint: the planner's feasibility test assumes lanes spread
# uniformly over ALL z-cells. Real seedings concentrate (e.g. surface-only
# releases occupy 1 of 50 z-cells), making the uniform estimate reject bins
# that are actually full and dropping the batch into the overflow-heavy
# sparse fallback. The ParticleSet measures the occupied z fraction at
# execute() time, quantizes it (so plans/compiles only change across
# order-of-magnitude shifts), and threads it EXPLICITLY through the
# executor: it is captured at executor-build time, baked into the executor
# cache key, and carried to the planner via ``gpos["_z_occ"]`` / the
# ``z_occ=`` keyword. The module global below is only the default for
# direct planner calls that pass nothing (scripts, micro-benches).
_Z_OCCUPANCY = 1.0
_Z_OCC_LEVELS = (1.0, 0.5, 0.25, 0.1, 0.05, 0.02)


def quantize_z_occupancy(frac: float) -> float:
    """Quantize an occupied-z fraction to the planner's coarse levels."""
    return min(
        (lv for lv in _Z_OCC_LEVELS if lv >= max(float(frac), _Z_OCC_LEVELS[-1])),
        default=1.0,
    )


def set_z_occupancy_hint(frac: float) -> float:
    """Record the fraction of z-cells occupied by the current particle
    batch (process-wide default); returns the quantized value."""
    global _Z_OCCUPANCY
    _Z_OCCUPANCY = quantize_z_occupancy(frac)
    return _Z_OCCUPANCY


def current_z_occupancy() -> float:
    return _Z_OCCUPANCY


def slab_geometry(shape4, n, z_occ: float | None = None):
    return _slab_geometry_impl(shape4, n, _Z_OCCUPANCY if z_occ is None else z_occ)


@functools.lru_cache(maxsize=None)
def _slab_geometry_impl(shape4, n, z_occupancy):
    """Trace-time bin/slab geometry from field shape and particle count.

    Bins of (bz, by, bx) cells; slab extents (WT, SZ, SY, SX) cover a bin
    plus the +1 interpolation stencil plus DMA-origin alignment slack
    (y origins round down to 8, x origins to 128). The z bin extent is
    decoupled from compute cost by the windowed contraction, so SZ can grow
    until VMEM binds. Candidates are scored by MXU+DMA cost per particle;
    prefer the cheapest whose expected bin population (uniform density) is
    >= _BIN_FILL * CHUNK; if none qualifies (sparse regime), take the
    largest-bin candidate and let overflow/fallback absorb it.
    """
    T, Z, Yp, Xp = _padded_dims(shape4)
    WT = 1 if T == 1 else 2
    # Density over the cells lanes actually occupy (see
    # set_z_occupancy_hint): concentrated seedings fill their bins far
    # beyond the uniform estimate. O = number of occupied z-cells; a bin
    # spanning bz z-cells intersects at most min(bz, O) of them.
    occupied_z = max(z_occupancy * Z, 1.0)
    density = n / float(max(occupied_z * Yp * Xp, 1))

    # Bin extents: a lane's slab-relative cell must stay within the slab for
    # ANY origin produced by clipping/alignment. z: bz <= SZ-1 (clipped
    # last-bin origins only shrink zrel). y: origins round down to 8, so
    # by <= SY-8-1; x rounds to 128, bx <= SX-128-1. A slab covering the
    # whole (padded) axis means ONE bin spanning it — remainder bins are
    # what make sorted chunks straddle 3+ bins and leak into the fix-up.
    def bin_extents(SZ, SY, SX):
        bz = 1 if Z == 1 else (Z if SZ >= Z else max(SZ - 1, 1))
        by = Y_ if SY >= Yp else max(SY - 9, 1)
        bx = X_ if SX >= Xp else max(SX - 129, 1)
        return bz, by, bx

    Y_, X_ = shape4[2], shape4[3]

    forced = os.environ.get("PARCELS_TPU_BINNED_GEOM")
    if forced:  # "SZ,SY,SX" — perf experiments only
        SZ, SY, SX = (int(v) for v in forced.split(","))
        SZ = min(SZ, Z)
        bz, by, bx = bin_extents(SZ, min(SY, Yp), min(SX, Xp))
        return (WT, SZ, min(SY, Yp), min(SX, Xp), bz, by, bx)

    if Z == 1:
        sz_cands = [1]
    else:
        sz_cands = sorted({min(Z, s) for s in (3, 4, 6, 8, 12, 16, 24, 32)})
    sy_cands = [s for s in (16, 32, 48, 64) if s <= max(Yp, 16)]
    sx_cands = [s for s in (256, 384, 512) if s <= max(Xp, 256)]

    best = None  # (feasible, -cost or bin_volume) -> geometry
    for SZ in sz_cands:
        WZ = _zwin(SZ)
        for SY in sy_cands:
            for SX in sx_cands:
                bz, by, bx = bin_extents(SZ, SY, SX)
                # double-buffered slab pair + per-sub-block live tiles
                slab_bytes = 4 * (2 * 2 * WT * SZ * SY * SX)
                tile_bytes = 4 * (3 * WZ * SY * (SX + 2 * LANE) + 3 * SX * LANE)
                if slab_bytes + tile_bytes > 7 * 2**20:
                    continue
                mxu = 6 * max(WT * WZ * SY, 128) * SX  # per lane, bf16-split
                dma = _FLOPS_PER_BYTE * (1.2 * WT * SZ * SY * SX * 4) / CHUNK
                cost = mxu + dma
                vbin = min(float(bz), occupied_z) * by * bx
                # bins must hold several chunks AND each z-cell must hold
                # more than a 128-lane sub-block, else sub-blocks span >2
                # z-cells and their tails leak into the gather fix-up
                feasible = density * vbin >= _BIN_FILL * CHUNK and (
                    Z == 1 or density * by * bx >= 1.5 * LANE
                )
                rank = (feasible, -cost if feasible else vbin)
                if best is None or rank > best[0]:
                    best = (rank, (WT, SZ, min(SY, Yp), min(SX, Xp), bz, by, bx))
    # record whether ANY candidate met the bin-population bar — auto mode
    # uses it to skip the binned path in the sparse regime, where overflow
    # leakage makes plain gather faster (measured at config-5 scale)
    _FEASIBLE_CACHE[(shape4, n, z_occupancy)] = bool(best[0][0])
    return best[1]


_FEASIBLE_CACHE: dict = {}


def plan_feasible(shape4, n, z_occ: float | None = None) -> bool:
    """Did the current plan for (shape4, n) meet the bin-population bar?"""
    occ = _Z_OCCUPANCY if z_occ is None else z_occ
    key = (tuple(shape4), n, occ)
    if key not in _FEASIBLE_CACHE:
        slab_geometry(tuple(shape4), n, occ)
    # PARCELS_TPU_BINNED_GEOM-forced plans bypass scoring: treat as feasible
    return _FEASIBLE_CACHE.get(key, True)


def _mode() -> str:
    return os.environ.get("PARCELS_TPU_BINNED", "auto")


def binned_enabled(shape4, gpos) -> bool:
    """Trace-time gate for the binned path.

    Requires: not disabled, slab-compatible shape, an engine-sorted particle
    batch (otherwise every chunk overflows and the cond falls back — pure
    overhead), and a TPU backend unless forced (tests run forced on CPU in
    interpret mode).
    """
    mode = _mode()
    if mode in ("0", "off"):
        return False
    if not binned_usable(shape4):
        return False
    if not gpos.get("_sorted", False):
        return False
    if mode == "force":
        return True
    if jax.default_backend() in ("cpu",):
        return False
    # auto: only when the bin plan is feasible for this density — in the
    # sparse regime the overflow fix-up dominates and gather wins
    n = gpos["X"]["index"].shape[0]
    return plan_feasible(shape4, n, gpos.get("_z_occ"))


# ---------------------------------------------------------------------------
# sort key (used by the engine to order the SoA)
# ---------------------------------------------------------------------------


def _bin_coords(geom, shape4, gpos):
    """Per-particle bin coordinates (zb, yb, xb), int32."""
    T, Z, Y, X = shape4
    WT, SZ, SY, SX, bz, by, bx = geom
    zi = jnp.clip(gpos["Z"]["index"], 0, max(Z - 1, 0)).astype(jnp.int32)
    yi = jnp.clip(gpos["Y"]["index"], 0, max(Y - 1, 0)).astype(jnp.int32)
    xi = jnp.clip(gpos["X"]["index"], 0, max(X - 1, 0)).astype(jnp.int32)
    return zi // bz, yi // by, xi // bx


def sort_key_for(spec, gpos, shape4, n, z_occ: float | None = None):
    """int32 (spatial-bin, z-cell) sort key matching the slab geometry.

    Lexicographic (z-bin, y-bin, x-bin, z-cell): x-bins of one y-row stay
    consecutive, so sorted chunks span at most two bins wherever bins hold
    at least ~CHUNK particles; the trailing z-cell component groups each
    bin's lanes by z so 128-lane sub-blocks share a z-window — exactly what
    the windowed two-slab kernel covers.
    """
    geom = slab_geometry(tuple(shape4), n, z_occ)
    _, _, _, _, bz, by, bx = geom
    T, Z, Y, X = shape4
    nby = -(-max(Y, 1) // by)
    nbx = -(-max(X, 1) // bx)
    zb, yb, xb = _bin_coords(geom, shape4, gpos)
    bin_id = (zb * nby + yb) * nbx + xb
    zi = jnp.clip(gpos["Z"]["index"], 0, max(Z - 1, 0)).astype(jnp.int32)
    zrel = zi - zb * bz  # in [0, bz)
    return (bin_id * bz + zrel).astype(jnp.int32)


# ---------------------------------------------------------------------------
# plan: per-chunk slab origins + slab-relative positions + overflow lanes
# ---------------------------------------------------------------------------


def _build_plan(shape4, gpos):
    T, Z, Y, X = shape4
    n = gpos["X"]["index"].shape[0]
    geom = slab_geometry(tuple(shape4), n, gpos.get("_z_occ"))
    WT, SZ, SY, SX, bz, by, bx = geom
    WZ = _zwin(SZ)
    Tp, Zp, Yp, Xp = _padded_dims(shape4)

    G = -(-n // CHUNK)
    npad = G * CHUNK
    pad = npad - n
    NS = CHUNK // LANE

    def padded(a):
        if pad == 0:
            return a
        return jnp.concatenate([a, jnp.broadcast_to(a[-1:], (pad,))])

    zb, yb, xb = (padded(c).reshape(G, CHUNK) for c in _bin_coords(geom, shape4, gpos))

    def bin_origin(b, stride, align, pdim, ext):
        o = b * stride
        if align > 1:
            o = (o // align) * align
        return jnp.clip(o, 0, max(pdim - ext, 0))

    # two candidate bins per chunk: of the first and of the last lane
    sel1 = (zb == zb[:, :1]) & (yb == yb[:, :1]) & (xb == xb[:, :1])
    sel2 = (zb == zb[:, -1:]) & (yb == yb[:, -1:]) & (xb == xb[:, -1:])
    overflow = ~(sel1 | sel2)

    origins = {}
    for tag, pick in (("1", lambda a: a[:, 0]), ("2", lambda a: a[:, -1])):
        origins["z" + tag] = bin_origin(pick(zb), bz, 1, Zp, SZ)
        origins["y" + tag] = bin_origin(pick(yb), by, 8, Yp, SY)
        origins["x" + tag] = bin_origin(pick(xb), bx, 128, Xp, SX)

    # identical halves -> the kernel skips the second slab DMA
    dup = (
        (origins["z1"] == origins["z2"])
        & (origins["y1"] == origins["y2"])
        & (origins["x1"] == origins["x2"])
    )

    # time origin: per-chunk min (shared by both slabs)
    tidx = gpos["T"]["index"].astype(jnp.int32)
    tblend = 1 if T > 1 else 0
    tci = jnp.clip(tidx, 0, max(T - 1 - tblend, 0))
    tci_c = padded(tci).reshape(G, CHUNK)
    t0 = jnp.clip(tci_c.min(axis=1), 0, max(T - WT, 0))
    overflow = overflow | (tci_c + tblend > t0[:, None] + (WT - 1))

    # per-lane slab half (0 -> first-lane bin, 1 -> last-lane bin); when the
    # halves coincide only slab 0 is loaded, so everything maps to half 0
    half = jnp.where(sel1, 0, 1).astype(jnp.int32) * (1 - dup[:, None].astype(jnp.int32))

    # integer z cell relative to the lane's own slab origin
    zci = jnp.clip(padded(gpos["Z"]["index"].astype(jnp.int32)).reshape(G, CHUNK), 0,
                   max(Z - 1 - (1 if Z > 1 else 0), 0))
    zorig = jnp.where(half == 0, origins["z1"][:, None], origins["z2"][:, None])
    zrel_int = zci - zorig

    # per-sub-block scalars: slab half by majority vote (halves the tail a
    # first-lane anchor leaves at bin boundaries), z-window offset from the
    # majority half's lowest z cell
    half_s = half.reshape(G, NS, LANE)
    zrel_s = zrel_int.reshape(G, NS, LANE)
    shalf = (half_s.sum(axis=2) > LANE // 2).astype(jnp.int32)
    in_maj = half_s == shalf[:, :, None]
    # anchor the window one cell below the sub-block's ROUNDED MEAN z-cell:
    # robust to outliers, unlike a min anchor, where a single lane drifting
    # down a z-cell between engine re-sorts drags the window and evicts
    # every top-cell lane of its sub-block (measured: that amplification
    # cliffed whole batches onto the gather fallback after ~6 drift steps)
    cnt = jnp.maximum(in_maj.sum(axis=2), 1)
    zsum = jnp.where(in_maj, zrel_s, 0).sum(axis=2)
    zmean = jnp.round(zsum.astype(jnp.float32) / cnt.astype(jnp.float32)).astype(jnp.int32)
    z0w = jnp.clip(zmean - 1, 0, max(SZ - WZ, 0))

    # sub-block window validity: same half, z cell within the window's
    # lower WZ-1 planes (the particle also reads plane z+1)
    ok_half = in_maj
    if Z > 1:
        ok_z = (zrel_s >= z0w[:, :, None]) & (zrel_s <= z0w[:, :, None] + (WZ - 2))
    else:
        ok_z = jnp.ones_like(ok_half)
    overflow = overflow | (~(ok_half & ok_z)).reshape(G, CHUNK)

    # lane activity: dead lanes (capacity padding, deleted particles) never
    # need values — drop them from the overflow budget and let the kernel
    # skip chunks with no live lane at all (the engine sorts inactive lanes
    # to the tail, so padding forms whole dead chunks)
    active = gpos.get("active")
    if active is not None:
        act_c = padded(jnp.asarray(active)).reshape(G, CHUNK)
        overflow = overflow & act_c
        live = act_c.any(axis=1).astype(jnp.int32)
    else:
        live = jnp.ones((G,), jnp.int32)

    # slab-relative fractional positions (vs the particle's own slab)
    sel_h0 = (half == 0)

    def rel(axis, dim, o1, o2):
        idx = padded(gpos[axis]["index"].astype(jnp.int32)).reshape(G, CHUNK)
        bc = padded(gpos[axis]["bcoord"].astype(jnp.float32)).reshape(G, CHUNK)
        blend = 1 if dim > 1 else 0
        ci = jnp.clip(idx, 0, max(dim - 1 - blend, 0))
        o = jnp.where(sel_h0, o1[:, None], o2[:, None])
        r = (ci - o).astype(jnp.float32) + bc
        if dim == 1:
            r = jnp.zeros_like(r)
        return r.reshape(npad)

    relt = rel("T", T, t0, t0)
    relz = rel("Z", Z, origins["z1"], origins["z2"])
    rely = rel("Y", Y, origins["y1"], origins["y2"])
    relx = rel("X", X, origins["x1"], origins["x2"])

    return {
        "G": G,
        "NS": NS,
        "npad": npad,
        "geom": geom,
        "WZ": WZ,
        "pdims": (Tp, Zp, Yp, Xp),
        "t0": t0.astype(jnp.int32),
        "origins": {k: v.astype(jnp.int32) for k, v in origins.items()},
        "dup": dup.astype(jnp.int32),
        # flattened (G*NS,): 2-D SMEM prefetch arrays pad the minor dim to
        # 128 (64 B/element) and blow the 1 MB SMEM budget
        "shalf": shalf.reshape(-1).astype(jnp.int32),
        "z0w": z0w.reshape(-1).astype(jnp.int32),
        "live": live,
        "rel": (relt, relz, rely, relx),
        "overflow": overflow.reshape(npad)[:n],
    }


def _get_plan(shape4, gpos):
    """Build the plan (no Python-level cache: plans are rebuilt per component
    inside the same jit trace and XLA CSE merges the duplicates; a cross-call
    cache would leak tracers across lax.cond branch scopes)."""
    return _build_plan(shape4, gpos)


# ---------------------------------------------------------------------------
# the Pallas kernel
# ---------------------------------------------------------------------------


def _hat(delta):
    return jnp.maximum(0.0, 1.0 - jnp.abs(delta))


def _dot3(a, b):
    """3-pass bf16 split-float contraction of dim 0 (~1e-5 relative).

    Mosaic's pallas dot supports only DEFAULT (1-pass bf16, ~4e-3 error —
    unusable here) and HIGHEST (6-pass); the classic hi/lo split
    a*b ~= ah*bh + ah*bl + al*bh drops only the O(2^-16) lo*lo term and
    costs half of HIGHEST.
    """
    dn = (((0,), (0,)), ((), ()))

    def d(x, y):
        return jax.lax.dot_general(x, y, dn, preferred_element_type=jnp.float32)

    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    return d(ah, bh) + (d(ah, bl) + d(al, bh))


def _slab_kernel(
    t0r, z1r, y1r, x1r, z2r, y2r, x2r, dupr, shalfr, z0wr, liver,
    data_ref, pt, pz, py, px, out, slab, sem, *, exts, wz, ns,
):
    WT, SZ, SY, SX = exts
    WZ = wz
    g = pl.program_id(0)
    nprog = pl.num_programs(0)
    slot = jax.lax.rem(g, 2)
    nslot = jax.lax.rem(g + 1, 2)

    def dma_for(gi, s, half):
        zr, yr, xr = (z1r, y1r, x1r) if half == 0 else (z2r, y2r, x2r)
        # origins are pre-aligned to the (8, 128) HBM tiling by the plan;
        # multiple_of lets Mosaic prove the sliced DMA is tile-aligned
        return pltpu.make_async_copy(
            data_ref.at[
                pl.ds(t0r[gi], WT),
                pl.ds(zr[gi], SZ),
                pl.ds(pl.multiple_of(yr[gi], 8), SY),
                pl.ds(pl.multiple_of(xr[gi], 128), SX),
            ],
            slab.at[s, half],
            sem.at[s, half],
        )

    @pl.when((g == 0) & (liver[0] == 1))
    def _():
        dma_for(0, 0, 0).start()

        @pl.when(dupr[0] == 0)
        def _():
            dma_for(0, 0, 1).start()

    # dead chunks (no live lane — sorted capacity padding) do no DMA and no
    # compute; starts and waits are consistently guarded by the same flag
    @pl.when((g + 1 < nprog) & (liver[jnp.minimum(g + 1, nprog - 1)] == 1))
    def _():
        dma_for(g + 1, nslot, 0).start()

        @pl.when(dupr[g + 1] == 0)
        def _():
            dma_for(g + 1, nslot, 1).start()

    @pl.when(liver[g] == 1)
    def _():
        dma_for(g, slot, 0).wait()

        @pl.when(dupr[g] == 0)
        def _():
            dma_for(g, slot, 1).wait()

    # particle-as-lane orientation throughout: positions are (1, LANE) rows,
    # weights (WT*WZ*SY, LANE), acc (SX, LANE) — a (n, 1) layout would be
    # padded 128x by the (8, 128) tiling (measured: 4.7 GB per 10M-particle
    # input). Both time planes merge into ONE dot per sub-block: the slab's
    # (WT, z-window, SY) rows are contiguous after the z slice, so rc =
    # WT*WZ*SY (>= 128, full MXU depth) and the dot count per chunk is NS —
    # small-matmul issue overhead, not FLOPs, dominates at these sizes.
    @pl.when(liver[g] == 0)
    def _():
        out[...] = jnp.zeros(out.shape, out.dtype)

    @pl.when(liver[g] == 1)
    def _():
        rc = WT * WZ * SY
        rr = jax.lax.broadcasted_iota(jnp.int32, (rc, 1), 0)
        trow = (rr // (WZ * SY)).astype(jnp.float32)
        zrow = ((rr // SY) % WZ).astype(jnp.float32)
        yrow = (rr % SY).astype(jnp.float32)
        cols = jax.lax.broadcasted_iota(jnp.int32, (SX, 1), 0).astype(jnp.float32)

        for s in range(ns):
            h = shalfr[g * ns + s]
            z0 = z0wr[g * ns + s]
            pts = pt[0, s : s + 1, :].reshape(1, LANE)
            pzs = pz[0, s : s + 1, :].reshape(1, LANE) - z0.astype(jnp.float32)
            pys = py[0, s : s + 1, :].reshape(1, LANE)
            pxs = px[0, s : s + 1, :].reshape(1, LANE)

            w = _hat(trow - pts) * _hat(zrow - pzs) * _hat(yrow - pys)  # (rc, LANE)
            fold = slab[slot, h, :, pl.ds(z0, WZ)].reshape(rc, SX)
            acc = _dot3(fold, w)  # (SX, LANE)
            wx = _hat(cols - pxs)
            out[0, s : s + 1, :] = jnp.sum(acc * wx, axis=0, keepdims=True)


def _run_kernel(data, plan):
    WT, SZ, SY, SX = plan["geom"][:4]
    WZ = plan["WZ"]
    G = plan["G"]
    NS = plan["NS"]
    npad = plan["npad"]
    # pad Y/X up to the HBM tiling so aligned slab origins always fit; the
    # pad is loop-invariant so XLA hoists it out of the engine while-loop
    T, Z, Yp, Xp = plan["pdims"]
    dy, dx = Yp - data.shape[2], Xp - data.shape[3]
    if dy or dx:
        data = jnp.pad(data, ((0, 0), (0, 0), (0, dy), (0, dx)))
    o = plan["origins"]
    prefetch = (
        plan["t0"],
        o["z1"], o["y1"], o["x1"],
        o["z2"], o["y2"], o["x2"],
        plan["dup"], plan["shalf"], plan["z0w"], plan["live"],
    )
    # (G, NS, LANE) with block (1, NS, LANE): the block's trailing dims match
    # the array's, satisfying Mosaic's (8, 128)-divisibility rule for blocks
    pt, pz, py, px = (p.reshape(G, NS, LANE) for p in plan["rel"])

    pos_spec = pl.BlockSpec((1, NS, LANE), lambda g, *refs: (g, 0, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=11,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # field stays in HBM; slabs DMA'd
            pos_spec,
            pos_spec,
            pos_spec,
            pos_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, NS, LANE), lambda g, *refs: (g, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, WT, SZ, SY, SX), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    interpret = jax.default_backend() in ("cpu",)
    out = pl.pallas_call(
        functools.partial(_slab_kernel, exts=plan["geom"][:4], wz=WZ, ns=NS),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, NS, LANE), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * npad * 2 * WT * WZ * SY * SX,
            bytes_accessed=G * (2 * WT * SZ * SY * SX * 4) + npad * 20,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*prefetch, jnp.asarray(data, jnp.float32), pt, pz, py, px)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# overflow correction (compacted gather) + public entry
# ---------------------------------------------------------------------------


def _axis_pairs(idx, bc, dim):
    """[(clipped_index, weight), ...] per-axis blend levels (reference XLinear)."""
    if dim == 1:
        return [(jnp.zeros_like(idx), None)]
    i0 = jnp.clip(idx, 0, dim - 1)
    i1 = jnp.clip(idx + 1, 0, dim - 1)
    return [(i0, 1.0 - bc), (i1, bc)]


def _gather16(data, gidx):
    """Plain multilinear gather for the selected lanes (overflow fix-up)."""
    T, Z, Y, X = data.shape
    flat = data.reshape(-1)
    val = None
    for ti, wt in _axis_pairs(*gidx["T"], T):
        for zi, wz in _axis_pairs(*gidx["Z"], Z):
            for yi, wy in _axis_pairs(*gidx["Y"], Y):
                for xi, wx in _axis_pairs(*gidx["X"], X):
                    lin = ((ti * Z + zi) * Y + yi) * X + xi
                    v = jnp.take(flat, lin, mode="clip")
                    for w in (wt, wz, wy, wx):
                        if w is not None:
                            v = v * w
                    val = v if val is None else val + v
    return val


def binned_linear_sample(data, gpos):
    """Multilinear sample of a (T, Z, Y, X) field via sorted-chunk slabs.

    Returns per-particle values in the input lane order. Values for lanes
    with out-of-bounds sentinel indices are arbitrary — the caller masks
    them (field.py `_mask_oob_values`), identical to the gather path.

    (A lockstep-time pre-blend — collapsing the two time levels into one
    plane when every lane shares (ti, tau) — was measured 2.2x SLOWER than
    sampling both levels in-kernel on v5e, so the kernel always takes the
    general path.)
    """
    data = jnp.asarray(data)
    shape4 = data.shape
    plan = _get_plan(shape4, gpos)
    n = gpos["X"]["index"].shape[0]

    vals = _run_kernel(data, plan)[:n]

    ov = plan["overflow"]
    # tiered capacity: the steady engine-sorted state has near-zero overflow
    # (sub-block z/bin transition tails only), so the common tier must be
    # cheap — a fixed n/8 gather would cost more than the kernel itself
    # (measured: 44 ms at n=2M)
    K_small = min(n, max(4096, n // _K_SMALL_DIV))
    K_big = min(n, max(4096, n // _K_BIG_DIV))

    # stream compaction via cumsum + binary search: the j-th overflow lane is
    # the first position where cumsum reaches j+1. jnp.nonzero(size=K) (full
    # sort) and an n-sized scatter were both measured as expensive as the
    # sampling kernel itself; searchsorted costs only K*log2(n) gathers.
    cum = jnp.cumsum(ov.astype(jnp.int32))
    count = cum[-1]

    def fixup_k(K):
        def fixup(vals):
            idx = jnp.searchsorted(cum, jnp.arange(1, K + 1, dtype=cum.dtype))
            idx = jnp.minimum(idx, n - 1).astype(jnp.int32)
            gidx = {
                ax: (
                    jnp.take(gpos[ax]["index"].astype(jnp.int32), idx),
                    jnp.take(gpos[ax]["bcoord"].astype(jnp.float32), idx),
                )
                for ax in "TZYX"
            }
            return vals.at[idx].set(_gather16(data, gidx))

        return fixup

    def full(vals):
        gidx = {
            ax: (gpos[ax]["index"].astype(jnp.int32), gpos[ax]["bcoord"].astype(jnp.float32))
            for ax in "TZYX"
        }
        return _gather16(data, gidx)

    def big_or_full(vals):
        return jax.lax.cond(count <= K_big, fixup_k(K_big), full, vals)

    return jax.lax.cond(count <= K_small, fixup_k(K_small), big_or_full, vals)
