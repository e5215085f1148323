"""Device-side (traced) index search.

TPU-native reimplementation of the reference search stack
(reference: src/parcels/_core/index_search.py). Everything here is pure
jax.numpy over whole particle batches with static shapes, so it traces into
a single XLA program:

- 1-D bracketing uses an O(1) uniform-grid index when the axis is uniformly
  spaced (detected at ingest) and ``jnp.searchsorted`` otherwise.
- Out-of-bounds is reported through the same sentinel codes as the
  reference (-1 right, -2 left, -3 search error) so the status-machine
  semantics carry over unchanged.
- Curvilinear 2-D search is a warm-started point-in-cell check plus a
  fixed-iteration vectorized cell walk (instead of the reference's
  pointer-chasing Morton CSR hash, which maps poorly to TPUs). A coarse
  regular lookup raster, built once on host, provides cold-start seeds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

GRID_SEARCH_ERROR = -3
LEFT_OUT_OF_BOUNDS = -2
RIGHT_OUT_OF_BOUNDS = -1


def search_1d(
    arr: jnp.ndarray,
    x: jnp.ndarray,
    uniform: tuple[float, float, float] | None = None,
    oob_bounds: tuple[float, float] | None = None,
):
    """Bracket positions ``x`` in strictly-increasing 1-D ``arr``.

    Returns ``(index, bcoord)`` where ``index`` is the left bracket (or an
    OOB sentinel) and ``bcoord`` the barycentric coordinate in [0, 1).
    ``uniform=(origin, step, last)`` enables the gather-free O(1) path.
    ``oob_bounds=(lo, hi)`` overrides the out-of-bounds limits — used by
    domain decomposition, where ``arr`` is the local halo-extended slab but
    OOB must be judged against the *global* domain edges.
    """
    n = arr.shape[0]
    if n < 2:
        zi = jnp.zeros(x.shape, dtype=jnp.int32)
        return zi, jnp.zeros(x.shape, dtype=x.dtype)

    if uniform is not None:
        # Gather-free O(1) bracket: index and bcoord both analytic. TPU
        # gathers are ~100x slower than elementwise, so this matters.
        origin, step, last = uniform
        inv = 1.0 / step
        s = (x - origin) * inv
        fidx = jnp.clip(jnp.floor(s), 0, n - 2)
        idx = fidx.astype(jnp.int32)
        bcoord = s - fidx
        lo, hi = (origin, last) if oob_bounds is None else oob_bounds
        idx = jnp.where(x < lo, LEFT_OUT_OF_BOUNDS, idx)
        idx = jnp.where(x > hi, RIGHT_OUT_OF_BOUNDS, idx)
        return idx, bcoord

    if n <= 128:
        # short non-uniform axis (e.g. 50 stretched depth levels): broadcast
        # compare/select passes on the VPU instead of per-lane scalar
        # gathers — jnp.searchsorted plus the arr[idx] reads dominated the
        # warm-started curvilinear search at config-5 scale
        ge = x[..., None] >= arr
        ins = jnp.sum(ge, axis=-1).astype(jnp.int32)
        idx = jnp.clip(ins - 1, 0, n - 2)
        j = jnp.arange(n, dtype=jnp.int32)
        onehot = (j == idx[..., None]).astype(arr.dtype)
        left = jnp.sum(onehot * arr, axis=-1)
        right = jnp.sum(onehot * jnp.roll(arr, -1), axis=-1)
    else:
        idx = jnp.clip(jnp.searchsorted(arr, x, side="right").astype(jnp.int32) - 1, 0, n - 2)
        left = jnp.take(arr, idx)
        right = jnp.take(arr, jnp.clip(idx + 1, 1, n - 1))
    bcoord = (x - left) / (right - left)

    lo, hi = (arr[0], arr[-1]) if oob_bounds is None else oob_bounds
    idx = jnp.where(x < lo, LEFT_OUT_OF_BOUNDS, idx)
    idx = jnp.where(x > hi, RIGHT_OUT_OF_BOUNDS, idx)
    return idx, bcoord


def search_time(time_flt: jnp.ndarray, t: jnp.ndarray, uniform: tuple[float, float, float] | None = None):
    """Bracket simulation times in the field's time axis (float seconds).

    Unlike the spatial axes, out-of-interval times are clamped to the first /
    last bracket (reference normalizes the same way) and reported via a
    separate boolean so the engine can flag ErrorOutsideTimeInterval.
    """
    n = time_flt.shape[0]
    if n < 2:
        zi = jnp.zeros(t.shape, dtype=jnp.int32)
        return zi, jnp.zeros(t.shape, dtype=t.dtype), jnp.zeros(t.shape, dtype=bool)
    oob = (t < time_flt[0]) | (t > time_flt[-1])
    idx, bc = search_1d(time_flt, t, uniform)
    idx = jnp.clip(idx, 0, n - 2)
    bc = jnp.clip(bc, 0.0, 1.0)
    return idx, bc, oob


# ---------------------------------------------------------------------------
# Curvilinear 2-D search
# ---------------------------------------------------------------------------


def _bilinear_inverse(px, py, xq, yq):
    """Solve the bilinear map for (xsi, eta) given quad corners (4, n) and queries (n,).

    Same construction as reference index_search.py:132-149, but with a
    numerically stable quadratic solve: the reference picks the
    ``(-b + sqrt(det))/(2a)`` root behind a fixed ``|a| < 1e-12`` degeneracy
    threshold, which is scale-dependent — for near-parallelogram cells with
    metre-scale coordinates, ``a`` is pure rounding noise above that
    threshold and the chosen root is wrong even in f64. Here the two roots
    come from the cancellation-free ``q`` formulation and the one inside (or
    nearest) [0, 1] is selected; the parallelogram limit falls out of the
    ``cc/q`` root continuously, with no threshold at all.
    """
    # invA @ corners gives the bilinear polynomial coefficients.
    a0 = px[0]
    a1 = -px[0] + px[1]
    a2 = -px[0] + px[3]
    a3 = px[0] - px[1] + px[2] - px[3]
    b0 = py[0]
    b1 = -py[0] + py[1]
    b2 = -py[0] + py[3]
    b3 = py[0] - py[1] + py[2] - py[3]

    aa = a3 * b2 - a2 * b3
    bb = a3 * b0 - a0 * b3 + a1 * b2 - a2 * b1 + xq * b3 - yq * a3
    cc = a1 * b0 - a0 * b1 + xq * b1 - yq * a1
    det2 = bb * bb - 4 * aa * cc
    det = jnp.sqrt(jnp.maximum(det2, 0.0))

    sign_bb = jnp.where(bb >= 0, 1.0, -1.0)
    q = -0.5 * (bb + sign_bb * det)
    r1 = q / jnp.where(aa == 0.0, 1.0, aa)          # large root (noise if aa ~ 0)
    r2 = cc / jnp.where(q == 0.0, 1.0, q)           # stable root; -cc/bb in the limit
    r1 = jnp.where(aa == 0.0, r2, r1)
    r2 = jnp.where(q == 0.0, 0.0, r2)

    def _dist01(r):
        return jnp.maximum(0.0, jnp.maximum(-r, r - 1.0))

    eta = jnp.where(_dist01(r2) <= _dist01(r1), r2, r1)
    eta = jnp.where(det2 < 0.0, -1.0, eta)  # no real intersection: not in cell

    denom = a1 + a3 * eta
    fallback = ((yq - py[0]) / jnp.where(py[1] == py[0], 1.0, py[1] - py[0]) +
                (yq - py[3]) / jnp.where(py[2] == py[3], 1.0, py[2] - py[3])) * 0.5
    degenerate = jnp.abs(denom) < 1e-12
    xsi = jnp.where(
        degenerate,
        fallback,
        (xq - a0 - a2 * eta) / jnp.where(degenerate, 1.0, denom),
    )
    return xsi, eta


def _latlon_to_xyz(lat_deg, lon_deg):
    lat = jnp.deg2rad(lat_deg)
    lon = jnp.deg2rad(lon_deg)
    cl = jnp.cos(lat)
    return jnp.cos(lon) * cl, jnp.sin(lon) * cl, jnp.sin(lat)


def _project_cell_and_query(clon, clat, x, y):
    """Project 4 cell corners (4, n) and the query onto the cell's tangent plane.

    Basis from edge-midpoint difference vectors, Gram-Schmidt orthonormalized
    (reference index_search.py:180-239); antimeridian- and pole-safe.
    """
    cX, cY, cZ = _latlon_to_xyz(clat, clon)
    qX, qY, qZ = _latlon_to_xyz(y, x)
    return _project_cell_and_query_xyz(cX, cY, cZ, qX, qY, qZ)


def _project_cell_and_query_xyz(cX, cY, cZ, qX, qY, qZ):
    """Tangent-plane projection from precomputed unit-sphere coordinates.

    Split out so the walk can gather corner XYZ from grid-wide precomputed
    arrays (one trig pass over the grid) instead of re-running
    cos/sin per corner per iteration per lane.
    """
    ux = (cX[1] + cX[2]) - (cX[0] + cX[3])
    uy = (cY[1] + cY[2]) - (cY[0] + cY[3])
    uz = (cZ[1] + cZ[2]) - (cZ[0] + cZ[3])
    un = jnp.sqrt(ux * ux + uy * uy + uz * uz)
    un = jnp.where(un == 0.0, 1.0, un)
    eux, euy, euz = ux / un, uy / un, uz / un

    vx = (cX[2] + cX[3]) - (cX[0] + cX[1])
    vy = (cY[2] + cY[3]) - (cY[0] + cY[1])
    vz = (cZ[2] + cZ[3]) - (cZ[0] + cZ[1])
    vd = vx * eux + vy * euy + vz * euz
    vx, vy, vz = vx - vd * eux, vy - vd * euy, vz - vd * euz
    vn = jnp.sqrt(vx * vx + vy * vy + vz * vz)
    vn = jnp.where(vn == 0.0, 1.0, vn)
    evx, evy, evz = vx / vn, vy / vn, vz / vn

    def proj(wx, wy, wz):
        return wx * eux + wy * euy + wz * euz, wx * evx + wy * evy + wz * evz

    pu, pv = proj(cX, cY, cZ)
    qu, qv = proj(qX, qY, qZ)
    return pu, pv, qu, qv


def _gather_cell_corners(lon2d, lat2d, yi, xi):
    """Gather the 4 corner coordinates of cells (yi, xi) -> two (4, n) arrays."""
    return _gather_corners_k((lon2d, lat2d), yi, xi)


def _gather_corners_k(arrays2d, yi, xi):
    """Gather 4 cell corners from each of k same-shaped 2-D arrays.

    Returns a tuple of k ``(4, n)`` arrays in corner order
    p0=(y,x), p1=(y,x+1), p2=(y+1,x+1), p3=(y+1,x).
    """
    ydim, xdim = arrays2d[0].shape
    yi0 = jnp.clip(yi, 0, ydim - 2)
    xi0 = jnp.clip(xi, 0, xdim - 2)
    flats = [a.reshape(-1) for a in arrays2d]
    idx = [(yi0 + dy) * xdim + (xi0 + dx) for dy, dx in ((0, 0), (0, 1), (1, 1), (1, 0))]
    return tuple(jnp.stack([f[i] for i in idx]) for f in flats)


# f32-aware acceptance margin: a point riding a cell edge can compute as
# fractionally outside BOTH neighbouring cells under fused f32 rounding
# (the reference's zero-tolerance check is safe only in f64); without the
# margin the walk oscillates between the two cells and errors out. The
# margin is in cell-fraction units; 2e-4 covers the observed f32 noise of
# the tangent-plane inverse at global coordinates (measured 2e-5 at
# lon~106 on a 1.8-degree cell) with an order of headroom. A point
# accepted up to 2e-4 outside simply gets a clamped-weight interpolation.
_PIC_TOL = 2e-4


def _tol_check(xsi, eta):
    return (
        (xsi >= -_PIC_TOL) & (xsi <= 1 + _PIC_TOL) & (eta >= -_PIC_TOL) & (eta <= 1 + _PIC_TOL)
    )


def curvilinear_point_in_cell(lon2d, lat2d, y, x, yi, xi, spherical: bool):
    """Bilinear-inverse point-in-cell for curvilinear cells.

    Returns (in_cell bool, xsi, eta). For spherical meshes the inverse runs
    in a tangent plane through the cell (reference index_search.py:94-119).
    """
    return _make_point_in_cell(lon2d, lat2d, y, x, spherical)(yi, xi)


# Per-cell search-geometry table: row layout (16 x f32), built host-side in
# f64 by build_pic_table. The per-lane point-in-cell then needs ONE coalesced
# 16-float row-gather instead of 12 scattered corner reads from 3 arrays —
# the same memoization that makes the C-grid velocity fast path
# (grid.cgrid_geometry), applied to the search itself. Columns:
#   0-2  p0 (cell origin) in the embedding frame (unit-sphere XYZ, or
#        (lon, lat, 0) for flat meshes)
#   3-5  eu  tangent-basis u axis
#   6-8  ev  tangent-basis v axis
#   9-14 (pu, pv) of corners 1..3 in the (eu, ev) frame (corner 0 is (0,0))
#   15   pad (keeps the row 16-aligned for clean vector loads)
PIC_TABLE_COLS = 16


def build_pic_table(lon2d, lat2d, spherical: bool):
    """Host-side (f64) per-cell tangent-frame table, (ny-1, nx-1, 16) f32."""
    import numpy as np

    lon = np.asarray(lon2d, dtype=np.float64)
    lat = np.asarray(lat2d, dtype=np.float64)
    if lon.ndim == 1:
        lon, lat = np.meshgrid(lon, lat)
    if spherical:
        latr, lonr = np.deg2rad(lat), np.deg2rad(lon)
        cl = np.cos(latr)
        gx, gy, gz = np.cos(lonr) * cl, np.sin(lonr) * cl, np.sin(latr)
    else:
        gx, gy, gz = lon, lat, np.zeros_like(lon)

    def corners(a):
        return np.stack([a[:-1, :-1], a[:-1, 1:], a[1:, 1:], a[1:, :-1]])

    cX, cY, cZ = corners(gx), corners(gy), corners(gz)
    ux = (cX[1] + cX[2]) - (cX[0] + cX[3])
    uy = (cY[1] + cY[2]) - (cY[0] + cY[3])
    uz = (cZ[1] + cZ[2]) - (cZ[0] + cZ[3])
    un = np.sqrt(ux * ux + uy * uy + uz * uz)
    un[un == 0.0] = 1.0
    eux, euy, euz = ux / un, uy / un, uz / un
    vx = (cX[2] + cX[3]) - (cX[0] + cX[1])
    vy = (cY[2] + cY[3]) - (cY[0] + cY[1])
    vz = (cZ[2] + cZ[3]) - (cZ[0] + cZ[1])
    vd = vx * eux + vy * euy + vz * euz
    vx, vy, vz = vx - vd * eux, vy - vd * euy, vz - vd * euz
    vn = np.sqrt(vx * vx + vy * vy + vz * vz)
    vn[vn == 0.0] = 1.0
    evx, evy, evz = vx / vn, vy / vn, vz / vn

    dX, dY, dZ = cX - cX[0], cY - cY[0], cZ - cZ[0]
    pu = dX * eux + dY * euy + dZ * euz  # (4, ny-1, nx-1); pu[0] == 0
    pv = dX * evx + dY * evy + dZ * evz

    ny1, nx1 = gx.shape[0] - 1, gx.shape[1] - 1
    tbl = np.zeros((ny1, nx1, PIC_TABLE_COLS), dtype=np.float32)
    tbl[..., 0], tbl[..., 1], tbl[..., 2] = cX[0], cY[0], cZ[0]
    tbl[..., 3], tbl[..., 4], tbl[..., 5] = eux, euy, euz
    tbl[..., 6], tbl[..., 7], tbl[..., 8] = evx, evy, evz
    for k in range(1, 4):
        tbl[..., 9 + 2 * (k - 1)] = pu[k]
        tbl[..., 10 + 2 * (k - 1)] = pv[k]
    return tbl


def query_xyz(y, x, spherical: bool):
    """Embedding-frame query coordinates (computed once per batch: the trig
    is hoisted out of walk iterations and stage-cache hit checks)."""
    if spherical:
        return _latlon_to_xyz(y, x)
    return x, y, jnp.zeros_like(x)


def pic_from_rows(row, q):
    """Point-in-cell check against pre-gathered pic-table rows (n, 16).

    ``q`` is ``query_xyz(y, x, spherical)``. Returns (in_cell, xsi, eta).
    Used by the walk (rows gathered per iteration) and by the C-grid stage
    cache (rows cached across RK stages, ops/stagecache.py — zero gathers
    on the hit path).
    """
    qX, qY, qZ = q
    dx = qX - row[:, 0]
    dy = qY - row[:, 1]
    dz = qZ - row[:, 2]
    qu = dx * row[:, 3] + dy * row[:, 4] + dz * row[:, 5]
    qv = dx * row[:, 6] + dy * row[:, 7] + dz * row[:, 8]
    pu = jnp.stack([jnp.zeros_like(qu), row[:, 9], row[:, 11], row[:, 13]])
    pv = jnp.stack([jnp.zeros_like(qv), row[:, 10], row[:, 12], row[:, 14]])
    xsi, eta = _bilinear_inverse(pu, pv, qu, qv)
    return _tol_check(xsi, eta), xsi, eta


def _make_point_in_cell_table(table_flat, ncols_x, y, x, spherical: bool):
    """Table-backed pic closure: one row-gather per lane per invocation.

    ``table_flat`` is the (cells, 16) flattened table; ``ncols_x`` the
    number of cells per row (xdim - 1).
    """
    q = query_xyz(y, x, spherical)

    def pic(yi, xi):
        row = table_flat[yi * ncols_x + xi]  # (n, 16)
        return pic_from_rows(row, q)

    return pic


def _make_point_in_cell(lon2d, lat2d, y, x, spherical: bool):
    """Build a ``pic(yi, xi) -> (in_cell, xsi, eta)`` closure for fixed
    queries.

    Hot-loop optimization: for spherical meshes the per-lane query XYZ and
    the grid-wide node XYZ are computed ONCE here; each invocation then only
    gathers 12 floats per lane and runs the projection arithmetic — no
    trigonometry inside the walk.
    """
    if spherical:
        gX, gY, gZ = _latlon_to_xyz(lat2d, lon2d)
        qX, qY, qZ = _latlon_to_xyz(y, x)

        def pic(yi, xi):
            cX, cY, cZ = _gather_corners_k((gX, gY, gZ), yi, xi)
            pu, pv, qu, qv = _project_cell_and_query_xyz(cX, cY, cZ, qX, qY, qZ)
            xsi, eta = _bilinear_inverse(pu - pu[0], pv - pv[0], qu - pu[0], qv - pv[0])
            return _tol_check(xsi, eta), xsi, eta

    else:

        def pic(yi, xi):
            # invert in cell-local coordinates: at global coords ~1e5 m the
            # quadratic-formula terms cancel catastrophically in f32
            clon, clat = _gather_cell_corners(lon2d, lat2d, yi, xi)
            xsi, eta = _bilinear_inverse(
                clon - clon[0], clat - clat[0], x - clon[0], y - clat[0]
            )
            return _tol_check(xsi, eta), xsi, eta

    return pic


def curvilinear_search(
    lon2d,
    lat2d,
    y,
    x,
    yi_guess,
    xi_guess,
    *,
    spherical: bool,
    lookup: dict | None = None,
    n_walk: int = 12,
    pic_table=None,
):
    """Locate particles in a 2-D curvilinear grid; fully vectorized, static shapes.

    Strategy (TPU-friendly replacement for reference warm-start + Morton CSR
    hash, index_search.py:242-295 / spatialhash.py):

    1. point-in-cell at the warm-start guess;
    2. misses re-seeded from a coarse regular lon/lat raster (host-built);
    3. a fixed number of directed cell-walk iterations: each miss moves its
       cell index by the (rounded, clamped) bilinear-inverse overshoot.

    Returns (yi, eta, xi, xsi) with yi/xi = GRID_SEARCH_ERROR where the walk
    failed, and -1 where the point is outside the grid's bounding raster.
    """
    ydim, xdim = lon2d.shape
    yi = jnp.clip(yi_guess, 0, ydim - 2)
    xi = jnp.clip(xi_guess, 0, xdim - 2)

    if pic_table is not None:
        ncells_x = xdim - 1
        # width-agnostic: callers may pass the (cells, >=16) fused row table
        # (ops/stagecache.cell_table) whose first 16 cols are the pic row —
        # wider rows gather at the row-major 1-granule rate
        cols = pic_table.shape[-1]
        pic = _make_point_in_cell_table(pic_table.reshape(-1, cols), ncells_x, y, x, spherical)
    else:
        pic = _make_point_in_cell(lon2d, lat2d, y, x, spherical)
    in_cell, xsi, eta = pic(yi, xi)

    if lookup is not None:
        # Re-seed misses from the coarse raster — under a batch-wide cond:
        # in the warm-started steady state every lane passes the first
        # point-in-cell check, and the unconditional 2-D seed-table reads
        # were 2 scalar gathers/lane of pure waste (measured ~40% of warm
        # search time at config-5 scale).
        ly0, lx0 = lookup["origin"]
        lys, lxs = lookup["step"]
        tbl_y = lookup["yi"]  # (ny, nx) int32 seeds
        tbl_x = lookup["xi"]
        ny, nx = tbl_y.shape

        def reseed(args):
            yi, xi = args
            ry = jnp.clip(jnp.floor((y - ly0) / lys).astype(jnp.int32), 0, ny - 1)
            rx = jnp.clip(jnp.floor((x - lx0) / lxs).astype(jnp.int32), 0, nx - 1)
            seed_y = tbl_y[ry, rx]
            seed_x = tbl_x[ry, rx]
            yi = jnp.where(in_cell, yi, jnp.clip(seed_y, 0, ydim - 2))
            xi = jnp.where(in_cell, xi, jnp.clip(seed_x, 0, xdim - 2))
            return yi, xi

        yi, xi = jax.lax.cond(
            jnp.all(in_cell), lambda args: args, reseed, (yi, xi)
        )
        outside = (
            (y < ly0)
            | (y > ly0 + lys * ny)
            | ((x < lx0) | (x > lx0 + lxs * nx))
            if not spherical
            else jnp.zeros(y.shape, dtype=bool)
        )
    else:
        outside = jnp.zeros(y.shape, dtype=bool)

    def _outside_dist(xsi_n, eta_n):
        """How far outside [0,1]^2 the local coords are, in cell fractions."""
        dx = jnp.maximum(0.0, jnp.maximum(-xsi_n, xsi_n - 1.0))
        dy = jnp.maximum(0.0, jnp.maximum(-eta_n, eta_n - 1.0))
        return jnp.maximum(dx, dy)

    def walk_body(_, carry):
        yi, xi, in_cell, xsi, eta, best = carry
        ok, xsi_n, eta_n = pic(yi, xi)
        # Track the best (least-outside) cell seen: if the walk oscillates on
        # an edge where f32 rounding rejects BOTH neighbours, the nearest
        # candidate is recovered after the loop instead of erroring the lane.
        d_n = _outside_dist(xsi_n, eta_n)
        better = d_n < best[0]
        best = (
            jnp.where(better, d_n, best[0]),
            jnp.where(better, yi, best[1]),
            jnp.where(better, xi, best[2]),
            jnp.where(better, xsi_n, best[3]),
            jnp.where(better, eta_n, best[4]),
        )
        # Directed move: overshoot in (xsi, eta) tells which neighbor to try.
        dx = jnp.clip(jnp.floor(xsi_n).astype(jnp.int32), -2, 2)
        dy = jnp.clip(jnp.floor(eta_n).astype(jnp.int32), -2, 2)
        # floor gives 0 inside [0,1), 1 just above 1, -1 below 0.
        move = ~ok
        yi_new = jnp.clip(yi + jnp.where(move, dy, 0), 0, ydim - 2)
        xi_new = jnp.clip(xi + jnp.where(move, dx, 0), 0, xdim - 2)
        # Keep best-known coords.
        xsi = jnp.where(ok & ~in_cell, xsi_n, xsi)
        eta = jnp.where(ok & ~in_cell, eta_n, eta)
        return yi_new, xi_new, in_cell | ok, xsi, eta, best

    # Found lanes keep their converged (yi, xi) because move=0 for them after
    # the first re-check; to avoid drift, freeze found lanes explicitly.
    # Hopeless lanes (outside the raster, non-finite positions, or stalled
    # against a clamped grid edge) are excluded from the loop condition:
    # one permanently-unfindable lane must not drag the whole batch through
    # all n_walk iterations (the early exit IS the optimization).
    def walk_body_frozen(i, carry):
        yi, xi, found, xsi, eta, best, hopeless = carry
        yi2, xi2, found2, xsi2, eta2, best2 = walk_body(i, (yi, xi, found, xsi, eta, best))
        # a not-found lane whose attempted move was fully clamped can never
        # make progress (its target cell is beyond the grid edge)
        stalled = ~found2 & ~found & (yi2 == yi) & (xi2 == xi)
        yi = jnp.where(found, yi, yi2)
        xi = jnp.where(found, xi, xi2)
        return yi, xi, found2, xsi2, eta2, best2, hopeless | stalled

    # derive the carry from varying inputs (full_like/zeros_like) so the
    # loop carry has consistent varying-manual-axes under shard_map
    best0 = (
        jnp.full_like(jnp.asarray(y, jnp.float32), jnp.inf),
        jnp.zeros_like(yi),
        jnp.zeros_like(xi),
        jnp.zeros_like(jnp.asarray(y, jnp.float32)),
        jnp.zeros_like(jnp.asarray(y, jnp.float32)),
    )
    hopeless0 = outside | ~(jnp.isfinite(jnp.asarray(y)) & jnp.isfinite(jnp.asarray(x)))

    # Early-exit while_loop: with the engine's per-stage ei warm start the
    # overwhelmingly common case is "every lane already in its cell", making
    # the walk ZERO iterations (one cheap all-reduce decides). The previous
    # fixed-trip fori_loop re-gathered corners 12x per sample regardless and
    # dominated curvilinear step time at config-5 scale.
    def walk_cond(carry):
        i, state = carry
        found, hopeless = state[2], state[6]
        return (i < n_walk) & jnp.any(~found & ~hopeless)

    def walk_step(carry):
        i, state = carry
        return i + 1, walk_body_frozen(i, state)

    _, (yi, xi, found, xsi, eta, best, _) = jax.lax.while_loop(
        walk_cond, walk_step, (jnp.int32(0), (yi, xi, in_cell, xsi, eta, best0, hopeless0))
    )

    # Rescue oscillating edge lanes: accept the nearest candidate when it is
    # within 1% of a cell of the boundary (true misses are >> 1 cell away).
    # Raster-outside lanes are NOT rescue-eligible: they must surface as
    # out-of-bounds, not as a near-boundary interpolation.
    rescue = ~outside & ~found & (best[0] < 0.01)
    yi = jnp.where(rescue, best[1], yi)
    xi = jnp.where(rescue, best[2], xi)
    xsi = jnp.where(rescue, best[3], xsi)
    eta = jnp.where(rescue, best[4], eta)
    found = found | rescue

    yi = jnp.where(found, yi, GRID_SEARCH_ERROR)
    xi = jnp.where(found, xi, GRID_SEARCH_ERROR)
    yi = jnp.where(outside & ~found, RIGHT_OUT_OF_BOUNDS, yi)
    xi = jnp.where(outside & ~found, RIGHT_OUT_OF_BOUNDS, xi)
    return yi, eta, xi, xsi
