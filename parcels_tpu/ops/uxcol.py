"""Unstructured (UGRID) row-gather perf tier: fused face rows + node columns.

The round-3 verdict's item 5: the ux sampling path (interpolators/uxinterp.py)
was plain per-element XLA gathers — the same primitive that measured
4.8 M samples/s on structured config-5 fields — and the triangle walk
(_core/uxgrid.ux_search) gathered conn + 3 node-coordinate arrays per
check. This module applies the two structured-grid lessons
(ops/colgather.py, ops/stagecache.py) to triangular meshes:

1. **Fused per-face geometry rows** (``build_face_table``): one
   (n_face, 64) f32 table holding the 3 corner-node embedding coordinates,
   the 3 node ids and the 3 edge-adjacent face ids (ids bitcast i32<->f32).
   A barycentric point-in-face check (and a walk hop) is then ONE
   64-wide row-take — row-major, 1-2 HBM granules — plus VPU arithmetic,
   instead of 4+ scattered small gathers. Width 64 matters: narrower f32
   tables get a column-major XLA layout whose "row" take is C scattered
   4-byte reads (measured 5x slower, scripts/micro_rowio2.py).

2. **Corner-column data tables** (``ux_col_table``): the (T, Z, N) field
   transposed to (N, >=64) so one (t, z)-blended sample per face/node is
   one row-take + a hat-weight VPU reduce over the row — 1 take for
   face-registered data, 3 for node-registered (barycentric), vs
   2/6 scalar gathers (x2 for zf-linear vertical) on the gather path.

Reference semantics preserved exactly: the barycentric math mirrors
reference index_search.py:393-436 (spherical projection :345-352) and the
vertical blends mirror _uxinterpolators.py:18-110; parity is pinned by
tests/test_ux.py which runs every interpolator in both modes.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "ROW_WIDTH",
    "adj_from_rows",
    "bary_from_rows",
    "bary_from_verts",
    "build_face_table",
    "enabled",
    "face_rows",
    "nids_from_rows",
    "node_ids",
    "sample_col",
    "ux_col_table",
    "verts_from_rows",
    "weight_row",
]

#: fused face-row width; >= 64 keeps the table row-major (see module doc)
ROW_WIDTH = 64
# column layout
_V0, _V1, _V2 = 0, 3, 6  # corner embedding coords (x, y, z; z = 0 flat)
_NID = 9  # 3 node ids, bitcast i32
_ADJ = 12  # 3 edge-adjacent face ids, bitcast i32 (-1 = boundary)

#: minimum faces for the fused tier to pay for its memory (256 B/face)
MIN_FACES = int(os.environ.get("PARCELS_TPU_UXCOL_MINFACES", 1 << 12))
#: node/face column-table width cap (same economics as colgather MAX_COLS)
MAX_COLS = int(os.environ.get("PARCELS_TPU_UXCOL_MAXCOLS", 512))


def _mode() -> str:
    return os.environ.get("PARCELS_TPU_UXCOL", "auto")


def enabled(n_face: int) -> bool:
    """Trace-time gate for the fused ux tier."""
    mode = _mode()
    if mode in ("0", "off"):
        return False
    if mode == "force":
        return True
    return n_face >= MIN_FACES and jax.default_backend() not in ("cpu",)


def col_usable(shape3) -> bool:
    T, Z, N = shape3
    return T * Z <= MAX_COLS


# ---------------------------------------------------------------------------
# host-side table build
# ---------------------------------------------------------------------------


def build_face_table(nodes: np.ndarray, conn: np.ndarray, adj: np.ndarray) -> np.ndarray:
    """(n_face, 64) fused geometry rows from host mesh arrays.

    ``nodes`` is (n_node, 2|3) embedding coordinates (unit-sphere XYZ for
    spherical meshes, (x, y) flat); ``conn``/(n_face, 3) node ids;
    ``adj``/(n_face, 3) edge-adjacent faces (-1 boundary).
    """
    nodes = np.asarray(nodes, dtype=np.float32)
    conn = np.asarray(conn, dtype=np.int32)
    adj = np.asarray(adj, dtype=np.int32)
    nf = conn.shape[0]
    d = nodes.shape[1]
    tbl = np.zeros((nf, ROW_WIDTH), dtype=np.float32)
    for k, off in enumerate((_V0, _V1, _V2)):
        tbl[:, off : off + d] = nodes[conn[:, k]]
    tbl[:, _NID : _NID + 3] = conn.view(np.float32)
    tbl[:, _ADJ : _ADJ + 3] = adj.view(np.float32)
    return tbl


# ---------------------------------------------------------------------------
# device-side row ops
# ---------------------------------------------------------------------------


def face_rows(table, fi):
    """Row-take of the fused face table at (clipped) face indices."""
    nf = table.shape[0]
    return jnp.take(table, jnp.clip(fi, 0, nf - 1), axis=0)


def nids_from_rows(row):
    """(n, 3) i32 node ids recovered from the fused row."""
    return jax.lax.bitcast_convert_type(row[:, _NID : _NID + 3], jnp.int32)


def adj_from_rows(row, k):
    """Per-lane adjacent face across edge ``k`` (n,) from the fused row.

    Arithmetic select, NOT take_along_axis: XLA lowers the (n, 3) aligned
    gather to per-element scattered reads (measured 5 GB/s, 18% of the ux
    step — r5 device trace); three lane-wise selects are pure VPU."""
    a = jax.lax.bitcast_convert_type(row[:, _ADJ : _ADJ + 3], jnp.int32)
    return jnp.where(k == 0, a[:, 0], jnp.where(k == 1, a[:, 1], a[:, 2]))


def verts_from_rows(row, spherical: bool):
    """(n, 3*d) corner coordinates extracted from fused rows (d = 2 flat,
    3 spherical) — the compact per-lane triangle frame the ux stage cache
    carries across RK stages (ops/uxcache.py)."""
    d = 3 if spherical else 2
    return jnp.concatenate(
        [row[:, _V0 : _V0 + d], row[:, _V1 : _V1 + d], row[:, _V2 : _V2 + d]], axis=1
    )


def bary_from_verts(verts, pts, spherical: bool):
    """Barycentric coords of ``pts`` against packed (n, 3*d) corners."""
    d = 3 if spherical else 2
    v0 = verts[:, 0:d]
    v1 = verts[:, d : 2 * d]
    v2 = verts[:, 2 * d : 3 * d]
    if spherical:
        r1 = v1 - v0
        r2 = v2 - v0
        nhat = jnp.cross(r1, r2)
        norm = jnp.linalg.norm(nhat, axis=-1, keepdims=True)
        nhat = nhat / jnp.where(norm == 0.0, 1.0, norm)
        ptilde = pts - v0
        p = ptilde - jnp.sum(ptilde * nhat, axis=-1, keepdims=True) * nhat + v0

        def area(a, b, c):
            return 0.5 * jnp.linalg.norm(jnp.cross(b - a, c - a), axis=-1)
    else:
        p = pts

        def area(a, b, c):
            d1 = b - a
            d2 = c - a
            return 0.5 * (d1[..., 0] * d2[..., 1] - d1[..., 1] * d2[..., 0])

    a = area(v0, v1, v2)
    a = jnp.where(jnp.abs(a) < 1e-30, 1e-30, a)
    b0 = area(p, v1, v2) / a
    b1 = area(p, v2, v0) / a
    b2 = area(p, v0, v1) / a
    return jnp.stack([b0, b1, b2], axis=-1)


def bary_from_rows(row, pts, spherical: bool):
    """Barycentric coords of ``pts`` in the row's triangle -> (n, 3).

    Mirror of uxgrid._bary_coords (reference index_search.py:393-436)
    evaluated against pre-gathered corner coordinates.
    """
    return bary_from_verts(verts_from_rows(row, spherical), pts, spherical)


# ---------------------------------------------------------------------------
# corner-column data tables
# ---------------------------------------------------------------------------


def ux_col_table(field):
    """Cached (N, max(T*Z, 64)) column table for a (T, Z, N) ux field."""
    tbl = field._col_table
    if tbl is None:
        T, Z, N = field.data.shape
        tbl = jnp.moveaxis(field.data.reshape(T * Z, N), 0, -1)
        if T * Z < ROW_WIDTH:  # keep the table row-major (module doc)
            tbl = jnp.pad(tbl, ((0, 0), (0, ROW_WIDTH - T * Z)))
        # pin the materialization: fused into the gathers the row reads
        # degrade back to scattered original-layout element reads
        tbl = jax.lax.optimization_barrier(tbl)
        field._col_table = tbl
    return tbl


def ux_colT_table(field):
    """Cached (N*T, max(Z, 64)) per-(node, time) z-row table.

    Row ``node*T + t`` holds the full depth column of one node at one time
    level, zero-padded to 64 so the layout stays row-major (one 256 B
    granule per take at Z <= 64). The time bracket is resolved by the TAKE
    INDEX instead of a (n, T*Z) one-hot mask, which removes the dominant
    materialized intermediate of the corner extraction (r5 device trace:
    the 4-mask reduces over (n, 96) rows were ~60% of the ux repair
    traffic). Used by the per-face stage cache (ops/uxcache.py)."""
    tbl = getattr(field, "_colT_table", None)
    if tbl is None:
        T, Z, N = field.data.shape
        P = max(Z, ROW_WIDTH)
        tbl = jnp.transpose(field.data, (2, 0, 1)).reshape(N * T, Z)
        if Z < P:
            tbl = jnp.pad(tbl, ((0, 0), (0, P - Z)))
        tbl = jax.lax.optimization_barrier(tbl)
        field._colT_table = tbl
    return tbl


def ux_colT_uv_table(vf):
    """(N*T, 2*pad64(Z)) fused [U | V] per-(node, time) z-row table.

    U and V share nodes and placement, so one row-take serves both
    components' corner extraction — 6 takes of 512 B per repair instead
    of 12 of 256 B (half the gather issue count at identical bytes).
    Cached on the vector view for the chunk trace.
    """
    tbl = getattr(vf, "_uv_colT", None)
    if tbl is None:
        T, Z, N = vf.U.data.shape
        P = max(Z, ROW_WIDTH)

        def half(data):
            h = jnp.transpose(data, (2, 0, 1)).reshape(N * T, Z)
            if Z < P:
                h = jnp.pad(h, ((0, 0), (0, P - Z)))
            return h

        tbl = jnp.concatenate([half(vf.U.data), half(vf.V.data)], axis=1)
        tbl = jax.lax.optimization_barrier(tbl)
        vf._uv_colT = tbl
    return tbl


def weight_row(T, Z, width, ti, tau, zw):
    """(n, width) per-lane (t, z) blend weights over the flattened row.

    ``zw`` is a list of (zi, w) vertical taps (w may be None for weight 1);
    time blends as a hat around ``ti + tau`` (2-level linear) or pins to
    ``ti`` when T == 1.
    """
    j = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
    tj = (j // Z).astype(jnp.float32)
    zj = j % Z
    if T == 1:
        wt = (tj == 0.0).astype(jnp.float32)
    else:
        pt = jnp.clip(ti, 0, T - 2).astype(jnp.float32) + tau.astype(jnp.float32)
        wt = jnp.maximum(0.0, 1.0 - jnp.abs(tj - pt[:, None]))
    wz = None
    for zi, w in zw:
        ind = (zj == zi[:, None]).astype(jnp.float32)
        if w is not None:
            ind = ind * w[:, None]
        wz = ind if wz is None else wz + ind
    return wt * wz


def sample_col(table, rows_idx, wrow, lat_w=None):
    """One blended sample = row-take(s) + VPU reduce.

    ``rows_idx`` is a list of per-lane row indices (1 for face data, 3 for
    node data); ``lat_w`` the matching lateral weights (None = weight 1).
    """
    val = None
    for k, idx in enumerate(rows_idx):
        rows = jnp.take(table, idx, axis=0)
        v = jnp.sum(rows * wrow, axis=1)
        if lat_w is not None:
            v = v * lat_w[k]
        val = v if val is None else val + v
    return val


def node_ids(field, gpos):
    """(n, 3) node ids for the lanes' faces: one fused-row take when the
    grid ships a face table, else the conn gather."""
    garrs = field.grid.garrs
    fi = jnp.clip(gpos["FACE"]["index"], 0, field.grid.spec.n_face - 1)
    if "face_table" in garrs and enabled(field.grid.spec.n_face):
        return nids_from_rows(face_rows(garrs["face_table"], fi))
    return garrs["conn"][fi]
