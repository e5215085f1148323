"""Unstructured triangular (UGRID) grid: host descriptor + traced search.

TPU-native redesign of reference src/parcels/_core/uxgrid.py (+ the
point-in-triangle machinery of index_search.py:298-436 and the Morton CSR
SpatialHash of spatialhash.py). Differences by design:

- No uxarray dependency: the grid is parsed directly from UGRID-convention
  variables (``node_lon``, ``node_lat``, ``face_node_connectivity``, 1-D
  ``zf`` interface depths) on an xrlite/xarray dataset.
- Search is fully traced with static shapes: warm-start barycentric check on
  the cached face, then (only when some lane missed — a ``lax.cond`` whole-
  batch short-circuit) a 3x3 raster-neighborhood candidate scan from a
  host-precomputed coarse lookup raster. This replaces the CSR Morton hash,
  whose pointer-chasing query maps poorly onto the TPU's vector unit.
- Spherical meshes project queries and triangles onto the unit sphere and
  use 3-D triangle areas, exactly like the reference (index_search.py:
  322-352), so antimeridian/pole cells work without special-casing.
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import numpy as np

import jax
import jax.numpy as jnp

from parcels_tpu._core import index_search
from parcels_tpu._core.basegrid import BaseGrid
from parcels_tpu._core.mesh import BaseMesh, get_mesh
from parcels_tpu._core.timeutils import datetimes_to_float_seconds
from parcels_tpu._core.grid import _make_time_interval, _uniform_spacing

__all__ = ["UxGrid", "UxGridSpec", "ux_search"]

# f32-aware acceptance margin (the reference's 1e-6 assumes f64 barycentric
# arithmetic; under fused f32 an edge-riding point can fall fractionally
# outside BOTH adjacent triangles and the walk would oscillate)
_BC_TOL = 1e-5


@dataclasses.dataclass(frozen=True)
class UxGridSpec:
    """Static, hashable description of a triangular mesh (baked into jit)."""

    n_face: int
    n_node: int
    nz: int  # number of zf interface levels
    spherical: bool
    deg2m: float
    depth_uniform: tuple[float, float, float] | None
    time_uniform: tuple[float, float, float] | None
    lookup_shape: tuple[int, int]  # raster (ny, nx)
    lookup_origin: tuple[float, float]
    lookup_step: tuple[float, float]


class UxGrid(BaseGrid):
    """Host-side triangular UGRID mesh with 1-D interface depths.

    Parameters
    ----------
    node_lon, node_lat : (n_node,) float arrays
    face_node_connectivity : (n_face, 3) int array
    z : (nz,) vertical interface depths (reference uxgrid.py:22-47: constant
        in time/space — flat-bottom, non-ALE)
    mesh : "flat" | "spherical"
    time : optional datetime64 array for the time axis
    """

    def __init__(
        self,
        node_lon: np.ndarray,
        node_lat: np.ndarray,
        face_node_connectivity: np.ndarray,
        z: np.ndarray,
        mesh: Literal["flat", "spherical"] | BaseMesh = "flat",
        time: np.ndarray | None = None,
    ):
        self.node_lon = np.asarray(node_lon, dtype=np.float64)
        self.node_lat = np.asarray(node_lat, dtype=np.float64)
        conn = np.asarray(face_node_connectivity)
        if conn.ndim != 2 or conn.shape[1] != 3:
            raise ValueError(
                "face_node_connectivity must be (n_face, 3): only triangular "
                "meshes are supported (reference uxgrid.py:38-39)."
            )
        self.face_node_connectivity = conn.astype(np.int32)
        self.depth = np.asarray(z, dtype=np.float64)
        if self.depth.ndim != 1:
            raise ValueError("z must be a 1D array of vertical interface coordinates")
        self._mesh = get_mesh(mesh)

        self._datetimes = np.asarray(time) if time is not None else None
        if self._datetimes is not None and len(self._datetimes) > 0:
            self.time_interval = _make_time_interval(self._datetimes)
            self.time = datetimes_to_float_seconds(self._datetimes, self.time_interval.left)
        else:
            self.time_interval = None
            self.time = np.zeros(1, dtype=np.float64)

        self._lookup = _build_face_lookup(
            self.node_lon, self.node_lat, self.face_node_connectivity
        )
        self._adjacency = _build_face_adjacency(self.face_node_connectivity)
        self._face_table = None  # lazy (ops/uxcol.py fused geometry rows)
        self.axes = ["Z", "FACE"]

        self.spec = UxGridSpec(
            n_face=int(conn.shape[0]),
            n_node=int(self.node_lon.shape[0]),
            nz=int(self.depth.shape[0]),
            spherical=self._mesh.is_spherical(),
            deg2m=self.deg2m,
            depth_uniform=_uniform_spacing(self.depth),
            time_uniform=_uniform_spacing(self.time),
            lookup_shape=self._lookup["fi"].shape,
            lookup_origin=self._lookup["origin"],
            lookup_step=self._lookup["step"],
        )

    # -- reference-parity host API -------------------------------------------
    @property
    def mesh(self) -> BaseMesh:
        return self._mesh

    @property
    def deg2m(self) -> float:
        return self._mesh.deg2m if self._mesh.is_spherical() else 1.0

    @property
    def n_face(self) -> int:
        return self.spec.n_face

    def get_axis_dim(self, axis: str) -> int:
        if axis == "Z":
            return self.spec.nz
        if axis == "FACE":
            return self.spec.n_face
        raise ValueError(f"Axis {axis!r} is not part of this grid. Available axes: {self.axes}")

    def ravel_index(self, zi, yi, xi):
        # ei caches the face index; z is re-bracketed each eval (cheap 1-D)
        return xi

    def unravel_index(self, ei):
        return np.zeros_like(ei), np.zeros_like(ei), ei

    def device_arrays(self, dtype=np.float32) -> dict:
        if self._mesh.is_spherical():
            lat = np.deg2rad(self.node_lat)
            lon = np.deg2rad(self.node_lon)
            nodes = np.stack(
                [np.cos(lon) * np.cos(lat), np.sin(lon) * np.cos(lat), np.sin(lat)], axis=-1
            )
        else:
            nodes = np.stack([self.node_lon, self.node_lat], axis=-1)
        out = {
            "nodes": jnp.asarray(nodes.astype(dtype)),
            "node_lon": jnp.asarray(self.node_lon.astype(dtype)),
            "node_lat": jnp.asarray(self.node_lat.astype(dtype)),
            "conn": jnp.asarray(self.face_node_connectivity),
            "depth": jnp.asarray(self.depth.astype(dtype)),
            "time": jnp.asarray(self.time.astype(np.float32)),
            "lookup_fi": jnp.asarray(self._lookup["fi"]),
            "adj": jnp.asarray(self._adjacency),
        }
        from parcels_tpu.ops import uxcol

        if uxcol.enabled(self.spec.n_face):
            if self._face_table is None:
                self._face_table = uxcol.build_face_table(
                    nodes.astype(np.float32), self.face_node_connectivity, self._adjacency
                )
            out["face_table"] = jnp.asarray(self._face_table)
        return out

    def lookup_meta(self) -> dict:
        return {"origin": self._lookup["origin"], "step": self._lookup["step"]}

    def make_view(self, garrs: dict) -> "UxGridView":
        return UxGridView(self.spec, garrs, self.lookup_meta())

    def _search_device(self, garrs: dict, z, y, x, ei):
        return ux_search(self.spec, garrs, z, y, x, ei=ei, lookup_meta=self.lookup_meta())

    def __eq__(self, other):
        return self is other

    def __hash__(self):
        return id(self)

    def __repr__(self):
        mesh = "spherical" if self.spec.spherical else "flat"
        return (
            f"UxGrid({mesh}, n_face={self.spec.n_face}, n_node={self.spec.n_node}, "
            f"nz={self.spec.nz}, lookup={self.spec.lookup_shape})"
        )

    def describe(self, buf=None) -> None:
        import sys

        buf = buf or sys.stdout
        fi = self._lookup["fi"]
        buf.write(
            f"{self!r}\n  lookup raster: {fi.shape[0]}x{fi.shape[1]} cells, "
            f"{(fi >= 0).mean() * 100:.1f}% seeded\n"
            f"  boundary edges: {(self._adjacency < 0).sum()}\n"
        )


def _build_face_lookup(node_lon, node_lat, conn, cells_per_tri: float = 2.0, max_dim: int = 1024):
    """Coarse raster (lat, lon) -> covering/nearest face index, built on host.

    Every raster cell stores the face containing its center (exact
    point-in-triangle rasterization), or the nearest face centroid for cells
    outside the mesh. Resolution targets ~``cells_per_tri`` raster cells per
    triangle edge so that a query point's face is always in the 3x3 raster
    neighborhood of its cell.
    """
    n_face = conn.shape[0]
    tx = node_lon[conn]  # (n_face, 3)
    ty = node_lat[conn]
    lon_min, lon_max = float(node_lon.min()), float(node_lon.max())
    lat_min, lat_max = float(node_lat.min()), float(node_lat.max())
    pad_x = max((lon_max - lon_min) * 1e-6, 1e-12)
    pad_y = max((lat_max - lat_min) * 1e-6, 1e-12)
    lon_min -= pad_x
    lon_max += pad_x
    lat_min -= pad_y
    lat_max += pad_y

    # raster resolution from the median triangle bbox size
    dx_tri = np.median(tx.max(axis=1) - tx.min(axis=1))
    dy_tri = np.median(ty.max(axis=1) - ty.min(axis=1))
    nx = int(np.clip((lon_max - lon_min) / max(dx_tri / cells_per_tri, 1e-12), 8, max_dim))
    ny = int(np.clip((lat_max - lat_min) / max(dy_tri / cells_per_tri, 1e-12), 8, max_dim))
    step_x = (lon_max - lon_min) / nx
    step_y = (lat_max - lat_min) / ny

    from parcels_tpu import native

    tbl = native.rasterize_faces(
        node_lon, node_lat, conn, lat_min, lon_min, step_y, step_x, ny, nx
    )
    if tbl is None:  # pure-Python fallback (no g++ in the environment)
        tbl = np.full((ny, nx), -1, dtype=np.int32)
        cx = (np.arange(nx) + 0.5) * step_x + lon_min
        cy = (np.arange(ny) + 0.5) * step_y + lat_min
        for f in range(n_face):
            x0 = int(np.clip((tx[f].min() - lon_min) / step_x, 0, nx - 1))
            x1 = int(np.clip((tx[f].max() - lon_min) / step_x, 0, nx - 1)) + 1
            y0 = int(np.clip((ty[f].min() - lat_min) / step_y, 0, ny - 1))
            y1 = int(np.clip((ty[f].max() - lat_min) / step_y, 0, ny - 1)) + 1
            PX, PY = np.meshgrid(cx[x0:x1], cy[y0:y1])
            a = _tri_area2(tx[f, 0], ty[f, 0], tx[f, 1], ty[f, 1], tx[f, 2], ty[f, 2])
            if abs(a) < 1e-14:
                continue
            b0 = _tri_area2(PX, PY, tx[f, 1], ty[f, 1], tx[f, 2], ty[f, 2]) / a
            b1 = _tri_area2(tx[f, 0], ty[f, 0], PX, PY, tx[f, 2], ty[f, 2]) / a
            b2 = 1.0 - b0 - b1
            inside = (b0 >= -1e-9) & (b1 >= -1e-9) & (b2 >= -1e-9)
            sub = tbl[y0:y1, x0:x1]
            sub[inside & (sub < 0)] = f
            tbl[y0:y1, x0:x1] = sub

    # fill uncovered cells with the nearest face centroid (so boundary
    # queries still get a sensible seed whose neighborhood is checked)
    if (tbl < 0).any():
        cen_x = tx.mean(axis=1)
        cen_y = ty.mean(axis=1)
        ry = np.clip(((cen_y - lat_min) / step_y).astype(int), 0, ny - 1)
        rx = np.clip(((cen_x - lon_min) / step_x).astype(int), 0, nx - 1)
        seed = np.full((ny, nx), -1, dtype=np.int32)
        seed[ry, rx] = np.arange(n_face, dtype=np.int32)
        empty = tbl < 0
        filled = np.where(empty & (seed >= 0), seed, tbl)
        for _ in range(max(ny, nx)):
            if not (filled < 0).any():
                break
            for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                cand = np.roll(filled, (dy, dx), axis=(0, 1))
                take = (filled < 0) & (cand >= 0)
                filled[take] = cand[take]
        filled[filled < 0] = 0
        tbl = filled

    return {"origin": (lat_min, lon_min), "step": (step_y, step_x), "fi": tbl}


def _tri_area2(ax, ay, bx, by, cx, cy):
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _build_face_adjacency(conn: np.ndarray) -> np.ndarray:
    """Edge-neighbor table: adj[f, k] = face sharing the edge opposite node k
    of face f (-1 on the mesh boundary). Drives the device-side walk."""
    from parcels_tpu import native

    adj = native.build_face_adjacency(conn)
    if adj is not None:
        return adj
    n_face = conn.shape[0]
    edge_owner: dict[tuple[int, int], tuple[int, int]] = {}
    adj = np.full((n_face, 3), -1, dtype=np.int32)
    for f in range(n_face):
        for k in range(3):
            a, b = conn[f, (k + 1) % 3], conn[f, (k + 2) % 3]
            key = (min(a, b), max(a, b))
            if key in edge_owner:
                g, j = edge_owner.pop(key)
                adj[f, k] = g
                adj[g, j] = f
            else:
                edge_owner[key] = (f, k)
    return adj


# ---------------------------------------------------------------------------
# Device-side search (traced)
# ---------------------------------------------------------------------------


def _query_points(garrs, y, x, spherical: bool):
    if spherical:
        lon = jnp.deg2rad(x)
        lat = jnp.deg2rad(y)
        cl = jnp.cos(lat)
        return jnp.stack([jnp.cos(lon) * cl, jnp.sin(lon) * cl, jnp.sin(lat)], axis=-1)
    return jnp.stack([x, y], axis=-1)


def _bary_coords(garrs, fi, pts, spherical: bool):
    """Barycentric coords of pts (n, d) in faces fi (n,) -> (n, 3).

    Mirrors reference _barycentric_coordinates (index_search.py:393-436);
    spherical projects the query onto each face's plane first
    (index_search.py:345-352).
    """
    conn = garrs["conn"]  # (n_face, 3)
    nodes = garrs["nodes"]  # (n_node, d)
    nf = conn.shape[0]
    fi_c = jnp.clip(fi, 0, nf - 1)
    nids = conn[fi_c]  # (n, 3)
    v0 = nodes[nids[:, 0]]
    v1 = nodes[nids[:, 1]]
    v2 = nodes[nids[:, 2]]

    if spherical:
        r1 = v1 - v0
        r2 = v2 - v0
        nhat = jnp.cross(r1, r2)
        norm = jnp.linalg.norm(nhat, axis=-1, keepdims=True)
        nhat = nhat / jnp.where(norm == 0.0, 1.0, norm)
        ptilde = pts - v0
        pts = ptilde - jnp.sum(ptilde * nhat, axis=-1, keepdims=True) * nhat + v0

        def area(a, b, c):
            return 0.5 * jnp.linalg.norm(jnp.cross(b - a, c - a), axis=-1)
    else:

        def area(a, b, c):
            d1 = b - a
            d2 = c - a
            return 0.5 * (d1[..., 0] * d2[..., 1] - d1[..., 1] * d2[..., 0])

    a = area(v0, v1, v2)
    a = jnp.where(jnp.abs(a) < 1e-30, 1e-30, a)
    b0 = area(pts, v1, v2) / a
    b1 = area(pts, v2, v0) / a
    b2 = area(pts, v0, v1) / a
    return jnp.stack([b0, b1, b2], axis=-1)


def _in_cell(bc):
    ok = jnp.all(bc >= -_BC_TOL, axis=-1)
    return ok & jnp.isclose(jnp.sum(bc, axis=-1), 1.0, rtol=1e-3, atol=1e-6)


def _walk_loop(spec, garrs, pts, fi, bc, found, hit_b, max_hops):
    """Core adjacency-walk while_loop on one (sub-)batch; early-exits as
    soon as every lane is found or stuck on the mesh boundary.

    The carry holds the CURRENT face's adjacency triple and the three
    barycentric coordinates as independent (n,) vectors: one fused-row
    take per hop (the adjacent-face ids ride the row just taken for the
    barycentric check; a (n, 3) tiled-layout carry cost an extra
    full-batch slice pass per hop — r5 device trace).
    """
    from parcels_tpu.ops import uxcol

    nf = spec.n_face
    adj = garrs["adj"]
    ftbl = garrs.get("face_table")

    if ftbl is None:
        # CPU/gather fallback: original compact carry, conn-array barys
        def bary(f):
            return _bary_coords(garrs, f, pts, spec.spherical)

        def body(carry):
            i, fi, bc, found, hit_boundary = carry
            k = jnp.argmin(bc, axis=-1)
            nxt = adj[jnp.clip(fi, 0, nf - 1), k]
            move = ~found & (nxt >= 0)
            hit_boundary = hit_boundary | (~found & (nxt < 0))
            fi_new = jnp.where(move, nxt, fi)
            bc_new = bary(fi_new)
            found_new = found | _in_cell(bc_new)
            bc = jnp.where(found[:, None], bc, bc_new)
            return i + 1, fi_new, bc, found_new, hit_boundary

        def cond(carry):
            i, _, _, found, hit_b = carry
            return (i < max_hops) & jnp.any(~found & ~hit_b)

        _, fi, bc, found, hit_b = jax.lax.while_loop(
            cond, body, (jnp.int32(0), fi, bc, found, hit_b)
        )
        return fi, bc, found, hit_b

    def split3(a2d):
        return a2d[:, 0], a2d[:, 1], a2d[:, 2]

    row0 = uxcol.face_rows(ftbl, fi)
    a0, a1, a2 = split3(
        jax.lax.bitcast_convert_type(row0[:, uxcol._ADJ : uxcol._ADJ + 3], jnp.int32)
    )
    b0, b1, b2 = split3(bc)

    def body(carry):
        i, fi, b0, b1, b2, a0, a1, a2, found, hit_boundary = carry
        # cross the edge of the most-negative coordinate
        k01 = b0 <= b1
        bmin01 = jnp.where(k01, b0, b1)
        use2 = b2 < bmin01
        nxt = jnp.where(use2, a2, jnp.where(k01, a0, a1))
        move = ~found & (nxt >= 0)
        hit_boundary = hit_boundary | (~found & (nxt < 0))
        fi_new = jnp.where(move, nxt, fi)
        row = uxcol.face_rows(ftbl, fi_new)
        nb = uxcol.bary_from_rows(row, pts, spec.spherical)
        na = jax.lax.bitcast_convert_type(
            row[:, uxcol._ADJ : uxcol._ADJ + 3], jnp.int32
        )
        found_new = found | _in_cell(nb)
        keep = found
        b0n = jnp.where(keep, b0, nb[:, 0])
        b1n = jnp.where(keep, b1, nb[:, 1])
        b2n = jnp.where(keep, b2, nb[:, 2])
        return (
            i + 1, fi_new, b0n, b1n, b2n, na[:, 0], na[:, 1], na[:, 2],
            found_new, hit_boundary,
        )

    def cond(carry):
        i = carry[0]
        found = carry[8]
        hit_b = carry[9]
        return (i < max_hops) & jnp.any(~found & ~hit_b)

    (_, fi, b0, b1, b2, _, _, _, found, hit_b) = jax.lax.while_loop(
        cond, body, (jnp.int32(0), fi, b0, b1, b2, a0, a1, a2, found, hit_b)
    )
    return fi, jnp.stack([b0, b1, b2], axis=-1), found, hit_b


def ux_walk(spec: UxGridSpec, garrs: dict, pts, fi, n_walk: int = 16, full_hops: int = 3):
    """Early-exit adjacency walk from seed faces ``fi`` for points ``pts``.

    Each unfound lane crosses the edge of its most-negative barycentric
    coordinate into the neighboring face (the classic point-location walk,
    fully vectorized). Returns ``(fi, bc)`` where unfound lanes carry the
    search sentinels (RIGHT_OUT_OF_BOUNDS on a boundary hit,
    GRID_SEARCH_ERROR on non-convergence).

    TWO-PHASE: up to ``full_hops`` whole-batch hops resolve the
    overwhelming majority (measured convergence at FESOM2 scale:
    154k -> 65k -> 19k -> 2.5k -> 13 -> 0 unfound per hop,
    scripts/probe_ux_walk.py), then the stragglers are COMPACTED and
    walk up to ``n_walk`` more hops at straggler-proportional cost — a
    whole-batch loop pays a full-batch row-take + barycentric pass per
    hop, so letting a handful of long walks drive 16 full-batch
    iterations dominated the ux step (r5 device trace: ~120 face-row
    takes per step). Works on any batch size — the ux stage cache
    (ops/uxcache.py) also calls it on compacted miss rounds.
    """
    bc = None
    from parcels_tpu.ops import uxcol

    ftbl = garrs.get("face_table")
    if ftbl is not None:
        bc = uxcol.bary_from_rows(uxcol.face_rows(ftbl, fi), pts, spec.spherical)
    else:
        bc = _bary_coords(garrs, fi, pts, spec.spherical)
    found = _in_cell(bc)
    hit_b = jnp.zeros(fi.shape, dtype=bool)
    fi, bc, found, hit_b = _walk_loop(
        spec, garrs, pts, fi, bc, found, hit_b, jnp.int32(full_hops)
    )

    n = fi.shape[0]
    strag = ~found & ~hit_b
    cnt = jnp.sum(strag.astype(jnp.int32))
    K = min(n, max(1024, n // 64))

    def compact_phase(state):
        fi, bc, found, hit_b = state
        from parcels_tpu.ops.stagecache import _blocked_cumsum

        cum = _blocked_cumsum(strag.astype(jnp.int32))
        nrounds = jax.lax.div(cnt + (K - 1), jnp.int32(K))

        def round_body(carry):
            r, (fi, bc, found, hit_b) = carry
            base = (r * K).astype(cum.dtype)
            idx = jnp.searchsorted(cum, base + jnp.arange(1, K + 1, dtype=cum.dtype))
            idx = jnp.minimum(idx, n - 1).astype(jnp.int32)
            sub_pts = jnp.take(pts, idx, axis=0)
            s_fi, s_bc, s_found, s_hb = _walk_loop(
                spec, garrs, sub_pts,
                jnp.take(fi, idx), jnp.take(bc, idx, axis=0),
                jnp.take(found, idx), jnp.take(hit_b, idx),
                jnp.int32(n_walk),
            )
            return r + 1, (
                fi.at[idx].set(s_fi),
                bc.at[idx].set(s_bc),
                found.at[idx].set(s_found),
                hit_b.at[idx].set(s_hb),
            )

        _, state = jax.lax.while_loop(
            lambda carry: carry[0] < nrounds, round_body, (jnp.int32(0), state)
        )
        return state

    fi, bc, found, hit_b = jax.lax.cond(
        cnt > 0, compact_phase, lambda s: s, (fi, bc, found, hit_b)
    )
    fi = jnp.where(
        found,
        fi,
        jnp.where(
            hit_b,
            jnp.int32(index_search.RIGHT_OUT_OF_BOUNDS),
            jnp.int32(index_search.GRID_SEARCH_ERROR),
        ),
    )
    return fi, bc


class UxGridView:
    """Traced view of a UxGrid inside the jitted engine (duck-typed with
    field.GridView: .spec, .garrs, .search)."""

    __slots__ = ("spec", "garrs", "lookup_meta")

    def __init__(self, spec: UxGridSpec, garrs: dict, lookup_meta: dict | None = None):
        self.spec = spec
        self.garrs = garrs
        self.lookup_meta = lookup_meta

    def search(self, z, y, x, ei=None):
        return ux_search(self.spec, self.garrs, z, y, x, ei)


def ux_search(
    spec: UxGridSpec,
    garrs: dict,
    z,
    y,
    x,
    ei=None,
    lookup_meta: dict | None = None,
    n_walk: int = 16,
):
    """Locate particles on the triangular mesh: {Z, FACE} positions.

    Warm-start barycentric check on the cached face; when any lane misses, a
    whole-batch ``lax.cond`` runs the cold path: raster seed + a fixed-count
    adjacency *walk* — each miss crosses the edge of its most-negative
    barycentric coordinate into the neighboring face (the classic
    point-location walk, fully vectorized). A walk that runs into the mesh
    boundary marks the lane out-of-bounds; a walk that fails to converge in
    ``n_walk`` hops marks GRID_SEARCH_ERROR (same sentinels as the
    reference's hash search, spatialhash.py:389-535).
    """
    zi, zeta = index_search.search_1d(garrs["depth"], z, spec.depth_uniform)

    pts = _query_points(garrs, y, x, spec.spherical)
    nf = spec.n_face

    # fused-face-row tier (ops/uxcol.py): a barycentric check or walk hop
    # is ONE 64-wide row-take + VPU instead of conn + 3 node-coord + adj
    # scattered gathers
    from parcels_tpu.ops import uxcol

    ftbl = garrs.get("face_table")

    def bary(fi):
        if ftbl is not None:
            return uxcol.bary_from_rows(uxcol.face_rows(ftbl, fi), pts, spec.spherical)
        return _bary_coords(garrs, fi, pts, spec.spherical)

    if ei is not None:
        fi0 = jnp.clip(ei, 0, nf - 1)
    else:
        fi0 = jnp.zeros(y.shape, dtype=jnp.int32)
    bc0 = bary(fi0)
    hit0 = _in_cell(bc0)

    (oy, ox) = spec.lookup_origin
    (sy, sx) = spec.lookup_step
    ny, nx = spec.lookup_shape
    tbl = garrs["lookup_fi"]
    adj = garrs["adj"]

    def cold(_):
        ry = jnp.clip(jnp.floor((y - oy) / sy).astype(jnp.int32), 0, ny - 1)
        rx = jnp.clip(jnp.floor((x - ox) / sx).astype(jnp.int32), 0, nx - 1)
        seed = tbl[ry, rx]
        fi = jnp.where(hit0, fi0, jnp.clip(seed, 0, nf - 1))
        return ux_walk(spec, garrs, pts, fi, n_walk=n_walk)

    def warm(_):
        return fi0, bc0

    all_hit = jnp.all(hit0)
    fi_m, bc_m = jax.lax.cond(all_hit, warm, cold, None)
    fi = jnp.where(hit0, fi0, fi_m)
    bc = jnp.where(hit0[:, None], bc0, bc_m)

    return {
        "Z": {"index": zi, "bcoord": zeta},
        "FACE": {"index": fi, "bcoord": bc},
    }
