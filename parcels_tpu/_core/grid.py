"""Structured grid: host-side descriptor + device-side traced search.

The reference's XGrid (src/parcels/_core/xgrid.py) carries an xarray dataset
and searches with NumPy at every call. Here the grid is split TPU-style:

- ``XGrid`` (host): parses SGRID metadata once at ingest, validates axes,
  precomputes everything static — axis sizes, uniform-spacing detection,
  staggering offsets from padding, the coarse curvilinear lookup raster —
  into a hashable ``GridSpec``.
- ``grid_search`` (device): a pure traced function over the particle batch,
  dispatching on the static spec (rectilinear O(1)/searchsorted vs.
  curvilinear walk) with no data-dependent Python control flow.
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import numpy as np
from parcels_tpu import xrlite as xr

import jax.numpy as jnp

from parcels_tpu import _sgrid as sgrid
from parcels_tpu._core import index_search
from parcels_tpu._core.basegrid import BaseGrid
from parcels_tpu._core.mesh import BaseMesh, get_mesh
from parcels_tpu._core.timeutils import TimeInterval, datetimes_to_float_seconds

__all__ = ["GridSpec", "XGrid", "grid_search"]

_AXES_ORDER = "ZYX"


def _uniform_spacing(arr: np.ndarray) -> tuple[float, float, float] | None:
    """Return (origin, step, last) if ``arr`` is uniformly spaced, else None."""
    if arr.ndim != 1 or arr.shape[0] < 2:
        return None
    d = np.diff(arr.astype(np.float64))
    step = d[0]
    if step <= 0:
        return None
    if np.allclose(d, step, rtol=1e-5, atol=0.0):
        return float(arr[0]), float(step), float(arr[-1])
    return None


@dataclasses.dataclass(frozen=True)
class GridSpec:
    """Static, hashable description of a structured grid (baked into jit)."""

    axes: tuple[str, ...]  # subset of ("Z", "Y", "X") present
    curvilinear: bool
    spherical: bool
    deg2m: float
    xdim: int  # number of cells along each axis (0 if absent)
    ydim: int
    zdim: int
    lon_uniform: tuple[float, float] | None
    lat_uniform: tuple[float, float] | None
    depth_uniform: tuple[float, float] | None
    time_uniform: tuple[float, float] | None
    # staggering offset per axis derived from SGRID padding: 1 if LOW else 0
    # (reference _xinterpolators.py:99-109)
    offset_x: int = 0
    offset_y: int = 0
    offset_z: int = 0
    has_lookup: bool = False
    # Global-domain OOB limits for the Y axis; set by domain decomposition
    # where the local lat slab is halo-extended past the band edge but OOB
    # must be judged against the global domain (parallel/domain.py).
    y_oob_bounds: tuple[float, float] | None = None
    # X-axis twin (2-D tile decomposition, parallel/tiles.py)
    x_oob_bounds: tuple[float, float] | None = None


class XGrid(BaseGrid):
    """Host-side structured grid built from an SGRID-annotated xr.Dataset."""

    def __init__(self, ds: xr.Dataset, mesh: Literal["flat", "spherical"] | BaseMesh = "flat"):
        self.sgrid_metadata = sgrid.parse_sgrid_metadata(ds)
        self._ds = ds
        self._mesh = get_mesh(mesh)
        md = self.sgrid_metadata

        dim_to_axis = md.dim_to_axis()
        present_axes = sorted(
            {ax for d, ax in dim_to_axis.items() if d in ds.dims}, key=_AXES_ORDER.index
        )
        self.axes: list[str] = list(present_axes)

        # lat/lon/depth numpy coordinate arrays on the f-points
        self.lon = np.asarray(ds["lon"].values) if "lon" in ds else np.zeros(1)
        self.lat = np.asarray(ds["lat"].values) if "lat" in ds else np.zeros(1)
        self.depth = np.asarray(ds["depth"].values) if "depth" in ds else np.zeros(1)
        if "X" in self.axes or "Y" in self.axes:
            _validate_lat_lon(self.lon, self.lat)
        if "Z" in self.axes and not np.all(np.diff(self.depth) > 0):
            raise ValueError("Depth coordinate must be strictly increasing.")

        curvilinear = self.lon.ndim == 2
        if self.lon.ndim > 2:
            raise NotImplementedError("lon/lat arrays with >2 dims are not supported.")

        # time axis (float64 seconds since interval start)
        self._datetimes = np.asarray(ds["time"].values) if "time" in ds.dims else None
        if self._datetimes is not None and len(self._datetimes) > 0:
            self.time_interval = _make_time_interval(self._datetimes)
            self.time = datetimes_to_float_seconds(self._datetimes, self.time_interval.left)
        else:
            self.time_interval = None
            self.time = np.zeros(1, dtype=np.float64)

        def cells(axis: str, coord: np.ndarray) -> int:
            if axis not in self.axes:
                return 0
            n_nodes = coord.shape[-1] if axis == "X" else coord.shape[0]
            if axis == "Z":
                n_nodes = self.depth.shape[0]
            return n_nodes - 1

        offsets = {}
        for axis in ("X", "Y", "Z"):
            try:
                offsets[axis] = 1 if md.axis_padding(axis) == sgrid.Padding.LOW else 0
            except ValueError:
                offsets[axis] = 0

        lookup = None
        if curvilinear:
            lookup = _build_curvilinear_lookup(self.lon, self.lat)
        self._lookup = lookup

        self.spec = GridSpec(
            axes=tuple(self.axes),
            curvilinear=curvilinear,
            spherical=self._mesh.is_spherical(),
            deg2m=self.deg2m,
            xdim=cells("X", self.lon),
            ydim=cells("Y", self.lat),
            zdim=cells("Z", self.depth),
            lon_uniform=_uniform_spacing(self.lon) if not curvilinear else None,
            lat_uniform=_uniform_spacing(self.lat) if not curvilinear else None,
            depth_uniform=_uniform_spacing(self.depth),
            time_uniform=_uniform_spacing(self.time),
            offset_x=offsets["X"],
            offset_y=offsets["Y"],
            offset_z=offsets["Z"],
            has_lookup=lookup is not None,
        )

    # -- host API parity helpers -------------------------------------------
    @property
    def deg2m(self) -> float:
        return self._mesh.deg2m if self._mesh.is_spherical() else 1.0

    @property
    def mesh(self) -> BaseMesh:
        return self._mesh

    @property
    def xdim(self) -> int:
        return self.spec.xdim

    @property
    def ydim(self) -> int:
        return self.spec.ydim

    @property
    def zdim(self) -> int:
        return self.spec.zdim

    def get_axis_dim(self, axis: str) -> int:
        """Cell count along an axis (reference xgrid.py:220-231)."""
        if axis not in self.axes:
            raise ValueError(
                f"Axis {axis!r} is not part of this grid. Available axes: {self.axes}"
            )
        return {"X": self.spec.xdim, "Y": self.spec.ydim, "Z": self.spec.zdim}[axis]

    def get_axis_dim_mapping(self, dims) -> dict[str, str]:
        dim_to_axis = self.sgrid_metadata.dim_to_axis()
        out = {}
        for d in dims:
            ax = dim_to_axis.get(str(d))
            if ax in self.axes:
                out[ax] = str(d)
        return out

    def device_arrays(self, dtype=np.float32) -> dict:
        """Grid coordinate arrays to ship to device (part of the field pytree)."""
        arrs = {
            "lon": jnp.asarray(self.lon.astype(dtype)),
            "lat": jnp.asarray(self.lat.astype(dtype)),
            "depth": jnp.asarray(self.depth.astype(dtype)),
            "time": jnp.asarray(self.time.astype(np.float32)),
        }
        if self._lookup is not None:
            arrs["lookup_yi"] = jnp.asarray(self._lookup["yi"])
            arrs["lookup_xi"] = jnp.asarray(self._lookup["xi"])
        if self.spec.curvilinear:
            # per-cell tangent-frame table: turns the search's 12 scattered
            # corner reads into ONE coalesced row-gather (index_search.
            # build_pic_table; ~64 B/cell)
            arrs["pic_table"] = jnp.asarray(self.pic_table())
        if getattr(self, "_needs_cgrid_geom", False) and "X" in self.axes and "Y" in self.axes:
            arrs["cgrid_geom"] = jnp.asarray(self.cgrid_geometry())
        return arrs

    def cgrid_geometry(self) -> np.ndarray:
        """Per-cell C-grid geometry table, (cells_y * cells_x, 9) float32.

        Columns 0-3: corner lon differences [p1-p0, p2-p3, p3-p0, p2-p1]
        (antimeridian-unwrapped); 4-7: the same lat differences; 8: p0's lat.
        Corner order p0=(y,x), p1=(y,x+1), p2=(y+1,x+1), p3=(y+1,x). These
        9 values reconstruct exactly the reference's per-sample corner math
        (edge geodesics c1..c4 with per-particle edge latitude, and the
        bilinear Jacobian — reference _xinterpolators.py:224-306).

        The reference recomputes corner coords at every sample (NumPy-lazy);
        lon/lat never change, so the TPU build memoizes cell geometry at
        ingest (float64 host math) and the hot path reduces to ONE
        row-gather per particle plus VPU arithmetic.
        """
        cached = getattr(self, "_cgrid_geom_cache", None)
        if cached is not None:
            return cached
        geom = cgrid_geometry_from_coords(self.lon, self.lat, self.spec.spherical)
        self._cgrid_geom_cache = geom
        return geom

    def localize(self, position: dict, dims) -> dict:
        """Convert an f-point search position to a variable's staggered frame.

        Reference API (xgrid.py:233-281 + ``_convert_center_pos_to_fpoint``
        :538-565): given ``position`` as ``{axis: (index, bcoord)}`` (tuples
        or the ``{"index", "bcoord"}`` dicts `search` returns) and the
        variable's ``dims``, return ``{dim: (index, bcoord)}`` in the frame
        of the staggered grid the variable lives on. Face-placed dims shift
        the barycentric coordinate by -0.5 (borrowing a cell when it goes
        negative) and add the LOW/BOTH-padding index offset; node-placed
        dims pass through.
        """
        md = self.sgrid_metadata
        dim_to_axis = md.dim_to_axis()
        axis_to_dim = {dim_to_axis[d]: d for d in dims if d in dim_to_axis}
        out = {}
        for axis, pos in position.items():
            if axis not in axis_to_dim:
                continue
            dim = axis_to_dim[axis]
            index, bcoord = (pos["index"], pos["bcoord"]) if isinstance(pos, dict) else pos
            scalar = np.ndim(index) == 0
            index = np.asarray(index)
            bcoord = np.asarray(bcoord, dtype=np.float64)
            if md.dim_position(dim) == "face":
                bcoord = bcoord - 0.5
                borrow = bcoord < 0
                bcoord = np.where(borrow, bcoord + 1.0, bcoord)
                index = index - borrow.astype(index.dtype)
                if md.axis_padding(axis) in (sgrid.Padding.BOTH, sgrid.Padding.LOW):
                    index = index + 1
            if scalar:
                out[dim] = (int(index), float(bcoord))
            else:
                out[dim] = (index, bcoord)
        return out

    def pic_table(self) -> np.ndarray:
        """Memoized per-cell search-geometry table (index_search.build_pic_table)."""
        cached = getattr(self, "_pic_table_cache", None)
        if cached is None:
            cached = index_search.build_pic_table(self.lon, self.lat, self.spec.spherical)
            self._pic_table_cache = cached
        return cached

    def lookup_meta(self) -> dict | None:
        if self._lookup is None:
            return None
        return {"origin": self._lookup["origin"], "step": self._lookup["step"]}

    def make_view(self, garrs: dict):
        """Traced grid view for the jitted engine (UxGrid has its own)."""
        from parcels_tpu._core.field import GridView

        return GridView(self.spec, garrs, self.lookup_meta())

    def _search_device(self, garrs: dict, z, y, x, ei):
        return grid_search(self.spec, garrs, z, y, x, ei=ei, lookup_meta=self.lookup_meta())

    # -- raveling of per-axis indices into the cached element index ---------
    def ravel_index(self, zi, yi, xi):
        ydim = max(self.spec.ydim, 1)
        xdim = max(self.spec.xdim, 1)
        return (zi * ydim + yi) * xdim + xi

    def unravel_index(self, ei):
        ydim = max(self.spec.ydim, 1)
        xdim = max(self.spec.xdim, 1)
        xi = ei % xdim
        yi = (ei // xdim) % ydim
        zi = ei // (xdim * ydim)
        return zi, yi, xi

    def __eq__(self, other):
        return self is other

    def __hash__(self):
        return id(self)

    def __repr__(self):
        kind = "curvilinear" if self.spec.curvilinear else "rectilinear"
        mesh = "spherical" if self.spec.spherical else "flat"
        return (
            f"XGrid({kind}, {mesh}, cells z={self.spec.zdim} y={self.spec.ydim} "
            f"x={self.spec.xdim}, tdim={self.time.shape[0]})"
        )

    def _repr_html_(self):
        from parcels_tpu._repr import html_sections

        s = self.spec
        return html_sections(
            type(self).__name__,
            [
                ("geometry", [repr(self)]),
                (
                    "staggering",
                    [f"offset_x={s.offset_x} offset_y={s.offset_y} offset_z={s.offset_z}"],
                ),
            ],
        )


def cgrid_geometry_from_coords(lon, lat, spherical: bool) -> np.ndarray:
    """Per-cell C-grid geometry table from node coordinates (see
    XGrid.cgrid_geometry for the column layout). Module-level so the
    Y-band domain executor can build per-band tables from its halo-extended
    slab coordinates (parallel/domain.py) — keeping the one-row-gather
    C-grid fast path alive under domain decomposition."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    if lon.ndim == 1:
        lon2d, lat2d = np.meshgrid(lon, lat)
    else:
        lon2d, lat2d = lon, lat
    px = [lon2d[:-1, :-1], lon2d[:-1, 1:], lon2d[1:, 1:], lon2d[1:, :-1]]
    py = [lat2d[:-1, :-1], lat2d[:-1, 1:], lat2d[1:, 1:], lat2d[1:, :-1]]
    if spherical:
        # antimeridian unwrap relative to p0 (reference corner unwrap)
        px[0] = ((px[0] + 180.0) % 360.0) - 180.0
        for k in (1, 2, 3):
            pk = ((px[k] + 180.0) % 360.0) - 180.0
            pk = np.where(pk - px[0] > 180.0, pk - 360.0, pk)
            pk = np.where(px[0] - pk > 180.0, pk + 360.0, pk)
            px[k] = pk
    cols = [
        px[1] - px[0], px[2] - px[3], px[3] - px[0], px[2] - px[1],
        py[1] - py[0], py[2] - py[3], py[3] - py[0], py[2] - py[1],
        py[0],
    ]
    return np.stack([c.reshape(-1) for c in cols], axis=1).astype(np.float32)


def _validate_lat_lon(lon: np.ndarray, lat: np.ndarray):
    if lon.ndim != lat.ndim:
        raise ValueError("lon and lat must have the same dimensionality.")
    if lon.ndim == 1:
        if lon.shape[0] > 1 and not np.all(np.diff(lon) > 0):
            raise ValueError("1-D lon must be strictly increasing.")
        if lat.shape[0] > 1 and not np.all(np.diff(lat) > 0):
            raise ValueError("1-D lat must be strictly increasing.")


def _make_time_interval(datetimes: np.ndarray) -> TimeInterval | None:
    if len(datetimes) < 2:
        return None
    left, right = datetimes[0], datetimes[-1]
    if np.issubdtype(np.asarray(left).dtype, np.datetime64):
        return TimeInterval(np.datetime64(left, "ns"), np.datetime64(right, "ns"))
    return TimeInterval(left, right)


def _build_curvilinear_lookup(lon2d: np.ndarray, lat2d: np.ndarray, shape: tuple | None = None):
    """Build a coarse regular raster mapping (lat, lon) -> seed (yi, xi).

    Host-side, once per grid. Each raster cell stores the grid index of the
    nearest f-point; the device-side directed walk converges from there.
    ``shape`` fixes the raster resolution (domain decomposition stacks one
    raster per band, so all bands must agree).
    """
    ydim, xdim = lon2d.shape
    if shape is not None:
        ny, nx = shape
    else:
        ny = min(4 * ydim, 2048)
        nx = min(4 * xdim, 2048)
    lat_min, lat_max = float(np.nanmin(lat2d)), float(np.nanmax(lat2d))
    lon_min, lon_max = float(np.nanmin(lon2d)), float(np.nanmax(lon2d))
    pad_y = max((lat_max - lat_min) * 0.01, 1e-9)
    pad_x = max((lon_max - lon_min) * 0.01, 1e-9)
    lat_min -= pad_y
    lat_max += pad_y
    lon_min -= pad_x
    lon_max += pad_x
    step_y = (lat_max - lat_min) / ny
    step_x = (lon_max - lon_min) / nx

    # Rasterize grid nodes into the raster; fill empty raster cells by
    # nearest-filled propagation (a few dilation passes).
    tbl_y = np.full((ny, nx), -1, dtype=np.int32)
    tbl_x = np.full((ny, nx), -1, dtype=np.int32)
    gy, gx = np.meshgrid(np.arange(ydim), np.arange(xdim), indexing="ij")
    ry = np.clip(((lat2d - lat_min) / step_y).astype(np.int64), 0, ny - 1)
    rx = np.clip(((lon2d - lon_min) / step_x).astype(np.int64), 0, nx - 1)
    tbl_y[ry.ravel(), rx.ravel()] = np.minimum(gy.ravel(), ydim - 2).astype(np.int32)
    tbl_x[ry.ravel(), rx.ravel()] = np.minimum(gx.ravel(), xdim - 2).astype(np.int32)

    empty = tbl_y < 0
    max_pass = max(ny, nx)
    for _ in range(max_pass):
        if not empty.any():
            break
        filled_y = tbl_y.copy()
        filled_x = tbl_x.copy()
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            cand_y = np.roll(tbl_y, (dy, dx), axis=(0, 1))
            cand_x = np.roll(tbl_x, (dy, dx), axis=(0, 1))
            take = empty & (cand_y >= 0) & (filled_y < 0)
            filled_y[take] = cand_y[take]
            filled_x[take] = cand_x[take]
        tbl_y, tbl_x = filled_y, filled_x
        empty = tbl_y < 0

    tbl_y[tbl_y < 0] = 0
    tbl_x[tbl_x < 0] = 0
    return {
        "origin": (lat_min, lon_min),
        "step": (step_y, step_x),
        "yi": tbl_y,
        "xi": tbl_x,
    }


# ---------------------------------------------------------------------------
# Device-side search (traced)
# ---------------------------------------------------------------------------


def grid_search(spec: GridSpec, garrs: dict, z, y, x, ei=None, lookup_meta: dict | None = None):
    """Locate particles on the grid. Returns {axis: {"index", "bcoord"}}.

    Mirrors reference XGrid.search (xgrid.py:316-356): Z always a 1-D
    bracket; X/Y either independent 1-D brackets (rectilinear) or the joint
    curvilinear search with ``ei`` warm start.
    """
    if "Z" in spec.axes:
        zi, zeta = index_search.search_1d(garrs["depth"], z, spec.depth_uniform)
    else:
        zi = jnp.zeros(z.shape, dtype=jnp.int32)
        zeta = jnp.zeros(z.shape, dtype=z.dtype)

    if spec.curvilinear and "X" in spec.axes and "Y" in spec.axes:
        if ei is not None:
            ydim = max(spec.ydim, 1)
            xdim = max(spec.xdim, 1)
            xi_g = ei % xdim
            yi_g = (ei // xdim) % ydim
        else:
            yi_g = jnp.zeros(y.shape, dtype=jnp.int32)
            xi_g = jnp.zeros(x.shape, dtype=jnp.int32)
        lookup = None
        if spec.has_lookup and lookup_meta is not None:
            lookup = {
                "origin": lookup_meta["origin"],
                "step": lookup_meta["step"],
                "yi": garrs["lookup_yi"],
                "xi": garrs["lookup_xi"],
            }
        yi, eta, xi, xsi = index_search.curvilinear_search(
            garrs["lon"], garrs["lat"], y, x, yi_g, xi_g, spherical=spec.spherical,
            lookup=lookup, pic_table=garrs.get("pic_table")
        )
        return {
            "Z": {"index": zi, "bcoord": zeta},
            "Y": {"index": yi, "bcoord": eta},
            "X": {"index": xi, "bcoord": xsi},
        }

    if "Y" in spec.axes:
        yi, eta = index_search.search_1d(
            garrs["lat"], y, spec.lat_uniform, oob_bounds=spec.y_oob_bounds
        )
    else:
        yi = jnp.zeros(y.shape, dtype=jnp.int32)
        eta = jnp.zeros(y.shape, dtype=y.dtype)

    if "X" in spec.axes:
        xi, xsi = index_search.search_1d(
            garrs["lon"], x, spec.lon_uniform, oob_bounds=spec.x_oob_bounds
        )
    else:
        xi = jnp.zeros(x.shape, dtype=jnp.int32)
        xsi = jnp.zeros(x.shape, dtype=x.dtype)

    return {
        "Z": {"index": zi, "bcoord": zeta},
        "Y": {"index": yi, "bcoord": eta},
        "X": {"index": xi, "bcoord": xsi},
    }
