"""FieldSet: host container of Fields + device pytree builder.

Capability parity with reference src/parcels/_core/fieldset.py and the
ingestion half of src/parcels/_core/model.py: SGRID-convention ingestion,
vector-field autodiscovery with A-vs-C-grid detection, constant fields,
context constants readable inside kernels, gridset management.

TPU design: at ingest every field is transposed (host, numpy) to a dense
(T, Z, Y, X) block; ``device_arrays()`` ships data + grid coordinates to the
device once and caches the pytree, which the jitted engine takes as an
argument (so re-jit never happens when data values change, and shardings can
be applied to the same pytree for multi-chip runs).
"""

from __future__ import annotations

from typing import Literal

import numpy as np
from parcels_tpu import xrlite as xr

import jax
import jax.numpy as jnp

from parcels_tpu import _sgrid as sgrid
from parcels_tpu._core.field import Field, FieldView, VectorField, VectorFieldView
from parcels_tpu._core.grid import XGrid
from parcels_tpu._core.mesh import get_mesh
from parcels_tpu.interpolators import CGrid_Velocity, XConstantField, XLinear, XLinear_Velocity

__all__ = ["FieldSet"]

_ORDER = "TZYX"


def _fillna(arr: np.ndarray, fill_value) -> np.ndarray:
    """NaN -> fill, skipping the full-size copy for broadcast views.

    ``zero_data`` benchmark fieldsets and constant fields arrive as
    zero-stride broadcasts of one scalar; materializing them via
    ``np.nan_to_num`` costs gigabytes of host copies for nothing (minutes on
    a small-core host at the true MOi resolution)."""
    if arr.ndim and all(s == 0 for s in arr.strides):
        v = arr.reshape(-1)[:1]
        if not (np.issubdtype(arr.dtype, np.floating) and np.isnan(v[0])):
            return arr
        return np.broadcast_to(np.asarray(fill_value, dtype=arr.dtype), arr.shape)
    return np.nan_to_num(arr, nan=fill_value)


def _transpose_to_tzyx(da: xr.DataArray, metadata: sgrid.SGrid2DMetadata) -> np.ndarray:
    """Transpose/expand a DataArray of any shape into dense (T, Z, Y, X) numpy."""
    dim_to_axis = metadata.dim_to_axis() | {"time": "T"}
    axes_of_dims = []
    for d in da.dims:
        ax = dim_to_axis.get(str(d))
        if ax is None:
            raise ValueError(
                f"Dimension {d!r} of DataArray {da.name!r} is not associated with a grid axis."
            )
        axes_of_dims.append(ax)
    if len(set(axes_of_dims)) != len(axes_of_dims):
        raise ValueError(f"DataArray {da.name!r} has two dimensions on one axis.")

    # transpose present axes into canonical order
    present = sorted(range(len(axes_of_dims)), key=lambda i: _ORDER.index(axes_of_dims[i]))
    present_axes = sorted(axes_of_dims, key=_ORDER.index)

    if getattr(da.values, "_parcels_lazy", False):
        # disk-backed field: record the normalization on the lazy handle so
        # only the rolling time window is ever read (io/zarrstore.py)
        src_shape = da.values.shape
        shape = [src_shape[axes_of_dims.index(ax)] if ax in present_axes else 1 for ax in _ORDER]
        t_store = axes_of_dims.index("T") if "T" in axes_of_dims else None
        return da.values.with_tzyx(present, shape, t_store)

    arr = np.asarray(da.values)
    arr = arr.transpose(present)
    # insert singleton dims for absent axes
    shape = []
    k = 0
    for ax in _ORDER:
        if ax in present_axes:
            shape.append(arr.shape[k])
            k += 1
        else:
            shape.append(1)
    return arr.reshape(shape)


def _is_agrid(ds: xr.Dataset, u: str, v: str) -> bool:
    """U and V on the same dims -> A-grid (reference model.py:504-507)."""
    return set(ds[u].dims) == set(ds[v].dims)


def _default_vector_field_components(data_vars) -> dict[str, tuple[str, ...]]:
    names = set(data_vars)
    ret: dict[str, tuple[str, ...]] = {}
    if {"U", "V"}.issubset(names):
        ret["UV"] = ("U", "V")
    if {"U", "V", "W"}.issubset(names):
        ret["UVW"] = ("U", "V", "W")
    return ret


def _mesh_from_units(ds: xr.Dataset, metadata: sgrid.SGrid2DMetadata) -> str:
    """Autodetect mesh type from node-coordinate units (degrees -> spherical)."""
    if metadata.node_coordinates is None:
        return "flat"
    cx = metadata.node_coordinates[0]
    units = ds[cx].attrs.get("units") if cx in ds else None
    if units is None:
        raise ValueError(
            f"Coordinate {cx!r} has no 'units' attribute; pass mesh= explicitly."
        )
    return "spherical" if "degree" in str(units).lower() else "flat"


class _ConstantGrid(XGrid):
    """Degenerate 0-D grid used for constant fields."""

    def __init__(self, mesh):
        self._mesh = get_mesh(mesh)
        self._ds = None
        self._lookup = None
        self.axes = []
        self.lon = np.zeros(1)
        self.lat = np.zeros(1)
        self.depth = np.zeros(1)
        self.time = np.zeros(1, dtype=np.float64)
        self.time_interval = None
        self.sgrid_metadata = None
        from parcels_tpu._core.grid import GridSpec

        self.spec = GridSpec(
            axes=(),
            curvilinear=False,
            spherical=self._mesh.is_spherical(),
            deg2m=self.deg2m,
            xdim=0,
            ydim=0,
            zdim=0,
            lon_uniform=None,
            lat_uniform=None,
            depth_uniform=None,
            time_uniform=None,
        )


class FieldSet:
    """Container of Fields/VectorFields + context constants."""

    def __init__(self, fields: list[Field | VectorField] | None = None):
        object.__setattr__(self, "_fields", {})
        object.__setattr__(self, "context", {})
        object.__setattr__(self, "_gridset", [])
        object.__setattr__(self, "_device_cache", None)
        object.__setattr__(self, "_executor_cache", {})
        object.__setattr__(self, "_window_cache", {})
        object.__setattr__(self, "_time_window", None)
        for f in fields or []:
            self.add_field(f)

    # -- attribute routing (reference fieldset.py:79-108) -------------------
    def __getattr__(self, name):
        fields = self.__dict__.get("_fields", {})
        if name in fields:
            return fields[name]
        context = self.__dict__.get("context", {})
        if name in context:
            return context[name]
        raise AttributeError(f"FieldSet has no attribute {name!r}")

    def __setattr__(self, name, value):
        context = self.__dict__.get("context")
        if context is not None and name in context:
            raise AttributeError(
                f"Cannot assign '{name}' directly. Use fieldset.context['{name}'] instead."
            )
        object.__setattr__(self, name, value)

    def __add__(self, other):
        """Combine two FieldSets (reference fieldset.py:110-117): union of
        fields and context constants; name collisions raise ValueError."""
        if not isinstance(other, FieldSet):
            return NotImplemented
        common = set(self._fields) & set(other._fields)
        if common:
            raise ValueError(
                "Cannot add FieldSets that have field names in common. "
                f"Duplicate field names are: {sorted(common)}"
            )
        common_ctx = set(self.context) & set(other.context)
        if common_ctx:
            raise ValueError(
                "Cannot add FieldSets that have context value names in common. "
                f"Duplicate context value names are: {sorted(common_ctx)}"
            )
        # shallow-copy fields (sharing data/grid/interpolator) so add_field's
        # igrid/back-pointer assignment cannot corrupt the source fieldsets
        memo: dict = {}

        def copy_field(f):
            if id(f) in memo:
                return memo[id(f)]
            if isinstance(f, VectorField):
                c = VectorField(
                    f.name,
                    copy_field(f.U),
                    copy_field(f.V),
                    copy_field(f.W) if f.W is not None else None,
                    interp_method=f.interp_method,
                )
            else:
                c = Field(f.name, f.data, f.grid, interp_method=f.interp_method)
            memo[id(f)] = c
            return c

        combined = FieldSet()
        for name, f in {**self._fields, **other._fields}.items():
            combined.add_field(copy_field(f), name)
        combined.context.update({**self.context, **other.context})
        return combined

    @property
    def fields(self) -> dict:
        return self._fields

    @property
    def gridset(self) -> list[XGrid]:
        return self._gridset

    @property
    def time_interval(self):
        intervals = [
            f.time_interval
            for f in self._fields.values()
            if isinstance(f, Field) and f.time_interval is not None
        ]
        if not intervals:
            return None
        overlap = intervals[0]
        for ti in intervals[1:]:
            if overlap is None:
                return None
            overlap = overlap.intersection(ti)
        return overlap

    # -- construction --------------------------------------------------------
    def add_field(self, field: Field | VectorField, name: str | None = None):
        if not isinstance(field, (Field, VectorField)):
            raise ValueError(f"Expected a Field or VectorField. Got {type(field)}")
        name = field.name if name is None else name
        if name in self._fields:
            raise ValueError(f"FieldSet already has a Field with name '{name}'")
        if isinstance(field, Field):
            if field.grid not in self._gridset:
                self._gridset.append(field.grid)
            field.igrid = self._gridset.index(field.grid)
        if isinstance(field, VectorField) and isinstance(field.interp_method, CGrid_Velocity):
            # device arrays will carry the memoized per-cell corner geometry
            # so the hot path is a single row-gather (grid.cgrid_geometry)
            field.grid._needs_cgrid_geom = True
        field._fieldset = self
        field._registered_name = name
        self._fields[name] = field
        self._invalidate_caches()

    def add_constant_field(self, name: str, value, mesh: Literal["flat", "spherical"] = "spherical"):
        """Add a field constant in space/time (reference fieldset.py:198-228)."""
        if mesh not in ("flat", "spherical"):
            raise ValueError(f"mesh must be one of ['flat', 'spherical']. Got {mesh!r}.")
        grid = _ConstantGrid(mesh)
        data = np.full((1, 1, 1, 1), value, dtype=np.float32)
        self.add_field(Field(name, data, grid, interp_method=XConstantField()))

    def add_context(self, name: str, value):
        """Register a simulation constant readable in kernels as ``fieldset.<name>``."""
        if not name.isidentifier():
            raise ValueError(f"Context name must be a valid identifier. Got {name!r}")
        if name in self.context:
            raise ValueError(f"FieldSet already has a context with name '{name}'")
        self.context[name] = value
        self._invalidate_caches()

    @classmethod
    def from_sgrid_conventions(
        cls,
        ds: xr.Dataset,
        mesh=None,
        vector_fields: dict[str, tuple[str, ...]] | None = None,
        fill_value: float = 0.0,
    ) -> "FieldSet":
        """Build a FieldSet from an SGRID-convention dataset.

        Mirrors reference FieldSet.from_sgrid_conventions (fieldset.py:293-336
        -> model.py:203-249): mesh autodetection from coordinate units, time
        axis normalization, vector-field discovery, NaN -> 0 fill, XLinear
        default scalar interpolation, A/C-grid velocity selection.
        """
        metadata = sgrid.parse_sgrid_metadata(ds)
        if mesh is None:
            mesh = _mesh_from_units(ds, metadata)

        # Normalize the time dimension name to "time"
        for dim in list(ds.dims):
            if dim == "time" or dim not in ds.coords:
                continue
            if ds[dim].attrs.get("axis") == "T":
                ds = ds.rename({dim: "time"})
                metadata = sgrid.parse_sgrid_metadata(ds)

        grid = XGrid(ds, mesh)

        data_vars = [
            v for v in ds.data_vars if ds[v].attrs.get("cf_role") != "grid_topology"
        ]
        if vector_fields is None:
            vector_fields = _default_vector_field_components(data_vars)

        fs = cls()
        scalar_fields: dict[str, Field] = {}
        for varname in data_vars:
            arr = _transpose_to_tzyx(ds[varname], metadata)
            if getattr(arr, "_parcels_lazy", False):
                arr = arr.with_fill(fill_value)
            else:
                arr = _fillna(arr, fill_value)
            f = Field(str(varname), arr, grid, interp_method=XLinear())
            scalar_fields[str(varname)] = f
            fs.add_field(f)

        for vname, components in vector_fields.items():
            if len(components) not in (2, 3):
                raise ValueError(
                    f"Vector field {vname!r} must have either 2 or 3 components; got {len(components)}."
                )
            for c in components:
                if c not in scalar_fields:
                    raise ValueError(f"Vector field {vname!r} component {c!r} not in dataset.")
            interp = XLinear_Velocity() if _is_agrid(ds, components[0], components[1]) else CGrid_Velocity()
            fs.add_field(VectorField(vname, *[scalar_fields[c] for c in components], interp_method=interp))
        return fs

    @classmethod
    def from_ugrid_conventions(
        cls,
        ds: xr.Dataset,
        mesh: Literal["flat", "spherical"] | None = None,
        vector_fields: dict[str, tuple[str, ...]] | None = None,
        fill_value: float = 0.0,
    ) -> "FieldSet":
        """Build a FieldSet from a UGRID-convention triangular-mesh dataset.

        Mirrors reference FieldSet.from_ugrid_conventions (fieldset.py:256 ->
        model.py:360-382): requires dims {time, zf, zc}; node coordinates
        ``node_lon``/``node_lat`` and ``face_node_connectivity`` (n_face, 3);
        renames common U/V/W variable names; selects the interpolator from
        each variable's (vertical, lateral) dim placement (model.py:467-501).
        """
        from parcels_tpu._core.uxgrid import UxGrid
        from parcels_tpu.interpolators.uxinterp import (
            Ux_Velocity,
            UxConstantFaceConstantZC,
            UxConstantFaceLinearZF,
            UxLinearNodeConstantZC,
            UxLinearNodeLinearZF,
        )

        ds_dims = set(str(d) for d in ds.dims)
        for need in ("time", "zf", "zc"):
            if need not in ds_dims:
                raise ValueError(
                    f"Dataset missing one of the required dimensions 'time', 'zf', or 'zc' "
                    f"for a UGRID dataset. Found dimensions {sorted(ds_dims)}"
                )
        for need in ("node_lon", "node_lat", "face_node_connectivity"):
            if need not in ds:
                raise ValueError(f"UGRID dataset needs a {need!r} variable.")

        # common U/V/W renames (reference model.py:425-464)
        for u_name, v_name in (("unod", "vnod"), ("u", "v")):
            if u_name in ds.data_vars and "U" not in ds.data_vars:
                ds = ds.rename({u_name: "U", v_name: "V"})
        if "w" in ds.data_vars and "W" not in ds.data_vars:
            ds = ds.rename({"w": "W"})

        node_lon = np.asarray(ds["node_lon"].values)
        if mesh is None:
            units = str(ds["node_lon"].attrs.get("units", ""))
            if not units:
                raise ValueError("node_lon has no 'units' attribute; pass mesh= explicitly.")
            mesh = "spherical" if "degree" in units.lower() else "flat"

        grid = UxGrid(
            node_lon,
            np.asarray(ds["node_lat"].values),
            np.asarray(ds["face_node_connectivity"].values),
            np.asarray(ds["zf"].values, dtype=np.float64),
            mesh=mesh,
            time=np.asarray(ds["time"].values) if "time" in ds else None,
        )

        interp_by_dims = {
            ("zc", "n_face"): UxConstantFaceConstantZC,
            ("zf", "n_face"): UxConstantFaceLinearZF,
            ("zc", "n_node"): UxLinearNodeConstantZC,
            ("zf", "n_node"): UxLinearNodeLinearZF,
        }

        fs = cls()
        scalar_fields: dict[str, Field] = {}
        skip = {"node_lon", "node_lat", "face_node_connectivity", "zf", "zc", "time"}
        for varname in ds.data_vars:
            if varname in skip or ds[varname].attrs.get("cf_role") == "grid_topology":
                continue
            da = ds[varname]
            dims = tuple(str(d) for d in da.dims)
            vdim = next((d for d in dims if d in ("zc", "zf")), None)
            ldim = next((d for d in dims if d in ("n_face", "n_node")), None)
            if vdim is None or ldim is None:
                continue
            order = [d for d in ("time", vdim, ldim) if d in dims]
            arr = np.asarray(da.values).transpose([dims.index(d) for d in order])
            if "time" not in dims:
                arr = arr[None]
            arr = _fillna(arr, fill_value)
            interp_cls = interp_by_dims[(vdim, ldim)]
            f = Field(str(varname), arr, grid, interp_method=interp_cls())
            scalar_fields[str(varname)] = f
            fs.add_field(f)

        if vector_fields is None:
            vector_fields = _default_vector_field_components(scalar_fields)
        for vname, components in vector_fields.items():
            if len(components) not in (2, 3):
                raise ValueError(
                    f"Vector field {vname!r} must have either 2 or 3 components; got {len(components)}."
                )
            for c in components:
                if c not in scalar_fields:
                    raise ValueError(f"Vector field {vname!r} component {c!r} not in dataset.")
            fs.add_field(
                VectorField(vname, *[scalar_fields[c] for c in components], interp_method=Ux_Velocity())
            )
        return fs

    # -- device pytree / engine spec ----------------------------------------
    def _invalidate_caches(self):
        object.__setattr__(self, "_device_cache", None)
        object.__setattr__(self, "_executor_cache", {})
        object.__setattr__(self, "_window_cache", {})

    # -- rolling time-window streaming (reference _windowed_array.py) --------
    def set_time_window(self, nlevels: int):
        """Stream fields to the device in a rolling window of ``nlevels`` time
        levels instead of resident-in-full.

        TPU equivalent of the reference's WindowedArray time cache
        (reference _core/_windowed_array.py:25-113): each output-interval
        chunk ships only the window of levels it needs; consecutive chunks
        at the same window reuse the on-device arrays, and because the
        window length is fixed the jitted executor never recompiles.
        Window advance overlaps the previous chunk's compute (the executor
        dispatch is async, so the next device_put runs while the TPU works).
        """
        if nlevels < 2:
            raise ValueError("Time window must hold at least 2 levels.")
        object.__setattr__(self, "_time_window", int(nlevels))
        self._apply_time_window()
        return self

    def to_windowed_arrays(self, *, max_levels: int | None = None):
        """Reference-named alias (fieldset.py:165): serve field data through a
        rolling time window instead of resident-in-full; returns self for
        chaining. ``max_levels`` caps the resident levels (default 2, the
        reference's steady-state footprint). No-op when no field has more
        time levels than the window, matching the reference's eager-field
        pass-through."""
        nlevels = max(2, max_levels or 2)
        if all(g.time.shape[0] <= nlevels for g in self._gridset):
            return self
        return self.set_time_window(nlevels)

    def _apply_time_window(self):
        import dataclasses

        for grid in self._gridset:
            if grid.time.shape[0] > 1:
                # windowed time values break the static uniform-origin fast
                # path; the windowed searchsorted over <=nlevels is cheap
                grid.spec = dataclasses.replace(grid.spec, time_uniform=None)
        self._invalidate_caches()
        object.__setattr__(self, "window_stats", {"loads": 0, "bytes_read": 0})

    def max_window_endtime(self, t: float, sign_dt: int) -> float:
        """Furthest chunk end time a window anchored at ``t`` can cover.

        The execute loop clamps each chunk to this, so windowed runs
        sub-chunk automatically instead of requiring outputdt to fit.
        """
        L = getattr(self, "_time_window", None)
        if L is None:
            return np.inf * sign_dt
        best = np.inf * sign_dt
        for grid in self._gridset:
            nt = grid.time.shape[0]
            if nt <= 1:
                continue
            if sign_dt >= 0:
                i0 = int(np.clip(np.searchsorted(grid.time, t, side="right") - 1, 0, max(nt - L, 0)))
                end = grid.time[min(i0 + L - 1, nt - 1)]
                if i0 + L >= nt:
                    end = np.inf
                best = min(best, end)
            else:
                i1 = int(np.clip(np.searchsorted(grid.time, t, side="left"), L - 1, nt - 1))
                start = grid.time[max(i1 - (L - 1), 0)]
                if i1 - (L - 1) <= 0:
                    start = -np.inf
                best = max(best, start)
        return best

    def _window_offsets(self, t_lo: float, t_hi: float, check: bool = True) -> tuple:
        """Per-grid first-level offsets of the window covering [t_lo, t_hi]."""
        L = self._time_window
        t_lo, t_hi = (t_lo, t_hi) if t_lo <= t_hi else (t_hi, t_lo)
        offsets = []
        for grid in self._gridset:
            nt = grid.time.shape[0]
            if nt <= 1:
                offsets.append(0)
                continue
            i0 = int(np.clip(np.searchsorted(grid.time, t_lo, side="right") - 1, 0, max(nt - L, 0)))
            if check and grid.time[min(i0 + L - 1, nt - 1)] < t_hi and i0 + L < nt:
                raise ValueError(
                    f"Time window of {L} levels cannot cover [{t_lo}, {t_hi}] s "
                    f"(levels span {grid.time[i0]}..{grid.time[min(i0 + L - 1, nt - 1)]}). "
                    "Increase the window or reduce outputdt."
                )
            offsets.append(i0)
        return tuple(offsets)

    def _build_window(self, offsets: tuple) -> dict:
        """Load the window slabs (host reads, possibly from zarr) and ship them."""
        L = self._time_window
        stats = getattr(self, "window_stats", {"loads": 0, "bytes_read": 0})
        farrays = {"fields": {}, "grids": []}
        for i0, grid in zip(offsets, self._gridset):
            garrs = grid.device_arrays()
            if grid.time.shape[0] > 1:
                garrs = dict(garrs)
                garrs["time"] = jnp.asarray(grid.time[i0 : i0 + L].astype(np.float32))
            farrays["grids"].append(garrs)
        for name, f in self._fields.items():
            if isinstance(f, Field):
                data = f.data
                if data.shape[0] > 1:
                    i0 = offsets[f.igrid]
                    window = np.ascontiguousarray(data[i0 : i0 + L])
                    stats["loads"] += 1
                    stats["bytes_read"] += window.nbytes
                    arr = jnp.asarray(window.astype(np.float32) if window.dtype.kind == "f" else window)
                else:
                    arr = jnp.asarray(data.astype(np.float32) if data.dtype.kind == "f" else data)
                farrays["fields"][name] = arr
        # NO eager table attach here (unlike device_arrays): window slabs
        # are built on the PREFETCH THREAD, and eager device transposes
        # from a second thread serialize against the running chunk —
        # measured 2.5x slower streamed config-5. The executor builds the
        # tables in-trace instead, amortized over the window's 36+ steps.
        object.__setattr__(self, "window_stats", stats)
        return farrays

    def prefetch_window(self, t_anchor: float) -> None:
        """Stage the window anchored at ``t_anchor`` on a background thread.

        Called by the execute loop right after dispatching a chunk, so the
        next window's disk reads + host->device transfer overlap the chunk's
        device compute (SURVEY §7 M3: double-buffered async time-level
        prefetch). A mispredicted anchor is harmless — `windowed_arrays`
        falls back to a synchronous load.
        """
        if self._time_window is None:
            return
        key = self._window_offsets(t_anchor, t_anchor, check=False)
        cache = getattr(self, "_window_cache", {})
        futures = getattr(self, "_window_futures", None)
        if key in cache or (futures is not None and key in futures):
            return
        if futures is None:
            futures = {}
            object.__setattr__(self, "_window_futures", futures)
        # bound mispredicted windows: drop finished futures nobody consumed
        if len(futures) >= 2:
            for k in [k for k, f in futures.items() if f.done()]:
                futures.pop(k)
        pool = getattr(self, "_window_pool", None)
        if pool is None:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=1, thread_name_prefix="parcels-window")
            object.__setattr__(self, "_window_pool", pool)
        futures[key] = pool.submit(self._build_window, key)

    def windowed_arrays(self, t_lo: float, t_hi: float) -> dict:
        """Device pytree whose time axes cover [t_lo, t_hi] (window mode)."""
        if self._time_window is None:
            return self.device_arrays()
        key = self._window_offsets(t_lo, t_hi)
        cache = getattr(self, "_window_cache", {})
        futures = getattr(self, "_window_futures", {}) or {}
        if key not in cache:
            fut = futures.pop(key, None)
            cache[key] = fut.result() if fut is not None else self._build_window(key)
        farrays = cache.pop(key)
        # keep at most the current window + one prefetched successor resident
        cache.clear()
        cache[key] = farrays
        object.__setattr__(self, "_window_cache", cache)
        return farrays

    def device_arrays(self, dtype=np.float32, sharding=None) -> dict:
        """Ship all field data + grid coords to device; cached after first call."""
        if self._device_cache is not None:
            return self._device_cache
        farrays = {"fields": {}, "grids": []}
        for grid in self._gridset:
            farrays["grids"].append(grid.device_arrays(dtype))
        for name, f in self._fields.items():
            if isinstance(f, Field):
                if getattr(f.data, "_parcels_lazy", False) and f.data.nbytes > 4 << 30:
                    raise ValueError(
                        f"Field {name!r} is disk-backed and {f.data.nbytes/2**30:.1f} GiB; "
                        "call fieldset.set_time_window(nlevels) to stream it instead of "
                        "materializing it whole."
                    )
                arr = jnp.asarray(f.data.astype(dtype) if f.data.dtype.kind == "f" else f.data)
                if sharding is not None:
                    arr = jax.device_put(arr, sharding)
                farrays["fields"][name] = arr
        from parcels_tpu.ops.stagecache import attach_derived_tables

        attach_derived_tables(self, farrays)
        object.__setattr__(self, "_device_cache", farrays)
        return farrays

    def build_views(self, farrays: dict) -> "FieldSetView":
        """Rebuild traced field views inside a jitted function."""
        grid_views = []
        for i, grid in enumerate(self._gridset):
            grid_views.append(grid.make_view(farrays["grids"][i]))
        coltables = farrays.get("coltables", {})
        celltables = farrays.get("celltables", {})
        views: dict[str, object] = {}
        for name, f in self._fields.items():
            if isinstance(f, Field):
                has_time = f.data.shape[0] > 1
                views[name] = FieldView(
                    name, farrays["fields"][name], grid_views[f.igrid], f.igrid, f.interp_method, has_time
                )
                if name in coltables:
                    # pre-seed the derived-table cache: built once per
                    # farrays by stagecache.attach_derived_tables instead of
                    # per chunk trace (a ~453 ms/chunk transpose at config-5)
                    views[name]._col_table = coltables[name]
        from parcels_tpu.ops.stagecache import soa_cache_owner
        from parcels_tpu.ops.uxcache import soa_cache_owner as ux_cache_owner

        sc_owner, _ = soa_cache_owner(self)
        uxc_owner, _ = ux_cache_owner(self)
        for name, f in self._fields.items():
            if isinstance(f, VectorField):
                views[name] = VectorFieldView(
                    name,
                    views[f.U.name],
                    views[f.V.name],
                    views[f.W.name] if f.W is not None else None,
                    f.interp_method,
                    sc_owner=(name == sc_owner or name == uxc_owner),
                )
                if f.igrid in celltables:
                    views[name]._cell_table = celltables[f.igrid]
        return FieldSetView(views, dict(self.context))

    def eval(self, name: str, t, z, y, x):
        """Host-side convenience sampling of a field by name.

        Mirrors the reference's interactive ``fieldset.U.eval(t, z, y, x)``
        usage (reference field.py:145): builds the traced views on demand
        and returns numpy values. ``t`` is float seconds since the fieldset
        time origin (or datetime64/timedelta64).
        """
        from parcels_tpu._core.timeutils import timedelta_to_float

        t = np.atleast_1d(np.asarray(t))
        if np.issubdtype(t.dtype, np.datetime64):
            if self.time_interval is None:
                raise ValueError("datetime sampling requires a fieldset time interval")
            t = timedelta_to_float(t - np.datetime64(self.time_interval.left, "ns"))
        elif np.issubdtype(t.dtype, np.timedelta64):
            t = timedelta_to_float(t)
        x = np.atleast_1d(np.asarray(x, dtype=np.float32))
        y = np.atleast_1d(np.asarray(y, dtype=np.float32))
        z = np.atleast_1d(np.asarray(z, dtype=np.float32))
        t, z, y, x = np.broadcast_arrays(t.astype(np.float64), z, y, x)
        fsv = self.build_views(self.device_arrays())
        out = getattr(fsv, name).eval(jnp.asarray(t), jnp.asarray(z), jnp.asarray(y), jnp.asarray(x))
        if isinstance(out, tuple):
            return tuple(np.asarray(o) for o in out)
        return np.asarray(out)

    def memory_report(
        self,
        particles: int = 0,
        device_bytes: int | None = None,
        bands: int = 1,
    ) -> dict:
        """Analytic HBM budget for this fieldset on one chip (no allocation).

        Accounts for everything the executor ships to the device: field
        windows (``time_window`` levels when streaming, else the full time
        axis), grid coordinate arrays, the curvilinear search tables
        (pic_table 16 f32/cell, index_search.py:256; cgrid_geom 9 f32/cell,
        grid.py cgrid_geometry), the lookup raster, the corner-column
        sampler's transposed field copies (ops/colgather.py — active for
        HBM-scale fields), and the particle SoA. ``bands`` divides the
        Y-extent (YBandDomain decomposition across chips). At the true MOi
        1/12-degree resolution (4322 x 3059) the tables alone are ~1.3 GB
        and a 2-level U/V window ~10.6 GB — this report is how a user (and
        ``describe``) sees that BEFORE an opaque device OOM.
        """
        from parcels_tpu._core.field import Field
        from parcels_tpu.ops.colgather import colgather_usable
        from parcels_tpu.ops.interp_kernels import fits_fast_path

        W = self._time_window
        fields = {}
        col_tables = 0
        for name, f in self._fields.items():
            if not isinstance(f, Field) or getattr(f.data, "ndim", 0) != 4:
                continue
            T, Z, Y, X = f.data.shape
            levels = min(W, T) if W else T
            b = levels * Z * -(-Y // bands) * X * 4
            fields[name] = b
            if colgather_usable((levels, Z, -(-Y // bands), X)) and not fits_fast_path(
                f.data.shape
            ):
                col_tables += b
        grids = []
        for g in self._gridset:
            spec = getattr(g, "spec", None)
            entry = {"coords": 0, "pic_table": 0, "cgrid_geom": 0, "lookup": 0}
            for attr in ("lon", "lat", "depth", "time"):
                a = getattr(g, attr, None)
                if a is not None:
                    entry["coords"] += int(np.asarray(a).size) * 4
            if spec is not None and spec.curvilinear:
                cells = max(spec.ydim, 1) * max(spec.xdim, 1) // max(bands, 1)
                entry["pic_table"] = cells * 16 * 4
                if getattr(g, "_needs_cgrid_geom", False):
                    entry["cgrid_geom"] = cells * 9 * 4
            lk = getattr(g, "_lookup", None)
            if lk is not None:
                entry["lookup"] = int(lk["yi"].size + lk["xi"].size) * 4
            grids.append(entry)
        soa = particles * 4 * (13 + len(self._gridset))
        total = sum(fields.values()) + col_tables + soa
        total += sum(sum(e.values()) for e in grids)
        if device_bytes is None:
            device_bytes = 16 * 2**30  # v5e HBM
            try:
                stats = jax.devices()[0].memory_stats()
                if stats and "bytes_limit" in stats:
                    device_bytes = int(stats["bytes_limit"])
            except Exception:
                pass
        return {
            "fields": fields,
            "col_tables": col_tables,
            "grids": grids,
            "soa": soa,
            "total": total,
            "device_bytes": device_bytes,
            "fits": total <= device_bytes,
        }

    def _repr_sections(self) -> list:
        """Sectioned repr (reference fieldset_repr, _repr_utils.py:25-44)."""
        from parcels_tpu._core.field import VectorField

        fields = [
            f"{name}: {f!r} interp={type(f.interp_method).__name__ if f.interp_method else '-'}"
            for name, f in self._fields.items()
            if not isinstance(f, VectorField)
        ]
        vfields = [
            f"{name}: {f!r} interp={type(f.interp_method).__name__ if f.interp_method else '-'}"
            for name, f in self._fields.items()
            if isinstance(f, VectorField)
        ]
        misc = []
        if self.context:
            misc.append(f"context: {self.context}")
        if self.time_interval is not None:
            misc.append(f"time_interval: {self.time_interval!r}")
        if self._time_window is not None:
            misc.append(f"time_window: {self._time_window} levels (streaming)")
        try:
            mem = self.memory_report()
            line = (
                f"device memory: {mem['total'] / 2**30:.2f} GiB of "
                f"{mem['device_bytes'] / 2**30:.0f} GiB (fields + search tables)"
            )
            if not mem["fits"]:
                line += "  ** OVER BUDGET: use set_time_window / YBandDomain **"
            misc.append(line)
        except Exception:
            pass
        grids = [f"grid[{i}]: {g!r}" for i, g in enumerate(self._gridset)]
        return [
            ("fields", fields),
            ("vectorfields", vfields),
            ("grids", grids),
            ("simulation", misc),
        ]

    def describe(self, buf=None) -> None:
        import sys

        buf = buf or sys.stdout
        buf.write(repr(self) + "\n")

    def __repr__(self) -> str:
        from parcels_tpu._repr import format_sections

        return format_sections(type(self).__name__, self._repr_sections())

    def _repr_html_(self) -> str:
        from parcels_tpu._repr import html_sections

        return html_sections(type(self).__name__, self._repr_sections())


class FieldSetView:
    """The ``fieldset`` object seen by kernels inside the jitted engine."""

    __slots__ = ("_views", "_context")

    def __init__(self, views: dict, context: dict):
        object.__setattr__(self, "_views", views)
        object.__setattr__(self, "_context", context)

    def __getattr__(self, name):
        if name in self._views:
            return self._views[name]
        if name in self._context:
            return self._context[name]
        raise AttributeError(f"FieldSet has no attribute {name!r}")

    @property
    def fields(self):
        return self._views
