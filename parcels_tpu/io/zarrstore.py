"""Zarr dataset reader/writer on tensorstore, with lazy time-windowed reads.

Capability parity with the reference's out-of-core field ingestion
(reference src/parcels/_xarray.py:13-36 `open_raw_zarr` and the dask-backed
xarray path in _core/model.py:79-113): forcing fields larger than host
memory are opened *lazily* and only the rolling time window the simulation
currently needs is ever read from disk (reference
_core/_windowed_array.py:25-113).

TPU-first differences from the reference design:

- **tensorstore instead of dask/zarr-python.** tensorstore issues chunk
  reads in parallel from C++ with no task-graph overhead, and is already in
  the JAX ecosystem (orbax checkpoints). A window read is one
  ``store[i0:i0+L].read()`` — no graph construction, no scheduler.
- **Normalization is recorded, not applied.** Ingestion normalizes every
  field to dense (T, Z, Y, X) (fieldset.py `_transpose_to_tzyx`); for a
  lazy array the axis permutation / singleton insertion / NaN fill are
  recorded on the handle and applied per *window* after the (small) read.

Layout: a zarr v2 group directory; each member array carries the xarray
``_ARRAY_DIMENSIONS`` attribute. Coordinate arrays (anything 1-D named
after its own dimension, or listed in the group's ``coordinates`` attr)
are read eagerly — they are tiny and the grid needs them at build time.
Data variables become `LazyZarrArray`s. CF-encoded time coordinates
("<unit> since <epoch>") decode to np.datetime64; bare duration units
decode to np.timedelta64 (matching `timeutils`' accepted inputs).
"""

from __future__ import annotations

import json
import os
import re

import numpy as np

from parcels_tpu import xrlite as xr

__all__ = ["LazyZarrArray", "open_raw_zarr", "open_zarr_dataset", "write_zarr_dataset"]

_CF_TIME_RE = re.compile(
    r"^\s*(second|sec|s|minute|min|hour|hr|h|day|d)s?\s+since\s+(.+?)\s*$", re.IGNORECASE
)
_UNIT_CODE = {
    "second": "s", "sec": "s", "s": "s",
    "minute": "m", "min": "m",
    "hour": "h", "hr": "h", "h": "h",
    "day": "D", "d": "D",
}
_BARE_DURATION = {"second", "sec", "s", "seconds", "minute", "minutes", "min",
                  "hour", "hours", "hr", "h", "day", "days", "d"}


def _ts():
    import tensorstore

    return tensorstore


def _open_store(path: str):
    """Open one zarr array (v2 by default, v3 if zarr.json is present)."""
    driver = "zarr3" if os.path.exists(os.path.join(path, "zarr.json")) else "zarr"
    return _ts().open({"driver": driver, "kvstore": {"driver": "file", "path": path}}).result()


class LazyZarrArray:
    """Lazy view of one zarr array, normalized to the engine's axis order.

    Duck-types the slice of numpy the FieldSet windowing path uses:
    ``.shape/.dtype/.ndim``, time-leading ``__getitem__`` returning dense
    numpy, ``__array__``/``astype`` full materialization. The TZYX
    normalization (``perm`` axis permutation + ``out_shape`` singleton
    insertion) and NaN fill are applied to each window after the read.
    """

    _parcels_lazy = True

    def __init__(self, store, perm=None, out_shape=None, t_store=None, fill=None, name=None):
        self._store = store
        self._perm = tuple(perm) if perm is not None else tuple(range(store.ndim))
        self._out_shape = (
            tuple(out_shape)
            if out_shape is not None
            else tuple(store.shape[i] for i in self._perm)
        )
        if int(np.prod(self._out_shape)) != int(np.prod(store.shape)):
            raise ValueError(
                f"Normalized shape {self._out_shape} incompatible with store shape {store.shape}"
            )
        # store axis that carries time (None for time-invariant fields);
        # a freshly opened, un-normalized array is sliceable on store axis 0
        self._t_store = t_store if out_shape is not None else 0
        self._fill = fill
        self.name = name

    # -- construction of derived views (used by ingestion) -------------------
    def with_tzyx(self, perm, out_shape, t_store) -> "LazyZarrArray":
        return LazyZarrArray(self._store, perm, out_shape, t_store, self._fill, self.name)

    def with_fill(self, fill_value) -> "LazyZarrArray":
        return LazyZarrArray(
            self._store, self._perm, self._out_shape, self._t_store, fill_value, self.name
        )

    # -- numpy-facing surface -------------------------------------------------
    @property
    def shape(self):
        return self._out_shape

    @property
    def ndim(self):
        return len(self._out_shape)

    @property
    def dtype(self):
        return np.dtype(self._store.dtype.numpy_dtype)

    @property
    def size(self):
        return int(np.prod(self._out_shape))

    @property
    def nbytes(self):
        return int(np.prod(self._out_shape)) * self.dtype.itemsize

    def _normalize(self, raw: np.ndarray) -> np.ndarray:
        raw = raw.transpose(self._perm)
        # raw now has the normalized axis order with the (possibly partial)
        # time extent leading; reshape inserts the singleton axes
        out = raw.reshape([raw.shape[0] if self._t_store is not None else 1]
                          + list(self._out_shape[1:]))
        if self._fill is not None and out.dtype.kind == "f":
            out = np.nan_to_num(out, nan=self._fill)
        return out

    def __getitem__(self, idx) -> np.ndarray:
        """Read a time window. idx is an int or slice on the leading axis."""
        if isinstance(idx, tuple):
            if len(idx) != 1:
                raise IndexError(
                    "LazyZarrArray supports leading-axis (time) indexing only; "
                    "materialize with np.asarray() for full access."
                )
            idx = idx[0]
        scalar = isinstance(idx, (int, np.integer))
        if scalar:
            idx = slice(int(idx), int(idx) + 1)
        if not isinstance(idx, slice):
            raise IndexError(f"Unsupported index {idx!r} for LazyZarrArray")
        sel = [slice(None)] * self._store.ndim
        if self._t_store is not None:
            sel[self._t_store] = idx
        elif not (idx.start in (None, 0) and idx.stop in (None, 1)):
            raise IndexError("Array has no time axis; only [0:1] is valid.")
        raw = np.asarray(self._store[tuple(sel)].read().result())
        out = self._normalize(raw)
        return out[0] if scalar else out

    def __array__(self, dtype=None):
        full = self[0 : self._out_shape[0]]
        return full.astype(dtype) if dtype is not None else full

    def astype(self, dtype):
        return self.__array__(np.dtype(dtype))

    def copy(self):
        return self

    def __repr__(self):
        return f"<LazyZarrArray {self.name!r} shape={self._out_shape} dtype={self.dtype}>"


def _decode_cf_values(values: np.ndarray, attrs: dict) -> np.ndarray:
    """Decode CF time units to datetime64/timedelta64 (reference: cftime)."""
    units = attrs.get("units")
    if not isinstance(units, str) or values.dtype.kind not in "ifu":
        return values
    m = _CF_TIME_RE.match(units)
    if m:
        code = _UNIT_CODE[m.group(1).lower()]
        epoch = np.datetime64(m.group(2).strip().replace(" ", "T").rstrip("Z"), code)
        return epoch + values.astype(np.int64).astype(f"timedelta64[{code}]")
    if units.strip().lower() in _BARE_DURATION:
        u = units.strip().lower().rstrip("s")
        code = _UNIT_CODE.get(u, None)
        if code is not None:
            return values.astype(np.int64).astype(f"timedelta64[{code}]")
    return values


def open_zarr_dataset(path: str, decode_times: bool = True) -> xr.Dataset:
    """Open a zarr group as an xrlite Dataset with lazy data variables.

    Equivalent of the reference's `open_raw_zarr` + xarray lazy ingestion
    (reference _xarray.py:13-36): coordinates load eagerly, data variables
    stay on disk until the simulation's rolling time window requests them.
    """
    path = os.fspath(path)
    if not os.path.isdir(path):
        raise FileNotFoundError(path)
    group_attrs = {}
    gattr_file = os.path.join(path, ".zattrs")
    if os.path.exists(gattr_file):
        with open(gattr_file) as f:
            group_attrs = json.load(f)

    members = sorted(
        name
        for name in os.listdir(path)
        if os.path.exists(os.path.join(path, name, ".zarray"))
        or os.path.exists(os.path.join(path, name, "zarr.json"))
    )
    if not members:
        raise ValueError(f"No zarr arrays found under {path!r}")

    declared_coords = set(str(group_attrs.get("coordinates", "")).split())
    arrays: dict[str, tuple] = {}
    for name in members:
        apath = os.path.join(path, name)
        attrs = {}
        af = os.path.join(apath, ".zattrs")
        if os.path.exists(af):
            with open(af) as f:
                attrs = json.load(f)
        dims = attrs.pop("_ARRAY_DIMENSIONS", None)
        store = _open_store(apath)
        if dims is None:
            dims = [f"dim_{i}" for i in range(store.ndim)]
        arrays[name] = (store, tuple(str(d) for d in dims), attrs)

    data_vars: dict[str, xr.DataArray] = {}
    coords: dict[str, xr.DataArray] = {}
    for name, (store, dims, attrs) in arrays.items():
        is_coord = (
            name in declared_coords
            or (store.ndim == 1 and len(dims) == 1 and dims[0] == name)
            or attrs.get("cf_role") == "grid_topology"
        )
        if is_coord or store.ndim <= 2 or attrs.get("cf_role"):
            values = np.asarray(store.read().result())
            if decode_times:
                values = _decode_cf_values(values, attrs)
            da = xr.DataArray(values, dims, attrs, name)
        else:
            da = xr.DataArray(LazyZarrArray(store, name=name), dims, attrs, name)
        (coords if is_coord else data_vars)[name] = da

    ds = xr.Dataset()
    ds.data_vars = data_vars
    ds.coords = coords
    ds.attrs = {k: v for k, v in group_attrs.items() if k != "coordinates"}
    ds._check_dims()
    return ds


def open_raw_zarr(store, decode_times: bool = True) -> xr.Dataset:
    """Open a zarr store as a Dataset with lazy, dask-free data variables.

    Name/behavior parity with the reference's ``parcels.open_raw_zarr``
    (reference _xarray.py:13-36): coordinates load eagerly, data variables
    are raw lazy handles (here tensorstore-backed rather than zarr.Array).
    Accepts a filesystem path or any store object exposing ``.root`` or
    ``.path`` (e.g. a zarr ``LocalStore``).
    """
    path = getattr(store, "root", None) or getattr(store, "path", None) or store
    return open_zarr_dataset(os.fspath(path), decode_times=decode_times)


def write_zarr_dataset(ds, path: str, chunk_time: int = 1) -> None:
    """Write an (xrlite or xarray) Dataset to a zarr v2 group directory.

    Data variables are chunked ``chunk_time`` levels at a time along any
    leading 'time' dimension so windowed readers only touch the levels they
    need. Times encode as CF 'seconds since <epoch>' / 'seconds'.
    """
    ts = _ts()
    path = os.fspath(path)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    coords = dict(getattr(ds, "coords", {}))
    data_vars = dict(getattr(ds, "data_vars", {}))
    attrs = dict(getattr(ds, "attrs", {}) or {})
    if coords:
        attrs["coordinates"] = " ".join(sorted(str(k) for k in coords))
    clean_attrs = {k: v for k, v in attrs.items() if _json_safe(v)}
    with open(os.path.join(path, ".zattrs"), "w") as f:
        json.dump(clean_attrs, f)

    for name, da in {**coords, **data_vars}.items():
        values = np.asarray(da.values)
        var_attrs = dict(getattr(da, "attrs", {}) or {})
        if values.dtype.kind == "M":  # datetime64 -> CF int64
            base = values.astype("datetime64[s]")
            epoch = base.min()
            var_attrs["units"] = f"seconds since {np.datetime_as_string(epoch, unit='s')}"
            values = (base - epoch).astype("timedelta64[s]").astype(np.int64)
        elif values.dtype.kind == "m":  # timedelta64 -> CF 'seconds'
            values = values.astype("timedelta64[s]").astype(np.int64)
            var_attrs["units"] = "seconds"
        apath = os.path.join(path, str(name))
        chunks = list(values.shape)
        dims = tuple(getattr(da, "dims", ()) or ())
        if dims and dims[0] == "time" and values.ndim > 1:
            chunks[0] = min(chunk_time, values.shape[0])
        spec = {
            "driver": "zarr",
            "kvstore": {"driver": "file", "path": apath},
            "metadata": {
                "shape": list(values.shape),
                "chunks": chunks,
                "dtype": values.dtype.str,
            },
            "create": True,
            "delete_existing": True,
        }
        store = ts.open(spec).result()
        store[...] = values
        var_attrs["_ARRAY_DIMENSIONS"] = [str(d) for d in dims] if dims else [
            f"dim_{i}" for i in range(values.ndim)
        ]
        with open(os.path.join(apath, ".zattrs"), "w") as f:
            json.dump({k: v for k, v in var_attrs.items() if _json_safe(v)}, f)


def _json_safe(v) -> bool:
    try:
        json.dumps(v)
        return True
    except TypeError:
        return False
