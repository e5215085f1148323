"""Host-side dataset I/O (zarr via tensorstore).

The reference reads forcing fields through xarray+dask+zarr
(reference _xarray.py:13-36, pyproject.toml:23-35). This build's
equivalent is tensorstore — the chunked-array I/O library used across the
JAX ecosystem — feeding the same rolling time-window device streaming
(`FieldSet.set_time_window`).
"""

from parcels_tpu.io.netcdfstore import (
    open_netcdf_dataset,
    write_netcdf_dataset,
)
from parcels_tpu.io.zarrstore import (
    LazyZarrArray,
    open_raw_zarr,
    open_zarr_dataset,
    write_zarr_dataset,
)

__all__ = [
    "LazyZarrArray",
    "open_netcdf_dataset",
    "open_raw_zarr",
    "open_zarr_dataset",
    "write_netcdf_dataset",
    "write_zarr_dataset",
]
