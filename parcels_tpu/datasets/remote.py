"""Remote-dataset registry (capability parity with reference
_datasets/remote.py:205-320).

The reference downloads these through pooch; this build's container has zero
network egress, so the registry serves three tiers:

1. **Local-equivalent** entries (the benchmark datasets): generated in
   memory at reduced resolution with the same structure — MOi-shaped global
   curvilinear C-grid (datasets/moi.py) and a FESOM2-style unstructured set.
2. **Cache-backed** entries: if ``PARCELS_DATA_HOME`` (default
   ``~/.parcels_tpu_data``) contains a previously-downloaded file of the
   registry name, it is opened from there.
3. Everything else raises a clear no-egress error naming the registry entry,
   so user code written against the reference's
   ``open_remote_dataset``/``list_remote_datasets`` API ports unchanged and
   fails informatively rather than mysteriously.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Literal

__all__ = ["list_remote_datasets", "open_remote_dataset"]

_TUTORIAL = "tutorial"
_TESTING = "testing"

# Registry names mirror reference _datasets/remote.py:214-258 exactly.
_REGISTRY: dict[str, str] = {
    "MITgcm_example_data/mitgcm_UV_surface_zonally_reentrant": _TUTORIAL,
    "CopernicusMarine_data_for_Argo_tutorial/data": _TUTORIAL,
    "Delft3D_data/Rotterdam_tiny": _TUTORIAL,
    "CopernicusMarine_data_for_stuck_particles_tutorial/data": _TUTORIAL,
    "FESOM_periodic_channel/fesom_channel": _TUTORIAL,
    "FESOM_periodic_channel/u.fesom_channel": _TUTORIAL,
    "FESOM_periodic_channel/v.fesom_channel": _TUTORIAL,
    "FESOM_periodic_channel/w.fesom_channel": _TUTORIAL,
    "SCHISM_LakeOntario/out2d": _TUTORIAL,
    "SCHISM_LakeOntario/horizontalVelX": _TUTORIAL,
    "SCHISM_LakeOntario/horizontalVelY": _TUTORIAL,
    "NemoCurvilinear_data_zonal/U": _TUTORIAL,
    "NemoCurvilinear_data_zonal/V": _TUTORIAL,
    "NemoCurvilinear_data_zonal/mesh_mask": _TUTORIAL,
    "NemoNorthSeaORCA025-N006_data/U": _TUTORIAL,
    "NemoNorthSeaORCA025-N006_data/V": _TUTORIAL,
    "NemoNorthSeaORCA025-N006_data/W": _TUTORIAL,
    "NemoNorthSeaORCA025-N006_data/mesh_mask": _TUTORIAL,
    "CROCOidealized_data/data": _TUTORIAL,
    "Benchmarks_FESOM2-baroclinic-gyre/data": _TESTING,
    "Benchmarks_FESOM2-baroclinic-gyre/grid": _TESTING,
    "Benchmarks_MOi_data_metadata-only/U": _TESTING,
    "Benchmarks_MOi_data_metadata-only/V": _TESTING,
    "Benchmarks_MOi_data_metadata-only/W": _TESTING,
    "Benchmarks_MOi_data_metadata-only/mesh": _TESTING,
}


def _data_home() -> Path:
    return Path(os.environ.get("PARCELS_DATA_HOME", "~/.parcels_tpu_data")).expanduser()


def _moi_component(component: str):
    """Reduced-resolution MOi-shaped local equivalent (the real entry is
    metadata-only zarr of the global 1/12-degree MOi fields)."""
    from parcels_tpu import xrlite as xr
    from parcels_tpu.datasets.moi import moi_like_inputs

    fields, coords = moi_like_inputs(xdim=120, ydim=80, zdim=8, tdim=2)
    if component == "mesh":
        return coords
    if component == "W":
        import numpy as np

        u = fields["vozocrtx"]
        name, da = "vovecrtz", xr.DataArray(
            1e-4 * np.asarray(u.values), ("time_counter", "depthw", "y", "x"),
            {"units": "m s-1", "standard_name": "upward_sea_water_velocity"}, name="vovecrtz")
    else:
        name = {"U": "vozocrtx", "V": "vomecrty"}[component]
        da = fields[name]
    ds = xr.Dataset({name: da}, coords={
        "time_counter": coords["time_counter"],
        "depthw": coords["depthw"],
    })
    return ds


def _fesom2_gyre(which: str):
    """FESOM2 baroclinic-gyre-shaped local equivalent (unstructured)."""
    from parcels_tpu.datasets.unstructured import fesom2_style_dataset

    return fesom2_style_dataset(which=which)


_LOCAL_EQUIVALENTS = {
    "Benchmarks_MOi_data_metadata-only/U": lambda: _moi_component("U"),
    "Benchmarks_MOi_data_metadata-only/V": lambda: _moi_component("V"),
    "Benchmarks_MOi_data_metadata-only/W": lambda: _moi_component("W"),
    "Benchmarks_MOi_data_metadata-only/mesh": lambda: _moi_component("mesh"),
    "Benchmarks_FESOM2-baroclinic-gyre/data": lambda: _fesom2_gyre("data"),
    "Benchmarks_FESOM2-baroclinic-gyre/grid": lambda: _fesom2_gyre("grid"),
}


def list_remote_datasets(purpose: Literal["testing", "tutorial", "any"] = "any") -> list[str]:
    """Names of registered remote datasets (reference remote.py:260-282)."""
    if purpose == "any":
        return list(_REGISTRY)
    if purpose not in (_TESTING, _TUTORIAL):
        raise ValueError(f"purpose must be 'testing', 'tutorial' or 'any'. Got {purpose!r}")
    return [k for k, p in _REGISTRY.items() if p == purpose]


#: upstream data repository the reference fetches from via pooch
#: (reference _datasets/remote.py:14-16, 129-133)
_DATA_REPO_TAG = os.environ.get("PARCELS_DATA_REPO_TAG", "v2025.08.28")
_DATA_URL = f"https://github.com/Parcels-code/parcels-data/raw/{_DATA_REPO_TAG}"


def _try_download(name: str) -> "Path | None":
    """Fetch a registry entry from the upstream data repo into the cache.

    Mirrors the reference's pooch layout: NetCDF entries live under
    ``data/<name>.nc``, zarr entries as ``data-zarr/<name>.zip`` (unzipped
    into the cache). Any network failure returns None — this container has
    zero egress, so the caller falls through to the local-equivalent tier;
    with egress present this is the reference's download path
    (remote.py:19-258). Disable outright with PARCELS_NO_DOWNLOAD=1.
    """
    if os.environ.get("PARCELS_NO_DOWNLOAD"):
        return None
    import io
    import urllib.request
    import zipfile

    home = _data_home()
    for url, kind in (
        (f"{_DATA_URL}/data/{name}.nc", "nc"),
        (f"{_DATA_URL}/data-zarr/{name}.zip", "zarr"),
    ):
        try:
            with urllib.request.urlopen(url, timeout=15) as resp:
                blob = resp.read()
        except OSError:
            continue
        target = home / name
        target.parent.mkdir(parents=True, exist_ok=True)
        if kind == "nc":
            out = target.with_suffix(".nc")
            out.write_bytes(blob)
            return out
        out = target.with_suffix(".zarr")
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            zf.extractall(out)
        return out
    return None


def open_remote_dataset(name: str, purpose: Literal["testing", "tutorial", "any"] = "any"):
    """Open a registered remote dataset (reference remote.py:284-320).

    Resolution order: local cache under ``PARCELS_DATA_HOME`` -> download
    from the upstream data repo (when egress exists) -> generated local
    equivalent (benchmark entries) -> no-egress error.
    """
    if name not in _REGISTRY:
        available = list_remote_datasets(purpose)
        raise ValueError(f"Unknown remote dataset {name!r}. Available: {available}")

    cached = _data_home() / name
    for candidate in (cached, cached.with_suffix(".nc"), cached.with_suffix(".zarr")):
        if candidate.exists():
            if candidate.suffix == ".zarr" or candidate.is_dir():
                from parcels_tpu.io import open_zarr_dataset

                return open_zarr_dataset(candidate)
            from parcels_tpu.io import open_netcdf_dataset

            return open_netcdf_dataset(candidate)

    fetched = _try_download(name)
    if fetched is not None:
        if fetched.suffix == ".zarr":
            from parcels_tpu.io import open_zarr_dataset

            return open_zarr_dataset(fetched)
        from parcels_tpu.io import open_netcdf_dataset

        return open_netcdf_dataset(fetched)

    if name in _LOCAL_EQUIVALENTS:
        import warnings

        warnings.warn(
            f"No network egress: serving a generated reduced-resolution local "
            f"equivalent of {name!r}.",
            UserWarning,
            stacklevel=2,
        )
        return _LOCAL_EQUIVALENTS[name]()

    raise RuntimeError(
        f"Remote dataset {name!r} requires network access, which this environment "
        f"does not have. Place the file under {_data_home() / name} to use a local copy."
    )
