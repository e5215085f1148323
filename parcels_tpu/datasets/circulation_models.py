"""Miniature datasets mimicking real circulation-model output conventions.

Capability parity with reference src/parcels/_datasets/structured/
circulation_models.py: small in-memory datasets carrying each model's
*native* variable/dimension naming, for exercising the ``parcels_tpu.convert``
normalizers end-to-end without network downloads.

Each function returns ``(fields, coords)`` ready to pass to the matching
``convert.*_to_sgrid`` function.
"""

from __future__ import annotations

import numpy as np

from parcels_tpu import xrlite as xr

__all__ = [
    "copernicusmarine_style",
    "croco_style",
    "delft3d_style",
    "mitgcm_style",
    "nemo_style",
]


def _times(n=2):
    return np.array([np.datetime64("2000-01-01") + np.timedelta64(i, "D") for i in range(n)])


def nemo_style(nx=8, ny=6, nz=3, nt=2, u=0.1, v=0.0):
    """NEMO naming: uo/vo on (time, depthu/v, y, x); glamf/gphif f-points."""
    glamf = np.broadcast_to(np.linspace(0, 7, nx), (ny, nx)).copy()
    gphif = np.broadcast_to(np.linspace(40, 45, ny)[:, None], (ny, nx)).copy()
    fields = {
        "U": xr.DataArray(
            np.full((nt, nz, ny, nx), u, np.float32), dims=("time", "depthu", "y", "x"), name="U"
        ),
        "V": xr.DataArray(
            np.full((nt, nz, ny, nx), v, np.float32), dims=("time", "depthv", "y", "x"), name="V"
        ),
    }
    coords = xr.Dataset(
        coords={
            "time": (("time",), _times(nt)),
            "glamf": (("y", "x"), glamf),
            "gphif": (("y", "x"), gphif),
            "depthw": (("depthw",), np.linspace(0, 100, nz)),
        }
    )
    return fields, coords


def mitgcm_style(nx=10, ny=10, nz=3, nt=2, u=1.0, v=0.0, extent=9000.0):
    """MITgcm naming: XG/YG node coords, Zl decreasing depth."""
    fields = {
        "U": xr.DataArray(
            np.full((nt, nz, ny, nx), u, np.float32), dims=("time", "Zl", "YG", "XG"), name="U"
        ),
        "V": xr.DataArray(
            np.full((nt, nz, ny, nx), v, np.float32), dims=("time", "Zl", "YG", "XG"), name="V"
        ),
    }
    coords = xr.Dataset(
        coords={
            "time": (("time",), _times(nt)),
            "XG": (("XG",), np.linspace(0, extent, nx), {"units": "m"}),
            "YG": (("YG",), np.linspace(0, extent, ny), {"units": "m"}),
            "Zl": (("Zl",), np.linspace(100, 0, nz)),
        }
    )
    return fields, coords


def croco_style(nx=6, ny=6, nz=4, nt=3, u=1.0, v=0.0, extent=5000.0):
    """CROCO naming: x_rho/y_rho 2-D coords, s_w sigma levels, float time."""
    x_rho = np.broadcast_to(np.linspace(0, extent, nx), (ny, nx)).copy()
    y_rho = np.broadcast_to(np.linspace(0, extent, ny)[:, None], (ny, nx)).copy()
    fields = {
        "U": xr.DataArray(
            np.full((nt, nz, ny, nx - 1), u, np.float32),
            dims=("time", "s_rho", "eta_rho", "xi_u"),
            name="U",
        ),
        "V": xr.DataArray(
            np.full((nt, nz, ny - 1, nx), v, np.float32),
            dims=("time", "s_rho", "eta_v", "xi_rho"),
            name="V",
        ),
    }
    coords = xr.Dataset(
        coords={
            "time": (("time",), np.arange(nt) * 3600.0, {"units": "seconds"}),
            "x_rho": (("eta_rho", "xi_rho"), x_rho, {"units": "m"}),
            "y_rho": (("eta_rho", "xi_rho"), y_rho, {"units": "m"}),
            "s_w": (("s_w",), np.linspace(-1, 0, nz)),
        }
    )
    return fields, coords


def copernicusmarine_style(nx=8, ny=8, nz=3, nt=2, u=1.0, v=0.0, extent=10000.0):
    """Copernicus Marine naming: longitude/latitude/depth/time A-grid."""
    dims = ("time", "depth", "latitude", "longitude")
    fields = {
        "U": xr.DataArray(np.full((nt, nz, ny, nx), u, np.float32), dims=dims, name="U"),
        "V": xr.DataArray(np.full((nt, nz, ny, nx), v, np.float32), dims=dims, name="V"),
    }
    coords = xr.Dataset(
        coords={
            "time": (("time",), _times(nt)),
            "depth": (("depth",), np.linspace(0, 100, nz)),
            "latitude": (("latitude",), np.linspace(0, extent, ny), {"units": "m"}),
            "longitude": (("longitude",), np.linspace(0, extent, nx), {"units": "m"}),
        }
    )
    return fields, coords


def delft3d_style(n=5, nz=3, nt=2, u=1.0, v=0.0, extent=4.0):
    """Structured Delft3D naming: XZETA/YZETA on (N, M), SIGMA_C layers."""
    fields = {
        "U": xr.DataArray(
            np.full((nt, nz, n, n), u, np.float32), dims=("time", "LAYER", "N", "M"), name="U"
        ),
        "V": xr.DataArray(
            np.full((nt, nz, n, n), v, np.float32), dims=("time", "LAYER", "N", "M"), name="V"
        ),
    }
    coords = xr.Dataset(
        coords={
            "TIME": (("time",), _times(nt)),
            "XZETA": (("N", "M"), np.broadcast_to(np.linspace(0, extent, n), (n, n)).copy(), {"units": "m"}),
            "YZETA": (("N", "M"), np.broadcast_to(np.linspace(0, extent, n)[:, None], (n, n)).copy(), {"units": "m"}),
            "SIGMA_C": (("LAYER",), np.linspace(-1, 0, nz)),
        }
    )
    return fields, coords
