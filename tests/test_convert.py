"""Convert-layer tests: raw model-style datasets -> SGRID -> FieldSet -> advection.

Mirrors the reference's integration idiom (reference tests/test_advection.py:
427-507 run real model files through convert.* + advection); here the model
files are replaced by in-memory datasets with each model's native naming.
"""

import numpy as np
import pytest

from parcels_tpu import FieldSet, ParticleSet, convert
from parcels_tpu import xrlite as xr
from parcels_tpu.kernels import AdvectionRK4


def _run_uniform(fs, x0=500.0, y0=5000.0, u=1.0):
    pset = ParticleSet(fs, x=[x0], y=[y0], t=[np.timedelta64(0, "s")])
    pset.execute(AdvectionRK4, dt=np.timedelta64(5, "m"), runtime=np.timedelta64(1, "h"))
    return pset


def _time_axis(n=2):
    return np.array([np.datetime64("2000-01-01") + np.timedelta64(i, "D") for i in range(n)])


def test_copernicusmarine_to_sgrid_advection():
    """A-grid dataset with Copernicus naming advects a particle correctly."""
    nx, ny, nz, nt = 8, 8, 3, 2
    lon = np.linspace(0, 10000, nx)
    lat = np.linspace(0, 10000, ny)
    depth = np.linspace(0, 100, nz)
    U = np.full((nt, nz, ny, nx), 1.0, dtype=np.float32)
    V = np.zeros((nt, nz, ny, nx), dtype=np.float32)

    fields = {
        "U": xr.DataArray(U, dims=("time", "depth", "latitude", "longitude"), name="U"),
        "V": xr.DataArray(V, dims=("time", "depth", "latitude", "longitude"), name="V"),
    }
    coords = xr.Dataset(
        coords={
            "time": (("time",), _time_axis()),
            "depth": (("depth",), depth),
            "latitude": (("latitude",), lat, {"units": "degrees_north"}),
            "longitude": (("longitude",), lon, {"units": "degrees_east"}),
        }
    )
    ds = convert.copernicusmarine_to_sgrid(fields=fields, coords=coords)
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    pset = _run_uniform(fs)
    assert np.allclose(pset.x, 500.0 + 3600.0, rtol=1e-5)
    assert np.allclose(pset.y, 5000.0, atol=1e-4)


def test_copernicusmarine_surface_data_gets_depth_dim():
    """Depth-less (surface) data gets a singleton depth axis."""
    nx, ny, nt = 6, 5, 2
    U = np.full((nt, ny, nx), 0.5, dtype=np.float32)
    V = np.full((nt, ny, nx), 0.0, dtype=np.float32)
    fields = {
        "U": xr.DataArray(U, dims=("time", "latitude", "longitude"), name="U"),
        "V": xr.DataArray(V, dims=("time", "latitude", "longitude"), name="V"),
    }
    coords = xr.Dataset(
        coords={
            "time": (("time",), _time_axis()),
            "latitude": (("latitude",), np.linspace(0, 4, ny), {"units": "m"}),
            "longitude": (("longitude",), np.linspace(0, 5, nx), {"units": "m"}),
        }
    )
    ds = convert.copernicusmarine_to_sgrid(fields=fields, coords=coords)
    assert "depth" in ds.dims
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    pset = ParticleSet(fs, x=[1.0], y=[2.0], t=[np.timedelta64(0, "s")])
    pset.execute(AdvectionRK4, dt=np.timedelta64(1, "s"), runtime=np.timedelta64(4, "s"))
    assert np.allclose(pset.x, 3.0, rtol=1e-5)


def test_copernicus_w_negated():
    nx, ny, nz, nt = 4, 4, 3, 2
    shp = (nt, nz, ny, nx)
    fields = {
        "U": xr.DataArray(np.ones(shp, np.float32), dims=("time", "depth", "latitude", "longitude")),
        "V": xr.DataArray(np.zeros(shp, np.float32), dims=("time", "depth", "latitude", "longitude")),
        "W": xr.DataArray(np.full(shp, 2.0, np.float32), dims=("time", "depth", "latitude", "longitude")),
    }
    coords = xr.Dataset(
        coords={
            "time": (("time",), _time_axis()),
            "depth": (("depth",), np.linspace(0, 10, nz)),
            "latitude": (("latitude",), np.linspace(0, 3, ny)),
            "longitude": (("longitude",), np.linspace(0, 3, nx)),
        }
    )
    ds = convert.copernicusmarine_to_sgrid(fields=fields, coords=coords)
    assert np.allclose(np.asarray(ds["W"].values), -2.0)


def test_mitgcm_to_sgrid_advection():
    """MITgcm C-grid naming (XG/YG/Zl nodes, HIGH padding) round-trips."""
    nx, ny, nz, nt = 10, 10, 3, 2
    XG = np.linspace(0, 9000, nx)
    YG = np.linspace(0, 9000, ny)
    Zl = np.array([100.0, 50.0, 0.0])  # decreasing -> must be flipped
    U = np.full((nt, nz, ny, nx), 1.0, dtype=np.float32)
    V = np.zeros((nt, nz, ny, nx), dtype=np.float32)
    fields = {
        "U": xr.DataArray(U, dims=("time", "Zl", "YG", "XG"), name="U"),
        "V": xr.DataArray(V, dims=("time", "Zl", "YG", "XG"), name="V"),
    }
    coords = xr.Dataset(
        coords={
            "time": (("time",), _time_axis()),
            "XG": (("XG",), XG, {"units": "m"}),
            "YG": (("YG",), YG, {"units": "m"}),
            "Zl": (("Zl",), Zl),
        }
    )
    ds = convert.mitgcm_to_sgrid(fields=fields, coords=coords)
    assert np.all(np.diff(np.asarray(ds["depth"].values)) > 0)
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    pset = ParticleSet(fs, x=[1000.0], y=[5000.0], z=[10.0], t=[np.timedelta64(0, "s")])
    pset.execute(AdvectionRK4, dt=np.timedelta64(5, "m"), runtime=np.timedelta64(1, "h"))
    assert np.allclose(pset.x, 1000.0 + 3600.0, rtol=1e-4)


def test_nemo_to_sgrid_structure():
    """NEMO naming (glamf/gphif f-points, center dims, depthw) parses to SGRID."""
    nx, ny, nz, nt = 6, 5, 3, 2
    glamf = np.broadcast_to(np.linspace(0, 5, nx), (ny, nx)).copy()
    gphif = np.broadcast_to(np.linspace(40, 44, ny)[:, None], (ny, nx)).copy()
    uo = np.ones((nt, nz, ny, nx), dtype=np.float32)
    vo = np.zeros((nt, nz, ny, nx), dtype=np.float32)
    fields = {
        "U": xr.DataArray(uo, dims=("time", "depthu", "y", "x"), name="U"),
        "V": xr.DataArray(vo, dims=("time", "depthv", "y", "x"), name="V"),
    }
    coords = xr.Dataset(
        coords={
            "time": (("time",), _time_axis()),
            "glamf": (("y", "x"), glamf),
            "gphif": (("y", "x"), gphif),
            "depthw": (("depthw",), np.linspace(0, 100, nz)),
        }
    )
    ds = convert.nemo_to_sgrid(fields=fields, coords=coords)
    assert "lon" in ds and "lat" in ds
    assert ds["lon"].attrs["units"] == "degrees"
    from parcels_tpu import _sgrid as sgrid

    meta = sgrid.parse_sgrid_metadata(ds)
    assert meta.node_coordinates == ("lon", "lat")
    fs = FieldSet.from_sgrid_conventions(ds)
    assert "UV" in fs.fields
    assert fs.gridset[0].mesh.is_spherical()


def test_croco_to_sgrid_structure():
    nx, ny, nz, nt = 6, 6, 4, 3
    x_rho = np.broadcast_to(np.linspace(0, 5000, nx), (ny, nx)).copy()
    y_rho = np.broadcast_to(np.linspace(0, 5000, ny)[:, None], (ny, nx)).copy()
    s_w = np.linspace(-1, 0, nz)
    u = np.ones((nt, nz, ny, nx - 1), dtype=np.float32)
    v = np.zeros((nt, nz, ny - 1, nx), dtype=np.float32)
    fields = {
        "U": xr.DataArray(u, dims=("time", "s_rho", "eta_rho", "xi_u"), name="U"),
        "V": xr.DataArray(v, dims=("time", "s_rho", "eta_v", "xi_rho"), name="V"),
    }
    coords = xr.Dataset(
        coords={
            "time": (("time",), np.array([0.0, 3600.0, 7200.0]), {"units": "seconds"}),
            "x_rho": (("eta_rho", "xi_rho"), x_rho, {"units": "m"}),
            "y_rho": (("eta_rho", "xi_rho"), y_rho, {"units": "m"}),
            "s_w": (("s_w",), s_w),
        }
    )
    ds = convert.croco_to_sgrid(fields=fields, coords=coords)
    assert "lon" in ds and "depth" in ds
    assert np.issubdtype(np.asarray(ds["time"].values).dtype, np.timedelta64)


def test_fesom_to_ugrid_vertical_rename():
    ds = xr.Dataset(
        {
            "u": (("time", "nz1", "nod2"), np.zeros((2, 4, 10), np.float32)),
        },
        coords={
            "time": (("time",), _time_axis()),
            "nz": (("nz",), np.linspace(0, 100, 5)),
            "nz1": (("nz1",), np.linspace(10, 90, 4)),
        },
    )
    out = convert.fesom_to_ugrid(ds)
    assert "zf" in out.dims and "zc" in out.dims
    assert out.sizes["zf"] == out.sizes["zc"] + 1
    assert "n_face" in out.dims


def test_icon_to_ugrid_vertical_rename():
    ds = xr.Dataset(
        {
            "u": (("time", "depth", "ncells"), np.zeros((2, 4, 10), np.float32)),
        },
        coords={
            "time": (("time",), _time_axis()),
            "depth_2": (("depth_2",), np.linspace(0, 100, 5)),
            "depth": (("depth",), np.linspace(10, 90, 4)),
        },
    )
    out = convert.icon_to_ugrid(ds)
    assert "zf" in out.dims and "zc" in out.dims


def test_delft3d_to_sgrid_warns():
    n = 5
    fields = {
        "U": xr.DataArray(np.ones((2, 3, n, n), np.float32), dims=("time", "LAYER", "N", "M")),
        "V": xr.DataArray(np.zeros((2, 3, n, n), np.float32), dims=("time", "LAYER", "N", "M")),
    }
    coords = xr.Dataset(
        coords={
            "TIME": (("time",), _time_axis()),
            "XZETA": (("N", "M"), np.broadcast_to(np.linspace(0, 4, n), (n, n)).copy(), {"units": "m"}),
            "YZETA": (("N", "M"), np.broadcast_to(np.linspace(0, 4, n)[:, None], (n, n)).copy(), {"units": "m"}),
            "SIGMA_C": (("LAYER",), np.linspace(-1, 0, 3)),
        }
    )
    with pytest.warns(UserWarning, match="experimental"):
        ds = convert.delft3d_to_sgrid(fields=fields, coords=coords)
    assert "lon" in ds and "lat" in ds


def test_circulation_model_styles_roundtrip():
    """Every model-style mini dataset converts and builds a FieldSet."""
    from parcels_tpu.datasets import circulation_models as cm

    for style, conv in (
        (cm.nemo_style, convert.nemo_to_sgrid),
        (cm.mitgcm_style, convert.mitgcm_to_sgrid),
        (cm.croco_style, convert.croco_to_sgrid),
        (cm.copernicusmarine_style, convert.copernicusmarine_to_sgrid),
    ):
        fields, coords = style()
        ds = conv(fields=fields, coords=coords)
        fs = FieldSet.from_sgrid_conventions(ds) if style is cm.nemo_style else FieldSet.from_sgrid_conventions(ds, mesh="flat")
        assert "UV" in fs.fields, style.__name__

    import warnings as _w

    fields, coords = cm.delft3d_style()
    with _w.catch_warnings():
        _w.simplefilter("ignore", UserWarning)
        ds = convert.delft3d_to_sgrid(fields=fields, coords=coords)
    assert "lon" in ds


def test_nemo_to_sgrid_advection_cgrid():
    """NEMO-style curvilinear C-grid dataset advects zonally at the right
    speed through convert + CGrid_Velocity (geometry-table path)."""
    from parcels_tpu.datasets.circulation_models import nemo_style
    from parcels_tpu.kernels import AdvectionRK4

    u_ms = 0.2
    fields, coords = nemo_style(nx=12, ny=8, u=u_ms, v=0.0)
    ds = convert.nemo_to_sgrid(fields=fields, coords=coords)
    fs = FieldSet.from_sgrid_conventions(ds)  # spherical autodetected
    assert fs._gridset[0].spec.curvilinear
    x0, y0 = 3.0, 42.0
    pset = ParticleSet(fs, x=[x0], y=[y0], t=[np.timedelta64(0, "s")])
    pset.execute(AdvectionRK4, dt=np.timedelta64(600, "s"), runtime=np.timedelta64(1, "D"))
    from parcels_tpu import EARTH_RADIUS

    deg2m = EARTH_RADIUS * np.pi / 180.0
    exp_x = x0 + u_ms * 86400.0 / (deg2m * np.cos(np.deg2rad(y0)))
    assert abs(pset.x[0] - exp_x) < 5e-3 * abs(exp_x - x0), (pset.x, exp_x)
    assert abs(pset.y[0] - y0) < 1e-3


def test_circulation_model_datasets_registry():
    """The native-convention registry mirrors the reference's ``datasets``
    dict (reference circulation_models.py:1251-1264): same 12 keys, native
    variable and dimension names preserved."""
    from parcels_tpu.datasets.circulation_models import datasets

    expected = {
        "ds_copernicusmarine", "ds_copernicusmarine_waves", "ds_NEMO_MOI_U",
        "ds_NEMO_MOI_V", "ds_CESM", "ds_MITgcm_netcdf", "ds_MITgcm_mds",
        "ds_ERA5_wind", "ds_FES_tides", "ds_hycom_espc", "ds_ecco4",
        "ds_CROCO_idealized",
    }
    assert set(datasets) == expected
    assert "vozocrtx" in datasets["ds_NEMO_MOI_U"].data_vars
    assert "vomecrty" in datasets["ds_NEMO_MOI_V"].data_vars
    assert datasets["ds_CESM"]["UVEL"].attrs["units"] == "centimeter/s"
    assert datasets["ds_MITgcm_mds"]["U"].dims == ("time", "Z", "YC", "XG")
    assert datasets["ds_MITgcm_mds"]["V"].dims == ("time", "Z", "YG", "XC")
    assert "depth" not in datasets["ds_ERA5_wind"].sizes  # surface-only
    assert "time" not in datasets["ds_FES_tides"].sizes  # constituent file
    assert datasets["ds_ecco4"]["UVEL"].dims == ("time", "k", "tile", "j", "i_g")
    assert "hc" in datasets["ds_CROCO_idealized"].data_vars


def test_copernicus_standard_name_uv_discovery():
    """Native-named uo/vo (and Stokes-drift VSDX/VSDY) are discovered as U/V
    via CF standard names (fallback table: reference fieldset.py:444-469)."""
    from parcels_tpu.datasets.circulation_models import datasets

    for key, (uname, vname) in {
        "ds_copernicusmarine": ("uo", "vo"),
        "ds_copernicusmarine_waves": ("VSDX", "VSDY"),
    }.items():
        raw = datasets[key]
        ds = convert.copernicusmarine_to_sgrid(
            fields={uname: raw[uname], vname: raw[vname]},
            coords=xr.Dataset(coords=dict(raw.coords)),
        )
        assert "U" in ds.data_vars and "V" in ds.data_vars, key
        fs = FieldSet.from_sgrid_conventions(ds)
        assert "UV" in fs.fields, key


def test_copernicus_standard_name_ambiguity_raises():
    raw = None
    from parcels_tpu.datasets.circulation_models import _copernicusmarine_ds

    raw = _copernicusmarine_ds()
    dup = xr.DataArray(raw["uo"].values, raw["uo"].dims, dict(raw["uo"].attrs), name="uo2")
    with pytest.raises(ValueError, match="Ambiguous"):
        convert.copernicusmarine_to_sgrid(
            fields={"uo": raw["uo"], "vo": raw["vo"], "uo2": dup},
            coords=xr.Dataset(coords=dict(raw.coords)),
        )


def test_hycom_espc_through_copernicus_converter():
    """HYCOM's lat/lon/depth/time layout ingests through the generic A-grid
    converter; water_u/water_v discovered by standard name."""
    from parcels_tpu.datasets.circulation_models import hycom_espc_style

    raw = hycom_espc_style()
    ds = convert.copernicusmarine_to_sgrid(
        fields={"water_u": raw["water_u"], "water_v": raw["water_v"]},
        coords=xr.Dataset(coords=dict(raw.coords)),
    )
    fs = FieldSet.from_sgrid_conventions(ds)
    assert "UV" in fs.fields


def test_era5_wind_surface_expand_depth():
    """ERA5 u10/v10 have no depth axis; the converter synthesizes one so the
    3-D sampling engine can ingest surface-only products."""
    from parcels_tpu.datasets.circulation_models import era5_wind_style

    raw = era5_wind_style()
    u = xr.DataArray(raw["u10"].values, raw["u10"].dims,
                     {**raw["u10"].attrs, "standard_name": "eastward_sea_water_velocity"},
                     name="u10")
    v = xr.DataArray(raw["v10"].values, raw["v10"].dims,
                     {**raw["v10"].attrs, "standard_name": "northward_sea_water_velocity"},
                     name="v10")
    ds = convert.copernicusmarine_to_sgrid(
        fields={"u10": u, "v10": v},
        coords=xr.Dataset(coords=dict(raw.coords)),
    )
    assert "U" in ds.data_vars
    fs = FieldSet.from_sgrid_conventions(ds)
    assert "UV" in fs.fields
