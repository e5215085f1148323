"""NetCDF field ingestion via h5py/scipy (reference netCDF4 parity).

The reference ingests NetCDF forcing everywhere (reference
pyproject.toml:23-35, _xarray.py:13-36). Round-trip contract mirrors
tests/test_zarrstore.py: write a dataset to NetCDF, reopen it lazily,
build a FieldSet, stream through the windowed path, and get trajectories
identical to the in-memory run.
"""

import numpy as np
import pytest

from parcels_tpu import FieldSet, ParticleSet
from parcels_tpu.datasets import moving_eddy_dataset
from parcels_tpu.io import open_netcdf_dataset, write_netcdf_dataset
from parcels_tpu.kernels import AdvectionRK4


@pytest.fixture(scope="module")
def eddy_nc(tmp_path_factory):
    path = tmp_path_factory.mktemp("nc") / "eddy.nc"
    write_netcdf_dataset(moving_eddy_dataset(), path)
    return str(path)


def test_roundtrip_values_and_time_decode(eddy_nc):
    src = moving_eddy_dataset()
    ds = open_netcdf_dataset(eddy_nc)
    assert set(ds.data_vars) >= {"U", "V"}
    # lazy data vars, eager coords
    assert getattr(ds["U"].values, "_parcels_lazy", False)
    np.testing.assert_array_equal(np.asarray(ds["lon"]), np.asarray(src["lon"]))
    t_src = np.asarray(src["time"].values).astype("timedelta64[s]")
    t_rt = np.asarray(ds["time"].values).astype("timedelta64[s]")
    np.testing.assert_array_equal(t_rt, t_src)
    assert ds["U"].attrs.get("units") == src["U"].attrs.get("units")
    np.testing.assert_array_equal(np.asarray(ds["U"]), np.asarray(src["U"].values))


def test_lazy_window_reads_only_window(eddy_nc):
    ds = open_netcdf_dataset(eddy_nc)
    lazy = ds["U"].values
    win = lazy[3:7]
    assert isinstance(win, np.ndarray)
    assert win.shape[0] == 4
    src = np.asarray(moving_eddy_dataset()["U"].values)
    np.testing.assert_array_equal(win, src[3:7])


def test_fieldset_from_netcdf_matches_memory(eddy_nc):
    """End-to-end: NetCDF-backed windowed run == in-memory run."""
    fs_mem = FieldSet.from_sgrid_conventions(moving_eddy_dataset(), mesh="flat")
    fs_nc = FieldSet.from_sgrid_conventions(open_netcdf_dataset(eddy_nc), mesh="flat")
    fs_nc.set_time_window(16)

    def run(fs):
        pset = ParticleSet(fs, x=[12000.0, 15000.0], y=[12500.0, 9000.0], t=[0.0, 0.0])
        pset.execute(
            AdvectionRK4, dt=np.timedelta64(5, "m"), runtime=np.timedelta64(6, "h")
        )
        return np.stack([pset.x, pset.y])

    mem = run(fs_mem)
    ncd = run(fs_nc)
    np.testing.assert_allclose(ncd, mem, rtol=1e-6, atol=1e-3)
    stats = fs_nc.window_stats
    assert stats["loads"] >= 2


def test_classic_format_via_scipy(tmp_path):
    """netCDF-classic (CDF-1) files read through the scipy path."""
    from scipy.io import netcdf_file

    path = str(tmp_path / "classic.nc")
    f = netcdf_file(path, "w")
    f.createDimension("time", 3)
    f.createDimension("lat", 4)
    f.createDimension("lon", 5)
    v = f.createVariable("time", "i4", ("time",))
    v[:] = [0, 60, 120]
    v.units = "seconds"
    v = f.createVariable("lat", "f4", ("lat",))
    v[:] = np.linspace(-1.0, 1.0, 4)
    v = f.createVariable("lon", "f4", ("lon",))
    v[:] = np.linspace(0.0, 2.0, 5)
    v = f.createVariable("temp", "f8", ("time", "lat", "lon"))
    data = np.arange(60, dtype=np.float64).reshape(3, 4, 5)
    v[:] = data
    v.units = "degC"
    f.close()

    ds = open_netcdf_dataset(path)
    assert ds["temp"].dims == ("time", "lat", "lon")
    np.testing.assert_array_equal(np.asarray(ds["temp"]), data)
    np.testing.assert_array_equal(
        np.asarray(ds["time"]), np.array([0, 60, 120], "timedelta64[s]")
    )
    assert ds["temp"].attrs["units"] == "degC"


def test_non_netcdf_file_rejected(tmp_path):
    p = tmp_path / "not_nc.bin"
    p.write_bytes(b"garbage!")
    with pytest.raises(ValueError, match="not a NetCDF file"):
        open_netcdf_dataset(str(p))


def test_reference_fixture_reads(tmp_path):
    """The reference repo's own NetCDF test fixtures open through this path."""
    import os

    fixture = "/root/reference/tests/test_data/test_interpolation_data_random_A.nc"
    if not os.path.exists(fixture):
        pytest.skip("reference fixture not present")
    ds = open_netcdf_dataset(fixture)
    assert {"U", "V", "W"} <= (set(ds.data_vars) | set(ds.coords))
    u = np.asarray(ds["U"])
    assert u.ndim >= 3 and np.isfinite(u).any()
