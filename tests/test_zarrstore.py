"""Zarr field ingestion via tensorstore (reference _xarray.py:13-36 parity).

The round-trip contract: write a dataset to a zarr group, reopen it lazily,
build a FieldSet, and get trajectories identical to the in-memory run —
while windowed execution reads only window-sized slabs from disk.
"""

import numpy as np
import pytest

from parcels_tpu import FieldSet, ParticleSet
from parcels_tpu.datasets import moving_eddy_dataset
from parcels_tpu.io import LazyZarrArray, open_zarr_dataset, write_zarr_dataset
from parcels_tpu.kernels import AdvectionRK4


@pytest.fixture(scope="module")
def eddy_zarr(tmp_path_factory):
    path = tmp_path_factory.mktemp("zarr") / "eddy.zarr"
    write_zarr_dataset(moving_eddy_dataset(), path)
    return str(path)


def test_roundtrip_values_and_time_decode(eddy_zarr):
    src = moving_eddy_dataset()
    ds = open_zarr_dataset(eddy_zarr)
    assert set(ds.data_vars) >= {"U", "V"}
    # lazy data vars, eager coords
    assert getattr(ds["U"].values, "_parcels_lazy", False)
    np.testing.assert_array_equal(np.asarray(ds["lon"]), np.asarray(src["lon"]))
    # CF time decodes back to the same datetimes/timedeltas (seconds precision)
    t_src = np.asarray(src["time"].values).astype("timedelta64[s]")
    t_rt = np.asarray(ds["time"].values).astype("timedelta64[s]")
    np.testing.assert_array_equal(t_rt, t_src)
    # attrs survive
    assert ds["U"].attrs.get("units") == src["U"].attrs.get("units")
    # values identical once materialized
    np.testing.assert_array_equal(np.asarray(ds["U"]), np.asarray(src["U"].values))


def test_lazy_window_reads_only_window(eddy_zarr):
    ds = open_zarr_dataset(eddy_zarr)
    lazy = ds["U"].values
    full_t = lazy.shape[0]
    win = lazy[3:7]
    assert isinstance(win, np.ndarray)
    assert win.shape[0] == 4
    src = np.asarray(moving_eddy_dataset()["U"].values)
    np.testing.assert_array_equal(win, src[3:7])
    assert full_t == src.shape[0]


def test_lazy_time_axis_only_indexing(eddy_zarr):
    ds = open_zarr_dataset(eddy_zarr)
    lazy = ds["U"].values
    with pytest.raises(IndexError):
        lazy[0, 1]
    one = lazy[2]
    np.testing.assert_array_equal(
        one, np.asarray(moving_eddy_dataset()["U"].values)[2]
    )


def test_fieldset_from_zarr_matches_memory(eddy_zarr):
    """End-to-end: disk-backed windowed run == in-memory run, small reads."""
    fs_mem = FieldSet.from_sgrid_conventions(moving_eddy_dataset(), mesh="flat")
    fs_zarr = FieldSet.from_sgrid_conventions(open_zarr_dataset(eddy_zarr), mesh="flat")
    fs_zarr.set_time_window(16)

    def run(fs):
        pset = ParticleSet(fs, x=[12000.0, 15000.0], y=[12500.0, 9000.0], t=[0.0, 0.0])
        pset.execute(
            AdvectionRK4, dt=np.timedelta64(5, "m"), runtime=np.timedelta64(6, "h")
        )
        return np.stack([pset.x, pset.y])

    mem = run(fs_mem)
    zrr = run(fs_zarr)
    np.testing.assert_allclose(zrr, mem, rtol=1e-6, atol=1e-3)

    stats = fs_zarr.window_stats
    assert stats["loads"] >= 2
    # U data on disk is (420, 1, 2, 2) f32 = ~6.7 KB; windowed reads must
    # stay well under one full materialization per load
    u = fs_zarr._fields["U"].data
    assert isinstance(u, LazyZarrArray)
    assert stats["bytes_read"] <= stats["loads"] * 16 * 1 * 2 * 2 * 4


def test_nan_fill_applied_per_window(tmp_path):
    ds = moving_eddy_dataset()
    u = np.asarray(ds["U"].values).copy()
    u[5] = np.nan
    ds["U"].values[...] = u
    path = str(tmp_path / "nan.zarr")
    write_zarr_dataset(ds, path)
    fs = FieldSet.from_sgrid_conventions(open_zarr_dataset(path), mesh="flat")
    window = fs._fields["U"].data[4:7]
    assert np.all(np.isfinite(window))
    assert np.all(window[1] == 0.0)
