"""Rolling time-window field streaming (reference _windowed_array.py parity).

Windowed execution must be bit-identical (same search/interp math over the
same values) to resident-in-full execution, while loading only window-sized
slabs; the load accounting mirrors the reference's WindowedArray
``loads``/``bytes_read`` diagnostics (_windowed_array.py:36-38).
"""

import numpy as np
import pytest

from parcels_tpu import FieldSet, ParticleSet
from parcels_tpu.datasets import moving_eddy_dataset
from parcels_tpu.kernels import AdvectionRK4


def _run(fs, runtime_h=6, outputdt_m=30):
    pset = ParticleSet(fs, x=[12000.0, 15000.0], y=[12500.0, 9000.0], t=[0.0, 0.0])
    pset.execute(
        AdvectionRK4, dt=np.timedelta64(5, "m"), runtime=np.timedelta64(runtime_h, "h")
    )
    return np.stack([pset.x, pset.y])


def test_windowed_matches_resident():
    fs_full = FieldSet.from_sgrid_conventions(moving_eddy_dataset(), mesh="flat")
    fs_win = FieldSet.from_sgrid_conventions(moving_eddy_dataset(), mesh="flat")
    fs_win.set_time_window(16)

    full = _run(fs_full)
    win = _run(fs_win)
    np.testing.assert_allclose(win, full, rtol=1e-6, atol=1e-3)

    stats = fs_win.window_stats
    assert stats["loads"] >= 2  # window advanced at least once
    # each load is a (L, Z, Y, X) f32 slab, far below the full 420-level array
    assert stats["bytes_read"] < 2 * 420 * 2 * 2 * 4 * 10


def test_window_advances_with_output_chunks():
    fs = FieldSet.from_sgrid_conventions(moving_eddy_dataset(), mesh="flat")
    fs.set_time_window(16)  # 16 minutes of 1-min levels
    pset = ParticleSet(fs, x=[12000.0], y=[12500.0], t=[0.0])
    from parcels_tpu import ParticleFile

    # 10-minute chunks fit comfortably in a 16-level window
    import tempfile, os

    path = os.path.join(tempfile.mkdtemp(), "w.parquet")
    pf = ParticleFile(path, outputdt=np.timedelta64(10, "m"), mode="w")
    pset.execute(
        AdvectionRK4,
        dt=np.timedelta64(5, "m"),
        runtime=np.timedelta64(3, "h"),
        output_file=pf,
    )
    pf.close()
    assert pset.t[0] == 3 * 3600
    assert fs.window_stats["loads"] > 5


def test_tiny_window_subchunks_automatically():
    """Even a minimal window works: execute sub-chunks to window capacity."""
    fs_full = FieldSet.from_sgrid_conventions(moving_eddy_dataset(), mesh="flat")
    fs = FieldSet.from_sgrid_conventions(moving_eddy_dataset(), mesh="flat")
    fs.set_time_window(4)  # only 4 minutes of levels resident at a time
    pset = ParticleSet(fs, x=[12000.0], y=[12500.0], t=[0.0])
    pset.execute(
        AdvectionRK4, dt=np.timedelta64(1, "m"), runtime=np.timedelta64(1, "h")
    )
    p_full = ParticleSet(fs_full, x=[12000.0], y=[12500.0], t=[0.0])
    p_full.execute(
        AdvectionRK4, dt=np.timedelta64(1, "m"), runtime=np.timedelta64(1, "h")
    )
    assert pset.t[0] == 3600.0
    np.testing.assert_allclose(pset.x, p_full.x, rtol=1e-6, atol=1e-3)
    np.testing.assert_allclose(pset.y, p_full.y, rtol=1e-6, atol=1e-3)
    assert fs.window_stats["loads"] >= 2 * 15  # ~20 window advances x2 fields


def test_set_time_window_validates():
    fs = FieldSet.from_sgrid_conventions(moving_eddy_dataset(), mesh="flat")
    with pytest.raises(ValueError):
        fs.set_time_window(1)


def test_prefetch_window_stages_next_and_is_consumed():
    """prefetch_window builds the next window on a thread; windowed_arrays
    consumes the staged result instead of re-loading."""
    fs = FieldSet.from_sgrid_conventions(moving_eddy_dataset(), mesh="flat")
    fs.set_time_window(8)
    a0 = fs.windowed_arrays(0.0, 300.0)
    fs.prefetch_window(8 * 60.0)  # next window anchor
    futs = fs._window_futures
    assert len(futs) == 1
    key = next(iter(futs))
    futs[key].result()  # wait for the background build
    loads_before = fs.window_stats["loads"]
    a1 = fs.windowed_arrays(8 * 60.0, 10 * 60.0)
    assert fs.window_stats["loads"] == loads_before  # consumed, not re-built
    assert not fs._window_futures
    # staged window content identical to a fresh synchronous load
    fs2 = FieldSet.from_sgrid_conventions(moving_eddy_dataset(), mesh="flat")
    fs2.set_time_window(8)
    b1 = fs2.windowed_arrays(8 * 60.0, 10 * 60.0)
    np.testing.assert_array_equal(np.asarray(a1["fields"]["U"]), np.asarray(b1["fields"]["U"]))


def test_prefetch_mispredict_harmless():
    fs = FieldSet.from_sgrid_conventions(moving_eddy_dataset(), mesh="flat")
    fs.set_time_window(8)
    fs.prefetch_window(100 * 60.0)  # way off
    out = fs.windowed_arrays(0.0, 300.0)  # sync load still correct
    assert np.asarray(out["fields"]["U"]).shape[0] == 8


def test_to_windowed_arrays_reference_alias():
    """Reference API name (fieldset.py:165): chaining, idempotence, no-op on
    fieldsets already smaller than the window."""
    fs = FieldSet.from_sgrid_conventions(moving_eddy_dataset(), mesh="flat")
    out = fs.to_windowed_arrays(max_levels=4)
    assert out is fs
    assert fs._time_window == 4
    assert fs.to_windowed_arrays(max_levels=4) is fs  # idempotent
    # trajectory parity with the resident run
    from parcels_tpu import ParticleSet
    from parcels_tpu.kernels import AdvectionRK4

    fs2 = FieldSet.from_sgrid_conventions(moving_eddy_dataset(), mesh="flat")
    p1 = ParticleSet(fs, x=[12000.0], y=[12500.0], t=[np.timedelta64(0, "s")])
    p2 = ParticleSet(fs2, x=[12000.0], y=[12500.0], t=[np.timedelta64(0, "s")])
    for p in (p1, p2):
        p.execute(AdvectionRK4, dt=np.timedelta64(5, "m"), runtime=np.timedelta64(30, "m"))
    np.testing.assert_allclose(p1.x, p2.x, rtol=1e-6)
    # a 2-level fieldset is already <= the default window: no-op
    from parcels_tpu.datasets import simple_UV_dataset

    fs3 = FieldSet.from_sgrid_conventions(simple_UV_dataset(dims=(2, 2, 8, 8), mesh="flat"), mesh="flat")
    assert fs3.to_windowed_arrays() is fs3
    assert fs3._time_window is None
