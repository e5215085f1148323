"""Trajectory-file I/O tests (reference tests/test_particlefile.py, 582 LoC).

Schema/metadata, output cadence, custom variables, cftime-like round-trip of
the CF time units, overwrite modes, and mid-run writes.
"""

import numpy as np
import pandas as pd
import pytest

from parcels_tpu import (
    FieldSet,
    Particle,
    ParticleFile,
    ParticleSet,
    Variable,
    read_particlefile,
)
from parcels_tpu.datasets import moving_eddy_dataset, simple_UV_dataset
from tests.conftest import uniform_flow_fieldset


def _eddy_fs():
    return FieldSet.from_sgrid_conventions(moving_eddy_dataset(), mesh="flat")


def test_outputdt_validation(tmp_path):
    with pytest.raises(ValueError, match="positive"):
        ParticleFile(tmp_path / "a.parquet", outputdt=np.timedelta64(0, "s"))
    with pytest.raises(ValueError, match="parquet"):
        ParticleFile(tmp_path / "a.zarr", outputdt=np.timedelta64(1, "h"))
    with pytest.raises(ValueError, match="outputdt"):
        ParticleFile(tmp_path / "a.parquet", outputdt="1 hour")


def test_existing_path_needs_w_mode(tmp_path):
    p = tmp_path / "a.parquet"
    p.write_bytes(b"")
    with pytest.raises(ValueError, match="exists"):
        ParticleFile(p, outputdt=np.timedelta64(1, "h"))
    ParticleFile(p, outputdt=np.timedelta64(1, "h"), mode="w")  # overwrites


def test_missing_folder_raises(tmp_path):
    with pytest.raises(ValueError, match="Folder"):
        ParticleFile(tmp_path / "nope" / "a.parquet", outputdt=np.timedelta64(1, "h"))


def test_output_cadence_and_columns(tmp_path):
    fs = _eddy_fs()
    pset = ParticleSet(fs, x=[12000.0, 15000.0], y=[12500.0, 9000.0], t=[0.0, 0.0])
    path = tmp_path / "t.parquet"
    pf = ParticleFile(path, outputdt=np.timedelta64(30, "m"), mode="w")
    from parcels_tpu.kernels import AdvectionRK4

    pset.execute(
        AdvectionRK4,
        dt=np.timedelta64(10, "m"),
        runtime=np.timedelta64(2, "h"),
        output_file=pf,
    )
    pf.close()
    df = read_particlefile(path, decode_times=False)
    # 5 snapshots (0, 30, 60, 90, 120 min) x 2 particles
    assert len(df) == 10
    assert set(df.columns) >= {"t", "z", "y", "x", "particle_id"}
    times = np.sort(df[df.particle_id == 0]["t"].to_numpy())
    np.testing.assert_allclose(times, [0, 1800, 3600, 5400, 7200])


def test_time_decoding_with_datetime_interval(tmp_path):
    """Fieldset anchored at a datetime64 -> decoded t is datetime64."""
    ds = simple_UV_dataset(dims=(2, 2, 20, 20), mesh="flat")
    ds["U"].values[:] = 1.0
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    pset = ParticleSet(fs, x=[1e5], y=[1e5], t=[np.timedelta64(0, "s")])
    from parcels_tpu.kernels import AdvectionEE

    path = tmp_path / "t.parquet"
    pf = ParticleFile(path, outputdt=np.timedelta64(1, "h"), mode="w")
    pset.execute(
        AdvectionEE, dt=np.timedelta64(30, "m"), runtime=np.timedelta64(2, "h"), output_file=pf
    )
    pf.close()
    df = read_particlefile(path)
    assert np.issubdtype(df["t"].dtype, np.datetime64)
    assert df["t"].min() == np.datetime64("2000-01-01")


def test_custom_variable_written_and_to_write_false_not(tmp_path):
    from parcels_tpu.kernels import AdvectionEE

    fs = uniform_flow_fieldset(u=1.0, v=0.0)
    pclass = Particle.add_variable(
        Variable("age", dtype=np.float32, initial=0.0)
    ).add_variable(Variable("hidden", dtype=np.float32, initial=7.0, to_write=False))

    def Age(particles, fieldset):  # noqa: N802
        particles.age = particles.age + particles.dt

    pset = ParticleSet(fs, pclass=pclass, x=[1e5], y=[1e5], t=[0.0])
    path = tmp_path / "t.parquet"
    pf = ParticleFile(path, outputdt=np.timedelta64(1, "h"), mode="w")
    pset.execute(
        [AdvectionEE, Age],
        dt=np.timedelta64(30, "m"),
        runtime=np.timedelta64(2, "h"),
        output_file=pf,
    )
    pf.close()
    df = read_particlefile(path, decode_times=False)
    assert "age" in df.columns
    assert "hidden" not in df.columns
    assert df["age"].max() == 7200.0


def test_metadata_includes_kernels_and_version(tmp_path):
    import pyarrow.parquet as pq

    from parcels_tpu.kernels import AdvectionRK4

    fs = _eddy_fs()
    pset = ParticleSet(fs, x=[12000.0], y=[12500.0], t=[0.0])
    path = tmp_path / "t.parquet"
    pf = ParticleFile(path, outputdt=np.timedelta64(1, "h"), mode="w")
    pset.execute(
        AdvectionRK4, dt=np.timedelta64(30, "m"), runtime=np.timedelta64(1, "h"), output_file=pf
    )
    pf.close()
    meta = {k.decode(): v.decode() for k, v in pq.read_schema(path).metadata.items()}
    assert meta["feature_type"] == "trajectory"
    assert "AdvectionRK4" in meta["parcels_kernels"]
    assert "parcels_version" in meta
