"""Trajectory-file I/O tests (reference tests/test_particlefile.py, 582 LoC).

Schema/metadata, output cadence, custom variables, cftime-like round-trip of
the CF time units, overwrite modes, and mid-run writes.
"""

import numpy as np
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


# ---------------------------------------------------------------------------
# Depth parity with the reference suite (reference tests/test_particlefile.py,
# 582 LoC): compression, dtypes, deletion, staggered release, backward time,
# misaligned outputdt, error resilience, output cadence.
# ---------------------------------------------------------------------------

from datetime import datetime, timedelta  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from parcels_tpu import StatusCode  # noqa: E402
from parcels_tpu._core.warnings_ import ParticleSetWarning  # noqa: E402
from parcels_tpu.kernels import AdvectionEE, AdvectionRK4  # noqa: E402


def DoNothing(particles, fieldset):  # noqa: N802
    pass


@pytest.mark.parametrize(
    "outputdt, ok",
    [
        (np.timedelta64(5, "s"), True),
        (timedelta(seconds=2), True),
        (5.0, True),
        (np.datetime64("2001-01-02T00:00:00"), False),
        (datetime(2000, 1, 2, 0, 0, 0), False),
        (-np.timedelta64(5, "s"), False),
    ],
)
def test_outputdt_types(outputdt, ok, tmp_path):
    """outputdt accepts timedelta-likes and floats, rejects datetimes and
    non-positives (reference test_outputdt_types)."""
    if ok:
        pf = ParticleFile(tmp_path / "t.parquet", outputdt=outputdt)
        assert pf.outputdt > 0
    else:
        with pytest.raises(ValueError):
            ParticleFile(tmp_path / "t.parquet", outputdt=outputdt)


@pytest.mark.parametrize("compression", ["zstd", "snappy", None])
def test_compression_options(tmp_path, compression):
    """Every supported parquet codec produces a readable file
    (reference test_compression)."""
    fs = uniform_flow_fieldset()
    pset = ParticleSet(fs, x=[1e5], y=[1e5], t=[0.0])
    path = tmp_path / "t.parquet"
    pf = ParticleFile(path, outputdt=np.timedelta64(1, "h"), compression=compression, mode="w")
    pset.execute(AdvectionEE, dt=np.timedelta64(30, "m"), runtime=np.timedelta64(2, "h"),
                 output_file=pf)
    pf.close()
    df = read_particlefile(path, decode_times=False)
    assert len(df) == 3


def test_write_dtypes(tmp_path):
    """Custom Variables keep their declared dtypes in the parquet schema
    (reference test_write_dtypes_pfile)."""
    import pyarrow.parquet as pq

    fs = uniform_flow_fieldset()
    dtypes = [np.float32, np.float64, np.int32, np.int64, np.uint32]
    pclass = Particle
    for d in dtypes:
        pclass = pclass.add_variable(Variable(f"v_{np.dtype(d).name}", dtype=d, initial=10))
    pset = ParticleSet(fs, pclass=pclass, x=[1e5], y=[1e5], t=[0.0])
    path = tmp_path / "t.parquet"
    pf = ParticleFile(path, outputdt=np.timedelta64(1, "h"), mode="w")
    pset.execute(DoNothing, dt=np.timedelta64(1, "h"), runtime=np.timedelta64(1, "h"),
                 output_file=pf)
    pf.close()
    schema = pq.read_schema(path)
    for d in dtypes:
        name = f"v_{np.dtype(d).name}"
        assert schema.field(name).type == __import__("pyarrow").from_numpy_dtype(d), name
    df = read_particlefile(path, decode_times=False)
    for d in dtypes:
        assert (df[f"v_{np.dtype(d).name}"] == 10).all()


def test_deleted_particles_stop_appearing(tmp_path):
    """Rows for a particle stop once it is deleted mid-run
    (reference test_pfile_array_remove_particles)."""
    fs = uniform_flow_fieldset()

    def DeleteP0(particles, fieldset):  # noqa: N802
        particles.state = jnp.where(
            (particles.particle_id == 0) & (particles.t >= 3600.0),
            StatusCode.Delete,
            particles.state,
        )

    pset = ParticleSet(fs, x=[1e5, 1.1e5], y=[1e5, 1e5], t=[0.0, 0.0])
    path = tmp_path / "t.parquet"
    pf = ParticleFile(path, outputdt=np.timedelta64(1, "h"), mode="w")
    pset.execute([AdvectionEE, DeleteP0], dt=np.timedelta64(30, "m"),
                 runtime=np.timedelta64(4, "h"), output_file=pf)
    pf.close()
    df = read_particlefile(path, decode_times=False)
    counts = df.groupby("particle_id").size()
    assert counts[1] == 5  # survives all snapshots (0..4h)
    assert counts[0] < counts[1]


def test_remove_all_particles_file_readable(tmp_path):
    """File stays readable when every particle is deleted
    (reference test_pfile_array_remove_all_particles)."""
    fs = uniform_flow_fieldset()

    def DeleteAll(particles, fieldset):  # noqa: N802
        particles.state = jnp.where(
            particles.t >= 3600.0, StatusCode.Delete, particles.state
        )

    pset = ParticleSet(fs, x=[1e5, 1.1e5], y=[1e5, 1e5], t=[0.0, 0.0])
    path = tmp_path / "t.parquet"
    pf = ParticleFile(path, outputdt=np.timedelta64(1, "h"), mode="w")
    pset.execute([AdvectionEE, DeleteAll], dt=np.timedelta64(30, "m"),
                 runtime=np.timedelta64(4, "h"), output_file=pf)
    pf.close()
    df = read_particlefile(path, decode_times=False)
    assert len(df) >= 2  # at least the initial snapshot of both particles


def test_time_is_age_staggered_release(tmp_path):
    """Per-particle age equals t - release_time under staggered release,
    and the desync warning fires when release offsets are not multiples of
    outputdt (reference test_time_is_age + test_file_warnings)."""
    fs = uniform_flow_fieldset(u=0.0, v=0.0)
    npart = 4
    pclass = Particle.add_variable(Variable("age", dtype=np.float64, initial=0.0))

    def IncreaseAge(particles, fieldset):  # noqa: N802
        particles.age += particles.dt

    t0 = [np.timedelta64(i * 1800, "s") for i in range(npart)]
    pset = ParticleSet(fs, pclass=pclass, x=[1e5] * npart, y=[1e5] * npart, t=t0)
    path = tmp_path / "t.parquet"
    pf = ParticleFile(path, outputdt=np.timedelta64(1, "h"), mode="w")
    with pytest.warns(ParticleSetWarning, match="start time difference"):
        pset.execute(IncreaseAge, dt=np.timedelta64(30, "m"),
                     runtime=np.timedelta64(5, "h"), output_file=pf)
    pf.close()
    df = read_particlefile(path, decode_times=False)
    for pid, grp in df.groupby("particle_id"):
        release = pid * 1800.0
        ages = grp["age"].to_numpy()
        ts = grp["t"].to_numpy()
        np.testing.assert_allclose(ages, ts - release, atol=1e-6)


def test_write_timebackward(tmp_path):
    """Backward-in-time output: per-particle time strictly decreasing
    (reference test_write_timebackward)."""
    ds = simple_UV_dataset(dims=(2, 2, 20, 20), mesh="flat")
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    t0 = [np.timedelta64(4 * 3600 + i * 3600, "s") for i in range(3)]
    pset = ParticleSet(fs, x=[1e5] * 3, y=[1e5, 1.1e5, 1.2e5], t=t0)
    path = tmp_path / "t.parquet"
    pf = ParticleFile(path, outputdt=np.timedelta64(1, "h"), mode="w")
    pset.execute(DoNothing, dt=-np.timedelta64(1, "h"),
                 runtime=np.timedelta64(3, "h"), output_file=pf)
    pf.close()
    df = read_particlefile(path, decode_times=False)
    assert df["particle_id"].dtype == np.int64
    diffs = df.groupby("particle_id")["t"].diff().dropna()
    assert (diffs < 0).all()


def test_correct_misaligned_outputdt_dt(tmp_path):
    """outputdt need not be a multiple of dt: output lands exactly on
    outputdt boundaries via dt clamping (reference
    test_correct_misaligned_outputdt_dt + test_reset_dt)."""
    fs = uniform_flow_fieldset(u=1.0, v=0.0)

    def TrackX(particles, fieldset):  # noqa: N802
        particles.dx += particles.dt  # 1 m/s displacement bookkeeping

    pset = ParticleSet(fs, x=[0.0], y=[1e5], t=[0.0])
    path = tmp_path / "t.parquet"
    pf = ParticleFile(path, outputdt=np.timedelta64(3, "s"), mode="w")
    pset.execute(TrackX, dt=np.timedelta64(2, "s"), runtime=np.timedelta64(11, "s"),
                 output_file=pf)
    pf.close()
    df = read_particlefile(path, decode_times=False)
    np.testing.assert_allclose(np.sort(df["x"].to_numpy()), [0, 3, 6, 9], atol=1e-5)
    np.testing.assert_allclose(np.sort(df["t"].to_numpy()), [0, 3, 6, 9], atol=1e-9)


def test_readable_after_kernel_error(tmp_path):
    """Output file remains readable when a kernel raises mid-run (reference
    test_particlefile_readable_after_kernel_error, GH-2713)."""
    fs = uniform_flow_fieldset()

    def ErrorKernel(particles, fieldset):  # noqa: N802
        particles.state = jnp.where(particles.t >= 3600.0, StatusCode.Error, particles.state)

    pset = ParticleSet(fs, x=[1e5], y=[1e5], t=[0.0])
    path = tmp_path / "t.parquet"
    pf = ParticleFile(path, outputdt=np.timedelta64(1, "h"), mode="w")
    with pytest.raises(Exception):
        pset.execute([AdvectionEE, ErrorKernel], dt=np.timedelta64(30, "m"),
                     runtime=np.timedelta64(5, "h"), output_file=pf)
    pf.close()
    df = read_particlefile(path, decode_times=False)
    assert len(df) >= 1


def test_output_cadence_forward_exact(tmp_path):
    """Output times start at t0, step by outputdt, and end at t0 + runtime
    (reference test_pset_execute_outputdt_forwards / output_time_forwards)."""
    fs = uniform_flow_fieldset()
    pset = ParticleSet(fs, x=[1e5], y=[1e5], t=[0.0])
    path = tmp_path / "t.parquet"
    pf = ParticleFile(path, outputdt=np.timedelta64(1, "h"), mode="w")
    pset.execute(AdvectionRK4, dt=np.timedelta64(5, "m"), runtime=np.timedelta64(5, "h"),
                 output_file=pf)
    pf.close()
    df = read_particlefile(path, decode_times=False)
    t = np.sort(df["t"].to_numpy())
    np.testing.assert_allclose(np.diff(t), 3600.0)
    assert t[0] == 0.0 and t[-1] == 5 * 3600.0


def test_sampling_initial_value(tmp_path):
    """The initial field sample (taken before execute) is written in the
    t=0 snapshot (reference test_sampling_initial_value)."""
    fs = uniform_flow_fieldset(u=2.5, v=0.0)
    pclass = Particle.add_variable(Variable("sample", dtype=np.float32, initial=np.nan))

    def SampleKernel(particles, fieldset):  # noqa: N802
        u, v = fieldset.UV[particles]
        particles.sample = u

    pset = ParticleSet(fs, pclass=pclass, x=[1e5], y=[1e5], t=[0.0])
    u0, _ = fs.fields["UV"].eval(np.timedelta64(0, "s"), np.array([0.0]),
                                 np.array([1e5]), np.array([1e5]))
    pset.sample = np.asarray(u0, dtype=np.float32)
    path = tmp_path / "t.parquet"
    pf = ParticleFile(path, outputdt=np.timedelta64(1, "h"), mode="w")
    pset.execute(SampleKernel, dt=np.timedelta64(30, "m"), runtime=np.timedelta64(2, "h"),
                 output_file=pf)
    pf.close()
    df = read_particlefile(path, decode_times=False)
    assert np.isfinite(df["sample"]).all()
    np.testing.assert_allclose(df["sample"], 2.5, rtol=1e-6)


def test_write_fieldset_without_time(tmp_path):
    """A time-less (steady) fieldset writes t in plain seconds with no
    calendar metadata (reference test_particlefile.py:60-74)."""
    import pyarrow.parquet as pq

    from parcels_tpu.datasets import peninsula_dataset

    ds = peninsula_dataset()
    assert "time" not in ds.sizes
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    pset = ParticleSet(fs, x=[3e4], y=[25e3], t=[0.0])
    pf = ParticleFile(tmp_path / "nt.parquet", outputdt=np.timedelta64(1, "s"), mode="w")
    pset.execute(
        AdvectionRK4_nop, runtime=np.timedelta64(1, "s"), dt=np.timedelta64(1, "s"),
        output_file=pf,
    )
    pf.close()
    table = pq.read_table(tmp_path / "nt.parquet")
    meta = table.schema.field("t").metadata or {}
    assert meta.get(b"units", b"seconds") == b"seconds"
    assert b"calendar" not in meta
    assert table["t"].to_numpy()[-1] == 1.0


def AdvectionRK4_nop(particles, fieldset):  # noqa: N802
    """Do-nothing kernel (reference tests/common_kernels.py DoNothing)."""


def test_repeated_release_age_based_deletion(tmp_path):
    """Staggered releases + age-based deletion: each particle appears in the
    file exactly maxvar times with sample_var = 1..maxvar (reference
    test_pset_repeated_release_delayed_adding_deleting)."""
    import jax.numpy as jnp

    from parcels_tpu import StatusCode

    npart, maxvar = 8, 4
    fs = uniform_flow_fieldset(0.0, 0.0)
    fs.add_context("maxvar", float(maxvar))
    MyParticle = Particle.add_variable(Variable("sample_var", initial=0.0))

    pset = ParticleSet(
        fs,
        pclass=MyParticle,
        x=np.zeros(npart),
        y=np.zeros(npart),
        t=np.arange(1, npart + 1, dtype=np.float64),
    )
    pf = ParticleFile(tmp_path / "rr.parquet", outputdt=np.timedelta64(1, "s"), mode="w")

    def IncrVar(particles, fieldset):  # noqa: N802
        particles.sample_var = particles.sample_var + 1.0
        particles.state = jnp.where(
            particles.sample_var > fieldset.maxvar,
            jnp.int32(StatusCode.Delete),
            particles.state,
        )

    for _ in range(npart + maxvar + 2):
        pset.execute(
            IncrVar, dt=np.timedelta64(1, "s"), runtime=np.timedelta64(1, "s"),
            output_file=pf,
        )
    pf.close()
    df = read_particlefile(tmp_path / "rr.parquet")
    counts = df[df["sample_var"] > 0].groupby("particle_id")["sample_var"].max()
    assert (counts <= maxvar + 1).all()
    assert len(counts) == npart  # every staggered release made it to the file


def test_particlefile_readonly_attrs(tmp_path):
    pf = ParticleFile(tmp_path / "ro.parquet", outputdt=np.timedelta64(1, "s"), mode="w")
    for name in ("path", "outputdt"):
        with pytest.raises(AttributeError):
            setattr(pf, name, "something")
