"""Support-layer tests: xrlite containers, tutorial API, describe/repr,
warning taxonomy, windowing/sharding guard."""

import io

import numpy as np
import pytest

from parcels_tpu import FieldSet, ParticleSet, tutorial
from parcels_tpu import xrlite as xr
from parcels_tpu.datasets import moving_eddy_dataset


def test_xrlite_dataset_basics():
    ds = xr.Dataset(
        {"U": (("t", "x"), np.zeros((2, 3)))},
        coords={"x": (("x",), np.arange(3.0), {"units": "m"})},
    )
    assert ds.sizes == {"t": 2, "x": 3}
    assert "U" in ds and "x" in ds.coords
    ds2 = ds.rename({"U": "V", "x": "lon"})
    assert "V" in ds2 and "lon" in ds2.dims
    assert "U" not in ds2
    assert ds2["lon"].attrs["units"] == "m"
    # original untouched
    assert "U" in ds


def test_xrlite_conflicting_dims_rejected():
    with pytest.raises(ValueError, match="Conflicting"):
        xr.Dataset({"a": (("x",), np.zeros(3)), "b": (("x",), np.zeros(4))})


def test_xrlite_dataarray_dims_must_match():
    with pytest.raises(ValueError):
        xr.DataArray(np.zeros((2, 3)), dims=("t",))


def test_tutorial_open_dataset():
    ds = tutorial.open_dataset("moving_eddy")
    assert "U" in ds.data_vars
    with pytest.raises(ValueError, match="Unknown tutorial dataset"):
        tutorial.open_dataset("nope")
    assert "moving_eddy" in tutorial.list_datasets()


def test_describe_and_repr_smoke():
    fs = FieldSet.from_sgrid_conventions(moving_eddy_dataset(), mesh="flat")
    buf = io.StringIO()
    fs.describe(buf)
    assert "UV" in buf.getvalue()
    pset = ParticleSet(fs, x=[12000.0], y=[12000.0])
    assert "ParticleSet(n=1" in repr(pset)
    buf2 = io.StringIO()
    pset.describe(buf2)
    assert "x:" in buf2.getvalue()
    assert "XGrid(" in repr(fs.gridset[0])


def test_windowing_with_particle_mesh_executes():
    """Windowed streaming composes with sharded execution (full-equivalence
    coverage lives in tests/test_domain.py)."""
    from parcels_tpu.kernels import AdvectionEE
    from parcels_tpu.parallel import ParticleMesh, shard_particleset

    fs = FieldSet.from_sgrid_conventions(moving_eddy_dataset(), mesh="flat")
    fs.set_time_window(8)
    pset = ParticleSet(fs, x=[12000.0], y=[12000.0], t=[0.0])
    shard_particleset(pset, ParticleMesh(n_devices=1))
    pset.execute(AdvectionEE, dt=np.timedelta64(5, "m"), runtime=np.timedelta64(30, "m"))
    assert pset.t[0] == 1800.0
    assert fs.window_stats["loads"] >= 1


def test_context_constant_readable_and_guarded():
    fs = FieldSet.from_sgrid_conventions(moving_eddy_dataset(), mesh="flat")
    fs.add_context("dres", 123.0)
    assert fs.dres == 123.0
    with pytest.raises(ValueError, match="already has a context"):
        fs.add_context("dres", 5.0)
    with pytest.raises(AttributeError, match="Cannot assign"):
        fs.dres = 7.0


def test_profiling_trace_and_run_stats(tmp_path):
    """SURVEY §5 observability: jax trace capture + per-execute metrics."""
    from parcels_tpu import profiling
    from parcels_tpu.kernels import AdvectionRK4

    fs = FieldSet.from_sgrid_conventions(moving_eddy_dataset(), mesh="flat")
    pset = ParticleSet(fs, x=[12000.0], y=[12500.0], t=[np.timedelta64(0, "s")])
    logdir = str(tmp_path / "trace")
    with profiling.trace(logdir):
        with profiling.annotate("advect"):
            pset.execute(
                AdvectionRK4,
                dt=np.timedelta64(5, "m"),
                runtime=np.timedelta64(30, "m"),
            )
    import os

    trace_files = [
        os.path.join(r, name) for r, _, files in os.walk(logdir) for name in files
    ]
    assert any(name.endswith((".pb", ".json.gz", ".json")) for name in trace_files), (
        f"no trace written: {trace_files}"
    )
    stats = pset.last_run_stats
    assert stats["chunks"] >= 1
    assert stats["particles"] == 1
    assert stats["wall_s"] > 0
    assert stats["particle_steps_per_s"] > 0


def test_fieldset_add_combines_fields_and_context():
    """FieldSet merging (reference fieldset.py:110-117 + test_fieldset.py)."""
    from parcels_tpu import Field, FieldSet
    from parcels_tpu.kernels import AdvectionRK4

    fs1 = FieldSet.from_sgrid_conventions(moving_eddy_dataset(), mesh="flat")
    fs2 = FieldSet()
    fs2.add_constant_field("Kh", 10.0, mesh="flat")
    fs2.add_context("dres", 0.01)
    fs1.add_context("alpha", 2.0)

    fs = fs1 + fs2
    assert set(fs.fields) >= {"U", "V", "UV", "Kh"}
    assert fs.dres == 0.01 and fs.alpha == 2.0
    # sources unharmed: both still run / evaluate correctly
    pset = ParticleSet(fs1, x=[12000.0], y=[12500.0], t=[np.timedelta64(0, "s")])
    pset.execute(AdvectionRK4, dt=np.timedelta64(5, "m"), runtime=np.timedelta64(10, "m"))
    assert np.asarray(fs2.Kh.eval(0.0, 0.0, 0.0, 0.0))[0] == 10.0
    # the combined set samples fields from both sources
    assert np.asarray(fs.Kh.eval(0.0, 0.0, 0.0, 0.0))[0] == 10.0
    assert np.isfinite(np.asarray(fs.U.eval(0.0, 0.0, 12500.0, 12000.0))).all()
    # collisions raise
    import pytest

    with pytest.raises(ValueError, match="field names in common"):
        fs1 + fs1
    fs3 = FieldSet()
    fs3.add_context("alpha", 1.0)
    with pytest.raises(ValueError, match="context value names in common"):
        fs1 + fs3


def test_remote_dataset_registry():
    """Remote registry mirrors reference _datasets/remote.py:205-320: same
    names, purpose filtering, benchmark entries served as generated local
    equivalents (no network egress), clear errors otherwise."""
    import warnings

    import pytest as _pytest

    from parcels_tpu.datasets import list_remote_datasets, open_remote_dataset

    names = list_remote_datasets()
    assert "Benchmarks_MOi_data_metadata-only/U" in names
    assert "NemoNorthSeaORCA025-N006_data/mesh_mask" in names
    testing = list_remote_datasets("testing")
    assert all(n.startswith("Benchmarks_") for n in testing) and len(testing) == 6
    with _pytest.raises(ValueError, match="purpose"):
        list_remote_datasets("nope")

    with _pytest.warns(UserWarning, match="local equivalent"):
        u = open_remote_dataset("Benchmarks_MOi_data_metadata-only/U")
    assert "vozocrtx" in u.data_vars
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        mesh = open_remote_dataset("Benchmarks_MOi_data_metadata-only/mesh")
        grid = open_remote_dataset("Benchmarks_FESOM2-baroclinic-gyre/grid")
    assert "glamf" in mesh.coords
    assert "face_nodes" in grid.data_vars

    with _pytest.raises(RuntimeError, match="network"):
        open_remote_dataset("SCHISM_LakeOntario/out2d")
    with _pytest.raises(ValueError, match="Unknown remote dataset"):
        open_remote_dataset("bogus/entry")


def test_fesom2_style_through_convert():
    """The FESOM2-native mimic passes through fesom_to_ugrid naming."""
    from parcels_tpu import convert
    from parcels_tpu.datasets import fesom2_style_dataset

    ds = fesom2_style_dataset("data")
    out = convert.fesom_to_ugrid(ds)
    assert "zf" in out.sizes and "zc" in out.sizes


def test_v3to4_compat_patch():
    """v3-era 'Unit' attrs are renamed to 'units' (reference _v3to4.py)."""
    from parcels_tpu import xrlite as xr
    from parcels_tpu._v3to4 import patch_dataset_v4_compat

    ds = xr.Dataset({"U": (("x",), np.zeros(3), {"Unit": "m/s"})},
                    coords={"x": (("x",), np.arange(3.0), {"Unit": "m"})})
    out = patch_dataset_v4_compat(ds)
    assert out["U"].attrs == {"units": "m/s"}
    assert out["x"].attrs == {"units": "m"}


def test_tutorial_registry_widened():
    from parcels_tpu import tutorial

    names = tutorial.list_datasets()
    for n in ("moi_like", "padded_variant", "fesom2_style", "curvilinear_rotated"):
        assert n in names
    ds = tutorial.open_dataset("padded_variant", variant="outer")
    assert "data_c" in ds.data_vars
    with pytest.raises(ValueError, match="Unknown tutorial dataset"):
        tutorial.open_dataset("bogus")


def test_deprecated_decorator():
    import warnings

    from parcels_tpu._decorators import deprecated

    @deprecated("Use new_fn instead.")
    def old_fn(a):
        """Old."""
        return a * 2

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert old_fn(3) == 6
    assert any(issubclass(w.category, DeprecationWarning) for w in rec)
    assert "deprecated" in (old_fn.__doc__ or "")
