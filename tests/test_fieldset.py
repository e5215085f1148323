"""FieldSet construction/validation behaviors (reference tests/test_fieldset.py).

Vector-field discovery and validation, grid deduplication, multi-model time
intervals, duplicate guards, constant fields and context semantics.
"""

import numpy as np
import pytest

from parcels_tpu import FieldSet, ParticleSet
from parcels_tpu.datasets import generic_datasets, simple_UV_dataset


def _uv_ds():
    return simple_UV_dataset(dims=(2, 2, 8, 8), mesh="flat")


@pytest.mark.parametrize(
    "vector_fields, match",
    [
        ({"UV": ("U",)}, "either 2 or 3 components"),
        ({"UV": ("U", "V", "U", "V")}, "either 2 or 3 components"),
        ({"UV": ("U", "NOPE")}, "not in dataset"),
    ],
)
def test_invalid_vector_fields(vector_fields, match):
    with pytest.raises(ValueError, match=match):
        FieldSet.from_sgrid_conventions(_uv_ds(), mesh="flat", vector_fields=vector_fields)


def test_vectorfield_default_discovery():
    fs = FieldSet.from_sgrid_conventions(_uv_ds(), mesh="flat")
    assert {"U", "V", "UV"} <= set(fs.fields)


def test_vectorfield_custom_and_empty():
    fs = FieldSet.from_sgrid_conventions(
        _uv_ds(), mesh="flat", vector_fields={"flow": ("U", "V")}
    )
    assert "flow" in fs.fields and "UV" not in fs.fields
    fs2 = FieldSet.from_sgrid_conventions(_uv_ds(), mesh="flat", vector_fields={})
    assert "UV" not in fs2.fields  # empty dict disables discovery (reference :170)


def test_gridset_deduplication():
    """U and V on the same grid share one grid object (reference :296)."""
    fs = FieldSet.from_sgrid_conventions(_uv_ds(), mesh="flat")
    assert len(fs.gridset) == 1
    assert fs.fields["U"].grid is fs.fields["V"].grid


def test_duplicate_field_name_raises():
    fs = FieldSet.from_sgrid_conventions(_uv_ds(), mesh="flat")
    with pytest.raises(ValueError, match="already has a Field"):
        fs.add_field(fs.fields["U"], name="U")


def test_duplicate_context_raises():
    fs = FieldSet.from_sgrid_conventions(_uv_ds(), mesh="flat")
    fs.add_context("dres", 0.01)
    with pytest.raises(ValueError, match="already has a context"):
        fs.add_context("dres", 0.02)
    with pytest.raises(ValueError, match="identifier"):
        fs.add_context("not a name", 1)


def test_constant_fields_do_not_constrain_time_interval():
    """Constant fields have no time axis; the fieldset interval comes from
    the data fields alone (reference :260)."""
    fs = FieldSet.from_sgrid_conventions(_uv_ds(), mesh="flat")
    ti_before = fs.time_interval
    fs.add_constant_field("Kh", 10.0, mesh="flat")
    assert fs.time_interval == ti_before


def test_fieldset_no_uv_sampling_only():
    """A fieldset without U/V still supports pure sampling runs
    (reference :92)."""
    ds = _uv_ds()
    ds.data_vars["P"] = ds["U"].copy()
    ds.data_vars.pop("U")
    ds.data_vars.pop("V")
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat", vector_fields={})
    assert "P" in fs.fields and "UV" not in fs.fields
    val = fs.fields["P"].eval(
        np.timedelta64(0, "s"), np.array([0.0]), np.array([1e5]), np.array([1e5])
    )
    assert np.isfinite(np.asarray(val)).all()


def test_from_all_generic_padding_datasets():
    """Every padding-variant fixture builds a FieldSet (reference :107-140
    parametrizes its shared datasets the same way)."""
    for name, ds in generic_datasets().items():
        fs = FieldSet.from_sgrid_conventions(
            ds, mesh="flat", vector_fields={"UV": ("U_A_grid", "V_A_grid")}
        )
        assert "UV" in fs.fields, name


def test_add_field_after_pset_warns_or_works():
    """Adding a field after a ParticleSet exists still samples correctly
    (reference :306)."""
    fs = FieldSet.from_sgrid_conventions(_uv_ds(), mesh="flat")
    pset = ParticleSet(fs, x=[1e5], y=[1e5], t=[0.0])
    fs.add_constant_field("Klate", 5.0, mesh="flat")
    from parcels_tpu import Particle, Variable

    pclass = Particle.add_variable(Variable("s", dtype=np.float32, initial=0.0))
    pset2 = ParticleSet(fs, pclass=pclass, x=[1e5], y=[1e5], t=[0.0])

    def S(particles, fieldset):  # noqa: N802
        particles.s = fieldset.Klate[particles]

    pset2.execute(S, dt=np.timedelta64(1, "h"), runtime=np.timedelta64(1, "h"))
    np.testing.assert_allclose(pset2.s, 5.0)
    assert pset is not None


def test_multi_model_time_interval_intersection():
    """Merging fieldsets intersects their time intervals (reference :223)."""
    ds1 = simple_UV_dataset(dims=(2, 2, 8, 8), mesh="flat")
    ds2 = simple_UV_dataset(dims=(2, 2, 8, 8), mesh="flat")
    fs1 = FieldSet.from_sgrid_conventions(ds1, mesh="flat", vector_fields={})
    fs2 = FieldSet.from_sgrid_conventions(ds2, mesh="flat", vector_fields={})
    fs2 = FieldSet.from_sgrid_conventions(ds2.rename({"U": "U2", "V": "V2"}), mesh="flat",
                                          vector_fields={})
    merged = fs1 + fs2
    assert merged.time_interval == fs1.time_interval
