"""All four SGRID padding layouts driven through every structured interpolator.

Mirrors the reference's use of ds_2d_left/right/inner/outer as its shared
fieldset fixture (reference _datasets/structured/generic.py:142-421,
tests/datasets/test_structured.py, tests/test_xgrid.py:295-335): the same
staggered data in MITgcm (HIGH), NEMO (LOW), inner (NONE), and outer (BOTH)
padding must ingest, sample, and advect identically.
"""

import numpy as np
import pytest

from parcels_tpu import (
    FieldSet,
    ParticleSet,
    XFreeslip,
    XLinear,
    XNearest,
    XPartialslip,
    _sgrid as sgrid,
)
from parcels_tpu.datasets import generic_datasets, padded_variant_dataset
from parcels_tpu.kernels import AdvectionRK4

VARIANTS = ("left", "right", "inner", "outer")


def _fieldset(variant):
    ds = padded_variant_dataset(variant)
    return FieldSet.from_sgrid_conventions(
        ds,
        mesh="flat",
        vector_fields={"UV": ("U_A_grid", "V_A_grid"), "UV_C": ("U_C_grid", "V_C_grid")},
    )


def test_registry_names_and_padding():
    reg = generic_datasets()
    assert set(reg) == {"ds_2d_left", "ds_2d_right", "ds_2d_inner", "ds_2d_outer"}
    expected = {
        "ds_2d_left": sgrid.Padding.HIGH,
        "ds_2d_right": sgrid.Padding.LOW,
        "ds_2d_inner": sgrid.Padding.NONE,
        "ds_2d_outer": sgrid.Padding.BOTH,
    }
    for name, ds in reg.items():
        meta = sgrid.parse_sgrid_metadata(ds)
        for fnp in meta.face_dimensions:
            assert fnp.padding == expected[name], name
        # face-count arithmetic consistent with the shared SGRID math
        nf = ds.sizes[meta.face_dimensions[0].face]
        nn = ds.sizes[meta.face_dimensions[0].node]
        assert nf == sgrid.get_n_faces(nn, expected[name]), name


@pytest.mark.parametrize("variant", VARIANTS)
def test_agrid_advection_exact(variant):
    """Uniform 1 m/s A-grid flow advects exactly in every padding layout."""
    fs = _fieldset(variant)
    pset = ParticleSet(fs, x=[2500.0], y=[3000.0], z=[15.0], t=[np.timedelta64(0, "s")])
    pset.execute(AdvectionRK4, dt=np.timedelta64(60, "s"), runtime=np.timedelta64(30, "m"))
    assert abs(pset.x[0] - (2500.0 + 1800.0)) < 1e-2, (variant, pset.x)
    assert abs(pset.y[0] - 3000.0) < 1e-6


@pytest.mark.parametrize("variant", VARIANTS)
def test_cgrid_advection_exact(variant):
    """Uniform 1 m/s face-normal C-grid velocity advects exactly in every
    padding layout (Delandmeter & van Sebille flux scheme; the edge-length
    normalization cancels on a uniform grid)."""
    fs = _fieldset(variant)

    def kernel(particles, fieldset):
        u, v = fieldset.UV_C[particles]
        particles.dx += u * particles.dt
        particles.dy += v * particles.dt

    pset = ParticleSet(fs, x=[2500.0], y=[3000.0], z=[15.0], t=[np.timedelta64(0, "s")])
    pset.execute(kernel, dt=np.timedelta64(60, "s"), runtime=np.timedelta64(10, "m"))
    assert abs(pset.x[0] - (2500.0 + 600.0)) < 1.0, (variant, pset.x)
    assert abs(pset.y[0] - 3000.0) < 1e-5


@pytest.mark.parametrize("variant", VARIANTS)
def test_scalar_interpolators_all_run(variant):
    """XLinear/XNearest sample node- and face-placed scalars in-bounds in
    every layout; values stay within the data range (random in [0,1))."""
    fs = _fieldset(variant)
    for fname in ("data_g", "data_c"):
        for method in (XLinear(), XNearest()):
            fs.fields[fname].interp_method = method
            vals = fs.fields[fname].eval(
                np.timedelta64(30, "m"),
                np.array([12.0, 18.0]),
                np.array([2500.0, 3100.0]),
                np.array([2500.0, 4100.0]),
            )
            assert np.all((vals >= 0.0) & (vals <= 1.0)), (variant, fname, method)


@pytest.mark.parametrize("variant", VARIANTS)
def test_slip_interpolators_run(variant):
    """Free/partial-slip vector interpolation runs in every layout."""
    fs = _fieldset(variant)
    for method in (XFreeslip(), XPartialslip()):
        fs.fields["UV"].interp_method = method
        u, v = fs.fields["UV"].eval(
            np.timedelta64(30, "m"),
            np.array([12.0]),
            np.array([3000.0]),
            np.array([2500.0]),
        )
        assert np.isfinite(u).all() and np.isfinite(v).all(), (variant, method)
