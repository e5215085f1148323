"""Interpolator unit tests against hand-computed values.

Mirrors the reference idiom (reference tests/test_interpolation.py:31-108):
an analytic ramp field linear in every axis, for which multilinear
interpolation is exact at arbitrary query points; nearest/constant/land
variants against their defining property.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from parcels_tpu import (
    FieldSet,
    Particle,
    Variable,
    XLinearInvdistLandTracer,
    XNearest,
)
from parcels_tpu import xrlite as xr
from parcels_tpu.datasets.structured import _coords_2d, _wrap_sgrid


def _ramp_fieldset(a=2.0, b=3.0, c=5.0, d=7.0, tdim=4, zdim=4, ydim=4, xdim=3):
    """P(t, z, y, x) = a*th + b*zm + c*ym + d*xm with unit-second/meter axes."""
    lon = np.linspace(0, 1000, xdim)
    lat = np.linspace(0, 1000, ydim)
    depth = np.linspace(0, 100, zdim)
    time = np.array(
        [np.datetime64("2000-01-01") + np.timedelta64(i * 3600, "s") for i in range(tdim)]
    )
    tsec = np.arange(tdim) * 3600.0
    T, Z, Y, X = np.meshgrid(tsec, depth, lat, lon, indexing="ij")
    P = (a * T + b * Z + c * Y + d * X).astype(np.float32)
    ds = xr.Dataset(
        {"P": (["time", "depth", "YG", "XG"], P)},
        coords=_coords_2d(lon, lat, time=time, depth=depth, mesh="flat"),
    )
    ds = _wrap_sgrid(ds, xdim, ydim)
    return FieldSet.from_sgrid_conventions(ds, mesh="flat"), (a, b, c, d)


def _eval(fs, name, t, z, y, x):
    fsv = fs.build_views(fs.device_arrays())
    n = len(np.atleast_1d(x))
    out = getattr(fsv, name).eval(
        jnp.asarray(np.full(n, t, dtype=np.float64)),
        jnp.asarray(np.full(n, z, dtype=np.float32)),
        jnp.asarray(np.asarray(y, dtype=np.float32)),
        jnp.asarray(np.asarray(x, dtype=np.float32)),
    )
    return np.asarray(out)


def test_xlinear_exact_on_ramp():
    fs, (a, b, c, d) = _ramp_fieldset()
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1000, 20)
    y = rng.uniform(0, 1000, 20)
    t, z = 5000.0, 42.0
    got = _eval(fs, "P", t, z, y, x)
    expected = a * t + b * z + c * y + d * x
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_xlinear_time_blend():
    fs, (a, b, c, d) = _ramp_fieldset()
    got_mid = _eval(fs, "P", 1800.0, 0.0, [500.0], [500.0])
    got_lo = _eval(fs, "P", 0.0, 0.0, [500.0], [500.0])
    got_hi = _eval(fs, "P", 3600.0, 0.0, [500.0], [500.0])
    np.testing.assert_allclose(got_mid, 0.5 * (got_lo + got_hi), rtol=1e-6)


def test_xnearest_picks_nearest_node():
    fs, (a, b, c, d) = _ramp_fieldset()
    fs.fields["P"].interp_method = XNearest()
    fs._invalidate_caches()
    # x=400 -> nearest lon node 500; y=100 -> nearest lat node 0 (wait: nodes
    # are 0, 333.3, 666.7, 1000 for xdim=3? xdim=3 -> 0, 500, 1000)
    got = _eval(fs, "P", 0.0, 0.0, [100.0], [400.0])
    expected = 7.0 * 500.0 + 5.0 * 0.0
    np.testing.assert_allclose(got, [expected], rtol=1e-6)


def test_constant_field():
    fs, _ = _ramp_fieldset()
    fs.add_constant_field("K", 42.0, mesh="flat")
    got = _eval(fs, "K", 123.0, 9.0, [700.0], [100.0])
    np.testing.assert_allclose(got, [42.0])


def test_invdist_land_tracer_ignores_land():
    """Land corners (value 0) are excluded via inverse-distance weighting of
    wet corners (reference _xinterpolators.py:571-628)."""
    fs, _ = _ramp_fieldset()
    data = fs.fields["P"].data.copy()
    data[:] = 1.0
    # land column at x-node 0 (value 0 marks land in this scheme)
    data[:, :, :, 0] = 0.0
    fs.fields["P"].data = data
    fs.fields["P"].interp_method = XLinearInvdistLandTracer()
    fs._invalidate_caches()
    # query between land node (x=0) and wet node (x=500): all wet corners
    # carry 1.0, so the land-aware sample must be exactly 1.0 (plain linear
    # would blend toward 0)
    got = _eval(fs, "P", 0.0, 0.0, [500.0], [100.0])
    np.testing.assert_allclose(got, [1.0], rtol=1e-6)

    plain = _ramp_fieldset()[0]
    pdata = plain.fields["P"].data.copy()
    pdata[:] = 1.0
    pdata[:, :, :, 0] = 0.0
    plain.fields["P"].data = pdata
    plain._invalidate_caches()
    blended = _eval(plain, "P", 0.0, 0.0, [500.0], [100.0])
    assert blended[0] < 0.9  # plain linear DOES blend toward land zeros


def test_oob_sample_returns_zero():
    fs, _ = _ramp_fieldset()
    got = _eval(fs, "P", 0.0, 0.0, [500.0], [2000.0])
    np.testing.assert_allclose(got, [0.0])


def test_interpolate_exactly_on_domain_edge():
    """Sampling exactly at the last/first grid node is in-bounds (reference
    test_particleset_interpolate_on_domainedge)."""
    from tests.conftest import uniform_flow_fieldset
    from parcels_tpu import ParticleSet
    from parcels_tpu.kernels import AdvectionEE

    fs = uniform_flow_fieldset(u=0.0, v=0.0)  # still water: positions hold
    lon = fs._gridset[0].lon
    lat = fs._gridset[0].lat
    x = np.array([lon[0], lon[-1], lon[-1]])
    y = np.array([lat[0], lat[0], lat[-1]])
    pset = ParticleSet(fs, x=x, y=y, t=np.zeros(3))
    pset.execute(AdvectionEE, dt=np.timedelta64(60, "s"), runtime=np.timedelta64(120, "s"))
    np.testing.assert_allclose(pset.x, x, atol=1e-6)
    np.testing.assert_allclose(pset.y, y, atol=1e-6)
    assert np.all(pset.t == 120.0)


def test_host_field_getitem_sugar():
    """field[t,z,y,x] and field[pset] host-side sampling sugar
    (reference field.py:187-196, :296-304)."""
    from parcels_tpu import FieldSet, ParticleSet
    from parcels_tpu.datasets import moving_eddy_dataset

    fs = FieldSet.from_sgrid_conventions(moving_eddy_dataset(), mesh="flat")
    u1 = fs.U[0.0, 0.0, 12500.0, 12000.0]
    u2 = fs.U.eval(0.0, 0.0, 12500.0, 12000.0)
    np.testing.assert_array_equal(u1, u2)
    uv = fs.UV[0.0, 0.0, 12500.0, 12000.0]
    assert len(uv) == 2
    pset = ParticleSet(fs, x=[12000.0], y=[12500.0], t=[np.timedelta64(0, "s")])
    u3, v3 = fs.UV[pset]
    np.testing.assert_allclose(u3, u1, rtol=1e-6)


def test_add_constant_field_sampling_semantics():
    """Constant fields sample to their value at any position/time, on both
    flat and spherical meshes, host-side and inside a traced kernel
    (reference fieldset.py:198-228 + XConstantField)."""
    import jax.numpy as jnp

    from parcels_tpu import ParticleSet
    from parcels_tpu.datasets import simple_UV_dataset
    from tests.conftest import uniform_flow_fieldset

    fs = uniform_flow_fieldset(u=0.0, v=0.0)
    fs.add_constant_field("Kflat", 3.5, mesh="flat")
    fs.add_constant_field("Ksph", 7.25, mesh="spherical")
    with pytest.raises(ValueError, match="mesh"):
        fs.add_constant_field("Kbad", 1.0, mesh="cubed")

    # host-side eval at arbitrary coordinates, in and out of the main domain
    for x, y in ((0.0, 0.0), (1e5, -3e4), (1e9, 1e9)):
        v = fs.fields["Kflat"].eval(np.timedelta64(0, "s"), np.array([0.0]),
                                    np.array([y]), np.array([x]))
        np.testing.assert_allclose(np.asarray(v), 3.5)
        v = fs.fields["Ksph"].eval(np.timedelta64(5, "h"), np.array([0.0]),
                                   np.array([y]), np.array([x]))
        np.testing.assert_allclose(np.asarray(v), 7.25)

    # traced kernel access via fieldset.<name>[particles]
    pclass = Particle.add_variable(Variable("ksum", dtype=np.float32, initial=0.0))

    def SampleK(particles, fieldset):  # noqa: N802
        particles.ksum = fieldset.Kflat[particles] + fieldset.Ksph[particles]

    pset = ParticleSet(fs, pclass=pclass, x=[1e5], y=[1e5], t=[0.0])
    pset.execute(SampleK, dt=np.timedelta64(1, "h"), runtime=np.timedelta64(1, "h"))
    np.testing.assert_allclose(pset.ksum, 3.5 + 7.25, rtol=1e-6)

    # spherical main grid + constant field: value unchanged by deg conversion
    ds = simple_UV_dataset(dims=(2, 2, 30, 30), mesh="spherical")
    fs2 = FieldSet.from_sgrid_conventions(ds, mesh="spherical")
    fs2.add_constant_field("Kh", 11.0)  # default spherical
    pset2 = ParticleSet(fs2, pclass=pclass, x=[10.0], y=[45.0], t=[0.0])

    def SampleKh(particles, fieldset):  # noqa: N802
        particles.ksum = fieldset.Kh[particles]

    pset2.execute(SampleKh, dt=np.timedelta64(1, "h"), runtime=np.timedelta64(1, "h"))
    np.testing.assert_allclose(pset2.ksum, 11.0, rtol=1e-6)
