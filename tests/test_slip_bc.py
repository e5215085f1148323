"""Free-slip / partial-slip boundary-condition interpolators + C-grid tracer.

Expectations derived from the reference scheme (_xinterpolators.py:386-476):
with the south corner row on land (u=v=0), plain linear gives u = eta*u_n;
free-slip rescales by 1/eta recovering u_n; partial-slip by (a+b*eta)/eta
with a=b=0.5.
"""

import numpy as np

import jax.numpy as jnp

from parcels_tpu import (
    CGrid_Tracer,
    FieldSet,
    XFreeslip,
    XPartialslip,
)
from parcels_tpu.datasets import peninsula_dataset, simple_UV_dataset


def _land_south_fs(interp):
    ds = simple_UV_dataset(dims=(2, 1, 8, 8), mesh="flat")
    ds["U"].values[:] = 1.0
    ds["V"].values[:] = 0.0
    ds["U"].values[:, :, 0, :] = 0.0  # land row at the southernmost nodes
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    fs.fields["UV"].interp_method = interp
    fs._invalidate_caches()
    return fs


def _sample_uv(fs, x, y):
    fsv = fs.build_views(fs.device_arrays())
    n = len(x)
    out = fsv.UV.eval(
        jnp.zeros(n, jnp.float32),
        jnp.zeros(n, jnp.float32),
        jnp.asarray(np.asarray(y, np.float32)),
        jnp.asarray(np.asarray(x, np.float32)),
    )
    return tuple(np.asarray(o) for o in out)


def test_freeslip_recovers_interior_velocity():
    fs = _land_south_fs(XFreeslip())
    # domain y in [-1e6, 1e6], 8 nodes -> spacing ~285714 m; eta=0.25 in cell 0
    y_nodes = np.linspace(-1e6, 1e6, 8)
    eta = 0.25
    y = y_nodes[0] + eta * (y_nodes[1] - y_nodes[0])
    u, v = _sample_uv(fs, [0.0], [y])
    np.testing.assert_allclose(u, [1.0], rtol=1e-5)  # not eta-scaled


def test_partialslip_scales_between():
    fs = _land_south_fs(XPartialslip())
    y_nodes = np.linspace(-1e6, 1e6, 8)
    eta = 0.25
    y = y_nodes[0] + eta * (y_nodes[1] - y_nodes[0])
    u, v = _sample_uv(fs, [0.0], [y])
    np.testing.assert_allclose(u, [0.5 + 0.5 * eta], rtol=1e-5)


def test_plain_linear_is_eta_scaled_baseline():
    from parcels_tpu import XLinear_Velocity

    fs = _land_south_fs(XLinear_Velocity())
    y_nodes = np.linspace(-1e6, 1e6, 8)
    eta = 0.25
    y = y_nodes[0] + eta * (y_nodes[1] - y_nodes[0])
    u, v = _sample_uv(fs, [0.0], [y])
    np.testing.assert_allclose(u, [eta], rtol=1e-4)


def test_cgrid_tracer_piecewise_constant():
    """C-grid tracer sampling is constant within each cell (reference
    _xinterpolators.py:335-383)."""
    ds = peninsula_dataset(grid_type="C")
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    fs.fields["P"].interp_method = CGrid_Tracer()
    fs._invalidate_caches()
    fsv = fs.build_views(fs.device_arrays())

    # two points inside the same cell (dx ~1010 m, dy ~1020 m) -> identical
    xs = np.array([20_500.0, 21_000.0], np.float32)
    ys = np.array([30_000.0, 30_300.0], np.float32)
    vals = np.asarray(
        fsv.P.eval(jnp.zeros(2, jnp.float32), jnp.zeros(2, jnp.float32), jnp.asarray(ys), jnp.asarray(xs))
    )
    assert vals[0] == vals[1]
    assert np.isfinite(vals).all() and (vals != 0).all()
