"""Parity of the ux corner-row tier (ops/uxcol.py) vs the gather tier.

The fused-face-row search and corner-column sampling are a pure perf
re-expression of the gather-tier math (reference
_uxinterpolators.py:18-110 + index_search.py:393-436); forcing the tier on
the CPU backend must reproduce the gather tier to f32 rounding.
"""

import numpy as np
import pytest

from parcels_tpu import FieldSet, ParticleSet
from parcels_tpu._core.uxgrid import ux_search
from parcels_tpu.datasets.unstructured import delaunay_flow_dataset
from parcels_tpu.kernels import AdvectionRK4
from parcels_tpu.ops import uxcol


@pytest.fixture
def force_uxcol(monkeypatch):
    monkeypatch.setenv("PARCELS_TPU_UXCOL", "force")


def _fs(flow="rotation", placement="node", vertical="zc", **kw):
    ds = delaunay_flow_dataset(flow=flow, placement=placement, vertical=vertical, **kw)
    return FieldSet.from_ugrid_conventions(ds, mesh="flat")


@pytest.mark.parametrize("placement", ["node", "face"])
@pytest.mark.parametrize("vertical", ["zc", "zf"])
def test_eval_parity_col_vs_gather(placement, vertical, monkeypatch):
    """Field.eval values identical (f32 rounding) in both tiers."""
    fs = _fs("rotation", placement, vertical, nx=25, ny=25)
    rng = np.random.default_rng(7)
    n = 500
    x = rng.uniform(1e4, 9e4, n)
    y = rng.uniform(1e4, 9e4, n)
    z = rng.uniform(1.0, 90.0, n)
    t = np.full(n, 3600.0)

    monkeypatch.setenv("PARCELS_TPU_UXCOL", "off")
    u_g, v_g = fs.UV.eval(t, z, y, x)[:2]
    monkeypatch.setenv("PARCELS_TPU_UXCOL", "force")
    fs2 = _fs("rotation", placement, vertical, nx=25, ny=25)
    u_c, v_c = fs2.UV.eval(t, z, y, x)[:2]
    np.testing.assert_allclose(np.asarray(u_c), np.asarray(u_g), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(v_c), np.asarray(v_g), rtol=1e-6, atol=1e-7)


def test_trajectory_parity_col_vs_gather(monkeypatch):
    """End-to-end engine trajectories identical in both tiers."""
    rng = np.random.default_rng(5)
    n = 64
    x0 = rng.uniform(2e4, 8e4, n)
    y0 = rng.uniform(2e4, 8e4, n)

    out = {}
    for mode in ("off", "force"):
        monkeypatch.setenv("PARCELS_TPU_UXCOL", mode)
        fs = _fs("rotation", "node", "zc", nx=30, ny=30)
        pset = ParticleSet(fs, x=x0.copy(), y=y0.copy(), z=np.full(n, 10.0), t=np.zeros(n))
        pset.execute(
            AdvectionRK4, dt=np.timedelta64(10, "m"), runtime=np.timedelta64(3, "h")
        )
        out[mode] = (np.asarray(pset.x), np.asarray(pset.y))
    np.testing.assert_allclose(out["force"][0], out["off"][0], rtol=1e-6)
    np.testing.assert_allclose(out["force"][1], out["off"][1], rtol=1e-6)


def test_search_parity_fused_rows(force_uxcol):
    """ux_search with the fused face table returns identical faces/coords."""
    ds = delaunay_flow_dataset(flow="uniform", placement="node", vertical="zc", nx=20, ny=20)
    fs = _fs("uniform", "node", "zc", nx=20, ny=20)
    grid = fs.UV.U.grid
    garrs = grid.device_arrays()
    assert "face_table" in garrs, "force mode must ship the fused face table"
    rng = np.random.default_rng(11)
    n = 400
    x = rng.uniform(0, 1e5, n).astype(np.float32)
    y = rng.uniform(0, 1e5, n).astype(np.float32)
    z = np.full(n, 10.0, np.float32)

    g_with = ux_search(grid.spec, garrs, z, y, x, lookup_meta=grid.lookup_meta())
    garrs_no = {k: v for k, v in garrs.items() if k != "face_table"}
    g_without = ux_search(grid.spec, garrs_no, z, y, x, lookup_meta=grid.lookup_meta())
    np.testing.assert_array_equal(
        np.asarray(g_with["FACE"]["index"]), np.asarray(g_without["FACE"]["index"])
    )
    np.testing.assert_allclose(
        np.asarray(g_with["FACE"]["bcoord"]),
        np.asarray(g_without["FACE"]["bcoord"]),
        rtol=2e-5,
        atol=2e-6,
    )


def test_face_table_roundtrip():
    """Node ids / adjacency bitcast through the f32 table losslessly."""
    ds = delaunay_flow_dataset(flow="uniform", placement="face", vertical="zc", nx=12, ny=12)
    fs = _fs("uniform", "face", "zc", nx=12, ny=12)
    grid = fs.UV.U.grid
    tbl = uxcol.build_face_table(
        np.stack([grid.node_lon, grid.node_lat], axis=-1).astype(np.float32),
        grid.face_node_connectivity,
        grid._adjacency,
    )
    assert tbl.shape == (grid.spec.n_face, uxcol.ROW_WIDTH)
    import jax.numpy as jnp

    rows = uxcol.face_rows(jnp.asarray(tbl), jnp.arange(grid.spec.n_face))
    nids = np.asarray(uxcol.nids_from_rows(rows))
    np.testing.assert_array_equal(nids, grid.face_node_connectivity)
    k = jnp.zeros(grid.spec.n_face, jnp.int32)
    adj0 = np.asarray(uxcol.adj_from_rows(rows, k))
    np.testing.assert_array_equal(adj0, grid._adjacency[:, 0])


def test_weight_row_taps():
    """weight_row reproduces hat-time x tap-z weights incl. padding zeros."""
    import jax.numpy as jnp

    T, Z, width = 2, 5, uxcol.ROW_WIDTH
    ti = jnp.array([0, 0, 1], jnp.int32)
    tau = jnp.array([0.25, 0.0, 1.0], jnp.float32)
    zi = jnp.array([2, 0, 4], jnp.int32)
    w = uxcol.weight_row(T, Z, width, ti, tau, [(zi, None)])
    w = np.asarray(w)
    assert w.shape == (3, width)
    # lane 0: t taps (0, 1) with weights (0.75, 0.25) at z=2
    np.testing.assert_allclose(w[0, 0 * Z + 2], 0.75)
    np.testing.assert_allclose(w[0, 1 * Z + 2], 0.25)
    assert w[0].sum() == pytest.approx(1.0)
    # padding region is all zeros
    assert np.all(w[:, T * Z :] == 0.0)
    # two-tap vertical with explicit weights
    w2 = uxcol.weight_row(
        T, Z, width, ti, tau,
        [(zi, jnp.full(3, 0.3)), (jnp.clip(zi + 1, 0, Z - 1), jnp.full(3, 0.7))],
    )
    assert np.asarray(w2)[1].sum() == pytest.approx(1.0)
