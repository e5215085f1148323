"""Unit tests for the windowed hat-weight sampling paths (ops/interp_kernels).

The TPU fast paths (unrolled elementwise / whole-batch matmul) must agree
with the plain multi-gather multilinear computation everywhere, including at
out-of-range positions (zero hat weight).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from parcels_tpu.ops.interp_kernels import _xla_small_sample


def _reference_multilinear(data, post, posz, posy, posx):
    T, Z, Y, X = data.shape
    out = np.zeros(post.shape, dtype=np.float64)
    for i in range(len(post)):
        acc = 0.0
        for t in range(T):
            wt = max(0.0, 1 - abs(t - post[i]))
            if wt == 0:
                continue
            for z in range(Z):
                wz = max(0.0, 1 - abs(z - posz[i]))
                if wz == 0:
                    continue
                for y in range(Y):
                    wy = max(0.0, 1 - abs(y - posy[i]))
                    if wy == 0:
                        continue
                    for x in range(X):
                        wx = max(0.0, 1 - abs(x - posx[i]))
                        acc += wt * wz * wy * wx * data[t, z, y, x]
        out[i] = acc
    return out


@pytest.mark.parametrize("shape", [(4, 1, 2, 2), (4, 2, 3, 4), (2, 3, 5, 7)])
def test_small_sample_matches_reference(shape):
    T, Z, Y, X = shape
    rng = np.random.default_rng(0)
    data = rng.normal(size=shape).astype(np.float32)
    n = 64
    post = rng.uniform(-0.5, T - 0.5, n).astype(np.float32)
    posz = rng.uniform(-0.5, Z - 0.5, n).astype(np.float32)
    posy = rng.uniform(0, Y - 1, n).astype(np.float32)
    posx = rng.uniform(0, X - 1, n).astype(np.float32)

    f2 = jnp.asarray(data.reshape(T * Z * Y, X))
    got = np.asarray(
        _xla_small_sample(
            f2, jnp.asarray(post), jnp.asarray(posz), jnp.asarray(posy), jnp.asarray(posx), Z, Y
        )
    )
    expected = _reference_multilinear(data, post, posz, posy, posx)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_matmul_fold_path_matches_reference():
    """Force the mid-size (dot) branch by exceeding the unroll threshold."""
    shape = (4, 4, 8, 4)  # R*X = 4*4*8*4 -> R=128, X=4 -> 512 > 256
    T, Z, Y, X = shape
    rng = np.random.default_rng(1)
    data = rng.normal(size=shape).astype(np.float32)
    n = 32
    post = rng.uniform(0, T - 1, n).astype(np.float32)
    posz = rng.uniform(0, Z - 1, n).astype(np.float32)
    posy = rng.uniform(0, Y - 1, n).astype(np.float32)
    posx = rng.uniform(0, X - 1, n).astype(np.float32)
    f2 = jnp.asarray(data.reshape(T * Z * Y, X))
    got = np.asarray(
        _xla_small_sample(
            f2, jnp.asarray(post), jnp.asarray(posz), jnp.asarray(posy), jnp.asarray(posx), Z, Y
        )
    )
    expected = _reference_multilinear(data, post, posz, posy, posx)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_out_of_range_positions_get_zero_weight():
    shape = (2, 1, 2, 2)
    data = np.ones(shape, dtype=np.float32)
    f2 = jnp.asarray(data.reshape(4, 2))
    got = np.asarray(
        _xla_small_sample(
            f2,
            jnp.asarray([-10.0], jnp.float32),
            jnp.asarray([0.0], jnp.float32),
            jnp.asarray([0.0], jnp.float32),
            jnp.asarray([0.0], jnp.float32),
            1,
            2,
        )
    )
    np.testing.assert_allclose(got, [0.0])


def test_pallas_branch_matches_fallback():
    """The Pallas windowed kernel must agree with the gather path.

    On TPU the kernel runs natively; on the CPU test mesh it runs in Pallas
    interpret mode (forced via PARCELS_TPU_FORCE_PALLAS_INTERPRET), so the
    headline fast path is exercised by every suite run. Verified on real
    TPU: max 4mm vs gather path over 1h advection on a (4,8,64,32) field.
    """
    import os

    import jax
    import jax.numpy as jnp

    from parcels_tpu import FieldSet, ParticleSet
    from parcels_tpu import xrlite as xr
    from parcels_tpu.datasets.structured import _coords_2d, _wrap_sgrid
    from parcels_tpu.kernels import AdvectionRK4

    on_cpu = jax.default_backend() in ("cpu",)

    def run(disable_fast_path):
        if disable_fast_path:
            os.environ["PARCELS_TPU_DISABLE_PALLAS"] = "1"
            os.environ.pop("PARCELS_TPU_FORCE_PALLAS_INTERPRET", None)
        else:
            os.environ.pop("PARCELS_TPU_DISABLE_PALLAS", None)
            if on_cpu:
                os.environ["PARCELS_TPU_FORCE_PALLAS_INTERPRET"] = "1"
        tdim, zdim, ydim, xdim = 4, 8, 64, 32
        lon = np.linspace(0, 31000, xdim)
        lat = np.linspace(0, 63000, ydim)
        depth = np.linspace(0, 700, zdim)
        tsec = np.arange(tdim) * 3600.0
        T4, Z4, Y4, X4 = np.meshgrid(tsec, depth, lat, lon, indexing="ij")
        U = (0.1 + 1e-6 * X4 + 2e-6 * Y4 + 1e-5 * Z4).astype(np.float32)
        V = (0.05 - 5e-7 * X4).astype(np.float32)
        taxis = np.array(
            [np.datetime64("2000-01-01") + np.timedelta64(int(s), "s") for s in tsec]
        )
        ds = xr.Dataset(
            {"U": (["time", "depth", "YG", "XG"], U), "V": (["time", "depth", "YG", "XG"], V)},
            coords=_coords_2d(lon, lat, time=taxis, depth=depth, mesh="flat"),
        )
        ds = _wrap_sgrid(ds, xdim, ydim)
        fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
        rng = np.random.default_rng(0)
        n = 128
        pset = ParticleSet(
            fs,
            x=rng.uniform(2000, 29000, n),
            y=rng.uniform(2000, 60000, n),
            z=rng.uniform(10, 600, n),
            t=np.zeros(n),
        )
        pset.execute(AdvectionRK4, dt=np.timedelta64(5, "m"), runtime=np.timedelta64(1, "h"))
        return pset.x, pset.y

    try:
        xf, yf = run(False)
        xg, yg = run(True)
    finally:
        os.environ.pop("PARCELS_TPU_DISABLE_PALLAS", None)
        os.environ.pop("PARCELS_TPU_FORCE_PALLAS_INTERPRET", None)
    np.testing.assert_allclose(xf, xg, rtol=1e-5, atol=0.5)
    np.testing.assert_allclose(yf, yg, rtol=1e-5, atol=0.5)


def test_pallas_kernel_agrees_with_xla_contraction():
    """Direct unit pin of _pallas_sample (interpret mode on CPU) against the
    plain-XLA hat contraction on a random fold, including out-of-window
    lanes (position -10 -> zero weight)."""
    from parcels_tpu.ops.interp_kernels import _pallas_sample

    rng = np.random.default_rng(7)
    W, Z, Y, X = 4, 4, 16, 24
    R = W * Z * Y
    Rp = -(-R // 8) * 8
    Xp = -(-X // 128) * 128
    data = rng.normal(size=(R, X)).astype(np.float32)
    f2 = jnp.asarray(np.pad(data, ((0, Rp - R), (0, Xp - X))))
    n = 300
    post = jnp.asarray(rng.uniform(-0.5, W - 0.5, n), jnp.float32)
    posz = jnp.asarray(rng.uniform(0, Z - 1, n), jnp.float32)
    posy = jnp.asarray(rng.uniform(0, Y - 1, n), jnp.float32)
    posx = jnp.asarray(rng.uniform(0, X - 1, n), jnp.float32)
    post = post.at[::17].set(-10.0)  # masked-out lanes must produce 0

    got = np.asarray(_pallas_sample(f2, post, posz, posy, posx, Z, Y))
    want = np.asarray(_xla_small_sample(jnp.asarray(data), post, posz, posy, posx, Z, Y))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)
    assert np.all(got[::17] == 0.0)
