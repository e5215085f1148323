"""Corner-column sampler correctness vs the reference-semantics gather path.

Perf rationale and TPU measurements live in ops/colgather.py and
scripts/micro_colgather.py; these tests pin the numerics on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parcels_tpu.interpolators.xinterp import _axis_levels, _multilinear
from parcels_tpu.ops import colgather


def _rand_gpos(rng, n, shape4, blend):
    T, Z, Y, X = shape4
    gpos = {}
    for key, dim, do_blend in (
        ("T", T, blend[0]),
        ("Z", Z, blend[1]),
        ("Y", Y, blend[2]),
        ("X", X, blend[3]),
    ):
        hi = max(dim - 2, 0) if (do_blend and dim > 1) else max(dim - 1, 0)
        idx = rng.integers(0, hi + 1, n).astype(np.int32)
        bc = (
            rng.uniform(0, 1, n).astype(np.float32)
            if (do_blend and dim > 1)
            else np.zeros(n, np.float32)
        )
        gpos[key] = {"index": jnp.asarray(idx), "bcoord": jnp.asarray(bc)}
    return gpos


def _gather_ref(data, gpos, blend):
    T, Z, Y, X = data.shape
    return _multilinear(
        data,
        _axis_levels(gpos["T"]["index"], gpos["T"]["bcoord"], T, blend[0]),
        _axis_levels(gpos["Z"]["index"], gpos["Z"]["bcoord"], Z, blend[1]),
        _axis_levels(gpos["Y"]["index"], gpos["Y"]["bcoord"], Y, blend[2]),
        _axis_levels(gpos["X"]["index"], gpos["X"]["bcoord"], X, blend[3]),
    )


@pytest.mark.parametrize(
    "shape4",
    [(2, 6, 48, 400), (1, 1, 130, 200), (2, 1, 48, 400), (1, 8, 130, 200)],
)
def test_colgather_matches_gather_full_blend(shape4):
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.normal(size=shape4).astype(np.float32))
    gpos = _rand_gpos(rng, 4096, shape4, (True,) * 4)
    got = colgather.colgather_sample(data, gpos)
    ref = _gather_ref(data, gpos, (True,) * 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize(
    "blend",
    [
        (True, False, False, True),  # C-grid U face sample
        (True, False, True, False),  # C-grid V face sample
        (True, True, False, False),  # C-grid W column sample
        (False, True, True, True),
    ],
)
def test_colgather_matches_gather_pinned_axes(blend):
    shape4 = (2, 6, 48, 400)
    rng = np.random.default_rng(1)
    data = jnp.asarray(rng.normal(size=shape4).astype(np.float32))
    gpos = _rand_gpos(rng, 4096, shape4, blend)
    got = colgather.colgather_sample(data, gpos, blend)
    ref = _gather_ref(data, gpos, blend)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-6, atol=2e-6)


def test_colgather_pinned_corner_count():
    """Pinned axes must drop their +1 corners: a C-grid face sample costs 2
    row gathers, a pure column sample 1 (the whole point on TPU)."""
    shape4 = (2, 6, 48, 400)
    rng = np.random.default_rng(2)
    data = jnp.asarray(rng.normal(size=shape4).astype(np.float32))
    gpos = _rand_gpos(rng, 64, shape4, (True, False, False, True))
    jaxpr = jax.make_jaxpr(
        lambda d, g: colgather.colgather_sample(d, g, (True, False, False, True))
    )(data, gpos)

    def count_gathers(jx):
        total = 0
        for e in jx.eqns:
            if e.primitive.name == "gather":
                total += 1
            for v in e.params.values():  # recurse into jit sub-jaxprs
                if hasattr(v, "jaxpr"):
                    total += count_gathers(v.jaxpr)
        return total

    assert count_gathers(jaxpr.jaxpr) == 2, jaxpr


def test_colgather_usable_gates():
    assert colgather.colgather_usable((2, 50, 1500, 2000))
    assert not colgather.colgather_usable((1, 1, 2, 2))  # tiny field
    assert not colgather.colgather_usable((2, 400, 1500, 2000))  # row too long


def test_engine_end_to_end_colgather_matches_gather(monkeypatch):
    """Trajectories through the public execute() path are identical with the
    corner-column sampler forced on vs the plain gather path."""
    from parcels_tpu import FieldSet, ParticleSet
    from parcels_tpu import xrlite as xr
    from parcels_tpu.datasets.structured import _coords_2d, _wrap_sgrid
    from parcels_tpu.kernels import AdvectionRK4_3D

    tdim, zdim, ydim, xdim = 2, 5, 80, 256
    rng = np.random.default_rng(3)
    lon = np.linspace(0, 1e6, xdim)
    lat = np.linspace(0, 1e6, ydim)
    time = np.array([np.timedelta64(0, "s"), np.timedelta64(2, "D")])
    depth = np.linspace(0, 100.0, zdim)
    shape = (tdim, zdim, ydim, xdim)
    U = rng.uniform(-0.5, 0.5, shape).astype(np.float32)
    V = rng.uniform(-0.5, 0.5, shape).astype(np.float32)
    W = rng.uniform(-1e-4, 1e-4, shape).astype(np.float32)

    def build():
        ds = xr.Dataset(
            {
                "U": (["time", "depth", "YG", "XG"], U),
                "V": (["time", "depth", "YG", "XG"], V),
                "W": (["time", "depth", "YG", "XG"], W),
            },
            coords=_coords_2d(lon, lat, time=time, depth=depth, mesh="flat"),
        )
        return FieldSet.from_sgrid_conventions(_wrap_sgrid(ds, xdim, ydim), mesh="flat")

    n = 256
    x = rng.uniform(2e5, 8e5, n)
    y = rng.uniform(2e5, 8e5, n)
    z = rng.uniform(10.0, 90.0, n)

    def run():
        pset = ParticleSet(build(), x=x.copy(), y=y.copy(), z=z.copy(), t=np.zeros(n))
        pset.execute(
            AdvectionRK4_3D, dt=np.timedelta64(20, "m"), runtime=np.timedelta64(12, "h")
        )
        order = np.argsort(pset.particle_id)
        return pset.x[order], pset.y[order], pset.z[order]

    monkeypatch.setenv("PARCELS_TPU_COLGATHER", "off")
    ref = run()
    monkeypatch.setenv("PARCELS_TPU_COLGATHER", "force")
    got = run()
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g, r, rtol=1e-5, atol=1e-3)
