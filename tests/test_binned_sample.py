"""Binned slab sampler (ops/binned_sample.py) + engine sorted-chunk mode.

Runs on the CPU test mesh: the Pallas kernel executes in interpret mode,
activated via PARCELS_TPU_BINNED=force / PARCELS_TPU_SORT_MODE=force.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from parcels_tpu.ops import binned_sample as bs


def _ref_multilinear(data, pos):
    """NumPy reference: per-axis linear blend with clipped upper index."""
    T, Z, Y, X = data.shape
    out = np.zeros(pos["T"][0].shape, np.float64)
    flat = np.asarray(data, np.float64).reshape(-1)

    def levels(idx, bc, dim):
        if dim == 1:
            return [(np.zeros_like(idx), 1.0)]
        i0 = np.clip(idx, 0, dim - 1)
        i1 = np.clip(idx + 1, 0, dim - 1)
        return [(i0, 1.0 - bc), (i1, bc)]

    for ti, wt in levels(*pos["T"], T):
        for zi, wz in levels(*pos["Z"], Z):
            for yi, wy in levels(*pos["Y"], Y):
                for xi, wx in levels(*pos["X"], X):
                    lin = ((ti * Z + zi) * Y + yi) * X + xi
                    out = out + wt * wz * wy * wx * flat[lin]
    return out


def _make_gpos(pos, sorted_flag=True):
    gpos = {
        ax: {"index": jnp.asarray(idx, jnp.int32), "bcoord": jnp.asarray(bc, jnp.float32)}
        for ax, (idx, bc) in pos.items()
    }
    gpos["_sorted"] = sorted_flag
    return gpos


def _random_positions(rng, n, shape4, spread=None):
    """Positions grouped by spatial tile (mimics the engine-sorted SoA)."""
    T, Z, Y, X = shape4
    pos = {}
    for ax, dim in zip("TZYX", shape4):
        hi = max(dim - 1, 1)
        idx = rng.integers(0, hi, n)
        bc = rng.uniform(0, 1, n).astype(np.float32)
        if dim == 1:
            idx = np.zeros(n, np.int64)
            bc = np.zeros(n, np.float32)
        pos[ax] = (idx, bc)
    return pos


def _sort_positions(pos, shape4, n=None):
    """Engine-equivalent (bin, z-cell) ordering via the public sort key."""
    n = n if n is not None else len(pos["X"][0])
    gpos = {
        ax: {"index": jnp.asarray(idx, jnp.int32)} for ax, (idx, bc) in pos.items()
    }
    key = np.asarray(bs.sort_key_for(None, gpos, shape4, n))
    order = np.argsort(key, kind="stable")
    return {ax: (idx[order], bc[order]) for ax, (idx, bc) in pos.items()}


@pytest.fixture(autouse=True)
def _force_binned(monkeypatch):
    monkeypatch.setenv("PARCELS_TPU_BINNED", "force")


@pytest.mark.parametrize(
    "shape4",
    [
        (2, 4, 16, 256),  # single slab covers the whole field
        (3, 1, 32, 384),  # 2-D surface field, multiple tiles
        (2, 8, 40, 512),  # 3-D, multiple z buckets
        (1, 1, 16, 256),  # steady 2-D
    ],
)
def test_binned_matches_reference_sorted(shape4):
    rng = np.random.default_rng(3)
    data = rng.uniform(-1, 1, shape4).astype(np.float32)
    n = 3000
    pos = _sort_positions(_random_positions(rng, n, shape4), shape4)
    vals = np.asarray(bs.binned_linear_sample(jnp.asarray(data), _make_gpos(pos)))
    expect = _ref_multilinear(data, pos)
    np.testing.assert_allclose(vals, expect, rtol=2e-4, atol=2e-5)


def test_binned_lockstep_time_preblend():
    """Uniform (ti, tau) takes the pre-blended single-plane path; still exact."""
    shape4 = (4, 2, 32, 384)
    rng = np.random.default_rng(9)
    data = rng.uniform(-1, 1, shape4).astype(np.float32)
    n = 3000
    pos = _sort_positions(_random_positions(rng, n, shape4), shape4)
    pos["T"] = (np.full(n, 1), np.full(n, 0.375, np.float32))  # lockstep batch
    vals = np.asarray(bs.binned_linear_sample(jnp.asarray(data), _make_gpos(pos)))
    expect = _ref_multilinear(data, pos)
    np.testing.assert_allclose(vals, expect, rtol=2e-4, atol=2e-5)


def test_binned_unsorted_falls_back_correctly():
    """Unsorted lanes overflow massively -> full-gather cond; still exact."""
    shape4 = (2, 6, 48, 640)
    rng = np.random.default_rng(5)
    data = rng.uniform(-1, 1, shape4).astype(np.float32)
    n = 4096
    pos = _random_positions(rng, n, shape4)  # NOT sorted
    vals = np.asarray(bs.binned_linear_sample(jnp.asarray(data), _make_gpos(pos)))
    expect = _ref_multilinear(data, pos)
    np.testing.assert_allclose(vals, expect, rtol=2e-4, atol=2e-5)


def test_binned_partial_overflow_fixup():
    """A few out-of-slab lanes inside otherwise-sorted chunks hit the K-capacity fix-up."""
    shape4 = (2, 1, 64, 1024)
    rng = np.random.default_rng(7)
    data = rng.uniform(-1, 1, shape4).astype(np.float32)
    n = 6000
    pos = _sort_positions(_random_positions(rng, n, shape4), shape4)
    # scatter 50 lanes to random far-away cells (stale/just-migrated particles)
    lanes = rng.choice(n, 50, replace=False)
    pos["Y"][0][lanes] = rng.integers(0, 63, 50)
    pos["X"][0][lanes] = rng.integers(0, 1023, 50)
    vals = np.asarray(bs.binned_linear_sample(jnp.asarray(data), _make_gpos(pos)))
    expect = _ref_multilinear(data, pos)
    np.testing.assert_allclose(vals, expect, rtol=2e-4, atol=2e-5)


def test_sorted_lanes_have_low_overflow():
    """(bin, z)-sorted lanes must ride the kernel, not the gather fix-up:
    overflow is only bin/z transition tails inside 128-lane sub-blocks."""
    shape4 = (2, 16, 64, 512)
    rng = np.random.default_rng(11)
    n = 64 * bs.CHUNK  # dense enough that bins hold multiple chunks
    pos = _sort_positions(_random_positions(rng, n, shape4), shape4)
    gpos = _make_gpos(pos)
    plan = bs._build_plan(shape4, gpos)
    frac = float(np.asarray(plan["overflow"]).mean())
    assert frac < 0.05, f"overflow fraction {frac:.3f} — fast path not engaged"


def test_sort_key_groups_bins():
    from parcels_tpu._core.grid import GridSpec

    spec = GridSpec(
        axes=("Z", "Y", "X"),
        curvilinear=False,
        spherical=False,
        deg2m=1.0,
        xdim=512,
        ydim=64,
        zdim=10,
        lon_uniform=None,
        lat_uniform=None,
        depth_uniform=None,
        time_uniform=None,
    )
    shape4 = (2, 10, 64, 512)
    n = 100_000
    _, _, _, _, bz, by, bx = bs.slab_geometry(shape4, n)
    gpos = {
        "Z": {"index": jnp.asarray([0, 0, bz * 3])},
        "Y": {"index": jnp.asarray([0, by - 1, by])},
        "X": {"index": jnp.asarray([0, bx - 1, bx])},
    }
    key = np.asarray(bs.sort_key_for(spec, gpos, shape4, n))
    assert key[0] == key[1]  # same (z, y, x) bin
    assert key[2] != key[0]


def test_slab_geometry_properties():
    """Stencil containment: slab covers its bin + 1 cell + alignment slack."""
    for shape4, n in [((2, 50, 500, 500), 2_000_000), ((3, 1, 3000, 4000), 10_000_000),
                      ((1, 1, 16, 256), 1000)]:
        WT, SZ, SY, SX, bz, by, bx = bs.slab_geometry(shape4, n)
        T, Z, Y, X = shape4
        assert WT == (1 if T == 1 else 2)
        # containment: either the slab covers the whole (padded) axis (origin
        # pinned at 0, single bin) or bin + stencil + alignment slack fits
        Yp, Xp = -(-Y // 8) * 8, -(-X // 128) * 128
        assert (SY >= Yp and by == Y) or by + 9 <= SY  # 7 align slack + bin + stencil
        assert (SX >= Xp and bx == X) or bx + 129 <= SX
        if Z > 1:
            assert (SZ >= Z and bz == Z) or bz + 1 <= SZ
        assert SY % 8 == 0 and SX % 128 == 0


# ---------------------------------------------------------------------------
# engine sorted-chunk mode
# ---------------------------------------------------------------------------


def _large_uniform_fieldset(u=0.3, v=0.2, shape=(3, 1, 64, 2048)):
    from parcels_tpu import FieldSet
    from parcels_tpu.datasets import simple_UV_dataset

    ds = simple_UV_dataset(dims=shape, mesh="flat")
    ds["U"].values[:] = u
    ds["V"].values[:] = v
    return FieldSet.from_sgrid_conventions(ds, mesh="flat")


def test_soa_permute_roundtrip():
    import jax

    from parcels_tpu._core.engine import _permute_soa

    n = 37
    rng = np.random.default_rng(0)
    pd = {
        "x": jnp.asarray(rng.uniform(size=n), jnp.float32),
        "state": jnp.asarray(rng.integers(0, 5, n), jnp.int32),
        "_active": jnp.asarray(rng.integers(0, 2, n).astype(bool)),
        "ei": jnp.asarray(rng.integers(0, 9, (n, 2)), jnp.int32),
        "_rng": jnp.asarray([1, 2], jnp.uint32),
    }
    order = jnp.asarray(rng.permutation(n), jnp.int32)
    out = jax.jit(_permute_soa)(pd, order)
    onp = np.asarray(order)
    np.testing.assert_array_equal(np.asarray(out["x"]), np.asarray(pd["x"])[onp])
    np.testing.assert_array_equal(np.asarray(out["state"]), np.asarray(pd["state"])[onp])
    np.testing.assert_array_equal(np.asarray(out["_active"]), np.asarray(pd["_active"])[onp])
    np.testing.assert_array_equal(np.asarray(out["ei"]), np.asarray(pd["ei"])[onp])
    np.testing.assert_array_equal(np.asarray(out["_rng"]), np.asarray(pd["_rng"]))


def test_engine_sorted_mode_matches_unsorted(monkeypatch):
    """Full ParticleSet.execute with sort+binned forced == plain run."""
    from parcels_tpu import ParticleSet
    from parcels_tpu.kernels import AdvectionRK4

    rng = np.random.default_rng(11)
    n = 700
    x = rng.uniform(1000, 24000, n)
    y = rng.uniform(1000, 24000, n)

    def run():
        fs = _large_uniform_fieldset()
        pset = ParticleSet(fs, x=x.copy(), y=y.copy(), t=np.zeros(n))
        pset.execute(
            AdvectionRK4,
            dt=np.timedelta64(600, "s"),
            runtime=np.timedelta64(3600, "s"),
        )
        return np.asarray(pset.x), np.asarray(pset.y), np.asarray(pset.particle_id)

    monkeypatch.setenv("PARCELS_TPU_SORT_MODE", "off")
    monkeypatch.setenv("PARCELS_TPU_BINNED", "off")
    x0, y0, id0 = run()

    monkeypatch.setenv("PARCELS_TPU_SORT_MODE", "force")
    monkeypatch.setenv("PARCELS_TPU_BINNED", "force")
    x1, y1, id1 = run()

    # unsort restores lane order exactly
    np.testing.assert_array_equal(id0, id1)
    np.testing.assert_allclose(x1, x0, rtol=2e-5, atol=1e-2)
    np.testing.assert_allclose(y1, y0, rtol=2e-5, atol=1e-2)


def test_engine_sort_picks_large_field_only():
    from parcels_tpu._core.engine import _pick_sort_field
    from parcels_tpu.datasets import simple_UV_dataset
    from parcels_tpu import FieldSet

    # small field: VMEM fast path, no sorting
    ds = simple_UV_dataset(dims=(2, 2, 20, 20), mesh="flat")
    fs_small = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    assert _pick_sort_field(fs_small) is None

    fs_large = _large_uniform_fieldset()
    assert _pick_sort_field(fs_large) == "U"


def test_engine_sorted_mode_curvilinear(monkeypatch):
    """ei-derived sort keys enable binned+sorted mode on curvilinear grids;
    trajectories must match the unsorted gather run (uniform eastward flow
    on a rotated grid has a closed form, so both must be right AND equal)."""
    from parcels_tpu import FieldSet, ParticleSet
    from parcels_tpu.datasets import curvilinear_rotated_dataset
    from parcels_tpu.kernels import AdvectionRK4

    rng = np.random.default_rng(5)
    n = 400
    # interior seeding in rotated-grid coordinates
    th = np.deg2rad(30.0)
    sx = rng.uniform(5e3, 1.9e6, n)
    sy = rng.uniform(5e3, 5.5e4, n)
    x = np.cos(th) * sx - np.sin(th) * sy
    y = np.sin(th) * sx + np.cos(th) * sy

    def run():
        ds = curvilinear_rotated_dataset(xdim=2048, ydim=64)
        fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
        pset = ParticleSet(fs, x=x.copy(), y=y.copy(), t=np.zeros(n))
        pset.execute(
            AdvectionRK4,
            dt=np.timedelta64(600, "s"),
            runtime=np.timedelta64(3600, "s"),
        )
        return np.asarray(pset.x), np.asarray(pset.y)

    monkeypatch.setenv("PARCELS_TPU_SORT_MODE", "off")
    monkeypatch.setenv("PARCELS_TPU_BINNED", "off")
    x0, y0 = run()
    # closed form: U is the *zonal* (global-x) velocity, independent of the
    # grid's rotation — uniform U=1 m/s moves particles due east
    np.testing.assert_allclose(x0, x + 3600.0, rtol=1e-5, atol=1e-2)
    np.testing.assert_allclose(y0, y, rtol=1e-5, atol=1e-2)

    monkeypatch.setenv("PARCELS_TPU_SORT_MODE", "force")
    monkeypatch.setenv("PARCELS_TPU_BINNED", "force")
    x1, y1 = run()
    np.testing.assert_allclose(x1, x0, rtol=2e-5, atol=1e-2)
    np.testing.assert_allclose(y1, y0, rtol=2e-5, atol=1e-2)


def test_z_occupancy_hint_changes_plan():
    """Concentrated-z seeding makes sparse cases feasible (surface release
    on a deep grid must not land in the overflow-heavy fallback plan)."""
    import parcels_tpu.ops.binned_sample as bs

    shape, n = (2, 50, 1000, 1000), 2_000_000
    try:
        assert bs.set_z_occupancy_hint(1.0) == 1.0
        uniform = bs.slab_geometry(shape, n)
        assert bs.set_z_occupancy_hint(1.0 / 49) == 0.05  # quantized upward (conservative)
        surface = bs.slab_geometry(shape, n)
        assert surface != uniform
        # the surface plan concentrates: smaller z slab, feasible bins
        assert surface[1] <= uniform[1]
    finally:
        bs.set_z_occupancy_hint(1.0)


def test_occupancy_hint_set_by_particleset(monkeypatch):
    import parcels_tpu.ops.binned_sample as bs
    from parcels_tpu import FieldSet, ParticleSet
    from parcels_tpu.datasets import simple_UV_dataset
    from parcels_tpu.kernels import AdvectionEE

    ds = simple_UV_dataset(dims=(2, 24, 16, 16), maxdepth=100.0, mesh="flat")
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    seen = {}
    orig = bs.set_z_occupancy_hint

    def spy(frac):
        seen["frac"] = frac
        return orig(frac)

    monkeypatch.setattr(bs, "set_z_occupancy_hint", spy)
    # surface-only release on a 23-cell z axis -> 1/23 occupancy
    pset = ParticleSet(fs, x=[1e5] * 4, y=[1e5] * 4, z=[0.5] * 4, t=[0.0] * 4)
    pset.execute(AdvectionEE, dt=np.timedelta64(1, "h"), runtime=np.timedelta64(1, "h"))
    assert 0 < seen["frac"] <= 1.0 / 20
