"""Particle schema + traced-view semantics (reference particle.py /
particlesetview.py test tiers).

Variable/ParticleClass construction rules, default-particle layout, SoA
creation, and the masked write-through semantics user kernels rely on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parcels_tpu import Particle, StatusCode, Variable, get_default_particle
from parcels_tpu._core.particle import create_particle_data
from parcels_tpu._core.particles_view import Particles


# -- Variable / ParticleClass -------------------------------------------------


def test_variable_validation():
    with pytest.raises(ValueError, match="identifier"):
        Variable("not a name")
    with pytest.raises(TypeError, match="dtype"):
        Variable("v", dtype="not_a_dtype")
    with pytest.raises(ValueError, match="to_write"):
        Variable("v", to_write="sometimes")
    with pytest.raises(ValueError, match="[Aa]ttributes"):
        Variable("v", to_write=False, attrs={"units": "m"})


def test_add_variable_returns_new_class():
    base = get_default_particle()
    extra = base.add_variable(Variable("age", dtype=np.float32, initial=0.0))
    assert "age" in extra.var_names()
    assert "age" not in base.var_names()  # original untouched
    with pytest.raises(ValueError, match="already exists"):
        extra.add_variable(Variable("age"))
    with pytest.raises(TypeError):
        base.add_variable("age")


def test_default_particle_layout():
    names = Particle.var_names()
    for required in ("t", "z", "y", "x", "dz", "dy", "dx", "particle_id", "dt", "state"):
        assert required in names
    by_name = {v.name: v for v in Particle.variables}
    assert by_name["t"].dtype == np.float64
    assert by_name["particle_id"].dtype == np.int64
    assert by_name["state"].initial == StatusCode.Evaluate
    assert by_name["dx"].to_write is False


def test_create_particle_data_soa():
    pc = get_default_particle().add_variable(Variable("age", initial=7.0))
    data = create_particle_data(
        pclass=pc, nparticles=5, ngrids=2, initial={"x": np.arange(5.0)}
    )
    assert data["x"].dtype == np.float32
    np.testing.assert_array_equal(data["x"], np.arange(5.0, dtype=np.float32))
    assert data["ei"].shape == (5, 2)
    assert data["age"].tolist() == [7.0] * 5
    # 64-bit declared dtypes are stored 32-bit on device
    assert data["t"].dtype == np.float32
    assert data["particle_id"].dtype == np.int32
    with pytest.raises(ValueError, match="shape"):
        create_particle_data(pclass=pc, nparticles=5, ngrids=1, initial={"x": np.zeros(3)})
    with pytest.raises(ValueError, match="not defined"):
        create_particle_data(pclass=pc, nparticles=2, ngrids=1, initial={"nope": np.zeros(2)})


def test_attrgetter_initial_copies_other_variable():
    # v3 compat: initial=attrgetter("x") seeds one variable from another
    # (reference particle.py:213-214, _compat.py:5-22)
    from operator import attrgetter

    pc = get_default_particle().add_variable(Variable("x0", initial=attrgetter("x")))
    data = create_particle_data(
        pclass=pc, nparticles=4, ngrids=1, initial={"x": np.arange(4.0)}
    )
    np.testing.assert_array_equal(data["x0"], data["x"])


# -- traced view write-through ------------------------------------------------


def _soa(n=6):
    return {
        "x": jnp.arange(n, dtype=jnp.float32),
        "dx": jnp.zeros(n, jnp.float32),
        "state": jnp.full(n, StatusCode.Evaluate, jnp.int32),
        "_active": jnp.ones(n, bool),
        "_rng": jnp.asarray([1, 2], jnp.uint32),
        "ei": jnp.zeros((n, 1), jnp.int32),
    }


def test_masked_write_through():
    """particles.dx += v under a mask only touches masked lanes (reference
    particlesetview.py:14-34 semantics)."""
    data = _soa()
    mask = jnp.asarray([True, False, True, False, True, False])
    p = Particles(data, mask)
    p.dx = p.dx + 10.0
    out = np.asarray(p._data["dx"])
    np.testing.assert_array_equal(out, [10, 0, 10, 0, 10, 0])


def test_masked_read_returns_full_lane_array():
    """Reads under trace return full arrays (mask applies on write), so
    kernels stay shape-static."""
    data = _soa()
    mask = jnp.asarray([True, True, False, False, False, False])
    p = Particles(data, mask)
    assert p.x.shape == (6,)


def test_state_write_respects_mask():
    data = _soa()
    mask = jnp.asarray([False, True, False, True, False, True])
    p = Particles(data, mask)
    p.state = jnp.full(6, StatusCode.Delete, jnp.int32)
    out = np.asarray(p._data["state"])
    expect = np.where(np.asarray(mask), StatusCode.Delete, StatusCode.Evaluate)
    np.testing.assert_array_equal(out, expect)


def test_rng_draws_deterministic_and_mask_stable():
    """random_normal is keyed by the SoA RNG state: same state -> same draws,
    and drawing must not depend on which lanes are masked."""
    d1, d2 = _soa(), _soa()
    p1 = Particles(d1, jnp.ones(6, bool))
    p2 = Particles(d2, jnp.asarray([True, False] * 3))
    r1 = np.asarray(p1.random_normal())
    r2 = np.asarray(p2.random_normal())
    np.testing.assert_array_equal(r1, r2)
    # state advanced identically
    np.testing.assert_array_equal(np.asarray(p1._data["_rng"]), np.asarray(p2._data["_rng"]))


def test_view_works_under_jit():
    @jax.jit
    def step(data):
        p = Particles(data, data["_active"])
        p.dx = p.dx + p.x
        return p._data

    out = step(_soa())
    np.testing.assert_array_equal(np.asarray(out["dx"]), np.arange(6, dtype=np.float32))
