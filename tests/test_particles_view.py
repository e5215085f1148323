"""Direct unit tests of the traced Particles view (reference
tests/test_particlesetview.py, 169 LoC: write-through masking semantics).

The reference's ParticleSetView writes through a boolean mask into the parent
SoA; the TPU equivalent merges masked updates into the full arrays under
trace. These tests pin those semantics outside the engine."""

import jax
import jax.numpy as jnp
import numpy as np

from parcels_tpu._core.particles_view import Particles


def _make(n=6, mask=None):
    data = {
        "x": jnp.arange(n, dtype=jnp.float32),
        "dx": jnp.zeros(n, jnp.float32),
        "state": jnp.full(n, 10, jnp.int32),
        "_rng": jnp.asarray(np.array([1, 2], np.uint32)),
    }
    m = jnp.ones(n, bool) if mask is None else jnp.asarray(mask)
    return Particles(data, m)


def test_masked_write_through():
    mask = np.array([True, False, True, False, True, False])
    p = _make(mask=mask)
    p.dx = p.dx + 5.0
    out = np.asarray(p._data["dx"])
    np.testing.assert_array_equal(out, np.where(mask, 5.0, 0.0))


def test_unmasked_lanes_keep_values_on_assignment():
    mask = np.array([False, True, False, True, False, True])
    p = _make(mask=mask)
    p.x = jnp.full(6, -1.0)
    out = np.asarray(p._data["x"])
    np.testing.assert_array_equal(out, np.where(mask, -1.0, np.arange(6)))


def test_augmented_assignment_accumulates():
    p = _make()
    p.dx += 2.0
    p.dx += 3.0
    np.testing.assert_array_equal(np.asarray(p._data["dx"]), np.full(6, 5.0))


def test_reads_reflect_previous_writes():
    mask = np.array([True, True, False, False, True, True])
    p = _make(mask=mask)
    p.dx = p.dx + 1.0
    got = np.asarray(p.dx)
    # reads come back full-length; masked lanes carry the update
    np.testing.assert_array_equal(got, np.asarray(p._data["dx"]))


def test_state_write_masked():
    mask = np.array([True, False, True, False, True, False])
    p = _make(mask=mask)
    p.state = jnp.where(p.x > 1.5, 30, p.state)
    out = np.asarray(p._data["state"])
    exp = np.array([10, 10, 30, 10, 30, 10])  # only masked lanes change
    np.testing.assert_array_equal(out, exp)


def test_len_and_repr():
    p = _make()
    assert len(p) == 6
    assert "Particles" in repr(p)


def test_random_normal_deterministic_and_masked():
    p1 = _make()
    p2 = _make()
    a = np.asarray(p1.random_normal())
    b = np.asarray(p2.random_normal())
    np.testing.assert_array_equal(a, b)  # same key -> same draw
    c = np.asarray(p1.random_normal())
    assert not np.array_equal(a, c)  # key advances per draw
    assert abs(float(np.mean(a))) < 2.0


def test_works_under_jit():
    def step(data, mask):
        p = Particles(data, mask)
        p.dx += 1.5
        p.x = p.x + p.dx
        return p._data

    data = {
        "x": jnp.zeros(4, jnp.float32),
        "dx": jnp.zeros(4, jnp.float32),
        "_rng": jnp.asarray(np.array([1, 2], np.uint32)),
    }
    mask = jnp.asarray([True, True, False, True])
    out = jax.jit(step)(data, mask)
    np.testing.assert_array_equal(np.asarray(out["x"]), [1.5, 1.5, 0.0, 1.5])
