"""Kernel-chain execution semantics (reference tests/test_kernel.py).

The commutativity design (reference docs explanation_kernelloop.md): kernels
accumulate displacements into dx/dy/dz, applied once after the whole chain,
so kernel order does not change trajectories; direct position writes take
effect immediately and are order-sensitive. Plus: tiny dt exactness, context
constants, unknown-variable errors, kernel lists."""

import jax.numpy as jnp
import numpy as np
import pytest

from parcels_tpu import FieldSet, Particle, ParticleSet, Variable
from parcels_tpu.datasets import simple_UV_dataset


def _fieldset_gradient():
    """U varies linearly in x so sampling position differences are visible."""
    ds = simple_UV_dataset(dims=(2, 1, 4, 40), mesh="flat")
    X = np.linspace(-1e6, 1e6, 40, dtype=np.float32)
    ds["U"].values[:] = np.broadcast_to(X / 1e6, ds["U"].values.shape)
    return FieldSet.from_sgrid_conventions(ds, mesh="flat")


@pytest.mark.parametrize("kernel_type", ["update_dlon", "update_lon"])
def test_execution_order(kernel_type):
    """dx-accumulating kernels are order-independent; direct x writes are
    visible to later kernels in the same chain (reference test_kernel.py:168)."""
    fs = _fieldset_gradient()
    pclass = Particle.add_variable(Variable("p", dtype=np.float32, initial=0.0))
    shift = 2e5

    def MoveDX(particles, fieldset):  # noqa: N802
        particles.dx += shift

    def MoveX(particles, fieldset):  # noqa: N802
        particles.x = particles.x + shift

    def SampleP(particles, fieldset):  # noqa: N802
        u, _ = fieldset.UV[particles]
        particles.p = u

    move = MoveDX if kernel_type == "update_dlon" else MoveX
    xs, ps = [], []
    for order in (1, -1):
        pset = ParticleSet(fs, pclass=pclass, x=[0.0], y=[0.0], t=[0.0])
        pset.execute([move, SampleP][::order], dt=np.timedelta64(1, "s"),
                     runtime=np.timedelta64(1, "s"))
        xs.append(float(pset.x[0]))
        ps.append(float(pset.p[0]))

    np.testing.assert_allclose(xs, shift, rtol=1e-6)  # both orders move once
    if kernel_type == "update_dlon":
        # deferred displacement: sample sees the pre-move position either way
        np.testing.assert_allclose(ps[0], ps[1], atol=1e-7)
    else:
        # direct write: [move, sample] samples at x=shift, [sample, move] at 0
        assert abs(ps[0] - ps[1]) > 1e-3, ps
        np.testing.assert_allclose(ps[0] - ps[1], shift / 1e6, rtol=1e-4)


@pytest.mark.parametrize("dt", [1e-2, 1e-5, 1e-6])
def test_small_dt_exact_landing(dt):
    """Tiny uniform dt lands exactly on runtime (Kahan clock; reference
    test_small_dt includes 1e-9 which is below f32+compensation resolution
    against a 100x runtime — the compensated pair holds to 1e-6)."""
    fs = _fieldset_gradient()

    def DoNothing(particles, fieldset):  # noqa: N802
        pass

    pset = ParticleSet(fs, x=[0.0], y=[0.0], t=[0.0])
    pset.execute(DoNothing, dt=dt, runtime=dt * 100)
    np.testing.assert_allclose(pset.t, dt * 100, rtol=1e-6)


def test_context_constants_in_kernel():
    fs = _fieldset_gradient()
    fs.add_context("coeff", 3.0)
    pclass = Particle.add_variable(Variable("s", dtype=np.float32, initial=0.0))

    def UseCtx(particles, fieldset):  # noqa: N802
        particles.s += fieldset.coeff

    pset = ParticleSet(fs, pclass=pclass, x=[0.0], y=[0.0], t=[0.0])
    pset.execute(UseCtx, dt=np.timedelta64(1, "s"), runtime=np.timedelta64(3, "s"))
    np.testing.assert_allclose(pset.s, 9.0)


def test_unknown_particle_variable_errors():
    """Reading an undeclared particle variable raises (reference
    test_unknown_var_in_kernel)."""
    fs = _fieldset_gradient()

    def Bad(particles, fieldset):  # noqa: N802
        particles.nope += 1.0

    pset = ParticleSet(fs, x=[0.0], y=[0.0], t=[0.0])
    with pytest.raises((AttributeError, KeyError)):
        pset.execute(Bad, dt=np.timedelta64(1, "s"), runtime=np.timedelta64(1, "s"))


def test_kernel_list_with_noncallable_errors():
    fs = _fieldset_gradient()
    pset = ParticleSet(fs, x=[0.0], y=[0.0], t=[0.0])
    with pytest.raises((TypeError, ValueError)):
        pset.execute(["not a kernel"], dt=np.timedelta64(1, "s"),
                     runtime=np.timedelta64(1, "s"))


def test_rk45_multichunk_no_dt_freeze():
    """RK45 across many internal engine chunks (regression, round 4).

    A lane landing on a chunk endtime had its dt clamped toward 0; the
    zero survived into the next chunk, where either the stuck-guard froze
    the lane permanently (t+dt == t in f32) or zero-length steps dropped
    displacement while t advanced. The fix restores dt from next_dt
    (floored at RK45_min_dt) at every chunk start, as the reference does
    per-iteration (reference kernel.py:119-120)."""
    import os

    from parcels_tpu.kernels import AdvectionRK45

    ds = simple_UV_dataset(dims=(2, 2, 32, 32), mesh="flat")
    ds["U"].values[:] = 2.0
    ds["V"].values[:] = 10.0
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    fs.add_context("RK45_tol", 1e-4)
    fs.add_context("RK45_min_dt", 10)
    fs.add_context("RK45_max_dt", 3600)
    pclass = Particle.add_variable(
        Variable("next_dt", dtype=np.float64, initial=600.0, to_write=False)
    )
    rng = np.random.default_rng(21)
    n = 16
    x = rng.uniform(-9e5, 6e5, n)
    y = rng.uniform(-9e5, -5e5, n)
    pset = ParticleSet(fs, pclass=pclass, x=x.copy(), y=y.copy(), t=np.zeros(n))
    assert int(os.environ.get("PARCELS_TPU_MAX_CHUNK_STEPS", 64)) * 600 < 86400, (
        "the run must span multiple internal chunks to regression-test this"
    )
    pset.execute(
        AdvectionRK45, dt=np.timedelta64(600, "s"), runtime=np.timedelta64(86400, "s")
    )
    np.testing.assert_allclose(pset.t, 86400.0)
    np.testing.assert_allclose(pset.y, y + 10.0 * 86400, rtol=1e-5, atol=1.0)
    np.testing.assert_allclose(pset.x, x + 2.0 * 86400, rtol=1e-5, atol=1.0)


def test_three_kernel_chain_accumulates():
    fs = _fieldset_gradient()

    def A(particles, fieldset):  # noqa: N802
        particles.dx += 100.0

    def B(particles, fieldset):  # noqa: N802
        particles.dy += 50.0

    def C(particles, fieldset):  # noqa: N802
        particles.dx += jnp.where(particles.dy > 0, 0.0, 0.0)  # no-op read

    pset = ParticleSet(fs, x=[0.0], y=[0.0], t=[0.0])
    pset.execute([A, B, C], dt=np.timedelta64(1, "s"), runtime=np.timedelta64(4, "s"))
    np.testing.assert_allclose(pset.x, 400.0, rtol=1e-6)
    np.testing.assert_allclose(pset.y, 200.0, rtol=1e-6)
