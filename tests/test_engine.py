"""Execution-engine behavioral tests.

Mirrors the reference's engine tier (reference tests/test_particleset_execute.py,
tests/test_kernel.py): argument validation, release-time independence,
state-machine recovery flows, RK45 Repeat machinery, back-to-back executes,
backward-in-time integration, checkpoint round-trip.
"""

import numpy as np
import pytest

from parcels_tpu import (
    FieldSet,
    ParticleSet,
    StatusCode,
    Variable,
)
from parcels_tpu.datasets import moving_eddy_dataset, simple_UV_dataset
from parcels_tpu.kernels import AdvectionEE, AdvectionRK4, AdvectionRK45
from tests.conftest import uniform_flow_fieldset


def _eddy_fs():
    return FieldSet.from_sgrid_conventions(moving_eddy_dataset(), mesh="flat")


def test_dt_zero_raises():
    pset = ParticleSet(_eddy_fs(), x=[12000.0], y=[12000.0])
    with pytest.raises(ValueError, match="dt"):
        pset.execute(AdvectionEE, dt=np.timedelta64(0, "s"), runtime=np.timedelta64(1, "h"))


def test_runtime_and_endtime_mutually_exclusive():
    fs = _eddy_fs()
    pset = ParticleSet(fs, x=[12000.0], y=[12000.0])
    with pytest.raises(ValueError, match="mutually exclusive"):
        pset.execute(
            AdvectionEE,
            dt=np.timedelta64(5, "m"),
            runtime=np.timedelta64(1, "h"),
            endtime=np.datetime64("2000-01-01T06:00"),
        )


def test_kernels_must_be_callable():
    pset = ParticleSet(_eddy_fs(), x=[12000.0], y=[12000.0])
    with pytest.raises((TypeError, ValueError)):
        pset.execute(["not-a-kernel"], dt=np.timedelta64(5, "m"), runtime=np.timedelta64(1, "h"))
    with pytest.raises(ValueError):
        pset.execute([], dt=np.timedelta64(5, "m"), runtime=np.timedelta64(1, "h"))


def test_rk45_requires_next_dt_variable():
    pset = ParticleSet(_eddy_fs(), x=[12000.0], y=[12000.0])
    with pytest.raises(ValueError, match="next_dt"):
        pset.execute(AdvectionRK45, dt=np.timedelta64(5, "m"), runtime=np.timedelta64(1, "h"))


def test_release_time_independence():
    """A particle's trajectory must not depend on batch-mates' release times
    (reference tests/test_particleset_execute.py:67-95)."""
    fs1 = _eddy_fs()
    solo = ParticleSet(fs1, x=[12000.0], y=[12500.0], t=[0.0])
    solo.execute(AdvectionRK4, dt=np.timedelta64(5, "m"), runtime=np.timedelta64(2, "h"))

    fs2 = _eddy_fs()
    batch = ParticleSet(
        fs2, x=[12000.0, 13000.0], y=[12500.0, 14000.0], t=[0.0, 3600.0]
    )
    batch.execute(AdvectionRK4, dt=np.timedelta64(5, "m"), runtime=np.timedelta64(2, "h"))
    np.testing.assert_allclose(batch.x[0], solo.x[0], rtol=1e-6)
    np.testing.assert_allclose(batch.y[0], solo.y[0], rtol=1e-6)


def test_back_to_back_executes_continue():
    fs1 = _eddy_fs()
    once = ParticleSet(fs1, x=[12000.0], y=[12500.0], t=[0.0])
    once.execute(AdvectionRK4, dt=np.timedelta64(5, "m"), runtime=np.timedelta64(2, "h"))

    fs2 = _eddy_fs()
    twice = ParticleSet(fs2, x=[12000.0], y=[12500.0], t=[0.0])
    twice.execute(AdvectionRK4, dt=np.timedelta64(5, "m"), runtime=np.timedelta64(1, "h"))
    twice.execute(AdvectionRK4, dt=np.timedelta64(5, "m"), runtime=np.timedelta64(1, "h"))
    assert twice.t[0] == 7200.0
    np.testing.assert_allclose(twice.x, once.x, rtol=1e-6)


def test_backward_in_time_recovers_start():
    fs = uniform_flow_fieldset(u=1.0, v=0.5)
    x0, y0 = 1e5, 1e5
    pset = ParticleSet(fs, x=[x0], y=[y0], t=[np.timedelta64(2, "h")])
    pset.execute(AdvectionRK4, dt=np.timedelta64(-5, "m"), runtime=np.timedelta64(2, "h"))
    assert pset.t[0] == 0.0
    np.testing.assert_allclose(pset.x, x0 - 7200.0, rtol=1e-5)
    np.testing.assert_allclose(pset.y, y0 - 3600.0, rtol=1e-5)


def test_stop_all_execution():
    fs = uniform_flow_fieldset(u=1.0, v=0.0)

    def StopAfterAnHour(particles, fieldset):  # noqa: N802
        import jax.numpy as jnp

        particles.state = jnp.where(
            particles.t >= 3600.0, StatusCode.StopAllExecution, particles.state
        ).astype(particles.state.dtype)

    pset = ParticleSet(fs, x=[1e5], y=[1e5], t=[0.0])
    pset.execute(
        [AdvectionEE, StopAfterAnHour],
        dt=np.timedelta64(30, "m"),
        runtime=np.timedelta64(6, "h"),
    )
    # stopped well before the 6h endtime
    assert pset.t[0] <= 2 * 3600.0


def test_delete_recovery_kernel():
    """OOB particles deleted by a recovery kernel instead of raising
    (reference tests/test_advection.py:148-190)."""
    fs = uniform_flow_fieldset(u=50.0, v=0.0)

    def DeleteOnOOB(particles, fieldset):  # noqa: N802
        import jax.numpy as jnp

        particles.state = jnp.where(
            particles.state == StatusCode.ErrorOutOfBounds,
            StatusCode.Delete,
            particles.state,
        ).astype(particles.state.dtype)

    pset = ParticleSet(fs, x=[9.9e5, 0.0], y=[0.0, 0.0], t=[0.0, 0.0])
    pset.execute(
        [AdvectionEE, DeleteOnOOB],
        dt=np.timedelta64(30, "m"),
        runtime=np.timedelta64(2, "h"),  # 50 m/s x 2h = 360 km: only the east-edge particle exits
    )
    assert len(pset) == 1  # the east-edge particle got deleted, run continued
    assert pset.particle_id[0] == 1


def test_rk45_adaptive_runs_and_respects_bounds():
    from parcels_tpu import Particle

    fs = _eddy_fs()
    fs.add_context("RK45_tol", 100.0)
    fs.add_context("RK45_min_dt", 10.0)
    fs.add_context("RK45_max_dt", 3600.0)
    pclass = Particle.add_variable(Variable("next_dt", dtype=np.float64, initial=300.0))
    pset = ParticleSet(fs, pclass=pclass, x=[12000.0], y=[12500.0], t=[0.0])
    pset.execute(AdvectionRK45, dt=np.timedelta64(5, "m"), runtime=np.timedelta64(2, "h"))
    assert pset.t[0] == 7200.0
    assert 10.0 <= abs(pset.next_dt[0]) <= 3600.0


def test_checkpoint_roundtrip(tmp_path):
    fs1 = _eddy_fs()
    pset = ParticleSet(fs1, x=[12000.0, 15000.0], y=[12500.0, 9000.0], t=[0.0, 0.0])
    pset.execute(AdvectionRK4, dt=np.timedelta64(5, "m"), runtime=np.timedelta64(1, "h"))
    path = str(tmp_path / "ckpt.npz")
    pset.checkpoint(path)

    fs2 = _eddy_fs()
    restored = ParticleSet.from_checkpoint(fs2, path)
    np.testing.assert_array_equal(restored.x, pset.x)
    np.testing.assert_array_equal(restored.particle_id, pset.particle_id)
    restored.execute(AdvectionRK4, dt=np.timedelta64(5, "m"), runtime=np.timedelta64(1, "h"))

    fs3 = _eddy_fs()
    straight = ParticleSet(fs3, x=[12000.0, 15000.0], y=[12500.0, 9000.0], t=[0.0, 0.0])
    straight.execute(AdvectionRK4, dt=np.timedelta64(5, "m"), runtime=np.timedelta64(2, "h"))
    np.testing.assert_allclose(restored.x, straight.x, rtol=1e-6)


def test_restart_from_particlefile(tmp_path):
    from parcels_tpu import Particle, ParticleFile

    fs1 = _eddy_fs()
    pset = ParticleSet(fs1, x=[12000.0, 15000.0], y=[12500.0, 9000.0], t=[0.0, 0.0])
    path = str(tmp_path / "traj.parquet")
    pf = ParticleFile(path, outputdt=np.timedelta64(30, "m"), mode="w")
    pset.execute(
        AdvectionRK4, dt=np.timedelta64(5, "m"), runtime=np.timedelta64(1, "h"), output_file=pf
    )
    pf.close()

    fs2 = _eddy_fs()
    restarted = ParticleSet.from_particlefile(fs2, Particle, path, restart=True)
    np.testing.assert_array_equal(np.sort(restarted.particle_id), [0, 1])
    np.testing.assert_allclose(np.sort(restarted.x), np.sort(pset.x), rtol=1e-6)


def test_remove_indices_and_len():
    fs = _eddy_fs()
    pset = ParticleSet(fs, x=[12000.0, 13000.0, 14000.0], y=[12000.0] * 3)
    assert len(pset) == 3
    pset.remove_indices([1])
    assert len(pset) == 2
    np.testing.assert_array_equal(pset.particle_id, [0, 2])


def test_kernel_signature_validated():
    pset = ParticleSet(_eddy_fs(), x=[12000.0], y=[12000.0])

    def bad_kernel(particles):
        pass

    with pytest.raises(ValueError, match="signature"):
        pset.execute([bad_kernel], dt=np.timedelta64(5, "m"), runtime=np.timedelta64(1, "h"))


def test_fieldset_eval_host_convenience():
    fs = uniform_flow_fieldset(u=1.0, v=0.5)
    u, v = fs.eval("UV", 0.0, 0.0, [1e5, 2e5], [1e5, 3e5])
    np.testing.assert_allclose(u, [1.0, 1.0], rtol=1e-6)
    np.testing.assert_allclose(v, [0.5, 0.5], rtol=1e-6)
    uo = fs.eval("U", 0.0, 0.0, 1e5, 1e5)
    np.testing.assert_allclose(uo, [1.0], rtol=1e-6)


def test_pset_add_merge_and_iadd():
    fs = uniform_flow_fieldset()
    p1 = ParticleSet(fs, x=[1000.0, 2000.0], y=[1000.0, 2000.0], t=[0.0, 0.0])
    p2 = ParticleSet(
        fs, x=[3000.0], y=[3000.0], t=[0.0], particle_ids=[7]
    )
    p1 += p2
    assert len(p1) == 3
    assert sorted(p1.particle_id.tolist()) == [0, 1, 7]
    np.testing.assert_allclose(sorted(p1.x.tolist()), [1000.0, 2000.0, 3000.0])
    with pytest.raises(TypeError):
        p1.add("not a pset")
    # merged set still executes
    p1.execute(AdvectionEE, dt=np.timedelta64(60, "s"), runtime=np.timedelta64(600, "s"))
    assert np.all(p1.t == 600.0)


def test_pset_iteration_records():
    fs = uniform_flow_fieldset()
    pset = ParticleSet(fs, x=[100.0, 200.0, 300.0], y=[10.0, 20.0, 30.0], t=[0.0] * 3)
    rows = list(pset)
    assert len(rows) == 3
    assert [float(r.x) for r in rows] == [100.0, 200.0, 300.0]
    assert "Particle(id=" in repr(rows[0])


def test_getitem_and_write_status(tmp_path):
    """Single-particle indexing + per-variable write toggling
    (reference particleset.py:165, :342-352)."""
    import parcels_tpu
    from parcels_tpu import ParticleFile, read_particlefile
    from parcels_tpu.kernels import AdvectionRK4

    fs = _eddy_fs()
    pset = parcels_tpu.ParticleSet(
        fs, x=[12000.0, 13000.0], y=[12500.0, 12500.0], t=[np.timedelta64(0, "s")] * 2
    )
    p0 = pset[0]
    assert p0.x == np.float32(12000.0) and p0.particle_id == 0
    assert "Particle(id=0" in repr(p0)

    pset.set_variable_write_status("z", False)
    assert [v.to_write for v in pset._pclass.variables if v.name == "z"] == [False]
    pf = ParticleFile(str(tmp_path / "t.parquet"), outputdt=np.timedelta64(10, "m"), mode="w")
    pset.execute(AdvectionRK4, dt=np.timedelta64(5, "m"),
                 runtime=np.timedelta64(20, "m"), output_file=pf)
    pf.close()
    df = read_particlefile(str(tmp_path / "t.parquet"))
    assert "z" not in df.columns and "x" in df.columns
    with pytest.raises(ValueError, match="no variable"):
        pset.set_variable_write_status("nope", True)


def test_lockstep_window_adapts_and_matches_exact_path():
    """The cond-free lockstep sampler must reproduce the exact path for
    staggered releases, with W adapting to the release spread."""
    from parcels_tpu.kernels import AdvectionRK4

    def run(spread, force_exact=False):
        fs = _eddy_fs()
        n = 6
        t0 = np.linspace(0.0, spread, n)
        ps = ParticleSet(fs, x=np.full(n, 12000.0), y=np.full(n, 12500.0), t=t0)
        if force_exact:
            ps._lockstep_window = lambda dt, rk, kernels=(): 0
        W = ps._lockstep_window(60.0, False)
        ps.execute(AdvectionRK4, dt=np.timedelta64(60, "s"), runtime=np.timedelta64(1, "h"))
        return W, np.asarray(ps.x)

    W0, x0 = run(0.0)
    assert W0 == 4
    W1, x1 = run(600.0)
    assert W1 > 4
    _, x1_exact = run(600.0, force_exact=True)
    np.testing.assert_array_equal(x1, x1_exact)
    # rk45 mode disables the proof
    fs = _eddy_fs()
    ps = ParticleSet(fs, x=[12000.0], y=[12500.0], t=[0.0])
    assert ps._lockstep_window(60.0, True) == 0


def test_lockstep_disabled_for_dt_writing_kernels():
    """Kernels that write per-lane dt/t (AdvectionAnalytical, custom) must
    disable the lockstep proof — the trace probe detects the write."""
    from parcels_tpu.kernels import AdvectionAnalytical, AdvectionRK4

    fs = _eddy_fs()
    ps = ParticleSet(fs, x=[12000.0], y=[12500.0], t=[0.0])
    assert ps._lockstep_window(60.0, False, (AdvectionRK4,)) > 0
    assert ps._lockstep_window(60.0, False, (AdvectionAnalytical,)) == 0

    def SetsDt(particles, fieldset):
        particles.dt = particles.dt * 0.5

    assert ps._lockstep_window(60.0, False, (AdvectionRK4, SetsDt)) == 0


def test_getitem_is_active_relative():
    fs = _eddy_fs()
    ps = ParticleSet(fs, x=[12000.0, 12100.0, 12200.0], y=[12500.0] * 3, t=[0.0] * 3)
    ps.remove_indices([1])
    assert ps[1].x == np.float32(12200.0)  # skips the deleted lane
    with pytest.raises(IndexError):
        ps[2]


def test_write_status_roundtrip_preserves_attrs():
    fs = _eddy_fs()
    ps = ParticleSet(fs, x=[12000.0], y=[12500.0], t=[0.0])
    before = next(v.attrs for v in ps._pclass.variables if v.name == "z")
    assert before, "default z variable should carry CF attrs"
    ps.set_variable_write_status("z", False)
    ps.set_variable_write_status("z", True)
    after = next(v.attrs for v in ps._pclass.variables if v.name == "z")
    assert after == before


def test_long_horizon_time_integration():
    """f64-grade clock on f32 hardware (SURVEY.md §7.3; VERDICT r1 item 5).

    ~900k steps with dt=17.3 s (deliberately unrepresentable on the f32
    grid once t > 2^23): the compensated (t, _tc) Kahan pair must land the
    final time EXACTLY on the requested horizon, and position drift must
    stay at f32-position parity (uncompensated f32 time drifted 11.6 km
    here; the clock carry cuts it to pure position rounding, < 5 km over
    1555 km of advection)."""
    from parcels_tpu import FieldSet, ParticleSet
    from parcels_tpu.datasets import simple_UV_dataset
    from parcels_tpu.kernels import AdvectionEE

    ds = simple_UV_dataset(dims=(2, 2, 8, 8), mesh="flat")
    ds["U"].values[:] = 0.1
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    pset = ParticleSet(fs, x=[-1.0e6], y=[0.0], t=[0.0])
    pset.execute(
        AdvectionEE, dt=np.timedelta64(17300, "ms"), runtime=np.timedelta64(180, "D")
    )
    horizon = 180 * 86400.0
    t_final = pset._data["t"][pset._data["_active"]]
    np.testing.assert_array_equal(t_final, np.float32(horizon))  # exact landing
    exp_x = -1.0e6 + 0.1 * horizon
    assert abs(pset.x[0] - exp_x) < 5e3, (pset.x[0], exp_x)


def test_exact_output_time_landing_subsecond_dt():
    """Non-integer dt over many outputdt boundaries: every chunk must land
    exactly on its boundary (clamped landing snaps t and clears the carry)."""
    from parcels_tpu import FieldSet, ParticleSet
    from parcels_tpu.datasets import simple_UV_dataset
    from parcels_tpu.kernels import AdvectionEE

    ds = simple_UV_dataset(dims=(2, 2, 8, 8), mesh="flat")
    ds["U"].values[:] = 1.0
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    pset = ParticleSet(fs, x=[-1.0e6], y=[0.0], t=[0.0])
    pset.execute(
        AdvectionEE, dt=np.timedelta64(700, "ms"), runtime=np.timedelta64(1, "h")
    )
    t_final = pset._data["t"][pset._data["_active"]]
    np.testing.assert_array_equal(t_final, np.float32(3600.0))
    # x rounds each step to the f32 grid at |x| ~ 1e6 (0.0625 m spacing):
    # 0.7 m increments land on 0.6875, a systematic -0.0125 m/step — the
    # identical behavior of the reference's f32 positions. Bound it.
    np.testing.assert_allclose(pset.x[0], -1.0e6 + 3600.0, atol=100.0)
