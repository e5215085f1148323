"""EngineOptions: programmatic engine-mode configuration (VERDICT r3 #6).

The mode matrix {sampler} x {stage-cache persistence} must be semantically
invisible: identical trajectories on every combination. Env vars remain a
debugging override layer with precedence over the dataclass.
"""

import os

import numpy as np
import pytest

from parcels_tpu import EngineOptions, ParticleSet
from parcels_tpu.datasets import moi_like_fieldset
from parcels_tpu.kernels import AdvectionRK4


def _run(options):
    fs = moi_like_fieldset(xdim=64, ydim=48, zdim=3, seed=5)
    rng = np.random.default_rng(1)
    n = 128
    pset = ParticleSet(
        fs,
        x=rng.uniform(-120, 120, n),
        y=rng.uniform(-50, 50, n),
        t=np.zeros(n),
    )
    pset.execute(
        AdvectionRK4,
        dt=np.timedelta64(1800, "s"),
        runtime=np.timedelta64(6 * 3600, "s"),
        options=options,
    )
    order = np.argsort(pset.particle_id)
    return np.stack([pset.x[order], pset.y[order]])


@pytest.mark.parametrize("sampler", ["auto", "gather", "binned"])
@pytest.mark.parametrize("persist", [True, False])
def test_mode_matrix_trajectory_invariance(sampler, persist):
    ref = _run(EngineOptions(sampler="gather", stagecache="off"))
    got = _run(
        EngineOptions(
            sampler=sampler,
            stagecache="force" if persist else "off",
            stagecache_persist=persist,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-5)


def test_invalid_options_rejected():
    with pytest.raises(ValueError, match="sampler"):
        EngineOptions(sampler="fast")
    with pytest.raises(ValueError, match="colgather"):
        EngineOptions(colgather="yes")
    with pytest.raises(ValueError, match="stagecache"):
        EngineOptions(stagecache="1")
    with pytest.raises(ValueError, match="max_chunk_steps"):
        EngineOptions(max_chunk_steps=-1)
    fs = moi_like_fieldset(xdim=64, ydim=48, zdim=3)
    pset = ParticleSet(fs, x=[0.0], y=[0.0], t=[0.0])
    with pytest.raises(TypeError, match="EngineOptions"):
        pset.execute(AdvectionRK4, dt=np.timedelta64(600, "s"),
                     runtime=np.timedelta64(600, "s"), options={"sampler": "auto"})


def test_applied_sets_and_restores_env(monkeypatch):
    monkeypatch.delenv("PARCELS_TPU_SORT_MODE", raising=False)
    monkeypatch.delenv("PARCELS_TPU_MAX_CHUNK_STEPS", raising=False)
    opts = EngineOptions(sampler="gather", max_chunk_steps=7)
    with opts.applied():
        assert os.environ["PARCELS_TPU_SORT_MODE"] == "off"
        assert os.environ["PARCELS_TPU_MAX_CHUNK_STEPS"] == "7"
    assert "PARCELS_TPU_SORT_MODE" not in os.environ
    assert "PARCELS_TPU_MAX_CHUNK_STEPS" not in os.environ


def test_env_overrides_programmatic(monkeypatch):
    """An explicitly-set env var wins over the dataclass value."""
    monkeypatch.setenv("PARCELS_TPU_SORT_MODE", "off")
    opts = EngineOptions(sampler="binned")
    with opts.applied():
        assert os.environ["PARCELS_TPU_SORT_MODE"] == "off"
    key = dict(opts.resolved_key())
    assert key["PARCELS_TPU_SORT_MODE"] == "off"
    monkeypatch.delenv("PARCELS_TPU_SORT_MODE")
    key = dict(opts.resolved_key())
    assert key["PARCELS_TPU_SORT_MODE"] == "force"


def test_resolved_key_distinguishes_options():
    """Different options produce different executor-cache key material."""
    a = EngineOptions(sampler="gather").resolved_key()
    b = EngineOptions(sampler="binned").resolved_key()
    assert a != b


def test_chunk_target_validation():
    with pytest.raises(ValueError, match="chunk_target_seconds"):
        EngineOptions(chunk_target_seconds=-1.0)
    assert EngineOptions(chunk_target_seconds=0).chunk_target_seconds == 0


def test_adaptive_chunker_shrinks_and_preserves_semantics():
    """A microscopic chunk_target_seconds forces 1-step launches after the
    probe chunk; trajectories must equal the fixed-chunk run (VERDICT r3 #2:
    measured cost-model chunker)."""
    base = _run(EngineOptions(chunk_target_seconds=0))

    fs = moi_like_fieldset(xdim=64, ydim=48, zdim=3, seed=5)
    rng = np.random.default_rng(1)
    n = 128
    pset = ParticleSet(
        fs,
        x=rng.uniform(-120, 120, n),
        y=rng.uniform(-50, 50, n),
        t=np.zeros(n),
    )
    pset.execute(
        AdvectionRK4,
        dt=np.timedelta64(1800, "s"),
        runtime=np.timedelta64(6 * 3600, "s"),
        options=EngineOptions(chunk_target_seconds=1e-9),
    )
    stats = pset.last_run_stats
    assert stats["chunk_steps_final"] == 1
    assert stats["est_seconds_per_step"] is not None
    # 12 steps: 2-step probe chunk + 1-step launches for the tail
    assert stats["chunks"] >= 5
    order = np.argsort(pset.particle_id)
    adaptive = np.stack([pset.x[order], pset.y[order]])
    np.testing.assert_array_equal(adaptive, base)
