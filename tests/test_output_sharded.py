"""Trajectory output under sharding (VERDICT r5 task 7).

The writer must pull only the columns the file needs (not the whole SoA
with its engine cache columns), and banded multi-device runs must produce
complete, correct trajectory files.
"""

import numpy as np
import pytest

import jax

from parcels_tpu import FieldSet, ParticleFile, ParticleSet, read_particlefile
from parcels_tpu.datasets import simple_UV_dataset
from parcels_tpu.kernels import AdvectionRK4
from parcels_tpu.parallel import YBandDomain, shard_particleset

needs_mesh = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device virtual mesh"
)


def test_snapshot_queue_carries_only_output_columns(tmp_path):
    """write_snapshot must drop engine-internal columns BEFORE the queue:
    the device->host pull is the per-outputdt cost at 10M lanes."""
    ds = simple_UV_dataset(dims=(2, 2, 8, 8), mesh="flat")
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    pset = ParticleSet(fs, x=[0.0], y=[0.0], t=[0.0])
    pf = ParticleFile(tmp_path / "t.parquet", outputdt=np.timedelta64(10, "m"))
    pf.set_metadata(fs, pset._pclass, (AdvectionRK4,))
    seen = {}
    orig_put = pf._queue.put

    def spy_put(item):
        if item is not None:
            seen.update(item[0])
        # swallow: no thread needed for this test
        return None

    pf._queue.put = spy_put
    fat = dict(pset._data)
    fat["_sc_key"] = np.zeros((1, 4), np.int32)
    fat["_uxc_u"] = np.zeros((1, 12), np.float32)
    fat["ei"] = np.zeros((1, 1), np.int32)
    pf.write_snapshot(fat, 0.0)
    assert "_sc_key" not in seen and "_uxc_u" not in seen and "ei" not in seen
    for k in ("t", "dt", "_active", "x", "y", "z", "particle_id"):
        assert k in seen, k
    pf._queue.put = orig_put
    pf.close()


@needs_mesh
def test_banded_run_writes_complete_trajectories(tmp_path):
    ds = simple_UV_dataset(dims=(2, 2, 32, 8), mesh="flat")
    ds["U"].values[:] = 0.0
    ds["V"].values[:] = 10.0
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    n = 32
    x = np.linspace(-8e5, 8e5, n)
    y = np.full(n, -8e5)
    pset = ParticleSet(fs, x=x, y=y, t=np.zeros(n))
    shard_particleset(pset, YBandDomain(fs, n_bands=8, halo=2))
    path = tmp_path / "banded.parquet"
    pf = ParticleFile(path, outputdt=np.timedelta64(4, "h"))
    pset.execute(
        AdvectionRK4,
        dt=np.timedelta64(600, "s"),
        runtime=np.timedelta64(86400, "s"),
        output_file=pf,
    )
    pf.close()
    df = read_particlefile(path, decode_times=False)
    # 6 post-start output steps + the initial snapshot, every particle
    counts = df.groupby("particle_id").size()
    assert len(counts) == n
    assert (counts == 7).all(), counts
    # northward drift at 10 m/s visible in the trajectories
    last = df[df["t"] == df["t"].max()].sort_values("particle_id")
    np.testing.assert_allclose(last["y"].to_numpy(), -8e5 + 10.0 * 86400, rtol=1e-5)
    # lanes never duplicate within one output step (migration moves them
    # between shards mid-run)
    assert not df.duplicated(subset=["particle_id", "t"]).any()
