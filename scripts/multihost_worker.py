"""Multi-process worker: true jax.distributed SPMD run of the engine.

Launched N times (once per "host") by tests/test_multiprocess.py or manually:

    XLA_FLAGS=--xla_force_host_platform_device_count=4 \
    python scripts/multihost_worker.py <process_id> <num_processes> <port>

Each process owns 4 virtual CPU devices; together they form one global
8-device mesh. All processes seed the same global particle set, shard it by
ownership (ParticleMesh.shard_soa -> make_array_from_process_local_data),
run a jitted RK4 chunk over the global mesh (gloo collectives between
processes), allgather the SoA, and verify the closed form — the multi-host
wiring that SURVEY.md section 2.2 requires and a single container can only
exercise this way.
"""

import os
import sys

# self-contained import path: the spawning test's PYTHONPATH may be
# claimed by the TPU-plugin site dir and not include the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def run_banded(pid, nproc):
    """YBandDomain + per-step ppermute migration ACROSS the process boundary.

    8 global devices = 8 Y-bands, 4 per process: a northward uniform flow
    drives every particle across band edges including the device-3 | device-4
    edge, which is also the gloo process boundary. Verifies the closed form
    AND that particle identities survive the cross-process exchanges.
    """
    import jax.numpy as jnp

    from parcels_tpu import FieldSet
    from parcels_tpu._core.particle import create_particle_data, get_default_particle
    from parcels_tpu.datasets import simple_UV_dataset
    from parcels_tpu.kernels import AdvectionEE
    from parcels_tpu.parallel.domain import YBandDomain, build_domain_executor

    u, v = 0.0, 20.0
    ds = simple_UV_dataset(dims=(2, 2, 64, 64), mesh="flat")
    ds["U"].values[:] = u
    ds["V"].values[:] = v
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")

    dom = YBandDomain(fs, n_bands=4 * nproc, halo=3)
    npart = 48
    rng = np.random.default_rng(1)  # same seed everywhere: global seeding
    x = rng.uniform(-5e5, 5e5, npart).astype(np.float32)
    y = rng.uniform(-9e5, -6e5, npart).astype(np.float32)  # southern bands
    pdata = create_particle_data(
        pclass=get_default_particle(),
        nparticles=npart,
        ngrids=len(fs._gridset),
        initial={"x": x, "y": y, "particle_id": np.arange(npart, dtype=np.int32)},
    )
    pdata["state"][:] = 10  # Evaluate

    farrays = dom.stacked_farrays()
    sdata = dom.shard_soa(pdata)
    assert sdata["x"].sharding.num_devices == 4 * nproc

    executor = build_domain_executor((AdvectionEE,), dom, sign_dt=1, rk45_mode=False)
    # 20 m/s * 72000 s = +14.4e5 m: from bands 0-1 to bands 6-7, crossing ~6
    # of the 2.5e5-m bands incl. the band-3|4 process boundary, while staying
    # inside the +-1e6 m domain
    dt, steps_per_chunk, chunks = 600.0, 12, 10
    endt = 0.0
    out = sdata
    for _ in range(chunks):
        endt += dt * steps_per_chunk
        out = executor(farrays, out, jnp.float32(endt), jnp.float32(dt))

    from jax.experimental import multihost_utils

    host = {
        k: np.asarray(multihost_utils.process_allgather(v, tiled=True))
        for k, v in out.items()
        if k not in ("_rng",)
    }
    assert int(host["_migof"].sum()) == 0 and int(host["_haloof"].sum()) == 0
    act = host["_active"]
    assert int(act.sum()) == npart
    ids = host["particle_id"][act]
    assert sorted(ids.tolist()) == list(range(npart)), "identity lost in migration"
    order = np.argsort(ids)
    ys = host["y"][act][order]
    xs = host["x"][act][order]
    np.testing.assert_allclose(ys, y + v * endt, rtol=1e-5, atol=0.5)
    np.testing.assert_allclose(xs, x, atol=0.5)
    # the run must actually have crossed the process boundary: final bands
    # are in the upper half of the mesh for everyone
    band = dom.band_of(ys, xs)
    assert (band >= 4).all(), band
    print(
        f"proc {pid}/{nproc}: BANDED OK n={npart} global_devices={jax.device_count()} "
        f"final_bands={sorted(set(band.tolist()))}",
        flush=True,
    )


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "pmesh"
    from parcels_tpu.parallel import ParticleMesh, init_distributed

    got = init_distributed(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert got == pid, (got, pid)
    assert jax.process_count() == nproc

    if mode == "banded":
        run_banded(pid, nproc)
        return

    import jax.numpy as jnp

    from parcels_tpu import FieldSet
    from parcels_tpu._core.engine import build_chunk_executor
    from parcels_tpu._core.particle import create_particle_data, get_default_particle
    from parcels_tpu.datasets import simple_UV_dataset
    from parcels_tpu.kernels import AdvectionRK4

    u, v = 0.7, -0.3
    ds = simple_UV_dataset(dims=(2, 2, 32, 32), mesh="flat")
    ds["U"].values[:] = u
    ds["V"].values[:] = v
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")

    npart = 64
    rng = np.random.default_rng(0)  # same seed on every process: global seeding
    x = rng.uniform(-5e5, 5e5, npart).astype(np.float32)
    y = rng.uniform(-5e5, 5e5, npart).astype(np.float32)
    pdata = create_particle_data(
        pclass=get_default_particle(),
        nparticles=npart,
        ngrids=len(fs._gridset),
        initial={"x": x, "y": y},
    )
    pdata["state"][:] = 10  # Evaluate

    pmesh = ParticleMesh()
    assert pmesh.n == 4 * nproc, pmesh.n
    farrays = pmesh.shard_fields(fs.device_arrays())
    sdata = pmesh.shard_soa(pdata)
    assert sdata["x"].sharding.num_devices == 4 * nproc

    executor = build_chunk_executor(
        (AdvectionRK4,), fs, sign_dt=1, rk45_mode=False, donate=False, block_size=2**21
    )
    dt, steps = 600.0, 12
    out = executor(farrays, sdata, jnp.float32(dt * steps), jnp.float32(dt))

    host = pmesh.gather_soa(out)
    xs, ys = host["x"][:npart], host["y"][:npart]
    np.testing.assert_allclose(xs, x + u * dt * steps, rtol=1e-5, atol=0.5)
    np.testing.assert_allclose(ys, y + v * dt * steps, rtol=1e-5, atol=0.5)
    print(f"proc {pid}/{nproc}: OK n={npart} global_devices={jax.device_count()}", flush=True)


if __name__ == "__main__":
    main()
