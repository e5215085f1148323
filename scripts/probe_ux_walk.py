"""Probe: per-iteration unfound counts of the ux adjacency walk at steady
state, and the per-stage miss rate of the warm (cached-face) check.

Builds the FESOM2-scale bench mesh, advances the batch 3 steps so the ei
cache is warm, displaces positions by one RK-stage-like offset, and runs
the walk body manually, printing how many lanes remain unfound after each
hop. Distinguishes real multi-hop walks from edge-oscillation stalls.

Env: N (default 2M), NX (1200), NZ (48).
"""
import os
import sys

_d = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [_d, os.path.dirname(_d)]

import numpy as np

import bench_ux


def main():
    import jax
    import jax.numpy as jnp

    from parcels_tpu._core.engine import build_chunk_executor
    from parcels_tpu.kernels import AdvectionRK4
    from parcels_tpu._core import uxgrid as ug
    from parcels_tpu.ops import uxcol

    npart = int(os.environ.get("N", 2_000_000))
    nx = int(os.environ.get("NX", 1200))
    nz = int(os.environ.get("NZ", 48))
    dt = 120.0
    fs = bench_ux.build_fieldset(nx, nz)
    grid = fs.UV.U.grid
    key = jax.random.PRNGKey(2)
    kx, ky = jax.random.split(key)
    extent = 1e6
    pdata = {
        "x": jax.random.uniform(kx, (npart,), jnp.float32, 0.3 * extent, 0.7 * extent),
        "y": jax.random.uniform(ky, (npart,), jnp.float32, 0.3 * extent, 0.7 * extent),
        "z": jnp.full((npart,), 100.0, jnp.float32),
        "t": jnp.zeros((npart,), jnp.float32),
        "_tc": jnp.zeros((npart,), jnp.float32),
        "dt": jnp.full((npart,), dt, jnp.float32),
        "dx": jnp.zeros((npart,), jnp.float32),
        "dy": jnp.zeros((npart,), jnp.float32),
        "dz": jnp.zeros((npart,), jnp.float32),
        "particle_id": jnp.arange(npart, dtype=jnp.int32),
        "state": jnp.zeros((npart,), jnp.int32),
        "_active": jnp.ones((npart,), bool),
        "ei": jnp.zeros((npart, 1), jnp.int32),
    }
    executor = build_chunk_executor(
        (AdvectionRK4,), fs, sign_dt=1, rk45_mode=False, donate=False,
        block_size=npart,
    )
    farrays = fs.device_arrays()
    out = executor(farrays, pdata, jnp.float32(3 * dt), jnp.float32(dt))
    np.asarray(out["t"][:1])

    garrs = grid.make_view(grid.device_arrays()).garrs
    spec = grid.spec
    x = out["x"]
    y = out["y"]
    ei = out["ei"][:, 0]
    act = np.asarray(out["_active"])
    print(f"active {act.mean()*100:.2f}%")

    @jax.jit
    def stage_miss(x, y, ei, ftbl, lookup_fi, nodes, conn):
        g = {"nodes": nodes, "conn": conn}
        pts = ug._query_points(g, y, x, spec.spherical)

        def bary(fi):
            if ftbl is not None:
                return uxcol.bary_from_rows(uxcol.face_rows(ftbl, fi), pts, spec.spherical)
            return ug._bary_coords(g, fi, pts, spec.spherical)

        fi0 = jnp.clip(ei, 0, spec.n_face - 1)
        bc0 = bary(fi0)
        hit0 = ug._in_cell(bc0)
        # manual unrolled walk from the raster seed for the misses
        (oy, ox) = spec.lookup_origin
        (sy, sx) = spec.lookup_step
        ny, nxr = spec.lookup_shape
        ry = jnp.clip(jnp.floor((y - oy) / sy).astype(jnp.int32), 0, ny - 1)
        rx = jnp.clip(jnp.floor((x - ox) / sx).astype(jnp.int32), 0, nxr - 1)
        seed = lookup_fi[ry, rx]
        fi = jnp.where(hit0, fi0, jnp.clip(seed, 0, spec.n_face - 1))
        bc = bary(fi)
        found = ug._in_cell(bc)
        unfound = [jnp.sum(~found)]
        prev = jnp.full_like(fi, -1)
        for i in range(8):
            k = jnp.argmin(bc, axis=-1)
            row = uxcol.face_rows(ftbl, fi)
            nxt = uxcol.adj_from_rows(row, k.astype(jnp.int32))
            move = ~found & (nxt >= 0)
            osc = move & (nxt == prev)
            prev = jnp.where(move, fi, prev)
            fi_new = jnp.where(move, nxt, fi)
            bc_new = bary(fi_new)
            fnd_new = found | ug._in_cell(bc_new)
            bc = jnp.where(found[:, None], bc, bc_new)
            fi = fi_new
            found = fnd_new
            unfound.append(jnp.sum(~found & (nxt >= 0)))
            if i == 0:
                osc0 = jnp.sum(osc)
        return hit0, jnp.stack(unfound), osc0

    # displace like an RK mid-stage (half-step at local velocity ~ rotation)
    for label, (xx, yy) in (
        ("stage1 (cached pos)", (x, y)),
        ("stage2-like (+half step)", (x + 30.0, y + 30.0)),
    ):
        hit0, unfound, osc0 = stage_miss(
            xx, yy, ei, garrs.get("face_table"), garrs["lookup_fi"],
            garrs["nodes"], garrs["conn"])
        h = float(np.asarray(jnp.mean(hit0.astype(jnp.float32))))
        u = np.asarray(unfound)
        print(f"{label}: warm hit {h*100:.2f}%  unfound after seed: {u[0]}")
        print(f"   unfound after hops: {list(u[1:])}")
        print(f"   first-hop immediate backtracks (A->B->A): {int(np.asarray(osc0))}")


if __name__ == "__main__":
    main()
