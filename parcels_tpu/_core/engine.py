"""The jitted execution engine: kernel chain + particle state machine.

TPU-native redesign of reference Kernel.execute (src/parcels/_core/kernel.py:
176-249). The reference runs a Python while-loop of vectorized NumPy passes;
here the *entire* inner loop — per-particle dt clamping, the user kernel
chain (with RK45 Repeat resubmission), position update, end-of-loop
detection, deletion and error short-circuiting — is traced once into a
single ``lax.while_loop`` under ``jax.jit``. One chunk call advances all
particles to the next output boundary with zero host round-trips; the
particle SoA buffer is donated so XLA updates it in place.

State semantics (masked, static shapes):
- kernels run on ALL lanes; writes are merged under the evaluate mask by the
  ``Particles`` view (matching the reference's masked-subset views);
- ``Delete`` clears the validity mask instead of removing rows;
- error states / StopAllExecution end the while-loop; the host inspects the
  returned states and raises the reference's typed exceptions.
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from parcels_tpu._core.particles_view import Particles
from parcels_tpu._core.statuscodes import MIN_ERROR_CODE, StatusCode

__all__ = ["DEFAULT_BLOCK_SIZE", "build_chunk_executor", "compute_loop_masks", "engine_step"]

#: particles per sequential device block (bounds live intermediate memory)
DEFAULT_BLOCK_SIZE = int(os.environ.get("PARCELS_TPU_BLOCK_SIZE", 2**21))

#: re-sort the SoA every N inner steps while in binned+sorted mode, so the
#: positional drift since the chunk-boundary sort never pushes the slab
#: sampler's overflow past its fix-up capacity tier (0 = never)
RESORT_EVERY = int(os.environ.get("PARCELS_TPU_RESORT_EVERY", 16))


# ---------------------------------------------------------------------------
# spatial chunk sorting (feeds ops/binned_sample.py)
# ---------------------------------------------------------------------------


def _pick_sort_field(fieldset):
    """Name of the largest field that needs the binned sampler, or None."""
    from parcels_tpu._core.field import Field, VectorField
    from parcels_tpu.ops.binned_sample import binned_usable
    from parcels_tpu.ops.interp_kernels import fits_fast_path

    best = None
    for f in fieldset.fields.values():
        cand = f.U if isinstance(f, VectorField) else f
        if not isinstance(cand, Field) or cand.data.ndim != 4:
            continue
        if fits_fast_path(cand.data.shape) or not binned_usable(cand.data.shape):
            continue
        if best is None or cand.data.size > best.data.size:
            best = cand
    return best.name if best is not None else None


def _sort_mode_enabled(fieldset) -> bool:
    mode = os.environ.get("PARCELS_TPU_SORT_MODE", "auto")
    if mode in ("0", "off"):
        return False
    if _pick_sort_field(fieldset) is None:
        return False
    if mode == "force":
        return True
    return jax.default_backend() not in ("cpu",)


def _sort_worthwhile(fieldset, sort_field_name, n_block, z_occ) -> bool:
    """Will the binned sampler actually engage for the sort field at this
    lane count? If not (auto mode, infeasible bin plan), the chunk sort is
    pure overhead. Forced sort mode always sorts."""
    if os.environ.get("PARCELS_TPU_SORT_MODE", "auto") == "force":
        return True
    from parcels_tpu._core.field import VectorField
    from parcels_tpu.ops.binned_sample import plan_feasible

    f = fieldset.fields[sort_field_name]
    cand = f.U if isinstance(f, VectorField) else f
    return plan_feasible(tuple(cand.data.shape), n_block, z_occ)


def _soa_sortable(pdata) -> bool:
    """All per-particle arrays must be 4-byte scalars for the packed permute."""
    return all(
        k == "_rng" or v.ndim == 0 or (v.dtype.itemsize == 4 or v.dtype == jnp.bool_)
        for k, v in pdata.items()
    )


def _permute_soa(pdata, order, pad64=False):
    """Reorder every per-particle array by ``order`` with ONE packed row-gather.

    Per-column takes cost ~7x more than a single (n, C) row gather on TPU
    (measured, BASELINE.md); all on-device particle dtypes are 32-bit, so the
    SoA packs losslessly into one int32 matrix.
    """
    import jax.lax as lax

    cols, meta = [], []
    for k in sorted(pdata):
        v = pdata[k]
        if k == "_rng" or v.ndim == 0:  # scalars (e.g. _it) are not per-lane
            continue
        if v.dtype == jnp.bool_:
            enc = lambda a: a.astype(jnp.int32)
            dec = lambda a, dt=v.dtype: a.astype(dt)
        elif v.dtype == jnp.int32:
            enc = lambda a: a
            dec = lambda a: a
        else:  # f32 / u32: bitcast
            enc = lambda a, dt=v.dtype: lax.bitcast_convert_type(a, jnp.int32)
            dec = lambda a, dt=v.dtype: lax.bitcast_convert_type(a, dt)
        if v.ndim == 1:
            cols.append(enc(v))
            meta.append((k, dec, 1, 1))
        else:
            for i in range(v.shape[1]):
                cols.append(enc(v[:, i]))
            meta.append((k, dec, v.shape[1], 2))
    n = cols[0].shape[0]
    # CHUNK-BOUNDARY permutes pad to 64-wide rows and round-trip through a
    # flat 1-D barrier: the 1-D array has a unique layout, the reshape back
    # to (n, 64) is only free as row-major, and TPU row gathers hit a fast
    # DMA path at exactly 64 f32/row (2.1x vs the unpadded take, whose
    # operand XLA lays out column-major to make the stack free — 26
    # granules per gathered row; scripts/micro_permute.py, r5). The pad
    # triples the transient (stack + barrier copy + gather out), so it is
    # OFF inside the step loop's resort cond (branch copies doubled it
    # again: measured OOM at 2M x config-5) and above 4M lanes.
    if pad64 and n <= 4_000_000 and len(cols) <= 64:
        C, G = len(cols), 64
        grp = cols + [jnp.zeros_like(cols[0])] * (G - C)
        mat = jnp.stack(grp, axis=1)
        flat = jax.lax.optimization_barrier(mat.reshape(-1))
        mat = jnp.take(flat.reshape(n, G), order, axis=0)
        gathered = [mat[:, i] for i in range(C)]
    else:
        mat = jnp.stack(cols, axis=1)
        mat = jnp.take(mat, order, axis=0)
        gathered = [mat[:, i] for i in range(len(cols))]
    out = dict(pdata)
    c = 0
    for k, dec, w, ndim in meta:
        if ndim == 1:
            out[k] = dec(gathered[c])
        else:
            out[k] = dec(jnp.stack(gathered[c : c + w], axis=1))
        c += w
    return out


def _sort_soa(fsview, sort_field_name, pdata, z_occ=None, pad64=False):
    """Sort the SoA by the spatial bin of the cached cell index; returns (pdata, order).

    The bin comes from the SoA's ``ei`` cache (updated at every field sample,
    field.py `_update_particles_ei`) rather than a fresh grid search: zero
    extra search cost per chunk, and it works on curvilinear grids where a
    cold search would pay a raster-lookup + cell walk. Lanes that were never
    sampled (ei=0) group into bin 0 and take the gather fallback for their
    first chunk only.
    """
    from parcels_tpu._core.field import VectorFieldView
    from parcels_tpu.ops.binned_sample import sort_key_for

    fv = getattr(fsview, sort_field_name)
    if isinstance(fv, VectorFieldView):
        fv = fv.U
    spec = fv.grid.spec
    ydim, xdim = max(spec.ydim, 1), max(spec.xdim, 1)
    ei = pdata["ei"][:, fv.igrid].astype(jnp.int32)
    xi = ei % xdim
    yi = (ei // xdim) % ydim
    zi = ei // (xdim * ydim)
    gpos = {"Z": {"index": zi}, "Y": {"index": yi}, "X": {"index": xi}}
    key = sort_key_for(spec, gpos, tuple(fv.data.shape), pdata["state"].shape[0], z_occ)
    n = key.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    # inactive lanes sort to the end (their positions may be stale)
    key = jnp.where(pdata["_active"], key, jnp.int32(2**31 - 1))
    _, order = jax.lax.sort_key_val(key, iota)
    return _permute_soa(pdata, order, pad64=pad64), order


def _unsort_soa(pdata, order, pad64=False):
    n = order.shape[0]
    inv = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return _permute_soa(pdata, inv, pad64=pad64)


def build_chunk_executor(
    kernel_fns: Sequence[Callable],
    fieldset,
    *,
    sign_dt: int,
    rk45_mode: bool,
    donate: bool = True,
    block_size: int | None = None,
    lockstep_w: int = 0,
    z_occ: float | None = None,
):
    """Compile a chunk executor: (farrays, pdata, endtime, dt0) -> pdata.

    ``sign_dt`` and ``rk45_mode`` are static (baked into the trace);
    ``endtime``/``dt0`` are traced scalars so consecutive output chunks reuse
    the same executable. ``z_occ`` is the quantized occupied-z fraction of
    the batch, captured at build time and baked into the trace (the caller
    must key its executor cache on it).

    Particle counts above ``block_size`` are processed as a sequential
    ``lax.map`` over equal blocks (the count must be a multiple of the block
    size — the ParticleSet pads with inactive lanes). Blocks are independent
    (particles never interact), so per-block while-loops are semantically
    identical to one global loop; blocking bounds the live-intermediate
    memory, which otherwise scales with the full particle count.
    """
    kernel_fns = tuple(kernel_fns)
    if block_size is None:
        block_size = DEFAULT_BLOCK_SIZE
    sort_mode = _sort_mode_enabled(fieldset)
    sort_field_name = _pick_sort_field(fieldset) if sort_mode else None

    def chunk(farrays, pdata, endtime, dt0):
        fsview = fieldset.build_views(farrays)
        endtime = jnp.asarray(endtime, dtype=pdata["t"].dtype)
        dt0 = jnp.asarray(dt0, dtype=pdata["dt"].dtype)

        # materialize the stage-cache fused cell tables + corner-column
        # tables OUTSIDE the step while-loop (traced here, before any loop)
        from parcels_tpu.ops import stagecache

        stagecache.prebuild_tables(fsview)

        sorting = sort_field_name is not None and _soa_sortable(pdata)
        if sorting and not _sort_worthwhile(fieldset, sort_field_name,
                                            min(pdata["state"].shape[0], block_size), z_occ):
            # sorting exists to feed the binned sampler; when the bin plan
            # is infeasible at this density the engine falls through to the
            # order-insensitive colgather/gather paths, and the 10Mx26 sort
            # + per-step resort cond are pure overhead (device trace r4)
            sorting = False
        resort = None
        if sorting:
            # carry the original lane index through every (re)sort so the
            # final unsort works whatever permutation the inner loop applied
            pdata = dict(pdata)
            pdata["_ord"] = jnp.arange(pdata["state"].shape[0], dtype=jnp.int32)
            pdata, _ = _sort_soa(fsview, sort_field_name, pdata, z_occ, pad64=True)
            if RESORT_EVERY > 0:
                resort = lambda pd: _sort_soa(fsview, sort_field_name, pd, z_occ)[0]

        def finish(out):
            if not sorting:
                return out
            return _unsort_soa(out, out.pop("_ord"), pad64=True)

        n = pdata["state"].shape[0]
        if n <= block_size:
            out = _run_block(
                fsview, dict(pdata), endtime, dt0, kernel_fns, sign_dt, rk45_mode,
                sorting, resort, lockstep_w, z_occ,
            )
            return finish(out)

        if n % block_size:
            raise ValueError(
                f"Particle count {n} must be a multiple of block_size {block_size} "
                "(the ParticleSet pads with inactive lanes)."
            )
        B = n // block_size
        blocked = {}
        for k, v in pdata.items():
            if k == "_rng":
                keys = jax.random.split(jax.random.wrap_key_data(v, impl="threefry2x32"), B)
                blocked[k] = jax.random.key_data(keys)
            else:
                blocked[k] = v.reshape((B, block_size) + v.shape[1:])

        out = jax.lax.map(
            lambda pd: _run_block(
                fsview, dict(pd), endtime, dt0, kernel_fns, sign_dt, rk45_mode,
                sorting, resort, lockstep_w, z_occ,
            ),
            blocked,
        )
        merged = {}
        for k, v in out.items():
            merged[k] = v[0] if k == "_rng" else v.reshape((n,) + v.shape[2:])
        return finish(merged)

    donate_argnums = (1,) if donate else ()
    return jax.jit(chunk, donate_argnums=donate_argnums)


def rk45_chunk_start_dt(fsview, pdata, sign_dt):
    """Chunk-start dt for RK45 mode: restore from next_dt, floored at
    RK45_min_dt (reference kernel.py:119-120 restores dt = next_dt every
    iteration). A lane that landed on the previous chunk's endtime had its
    dt clamped toward 0 by the per-step landing clamp; re-entering a chunk
    with that leftover (possibly 0) dt would evaluate zero-length steps,
    and a dt below the f32 ulp of t freezes the lane via the stuck-guard.
    Shared by the single-device block runner and the domain executor."""
    min_dt = jnp.abs(jnp.asarray(fsview.RK45_min_dt, dtype=pdata["next_dt"].dtype))
    nd = pdata["next_dt"]
    return jnp.where(jnp.abs(nd) < min_dt, min_dt * sign_dt, nd).astype(pdata["dt"].dtype)


def compute_loop_masks(pd, endtime, sign_dt):
    """(busy, halt) lane masks driving the chunk while-loop condition."""
    st = pd["state"]
    act = pd["_active"]
    tte = sign_dt * (endtime - pd["t"])
    busy = act & ((st == StatusCode.Evaluate) | (st == StatusCode.Repeat)) & (tte >= 0)
    halt = act & ((st >= MIN_ERROR_CODE) | (st == StatusCode.StopAllExecution))
    return busy, halt


def _run_block(
    fsview, pdata, endtime, dt0, kernel_fns, sign_dt, rk45_mode,
    sorted_hint=False, resort=None, lockstep_w=0, z_occ=None,
):
    """The full inner time loop for one particle block (traced)."""
    # Chunk start: active particles are (re)queued for evaluation —
    # EXCEPT error / StopAllExecution lanes. The reference requeues all
    # (kernel.py:190) but raises before the next chunk; here the public
    # execute() pipelines chunk dispatch ahead of the error pull, so a
    # chunk launched after an errored one must be a halt no-op (the host
    # raises one pull later with identical state). The reference's
    # requeue-all happens host-side once per execute() call instead.
    st = pdata["state"]
    pdata["state"] = jnp.where(
        pdata["_active"]
        & (st < MIN_ERROR_CODE)
        & (st != StatusCode.StopAllExecution),
        jnp.int32(StatusCode.Evaluate),
        st,
    )
    if rk45_mode:
        pdata["dt"] = rk45_chunk_start_dt(fsview, pdata, sign_dt)
    if resort is not None:
        pdata["_it"] = jnp.int32(0)

    def cond(pd):
        busy, halt = compute_loop_masks(pd, endtime, sign_dt)
        return jnp.any(busy) & ~jnp.any(halt)

    def body(pd):
        pd = engine_step(
            fsview, pd, endtime, dt0, kernel_fns, sign_dt, rk45_mode, sorted_hint,
            lockstep_w, z_occ,
        )
        if resort is not None:
            pd = dict(pd)
            it = pd["_it"] + 1
            pd["_it"] = it
            pd = jax.lax.cond(it % RESORT_EVERY == 0, resort, lambda p: p, pd)
        return pd

    out = jax.lax.while_loop(cond, body, pdata)
    if resort is not None:
        out = dict(out)
        out.pop("_it")
    return out


def engine_step(
    fsview, pd, endtime, dt0, kernel_fns, sign_dt, rk45_mode,
    sorted_hint=False, lockstep_w=0, z_occ=None,
):
    """One iteration of the inner loop: kernel chain + state machine update."""
    pd = dict(pd)
    act = pd["_active"]
    st = pd["state"]
    tte = sign_dt * (endtime - pd["t"])
    eval_mask = act & ((st == StatusCode.Success) | (st == StatusCode.Evaluate)) & (tte >= 0)

    # Clamp dt so particles land exactly on endtime
    # (reference kernel.py:201-205; applied array-wide).
    if sign_dt == 1:
        pd["dt"] = jnp.maximum(jnp.minimum(pd["dt"], tte), 0.0).astype(pd["dt"].dtype)
    else:
        pd["dt"] = jnp.minimum(jnp.maximum(pd["dt"], -tte), 0.0).astype(pd["dt"].dtype)

    # Kernel chain; each kernel is followed by masked Repeat
    # resubmission (RK45 adaptive dt, reference kernel.py:208-218).
    from parcels_tpu.ops import stagecache

    for f in kernel_fns:
        # the C-grid cell cache must not cross kernel-call boundaries
        # (semantics AND trace-scope: its tracers belong to one region);
        # its final entries persist across steps via the SoA (flush)
        stagecache.reset(fsview)
        view = Particles(pd, eval_mask, sorted_hint, lockstep_w, z_occ)
        f(view, fsview)
        stagecache.flush(fsview, pd)
        stagecache.reset(fsview)

        def rcond(pdd):
            return jnp.any(pdd["_active"] & (pdd["state"] == StatusCode.Repeat))

        def rbody(pdd, f=f):
            pdd = dict(pdd)
            stagecache.reset(fsview)
            rview = Particles(
                pdd, pdd["_active"] & (pdd["state"] == StatusCode.Repeat), sorted_hint,
                z_occ_hint=z_occ,
            )
            f(rview, fsview)
            stagecache.flush(fsview, pdd)
            stagecache.reset(fsview)
            return pdd

        pd = jax.lax.while_loop(rcond, rbody, pd)

    # Position/time update for lanes still in a normal state
    # (reference kernel.py:108-120, 222-224).
    st = pd["state"]
    upd = eval_mask & ((st == StatusCode.Evaluate) | (st == StatusCode.Success))
    t_old = pd["t"]
    uview = Particles(pd, upd)
    uview.x = pd["x"] + pd["dx"]
    uview.y = pd["y"] + pd["dy"]
    uview.z = pd["z"] + pd["dz"]
    # Compensated (Kahan) clock: y carries the lost low bits of previous
    # steps so t never systematically lags dt; the clamped landing step
    # snaps t to endtime exactly and clears the carry (the reference keeps
    # t in float64, particle.py:129-160 — this is the f32-pair equivalent,
    # SURVEY.md §7.3).
    landing = pd["dt"] == (endtime - pd["t"])
    y_inc = pd["dt"] + pd["_tc"]
    t_new = pd["t"] + y_inc
    c_new = y_inc - (t_new - pd["t"])
    t_new = jnp.where(landing, jnp.broadcast_to(endtime, t_new.shape), t_new)
    c_new = jnp.where(landing, jnp.zeros_like(c_new), c_new)
    uview.t = t_new
    uview._tc = c_new
    uview.dx = jnp.zeros_like(pd["dx"])
    uview.dy = jnp.zeros_like(pd["dy"])
    uview.dz = jnp.zeros_like(pd["dz"])
    if rk45_mode:
        # dt may have been increased by the RK45 kernel. Floor at
        # RK45_min_dt (the kernel's own documented floor): at an endtime
        # landing the kernel saw the CLAMPED dt (can be arbitrarily small,
        # even 0) and derived next_dt from it — carrying that below min_dt
        # into the next chunk leaves t+dt == t in f32, and the stuck-guard
        # below would then freeze the lane at the chunk boundary forever.
        min_dt = jnp.abs(jnp.asarray(fsview.RK45_min_dt, dtype=pd["next_dt"].dtype))
        nd = pd["next_dt"]
        uview.dt = jnp.where(jnp.abs(nd) < min_dt, min_dt * sign_dt, nd)
    else:
        # revert to the nominal dt (reference kernel.py:227-228)
        pd["dt"] = jnp.broadcast_to(dt0, pd["dt"].shape).astype(pd["dt"].dtype)

    # Mark particles that reached endtime (reference kernel.py:231-232).
    # The extra "stuck" clause guards against float32 time underflow
    # (t + dt == t) which would otherwise spin the loop forever.
    st = pd["state"]
    stuck = upd & (pd["t"] == t_old) & (sign_dt * (endtime - pd["t"]) > 0)
    reached = (pd["t"] == endtime) | stuck
    pd["state"] = jnp.where(
        (st == StatusCode.Evaluate) & reached,
        jnp.int32(StatusCode.EndofLoop),
        st,
    )

    # Deletion: clear validity instead of removing rows
    # (reference kernel.py:235 -> remove_indices).
    pd["_active"] = pd["_active"] & (pd["state"] != StatusCode.Delete)
    return pd
