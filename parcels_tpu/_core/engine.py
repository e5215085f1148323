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

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from parcels_tpu._core.particles_view import Particles
from parcels_tpu._core.statuscodes import MIN_ERROR_CODE, StatusCode

__all__ = ["build_chunk_executor"]


def build_chunk_executor(
    kernel_fns: Sequence[Callable],
    fieldset,
    *,
    sign_dt: int,
    rk45_mode: bool,
    donate: bool = True,
):
    """Compile a chunk executor: (farrays, pdata, endtime, dt0) -> pdata.

    ``sign_dt`` and ``rk45_mode`` are static (baked into the trace);
    ``endtime``/``dt0`` are traced scalars so consecutive output chunks reuse
    the same executable.
    """
    kernel_fns = tuple(kernel_fns)

    def chunk(farrays, pdata, endtime, dt0):
        fsview = fieldset.build_views(farrays)
        pdata = dict(pdata)
        # Chunk start: active particles are (re)queued for evaluation
        # (reference kernel.py:190).
        pdata["state"] = jnp.where(
            pdata["_active"], jnp.int32(StatusCode.Evaluate), pdata["state"]
        )
        endtime = jnp.asarray(endtime, dtype=pdata["t"].dtype)
        dt0 = jnp.asarray(dt0, dtype=pdata["dt"].dtype)

        def cond(pd):
            st = pd["state"]
            act = pd["_active"]
            tte = sign_dt * (endtime - pd["t"])
            busy = act & ((st == StatusCode.Evaluate) | (st == StatusCode.Repeat)) & (tte >= 0)
            halt = act & ((st >= MIN_ERROR_CODE) | (st == StatusCode.StopAllExecution))
            return jnp.any(busy) & ~jnp.any(halt)

        def body(pd):
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
            for f in kernel_fns:
                view = Particles(pd, eval_mask)
                f(view, fsview)

                def rcond(pdd):
                    return jnp.any(pdd["_active"] & (pdd["state"] == StatusCode.Repeat))

                def rbody(pdd, f=f):
                    pdd = dict(pdd)
                    rview = Particles(pdd, pdd["_active"] & (pdd["state"] == StatusCode.Repeat))
                    f(rview, fsview)
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
            uview.t = pd["t"] + pd["dt"]
            uview.dx = jnp.zeros_like(pd["dx"])
            uview.dy = jnp.zeros_like(pd["dy"])
            uview.dz = jnp.zeros_like(pd["dz"])
            if rk45_mode:
                # dt may have been increased by the RK45 kernel
                uview.dt = pd["next_dt"]
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

        return jax.lax.while_loop(cond, body, pdata)

    donate_argnums = (1,) if donate else ()
    return jax.jit(chunk, donate_argnums=donate_argnums)
