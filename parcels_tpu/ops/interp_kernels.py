"""Fused Pallas interpolation kernels (the TPU hot loop).

Why not gather? XLA's generic gather on TPU runs at ~10^8 gathered
elements/s (measured on v5e — two orders of magnitude below HBM speed), and
a multilinear field sample needs 8-16 gathers per particle. This path
eliminates random access entirely for fields whose spatial block fits VMEM:

1. **Time windowing** (engine-level, traced): particles march in lockstep in
   the common case, so a scalar ``dynamic_slice`` pulls a ``W``-level window
   of the field; a ``lax.cond`` falls back to the XLA gather path for
   time-divergent batches (delayed releases spread across >W levels).
2. **Hat-weight MXU contraction** (Pallas): the window is folded to a dense
   ``(R, X)`` matrix with ``r = (l*Z + z)*Y + y``. Per-particle multilinear
   weights along the folded axes are hat functions
   ``max(0, 1 - |axis_index - position|)`` — exactly the 2-point linear
   interpolation weights, zero out of range — built in VMEM from iotas
   (VPU) and contracted with the window on the MXU in f32. The X-axis hat
   weights then reduce row-wise (VPU).

Cost per particle-sample is ``2*W*Z*Y*X`` flops with no HBM random access;
the weight matrices never leave VMEM. Large 3-D fields (beyond the VMEM
budget) use the XLA 16-corner flat-gather path.

Large-field measurements on v5e (shape (2,50,Y,X) ~100 MB):
- flat 16-corner gather: 7.2 M samples/s — instruction-bound;
- strided ``lax.gather`` of (2,2,2,2) patches: 13x SLOWER (never use);
- pre-sorting indices by cell: NO effect (7.2 M/s either way) — the TPU
  gather is instruction-bound, not locality-bound — but a device argsort of
  2M keys costs only 8 ms, so binning is affordable.

Fields beyond the VMEM fold therefore take the *binned slab sampler*
(ops/binned_sample.py): the engine sorts the SoA by spatial bin and each
Pallas program contracts its chunk against two DMA'd bin slabs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["TIME_WINDOW", "fits_fast_path", "linear_sample_windowed", "positions_from_gpos"]

#: levels in the lockstep time window
TIME_WINDOW = 4
#: max R*X f32 elements of the folded window kept VMEM-resident (4 MB)
MAX_FOLDED_ELEMS = 1 << 20
#: max padded X extent (bounds the (P, X) accumulator)
MAX_FOLDED_X = 1024

_P = 1024  # particles per program
_RC = 512  # folded-row chunk per MXU pass


def _pads(shape4):
    T, Z, Y, X = shape4
    W = min(TIME_WINDOW, T)
    R = W * Z * Y
    Rp = -(-R // 8) * 8
    Xp = -(-X // 128) * 128
    return W, R, Rp, Xp


def fits_fast_path(shape4) -> bool:
    """Static check: can this field's windowed fold live in VMEM?"""
    _, _, Rp, Xp = _pads(shape4)
    return Rp * Xp <= MAX_FOLDED_ELEMS and Xp <= MAX_FOLDED_X


def _hat(delta):
    return jnp.maximum(0.0, 1.0 - jnp.abs(delta))


def _sample_kernel(f2_ref, pt_ref, pz_ref, py_ref, px_ref, out_ref, *, Z, Y):
    """One program: _P particles against the VMEM-resident folded window.

    Particle-as-lane orientation: positions are (1, _P) rows, weights
    (rc, _P), accumulator (Xp, _P) — a (n, 1) input layout would be padded
    128x in HBM by the (8, 128) tiling.
    """
    Rp = f2_ref.shape[0]
    Xp = f2_ref.shape[1]

    post = pt_ref[0]  # (1, P); broadcasts against (rc, P) weight tiles
    posz = pz_ref[0]
    posy = py_ref[0]
    posx = px_ref[0]

    zy = float(Z * Y)
    yf = float(Y)

    g = jnp.zeros((Xp, _P), dtype=jnp.float32)
    for r0 in range(0, Rp, _RC):
        rc = min(_RC, Rp - r0)
        # iota-derived (t, z, y) coordinates per folded row, shape (rc, 1)
        r = jax.lax.broadcasted_iota(jnp.int32, (rc, 1), 0).astype(jnp.float32) + float(r0)
        t_of_r = jnp.floor(r / zy)
        rem = r - t_of_r * zy
        z_of_r = jnp.floor(rem / yf)
        y_of_r = rem - z_of_r * yf

        w = _hat(t_of_r - post)
        w = w * _hat(z_of_r - posz)
        w = w * _hat(y_of_r - posy)

        g = g + jax.lax.dot_general(
            f2_ref[pl.ds(r0, rc), :],
            w,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    c = jax.lax.broadcasted_iota(jnp.int32, (Xp, 1), 0).astype(jnp.float32)
    wx = _hat(c - posx)
    out_ref[0] = jnp.sum(g * wx, axis=0, keepdims=True)


def _pallas_sample(f2, post, posz, posy, posx, Z, Y):
    n = post.shape[0]
    npad = -(-n // _P) * _P
    pad = npad - n
    G = npad // _P

    def prep(p):
        p = jnp.asarray(p, jnp.float32)
        if pad:
            p = jnp.concatenate([p, jnp.full((pad,), -10.0, jnp.float32)])
        return p.reshape(G, 1, _P)

    pt, pz, py, px = prep(post), prep(posz), prep(posy), prep(posx)
    Rp, Xp = f2.shape

    pos_spec = pl.BlockSpec((1, 1, _P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_sample_kernel, Z=Z, Y=Y),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((Rp, Xp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pos_spec,
            pos_spec,
            pos_spec,
            pos_spec,
        ],
        out_specs=pl.BlockSpec((1, 1, _P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 1, _P), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * npad * Rp * Xp, bytes_accessed=npad * 24 + Rp * Xp * 4, transcendentals=0
        ),
        # CI coverage: the CPU suite exercises this exact kernel in Pallas
        # interpret mode (as tests/test_binned_sample.py already does for
        # the slab sampler) when the fast path is forced on via
        # PARCELS_TPU_FORCE_PALLAS_INTERPRET.
        interpret=jax.default_backend() in ("cpu",),
    )(f2, pt, pz, py, px)
    return out.reshape(-1)[:n]


#: below this folded size, the hat-weight contraction runs as one plain-XLA
#: matmul over the whole particle batch — per-program Pallas overhead would
#: dominate (measured: 2048 programs x ~5us beats the arithmetic by 100x)
import os as _os

SMALL_FOLD_ELEMS = int(_os.environ.get("PARCELS_TPU_SMALL_FOLD", 64 * 512))


#: at or below this fold size the contraction unrolls to pure elementwise
#: fused multiply-adds (weights per folded row are compile-time constants)
UNROLL_FOLD_ELEMS = 256


def _xla_small_sample(f2, post, posz, posy, posx, Z, Y):
    """Hat-weight contraction in plain XLA over the whole particle batch.

    Tiny folds unroll completely: every folded-row coordinate is a static
    constant, so the sample is ~R*X fused multiply-adds per lane — one
    elementwise kernel, no dot, near-zero compile cost. Mid-size folds use
    one (N, R) @ (R, X) matmul.
    """
    R, X = f2.shape
    zy = float(Z * Y)

    if R * X <= UNROLL_FOLD_ELEMS:
        # per-axis hat factors, each unique coordinate computed once
        izy = Z * Y
        wt = {v: _hat(float(v) - post) for v in range(R // izy + 1)}
        wz = {v: _hat(float(v) - posz) for v in range(Z)}
        wy = {v: _hat(float(v) - posy) for v in range(Y)}
        wx = {c: _hat(float(c) - posx) for c in range(X)}
        val = jnp.zeros_like(post)
        for r in range(R):
            wrow = wt[r // izy] * wz[(r % izy) // Y] * wy[r % Y]
            for c in range(X):
                val = val + wrow * wx[c] * f2[r, c]
        return val

    r = jnp.arange(R, dtype=jnp.float32)
    t_of_r = jnp.floor(r / zy)
    rem = r - t_of_r * zy
    z_of_r = jnp.floor(rem / float(Y))
    y_of_r = rem - z_of_r * float(Y)
    w = (
        _hat(t_of_r[None, :] - post[:, None])
        * _hat(z_of_r[None, :] - posz[:, None])
        * _hat(y_of_r[None, :] - posy[:, None])
    )
    g = jnp.dot(w, f2, preferred_element_type=jnp.float32)  # (N, X)
    c = jnp.arange(X, dtype=jnp.float32)
    wxm = _hat(c[None, :] - posx[:, None])
    return jnp.sum(g * wxm, axis=1)


def _window_sample(data, gpos, W, ti0):
    """Hat contraction against the W-level window starting at ti0."""
    T, Z, Y, X = data.shape
    R = W * Z * Y
    Rp = -(-R // 8) * 8
    Xp = -(-X // 128) * 128
    post, posz, posy, posx = positions_from_gpos(gpos, data.shape)
    win = jax.lax.dynamic_slice(data, (ti0, 0, 0, 0), (W, Z, Y, X))
    post_w = post - ti0.astype(jnp.float32) if T > 1 else post
    if R * X <= SMALL_FOLD_ELEMS:
        f2 = win.reshape(R, X).astype(jnp.float32)
        return _xla_small_sample(
            f2, jnp.asarray(post_w, jnp.float32), jnp.asarray(posz, jnp.float32),
            jnp.asarray(posy, jnp.float32), jnp.asarray(posx, jnp.float32), Z, Y,
        )
    f2 = jnp.pad(win.reshape(R, X).astype(jnp.float32), ((0, Rp - R), (0, Xp - X)))
    return _pallas_sample(f2, post_w, posz, posy, posx, Z, Y)


def max_lockstep_window(shape4) -> int:
    """Largest time-window W whose fold still fits the VMEM budget."""
    T, Z, Y, X = shape4
    Xp = -(-X // 128) * 128
    if Xp > MAX_FOLDED_X:
        return 0
    per_level = max(Z * Y, 1)
    w = MAX_FOLDED_ELEMS // (per_level * Xp)
    return max(0, min(w, T))


def linear_sample_windowed(data, gpos, fallback):
    """Multilinear field sample via the windowed hat-weight contraction.

    ``data`` is the full (T, Z, Y, X) device array; ``gpos`` the search
    result; ``fallback`` a thunk computing the same values via the XLA
    gather path. Small folds run as one whole-batch XLA matmul; larger
    VMEM-resident folds run the Pallas kernel.

    Two time-divergence regimes:

    - **lockstep** (``gpos["_lockstep"] = W``, set by the engine when the
      host proved this chunk's *evaluated* lanes always bracket within a
      W-level window): the window anchors at the eval-masked minimum time
      index and the sample is cond-free. Lanes outside the evaluation mask
      may fall outside the window; their hat weights are zero, producing
      0-values that the masked kernel-state merges discard — exactly the
      lanes whose values are never used. Removing the per-sample
      ``lax.cond`` this way cut RK4 step time 5.7x on v5e (the cond's
      branch operands defeat XLA fusion).
    - **general** (host eval, RK45 per-lane dt, or spread releases): the
      TIME_WINDOW window with a cond falling back to the exact gather path
      when any lane brackets outside it.
    """
    T, Z, Y, X = data.shape
    W, R, Rp, Xp = _pads(data.shape)

    WL = gpos.get("_lockstep", 0)
    mask = gpos.get("mask")
    if WL and mask is not None and T > 1:
        WL = min(WL, T)
        ti = gpos["T"]["index"]
        ti_sel = jnp.where(mask, ti, jnp.int32(T - 1))
        ti0 = jnp.clip(jnp.min(ti_sel), 0, max(T - WL, 0)).astype(jnp.int32)
        return _window_sample(data, gpos, WL, ti0)

    post = positions_from_gpos(gpos, data.shape)[0]
    ti0 = jnp.clip(jnp.min(gpos["T"]["index"]), 0, max(T - W, 0)).astype(jnp.int32)

    if T <= W:
        return _window_sample(data, gpos, W, ti0)

    in_window = jnp.all(post - ti0.astype(jnp.float32) <= W - 1)
    return jax.lax.cond(
        in_window, lambda _: _window_sample(data, gpos, W, ti0), lambda _: fallback(), None
    )


def positions_from_gpos(gpos, shape4):
    """Fractional positions (index + bcoord per axis) from a search result.

    Axes whose data extent is 1 pin the position to 0 (no blend), matching
    the reference's lenT/lenZ == 1 semantics. Out-of-range positions get
    zero hat weight; the caller zeroes out-of-bounds samples anyway
    (reference field.py:359-370).
    """
    T, Z, Y, X = shape4

    def pos(axis, dim):
        idx = gpos[axis]["index"].astype(jnp.float32)
        bc = gpos[axis]["bcoord"].astype(jnp.float32)
        if dim == 1:
            return jnp.zeros_like(idx)
        return idx + bc

    return pos("T", T), pos("Z", Z), pos("Y", Y), pos("X", X)
