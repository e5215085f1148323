"""Corner-column sampler: row-gather multilinear interpolation at HBM scale.

The third sampling tier, between the VMEM hat-weight fold
(ops/interp_kernels.py — windowed field fits on-chip) / the binned slab
sampler (ops/binned_sample.py — engine-sorted dense batches) and the XLA
16-corner scalar gather (reference hot path, _xinterpolators.py:25-75).

Why. XLA scalar gathers on TPU are per-element instruction-bound:
measured 4.8 M multilinear samples/s at the config-5 shape
(2,50,1500,2000) regardless of lane order (scripts/micro_colgather.py).
But an ``(n, C)`` ROW gather (``jnp.take(table, idx, axis=0)``) moves
``C*4`` contiguous bytes per gathered index — for C = T*Z = 100 that is
400 B, matching the 512 B HBM granule that ANY access to this row costs.
Laying the field out as one contiguous (time x depth) column per (y, x)
node makes a full trilinear+time sample FOUR row gathers plus a cheap VPU
hat-weight reduce over the row:

    v = sum_corners w_yx(c) * sum_j hat(t_j - pt) * hat(z_j - pz) * row_c[j]

Measured on v5e at the config-5 shape / 10M lanes: 34 M samples/s —
7x the scalar-gather path — *independent of lane order*, so it needs no
engine sorting and covers the sparse regime where the binned sampler's
bin-population feasibility fails (exactly where BASELINE config 5 lives).

Axes that do not blend (the C-grid face-flux samples pin z and one of
y/x, xinterp.py:331-370) drop their +1 corners, so a C-grid face sample
is 2 row gathers and a pure z/t column sample (W) is 1.

The (Y*X, T*Z) table is a pure transpose of the field, built inside the
executor trace (outside the engine while-loop, so XLA hoists it: one
~2x-field-bytes pass per chunk call, amortized over the chunk's steps) and
cached per FieldView so every RK stage and kernel in a trace shares it.
``optimization_barrier`` pins the materialization — otherwise XLA fuses
the transpose INTO each gather and the row reads degrade back to scattered
element reads.

Reference semantics preserved: per-axis linear blend with clipped upper
index (reference interpolators/_xinterpolators.py:112-153); degenerate
(len-1) axes pinned; out-of-bounds masking stays in field.py
``_mask_oob_values``. Like the binned sampler, blend weights are hat
weights (clamped to [0, 1] at the row ends); sentinel-free in-bounds
bcoords always lie in [0, 1) so the clamp only touches lanes that are
masked afterwards anyway.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = ["colgather_enabled", "colgather_sample", "colgather_table", "colgather_usable"]

#: row length (T*Z floats) beyond which rows stop resembling HBM granules
#: and the wasted-bytes factor outweighs the instruction savings
MAX_COLS = int(os.environ.get("PARCELS_TPU_COLGATHER_MAXCOLS", 512))

#: below this many (y, x) nodes the field is VMEM-foldable anyway
MIN_NODES = int(os.environ.get("PARCELS_TPU_COLGATHER_MINNODES", 1 << 14))


def colgather_usable(shape4) -> bool:
    """Static shape gate for the corner-column layout."""
    T, Z, Y, X = shape4
    return 2 <= T * Z <= MAX_COLS and Y * X >= MIN_NODES


def _mode() -> str:
    return os.environ.get("PARCELS_TPU_COLGATHER", "auto")


def colgather_enabled(shape4, gpos) -> bool:
    """Trace-time dispatch gate (see xinterp._linear_sample ordering)."""
    mode = _mode()
    if mode in ("0", "off"):
        return False
    if not colgather_usable(shape4):
        return False
    if mode == "force":
        return True
    return jax.default_backend() not in ("cpu",)


def colgather_table(data):
    """(T, Z, Y, X) -> materialized (Y*X, T*Z) corner-column table."""
    T, Z, Y, X = data.shape
    table = jnp.moveaxis(data.reshape(T * Z, Y * X), 0, -1)
    # pin the materialization: fused into the gathers, the "row" reads
    # would be scattered original-layout element reads again
    return jax.lax.optimization_barrier(table)


def colgather_sample(data, gpos, blend=(True, True, True, True), table=None):
    """Multilinear sample via corner-row gathers; matches the gather path.

    ``table`` is the cached ``colgather_table(data)`` (FieldView.col_table);
    built on the spot when absent (XLA CSE merges duplicates in a trace).
    """
    T, Z, Y, X = data.shape
    if table is None:
        table = colgather_table(data)

    def frac(axis_key, dim, do_blend):
        idx = gpos[axis_key]["index"].astype(jnp.int32)
        bc = gpos[axis_key]["bcoord"].astype(jnp.float32)
        if dim == 1:
            return jnp.zeros_like(bc)
        if not do_blend:
            return jnp.clip(idx, 0, dim - 1).astype(jnp.float32)
        return jnp.clip(idx, 0, dim - 2).astype(jnp.float32) + bc

    pt = frac("T", T, blend[0])
    pz = frac("Z", Z, blend[1])

    j = jax.lax.broadcasted_iota(jnp.int32, (1, T * Z), 1)
    tj = (j // Z).astype(jnp.float32)
    zj = (j % Z).astype(jnp.float32)
    wrow = jnp.maximum(0.0, 1.0 - jnp.abs(tj - pt[:, None])) * jnp.maximum(
        0.0, 1.0 - jnp.abs(zj - pz[:, None])
    )  # (n, T*Z)

    def corners(axis_key, dim, do_blend):
        idx = gpos[axis_key]["index"].astype(jnp.int32)
        bc = gpos[axis_key]["bcoord"].astype(jnp.float32)
        if dim == 1 or not do_blend:
            return [(jnp.clip(idx, 0, dim - 1), None)]
        i0 = jnp.clip(idx, 0, dim - 1)
        i1 = jnp.clip(idx + 1, 0, dim - 1)
        return [(i0, 1.0 - bc), (i1, bc)]

    val = None
    for yi, wy in corners("Y", Y, blend[2]):
        for xi, wx in corners("X", X, blend[3]):
            rows = jnp.take(table, yi * X + xi, axis=0)  # (n, T*Z)
            v = jnp.sum(rows * wrow, axis=1)
            for w in (wy, wx):
                if w is not None:
                    v = v * w
            val = v if val is None else val + v
    return val
