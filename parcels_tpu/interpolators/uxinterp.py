"""Unstructured-grid interpolators (reference interpolators/_uxinterpolators.py).

Four placement combinations, {face, node} lateral x {zc centers, zf
interfaces} vertical, plus the Ux_Velocity vector wrapper. All are traced
jnp gathers over the dense (T, Zdata, N) device arrays — the lateral axis N
is n_face or n_node and the vertical data axis is layer centers (nz-1) or
interfaces (nz) respectively.
"""

from __future__ import annotations

import jax.numpy as jnp

from parcels_tpu.interpolators._base import ScalarInterpolator, VectorInterpolator

__all__ = [
    "UxConstantFaceConstantZC",
    "UxConstantFaceLinearZF",
    "UxLinearNodeConstantZC",
    "UxLinearNodeLinearZF",
    "Ux_Velocity",
]


def _tlevels(gpos, T):
    ti = jnp.clip(gpos["T"]["index"], 0, T - 1)
    tau = gpos["T"]["bcoord"]
    if T == 1:
        return ((ti, None),)
    return ((ti, 1 - tau), (jnp.clip(ti + 1, 0, T - 1), tau))


def _gather_zn(data, ti, zi, ni):
    """data[(T),Z,N] gather at per-particle (ti, zi, ni)."""
    T, Z, N = data.shape
    flat = data.reshape(-1)
    idx = (ti * Z + zi) * N + ni
    return flat[idx]


def _face_sample(data, gpos, zi):
    T = data.shape[0]
    fi = jnp.clip(gpos["FACE"]["index"], 0, data.shape[2] - 1)
    val = None
    for tl, wt in _tlevels(gpos, T):
        v = _gather_zn(data, tl, zi, fi)
        if wt is not None:
            v = v * wt
        val = v if val is None else val + v
    return val


def _node_sample(data, gpos, conn, zi):
    T = data.shape[0]
    bc = gpos["FACE"]["bcoord"]  # (n, 3)
    fi = jnp.clip(gpos["FACE"]["index"], 0, conn.shape[0] - 1)
    nids = conn[fi]  # (n, 3)
    val = None
    for tl, wt in _tlevels(gpos, T):
        v = (
            _gather_zn(data, tl, zi, nids[:, 0]) * bc[:, 0]
            + _gather_zn(data, tl, zi, nids[:, 1]) * bc[:, 1]
            + _gather_zn(data, tl, zi, nids[:, 2]) * bc[:, 2]
        )
        if wt is not None:
            v = v * wt
        val = v if val is None else val + v
    return val


def _linear_zf(sample_at, ppos, gpos, depth):
    """Linear vertical blend between interface levels zi and zi+1
    (reference _uxinterpolators.py:66-83)."""
    nz = depth.shape[0]
    zi = jnp.clip(gpos["Z"]["index"], 0, nz - 2)
    z = ppos["z"]
    zk = depth[zi]
    zkp1 = depth[jnp.clip(zi + 1, 0, nz - 1)]
    fzk = sample_at(zi)
    fzkp1 = sample_at(jnp.clip(zi + 1, 0, nz - 1))
    denom = jnp.where(zkp1 == zk, 1.0, zkp1 - zk)
    return (fzk * (zkp1 - z) + fzkp1 * (z - zk)) / denom


class UxConstantFaceConstantZC(ScalarInterpolator):
    """Piecewise-constant: face-registered, layer-center vertical."""

    def interp(self, ppos, gpos, field):
        zi = jnp.clip(gpos["Z"]["index"], 0, field.data.shape[1] - 1)
        return _face_sample(field.data, gpos, zi)


class UxConstantFaceLinearZF(ScalarInterpolator):
    """Face-registered laterally, linear between zf interfaces vertically."""

    def interp(self, ppos, gpos, field):
        depth = field.grid.garrs["depth"]
        return _linear_zf(lambda zk: _face_sample(field.data, gpos, zk), ppos, gpos, depth)


class UxLinearNodeConstantZC(ScalarInterpolator):
    """Barycentric lateral (node-registered), layer-center vertical."""

    def interp(self, ppos, gpos, field):
        conn = field.grid.garrs["conn"]
        zi = jnp.clip(gpos["Z"]["index"], 0, field.data.shape[1] - 1)
        return _node_sample(field.data, gpos, conn, zi)


class UxLinearNodeLinearZF(ScalarInterpolator):
    """Barycentric lateral, linear between zf interfaces vertically."""

    def interp(self, ppos, gpos, field):
        conn = field.grid.garrs["conn"]
        depth = field.grid.garrs["depth"]
        return _linear_zf(
            lambda zk: _node_sample(field.data, gpos, conn, zk), ppos, gpos, depth
        )


class Ux_Velocity(VectorInterpolator):  # noqa: N801
    """Velocity on a UxGrid; spherical meshes convert m/s to deg/s
    (reference _uxinterpolators.py:163-181)."""

    def interp(self, ppos, gpos, vf):
        u = vf.U.interp_method.interp(ppos, gpos, vf.U)
        v = vf.V.interp_method.interp(ppos, gpos, vf.V)
        if vf.grid.spec.spherical:
            deg2m = vf.grid.spec.deg2m
            u = u / (deg2m * jnp.cos(jnp.deg2rad(ppos["y"])))
            v = v / deg2m
        if vf.W is not None:
            w = vf.W.interp_method.interp(ppos, gpos, vf.W)
        else:
            w = jnp.zeros_like(u)
        return u, v, w
