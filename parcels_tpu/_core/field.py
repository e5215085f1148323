"""Field / VectorField: host containers + traced sampling views.

Host side (``Field``/``VectorField``) wraps the ingested numpy 4-D data and
its grid; device side (``FieldView``/``VectorFieldView``) is a lightweight
struct rebuilt inside the jitted step from the static fieldset spec plus the
traced array pytree. Sampling semantics mirror reference
src/parcels/_core/field.py:145-403: search -> ei cache -> state escalation ->
interpolate -> NaN state -> zero out-of-bounds samples.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from parcels_tpu._core import index_search
from parcels_tpu._core.grid import XGrid, grid_search
from parcels_tpu._core.particles_view import Particles
from parcels_tpu._core.statuscodes import StatusCode

__all__ = ["Field", "FieldView", "GridView", "VectorField", "VectorFieldView"]


class Field:
    """Host-side scalar field: name + dense numpy data + grid + interpolator.

    Data layout is (T, Z, Y, X) on structured grids and (T, Z, N) on
    unstructured grids (N = n_face or n_node).
    """

    def __init__(self, name: str, data: np.ndarray, grid: XGrid, interp_method=None):
        if not name.isidentifier():
            raise ValueError(f"Field name must be a valid identifier, got {name!r}")
        self.name = name
        if not getattr(data, "_parcels_lazy", False):
            data = np.asarray(data)
        if data.ndim not in (3, 4):
            raise ValueError(
                f"Field data must be (T, Z, Y, X) or unstructured (T, Z, N); got shape {data.shape}"
            )
        self.data = data
        self.grid = grid
        self.interp_method = interp_method
        self.igrid = -1  # assigned by FieldSet
        self._fieldset = None  # back-pointer + registered name, set by add_field
        self._registered_name = name

    @property
    def time_interval(self):
        if self.data.shape[0] <= 1:
            return None
        return self.grid.time_interval

    def eval(self, t, z, y, x, particles=None):
        """Host-side interactive sampling (reference field.py:145-185).

        Delegates to the owning FieldSet's jitted view path; ``particles``
        is accepted for kernel-signature compatibility and ignored.
        """
        if self._fieldset is None:
            raise ValueError(f"Field {self.name!r} is not part of a FieldSet")
        return self._fieldset.eval(self._registered_name, t, z, y, x)

    def __getitem__(self, key):
        """``field[particles]`` / ``field[t, z, y, x]`` sugar
        (reference field.py:187-196)."""
        if hasattr(key, "x") and hasattr(key, "t"):
            return self.eval(key.t, key.z, key.y, key.x, key)
        return self.eval(*key)

    def __repr__(self):
        return f"Field(name={self.name!r}, shape={self.data.shape})"

    def _repr_sections(self):
        interp = type(self.interp_method).__name__ if self.interp_method else "-"
        return [
            (
                "attributes",
                [
                    f"name: {self.name!r}",
                    f"shape: {tuple(self.data.shape)}  dtype: {self.data.dtype}",
                    f"interp_method: {interp}",
                    f"grid: {self.grid!r}",
                ],
            )
        ]

    def _repr_html_(self):
        from parcels_tpu._repr import html_sections

        return html_sections(f"Field {self.name!r}", self._repr_sections())


class VectorField:
    """Host-side vector field referencing 2-3 component Fields."""

    def __init__(self, name: str, U: Field, V: Field, W: Field | None = None, interp_method=None):
        if interp_method is None:
            raise ValueError("interp_method must be provided for VectorField initialization.")
        self.name = name
        self.U = U
        self.V = V
        self.W = W
        self.grid = U.grid
        self.interp_method = interp_method
        self.vector_type = "3D" if W is not None else "2D"
        self._fieldset = None
        self._registered_name = name

    def eval(self, t, z, y, x, particles=None):
        """Host-side interactive sampling (reference field.py:250-295)."""
        if self._fieldset is None:
            raise ValueError(f"VectorField {self.name!r} is not part of a FieldSet")
        return self._fieldset.eval(self._registered_name, t, z, y, x)

    def __getitem__(self, key):
        """``vf[particles]`` / ``vf[t, z, y, x]`` sugar (reference field.py:296-304)."""
        if hasattr(key, "x") and hasattr(key, "t"):
            return self.eval(key.t, key.z, key.y, key.x, key)
        return self.eval(*key)

    @property
    def igrid(self):
        return self.U.igrid

    @property
    def time_interval(self):
        return self.U.time_interval

    def __repr__(self):
        return f"VectorField(name={self.name!r}, {self.vector_type})"

    def _repr_sections(self):
        comps = [repr(c) for c in (self.U, self.V, self.W) if c is not None]
        interp = type(self.interp_method).__name__ if self.interp_method else "-"
        return [
            ("attributes", [f"name: {self.name!r}", f"vector_type: {self.vector_type}",
                            f"interp_method: {interp}"]),
            ("components", comps),
        ]

    def _repr_html_(self):
        from parcels_tpu._repr import html_sections

        return html_sections(f"VectorField {self.name!r}", self._repr_sections())


# ---------------------------------------------------------------------------
# Traced views (exist only inside the jitted step)
# ---------------------------------------------------------------------------


class GridView:
    __slots__ = ("spec", "garrs", "lookup_meta")

    def __init__(self, spec, garrs, lookup_meta):
        self.spec = spec
        self.garrs = garrs
        self.lookup_meta = lookup_meta

    def search(self, z, y, x, ei=None):
        return grid_search(self.spec, self.garrs, z, y, x, ei, self.lookup_meta)


class FieldView:
    __slots__ = (
        "name", "data", "grid", "igrid", "interp_method", "has_time",
        "_col_table", "_colT_table",
    )

    def __init__(self, name, data, grid: GridView, igrid, interp_method, has_time):
        self.name = name
        self.data = data
        self.grid = grid
        self.igrid = igrid
        self.interp_method = interp_method
        self.has_time = has_time
        self._col_table = None
        self._colT_table = None

    def col_table(self):
        """Cached (Y*X, T*Z) corner-column table (ops/colgather.py): one
        transpose per chunk trace, shared by every RK stage and kernel."""
        if self._col_table is None:
            from parcels_tpu.ops.colgather import colgather_table

            self._col_table = colgather_table(self.data)
        return self._col_table

    def eval(self, t, z, y, x, particles: Particles | None = None):
        ppos, gpos = _get_positions(self, t, z, y, x, particles)
        value = self.interp_method.interp(ppos, gpos, self)
        _update_state_interp_value(particles, value)
        return _mask_oob_values(gpos, value)

    def __getitem__(self, key):
        if isinstance(key, Particles):
            return self.eval(key.t, key.z, key.y, key.x, key)
        return self.eval(*key)


class VectorFieldView:
    __slots__ = (
        "name", "U", "V", "W", "grid", "igrid", "interp_method", "vector_type",
        "_stage_cache", "_sc_owner", "_cell_table", "_uv_colT",
    )

    def __init__(self, name, U, V, W, interp_method, sc_owner=False):
        self.name = name
        self.U = U
        self.V = V
        self.W = W
        self.grid = U.grid
        self.igrid = U.igrid
        self.interp_method = interp_method
        self.vector_type = "3D" if W is not None else "2D"
        # per-kernel-invocation cell cache (ops/stagecache.py); the engine
        # resets it before every kernel call
        self._stage_cache = None
        # is this view the designated owner of the persistent SoA cache
        # columns (stagecache.soa_cache_owner)? static per trace
        self._sc_owner = bool(sc_owner)
        # fused per-cell [pic | geometry] row table (stagecache.cell_table),
        # built once per chunk trace
        self._cell_table = None
        # fused [U | V] per-(node, time) z-row table (uxcol.ux_colT_uv_table)
        self._uv_colT = None

    def eval(self, t, z, y, x, particles: Particles | None = None):
        from parcels_tpu.ops import stagecache, uxcache

        if stagecache.enabled(self):
            return stagecache.cgrid_cached_eval(self, t, z, y, x, particles)
        if uxcache.enabled(self):
            return uxcache.ux_cached_eval(self, t, z, y, x, particles)
        ppos, gpos = _get_positions(self.U, t, z, y, x, particles)
        u, v, w = self.interp_method.interp(ppos, gpos, self)
        if particles is not None:
            # one combined NaN check -> one masked state write (not three)
            bad = jnp.isnan(u) | jnp.isnan(v)
            if w is not None and jnp.ndim(w) > 0:
                bad = bad | jnp.isnan(w)
            _escalate(particles, bad, StatusCode.ErrorInterpolation)
        u = _mask_oob_values(gpos, u)
        v = _mask_oob_values(gpos, v)
        w = _mask_oob_values(gpos, w)
        if self.vector_type == "3D":
            return (u, v, w)
        return (u, v)

    def __getitem__(self, key):
        if isinstance(key, Particles):
            return self.eval(key.t, key.z, key.y, key.x, key)
        return self.eval(*key)


# ---------------------------------------------------------------------------
# sampling plumbing (traced)
# ---------------------------------------------------------------------------


def _get_positions(field: FieldView, t, z, y, x, particles: Particles | None):
    """Search time + grid, cache ei, escalate particle states (reference field.py:394-403)."""
    spec = field.grid.spec
    garrs = field.grid.garrs
    t = jnp.asarray(t)
    z = jnp.asarray(z)
    y = jnp.asarray(y)
    x = jnp.asarray(x)

    if field.has_time:
        ti, tau, t_oob = index_search.search_time(garrs["time"], t, spec.time_uniform)
    else:
        ti = jnp.zeros(jnp.shape(t), dtype=jnp.int32)
        tau = jnp.zeros(jnp.shape(t), dtype=t.dtype)
        t_oob = None

    ei = particles._get_ei(field.igrid) if particles is not None else None
    gpos = field.grid.search(z, y, x, ei=ei)
    gpos["T"] = {"index": ti, "bcoord": tau}
    # static hint: SoA is engine-sorted -> binned slab sampler applies
    gpos["_sorted"] = bool(particles is not None and getattr(particles, "_sorted_hint", False))
    # static hint: quantized occupied-z fraction (binned-sampler planning)
    gpos["_z_occ"] = getattr(particles, "_z_occ_hint", None)
    # static hint: evaluated lanes bracket within this many time levels ->
    # cond-free windowed sampling (interp_kernels.linear_sample_windowed)
    gpos["_lockstep"] = int(getattr(particles, "_lockstep_hint", 0) or 0)
    if particles is not None:
        # evaluation mask: lanes whose sampled values are actually merged
        gpos["mask"] = particles._mask
        if "_active" in particles._data:
            # lane-activity mask: the binned sampler skips all-inactive
            # chunks (capacity padding sorts to the tail) and drops dead
            # lanes from its overflow budget
            gpos["active"] = particles._data["_active"]

    if particles is not None:
        _update_particles_ei(particles, gpos, field)
        _update_state_position(particles, gpos, t_oob)

    ppos = {"t": t, "z": z, "y": y, "x": x}
    return ppos, gpos


def _update_particles_ei(particles: Particles, gpos, field: FieldView):
    spec = field.grid.spec
    if "FACE" in gpos:
        # unstructured: ei caches the face index (z re-bracketed per eval)
        fi = jnp.clip(gpos["FACE"]["index"], 0, spec.n_face - 1)
        particles._set_ei(field.igrid, fi)
        return
    if _ei_cache_pointless(spec, field):
        return
    ydim = max(spec.ydim, 1)
    xdim = max(spec.xdim, 1)
    zi = jnp.clip(gpos["Z"]["index"], 0, max(spec.zdim - 1, 0))
    yi = jnp.clip(gpos["Y"]["index"], 0, max(spec.ydim - 1, 0))
    xi = jnp.clip(gpos["X"]["index"], 0, max(spec.xdim - 1, 0))
    ei = (zi * ydim + yi) * xdim + xi
    particles._set_ei(field.igrid, ei)


def _ei_cache_pointless(spec, field: FieldView) -> bool:
    """True when the warm-start/sort-key ei cache buys nothing for this grid:
    uniform rectilinear axes make the search O(1) arithmetic, and a VMEM-fold
    field never enters the binned sampler. Skipping the per-sample (n, 1)
    dynamic_update_slice removes ~15% of small-field step time (trace:
    dynamic_update_slice was the #2 device cost)."""
    from parcels_tpu.ops.interp_kernels import fits_fast_path

    return (
        not spec.curvilinear
        and spec.lon_uniform is not None
        and spec.lat_uniform is not None
        and (spec.zdim <= 1 or spec.depth_uniform is not None)
        and fits_fast_path(field.data.shape)
    )


def _escalate(particles: Particles, cond, code):
    """Max-merge a status code into particle states where ``cond`` holds."""
    particles.state = jnp.maximum(
        particles.state, jnp.where(cond, jnp.int32(code), jnp.int32(0))
    )


def _update_state_position(particles: Particles, gpos, t_oob):
    """State escalation from search sentinels (reference field.py:327-357).

    All sentinel conditions merge into ONE masked state write: each write
    through the view costs a full (n,) where-merge pass, so batching the
    5-6 escalations into a single maximum keeps this at one pass.
    """
    esc = jnp.int32(0)

    def mark(cond, code):
        nonlocal esc
        esc = jnp.maximum(esc, jnp.where(cond, jnp.int32(code), jnp.int32(0)))

    for dim in ("X", "Y", "FACE"):
        if dim not in gpos:
            continue
        idx = gpos[dim]["index"]
        mark(idx == index_search.RIGHT_OUT_OF_BOUNDS, StatusCode.ErrorOutOfBounds)
        mark(idx == index_search.GRID_SEARCH_ERROR, StatusCode.ErrorGridSearching)
    zidx = gpos["Z"]["index"]
    mark(zidx == index_search.RIGHT_OUT_OF_BOUNDS, StatusCode.ErrorOutOfBounds)
    mark(zidx == index_search.LEFT_OUT_OF_BOUNDS, StatusCode.ErrorThroughSurface)
    if t_oob is not None:
        mark(t_oob, StatusCode.ErrorOutsideTimeInterval)
    particles.state = jnp.maximum(particles.state, esc)


def _update_state_interp_value(particles: Particles | None, value):
    if particles is not None:
        _escalate(particles, jnp.isnan(value), StatusCode.ErrorInterpolation)


def _mask_oob_values(gpos, value):
    """Out-of-bounds samples are returned as 0 (reference field.py:359-370)."""
    mask = jnp.zeros(jnp.shape(value), dtype=bool)
    for dim in ("X", "Y", "Z", "FACE"):
        if dim in gpos:
            mask = mask | (gpos[dim]["index"] < 0)
    return jnp.where(mask, jnp.zeros((), dtype=value.dtype), value)
