"""2-D (Y x X) tile domain decomposition (SURVEY §2.2 "lat/lon tiles per
chip with halo exchange"; round-5 VERDICT task 8).

Prototype extending the Y-band design (parallel/domain.py) to a
``(tiles_y, tiles_x)`` grid of rectangular tiles over RECTILINEAR grids:
at >= 8 devices on a 2:1-aspect global grid, thin Y-bands inflate the
halo fraction — square-ish tiles keep it ~sqrt(n_devices) lower.

Design choices (all inherited from the proven band machinery):
- Each tile's slab is its owned cell rows/cols plus ``halo`` cells on
  every side (corner halos come free: the slab is a rectangle in index
  space, so the corner cells are included by construction).
- Tiles are flattened onto a 1-D device mesh axis ("tiles", row-major);
  the particle SoA is grouped by owning tile with equal per-tile lane
  capacity, and the whole chunk runs as one jitted ``shard_map``.
- Migration is ownership-routed ``lax.all_to_all`` direct delivery
  (domain._exchange_all2all): a diagonal crosser reaches its corner
  neighbor in ONE exchange — no two-phase Y-then-X hop.
- The halo diagnostic mirrors the band path: a lane landing beyond its
  tile's halo-extended slab in one step had its samples clamped; the
  host raises the actionable increase-halo message, never silently.

Out of scope for the prototype (YBandDomain covers them in 1-D):
curvilinear index-space tiling, windowed streaming, rebalancing.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from parcels_tpu._core.engine import compute_loop_masks, engine_step
from parcels_tpu._core.statuscodes import MIN_ERROR_CODE, StatusCode
from parcels_tpu.parallel.domain import _exchange_all2all

__all__ = ["XYTileDomain", "build_tile_executor"]


class XYTileDomain:
    """A (tiles_y, tiles_x) rectangular tile decomposition.

    Parameters mirror :class:`YBandDomain`; ``tiles`` is the (ty, tx)
    grid, ``ty * tx`` devices are used row-major.
    """

    def __init__(
        self,
        fieldset,
        tiles: tuple[int, int],
        halo: int = 2,
        devices=None,
        headroom: float = 2.0,
        migration_capacity: int | None = None,
        axis: str = "tiles",
    ):
        ty, tx = (int(t) for t in tiles)
        if ty < 1 or tx < 1 or ty * tx < 2:
            raise ValueError(f"tiles must be a grid of >= 2 devices. Got {tiles}.")
        if devices is None:
            devices = jax.devices()[: ty * tx]
        if len(devices) != ty * tx:
            raise ValueError(f"need {ty * tx} devices for tiles={tiles}; got {len(devices)}")
        self.ty, self.tx = ty, tx
        self.n = ty * tx
        self.axis = axis
        self.mesh = Mesh(np.asarray(devices), (axis,))
        self.halo = int(halo)
        self.headroom = float(headroom)
        self.migration_capacity = migration_capacity
        self.fieldset = fieldset
        self.curvilinear = False  # prototype: rectilinear only
        self._stacked_cache = None
        self._build_plans()

    @property
    def migration_mode(self) -> str:
        return "all2all"

    # -- planning -------------------------------------------------------------
    def _build_plans(self):
        fieldset = self.fieldset
        h = self.halo
        ty, tx = self.ty, self.tx
        self._grid_plans: list[dict] = []
        main = None
        for grid in fieldset.gridset:
            spec = grid.spec
            axes = getattr(spec, "axes", ())
            ok = (
                "Y" in axes
                and "X" in axes
                and not getattr(spec, "curvilinear", False)
                and spec.ydim >= ty
                and spec.xdim >= tx
            )
            if not ok:
                self._grid_plans.append({"tiled": False, "grid": grid, "spec": spec})
                continue
            la = np.asarray(grid.lat, dtype=np.float64)
            lo = np.asarray(grid.lon, dtype=np.float64)
            ydim, xdim = spec.ydim, spec.xdim
            ry = math.ceil(ydim / ty) * np.arange(ty + 1, dtype=np.int64)
            rx = math.ceil(xdim / tx) * np.arange(tx + 1, dtype=np.int64)
            Yl = int(np.diff(ry).max()) + 2 * h
            Xl = int(np.diff(rx).max()) + 2 * h

            def ext_axis(nodes, starts, Ll, dim):
                extra = max(0, int(starts.max()) + (Ll - 2 * h) - dim)
                d0 = nodes[1] - nodes[0]
                dN = nodes[-1] - nodes[-2]
                lo_pad = nodes[0] - d0 * np.arange(h, 0, -1)
                hi_pad = nodes[-1] + dN * np.arange(1, extra + h + 1)
                return np.concatenate([lo_pad, nodes, hi_pad]), extra

            la_ext, extra_y = ext_axis(la, ry[:-1], Yl, ydim)
            lo_ext, extra_x = ext_axis(lo, rx[:-1], Xl, xdim)
            # ownership edges (node values at the interior cuts)
            ey = la_ext[h + np.minimum(ry, ydim + extra_y)]
            ex = lo_ext[h + np.minimum(rx, xdim + extra_x)]
            plan = {
                "tiled": True,
                "grid": grid,
                "spec": dataclasses.replace(
                    spec,
                    ydim=Yl,
                    xdim=Xl,
                    lat_uniform=None,
                    lon_uniform=None,
                    has_lookup=False,
                    y_oob_bounds=(float(la[0]), float(la[-1])),
                    x_oob_bounds=(float(lo[0]), float(lo[-1])),
                ),
                "ry": ry,
                "rx": rx,
                "Yl": Yl,
                "Xl": Xl,
                "pad_s": h,
                "pad_n": extra_y + h,
                "pad_w": h,
                "pad_e": extra_x + h,
                "lat_ext": la_ext,
                "lon_ext": lo_ext,
                # per-tile node slabs, tile-major (ty*tx, ...)
                "lat_slabs": np.stack(
                    [la_ext[s : s + Yl + 1] for s in ry[:-1] for _ in rx[:-1]]
                ).astype(np.float32),
                "lon_slabs": np.stack(
                    [lo_ext[s : s + Xl + 1] for _ in ry[:-1] for s in rx[:-1]]
                ).astype(np.float32),
                "ey": ey,
                "ex": ex,
            }
            self._grid_plans.append(plan)
            if main is None:
                main = plan
        if main is None:
            raise ValueError("FieldSet has no rectilinear grid tileable along Y and X.")
        self._main = main
        # interior ownership thresholds (y then x), -inf/+inf at the rims
        self._ey_int = main["ey"][1:-1].astype(np.float64)
        self._ex_int = main["ex"][1:-1].astype(np.float64)

    # -- device data ----------------------------------------------------------
    def _sharding(self, ndim: int) -> NamedSharding:
        return NamedSharding(self.mesh, P(*((self.axis,) + (None,) * (ndim - 1))))

    def _put(self, arr, ndim: int | None = None):
        sh = self._sharding(ndim if ndim is not None else np.ndim(arr))
        if jax.process_count() > 1:
            host = np.asarray(arr)
            return jax.make_array_from_callback(host.shape, sh, lambda idx: host[idx])
        return jax.device_put(jnp.asarray(arr), sh)

    def stacked_farrays(self) -> dict:
        if self._stacked_cache is not None:
            return self._stacked_cache
        if self.fieldset._time_window is not None:
            raise NotImplementedError(
                "XYTileDomain does not support windowed streaming yet; "
                "use YBandDomain for out-of-core runs."
            )
        n = self.n
        out = {"fields": {}, "grids": []}
        for plan in self._grid_plans:
            grid = plan["grid"]
            garrs = {k: np.asarray(v) for k, v in grid.device_arrays().items()}
            if plan["tiled"]:
                garrs["lat"] = plan["lat_slabs"]
                garrs["lon"] = plan["lon_slabs"]
                for k in list(garrs):
                    if k not in ("lat", "lon"):
                        garrs[k] = np.broadcast_to(garrs[k], (n,) + garrs[k].shape)
            else:
                garrs = {k: np.broadcast_to(v, (n,) + v.shape) for k, v in garrs.items()}
            out["grids"].append({k: self._put(v, v.ndim) for k, v in garrs.items()})
        from parcels_tpu._core.field import Field

        for name, f in self.fieldset.fields.items():
            if not isinstance(f, Field):
                continue
            plan = self._grid_plans[f.igrid]
            data = np.asarray(f.data, dtype=np.float32)
            if plan["tiled"]:
                ext = np.pad(
                    data,
                    (
                        (0, 0),
                        (0, 0),
                        (plan["pad_s"], plan["pad_n"]),
                        (plan["pad_w"], plan["pad_e"]),
                    ),
                    mode="edge",
                )
                Yl, Xl = plan["Yl"], plan["Xl"]
                slabs = np.stack(
                    [
                        ext[:, :, sy : sy + Yl, sx : sx + Xl]
                        for sy in plan["ry"][:-1]
                        for sx in plan["rx"][:-1]
                    ]
                )
            else:
                slabs = np.broadcast_to(data, (n,) + data.shape)
            out["fields"][name] = self._put(slabs, slabs.ndim)
        main = self._main
        # per-tile slab box (halo diagnostic), row-major
        out["halo_lo_y"] = self._put(main["lat_slabs"][:, 0].astype(np.float32), 1)
        out["halo_hi_y"] = self._put(main["lat_slabs"][:, -1].astype(np.float32), 1)
        out["halo_lo_x"] = self._put(main["lon_slabs"][:, 0].astype(np.float32), 1)
        out["halo_hi_x"] = self._put(main["lon_slabs"][:, -1].astype(np.float32), 1)
        # replicated interior ownership edges for all_to_all routing
        out["edges_y"] = self._put(
            np.broadcast_to(self._ey_int.astype(np.float32), (n, max(self.ty - 1, 1))).copy(), 2
        )
        out["edges_x"] = self._put(
            np.broadcast_to(self._ex_int.astype(np.float32), (n, max(self.tx - 1, 1))).copy(), 2
        )
        self._stacked_cache = out
        return out

    def stacked_windowed(self, t_lo, t_hi):
        return self.stacked_farrays()

    def prefetch_window(self, t_anchor) -> None:
        return None

    def build_views(self, farrays_local: dict):
        from parcels_tpu._core.field import Field, FieldView, GridView, VectorField, VectorFieldView
        from parcels_tpu._core.fieldset import FieldSetView

        grid_views = []
        for i, plan in enumerate(self._grid_plans):
            if plan["tiled"]:
                grid_views.append(GridView(plan["spec"], farrays_local["grids"][i], None))
            else:
                grid_views.append(plan["grid"].make_view(farrays_local["grids"][i]))
        views: dict[str, object] = {}
        for name, f in self.fieldset.fields.items():
            if isinstance(f, Field):
                views[name] = FieldView(
                    name,
                    farrays_local["fields"][name],
                    grid_views[f.igrid],
                    f.igrid,
                    f.interp_method,
                    f.data.shape[0] > 1,
                )
        for name, f in self.fieldset.fields.items():
            if isinstance(f, VectorField):
                views[name] = VectorFieldView(
                    name,
                    views[f.U.name],
                    views[f.V.name],
                    views[f.W.name] if f.W is not None else None,
                    f.interp_method,
                )
        return FieldSetView(views, dict(self.fieldset.context))

    # -- particle sharding ----------------------------------------------------
    def tile_of(self, y: np.ndarray, x: np.ndarray) -> np.ndarray:
        ry = np.searchsorted(self._ey_int, np.asarray(y), side="right")
        cx = np.searchsorted(self._ex_int, np.asarray(x), side="right")
        return (ry * self.tx + cx).astype(np.int64)

    band_of = tile_of  # duck-compat with YBandDomain consumers

    def lane_capacity(self, pdata: dict) -> int:
        act = np.asarray(pdata["_active"]).astype(bool)
        counts = np.bincount(
            self.tile_of(np.asarray(pdata["y"])[act], np.asarray(pdata["x"])[act]),
            minlength=self.n,
        )
        cap = max(int(counts.max() * self.headroom), 8)
        return -(-cap // 8) * 8

    def shard_soa(self, pdata: dict, lane_capacity: int | None = None) -> dict:
        L = lane_capacity or self.lane_capacity(pdata)
        n = self.n
        act = np.asarray(pdata["_active"]).astype(bool)
        idx_act = np.nonzero(act)[0]
        tile = self.tile_of(
            np.asarray(pdata["y"])[idx_act], np.asarray(pdata["x"])[idx_act]
        )
        order = idx_act[np.argsort(tile, kind="stable")]
        counts = np.bincount(tile, minlength=n)
        if counts.max() > L:
            raise ValueError(f"Tile occupancy {counts.max()} exceeds lane capacity {L}.")
        offs = np.concatenate([[0], np.cumsum(counts)])
        out = {}
        for k, v in pdata.items():
            v = np.asarray(v)
            if k == "_rng":
                keys = jax.random.split(
                    jax.random.wrap_key_data(jnp.asarray(v), impl="threefry2x32"), n
                )
                out[k] = self._put(np.asarray(jax.random.key_data(keys)), 2)
                continue
            buf = np.zeros((n * L,) + v.shape[1:], dtype=v.dtype)
            if k in ("particle_id", "_sc_key", "_uxc_key"):
                buf -= 1
            for b in range(n):
                rows = order[offs[b] : offs[b + 1]]
                buf[b * L : b * L + len(rows)] = v[rows]
            if k == "_active":
                for b in range(n):
                    buf[b * L + counts[b] : (b + 1) * L] = False
            out[k] = self._put(buf, buf.ndim)
        out["_migof"] = self._put(np.zeros(n, dtype=np.int32), 1)
        out["_haloof"] = self._put(np.zeros(n, dtype=np.int32), 1)
        return out


def _migrate_tiles(pd: dict, dom: XYTileDomain, axis: str, n_dev: int, cap: int, farrays):
    """Ownership-routed all_to_all over the flattened tile mesh.

    Destination tile = (row band of y) * tx + (col band of x); corner
    crossers route directly. Halo diagnostic: landing beyond the tile's
    halo-extended slab box means this step's samples were clamped."""
    dev = jax.lax.axis_index(axis)
    lo_y, hi_y = farrays["halo_lo_y"], farrays["halo_hi_y"]
    lo_x, hi_x = farrays["halo_lo_x"], farrays["halo_hi_x"]
    viol = (
        pd["_active"]
        & (pd["state"] < MIN_ERROR_CODE)
        & (
            (pd["y"] < lo_y)
            | (pd["y"] > hi_y)
            | (pd["x"] < lo_x)
            | (pd["x"] > hi_x)
        )
    )
    pd["_haloof"] = pd["_haloof"] + jnp.sum(viol).astype(jnp.int32)
    ry = jnp.searchsorted(farrays["edges_y"], pd["y"], side="right")
    cx = jnp.searchsorted(farrays["edges_x"], pd["x"], side="right")
    dest = (ry * dom.tx + cx).astype(jnp.int32)
    mover = pd["_active"] & (dest != dev)
    pd, of = _exchange_all2all(pd, mover, dest, axis, n_dev, cap, on_send=None)
    pd["_migof"] = pd["_migof"] + of
    return pd


def build_tile_executor(
    kernel_fns, dom: XYTileDomain, *, sign_dt: int, rk45_mode: bool, lockstep_w: int = 0
):
    """Compile the multi-device chunk executor for a 2-D tile decomposition
    (same call signature as engine.build_chunk_executor)."""
    kernel_fns = tuple(kernel_fns)
    axis = dom.axis
    n_dev = dom.n

    def chunk(farrays, pdata, endtime, dt0):
        endtime = jnp.asarray(endtime, dtype=pdata["t"].dtype)
        dt0 = jnp.asarray(dt0, dtype=pdata["dt"].dtype)
        lanes_local = pdata["state"].shape[0] // n_dev
        cap = dom.migration_capacity or max(lanes_local // 8, 64)
        cap = min(cap, lanes_local)

        def device_fn(farrays, pd):
            farrays = jax.tree_util.tree_map(lambda a: a[0], farrays)
            fsview = dom.build_views(farrays)
            from parcels_tpu.ops import stagecache as _sc_mod

            _sc_mod.prebuild_tables(fsview)
            pd = dict(pd)
            pd["_rng"] = pd["_rng"][0]
            pd["_migof"] = pd["_migof"][0]
            pd["_haloof"] = pd["_haloof"][0]
            st0 = pd["state"]
            pd["state"] = jnp.where(
                pd["_active"]
                & (st0 < MIN_ERROR_CODE)
                & (st0 != StatusCode.StopAllExecution),
                jnp.int32(StatusCode.Evaluate),
                st0,
            )
            if rk45_mode:
                from parcels_tpu._core.engine import rk45_chunk_start_dt

                pd["dt"] = rk45_chunk_start_dt(fsview, pd, sign_dt)

            def cond(pd):
                busy, halt = compute_loop_masks(pd, endtime, sign_dt)
                busy_any = jax.lax.pmax(jnp.any(busy).astype(jnp.int32), axis)
                halt_any = jax.lax.pmax(jnp.any(halt).astype(jnp.int32), axis)
                return (busy_any > 0) & (halt_any == 0)

            def body(pd):
                pd = engine_step(
                    fsview, pd, endtime, dt0, kernel_fns, sign_dt, rk45_mode,
                    lockstep_w=lockstep_w,
                )
                return _migrate_tiles(pd, dom, axis, n_dev, cap, farrays)

            pd = jax.lax.while_loop(cond, body, pd)
            pd["_rng"] = pd["_rng"][None]
            pd["_migof"] = pd["_migof"][None]
            pd["_haloof"] = pd["_haloof"][None]
            return pd

        def spec_of(a):
            return P(*((axis,) + (None,) * (jnp.ndim(a) - 1)))

        in_pspecs = {k: spec_of(v) for k, v in pdata.items()}
        farray_specs = jax.tree_util.tree_map(spec_of, farrays)
        fn = jax.shard_map(
            device_fn,
            mesh=dom.mesh,
            in_specs=(farray_specs, in_pspecs),
            out_specs=in_pspecs,
        )
        return fn(farrays, pdata)

    return jax.jit(chunk)
