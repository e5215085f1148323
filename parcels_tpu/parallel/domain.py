"""Field domain decomposition + particle migration over a TPU device mesh.

The reference has no distributed backend (SURVEY.md §2.2); this is the
TPU-native scaling design for fields too large to replicate:

- **Y-band decomposition**: each device of a 1-D ``Mesh`` owns a contiguous
  band of grid cells along Y. Every field on a banded grid is sliced into
  per-band slabs *with halo rows* on both sides, so a particle can be
  advected while up to ``halo`` cells outside its owner's band without any
  communication. Rectilinear grids band by latitude value; curvilinear
  grids (e.g. NEMO tripolar) band by *cell row index*, with per-band
  lookup rasters for cold-start search and ownership judged on the cached
  cell row.
- **Per-step particle migration**: after every engine step, particles whose
  ``y`` crossed the owning band's edge are packed into a fixed-capacity
  buffer and exchanged. Two transports (``migration=``): uniform bands use
  ``lax.ppermute`` neighbor hops (the cheapest collective on a TPU torus —
  a particle crosses at most one band per step under the halo CFL);
  non-uniform (load-balanced) bands use a ragged ``lax.all_to_all`` that
  delivers multi-band crossers directly (capacity padding + compaction —
  the SURVEY §7.3 design). Received lanes merge into inactive slots.
- **Global OOB semantics preserved**: the local lat slab is halo-extended,
  so out-of-bounds is judged against the *global* domain edges carried in
  ``GridSpec.y_oob_bounds`` — a particle leaving the global domain gets the
  same sentinel/status treatment as on a single chip (reference
  field.py:327-357), while a particle merely leaving its band migrates.

Correctness invariant (tested in tests/test_domain.py): trajectories are
identical (up to f32 roundoff) to the single-device run, including particles
that cross band boundaries mid-run.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from parcels_tpu._core.engine import compute_loop_masks, engine_step
from parcels_tpu._core.field import FieldView, GridView, VectorFieldView
from parcels_tpu._core.fieldset import FieldSetView
from parcels_tpu._core.statuscodes import MIN_ERROR_CODE, StatusCode

__all__ = ["YBandDomain", "build_domain_executor"]

#: SoA keys that are per-device scalars/keys rather than particle lanes
_NON_LANE_KEYS = ("_rng", "_migof", "_haloof")


class YBandDomain:
    """Y-band domain decomposition of a structured-grid FieldSet.

    Parameters
    ----------
    fieldset : FieldSet
        Must contain at least one rectilinear grid with a Y axis; grids
        without a Y axis (e.g. constant fields) are replicated.
    n_bands : int, optional
        Number of bands = number of devices used (default: all devices).
    halo : int
        Halo rows on each side of a band, in cells. Must be >= the maximum
        per-step particle displacement in cells (a CFL-like condition);
        migration happens every engine step, so one step is the bound.
    headroom : float
        Per-band lane capacity multiplier over the initial max band
        occupancy, to leave room for inbound migrants.
    migration_capacity : int, optional
        Max particles exchanged per neighbor hop per step (default:
        1/8 of the per-band lane count, min 64). Overflow is detected and
        raised host-side — it means halo/capacity need enlarging, never
        silent corruption.
    row_edges : sequence of int, optional
        Non-uniform band ownership edges as ``n_bands + 1`` monotone global
        CELL-ROW indices (``row_edges[0] == 0``, ``row_edges[-1] == ydim``).
        Default: uniform ``ceil(ydim / n)`` rows per band. Use
        :meth:`balanced_row_edges` to derive edges from a particle sample so
        clustered seedings (e.g. a coastal release on a global grid) spread
        evenly over devices instead of landing on one band
        (round-3 VERDICT missing #4). :meth:`rebalance` re-derives edges
        mid-campaign without recompiling the executor.
    """

    def __init__(
        self,
        fieldset,
        n_bands: int | None = None,
        halo: int = 2,
        devices=None,
        headroom: float = 2.0,
        migration_capacity: int | None = None,
        axis: str = "bands",
        row_edges=None,
        migration: str = "auto",
        slab_headroom: int = 0,
    ):
        if migration not in ("auto", "neighbor", "all2all"):
            raise ValueError(
                f"migration must be 'auto', 'neighbor' or 'all2all'. Got {migration!r}"
            )
        self.migration = migration
        if devices is None:
            devices = jax.devices()
            if n_bands is not None:
                devices = devices[: n_bands]
        self.n = len(devices)
        self.axis = axis
        self.mesh = Mesh(np.asarray(devices), (axis,))
        self.halo = int(halo)
        self.headroom = float(headroom)
        #: extra slab rows beyond the initial partition's widest band, so
        #: rebalance() can grow a band without hitting the compiled-shape
        #: lock (with 0 and uniform edges that divide ydim, rebalance can
        #: only reproduce the uniform partition — ADVICE r4)
        self.slab_headroom = int(slab_headroom)
        self.migration_capacity = migration_capacity
        self.fieldset = fieldset
        self._stacked_cache = None
        self._window_cache: dict = {}
        self._window_futures: dict = {}
        self._window_pool = None
        self._row_edges = None if row_edges is None else np.asarray(row_edges, dtype=np.int64)
        #: per-grid slab row counts locked by the first build; rebalance()
        #: must preserve them so the compiled executor (specs bake the
        #: local ydim) survives an edge change without recompiling
        self._Yl_locks: dict[int, int] = {}
        self._build_plans()

    @property
    def migration_mode(self) -> str:
        """Resolved migration transport: neighbor ``ppermute`` hops for
        uniform bands (a particle crosses at most one band per step under
        the halo CFL), ``all_to_all`` direct delivery when the partition is
        non-uniform (balanced bands can be narrower than one step's
        displacement)."""
        if self.migration != "auto":
            return self.migration
        main = self._grid_plans[self._main_igrid]
        own = np.diff(main["row_edges"])
        return "all2all" if np.any(own != own[0]) else "neighbor"

    def _edges_for(self, ydim: int):
        """Per-grid row edges from the custom partition (validated against
        the MAIN banded grid in ``_build_plans``): the partition verbatim
        when this grid's ydim matches the main grid's, proportionally
        rescaled when it differs (so band b covers the same y-range of the
        domain on every banded grid), uniform when no custom partition."""
        n = self.n
        r = self._row_edges
        if r is None:
            Yb = math.ceil(ydim / n)
            return Yb * np.arange(n + 1, dtype=np.int64)
        if r[-1] == ydim:
            return r.copy()
        # differing resolution: scale the main-grid partition onto this
        # grid's rows, keeping >= 1 row per band and the exact endpoints
        main_ydim = int(r[-1])
        scaled = np.round(r.astype(np.float64) * (ydim / main_ydim)).astype(np.int64)
        scaled[0], scaled[-1] = 0, ydim
        for i in range(1, n + 1):  # forward: monotone, >= 1 row
            scaled[i] = max(scaled[i], scaled[i - 1] + 1)
        for i in range(n, 0, -1):  # backward: keep the top end feasible
            scaled[i - 1] = min(scaled[i - 1], scaled[i] - 1)
        if scaled[0] != 0 or np.any(np.diff(scaled) < 1):
            raise ValueError(
                f"row_edges {r} cannot be rescaled onto a banded grid with "
                f"ydim={ydim} ({n} bands need at least {n} rows)."
            )
        return scaled

    def _locked_Yl(self, igrid: int, computed: int) -> int:
        """Slab rows for banded grid ``igrid``: first build locks the size;
        later rebuilds (rebalance) pad smaller partitions up to it and
        refuse larger ones (the executor's compiled shapes must hold)."""
        lock = self._Yl_locks.get(igrid)
        if lock is None:
            computed += self.slab_headroom
            self._Yl_locks[igrid] = computed
            return computed
        if computed > lock:
            raise ValueError(
                f"rebalanced row_edges imply slab rows {computed} > compiled "
                f"{lock}; cap band sizes (balanced_row_edges(max_rows=...))."
            )
        return lock

    def _build_plans(self):
        """Per-grid banding plans.

        One grid is the MAIN: ownership, migration and the halo diagnostic
        are judged on it (a curvilinear banded grid is preferred — its
        migration paths rebase every banded grid's ``ei`` cache, which
        rectilinear latitude-threshold migration does not need). Every
        other band-eligible grid is banded by COVERAGE: band b's slab must
        cover the main band b's slab y-range (plus a stencil margin), so
        mixed rectilinear + curvilinear fieldsets (NEMO C-grid UV + an
        A-grid wind/Stokes product — reference fieldset.py:381-400
        mixed-mesh handling) and banded grids of differing extents all
        sample correctly inside their band (round-5 VERDICT task 5).
        """
        fieldset = self.fieldset
        h, n = self.halo, self.n
        grids = list(fieldset.gridset)
        elig = [
            "Y" in getattr(g.spec, "axes", ()) and g.spec.ydim >= n for g in grids
        ]
        curv = [bool(getattr(g.spec, "curvilinear", False)) for g in grids]
        main_pos = next((i for i in range(len(grids)) if elig[i] and curv[i]), None)
        if main_pos is None:
            main_pos = next((i for i in range(len(grids)) if elig[i]), None)
        if main_pos is None:
            raise ValueError("FieldSet has no grid decomposable along Y.")
        if self._row_edges is not None:
            # validate the custom partition against the MAIN banded grid —
            # a mis-sized partition must fail loudly, not silently fall
            # back to uniform edges (ADVICE r4)
            r = self._row_edges
            main_ydim = grids[main_pos].spec.ydim
            if (
                len(r) != n + 1
                or r[0] != 0
                or r[-1] != main_ydim
                or np.any(np.diff(r) < 1)
            ):
                raise ValueError(
                    f"row_edges must be {n + 1} monotone ints from 0 to the "
                    f"main banded grid's ydim ({main_ydim}) with at least 1 "
                    f"row per band. Got {r}."
                )

        r_main = self._edges_for(grids[main_pos].spec.ydim)
        Yl_main = self._locked_Yl(main_pos, int(np.diff(r_main).max()) + 2 * h)
        build = self._curv_plan if curv[main_pos] else self._rect_plan
        main_plan = build(
            grids[main_pos], r_main[:-1].astype(np.int64), Yl_main, r_main, main=True
        )
        lo_b, hi_b = self._band_y_ranges(main_plan)

        self._grid_plans = []
        for i, grid in enumerate(grids):
            if i == main_pos:
                self._grid_plans.append(main_plan)
                continue
            if not elig[i]:
                self._grid_plans.append(
                    {"banded": False, "grid": grid, "spec": grid.spec}
                )
                continue
            starts, Ylc = self._coverage_starts(grid, curv[i], lo_b, hi_b)
            Yl = self._locked_Yl(i, Ylc)
            # pseudo-edges whose diffs equal the start deltas: the
            # migration rebasing (band_rows_meta / band_row_starts) only
            # consumes starts and their differences
            pseudo = np.concatenate([starts, [starts[-1] + max(Yl - 2 * h, 1)]])
            build = self._curv_plan if curv[i] else self._rect_plan
            self._grid_plans.append(build(grid, starts, Yl, pseudo, main=False))

        self._main_igrid = main_pos
        main = main_plan
        self.curvilinear = bool(main.get("curvilinear", False))
        if self.curvilinear:
            self.band_lo = self.band_hi = self._interior_edges = None
        else:
            self.band_lo = main["band_lo"]
            self.band_hi = main["band_hi"]
            # interior edges for host-side band assignment
            self._interior_edges = main["band_hi"][:-1]

    def _rect_plan(self, grid, starts, Yl, row_edges, main: bool):
        """Banded plan for a rectilinear grid from explicit slab row starts
        (extended-frame convention: slab b = ext nodes [s_b, s_b + Yl])."""
        h, n = self.halo, self.n
        spec = grid.spec
        la = np.asarray(grid.lat, dtype=np.float64)
        ydim = spec.ydim  # cells; nodes = ydim + 1
        starts = np.asarray(starts, dtype=np.int64)
        # northward extension: cover the last band's slab + halo
        extra = max(0, int(starts.max()) + (Yl - 2 * h) - ydim)
        d0 = la[1] - la[0]
        dN = la[-1] - la[-2]
        north = la[-1] + dN * np.arange(1, extra + h + 1)
        south = la[0] - d0 * np.arange(h, 0, -1)
        lax_ext = np.concatenate([south, la, north])  # h + nodes + extra + h
        plan = {
            "banded": True,
            "grid": grid,
            "spec": dataclasses.replace(
                spec,
                ydim=Yl,
                lat_uniform=None,
                has_lookup=False,
                y_oob_bounds=(float(la[0]), float(la[-1])),
            ),
            "row_starts": starts,
            "rows": Yl + 1,
            "pad_south": h,
            "pad_north": extra + h,
            "lat_slabs": np.stack(
                [lax_ext[s : s + Yl + 1] for s in starts]
            ).astype(np.float32),
            "lat_ext64": lax_ext,
            "row_edges": np.asarray(row_edges, dtype=np.int64),
            "ydim_nodes": ydim + 1,
        }
        if main:
            # band ownership edges in the padded (no-halo) node frame
            r = np.asarray(row_edges, dtype=np.int64)
            edges = lax_ext[h + np.minimum(r, ydim + extra)]
            band_lo = edges[:-1].copy()
            band_hi = edges[1:].copy()
            band_lo[0] = -np.inf
            band_hi[-1] = np.inf
            plan["band_lo"] = band_lo
            plan["band_hi"] = band_hi
        return plan

    def _curv_plan(self, grid, starts, Yl, row_edges, main: bool):
        """Banded plan for a curvilinear grid from explicit slab row starts
        (index-space banding: ownership/migration are judged on the cached
        cell row index, not latitude — rows of e.g. NEMO tripolar grids are
        not iso-latitude lines)."""
        h, n = self.halo, self.n
        spec = grid.spec
        la2 = np.asarray(grid.lat, dtype=np.float64)
        lo2 = np.asarray(grid.lon, dtype=np.float64)
        ny_nodes, nx_nodes = la2.shape
        ydim = spec.ydim
        starts = np.asarray(starts, dtype=np.int64)
        extra = max(0, int(starts.max()) + (Yl - 2 * h) - ydim)
        # replicate edge rows outward: degenerate (zero-area) pad cells make
        # the point-in-cell walk fail there, reproducing the single-device
        # off-grid error semantics
        lat_ext = np.concatenate(
            [np.repeat(la2[:1], h, 0), la2, np.repeat(la2[-1:], extra + h, 0)]
        )
        lon_ext = np.concatenate(
            [np.repeat(lo2[:1], h, 0), lo2, np.repeat(lo2[-1:], extra + h, 0)]
        )
        lat_slabs = np.stack([lat_ext[s : s + Yl + 1] for s in starts]).astype(np.float32)
        lon_slabs = np.stack([lon_ext[s : s + Yl + 1] for s in starts]).astype(np.float32)
        from parcels_tpu._core.grid import _build_curvilinear_lookup

        ny_r = min(4 * Yl, 1024)
        nx_r = min(4 * max(nx_nodes - 1, 1), 2048)
        lks = [
            _build_curvilinear_lookup(lon_slabs[b], lat_slabs[b], shape=(ny_r, nx_r))
            for b in range(n)
        ]
        return {
            "banded": True,
            "curvilinear": True,
            "grid": grid,
            "spec": dataclasses.replace(
                spec, ydim=Yl, has_lookup=True, y_oob_bounds=None
            ),
            "row_starts": starts,
            "rows": Yl + 1,
            "pad_south": h,
            "pad_north": extra + h,
            "lat_slabs": lat_slabs,
            "lon_slabs": lon_slabs,
            "lat_ext64": lat_ext,
            "lon_ext64": lon_ext,
            "lookup_yi": np.stack([lk["yi"] for lk in lks]),
            "lookup_xi": np.stack([lk["xi"] for lk in lks]),
            "lookup_origin": np.asarray([lk["origin"] for lk in lks], dtype=np.float32),
            "lookup_step": np.asarray([lk["step"] for lk in lks], dtype=np.float32),
            "row_edges": np.asarray(row_edges, dtype=np.int64),
            "ydim_nodes": ydim + 1,
        }

    def _band_y_ranges(self, main_plan):
        """Per-band latitude coverage targets from the MAIN plan's slab
        extents (ownership + halo + pad — everything a band's lanes can
        sample before the halo diagnostic fires)."""
        n = self.n
        rows = main_plan["rows"]
        lo = np.empty(n)
        hi = np.empty(n)
        lat = main_plan["lat_ext64"]
        for b, s in enumerate(main_plan["row_starts"]):
            sl = lat[s : s + rows]
            lo[b] = float(np.min(sl))
            hi[b] = float(np.max(sl))
        lo[0] = -np.inf
        hi[-1] = np.inf
        return lo, hi

    def _coverage_starts(self, grid, is_curv: bool, lo_b, hi_b):
        """Slab row starts (extended-frame) + needed slab height for a
        SECONDARY banded grid so band b covers latitudes [lo_b, hi_b]."""
        h, n = self.halo, self.n
        m = 1  # interpolation-stencil margin rows
        if is_curv:
            la2 = np.asarray(grid.lat, dtype=np.float64)
            ny_nodes = la2.shape[0]
            cummax = np.maximum.accumulate(la2.max(axis=1))
            sufmin = np.minimum.accumulate(la2.min(axis=1)[::-1])[::-1]
            # largest node row fully below lo / smallest fully above hi
            a = np.clip(np.searchsorted(cummax, lo_b, side="right") - 1, 0, ny_nodes - 1)
            bnd = np.clip(np.searchsorted(sufmin, hi_b, side="left"), 0, ny_nodes - 1)
        else:
            la = np.asarray(grid.lat, dtype=np.float64)
            nn = la.shape[0]
            a = np.clip(np.searchsorted(la, lo_b, side="right") - 1, 0, nn - 1)
            bnd = np.clip(np.searchsorted(la, hi_b, side="left"), 0, nn - 1)
        a = np.minimum(a, bnd)  # degenerate guards
        Yl_needed = int(np.max(bnd - a)) + 2 * m
        starts = np.maximum(a - m + h, 0).astype(np.int64)
        # starts must be non-decreasing for the band ordering invariants
        starts = np.maximum.accumulate(starts)
        return starts, Yl_needed

    # -- device data ---------------------------------------------------------
    def _sharding(self, ndim: int) -> NamedSharding:
        return NamedSharding(self.mesh, P(*((self.axis,) + (None,) * (ndim - 1))))

    def _put(self, arr, ndim: int | None = None):
        """Shard a host array over the band mesh; multi-process safe.

        Every process builds the identical global host array (plans, slabs
        and seeding are deterministic), so under ``jax.distributed`` each
        process contributes its addressable shards via
        ``make_array_from_callback`` — the same construction ParticleMesh
        uses (sharding.py) — while single-process runs keep the plain
        ``device_put``.
        """
        sh = self._sharding(ndim if ndim is not None else np.ndim(arr))
        if jax.process_count() > 1:
            host = np.asarray(arr)
            return jax.make_array_from_callback(host.shape, sh, lambda idx: host[idx])
        return jax.device_put(jnp.asarray(arr), sh)

    def stacked_farrays(self) -> dict:
        """Per-band field/grid slabs stacked on a leading device axis, sharded."""
        if self._stacked_cache is not None:
            return self._stacked_cache
        self._stacked_cache = self._build_stacked(None)
        return self._stacked_cache

    def _build_stacked(self, offsets: tuple | None) -> dict:
        """Banded device pytree; ``offsets`` selects a time window (None=full).

        With offsets, each field ships only ``fieldset._time_window`` levels
        (sliced *before* halo extension, so lazy zarr-backed fields read just
        the window from disk) — the domain-decomposed equivalent of
        FieldSet._build_window.
        """
        n, h = self.n, self.halo
        L = self.fieldset._time_window if offsets is not None else None
        stats = getattr(self.fieldset, "window_stats", None)
        out = {"fields": {}, "grids": []}
        for i, plan in enumerate(self._grid_plans):
            grid = plan["grid"]
            garrs = {k: np.asarray(v) for k, v in grid.device_arrays().items()}
            if offsets is not None and grid.time.shape[0] > 1:
                i0 = offsets[i]
                garrs["time"] = grid.time[i0 : i0 + L].astype(np.float32)
            if plan["banded"]:
                per_band = {"lat": plan["lat_slabs"]}
                if plan.get("curvilinear"):
                    per_band.update(
                        lon=plan["lon_slabs"],
                        lookup_yi=plan["lookup_yi"],
                        lookup_xi=plan["lookup_xi"],
                        lookup_origin=plan["lookup_origin"],
                        lookup_step=plan["lookup_step"],
                    )
                else:
                    garrs.pop("lookup_yi", None)
                    garrs.pop("lookup_xi", None)
                # per-cell geometry is indexed in the local band frame:
                # rebuild the table from each band's halo-extended node
                # coords (float64, same math as the global table) so the
                # one-row-gather C-grid fast path survives banding
                if "cgrid_geom" in garrs:
                    del garrs["cgrid_geom"]
                    if "geom_slabs" not in plan:
                        from parcels_tpu._core.grid import cgrid_geometry_from_coords

                        rows = plan["rows"]
                        slabs = []
                        for b in range(n):
                            s = plan["row_starts"][b]
                            lat_b = plan["lat_ext64"][s : s + rows]
                            if plan.get("curvilinear"):
                                lon_b = plan["lon_ext64"][s : s + rows]
                            else:
                                lon_b = np.asarray(grid.lon, dtype=np.float64)
                            slabs.append(
                                cgrid_geometry_from_coords(lon_b, lat_b, plan["spec"].spherical)
                            )
                        plan["geom_slabs"] = np.stack(slabs)
                    per_band["cgrid_geom"] = plan["geom_slabs"]
                if "pic_table" in garrs:
                    # same per-cell banding for the search-geometry table
                    del garrs["pic_table"]
                    if "pic_slabs" not in plan:
                        from parcels_tpu._core.index_search import build_pic_table

                        rows = plan["rows"]
                        slabs = []
                        for b in range(n):
                            s = plan["row_starts"][b]
                            lat_b = plan["lat_ext64"][s : s + rows]
                            if plan.get("curvilinear"):
                                lon_b = plan["lon_ext64"][s : s + rows]
                            else:
                                lon_b = np.asarray(grid.lon, dtype=np.float64)
                            slabs.append(build_pic_table(lon_b, lat_b, plan["spec"].spherical))
                        plan["pic_slabs"] = np.stack(slabs)
                    per_band["pic_table"] = plan["pic_slabs"]
                # per-band row metadata for migration under (possibly
                # non-uniform) edges: [own_rows, up_delta, dn_delta] with
                # up_delta[b] = frame shift for a b -> b+1 send (= own[b])
                # and dn_delta[b] = own[b-1] for a b -> b-1 send — travels
                # in farrays so a rebalance() never recompiles
                r = plan["row_edges"]
                own = np.diff(r)
                per_band["band_rows_meta"] = np.stack(
                    [
                        own,
                        np.concatenate([own[:-1], [0]]),
                        np.concatenate([[0], own[:-1]]),
                    ],
                    axis=1,
                ).astype(np.int32)
                # the FULL partition, replicated: the all-to-all migration
                # path rebases indices between arbitrary band pairs
                per_band["band_row_starts"] = np.broadcast_to(
                    r[:-1].astype(np.int32), (n, n)
                )
                garrs.update(per_band)
                for k in list(garrs):
                    if k not in per_band:
                        garrs[k] = np.broadcast_to(garrs[k], (n,) + garrs[k].shape)
            else:
                garrs = {k: np.broadcast_to(v, (n,) + v.shape) for k, v in garrs.items()}
            out["grids"].append(
                {k: self._put(v, v.ndim) for k, v in garrs.items()}
            )
        from parcels_tpu._core.field import Field

        for name, f in self.fieldset.fields.items():
            if not isinstance(f, Field):
                continue
            plan = self._grid_plans[f.igrid]
            if offsets is not None and f.data.shape[0] > 1:
                i0 = offsets[f.igrid]
                data = np.ascontiguousarray(f.data[i0 : i0 + L]).astype(np.float32, copy=False)
                if stats is not None:
                    stats["loads"] += 1
                    stats["bytes_read"] += data.nbytes
            else:
                data = np.asarray(f.data, dtype=np.float32)
            if plan["banded"]:
                ps, pn = plan["pad_south"], plan["pad_north"]
                ext = np.concatenate(
                    [
                        np.repeat(data[:, :, :1, :], ps, axis=2),
                        data,
                        np.repeat(data[:, :, -1:, :], pn, axis=2),
                    ],
                    axis=2,
                )
                slabs = np.stack(
                    [ext[:, :, s : s + plan["rows"], :] for s in plan["row_starts"]]
                )
            else:
                slabs = np.broadcast_to(data, (n,) + data.shape)
            out["fields"][name] = self._put(slabs, slabs.ndim)
        blo = np.zeros(self.n) if self.band_lo is None else self.band_lo
        bhi = np.zeros(self.n) if self.band_hi is None else self.band_hi
        # slab node extent per band: landing beyond it means this step's
        # interpolation was silently clamped (halo too small -> raise)
        main = self._grid_plans[self._main_igrid]
        slabs = main["lat_slabs"]
        if not self.curvilinear:
            out["halo_lo"] = self._put(np.asarray(slabs[:, 0], dtype=np.float32), 1)
            out["halo_hi"] = self._put(np.asarray(slabs[:, -1], dtype=np.float32), 1)
        out["band_lo"] = self._put(np.asarray(blo, dtype=np.float32), 1)
        out["band_hi"] = self._put(np.asarray(bhi, dtype=np.float32), 1)
        if n > 1:
            # replicated global interior ownership edges for all-to-all
            # destination routing (rect: latitude values; curvi: cell rows)
            if self.curvilinear:
                edges_int = main["row_edges"][1:-1].astype(np.int32)
            else:
                edges_int = np.asarray(self._interior_edges, dtype=np.float32)
            out["band_edges_int"] = self._put(
                np.broadcast_to(edges_int, (n, n - 1)).copy(), 2
            )
        return out

    def _ensure_windowed_specs(self):
        """Banded specs snapshot the grid spec at construction; windowed time
        values invalidate the uniform-time fast path exactly as
        FieldSet.set_time_window does for the original grids."""
        for plan in self._grid_plans:
            if (
                plan["banded"]
                and plan["spec"].time_uniform is not None
                and plan["grid"].time.shape[0] > 1
            ):
                plan["spec"] = dataclasses.replace(plan["spec"], time_uniform=None)

    # -- rolling time-window streaming (banded twin of FieldSet.windowed_arrays)
    def stacked_windowed(self, t_lo: float, t_hi: float) -> dict:
        """Banded device pytree whose time axes cover [t_lo, t_hi]."""
        if self.fieldset._time_window is None:
            return self.stacked_farrays()
        self._ensure_windowed_specs()
        key = self.fieldset._window_offsets(t_lo, t_hi)
        cache = self._window_cache
        futures = self._window_futures
        if key not in cache:
            fut = futures.pop(key, None)
            cache[key] = fut.result() if fut is not None else self._build_stacked(key)
        farrays = cache.pop(key)
        cache.clear()
        cache[key] = farrays
        return farrays

    def prefetch_window(self, t_anchor: float) -> None:
        """Stage the banded window anchored at ``t_anchor`` on a thread."""
        if self.fieldset._time_window is None:
            return
        self._ensure_windowed_specs()
        key = self.fieldset._window_offsets(t_anchor, t_anchor, check=False)
        if key in self._window_cache or key in self._window_futures:
            return
        if len(self._window_futures) >= 2:
            for k in [k for k, f in self._window_futures.items() if f.done()]:
                self._window_futures.pop(k)
        if self._window_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._window_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="parcels-band-window"
            )
        self._window_futures[key] = self._window_pool.submit(self._build_stacked, key)

    def build_views(self, farrays_local: dict) -> FieldSetView:
        """Local FieldSetView inside one shard (mirrors FieldSet.build_views)."""
        from parcels_tpu._core.field import Field, VectorField

        grid_views = []
        for i, plan in enumerate(self._grid_plans):
            if plan["banded"]:
                garrs = farrays_local["grids"][i]
                meta = None
                if plan.get("curvilinear"):
                    # per-band raster origin/step travel as (traced) arrays
                    meta = {
                        "origin": (garrs["lookup_origin"][0], garrs["lookup_origin"][1]),
                        "step": (garrs["lookup_step"][0], garrs["lookup_step"][1]),
                    }
                grid_views.append(GridView(plan["spec"], garrs, meta))
            else:
                grid_views.append(plan["grid"].make_view(farrays_local["grids"][i]))
        views: dict[str, object] = {}
        for name, f in self.fieldset.fields.items():
            if isinstance(f, Field):
                has_time = f.data.shape[0] > 1
                views[name] = FieldView(
                    name,
                    farrays_local["fields"][name],
                    grid_views[f.igrid],
                    f.igrid,
                    f.interp_method,
                    has_time,
                )
        from parcels_tpu.ops.stagecache import soa_cache_owner

        sc_owner, _ = soa_cache_owner(self.fieldset)
        for name, f in self.fieldset.fields.items():
            if isinstance(f, VectorField):
                views[name] = VectorFieldView(
                    name,
                    views[f.U.name],
                    views[f.V.name],
                    views[f.W.name] if f.W is not None else None,
                    f.interp_method,
                    sc_owner=(name == sc_owner),
                )
        return FieldSetView(views, dict(self.fieldset.context))

    # -- particle sharding ----------------------------------------------------
    def band_of(self, y: np.ndarray, x: np.ndarray | None = None) -> np.ndarray:
        """Owning band per particle. Rectilinear: latitude thresholds;
        curvilinear: global cell-row index from a host-side search."""
        if not self.curvilinear:
            return np.searchsorted(self._interior_edges, np.asarray(y), side="right")
        main = self._grid_plans[self._main_igrid]
        grid = main["grid"]
        y = np.asarray(y, dtype=np.float32)
        x = np.zeros_like(y) if x is None else np.asarray(x, dtype=np.float32)
        gpos = grid.make_view(grid.device_arrays()).search(
            jnp.zeros_like(jnp.asarray(y)), jnp.asarray(y), jnp.asarray(x)
        )
        yi = np.asarray(gpos["Y"]["index"])
        yi = np.clip(yi, 0, grid.spec.ydim - 1)  # off-grid lanes park in an edge band
        r = main["row_edges"]
        return np.clip(
            np.searchsorted(r[1:-1], yi, side="right"), 0, self.n - 1
        ).astype(np.int64)

    def global_row_of(self, y: np.ndarray, x: np.ndarray | None = None) -> np.ndarray:
        """Global cell-row index per particle on the main banded grid."""
        main = self._grid_plans[self._main_igrid]
        grid = main["grid"]
        y = np.asarray(y, dtype=np.float32)
        x = np.zeros_like(y) if x is None else np.asarray(x, dtype=np.float32)
        gpos = grid.make_view(grid.device_arrays()).search(
            jnp.zeros_like(jnp.asarray(y)), jnp.asarray(y), jnp.asarray(x)
        )
        yi = np.asarray(gpos["Y"]["index"])
        return np.clip(yi, 0, grid.spec.ydim - 1)

    def balanced_row_edges(
        self, y, x=None, max_rows: int | None = None, min_rows: int = 1
    ) -> np.ndarray:
        """Row edges that split a particle sample evenly over the bands.

        Greedy equal-count partition of the per-row particle histogram:
        each band takes rows until it holds ~1/n of the remaining sample,
        subject to ``min_rows <= band rows <= max_rows``. Pass the result
        as ``row_edges=`` at construction, or let :meth:`rebalance` apply
        it mid-campaign (``max_rows`` then defaults to the compiled slab
        size so no recompilation is needed).
        """
        n = self.n
        main = self._grid_plans[self._main_igrid]
        ydim = int(main["grid"].spec.ydim)
        rows = self.global_row_of(y, x)
        hist = np.bincount(rows, minlength=ydim).astype(np.float64)
        if max_rows is None:
            max_rows = ydim
        if max_rows * n < ydim:
            raise ValueError(f"max_rows={max_rows} cannot cover ydim={ydim} with {n} bands.")
        edges = np.zeros(n + 1, dtype=np.int64)
        edges[-1] = ydim
        remaining = hist.sum()
        pos = 0
        for b in range(n - 1):
            bands_left = n - b
            target = remaining / bands_left
            # rows the REMAINING bands still need, capped at max_rows each
            cum = np.cumsum(hist[pos:])
            k = int(np.searchsorted(cum, target, side="left")) + 1
            hi = ydim - pos - (bands_left - 1) * min_rows  # leave the rest room
            lo_needed = ydim - pos - (bands_left - 1) * max_rows
            k = int(np.clip(k, max(min_rows, lo_needed), min(max_rows, hi)))
            pos += k
            edges[b + 1] = pos
            remaining -= hist[edges[b] : pos].sum()
        if np.any(np.diff(edges) < 1) or np.any(np.diff(edges) > max_rows):
            raise ValueError(f"balanced edges infeasible: {edges} (max_rows={max_rows})")
        return edges

    def rebalance(self, y, x=None) -> np.ndarray:
        """Re-derive band edges from current particle positions in place.

        Keeps the compiled slab size (``max_rows`` = the locked local ydim
        minus halos), rebuilds the per-band slab plans and drops the
        stacked-array caches; the already-compiled executor is reused
        because every traced shape and spec is unchanged — band geometry
        travels through farrays. Re-shard the SoA afterwards
        (``shard_soa``; ``ParticleSet.execute`` does so on entry).
        Returns the new edges.

        With default uniform edges that exactly divide ydim, the first
        build locks the slab at the uniform band height and no edge can
        move — construct with ``slab_headroom=`` (extra rows) or
        ``row_edges=balanced_row_edges(...)`` to give rebalance room.
        """
        max_rows = int(self._Yl_locks[self._main_igrid]) - 2 * self.halo
        main_ydim = int(self._grid_plans[self._main_igrid]["grid"].spec.ydim)
        if max_rows * self.n <= main_ydim:
            import warnings

            warnings.warn(
                f"rebalance(): the compiled slab lock ({max_rows} rows/band x "
                f"{self.n} bands) leaves no room to move any edge on "
                f"ydim={main_ydim}; pass slab_headroom= at construction.",
                stacklevel=2,
            )
        edges = self.balanced_row_edges(y, x, max_rows=max_rows)
        self.set_row_edges(edges)
        return edges

    def set_row_edges(self, edges) -> None:
        """Apply a new band partition (see rebalance)."""
        self._row_edges = np.asarray(edges, dtype=np.int64)
        self._stacked_cache = None
        self._window_cache.clear()
        self._window_futures.clear()
        self._build_plans()

    def lane_capacity(self, pdata: dict) -> int:
        counts = np.bincount(
            self.band_of(
                np.asarray(pdata["y"])[np.asarray(pdata["_active"])],
                np.asarray(pdata["x"])[np.asarray(pdata["_active"])],
            ),
            minlength=self.n,
        )
        cap = max(int(counts.max() * self.headroom), 8)
        return -(-cap // 8) * 8

    def shard_soa(self, pdata: dict, lane_capacity: int | None = None) -> dict:
        """Regroup the SoA by owning band, pad each band to equal capacity, shard.

        Returns flat per-lane arrays of length ``n * L`` (band-major) plus the
        per-device ``_rng`` (n, 2) and ``_migof`` (n,) entries.
        """
        L = lane_capacity or self.lane_capacity(pdata)
        n = self.n
        # regroup ACTIVE lanes only: inactive padding (e.g. restored from a
        # checkpoint of a previously-sharded set) carries default positions
        # that would otherwise inflate one band's occupancy
        act = np.asarray(pdata["_active"]).astype(bool)
        idx_act = np.nonzero(act)[0]
        band = self.band_of(
            np.asarray(pdata["y"])[idx_act], np.asarray(pdata["x"])[idx_act]
        )
        order = idx_act[np.argsort(band, kind="stable")]
        counts = np.bincount(band, minlength=n)
        if counts.max() > L:
            raise ValueError(f"Band occupancy {counts.max()} exceeds lane capacity {L}.")
        offs = np.concatenate([[0], np.cumsum(counts)])
        out = {}
        for k, v in pdata.items():
            v = np.asarray(v)
            if k == "_rng":
                keys = jax.random.split(jax.random.wrap_key_data(jnp.asarray(v), impl="threefry2x32"), n)
                out[k] = self._put(np.asarray(jax.random.key_data(keys)), 2)
                continue
            buf = np.zeros((n * L,) + v.shape[1:], dtype=v.dtype)
            if k in ("particle_id", "_sc_key"):
                # -1 sentinels: padded lanes must never look like live ids
                # or valid persistent-cache cells (cell 0 is real)
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


# ---------------------------------------------------------------------------
# Migration (traced, inside shard_map)
# ---------------------------------------------------------------------------


def _neighbor_exchange(pd: dict, mover, shift: int, axis: str, n_dev: int, cap: int, on_send=None):
    """Send ``mover`` lanes to the device at +shift; merge into its free lanes.

    Static-shape ragged exchange: movers are compacted (argsort puts them
    first) into a ``cap``-lane buffer, ppermuted one hop over ICI, and
    scattered into the receiver's inactive lanes. Returns (pd, overflow):
    overflow counts particles dropped because the send buffer or the
    receiver's free lanes were exhausted — the host raises on any overflow.
    """
    lane_keys = [k for k in pd if k not in _NON_LANE_KEYS and k != "_active"]
    L = mover.shape[0]

    order = jnp.argsort(~mover)  # movers (True) sort first via ~mover False
    sel = order[:cap]
    sel_valid = mover[sel]
    count = jnp.sum(mover)
    send_overflow = jnp.maximum(count - cap, 0)

    buf = {k: pd[k][sel] for k in lane_keys}
    if on_send is not None:
        buf = on_send(buf)
    # deactivate only the lanes actually sent
    sent = jnp.zeros(L, dtype=bool).at[sel].set(sel_valid)
    pd["_active"] = pd["_active"] & ~sent

    perm = [(i, i + shift) for i in range(n_dev) if 0 <= i + shift < n_dev]
    rbuf = {k: jax.lax.ppermute(v, axis, perm) for k, v in buf.items()}
    rvalid = jax.lax.ppermute(sel_valid, axis, perm)  # devices w/o a source get False

    free_order = jnp.argsort(pd["_active"])  # inactive lanes first
    dst = free_order[:cap]
    n_free = jnp.sum(~pd["_active"])
    take = rvalid & (jnp.arange(rvalid.shape[0]) < n_free)  # rvalid is prefix-true
    recv_overflow = jnp.maximum(jnp.sum(rvalid) - n_free, 0)

    for k in lane_keys:
        old = pd[k][dst]
        m = take if pd[k].ndim == 1 else take[:, None]
        pd[k] = pd[k].at[dst].set(jnp.where(m, rbuf[k], old))
    pd["_active"] = pd["_active"].at[dst].set(take | pd["_active"][dst])
    return pd, (send_overflow + recv_overflow).astype(jnp.int32)


def _exchange_all2all(pd: dict, mover, dest, axis: str, n_dev: int, cap: int, on_send=None):
    """Route mover lanes DIRECTLY to their destination device with one
    ragged ``lax.all_to_all`` (SURVEY §2.2 comm-backend target).

    Static-shape raggedness: each device packs up to ``cap`` movers per
    destination into an (n_dev, cap) buffer (grouped by a stable sort on
    destination), all_to_all swaps row j to device j, and receivers merge
    the valid entries into inactive lanes. Unlike the ±1 ``ppermute`` hops
    this delivers multi-band crossers in ONE step — required when balanced
    bands are narrower than a step's displacement. Returns (pd, overflow).
    """
    lane_keys = [k for k in pd if k not in _NON_LANE_KEYS and k != "_active"]
    L = mover.shape[0]
    key = jnp.where(mover, dest.astype(jnp.int32), jnp.int32(n_dev))
    order = jnp.argsort(key, stable=True)
    skey = key[order]
    grp_start = jnp.searchsorted(skey, jnp.arange(n_dev, dtype=skey.dtype))
    pos = jnp.arange(L, dtype=jnp.int32) - grp_start[
        jnp.clip(skey, 0, n_dev - 1)
    ].astype(jnp.int32)
    valid = (skey < n_dev) & (pos < cap)
    M = n_dev * cap
    slot = jnp.where(valid, skey * cap + pos, jnp.int32(M))  # M = dropped
    send_overflow = jnp.sum(mover) - jnp.sum(valid)

    buf = {}
    for k in lane_keys:
        v = pd[k][order]
        buf[k] = (
            jnp.zeros((M,) + v.shape[1:], v.dtype).at[slot].set(v, mode="drop")
        )
    vbuf = jnp.zeros((M,), bool).at[slot].set(valid, mode="drop")
    if on_send is not None:
        dstbuf = jnp.zeros((M,), jnp.int32).at[slot].set(skey, mode="drop")
        buf = on_send(buf, dstbuf)

    sent = jnp.zeros(L, dtype=bool).at[order].set(valid)
    pd["_active"] = pd["_active"] & ~sent

    def a2a(x):
        return jax.lax.all_to_all(
            x.reshape((n_dev, cap) + x.shape[1:]), axis, split_axis=0, concat_axis=0
        ).reshape((M,) + x.shape[1:])

    rbuf = {k: a2a(v) for k, v in buf.items()}
    rvalid = a2a(vbuf)

    # compact received movers to the front, then fill inactive lanes
    rorder = jnp.argsort(~rvalid)
    rvalid_s = rvalid[rorder]
    M2 = min(M, L)
    free_order = jnp.argsort(pd["_active"])  # inactive lanes first
    dst_lanes = free_order[:M2]
    n_free = jnp.sum(~pd["_active"])
    take = rvalid_s[:M2] & (jnp.arange(M2) < n_free)
    recv_overflow = jnp.sum(rvalid) - jnp.sum(take)

    for k in lane_keys:
        vals = rbuf[k][rorder][:M2]
        old = pd[k][dst_lanes]
        m = take if pd[k].ndim == 1 else take[:, None]
        pd[k] = pd[k].at[dst_lanes].set(jnp.where(m, vals, old))
    pd["_active"] = pd["_active"].at[dst_lanes].set(take | pd["_active"][dst_lanes])
    return pd, (send_overflow + recv_overflow).astype(jnp.int32)


def _migrate_all2all(pd: dict, dom: "YBandDomain", axis: str, n_dev: int, cap: int, farrays):
    """Ownership-routed migration over ``lax.all_to_all`` (any-band hops).

    Destination = the band whose ownership interval holds the particle
    (latitude thresholds for rectilinear bands, global cell row for
    curvilinear index-space bands); the halo diagnostics mirror the
    neighbor-hop path.
    """
    main_i, main = dom._main_igrid, dom._grid_plans[dom._main_igrid]
    dev = jax.lax.axis_index(axis)
    edges_int = farrays["band_edges_int"]  # (n_dev - 1,) replicated

    if dom.curvilinear:
        viol = pd["_active"] & (pd["state"] == StatusCode.ErrorGridSearching)
        pd["_haloof"] = pd["_haloof"] + jnp.sum(viol).astype(jnp.int32)
        spec = main["spec"]
        xdim, ydim_l = max(spec.xdim, 1), max(spec.ydim, 1)
        h = dom.halo
        s_all_main = farrays["grids"][main_i]["band_row_starts"]  # (n_dev,)
        yi_local = (pd["ei"][:, main_i] // xdim) % ydim_l
        grow = yi_local - h + s_all_main[dev]
        dest = jnp.searchsorted(edges_int, grow, side="right").astype(jnp.int32)

        def on_send(buf, dstbuf):
            ei = buf["ei"]
            cols = []
            for g, plan in enumerate(dom._grid_plans):
                col = ei[:, g]
                if plan["banded"]:
                    sp = plan["spec"]
                    xd, yd = max(sp.xdim, 1), max(sp.ydim, 1)
                    xi = col % xd
                    yi = (col // xd) % yd
                    zi = col // (xd * yd)
                    s_g = farrays["grids"][g]["band_row_starts"]
                    delta = s_g[jnp.clip(dstbuf, 0, n_dev - 1)] - s_g[dev]
                    yi = jnp.clip(yi - delta, 0, yd - 1)
                    col = (zi * yd + yi) * xd + xi
                cols.append(col)
            buf = dict(buf)
            buf["ei"] = jnp.stack(cols, axis=1)
            if "_sc_key" in buf:
                buf["_sc_key"] = buf["_sc_key"].at[:, 0].set(-1)
            return buf

    else:
        halo_lo = farrays.get("halo_lo")
        halo_hi = farrays.get("halo_hi")
        if halo_lo is not None:
            viol = (
                pd["_active"]
                & (pd["state"] < MIN_ERROR_CODE)
                & ((pd["y"] < halo_lo) | (pd["y"] > halo_hi))
            )
            pd["_haloof"] = pd["_haloof"] + jnp.sum(viol).astype(jnp.int32)
        dest = jnp.searchsorted(edges_int, pd["y"], side="right").astype(jnp.int32)
        on_send = None

    mover = pd["_active"] & (dest != dev)
    pd, of = _exchange_all2all(pd, mover, dest, axis, n_dev, cap, on_send=on_send)
    pd["_migof"] = pd["_migof"] + of
    return pd


def _migrate(pd: dict, band_lo, band_hi, axis: str, n_dev: int, cap: int,
             halo_lo=None, halo_hi=None):
    """Hand off particles that crossed their band edge to the neighbor device.

    Also enforces the halo CFL condition (halo >= max per-step displacement
    in cells, see YBandDomain docstring): a lane that lands beyond its
    band's halo-extended slab this step had its interpolation silently
    clamped to the slab edge; such lanes are counted into ``_haloof`` and
    the host raises — never silent corruption. Lanes already in an error
    state (e.g. global out-of-bounds) are excluded: they raise through the
    state machine with their own typed error first. Curvilinear bands need
    no such counter: a lane beyond its slab fails the point-in-cell walk
    and raises GridSearchingError through the same state machine.
    """
    if halo_lo is not None:
        viol = (
            pd["_active"]
            & (pd["state"] < MIN_ERROR_CODE)
            & ((pd["y"] < halo_lo) | (pd["y"] > halo_hi))
        )
        pd["_haloof"] = pd["_haloof"] + jnp.sum(viol).astype(jnp.int32)
    overflow = jnp.int32(0)
    # cross masks MUST be recomputed after each exchange: the +1 pass
    # rewrites lanes on the receiving device, so a mask captured up front
    # would judge a just-received particle by its lane's stale previous
    # occupant and bounce it straight back one band.
    for shift in (1, -1):
        cross = (pd["y"] >= band_hi) if shift == 1 else (pd["y"] < band_lo)
        mover = pd["_active"] & cross
        pd, of = _neighbor_exchange(pd, mover, shift, axis, n_dev, cap)
        overflow = overflow + of
    pd["_migof"] = pd["_migof"] + overflow
    return pd


def _migrate_curvilinear(
    pd: dict, dom: "YBandDomain", axis: str, n_dev: int, cap: int, farrays=None
):
    """Index-space migration for curvilinear bands.

    Movers are judged on the cached cell row of the main banded grid (the
    ``ei`` cache is refreshed at every field sample, so it lags the position
    update by at most one step — the halo absorbs that). Sent particles'
    cached indices are re-based into the receiver's local row frame; the
    receiver's warm-started walk absorbs any residual off-by-a-few.

    Halo diagnostic (curvilinear twin of ``_migrate``'s y-bound check): a
    lane that out-runs its band's halo-extended slab in one step fails the
    point-in-cell walk and lands in ErrorGridSearching. Counting those
    lanes into ``_haloof`` lets the host raise the actionable
    increase-halo message instead of a bare GridSearchingError.
    """
    viol = pd["_active"] & (pd["state"] == StatusCode.ErrorGridSearching)
    pd["_haloof"] = pd["_haloof"] + jnp.sum(viol).astype(jnp.int32)
    h = dom.halo
    main_i, main = dom._main_igrid, dom._grid_plans[dom._main_igrid]
    spec = main["spec"]
    xdim, ydim_l = max(spec.xdim, 1), max(spec.ydim, 1)

    def rows_meta(g):
        """Per-device [own_rows, up_delta, dn_delta] for banded grid g —
        from farrays (rebalance-safe) with a uniform-edges fallback."""
        if farrays is not None and "band_rows_meta" in farrays["grids"][g]:
            return farrays["grids"][g]["band_rows_meta"]
        r = dom._grid_plans[g]["row_edges"]
        own = int(r[1] - r[0])
        return jnp.asarray([own, own, own], dtype=jnp.int32)

    dev = jax.lax.axis_index(axis)

    def rebase(shift):
        def on_send(buf):
            ei = buf["ei"]
            cols = []
            for g, plan in enumerate(dom._grid_plans):
                col = ei[:, g]
                if plan["banded"]:
                    sp = plan["spec"]
                    xd, yd = max(sp.xdim, 1), max(sp.ydim, 1)
                    xi = col % xd
                    yi = (col // xd) % yd
                    zi = col // (xd * yd)
                    meta = rows_meta(g)
                    delta = meta[1] if shift == 1 else -meta[2]
                    yi = jnp.clip(yi - delta, 0, yd - 1)
                    col = (zi * yd + yi) * xd + xi
                cols.append(col)
            buf = dict(buf)
            buf["ei"] = jnp.stack(cols, axis=1)
            if "_sc_key" in buf:
                # the persistent cell cache's cell index is band-local:
                # invalidate for migrated lanes (ops/stagecache.py)
                buf["_sc_key"] = buf["_sc_key"].at[:, 0].set(-1)
            return buf

        return on_send

    own_main = rows_meta(main_i)[0]
    overflow = jnp.int32(0)
    # recompute the row index after each exchange (see _migrate: a stale
    # mask would judge received lanes by their previous occupants)
    for shift in (1, -1):
        yi_local = (pd["ei"][:, main_i] // xdim) % ydim_l
        if shift == 1:
            cross = (yi_local >= h + own_main) & (dev < n_dev - 1)
        else:
            cross = (yi_local < h) & (dev > 0)
        mover = pd["_active"] & cross
        pd, of = _neighbor_exchange(pd, mover, shift, axis, n_dev, cap, on_send=rebase(shift))
        overflow = overflow + of
    pd["_migof"] = pd["_migof"] + overflow
    return pd


# ---------------------------------------------------------------------------
# Executor
# ---------------------------------------------------------------------------


def build_domain_executor(
    kernel_fns, dom: YBandDomain, *, sign_dt: int, rk45_mode: bool, lockstep_w: int = 0
):
    """Compile the multi-device chunk executor for a Y-band decomposition.

    Same call signature as the single-device executor
    (engine.build_chunk_executor): (farrays, pdata, endtime, dt0) -> pdata.
    The whole chunk — engine steps AND per-step migration — is one jitted
    shard_map program; the while-loop condition is made mesh-uniform with a
    ppermute-free pmax all-reduce so every device stays in lockstep for the
    neighbor exchanges.
    """
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
            # Every stacked leaf has a leading device axis of local size 1.
            farrays = jax.tree_util.tree_map(lambda a: a[0], farrays)
            band_lo = farrays["band_lo"]
            band_hi = farrays["band_hi"]
            halo_lo = farrays.get("halo_lo")
            halo_hi = farrays.get("halo_hi")
            fsview = dom.build_views(farrays)
            from parcels_tpu.ops import stagecache as _sc_mod

            _sc_mod.prebuild_tables(fsview)
            pd = dict(pd)
            pd["_rng"] = pd["_rng"][0]
            pd["_migof"] = pd["_migof"][0]
            pd["_haloof"] = pd["_haloof"][0]
            st0 = pd["state"]
            # requeue preserves halt states (cf. engine._run_block: the
            # public execute() pipelines dispatch ahead of the error pull)
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
                if n_dev > 1 and dom.migration_mode == "all2all":
                    return _migrate_all2all(pd, dom, axis, n_dev, cap, farrays)
                if dom.curvilinear:
                    return _migrate_curvilinear(pd, dom, axis, n_dev, cap, farrays)
                return _migrate(
                    pd, band_lo, band_hi, axis, n_dev, cap,
                    halo_lo=halo_lo, halo_hi=halo_hi,
                )

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
