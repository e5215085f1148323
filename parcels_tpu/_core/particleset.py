"""ParticleSet: particle SoA owner + simulation entry point.

Capability parity with reference src/parcels/_core/particleset.py. The host
keeps a numpy copy of the SoA between runs; ``execute`` ships it to device
once, then drives the jitted chunk executor (one call per output interval —
the whole inner time loop runs on-device, see engine.py), streaming
trajectory snapshots to the async ParticleFile writer, and raising the
reference's typed exceptions if any particle ends a chunk in an error state.
"""

from __future__ import annotations

import os
import types
import warnings

import numpy as np

import jax
import jax.numpy as jnp

from parcels_tpu._core.engine import build_chunk_executor
from parcels_tpu._core.particle import Particle, create_particle_data
from parcels_tpu._core.statuscodes import MIN_ERROR_CODE, StatusCode, raise_error_from_state
from parcels_tpu._core.timeutils import timedelta_to_float
from parcels_tpu._core.warnings_ import KernelWarning, ParticleSetWarning

__all__ = ["ParticleSet"]


class ParticleSet:
    """Fixed-capacity particle container bound to a FieldSet."""

    def __init__(
        self,
        fieldset,
        pclass=Particle,
        t=None,
        z=None,
        y=None,
        x=None,
        particle_ids=None,
        seed: int = 0,
        **kwargs,
    ):
        self.fieldset = fieldset
        self._pclass = pclass

        y = np.empty(0) if y is None else np.asarray(y, dtype=np.float64).flatten()
        x = np.empty(0) if x is None else np.asarray(x, dtype=np.float64).flatten()

        if particle_ids is None:
            particle_ids = np.arange(x.size)
        else:
            particle_ids = np.asarray(particle_ids).flatten()

        if z is None:
            # Default z: the shallowest depth level across all grids
            # (reference particleset.py:81-90).
            minz = None
            for grid in fieldset.gridset:
                for depth in np.atleast_1d(grid.depth):
                    if minz is None or abs(depth) < abs(minz):
                        minz = depth
            z = np.full(x.size, minz if minz is not None else 0.0)
        else:
            z = np.asarray(z, dtype=np.float64).flatten()
        assert x.size == y.size == z.size, "x, y, z don't all have the same lengths"

        t = self._normalize_release_times(t, x.size)
        assert x.size == t.size, "t and positions (x, y, z) do not have the same lengths."

        for kwvar in kwargs:
            kwargs[kwvar] = np.asarray(kwargs[kwvar]).flatten()
            assert x.size == kwargs[kwvar].size, (
                f"{kwvar} and positions (x, y, z) don't have the same lengths."
            )

        self._data = create_particle_data(
            pclass=pclass,
            nparticles=x.size,
            ngrids=len(fieldset.gridset),
            initial=dict(t=t, z=z, y=y, x=x, particle_id=particle_ids),
            seed=seed,
        )
        var_names = pclass.var_names()
        for kwvar, kwval in kwargs.items():
            if kwvar not in var_names:
                raise RuntimeError(f"Particle class does not have Variable {kwvar}")
            self._data[kwvar][:] = kwval.astype(self._data[kwvar].dtype)

    def _normalize_release_times(self, t, n: int) -> np.ndarray:
        if t is None or (hasattr(t, "__len__") and len(t) == 0):
            return np.full(n, np.nan)
        t = np.atleast_1d(np.asarray(t)).flatten()
        if np.issubdtype(t.dtype, np.datetime64):
            if self.fieldset.time_interval is None:
                raise ValueError("Cannot use datetime release times without a fieldset time interval.")
            t = timedelta_to_float(t - np.datetime64(self.fieldset.time_interval.left, "ns"))
        elif np.issubdtype(t.dtype, np.timedelta64):
            t = timedelta_to_float(t)
        else:
            t = t.astype(np.float64)
        if t.size == 1:
            t = np.repeat(t, n)
        if self.fieldset.time_interval is not None:
            _warn_release_outside_bounds(t, self.fieldset.time_interval)
        return t

    # -- container protocol --------------------------------------------------
    def __repr__(self):
        n = len(self)
        states = np.asarray(self._data["state"])[np.asarray(self._data["_active"])]
        uniq = dict(zip(*np.unique(states, return_counts=True))) if n else {}
        return (
            f"ParticleSet(n={n}, pclass={getattr(self._pclass, '__name__', self._pclass)!r}, "
            f"states={ {int(k): int(v) for k, v in uniq.items()} })"
        )

    def _repr_sections(self):
        """Sectioned repr (reference particleset_repr, _repr_utils.py:91-105)."""
        bounds = []
        for k in ("x", "y", "z", "t"):
            v = self.__getattr__(k)
            if v.size:
                bounds.append(f"{k}: min={v.min():.6g} max={v.max():.6g}")
        n = len(self)
        sample = [repr(p) for _, p in zip(range(7), iter(self))]
        if n > len(sample):
            sample.append(f"... ({n - len(sample)} more)")
        sections = [
            ("summary", [repr(self)]),
            ("bounds", bounds),
            ("particles", sample),
        ]
        stats = getattr(self, "last_run_stats", None)
        if stats:
            sections.append(("last run", [f"{k}: {v}" for k, v in stats.items()]))
        return sections

    def describe(self, buf=None) -> None:
        import sys

        from parcels_tpu._repr import format_sections

        buf = buf or sys.stdout
        buf.write(format_sections(type(self).__name__, self._repr_sections()) + "\n")

    def _repr_html_(self):
        from parcels_tpu._repr import html_sections

        return html_sections(type(self).__name__, self._repr_sections())

    def __len__(self):
        return int(self._data["_active"].sum())

    def add(self, other: "ParticleSet") -> "ParticleSet":
        """Merge ``other``'s particles into this set in place (reference
        ParticleSet.add / ``pset += other``). Inactive (padded/deleted)
        lanes of both sets are dropped during the merge."""
        if not isinstance(other, ParticleSet):
            raise TypeError(f"Can only add another ParticleSet, got {type(other)}")

        # engine-internal persistent-cache columns (ops/stagecache.py _sc_*)
        # are injected by execute(); a set that has not executed yet lacks
        # them. They are not particle variables: exclude them from the
        # compatibility check and concat fresh invalid entries where missing.
        def _vars(d):
            return {k for k in d if not k.startswith(("_sc_", "_uxc_"))}

        if _vars(self._data) != _vars(other._data):
            raise ValueError("ParticleSets have different particle variables.")
        merged = {}
        a1 = np.asarray(self._data["_active"])
        a2 = np.asarray(other._data["_active"])

        def _sc_fill(k, n, like):
            if k in ("_sc_key", "_uxc_key"):
                return np.full((n,) + like.shape[1:], -1, dtype=like.dtype)
            return np.zeros((n,) + like.shape[1:], dtype=like.dtype)

        for k in set(self._data) | set(other._data):
            if k == "_rng":
                merged[k] = np.asarray(self._data[k])
                continue
            if k in self._data:
                v1 = np.asarray(self._data[k])[a1]
            else:
                v1 = _sc_fill(k, int(a1.sum()), np.asarray(other._data[k]))
            if k in other._data:
                v2 = np.asarray(other._data[k])[a2]
            else:
                v2 = _sc_fill(k, int(a2.sum()), np.asarray(self._data[k]))
            merged[k] = np.concatenate([v1, v2], axis=0)
        self._data = merged
        return self

    def __iadd__(self, other):
        return self.add(other)

    def __iter__(self):
        """Iterate over active particles as lightweight read-only records."""
        data = {
            k: np.asarray(v)
            for k, v in self._data.items()
            if k not in ("_rng",) and np.asarray(v).ndim >= 1
        }
        active = np.flatnonzero(data["_active"])
        for i in active:
            yield _ParticleRecord(data, int(i))

    def __getitem__(self, index):
        """Get a single ACTIVE particle by index (reference particleset.py:165).

        Indexing is active-relative, consistent with ``__iter__``,
        ``remove_indices`` and ``data_indices`` — capacity-padding and
        deleted lanes are not addressable.
        """
        data = {
            k: np.asarray(v)
            for k, v in self._data.items()
            if k not in ("_rng",) and np.asarray(v).ndim >= 1
        }
        active = np.flatnonzero(data["_active"])
        return _ParticleRecord(data, int(active[int(index)]))

    def set_variable_write_status(self, var: str, write_status: bool):
        """Set whether ``var`` is written to trajectory output
        (reference particleset.py:342-352)."""
        names = [v.name for v in self._pclass.variables]
        if var not in names:
            raise ValueError(f"Particle class has no variable {var!r}")
        if write_status not in (True, False):
            raise ValueError(f"write_status must be True or False. Got {write_status!r}")
        from parcels_tpu._core.particle import ParticleClass, Variable

        def toggled(v):
            nv = Variable(v.name, v.dtype, v.initial, write_status, None)
            # keep CF attrs through a disable/enable cycle (the constructor
            # guard forbids attrs on non-written vars, but they must survive)
            nv.attrs = dict(v.attrs)
            return nv

        new_vars = [toggled(v) if v.name == var else v for v in self._pclass.variables]
        self._pclass = ParticleClass(new_vars)

    @property
    def size(self):
        return len(self)

    def __getattr__(self, name):
        data = self.__dict__.get("_data")
        if data is not None and name in data:
            arr = np.asarray(data[name])
            active = np.asarray(data["_active"])
            if arr.ndim >= 1 and arr.shape[0] == active.shape[0]:
                return arr[active]
            return arr
        raise AttributeError(f"ParticleSet has no attribute {name!r}")

    def __setattr__(self, name, value):
        data = self.__dict__.get("_data")
        if data is not None and name in data:
            arr = np.asarray(data[name]).copy()
            active = np.asarray(data["_active"])
            arr[active] = value
            data[name] = arr
            return
        object.__setattr__(self, name, value)

    @property
    def state(self):
        return self.__getattr__("state")

    def remove_indices(self, indices):
        """Deactivate particles at the given active-relative indices."""
        active_rows = np.flatnonzero(np.asarray(self._data["_active"]))
        mask = np.asarray(self._data["_active"]).copy()
        mask[active_rows[np.asarray(indices)]] = False
        self._data["_active"] = mask

    def data_indices(self, variable_name, compare_values, invert=False):
        compare_values = np.atleast_1d(compare_values)
        vals = self.__getattr__(variable_name)
        return np.where(np.isin(vals, compare_values, invert=invert))[0]

    @property
    def _error_particles(self):
        return self.data_indices("state", [StatusCode.Success, StatusCode.Evaluate], invert=True)

    @property
    def _num_error_particles(self):
        return int(
            np.sum(np.isin(self.state, [StatusCode.Success, StatusCode.Evaluate], invert=True))
        )

    def populate_indices(self):
        """Pre-populate the cached element indices (warm start for cell search)."""
        for i, grid in enumerate(self.fieldset.gridset):
            garrs = grid.device_arrays()
            gpos = grid.make_view(garrs).search(
                jnp.asarray(self._data["z"]),
                jnp.asarray(self._data["y"]),
                jnp.asarray(self._data["x"]),
            )
            if "FACE" in gpos:
                nf = grid.spec.n_face
                self._data["ei"][:, i] = np.clip(np.asarray(gpos["FACE"]["index"]), 0, nf - 1)
                continue
            zi = np.clip(np.asarray(gpos["Z"]["index"]), 0, max(grid.zdim - 1, 0))
            yi = np.clip(np.asarray(gpos["Y"]["index"]), 0, max(grid.ydim - 1, 0))
            xi = np.clip(np.asarray(gpos["X"]["index"]), 0, max(grid.xdim - 1, 0))
            self._data["ei"][:, i] = grid.ravel_index(zi, yi, xi)

    def checkpoint(self, path: str):
        """Write the full particle state (all variables incl. non-written
        ones, validity mask and RNG key) to an .npz checkpoint.

        Capability the reference stubs as NotImplementedError
        (reference particleset.py:263-291) — restart-from-output plus a
        full-SoA checkpoint (SURVEY.md §5 checkpoint/resume).
        """
        np.savez_compressed(path, **{k: np.asarray(v) for k, v in self._data.items()})

    @classmethod
    def from_checkpoint(cls, fieldset, path: str, pclass=Particle):
        """Restore a ParticleSet exactly as checkpointed (ids, states, RNG)."""
        with np.load(path) as npz:
            data = {k: npz[k] for k in npz.files}
        if "_tc" not in data:  # checkpoints written before the Kahan clock
            data["_tc"] = np.zeros_like(np.asarray(data["t"]), dtype=np.float32)
        pset = cls.__new__(cls)
        pset.fieldset = fieldset
        pset._pclass = pclass
        pset._data = data
        return pset

    @classmethod
    def from_particlefile(cls, fieldset, pclass, filename, restart=True, restarttime=None, **kwargs):
        """Restart a ParticleSet from a written trajectory file.

        Implements the capability stubbed as NotImplementedError in the
        reference (particleset.py:263-291): reads the last (or requested)
        output time of each trajectory and seeds particles there, preserving
        particle IDs when ``restart=True``.
        """
        from parcels_tpu._core.particlefile import read_particlefile

        df = read_particlefile(filename, decode_times=False)
        df = df.to_pandas() if hasattr(df, "to_pandas") else df
        if restarttime is None:
            restarttime = df["t"].max()
        elif callable(restarttime):
            restarttime = restarttime(df["t"].values)
        sel = df[df["t"] == restarttime]
        pset = cls(
            fieldset=fieldset,
            pclass=pclass,
            t=sel["t"].values.astype(np.float64),
            z=sel["z"].values if "z" in sel else None,
            y=sel["y"].values,
            x=sel["x"].values,
            particle_ids=sel["particle_id"].values if restart else None,
            **kwargs,
        )
        return pset

    # -- execution -----------------------------------------------------------
    def execute(
        self,
        kernels,
        dt,
        endtime=None,
        runtime=None,
        output_file=None,
        verbose_progress: bool = False,
        options=None,
    ):
        """Run the kernel chain over the particle set until endtime/runtime.

        Mirrors reference ParticleSet.execute (particleset.py:354-469): the
        outer loop advances output-interval chunks; each chunk is one call
        into the jitted device engine. ``options`` is an
        :class:`~parcels_tpu.EngineOptions` selecting engine modes
        (sampler, colgather, stage cache, chunk cap) programmatically;
        explicitly-set ``PARCELS_TPU_*`` env vars override it.
        """
        from parcels_tpu._core.options import EngineOptions

        opts = options if options is not None else EngineOptions()
        if not isinstance(opts, EngineOptions):
            raise TypeError(f"options must be an EngineOptions. Got {type(opts)}")
        with opts.applied():
            return self._execute_impl(
                kernels, dt, endtime, runtime, output_file, verbose_progress, opts
            )

    def _execute_impl(
        self,
        kernels,
        dt,
        endtime,
        runtime,
        output_file,
        verbose_progress,
        opts,
    ):
        if len(self) == 0:
            return

        if isinstance(kernels, types.FunctionType):
            kernels = [kernels]
        if not isinstance(kernels, list) or len(kernels) == 0:
            raise ValueError(f"kernels must be a non-empty list or a function. Got {kernels!r}")
        for f in kernels:
            if not callable(f):
                raise TypeError(f"kernels must be callables. Got {type(f)}")
            _check_kernel_signature(f)
        self._check_kernel_prerequisites(kernels)

        dt, sign_dt = _convert_dt_to_float(dt)
        runtime = _convert_runtime_to_float(runtime)
        # time plumbing must see only ACTIVE lanes: inactive padding lanes
        # carry t=0 fills that would otherwise drag the start time back
        active_mask = np.asarray(self._data["_active"])
        release_t = np.asarray(self._data["t"])[active_mask]
        start_time, end_time = _get_simulation_start_and_end_times(
            self.fieldset.time_interval, release_t, runtime, endtime, sign_dt
        )

        self._data["dt"] = np.full_like(np.asarray(self._data["dt"]), dt)
        tarr = np.asarray(self._data["t"]).copy()
        if np.isnan(tarr).any():
            tarr[np.isnan(tarr)] = start_time
            self._data["t"] = tarr

        outputdt = output_file.outputdt if output_file else None
        _warn_outputdt_release_desync(outputdt, start_time, release_t)

        rk45_mode = "RK45_tol" in self.fieldset.context
        lockstep_w = self._lockstep_window(dt, rk45_mode, tuple(kernels))
        z_occ = self._set_sampler_occupancy_hint()

        # persistent C-grid cell cache (ops/stagecache.py): inject the SoA
        # columns before padding/sharding so every execution path carries them
        from parcels_tpu.ops import stagecache as _sc

        sc_ok, sc_w = _sc.soa_cache_applicable(self.fieldset)
        if sc_ok and _sc.SC_KEY not in self._data:
            self._data.update(
                _sc.make_soa_cache(np.asarray(self._data["state"]).shape[0], sc_w)
            )
        # unstructured twin: persistent per-face cache columns (ops/uxcache.py)
        from parcels_tpu.ops import uxcache as _uxc

        uxc_ok, uxc_meta = _uxc.soa_cache_applicable(self.fieldset)
        if uxc_ok and _uxc.UXC_KEY not in self._data:
            self._data.update(
                _uxc.make_soa_cache(np.asarray(self._data["state"]).shape[0], uxc_meta)
            )
        # reference kernel.py:190: every execute() call requeues ALL active
        # lanes host-side. (The in-trace chunk-start requeue preserves
        # error/Stop states so pipelined dispatch stays exact — see
        # engine._run_block.)
        self._data["state"] = np.where(
            np.asarray(self._data["_active"], dtype=bool),
            np.int32(StatusCode.Evaluate),
            np.asarray(self._data["state"], dtype=np.int32),
        )

        pmesh = getattr(self, "_pmesh", None)
        domain = getattr(self, "_domain", None)
        windowed = self.fieldset._time_window is not None
        if domain is not None:
            from parcels_tpu.parallel.domain import build_domain_executor
            from parcels_tpu.parallel.tiles import XYTileDomain, build_tile_executor

            build_dom = (
                build_tile_executor
                if isinstance(domain, XYTileDomain)
                else build_domain_executor
            )
            key = (
                tuple(kernels), sign_dt, rk45_mode, "domain", lockstep_w, id(domain),
                # the resolved migration transport is baked into the trace
                # (domain.py build_domain_executor); set_row_edges() can flip
                # it uniform->non-uniform, so it must key the cache (ADVICE r4)
                domain.migration_mode,
                opts.resolved_key(),
            )
            cache = self.fieldset._executor_cache
            if key not in cache:
                cache[key] = build_dom(
                    tuple(kernels), domain, sign_dt=sign_dt, rk45_mode=rk45_mode,
                    lockstep_w=lockstep_w,
                )
            executor = cache[key]
            farrays = None if windowed else domain.stacked_farrays()
            dev = domain.shard_soa(self._data)
        elif pmesh is not None:
            executor = self._get_executor(
                tuple(kernels), sign_dt, rk45_mode, blocked=False, lockstep_w=lockstep_w,
                z_occ=z_occ, okey=opts.resolved_key(),
            )
            farrays = None if windowed else pmesh.shard_fields(self.fieldset.device_arrays())
            dev = pmesh.shard_soa(self._data)
        else:
            executor = self._get_executor(
                tuple(kernels), sign_dt, rk45_mode, blocked=True, lockstep_w=lockstep_w,
                z_occ=z_occ, okey=opts.resolved_key(),
            )
            from parcels_tpu._core.engine import DEFAULT_BLOCK_SIZE, _sort_mode_enabled

            self._pad_capacity(DEFAULT_BLOCK_SIZE)
            if _sort_mode_enabled(self.fieldset) and not np.asarray(self._data["ei"]).any():
                # sort keys come from the ei cache; seed it so the FIRST
                # chunk bins correctly instead of overflowing to the
                # gather fallback
                self.populate_indices()
            farrays = None if windowed else self.fieldset.device_arrays()
            dev = {k: jnp.asarray(v) for k, v in self._data.items()}

        if output_file is not None:
            output_file.set_metadata(self.fieldset, self._pclass, kernels)
            output_file.write_snapshot(_snapshot(dev), start_time)
            next_output = start_time + outputdt * sign_dt
        else:
            next_output = None

        pbar = None
        if verbose_progress:
            from tqdm import tqdm

            pbar = tqdm(total=sign_dt * (end_time - start_time))

        import time as _time

        wall0 = _time.perf_counter()
        nchunks = 0
        time = start_time
        try:
            # cap the steps per device chunk: one unbounded while_loop
            # program for a whole long run means a single device launch of
            # minutes, which remote runtimes (and their watchdogs) handle
            # poorly; the per-chunk host sync is microseconds.
            #
            # Round-4 (VERDICT r3 #2): the cap is no longer one fixed
            # number — chunk lengths come from a MEASURED per-step cost
            # model. The first (probe) chunk is short; every launch's wall
            # time updates an EWMA seconds-per-step estimate, and later
            # chunks are sized so one device launch targets
            # ``chunk_target_seconds`` (default 20 s), never exceeding
            # ``max_chunk_steps``. A 6 s/step forced-gather config thus
            # runs 3-step launches instead of a 64-step, 380 s program
            # that crashes the worker; a 10 ms/step config still gets the
            # full cap. target 0 (or max_chunk_steps 0) restores the
            # fixed behavior.
            max_chunk = int(os.environ.get("PARCELS_TPU_MAX_CHUNK_STEPS", 64))
            target_s = float(os.environ.get("PARCELS_TPU_CHUNK_TARGET_SECONDS", 20.0))
            # RK45's adaptive-dt path is sensitive to WHERE chunk endtimes
            # force landings, so wall-time-driven chunk lengths would make
            # trajectories run-to-run nondeterministic; fixed-dt kernels
            # land chunk edges on dt multiples and are unaffected
            adaptive = target_s > 0 and max_chunk > 0 and bool(dt) and not rk45_mode
            # short probe chunk: the first launch's cost is UNKNOWN (this is
            # exactly the crash regime — a forced-gather 10M step can cost
            # 10 s), so expose at most 2 steps before the model kicks in
            cur_chunk = min(max_chunk, 2) if adaptive else max_chunk
            est_per_step = None  # EWMA seconds per engine step

            # ---- pipelined chunk dispatch (round-5 VERDICT task 6) ----
            # The host pulls chunk k's 16-byte flag vector only AFTER
            # dispatching chunk k+1, so the per-chunk sync (tunnel RTT up
            # to seconds) never drains the device queue. Exact semantics:
            # the in-trace requeue preserves error/Stop lanes, so a chunk
            # dispatched after a halted one is a no-op and the deferred
            # check reports identical state one pull later.
            def _chunk_flags(d):
                act = jnp.asarray(d["_active"])
                st = jnp.asarray(d["state"])
                err = jnp.any(act & (st >= MIN_ERROR_CODE)).astype(jnp.int32)
                stop = jnp.any(act & (st == StatusCode.StopAllExecution)).astype(
                    jnp.int32
                )
                mig = (
                    jnp.asarray(d["_migof"]).sum().astype(jnp.int32)
                    if "_migof" in d
                    else jnp.int32(0)
                )
                halo = (
                    jnp.asarray(d["_haloof"]).sum().astype(jnp.int32)
                    if "_haloof" in d
                    else jnp.int32(0)
                )
                return jnp.stack([err, stop, mig, halo])

            def _check_flags(flags_host, span):
                """Raise/stop handling for one chunk; reports from the
                CURRENT dev (a successor chunk after a halt is a no-op, so
                the state is identical)."""
                err_any, stop_any, migof, haloof = (int(v) for v in flags_host)
                # domain diagnostics outrank per-particle state errors: a
                # halo/buffer breach invalidates the interpolation that
                # produced those states in the first place
                if migof > 0:
                    raise RuntimeError(
                        "Particle migration buffer overflow: increase "
                        "YBandDomain(headroom=..., migration_capacity=...) or halo."
                    )
                if haloof > 0:
                    # curvilinear bands surface halo breaches as failed cell
                    # walks; only raise the halo diagnostic when the failing
                    # lanes ARE findable on the global grid (otherwise they
                    # are genuinely off-grid: typed error below)
                    if (
                        domain is None
                        or not domain.curvilinear
                        or self._curvilinear_halo_breach(
                            dev, tuple(kernels), span[0], span[1], dt,
                            sign_dt, rk45_mode, windowed,
                        )
                    ):
                        raise RuntimeError(
                            "Halo violation: a particle moved beyond its "
                            "band's halo-extended slab in a single step, so "
                            "its field samples were clamped at the slab edge "
                            "(rectilinear bands) or its point-in-cell walk "
                            "failed (curvilinear bands). Increase "
                            "YBandDomain(halo=...) or reduce dt (halo must "
                            "cover the max per-step displacement in cells)."
                        )
                if err_any:
                    self._raise_errors(
                        dev, np.asarray(dev["state"]), np.asarray(dev["_active"])
                    )
                return bool(stop_any)

            pending = None  # (flags_dev, steps, chunk_index, (time, next_time))
            t_mark = _time.perf_counter()
            prefetch_acc = 0.0

            def _drain(pending):
                """Pull + check a chunk's deferred flags; update the cost
                model from the wall time since the previous pull (host work
                in between overlapped device compute)."""
                nonlocal est_per_step, cur_chunk, t_mark, prefetch_acc
                flags, steps_done, idx, span = pending
                flags_host = np.asarray(flags)
                now = _time.perf_counter()
                if adaptive and idx > 0:
                    # the compile-bearing first chunk never seeds the EWMA
                    w = max(now - t_mark - prefetch_acc, 1e-6) / steps_done
                    est_per_step = (
                        w if est_per_step is None else 0.5 * est_per_step + 0.5 * w
                    )
                    cur_chunk = max(1, min(max_chunk, int(target_s / est_per_step)))
                t_mark = now
                prefetch_acc = 0.0
                return _check_flags(flags_host, span)

            while sign_dt * (time - end_time) < 0:
                if next_output is not None:
                    f = min if sign_dt > 0 else max
                    next_time = f(next_output, end_time)
                else:
                    next_time = end_time
                if cur_chunk > 0 and dt:
                    f = min if sign_dt > 0 else max
                    next_time = f(next_time, time + sign_dt * cur_chunk * abs(dt))
                if windowed:
                    # the persistent cell cache holds face values of the
                    # PREVIOUS window's data: invalidate at window rollover
                    dev = _sc.invalidate_soa_cache(dev)
                    f = min if sign_dt > 0 else max
                    next_time = f(next_time, self.fieldset.max_window_endtime(time, sign_dt))
                    prev_farrays = farrays
                    if domain is not None:
                        farrays = domain.stacked_windowed(time, next_time)
                    elif pmesh is not None:
                        farrays = pmesh.shard_fields(
                            self.fieldset.windowed_arrays(time, next_time)
                        )
                    else:
                        farrays = self.fieldset.windowed_arrays(time, next_time)
                    if farrays is not prev_farrays and pending is not None:
                        # window ROLLOVER drains the pipeline: dispatching
                        # the next chunk now would keep two windows' slabs
                        # (plus the running chunk's in-trace tables) live at
                        # once — measured ResourceExhausted at the streamed
                        # config-5 shape. Chunks within one window pipeline.
                        stop_prev0 = _drain(pending)
                        pending = None
                        if stop_prev0:
                            break
                dev = executor(farrays, dev, np.float32(next_time), np.float32(dt))
                # tiny device-side reduction, dispatched (not pulled) now
                flags = _chunk_flags(dev)
                if windowed and sign_dt * (next_time - end_time) < 0:
                    # stage the next window while the chunk runs on device;
                    # forward chunks anchor exactly at next_time, backward
                    # ones at an estimate (misprediction = harmless sync load)
                    anchor = next_time if sign_dt > 0 else next_time + (next_time - time)
                    p0 = _time.perf_counter()
                    (domain or self.fieldset).prefetch_window(anchor)
                    # host-side staging time overlaps device compute; charge
                    # it to the prefetcher, not the cost model (ADVICE r4)
                    prefetch_acc += _time.perf_counter() - p0

                # deferred check of the PREVIOUS chunk (pipeline depth 1)
                stop_prev = _drain(pending) if pending is not None else False
                steps_done = (
                    max(1, round(abs(float(next_time) - float(time)) / abs(dt)))
                    if dt
                    else 1
                )
                pending = (flags, steps_done, nchunks, (time, next_time))

                at_output = (
                    next_output is not None and abs(next_time - next_output) < 1e-3
                )
                if at_output:
                    # output boundaries drain the pipeline: a snapshot must
                    # reflect a chunk already checked for errors
                    stop_prev = _drain(pending) or stop_prev
                    pending = None
                    if output_file:
                        output_file.write_snapshot(_snapshot(dev), next_output)
                    if np.isfinite(outputdt):
                        next_output += outputdt * sign_dt

                if pbar is not None:
                    pbar.update(sign_dt * (next_time - time))
                time = next_time
                nchunks += 1
                if stop_prev:
                    break

            if pending is not None:
                _drain(pending)
        finally:
            if pbar is not None:
                pbar.close()
            # Pull the SoA back to host as the source of truth. _migof and
            # _haloof are per-device diagnostics, not particle variables.
            self._data = {
                k: np.asarray(v) for k, v in dev.items() if k not in ("_migof", "_haloof")
            }
            if "_rng" in self._data and self._data["_rng"].ndim == 2:
                self._data["_rng"] = self._data["_rng"][0]
            # per-run observability (SURVEY.md §5 tracing/profiling parity)
            wall = _time.perf_counter() - wall0
            nsteps = abs(time - start_time) / abs(dt) if dt else 0.0
            self.last_run_stats = {
                "wall_s": round(wall, 4),
                "chunks": nchunks,
                "particles": len(self),
                "particle_steps_per_s": round(len(self) * nsteps / wall, 1) if wall > 0 else 0.0,
                "z_occupancy_hint": z_occ,
                "chunk_steps_final": cur_chunk,
                "est_seconds_per_step": (
                    round(est_per_step, 6) if est_per_step is not None else None
                ),
            }
            if output_file is not None:
                output_file.flush()

    def _curvilinear_halo_breach(
        self, dev, kernels, time, next_time, dt, sign_dt, rk45_mode, windowed
    ) -> bool:
        """Disambiguate a curvilinear banded GridSearchingError.

        A lane that out-ran its band's halo-extended slab fails the local
        point-in-cell walk even though its step is perfectly valid on the
        GLOBAL grid — that is a halo breach (raise the increase-halo
        message). A lane that genuinely left the grid fails on the global
        grid too (typed error instead, matching single-device semantics).
        The check replays ONE engine step for just the failing lanes
        against the un-banded global field arrays (stage samples included,
        so off-grid-at-an-RK-stage cases are judged correctly). Error-path
        only; cost is one small eager step.
        """
        from parcels_tpu._core.engine import engine_step

        try:
            states = np.asarray(dev["state"])
            act = np.asarray(dev["_active"])
            err = act & (states == StatusCode.ErrorGridSearching)
            if not err.any():
                return True
            farrays = (
                self.fieldset.windowed_arrays(time, next_time)
                if windowed
                else self.fieldset.device_arrays()
            )
            fsview = self.fieldset.build_views(farrays)
            sub = {}
            for k, v in dev.items():
                arr = np.asarray(v)
                if k == "_rng":
                    sub[k] = jnp.asarray(arr[0] if arr.ndim == 2 else arr)
                elif arr.ndim >= 1 and arr.shape[0] == err.shape[0]:
                    sub[k] = jnp.asarray(arr[err])
                else:
                    sub[k] = jnp.asarray(arr)
            n_err = int(err.sum())
            sub["state"] = jnp.full((n_err,), StatusCode.Evaluate, jnp.int32)
            sub["_active"] = jnp.ones((n_err,), bool)
            for d in ("dx", "dy", "dz"):
                sub[d] = jnp.zeros_like(sub[d])
            out = engine_step(
                fsview, sub, jnp.float32(next_time), jnp.float32(dt),
                kernels, sign_dt, rk45_mode,
            )
            return bool((np.asarray(out["state"]) < MIN_ERROR_CODE).all())
        except Exception:  # pragma: no cover - diagnostic must never mask
            return True

    def _raise_errors(self, dev, states: np.ndarray, active: np.ndarray):
        err = active & (states >= MIN_ERROR_CODE)
        if not err.any():
            return
        idx = int(np.argmax(err))
        code = int(states[idx])
        z = float(np.asarray(dev["z"])[idx])
        y = float(np.asarray(dev["y"])[idx])
        x = float(np.asarray(dev["x"])[idx])
        t = float(np.asarray(dev["t"])[idx])
        raise_error_from_state(code, z=z, y=y, x=x, t=t)

    def _check_kernel_prerequisites(self, kernels):
        """RK45 context defaults (reference kernel.py:122-161)."""
        from parcels_tpu.kernels import AdvectionRK45

        for f in kernels:
            if f is AdvectionRK45:
                if "next_dt" not in self._pclass.var_names():
                    raise ValueError('ParticleClass requires a "next_dt" for AdvectionRK45 Kernel.')
                fs = self.fieldset
                if "RK45_tol" not in fs.context:
                    warnings.warn(
                        "Setting RK45 tolerance to 10 m. Use fieldset.add_context('RK45_tol', [distance]) to change.",
                        KernelWarning,
                        stacklevel=2,
                    )
                    fs.add_context("RK45_tol", 10)
                    if fs.gridset and fs.gridset[0].mesh.is_spherical():
                        fs.context["RK45_tol"] = fs.context["RK45_tol"] / fs.gridset[0].deg2m
                if "RK45_min_dt" not in fs.context:
                    warnings.warn(
                        "Setting RK45 minimum timestep to 1 s. Use fieldset.add_context('RK45_min_dt', [timestep]) to change.",
                        KernelWarning,
                        stacklevel=2,
                    )
                    fs.add_context("RK45_min_dt", 1)
                if "RK45_max_dt" not in fs.context:
                    warnings.warn(
                        "Setting RK45 maximum timestep to 1 day. Use fieldset.add_context('RK45_max_dt', [timestep]) to change.",
                        KernelWarning,
                        stacklevel=2,
                    )
                    fs.add_context("RK45_max_dt", 60 * 60 * 24)

    def _pad_capacity(self, block_size: int):
        """Pad the SoA with inactive lanes to a canonical lane count.

        Lane counts are rounded up to the next power of two (>= 8) below
        8192 and to multiples of 8192 beyond, then to multiples of
        ``block_size``. Canonical counts mean (a) different particle counts
        reuse the same compiled engine program — compilation on remote TPU
        runtimes costs minutes — and (b) tile-aligned shapes (non-aligned
        lane counts measured ~1.4x slower at 10M).
        """
        n = self._data["state"].shape[0]
        if n < 8192:
            target = 8
            while target < n:
                target *= 2
        else:
            target = -(-n // 8192) * 8192
        if target > block_size and target % block_size:
            target = -(-target // block_size) * block_size
        pad = target - n
        if pad == 0:
            return
        out = {}
        for k, v in self._data.items():
            v = np.asarray(v)
            if k == "_rng":
                out[k] = v
                continue
            fill = np.zeros((pad,) + v.shape[1:], dtype=v.dtype)
            if k in ("particle_id", "_sc_key"):
                # -1 sentinels: padded lanes must never look like live ids
                # or valid persistent-cache cells (cell 0 is real)
                fill = fill - 1
            out[k] = np.concatenate([v, fill], axis=0)
        out["_active"][n:] = False
        self._data = out

    def _kernels_write_time_vars(self, kernels: tuple) -> bool:
        """Trace-time probe: does any kernel write ``particles.t`` or
        ``particles.dt``? Per-lane dt/t writes (e.g. AdvectionAnalytical's
        cell-transit dt, or custom kernels) break the uniform-march premise
        of the lockstep window, so they force the exact cond sampling path.
        """
        cache = self.fieldset.__dict__.setdefault("_kernel_write_cache", {})
        if kernels in cache:
            return cache[kernels]
        from parcels_tpu._core.particles_view import Particles

        written: set = set()

        class _Recorder(Particles):
            def __setattr__(self, name, value):
                written.add(name)
                Particles.__setattr__(self, name, value)

        farrays = self.fieldset.device_arrays()
        shapes = {
            k: jax.ShapeDtypeStruct(np.shape(v), np.asarray(v).dtype)
            for k, v in self._data.items()
        }

        def probe(pd):
            fsview = self.fieldset.build_views(farrays)
            view = _Recorder(pd, pd["_active"])
            for f in kernels:
                f(view, fsview)
            return pd["t"]

        try:
            jax.eval_shape(probe, shapes)
            result = bool({"t", "dt"} & written)
        except Exception:
            result = True  # unprobeable kernel: assume the worst
        cache[kernels] = result
        return result

    def _set_sampler_occupancy_hint(self) -> float:
        """Measure how concentrated the batch is in z for the binned planner.

        The planner's bin-population feasibility assumes lanes uniform over
        all z-cells (ops/binned_sample.slab_geometry); a surface-only release
        occupies 1 of Z cells and would be misplanned into the sparse
        fallback. Measured host-side from the live z values against the
        deepest grid's levels — quantized, so replans/recompiles only happen
        across order-of-magnitude occupancy shifts. Returns the quantized
        fraction; execute() threads it explicitly into the executor cache
        key and trace (also mirrored into the process-wide default for
        direct planner calls)."""
        from parcels_tpu.ops.binned_sample import set_z_occupancy_hint

        frac = 1.0
        try:
            grids = self.fieldset._gridset
            depth = max((np.asarray(g.depth) for g in grids), key=lambda d: d.size, default=None)
            # only a 1-D strictly-monotonic depth axis gives a meaningful
            # searchsorted bin; sigma/multi-dim depths fall back to 1.0
            if (
                depth is not None
                and depth.ndim == 1
                and depth.size > 2
                and bool(np.all(np.diff(depth) > 0))
            ):
                z = np.asarray(self._data["z"])
                act = np.asarray(self._data.get("_active", np.ones(z.shape, bool)))
                z = z[act] if act.any() else z
                zi = np.clip(np.searchsorted(depth, z, side="right") - 1, 0, depth.size - 2)
                frac = np.unique(zi).size / max(depth.size - 1, 1)
        except Exception:  # pragma: no cover - hint is best-effort only
            frac = 1.0
        return set_z_occupancy_hint(frac)

    def _lockstep_window(self, dt: float, rk45_mode: bool, kernels: tuple = ()) -> int:
        """Static time-window size W proving this run's evaluated lanes always
        bracket within W field levels (0 = no proof -> exact cond path).

        Evaluated lanes march in lockstep (uniform dt), so their sample-time
        spread never exceeds the release-time spread plus one dt. Covering
        that span with hat rows lets the sampler drop the per-sample
        lax.cond whose fusion barrier costs ~5.7x step time (interp_kernels).
        The premise is verified, not assumed: RK45 mode and any kernel the
        trace probe sees writing ``t``/``dt`` per-lane disable the proof.
        """
        if rk45_mode:
            return 0
        if kernels and self._kernels_write_time_vars(tuple(kernels)):
            return 0
        from parcels_tpu._core.field import Field, VectorField
        from parcels_tpu.ops.interp_kernels import (
            TIME_WINDOW,
            fits_fast_path,
            max_lockstep_window,
        )

        act = np.asarray(self._data["_active"])
        if not act.any():
            return 0
        t = np.asarray(self._data["t"])[act]
        t = t[np.isfinite(t)]
        spread = (float(t.max() - t.min()) if t.size else 0.0) + abs(float(dt))

        W_req = 2
        fast_shapes = []
        components = []
        for f in self.fieldset.fields.values():
            if isinstance(f, VectorField):
                components += [c for c in (f.U, f.V, f.W) if c is not None]
            else:
                components.append(f)
        for cand in components:
            if not isinstance(cand, Field) or getattr(cand.data, "ndim", 0) != 4:
                continue
            if not fits_fast_path(cand.data.shape) or cand.data.shape[0] <= 1:
                continue
            fast_shapes.append(cand.data.shape)
            lv = np.asarray(cand.grid.time, dtype=np.float64)
            if lv.size <= 1:
                continue
            gaps = np.diff(lv)
            min_gap = float(gaps.min()) if gaps.size else np.inf
            if min_gap <= 0 or not np.isfinite(min_gap):
                return 0
            W_req = max(W_req, int(np.ceil(spread / min_gap)) + 2)
        if not fast_shapes:
            return 0
        # bucket to powers of two (bounded recompiles across chunks)
        W = max(TIME_WINDOW, 1 << (W_req - 1).bit_length())
        if any(W > max_lockstep_window(sh) for sh in fast_shapes):
            return 0
        return W

    def _get_executor(
        self, kernels: tuple, sign_dt: int, rk45_mode: bool, blocked: bool = True,
        lockstep_w: int = 0, z_occ: float = 1.0, okey: tuple = (),
    ):
        key = (kernels, sign_dt, rk45_mode, blocked, lockstep_w, z_occ, id(self._pclass), okey)
        cache = self.fieldset._executor_cache
        if key not in cache:
            # donate=False keeps pre-chunk snapshots valid for the async
            # output writer; benches without output can rebuild with donation.
            cache[key] = build_chunk_executor(
                kernels,
                self.fieldset,
                sign_dt=sign_dt,
                rk45_mode=rk45_mode,
                donate=False,
                block_size=None if blocked else 2**62,
                lockstep_w=lockstep_w,
                z_occ=z_occ,
            )
        return cache[key]


class _ParticleRecord:
    """Read-only row view yielded by ``iter(ParticleSet)``."""

    __slots__ = ("_data", "_i")

    def __init__(self, data, i):
        object.__setattr__(self, "_data", data)
        object.__setattr__(self, "_i", i)

    def __getattr__(self, name):
        data = object.__getattribute__(self, "_data")
        if name in data:
            return data[name][object.__getattribute__(self, "_i")]
        raise AttributeError(name)

    def __repr__(self):
        d = self._data
        i = self._i
        fields = ", ".join(
            f"{k}={d[k][i]:.6g}" for k in ("x", "y", "z", "t") if k in d
        )
        pid = d["particle_id"][i] if "particle_id" in d else i
        return f"Particle(id={pid}, {fields})"


def _check_kernel_signature(f):
    """Kernels must accept exactly (particles, fieldset) — reference
    kernel.py:70 validates against AdvectionRK4's signature."""
    import inspect

    try:
        params = [
            p
            for p in inspect.signature(f).parameters.values()
            if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
        ]
    except (TypeError, ValueError):
        return  # builtins/partials without introspectable signatures
    if len(params) != 2:
        raise ValueError(
            f"Kernel {getattr(f, '__name__', f)!r} must have signature "
            f"(particles, fieldset); got {len(params)} positional parameters."
        )


def _snapshot(dev: dict) -> dict:
    """Device-side snapshot of the SoA; np.asarray later blocks only the writer thread."""
    return dict(dev)


def _warn_outputdt_release_desync(outputdt, starttime, release_times):
    # vectorized: this runs on the hot execute() entry at 10M+ particles
    if not outputdt:
        return
    rt = np.asarray(release_times)
    finite = np.isfinite(rt)
    if np.any(np.mod(rt[finite] - starttime, outputdt) != 0):
        warnings.warn(
            "Some of the particles have a start time difference that is not a multiple of outputdt. "
            "This could cause the first output of some of the particles that start later "
            "in the simulation to be at a different time than expected.",
            ParticleSetWarning,
            stacklevel=2,
        )


def _warn_release_outside_bounds(release_times, time_interval):
    if np.isnan(release_times).all():
        return
    length = timedelta_to_float(time_interval.right - time_interval.left)
    if np.any(release_times < 0) or np.any(release_times > length):
        warnings.warn(
            "Some particles are set to be released outside the FieldSet's executable time domain.",
            ParticleSetWarning,
            stacklevel=2,
        )


def _convert_dt_to_float(dt):
    try:
        dt = timedelta_to_float(dt)
        assert dt is not None
        sign_dt = int(np.sign(dt))
        assert sign_dt in (-1, 1)
    except (ValueError, TypeError, AssertionError) as e:
        raise ValueError(
            f"dt must be a non-zero datetime.timedelta or np.timedelta64 object, got {dt!r}"
        ) from e
    return dt, sign_dt


def _convert_runtime_to_float(runtime):
    if runtime is None:
        return None
    try:
        runtime = timedelta_to_float(runtime)
    except (ValueError, TypeError) as e:
        raise ValueError(
            f"The runtime must be a datetime.timedelta, np.timedelta64 or float object. Got {type(runtime)}"
        ) from e
    if runtime < 0:
        raise ValueError(f"The runtime must be a non-negative timedelta or float. Got {runtime!r}")
    return runtime


def _get_simulation_start_and_end_times(time_interval, release_times, runtime, endtime, sign_dt):
    """Resolve (start, end) float seconds (reference particleset.py:522-584)."""
    if runtime is not None and endtime is not None:
        raise ValueError(
            f"runtime and endtime are mutually exclusive - provide one or the other. "
            f"Got runtime={runtime!r}, endtime={endtime!r}"
        )
    if runtime is None and time_interval is None:
        raise ValueError("The runtime must be provided when the time_interval is not defined for a fieldset.")
    if runtime is None and endtime is None:
        raise ValueError("Either runtime or endtime must be provided.")

    release_times = np.asarray(release_times, dtype=np.float64)
    finite = release_times[np.isfinite(release_times)]
    if sign_dt == 1:
        first_release = finite.min() if finite.size else np.nan
    else:
        first_release = finite.max() if finite.size else np.nan

    if time_interval is not None and endtime is not None:
        if isinstance(endtime, (np.datetime64, np.timedelta64)) or type(endtime) is type(time_interval.left):
            if endtime not in time_interval:
                raise ValueError(
                    f"Provided end time {endtime!r} is not in fieldset time interval {time_interval!r}."
                )
            endtime = timedelta_to_float(endtime - time_interval.left)
        else:
            raise ValueError(
                f"The endtime must be of the same type as the fieldset.time_interval start time. "
                f"Got {endtime!r} with {time_interval!r}"
            )

    if time_interval is None:
        fieldset_start = 0.0 if sign_dt == 1 else float(runtime)
    else:
        fieldset_start = (
            0.0 if sign_dt == 1 else timedelta_to_float(time_interval.right - time_interval.left)
        )

    start_time = float(first_release) if np.isfinite(first_release) else fieldset_start
    if endtime is None:
        endtime = start_time + sign_dt * float(runtime)
    return start_time, float(endtime)
