"""Shared grid base class.

Capability parity with the reference's ``_core/basegrid.py:25-278``: the
common interface of :class:`XGrid` and :class:`UxGrid` — axis list,
flat/spherical mesh, ravel/unravel of per-axis cell indices into the cached
scalar element index ``ei``, and a host-side ``search`` convenience.

The reference's lazy ``SpatialHash`` accessor (basegrid.py:192-216) has no
slot here by design: cold-start lookup on this build is a precomputed raster
table shipped with the grid's device arrays (see
``grid._build_curvilinear_lookup`` / ``uxgrid._build_face_lookup``), not an
on-demand Morton CSR hash — pointer-chasing hash probes don't map to TPU.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np


class BaseGrid(ABC):
    """Base class for :class:`parcels_tpu.XGrid` and :class:`parcels_tpu.UxGrid`.

    Defines the methods and properties the engine relies on for any grid
    (reference basegrid.py:25-31).
    """

    axes: list[str]

    @property
    @abstractmethod
    def mesh(self):
        """The flat/spherical mesh geometry of the grid."""

    @abstractmethod
    def ravel_index(self, zi, yi, xi):
        """Combine per-axis cell indices into the scalar element index ``ei``
        (reference basegrid.py:83-117)."""

    @abstractmethod
    def unravel_index(self, ei):
        """Split ``ei`` back into per-axis cell indices ``(zi, yi, xi)``
        (reference basegrid.py:119-152)."""

    @abstractmethod
    def device_arrays(self, dtype=np.float32) -> dict:
        """Coordinate/lookup arrays to ship to device as part of the field pytree."""

    @abstractmethod
    def lookup_meta(self) -> dict | None:
        """Static metadata of the cold-start lookup raster (origin/step), if any."""

    @abstractmethod
    def make_view(self, garrs: dict):
        """Traced grid view over device arrays for the jitted engine."""

    @abstractmethod
    def _search_device(self, garrs: dict, z, y, x, ei):
        """Device search returning ``{axis: {"index", "bcoord"}}`` of jnp arrays."""

    def _cached_device_arrays(self) -> dict:
        garrs = getattr(self, "_garrs_cache", None)
        if garrs is None:
            garrs = self.device_arrays()
            self._garrs_cache = garrs
        return garrs

    def search(self, z, y, x, ei=None) -> dict:
        """Locate point(s) on the grid — host-side convenience.

        Mirrors the reference's ``BaseGrid.search`` contract
        (basegrid.py:31-80): returns ``{axis: {"index", "bcoord"}}`` with
        axes ``Z/Y/X`` on structured grids and ``Z/FACE`` on unstructured
        ones, as numpy arrays. Negative indices are the search sentinels
        (−1 right-OOB, −2 left-OOB/through-surface, −3 search error; see
        ``index_search``). Scalars are promoted to length-1 arrays. ``ei``
        warm-starts the horizontal search from a previously returned raveled
        element index.
        """
        import jax.numpy as jnp

        z, y, x = (jnp.atleast_1d(jnp.asarray(v, jnp.float32)) for v in (z, y, x))
        if ei is not None:
            ei = jnp.atleast_1d(jnp.asarray(ei, jnp.int32))
        res = self._search_device(self._cached_device_arrays(), z, y, x, ei)
        return {
            ax: {"index": np.asarray(v["index"]), "bcoord": np.asarray(v["bcoord"])}
            for ax, v in res.items()
        }


__all__ = ["BaseGrid"]
