"""Host-side SGRID-convention metadata handling.

Implements the subset of the public SGRID conventions
(https://sgrid.github.io/sgrid/) needed to describe staggered structured
grids: node/face dimension pairs with padding, optional vertical dimension,
and (de)serialization to a ``grid`` variable's attrs. Capability parity with
reference src/parcels/_sgrid/core.py, reimplemented compactly — the heavy
ASCII-diagram/paired-isel accessor machinery of the reference is not needed
on the TPU side, where all staggering is folded into static integer offsets
at ingest time.
"""

from __future__ import annotations

import enum
import re
from dataclasses import dataclass
from typing import Literal

from parcels_tpu import xrlite as xr

__all__ = [
    "FaceNodePadding",
    "Padding",
    "SGrid2DMetadata",
    "attach_sgrid_metadata",
    "get_n_faces",
    "get_n_nodes",
    "parse_sgrid_metadata",
]

_RE_FACE_NODE_PADDING = r"(\w+):(\w+)\s*\(padding:\s*(\w+)\)"


class Padding(enum.Enum):
    NONE = "none"
    LOW = "low"
    HIGH = "high"
    BOTH = "both"


def get_n_faces(n_nodes: int, padding: Padding) -> int:
    if padding in (Padding.LOW, Padding.HIGH):
        return n_nodes
    if padding == Padding.NONE:
        return n_nodes - 1
    if padding == Padding.BOTH:
        return n_nodes + 1
    raise ValueError(f"Invalid {padding=!r}")


def get_n_nodes(n_faces: int, padding: Padding) -> int:
    if padding in (Padding.LOW, Padding.HIGH):
        return n_faces
    if padding == Padding.NONE:
        return n_faces + 1
    if padding == Padding.BOTH:
        return n_faces - 1
    raise ValueError(f"Invalid {padding=!r}")


@dataclass(frozen=True)
class FaceNodePadding:
    """face/node dimension pair plus the SGRID padding relation between them."""

    face: str
    node: str
    padding: Padding

    def __str__(self):
        return f"{self.face}:{self.node} (padding:{self.padding.value})"

    @classmethod
    def load(cls, s: str) -> "FaceNodePadding":
        m = re.match(_RE_FACE_NODE_PADDING, s)
        if not m:
            raise ValueError(f"String {s!r} does not match 'face:node (padding: p)' format")
        return cls(m.group(1), m.group(2), Padding(m.group(3).lower()))


def _load_pairs(s: str) -> tuple:
    """Parse a whitespace-joined list of FaceNodePadding or bare dims."""
    parts = []
    tokens = re.findall(_RE_FACE_NODE_PADDING + r"|(\S+)", s)
    for face, node, padding, bare in tokens:
        if bare:
            parts.append(bare)
        else:
            parts.append(FaceNodePadding(face, node, Padding(padding.lower())))
    return tuple(parts)


@dataclass(frozen=True)
class SGrid2DMetadata:
    """2-D (optionally layered) SGRID topology description."""

    node_dimensions: tuple[str, str]
    face_dimensions: tuple[FaceNodePadding, FaceNodePadding]
    node_coordinates: tuple[str, str] | None = None
    vertical_dimensions: tuple[FaceNodePadding] | None = None
    cf_role: str = "grid_topology"
    topology_dimension: int = 2

    def to_attrs(self) -> dict:
        d = {
            "cf_role": self.cf_role,
            "topology_dimension": self.topology_dimension,
            "node_dimensions": " ".join(self.node_dimensions),
            "face_dimensions": " ".join(str(f) for f in self.face_dimensions),
        }
        if self.node_coordinates is not None:
            d["node_coordinates"] = " ".join(self.node_coordinates)
        if self.vertical_dimensions is not None:
            d["vertical_dimensions"] = " ".join(str(f) for f in self.vertical_dimensions)
        return d

    @classmethod
    def from_attrs(cls, attrs: dict) -> "SGrid2DMetadata":
        node_dims = tuple(str(attrs["node_dimensions"]).split())
        face_dims = _load_pairs(str(attrs["face_dimensions"]))
        node_coords = attrs.get("node_coordinates")
        if node_coords is not None:
            node_coords = tuple(str(node_coords).split())
        vert = attrs.get("vertical_dimensions")
        if vert is not None:
            vert = _load_pairs(str(vert))
        return cls(
            node_dimensions=node_dims,  # type: ignore[arg-type]
            face_dimensions=face_dims,  # type: ignore[arg-type]
            node_coordinates=node_coords,  # type: ignore[arg-type]
            vertical_dimensions=vert,  # type: ignore[arg-type]
        )

    # -- convenience lookups ------------------------------------------------
    def dim_to_axis(self) -> dict[str, Literal["X", "Y", "Z"]]:
        fnp_x, fnp_y = self.face_dimensions
        d = {fnp_x.node: "X", fnp_x.face: "X", fnp_y.node: "Y", fnp_y.face: "Y"}
        if self.vertical_dimensions is not None:
            fnp_z = self.vertical_dimensions[0]
            d.update({fnp_z.node: "Z", fnp_z.face: "Z"})
        return d  # type: ignore[return-value]

    def dim_position(self, dim: str) -> "Literal['face'] | Padding":
        """'face' if ``dim`` is a face dimension, else the node padding."""
        for fnp in list(self.face_dimensions) + list(self.vertical_dimensions or ()):
            if dim == fnp.face:
                return "face"
            if dim == fnp.node:
                return fnp.padding
        raise ValueError(f"Dimension {dim!r} is not a spatial SGRID dimension in this grid.")

    def axis_padding(self, axis: str) -> Padding:
        fnp_x, fnp_y = self.face_dimensions
        if axis == "X":
            return fnp_x.padding
        if axis == "Y":
            return fnp_y.padding
        if axis == "Z" and self.vertical_dimensions is not None:
            return self.vertical_dimensions[0].padding
        raise ValueError(f"No padding for axis {axis!r}")


def attach_sgrid_metadata(ds: xr.Dataset, grid: SGrid2DMetadata) -> xr.Dataset:
    """Copy the dataset and attach SGRID metadata as a ``grid`` variable."""
    ds = ds.copy()
    ds["grid"] = ([], 0, grid.to_attrs())
    ds.attrs["Conventions"] = "SGRID"
    return ds


def parse_sgrid_metadata(ds: xr.Dataset) -> SGrid2DMetadata:
    """Find the grid_topology variable in ``ds`` and parse its SGRID attrs."""
    for var in ds.variables.values():
        if var.attrs.get("cf_role") == "grid_topology":
            return SGrid2DMetadata.from_attrs(var.attrs)
    raise ValueError(
        "Dataset has no variable with cf_role='grid_topology'; cannot parse SGRID metadata."
    )
