"""Idealized datasets for tests, tutorials and benchmarks."""

from parcels_tpu.datasets.moi import moi_like_fieldset, moi_like_inputs
from parcels_tpu.datasets.remote import list_remote_datasets, open_remote_dataset
from parcels_tpu.datasets.unstructured import delaunay_flow_dataset, fesom2_style_dataset
from parcels_tpu.datasets.structured import (
    curvilinear_rotated_dataset,
    generic_datasets,
    padded_variant_dataset,
    decaying_moving_eddy_dataset,
    moving_eddy_dataset,
    peninsula_dataset,
    radial_rotation_dataset,
    simple_UV_dataset,
    stommel_gyre_dataset,
)

__all__ = [
    "curvilinear_rotated_dataset",
    "generic_datasets",
    "moi_like_fieldset",
    "moi_like_inputs",
    "delaunay_flow_dataset",
    "fesom2_style_dataset",
    "list_remote_datasets",
    "open_remote_dataset",
    "padded_variant_dataset",
    "decaying_moving_eddy_dataset",
    "moving_eddy_dataset",
    "peninsula_dataset",
    "radial_rotation_dataset",
    "simple_UV_dataset",
    "stommel_gyre_dataset",
]
