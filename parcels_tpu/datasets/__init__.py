"""Idealized datasets for tests, tutorials and benchmarks."""

from parcels_tpu.datasets.moi import moi_like_fieldset, moi_like_inputs
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
    "padded_variant_dataset",
    "decaying_moving_eddy_dataset",
    "moving_eddy_dataset",
    "peninsula_dataset",
    "radial_rotation_dataset",
    "simple_UV_dataset",
    "stommel_gyre_dataset",
]
