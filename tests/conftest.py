import pytest

from parcels_tpu import FieldSet
from parcels_tpu.datasets import simple_UV_dataset


@pytest.fixture(autouse=True)
def _reset_z_occupancy_hint():
    """Scope the process-wide occupancy default to each test.

    Executors thread the hint explicitly (it's in their cache key), but
    direct planner calls (sort_key_for/slab_geometry without z_occ) fall
    back to the module default — a leftover hint from another test would
    silently change their plans."""
    from parcels_tpu.ops import binned_sample

    binned_sample.set_z_occupancy_hint(1.0)
    yield
    binned_sample.set_z_occupancy_hint(1.0)


@pytest.fixture
def fieldset() -> FieldSet:
    """Flat 2-D A-grid fieldset with zero velocity."""
    ds = simple_UV_dataset(dims=(2, 2, 20, 20), mesh="flat")
    return FieldSet.from_sgrid_conventions(ds, mesh="flat")


@pytest.fixture
def tmp_parquet(tmp_path):
    return tmp_path / "particles.parquet"


def uniform_flow_fieldset(u=1.0, v=0.0, mesh="flat", dims=(2, 2, 20, 20)) -> FieldSet:
    ds = simple_UV_dataset(dims=dims, mesh=mesh)
    ds["U"].values[:] = u
    ds["V"].values[:] = v
    return FieldSet.from_sgrid_conventions(ds, mesh=mesh)
