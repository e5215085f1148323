import pytest

from parcels_tpu import FieldSet
from parcels_tpu.datasets import simple_UV_dataset


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
