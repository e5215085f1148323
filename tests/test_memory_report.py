"""HBM budget accounting (VERDICT r2 weak #4 / next #4).

The flagship MOi grid's search tables and field windows must be budgeted
BEFORE an opaque device OOM: FieldSet.memory_report is analytic (no table
materialization), and describe() surfaces the total.
"""

import io

import pytest

from parcels_tpu import FieldSet
from parcels_tpu.datasets import simple_UV_dataset
from parcels_tpu.datasets.moi import moi_like_fieldset


def test_memory_report_small_grid_matches_actual():
    ds = simple_UV_dataset(dims=(4, 3, 40, 50), mesh="flat")
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    rep = fs.memory_report(particles=1000)
    assert rep["fields"]["U"] == 4 * 3 * 40 * 50 * 4
    assert rep["fields"]["V"] == rep["fields"]["U"]
    assert rep["soa"] == 1000 * 4 * (13 + len(fs.gridset))
    assert rep["total"] > 0 and rep["fits"]


def test_memory_report_windowed_counts_window_levels():
    ds = simple_UV_dataset(dims=(8, 3, 40, 50), mesh="flat")
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    full = fs.memory_report()["fields"]["U"]
    fs.set_time_window(2)
    win = fs.memory_report()["fields"]["U"]
    assert win == full // 4  # 2 of 8 levels


def test_memory_report_curvilinear_tables():
    fs = moi_like_fieldset(xdim=96, ydim=64, zdim=4)
    rep = fs.memory_report()
    g = rep["grids"][0]
    spec = fs.gridset[0].spec
    assert g["pic_table"] == spec.ydim * spec.xdim * 16 * 4
    assert g["cgrid_geom"] == spec.ydim * spec.xdim * 9 * 4
    assert g["lookup"] > 0


def test_describe_includes_memory_line():
    fs = moi_like_fieldset(xdim=96, ydim=64, zdim=4)
    buf = io.StringIO()
    fs.describe(buf)
    assert "device memory:" in buf.getvalue()


@pytest.mark.slow
def test_memory_report_true_moi_resolution():
    """At the real 1/12-degree MOi grid (4322 x 3059, 50 z, 2-level window)
    a single chip is over budget; 8-way banding fits. The report must say so
    WITHOUT materializing the ~845 MB pic table."""
    fs = moi_like_fieldset(xdim=4322, ydim=3059, zdim=50, zero_data=True)
    assert fs._gridset[0].spec.curvilinear
    # the report is analytic: no cached tables may appear as a side effect
    rep = fs.memory_report(particles=10_000_000)
    assert getattr(fs.gridset[0], "_pic_table_cache", None) is None
    assert getattr(fs.gridset[0], "_cgrid_geom_cache", None) is None

    g = rep["grids"][0]
    assert g["pic_table"] > 800 * 2**20  # ~845 MB of search table alone
    assert not rep["fits"], rep["total"]

    banded = fs.memory_report(particles=10_000_000 // 8, bands=8)
    assert banded["total"] < rep["total"] / 4
    assert banded["fits"], banded["total"]
