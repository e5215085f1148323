"""Non-standard CF calendar support (reference _core/utils/time.py:122-163).

The reference handles 360_day/noleap/all_leap/julian model calendars via
cftime; parcels_tpu implements the same date math in
``parcels_tpu._core.calendars`` (cftime is not in this environment).
Property tests mirror the reference's hypothesis strategies
(_strategies/time.py:29-58); the e2e test round-trips a 360_day fieldset
through advection and the ParticleFile CF metadata, the capability the
reference exercises in tests/test_particlefile.py via
assert_cftime_like_particlefile.
"""

from datetime import timedelta

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parcels_tpu._core.calendars import CALENDARS, CFDatetime, parse_cf_origin
from parcels_tpu._core.timeutils import TimeInterval

cf_calendar = st.sampled_from(list(CALENDARS) + ["noleap", "all_leap", "standard"])


@st.composite
def cf_datetimes(draw, calendar=None):
    if calendar is None:
        calendar = draw(cf_calendar)
    return CFDatetime(
        draw(st.integers(1900, 2100)),
        draw(st.integers(1, 12)),
        draw(st.integers(1, 28)),
        draw(st.integers(0, 23)),
        draw(st.integers(0, 59)),
        draw(st.integers(0, 59)),
        calendar=calendar,
    )


@given(cf_datetimes(), st.integers(1, 60 * 60 * 24 * 365 * 100))
@settings(max_examples=200, deadline=None)
def test_add_then_subtract_roundtrip(dt, secs):
    delta = timedelta(seconds=secs)
    moved = dt + delta
    assert moved.calendar == dt.calendar
    assert (moved - dt) == delta
    assert (moved - delta) == dt
    assert moved > dt


@given(cf_datetimes())
@settings(max_examples=200, deadline=None)
def test_cf_origin_roundtrip(dt):
    attrs_origin = dt.isoformat()
    back = parse_cf_origin(attrs_origin, dt.calendar)
    assert back == dt


@given(cf_datetimes(calendar="360_day"), st.integers(-500, 500))
@settings(max_examples=100, deadline=None)
def test_360_day_every_month_has_30_days(dt, months):
    moved = dt + timedelta(days=30 * months)
    assert (moved.month - dt.month) % 12 == months % 12
    assert moved.day == dt.day


def test_fixed_calendar_year_lengths():
    for calendar, length in (("360_day", 360), ("365_day", 365), ("366_day", 366)):
        a = CFDatetime(2001, 1, 1, calendar=calendar)
        assert (CFDatetime(2002, 1, 1, calendar=calendar) - a) == timedelta(days=length)


def test_noleap_skips_feb29():
    a = CFDatetime(2000, 2, 28, calendar="noleap")
    assert (a + timedelta(days=1)).isoformat() == "2000-03-01 00:00:00"
    with pytest.raises(ValueError):
        CFDatetime(2000, 2, 29, calendar="noleap")


def test_julian_vs_gregorian_leap_rules():
    # 1900 is leap on the Julian calendar, not on the (proleptic) Gregorian
    assert CFDatetime(1900, 2, 29, calendar="julian")
    with pytest.raises(ValueError):
        CFDatetime(1900, 2, 29, calendar="proleptic_gregorian")
    # 2000 is leap on both
    assert CFDatetime(2000, 2, 29, calendar="proleptic_gregorian")


def test_standard_calendar_cutover():
    """The mixed civil calendar jumps 1582-10-04 -> 1582-10-15."""
    a = CFDatetime(1582, 10, 4, calendar="standard")
    assert (a + timedelta(days=1)).isoformat() == "1582-10-15 00:00:00"
    with pytest.raises(ValueError):
        CFDatetime(1582, 10, 9, calendar="standard")
    # proleptic_gregorian has no gap
    assert CFDatetime(1582, 10, 9, calendar="proleptic_gregorian")


def test_modern_julian_offset_is_13_days():
    g = CFDatetime(2000, 1, 14, calendar="proleptic_gregorian")
    j = CFDatetime(2000, 1, 1, calendar="julian")
    # same physical instant: days-since-epoch must agree
    from parcels_tpu._core.calendars import _to_days

    assert _to_days("proleptic_gregorian", g.year, g.month, g.day) == _to_days(
        "julian", j.year, j.month, j.day
    )


def test_cross_calendar_operations_rejected():
    a = CFDatetime(2000, 1, 1, calendar="360_day")
    b = CFDatetime(2000, 1, 1, calendar="noleap")
    with pytest.raises(TypeError):
        a - b
    with pytest.raises(TypeError):
        a < b


@given(cf_datetimes(), st.integers(60, 60 * 60 * 24 * 365))
@settings(max_examples=50, deadline=None)
def test_time_interval_with_cf_datetimes(dt, secs):
    """TimeInterval accepts CFDatetime endpoints (reference strategy
    _strategies/time.py:52-58)."""
    iv = TimeInterval(dt, dt + timedelta(seconds=secs))
    assert iv.time_length_as_flt == pytest.approx(secs)
    attrs = iv.get_cf_attrs()
    assert attrs["calendar"] == dt.calendar
    assert attrs["units"].startswith("seconds since ")


def test_360day_fieldset_end_to_end(tmp_path):
    """A 360_day-calendar fieldset advects and the trajectory file
    round-trips the calendar through CF metadata."""
    from parcels_tpu import FieldSet, ParticleFile, ParticleSet, read_particlefile
    from parcels_tpu import xrlite as xr
    from parcels_tpu.datasets.structured import _coords_2d, _wrap_sgrid
    from parcels_tpu.kernels import AdvectionEE

    xdim = ydim = 8
    lon = np.linspace(0, 1e6, xdim)
    lat = np.linspace(0, 1e6, ydim)
    t0 = CFDatetime(2000, 2, 25, calendar="360_day")
    time = np.asarray([t0 + timedelta(days=10 * i) for i in range(4)], dtype=object)
    U = np.full((4, 1, ydim, xdim), 1.0, np.float32)
    V = np.zeros((4, 1, ydim, xdim), np.float32)
    ds = xr.Dataset(
        {"U": (["time", "depth", "YG", "XG"], U), "V": (["time", "depth", "YG", "XG"], V)},
        coords=_coords_2d(lon, lat, time=time, depth=np.array([0.0]), mesh="flat"),
    )
    ds = _wrap_sgrid(ds, xdim, ydim)
    fs = FieldSet.from_sgrid_conventions(ds, mesh="flat")
    assert isinstance(fs.time_interval.left, CFDatetime)

    pset = ParticleSet(fs, x=[1e5], y=[5e5], t=[0.0])
    path = tmp_path / "cal.parquet"
    pf = ParticleFile(path, outputdt=np.timedelta64(6, "h"), mode="w")
    pset.execute(
        AdvectionEE,
        dt=np.timedelta64(1, "h"),
        runtime=np.timedelta64(1, "D"),
        output_file=pf,
    )
    pf.close()
    np.testing.assert_allclose(pset.x, 1e5 + 86400.0, rtol=1e-6)

    df = read_particlefile(path)
    times = df["t"].to_numpy()
    assert all(isinstance(t, CFDatetime) for t in times)
    assert all(t.calendar == "360_day" for t in times)
    assert min(times) == t0
    # 2000-02-25 + 24h on a 360_day calendar lands inside Feb 25..26
    assert max(times) == t0 + timedelta(days=1)
