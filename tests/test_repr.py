"""Sectioned/HTML repr tests (reference tests/test_repr_utils.py parity).

The reference ships rich sectioned reprs (_repr_utils.py:25-136) and tests
their structure; these tests assert the same capability on the TPU build's
independent (title, sections) formatter (parcels_tpu/_repr.py).
"""

import numpy as np

from parcels_tpu import FieldSet, ParticleFile, ParticleSet
from parcels_tpu._repr import format_sections, html_sections
from parcels_tpu.datasets import moving_eddy_dataset


def _fs():
    return FieldSet.from_sgrid_conventions(moving_eddy_dataset(), mesh="flat")


def test_format_sections_structure():
    out = format_sections("Thing", [("alpha", ["a1", "a2"]), ("empty", []), ("beta", ["b"])])
    lines = out.splitlines()
    assert lines[0] == "<Thing>"
    assert "    alpha:" in lines
    assert "        a1" in lines
    assert "    beta:" in lines
    # empty sections are omitted entirely
    assert not any("empty" in ln for ln in lines)


def test_html_sections_escapes_and_titles():
    out = html_sections("T<x>", [("sec", ["a<b>&c"])])
    assert "&lt;T&lt;x&gt;&gt;" in out
    assert "a&lt;b&gt;&amp;c" in out
    assert "<details" in out and "</details>" in out


def test_fieldset_repr_sectioned():
    fs = _fs()
    r = repr(fs)
    assert r.startswith("<FieldSet>")
    assert "vectorfields:" in r
    assert "UV" in r
    assert "grids:" in r and "XGrid(" in r
    h = fs._repr_html_()
    assert "UV" in h and "<details" in h


def test_field_and_vectorfield_repr_html():
    fs = _fs()
    u = fs.fields["U"]
    assert "Field(name='U'" in repr(u)
    h = u._repr_html_()
    assert "interp_method" in h and "U" in h
    uv = fs.fields["UV"]
    hv = uv._repr_html_()
    assert "components" in hv and "vector_type" in hv


def test_particleset_repr_truncates_sample():
    fs = _fs()
    pset = ParticleSet(fs, x=np.full(20, 12000.0), y=np.full(20, 12000.0))
    import io

    buf = io.StringIO()
    pset.describe(buf)
    out = buf.getvalue()
    assert out.startswith("<ParticleSet>")
    assert "bounds:" in out and "x: min=" in out
    assert "... (13 more)" in out  # 7 shown of 20
    h = pset._repr_html_()
    assert "particles" in h and "Particle(" in h


def test_grid_and_particlefile_repr_html(tmp_path):
    fs = _fs()
    g = fs.gridset[0]
    assert "offset_x" in g._repr_html_()
    pf = ParticleFile(tmp_path / "t.parquet", outputdt=np.timedelta64(10, "m"), mode="w")
    assert "outputdt" in pf._repr_html_()
    assert "ParticleFile(" in repr(pf)
