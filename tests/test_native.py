"""Native (C++) mesh-preprocessing accelerators vs. the Python fallbacks."""

import numpy as np
import pytest

from parcels_tpu import native
from parcels_tpu.datasets.unstructured import _delaunay_mesh


@pytest.fixture(scope="module")
def mesh():
    return _delaunay_mesh(25, 25, 1e5, seed=4)


def test_native_lib_compiles():
    assert native.get_lib() is not None, "g++ is available in this image; native must build"


def test_adjacency_matches_python(mesh):
    node_lon, node_lat, conn = mesh
    native_adj = native.build_face_adjacency(conn)
    assert native_adj is not None

    # reference pure-Python construction
    n_face = conn.shape[0]
    edge_owner = {}
    py_adj = np.full((n_face, 3), -1, dtype=np.int32)
    for f in range(n_face):
        for k in range(3):
            a, b = conn[f, (k + 1) % 3], conn[f, (k + 2) % 3]
            key = (min(a, b), max(a, b))
            if key in edge_owner:
                g, j = edge_owner.pop(key)
                py_adj[f, k] = g
                py_adj[g, j] = f
            else:
                edge_owner[key] = (f, k)
    np.testing.assert_array_equal(native_adj, py_adj)


def test_raster_covers_and_agrees_with_point_location(mesh):
    node_lon, node_lat, conn = mesh
    lat_min, lat_max = node_lat.min() - 1, node_lat.max() + 1
    lon_min, lon_max = node_lon.min() - 1, node_lon.max() + 1
    ny = nx = 64
    step_y = (lat_max - lat_min) / ny
    step_x = (lon_max - lon_min) / nx
    tbl = native.rasterize_faces(
        node_lon, node_lat, conn, lat_min, lon_min, step_y, step_x, ny, nx
    )
    assert tbl is not None
    covered = tbl >= 0
    assert covered.mean() > 0.8  # interior cells are covered

    # every covered cell's face really contains its center
    ry, rx = np.nonzero(covered)
    py = lat_min + (ry + 0.5) * step_y
    px = lon_min + (rx + 0.5) * step_x
    f = tbl[ry, rx]
    txc = node_lon[conn[f]]
    tyc = node_lat[conn[f]]
    a = (txc[:, 1] - txc[:, 0]) * (tyc[:, 2] - tyc[:, 0]) - (tyc[:, 1] - tyc[:, 0]) * (
        txc[:, 2] - txc[:, 0]
    )
    b0 = ((txc[:, 1] - px) * (tyc[:, 2] - py) - (tyc[:, 1] - py) * (txc[:, 2] - px)) / a
    b1 = ((txc[:, 2] - px) * (tyc[:, 0] - py) - (tyc[:, 2] - py) * (txc[:, 0] - px)) / a
    b2 = 1 - b0 - b1
    assert (np.stack([b0, b1, b2]) >= -1e-6).all()
