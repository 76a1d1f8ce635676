"""Tests for tiling (S2, grid, hex) and CRS kernels (no Ray)."""

import numpy as np
import pytest

from geopolars_ray.geom import s2, tiles, crs
from geopolars_ray.geom.array import GeometryArray


def test_s2_determinism_and_level():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 10000)
    lat = rng.uniform(-90, 90, 10000)
    ids = s2.s2_cell_id(lon, lat, level=12)
    ids2 = s2.s2_cell_id(lon, lat, level=12)
    np.testing.assert_array_equal(ids, ids2)
    assert (s2.cell_level(ids) == 12).all()
    leaf = s2.s2_cell_id(lon, lat, level=30)
    assert (s2.cell_level(leaf) == 30).all()


def test_s2_hierarchy():
    """A finer cell truncated to a coarser level equals the coarser cell."""
    rng = np.random.default_rng(4)
    lon = rng.uniform(-180, 180, 5000)
    lat = rng.uniform(-85, 85, 5000)
    l12 = s2.s2_cell_id(lon, lat, level=12)
    l8 = s2.s2_cell_id(lon, lat, level=8)
    np.testing.assert_array_equal(s2.parent_at_level(l12, 8), l8)


def test_s2_locality():
    """Points in the same tiny neighborhood share a level-12 cell... mostly."""
    lon0, lat0 = 11.5819, 48.1351
    eps = 1e-7
    ids = s2.s2_cell_id(np.array([lon0, lon0 + eps]), np.array([lat0, lat0 + eps]), level=12)
    assert ids[0] == ids[1]
    # distinct far-apart points -> distinct cells
    far = s2.s2_cell_id(np.array([0.0, 90.0]), np.array([0.0, 0.0]), level=12)
    assert far[0] != far[1]


def test_s2_center_round_trip():
    """Cell 'center' decodes to a point that re-encodes to the same cell."""
    rng = np.random.default_rng(5)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-89, 89, 2000)
    ids = s2.s2_cell_id(lon, lat, level=12)
    clon, clat = s2.cell_center_lonlat(ids)
    back = s2.s2_cell_id(clon, clat, level=12)
    np.testing.assert_array_equal(back, ids)
    # and the center is geographically close to the original point
    # (level-12 cells are ~3-6 km across; 0.3 deg is a generous bound)
    assert np.abs(clat - lat).max() < 0.3


def test_s2_face_coverage():
    """All six faces are hit by axis-aligned probe points."""
    lon = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    lat = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    x, y, z = s2.lonlat_to_xyz(lon, lat)
    face, u, v = s2.xyz_to_face_uv(x, y, z)
    assert set(face.tolist()) == {0, 1, 2, 3, 4, 5}
    # probe u,v are at face centers
    np.testing.assert_allclose(u, 0, atol=1e-12)
    np.testing.assert_allclose(v, 0, atol=1e-12)


def test_grid_tile():
    lon = np.array([-180.0, 0.0, 179.5])
    lat = np.array([-90.0, 0.0, 89.5])
    t = tiles.grid_tile_id(lon, lat, cell_deg=1.0)
    assert t.tolist() == [0, 180 * 180 + 90, 359 * 180 + 179]
    lon0, lat0, lon1, lat1 = tiles.grid_tile_bounds(t, 1.0)
    assert lon0[0] == -180.0 and lat0[0] == -90.0
    assert lon1[1] == 1.0 and lat1[1] == 1.0


def test_hex_tile():
    rng = np.random.default_rng(6)
    lon = rng.uniform(-10, 10, 1000)
    lat = rng.uniform(-10, 10, 1000)
    ids = tiles.hex_tile_id(lon, lat, size_deg=0.5)
    clon, clat = tiles.hex_tile_center(ids, size_deg=0.5)
    # every point is within the hex circumradius of its tile center
    d = np.hypot(lon - clon, lat - clat)
    assert d.max() <= 0.5 + 1e-9
    # points at a center map to that hex
    back = tiles.hex_tile_id(clon, clat, size_deg=0.5)
    np.testing.assert_array_equal(back, ids)


def test_webmercator_round_trip():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-85, 85, 1000)
    x, y = crs.lonlat_to_webmercator(lon, lat)
    lon2, lat2 = crs.webmercator_to_lonlat(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    # known anchor: equator/meridian -> origin; lon 180 -> pi*R
    x0, y0 = crs.lonlat_to_webmercator(np.array([0.0, 180.0]), np.array([0.0, 0.0]))
    assert x0[0] == 0.0 and y0[0] == 0.0
    np.testing.assert_allclose(x0[1], np.pi * crs.WEBMERCATOR_R)


def test_to_crs_geometry():
    ga = GeometryArray.from_pylist([("point", (0.0, 0.0)), ("linestring", [(0.0, 0.0), (1.0, 1.0)])])
    out = crs.to_crs(ga, "EPSG:4326", "EPSG:3857")
    assert out.coords[0, 0] == 0.0
    back = crs.to_crs(out, "EPSG:3857", "EPSG:4326")
    np.testing.assert_allclose(back.coords, ga.coords, atol=1e-9)
    with pytest.raises(ValueError):
        crs.to_crs(ga, "EPSG:4326", "EPSG:32633")
