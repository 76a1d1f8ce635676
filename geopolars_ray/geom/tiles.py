"""Tile-id kernels: lat/lon grid tiles and planar hex binning.

The tile id is the engine's partitioning key (SURVEY.md §7): every per-tile
rollup, partitioned spatial join, and resumable output layout keys on one of
these columns. Three interchangeable tilings:

- :func:`grid_tile_id` — rectangular lat/lon grid. Exactly expressible in
  ANSI SQL (floor arithmetic), so it anchors the DuckDB oracle checks.
- :func:`geopolars_ray.geom.s2.s2_cell_id` — S2 cells (hierarchical,
  equal-ish area); the scale path.
- :func:`hex_tile_id` — planar hexagonal binning (axial coordinates with
  cube rounding) over lon/lat treated as a plane. A real hex-bin operator
  like H3-based rollups use; NOT H3-compatible ids (no icosahedron), which
  is documented and acceptable because the tile-id column is abstract —
  any deterministic space partition satisfies the rollup/join contract.
"""

from __future__ import annotations

import numpy as np


def grid_tile_id(lon: np.ndarray, lat: np.ndarray, cell_deg: float = 1.0) -> np.ndarray:
    """Rectangular tile id: row-major index on a lat/lon grid.

    tile = floor((lon+180)/cell) * ceil(180/cell) + floor((lat+90)/cell)

    SQL-equivalent (DuckDB)::

        CAST(floor((lon+180)/cell) * ceil(180/cell) + floor((lat+90)/cell) AS BIGINT)
    """
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    ny = int(np.ceil(180.0 / cell_deg))
    ix = np.floor((lon + 180.0) / cell_deg)
    iy = np.floor((lat + 90.0) / cell_deg)
    return (ix * ny + iy).astype(np.int64)


def grid_tile_bounds(tile_id: np.ndarray, cell_deg: float = 1.0) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(lon_min, lat_min, lon_max, lat_max) of each grid tile."""
    tile_id = np.asarray(tile_id, np.int64)
    ny = int(np.ceil(180.0 / cell_deg))
    ix = tile_id // ny
    iy = tile_id % ny
    lon0 = ix * cell_deg - 180.0
    lat0 = iy * cell_deg - 90.0
    return lon0, lat0, lon0 + cell_deg, lat0 + cell_deg


def hex_tile_id(lon: np.ndarray, lat: np.ndarray, size_deg: float = 0.5) -> np.ndarray:
    """Hexagonal bin id via axial coordinates + cube rounding (pointy-top).

    Treats (lon, lat) as a plane; ``size_deg`` is the hex circumradius in
    degrees. Returns ``q * 2^32 + r`` packed axial coordinates (offset to
    stay positive). Deterministic, not SQL-expressible (rows-only oracle).
    """
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    # pointy-top axial: q = (sqrt(3)/3 x - 1/3 y) / s ; r = (2/3 y) / s
    q = (np.sqrt(3.0) / 3.0 * lon - lat / 3.0) / size_deg
    r = (2.0 / 3.0 * lat) / size_deg
    # cube rounding
    x, z = q, r
    y = -x - z
    rx, ry, rz = np.round(x), np.round(y), np.round(z)
    dx, dy, dz = np.abs(rx - x), np.abs(ry - y), np.abs(rz - z)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    qi = rx.astype(np.int64) + (1 << 20)
    ri = rz.astype(np.int64) + (1 << 20)
    return qi * (1 << 32) + ri


def hex_tile_center(tile_id: np.ndarray, size_deg: float = 0.5) -> tuple[np.ndarray, np.ndarray]:
    """Center (lon, lat) of each hex tile id."""
    tile_id = np.asarray(tile_id, np.int64)
    q = (tile_id // (1 << 32)) - (1 << 20)
    r = (tile_id % (1 << 32)) - (1 << 20)
    lon = size_deg * (np.sqrt(3.0) * q + np.sqrt(3.0) / 2.0 * r)
    lat = size_deg * (1.5 * r)
    return lon, lat
