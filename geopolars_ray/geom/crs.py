"""Coordinate reprojection (`to_crs`) — closed-form WGS84 <-> WebMercator.

The reference reprojects point-wise through a PROJ pipeline
(``/root/reference/geopolars/geopolars-geo/src/ops/proj.rs:33-70``), carrying
CRS as explicit from/to arguments because Polars can't persist extension
metadata (``geoseries.rs:148-161``). No PROJ is available here, so the two
CRSs the pipelines need (EPSG:4326 lon/lat and EPSG:3857 WebMercator) are
implemented closed-form; like the reference, transformation is point-wise
with no densification (same documented dateline caveat).
"""

from __future__ import annotations

import numpy as np

from geopolars_ray.geom.array import GeometryArray

WEBMERCATOR_R = 6378137.0
_MAX_LAT = 85.051128779806604  # atan(sinh(pi)) in degrees — WebMercator clamp


def _norm(crs: str) -> str:
    c = crs.upper().replace(" ", "")
    aliases = {
        "EPSG:4326": "EPSG:4326",
        "WGS84": "EPSG:4326",
        "CRS84": "EPSG:4326",
        "OGC:CRS84": "EPSG:4326",
        "EPSG:3857": "EPSG:3857",
        "WEBMERCATOR": "EPSG:3857",
        "EPSG:900913": "EPSG:3857",
    }
    if c not in aliases:
        raise ValueError(f"unsupported CRS {crs!r} (supported: EPSG:4326, EPSG:3857)")
    return aliases[c]


def lonlat_to_webmercator(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lon = np.asarray(lon, np.float64)
    lat = np.clip(np.asarray(lat, np.float64), -_MAX_LAT, _MAX_LAT)
    x = WEBMERCATOR_R * np.radians(lon)
    y = WEBMERCATOR_R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def webmercator_to_lonlat(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    lon = np.degrees(x / WEBMERCATOR_R)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / WEBMERCATOR_R)) - np.pi / 2.0)
    return lon, lat


def to_crs(ga: GeometryArray, from_crs: str, to_crs: str) -> GeometryArray:
    """Reproject every coordinate (`geoseries.rs:148-161` semantics)."""
    f, t = _norm(from_crs), _norm(to_crs)
    if f == t:
        return ga
    x, y = ga.coords[:, 0], ga.coords[:, 1]
    if f == "EPSG:4326":
        nx, ny = lonlat_to_webmercator(x, y)
    else:
        nx, ny = webmercator_to_lonlat(x, y)
    return ga.with_coords(np.column_stack([nx, ny]))
