"""Geo-aware parquet IO tests."""

import numpy as np
import pyarrow as pa

from geopolars_ray.geom import GeometryArray, encode_wkb
from geopolars_ray.sources.io import (
    write_geoparquet,
    read_geo_metadata,
    read_geo_dataset,
)


def test_geo_metadata_round_trip(tmp_path):
    ga = GeometryArray.from_points(np.array([1.0, 2.0]), np.array([3.0, 4.0]))
    t = pa.table({"name": pa.array(["a", "b"]), "geometry": encode_wkb(ga)})
    p = str(tmp_path / "pts.parquet")
    write_geoparquet(t, p, crs="EPSG:3857")
    meta = read_geo_metadata(p)
    assert meta["primary_column"] == "geometry"
    assert meta["columns"]["geometry"]["crs"] == "EPSG:3857"
    assert meta["columns"]["geometry"]["encoding"] == "WKB"


def test_bbox_pushdown(ray_session, tmp_path):
    rng = np.random.default_rng(55)
    x = rng.uniform(-100, 100, 5000)
    y = rng.uniform(-50, 50, 5000)
    ga = GeometryArray.from_points(x, y)
    t = pa.table({"i": pa.array(np.arange(5000)), "geometry": encode_wkb(ga)})
    p = str(tmp_path / "pts.parquet")
    write_geoparquet(t, p)
    ds = read_geo_dataset(p, bbox=(0.0, 0.0, 50.0, 25.0))
    got = sorted(r["i"] for r in ds.take_all())
    expect = sorted(np.nonzero((x >= 0) & (x <= 50) & (y >= 0) & (y <= 25))[0].tolist())
    assert got == expect
