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


def test_geojson_roundtrip_featurecollection(ray_session, tmp_path):
    """write_geojson -> read_geojson preserves WKB bytes + properties."""
    import numpy as np
    import pyarrow as pa
    from geopolars_ray.geom import GeometryArray, encode_wkb
    from geopolars_ray.sources.geojson import read_geojson, write_geojson

    ga = GeometryArray.from_pylist([
        ("point", (1.5, 2.5)),
        ("linestring", [(0.0, 0.0), (3.0, 4.0)]),
        ("polygon", [[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 0.0)]]),
        ("multipolygon", [[[(5.0, 5.0), (6.0, 5.0), (6.0, 6.0), (5.0, 5.0)]]]),
    ])
    tab = pa.table({"name": pa.array(["a", "b", "c", "d"]), "geometry": encode_wkb(ga)})
    p = str(tmp_path / "fc.geojson")
    write_geojson(tab, p)
    out = read_geojson(p).to_pandas().sort_values("name").reset_index(drop=True)
    assert out["name"].tolist() == ["a", "b", "c", "d"]
    got = [bytes(b) for b in out["geometry"]]
    want = [bytes(b.as_py()) for b in tab["geometry"]]
    assert got == want


def test_geojsonl_scale_path_with_pushdown(ray_session, tmp_path):
    """NDJSON features via ray.data.read_text; columns + bbox pushdown."""
    import numpy as np
    import pyarrow as pa
    from geopolars_ray.geom import GeometryArray, decode_wkb, encode_wkb
    from geopolars_ray.sources.geojson import read_geojson, write_geojsonl

    n = 500
    x = np.linspace(-50.0, 50.0, n)
    y = np.linspace(-25.0, 25.0, n)
    ga = GeometryArray.from_points(x, y)
    tab = pa.table({
        "fid": pa.array(np.arange(n, dtype=np.int64)),
        "extra": pa.array(["e%d" % i for i in range(n)]),
        "geometry": encode_wkb(ga),
    })
    p = str(tmp_path / "pts.geojsonl")
    write_geojsonl(tab, p)
    out = read_geojson(p, columns=["fid"], bbox=(-10.0, -10.0, 10.0, 10.0))
    df = out.to_pandas()
    assert set(df.columns) == {"fid", "geometry"}
    keep = (x >= -10.0) & (x <= 10.0) & (y >= -10.0) & (y <= 10.0)
    assert sorted(df["fid"].tolist()) == np.nonzero(keep)[0].tolist()
