"""End-to-end 'switching from the reference' pipeline: every stage a
GeoPolars user runs today, expressed on this engine in one flow —
multi-format read -> CRS reprojection -> geometry kernels -> spatial join ->
per-tile rollup -> CRS-stamped distributed write."""

import numpy as np
import pyarrow as pa


def test_reference_user_pipeline(ray_session, tmp_path):
    import ray

    from geopolars_ray.api import GeoDataset
    from geopolars_ray.geom import GeometryArray, encode_wkb
    from geopolars_ray.sources.io import read_geo_metadata, write_geoparquet
    from geopolars_ray.sources.shapefile import write_shapefile
    from geopolars_ray.stages.agg import hash_aggregate

    # --- fixtures: an admin shapefile + a CRS-tagged point parquet ---------
    admins = GeometryArray.from_pylist([
        ("polygon", [[(-10.0, -10.0), (10.0, -10.0), (10.0, 10.0), (-10.0, 10.0), (-10.0, -10.0)]]),
        ("polygon", [[(20.0, 20.0), (40.0, 20.0), (40.0, 40.0), (20.0, 40.0), (20.0, 20.0)]]),
    ])
    shp = str(tmp_path / "admin.shp")
    write_shapefile(
        pa.table({"admin_id": pa.array([1, 2], pa.int64()), "geometry": encode_wkb(admins)}), shp
    )

    rng = np.random.default_rng(7)
    n = 5000
    lon = rng.uniform(-15.0, 45.0, n)
    lat = rng.uniform(-15.0, 45.0, n)
    pts = GeometryArray.from_points(lon, lat)
    src = str(tmp_path / "points.parquet")
    write_geoparquet(
        pa.table({"pid": pa.array(np.arange(n)), "lon": pa.array(lon), "lat": pa.array(lat),
                  "geometry": encode_wkb(pts)}),
        src, crs="EPSG:4326",
    )

    # --- the user pipeline -------------------------------------------------
    admin_tab = pa.concat_tables(
        [ray.get(r) for r in GeoDataset.read_file(shp).dataset.to_arrow_refs() if True]
    )
    gds = GeoDataset.read_parquet(src)                      # gpl.read_file
    assert gds.crs == "EPSG:4326"
    gds = gds.area("pt_area")                               # series.geo.area (0 for points)
    joined = gds.sjoin(admin_tab, how="inner", lon_col="lon", lat_col="lat", concurrency=2)  # spatial_join
    rollup = hash_aggregate(                                # host-frame groupby
        joined.dataset.select_columns(["admin_id", "lon"]),
        keys=["admin_id"], spec=[("lon", "count", "n_pts")], num_partitions=4,
    )
    counts = {r["admin_id"]: r["n_pts"] for r in rollup.take_all()}

    in_a = ((lon > -10) & (lon < 10) & (lat > -10) & (lat < 10)).sum()
    in_b = ((lon > 20) & (lon < 40) & (lat > 20) & (lat < 40)).sum()
    assert counts[1] == in_a and counts[2] == in_b

    # reproject + CRS-stamped distributed write
    merc = GeoDataset(joined.dataset, crs="EPSG:4326").to_crs(to_crs="EPSG:3857")
    out = str(tmp_path / "out")
    merc.write_geoparquet(out)
    from pathlib import Path
    f = sorted(Path(out).glob("*.parquet"))[0]
    assert read_geo_metadata(str(f))["columns"]["geometry"]["crs"] == "EPSG:3857"
