"""Tests: zonal statistics (points x zones, raster tiles x zones).

Oracles: DuckDB replays the rectangle-zone PIP + aggregate for the point
path; the raster path is checked against a dense numpy brute force over
cell centers and cross-checked against raster_to_points + zonal_stats.
"""

import duckdb
import numpy as np
import pyarrow as pa

from geopolars_ray.geom import GeometryArray, encode_wkb


def _rect_zones(rects):
    """rects: list of (zone_id, x0, y0, x1, y1) -> Arrow zone table."""
    polys = GeometryArray.from_pylist(
        [
            ("polygon", [[(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]])
            for _, x0, y0, x1, y1 in rects
        ]
    )
    return pa.table(
        {"zone_id": pa.array([r[0] for r in rects]), "geometry": encode_wkb(polys)}
    )


RECTS = [
    ("west", -40.0, -20.0, -5.0, 25.0),
    ("east", 0.0, -10.0, 35.0, 30.0),     # overlaps "north" on purpose
    ("north", -10.0, 20.0, 20.0, 45.0),
]


def test_zonal_stats_points_oracle(ray_session):
    import ray
    from geopolars_ray.stages.raster import zonal_stats

    rng = np.random.default_rng(47)
    n = 30000
    lon = rng.uniform(-50, 50, n)
    lat = rng.uniform(-50, 50, n)
    val = rng.uniform(-5, 5, n)
    pts = pa.table({"lon": pa.array(lon), "lat": pa.array(lat), "v": pa.array(val)})

    out = (
        zonal_stats(
            ray.data.from_arrow(pts).repartition(8),
            _rect_zones(RECTS),
            value_col="v",
            stats=("count", "sum", "mean", "min", "max"),
            concurrency=2,
        )
        .to_pandas()
        .sort_values("zone_id")
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.register("pts", pts)
    zones = pa.table(
        {
            "zone_id": pa.array([r[0] for r in RECTS]),
            "x0": pa.array([r[1] for r in RECTS]),
            "y0": pa.array([r[2] for r in RECTS]),
            "x1": pa.array([r[3] for r in RECTS]),
            "y1": pa.array([r[4] for r in RECTS]),
        }
    )
    con.register("zones", zones)
    ora = con.execute(
        "SELECT zone_id, count(*) AS n, sum(v) AS sum_value, avg(v) AS mean_value, "
        "min(v) AS min_value, max(v) AS max_value "
        "FROM pts JOIN zones ON lon BETWEEN x0 AND x1 AND lat BETWEEN y0 AND y1 "
        "GROUP BY zone_id ORDER BY zone_id"
    ).df()

    assert out["zone_id"].tolist() == ora["zone_id"].tolist()
    assert out["n"].tolist() == ora["n"].tolist()
    np.testing.assert_allclose(out["sum_value"], ora["sum_value"], rtol=1e-9)
    np.testing.assert_allclose(out["mean_value"], ora["mean_value"], rtol=1e-9)
    np.testing.assert_allclose(out["min_value"], ora["min_value"], rtol=0)
    np.testing.assert_allclose(out["max_value"], ora["max_value"], rtol=0)
    # a point in the east/north overlap contributes to BOTH zones
    both = (
        (lon >= 0.0) & (lon <= 20.0) & (lat >= 20.0) & (lat <= 30.0)
    ).sum()
    assert both > 0  # the overlap is exercised


def test_zonal_stats_count_only(ray_session):
    import ray
    from geopolars_ray.stages.raster import zonal_stats

    pts = pa.table(
        {"lon": pa.array([-10.0, -10.0, 10.0, 49.0]), "lat": pa.array([0.0, 1.0, 0.0, 49.0])}
    )
    out = (
        zonal_stats(ray.data.from_arrow(pts), _rect_zones(RECTS), stats=("count",))
        .to_pandas()
        .sort_values("zone_id")
    )
    assert dict(zip(out["zone_id"], out["n"])) == {"west": 2, "east": 1}


def test_raster_zonal_stats_dense_and_sparse(ray_session):
    import ray
    from geopolars_ray.stages.raster import (
        rasterize_points,
        raster_to_points,
        raster_zonal_stats,
        zonal_stats,
    )

    rng = np.random.default_rng(53)
    n = 40000
    lon = rng.uniform(-45, 45, n)
    lat = rng.uniform(-45, 45, n)
    pts = pa.table({"lon": pa.array(lon), "lat": pa.array(lat)})
    res, deg = 16, 15.0
    tiles = rasterize_points(
        ray.data.from_arrow(pts).repartition(4), tile_deg=deg, resolution=res,
        stat="count", num_partitions=4,
    ).materialize()
    zones = _rect_zones(RECTS)

    out = (
        raster_zonal_stats(tiles, zones, tile_deg=deg, resolution=res,
                           stats=("count", "sum", "mean", "min", "max"))
        .to_pandas()
        .sort_values("zone_id")
        .reset_index(drop=True)
    )

    # dense numpy brute force over every cell center of every tile
    tp = tiles.to_pandas()
    from geopolars_ray.geom import tiles as tiles_mod

    t_ids = tp["tile"].to_numpy()
    lon0, lat0, _, _ = tiles_mod.grid_tile_bounds(t_ids, cell_deg=deg)
    cw = deg / res
    cell = np.arange(res * res)
    cx = (cell % res + 0.5) * cw
    cy = (cell // res + 0.5) * cw
    clon = (lon0[:, None] + cx[None, :]).ravel()
    clat = (lat0[:, None] + cy[None, :]).ravel()
    cval = np.concatenate([np.asarray(g, dtype=np.float64) for g in tp["raster"]])
    for _, zrow in out.iterrows():
        zid = zrow["zone_id"]
        _, x0, y0, x1, y1 = next(r for r in RECTS if r[0] == zid)
        m = (clon >= x0) & (clon <= x1) & (clat >= y0) & (clat <= y1)
        assert zrow["n"] == int(m.sum())
        np.testing.assert_allclose(zrow["sum_value"], cval[m].sum(), rtol=1e-12)
        np.testing.assert_allclose(zrow["mean_value"], cval[m].mean(), rtol=1e-12)
        assert zrow["min_value"] == cval[m].min()
        assert zrow["max_value"] == cval[m].max()

    # sparse semantics == raster_to_points + zonal_stats on the exploded cells
    sparse = (
        raster_zonal_stats(tiles, zones, tile_deg=deg, resolution=res,
                           stats=("count", "sum"), skip_empty=True)
        .to_pandas()
        .sort_values("zone_id")
        .reset_index(drop=True)
    )
    exploded = raster_to_points(tiles, tile_deg=deg, resolution=res)
    via_pts = (
        zonal_stats(exploded, zones, lon_col="cell_lon", lat_col="cell_lat",
                    value_col="value", stats=("count", "sum"))
        .to_pandas()
        .sort_values("zone_id")
        .reset_index(drop=True)
    )
    assert sparse["zone_id"].tolist() == via_pts["zone_id"].tolist()
    assert sparse["n"].tolist() == via_pts["n"].tolist()
    np.testing.assert_allclose(sparse["sum_value"], via_pts["sum_value"], rtol=1e-12)


def test_zonal_stats_rejects_bad_spec(ray_session):
    import pytest
    import ray
    from geopolars_ray.stages.raster import zonal_stats

    pts = ray.data.from_arrow(pa.table({"lon": pa.array([0.0]), "lat": pa.array([0.0])}))
    with pytest.raises(ValueError, match="value_col"):
        zonal_stats(pts, _rect_zones(RECTS), stats=("sum",))
    with pytest.raises(ValueError, match="unknown zonal"):
        zonal_stats(pts, _rect_zones(RECTS), stats=("median",))


def test_zonal_stats_partitioned_matches_broadcast(ray_session):
    import ray
    from geopolars_ray.stages.raster import zonal_stats

    rng = np.random.default_rng(61)
    n = 20000
    pts = pa.table({"lon": pa.array(rng.uniform(-50, 50, n)),
                    "lat": pa.array(rng.uniform(-50, 50, n)),
                    "v": pa.array(rng.uniform(0, 5, n))})
    zones = _rect_zones(RECTS)
    kw = dict(value_col="v", stats=("count", "sum", "mean"))
    b = (zonal_stats(ray.data.from_arrow(pts).repartition(4), zones, **kw)
         .to_pandas().sort_values("zone_id").reset_index(drop=True))
    p = (zonal_stats(ray.data.from_arrow(pts).repartition(4), zones,
                     broadcast=False, cell_deg=10.0, **kw)
         .to_pandas().sort_values("zone_id").reset_index(drop=True))
    assert b["zone_id"].tolist() == p["zone_id"].tolist()
    assert b["n"].tolist() == p["n"].tolist()
    np.testing.assert_allclose(b["sum_value"], p["sum_value"], rtol=1e-12)
    np.testing.assert_allclose(b["mean_value"], p["mean_value"], rtol=1e-12)


def test_idw_rasterize_matches_brute_force(ray_session):
    """IDW gridding vs a global brute force — the engine only sees the
    radius-replicated candidates per tile, so agreement proves the
    cross-tile replication is complete (NaN patterns included)."""
    import ray
    from geopolars_ray.stages.raster import idw_rasterize

    rng = np.random.default_rng(31)
    n = 4000
    lon = rng.uniform(0, 30, n)
    lat = rng.uniform(0, 15, n)
    val = np.sin(lon / 5.0) + np.cos(lat / 4.0)
    pts = pa.table({"lon": pa.array(lon), "lat": pa.array(lat), "v": pa.array(val)})
    res, deg, rad, pw = 8, 15.0, 2.0, 2.0
    out = idw_rasterize(ray.data.from_arrow(pts).repartition(4), "v", tile_deg=deg,
                        resolution=res, radius_deg=rad, power=pw,
                        num_partitions=4).to_pandas()
    assert len(out) == 12       # 2 data tiles + every radius-reachable neighbor
    ny = int(np.ceil(180 / deg))
    checked = 0
    for _, r in out.iterrows():
        t = r["tile"]
        lo0 = (t // ny) * deg - 180.0
        la0 = (t % ny) * deg - 90.0
        cw = deg / res
        cell = np.arange(res * res)
        cx = lo0 + (cell % res + 0.5) * cw
        cy = la0 + (cell // res + 0.5) * cw
        d2 = (cx[:, None] - lon[None, :]) ** 2 + (cy[:, None] - lat[None, :]) ** 2
        within = d2 <= rad * rad
        w = np.where(within, 1.0 / np.maximum(d2, 1e-300) ** (pw / 2), 0.0)
        ws = w.sum(axis=1)
        exp = np.where(ws > 0, (w * val[None, :]).sum(axis=1) / np.maximum(ws, 1e-300), np.nan)
        got = np.asarray(r["raster"])
        assert (np.isnan(got) == np.isnan(exp)).all()
        m = ~np.isnan(exp)
        np.testing.assert_allclose(got[m], exp[m], rtol=1e-12)
        checked += int(m.sum())
    assert checked > 150

    # exact-hit: a cell-center point takes its own value
    c_lon, c_lat = 0.0 + (0 + 0.5) * (deg / res) + deg * 12 - 180.0, (0 + 0.5) * (deg / res) + deg * 6 - 90.0
    one = pa.table({"lon": pa.array([c_lon]), "lat": pa.array([c_lat]), "v": pa.array([42.0])})
    g = idw_rasterize(ray.data.from_arrow(one), "v", tile_deg=deg, resolution=res,
                      radius_deg=1.0, num_partitions=2).to_pandas()
    core = g[g["tile"] == 12 * ny + 6].iloc[0]
    assert np.asarray(core["raster"])[0] == 42.0

    import pytest as _pt
    with _pt.raises(ValueError, match="radius_deg"):
        idw_rasterize(ray.data.from_arrow(one), "v", tile_deg=deg, radius_deg=deg * 2)
