"""Raster <-> vector tile rasterization (north-star op; SURVEY.md §7 M8).

A "raster tile" is one row per (coarse) grid tile holding a dense H x W
cell-value array (Arrow fixed-size or variable list<double>) over the tile's
extent — the exchange format between vector pipelines and raster consumers
(heatmaps, ML feature grids).

- :func:`rasterize_points` — points -> per-tile count/sum/mean grids, via
  ``hash_partitioned_map`` on the tile id: each partition turns all its
  tiles' points into dense arrays with one vectorized ``np.bincount`` per
  tile (no Ray per-tile overhead).
- :func:`raster_to_points` — the inverse: tile grids back to one row per
  non-empty cell with the cell-center coordinates and value.

Partitioning assumption: one tile's raster (H*W doubles) fits comfortably
in a block; tiles are independent, so this scales linearly with tile count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geopolars_ray.geom import tiles as tiles_mod
from geopolars_ray.stages.agg import hash_partitioned_map


def rasterize_points(
    ds,
    lon_col: str = "lon",
    lat_col: str = "lat",
    value_col: str | None = None,
    tile_deg: float = 15.0,
    resolution: int = 32,
    stat: str = "count",
    num_partitions: int = 16,
):
    """Point Dataset -> raster tiles: (tile, raster list<double>[res*res], n_points).

    ``stat``: count | sum | mean (sum/mean need ``value_col``). Cells are
    row-major with cell (0,0) at the tile's (lon_min, lat_min) corner.
    """
    if stat not in ("count", "sum", "mean"):
        raise ValueError(f"unknown stat {stat!r}")
    if stat in ("sum", "mean") and value_col is None:
        raise ValueError("sum/mean need value_col")

    def tag(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = batch[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        t = tiles_mod.grid_tile_id(lon, lat, cell_deg=tile_deg)
        return batch.append_column("_tile", pa.array(t))

    def rasterize(part: pa.Table) -> pa.Table:
        tile = np.asarray(part["_tile"].to_pylist(), dtype=np.int64)
        lon = part[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = part[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        val = (
            part[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
            if value_col
            else None
        )
        order = np.argsort(tile, kind="stable")
        tile, lon, lat = tile[order], lon[order], lat[order]
        if val is not None:
            val = val[order]
        cut = np.nonzero(np.diff(tile))[0] + 1
        tiles_out, rasters, counts = [], [], []
        lon0, lat0, _, _ = tiles_mod.grid_tile_bounds(tile, cell_deg=tile_deg)
        res = resolution
        for sl_start, sl_tile in zip(
            np.split(np.arange(len(tile)), cut), np.split(tile, cut)
        ):
            idx = sl_start
            t0 = int(sl_tile[0])
            cx = np.clip(((lon[idx] - lon0[idx]) / tile_deg * res).astype(np.int64), 0, res - 1)
            cy = np.clip(((lat[idx] - lat0[idx]) / tile_deg * res).astype(np.int64), 0, res - 1)
            cell = cy * res + cx
            cnt = np.bincount(cell, minlength=res * res).astype(np.float64)
            if stat == "count":
                grid = cnt
            else:
                s = np.bincount(cell, weights=val[idx], minlength=res * res)
                grid = s if stat == "sum" else np.divide(s, np.maximum(cnt, 1.0))
            tiles_out.append(t0)
            rasters.append(grid)
            counts.append(len(idx))
        return pa.table(
            {
                "tile": pa.array(tiles_out, pa.int64()),
                "raster": pa.array([r.tolist() for r in rasters], pa.list_(pa.float64())),
                "n_points": pa.array(counts, pa.int64()),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return hash_partitioned_map(tagged, ["_tile"], rasterize, num_partitions)


def raster_to_points(raster_ds, tile_deg: float = 15.0, resolution: int = 32):
    """Raster tiles -> one row per non-empty cell (vectorization inverse).

    Output: (tile, cell_lon, cell_lat, value) with cell-center coordinates.
    """

    def explode(batch: pa.Table) -> pa.Table:
        tiles = np.asarray(batch["tile"].to_pylist(), dtype=np.int64)
        grids = batch["raster"].to_pylist()
        res = resolution
        out_tile, out_lon, out_lat, out_val = [], [], [], []
        lon0, lat0, _, _ = tiles_mod.grid_tile_bounds(tiles, cell_deg=tile_deg)
        cell_w = tile_deg / res
        for i, g in enumerate(grids):
            g = np.asarray(g)
            nz = np.nonzero(g)[0]
            if not len(nz):
                continue
            cy, cx = nz // res, nz % res
            out_tile.append(np.full(len(nz), tiles[i], dtype=np.int64))
            out_lon.append(lon0[i] + (cx + 0.5) * cell_w)
            out_lat.append(lat0[i] + (cy + 0.5) * cell_w)
            out_val.append(g[nz])
        if not out_tile:
            return pa.table(
                {
                    "tile": pa.array([], pa.int64()),
                    "cell_lon": pa.array([], pa.float64()),
                    "cell_lat": pa.array([], pa.float64()),
                    "value": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "tile": pa.array(np.concatenate(out_tile)),
                "cell_lon": pa.array(np.concatenate(out_lon)),
                "cell_lat": pa.array(np.concatenate(out_lat)),
                "value": pa.array(np.concatenate(out_val)),
            }
        )

    return raster_ds.map_batches(explode, batch_format="pyarrow")
