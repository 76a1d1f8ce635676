"""The flagship north-star pipeline: pages -> geotag -> tiles -> join -> rollup.

Shape (BASELINE.json north_star; SURVEY.md §3.3 Ray translation)::

    read_parquet(pages, columns=[url, warc_ts, html, lang])   # prune at read
      -> ExtractGeoTags (actor pool; html -> text/lat/lon; html dropped)
      -> assign_tiles   (stateless; s2_l12 + grid_tile columns)
      -> BroadcastPIPJoin (actor pool; admin polygons broadcast once)
      -> per-tile rollup (partial agg inside map_batches, then a small
         groupby over partials -- the two-phase/combiner pattern that keeps
         hot-city skew off the shuffle, SURVEY.md §4 skew row)

Everything before the rollup streams block-by-block; nothing materializes
the full dataset. Output is written as partitioned parquet for resumability.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from geopolars_ray.stages.extract import ExtractGeoTags, assign_tiles
from geopolars_ray.stages.join import BroadcastPIPJoin
from geopolars_ray.sources.pages import admin_polygons_table


def geotag_points(
    pages_path: str,
    admin: pa.Table | None = None,
    s2_level: int = 12,
    grid_cell_deg: float = 1.0,
    extract_concurrency: int | tuple[int, int] = (1, 8),
    join_concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 8192,
    keep_text: bool = False,
):
    """pages parquet -> geo-tagged, tiled, admin-joined point Dataset.

    ``batch_size`` stays small through the html-wide stages (SURVEY.md §7
    "hard" #4); after extraction drops html the blocks are narrow again.
    """
    if admin is None:
        admin = admin_polygons_table()
    ds = ray.data.read_parquet(pages_path, columns=["url", "warc_ts", "html", "lang"])
    ds = ds.map_batches(
        ExtractGeoTags,
        fn_constructor_kwargs=dict(keep_text=keep_text),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=extract_concurrency,
    )
    ds = ds.map_batches(
        assign_tiles(s2_level=s2_level, grid_cell_deg=grid_cell_deg),
        batch_format="pyarrow",
    )
    admin_ref = ray.put(admin)
    ds = ds.map_batches(
        BroadcastPIPJoin,
        fn_constructor_kwargs=dict(polygons=admin_ref, how="inner"),
        batch_format="pyarrow",
        concurrency=join_concurrency,
    )
    return ds


def tile_rollup(ds, tile_col: str = "s2_l12"):
    """Per-tile rollup with a batch-local combiner before the shuffle.

    Each batch pre-aggregates to one row per (tile, admin) — so the groupby
    shuffles O(tiles x blocks) partial rows instead of every page row, and a
    hot megacity tile costs the same as a cold one (two-phase aggregation;
    the explicit skew strategy of SURVEY.md §4).
    """

    def partial(batch: pa.Table) -> pa.Table:
        # pure-Arrow combiner: keeps uint64 tile ids as uint64 (a pandas
        # round-trip would object-ify nullable uint64 into pickled columns)
        g = (
            batch.select([tile_col, "admin_id", "lat", "lon"])
            .group_by([tile_col, "admin_id"])
            .aggregate([("lat", "count"), ("lat", "sum"), ("lon", "sum")])
        )
        return g.rename_columns(["tile", "admin_id", "n", "sum_lat", "sum_lon"])

    from ray.data.aggregate import Sum

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(["tile", "admin_id"]).aggregate(
        Sum("n", alias_name="n_pages"),
        Sum("sum_lat", alias_name="sum_lat"),
        Sum("sum_lon", alias_name="sum_lon"),
    )


def run_flagship(
    pages_path: str,
    out_path: str | None = None,
    tile_col: str = "s2_l12",
    **kwargs,
):
    """Full pipeline; returns the rollup Dataset (writes parquet when
    ``out_path`` given — partitioned output directory, resumable layout)."""
    pts = geotag_points(pages_path, **kwargs)
    rollup = tile_rollup(pts, tile_col=tile_col)
    if out_path is not None:
        rollup.write_parquet(out_path)
    return rollup
