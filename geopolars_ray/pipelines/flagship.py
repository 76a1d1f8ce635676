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
    use_actors: bool = False,
):
    """pages parquet -> geo-tagged, tiled, admin-joined point Dataset.

    ``batch_size`` stays small through the html-wide stages (SURVEY.md §7
    "hard" #4); after extraction drops html the blocks are narrow again.

    Default mode is stateless TASKS with driver-prepared state captured in
    the function closure (serialized once into the operator spec, cached per
    worker): admin-polygon-scale state is tiny, and task pools schedule
    instantly while actor pools pay a multi-second spin-up. Set
    ``use_actors=True`` for genuinely heavy per-worker state (big polygon
    sets, models), where the ``concurrency`` pool args apply.
    """
    if admin is None:
        admin = admin_polygons_table()
    ds = ray.data.read_parquet(pages_path, columns=["url", "warc_ts", "html", "lang"])
    if use_actors:
        ds = ds.map_batches(
            ExtractGeoTags,
            fn_constructor_kwargs=dict(keep_text=keep_text),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=extract_concurrency,
        )
    else:
        ds = ds.map_batches(
            ExtractGeoTags(keep_text=keep_text), batch_format="pyarrow", batch_size=batch_size
        )
    ds = ds.map_batches(
        assign_tiles(s2_level=s2_level, grid_cell_deg=grid_cell_deg),
        batch_format="pyarrow",
    )
    if use_actors:
        admin_ref = ray.put(admin)
        ds = ds.map_batches(
            BroadcastPIPJoin,
            fn_constructor_kwargs=dict(polygons=admin_ref, how="inner"),
            batch_format="pyarrow",
            concurrency=join_concurrency,
        )
    else:
        ds = ds.map_batches(BroadcastPIPJoin(admin, how="inner"), batch_format="pyarrow")
    return ds


def tile_rollup(ds, tile_col: str = "s2_l12", num_partitions: int = 32):
    """Per-tile rollup via hash_aggregate (combiner + hash-partitioned
    C++ hash-agg — the high-cardinality scale path; Ray's sort-based
    aggregate costs ~200µs of Python per group and is avoided entirely).
    A hot megacity tile contributes at most one partial row per block to
    the shuffle (SURVEY.md §4 skew strategy)."""
    from geopolars_ray.stages.agg import hash_aggregate

    out = hash_aggregate(
        ds.select_columns([tile_col, "admin_id", "lat", "lon"]),
        keys=[tile_col, "admin_id"],
        spec=[
            ("lat", "count", "n_pages"),
            ("lat", "sum", "sum_lat"),
            ("lon", "sum", "sum_lon"),
        ],
        num_partitions=num_partitions,
    )

    def rename(batch: pa.Table) -> pa.Table:
        idx = batch.column_names.index(tile_col)
        return batch.set_column(idx, "tile", batch[tile_col])

    return out.map_batches(rename, batch_format="pyarrow")


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
