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


class FusedPagesGeotag:
    """Manually-fused read -> extract -> tile -> PIP-join task.

    Ray 2.49's optimizer does not fuse ReadParquet into the downstream map
    chain here, so the wide ``html`` column (the vast majority of the table's
    bytes) round-trips through the object store between the read tasks and
    the first map task — measured ~25% of flagship wall at 8 CPUs and the
    single biggest non-scaling cost (plasma memcpy is shared-memory-bandwidth
    bound, not CPU bound). This operator IS the fusion: each task takes
    shard PATHS, reads the parquet itself (columns pruned at the scan),
    pipes slices through extract/tiles/join in-process, and emits only the
    narrow geo-tagged output — html never leaves the task. At 100 TB this is
    also the right cluster shape: the wide bytes stay node-local to the scan.
    """

    def __init__(self, admin: pa.Table, s2_level: int = 12, grid_cell_deg: float = 1.0,
                 batch_rows: int = 8192, keep_text: bool = False,
                 h3_res: int | None = None):
        self.extract = ExtractGeoTags(keep_text=keep_text)
        self.tiles = assign_tiles(s2_level=s2_level, grid_cell_deg=grid_cell_deg,
                                  h3_res=h3_res)
        self.join = BroadcastPIPJoin(admin, how="inner")
        self.batch_rows = batch_rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        outs = []
        for path in batch["path"].to_pylist():
            t = pq.read_table(path, columns=["url", "warc_ts", "html", "lang"])
            if t.num_rows == 0:
                # a zero-row shard still contributes an (empty) table so the
                # final concat sees the output schema instead of no tables
                outs.append(self.join(self.tiles(self.extract(t))))
                continue
            for s in range(0, t.num_rows, self.batch_rows):
                sl = t.slice(s, min(self.batch_rows, t.num_rows - s))
                outs.append(self.join(self.tiles(self.extract(sl))))
        return pa.concat_tables(outs)


def geotag_points_fused(
    pages_dir: str,
    admin: pa.Table | None = None,
    s2_level: int = 12,
    grid_cell_deg: float = 1.0,
    batch_rows: int = 8192,
    keep_text: bool = False,
):
    """Sharded-directory flagship front half with manual read fusion (see
    :class:`FusedPagesGeotag`): one task per parquet shard."""
    import glob as glob_mod

    if admin is None:
        admin = admin_polygons_table()
    paths = sorted(glob_mod.glob(f"{pages_dir}/*.parquet"))
    if not paths:
        raise FileNotFoundError(f"no parquet shards under {pages_dir}")
    items = ray.data.from_items([{"path": p} for p in paths], override_num_blocks=len(paths))
    return items.map_batches(
        FusedPagesGeotag(admin, s2_level=s2_level, grid_cell_deg=grid_cell_deg,
                         batch_rows=batch_rows, keep_text=keep_text),
        batch_format="pyarrow",
        batch_size=1,
    )


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


def run_flagship_fused(
    pages_dir: str,
    out_path: str | None = None,
    admin: pa.Table | None = None,
    s2_level: int = 12,
    grid_cell_deg: float = 1.0,
    batch_rows: int = 8192,
    num_partitions: int = 32,
    h3_res: int | None = None,
):
    """Flagship with manual read fusion AND per-shard partial aggregation in
    ONE task-based operator — the scale shape for sharded page directories.

    Why one operator (r3, measured at sf0.1/24M rows): Ray 2.49 (a) does not
    fuse ReadParquet into the map chain, so the wide html column round-trips
    through the object store, and (b) fuses consecutive task-based
    map_batches with the LARGEST batch_size winning the input-bundling
    target, so a path-per-row driver table gets swallowed into ONE task by
    the rollup's 262144-row combine stage; while (c) splitting into two
    operators (actor-pool geotag + task combine) triggers the executor's
    operator-reservation starvation (~50% utilization at 2-8 CPUs). Doing
    read -> extract -> tile -> join -> per-shard pa.Table.group_by inside
    one function avoids all three: 2->8 CPU scaling efficiency measured
    0.99 (was 0.52-0.75 with the separate-read plan after the extract
    kernel got 10x faster and stopped hiding the plasma traffic), and the
    html bytes never leave the task that read them — on a real cluster the
    wide bytes stay node-local to the scan.

    The per-shard partials (~1 row per (tile, admin) pair per shard) are
    materialized (a tiny table) and re-aggregated by summing counts/sums in
    ``hash_aggregate`` — exactly the classic combiner contract. ``n_pages``
    (integer counts of integers) is bit-identical to :func:`run_flagship`;
    ``sum_lat``/``sum_lon`` are float sums whose per-shard vs per-block
    association differs in the final ULPs (the bench asserts rtol=1e-12).
    """
    import glob as glob_mod

    from geopolars_ray.stages.agg import hash_aggregate

    if admin is None:
        admin = admin_polygons_table()
    paths = sorted(glob_mod.glob(f"{pages_dir}/*.parquet"))
    if not paths:
        raise FileNotFoundError(f"no parquet shards under {pages_dir}")
    fused = FusedPagesGeotag(admin, s2_level=s2_level, grid_cell_deg=grid_cell_deg,
                             batch_rows=batch_rows, h3_res=h3_res)

    # h3_res switches the rollup key to CANONICAL Uber H3 cells — the north
    # star's "point-in-polygon + H3 tile assignment" headline shape; default
    # stays s2_l12 for cross-round bench comparability
    tcol = f"h3_r{h3_res}" if h3_res is not None else f"s2_l{s2_level}"

    def shard_pipeline(batch: pa.Table) -> pa.Table:
        pts = fused(batch)
        t = pts.select([tcol, "admin_id", "lat", "lon"])
        return (
            t.group_by([tcol, "admin_id"])
            .aggregate([("lat", "count"), ("lat", "sum"), ("lon", "sum")])
            .rename_columns([tcol, "admin_id", "n_pages", "sum_lat", "sum_lon"])
        )

    items = ray.data.from_items([{"path": p} for p in paths], override_num_blocks=len(paths))
    parts = items.map_batches(shard_pipeline, batch_format="pyarrow", batch_size=1).materialize()
    out = hash_aggregate(
        parts,
        keys=[tcol, "admin_id"],
        spec=[
            ("n_pages", "sum", "n_pages"),
            ("sum_lat", "sum", "sum_lat"),
            ("sum_lon", "sum", "sum_lon"),
        ],
        num_partitions=num_partitions,
    )

    def rename(batch: pa.Table) -> pa.Table:
        idx = batch.column_names.index(tcol)
        return batch.set_column(idx, "tile", batch[tcol])

    out = out.map_batches(rename, batch_format="pyarrow")
    if out_path is not None:
        out.write_parquet(out_path)
    return out
