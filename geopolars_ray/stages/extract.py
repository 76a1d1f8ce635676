"""Flagship extraction + tiling stages (stateless map_batches kernels).

The geo-tag extraction stage is the pipeline's first hot stage: it reads the
wide ``html`` binary column, recovers the text (byte-identical to the
generator's ground truth — the north-star invariant), parses the geo signal,
and immediately DROPS html so the wide bytes never travel further than one
stage (SURVEY.md §7 "hard" #4).
"""

from __future__ import annotations

import re
from typing import Callable

import numpy as np
import pyarrow as pa

from geopolars_ray.sources.pages import extract_text, _GEO_RE
from geopolars_ray.geom import s2 as s2_mod
from geopolars_ray.geom import tiles as tiles_mod


class ExtractGeoTags:
    """Actor-pool stage: html -> (text, lat, lon); drops html.

    A callable class so the compiled regex and any future model state load
    once per actor (``__init__``), not once per batch — the reference's
    per-op setup has no equivalent amortization (SURVEY.md §3.2).
    """

    def __init__(self, keep_text: bool = False):
        self.keep_text = keep_text
        self.geo_re = _GEO_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        # one bulk to_pylist (per-row .as_py() costs ~15x more than the
        # extraction itself — measured 9k vs 147k rows/s/core)
        blobs = batch["html"].to_pylist()
        n = len(batch)
        lats = np.full(n, np.nan)
        lons = np.full(n, np.nan)
        texts: list[str] | None = [] if self.keep_text else None
        for i, raw in enumerate(blobs):
            text = extract_text(raw)
            if texts is not None:
                texts.append(text)
            m = self.geo_re.search(text)
            if m:
                lats[i] = float(m.group(1))
                lons[i] = float(m.group(2))
        out = batch.drop_columns(["html"] + (["text"] if "text" in batch.column_names else []))
        if texts is not None:
            out = out.append_column("text", pa.array(texts, pa.string()))
        out = out.append_column("lat", pa.array(lats))
        out = out.append_column("lon", pa.array(lons))
        return out


def assign_tiles(
    lon_col: str = "lon",
    lat_col: str = "lat",
    s2_level: int = 12,
    grid_cell_deg: float = 1.0,
    hex_size_deg: float | None = None,
    h3_res: int | None = None,
) -> Callable[[pa.Table], pa.Table]:
    """Stateless tile-assignment kernel: adds s2_l{level} and grid_tile
    columns (plus hex_tile / h3_r{res} aperture-7 icosahedral ids when
    requested — the north star's H3-res-7 tile assignment, `geom/h3ish.py`).
    Rows with null/NaN coordinates get null tiles."""

    def fn(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = batch[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~(np.isnan(lon) | np.isnan(lat))
        s2_ids = np.zeros(len(lon), dtype=np.uint64)
        if ok.any():
            s2_ids[ok] = s2_mod.s2_cell_id(lon[ok], lat[ok], level=s2_level)
        grid = np.zeros(len(lon), dtype=np.int64)
        grid[ok] = tiles_mod.grid_tile_id(lon[ok], lat[ok], cell_deg=grid_cell_deg)
        # s2 ids are reinterpreted as signed int64 (lossless two's-complement
        # bijection): Ray Data's groupby pickles uint64 keys via a pandas
        # round-trip, int64 keys stay native
        batch = batch.append_column(
            f"s2_l{s2_level}", pa.Array.from_pandas(s2_ids.view(np.int64), mask=~ok, type=pa.int64())
        )
        batch = batch.append_column(
            "grid_tile", pa.Array.from_pandas(grid, mask=~ok, type=pa.int64())
        )
        if hex_size_deg is not None:
            hx = np.zeros(len(lon), dtype=np.int64)
            hx[ok] = tiles_mod.hex_tile_id(lon[ok], lat[ok], size_deg=hex_size_deg)
            batch = batch.append_column("hex_tile", pa.Array.from_pandas(hx, mask=~ok, type=pa.int64()))
        if h3_res is not None:
            from geopolars_ray.geom import h3ish

            h3 = np.zeros(len(lon), dtype=np.int64)
            h3[ok] = h3ish.h3ish_cell_id(lon[ok], lat[ok], res=h3_res)
            batch = batch.append_column(
                f"h3_r{h3_res}", pa.Array.from_pandas(h3, mask=~ok, type=pa.int64())
            )
        return batch

    return fn
