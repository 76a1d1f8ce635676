"""Resumable flagship runs: per-input-shard checkpoints + lineage + metrics.

The north rule requires runs "resumable from checkpoint with per-partition
lineage + metrics". Design (SURVEY.md §4 checkpoint row):

- The expensive map work (extract -> tile -> PIP join -> partial rollup) is
  checkpointed per INPUT SHARD: one Ray task per shard writes its partial
  rollup to ``out_dir/parts/<shard>.parquet`` atomically (tmp + rename) and
  the driver appends one JSON lineage record to ``out_dir/_manifest.jsonl``
  — input path, row counts at each stage, wall time, engine version, output
  path. Shard results are pure functions of the input shard, so retries and
  resumes are byte-identical.
- A resume reads the manifest, skips completed shards, and only processes
  the remainder.
- The cheap global merge (hash_aggregate over all partial rollups) is
  recomputed at finalize time from the checkpointed partials — never
  checkpointed itself, so a crash anywhere leaves only idempotent state.

Per-shard tasks are plain ``@ray.remote`` here (not a Dataset) because the
unit of fault tolerance IS the shard: the manifest needs an atomic
"shard done" boundary, which per-shard tasks give directly. The kernels are
the same batch callables the streaming pipeline uses.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

import geopolars_ray


def _load_manifest(out_dir: str) -> dict[str, dict]:
    path = Path(out_dir) / "_manifest.jsonl"
    done = {}
    if path.exists():
        for line in path.read_text().splitlines():
            if line.strip():
                rec = json.loads(line)
                done[rec["shard"]] = rec
    return done


def _append_manifest(out_dir: str, rec: dict) -> None:
    path = Path(out_dir) / "_manifest.jsonl"
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
        f.flush()
        os.fsync(f.fileno())


@ray.remote
def _process_shard(shard_path: str, out_dir: str, s2_level: int, admin_table: pa.Table) -> dict:
    """One shard end-to-end -> partial rollup parquet + lineage record."""
    from geopolars_ray.stages.extract import ExtractGeoTags, assign_tiles
    from geopolars_ray.stages.join import BroadcastPIPJoin

    t0 = time.time()
    table = pq.read_table(shard_path, columns=["url", "warc_ts", "html", "lang"])
    rows_in = table.num_rows
    table = ExtractGeoTags()(table)
    table = assign_tiles(s2_level=s2_level)(table)
    rows_geo = int(pa.compute.sum(pa.compute.is_valid(table["lat"])).as_py() or 0)
    table = BroadcastPIPJoin(admin_table, how="inner")(table)
    rows_joined = table.num_rows
    tile_col = f"s2_l{s2_level}"
    partial = (
        table.select([tile_col, "admin_id", "lat", "lon"])
        .group_by([tile_col, "admin_id"])
        .aggregate([("lat", "count"), ("lat", "sum"), ("lon", "sum")])
        .rename_columns(["tile", "admin_id", "n", "sum_lat", "sum_lon"])
    )
    name = Path(shard_path).stem
    parts_dir = Path(out_dir) / "parts"
    parts_dir.mkdir(parents=True, exist_ok=True)
    tmp = parts_dir / f".{name}.tmp.parquet"
    final = parts_dir / f"{name}.parquet"
    pq.write_table(partial, tmp)
    os.replace(tmp, final)  # atomic publish
    return {
        "shard": name,
        "input_path": shard_path,
        "output_path": str(final),
        "rows_in": rows_in,
        "rows_geotagged": rows_geo,
        "rows_joined": rows_joined,
        "partial_groups": partial.num_rows,
        "wall_ms": round((time.time() - t0) * 1000, 1),
        "engine_version": geopolars_ray.__version__,
        "s2_level": s2_level,
    }


def run_resumable(
    pages_dir: str,
    out_dir: str,
    s2_level: int = 12,
    admin: pa.Table | None = None,
    max_shards: int | None = None,
) -> dict:
    """Process all (remaining) input shards; returns run metrics.

    ``max_shards`` bounds how many NEW shards this invocation processes —
    used by tests to simulate an interrupted run.
    """
    from geopolars_ray.sources.pages import admin_polygons_table

    if admin is None:
        admin = admin_polygons_table()
    os.makedirs(out_dir, exist_ok=True)
    shards = sorted(str(p) for p in Path(pages_dir).glob("*.parquet"))
    done = _load_manifest(out_dir)
    todo_all = [
        s
        for s in shards
        if Path(s).stem not in done or not Path(done[Path(s).stem]["output_path"]).exists()
    ]
    todo = todo_all if max_shards is None else todo_all[:max_shards]
    admin_ref = ray.put(admin)
    futures = [_process_shard.remote(s, out_dir, s2_level, admin_ref) for s in todo]
    n_new = 0
    for fut in futures:
        rec = ray.get(fut)
        _append_manifest(out_dir, rec)
        n_new += 1
    done = _load_manifest(out_dir)
    return {
        "total_shards": len(shards),
        "completed_shards": len(done),
        "newly_processed": n_new,
        "skipped_completed": len(shards) - len(todo_all),
        "pending": len(shards) - len(done),
    }


def finalize_rollup(out_dir: str, num_partitions: int = 16):
    """Merge all checkpointed shard partials into the final rollup Dataset."""
    from geopolars_ray.stages.agg import hash_aggregate

    parts = ray.data.read_parquet(str(Path(out_dir) / "parts"))
    out = hash_aggregate(
        parts,
        keys=["tile", "admin_id"],
        spec=[
            ("n", "sum", "n_pages"),
            ("sum_lat", "sum", "sum_lat"),
            ("sum_lon", "sum", "sum_lon"),
        ],
        num_partitions=num_partitions,
    )
    return out
