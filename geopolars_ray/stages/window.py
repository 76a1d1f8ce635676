"""Windowed aggregation over event-time columns.

Beyond-reference operators for event tables (the reference has no temporal
ops; SURVEY.md §2.7 notes it is strictly batch). Tumbling windows are plain
bucket arithmetic + ``hash_aggregate`` (see ``q_rel_user_hours``); this
module adds SLIDING windows: each event replicates to the
``window/slide`` overlapping windows that contain it (a small constant
fan-out, vectorized per batch), then one combiner-first aggregation on
``(keys..., window_start)``. The replication happens before the combiner,
so a hot key still ships at most ``window/slide`` partial rows per block.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa


def sliding_window_aggregate(
    ds,
    ts_col: str,
    window_us: int,
    slide_us: int,
    keys: Sequence[str],
    spec,
    num_partitions: int = 16,
    window_col: str = "window_start",
):
    """Aggregate per (keys..., sliding window of ``window_us`` every
    ``slide_us``). ``window_us`` must be a multiple of ``slide_us``.

    ``window_col`` holds the window's start as the integer slide index
    (``start_us = window_col * slide_us``) — exact integer arithmetic, so
    results are bit-comparable to a SQL UNION-ALL-of-shifted-buckets oracle.
    """
    from geopolars_ray.stages.agg import hash_aggregate

    if window_us % slide_us:
        raise ValueError("window_us must be a multiple of slide_us")
    fanout = window_us // slide_us

    def assign(batch: pa.Table) -> pa.Table:
        us = batch[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = us // slide_us
        n = len(batch)
        rows = np.tile(np.arange(n, dtype=np.int64), fanout)
        starts = np.concatenate([base - j for j in range(fanout)])
        out = batch.take(pa.array(rows))
        return out.append_column(window_col, pa.array(starts))

    replicated = ds.map_batches(assign, batch_format="pyarrow")
    return hash_aggregate(replicated, list(keys) + [window_col], spec, num_partitions)


def grouped_topk(
    ds,
    keys: Sequence[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tie_cols: Sequence[str] = (),
    salt: int = 8,
    num_partitions: int = 16,
):
    """Top-k rows per key group, hot-key safe (salted two-phase).

    Phase 1 computes a top-k on each salt split of every group, phase 2
    merges the per-split partials — a hot key's rows spread over ``salt``
    parallel partials instead of one giant group. Ordering: ``order_col``
    (descending by default), ties broken by ``tie_cols`` ascending.
    """
    from geopolars_ray.stages.agg import salted_group_map

    keys = list(keys)
    tie_cols = list(tie_cols)

    def topk(g: pa.Table) -> pa.Table:
        v = g[order_col].to_numpy(zero_copy_only=False)
        primary = -v if descending else v
        ties = [g[c].to_numpy(zero_copy_only=False) for c in reversed(tie_cols)]
        order = np.lexsort((*ties, primary))[:k]
        return g.take(pa.array(order))

    return salted_group_map(ds, keys, topk, topk, salt=salt, num_partitions=num_partitions)
