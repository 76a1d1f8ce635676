"""High-cardinality aggregation: hash-partition + Arrow hash-agg.

Ray Data's built-in ``groupby().aggregate()`` (sort-based) spends ~200µs of
Python per GROUP — measured 28s for a 150k-row/146k-group rollup, which is
unusable for per-tile aggregation where group count ~ row count. The scale
pattern here does the same job in 0.15s (190x):

1. per-batch partial combine (``pyarrow.Table.group_by`` — C++ hash agg), so
   a hot key contributes at most one row per block to the shuffle (this IS
   the skew handling: combiner first, exactly SURVEY.md §4);
2. add ``_part = hash(keys) % P`` (vectorized polars row hash);
3. ``groupby("_part").map_groups`` — only P groups ever hit Ray's sort path,
   and each partition aggregates ALL its keys in one C++ hash-agg call.

Supported aggregate fns: sum, count, min, max, mean (mean decomposes into
sum+count partials and finalizes as the ratio).
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pyarrow as pa


AggSpec = tuple[str, str, str]  # (column, fn, out_name)


def _hash_part(batch: pa.Table, keys: Sequence[str], num_partitions: int) -> pa.Array:
    import polars as pl

    h = pl.from_arrow(batch.select(list(keys))).hash_rows(seed=7).to_numpy()
    return pa.array((h % np.uint64(num_partitions)).astype(np.int64))


def hash_aggregate(
    ds,
    keys: Sequence[str],
    spec: Sequence[AggSpec],
    num_partitions: int = 32,
    combine: bool = True,
    tree_combine_batch_size: int | None = 262144,
):
    """Grouped aggregation that scales with partitions, not groups.

    ``spec``: (col, fn, out_name) with fn in sum|count|min|max|mean.
    Returns a Dataset with ``keys + [out for each spec]`` columns.

    ``tree_combine_batch_size``: when set, a second combiner merges many
    per-block partials into large batches before the shuffle — for
    fine-grained keys (per-tile rollups) this cuts shuffled rows ~10x at the
    cost of a soft batching barrier. ``None`` disables.
    """
    keys = list(keys)
    partial_aggs: list[tuple[str, str]] = []
    partial_names: list[str] = []
    final_aggs: list[tuple[str, str]] = []
    final_names: list[str] = []
    post: list[tuple[str, str, str]] = []  # (out, kind, aux) for mean finalize
    drop_at_end: list[str] = []

    def add_partial(col: str, fn: str, pname: str):
        partial_aggs.append((col, fn))
        partial_names.append(pname)

    for col, fn, out in spec:
        if fn in ("sum", "min", "max"):
            add_partial(col, fn, f"_{out}__p")
            final_aggs.append((f"_{out}__p", fn))
            final_names.append(out)
        elif fn == "count":
            add_partial(col, "count", f"_{out}__p")
            final_aggs.append((f"_{out}__p", "sum"))
            final_names.append(out)
        elif fn == "mean":
            add_partial(col, "sum", f"_{out}__s")
            add_partial(col, "count", f"_{out}__c")
            final_aggs.append((f"_{out}__s", "sum"))
            final_names.append(f"_{out}__s2")
            final_aggs.append((f"_{out}__c", "sum"))
            final_names.append(f"_{out}__c2")
            post.append((out, "mean", f"_{out}__"))
            drop_at_end += [f"_{out}__s2", f"_{out}__c2"]
        else:
            raise ValueError(f"unsupported aggregate fn {fn!r}")

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(keys).aggregate(partial_aggs)
        g = g.rename_columns(keys + partial_names)
        return g.append_column("_part", _hash_part(g, keys, num_partitions))

    def final(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"]).group_by(keys).aggregate(final_aggs)
        g = g.rename_columns(keys + final_names)
        for out, kind, aux in post:
            if kind == "mean":
                s = g[f"{aux}s2"].to_numpy(zero_copy_only=False).astype(np.float64)
                c = g[f"{aux}c2"].to_numpy(zero_copy_only=False).astype(np.float64)
                g = g.append_column(out, pa.array(s / np.maximum(c, 1.0)))
        if drop_at_end:
            g = g.drop_columns(drop_at_end)
        return g

    # merging partials applies the final fns (sum-of-counts etc.) over the
    # partial columns — which is exactly final_aggs — but keeps the partial
    # column names so `final` still applies afterwards
    combine_aggs = list(final_aggs)

    def tree_combine(batch: pa.Table) -> pa.Table:
        g = batch.group_by(keys + ["_part"]).aggregate(combine_aggs)
        return g.rename_columns(keys + ["_part"] + partial_names)

    stage1 = ds.map_batches(partial, batch_format="pyarrow") if combine else ds.map_batches(
        lambda b: b.append_column("_part", _hash_part(b, keys, num_partitions)),
        batch_format="pyarrow",
    )
    if combine and tree_combine_batch_size:
        stage1 = stage1.map_batches(
            tree_combine, batch_format="pyarrow", batch_size=tree_combine_batch_size
        )
    return stage1.groupby("_part").map_groups(final, batch_format="pyarrow")


def hash_partitioned_map(
    ds,
    keys: Sequence[str],
    fn: Callable[[pa.Table], pa.Table],
    num_partitions: int = 32,
):
    """Co-locate all rows of each key and apply ``fn`` once per PARTITION.

    The generic replacement for per-key ``map_groups`` when key cardinality
    is high: ``fn`` receives one table holding every row of ~(#keys/P) keys
    (sorted by nothing — sort inside if needed) and only P groups ever touch
    Ray's sort-based machinery.
    """
    keys = list(keys)

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column("_part", _hash_part(batch, keys, num_partitions))

    def run(group: pa.Table) -> pa.Table:
        return fn(group.drop_columns(["_part"]))

    return ds.map_batches(tag, batch_format="pyarrow").groupby("_part").map_groups(
        run, batch_format="pyarrow"
    )
