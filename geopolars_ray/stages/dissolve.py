"""Distributed dissolve (grouped unary union) on the overlay engine.

GeoPandas ``dissolve(by=...)`` semantics for polygonal layers: all
geometries sharing a key merge into one (multi)polygon, interior seams
dissolved. The reference exposes no dissolve (its geo-crate surface
stops at predicates); this follows the GeoPandas API shape instead.

Scale design — combiner-first, exactly like ``hash_aggregate``:

1. **Map-side partial union** (``map_batches``): within every block,
   geometries are grouped by key and pairwise-unioned immediately, so
   what enters the exchange is one already-dissolved geometry per
   (block, key) — the shuffle carries compressed partials, never the
   raw rows. Union is associative and commutative, so partials merge
   exactly.
2. **One hash exchange** (``hash_partitioned_map``): partials co-locate
   by key and fold to the final geometry per key. A hot key costs one
   task but only #blocks-sized input (not #rows), because step 1
   already collapsed within-block duplicates.

Geometry folding uses ``overlay.boolean_op`` with each input as its own
operand (balanced binary tree), so overlapping inputs dissolve rather
than even-odd-cancel. Polygonal rows only — dissolve of point/line
layers is collection, not union; use ``collect_by`` for those. Null
geometries are ignored; a key whose geometries are all null yields a
null dissolved geometry.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from geopolars_ray.geom import decode_wkb, encode_wkb
from geopolars_ray.geom.array import GeometryArray
from geopolars_ray.geom.buffer import _union_tree
from geopolars_ray.stages.agg import hash_partitioned_map

_POLY_TYPES = frozenset(["polygon", "multipolygon"])


def _fold_batch(batch: pa.Table, by: list[str], geometry_col: str,
                count_col: str) -> pa.Table:
    """Union geometries per key within ONE table; emits one row per key
    with the dissolved geometry (WKB) and the summed row count."""
    idx = pc.sort_indices(batch, sort_keys=[(k, "ascending") for k in by])
    tbl = batch.take(idx)
    geoms = decode_wkb(tbl[geometry_col]).to_pylist()
    counts = (tbl[count_col].to_numpy(zero_copy_only=False)
              if count_col in tbl.column_names else np.ones(len(tbl), np.int64))
    key_cols = [tbl[k].to_pylist() for k in by]
    keys = list(zip(*key_cols)) if key_cols else [()] * len(tbl)
    out_keys: list[tuple] = []
    out_geoms: list = []
    out_counts: list[int] = []
    i = 0
    n = len(keys)
    while i < n:
        j = i
        while j < n and keys[j] == keys[i]:
            j += 1
        pieces = []
        for g in geoms[i:j]:
            if g is None:
                continue
            if g[0] not in _POLY_TYPES:
                raise TypeError(
                    f"dissolve requires polygonal geometries, got {g[0]!r}; "
                    "use collect_by for point/line grouping"
                )
            pieces.append(g)
        merged = _union_tree(pieces)
        if merged is not None and len(merged[1]) == 1:
            merged = ("polygon", merged[1][0])
        out_keys.append(keys[i])
        out_geoms.append(merged)
        out_counts.append(int(counts[i:j].sum()))
        i = j
    cols: dict = {k: pa.array([t[ki] for t in out_keys], type=batch[k].type)
                  for ki, k in enumerate(by)}
    cols[geometry_col] = encode_wkb(GeometryArray.from_pylist(out_geoms))
    cols[count_col] = pa.array(out_counts, type=pa.int64())
    return pa.table(cols)


def dissolve(ds, by, geometry_col: str = "geometry",
             count_col: str = "n_rows", num_partitions: int = 32):
    """Dissolve a Dataset's polygonal geometries by key.

    Returns a Dataset with one row per distinct ``by`` key: the key
    columns, the dissolved geometry (WKB, seams removed, single parts
    collapsed to POLYGON), and ``count_col`` = number of input rows.
    """
    by = [by] if isinstance(by, str) else list(by)
    if not by:
        raise ValueError("dissolve requires at least one key column")

    def partial(batch: pa.Table) -> pa.Table:
        return _fold_batch(batch.select(by + [geometry_col]),
                           by, geometry_col, count_col)

    def final(part: pa.Table) -> pa.Table:
        return _fold_batch(part, by, geometry_col, count_col)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return hash_partitioned_map(partials, by, final,
                                num_partitions=num_partitions)
