"""As-of (nearest-prior) join over keyed event streams.

Not in the reference (it has no temporal joins); part of the beyond-reference
operator set for event tables. Standard distributed shape (the as-of pattern
from the Ray Data join guidance): hash-partition both sides on the key so
every key's rows co-locate — implemented as a null-padded schema-aligned
union tagged with a side column — then one ``pandas.merge_asof`` with
``by=key`` per partition (no per-key engine overhead).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa


def asof_join(
    left_ds,
    right_ds,
    key: str,
    ts_col: str = "ts",
    right_cols: Sequence[str] = ("value",),
    suffix: str = "_r",
    num_partitions: int = 16,
):
    """For each left row, attach the latest right row with ts <= left.ts and
    the same key (backward as-of). Left rows with no prior match get nulls.

    Output columns: all left columns + ``<right_col><suffix>`` per requested
    right column.
    """
    from geopolars_ray.stages.agg import hash_partitioned_map

    right_cols = list(right_cols)
    suff_cols = [c + suffix for c in right_cols]
    lschema = left_ds.schema()
    rschema = right_ds.schema()
    rtypes = dict(zip(rschema.names, rschema.types))
    left_names = list(lschema.names)

    def pad_left(batch: pa.Table) -> pa.Table:
        out = batch.select(left_names)
        for c, sc in zip(right_cols, suff_cols):
            out = out.append_column(sc, pa.nulls(len(batch), rtypes[c]))
        return out.append_column("_side", pa.array(np.zeros(len(batch), dtype=np.int8)))

    ltypes = dict(zip(lschema.names, lschema.types))

    def pad_right(batch: pa.Table) -> pa.Table:
        cols = {}
        for name in left_names:
            if name in (key, ts_col):
                cols[name] = batch[name]
            else:
                cols[name] = pa.nulls(len(batch), ltypes[name])
        for c, sc in zip(right_cols, suff_cols):
            cols[sc] = batch[c]
        out = pa.table(cols)
        return out.append_column("_side", pa.array(np.ones(len(batch), dtype=np.int8)))

    both = left_ds.map_batches(pad_left, batch_format="pyarrow").union(
        right_ds.map_batches(pad_right, batch_format="pyarrow")
    )

    def per_partition(part: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # merge_asof runs on (key, ts, positional index) ONLY; value columns
        # never round-trip through pandas, so output types and values stay
        # bit-exact (float64 NaN-padding would silently lose int64 precision
        # above 2^53 and change the schema).
        l_tab = part.filter(pc.equal(part["_side"], 0)).select(left_names)
        r_tab = part.filter(pc.equal(part["_side"], 1)).select([key, ts_col, *suff_cols])

        def ts_sortable(col: pa.ChunkedArray) -> np.ndarray:
            # timestamps/ints -> int64 microseconds; floats stay float (any
            # sortable numeric ts works, matching the pre-rewrite contract)
            if pa.types.is_floating(col.type):
                return col.to_numpy(zero_copy_only=False)
            return col.cast(pa.int64()).to_numpy(zero_copy_only=False)

        ldf = pd.DataFrame(
            {
                key: l_tab[key].to_numpy(zero_copy_only=False),
                "_ts": ts_sortable(l_tab[ts_col]),
                "_lidx": np.arange(l_tab.num_rows, dtype=np.int64),
            }
        ).sort_values("_ts", kind="mergesort")
        rdf = pd.DataFrame(
            {
                key: r_tab[key].to_numpy(zero_copy_only=False),
                "_ts": ts_sortable(r_tab[ts_col]),
                "_ridx": np.arange(r_tab.num_rows, dtype=np.int64),
            }
        ).sort_values("_ts", kind="mergesort")
        merged = pd.merge_asof(ldf, rdf, on="_ts", by=key, direction="backward")
        lidx = merged["_lidx"].to_numpy(dtype=np.int64)
        ridx = merged["_ridx"].to_numpy(dtype=np.float64)  # NaN = no match
        out = l_tab.take(pa.array(lidx))
        miss = np.isnan(ridx)
        r_take = pa.array(np.where(miss, 0, ridx).astype(np.int64), mask=miss)
        r_vals = r_tab.select(suff_cols).take(r_take)
        for sc in suff_cols:
            out = out.append_column(sc, r_vals[sc])
        return out

    return hash_partitioned_map(both, [key], per_partition, num_partitions)
