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
        df = part.to_pandas()
        l = df[df["_side"] == 0][left_names].sort_values(ts_col, kind="mergesort")
        r = (
            df[df["_side"] == 1][[key, ts_col, *suff_cols]]
            .sort_values(ts_col, kind="mergesort")
        )
        merged = pd.merge_asof(l, r, on=ts_col, by=key, direction="backward")
        out = pa.Table.from_pandas(merged, preserve_index=False)
        # the null-padded union upcast the other side's int columns to float64
        # in pandas — cast left columns back to their original Arrow types
        for i, name in enumerate(out.column_names):
            if name in ltypes and out.schema.field(i).type != ltypes[name]:
                out = out.set_column(i, name, out[name].cast(ltypes[name]))
        return out

    return hash_partitioned_map(both, [key], per_partition, num_partitions)
