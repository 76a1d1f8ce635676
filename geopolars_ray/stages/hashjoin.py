"""Robust distributed hash equi-join (union + co-partition + local Acero).

Why not ``ray.data.Dataset.join``: Ray 2.49's hash-shuffle join materializes
an empty partition as a ZERO-COLUMN table, so any key whose hash partition
receives no rows on one side crashes Acero with "No match ... for key field
reference ... side of the join". That makes the native join unusable for
sparse keys (grid cells, remainder id sets) — exactly the keys our
partitioned spatial/kNN joins use. (Verified: a left_anti join against an
empty-but-schema-correct right Dataset raises ArrowInvalid.)

Shape: pad both sides to one union schema tagged with a ``_side`` column,
hash-co-partition on the key (the same ``hash_partitioned_map`` exchange that
backs ``hash_aggregate``), then run ONE ``pyarrow.Table.join`` (C++ Acero)
per partition. Empty sides keep their schema because WE construct the
partition tables, so empty partitions are handled correctly by construction.

Supported: inner, left (outer), left_anti, left_semi on equality keys.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa

_ACERO_TYPE = {
    "inner": "inner",
    "left": "left outer",
    "full_outer": "full outer",
    "left_anti": "left anti",
    "left_semi": "left semi",
}


def hash_join(
    left_ds,
    right_ds,
    on: Sequence[str],
    *,
    right_on: Sequence[str] | None = None,
    how: str = "inner",
    num_partitions: int = 32,
    r_suffix: str = "_r",
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
):
    """Join two Datasets on equality keys; robust to empty hash partitions.

    Output columns: all left columns, plus (for inner/left/full_outer)
    every non-key right column — renamed with ``r_suffix`` when it collides
    with a left column name. Key columns appear once, under their LEFT
    names (full_outer coalesces keys, so right-only rows carry their key).

    ``left_schema``/``right_schema``: pass explicit Arrow schemas when known —
    ``Dataset.schema()`` on a lazy pipeline can return None (e.g. when the
    first produced block is empty), and it triggers partial execution.
    """
    if how not in _ACERO_TYPE:
        raise ValueError(f"unsupported join type {how!r}")
    from geopolars_ray.stages.agg import hash_partitioned_map

    on = list(on)
    right_on = list(right_on or on)
    if len(on) != len(right_on):
        raise ValueError("on and right_on must have equal length")
    ls = left_schema if left_schema is not None else left_ds.schema()
    rs = right_schema if right_schema is not None else right_ds.schema()
    if ls is None or rs is None:
        raise ValueError("schema unavailable — pass left_schema/right_schema explicitly")
    lnames = list(ls.names)
    ltypes = dict(zip(ls.names, ls.types))
    rtypes = dict(zip(rs.names, rs.types))
    r_vals = [c for c in rs.names if c not in right_on]
    out_rname = {c: (c + r_suffix if c in lnames else c) for c in r_vals}
    keep_r_vals = how in ("inner", "left", "full_outer")

    def pad_left(b: pa.Table) -> pa.Table:
        out = b.select(lnames)
        if keep_r_vals:
            for c in r_vals:
                out = out.append_column(out_rname[c], pa.nulls(len(b), rtypes[c]))
        return out.append_column("_side", pa.array(np.zeros(len(b), dtype=np.int8)))

    def pad_right(b: pa.Table) -> pa.Table:
        cols = {}
        for name in lnames:
            if name in on:
                cols[name] = b[right_on[on.index(name)]]
            else:
                cols[name] = pa.nulls(len(b), ltypes[name])
        if keep_r_vals:
            for c in r_vals:
                cols[out_rname[c]] = b[c]
        out = pa.table(cols)
        return out.append_column("_side", pa.array(np.ones(len(b), dtype=np.int8)))

    both = left_ds.map_batches(pad_left, batch_format="pyarrow").union(
        right_ds.map_batches(pad_right, batch_format="pyarrow")
    )

    r_cols = on + ([out_rname[c] for c in r_vals] if keep_r_vals else [])
    acero_how = _ACERO_TYPE[how]

    def per_partition(part: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lmask = pc.equal(part["_side"], 0)
        l = part.filter(lmask).select(lnames)
        r = part.filter(pc.invert(lmask)).select(r_cols)
        return l.join(r, keys=on, join_type=acero_how)

    return hash_partitioned_map(both, on, per_partition, num_partitions)


def broadcast_hash_join(
    left_ds,
    right: pa.Table,
    on: Sequence[str],
    *,
    right_on: Sequence[str] | None = None,
    how: str = "inner",
    r_suffix: str = "_r",
):
    """Zero-shuffle equi-join against a SMALL in-memory right side.

    The right table is ``ray.put`` once and every task joins its batch
    against the shared copy (one zero-copy object-store read per worker) —
    no exchange at all, vs hash_join's all-to-all. The right primitive
    whenever the right side fits comfortably in the object store
    (dimension tables, admin lookups, dedup'd key sets); for two big sides
    use :func:`hash_join`.

    Same output-column contract as :func:`hash_join` (keys once under left
    names; right value columns suffixed on collision). ``full_outer`` is
    NOT supported — right-only rows would need a global view.
    """
    import ray

    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(f"unsupported broadcast join type {how!r}")
    on = list(on)
    right_on = list(right_on or on)
    # pre-rename right columns to the output contract, keys to LEFT names
    rename = {}
    for lk, rk in zip(on, right_on):
        rename[rk] = lk
    r_tbl = right.rename_columns([rename.get(c, c) for c in right.column_names])
    ref = ray.put(r_tbl)
    acero_how = _ACERO_TYPE[how]

    def fn(batch: pa.Table) -> pa.Table:
        r = ray.get(ref)
        keep = [c for c in r.column_names if c in on] + [
            c for c in r.column_names if c not in on
        ]
        lcols = set(batch.column_names)
        out_names = {
            c: (c + r_suffix if c in lcols and c not in on else c)
            for c in keep
        }
        r2 = r.select(keep).rename_columns([out_names[c] for c in keep])
        return batch.join(r2, keys=on, join_type=acero_how)

    return left_ds.map_batches(fn, batch_format="pyarrow")
