"""Distributed polygonize: faces of each key group's line arrangement.

Shapely/GEOS ``polygonize`` lifted to a Dataset: all line rows of a key
are co-located with ONE hash exchange (`stages/agg.py
hash_partitioned_map` — the same shape as ``dissolve``), each group's
arrangement is noded/faced in a single task (`geom/polygonize.py`), and
the output is one row per bounded face. Unlike dissolve there is no
map-side combiner: noding is not associative over subsets of linework
(a face can be bounded by lines from different blocks), so the exchange
carries the raw line coordinates — which IS the minimal payload.

Scale note: groups fan out across the cluster; per-group cost is the
O((n + k) log n) sweep, the same bound GEOS pays single-threaded. Keys
should partition the linework spatially (tile id, admin id) so no group
holds the whole corpus.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from geopolars_ray.geom import decode_wkb, encode_wkb
from geopolars_ray.geom.array import GeometryArray
from geopolars_ray.geom.polygonize import polygonize_geoms
from geopolars_ray.stages.agg import hash_partitioned_map


def _polygonize_partition(tbl: pa.Table, by: list[str],
                          geometry_col: str) -> pa.Table:
    idx = pc.sort_indices(tbl, sort_keys=[(k, "ascending") for k in by])
    tbl = tbl.take(idx)
    geoms = decode_wkb(tbl[geometry_col]).to_pylist()
    key_cols = [tbl[k].to_pylist() for k in by]
    keys = list(zip(*key_cols))
    out_keys: list[tuple] = []
    out_fids: list[int] = []
    out_geoms: list = []
    i, n = 0, len(keys)
    while i < n:
        j = i
        while j < n and keys[j] == keys[i]:
            j += 1
        for fid, poly in enumerate(polygonize_geoms(geoms[i:j])):
            out_keys.append(keys[i])
            out_fids.append(fid)
            out_geoms.append(poly)
        i = j
    cols: dict = {k: pa.array([t[ki] for t in out_keys], type=tbl[k].type)
                  for ki, k in enumerate(by)}
    cols["face_id"] = pa.array(out_fids, type=pa.int64())
    cols[geometry_col] = encode_wkb(GeometryArray.from_pylist(out_geoms))
    return pa.table(cols)


def polygonize_by(ds, by, geometry_col: str = "geometry",
                  num_partitions: int = 32):
    """Polygonize a Dataset's line rows per key.

    Returns a Dataset with one row per bounded face of each key's
    arrangement: the key columns, a deterministic ``face_id`` (faces
    sorted by their shell's smallest vertex), and the face polygon
    (WKB, shell CCW, holes CW). Dangles and cut edges are dropped,
    matching GEOS ``Polygonizer``.
    """
    by = [by] if isinstance(by, str) else list(by)
    if not by:
        raise ValueError("polygonize_by requires at least one key column")
    pruned = ds.map_batches(
        lambda b: b.select(by + [geometry_col]), batch_format="pyarrow")
    return hash_partitioned_map(
        pruned, by,
        lambda t: _polygonize_partition(t, by, geometry_col),
        num_partitions=num_partitions)
