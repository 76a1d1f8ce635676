"""GeoArrow nested-array codec: GeometryArray <-> Arrow struct/list arrays.

Layouts mirror the reference's construction exactly
(``/root/reference/py-geopolars/python/geopolars/internals/geoseries.py:86-138``
for encode, ``:164-214`` for decode):

    Point            struct<x: double, y: double>
    LineString       list<struct<x, y>>
    MultiPoint       list<struct<x, y>>
    Polygon          list<list<struct<x, y>>>
    MultiLineString  list<list<struct<x, y>>>
    MultiPolygon     list<list<list<struct<x, y>>>>

Arrow types are ambiguous between LineString/MultiPoint and between
Polygon/MultiLineString, which is precisely why the reference carries an
out-of-band ``_geom_type`` (`internals/geoseries.py:33-45`). Here the geom
type rides in Field metadata (``geopolars_ray.geom_type``) — the
extension-type role Polars could not fill (SURVEY.md §1.5) — or is passed
explicitly to :func:`decode_geoarrow`.

Single-geometry-type columns only (as in the reference); coordinates are
shared zero-copy with the GeometryArray where Arrow allows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geopolars_ray.geom.array import (
    GeometryArray,
    GeometryType,
    POINT,
    LINESTRING,
    POLYGON,
    MULTIPOINT,
    MULTILINESTRING,
    MULTIPOLYGON,
)

GEOM_TYPE_KEY = b"geopolars_ray.geom_type"
CRS_KEY = b"geopolars_ray.crs"

_XY = pa.struct([pa.field("x", pa.float64()), pa.field("y", pa.float64())])


def _xy_struct(ga: GeometryArray) -> pa.StructArray:
    return pa.StructArray.from_arrays(
        [pa.array(np.ascontiguousarray(ga.coords[:, 0])), pa.array(np.ascontiguousarray(ga.coords[:, 1]))],
        ["x", "y"],
    )


def encode_geoarrow(ga: GeometryArray) -> pa.Array:
    """Encode a single-type GeometryArray into the GeoArrow nested layout."""
    types = set(np.unique(ga.types).tolist())
    if len(types) != 1:
        raise ValueError(f"geoarrow encoding needs a single geometry type, got {types}")
    t = types.pop()
    xy = _xy_struct(ga)
    off32 = lambda a: pa.array(np.asarray(a, dtype=np.int32))  # noqa: E731
    if t == POINT:
        return xy
    if t in (LINESTRING, MULTIPOINT):
        # one list level: geometry -> coords (per-part == per-coord for multipoint)
        return pa.ListArray.from_arrays(off32(ga.coord_offsets()), xy)
    if t in (POLYGON, MULTILINESTRING):
        # geometry -> rings -> coords
        rings = pa.ListArray.from_arrays(off32(ga.ring_offsets), xy)
        ring_of_geom = ga.part_offsets[ga.geom_offsets]
        return pa.ListArray.from_arrays(off32(ring_of_geom), rings)
    if t == MULTIPOLYGON:
        rings = pa.ListArray.from_arrays(off32(ga.ring_offsets), xy)
        parts = pa.ListArray.from_arrays(off32(ga.part_offsets), rings)
        return pa.ListArray.from_arrays(off32(ga.geom_offsets), parts)
    raise ValueError(f"cannot geoarrow-encode type id {t}")


def decode_geoarrow(arr: pa.Array | pa.ChunkedArray, geom_type: int | None = None) -> GeometryArray:
    """Decode a GeoArrow nested array back to a GeometryArray.

    ``geom_type`` resolves the LineString/MultiPoint and
    Polygon/MultiLineString ambiguities; defaults to LineString / Polygon.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    depth = 0
    t = arr.type
    while pa.types.is_list(t) or pa.types.is_large_list(t):
        depth += 1
        t = t.value_type
    if not pa.types.is_struct(t):
        raise TypeError(f"not a GeoArrow array: {arr.type}")

    def struct_coords(sa: pa.StructArray) -> np.ndarray:
        x = sa.field("x").to_numpy(zero_copy_only=False)
        y = sa.field("y").to_numpy(zero_copy_only=False)
        return np.column_stack([x, y])

    n = len(arr)
    seq = lambda k: np.arange(k + 1, dtype=np.int64)  # noqa: E731
    if depth == 0:
        coords = struct_coords(arr)
        return GeometryArray.from_points(coords[:, 0], coords[:, 1])
    if depth == 1:
        tid = geom_type if geom_type is not None else LINESTRING
        if tid not in (LINESTRING, MULTIPOINT):
            raise ValueError("depth-1 geoarrow must be LineString or MultiPoint")
        off = arr.offsets.to_numpy().astype(np.int64)
        coords = struct_coords(arr.values)
        if tid == LINESTRING:
            return GeometryArray(
                types=np.full(n, LINESTRING, np.int8),
                geom_offsets=seq(n),
                part_offsets=seq(n),
                ring_offsets=off,
                coords=coords,
            )
        # multipoint: one part+ring per coordinate
        c = len(coords)
        return GeometryArray(
            types=np.full(n, MULTIPOINT, np.int8),
            geom_offsets=off,
            part_offsets=seq(c),
            ring_offsets=seq(c),
            coords=coords,
        )
    if depth == 2:
        tid = geom_type if geom_type is not None else POLYGON
        if tid not in (POLYGON, MULTILINESTRING):
            raise ValueError("depth-2 geoarrow must be Polygon or MultiLineString")
        outer = arr.offsets.to_numpy().astype(np.int64)
        inner = arr.values.offsets.to_numpy().astype(np.int64)
        coords = struct_coords(arr.values.values)
        if tid == POLYGON:
            return GeometryArray(
                types=np.full(n, POLYGON, np.int8),
                geom_offsets=seq(n),
                part_offsets=outer,
                ring_offsets=inner,
                coords=coords,
            )
        r = len(inner) - 1
        # multilinestring: each inner list is a part with one ring
        return GeometryArray(
            types=np.full(n, MULTILINESTRING, np.int8),
            geom_offsets=outer,
            part_offsets=seq(r),
            ring_offsets=inner,
            coords=coords,
        )
    if depth == 3:
        g_off = arr.offsets.to_numpy().astype(np.int64)
        p_off = arr.values.offsets.to_numpy().astype(np.int64)
        r_off = arr.values.values.offsets.to_numpy().astype(np.int64)
        coords = struct_coords(arr.values.values.values)
        return GeometryArray(
            types=np.full(n, MULTIPOLYGON, np.int8),
            geom_offsets=g_off,
            part_offsets=p_off,
            ring_offsets=r_off,
            coords=coords,
        )
    raise ValueError(f"unsupported geoarrow nesting depth {depth}")


def geoarrow_field(name: str, ga: GeometryArray, crs: str | None = None) -> tuple[pa.Field, pa.Array]:
    """(field-with-metadata, array): geom type + CRS carried in Field metadata."""
    arr = encode_geoarrow(ga)
    t = int(ga.types[0])
    meta = {GEOM_TYPE_KEY: GeometryType(t).name.encode()}
    if crs:
        meta[CRS_KEY] = crs.encode()
    return pa.field(name, arr.type, metadata=meta), arr


def decode_geoarrow_field(field: pa.Field, arr: pa.Array) -> GeometryArray:
    """Decode using the geom type recorded in Field metadata."""
    tid = None
    if field.metadata and GEOM_TYPE_KEY in field.metadata:
        tid = int(GeometryType[field.metadata[GEOM_TYPE_KEY].decode()])
    return decode_geoarrow(arr, geom_type=tid)
