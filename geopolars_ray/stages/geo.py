"""GeoSeries ops as Ray Data batch transforms + the kernel registry.

The reference registers each op as a pyfunction and wraps it per-Series
(``/root/reference/py-geopolars/src/api.rs:16-33``); here each op is a
stateless Arrow-batch transform usable as
``ds.map_batches(geo_op("centroid"), batch_format="pyarrow")`` — the whole
FFI chain of the reference (SURVEY.md §3.2) collapses into one vectorized
call per batch. New ops plug in by registering a kernel (SURVEY.md §2.8).

Conventions: geometry columns are Arrow (large_)binary WKB named
``geometry`` by default (`geodataframe.py:12-16` uses the same default);
scalar results are appended as a named column; geometry results replace the
geometry column.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import pyarrow as pa

from geopolars_ray.geom import GeometryArray, decode_wkb, encode_wkb
from geopolars_ray.geom import kernels as K
from geopolars_ray.geom import crs as crs_mod

GEOMETRY = "geometry"

# name -> (kernel, result kind): 'scalar' appends a column, 'geometry'
# replaces the geometry column, 'special' has a custom wrapper below
KERNELS: dict[str, tuple[Callable[..., Any], str]] = {
    "area": (K.area, "scalar"),
    "euclidean_length": (K.euclidean_length, "scalar"),
    "geodesic_length": (K.geodesic_length, "scalar"),
    "geom_type": (K.geom_type, "scalar"),
    "is_empty": (K.is_empty, "scalar"),
    "is_ring": (K.is_ring, "scalar"),
    "x": (K.get_x, "scalar"),
    "y": (K.get_y, "scalar"),
    "centroid": (K.centroid, "geometry"),
    "envelope": (K.envelope, "geometry"),
    "convex_hull": (K.convex_hull, "geometry"),
    "exterior": (K.exterior, "geometry"),
    "simplify": (K.simplify, "geometry"),
    "affine_transform": (K.affine_transform, "geometry"),
    "translate": (K.translate, "geometry"),
    "rotate": (K.rotate, "geometry"),
    "scale": (K.scale, "geometry"),
    "skew": (K.skew, "geometry"),
    "to_crs": (crs_mod.to_crs, "geometry"),
}


def register_kernel(name: str, fn: Callable[..., Any], kind: str = "scalar") -> None:
    """User-extension hook: add a kernel to the registry (SURVEY.md §2.8)."""
    if kind not in ("scalar", "geometry"):
        raise ValueError("kind must be 'scalar' or 'geometry'")
    KERNELS[name] = (fn, kind)


def geo_op(
    name: str,
    geometry_col: str = GEOMETRY,
    out_col: str | None = None,
    **kwargs: Any,
) -> Callable[[pa.Table], pa.Table]:
    """Build a map_batches function applying one registry kernel.

    ``out_col`` names the scalar result column (default: the op name).
    """
    kernel, kind = KERNELS[name]
    out_name = out_col or name

    def fn(batch: pa.Table) -> pa.Table:
        ga = decode_wkb(batch[geometry_col])
        res = kernel(ga, **kwargs)
        if kind == "scalar":
            arr = pa.array(np.asarray(res))
            if out_name in batch.column_names:
                batch = batch.drop_columns([out_name])
            return batch.append_column(out_name, arr)
        wkb = encode_wkb(res)
        idx = batch.column_names.index(geometry_col)
        return batch.set_column(idx, geometry_col, wkb)

    fn.__name__ = f"geo_{name}"
    return fn


def geo_ops(
    steps: list,
    geometry_col: str = GEOMETRY,
) -> Callable[[pa.Table], pa.Table]:
    """Fused kernel chain: decode WKB ONCE, apply N registry kernels, encode
    ONCE (vs one decode+encode round-trip per ``geo_op`` stage — measurable
    on kernel-chain pipelines since codec work rivals kernel work).

    ``steps``: list of ``name`` | ``(name, kwargs)`` | ``(name, kwargs,
    out_col)``. Geometry-valued kernels replace the working geometry for
    subsequent steps; scalar kernels append a column computed from the
    CURRENT (chained) geometry.
    """
    compiled: list[tuple[str, dict, str]] = []
    for step in steps:
        if isinstance(step, str):
            name, kwargs, out_col = step, {}, step
        elif len(step) == 2:
            name, kwargs = step
            out_col = name
        else:
            name, kwargs, out_col = step
        if name not in KERNELS:
            raise KeyError(f"unknown kernel {name!r}")
        compiled.append((name, dict(kwargs), out_col))

    def fn(batch: pa.Table) -> pa.Table:
        ga = decode_wkb(batch[geometry_col])
        geom_dirty = False
        for name, kwargs, out_col in compiled:
            kernel, kind = KERNELS[name]
            res = kernel(ga, **kwargs)
            if kind == "geometry":
                ga = res
                geom_dirty = True
            else:
                if out_col in batch.column_names:
                    batch = batch.drop_columns([out_col])
                batch = batch.append_column(out_col, pa.array(np.asarray(res)))
        if geom_dirty:
            idx = batch.column_names.index(geometry_col)
            batch = batch.set_column(idx, geometry_col, encode_wkb(ga))
        return batch

    fn.__name__ = "geo_ops_" + "_".join(n for n, _, _ in compiled)
    return fn


def geo_bounds(geometry_col: str = GEOMETRY) -> Callable[[pa.Table], pa.Table]:
    """Append xmin/ymin/xmax/ymax columns."""

    def fn(batch: pa.Table) -> pa.Table:
        ga = decode_wkb(batch[geometry_col])
        xmin, ymin, xmax, ymax = K.bounds(ga)
        for nm, v in (("xmin", xmin), ("ymin", ymin), ("xmax", xmax), ("ymax", ymax)):
            batch = batch.append_column(nm, pa.array(v))
        return batch

    return fn


def geo_explode(geometry_col: str = GEOMETRY) -> Callable[[pa.Table], pa.Table]:
    """Explode multi-part rows; other columns replicate per part
    (`geoseries.rs:49-50`; Ray mapping per SURVEY.md §2.2 explode)."""

    def fn(batch: pa.Table) -> pa.Table:
        ga = decode_wkb(batch[geometry_col])
        out, parent = K.explode(ga)
        taken = batch.take(pa.array(parent))
        idx = taken.column_names.index(geometry_col)
        return taken.set_column(idx, geometry_col, encode_wkb(out))

    return fn


def geo_distance(
    left_col: str, right_col: str, out_col: str = "distance"
) -> Callable[[pa.Table], pa.Table]:
    """Row-wise aligned distance between two geometry columns of one Dataset
    (`geoseries.rs:141-146`; binary columnar kernel per SURVEY.md §2.2)."""

    def fn(batch: pa.Table) -> pa.Table:
        d = K.distance(decode_wkb(batch[left_col]), decode_wkb(batch[right_col]))
        return batch.append_column(out_col, pa.array(d))

    return fn


def points_from_xy(
    x_col: str, y_col: str, geometry_col: str = GEOMETRY
) -> Callable[[pa.Table], pa.Table]:
    """Construct a WKB Point geometry column from x/y columns."""

    def fn(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False)
        y = batch[y_col].to_numpy(zero_copy_only=False)
        wkb = encode_wkb(GeometryArray.from_points(x, y))
        if geometry_col in batch.column_names:
            batch = batch.drop_columns([geometry_col])
        return batch.append_column(geometry_col, wkb)

    return fn
