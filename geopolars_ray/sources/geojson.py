"""Pure-Python GeoJSON reader/writer — `read_file` analogue for the dominant
non-parquet vector format.

The reference reads GeoJSON through OGR with `columns`/`bbox` pushdown
(``/root/reference/py-geopolars/python/geopolars/io/file.py:15-119``). No
GDAL here, so the format is parsed directly:

- **GeoJSONSeq / NDJSON** (one Feature per line, ``.geojsonl``): the SCALE
  path — ``ray.data.read_text`` splits the file(s) into line blocks and each
  batch parses its own features; nothing is materialized on the driver.
- **FeatureCollection** (one JSON document): parsed on the driver —
  inherent to the format (a single JSON object cannot be split) and why
  GeoJSONSeq exists; fine for the small side tables the format is used for.

Geometry becomes a WKB ``geometry`` column (our standard physical encoding,
SURVEY.md §1.2); properties become columns. ``columns`` projects properties;
``bbox`` keeps features whose envelope intersects it (the reference's OGR
bbox candidate semantics).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

import ray

from geopolars_ray.geom import GeometryArray, decode_wkb, encode_wkb
from geopolars_ray.geom import kernels as K

_GJ_TO_PYLIST = {
    "point": "point",
    "linestring": "linestring",
    "polygon": "polygon",
    "multipoint": "multipoint",
    "multilinestring": "multilinestring",
    "multipolygon": "multipolygon",
}


def _gj_geometry_to_pylist(geom: dict | None):
    """One GeoJSON geometry dict -> GeometryArray.from_pylist element."""
    if geom is None:
        return None
    t = str(geom.get("type", "")).lower()
    kind = _GJ_TO_PYLIST.get(t)
    if kind is None:
        raise ValueError(f"unsupported GeoJSON geometry type {geom.get('type')!r}")
    c = geom.get("coordinates")
    if c is None:
        return None
    if kind == "point":
        return ("point", (c[0], c[1]))
    if kind == "linestring":
        return ("linestring", [(p[0], p[1]) for p in c])
    if kind == "polygon":
        return ("polygon", [[(p[0], p[1]) for p in ring] for ring in c])
    if kind == "multipoint":
        return ("multipoint", [(p[0], p[1]) for p in c])
    if kind == "multilinestring":
        return ("multilinestring", [[(p[0], p[1]) for p in line] for line in c])
    return ("multipolygon", [[[(p[0], p[1]) for p in ring] for ring in poly] for poly in c])


def geometry_from_geojson(geoms: list) -> GeometryArray:
    """List of GeoJSON geometry dicts (or None) -> GeometryArray."""
    return GeometryArray.from_pylist([_gj_geometry_to_pylist(g) for g in geoms])


def _pylist_to_gj(el):
    if el is None:
        return None
    kind, body = el
    if kind == "point":
        return {"type": "Point", "coordinates": [body[0], body[1]]}
    if kind in ("linestring", "linearring"):
        return {"type": "LineString", "coordinates": [[p[0], p[1]] for p in body]}
    if kind == "polygon":
        return {"type": "Polygon", "coordinates": [[[p[0], p[1]] for p in ring] for ring in body]}
    if kind == "multipoint":
        return {"type": "MultiPoint", "coordinates": [[p[0], p[1]] for p in body]}
    if kind == "multilinestring":
        return {"type": "MultiLineString", "coordinates": [[[p[0], p[1]] for p in line] for line in body]}
    if kind == "multipolygon":
        return {
            "type": "MultiPolygon",
            "coordinates": [[[[p[0], p[1]] for p in ring] for ring in poly] for poly in body],
        }
    raise ValueError(f"unsupported kind {kind!r}")


def geometry_to_geojson(ga: GeometryArray) -> list:
    """GeometryArray -> list of GeoJSON geometry dicts (None for missing)."""
    return [_pylist_to_gj(el) for el in ga.to_pylist()]


def _features_to_table(
    features: list[dict],
    columns: list[str] | None,
    geometry_col: str,
    prop_schema: pa.Schema | None = None,
) -> pa.Table:
    geoms = [f.get("geometry") for f in features]
    props = [f.get("properties") or {} for f in features]
    ga = geometry_from_geojson(geoms)
    wkb = encode_wkb(ga)
    if prop_schema is not None:
        # fixed schema (driver-sniffed or user-supplied): every block gets
        # identical column set/order/types; properties missing in a batch
        # become nulls instead of that batch silently dropping the column
        tab = pa.Table.from_pylist(props, schema=prop_schema)
    elif props and any(props):
        tab = pa.Table.from_pylist(props)
    else:
        tab = pa.table({})
    if columns is not None and prop_schema is None:
        keep = [c for c in columns if c in tab.column_names]
        tab = tab.select(keep)
    if tab.num_columns == 0:
        return pa.table({geometry_col: wkb})
    return tab.append_column(geometry_col, wkb)


def _sniff_prop_schema(paths: list[str], columns: list[str] | None, n: int = 256) -> pa.Schema | None:
    """Infer ONE property schema from the first ``n`` features across the
    input files (driver-side).  Per-batch inference yields conflicting block
    schemas when feature property sets/types differ between line blocks
    (conflicting block schemas break the stream); a single sniffed schema makes every block agree.  Callers
    with heterogeneous tails beyond the sniff window should pass ``schema=``
    explicitly."""
    props: list[dict] = []
    for p in paths:
        with open(p, "r", encoding="utf-8") as f:
            for line in f:
                if not line.strip():
                    continue
                props.append(json.loads(line).get("properties") or {})
                if len(props) >= n:
                    break
        if len(props) >= n:
            break
    if not props or not any(props):
        return pa.schema([])
    schema = pa.Table.from_pylist(props).schema
    if columns is not None:
        fields = [schema.field(c) for c in columns if c in schema.names]
        schema = pa.schema(fields)
    return schema


def _bbox_stage(bbox, geometry_col: str):
    from geopolars_ray.sources.io import bbox_envelope_filter

    return bbox_envelope_filter(bbox, geometry_col)


def read_geojson(
    path,
    columns: list[str] | None = None,
    bbox: tuple[float, float, float, float] | None = None,
    geometry_col: str = "geometry",
    schema: pa.Schema | None = None,
    fids: list[int] | None = None,
    skip_features: int = 0,
    max_features: int | None = None,
):
    """Read GeoJSON (FeatureCollection or one-feature-per-line) to a Dataset
    with a WKB ``geometry`` column + property columns.

    ``schema`` fixes the property columns/types for the distributed
    GeoJSONSeq path (default: sniffed from the first 256 features on the
    driver, so all line blocks produce identical block schemas).
    ``fids``/``skip_features``/``max_features`` select by 0-based feature
    order — FeatureCollection only (a GeoJSONSeq read is distributed line
    blocks with no global feature index; slice its output Dataset instead)."""
    paths = [path] if isinstance(path, str) else list(path)
    with open(paths[0], "r", encoding="utf-8") as f:
        first_line = f.readline()
    is_seq = False
    try:
        head = json.loads(first_line)
        is_seq = isinstance(head, dict) and head.get("type") == "Feature"
    except json.JSONDecodeError:
        is_seq = False

    if is_seq:
        if fids is not None or skip_features or max_features is not None:
            raise ValueError(
                "fids/skip_features/max_features are FeatureCollection-only "
                "(GeoJSONSeq reads are distributed line blocks with no global "
                "feature index); use Dataset.limit / a key filter instead"
            )
        prop_schema = schema if schema is not None else _sniff_prop_schema(paths, columns)
        ds = ray.data.read_text(paths)

        def parse(batch: pa.Table) -> pa.Table:
            feats = [json.loads(line) for line in batch["text"].to_pylist() if line.strip()]
            return _features_to_table(feats, columns, geometry_col, prop_schema=prop_schema)

        out = ds.map_batches(parse, batch_format="pyarrow")
    else:
        feats: list[dict] = []
        for p in paths:
            with open(p, "r", encoding="utf-8") as f:
                doc = json.load(f)
            if doc.get("type") == "FeatureCollection":
                feats.extend(doc.get("features") or [])
            elif doc.get("type") == "Feature":
                feats.append(doc)
            else:  # bare geometry document
                feats.append({"type": "Feature", "geometry": doc, "properties": {}})
        if fids is not None:
            want = set(int(f) for f in fids)
            feats = [f for i, f in enumerate(feats) if i in want]
        elif skip_features or max_features is not None:
            end = None if max_features is None else skip_features + max_features
            feats = feats[skip_features:end]
        out = ray.data.from_arrow(_features_to_table(feats, columns, geometry_col))

    if bbox is not None:
        out = out.map_batches(_bbox_stage(bbox, geometry_col), batch_format="pyarrow")
    return out


def write_geojson(table: pa.Table, path: str, geometry_col: str = "geometry") -> None:
    """Write one Arrow table (WKB geometry + property columns) as a
    FeatureCollection document (driver-side; for side tables / tests)."""
    ga = decode_wkb(table[geometry_col])
    geoms = geometry_to_geojson(ga)
    prop_cols = [c for c in table.column_names if c != geometry_col]
    props = table.select(prop_cols).to_pylist() if prop_cols else [{} for _ in geoms]
    feats = [
        {"type": "Feature", "geometry": g, "properties": p} for g, p in zip(geoms, props)
    ]
    with open(path, "w", encoding="utf-8") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)


def write_geojsonl(table: pa.Table, path: str, geometry_col: str = "geometry") -> None:
    """Write one Arrow table as newline-delimited Features (GeoJSONSeq) —
    the format the scale read path consumes."""
    ga = decode_wkb(table[geometry_col])
    geoms = geometry_to_geojson(ga)
    prop_cols = [c for c in table.column_names if c != geometry_col]
    props = table.select(prop_cols).to_pylist() if prop_cols else [{} for _ in geoms]
    with open(path, "w", encoding="utf-8") as f:
        for g, p in zip(geoms, props):
            f.write(json.dumps({"type": "Feature", "geometry": g, "properties": p}))
            f.write("\n")
