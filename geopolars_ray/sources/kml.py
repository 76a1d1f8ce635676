"""Pure-Python KML 2.2 reader/writer — extends `read_file`'s format reach
into OGR's LIBKML territory (the reference reads KML through OGR,
``/root/reference/py-geopolars/python/geopolars/io/file.py:15-119``).

KML is one XML document, so like the GeoJSON FeatureCollection path it is
parsed on the driver (inherent to the format; used for small side tables).
``<Placemark>`` elements anywhere under the root (Document/Folder nesting is
flattened in document order) become rows:

- geometry: Point / LineString / LinearRing / Polygon (outer + inner
  boundaries) / MultiGeometry (homogeneous children -> Multi*; mixed
  children rejected, same GeometryCollection policy as the rest of the
  engine). Coordinates are ``lon,lat[,alt]`` whitespace-separated tuples;
  altitude is dropped (2D engine).
- properties: ``<name>``, ``<description>``, and every
  ``<ExtendedData><Data name=..><value>`` / ``<SchemaData><SimpleData
  name=..>`` entry, all as string columns (KML carries values as text; no
  type fabrication).

The writer emits a ``<Document>`` of Placemarks with ``<ExtendedData>``
entries for every non-geometry column, so write -> read round-trips
geometry bit-exactly (repr-roundtrip float formatting) and properties as
strings.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pyarrow as pa

from geopolars_ray.geom import GeometryArray, decode_wkb, encode_wkb

KML_NS = "http://www.opengis.net/kml/2.2"


def _ln(tag: str) -> str:
    """Local name of a (possibly namespaced) element tag."""
    return tag.rsplit("}", 1)[-1]


def _parse_coordinates(text: str | None) -> list[tuple[float, float]]:
    if not text:
        return []
    pts = []
    for tup in text.split():
        parts = tup.split(",")
        if len(parts) < 2:
            raise ValueError(f"bad KML coordinate tuple {tup!r}")
        pts.append((float(parts[0]), float(parts[1])))
    return pts


def _find_child(el: ET.Element, name: str) -> ET.Element | None:
    for c in el:
        if _ln(c.tag) == name:
            return c
    return None


_MULTI_OF = {"point": "multipoint", "linestring": "multilinestring", "polygon": "multipolygon"}


def _parse_geometry(el: ET.Element):
    """One KML geometry element -> GeometryArray.from_pylist element."""
    kind = _ln(el.tag)
    if kind == "Point":
        pts = _parse_coordinates(getattr(_find_child(el, "coordinates"), "text", None))
        if not pts:
            return None
        return ("point", pts[0])
    if kind in ("LineString", "LinearRing"):
        pts = _parse_coordinates(getattr(_find_child(el, "coordinates"), "text", None))
        return ("linestring", pts)
    if kind == "Polygon":
        rings = []
        outer = _find_child(el, "outerBoundaryIs")
        if outer is not None:
            ring = _find_child(outer, "LinearRing")
            if ring is not None:
                rings.append(_parse_coordinates(getattr(_find_child(ring, "coordinates"), "text", None)))
        for c in el:
            if _ln(c.tag) == "innerBoundaryIs":
                ring = _find_child(c, "LinearRing")
                if ring is not None:
                    rings.append(_parse_coordinates(getattr(_find_child(ring, "coordinates"), "text", None)))
        return ("polygon", rings)
    if kind == "MultiGeometry":
        parts = [_parse_geometry(c) for c in el if _ln(c.tag) in _GEOM_TAGS]
        parts = [p for p in parts if p is not None]
        if not parts:
            return None
        kinds = {p[0] for p in parts}
        if len(kinds) > 1:
            raise ValueError(
                f"mixed MultiGeometry children {sorted(kinds)} unsupported "
                "(GeometryCollection policy, COVERAGE.md)"
            )
        k = kinds.pop()
        if k not in _MULTI_OF:
            raise ValueError(f"MultiGeometry of {k!r} unsupported")
        return (_MULTI_OF[k], [p[1] for p in parts])
    raise ValueError(f"unsupported KML geometry element {kind!r}")


_GEOM_TAGS = {"Point", "LineString", "LinearRing", "Polygon", "MultiGeometry"}


def _placemark_row(pm: ET.Element):
    """-> (geometry pylist element | None, {prop: str})."""
    geom = None
    props: dict[str, str] = {}
    for c in pm:
        name = _ln(c.tag)
        if name in _GEOM_TAGS:
            geom = _parse_geometry(c)
        elif name in ("name", "description"):
            if c.text is not None:
                props[name] = c.text
        elif name == "ExtendedData":
            for d in c:
                dname = _ln(d.tag)
                if dname == "Data":
                    key = d.get("name")
                    val = _find_child(d, "value")
                    if key and val is not None and val.text is not None:
                        props[key] = val.text
                elif dname == "SchemaData":
                    for sd in d:
                        if _ln(sd.tag) == "SimpleData" and sd.get("name") and sd.text is not None:
                            props[sd.get("name")] = sd.text
    return geom, props


def _iter_placemarks(root: ET.Element):
    """Placemarks in document order, any Document/Folder nesting depth."""
    for el in root.iter():
        if _ln(el.tag) == "Placemark":
            yield el


def read_kml(
    path,
    columns: list[str] | None = None,
    bbox: tuple[float, float, float, float] | None = None,
    geometry_col: str = "geometry",
    fids: list[int] | None = None,
    skip_features: int = 0,
    max_features: int | None = None,
):
    """Read KML file(s) to a Ray Dataset with a WKB ``geometry`` column and
    string property columns. ``fids`` / ``skip_features`` / ``max_features``
    index raw Placemark document order (0-based, continuing across files),
    the reference's OGR feature-id semantics for this driver."""
    import ray

    paths = [path] if isinstance(path, str) else list(path)
    rows = []
    for p in paths:
        root = ET.parse(p).getroot()
        for pm in _iter_placemarks(root):
            rows.append(_placemark_row(pm))
    if fids is not None:
        want = set(int(f) for f in fids)
        rows = [r for i, r in enumerate(rows) if i in want]
    else:
        end = None if max_features is None else skip_features + max_features
        rows = rows[skip_features:end]

    geoms = [r[0] for r in rows]
    props = [r[1] for r in rows]
    prop_names: list[str] = []
    for pr in props:
        for k in pr:
            if k not in prop_names:
                prop_names.append(k)
    if columns is not None:
        prop_names = [c for c in columns if c in prop_names]
    wkb = encode_wkb(GeometryArray.from_pylist(geoms))
    arrs = [pa.array([pr.get(n) for pr in props], pa.string()) for n in prop_names]
    tab = pa.Table.from_arrays(arrs + [wkb], names=prop_names + [geometry_col])
    out = ray.data.from_arrow(tab)
    if bbox is not None:
        from geopolars_ray.sources.io import bbox_envelope_filter

        out = out.map_batches(bbox_envelope_filter(bbox, geometry_col), batch_format="pyarrow")
    return out


def _coords_text(pts) -> str:
    return " ".join(f"{repr(float(x))},{repr(float(y))}" for x, y in pts)


def _geom_to_kml(el, parent: ET.Element) -> None:
    if el is None:
        return
    kind, body = el
    if kind == "point":
        g = ET.SubElement(parent, "Point")
        ET.SubElement(g, "coordinates").text = _coords_text([body])
    elif kind in ("linestring", "linearring"):
        g = ET.SubElement(parent, "LineString")
        ET.SubElement(g, "coordinates").text = _coords_text(body)
    elif kind == "polygon":
        g = ET.SubElement(parent, "Polygon")
        for i, ring in enumerate(body):
            b = ET.SubElement(g, "outerBoundaryIs" if i == 0 else "innerBoundaryIs")
            r = ET.SubElement(b, "LinearRing")
            ET.SubElement(r, "coordinates").text = _coords_text(ring)
    elif kind in ("multipoint", "multilinestring", "multipolygon"):
        g = ET.SubElement(parent, "MultiGeometry")
        inner = {"multipoint": "point", "multilinestring": "linestring", "multipolygon": "polygon"}[kind]
        for part in body:
            _geom_to_kml((inner, part), g)
    else:
        raise ValueError(f"unsupported kind {kind!r}")


def write_kml(table: pa.Table, path: str, geometry_col: str = "geometry") -> None:
    """Write one Arrow table (WKB geometry + property columns) as a KML
    Document (driver-side; for side tables / tests). ``name`` and
    ``description`` columns map to the native KML elements; every other
    column becomes an ``<ExtendedData><Data>`` entry (stringified)."""
    ga = decode_wkb(table[geometry_col])
    elements = ga.to_pylist()
    prop_cols = [c for c in table.column_names if c != geometry_col]
    props = table.select(prop_cols).to_pylist() if prop_cols else [{} for _ in elements]

    root = ET.Element("kml", {"xmlns": KML_NS})
    doc = ET.SubElement(root, "Document")
    for el, pr in zip(elements, props):
        pm = ET.SubElement(doc, "Placemark")
        ext = None
        for k, v in pr.items():
            if v is None:
                continue
            if k in ("name", "description"):
                ET.SubElement(pm, k).text = str(v)
            else:
                if ext is None:
                    ext = ET.SubElement(pm, "ExtendedData")
                d = ET.SubElement(ext, "Data", {"name": k})
                ET.SubElement(d, "value").text = str(v)
        _geom_to_kml(el, pm)
    ET.ElementTree(root).write(path, encoding="unicode", xml_declaration=True)
