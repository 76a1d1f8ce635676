"""Pure-Python GML reader/writer (GML 2.1 and 3.x as emitted by WFS) —
extends `read_file` into more of OGR's format territory (the reference
reads GML through OGR, ``py-geopolars/python/geopolars/io/file.py:15-119``).

A GML document is one XML FeatureCollection parsed on the driver (inherent
to the format; side tables). Features are the children of
``gml:featureMember`` / ``gml:featureMembers`` / ``wfs:member`` elements;
each feature's child elements become rows:

- geometry: the first child (at any property nesting depth of one) that is
  a GML geometry element. Supported: Point, LineString, LinearRing,
  Polygon (exterior/interior in GML3 terms, outer/innerBoundaryIs in
  GML2), MultiPoint/MultiLineString/MultiPolygon and their GML3 aliases
  MultiCurve/MultiSurface. Coordinates come from ``gml:posList`` /
  ``gml:pos`` (GML3, space-separated) or ``gml:coordinates`` (GML2,
  ``x,y`` tuples); ``srsDimension=3`` drops the altitude.
- axis order: GML3 documents with ``srsName="urn:ogc:def:crs:EPSG::4326"``
  are latitude-first per the spec — detected from the srsName URN form and
  swapped to lon,lat automatically; override with ``swap_axes=True/False``.
- properties: every non-geometry child element with text becomes a string
  column (GML carries values as text; no type fabrication — same policy as
  the KML reader).

The writer emits a GML 3.2 FeatureCollection (posList, lon,lat order,
plain ``EPSG:4326`` srsName — the non-swapping form), so write → read
round-trips geometry bit-exactly (repr float formatting) and properties as
strings.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pyarrow as pa

from geopolars_ray.geom import GeometryArray, decode_wkb, encode_wkb

GML_NS = "http://www.opengis.net/gml/3.2"


def _ln(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


_GEOM_TAGS = {
    "Point", "LineString", "LinearRing", "Polygon",
    "MultiPoint", "MultiLineString", "MultiPolygon",
    "MultiCurve", "MultiSurface",
}
_MEMBER_TAGS = {"featureMember", "featureMembers", "member"}
# URN srsName forms are axis-order-honoring (lat,lon for EPSG:4326);
# the legacy "EPSG:4326" / URL forms are lon,lat in every major writer.
_LATLON_SRS_PREFIXES = ("urn:ogc:def:crs:EPSG", "urn:x-ogc:def:crs:EPSG")


def _pairs_from_poslist(text: str, dim: int, swap: bool) -> list[tuple[float, float]]:
    vals = [float(v) for v in (text or "").split()]
    if dim < 2 or (len(vals) % dim):
        raise ValueError(f"posList length {len(vals)} not a multiple of srsDimension {dim}")
    pts = [(vals[i], vals[i + 1]) for i in range(0, len(vals), dim)]
    return [(y, x) for x, y in pts] if swap else pts


def _pairs_from_coordinates(el: ET.Element, swap: bool) -> list[tuple[float, float]]:
    # GML2 coordinates: tuples separated by ts (default whitespace),
    # ordinates by cs (default comma) — both overridable by attribute
    cs = el.get("cs", ",")
    ts = el.get("ts")  # None -> any whitespace
    text = el.text or ""
    tuples = text.split(ts) if ts is not None else text.split()
    pts = []
    for tup in tuples:
        tup = tup.strip()
        if not tup:
            continue
        parts = tup.split(cs)
        if len(parts) < 2:
            raise ValueError(f"bad GML coordinate tuple {tup!r} (cs={cs!r})")
        x, y = float(parts[0]), float(parts[1])
        pts.append((y, x) if swap else (x, y))
    return pts


def _ring_coords(el: ET.Element, swap: bool, inherited_dim: int = 2) -> list[tuple[float, float]]:
    """Coordinates of a Point/LineString/LinearRing element body.

    Repeated ``<gml:pos>`` children (spec-valid GML3, emitted by common WFS
    servers for rings/lines) ACCUMULATE — returning after the first one
    would silently collapse a ring to a single vertex.

    ``inherited_dim`` carries srsDimension down from ENCLOSING geometry
    elements (GeoServer puts it on the Polygon, not the LinearRing/posList —
    without inheritance a 3D ring silently interleaves z values as
    vertices and a 3D pos raises).
    """
    base_dim = int(el.get("srsDimension", str(inherited_dim)))
    pts: list[tuple[float, float]] = []
    for c in el:
        name = _ln(c.tag)
        if name == "posList":
            dim = int(c.get("srsDimension", str(base_dim)))
            return _pairs_from_poslist(c.text, dim, swap)
        if name == "pos":
            dim = int(c.get("srsDimension", str(base_dim)))
            pts.extend(_pairs_from_poslist(c.text, max(dim, 2), swap))
        elif name == "coordinates":
            return _pairs_from_coordinates(c, swap)
    return pts


def _find_desc(el: ET.Element, names: set[str]):
    for c in el:
        if _ln(c.tag) in names:
            yield c


def _parse_geometry(el: ET.Element, swap: bool, inherited_dim: int = 2):
    kind = _ln(el.tag)
    dim = int(el.get("srsDimension", str(inherited_dim)))
    if kind == "Point":
        pts = _ring_coords(el, swap, dim)
        return ("point", pts[0]) if pts else None
    if kind in ("LineString", "LinearRing"):
        return ("linestring", _ring_coords(el, swap, dim))
    if kind == "Polygon":
        rings = []
        for b in el:
            name = _ln(b.tag)
            if name in ("exterior", "outerBoundaryIs"):
                for r in _find_desc(b, {"LinearRing"}):
                    rings.insert(0, _ring_coords(r, swap, dim))
            elif name in ("interior", "innerBoundaryIs"):
                for r in _find_desc(b, {"LinearRing"}):
                    rings.append(_ring_coords(r, swap, dim))
        return ("polygon", rings)
    if kind in ("MultiPoint", "MultiLineString", "MultiPolygon", "MultiCurve", "MultiSurface"):
        member_names = {
            "pointMember", "pointMembers", "lineStringMember", "curveMember",
            "polygonMember", "surfaceMember", "geometryMember",
        }
        parts = []
        for m in _find_desc(el, member_names):
            for g in _find_desc(m, _GEOM_TAGS):
                p = _parse_geometry(g, swap, dim)
                if p is not None:
                    parts.append(p)
        kinds = {p[0] for p in parts}
        if not parts:
            return None
        if len(kinds) > 1:
            raise ValueError(f"mixed multi-geometry children {sorted(kinds)} unsupported")
        k = kinds.pop()
        out_kind = {"point": "multipoint", "linestring": "multilinestring",
                    "polygon": "multipolygon"}[k]
        return (out_kind, [p[1] for p in parts])
    raise ValueError(f"unsupported GML geometry element {kind!r}")


def _detect_swap(root: ET.Element) -> bool:
    """lat,lon axis order iff the document declares a URN-form EPSG:4326
    srsName anywhere (the spec-honoring form); everything else is lon,lat."""
    for el in root.iter():
        srs = el.get("srsName")
        if srs:
            if srs.startswith(_LATLON_SRS_PREFIXES) and srs.rstrip(":").rsplit(":", 1)[-1] == "4326":
                return True
            return False
    return False


def _feature_row(feat: ET.Element, swap: bool):
    """-> (geometry pylist element | None, {prop: str})."""
    geom = None
    props: dict[str, str] = {}
    for prop in feat:
        name = _ln(prop.tag)
        if name in _GEOM_TAGS:  # geometry directly under the feature
            if geom is None:  # FIRST geometry wins (docstring + OGR semantics)
                geom = _parse_geometry(prop, swap)
            continue
        sub_geoms = [c for c in prop if _ln(c.tag) in _GEOM_TAGS]
        if sub_geoms:
            if geom is None:
                geom = _parse_geometry(sub_geoms[0], swap)
        elif prop.text is not None and prop.text.strip():
            props[name] = prop.text.strip()
    return geom, props


def read_gml(
    path,
    columns: list[str] | None = None,
    bbox: tuple[float, float, float, float] | None = None,
    geometry_col: str = "geometry",
    swap_axes: bool | None = None,
    fids: list[int] | None = None,
    skip_features: int = 0,
    max_features: int | None = None,
):
    """Read GML file(s) to a Ray Dataset with a WKB ``geometry`` column and
    string property columns. ``fids``/``skip_features``/``max_features``
    index raw feature document order (0-based, continuing across files) —
    the reference's OGR feature-id semantics for this driver."""
    import ray

    paths = [path] if isinstance(path, str) else list(path)
    rows = []
    for p in paths:
        root = ET.parse(p).getroot()
        swap = _detect_swap(root) if swap_axes is None else swap_axes
        for el in root.iter():
            if _ln(el.tag) in _MEMBER_TAGS:
                for feat in el:
                    rows.append(_feature_row(feat, swap))
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


def _poslist_text(pts) -> str:
    return " ".join(f"{repr(float(x))} {repr(float(y))}" for x, y in pts)


def _geom_to_gml(el, parent: ET.Element) -> None:
    if el is None:
        return
    kind, body = el
    if kind == "point":
        g = ET.SubElement(parent, "gml:Point")
        ET.SubElement(g, "gml:pos").text = _poslist_text([body])
    elif kind in ("linestring", "linearring"):
        g = ET.SubElement(parent, "gml:LineString")
        ET.SubElement(g, "gml:posList").text = _poslist_text(body)
    elif kind == "polygon":
        g = ET.SubElement(parent, "gml:Polygon")
        for i, ring in enumerate(body):
            b = ET.SubElement(g, "gml:exterior" if i == 0 else "gml:interior")
            r = ET.SubElement(b, "gml:LinearRing")
            ET.SubElement(r, "gml:posList").text = _poslist_text(ring)
    elif kind in ("multipoint", "multilinestring", "multipolygon"):
        tag = {"multipoint": ("gml:MultiPoint", "gml:pointMember", "point"),
               "multilinestring": ("gml:MultiLineString", "gml:lineStringMember", "linestring"),
               "multipolygon": ("gml:MultiPolygon", "gml:polygonMember", "polygon")}[kind]
        g = ET.SubElement(parent, tag[0])
        for part in body:
            m = ET.SubElement(g, tag[1])
            _geom_to_gml((tag[2], part), m)
    else:
        raise ValueError(f"unsupported kind {kind!r}")


def write_gml(table: pa.Table, path: str, geometry_col: str = "geometry",
              feature_tag: str = "feature") -> None:
    """Write one Arrow table (WKB geometry + property columns) as a GML 3.2
    FeatureCollection (driver-side; side tables / tests). lon,lat order
    with plain ``EPSG:4326`` srsName (the non-swapping form)."""
    ga = decode_wkb(table[geometry_col])
    elements = ga.to_pylist()
    prop_cols = [c for c in table.column_names if c != geometry_col]
    props = table.select(prop_cols).to_pylist() if prop_cols else [{} for _ in elements]

    root = ET.Element("gml:FeatureCollection",
                      {"xmlns:gml": GML_NS, "srsName": "EPSG:4326"})
    for el, pr in zip(elements, props):
        member = ET.SubElement(root, "gml:featureMember")
        feat = ET.SubElement(member, feature_tag)
        for k, v in pr.items():
            if v is not None:
                ET.SubElement(feat, k).text = str(v)
        geo_prop = ET.SubElement(feat, "geometryProperty")
        _geom_to_gml(el, geo_prop)
    ET.ElementTree(root).write(path, encoding="unicode", xml_declaration=True)
