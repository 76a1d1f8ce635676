"""WKT parser/formatter — covers WKT-in-CSV ingestion (`read_file` analogue
for text exports; the reference reads these through OGR,
``py-geopolars/python/geopolars/io/file.py:15-119``).

Per-row string parsing is inherent to the format; it runs inside
``map_batches`` so the work distributes with the read. Supported: the six
concrete types + EMPTY; xy only (Z/M rejected), matching the engine's
2-D data model (SURVEY.md §1.2).
"""

from __future__ import annotations

from geopolars_ray.geom.array import GeometryArray


def _split_depth0(s: str) -> list[str]:
    """Split on commas at parenthesis depth 0."""
    parts = []
    depth = 0
    start = 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return parts


def _strip_parens(s: str) -> str:
    s = s.strip()
    if not (s.startswith("(") and s.endswith(")")):
        raise ValueError(f"expected parenthesized WKT body, got {s[:40]!r}")
    return s[1:-1]


def _coord(s: str) -> tuple[float, float]:
    vals = s.split()
    if len(vals) != 2:
        raise ValueError(f"only 2-D WKT coordinates supported, got {s!r}")
    return float(vals[0]), float(vals[1])


def _coord_list(s: str) -> list[tuple[float, float]]:
    return [_coord(p) for p in _split_depth0(s)]


def parse_wkt(s: str | None):
    """One WKT string -> GeometryArray.from_pylist element (None for null/EMPTY)."""
    if s is None:
        return None
    s = s.strip()
    i = 0
    while i < len(s) and (s[i].isalpha() or s[i].isspace()):
        i += 1
    kind = s[:i].strip().lower()
    body = s[i:].strip()
    if body.upper() == "EMPTY" or not body:
        return None
    if kind == "point":
        return ("point", _coord(_strip_parens(body)))
    if kind == "linestring":
        return ("linestring", _coord_list(_strip_parens(body)))
    if kind == "polygon":
        rings = [_coord_list(_strip_parens(r)) for r in _split_depth0(_strip_parens(body))]
        return ("polygon", rings)
    if kind == "multipoint":
        inner = _strip_parens(body)
        pts = []
        for p in _split_depth0(inner):
            p = p.strip()
            pts.append(_coord(_strip_parens(p) if p.startswith("(") else p))
        return ("multipoint", pts)
    if kind == "multilinestring":
        lines = [_coord_list(_strip_parens(l)) for l in _split_depth0(_strip_parens(body))]
        return ("multilinestring", lines)
    if kind == "multipolygon":
        polys = []
        for poly in _split_depth0(_strip_parens(body)):
            rings = [_coord_list(_strip_parens(r)) for r in _split_depth0(_strip_parens(poly))]
            polys.append(rings)
        return ("multipolygon", polys)
    raise ValueError(f"unsupported WKT type {kind!r}")


def geometry_from_wkt(strings: list) -> GeometryArray:
    return GeometryArray.from_pylist([parse_wkt(s) for s in strings])


def _fmt_coord(p) -> str:
    # repr(float(...)) is shortest-exact for doubles; coercing to builtin
    # float matters — repr(np.float64(x)) becomes "np.float64(x)" on numpy 2
    return f"{float(p[0])!r} {float(p[1])!r}"


def _fmt_ring(ring) -> str:
    return "(" + ", ".join(_fmt_coord(p) for p in ring) + ")"


def format_wkt(el) -> str | None:
    """GeometryArray pylist element -> WKT string (repr-precision floats,
    round-trip exact)."""
    if el is None:
        return None
    kind, body = el
    if kind == "point":
        return f"POINT ({_fmt_coord(body)})"
    if kind in ("linestring", "linearring"):
        return f"LINESTRING {_fmt_ring(body)}"
    if kind == "polygon":
        return "POLYGON (" + ", ".join(_fmt_ring(r) for r in body) + ")"
    if kind == "multipoint":
        return "MULTIPOINT (" + ", ".join(f"({_fmt_coord(p)})" for p in body) + ")"
    if kind == "multilinestring":
        return "MULTILINESTRING (" + ", ".join(_fmt_ring(l) for l in body) + ")"
    if kind == "multipolygon":
        return (
            "MULTIPOLYGON ("
            + ", ".join("(" + ", ".join(_fmt_ring(r) for r in poly) + ")" for poly in body)
            + ")"
        )
    raise ValueError(f"unsupported kind {kind!r}")


def geometry_to_wkt(ga: GeometryArray) -> list:
    return [format_wkt(el) for el in ga.to_pylist()]
