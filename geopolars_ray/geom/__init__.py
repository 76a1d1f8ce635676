"""Vectorized geometry core: ragged arrays, WKB codec, kernels, indexes.

All math is NumPy over flat buffers — no shapely/GEOS/pyproj/h3 (none are
installed; the from-scratch design is the point, see SURVEY.md §7).
"""

from geopolars_ray.geom.array import (  # noqa: F401
    GeometryArray,
    GeometryType,
    MISSING,
    POINT,
    LINESTRING,
    LINEARRING,
    POLYGON,
    MULTIPOINT,
    MULTILINESTRING,
    MULTIPOLYGON,
    GEOMETRYCOLLECTION,
)
from geopolars_ray.geom.wkb import decode_wkb, encode_wkb  # noqa: F401
