"""GeoArrow nested-array codec round trips (reference layout parity)."""

import numpy as np
import pyarrow as pa
import pytest

from geopolars_ray.geom import GeometryArray
from geopolars_ray.geom.array import LINESTRING, MULTIPOINT, POLYGON, MULTILINESTRING
from geopolars_ray.geom.geoarrow import (
    encode_geoarrow,
    decode_geoarrow,
    geoarrow_field,
    decode_geoarrow_field,
)


CASES = {
    "point": [("point", (1.0, 2.0)), ("point", (-3.5, 4.25))],
    "linestring": [
        ("linestring", [(0.0, 0.0), (1.0, 1.0), (2.0, 0.5)]),
        ("linestring", [(5.0, 5.0), (6.0, 6.0)]),
    ],
    "multipoint": [
        ("multipoint", [(0.0, 0.0), (1.0, 1.0)]),
        ("multipoint", [(2.0, 2.0)]),
    ],
    "polygon": [
        (
            "polygon",
            [
                [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)],
                [(1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (2.0, 1.0), (1.0, 1.0)],
            ],
        ),
        ("polygon", [[(9.0, 9.0), (10.0, 9.0), (10.0, 10.0), (9.0, 9.0)]]),
    ],
    "multilinestring": [
        ("multilinestring", [[(0.0, 0.0), (1.0, 0.0)], [(5.0, 5.0), (5.0, 7.0)]]),
        ("multilinestring", [[(8.0, 8.0), (9.0, 9.0)]]),
    ],
    "multipolygon": [
        (
            "multipolygon",
            [
                [[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 0.0)]],
                [[(5.0, 5.0), (7.0, 5.0), (7.0, 7.0), (5.0, 5.0)]],
            ],
        ),
    ],
}

_HINTS = {"linestring": LINESTRING, "multipoint": MULTIPOINT,
          "polygon": POLYGON, "multilinestring": MULTILINESTRING}


@pytest.mark.parametrize("kind", list(CASES))
def test_round_trip(kind):
    ga = GeometryArray.from_pylist(CASES[kind])
    arr = encode_geoarrow(ga)
    back = decode_geoarrow(arr, geom_type=_HINTS.get(kind))
    assert back.to_pylist() == CASES[kind]


def test_layouts_match_reference():
    """Arrow types exactly as geoseries.py:86-107 builds them."""
    pt = encode_geoarrow(GeometryArray.from_pylist(CASES["point"]))
    assert pt.type == pa.struct([("x", pa.float64()), ("y", pa.float64())])
    ls = encode_geoarrow(GeometryArray.from_pylist(CASES["linestring"]))
    assert pa.types.is_list(ls.type) and pa.types.is_struct(ls.type.value_type)
    poly = encode_geoarrow(GeometryArray.from_pylist(CASES["polygon"]))
    assert pa.types.is_list(poly.type) and pa.types.is_list(poly.type.value_type)
    mp = encode_geoarrow(GeometryArray.from_pylist(CASES["multipolygon"]))
    assert pa.types.is_list(mp.type.value_type.value_type)


def test_field_metadata_disambiguates():
    for kind in ("linestring", "multipoint", "polygon", "multilinestring"):
        ga = GeometryArray.from_pylist(CASES[kind])
        field, arr = geoarrow_field("geometry", ga, crs="EPSG:4326")
        back = decode_geoarrow_field(field, arr)
        assert back.to_pylist() == CASES[kind]
        assert field.metadata[b"geopolars_ray.crs"] == b"EPSG:4326"


def test_mixed_type_rejected():
    ga = GeometryArray.from_pylist([("point", (0.0, 0.0)), ("linestring", [(0.0, 0.0), (1.0, 1.0)])])
    with pytest.raises(ValueError):
        encode_geoarrow(ga)
