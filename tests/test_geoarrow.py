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


def test_geoarrow_native_flows_between_stages(ray_session):
    """GeoArrow-native geometry columns flow through chained geo stages
    without WKB round-trips; results match the WKB path exactly."""
    import numpy as np
    import pyarrow as pa
    import ray

    from geopolars_ray.geom import GeometryArray, encode_wkb
    from geopolars_ray.stages.geo import geo_op, geo_ops, to_geoarrow, to_wkb

    ga = GeometryArray.from_points(np.arange(100, dtype=np.float64), np.arange(100, dtype=np.float64) * 0.5)
    tab = pa.table({"i": pa.array(np.arange(100)), "geometry": encode_wkb(ga)})

    # WKB reference path
    ref = (
        ray.data.from_arrow(tab)
        .map_batches(geo_ops([("translate", dict(x=1.0, y=2.0)), ("x", {}, "px"), ("y", {}, "py")]),
                     batch_format="pyarrow")
        .to_pandas()
    )
    # GeoArrow-native path: convert once, chain two separate stages, convert back
    native = (
        ray.data.from_arrow(tab)
        .map_batches(to_geoarrow(), batch_format="pyarrow")
        .map_batches(geo_op("translate", x=1.0, y=2.0), batch_format="pyarrow")
        .map_batches(geo_ops([("x", {}, "px"), ("y", {}, "py")]), batch_format="pyarrow")
        .map_batches(to_wkb(), batch_format="pyarrow")
        .to_pandas()
    )
    for col in ("px", "py"):
        assert (ref.sort_values("i")[col].to_numpy() == native.sort_values("i")[col].to_numpy()).all()
    # geometry bytes equal after the final to_wkb
    assert [bytes(b) for b in ref.sort_values("i")["geometry"]] == [
        bytes(b) for b in native.sort_values("i")["geometry"]
    ]


def test_geoarrow_mixed_result_falls_back_to_wkb(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from geopolars_ray.geom import GeometryArray, encode_wkb
    from geopolars_ray.stages.geo import geo_op, to_geoarrow

    # per-row multipoints whose convex hulls collapse to mixed types
    ga = GeometryArray.from_pylist([
        ("multipoint", [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0)]),   # polygon hull
        ("multipoint", [(0.0, 0.0), (2.0, 2.0)]),               # linestring hull
    ])
    tab = pa.table({"geometry": encode_wkb(ga)})
    out = (
        ray.data.from_arrow(tab)
        .map_batches(to_geoarrow(), batch_format="pyarrow")
        .map_batches(geo_op("convex_hull"), batch_format="pyarrow")
    )
    blocks = [b for b in ray.get(out.to_arrow_refs()) if b.num_rows]
    sch = blocks[0].schema
    assert pa.types.is_large_binary(sch.field("geometry").type) or pa.types.is_binary(sch.field("geometry").type)
