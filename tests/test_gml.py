"""GML reader/writer: round-trip, GML2 vs GML3 syntax, axis-order handling,
feature selection, read_file dispatch."""

import numpy as np
import pyarrow as pa
import pytest

from geopolars_ray.geom import GeometryArray, decode_wkb, encode_wkb
from geopolars_ray.sources.gml import read_gml, write_gml

GEOMS = [
    ("point", (1.5, 2.5)),
    ("linestring", [(0.0, 0.0), (1.0, 1.0), (2.0, 0.5)]),
    ("polygon", [[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 0.0)],
                 [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 1.0)]]),
    ("multipoint", [(5.0, 5.0), (6.0, 7.0)]),
    ("multilinestring", [[(0.0, 0.0), (1.0, 0.0)], [(0.0, 1.0), (2.0, 1.5)]]),
    ("multipolygon", [[[(10.0, 10.0), (12.0, 10.0), (12.0, 12.0), (10.0, 10.0)]],
                      [[(20.0, 20.0), (22.0, 20.0), (22.0, 22.0), (20.0, 20.0)]]]),
]


def _table():
    return pa.table({
        "name": pa.array([f"f{i}" for i in range(len(GEOMS))], pa.string()),
        "code": pa.array([str(100 + i) for i in range(len(GEOMS))], pa.string()),
        "geometry": encode_wkb(GeometryArray.from_pylist(GEOMS)),
    })


def test_gml_roundtrip_all_types(ray_session, tmp_path):
    p = str(tmp_path / "t.gml")
    write_gml(_table(), p)
    got = read_gml(p).take_all()
    assert len(got) == len(GEOMS)
    by_name = {r["name"]: r for r in got}
    for i, g in enumerate(GEOMS):
        r = by_name[f"f{i}"]
        assert r["code"] == str(100 + i)
        have = decode_wkb(pa.array([r["geometry"]], pa.binary())).to_pylist()[0]
        want = GeometryArray.from_pylist([g]).to_pylist()[0]
        assert have == want, i


GML2_DOC = """<?xml version="1.0"?>
<FeatureCollection xmlns:gml="http://www.opengis.net/gml">
  <gml:featureMember>
    <city>
      <cityName>alpha</cityName>
      <location>
        <gml:Point srsName="EPSG:4326"><gml:coordinates>10.5,20.25</gml:coordinates></gml:Point>
      </location>
    </city>
  </gml:featureMember>
  <gml:featureMember>
    <city>
      <cityName>beta</cityName>
      <shape>
        <gml:Polygon>
          <gml:outerBoundaryIs><gml:LinearRing>
            <gml:coordinates>0,0 4,0 4,4 0,0</gml:coordinates>
          </gml:LinearRing></gml:outerBoundaryIs>
        </gml:Polygon>
      </shape>
    </city>
  </gml:featureMember>
</FeatureCollection>
"""

GML3_URN_DOC = """<?xml version="1.0"?>
<wfs:FeatureCollection xmlns:wfs="http://www.opengis.net/wfs/2.0"
                       xmlns:gml="http://www.opengis.net/gml/3.2">
  <wfs:member>
    <stop>
      <label>gamma</label>
      <geom>
        <gml:Point srsName="urn:ogc:def:crs:EPSG::4326">
          <gml:pos>20.25 10.5</gml:pos>
        </gml:Point>
      </geom>
    </stop>
  </wfs:member>
  <wfs:member>
    <stop>
      <label>delta</label>
      <geom>
        <gml:LineString srsName="urn:ogc:def:crs:EPSG::4326">
          <gml:posList srsDimension="2">1 2 3 4</gml:posList>
        </gml:LineString>
      </geom>
    </stop>
  </wfs:member>
</wfs:FeatureCollection>
"""


def test_gml2_coordinates_syntax(ray_session, tmp_path):
    p = tmp_path / "g2.gml"
    p.write_text(GML2_DOC)
    got = {r["cityName"]: r for r in read_gml(str(p)).take_all()}
    pt = decode_wkb(pa.array([got["alpha"]["geometry"]])).to_pylist()[0]
    assert pt == ("point", (10.5, 20.25))
    poly = decode_wkb(pa.array([got["beta"]["geometry"]])).to_pylist()[0]
    assert poly[0] == "polygon" and poly[1][0][1] == (4.0, 0.0)


def test_gml3_urn_axis_order_swaps_to_lonlat(ray_session, tmp_path):
    p = tmp_path / "g3.gml"
    p.write_text(GML3_URN_DOC)
    got = {r["label"]: r for r in read_gml(str(p)).take_all()}
    # urn EPSG:4326 posList is lat,lon -> swapped to lon,lat
    pt = decode_wkb(pa.array([got["gamma"]["geometry"]])).to_pylist()[0]
    assert pt == ("point", (10.5, 20.25))
    ls = decode_wkb(pa.array([got["delta"]["geometry"]])).to_pylist()[0]
    assert ls == ("linestring", [(2.0, 1.0), (4.0, 3.0)])
    # explicit override wins
    got2 = {r["label"]: r for r in read_gml(str(p), swap_axes=False).take_all()}
    pt2 = decode_wkb(pa.array([got2["gamma"]["geometry"]])).to_pylist()[0]
    assert pt2 == ("point", (20.25, 10.5))


def test_gml_selection_bbox_and_dispatch(ray_session, tmp_path):
    from geopolars_ray.sources.io import read_file

    p = str(tmp_path / "d.gml")
    write_gml(_table(), p)
    # fids
    got = read_file(p, fids=[0, 3]).take_all()
    assert sorted(r["name"] for r in got) == ["f0", "f3"]
    # skip/max window
    got = read_file(p, skip_features=1, max_features=2).take_all()
    assert sorted(r["name"] for r in got) == ["f1", "f2"]
    # bbox post-filter
    got = read_file(p, bbox=(4.5, 4.5, 8.0, 8.0)).take_all()
    assert [r["name"] for r in got] == ["f3"]
    # columns projection
    got = read_file(p, columns=["name"]).take_all()
    assert set(got[0].keys()) == {"name", "geometry"}


GML3_REPEATED_POS = """<?xml version="1.0"?>
<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml/3.2">
  <gml:featureMember>
    <area>
      <label>ring</label>
      <geom><gml:Polygon><gml:exterior><gml:LinearRing>
        <gml:pos>0 0</gml:pos><gml:pos>4 0</gml:pos>
        <gml:pos>4 4</gml:pos><gml:pos>0 0</gml:pos>
      </gml:LinearRing></gml:exterior></gml:Polygon></geom>
    </area>
  </gml:featureMember>
</gml:FeatureCollection>
"""


def test_gml_repeated_pos_accumulates(ray_session, tmp_path):
    # review r4 finding: repeated <gml:pos> children must accumulate, not
    # collapse to the first vertex
    p = tmp_path / "rp.gml"
    p.write_text(GML3_REPEATED_POS)
    got = read_gml(str(p)).take_all()
    poly = decode_wkb(pa.array([got[0]["geometry"]])).to_pylist()[0]
    assert poly == ("polygon", [[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 0.0)]])


def test_gml2_custom_cs_ts_separators(ray_session, tmp_path):
    doc = """<?xml version="1.0"?>
<FeatureCollection xmlns:gml="http://www.opengis.net/gml">
  <gml:featureMember><f><n>s</n><g>
    <gml:LineString><gml:coordinates cs=" " ts=",">1 2,3 4</gml:coordinates></gml:LineString>
  </g></f></gml:featureMember>
</FeatureCollection>
"""
    p = tmp_path / "cs.gml"
    p.write_text(doc)
    got = read_gml(str(p)).take_all()
    ls = decode_wkb(pa.array([got[0]["geometry"]])).to_pylist()[0]
    assert ls == ("linestring", [(1.0, 2.0), (3.0, 4.0)])


def test_gml_first_geometry_property_wins(ray_session, tmp_path):
    doc = """<?xml version="1.0"?>
<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml/3.2">
  <gml:featureMember><f>
    <location><gml:Point><gml:pos>1 2</gml:pos></gml:Point></location>
    <extent><gml:Polygon><gml:exterior><gml:LinearRing>
      <gml:posList>0 0 9 0 9 9 0 0</gml:posList>
    </gml:LinearRing></gml:exterior></gml:Polygon></extent>
  </f></gml:featureMember>
</gml:FeatureCollection>
"""
    p = tmp_path / "two.gml"
    p.write_text(doc)
    got = read_gml(str(p)).take_all()
    g = decode_wkb(pa.array([got[0]["geometry"]])).to_pylist()[0]
    assert g == ("point", (1.0, 2.0))


def test_gml_srsdimension_inheritance(ray_session, tmp_path):
    # review r4-2: srsDimension on ENCLOSING geometry elements (GeoServer's
    # form) must reach posList/pos; z values drop instead of corrupting
    doc = """<?xml version="1.0"?>
<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml/3.2">
  <gml:featureMember><f><n>p3</n><g>
    <gml:Point srsDimension="3"><gml:pos>1 2 50</gml:pos></gml:Point>
  </g></f></gml:featureMember>
  <gml:featureMember><f><n>poly3</n><g>
    <gml:Polygon srsDimension="3"><gml:exterior><gml:LinearRing>
      <gml:posList>0 0 1 4 0 1 4 4 1 0 0 1</gml:posList>
    </gml:LinearRing></gml:exterior></gml:Polygon>
  </g></f></gml:featureMember>
</gml:FeatureCollection>
"""
    p = tmp_path / "d3.gml"
    p.write_text(doc)
    got = {r["n"]: r for r in read_gml(str(p)).take_all()}
    pt = decode_wkb(pa.array([got["p3"]["geometry"]])).to_pylist()[0]
    assert pt == ("point", (1.0, 2.0))
    poly = decode_wkb(pa.array([got["poly3"]["geometry"]])).to_pylist()[0]
    assert poly == ("polygon", [[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 0.0)]])


def test_gml_srs_code_exact_token_match(ray_session, tmp_path):
    # urn code 104326 ends in "4326" but is NOT EPSG:4326 — must not swap
    doc = """<?xml version="1.0"?>
<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml/3.2">
  <gml:featureMember><f><n>a</n><g>
    <gml:Point srsName="urn:ogc:def:crs:EPSG::104326"><gml:pos>1 2</gml:pos></gml:Point>
  </g></f></gml:featureMember>
</gml:FeatureCollection>
"""
    p = tmp_path / "srs.gml"
    p.write_text(doc)
    got = read_gml(str(p)).take_all()
    pt = decode_wkb(pa.array([got[0]["geometry"]])).to_pylist()[0]
    assert pt == ("point", (1.0, 2.0))  # NOT swapped
