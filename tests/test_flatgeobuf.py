"""FlatGeobuf reader/writer: round-trip, packed-R-tree bbox pushdown,
Hilbert curve sanity, format validation.

No GDAL/flatbuffers exists in this container, so evidence is spec-derived:
round-trips through our own writer+reader, R-tree search equivalence with
brute force over random boxes, and structural assertions (magic, version,
index byte size) against the published layout.
"""

import struct

import numpy as np
import pyarrow as pa
import pytest

from geopolars_ray.geom import GeometryArray, decode_wkb, encode_wkb
from geopolars_ray.sources.flatgeobuf import (
    MAGIC,
    NODE_BYTES,
    _build_index,
    _level_offsets,
    _search_index,
    hilbert_d,
    read_flatgeobuf,
    write_flatgeobuf,
)

GEOMS = [
    ("point", (1.0, 2.0)),
    ("linestring", [(0.0, 0.0), (1.0, 1.0), (2.0, 0.5)]),
    ("polygon", [[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)],
                 [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0)]]),
    ("multipoint", [(5.0, 5.0), (6.0, 7.0)]),
    ("multilinestring", [[(0.0, 0.0), (1.0, 0.0)], [(0.0, 1.0), (1.0, 1.0), (2.0, 1.5)]]),
    ("multipolygon", [[[(10.0, 10.0), (12.0, 10.0), (12.0, 12.0), (10.0, 10.0)]],
                      [[(20.0, 20.0), (22.0, 20.0), (22.0, 22.0), (20.0, 20.0)],
                       [(20.5, 20.4), (21.5, 20.4), (21.5, 21.0), (20.5, 20.4)]]]),
]


def _mixed_table():
    ga = GeometryArray.from_pylist(GEOMS)
    return pa.table({
        "fid": pa.array(list(range(len(GEOMS))), pa.int64()),
        "name": pa.array([f"g{i}" for i in range(len(GEOMS))], pa.string()),
        "score": pa.array([0.5 * i for i in range(len(GEOMS))], pa.float64()),
        "flag": pa.array([i % 2 == 0 for i in range(len(GEOMS))], pa.bool_()),
        "blob": pa.array([bytes([i, i + 1]) for i in range(len(GEOMS))], pa.binary()),
        "geometry": encode_wkb(ga),
    })


def test_roundtrip_all_types_and_props(ray_session, tmp_path):
    t = _mixed_table()
    p = str(tmp_path / "mixed.fgb")
    write_flatgeobuf(t, p)
    raw = open(p, "rb").read()
    assert raw[:8] == MAGIC
    got = read_flatgeobuf(p).take_all()
    assert len(got) == len(GEOMS)
    by_fid = {r["fid"]: r for r in got}
    src = t.to_pylist()
    for s in src:
        r = by_fid[s["fid"]]
        for k in ("name", "score", "flag", "blob"):
            assert r[k] == s[k], (s["fid"], k)
        want = GeometryArray.from_pylist([GEOMS[s["fid"]]]).to_pylist()[0]
        have = decode_wkb(pa.array([r["geometry"]], pa.binary())).to_pylist()[0]
        assert have == want, s["fid"]


def test_roundtrip_uniform_points_with_and_without_index(ray_session, tmp_path):
    rng = np.random.default_rng(4)
    n = 500
    pts = [("point", (float(x), float(y)))
           for x, y in zip(rng.uniform(-180, 180, n), rng.uniform(-90, 90, n))]
    t = pa.table({"fid": pa.array(range(n), pa.int64()),
                  "geometry": encode_wkb(GeometryArray.from_pylist(pts))})
    for node_size, fname in [(16, "idx.fgb"), (0, "noidx.fgb")]:
        p = str(tmp_path / fname)
        write_flatgeobuf(t, p, index_node_size=node_size)
        got = read_flatgeobuf(p, features_per_shard=64).take_all()
        assert len(got) == n
        xs = {r["fid"]: decode_wkb(pa.array([r["geometry"]]))
              .to_pylist()[0][1] for r in got}
        for i, g in enumerate(pts):
            assert xs[i] == g[1]


def test_bbox_pushdown_equals_full_scan_filter(ray_session, tmp_path):
    rng = np.random.default_rng(9)
    n = 2000
    x = rng.uniform(0, 100, n)
    y = rng.uniform(0, 100, n)
    pts = [("point", (float(a), float(b))) for a, b in zip(x, y)]
    t = pa.table({"fid": pa.array(range(n), pa.int64()),
                  "geometry": encode_wkb(GeometryArray.from_pylist(pts))})
    p = str(tmp_path / "pts.fgb")
    write_flatgeobuf(t, p)
    bbox = (20.0, 30.0, 40.0, 55.0)
    got = sorted(r["fid"] for r in read_flatgeobuf(p, bbox=bbox).take_all())
    want = sorted(int(i) for i in np.flatnonzero(
        (x >= bbox[0]) & (x <= bbox[2]) & (y >= bbox[1]) & (y <= bbox[3])))
    assert got == want and len(got) > 0


def test_index_search_reads_subrange_only(tmp_path):
    """The R-tree answers a small bbox with far fewer leaf offsets than n —
    the byte-range pushdown the format exists for."""
    rng = np.random.default_rng(2)
    n = 4096
    centers = rng.uniform(0, 1000, (n, 2))
    boxes = np.column_stack([centers - 0.5, centers + 0.5])
    offsets = np.arange(n, dtype=np.int64) * 100
    idx = _build_index(boxes, offsets, node_size=16)
    starts = _level_offsets(n, 16)
    assert len(idx) == (starts[-1] + n) * NODE_BYTES
    hits = _search_index(idx, n, 16, (100.0, 100.0, 120.0, 120.0))
    want = np.flatnonzero((boxes[:, 2] >= 100) & (boxes[:, 0] <= 120)
                          & (boxes[:, 3] >= 100) & (boxes[:, 1] <= 120))
    assert sorted(hits.tolist()) == sorted((offsets[want]).tolist())
    assert 0 < len(hits) < n / 10  # actually pruned


def test_index_search_random_queries_match_bruteforce():
    rng = np.random.default_rng(7)
    n = 777  # non-power-of-two: exercises ragged last nodes at every level
    centers = rng.uniform(0, 100, (n, 2))
    half = rng.uniform(0.1, 3.0, (n, 1))
    boxes = np.column_stack([centers - half, centers + half])
    offsets = rng.permutation(n).astype(np.int64) * 64
    idx = _build_index(boxes, offsets, node_size=5)
    for _ in range(25):
        q = np.sort(rng.uniform(0, 100, 2))
        r = np.sort(rng.uniform(0, 100, 2))
        bbox = (q[0], r[0], q[1], r[1])
        hits = _search_index(idx, n, 5, bbox)
        want = np.flatnonzero((boxes[:, 2] >= bbox[0]) & (boxes[:, 0] <= bbox[2])
                              & (boxes[:, 3] >= bbox[1]) & (boxes[:, 1] <= bbox[3]))
        assert sorted(hits.tolist()) == sorted(offsets[want].tolist())


def test_hilbert_curve_is_bijective_and_local():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 1 << 16, 50_000).astype(np.uint32)
    y = rng.integers(0, 1 << 16, 50_000).astype(np.uint32)
    d = hilbert_d(x, y)
    # injective on the sample (the true curve is a bijection on the 2^32 grid)
    assert len(np.unique(d)) == len(np.unique(np.stack([x, y], 1), axis=0))
    # locality: consecutive hilbert cells are grid neighbors
    order = np.argsort(d, kind="stable")
    xs, ys = x[order].astype(np.int64), y[order].astype(np.int64)
    step = np.abs(np.diff(xs)) + np.abs(np.diff(ys))
    # random points aren't adjacent, but hilbert-sorted manhattan steps must
    # be FAR smaller than shuffled order on average
    assert step.mean() < 0.05 * (np.abs(np.diff(x.astype(np.int64)))
                                 + np.abs(np.diff(y.astype(np.int64)))).mean()


def test_read_file_dispatch_and_validation(ray_session, tmp_path):
    from geopolars_ray.sources.io import read_file

    t = _mixed_table()
    p = str(tmp_path / "d.fgb")
    write_flatgeobuf(t, p)
    got = read_file(p, columns=["fid", "name"]).take_all()
    assert len(got) == len(GEOMS)
    assert set(got[0].keys()) == {"fid", "name", "geometry"}
    # bad magic rejected loudly
    bad = str(tmp_path / "bad.fgb")
    open(bad, "wb").write(b"nope" + b"\x00" * 32)
    with pytest.raises(ValueError, match="magic"):
        read_flatgeobuf(bad)


def test_empty_and_null_geometry(ray_session, tmp_path):
    empty = pa.table({"fid": pa.array([], pa.int64()),
                      "geometry": pa.array([], pa.binary())})
    p = str(tmp_path / "empty.fgb")
    write_flatgeobuf(empty, p)
    assert read_flatgeobuf(p).count() == 0
    with pytest.raises(ValueError, match="non-null"):
        write_flatgeobuf(
            pa.table({"geometry": pa.array([None], pa.binary())}),
            str(tmp_path / "x.fgb"),
        )


def test_written_vectors_are_element_aligned(tmp_path):
    # review r4 finding: flatbuffers requires vector element data aligned to
    # the element size; scan every float64 xy vector in the written file
    import struct as _s

    t = _mixed_table()
    p = str(tmp_path / "align.fgb")
    write_flatgeobuf(t, p)
    raw = open(p, "rb").read()
    # walk features, check each Geometry xy vector's data offset % 8 == 0
    from geopolars_ray.sources.flatgeobuf import (
        _fb_field,
        _fb_indirect,
        _fb_root,
        _parse_header,
    )

    hdr = _parse_header(raw)
    pos = hdr["features_pos"]
    checked = 0
    while pos < len(raw):
        ln = _s.unpack_from("<I", raw, pos)[0]
        fstart = pos + 4  # flatbuffers alignment is buffer-relative
        fpos = _fb_root(raw, fstart)
        gref = _fb_field(raw, fpos, 0)
        gpos = _fb_indirect(raw, gref)
        xyref = _fb_field(raw, gpos, 1)
        if xyref is not None:
            vp = _fb_indirect(raw, xyref)
            assert (vp - fstart + 4) % 8 == 0, f"xy data misaligned at feature {checked}"
            checked += 1
        pos += 4 + ln
    assert checked > 0


def test_node_size_validation(tmp_path):
    t = _mixed_table()
    with pytest.raises(ValueError, match="node_size"):
        write_flatgeobuf(t, str(tmp_path / "x.fgb"), index_node_size=1)
    with pytest.raises(ValueError, match="node_size"):
        _level_offsets(5, 1)


def test_unsupported_property_type_is_loud():
    from geopolars_ray.sources.flatgeobuf import _decode_properties

    with pytest.raises(ValueError, match="unsupported FlatGeobuf property"):
        _decode_properties([("a", 3)], b"\x00\x00\x01\x00")  # Short(3)


def test_sparse_bbox_splits_shards_on_gaps(ray_session, tmp_path):
    # review r4 finding: hits at Hilbert-order extremes must not drag the
    # whole gap into one byte-range read — shards split on >4MB gaps
    rng = np.random.default_rng(3)
    n = 3000
    x = rng.uniform(0, 100, n)
    y = rng.uniform(0, 100, n)
    pts = [("point", (float(a), float(b))) for a, b in zip(x, y)]
    # pad each feature with a fat string property so offsets spread out
    t = pa.table({
        "fid": pa.array(range(n), pa.int64()),
        "pad": pa.array(["z" * 4000] * n, pa.string()),
        "geometry": encode_wkb(GeometryArray.from_pylist(pts)),
    })
    p = str(tmp_path / "sparse.fgb")
    write_flatgeobuf(t, p)
    # two tiny far-apart rectangles -> hits at both curve extremes
    for bbox in [(0.0, 0.0, 3.0, 3.0), (97.0, 97.0, 100.0, 100.0),
                 (0.0, 97.0, 3.0, 100.0)]:
        got = sorted(r["fid"] for r in read_flatgeobuf(p, bbox=bbox).take_all())
        want = sorted(int(i) for i in np.flatnonzero(
            (x >= bbox[0]) & (x <= bbox[2]) & (y >= bbox[1]) & (y <= bbox[3])))
        assert got == want


def test_truncated_file_fails_loudly(ray_session, tmp_path):
    t = _mixed_table()
    p = str(tmp_path / "t.fgb")
    write_flatgeobuf(t, p)
    raw = open(p, "rb").read()
    hlen = struct.unpack("<I", raw[8:12])[0]
    # cut inside the header, and inside the index
    for cut in (20, 12 + hlen + 10):
        bad = str(tmp_path / f"cut{cut}.fgb")
        open(bad, "wb").write(raw[:cut])
        with pytest.raises(ValueError, match="truncated|magic"):
            read_flatgeobuf(bad)
