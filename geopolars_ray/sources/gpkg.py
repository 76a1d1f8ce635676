"""Pure-Python GeoPackage reader/writer (stdlib ``sqlite3``; OGC 12-128r19).

The reference reads GeoPackage through OGR with ``where`` predicate and
``fids`` selection pushdown (``py-geopolars/python/geopolars/io/file.py:15-119``,
pushdown at ``:93-108``). No GDAL in this container, but a .gpkg file is a
plain SQLite database with published metadata tables, so the format is read
directly:

- layer discovery via ``gpkg_contents`` (data_type='features') +
  ``gpkg_geometry_columns``; CRS via ``gpkg_spatial_ref_sys``
  (organization:organization_coordsys_id, e.g. "EPSG:4326").
- the geometry BLOB is a GeoPackageBinary: 'GP' magic, version, flags,
  srs_id, optional envelope (flags bits 1-3 select 0/32/48/64 bytes), then
  standard WKB — which is this engine's physical geometry encoding already.

Scale path: the driver reads only metadata + the rowid range; row fetching
is sharded into rowid ranges executed inside ``map_batches`` tasks (each
task opens the SQLite file read-only — same pattern as the shapefile and
GeoJSONSeq readers). ``where`` (SQL string) and ``fids`` push down into the
per-shard SELECT; ``bbox`` filters on geometry envelopes after decode.
"""

from __future__ import annotations

import sqlite3
import struct

import numpy as np
import pyarrow as pa

import ray

_GPKG_APP_ID = 0x47504B47  # "GPKG"
_ENVELOPE_BYTES = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}

_DECL_TO_ARROW = (
    (("INT",), pa.int64()),  # INTEGER, MEDIUMINT, TINYINT, ...
    (("CHAR", "TEXT", "CLOB", "DATE", "TIME"), pa.string()),
    (("REAL", "FLOA", "DOUB"), pa.float64()),
    (("BLOB",), pa.binary()),
    (("BOOL",), pa.bool_()),
)


def _decl_to_arrow(decl: str):
    d = (decl or "").upper()
    for keys, typ in _DECL_TO_ARROW:
        if any(k in d for k in keys):
            return typ
    return pa.string() if d else pa.binary()


def strip_gpb_header(blob: bytes) -> bytes | None:
    """GeoPackageBinary -> the embedded standard WKB (None for NULL/empty)."""
    if blob is None:
        return None
    if len(blob) < 8 or blob[0:2] != b"GP":
        raise ValueError("not a GeoPackageBinary blob (missing 'GP' magic)")
    flags = blob[3]
    if flags & 0x20:  # extension geometry (bit 5)
        raise ValueError("extended GeoPackageBinary encodings are not supported")
    env = (flags >> 1) & 0x07
    if env not in _ENVELOPE_BYTES:
        raise ValueError(f"invalid GeoPackageBinary envelope indicator {env}")
    if flags & 0x10:  # empty-geometry flag (bit 4)
        return None
    return blob[8 + _ENVELOPE_BYTES[env] :]


def _layer_meta(path: str, layer: str | None):
    """Driver-side metadata probe: (layer, geom_col, crs, prop schema, rowid range)."""
    import os

    if not os.path.exists(path):
        raise FileNotFoundError(path)
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        cur = con.cursor()
        layers = [
            r[0]
            for r in cur.execute(
                "SELECT table_name FROM gpkg_contents WHERE data_type = 'features'"
            )
        ]
        if layer is None:
            if len(layers) != 1:
                raise ValueError(
                    f"gpkg has {len(layers)} feature layers {layers}; pass layer="
                )
            layer = layers[0]
        elif layer not in layers:
            raise ValueError(f"layer {layer!r} not in gpkg feature layers {layers}")
        gc_row = cur.execute(
            "SELECT column_name, srs_id FROM gpkg_geometry_columns WHERE table_name = ?",
            (layer,),
        ).fetchone()
        if gc_row is None:
            raise ValueError(
                f"layer {layer!r} is listed in gpkg_contents but has no "
                "gpkg_geometry_columns row — not a valid features layer"
            )
        geom_col, srs_id = gc_row
        crs = None
        row = cur.execute(
            "SELECT organization, organization_coordsys_id FROM gpkg_spatial_ref_sys "
            "WHERE srs_id = ?",
            (srs_id,),
        ).fetchone()
        if row and row[0] and int(row[1]) > 0:
            crs = f"{row[0].upper()}:{int(row[1])}"
        fields = []
        for _cid, name, decl, _nn, _dflt, _ispk in cur.execute(f'PRAGMA table_info("{layer}")'):
            # note: a spec-conforming gpkg's fid column is INTEGER PRIMARY
            # KEY, which SQLite aliases to rowid — fids below ARE rowids
            if name == geom_col:
                continue
            fields.append((name, _decl_to_arrow(decl)))
        lo_hi = cur.execute(f'SELECT min(rowid), max(rowid) FROM "{layer}"').fetchone()
        # rowid 0 is legal: only None (empty table) means no rows
        lo = 0 if lo_hi[0] is None else int(lo_hi[0])
        hi = -1 if lo_hi[1] is None else int(lo_hi[1])
        return layer, geom_col, crs, fields, (lo, hi)
    finally:
        con.close()


def read_gpkg(
    path: str,
    layer: str | None = None,
    columns: list[str] | None = None,
    where: str | None = None,
    fids: list[int] | None = None,
    bbox: tuple[float, float, float, float] | None = None,
    geometry_col: str = "geometry",
    rows_per_shard: int = 65536,
):
    """Read one GeoPackage feature layer to a Dataset (WKB ``geometry``).

    ``where`` is a SQL predicate over the layer's columns, pushed down into
    each shard's SELECT (evaluated by SQLite, the reference's OGR-where
    analogue); ``fids`` restricts to those fid/rowid values; ``bbox`` keeps
    features whose envelope intersects it (post-decode vectorized filter).
    """
    layer_name, geom_col, _crs, fields, (lo, hi) = _layer_meta(path, layer)
    prop_names = [n for n, _ in fields]
    if columns is not None:
        missing = [c for c in columns if c not in prop_names]
        if missing:
            raise ValueError(f"columns {missing} not in layer {layer_name!r} ({prop_names})")
        fields = [(n, t) for n, t in fields if n in columns]
    out_schema = pa.schema([(n, t) for n, t in fields] + [(geometry_col, pa.binary())])
    sel_cols = ", ".join(f'"{n}"' for n, _ in fields)
    sel = f'SELECT rowid{", " + sel_cols if sel_cols else ""}, "{geom_col}" FROM "{layer_name}"'

    fid_list = sorted(set(int(f) for f in fids)) if fids is not None else None
    if hi < lo:
        return ray.data.from_arrow(out_schema.empty_table())
    shards = [
        (s, min(s + rows_per_shard - 1, hi))
        for s in range(lo, hi + 1, rows_per_shard)
    ]
    if fid_list is not None:
        # prune shards whose rowid range holds no requested fid; the
        # surviving shards push `rowid IN (...)` into their SELECT
        import bisect

        shards = [
            (a, b)
            for a, b in shards
            if bisect.bisect_right(fid_list, b) > bisect.bisect_left(fid_list, a)
        ]
        if not shards:
            return ray.data.from_arrow(out_schema.empty_table())
    shard_tab = pa.table(
        {"_lo": pa.array([s[0] for s in shards]), "_hi": pa.array([s[1] for s in shards])}
    )

    def read_shard(batch: pa.Table) -> pa.Table:
        con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        try:
            tabs = []
            import bisect

            for lo_i, hi_i in zip(batch["_lo"].to_pylist(), batch["_hi"].to_pylist()):
                q = sel + f" WHERE rowid BETWEEN {int(lo_i)} AND {int(hi_i)}"
                if fid_list is not None:
                    a = bisect.bisect_left(fid_list, int(lo_i))
                    b = bisect.bisect_right(fid_list, int(hi_i))
                    q += " AND rowid IN (%s)" % ",".join(str(f) for f in fid_list[a:b])
                if where:
                    q += f" AND ({where})"
                rows = con.execute(q).fetchall()
                cols: dict[str, list] = {n: [] for n, _ in fields}
                wkbs = []
                for r in rows:
                    for i, (n, _t) in enumerate(fields):
                        cols[n].append(r[1 + i])
                    wkbs.append(strip_gpb_header(r[-1]))
                arrs = [pa.array(cols[n], t) for n, t in fields]
                arrs.append(pa.array(wkbs, pa.binary()))
                tabs.append(pa.Table.from_arrays(arrs, schema=out_schema))
            return pa.concat_tables(tabs) if tabs else out_schema.empty_table()
        finally:
            con.close()

    out = ray.data.from_arrow(shard_tab).map_batches(
        read_shard, batch_format="pyarrow", batch_size=4
    )
    if bbox is not None:
        from geopolars_ray.sources.io import bbox_envelope_filter

        out = out.map_batches(bbox_envelope_filter(bbox, geometry_col), batch_format="pyarrow")
    return out


def gpkg_fid_window(
    path: str,
    layer: str | None = None,
    where: str | None = None,
    skip_features: int = 0,
    max_features: int | None = None,
) -> list[int]:
    """The rowids of the ``skip_features``/``max_features`` window over the
    layer's rowid-ordered (optionally ``where``-filtered) feature stream —
    OGR's skip/max semantics, resolved with ONE driver-side SQLite query so
    the window rides :func:`read_gpkg`'s fid shard-pruning path."""
    layer_name = _layer_meta(path, layer)[0]
    q = f'SELECT rowid FROM "{layer_name}"'
    if where:
        q += f" WHERE ({where})"
    q += " ORDER BY rowid"
    if max_features is not None:
        q += f" LIMIT {int(max_features)}"
    elif skip_features:
        q += " LIMIT -1"
    if skip_features:
        q += f" OFFSET {int(skip_features)}"
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        return [int(r[0]) for r in con.execute(q).fetchall()]
    finally:
        con.close()


def read_gpkg_crs(path: str, layer: str | None = None) -> str | None:
    """The layer's CRS string ("EPSG:xxxx") from gpkg_spatial_ref_sys."""
    return _layer_meta(path, layer)[2]


def _gpb_header(srs_id: int) -> bytes:
    # version 0, flags: little-endian (bit 0) + envelope indicator 0
    return b"GP" + bytes([0x00, 0x01]) + struct.pack("<i", srs_id)


_ARROW_TO_DECL = (
    (pa.types.is_integer, "INTEGER"),
    (pa.types.is_floating, "REAL"),
    (pa.types.is_boolean, "BOOLEAN"),
    (pa.types.is_binary, "BLOB"),
)


def write_gpkg(
    table: pa.Table,
    path: str,
    layer: str = "layer",
    crs: str | None = "EPSG:4326",
    geometry_col: str = "geometry",
    geometry_type: str = "GEOMETRY",
) -> None:
    """Write one Arrow table (WKB geometry + attribute columns) as a valid
    GeoPackage (driver-side; for side tables / round-trip tests — the
    distributed write path for big outputs is the GeoParquet writer)."""
    import os

    from geopolars_ray.geom import decode_wkb, kernels as K  # noqa: F401

    srs_id = 0
    org, code = "NONE", 0
    if crs and ":" in crs:
        org, c = crs.split(":", 1)
        code = int(c)
        srs_id = code
    if os.path.exists(path):
        os.unlink(path)
    con = sqlite3.connect(path)
    try:
        cur = con.cursor()
        cur.execute(f"PRAGMA application_id = {_GPKG_APP_ID}")
        cur.execute("PRAGMA user_version = 10300")
        cur.execute(
            "CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, srs_id INTEGER "
            "PRIMARY KEY, organization TEXT NOT NULL, organization_coordsys_id INTEGER "
            "NOT NULL, definition TEXT NOT NULL, description TEXT)"
        )
        for sid, o, oc, defn in (
            (-1, "NONE", -1, "undefined"),
            (0, "NONE", 0, "undefined"),
            (4326, "EPSG", 4326, "GEOGCS[\"WGS 84\"]"),
        ):
            cur.execute(
                "INSERT INTO gpkg_spatial_ref_sys VALUES (?, ?, ?, ?, ?, NULL)",
                (o if sid != 4326 else "WGS 84", sid, o, oc, defn),
            )
        if srs_id not in (-1, 0, 4326):
            cur.execute(
                "INSERT INTO gpkg_spatial_ref_sys VALUES (?, ?, ?, ?, ?, NULL)",
                (crs, srs_id, org, code, crs),
            )
        cur.execute(
            "CREATE TABLE gpkg_contents (table_name TEXT NOT NULL PRIMARY KEY, data_type "
            "TEXT NOT NULL, identifier TEXT UNIQUE, description TEXT DEFAULT '', "
            "last_change DATETIME NOT NULL DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')), "
            "min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)"
        )
        cur.execute(
            "CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, column_name "
            "TEXT NOT NULL, geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL, "
            "z TINYINT NOT NULL, m TINYINT NOT NULL, PRIMARY KEY (table_name, column_name))"
        )
        decls = []
        attr_cols = [c for c in table.column_names if c != geometry_col]
        for name in attr_cols:
            t = table.schema.field(name).type
            decl = "TEXT"
            for pred, d in _ARROW_TO_DECL:
                if pred(t):
                    decl = d
                    break
            decls.append(f'"{name}" {decl}')
        cur.execute(
            f'CREATE TABLE "{layer}" (fid INTEGER PRIMARY KEY AUTOINCREMENT'
            + ("".join(", " + d for d in decls))
            + f', "{geometry_col}" BLOB)'
        )
        # envelope for gpkg_contents
        ga = decode_wkb(table[geometry_col])
        xmin, ymin, xmax, ymax = K.bounds(K.envelope(ga))
        cur.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier, min_x, min_y, "
            "max_x, max_y, srs_id) VALUES (?, 'features', ?, ?, ?, ?, ?, ?)",
            (
                layer,
                layer,
                float(np.nanmin(xmin)) if len(xmin) else None,
                float(np.nanmin(ymin)) if len(ymin) else None,
                float(np.nanmax(xmax)) if len(xmax) else None,
                float(np.nanmax(ymax)) if len(ymax) else None,
                srs_id,
            ),
        )
        cur.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?, ?, ?, ?, 0, 0)",
            (layer, geometry_col, geometry_type, srs_id),
        )
        hdr = _gpb_header(srs_id)
        attr_lists = [table[c].to_pylist() for c in attr_cols]
        wkbs = table[geometry_col].to_pylist()
        ph = ", ".join(["?"] * (len(attr_cols) + 1))
        names = "".join(f'"{c}", ' for c in attr_cols) + f'"{geometry_col}"'
        cur.executemany(
            f'INSERT INTO "{layer}" ({names}) VALUES ({ph})',
            (
                tuple(attr_lists[j][i] for j in range(len(attr_cols)))
                + (hdr + wkbs[i] if wkbs[i] is not None else None,)
                for i in range(table.num_rows)
            ),
        )
        con.commit()
    finally:
        con.close()
