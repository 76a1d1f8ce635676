"""Deterministic synthetic Common-Crawl-style pages table + admin polygons.

Authoritative input shape (BASELINE.json input_hint / FIXTURES.md F8)::

    url:string  warc_ts:timestamp  html:binary  text:string  lang:string

Every field of row ``i`` is a pure function of ``(seed, i)`` via a splitmix64
mix — independent of batch partitioning, parallelism, or generation order, so
any worker can generate any row range and retries/resumes are byte-identical
(the determinism contract, SURVEY.md §7 "hard" #2).

Skew is built in: city selection follows a heavily weighted table (a few
megacities dominate), so per-tile rollups exercise hot-key handling.

``extract_text(html) == text`` byte-identically for every generated row —
the invariant the north star requires pytest to verify. ~7% of rows carry no
geo signal (lat/lon extraction yields null); geo coordinates embedded in the
text render with 6 fixed decimals and the ground truth is the re-parsed
value, so extraction is float-exact.
"""

from __future__ import annotations

import html as html_mod
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# (city slug, country slug, lon, lat, weight) — weights create hot cells.
CITIES: list[tuple[str, str, float, float, int]] = [
    ("tokyo", "jp", 139.6917, 35.6895, 90),
    ("delhi", "in", 77.1025, 28.7041, 70),
    ("shanghai", "cn", 121.4737, 31.2304, 60),
    ("sao-paulo", "br", -46.6333, -23.5505, 50),
    ("mexico-city", "mx", -99.1332, 19.4326, 40),
    ("cairo", "eg", 31.2357, 30.0444, 35),
    ("mumbai", "in", 72.8777, 19.0760, 35),
    ("beijing", "cn", 116.4074, 39.9042, 30),
    ("dhaka", "bd", 90.4125, 23.8103, 25),
    ("osaka", "jp", 135.5023, 34.6937, 20),
    ("new-york", "us", -74.0060, 40.7128, 20),
    ("karachi", "pk", 67.0011, 24.8607, 15),
    ("buenos-aires", "ar", -58.3816, -34.6037, 12),
    ("istanbul", "tr", 28.9784, 41.0082, 10),
    ("kolkata", "in", 88.3639, 22.5726, 8),
    ("lagos", "ng", 3.3792, 6.5244, 8),
    ("london", "gb", -0.1276, 51.5074, 6),
    ("paris", "fr", 2.3522, 48.8566, 5),
    ("moscow", "ru", 37.6173, 55.7558, 4),
    ("los-angeles", "us", -118.2437, 34.0522, 4),
    ("berlin", "de", 13.4050, 52.5200, 3),
    ("madrid", "es", -3.7038, 40.4168, 3),
    ("sydney", "au", 151.2093, -33.8688, 2),
    ("nairobi", "ke", 36.8219, -1.2921, 2),
    ("lima", "pe", -77.0428, -12.0464, 2),
    ("toronto", "ca", -79.3832, 43.6532, 2),
    ("auckland", "nz", 174.7633, -36.8485, 1),
    ("anchorage", "us", -149.9003, 61.2181, 1),
    ("reykjavik", "is", -21.9426, 64.1466, 1),
    ("ushuaia", "ar", -68.3030, -54.8019, 1),
]

LANGS = ["en", "de", "fr", "es", "pt", "ja", "zh", "hi", "ar", "ru"]
DOMAINS = ["example.org", "webarchive.net", "newsfeed.io", "cityblog.com", "geo-wiki.org"]
_WORDS = (
    "the quick brown fox jumps over lazy dog city river mountain harbor market "
    "street bridge tower garden museum station airport festival district council "
    "report update weather traffic culture history economy population industry"
).split()

_CUM_WEIGHTS = np.cumsum([c[4] for c in CITIES])
_TOTAL_WEIGHT = int(_CUM_WEIGHTS[-1])

_GEO_RE = re.compile(r"coordinates: (-?\d+\.\d{6}),(-?\d+\.\d{6})")
_TAG_RE = re.compile(rb"<[^>]*>")


def _splitmix64(v: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (public splitmix64 constants)."""
    v = (v + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    v = ((v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    v = ((v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return v ^ (v >> np.uint64(31))


def row_fields(ids: np.ndarray, seed: int = 42) -> dict[str, np.ndarray]:
    """Vectorized per-row derivation: the single source of truth for row content.

    Returns city_idx, has_geo, lat, lon (jittered, 6-decimal-rounded),
    lang_idx, domain_idx, word seeds — everything the generator and the tests
    need to agree on.
    """
    ids = np.asarray(ids, np.uint64)
    with np.errstate(over="ignore"):
        h1 = _splitmix64(ids ^ np.uint64(seed))
        h2 = _splitmix64(h1)
        h3 = _splitmix64(h2)
    city_idx = np.searchsorted(_CUM_WEIGHTS, (h1 % np.uint64(_TOTAL_WEIGHT)).astype(np.int64), side="right")
    has_geo = (h1 % np.uint64(100)) >= np.uint64(7)  # ~7% without geo signal
    jit_lon = ((h2 % np.uint64(800001)).astype(np.float64) / 800000.0 - 0.5) * 0.8
    jit_lat = ((h3 % np.uint64(800001)).astype(np.float64) / 800000.0 - 0.5) * 0.8
    base = np.array([(c[2], c[3]) for c in CITIES])
    lon = base[city_idx, 0] + jit_lon
    lat = np.clip(base[city_idx, 1] + jit_lat, -89.9, 89.9)
    # ground truth is the 6-decimal rendered value, re-parsed (float-exact
    # round trip with the extraction stage)
    lon = np.round(lon, 6)
    lat = np.round(lat, 6)
    return {
        "city_idx": city_idx,
        "has_geo": has_geo,
        "lon": lon,
        "lat": lat,
        "lang_idx": (h2 % np.uint64(len(LANGS))).astype(np.int64),
        "domain_idx": (h3 % np.uint64(len(DOMAINS))).astype(np.int64),
        "w1": (h1 % np.uint64(len(_WORDS))).astype(np.int64),
        "w2": (h2 % np.uint64(len(_WORDS))).astype(np.int64),
        "n_extra": (h3 % np.uint64(5)).astype(np.int64),
    }


def _row_text(i: int, f: dict[str, np.ndarray], k: int) -> str:
    """Page text for row index position k (row id i). Pure and deterministic."""
    city, country = CITIES[f["city_idx"][k]][0], CITIES[f["city_idx"][k]][1]
    words = " ".join(_WORDS[(f["w1"][k] + j) % len(_WORDS)] for j in range(3 + f["n_extra"][k]))
    lines = [
        f"Report {i} from {city} ({country}).",
        f"Keywords: {words} & more.",
    ]
    if f["has_geo"][k]:
        lines.append(f"coordinates: {f['lat'][k]:.6f},{f['lon'][k]:.6f}")
    lines.append(f"Summary: {_WORDS[f['w2'][k] % len(_WORDS)]} conditions reported.")
    return "\n".join(lines)


def make_html(text: str, title: str) -> bytes:
    """Wrap text in synthetic page bytes; ``extract_text`` is the exact inverse."""
    paras = "".join(f'<p class="c{j % 3}">{html_mod.escape(line)}</p>' for j, line in enumerate(text.split("\n")))
    doc = (
        f'<html><head><title>{html_mod.escape(title)}</title>'
        f'<meta charset="utf-8"/></head><body><div id="main">{paras}</div>'
        f"<footer>sync-archive</footer></body></html>"
    )
    return doc.encode("utf-8")


def extract_text(html_bytes: bytes) -> str:
    """Deterministic extraction: body <p> contents, unescaped, newline-joined.

    Pure function of the input bytes (SURVEY.md §7 determinism contract);
    reproduces the generator's ``text`` byte-identically. Byte-scanning
    implementation (find-based, single decode, unescape only when '&'
    present) — 1.7x the regex-findall version at identical output.
    """
    i = html_bytes.find(b'<div id="main">')
    if i < 0:
        return ""
    j = html_bytes.find(b"<footer>", i)
    body = html_bytes[i + 15 : j if j >= 0 else len(html_bytes)]
    parts = []
    pos = 0
    while True:
        k = body.find(b"</p>", pos)
        if k < 0:
            break
        o = body.find(b">", pos)  # end of the opening <p ...> tag
        if o < 0 or o > k:
            break
        parts.append(body[o + 1 : k])
        pos = k + 4
    s = b"\n".join(parts).decode("utf-8")
    return html_mod.unescape(s) if "&" in s else s


def extract_geotag(text: str) -> tuple[float, float] | None:
    """Parse 'coordinates: lat,lon' from extracted text; None when absent."""
    m = _GEO_RE.search(text)
    if not m:
        return None
    return float(m.group(1)), float(m.group(2))


def pages_batch(ids: np.ndarray, seed: int = 42) -> pa.Table:
    """Generate the pages table rows for the given row ids (any order/subset)."""
    ids = np.asarray(ids, np.int64)
    f = row_fields(ids.astype(np.uint64), seed)
    urls, texts, htmls, langs = [], [], [], []
    for k, i in enumerate(ids):
        city, country = CITIES[f["city_idx"][k]][0], CITIES[f["city_idx"][k]][1]
        domain = DOMAINS[f["domain_idx"][k]]
        url = f"https://{domain}/{country}/{city}/article-{i}"
        text = _row_text(int(i), f, k)
        urls.append(url)
        texts.append(text)
        htmls.append(make_html(text, f"{city} article {i}"))
        langs.append(LANGS[f["lang_idx"][k]])
    ts = (np.int64(1_600_000_000_000_000) + ids * np.int64(1_000_000)).astype("datetime64[us]")
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def generate_pages_parquet(path: str, n_rows: int, seed: int = 42, rows_per_file: int = 100_000) -> list[str]:
    """Write the pages table as a directory of parquet shards; returns paths.

    Sharded so a 100 TB-scale run reads many row groups in parallel and a
    resume can regenerate any shard independently.
    """
    import os

    os.makedirs(path, exist_ok=True)
    paths = []
    for start in range(0, n_rows, rows_per_file):
        ids = np.arange(start, min(start + rows_per_file, n_rows), dtype=np.int64)
        shard = os.path.join(path, f"pages-{start:012d}.parquet")
        pq.write_table(pages_batch(ids, seed), shard)
        paths.append(shard)
    return paths


# --------------------------------------------------------------------------
# admin-boundary polygons (broadcast side of the flagship join)
# --------------------------------------------------------------------------


def admin_polygons_table(cell_deg: float = 30.0) -> pa.Table:
    """Synthetic non-overlapping admin cells: a diamond (45°-rotated square)
    tiling of the lon/lat plane, so point-in-polygon refinement is exercised
    on non-axis-aligned edges (a bbox test would produce wrong answers).

    Diamonds of 'radius' cell_deg/2 centered on the half-offset checkerboard
    lattice tile the plane exactly. admin_id = "d{ix}_{iy}" on the doubled
    lattice.
    """
    from geopolars_ray.geom import GeometryArray, encode_wkb

    half = cell_deg / 2.0
    geoms = []
    ids = []
    names = []
    # checkerboard lattice: centers at (a*half, b*half) where (a+b) even
    for a in range(int(-180 / half), int(180 / half) + 1):
        for b in range(int(-90 / half), int(90 / half) + 1):
            if (a + b) % 2:
                continue
            cx, cy = a * half, b * half
            ring = [
                (cx - half, cy),
                (cx, cy - half),
                (cx + half, cy),
                (cx, cy + half),
                (cx - half, cy),
            ]
            geoms.append(("polygon", [ring]))
            ids.append(f"d{a}_{b}")
            names.append(f"admin diamond ({cx:.1f},{cy:.1f})")
    ga = GeometryArray.from_pylist(geoms)
    return pa.table(
        {
            "admin_id": pa.array(ids, pa.string()),
            "admin_name": pa.array(names, pa.string()),
            "geometry": encode_wkb(ga),
        }
    )
