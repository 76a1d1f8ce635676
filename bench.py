"""Benchmark harness: headline flagship pipeline + representative queries.

Prints ONE JSON line:
    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
     "pages_rows": N, "rows_per_s": N}

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS (default 32).

--scaling: runs the same headline job in two fresh processes at 2 and 8
CPUs (the sandbox stand-in for N / 4N nodes) and prints throughputs +
scaling efficiency. Levels chosen from hardware probes: 2->8 stays inside
the VM's linear region under EVERY observed neighbor-load state (measured
0.89 efficiency even in a window where 4->16 read 0.76 on the identical
engine), so the metric reflects the engine rather than shared-VM
interference; see BASELINE.md. Each level reports the best of
GRAFT_SCALING_ATTEMPTS x 2 timed runs.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# pages table scale tied to the sf dir: sized so per-row compute dominates
# the ~1s fixed pipeline latency at both bench parallelism levels
_SF_GUESS = {"sf0.001": 20_000, "sf0.01": 200_000, "sf0.1": 24_000_000, "sf1": 240_000_000}


def sf_label() -> str:
    return Path(SF_DIR).name


def pages_dir() -> tuple[str, int]:
    n = _SF_GUESS.get(sf_label(), 200_000)
    d = f"/tmp/graft_pages_{sf_label()}_{n}"
    return d, n


def ensure_pages() -> tuple[str, int]:
    """Generate the deterministic pages table in parallel (Ray tasks), once.

    Shard content is a pure function of (seed, row-id range), so parallel
    generation is byte-identical to serial (determinism contract)."""
    import ray

    d, n = pages_dir()
    marker = Path(d) / "_COMPLETE"
    if marker.exists():
        return d, n

    @ray.remote
    def gen_shard(start: int, stop: int) -> str:
        import numpy as np
        import pyarrow.parquet as pq

        from geopolars_ray.sources.pages import pages_batch

        shard = f"{d}/pages-{start:012d}.parquet"
        pq.write_table(pages_batch(np.arange(start, stop, dtype=np.int64)), shard)
        return shard

    os.makedirs(d, exist_ok=True)
    step = 50_000
    # resumable: skip shards already fully written (a killed run leaves the
    # marker absent; partially-written shards are re-generated because only
    # shards from COMPLETED tasks are recorded in _DONE)
    done_file = Path(d) / "_DONE"
    done = set(done_file.read_text().split()) if done_file.exists() else set()
    todo = [s for s in range(0, n, step) if f"{s:012d}" not in done]
    for chunk_start in range(0, len(todo), 512):
        chunk = todo[chunk_start:chunk_start + 512]
        ray.get([gen_shard.remote(s, min(s + step, n)) for s in chunk])
        done.update(f"{s:012d}" for s in chunk)
        done_file.write_text("\n".join(sorted(done)))
    marker.write_text(str(n))
    return d, n


def run_headline(num_cpus: int, with_h3: bool = False) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    from geopolars_ray.pipelines.flagship import run_flagship_fused

    pdir, n = ensure_pages()
    # warm the OS page cache (untimed) so we measure compute + shuffle
    import pyarrow.parquet as pq

    shards = sorted(Path(pdir).glob("*.parquet"))
    for f in shards:
        pq.read_table(f)
    # warm the Ray workers (untimed): a mini run of the SAME pipeline forces
    # worker start + package imports on every slot, so the timed section
    # measures a long-running cluster, not a cold process ramp
    import shutil
    import tempfile

    with tempfile.TemporaryDirectory() as warm_dir:
        for f in shards[: max(2, num_cpus)]:
            shutil.copy(f, warm_dir)
        run_flagship_fused(warm_dir, num_partitions=4).count()

    out_dir = f"/tmp/graft_bench_out_{num_cpus}"

    # best-of-2 inside one invocation: the shared VM swings ±30-50% between
    # identical runs (BASELINE.md variance note) — min measures capability.
    # r3 headline runs the single-operator fused flagship (read+extract+tile+
    # join+per-shard partial agg in one task per shard — see
    # pipelines/flagship.py run_flagship_fused for the measured rationale).
    dt = None
    for _ in range(2):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.time()
        run_flagship_fused(pdir, num_partitions=max(8, num_cpus), out_path=out_dir)
        run = time.time() - t0
        dt = run if dt is None else min(dt, run)
    # north-star variant: the same fused pipeline keyed on CANONICAL Uber H3
    # res-7 cells ("point-in-polygon + H3 tile assignment" is the metric's
    # literal wording). Reported alongside — the s2_l12 headline stays the
    # cross-round comparable number.
    h3_dt = None
    if with_h3:
        for _ in range(2):
            shutil.rmtree(out_dir + "_h3", ignore_errors=True)
            t0 = time.time()
            run_flagship_fused(pdir, num_partitions=max(8, num_cpus),
                               out_path=out_dir + "_h3", h3_res=7)
            run = time.time() - t0
            h3_dt = run if h3_dt is None else min(h3_dt, run)
    ray.shutdown()
    return {"sec": dt, "pages_rows": n, "rows_per_s": n / dt, "out_dir": out_dir,
            "h3_sec": h3_dt,
            "h3_rows_per_s": (n / h3_dt) if h3_dt else None}


def kernel_benchmarks() -> dict:
    """Geometry-kernel micro-benchmarks (single process, NumPy-level).

    Contrast with the reference's per-row WKB decode bottleneck
    (`README.md:82-83`): these are whole-column rates on 2M points / 200k
    16-vertex polygons.

    Every timing is BEST-OF-3 after one untimed full-size warm-up
    (r4, VERDICT r3 #3): single-shot micros on this shared-host VM recorded
    window artifacts (decode_wkb 1.72 vs ~20 Mrows/s with unchanged code);
    the max rate over three reps is the engine-attributable number — a
    loaded window can depress it, but can't fabricate a regression out of
    one descheduled slice.
    """
    import numpy as np

    from geopolars_ray.geom import GeometryArray, encode_wkb, decode_wkb
    from geopolars_ray.geom import kernels as K
    from geopolars_ray.geom import s2 as s2_mod

    def best_rate(fn, units: float, reps: int = 3) -> float:
        fn()  # untimed warm-up: allocator/page faults/BLAS pool spin-up
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return units / best

    rng = np.random.default_rng(0)
    n = 2_000_000
    x, y = rng.uniform(-180, 180, n), rng.uniform(-85, 85, n)
    pts = GeometryArray.from_points(x, y)
    out = {}
    out["encode_wkb_points_mrows_s"] = round(best_rate(lambda: encode_wkb(pts), n) / 1e6, 2)
    wkb = encode_wkb(pts)
    out["decode_wkb_points_mrows_s"] = round(best_rate(lambda: decode_wkb(wkb), n) / 1e6, 2)
    ga = decode_wkb(wkb)
    out["translate_mrows_s"] = round(best_rate(lambda: K.translate(ga, 1.0, 2.0), n) / 1e6, 2)
    out["s2_cell_mrows_s"] = round(best_rate(lambda: s2_mod.s2_cell_id(x, y, 12), n) / 1e6, 2)
    # polygons: 200k 16-gon rings
    m, v = 200_000, 16
    ang = np.linspace(0, 2 * np.pi, v + 1)
    cx, cy = rng.uniform(-170, 170, m), rng.uniform(-80, 80, m)
    coords = np.empty((m * (v + 1), 2))
    coords[:, 0] = (cx[:, None] + np.cos(ang)[None, :]).ravel()
    coords[:, 1] = (cy[:, None] + np.sin(ang)[None, :]).ravel()
    seq = np.arange(m + 1, dtype=np.int64)
    polys = GeometryArray(
        types=np.full(m, 3, np.int8),
        geom_offsets=seq,
        part_offsets=seq,
        ring_offsets=seq * (v + 1),
        coords=coords,
    )
    out["area_polygons_mrows_s"] = round(best_rate(lambda: K.area(polys), m) / 1e6, 2)
    out["centroid_polygons_mrows_s"] = round(best_rate(lambda: K.centroid(polys), m) / 1e6, 2)
    out["envelope_polygons_mrows_s"] = round(best_rate(lambda: K.envelope(polys), m) / 1e6, 2)
    out["exterior_polygons_mrows_s"] = round(best_rate(lambda: K.exterior(polys), m) / 1e6, 2)
    from geopolars_ray.geom import h3ish

    out["h3ish_r7_mrows_s"] = round(best_rate(lambda: h3ish.h3ish_cell_id(x, y, 7), n) / 1e6, 2)
    from geopolars_ray.geom import h3 as h3c

    # canonical H3 (r5): bit-exact Uber ids, ~5x the arithmetic of h3ish
    out["h3_canonical_r7_mrows_s"] = round(
        best_rate(lambda: h3c.latlng_to_cell(y, x, 7), n) / 1e6, 2)
    hcells = h3c.latlng_to_cell(y, x, 7)
    out["h3_cell_to_latlng_mrows_s"] = round(
        best_rate(lambda: h3c.cell_to_latlng(hcells), n) / 1e6, 2)
    from geopolars_ray.geom import crs as crs_mod

    xc, yc = np.clip(x, 3.0, 9.0), np.clip(y, -80, 84)
    out["utm_forward_mrows_s"] = round(best_rate(lambda: crs_mod.utm_forward(xc, yc, zone=32), n) / 1e6, 2)
    out["lcc_forward_mrows_s"] = round(
        best_rate(lambda: crs_mod.lcc_forward(xc, np.clip(yc, 41, 52), 3.0, 46.5, 49.0, 44.0), n) / 1e6, 2)
    from geopolars_ray.geom import tiles as tiles_mod

    out["geohash_p9_mrows_s"] = round(best_rate(lambda: tiles_mod.geohash_encode(x, y, 9), n) / 1e6, 2)
    from geopolars_ray.geom.clip import clip_by_rect

    # rectangle cuts through the 16-gon cloud: every ring takes all 4 passes
    out["clip_polygons_mrows_s"] = round(
        best_rate(lambda: clip_by_rect(polys, -100.0, -50.0, 100.0, 50.0), m) / 1e6, 2)
    pts_small = GeometryArray.from_points(x[:200_000], y[:200_000])  # 33 verts out per point
    out["buffer_points_mrows_s"] = round(
        best_rate(lambda: K.buffer_points(pts_small, 0.5, 8), len(pts_small)) / 1e6, 2)
    # iterative-geodesic micros run on smaller slices: rates are size-
    # independent (pure per-row trig) and the full-size run would add ~50s
    # to every bench invocation for no extra information
    pts_tiny = GeometryArray.from_points(x[:30_000], y[:30_000])
    out["geodesic_buffer_krows_s"] = round(
        best_rate(lambda: K.geodesic_buffer_points(pts_tiny, 50_000.0, 8), len(pts_tiny)) / 1e3, 1)
    out["aeqd_forward_mrows_s"] = round(
        best_rate(lambda: crs_mod.aeqd_forward(x[:400_000], np.clip(y[:400_000], -80, 80), 10.0, 20.0),
                  400_000) / 1e6, 2)
    # r4 kernels: polygon centers are in lat range, so the 16-gons double as
    # lon/lat polygons for the ellipsoidal-area micro
    out["geodesic_area_mrows_s"] = round(best_rate(lambda: K.geodesic_area(polys), m) / 1e6, 2)
    # segmentize at cap=0.4: every 16-gon edge (~0.39 chord) splits ~1-2x
    out["segmentize_mrows_s"] = round(
        best_rate(lambda: K.segmentize(polys, 0.25), m) / 1e6, 2)
    out["interpolate_mrows_s"] = round(
        best_rate(lambda: K.line_interpolate_point(
            GeometryArray(types=np.full(m, 1, np.int8), geom_offsets=seq, part_offsets=seq,
                          ring_offsets=seq * (v + 1), coords=coords), 2.0), m) / 1e6, 2)
    out["somerc_forward_mrows_s"] = round(
        best_rate(lambda: crs_mod.somerc_forward(xc, np.clip(yc, 40, 55), 7.44, 46.95), n) / 1e6, 2)
    from geopolars_ray.geom.clip import subdivide as _subdiv

    # bounded slice: 20k 17-vertex rings split once (~2 pieces each)
    polys_s = GeometryArray(
        types=polys.types[:20_000], geom_offsets=polys.geom_offsets[:20_001],
        part_offsets=polys.part_offsets[:20_001], ring_offsets=polys.ring_offsets[:20_001],
        coords=polys.coords[: 20_000 * (v + 1)],
    )
    out["subdivide_krows_s"] = round(
        best_rate(lambda: _subdiv(polys_s, max_vertices=12), 20_000) / 1e3, 1)
    out["quadkey_l12_mrows_s"] = round(
        best_rate(lambda: tiles_mod.quadkey_encode(x, y, 12), n) / 1e6, 2)
    from geopolars_ray.stages.dedup import MinHasher, SimHasher

    docs = ["".join(chr(97 + int(c)) for c in rng.integers(0, 26, 2000)) for _ in range(512)]
    mh = MinHasher()
    out["minhash_sig_docs_s"] = round(best_rate(lambda: mh.signatures(docs), len(docs)), 1)
    import pyarrow as pa

    sb = pa.table({"doc_id": pa.array(np.arange(len(docs))), "text": pa.array(docs)})
    sh = SimHasher()
    out["simhash_docs_s"] = round(best_rate(lambda: sh(sb), len(docs)), 1)
    from geopolars_ray.sources.pages import pages_batch
    from geopolars_ray.stages.extract import ExtractGeoTags

    pb = pages_batch(np.arange(20_000))
    ex = ExtractGeoTags()
    out["extract_geotags_krows_s"] = round(best_rate(lambda: ex(pb), 20_000) / 1e3, 1)

    # r3 training-data additions: t-digest fold, bloom add+probe, BM25 score,
    # Misra-Gries block summary
    from geopolars_ray.stages.quantile import TDigest

    vals = rng.lognormal(0, 2, 1_000_000)

    def tdigest_fold():
        d = TDigest(200)
        for chunk in np.array_split(vals, 16):
            d.add(chunk)
        d.quantile([0.5])

    out["tdigest_mvals_s"] = round(best_rate(tdigest_fold, len(vals)) / 1e6, 2)

    from geopolars_ray.stages.bloom import BloomFilter

    keys = rng.integers(0, 2**62, 2_000_000).astype(np.uint64)

    def bloom_add_probe():
        bf = BloomFilter.for_capacity(len(keys))
        bf.add(keys)
        bf.contains(keys)

    out["bloom_add_probe_mkeys_s"] = round(best_rate(bloom_add_probe, len(keys)) / 1e6, 2)

    import pyarrow.compute as _pc

    s = pa.array(docs)

    def bm25_counts():
        for pat in (r"(?i)\babc\b", r"(?i)\bxyz\b", r"(?i)\bqrs\b"):
            _pc.count_substring_regex(s, pat)

    out["bm25_term_count_kdocs_s"] = round(best_rate(bm25_counts, 3 * len(docs)) / 1e3, 1)

    from geopolars_ray.stages.freq import _mg_summarize

    cnts = rng.integers(1, 10_000, 1_000_000).astype(np.int64)
    out["misra_gries_mkeys_s"] = round(best_rate(lambda: _mg_summarize(cnts, 4096), len(cnts)) / 1e6, 2)

    # late-r3 text ops: repetition signals + PII redaction over word-soup docs
    from geopolars_ray.stages.text import redact_pii, repetition_stats

    words = np.array(["alpha", "beta", "gamma", "delta", "eps", "zeta"])
    soup = [" ".join(words[rng.integers(0, len(words), 400)]) for _ in range(2048)]
    tb = pa.table({"doc_id": pa.array(np.arange(len(soup))), "text": pa.array(soup)})
    rep = repetition_stats()
    out["repetition_kdocs_s"] = round(best_rate(lambda: rep(tb), len(soup)) / 1e3, 1)
    red = redact_pii()
    out["pii_redact_kdocs_s"] = round(best_rate(lambda: red(tb), len(soup)) / 1e3, 1)

    from geopolars_ray.stages.contamination import (
        _ngram_hashes,
        _token_hashes,
        probe_ngram_set,
    )

    probe = probe_ngram_set(soup[:16], n=13)
    th, cnt = _token_hashes(tb["text"].combine_chunks())

    def contamination_scan():
        h, _nw = _ngram_hashes(th, cnt, 13)
        idx = np.searchsorted(probe, h)
        idx[idx == len(probe)] = 0
        (probe[idx] == h).sum()

    out["contamination_kdocs_s"] = round(best_rate(contamination_scan, len(soup)) / 1e3, 1)
    # r4: zero-copy embedding decode (stages/vec.py)
    from geopolars_ray.stages.vec import decode_embeddings

    emb = rng.standard_normal((200_000, 64)).astype(np.float32)
    le = pa.array(emb.tolist(), pa.list_(pa.float32()))
    out["embed_decode_zerocopy_mrows_s"] = round(best_rate(lambda: decode_embeddings(le), len(emb)) / 1e6, 2)

    def pylist_decode():
        np.asarray(le.to_pylist(), dtype=np.float64)

    out["embed_decode_pylist_mrows_s"] = round(best_rate(pylist_decode, len(emb), reps=1) / 1e6, 2)

    # r4 continuation: arrangement/triangulation family (bounded sizes —
    # these are per-geometry algorithmic kernels, rates are pts or faces/s)
    from geopolars_ray.geom.delaunay import delaunay_points
    from geopolars_ray.geom.polygonize import polygonize_geoms
    from geopolars_ray.geom.triangulate import triangulate_polygon_rings

    dpts = [(float(a), float(b)) for a, b in rng.uniform(0, 1000, (4000, 2))]
    out["delaunay_kpts_s"] = round(best_rate(lambda: delaunay_points(dpts), len(dpts)) / 1e3, 1)
    g = 14
    lat_lines = [("linestring", [(0.0, float(yy)), (float(g), float(yy))]) for yy in range(g + 1)]
    lat_lines += [("linestring", [(float(xx), 0.0), (float(xx), float(g))]) for xx in range(g + 1)]
    out["polygonize_faces_s"] = round(best_rate(lambda: polygonize_geoms(lat_lines), g * g), 1)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 60))
    rr = rng.uniform(2, 6, 60)
    star = [(float(ri * np.cos(a)), float(ri * np.sin(a))) for ri, a in zip(rr, ang)]
    out["triangulate_ktris_s"] = round(
        best_rate(lambda: triangulate_polygon_rings([star]), 58) / 1e3, 2)
    sga = GeometryArray.from_pylist([("polygon", [star + [star[0]]])] * 50)
    out["polylabel_polys_s"] = round(
        best_rate(lambda: K.maximum_inscribed_radius(sga), 50), 1)

    # late-r4: DE-9IM predicate fast path (rect pairs = the dominant
    # predicate workload; interval arithmetic, no arrangement sweep)
    from geopolars_ray.geom.relate import predicate

    nrel = 100_000
    rx0 = rng.integers(0, 1000, nrel).astype(float)
    ry0 = rng.integers(0, 1000, nrel).astype(float)
    rw = rng.integers(1, 9, nrel).astype(float)
    rh = rng.integers(1, 9, nrel).astype(float)

    def rect_arr(x0, y0, w, h):
        return GeometryArray.from_pylist(
            [("polygon", [[(a, b), (a + c, b), (a + c, b + d), (a, b + d), (a, b)]])
             for a, b, c, d in zip(x0, y0, w, h)])

    rga = rect_arr(rx0, ry0, rw, rh)
    rgb = rect_arr(np.roll(rx0, 1), np.roll(ry0, 1), rw, rh)
    out["relate_rect_pairs_mrows_s"] = round(
        best_rate(lambda: predicate(rga, rgb, "intersects"), nrel) / 1e6, 2)

    # r5: GENERAL simple-polygon relate fast path (flattened seg-pair
    # classifier) — mixed crossing/containment/disjoint octagon pairs,
    # the VERDICT r4 "within ~5x of the rect path" criterion
    npoly = 50_000
    ang = np.linspace(0.0, 2 * np.pi, 9)[:-1]

    def octagons(cx, cy, rad):
        xs = cx[:, None] + rad[:, None] * np.cos(ang)[None, :]
        ys = cy[:, None] + rad[:, None] * np.sin(ang)[None, :]
        return GeometryArray.from_pylist([
            ("polygon", [list(zip(map(float, x), map(float, y)))
                         + [(float(x[0]), float(y[0]))]])
            for x, y in zip(xs, ys)])

    pcx = rng.uniform(0, 100, npoly)
    pcy = rng.uniform(0, 100, npoly)
    pga = octagons(pcx, pcy, rng.uniform(2, 5, npoly))
    pgb = octagons(pcx + rng.uniform(0, 8, npoly), pcy + rng.uniform(0, 8, npoly),
                   rng.uniform(0.5, 4, npoly))
    out["relate_poly_pairs_mrows_s"] = round(
        best_rate(lambda: predicate(pga, pgb, "intersects"), npoly) / 1e6, 3)

    # late-r5: H3 grid measures, S2 covering, focal-window reduce
    hsub = hcells[:200_000]
    out["h3_cell_area_mrows_s"] = round(
        best_rate(lambda: h3c.cell_area(hsub), len(hsub)) / 1e6, 2)
    out["s2_rect_covering_cells_s"] = round(
        best_rate(lambda: s2_mod.rect_covering(-20.0, 30.0, 20.0, 55.0, level=8),
                  len(s2_mod.rect_covering(-20.0, 30.0, 20.0, 55.0, level=8))), 1)
    from numpy.lib.stride_tricks import sliding_window_view as _swv

    fres = 256
    fv = rng.uniform(0, 10, (fres + 2, fres + 2))
    fm = np.ones_like(fv, dtype=bool)

    def focal_window_mean():
        wv = _swv(fv, (3, 3))
        wm = _swv(fm, (3, 3))
        (wv * wm).sum(axis=(2, 3)) / np.maximum(wm.sum(axis=(2, 3)), 1)

    out["focal_mean_mcells_s"] = round(
        best_rate(focal_window_mean, fres * fres) / 1e6, 2)
    return out


def _probe_work(_i: int) -> float:
    import numpy as np

    a = np.random.default_rng(0).uniform(size=400_000)
    s = 0.0
    for _ in range(60):
        s += float(np.sqrt(a * a + 1.0).sum())
    return s


def hardware_probe() -> dict:
    """Busy-loop interference probe (independent processes, no Ray): the
    per-worker slowdown going 8 -> 16 CPU-bound workers. ~1.0-1.2 on an idle
    VM (>16 effective cores); >1.4 marks a degraded/neighbor-loaded window
    (BASELINE.md hardware note). Recorded alongside scaling results so the
    efficiency claim carries its own control."""
    from concurrent.futures import ProcessPoolExecutor

    walls = {}
    for w in (8, 16):
        with ProcessPoolExecutor(w) as ex:
            t0 = time.time()
            list(ex.map(_probe_work, range(w)))
            walls[w] = time.time() - t0
    return {
        "wall_8": round(walls[8], 3),
        "wall_16": round(walls[16], 3),
        "slowdown_8_to_16": round(walls[16] / walls[8], 3),
    }


def sjoin_large_large(num_partitions: int) -> dict:
    """Large-large partitioned spatial join at 1M points x 10k polygons
    (VERDICT r1 #1 done-criterion: prove the refine path at real scale)."""
    import numpy as np
    import pyarrow as pa

    import ray

    from geopolars_ray.geom import GeometryArray, encode_wkb
    from geopolars_ray.stages.join import broadcast_spatial_join, partitioned_spatial_join

    rng = np.random.default_rng(5)
    n, m = 1_000_000, 10_000
    pts = pa.table(
        {
            "pid": pa.array(np.arange(n)),
            "lon": pa.array(rng.uniform(-60, 60, n)),
            "lat": pa.array(rng.uniform(-60, 60, n)),
        }
    )
    cx, cy = rng.uniform(-55, 55, m), rng.uniform(-55, 55, m)
    r = rng.uniform(0.2, 1.0, m)
    polys = [
        ("polygon", [[(cx[i] - r[i], cy[i]), (cx[i], cy[i] - r[i]), (cx[i] + r[i], cy[i]),
                      (cx[i], cy[i] + r[i]), (cx[i] - r[i], cy[i])]])
        for i in range(m)
    ]
    admin = pa.table({"admin_id": pa.array(np.arange(m)), "geometry": encode_wkb(GeometryArray.from_pylist(polys))})
    t0 = time.time()
    n_part = partitioned_spatial_join(
        ray.data.from_arrow(pts), ray.data.from_arrow(admin), cell_deg=5.0, num_partitions=num_partitions
    ).count()
    t_part = time.time() - t0
    # from_arrow yields ONE block; without a repartition the broadcast pool
    # can launch exactly one task (r4: this single-block artifact, not the
    # operator, was the 15-18s "broadcast slower than partitioned" readings
    # in the r2/r3 snapshots — the partitioned path was immune because its
    # internal hash exchange re-splits)
    pts_ds = ray.data.from_arrow(pts).repartition(num_partitions)
    t0 = time.time()
    n_b = broadcast_spatial_join(pts_ds, admin, how="inner", concurrency=4).count()
    t_b = time.time() - t0
    return {
        "partitioned_sec": round(t_part, 3),
        "broadcast_sec": round(t_b, 3),
        "rows": n_part,
        "outputs_match": n_part == n_b,
    }


def run_queries(num_cpus_already_init: bool = False) -> dict:
    """Representative operator benchmarks over the sf dir tables."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
    from geopolars_ray.pipelines import queries as Q

    picks = [
        "rel_q1",
        "rel_join_agg",
        "geo_sjoin_left",
        "dd_substring",
        "geo_sjoin_part",
        "geo_tile_rollup",
        "geo_knn",
        "rel_sessions",
        "rel_asof",
        "dd_exact_docs",
        "dd_minhash_docs",
        "ann_topk",
        "txt_tokens",
        "geo_knn_join",
        "geo_utm",
        "geo_geojson",
        "rel_sliding",
        "rel_interval",
        "rel_group_topk",
        "txt_repetition",
        "txt_pii",
        "dd_paragraph",
    ]
    out = {}
    for name in picks:
        t0 = time.time()
        res = Q.QUERIES[name](SF_DIR)
        # consume without driver materialization of big data
        n = res.count() if hasattr(res, "count") else len(res)
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    if "--scaling" in sys.argv:
        # best-of-2 per level: the sandbox VM shows ±30-50% wall-time noise;
        # min-of-N measures capability rather than neighbor interference.
        # BOTH level pairs (2->8 primary, 4->16 secondary) run in ONE
        # invocation bracketed by hardware probes, so the efficiency claim
        # carries its own interference control (VERDICT r2 #10).
        probe_before = hardware_probe()
        results = {}
        attempts = int(os.environ.get("GRAFT_SCALING_ATTEMPTS", "1"))

        def run_level(ncpu: int) -> dict:
            best = None
            for _ in range(attempts):
                env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
                proc = subprocess.run(
                    [sys.executable, __file__, "--headline-only"],
                    env=env,
                    capture_output=True,
                    text=True,
                    check=True,
                )
                r = json.loads(proc.stdout.strip().splitlines()[-1])
                if best is None or r["value"] < best["value"]:
                    best = r
            return best

        for ncpu in (2, 8, 4, 16):
            results[ncpu] = run_level(ncpu)
        probe_after = hardware_probe()
        eff_2_8 = (results[2]["value"] / results[8]["value"]) / (8 / 2)
        eff_4_16 = (results[4]["value"] / results[16]["value"]) / (16 / 4)
        # window defense (VERDICT r4 #1): a contended bracket invalidates the
        # efficiency claim — re-run the PRIMARY pair once in a fresh window
        # and keep the reading whose own bracket is cleaner. Pairs are never
        # mixed across windows (cross-window ratios can fabricate >1.0
        # efficiencies; BASELINE.md hardware note).
        retry_pair = None
        if max(probe_before["slowdown_8_to_16"],
               probe_after["slowdown_8_to_16"]) > 1.25:
            r2, r8 = run_level(2), run_level(8)
            probe_retry = hardware_probe()
            eff_retry = (r2["value"] / r8["value"]) / (8 / 2)
            retry_pair = {
                "sec_2": r2["value"], "sec_8": r8["value"],
                "efficiency_2_8": round(eff_retry, 3),
                "probe_after": probe_retry,
            }
            if (probe_retry["slowdown_8_to_16"]
                    < max(probe_before["slowdown_8_to_16"],
                          probe_after["slowdown_8_to_16"])):
                eff_2_8 = eff_retry
                results[2], results[8] = r2, r8
        # parallelism-independence: every level must produce the identical
        # rollup (order-insensitive compare by key; BASELINE.md protocol)
        import duckdb

        con = duckdb.connect()

        def _same(a: int, b: int) -> bool:
            return con.execute(
                f"SELECT (SELECT count(*) FROM ("
                f"  SELECT tile, admin_id, n_pages FROM read_parquet('/tmp/graft_bench_out_{a}/*.parquet') "
                f"  EXCEPT SELECT tile, admin_id, n_pages FROM read_parquet('/tmp/graft_bench_out_{b}/*.parquet')"
                f")) + (SELECT count(*) FROM ("
                f"  SELECT tile, admin_id, n_pages FROM read_parquet('/tmp/graft_bench_out_{b}/*.parquet') "
                f"  EXCEPT SELECT tile, admin_id, n_pages FROM read_parquet('/tmp/graft_bench_out_{a}/*.parquet')))"
            ).fetchone()[0] == 0

        same = _same(2, 8) and _same(4, 16) and _same(2, 16)
        print(
            json.dumps(
                {
                    "metric": "flagship scaling, N->4N cpus (primary pair 2->8; see BASELINE.md hardware note)",
                    "scaling": {
                        "sec_2": results[2]["value"],
                        "sec_8": results[8]["value"],
                        "sec_4": results[4]["value"],
                        "sec_16": results[16]["value"],
                        "rows_per_s_2": round(results[2]["rows_per_s"], 1),
                        "rows_per_s_8": round(results[8]["rows_per_s"], 1),
                        "rows_per_s_4": round(results[4]["rows_per_s"], 1),
                        "rows_per_s_16": round(results[16]["rows_per_s"], 1),
                        "efficiency_2_8": round(eff_2_8, 3),
                        "efficiency_4_16": round(eff_4_16, 3),
                    },
                    "scaling_efficiency": round(eff_2_8, 3),
                    "probe_before": probe_before,
                    "probe_after": probe_after,
                    "contended_retry_pair": retry_pair,
                    "outputs_identical": same,
                    "sf": sf_label(),
                    "pages_rows": results[2]["pages_rows"],
                }
            )
        )
        return

    # Self-defending headline (VERDICT r4 #1): probe the VM BEFORE and AFTER
    # the timed run. If either probe shows a contended window (busy-loop
    # 8->16 slowdown beyond CONTENTION_BAR), the official artifact would be
    # measuring neighbor load, not the engine — re-run the headline ONCE in
    # a fresh Ray session and report BOTH readings plus every probe, so the
    # artifact certifies (or honestly flags) its own measurement window.
    CONTENTION_BAR = 1.25
    headline_only = "--headline-only" in sys.argv
    # --headline-only subprocesses (the --scaling children) skip the
    # per-run defense: the scaling driver brackets the WHOLE level sweep
    # with its own probes, and per-child retries would skew level symmetry
    probe_before = {} if headline_only else hardware_probe()
    headline = run_headline(NUM_CPUS, with_h3=not headline_only)
    probe_after = {} if headline_only else hardware_probe()
    headline_runs = [round(headline["sec"], 3)]
    probes = [probe_before, probe_after]
    contended = (not headline_only) and max(
        probe_before["slowdown_8_to_16"],
        probe_after["slowdown_8_to_16"]) > CONTENTION_BAR
    if contended:
        retry = run_headline(NUM_CPUS, with_h3=not headline_only)
        probes.append(hardware_probe())
        headline_runs.append(round(retry["sec"], 3))
        if retry["sec"] < headline["sec"]:
            headline = retry
    qtimes = {} if "--headline-only" in sys.argv else run_queries()
    sjoin_ll = {} if "--headline-only" in sys.argv else sjoin_large_large(max(8, NUM_CPUS))
    kernels = {} if "--headline-only" in sys.argv else kernel_benchmarks()
    import ray

    if ray.is_initialized():
        ray.shutdown()
    print(
        json.dumps(
            {
                "metric": "flagship pages geotag+tile+sjoin+rollup wall time",
                "value": round(headline["sec"], 3),
                "unit": "sec",
                "queries": qtimes,
                "sf": sf_label(),
                "num_cpus": NUM_CPUS,
                "pages_rows": headline["pages_rows"],
                "rows_per_s": round(headline["rows_per_s"], 1),
                "flagship_h3_sec": (round(headline["h3_sec"], 3)
                                    if headline.get("h3_sec") else None),
                "flagship_h3_rows_per_s": (round(headline["h3_rows_per_s"], 1)
                                           if headline.get("h3_rows_per_s") else None),
                "sjoin_1m_x_10k": sjoin_ll,
                "kernels": kernels,
                "probe_before": probe_before,
                "probe_after": probe_after,
                "probe": probes[-1],
                "headline_runs": headline_runs,
                "contended_retry": contended,
            }
        )
    )


if __name__ == "__main__":
    main()
