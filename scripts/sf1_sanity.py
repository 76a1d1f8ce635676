"""sf1 scale-sanity run (VERDICT r3 #7): one order of magnitude above the
per-round bench scale, as actual evidence for the streaming-safety claims.

Phased so each invocation is bounded (~minutes) and resumable:

    python scripts/sf1_sanity.py --gen            # synthesize 240M pages (resumable)
    python scripts/sf1_sanity.py --flagship 8     # one timed fused-flagship run
    python scripts/sf1_sanity.py --flagship 32
    python scripts/sf1_sanity.py --dedup          # minhash + paragraph over 50k docs
    python scripts/sf1_sanity.py --curation       # composed curation over 50k docs
    python scripts/sf1_sanity.py --report         # assemble + compare output hashes

Each phase prints one JSON line and saves it under /tmp/sf1_*.json; --report
merges them (flagship output hashes compared across parallelism levels).
Peak memory is tracked system-wide via /proc/meminfo (covers Ray workers
and the object store), plus driver ru_maxrss.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import threading
import time
from pathlib import Path

os.environ.setdefault("GRAFT_SF_DIR", "/root/testdata/sf1")  # label only; pages are synthesized
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


class MemSampler:
    """System-wide peak memory via /proc/meminfo (covers workers + plasma)."""

    def __init__(self, interval: float = 0.5):
        self.interval = interval
        self.min_avail = float("inf")
        self.total = None
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    def _read(self):
        info = {}
        for line in open("/proc/meminfo"):
            k, v = line.split(":", 1)
            info[k] = int(v.split()[0]) * 1024
        return info

    def _run(self):
        while not self._stop.is_set():
            info = self._read()
            self.total = info["MemTotal"]
            self.min_avail = min(self.min_avail, info["MemAvailable"])
            self._stop.wait(self.interval)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *a):
        self._stop.set()
        self._t.join()

    @property
    def peak_used_gib(self) -> float:
        return (self.total - self.min_avail) / (1 << 30)


def _hash_output_dir(d: str) -> str:
    """Hash the ENGINE-EXACT columns (tile, admin_id, n_pages) — same
    contract as bench.py's scaling compare. The float sum_lat/sum_lon
    columns legitimately differ in final ULPs between parallelism levels
    (per-shard vs per-block accumulation association; flagship docstring)
    and are compared separately at rtol=1e-12 by _float_cols_close."""
    import hashlib

    import pyarrow.parquet as pq

    h = hashlib.sha256()
    t = pq.read_table(d, columns=["tile", "admin_id", "n_pages"])
    t = t.sort_by([("tile", "ascending"), ("admin_id", "ascending")])
    for c in ("tile", "admin_id", "n_pages"):
        h.update(c.encode())
        for chunk in t[c].chunks:
            h.update(str(chunk.to_pylist()).encode())
    return h.hexdigest()[:16]


def _float_cols_close(a_dir: str, b_dir: str, rtol: float = 1e-12) -> bool:
    import numpy as np
    import pyarrow.parquet as pq

    cols = ["tile", "admin_id", "sum_lat", "sum_lon"]
    ta = pq.read_table(a_dir, columns=cols).sort_by(
        [("tile", "ascending"), ("admin_id", "ascending")])
    tb = pq.read_table(b_dir, columns=cols).sort_by(
        [("tile", "ascending"), ("admin_id", "ascending")])
    if ta.num_rows != tb.num_rows:
        return False
    for c in ("sum_lat", "sum_lon"):
        va = ta[c].to_numpy(zero_copy_only=False)
        vb = tb[c].to_numpy(zero_copy_only=False)
        # atol guards sums that cancel near zero (lat/lon sums do)
        if not np.allclose(va, vb, rtol=rtol, atol=1e-9):
            return False
    return True


def _save(name: str, obj: dict) -> None:
    Path(f"/tmp/sf1_{name}.json").write_text(json.dumps(obj))
    print(json.dumps(obj))


def gen_phase() -> None:
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
    import bench

    t0 = time.time()
    d, n = bench.ensure_pages()
    ray.shutdown()
    _save("gen", {"dir": d, "rows": n, "gen_sec": round(time.time() - t0, 1)})


def flagship_phase(cpus: int) -> None:
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    import shutil
    import tempfile

    import bench
    from geopolars_ray.pipelines.flagship import run_flagship_fused

    probe0 = bench.hardware_probe()
    pdir, n = bench.pages_dir()
    assert (Path(pdir) / "_COMPLETE").exists(), "run --gen first"
    shards = sorted(Path(pdir).glob("*.parquet"))
    # worker warm (untimed): mini run of the same pipeline on a few shards
    with tempfile.TemporaryDirectory() as warm_dir:
        for f in shards[: max(2, cpus)]:
            shutil.copy(f, warm_dir)
        run_flagship_fused(warm_dir, num_partitions=4).count()
    out_dir = f"/tmp/sf1_flagship_out_{cpus}"
    shutil.rmtree(out_dir, ignore_errors=True)
    with MemSampler() as ms:
        t0 = time.time()
        run_flagship_fused(pdir, num_partitions=max(8, cpus), out_path=out_dir)
        dt = time.time() - t0
    probe1 = bench.hardware_probe()
    ray.shutdown()
    _save(f"flagship_{cpus}", {
        "cpus": cpus, "rows": n, "sec": round(dt, 1),
        "mrows_per_s": round(n / dt / 1e6, 2),
        "peak_sys_used_gib": round(ms.peak_used_gib, 1),
        "out_hash": _hash_output_dir(out_dir),
        "probe_before": probe0, "probe_after": probe1,
        "driver_maxrss_gib": round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / (1 << 20), 2),
    })


def _docs_x10(sf_dir: str, out_path: str, reps: int = 10) -> str:
    """10x-replicated documents corpus: rep 0 keeps the original text, reps
    1..9 get a deterministic two-token prefix — every replica family is a
    dense near-dup cluster (Jaccard >> 0.7), the worst case for LSH bucket
    load and the verify join."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if Path(out_path).exists():
        return out_path
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    parts = []
    for rep in range(reps):
        did = pc.add(pc.multiply(t["doc_id"], pa.scalar(reps, pa.int64())),
                     pa.scalar(rep, pa.int64()))
        if rep == 0:
            txt = t["text"]
        else:
            txt = pc.binary_join_element_wise(
                pa.scalar(f"rep{rep} variant"), pc.cast(t["text"], pa.string()), " "
            )
        parts.append(pa.table({"doc_id": did, "text": txt}))
    pq.write_table(pa.concat_tables(parts), out_path)
    return out_path


def dedup_phase() -> None:
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    docs_path = _docs_x10("/root/testdata/sf0.1", "/tmp/graft_docs_x10.parquet")
    out = {"docs_rows": 50_000}

    from geopolars_ray.stages.cc import dedup_keep_representatives
    from geopolars_ray.stages.dedup import (
        MinHasher,
        jaccard_verify,
        lsh_candidate_pairs,
        paragraph_dedup,
    )

    with MemSampler() as ms:
        t0 = time.time()
        docs = ray.data.read_parquet(docs_path).materialize()
        bands = docs.map_batches(MinHasher(), batch_format="pyarrow", batch_size=512)
        pairs = lsh_candidate_pairs(bands, num_partitions=32)
        pairs = jaccard_verify(pairs, docs, threshold=0.7, num_partitions=32)
        kept = dedup_keep_representatives(docs, pairs, "doc_id", src="a", dst="b",
                                          num_partitions=32)
        n_kept = kept.count()
        out["minhash_dedup"] = {
            "sec": round(time.time() - t0, 1),
            "kept": n_kept,
            "peak_sys_used_gib": round(ms.peak_used_gib, 1),
        }

    with MemSampler() as ms:
        t0 = time.time()
        docs2 = ray.data.read_parquet(docs_path)
        pd_out = paragraph_dedup(docs2, sep=" a ", num_partitions=32)
        n_rows = pd_out.count()
        out["paragraph_dedup"] = {
            "sec": round(time.time() - t0, 1),
            "rows": n_rows,
            "peak_sys_used_gib": round(ms.peak_used_gib, 1),
        }
    # exact-substring span dedup: the x10 replica families share their FULL
    # token stream, so nearly every window is duplicated — worst case for
    # the duplicate-hash set (broadcast gate) and the removal pass
    from geopolars_ray.stages.spandedup import exact_substring_dedup

    with MemSampler() as ms:
        t0 = time.time()
        docs3 = ray.data.read_parquet(docs_path)
        sd = exact_substring_dedup(docs3, L=8, num_partitions=32).materialize()
        out["substring_dedup"] = {
            "sec": round(time.time() - t0, 1),
            "rows": sd.count(),
            "tokens_removed": int(sd.sum("n_removed")),
            "peak_sys_used_gib": round(ms.peak_used_gib, 1),
        }
    ray.shutdown()
    _save("dedup", out)


def curation_phase() -> None:
    """The COMPOSED pipeline at 10x gate scale: quality floor -> per-language
    downsample -> minhash near-dup dedup (min_bands=2, the collision-heavy-
    corpus knob) over the 50k-doc x10 corpus."""
    import shutil

    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    docs_path = _docs_x10("/root/testdata/sf0.1", "/tmp/graft_docs_x10.parquet")
    in_dir = Path("/tmp/sf1_curation_in")
    in_dir.mkdir(exist_ok=True)
    if not (in_dir / "documents.parquet").exists():
        shutil.copy(docs_path, in_dir / "documents.parquet")

    from geopolars_ray.pipelines.curation import run_curation

    with MemSampler() as ms:
        t0 = time.time()
        out = run_curation(
            str(in_dir),
            quality_min=0.62,
            lang_fracs={"en": 0.5},
            dedup="minhash",
            minhash_min_bands=2,
            num_partitions=32,
            seed=12345,
        )
        kept = out.count()
        _save("curation", {
            "docs_rows": 50_000,
            "sec": round(time.time() - t0, 1),
            "kept": kept,
            "peak_sys_used_gib": round(ms.peak_used_gib, 1),
            "driver_rss_gib": round(
                resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20, 2),
        })
    ray.shutdown()


def report_phase() -> None:
    merged = {}
    for p in sorted(Path("/tmp").glob("sf1_*.json")):
        merged[p.stem.replace("sf1_", "")] = json.loads(p.read_text())
    f8, f32 = merged.get("flagship_8"), merged.get("flagship_32")
    if f8 and f32:
        # recompute exact-column hashes from the dirs (out_hash fields from
        # older runs may predate the exact-columns contract)
        h8 = _hash_output_dir("/tmp/sf1_flagship_out_8")
        h32 = _hash_output_dir("/tmp/sf1_flagship_out_32")
        merged["outputs_identical_8_vs_32"] = h8 == h32
        merged["float_sums_close_rtol1e12"] = _float_cols_close(
            "/tmp/sf1_flagship_out_8", "/tmp/sf1_flagship_out_32")
        merged["scaling_efficiency_8_to_32"] = round(
            (f32["mrows_per_s"] / f8["mrows_per_s"]) / 4.0, 3)
    print(json.dumps(merged))


def main():
    if "--gen" in sys.argv:
        gen_phase()
    elif "--flagship" in sys.argv:
        flagship_phase(int(sys.argv[sys.argv.index("--flagship") + 1]))
    elif "--dedup" in sys.argv:
        dedup_phase()
    elif "--curation" in sys.argv:
        curation_phase()
    elif "--report" in sys.argv:
        report_phase()
    else:
        print(__doc__)


if __name__ == "__main__":
    main()
