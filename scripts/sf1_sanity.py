"""sf1 scale-sanity run (VERDICT r3 #7): one order of magnitude above the
per-round bench scale, as actual evidence for the streaming-safety claims.

- Fused flagship over 240M synthesized pages (~15 GB parquet in /tmp),
  at TWO parallelism levels with byte-identical-output verification.
- MinHash-LSH dedup + paragraph dedup over a 10x-replicated documents
  corpus (50k docs, heavy near-dup density by construction).
- Peak memory tracked two ways: driver ru_maxrss and a /proc/meminfo
  sampler (system-wide used = total - available, covering Ray workers and
  the object store).

Usage: python scripts/sf1_sanity.py [--skip-flagship] [--skip-dedup]
Prints one JSON line; paste the numbers into BASELINE.md's sf1 section.
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
    import hashlib

    import pyarrow.parquet as pq

    h = hashlib.sha256()
    t = pq.read_table(d)
    t = t.sort_by([(c, "ascending") for c in sorted(t.column_names)])
    for c in sorted(t.column_names):
        h.update(c.encode())
        for chunk in t[c].chunks:
            h.update(str(chunk.to_pylist()).encode())
    return h.hexdigest()[:16]


def flagship_sf1() -> dict:
    import bench

    out = {}
    hashes = {}
    for cpus in (8, 32):
        with MemSampler() as ms:
            r = bench.run_headline(cpus)
        out[f"flagship_{cpus}cpus"] = {
            "sec": round(r["sec"], 2),
            "rows": r["pages_rows"],
            "mrows_per_s": round(r["rows_per_s"] / 1e6, 2),
            "peak_sys_used_gib": round(ms.peak_used_gib, 1),
        }
        hashes[cpus] = _hash_output_dir(r["out_dir"])
    out["outputs_identical_8_vs_32"] = hashes[8] == hashes[32]
    out["scaling_efficiency_8_to_32"] = round(
        (out["flagship_32cpus"]["mrows_per_s"] / out["flagship_8cpus"]["mrows_per_s"]) / 4.0, 3
    )
    return out


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


def dedup_sf1() -> dict:
    import ray

    if not ray.is_initialized():
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
    ray.shutdown()
    return out


def main():
    results = {"driver_maxrss_gib_start": round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / (1 << 20), 2)}
    if "--skip-flagship" not in sys.argv:
        results["flagship"] = flagship_sf1()
    if "--skip-dedup" not in sys.argv:
        results["dedup"] = dedup_sf1()
    results["driver_maxrss_gib"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / (1 << 20), 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
