"""Exact-substring span dedup: brute-force parity, both paths, invariances."""

import re
import warnings
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from geopolars_ray.stages.spandedup import (
    _batch_window_hashes,
    _token_keys,
    _tokenize_batch,
    exact_substring_dedup,
)


def brute(docs, L, min_count=2):
    """String-tuple reference (no hashing) — also validates the ring hash's
    faithfulness on these inputs."""
    toks = [re.split(r"\s+", d.strip()) if d and d.strip() else [] for d in docs]
    cnt = Counter()
    for t in toks:
        for i in range(len(t) - L + 1):
            cnt[tuple(t[i : i + L])] += 1
    dup = {k for k, v in cnt.items() if v >= min_count}
    out = []
    for t in toks:
        cov = [False] * len(t)
        for i in range(len(t) - L + 1):
            if tuple(t[i : i + L]) in dup:
                for j in range(i, i + L):
                    cov[j] = True
        out.append((len(t), sum(cov), " ".join(w for w, c in zip(t, cov) if not c)))
    return out


def run(docs, L, broadcast_max_bytes=512 << 20, num_partitions=4, blocks=1):
    import ray

    tbl = pa.table({"doc_id": pa.array(list(range(len(docs))), pa.int64()),
                    "text": pa.array(docs, pa.string())})
    ds = ray.data.from_arrow(tbl)
    if blocks > 1:
        ds = ds.repartition(blocks)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        rows = exact_substring_dedup(
            ds, L=L, num_partitions=num_partitions, broadcast_max_bytes=broadcast_max_bytes
        ).take_all()
    return {r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_dedup"]) for r in rows}


PLANTED = [
    "the quick brown fox jumps over the lazy dog today",
    "prefix words the quick brown fox jumps over the lazy dog and more",
    "totally unique content here nothing repeated at all whatsoever",
    "self repeat one two three four five six one two three four five six tail",
    "short doc",
    "",
    "   ",
]


def test_planted_duplicates_both_paths(ray_session):
    ref = brute(PLANTED, 6)
    for budget in (512 << 20, 1):  # broadcast, then forced-partitioned
        res = run(PLANTED, 6, broadcast_max_bytes=budget)
        assert all(res[i] == ref[i] for i in range(len(PLANTED))), (budget, res)
    # the shared 8-token passage and the within-doc repeat were removed
    assert ref[0][1] > 0 and ref[1][1] > 0 and ref[3][1] > 0
    # unique doc untouched, short/empty docs intact
    assert ref[2][1] == 0 and ref[4] == (2, 0, "short doc") and ref[5] == (0, 0, "")


def test_layout_invariance(ray_session):
    ref = run(PLANTED, 6, blocks=1)
    assert run(PLANTED, 6, blocks=4) == ref
    assert run(PLANTED, 6, num_partitions=2, blocks=3) == ref


@settings(max_examples=15, deadline=None)
@given(st.lists(
    st.lists(st.sampled_from(["a", "bb", "ccc", "dd", "e"]), min_size=0, max_size=12).map(" ".join),
    min_size=1, max_size=8,
))
def test_hypothesis_vs_bruteforce(ray_session, docs):
    """Tiny vocabulary forces heavy window collisions; L=3 exercises
    overlapping-span union and whole-doc removal."""
    ref = brute(docs, 3)
    res = run(docs, 3)
    assert all(res[i] == ref[i] for i in range(len(docs)))


def test_large_string_and_string_ids_both_paths(ray_session):
    """large_string text (int64 offsets) and string doc ids work on BOTH
    paths — review findings: int32 offset misread aliased tokens; the
    fallback hardcoded int64 ids."""
    import ray

    ref = brute(PLANTED, 6)
    ids = [f"doc-{i}" for i in range(len(PLANTED))]
    tbl = pa.table({"doc_id": pa.array(ids, pa.string()),
                    "text": pa.array(PLANTED, pa.large_string())})
    for budget in (512 << 20, 1):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            rows = exact_substring_dedup(
                ray.data.from_arrow(tbl), L=6, num_partitions=4, broadcast_max_bytes=budget
            ).take_all()
        res = {r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_dedup"]) for r in rows}
        assert all(res[f"doc-{i}"] == ref[i] for i in range(len(PLANTED))), budget


def test_min_count_threshold(ray_session):
    docs = ["x y z common span here", "other x y z common span here words"]
    # the 4-window "common span here" block appears twice -> removed at
    # min_count=2, kept at min_count=3
    import ray

    tbl = pa.table({"doc_id": pa.array([0, 1], pa.int64()), "text": docs})
    r2 = exact_substring_dedup(ray.data.from_arrow(tbl), L=3, min_count=2).take_all()
    r3 = exact_substring_dedup(ray.data.from_arrow(tbl), L=3, min_count=3).take_all()
    assert sum(r["n_removed"] for r in r2) > 0
    assert all(r["n_removed"] == 0 for r in r3)


def test_window_hash_segmentation():
    """Windows never cross document boundaries; hashes depend only on
    token content (position/document independent)."""
    flat, off = _tokenize_batch(pa.array(["p q r s", "p q r s", "zz p q r s zz"]))
    tk = _token_keys(flat)
    wh, wstart, woff = _batch_window_hashes(tk, off, 4)
    # docs 0 and 1: one window each, identical hash; doc 2 contains it at start+1
    assert list(np.diff(woff)) == [1, 1, 3]
    assert wh[0] == wh[1] == wh[woff[2] + 1]
    assert wstart[woff[2] + 1] == 1
    # 3 distinct window contents overall: [zz p q r], [p q r s], [q r s zz]
    assert len(set(wh.tolist())) == 3
