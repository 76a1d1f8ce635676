"""BM25 scoring tests vs a local reference implementation."""

import math
import re

import numpy as np
import pyarrow as pa
import ray

from geopolars_ray.stages.text import bm25_score, corpus_stats

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "a fast brown fox and a quick red fox",
    "slow green turtle walks under the log",
    "fox fox fox fox",
    "data processing engines process data at scale with ray data",
]


def _ref_bm25(docs, terms, k1=1.2, b=0.75):
    toks = [re.findall(r"[A-Za-z0-9]+", d.lower()) for d in docs]
    n = len(docs)
    avgdl = sum(len(t) for t in toks) / n
    scores = []
    for t in toks:
        s = 0.0
        for term in terms:
            dfr = sum(1 for tt in toks if term in tt)
            idf = math.log(1.0 + (n - dfr + 0.5) / (dfr + 0.5))
            tf = t.count(term)
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(t) / avgdl))
        scores.append(s)
    return scores


def test_corpus_stats(ray_session):
    ds = ray.data.from_arrow(pa.table({"text": pa.array(DOCS)})).repartition(3)
    n, avgdl, df = corpus_stats(ds, ["fox", "data", "missing"])
    assert n == 5
    assert df == {"fox": 3, "data": 1, "missing": 0}
    assert avgdl == sum(len(re.findall(r"[A-Za-z0-9]+", d)) for d in DOCS) / 5


def test_bm25_matches_reference(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(DOCS)), pa.int64()),
        "text": pa.array(DOCS),
    })).repartition(2)
    out = bm25_score(ds, ["quick", "fox"]).take_all()
    got = {r["doc_id"]: r["bm25"] for r in out}
    want = _ref_bm25(DOCS, ["quick", "fox"])
    for i, w in enumerate(want):
        assert abs(got[i] - w) < 1e-12, (i, got[i], w)
    # ranking sanity: the fox-spam doc and the two fox docs outrank the turtle
    assert got[3] > got[2] and got[1] > got[2] and got[0] > got[2]


def test_bm25_precomputed_stats_and_case(ray_session):
    docs = ["Fox FOX fox", "nothing here"]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(docs)}))
    stats = corpus_stats(ds, ["fox"])
    out = bm25_score(ds, ["FOX"], stats=stats).take_all()
    assert out[0]["bm25"] > 0 and out[1]["bm25"] == 0.0
