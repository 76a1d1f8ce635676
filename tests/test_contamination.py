"""Benchmark-contamination detection tests (stages/contamination.py)."""

import numpy as np
import pyarrow as pa

from geopolars_ray.stages.contamination import (
    _ngram_hashes,
    _token_hashes,
    ngram_contamination,
    probe_ngram_set,
)


def _brute_ngrams(text, n):
    toks = text.split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _brute_hits(doc, probes, n):
    pset = set()
    for p in probes:
        pset |= _brute_ngrams(p, n)
    toks = doc.split()
    return sum(
        1 for i in range(max(len(toks) - n + 1, 0))
        if " ".join(toks[i : i + n]) in pset
    )


def test_ngram_hashes_window_counts():
    th, counts = _token_hashes(pa.array(["a b c d", "x y", ""]))
    h, nw = _ngram_hashes(th, counts, 3)
    assert list(nw) == [2, 0, 0]
    assert len(h) == 2
    # identical windows hash identically; distinct windows don't collide here
    th2, c2 = _token_hashes(pa.array(["a b c", "b c d"]))
    h2, _ = _ngram_hashes(th2, c2, 3)
    assert h2[0] == h[0] and h2[1] == h[1] and h[0] != h[1]


def test_probe_set_dedups():
    s = probe_ngram_set(["a b c d", "a b c d", "a b c e"], n=3)
    # windows: abc, bcd (x2 dedup), abc, bce -> {abc, bcd, bce}
    assert len(s) == 3
    assert np.all(np.diff(s.astype(np.uint64).view(np.uint64)) > 0)


def test_contamination_matches_brute_force(ray_session):
    import ray

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    probes = [" ".join(rng.choice(vocab, 30)) for _ in range(3)]
    docs = []
    for i in range(30):
        body = list(rng.choice(vocab, 60))
        if i % 3 == 0:  # inject a probe span
            p = probes[i % len(probes)].split()[5:25]
            body[10:10] = p
        docs.append(" ".join(body))
    n = 8
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(docs))), "text": docs})
    ).repartition(4)
    out = {r["doc_id"]: r for r in ngram_contamination(ds, probes, n=n).take_all()}
    for i, d in enumerate(docs):
        exp = _brute_hits(d, probes, n)
        got = out[i]["n_contaminated_ngrams"]
        assert got == exp, (i, got, exp)
        assert out[i]["contaminated"] == (exp >= 1)


def test_short_docs_and_empty_probe(ray_session):
    import ray

    ds = ray.data.from_arrow(pa.table({"doc_id": [0, 1], "text": ["a b", ""]}))
    out = ngram_contamination(ds, ["x y z q w e r t y u i o p"], n=13).take_all()
    assert all(r["n_contaminated_ngrams"] == 0 for r in out)
