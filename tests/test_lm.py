"""Unigram-LM scoring: exact reference equality, layout invariance,
vocabulary truncation, OOV and empty-document behavior."""

import math

import numpy as np
import pyarrow as pa
import ray

from geopolars_ray.stages.lm import score_corpus, train_unigram_lm, unigram_logprob


def _reference_scores(train_texts, score_texts, vocab_size):
    from collections import Counter

    counts = Counter()
    for t in train_texts:
        counts.update(t.split())
    total = sum(counts.values())
    vocab = dict(Counter(dict(counts)).most_common(vocab_size))
    denom = total + vocab_size + 1
    out = []
    for t in score_texts:
        toks = t.split()
        if not toks:
            out.append(0.0)
            continue
        lp = [math.log2((vocab.get(tok, 0) + 1) / denom) for tok in toks]
        out.append(sum(lp) / len(lp))
    return out


def test_unigram_lm_matches_reference(ray_session):
    rng = np.random.default_rng(8)
    words = ["the", "cat", "sat", "on", "mat", "zebra", "qx"]
    probs = np.array([0.3, 0.2, 0.15, 0.15, 0.1, 0.07, 0.03])
    texts = [" ".join(rng.choice(words, size=rng.integers(3, 40), p=probs))
             for _ in range(300)]
    texts.append("")  # empty doc
    texts.append("totally unseen oovwords here")
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    ds = ray.data.from_arrow(t).repartition(5)
    lm = train_unigram_lm(ds, vocab_size=1 << 16, num_partitions=4)
    got = {r["doc_id"]: r["lm_logprob"]
           for r in score_corpus(ray.data.from_arrow(t).repartition(3), lm).take_all()}
    want = _reference_scores(texts, texts, 1 << 16)
    for i, w in enumerate(want):
        assert abs(got[i] - w) < 1e-12, (i, got[i], w)
    # empty doc sentinel, OOV doc is the most negative real score
    assert got[len(texts) - 2] == 0.0
    real = [v for k, v in got.items() if k != len(texts) - 2]
    assert got[len(texts) - 1] == min(real)


def test_unigram_lm_layout_invariance_and_truncation(ray_session):
    rng = np.random.default_rng(3)
    # 300 distinct rare words + 5 common ones; vocab_size=8 truncates
    common = ["a", "b", "c", "d", "e"]
    rare = [f"w{i}" for i in range(300)]
    texts = [" ".join(rng.choice(common, 20)) + " " + rare[i % 300] for i in range(400)]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    lm1 = train_unigram_lm(ray.data.from_arrow(t).repartition(2), vocab_size=8)
    lm2 = train_unigram_lm(ray.data.from_arrow(t).repartition(13), vocab_size=8)
    assert lm1["total"] == lm2["total"] == 400 * 21
    assert (lm1["vocab"] == lm2["vocab"]).all()
    assert (lm1["counts"] == lm2["counts"]).all()
    assert len(lm1["vocab"]) == 8  # truncated
    s1 = sorted(r["lm_logprob"] for r in score_corpus(
        ray.data.from_arrow(t).repartition(2), lm1).take_all())
    s2 = sorted(r["lm_logprob"] for r in score_corpus(
        ray.data.from_arrow(t).repartition(9), lm2).take_all())
    assert s1 == s2


def test_unigram_lm_plain_dict_state(ray_session):
    t = pa.table({"text": pa.array(["x x x", "y"])})
    lm = train_unigram_lm(ray.data.from_arrow(t), vocab_size=4)
    fn = unigram_logprob(lm)  # dict (non-ref) path
    out = fn(t)
    assert out["lm_logprob"].to_pylist()[0] > out["lm_logprob"].to_pylist()[1]


def test_curation_lm_band(ray_session):
    from geopolars_ray.pipelines.curation import run_curation

    out = run_curation(
        "/root/testdata/sf0.001",
        quality_min=0.3,
        lm_band=(-20.0, -1.0),
        dedup=False,
    ).take_all()
    assert 0 < len(out) <= 500
    assert all(-20.0 <= r["lm_logprob"] <= -1.0 for r in out)
