"""Round-4 scale fixes: zero-copy embedding decode + hot-bucket guard.

- `decode_embeddings` must be exact vs the old to_pylist path, handle
  chunked/sliced/fixed-size-list layouts, and reject ragged/null input.
- `cosine_pairs_within_bucket` must never materialize a dense n×n matrix
  (strip-chunked — verified by equality with a dense reference) and must
  truncate hot buckets deterministically with a loud warning.
"""

import logging

import numpy as np
import pyarrow as pa
import pytest

from geopolars_ray.stages.dedup import cosine_pairs_within_bucket
from geopolars_ray.stages.vec import decode_embeddings


def _rand_emb(n, d, seed=0):
    return np.random.default_rng(seed).standard_normal((n, d))


def test_decode_embeddings_matches_pylist_all_layouts():
    emb = _rand_emb(50, 8).astype(np.float32)
    # list<float32>, chunked
    arr = pa.chunked_array([
        pa.array(emb[:20].tolist(), pa.list_(pa.float32())),
        pa.array(emb[20:].tolist(), pa.list_(pa.float32())),
    ])
    want = np.asarray(arr.to_pylist(), dtype=np.float64)
    np.testing.assert_array_equal(decode_embeddings(arr), want)
    # sliced list array (offset-aware flatten)
    flat = pa.array(emb.tolist(), pa.list_(pa.float32()))
    sl = flat.slice(10, 25)
    np.testing.assert_array_equal(
        decode_embeddings(sl), np.asarray(sl.to_pylist(), dtype=np.float64)
    )
    # fixed_size_list<float64>
    fsl = pa.FixedSizeListArray.from_arrays(
        pa.array(emb.astype(np.float64).reshape(-1)), 8
    )
    np.testing.assert_array_equal(
        decode_embeddings(fsl), emb.astype(np.float64)
    )
    # empty
    assert decode_embeddings(pa.array([], pa.list_(pa.float32())), dim=8).shape == (0, 8)


def test_decode_embeddings_rejects_bad_input():
    with pytest.raises(ValueError, match="ragged"):
        decode_embeddings(pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float64())))
    with pytest.raises(ValueError, match="null"):
        decode_embeddings(pa.array([[1.0, 2.0], None], pa.list_(pa.float64())))
    with pytest.raises(ValueError, match="dim"):
        decode_embeddings(pa.array([[1.0, 2.0]], pa.list_(pa.float64())), dim=3)


def _dense_reference(ids, emb, threshold, quantize):
    if quantize is not None:
        q = np.floor(emb * quantize)
        d = q @ q.T
        n = np.sqrt(np.diag(d))
    else:
        d = emb @ emb.T
        n = np.linalg.norm(emb, axis=1)
    n = np.where(n == 0, 1.0, n)
    sim = d / (n[:, None] * n[None, :])
    ii, jj = np.triu_indices(len(ids), k=1)
    keep = sim[ii, jj] >= threshold
    a = np.minimum(ids[ii[keep]], ids[jj[keep]])
    b = np.maximum(ids[ii[keep]], ids[jj[keep]])
    return sorted(zip(a.tolist(), b.tolist(), sim[ii, jj][keep].tolist()))


@pytest.mark.parametrize("quantize", [None, 1024])
def test_strip_chunked_pairs_equal_dense(quantize):
    rng = np.random.default_rng(3)
    n, d = 700, 6  # n > strip(256) -> multiple strips
    emb = rng.standard_normal((n, d))
    # plant near-duplicate clusters so pairs actually exist
    emb[100:104] = emb[100] + rng.standard_normal((4, d)) * 1e-3
    emb[400:410] = emb[400] + rng.standard_normal((10, d)) * 1e-3
    ids = rng.permutation(n).astype(np.int64)
    group = pa.table({"vec_id": ids, "embedding": pa.array(emb.tolist(), pa.list_(pa.float64()))})
    fn = cosine_pairs_within_bucket(threshold=0.98, quantize=quantize, strip=256)
    out = fn(group)
    got = sorted(zip(out["a"].to_pylist(), out["b"].to_pylist(), out["cosine"].to_pylist()))
    want = _dense_reference(ids, emb, 0.98, quantize)
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want]
    np.testing.assert_allclose([c for *_, c in got], [c for *_, c in want], rtol=1e-12, atol=1e-12)
    if quantize is not None:  # quantized scores are bit-exact by design
        assert [c for *_, c in got] == [c for *_, c in want]


def test_hot_bucket_truncation_is_loud_and_deterministic(caplog):
    rng = np.random.default_rng(5)
    n, d = 120, 4
    emb = rng.standard_normal((n, d))
    ids = rng.permutation(n).astype(np.int64)
    group = pa.table({"vec_id": ids, "embedding": pa.array(emb.tolist(), pa.list_(pa.float64()))})
    fn = cosine_pairs_within_bucket(threshold=-1.1, max_bucket=30, strip=16)
    with caplog.at_level(logging.WARNING, logger="geopolars_ray.dedup"):
        out = fn(group)
    assert any("truncated to max_bucket=30" in r.message for r in caplog.records)
    # all pairs among exactly the 30 LOWEST ids (order-independent truncation)
    kept_ids = set(np.sort(ids)[:30].tolist())
    assert out.num_rows == 30 * 29 // 2
    assert set(out["a"].to_pylist()) | set(out["b"].to_pylist()) <= kept_ids
    # row-order invariance: shuffled input -> identical pair set
    perm = rng.permutation(n)
    group2 = pa.table({"vec_id": ids[perm], "embedding": pa.array(emb[perm].tolist(), pa.list_(pa.float64()))})
    out2 = fn(group2)
    assert sorted(zip(out["a"].to_pylist(), out["b"].to_pylist())) == sorted(
        zip(out2["a"].to_pylist(), out2["b"].to_pylist())
    )
