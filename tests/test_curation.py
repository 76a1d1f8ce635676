"""End-to-end corpus-curation pipeline tests (pipelines/curation.py)."""

import pyarrow.compute as pc
import pytest

from geopolars_ray.pipelines.curation import run_curation

SF = "/root/testdata/sf0.001"


def _table(ds):
    import pyarrow as pa

    return pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow")]
    ) if ds.count() else None


def test_curation_no_dedup_quality_floor(ray_session):
    out = run_curation(SF, quality_min=0.2, dedup=False).materialize()
    t = _table(out)
    assert t.num_rows > 0
    assert pc.min(t["quality"]).as_py() >= 0.2
    # annotation columns present
    for col in ("n_tokens", "alpha_ratio", "quality", "lang_pred"):
        assert col in t.column_names


def test_curation_stratified_sampling_is_subset(ray_session):
    full = run_curation(SF, dedup=False).materialize()
    sampled = run_curation(
        SF, lang_fracs={"en": 0.5}, dedup=False
    ).materialize()
    tf, ts = _table(full), _table(sampled)
    assert 0 < ts.num_rows < tf.num_rows
    # deterministic: same call gives identical doc_id set
    again = _table(
        run_curation(SF, lang_fracs={"en": 0.5}, dedup=False).materialize()
    )
    assert sorted(ts["doc_id"].to_pylist()) == sorted(
        again["doc_id"].to_pylist()
    )


def test_curation_dedup_removes_near_dups(ray_session):
    kept = run_curation(
        SF, dedup=True, minhash_threshold=0.7, num_partitions=4
    ).materialize()
    full = run_curation(SF, dedup=False).materialize()
    tk, tf = _table(kept), _table(full)
    # dedup keeps a subset, is deterministic, and keeps at least one doc
    assert 0 < tk.num_rows <= tf.num_rows
    ids = set(tk["doc_id"].to_pylist())
    assert ids <= set(tf["doc_id"].to_pylist())
    again = run_curation(
        SF, dedup=True, minhash_threshold=0.7, num_partitions=4
    ).materialize()
    assert set(_table(again)["doc_id"].to_pylist()) == ids


def test_curation_writes_partitioned(ray_session, tmp_path):
    out_dir = str(tmp_path / "curated")
    run_curation(SF, dedup=False, out_path=out_dir)
    import ray as _ray

    back = _ray.data.read_parquet(out_dir)
    assert back.count() == run_curation(SF, dedup=False).count()


def test_curation_paragraph_mode(ray_session):
    out = run_curation(
        SF, dedup="paragraph", paragraph_sep=" a ", num_partitions=4
    ).materialize()
    t = _table(out)
    assert t.num_rows > 0
    for col in ("n_seg", "n_kept", "text_dedup"):
        assert col in t.column_names
    import pyarrow.compute as _pc

    assert _pc.min(_pc.subtract(t["n_seg"], t["n_kept"])).as_py() >= 0


def test_curation_substring_mode(ray_session):
    """dedup='substring' removes duplicated token spans from the CURATED
    corpus (quality floor applies before counting)."""
    out = run_curation(SF, dedup="substring", substring_window=8, num_partitions=4).materialize()
    t = _table(out)
    assert t.num_rows > 0
    for col in ("n_tokens", "n_removed", "text_dedup"):
        assert col in t.column_names
    import pyarrow.compute as _pc

    assert _pc.min(t["n_removed"]).as_py() >= 0
    assert _pc.sum(t["n_removed"]).as_py() > 0  # sf docs repeat 8-token spans
    # survivors are consistent: token count of text_dedup == n_tokens - n_removed
    kept = _pc.subtract(t["n_tokens"], t["n_removed"]).to_pylist()
    assert all(len(s.split()) == k for s, k in zip(t["text_dedup"].to_pylist(), kept))


def test_curation_rejects_unknown_dedup_mode(ray_session):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown dedup mode"):
        run_curation(SF, dedup="exact")


def test_lsh_candidate_pairs_min_bands(ray_session):
    """min_bands keeps only multi-band collisions: near-identical docs
    (collide in all bands) survive, single-band accidental collisions drop."""
    import numpy as np
    import pyarrow as pa
    import ray

    from geopolars_ray.stages.dedup import MinHasher, lsh_candidate_pairs

    rng = np.random.default_rng(12)
    words = [f"tok{i:03d}" for i in range(500)]
    # half-shared texts: Jaccard ~0.5 between any two docs -> per-band
    # collision probability is moderate, so single-band accidental
    # collisions exist while only true near-dups collide in many bands
    common = " ".join(rng.choice(words, 60))
    texts = [common + " " + " ".join(rng.choice(words, 60)) for _ in range(80)]
    texts += [texts[0] + " x", texts[1] + " y"]  # near-dups of docs 0/1
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    bands = ray.data.from_arrow(t).map_batches(MinHasher(), batch_format="pyarrow")
    all_pairs = lsh_candidate_pairs(bands, num_partitions=4).take_all()
    strict = lsh_candidate_pairs(bands, num_partitions=4, min_bands=4).take_all()
    assert len(strict) < len(all_pairs)
    strict_set = {(r["a"], r["b"]) for r in strict}
    assert (0, 80) in strict_set and (1, 81) in strict_set  # true near-dups survive
    assert all(r["n_bands"] >= 4 for r in strict)
