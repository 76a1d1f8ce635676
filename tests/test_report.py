"""Corpus-report pipeline tests (pipelines/report.py)."""

import pyarrow.parquet as pq

from geopolars_ray.pipelines.report import corpus_report

SF = "/root/testdata/sf0.001"


def test_corpus_report_shape_and_consistency(ray_session):
    r = corpus_report(SF, quantiles=(0.5, 0.9))
    assert r["n_docs"] == pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert sum(r["docs_per_lang"].values()) == r["n_docs"]
    assert sum(r["docs_per_source"].values()) == r["n_docs"]
    assert set(r["token_quantiles"]) == {0.5, 0.9}
    assert r["token_quantiles"][0.5] <= r["token_quantiles"][0.9]
    assert 0.0 <= r["quality_quantiles"][0.5] <= 1.0
    # heavy-hitter bounds are sound and sorted
    lbs = [lb for _k, lb, ub in r["top_lang_source"]]
    assert lbs == sorted(lbs, reverse=True)
    assert all(lb <= ub for _k, lb, ub in r["top_lang_source"])


def test_corpus_report_contamination(ray_session):
    probe = pq.read_table(f"{SF}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()[0]
    r = corpus_report(SF, probe_texts=[probe])
    # the probe IS a corpus document -> at least that one doc is flagged
    assert r["contaminated_docs"] >= 1
    assert r["contamination_rate"] == r["contaminated_docs"] / r["n_docs"]
