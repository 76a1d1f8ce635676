"""URL operator tests (stages/url.py)."""

import numpy as np
import pyarrow as pa

from geopolars_ray.stages.url import (
    domain_stats,
    registrable_domain,
    url_normalize,
    url_parse,
)


def _t(urls):
    return pa.table({"url": urls})


def test_url_parse_fields():
    o = url_parse()(_t([
        "https://Example.org/a/b?q=1#f",
        "http://h:8080/",
        "garbage",
    ]))
    assert o["scheme"].to_pylist() == ["https", "http", None]
    assert o["host"].to_pylist() == ["example.org", "h:8080", None]
    assert o["path"].to_pylist() == ["/a/b", "/", None]
    assert o["query"].to_pylist() == ["q=1", "", None]


def test_registrable_domain_psl_heuristic():
    o = registrable_domain()(url_parse()(_t([
        "https://a.b.example.org/",
        "https://sub.news.co.uk/",
        "https://plain.com/",
        "https://10.0.0.1:443/",
        "https://host/",
    ])))
    assert o["domain"].to_pylist() == [
        "example.org", "news.co.uk", "plain.com", "10.0.0.1", "host",
    ]


def test_url_normalize_canonical_forms():
    o = url_normalize()(_t([
        "HTTPS://WWW.Site.COM:443/Path/?",
        "http://a.net:80/x?b=2#frag",
        "https://a.net/x",
        "not a url",
        "http://b.com:443/y",  # NOT http's default port -> distinct endpoint
        "https://c.com:80/z",  # NOT https's default port
    ]))
    assert o["url_norm"].to_pylist() == [
        "https://www.site.com/Path/",
        "http://a.net/x?b=2",
        "https://a.net/x",
        "not a url",
        "http://b.com:443/y",
        "https://c.com:80/z",
    ]


def test_url_normalize_is_dedup_key():
    # variants of the same resource collapse to one normalized key
    o = url_normalize()(_t([
        "https://A.com/p",
        "HTTPS://a.com:443/p",
        "https://a.com/p#section",
    ]))
    assert len(set(o["url_norm"].to_pylist())) == 1


def test_domain_stats_distributed(ray_session):
    import ray

    from geopolars_ray.sources.pages import pages_batch

    tbl = pages_batch(np.arange(4000))
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = {r["domain"]: r["n_pages"] for r in domain_stats(ds, num_partitions=4).take_all()}
    # oracle: local count of registrable domains over the same batch
    loc = registrable_domain()(url_parse()(tbl))
    import collections

    exp = collections.Counter(loc["domain"].to_pylist())
    assert out == dict(exp)
    assert sum(out.values()) == 4000
