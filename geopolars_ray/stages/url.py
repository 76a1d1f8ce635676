"""URL operators for web-corpus pipelines (Common-Crawl-style page tables).

Vectorized over Arrow string columns with one RE2 ``pc.extract_regex`` /
``pc.replace_substring_regex`` pass each — no per-row Python. The standard
curation uses: parse url → host → registrable domain → per-domain rollups
(crawl politeness, domain-level quality priors, domain blocking) and
URL normalization → exact dedup on the normalized key (the first dedup
stage of CCNet/C4-style pipelines, before any content hashing).

The registrable-domain step uses a built-in list of common multi-label
public suffixes instead of the full Mozilla Public Suffix List (no data
files in this container); pass ``extra_suffixes`` to extend it. Unknown
hosts fall back to the last two labels — documented approximation.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

_URL_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/?#]+)"
    r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#(?P<frag>.*))?$"
)

# common 2-level public suffixes (sample of the PSL's most frequent entries)
_TWO_LEVEL_SUFFIXES = {
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.ar", "com.tr", "co.za", "com.sg", "com.hk",
}


def url_parse(url_col: str = "url") -> Callable[[pa.Table], pa.Table]:
    """Append ``scheme``/``host``/``path``/``query`` columns (null when the
    value is not an absolute URL) — one vectorized RE2 pass."""

    def fn(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch[url_col], pa.string())
        st = pc.extract_regex(s, _URL_RE)
        for name in ("scheme", "host", "path", "query"):
            col = pc.struct_field(st, name)
            if name in ("scheme", "host"):
                col = pc.utf8_lower(col)
            batch = batch.append_column(name, col)
        return batch

    return fn


def registrable_domain(
    host_col: str = "host",
    out_col: str = "domain",
    extra_suffixes: set | None = None,
) -> Callable[[pa.Table], pa.Table]:
    """Append the registrable domain (eTLD+1-style) of each host.

    Last two labels, or three when the trailing two are a known two-level
    public suffix; IPv4 literals pass through unchanged.
    """
    suffixes = _TWO_LEVEL_SUFFIXES | (extra_suffixes or set())

    def fn(batch: pa.Table) -> pa.Table:
        import numpy as np

        h = pc.cast(batch[host_col], pa.string())
        # strip port
        h = pc.replace_substring_regex(h, r":\d+$", "")
        # last three labels in one extract; fewer-label hosts fall through
        st = pc.extract_regex(
            h, r"(?P<l3>[^.]+)\.(?P<l2>[^.]+)\.(?P<l1>[^.]+)$"
        )
        l3 = pc.struct_field(st, "l3")
        l2 = pc.struct_field(st, "l2")
        l1 = pc.struct_field(st, "l1")
        is_ip = pc.match_substring_regex(h, r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
        two = pc.binary_join_element_wise(l2, l1, ".")
        three = pc.binary_join_element_wise(l3, two, ".")
        two_np = two.to_numpy(zero_copy_only=False)
        needs3 = pa.array(np.isin(two_np, list(suffixes)))
        dom = pc.if_else(needs3, three, two)
        # hosts with <3 labels: regex had no match -> dom null -> host itself
        dom = pc.coalesce(dom, h)
        dom = pc.if_else(is_ip, h, dom)
        return batch.append_column(out_col, dom)

    return fn


def url_normalize(
    url_col: str = "url", out_col: str = "url_norm"
) -> Callable[[pa.Table], pa.Table]:
    """Canonicalize URLs for exact dedup: lowercase scheme+host, drop the
    fragment, drop default :80/:443 ports, collapse empty path to '/'.

    Composable with ``dedup.content_hash`` / ``hash_aggregate`` for the
    URL-level first-stage dedup of a crawl corpus.
    """

    def fn(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch[url_col], pa.string())
        st = pc.extract_regex(s, _URL_RE)
        scheme = pc.utf8_lower(pc.struct_field(st, "scheme"))
        host = pc.utf8_lower(pc.struct_field(st, "host"))
        # strip only the scheme's OWN default port — http://x:443 is a
        # distinct endpoint and must stay a distinct dedup key
        host = pc.if_else(
            pc.equal(scheme, "http"),
            pc.replace_substring_regex(host, r":80$", ""),
            pc.if_else(
                pc.equal(scheme, "https"),
                pc.replace_substring_regex(host, r":443$", ""),
                host,
            ),
        )
        path = pc.struct_field(st, "path")
        path = pc.if_else(pc.equal(path, ""), pa.scalar("/", pa.string()), path)
        # RE2 gives "" for both a missing and an empty query — drop both
        # (canonical form strips the bare '?')
        query = pc.coalesce(pc.struct_field(st, "query"), "")
        qpart = pc.if_else(
            pc.equal(query, ""),
            pa.scalar("", pa.string()),
            pc.binary_join_element_wise(pa.scalar("?", pa.string()), query, ""),
        )
        norm = pc.binary_join_element_wise(scheme, "://", host, path, qpart, "")
        # non-URL rows (no match): keep the original string
        norm = pc.coalesce(norm, s)
        return batch.append_column(out_col, norm)

    return fn


def domain_stats(ds, url_col: str = "url", num_partitions: int = 32, extra_cols=()):
    """Per-registrable-domain page counts — the crawl-politeness /
    domain-prior rollup. Combiner-first: the only all-to-all carries one row
    per (block, domain).

    ``extra_cols``: (col, fn, out) aggregate specs forwarded to
    ``hash_aggregate`` (e.g. ``[("n_tokens", "mean", "mean_tokens")]``).
    """
    from .agg import hash_aggregate

    def to_domain(batch: pa.Table) -> pa.Table:
        batch = url_parse(url_col)(batch)
        batch = registrable_domain()(batch)
        keep = ["domain"] + [c for c, _f, _o in extra_cols]
        return batch.select(keep)

    flat = ds.map_batches(to_domain, batch_format="pyarrow")
    spec = [("domain", "count", "n_pages")] + list(extra_cols)
    return hash_aggregate(flat, ["domain"], spec, num_partitions=num_partitions)
