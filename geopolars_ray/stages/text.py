"""Text-analysis stages for large-scale training-data pipelines.

All stateless ``map_batches`` kernels over Arrow string columns, vectorized
through ``pyarrow.compute`` regex/counting kernels where possible; the
per-document fallbacks (language id, fingerprinting) compile their state once
per actor. These operate on the ``documents`` table
(doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"[A-Za-z0-9]+"


def token_stats(text_col: str = "text") -> Callable[[pa.Table], pa.Table]:
    """n_tokens (``[A-Za-z0-9]+`` runs) and n_chars_calc per row — vectorized.

    SQL-equivalent (DuckDB): ``length(regexp_extract_all(text, '[A-Za-z0-9]+'))``
    and ``length(text)``.
    """

    def fn(batch: pa.Table) -> pa.Table:
        s = batch[text_col]
        batch = batch.append_column("n_tokens", pc.cast(pc.count_substring_regex(s, TOKEN_RE), pa.int64()))
        batch = batch.append_column("n_chars_calc", pc.cast(pc.utf8_length(s), pa.int64()))
        return batch

    return fn


def quality_score(text_col: str = "text") -> Callable[[pa.Table], pa.Table]:
    """Heuristic quality features + a composite score per document.

    alpha_ratio / digit_ratio / space_ratio are exact character-class counts
    over the text length; ``quality`` combines them with a length prior.
    """

    def fn(batch: pa.Table) -> pa.Table:
        s = batch[text_col]
        n = pc.utf8_length(s).to_numpy(zero_copy_only=False).astype(np.float64)
        n_safe = np.maximum(n, 1.0)
        alpha = pc.count_substring_regex(s, r"[A-Za-z]").to_numpy(zero_copy_only=False) / n_safe
        digit = pc.count_substring_regex(s, r"[0-9]").to_numpy(zero_copy_only=False) / n_safe
        space = pc.count_substring_regex(s, r"\s").to_numpy(zero_copy_only=False) / n_safe
        stop = pc.count_substring_regex(
            s, r"\b(the|and|of|a|to|in|is|it|for|on)\b"
        ).to_numpy(zero_copy_only=False)
        words = np.maximum(pc.count_substring_regex(s, TOKEN_RE).to_numpy(zero_copy_only=False), 1)
        stop_ratio = stop / words
        length_prior = np.clip(n / 500.0, 0.0, 1.0)
        quality = 0.35 * alpha + 0.25 * np.clip(stop_ratio * 3.0, 0, 1) + 0.2 * length_prior + 0.2 * (
            1.0 - np.clip(digit * 4.0, 0, 1)
        )
        for name, v in (
            ("alpha_ratio", alpha),
            ("digit_ratio", digit),
            ("space_ratio", space),
            ("stop_ratio", stop_ratio),
            ("quality", quality),
        ):
            batch = batch.append_column(name, pa.array(v))
        return batch

    return fn


# GPT-2-style pretokenizer (Radford et al. 2019), RE2-compatible: the
# original's \s+(?!\S) lookahead is unsupported in RE2, so trailing
# whitespace runs count as one token each — documented simplification,
# identical in pyarrow and DuckDB (both RE2).
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_stats(text_col: str = "text", out_col: str = "n_bpe_tokens") -> Callable[[pa.Table], pa.Table]:
    """BPE-ish pretoken count per document (the unit LLM training budgets
    are written in — a closer proxy than whitespace words). One vectorized
    RE2 count; SQL-equivalent: ``len(regexp_extract_all(text, pattern))``.
    """

    def fn(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch[text_col], pa.string())
        return batch.append_column(
            out_col, pc.cast(pc.count_substring_regex(s, BPE_PRETOKEN_RE), pa.int64())
        )

    return fn


def repetition_stats(text_col: str = "text", sep: str = " ") -> Callable[[pa.Table], pa.Table]:
    """Gopher-style within-document repetition signals, fully vectorized.

    Per document: ``n_tok`` (separator-split tokens), ``n_distinct_tok``,
    ``dup_token_frac`` = (n - distinct)/n, ``top_tok_n`` (occurrences of the
    most frequent token) and ``top_bigram_n`` (most frequent adjacent token
    pair). High duplicate/top-n-gram fractions flag boilerplate and
    degenerate pages (Rae et al. 2021, Gopher §A1.1 repetition filters).

    Implementation: one ``pc.split_pattern`` over the column, dictionary-encode
    the flattened tokens to int codes, then all per-doc statistics are
    sort/`reduceat` passes over ``doc_idx * V + code`` — no Python loop.
    """

    def fn(batch: pa.Table) -> pa.Table:
        # null text -> "" (null split lists would NaN the count vector)
        s = pc.coalesce(pc.cast(batch[text_col], pa.string()), "")
        lists = pc.split_pattern(s, sep)
        flat = pc.list_flatten(lists)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        codes = pc.dictionary_encode(flat).indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_rows = len(batch)
        counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
        doc_idx = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
        vocab = int(codes.max()) + 1 if len(codes) else 1
        combined = doc_idx * vocab + codes
        combined.sort(kind="stable")
        if len(combined):
            uniq_mask = np.empty(len(combined), dtype=bool)
            uniq_mask[0] = True
            np.not_equal(combined[1:], combined[:-1], out=uniq_mask[1:])
            uniq = combined[uniq_mask]
            # run length of each (doc, token) pair
            run_starts = np.flatnonzero(uniq_mask)
            run_len = np.diff(np.append(run_starts, len(combined)))
            docs_of_uniq = uniq // vocab
            nd = np.bincount(docs_of_uniq, minlength=n_rows)
            # per-doc max run length: reduceat over runs grouped by doc
            doc_bounds = np.flatnonzero(
                np.diff(docs_of_uniq, prepend=np.int64(-1))
            )
            top = np.zeros(n_rows, dtype=np.int64)
            top[docs_of_uniq[doc_bounds]] = np.maximum.reduceat(run_len, doc_bounds)
        else:
            nd = np.zeros(n_rows, dtype=np.int64)
            top = np.zeros(n_rows, dtype=np.int64)
        # bigrams: adjacent codes within a doc (drop the seam between docs)
        top2 = np.zeros(n_rows, dtype=np.int64)
        if len(codes) > 1:
            same_doc = doc_idx[1:] == doc_idx[:-1]
            if same_doc.any():
                # densify pairs before packing with doc_idx: (doc*V + c0)*V
                # + c1 overflows int64 at ~5M docs x 1e7 vocab, so rank the
                # pair keys first (pair count <= token count, always safe)
                pair = (codes[:-1] * vocab + codes[1:])[same_doc]
                _, pair_rank = np.unique(pair, return_inverse=True)
                n_pairs = int(pair_rank.max()) + 1 if len(pair_rank) else 1
                bi = doc_idx[:-1][same_doc] * n_pairs + pair_rank
                bi.sort(kind="stable")
                bm = np.empty(len(bi), dtype=bool)
                bm[0] = True
                np.not_equal(bi[1:], bi[:-1], out=bm[1:])
                bstarts = np.flatnonzero(bm)
                blen = np.diff(np.append(bstarts, len(bi)))
                bdocs = bi[bm] // n_pairs
                bbounds = np.flatnonzero(np.diff(bdocs, prepend=np.int64(-1)))
                top2[bdocs[bbounds]] = np.maximum.reduceat(blen, bbounds)
        n_tok = counts.astype(np.int64)
        dup_frac = (n_tok - nd) / np.maximum(n_tok, 1).astype(np.float64)
        for name, v in (
            ("n_tok", pa.array(n_tok)),
            ("n_distinct_tok", pa.array(nd.astype(np.int64))),
            ("dup_token_frac", pa.array(dup_frac)),
            ("top_tok_n", pa.array(top)),
            ("top_bigram_n", pa.array(top2)),
        ):
            batch = batch.append_column(name, v)
        return batch

    return fn


# PII patterns (RE2-compatible — pyarrow and DuckDB both run RE2, so counts
# and replacements are engine-identical)
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\d{1,3}[ -]\d{3}[ -]\d{3,4}[ -]\d{3,4}\b",
}


def pii_stats(text_col: str = "text", kinds: tuple = ("email", "ipv4", "phone")) -> Callable[[pa.Table], pa.Table]:
    """Count PII matches per document (``n_<kind>`` columns), vectorized RE2."""

    def fn(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch[text_col], pa.string())
        for k in kinds:
            batch = batch.append_column(
                f"n_{k}", pc.cast(pc.count_substring_regex(s, PII_PATTERNS[k]), pa.int64())
            )
        return batch

    return fn


def redact_pii(
    text_col: str = "text",
    out_col: str = "text_redacted",
    kinds: tuple = ("email", "ipv4", "phone"),
) -> Callable[[pa.Table], pa.Table]:
    """Replace PII matches with ``<KIND>`` tokens — the standard scrub stage.

    Patterns apply in ``kinds`` order, each as one global vectorized RE2
    replacement (non-overlapping leftmost matches, same semantics as
    DuckDB's ``regexp_replace(..., 'g')``).
    """

    def fn(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch[text_col], pa.string())
        for k in kinds:
            s = pc.replace_substring_regex(s, PII_PATTERNS[k], f"<{k.upper()}>")
        return batch.append_column(out_col, s)

    return fn


# language-marker word lists (tiny n-gram-ish heuristic; deterministic)
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "that", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "est", "une", "que"],
    "es": ["el", "la", "los", "y", "es", "una", "que"],
    "pt": ["o", "a", "os", "e", "uma", "não", "que"],
    "it": ["il", "la", "e", "che", "di", "un", "per"],
}


class LangId:
    """Actor-pool language-id stage: marker-word scoring, compiled once.

    A deliberately simple, deterministic n-gram/stopword heuristic (the
    container has no fasttext); emits ``lang_pred`` and ``lang_conf``.
    """

    def __init__(self):
        import re

        self.langs = list(_LANG_MARKERS)
        self.res = [
            re.compile(r"\b(" + "|".join(map(re.escape, ws)) + r")\b", re.I)
            for ws in _LANG_MARKERS.values()
        ]
        # ASCII projection: Python re uses Unicode \b while RE2 (the SQL
        # oracle and pyarrow) uses ASCII \b — they disagree about word
        # boundaries next to accented letters. Replacing every non-ASCII
        # codepoint with a space BEFORE matching makes the marker counts
        # engine-independent (the oracle applies the same projection).
        self.ascii_re = re.compile(r"[^\x00-\x7f]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        preds = []
        confs = np.zeros(len(texts))
        for i, t in enumerate(texts):
            t = t or ""
            if not t.isascii():
                t = self.ascii_re.sub(" ", t)
            scores = np.array([len(r.findall(t)) for r in self.res], dtype=np.float64)
            total = scores.sum()
            if total == 0:
                preds.append("und")
                continue
            k = int(scores.argmax())
            preds.append(self.langs[k])
            confs[i] = scores[k] / total
        batch = batch.append_column("lang_pred", pa.array(preds, pa.string()))
        return batch.append_column("lang_conf", pa.array(confs))


class Fingerprint:
    """Winnowing document fingerprints: k-gram rolling hashes, window minima.

    Emits ``fingerprint`` (int64: min k-gram hash — a stable doc sketch) and
    ``fp_count`` (number of distinct winnowed hashes). Per-doc NumPy over the
    byte array; k-gram hashing is a vectorized polynomial roll.
    """

    def __init__(self, k: int = 8, window: int = 16):
        self.k = k
        self.window = window
        with np.errstate(over="ignore"):
            self.pow_k = np.uint64(31) ** np.uint64(k - 1)

    def _kgram_hashes(self, b: np.ndarray) -> np.ndarray:
        k = self.k
        if len(b) < k:
            return np.zeros(1, dtype=np.uint64)
        with np.errstate(over="ignore"):
            # polynomial hash of every k-gram via prefix sums in the 2^64 ring
            weights = np.uint64(31) ** np.arange(len(b), dtype=np.uint64)  # 31^i
            vals = b.astype(np.uint64) * weights
            csum = np.cumsum(vals, dtype=np.uint64)
            seg = csum[k - 1 :].copy()
            seg[1:] -= csum[: len(b) - k]
            # normalize positions: divide by 31^i == multiply by inverse; use
            # odd-base modular inverse in the 2^64 ring (31 is odd -> invertible)
            inv31 = _mod_inverse_pow2(np.uint64(31))
            inv_w = inv31 ** np.arange(len(seg), dtype=np.uint64)
            return seg * inv_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        fps = np.zeros(len(texts), dtype=np.int64)
        counts = np.zeros(len(texts), dtype=np.int64)
        w = self.window
        for i, t in enumerate(texts):
            b = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8)
            h = self._kgram_hashes(b)
            if len(h) >= w:
                # winnowing: min per sliding window (strided trick)
                mins = np.lib.stride_tricks.sliding_window_view(h, w).min(axis=1)
                sel = np.unique(mins)
            else:
                sel = np.unique(h)
            fps[i] = np.int64(sel.min().astype(np.int64)) if len(sel) else 0
            counts[i] = len(sel)
        batch = batch.append_column("fingerprint", pa.array(fps))
        return batch.append_column("fp_count", pa.array(counts))


def _mod_inverse_pow2(a: np.uint64) -> np.uint64:
    """Inverse of odd a modulo 2^64 (Newton iteration)."""
    x = a  # 3 bits correct
    with np.errstate(over="ignore"):
        for _ in range(5):
            x = x * (np.uint64(2) - a * x)
    return x


# ------------------------------------------------------------------ BM25


def corpus_stats(docs_ds, terms, text_col: str = "text"):
    """One streaming pass -> (N docs, avg token length, {term: doc freq}).

    Per-batch partials are a FIXED-SIZE vector (len(terms)+2 numbers), so
    the reduce is a driver fold of one tiny row per block — no shuffle, no
    per-term exchange. Term matching is whole-token, case-insensitive, via
    one pyarrow RE2 ``count_substring_regex`` per term over the raw column
    (vectorized across the batch; terms are the handful in the query, not
    the corpus vocabulary).
    """
    import re as _re

    terms = [t.lower() for t in terms]
    pats = [rf"(?i)\b{_re.escape(t)}\b" for t in terms]

    def partial(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch[text_col], pa.string())
        n_tok = pc.sum(pc.count_substring_regex(s, TOKEN_RE)).as_py() or 0
        row = {"n_docs": pa.array([len(batch)], pa.int64()),
               "n_tokens": pa.array([int(n_tok)], pa.int64())}
        for i, p in enumerate(pats):
            hits = pc.greater(pc.count_substring_regex(s, p), 0)
            row[f"df_{i}"] = pa.array([pc.sum(hits).as_py() or 0], pa.int64())
        return pa.table(row)

    acc = None
    for b in docs_ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=4096
    ):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        import pyarrow.compute as _pc
        sums = {c: _pc.sum(t[c]).as_py() or 0 for c in t.schema.names}
        acc = sums if acc is None else {c: acc[c] + sums[c] for c in sums}
    n_docs = acc["n_docs"] if acc else 0
    avgdl = (acc["n_tokens"] / n_docs) if n_docs else 0.0
    df = {terms[i]: acc[f"df_{i}"] for i in range(len(terms))} if acc else {}
    return n_docs, avgdl, df


def bm25_score(docs_ds, terms, text_col: str = "text", out_col: str = "bm25",
               k1: float = 1.2, b: float = 0.75, stats=None):
    """Append a BM25 relevance score for ``terms`` to every doc — the
    standard retrieval/quality-filter primitive (Robertson & Zaragoza 2009).

    Two streaming passes over ``docs_ds``: a corpus-stats fold (N, avgdl,
    per-term document frequency → tiny dict broadcast in the task closure),
    then the scoring map (per-term tf via one vectorized RE2 count per
    term). idf = ln(1 + (N-df+0.5)/(df+0.5)), never negative. Pass
    precomputed ``stats=(n_docs, avgdl, df)`` to skip pass 1 (e.g. scoring
    many query sets over one corpus).
    """
    import re as _re

    terms = [t.lower() for t in terms]
    n_docs, avgdl, df = stats if stats is not None else corpus_stats(
        docs_ds, terms, text_col)
    idf = {
        t: float(np.log(1.0 + (n_docs - df.get(t, 0) + 0.5) / (df.get(t, 0) + 0.5)))
        for t in terms
    }
    pats = [(rf"(?i)\b{_re.escape(t)}\b", idf[t]) for t in terms]
    avgdl = float(avgdl) or 1.0

    def score(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch[text_col], pa.string())
        dl = pc.count_substring_regex(s, TOKEN_RE).to_numpy(zero_copy_only=False).astype(np.float64)
        norm = k1 * (1.0 - b + b * dl / avgdl)
        total = np.zeros(len(batch), dtype=np.float64)
        for p, w in pats:
            tf = pc.count_substring_regex(s, p).to_numpy(zero_copy_only=False).astype(np.float64)
            total += w * (tf * (k1 + 1.0)) / np.maximum(tf + norm, 1e-300)
        return batch.append_column(out_col, pa.array(total))

    return docs_ds.map_batches(score, batch_format="pyarrow")


def json_extract(
    col: str, path: str, out_col: str, dtype: pa.DataType | None = None
) -> Callable[[pa.Table], pa.Table]:
    """Vectorized JSON-path extraction from a string column (the engine's
    scalar-JSON surface, e.g. ``events.props``). Runs polars'
    ``str.json_path_match`` (Rust, whole-column); result is a string column
    unless ``dtype`` is given (then cast, invalid -> null).

    ``path`` is a JSONPath like ``"$.k"`` / ``"$.a.b[0]"`` — the same
    dialect as DuckDB's ``json_extract_string``.
    """
    import polars as pl

    def fn(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch.select([col]))[col]
        out = s.str.json_path_match(path).to_arrow()
        if dtype is not None:
            out = pc.cast(out, pa.string())
            out = pc.cast(out, dtype, safe=False)
        return batch.append_column(out_col, out)

    return fn
