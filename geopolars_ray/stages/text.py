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
