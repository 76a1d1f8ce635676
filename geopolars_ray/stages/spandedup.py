"""Exact-substring span dedup: remove duplicated token windows corpus-wide.

The training-data op from Lee et al. 2022 ("Deduplicating Training Data
Makes Language Models Better"): any token span of length >= L that occurs
>= ``min_count`` times anywhere in the corpus — across documents or within
one — is removed from EVERY occurrence. The published implementation
builds a corpus-wide suffix array on one large machine; this engine
re-expresses the op Ray-Data-first over fixed-length token windows:

1. every L-token window is ring-hashed (one vectorized pass per batch),
2. a combiner-first ``hash_aggregate`` counts window hashes corpus-wide
   (the only all-to-all, over per-batch-compressed (hash, count) partials),
3. duplicated hashes mark their covered token positions; removal and text
   reassembly are one more streaming pass over the documents.

Fixed-length windowing detects every duplicated span of length >= L
exactly — a duplicated span of m >= L tokens contains m-L+1 duplicated
windows whose union covers all m tokens — while spans shorter than L are
deliberately kept (the Lee et al. threshold semantics).

SQL-replayability (the repo's oracle discipline): tokenization is RE2
``\\s+`` (``pyarrow.compute.split_pattern_regex`` == DuckDB
``regexp_split_to_array``), the token key is an EXACT < 2^63 integer
(base-31 polynomial of the first 8 bytes, chr(1)-padded, * 131 + byte
length), and the window hash is a base-31 polynomial of token keys in the
2^64 ring — HUGEINT ``% 18446744073709551616`` in SQL. Token keys collide
only for tokens sharing their first 8 bytes AND length; such collisions
are DETERMINISTIC and identical on both sides, so oracle exactness holds
by construction (byte-vs-char length parity requires ASCII-projected
text, as with the minhash oracle).
"""

from __future__ import annotations

import warnings

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .agg import hash_aggregate
from .text import _mod_inverse_pow2

_P = np.uint64(31)
_KEY_SCALE = np.uint64(131)
_PAD_BYTE = np.uint64(1)


def _tokenize_batch(texts) -> tuple[pa.StringArray, np.ndarray]:
    """RE2 \\s+ split with empty tokens dropped.

    Returns (flat kept tokens, int64 doc offsets into them). Null texts
    tokenize to zero tokens.
    """
    col = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    col = pc.fill_null(col, "")
    lst = pc.split_pattern_regex(col, pattern=r"\s+")
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    flat = lst.flatten()  # slice-offset-aware
    n_per_doc = np.diff(lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64))
    byte_lens = pc.binary_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    keep = byte_lens > 0
    ndocs = len(n_per_doc)
    doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), n_per_doc)
    kept_counts = np.bincount(doc_idx[keep], minlength=ndocs).astype(np.int64)
    doc_off = np.concatenate([[0], np.cumsum(kept_counts)]).astype(np.int64)
    flat_kept = flat.filter(pa.array(keep)) if not keep.all() else flat
    return flat_kept, doc_off


def _token_keys(flat: pa.StringArray) -> np.ndarray:
    """Exact < 2^63 integer key per token: first-8-bytes poly31 * 131 + len.

    Vectorized over the string array's raw buffers — no per-token Python.
    """
    n = len(flat)
    if n == 0:
        return np.empty(0, np.uint64)
    bufs = flat.buffers()
    # large_string carries int64 offsets (review: reading them as int32
    # silently aliased distinct tokens)
    owidth = np.int64 if pa.types.is_large_string(flat.type) else np.int32
    off = np.frombuffer(bufs[1], dtype=owidth)[flat.offset : flat.offset + n + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    starts, ends = off[:-1], off[1:]
    lens = ends - starts
    acc = np.zeros(n, np.uint64)
    with np.errstate(over="ignore"):
        for i in range(8):
            idx = starts + i
            valid = i < lens
            b = np.where(
                valid,
                data[np.minimum(idx, max(len(data) - 1, 0))] if len(data) else 0,
                _PAD_BYTE,
            ).astype(np.uint64)
            acc = acc * _P + b
        return acc * _KEY_SCALE + lens.astype(np.uint64)


def _batch_window_hashes(tk: np.ndarray, doc_off: np.ndarray, L: int):
    """Window hashes for every valid L-token window, segmented per doc.

    Returns (wh uint64 flat, wstart int64 flat position-in-doc of each
    window start, wdoc_off int64 offsets per doc into both). One vectorized
    pass via ring prefix sums — weights are 31^(position IN DOC), so the
    prefix-difference stays within one document whenever the window does.
    """
    n = len(tk)
    ndocs = len(doc_off) - 1
    doc_lens = np.diff(doc_off)
    pos_in_doc = np.arange(n, dtype=np.int64) - np.repeat(doc_off[:-1], doc_lens)
    wcounts = np.maximum(doc_lens - L + 1, 0)
    wdoc_off = np.concatenate([[0], np.cumsum(wcounts)]).astype(np.int64)
    total = int(wdoc_off[-1])
    if total == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64), wdoc_off
    with np.errstate(over="ignore"):
        max_len = int(doc_lens.max()) if ndocs else 0
        pow31 = np.ones(max_len + 1, np.uint64)
        if max_len:
            np.cumprod(np.full(max_len, _P, np.uint64), out=pow31[1:])
        inv31 = _mod_inverse_pow2(_P)
        ipow31 = np.ones(max_len + 1, np.uint64)
        if max_len:
            np.cumprod(np.full(max_len, inv31, np.uint64), out=ipow31[1:])
        vals = tk * pow31[pos_in_doc]
        c0 = np.concatenate([np.zeros(1, np.uint64), np.cumsum(vals, dtype=np.uint64)])
        # flat indices of every valid window start
        start_flat = np.repeat(doc_off[:-1], wcounts) + (
            np.arange(total, dtype=np.int64) - np.repeat(wdoc_off[:-1], wcounts)
        )
        wstart = start_flat - np.repeat(doc_off[:-1], wcounts)
        seg = c0[start_flat + L] - c0[start_flat]
        wh = seg * ipow31[wstart]
    return wh, wstart, wdoc_off


def window_hash_counts(docs_ds, L: int = 50, text_col: str = "text", num_partitions: int = 32):
    """Corpus-wide (window hash, count) totals — combiner-first.

    Per-batch partials are np.unique-compressed before the one shuffle, so
    the exchange carries distinct hashes per batch, not one row per window.
    """

    def partial(batch: pa.Table) -> pa.Table:
        flat, doc_off = _tokenize_batch(batch[text_col])
        tk = _token_keys(flat)
        wh, _, _ = _batch_window_hashes(tk, doc_off, L)
        uniq, counts = np.unique(wh, return_counts=True)
        return pa.table(
            {"wh": pa.array(uniq.view(np.int64)), "cnt": pa.array(counts.astype(np.int64))}
        )

    parts = docs_ds.map_batches(partial, batch_format="pyarrow")
    return hash_aggregate(parts, ["wh"], [("cnt", "sum", "cnt")], num_partitions=num_partitions)


def _covered_mask(wh: np.ndarray, wstart: np.ndarray, wdoc_off: np.ndarray,
                  doc_off: np.ndarray, L: int, dup_sorted: np.ndarray) -> np.ndarray:
    """Boolean mask over flat tokens: covered by any duplicated window."""
    n = int(doc_off[-1])
    is_dup = np.zeros(len(wh), bool)
    if len(dup_sorted) and len(wh):
        pos = np.searchsorted(dup_sorted, wh)
        pos_c = np.minimum(pos, len(dup_sorted) - 1)
        is_dup = dup_sorted[pos_c] == wh
    # difference array over flat token positions: +1 at dup start, -1 past end
    diff = np.zeros(n + 1, np.int64)
    wcounts = np.diff(wdoc_off)
    start_flat = np.repeat(doc_off[:-1], wcounts) + wstart
    dup_starts = start_flat[is_dup]
    if len(dup_starts):
        np.add.at(diff, dup_starts, 1)
        np.add.at(diff, dup_starts + L, -1)  # window stays in-doc by construction
    return np.cumsum(diff[:n]) > 0


def _reassemble(batch: pa.Table, id_col: str, flat: pa.StringArray, doc_off: np.ndarray,
                covered: np.ndarray) -> pa.Table:
    """Drop covered tokens, rejoin per doc with single spaces (vectorized)."""
    doc_lens = np.diff(doc_off)
    ndocs = len(doc_lens)
    doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), doc_lens)
    keep = ~covered
    kept_counts = np.bincount(doc_idx[keep], minlength=ndocs).astype(np.int64)
    kept_off = np.concatenate([[0], np.cumsum(kept_counts)]).astype(np.int32)
    kept_flat = flat.filter(pa.array(keep)) if not keep.all() else flat
    if pa.types.is_large_string(kept_flat.type):
        # binary_join has no list<large_string> kernel; a batch's token
        # bytes are block-size-bounded, and the cast raises loudly on the
        # >2 GiB case rather than corrupting
        kept_flat = kept_flat.cast(pa.string())
    lst = pa.ListArray.from_arrays(pa.array(kept_off, pa.int32()), kept_flat)
    joined = pc.binary_join(lst, " ")  # empty list -> ''
    n_removed = (doc_lens - kept_counts).astype(np.int64)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": pa.array(doc_lens),
            "n_removed": pa.array(n_removed),
            "text_dedup": joined,
        }
    )


def exact_substring_dedup(
    docs_ds,
    L: int = 50,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 32,
    broadcast_max_bytes: int = 512 * 1024 * 1024,
):
    """Remove every >= min_count-duplicated L-token window from all docs.

    Returns a Dataset of (id_col, n_tokens, n_removed, text_dedup).

    Scale shape: the duplicated-hash set is streamed to the driver under
    EXACT byte accounting (8 bytes/hash); if it exceeds
    ``broadcast_max_bytes`` the op bails to a fully partitioned path —
    window expansion semi-joined against the duplicate hashes, covered
    starts re-joined to documents — so driver memory is strictly bounded
    at any corpus size (same contract as ``jaccard_verify``).
    """
    import ray as _ray

    from .hashjoin import hash_join

    totals = window_hash_counts(docs_ds, L=L, text_col=text_col, num_partitions=num_partitions)
    thr = int(min_count)
    dups_ds = totals.map_batches(
        lambda t: t.filter(pc.greater_equal(t["cnt"], thr)).select(["wh"]),
        batch_format="pyarrow",
    )

    dup_parts: list[np.ndarray] = []
    total_bytes = 0
    fits = True
    for b in dups_ds.iter_batches(batch_format="pyarrow"):
        dup_parts.append(b["wh"].to_numpy(zero_copy_only=False).astype(np.int64))
        total_bytes += 8 * len(dup_parts[-1])
        if total_bytes > broadcast_max_bytes:
            fits = False
            break

    if fits:
        dup_sorted = np.sort(
            np.concatenate(dup_parts).view(np.uint64) if dup_parts else np.empty(0, np.uint64)
        )
        ref = _ray.put(dup_sorted)

        def remove(batch: pa.Table) -> pa.Table:
            dup = _ray.get(ref)  # zero-copy numpy view
            flat, doc_off = _tokenize_batch(batch[text_col])
            tk = _token_keys(flat)
            wh, wstart, wdoc_off = _batch_window_hashes(tk, doc_off, L)
            covered = _covered_mask(wh, wstart, wdoc_off, doc_off, L, dup)
            return _reassemble(batch, id_col, flat, doc_off, covered)

        return docs_ds.map_batches(remove, batch_format="pyarrow")

    # ---- partitioned path: duplicate set too large to broadcast ----
    warnings.warn(
        f"exact_substring_dedup: duplicated-window set exceeds "
        f"{broadcast_max_bytes} bytes — using the partitioned semi-join path",
        stacklevel=2,
    )

    def expand(batch: pa.Table) -> pa.Table:
        flat, doc_off = _tokenize_batch(batch[text_col])
        tk = _token_keys(flat)
        wh, wstart, wdoc_off = _batch_window_hashes(tk, doc_off, L)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        doc_ids = np.repeat(ids, np.diff(wdoc_off))
        return pa.table(
            {id_col: pa.array(doc_ids), "wstart": pa.array(wstart), "wh": pa.array(wh.view(np.int64))}
        )

    expansion = docs_ds.map_batches(expand, batch_format="pyarrow")
    sch = docs_ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]
    exp_schema = pa.schema([(id_col, id_type), ("wstart", pa.int64()), ("wh", pa.int64())])
    covered_starts = hash_join(
        expansion,
        dups_ds,
        on=["wh"],
        how="left_semi",
        num_partitions=num_partitions,
        left_schema=exp_schema,
        right_schema=pa.schema([("wh", pa.int64())]),
    ).select_columns([id_col, "wstart"])

    def to_lists(part: pa.Table) -> pa.Table:
        if len(part) == 0:
            return pa.table(
                {id_col: pa.array([], id_type), "dup_starts": pa.array([], pa.large_binary())}
            )
        ids = part[id_col].to_numpy(zero_copy_only=False)
        st = part["wstart"].to_numpy(zero_copy_only=False)
        # group by id only — the difference-array removal is start-order-
        # invariant, and argsort (unlike lexsort / xor sentinels) works for
        # string ids too (review: the fallback must accept every id type
        # the broadcast path accepts)
        order = np.argsort(ids, kind="stable")
        ids_s, st_s = ids[order], st[order]
        bnd = np.ones(len(ids_s), bool)
        if len(ids_s) > 1:
            bnd[1:] = ids_s[1:] != ids_s[:-1]
        bounds = np.flatnonzero(bnd)
        counts = np.diff(np.concatenate([bounds, [len(ids_s)]]))
        # packed int64 bytes, not list<int64>: Acero joins reject list
        # payload columns; large_binary so the int64 byte offsets cannot
        # wrap however many starts one partition holds
        off = (8 * np.concatenate([[0], np.cumsum(counts)])).astype(np.int64)
        packed = pa.Array.from_buffers(
            pa.large_binary(), len(counts),
            [None, pa.py_buffer(off.tobytes()), pa.py_buffer(st_s.astype(np.int64).tobytes())],
        )
        return pa.table({id_col: pa.array(ids_s[bounds]), "dup_starts": packed})

    from .agg import hash_partitioned_map

    starts_tbl = hash_partitioned_map(covered_starts, [id_col], to_lists, num_partitions=num_partitions)
    joined = hash_join(
        docs_ds,
        starts_tbl,
        on=[id_col],
        how="left",
        num_partitions=num_partitions,
    )

    def remove_joined(batch: pa.Table) -> pa.Table:
        flat, doc_off = _tokenize_batch(batch[text_col])
        n = int(doc_off[-1])
        diff = np.zeros(n + 1, np.int64)
        ds_col = batch["dup_starts"].combine_chunks() if isinstance(batch["dup_starts"], pa.ChunkedArray) else batch["dup_starts"]
        for i in range(len(batch)):
            v = ds_col[i]
            if not v.is_valid:
                continue
            starts = np.frombuffer(v.as_py(), dtype=np.int64) + doc_off[i]
            np.add.at(diff, starts, 1)
            np.add.at(diff, starts + L, -1)
        covered = np.cumsum(diff[:n]) > 0
        return _reassemble(batch, id_col, flat, doc_off, covered)

    return joined.map_batches(remove_joined, batch_format="pyarrow")
