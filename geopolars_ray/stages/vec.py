"""Zero-copy decode of fixed-dimension embedding columns.

Every ANN / embedding-dedup stage needs the ``list<float>`` column as an
``(n, dim)`` ndarray. ``to_pylist()`` materializes one Python list + n*dim
Python floats per batch — per-row object churn on the widest column in the
pipeline. The zero-copy path is ``combine_chunks().flatten().to_numpy()``
(flatten is slice-offset-aware) + one reshape; the only copy left is the
float32→float64 cast when the storage type is ``float``, which is a
vectorized exact widening (same values ``to_pylist`` produced).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def decode_embeddings(col, dim: int | None = None) -> np.ndarray:
    """``list<float>`` / ``fixed_size_list<float>`` column → (n, dim) float64.

    Zero-copy through the Arrow buffers (no per-row Python objects); raises
    on nulls or ragged row lengths — an embedding matrix has neither, and
    silently mis-reshaping would corrupt every downstream score.
    """
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, dim or 0), dtype=np.float64)
    if arr.null_count:
        raise ValueError("embedding column contains nulls")
    if pa.types.is_fixed_size_list(arr.type):
        width = arr.type.list_size
    else:
        offs = np.asarray(arr.offsets)
        widths = np.diff(offs)
        width = int(widths[0])
        if not (widths == width).all():
            raise ValueError("ragged embedding column (row lengths differ)")
    if dim is not None and width != dim:
        raise ValueError(f"embedding width {width} != expected dim {dim}")
    flat = arr.flatten()  # offset-aware, zero-copy
    if flat.null_count:
        raise ValueError("embedding column contains null elements")
    vals = flat.to_numpy(zero_copy_only=False)
    return np.ascontiguousarray(vals.reshape(n, width).astype(np.float64, copy=False))
