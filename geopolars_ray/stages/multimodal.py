"""Multimodal (image/audio/video) stage plumbing over opaque binary columns.

The container ships no image/audio codecs, so the DECODE step is stubbed
(per the build contract): :class:`DecodeImage` raises ``NotImplementedError``
in ``codec='real'`` mode, and ships a deterministic fake codec (a tiny
self-describing header format) so the Ray-side plumbing — schema, actor
signature, batch sizing, output layout — is real and tested end-to-end.

Media stages follow the actor-pool pattern: heavy codec/model init once per
actor, small ``batch_size`` because rows are megabytes wide (the same
wide-row guidance as the html stage, SURVEY.md §7 "hard" #4).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

FAKE_MAGIC = b"FIMG"


def encode_fake_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic fake image bytes: header + seeded uint8 payload."""
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 256, size=width * height * 3, dtype=np.uint8)
    return FAKE_MAGIC + struct.pack("<II", width, height) + payload.tobytes()


# Knuth/Fibonacci multiplicative-hash constants; chosen because the byte
# stream they generate is replayable EXACTLY in integer SQL, unlike
# encode_fake_image's PCG64. LCG_A is the same 2^32/phi constant as
# stages/sample.py KNUTH — imported so the two sites cannot drift (the SQL
# oracles in pipelines/queries.py necessarily inline the literal).
from geopolars_ray.stages.sample import KNUTH as LCG_A

LCG_B = 2246822519


def encode_lcg_image(width: int, height: int, seed: int) -> bytes:
    """FIMG bytes whose payload byte j is ``((seed*A + j*B) % 2**32) % 256``.

    Same header format as :func:`encode_fake_image` — decodes through the
    same :class:`DecodeImage`/:class:`ResizeImage` stages — but the payload
    is an integer-hash sequence a SQL oracle can recompute bit-for-bit
    (all intermediates < 2**63 for seed < ~3e9), which is what makes the
    ``mm_decode``/``mm_resize_frames`` gate queries oracle-checkable."""
    n = width * height * 3
    j = np.arange(n, dtype=np.int64)
    v = ((seed * LCG_A + j * LCG_B) % (1 << 32)) % 256
    return FAKE_MAGIC + struct.pack("<II", width, height) + v.astype(np.uint8).tobytes()


class DecodeImage:
    """Actor-pool image decode: binary column -> (width, height, mean_rgb).

    ``codec='fake'`` parses the deterministic FIMG format; ``codec='real'``
    is the integration point for PIL/libjpeg etc. and raises
    ``NotImplementedError`` here (no codecs in this container).
    """

    def __init__(self, codec: str = "fake", data_col: str = "image"):
        if codec not in ("fake", "real"):
            raise ValueError(f"unknown codec {codec!r}")
        if codec == "real":
            raise NotImplementedError(
                "real image codecs are not available in this environment; "
                "use codec='fake' (deterministic stub) — plumbing is identical"
            )
        self.codec = codec
        self.data_col = data_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.data_col].to_pylist()
        w = np.zeros(len(blobs), dtype=np.int64)
        h = np.zeros(len(blobs), dtype=np.int64)
        mean = np.full(len(blobs), np.nan)
        for i, b in enumerate(blobs):
            if b is None or not b.startswith(FAKE_MAGIC):
                continue
            w[i], h[i] = struct.unpack_from("<II", b, 4)
            px = np.frombuffer(b, dtype=np.uint8, offset=12)
            mean[i] = float(px.mean()) if len(px) else np.nan
        out = batch.drop_columns([self.data_col])
        out = out.append_column("width", pa.array(w))
        out = out.append_column("height", pa.array(h))
        return out.append_column("mean_rgb", pa.array(mean))


FAKE_AUDIO_MAGIC = b"FAUD"


def encode_fake_audio(n_samples: int, sample_rate: int, seed: int) -> bytes:
    """Deterministic fake audio: header + seeded int16 PCM payload."""
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32767, size=n_samples, dtype=np.int16)
    return FAKE_AUDIO_MAGIC + struct.pack("<II", n_samples, sample_rate) + pcm.tobytes()


class DecodeAudio:
    """Actor-pool audio decode: binary -> (duration_s, sample_rate, rms).

    ``codec='fake'`` parses the FAUD stub; ``codec='real'`` is the
    libsndfile/ffmpeg integration point and raises ``NotImplementedError``
    here (no audio codecs in this container) — plumbing identical.
    """

    def __init__(self, codec: str = "fake", data_col: str = "audio"):
        if codec not in ("fake", "real"):
            raise ValueError(f"unknown codec {codec!r}")
        if codec == "real":
            raise NotImplementedError(
                "real audio codecs are not available in this environment; use codec='fake'"
            )
        self.data_col = data_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.data_col].to_pylist()
        dur = np.full(len(blobs), np.nan)
        sr = np.zeros(len(blobs), dtype=np.int64)
        rms = np.full(len(blobs), np.nan)
        for i, b in enumerate(blobs):
            if b is None or not b.startswith(FAKE_AUDIO_MAGIC):
                continue
            n, rate = struct.unpack_from("<II", b, 4)
            pcm = np.frombuffer(b, dtype=np.int16, offset=12, count=n)
            sr[i] = rate
            dur[i] = n / rate if rate else np.nan
            rms[i] = float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2))) if n else np.nan
        out = batch.drop_columns([self.data_col])
        out = out.append_column("duration_s", pa.array(dur))
        out = out.append_column("sample_rate", pa.array(sr))
        return out.append_column("rms", pa.array(rms))


class ResizeImage:
    """Fake-codec resize: nearest-neighbor downsample of the FIMG payload.

    Demonstrates binary-in/binary-out media transforms with stable schema.
    """

    def __init__(self, out_w: int, out_h: int, data_col: str = "image"):
        self.out_w = out_w
        self.out_h = out_h
        self.data_col = data_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.data_col].to_pylist()
        out = []
        for b in blobs:
            if b is None or not b.startswith(FAKE_MAGIC):
                out.append(None)
                continue
            w, h = struct.unpack_from("<II", b, 4)
            px = np.frombuffer(b, dtype=np.uint8, offset=12).reshape(h, w, 3)
            yi = (np.arange(self.out_h) * h // self.out_h)
            xi = (np.arange(self.out_w) * w // self.out_w)
            small = px[yi][:, xi]
            out.append(FAKE_MAGIC + struct.pack("<II", self.out_w, self.out_h) + small.tobytes())
        idx = batch.column_names.index(self.data_col)
        return batch.set_column(idx, self.data_col, pa.array(out, pa.binary()))


class ImageFeatures:
    """Actor-pool feature extraction: image binary -> fixed-dim embedding.

    The bridge from the multimodal columns to the similarity stack: the
    emitted ``list<float>`` column feeds :mod:`geopolars_ray.stages.ann`
    (brute-force / IVF / LSH top-k) and ``semantic_dedup`` unchanged.

    ``codec='fake'`` extracts a ``grid x grid`` mean-pooled grayscale patch
    vector, L2-normalized — deterministic, resolution-invariant for
    same-content images (the property near-dup detection needs).
    ``codec='real'`` is the CLIP/torchvision integration point (batched
    model inference in ``__call__``, model load once per actor in
    ``__init__``) and raises ``NotImplementedError`` here — no model
    runtimes in this container; the Ray-side plumbing is identical.
    """

    def __init__(self, grid: int = 8, codec: str = "fake", data_col: str = "image",
                 out_col: str = "embedding"):
        if codec not in ("fake", "real"):
            raise ValueError(f"unknown codec {codec!r}")
        if codec == "real":
            raise NotImplementedError(
                "no image-model runtime in this environment; use codec='fake' "
                "(deterministic pooled-patch features) — plumbing is identical"
            )
        self.grid = int(grid)
        self.data_col = data_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        g = self.grid
        blobs = batch[self.data_col].to_pylist()
        feats: list = []
        for b in blobs:
            if b is None or not b.startswith(FAKE_MAGIC):
                feats.append(None)
                continue
            w, h = struct.unpack_from("<II", b, 4)
            px = np.frombuffer(b, dtype=np.uint8, offset=12).reshape(h, w, 3)
            gray = px.mean(axis=2)
            # mean-pool into a g x g grid (integer bin edges — deterministic).
            # One bincount pass over flat bin ids; cell counts are the outer
            # product of per-row/per-col bin counts (no scatter-add: np.add.at
            # is an unbuffered ufunc loop, ~10-30x slower here)
            ys = (np.arange(h) * g) // max(h, 1)
            xs = (np.arange(w) * g) // max(w, 1)
            bins = (ys[:, None] * g + xs[None, :]).ravel()
            sums = np.bincount(bins, weights=gray.ravel(), minlength=g * g)
            cnts = np.outer(np.bincount(ys, minlength=g),
                            np.bincount(xs, minlength=g)).reshape(-1)
            v = sums / np.maximum(cnts, 1.0)
            # mean-center BEFORE normalizing: raw patch means all sit near
            # the global gray level, so un-centered unit vectors are nearly
            # collinear and cosine ranking degenerates to noise
            v = v - v.mean()
            norm = np.linalg.norm(v)
            feats.append((v / norm if norm else v).tolist())
        return batch.append_column(self.out_col, pa.array(feats, pa.list_(pa.float32())))


class FrameSample:
    """Fake 'video' frame sampling: a video is a sequence of FIMG blobs
    length-prefixed; emit every Nth frame as an image row (flat-map shape)."""

    def __init__(self, every: int = 2, data_col: str = "video"):
        self.every = every
        self.data_col = data_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = []
        frames = []
        frame_no = []
        id_col = batch.column_names[0]
        # one bulk gather of the id column — per-row scalar .as_py() inside
        # the frame loop costs ~15x (stages/extract.py:54); parsing the
        # length-prefixed framing itself is inherently per-blob
        id_vals = batch[id_col].to_pylist()
        for row, blob in enumerate(batch[self.data_col].to_pylist()):
            if blob is None:
                continue
            pos, n = 0, 0
            while pos + 4 <= len(blob):
                (ln,) = struct.unpack_from("<I", blob, pos)
                frame = blob[pos + 4 : pos + 4 + ln]
                if n % self.every == 0:
                    ids.append(id_vals[row])
                    frames.append(frame)
                    frame_no.append(n)
                pos += 4 + ln
                n += 1
        return pa.table(
            {
                id_col: pa.array(ids),
                "frame_no": pa.array(frame_no, pa.int64()),
                "image": pa.array(frames, pa.binary()),
            }
        )
