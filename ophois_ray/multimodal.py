"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata columns
(media_type, width/height or sample_rate, n_frames). The decode step
itself is STUBBED — no image/audio codecs exist in this container — but
everything Ray-side is real and tested: the actor-pool signature, batch
sizing for large binary payloads, Arrow binary round-tripping, output
schema. Swap ``_decode_stub`` for a real decoder (PIL/av) when the
dependency exists; nothing else changes.

Stages:
  DecodeImage      actor pool, binary -> float32 pixel tensor column
  resize_features  tensor -> fixed-size feature vector (mean-pool grid)
  frame_sample     video binary -> every nth frame's features

Batch-size guidance: with ~1 MB payloads keep batch_size <= 64 so
(batch x concurrency) stays within a worker heap; blocks of binary
columns should stay in Arrow (batch_format="pyarrow") until the decode
stage needs numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class MediaDecodeError(NotImplementedError):
    pass


def _decode_stub(raw: bytes, height: int, width: int) -> np.ndarray:
    """Deterministic fake decode: bytes -> (h, w, 3) float32 via a seeded
    hash of the payload. Stands in for a codec; marked clearly."""
    seed = int.from_bytes(raw[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    rng = np.random.RandomState(seed)
    return rng.uniform(0, 1, size=(height, width, 3)).astype(np.float32)


class DecodeImage:
    """Actor-pool stage: binary image column -> pixel tensors.

    mode="fake"  deterministic stub decode (tests, this container)
    mode="real"  raises MediaDecodeError until a codec dependency exists
    """

    def __init__(self, mode: str = "fake", in_col: str = "media",
                 h_col: str = "height", w_col: str = "width", out_col: str = "pixels"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode
        self.in_col, self.h_col, self.w_col, self.out_col = in_col, h_col, w_col, out_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if self.mode == "real":
            raise MediaDecodeError(
                "no image codec available in this environment; use mode='fake' "
                "or install a decoder and implement it here"
            )
        pix = [
            _decode_stub(raw, int(h), int(w))
            for raw, h, w in zip(df[self.in_col], df[self.h_col], df[self.w_col])
        ]
        df = df.drop(columns=[self.in_col]).copy()
        df[self.out_col] = pix
        return df


def decode_images(ds, *, mode: str = "fake", concurrency: int = 4, batch_size: int = 64):
    """Large-binary-aware actor pool: small batches, pool sized to node."""
    return ds.map_batches(
        DecodeImage,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        fn_constructor_kwargs={"mode": mode},
    )


def pooled_features(ds, *, grid: int = 4, in_col: str = "pixels", out_col: str = "features"):
    """Mean-pool each pixel tensor over a grid x grid partition -> a
    fixed 3*grid*grid feature vector (the resize/feature-extract stage)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        feats = []
        for t in df[in_col]:
            h, w, c = t.shape
            hs = np.linspace(0, h, grid + 1, dtype=int)
            ws = np.linspace(0, w, grid + 1, dtype=int)
            f = np.empty((grid, grid, c), dtype=np.float64)
            for i in range(grid):
                for j in range(grid):
                    f[i, j] = t[hs[i]:hs[i + 1], ws[j]:ws[j + 1]].mean(axis=(0, 1))
            feats.append(f.ravel())
        df = df.drop(columns=[in_col]).copy()
        df[out_col] = feats
        return df

    return ds.map_batches(fn, batch_format="pandas", batch_size=64)


def frame_sample(ds, *, every_n: int = 10, frames_col: str = "n_frames",
                 media_col: str = "media", out_col: str = "frame_idx"):
    """Video -> one row per sampled frame index (decode of the frame
    itself goes through DecodeImage with the frame's byte slice — here
    the sampling/explode plumbing)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        reps = (df[frames_col].to_numpy(np.int64) + every_n - 1) // every_n
        ridx = np.repeat(np.arange(len(df)), reps)
        frame_idx = np.concatenate(
            [np.arange(0, n, every_n, dtype=np.int64) for n in df[frames_col]]
        ) if len(df) else np.array([], dtype=np.int64)
        out = df.iloc[ridx].copy().reset_index(drop=True)
        out[out_col] = frame_idx
        return out

    return ds.map_batches(fn, batch_format="pandas", batch_size=64)


def synthetic_media_table(n: int = 64, seed: int = 3) -> pd.DataFrame:
    """Deterministic fake media table for tests/benches."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        h, w = int(rng.randint(16, 64)), int(rng.randint(16, 64))
        payload = rng.bytes(256)
        rows.append(
            {
                "media_id": i,
                "media": payload,
                "media_type": "image/fake",
                "height": h,
                "width": w,
                "n_frames": int(rng.randint(1, 40)),
            }
        )
    return pd.DataFrame(rows)
