"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata columns
(media_type, width/height or sample_rate, n_frames). Decoders for
UNCOMPRESSED formats are REAL, pure-numpy (no codec library needed):
netpbm P6/P5 images (``decode_netpbm``) and PCM16 RIFF/WAV audio
(``decode_wav_pcm16``) — header parse + ``np.frombuffer``. Compressed
codecs (JPEG/PNG/MP4) remain STUBBED (``_decode_stub``) because no
codec exists in this container; swap in PIL/av when the dependency
exists, nothing else changes.

Stages:
  DecodeImage      actor pool, binary -> float32 pixel tensor column
                   (mode="ppm" real netpbm decode, mode="fake" stub,
                   mode="real" raises until a compressed codec exists)
  AudioFeatures    actor pool, WAV binary -> integer-exact features
                   (n_samples, sample_rate, zero crossings) + float rms
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


def _netpbm_header(raw: bytes):
    """Parse a P5/P6 netpbm header: returns (magic, w, h, maxval,
    data_offset). Handles whitespace + '#' comments per the spec."""
    if raw[:2] not in (b"P5", b"P6"):
        raise MediaDecodeError(f"not a binary netpbm payload: {raw[:2]!r}")
    magic = raw[:2].decode()
    vals, i, n = [], 2, len(raw)
    while len(vals) < 3:
        while i < n and raw[i:i + 1].isspace():
            i += 1
        if i < n and raw[i:i + 1] == b"#":
            while i < n and raw[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not raw[j:j + 1].isspace():
            j += 1
        if j == i:
            raise MediaDecodeError("truncated netpbm header")
        vals.append(int(raw[i:j]))
        i = j
    return magic, vals[0], vals[1], vals[2], i + 1  # one ws after maxval


def decode_netpbm(raw: bytes) -> np.ndarray:
    """REAL image decode for the uncompressed netpbm formats (pure
    numpy): binary P6 (RGB) / P5 (gray, expanded to 3 channels) with
    maxval <= 255 -> (h, w, 3) float32 in [0, 1]."""
    magic, w, h, maxval, off = _netpbm_header(raw)
    if maxval > 255:
        raise MediaDecodeError("16-bit netpbm not supported")
    ch = 3 if magic == "P6" else 1
    need = w * h * ch
    if len(raw) < off + need:
        raise MediaDecodeError(
            f"truncated netpbm payload: need {need} pixel bytes, "
            f"have {len(raw) - off}"
        )
    buf = np.frombuffer(raw, dtype=np.uint8, count=need, offset=off)
    img = buf.reshape(h, w, ch).astype(np.float32) / np.float32(maxval)
    if ch == 1:
        img = np.repeat(img, 3, axis=2)
    return img


def encode_ppm(img_u8: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6 bytes (test/fixture generator)."""
    h, w, _ = img_u8.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img_u8.astype(np.uint8).tobytes()


class DecodeImage:
    """Actor-pool stage: binary image column -> pixel tensors.

    mode="ppm"   REAL pure-numpy netpbm (P6/P5) decode
    mode="fake"  deterministic stub decode (compressed-codec stand-in)
    mode="real"  raises MediaDecodeError until a compressed codec exists
    """

    def __init__(self, mode: str = "fake", in_col: str = "media",
                 h_col: str = "height", w_col: str = "width", out_col: str = "pixels"):
        if mode not in ("fake", "real", "ppm"):
            raise ValueError(mode)
        self.mode = mode
        self.in_col, self.h_col, self.w_col, self.out_col = in_col, h_col, w_col, out_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if self.mode == "real":
            raise MediaDecodeError(
                "no compressed-image codec available in this environment; "
                "use mode='ppm' for netpbm payloads or mode='fake'"
            )
        if self.mode == "ppm":
            pix = [decode_netpbm(raw) for raw in df[self.in_col]]
        else:
            pix = [
                _decode_stub(raw, int(h), int(w))
                for raw, h, w in zip(df[self.in_col], df[self.h_col], df[self.w_col])
            ]
        df = df.drop(columns=[self.in_col]).copy()
        df[self.out_col] = pix
        return df


def decode_wav_pcm16(raw: bytes):
    """REAL audio decode for uncompressed RIFF/WAV PCM16 (pure numpy):
    returns (samples, sample_rate) with samples (n, channels) float32
    in [-1, 1]. Walks the chunk list; rejects non-PCM/non-16-bit."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise MediaDecodeError("not a RIFF/WAVE payload")
    i, n = 12, len(raw)
    rate, channels, data = None, None, None
    while i + 8 <= n:
        cid = raw[i:i + 4]
        size = int.from_bytes(raw[i + 4:i + 8], "little")
        body = raw[i + 8:i + 8 + size]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if fmt != 1 or bits != 16:
                raise MediaDecodeError("only PCM16 WAV is supported")
            if channels < 1:
                raise MediaDecodeError("WAV fmt chunk declares 0 channels")
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise MediaDecodeError("missing fmt/data chunk")
    pcm = np.frombuffer(data, dtype="<i2")
    pcm = pcm[: (len(pcm) // channels) * channels].reshape(-1, channels)
    return pcm.astype(np.float32) / np.float32(32768.0), rate


def encode_wav_pcm16(pcm: np.ndarray, rate: int) -> bytes:
    """(n, channels) int16 -> RIFF/WAV bytes (test/fixture generator)."""
    pcm = np.asarray(pcm, dtype="<i2")
    ch = pcm.shape[1] if pcm.ndim == 2 else 1
    data = pcm.tobytes()
    fmt = (b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + ch.to_bytes(2, "little")
           + rate.to_bytes(4, "little")
           + (rate * ch * 2).to_bytes(4, "little")
           + (ch * 2).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    body = b"WAVE" + fmt + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


class AudioFeatures:
    """Actor-pool stage: WAV binary -> per-clip features. The integer
    outputs (n_samples, sample_rate, n_zero_cross on channel 0) are
    exact; rms is float32."""

    def __init__(self, in_col: str = "media"):
        self.in_col = in_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows = {"n_samples": [], "sample_rate": [], "n_zero_cross": [], "rms": []}
        for raw in df[self.in_col]:
            s, rate = decode_wav_pcm16(raw)
            c0 = s[:, 0]
            rows["n_samples"].append(len(s))
            rows["sample_rate"].append(rate)
            rows["n_zero_cross"].append(
                int(((c0[1:] < 0) != (c0[:-1] < 0)).sum()))
            rows["rms"].append(float(np.sqrt(np.mean(np.square(c0))))
                               if len(c0) else 0.0)
        df = df.drop(columns=[self.in_col]).copy()
        for k, v in rows.items():
            df[k] = np.asarray(v, dtype=np.int64 if k != "rms" else np.float64)
        return df


def audio_features(ds, *, concurrency: int = 4, batch_size: int = 64,
                   in_col: str = "media"):
    """Large-binary-aware actor pool over WAV clips."""
    return ds.map_batches(
        AudioFeatures,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        fn_constructor_kwargs={"in_col": in_col},
    )


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
