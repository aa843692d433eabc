"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata columns
(media_type, width/height or sample_rate, n_frames). REAL pure
numpy/Python decoders (no codec library needed): netpbm P6/P5 images
(``decode_netpbm``), uncompressed 24-bit BMP (``decode_bmp24``),
PCM16 RIFF/WAV audio (``decode_wav_pcm16``), IMA/DVI ADPCM WAV
(``decode_wav_ima_adpcm`` — a compressed 4:1 audio codec, adaptive
step recurrence decoded position-major across blocks), GIF87a/89a
(``decode_gif`` — a full variable-width LZW decoder with interlace,
i.e. a genuinely COMPRESSED codec from the spec), PNG
(``decode_png`` — stdlib zlib DEFLATE + all five spec row filters,
8-bit gray/RGB/palette/alpha) baseline JPEG (``decode_jpeg`` —
canonical Huffman entropy decode, dequant, orthonormal IDCT, 4:2:0
chroma upsample, DRI/RSTn restarts, all from ITU-T.81) and MJPEG video
in BOTH containers — RIFF/AVI (``decode_avi_mjpeg``) and ISO-BMFF/MP4
(``decode_mp4_mjpeg``: a real box-tree + sample-table demuxer,
stsd/stts/stsc/stsz/stco resolved vectorized; ``mp4_metadata`` is the
no-decode container scan) — dispatched by ``decode_video`` into the
``VideoFeatures`` actor pool. H.264 gets a REAL standards-subset
codec (``encode_h264_cavlc`` / ``decode_h264``): Annex B NAL syntax,
Exp-Golomb SPS/PPS/slice headers, emulation prevention, VUI timing,
explicit deblocking-off signalling; INTRA — I_PCM (``encode_h264_ipcm``,
lossless in YUV), the compressed Intra_16x16 + CAVLC path (4x4
integer transform, DC Hadamard hierarchies, spec quantization, full
CAVLC with the level-escape ladder) AND Intra_4x4 (all nine 8.3.1.2
directional predictors, prev/rem mode coding against the
min(left,above) predictor, Table 9-4 Intra cbp, decode-order
top-right availability — opt-in ``intra4x4=True``, lambda-priced
per-MB choice vs I16); INTER — P slices with P_Skip runs
and P_L0_16x16 macroblocks: quarter-pel luma / eighth-pel chroma
motion compensation, median MV prediction, GOP coding via
``encode_h264_cavlc(gop=N)``, and the IN-LOOP DEBLOCKING FILTER
(spec 8.7: per-edge boundary strengths, alpha/beta/tC0 Tables
8-16/8-17, strong + normal modes, luma and chroma) — opt-in at encode
(``deblock=True``, signalled via disable_deblocking_filter_idc 0) and
always honoured at decode, including foreign streams that never
disable it. Decoder == encoder-recon bit-exact either way.
Still honestly out of scope (raising ``MediaDecodeError``): B slices,
sub-16x16 INTER partitions, multi-reference and CABAC;
swap in av for full-profile foreign streams, nothing else changes.

Stages:
  DecodeImage      actor pool, binary -> float32 pixel tensor column
                   (mode="ppm"/"bmp"/"gif"/"png" real decodes,
                   mode="fake" stub, "real" raises until JPEG exists)
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
    hash of the payload. Stands in for a VIDEO codec; marked clearly."""
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


# --------------------------------------------------------------- BMP 24-bit


def decode_bmp24(raw: bytes) -> np.ndarray:
    """REAL image decode for uncompressed 24-bit BMP (pure numpy):
    BITMAPINFOHEADER, BI_RGB, bottom-up or top-down rows, BGR byte
    order, rows padded to 4 bytes -> (h, w, 3) float32 in [0, 1]."""
    if raw[:2] != b"BM":
        raise MediaDecodeError("not a BMP payload")
    off = int.from_bytes(raw[10:14], "little")
    hsz = int.from_bytes(raw[14:18], "little")
    if hsz < 40:
        raise MediaDecodeError(f"unsupported BMP header size {hsz}")
    w = int.from_bytes(raw[18:22], "little", signed=True)
    h = int.from_bytes(raw[22:26], "little", signed=True)
    bpp = int.from_bytes(raw[28:30], "little")
    comp = int.from_bytes(raw[30:34], "little")
    if bpp != 24 or comp != 0:
        raise MediaDecodeError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, comp={comp})"
        )
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    need = off + stride * h
    if len(raw) < need:
        raise MediaDecodeError(
            f"truncated BMP payload: need {need} bytes, have {len(raw)}")
    rows = np.frombuffer(raw, dtype=np.uint8, count=stride * h, offset=off
                         ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].astype(np.float32) / np.float32(255)


def encode_bmp24(img_u8: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> uncompressed bottom-up 24-bit BMP bytes
    (test/fixture generator; exact inverse of decode_bmp24)."""
    h, w, _ = img_u8.shape
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = img_u8[::-1, :, ::-1].reshape(h, w * 3)
    data = body.tobytes()
    off = 14 + 40
    header = (b"BM" + (off + len(data)).to_bytes(4, "little") + b"\0\0\0\0"
              + off.to_bytes(4, "little"))
    info = ((40).to_bytes(4, "little") + w.to_bytes(4, "little")
            + h.to_bytes(4, "little") + (1).to_bytes(2, "little")
            + (24).to_bytes(2, "little") + (0).to_bytes(4, "little")
            + len(data).to_bytes(4, "little") + (0).to_bytes(4, "little") * 4)
    return header + info + data


# ---------------------------------------------------------- PNG (DEFLATE)


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the PNG per-row filters (None/Sub/Up/Average/Paeth, spec
    section 6). None/Up are whole-row vector ops; Sub is a per-lane
    running sum mod 256 (one cumsum per row); Average/Paeth carry a
    left-neighbour dependency through a nonlinear op, so they scan by
    PIXEL (w iterations of bpp-lane vector ops per row)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    rows = raw.reshape(h, stride + 1)
    w = stride // bpp
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ftype = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int64)
        if ftype == 0:
            rec = cur
        elif ftype == 1:  # Sub: rec[x] = sum of deltas mod 256, per lane
            rec = (np.cumsum(cur.reshape(w, bpp), axis=0) & 0xFF).reshape(-1)
        elif ftype == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif ftype == 3:  # Average
            cp = cur.reshape(w, bpp)
            pv = prev.reshape(w, bpp)
            rec2 = np.empty((w, bpp), dtype=np.int64)
            left = np.zeros(bpp, dtype=np.int64)
            for x in range(w):
                left = (cp[x] + ((left + pv[x]) >> 1)) & 0xFF
                rec2[x] = left
            rec = rec2.reshape(-1)
        elif ftype == 4:  # Paeth
            cp = cur.reshape(w, bpp)
            pv = prev.reshape(w, bpp)
            rec2 = np.empty((w, bpp), dtype=np.int64)
            a = np.zeros(bpp, dtype=np.int64)
            c = np.zeros(bpp, dtype=np.int64)
            for x in range(w):
                b = pv[x]
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where((pa <= pb) & (pa <= pc), a,
                                np.where(pb <= pc, b, c))
                a = (cp[x] + pred) & 0xFF
                rec2[x] = a
                c = b
            rec = rec2.reshape(-1)
        else:
            raise MediaDecodeError(f"unknown PNG filter {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def decode_png(raw: bytes) -> np.ndarray:
    """REAL image decode for PNG (pure Python/numpy + stdlib zlib — no
    codec library): 8-bit gray / RGB / palette / gray+alpha / RGBA,
    non-interlaced. DEFLATE via zlib, all five row filters reversed
    per spec. Alpha is dropped (plumbing carries RGB tensors).
    Adam7 interlace raises (rare for CC-scale payloads)."""
    import zlib

    if raw[:8] != b"\x89PNG\r\n\x1a\n":
        raise MediaDecodeError("not a PNG payload")
    i, n = 8, len(raw)
    w = h = None
    depth = ctype = interlace = None
    palette = None
    idat = []
    while i + 8 <= n:
        ln = int.from_bytes(raw[i:i + 4], "big")
        typ = raw[i + 4:i + 8]
        body = raw[i + 8:i + 8 + ln]
        if typ == b"IHDR":
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            depth, ctype = body[8], body[9]
            interlace = body[12]
        elif typ == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        i += 12 + ln
    if w is None or not idat:
        raise MediaDecodeError("PNG payload missing IHDR/IDAT")
    if depth != 8:
        raise MediaDecodeError(f"only 8-bit PNG supported (depth={depth})")
    if interlace:
        raise MediaDecodeError("Adam7-interlaced PNG not supported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise MediaDecodeError(f"unknown PNG color type {ctype}")
    data = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    stride = w * channels
    if len(data) != h * (stride + 1):
        raise MediaDecodeError("PNG pixel data size mismatch")
    img = _png_unfilter(data, h, stride, channels).reshape(h, w, channels)
    if ctype == 3:
        if palette is None:
            raise MediaDecodeError("palette PNG without PLTE")
        img = palette[np.minimum(img[:, :, 0], len(palette) - 1)]
    elif ctype == 0:
        img = np.repeat(img, 3, axis=2)
    elif ctype == 4:
        img = np.repeat(img[:, :, :1], 3, axis=2)
    else:
        img = img[:, :, :3]
    return img.astype(np.float32) / np.float32(255)


def encode_png(img_u8: np.ndarray, *, filter_type: int = 0) -> bytes:
    """(h, w, 3) uint8 -> RGB PNG bytes (fixture generator). Applies
    ONE forward filter to every row (0..4) so tests can exercise each
    reverse filter; real zlib DEFLATE + CRCs."""
    import zlib

    h, w, _ = img_u8.shape
    px = img_u8.astype(np.int64)
    rows = []
    prev = np.zeros((w, 3), dtype=np.int64)
    for y in range(h):
        cur = px[y]
        left = np.zeros((w, 3), dtype=np.int64)
        left[1:] = cur[:-1]
        upleft = np.zeros((w, 3), dtype=np.int64)
        upleft[1:] = prev[:-1]
        if filter_type == 0:
            f = cur
        elif filter_type == 1:
            f = cur - left
        elif filter_type == 2:
            f = cur - prev
        elif filter_type == 3:
            f = cur - ((left + prev) >> 1)
        elif filter_type == 4:
            p = left + prev - upleft
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            f = cur - pred
        else:
            raise ValueError(filter_type)
        rows.append(bytes([filter_type]) + (f & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    comp = zlib.compress(b"".join(rows))

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (len(body).to_bytes(4, "big") + typ + body
                + zlib.crc32(typ + body).to_bytes(4, "big"))

    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0]))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", comp) + chunk(b"IEND", b""))


# ------------------------------------------------------------- GIF (LZW)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW decode (pure Python int ops): variable-width
    codes packed LSB-first, clear/end codes, dictionary growth to 4096,
    code width bumps when the next free code reaches 2^width."""
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    pos = 0
    bitbuf = bitcnt = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    # width-bump bookkeeping counts a virtual slot for EVERY code read
    # (including the first after a clear, which stores no entry) — the
    # convention real encoders/decoders synchronize on; an entry-count
    # bump would run one code early and desync at each 2^w boundary
    vnext = clear + 2
    prev: bytes | None = None
    i, n = 0, len(data)
    while pos < n_pixels:
        while bitcnt < width:
            if i >= n:
                raise MediaDecodeError("truncated LZW stream")
            bitbuf |= data[i] << bitcnt
            bitcnt += 8
            i += 1
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        bitcnt -= width
        if code == clear:
            table = [bytes([j]) for j in range(clear)] + [b"", b""]
            width = min_code_size + 1
            vnext = clear + 2
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise MediaDecodeError(f"bad LZW code {code}")
        if pos + len(entry) > n_pixels:
            entry = entry[: n_pixels - pos]
        out[pos: pos + len(entry)] = np.frombuffer(entry, dtype=np.uint8)
        pos += len(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        if vnext < 4096:
            vnext += 1
            if vnext == (1 << width) and width < 12:
                width += 1
        prev = table[code] if code < len(table) else entry
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW encode, symmetric with :func:`_lzw_decode`
    (fixture generator + roundtrip gate): real dictionary compression,
    clear emitted when the table fills."""
    clear = 1 << min_code_size
    end = clear + 1
    bitbuf = bitcnt = 0
    out = bytearray()

    def emit(code: int, width: int):
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1   # next real table slot
    vnext = clear + 2     # per-emit virtual counter — MUST mirror the
    #                       decoder's, which ticks once per data code
    #                       read (clear/end excluded), else the two
    #                       desync at every 2^width boundary

    def emit_data(code: int):
        nonlocal vnext, width
        emit(code, width)
        if vnext < 4096:
            vnext += 1
            if vnext == (1 << width) and width < 12:
                width += 1

    emit(clear, width)
    w = b""
    for k in indices.astype(np.uint8).tobytes():
        kb = bytes([k])
        wk = w + kb
        if wk in table:
            w = wk
            continue
        emit_data(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
            vnext = clear + 2
        w = kb
    if w:
        emit_data(table[w])
    emit(end, width)
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(raw: bytes) -> np.ndarray:
    """REAL image decode for GIF87a/89a (pure Python/numpy) — a
    genuinely COMPRESSED codec, no library needed: global or local
    color table, LZW-compressed first image frame, interlace
    supported; extensions skipped. Returns (h, w, 3) float32 in
    [0, 1]. Conformance gates: encode/decode roundtrips crossing the
    9->10->11-bit code boundaries and table-full clears, the KwKwK
    self-reference case, interlace reordering, and degenerate
    clear-heavy streams (tests/test_trainops.py)."""
    if raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise MediaDecodeError("not a GIF payload")
    flags = raw[10]
    i = 13
    palette = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        palette = np.frombuffer(raw, np.uint8, size * 3, i).reshape(size, 3)
        i += size * 3
    while i < len(raw):
        b = raw[i]
        if b == 0x21:  # extension: label + sub-blocks
            i += 2
            while raw[i] != 0:
                i += 1 + raw[i]
            i += 1
        elif b == 0x2C:  # image descriptor
            w = int.from_bytes(raw[i + 5:i + 7], "little")
            h = int.from_bytes(raw[i + 7:i + 9], "little")
            lflags = raw[i + 9]
            i += 10
            if lflags & 0x80:
                size = 2 << (lflags & 0x07)
                palette = np.frombuffer(raw, np.uint8, size * 3, i
                                        ).reshape(size, 3)
                i += size * 3
            if palette is None:
                raise MediaDecodeError("GIF frame without a color table")
            mcs = raw[i]
            i += 1
            chunks = []
            while raw[i] != 0:
                ln = raw[i]
                chunks.append(raw[i + 1:i + 1 + ln])
                i += 1 + ln
            idx = _lzw_decode(b"".join(chunks), mcs, w * h)
            if lflags & 0x40:  # interlaced: 4-pass row order
                # rows[y] = index of display row y within the STORED
                # pass-ordered data, so stored[rows] is display order
                rows = np.empty(h, dtype=np.int64)
                r = 0
                for start, step in _GIF_INTERLACE_PASSES:
                    for y in range(start, h, step):
                        rows[y] = r
                        r += 1
                idx = idx.reshape(h, w)[rows].reshape(-1)
            pix = palette[np.minimum(idx, len(palette) - 1)]
            return pix.reshape(h, w, 3).astype(np.float32) / np.float32(255)
        elif b == 0x3B:  # trailer
            break
        else:
            raise MediaDecodeError(f"unknown GIF block 0x{b:02x}")
    raise MediaDecodeError("GIF payload holds no image frame")


def encode_gif(img_u8: np.ndarray, *, interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 -> single-frame GIF with an exact 256-entry
    palette built from the image's distinct colors (raises if > 256 —
    fixture generator, not a quantizer). Real LZW compression."""
    h, w, _ = img_u8.shape
    flat = img_u8.reshape(-1, 3)
    colors, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif needs <= 256 distinct colors")
    pal = np.zeros((max(2, int(len(colors))), 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    bits = max(1, int(np.ceil(np.log2(len(pal)))))
    pal_n = 1 << bits
    full_pal = np.zeros((pal_n, 3), dtype=np.uint8)
    full_pal[: len(pal)] = pal
    idx = inv.astype(np.uint8).reshape(h, w)
    if interlace:
        order = []
        for start, step in _GIF_INTERLACE_PASSES:
            order.extend(range(start, h, step))
        idx = idx[np.array(order)]
    mcs = max(2, bits)
    lzw = _lzw_encode(idx.reshape(-1), mcs)
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (bits - 1), 0, 0])
    out += full_pal.tobytes()
    out += b"\x2C" + b"\0\0\0\0" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0])
    out += bytes([mcs])
    for j in range(0, len(lzw), 255):
        chunk = lzw[j:j + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\0\x3B"
    return bytes(out)


# ------------------------------------------------------------------ JPEG
# Baseline sequential DCT JPEG (SOF0), pure Python/numpy from the spec:
# canonical Huffman entropy decode, dequant + zigzag, separable
# orthonormal IDCT, nearest-neighbour chroma upsample, JFIF YCbCr.
# Handles 1- and 3-component frames, sampling factors up to 2x2
# (4:4:4 / 4:2:0 / 4:2:2) and DRI/RSTn restart intervals.

#: zigzag scan: raster position of the k-th zigzag coefficient
_JPEG_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: Annex K luminance quantization table (raster order)
_JPEG_QTABLE = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

#: Annex K luminance DC/AC Huffman specs (bits[16], values)
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _jpeg_dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis A: FDCT F = A f A^T, IDCT
    f = A^T F A (A A^T = I, verified by pytest)."""
    k = np.arange(8, dtype=np.float64)[:, None]
    n = np.arange(8, dtype=np.float64)[None, :]
    A = np.cos((2.0 * n + 1.0) * k * np.pi / 16.0) / 2.0
    A[0, :] *= 1.0 / np.sqrt(2.0)
    return A


_JPEG_A = _jpeg_dct_matrix()


def _huff_decode_spec(bits, vals):
    """Canonical Huffman decode tables (JPEG F.2.2.3): per code length
    l, (mincode, maxcode, index of first value)."""
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code = 0
    k = 0
    for l in range(1, 17):
        valptr[l] = k
        mincode[l] = code
        code += bits[l - 1]
        k += bits[l - 1]
        maxcode[l] = code - 1
        code <<= 1
    return mincode, maxcode, valptr, list(vals)


class _JpegBitReader:
    """MSB-first bit reader over an unstuffed entropy segment."""

    def __init__(self, data: bytes):
        self._bits = np.unpackbits(np.frombuffer(bytes(data), dtype=np.uint8))
        self._pos = 0

    def bit(self) -> int:
        if self._pos >= len(self._bits):
            raise MediaDecodeError("truncated JPEG entropy segment")
        b = int(self._bits[self._pos])
        self._pos += 1
        return b

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def symbol(self, spec) -> int:
        mincode, maxcode, valptr, vals = spec
        code = self.bit()
        l = 1
        while code > maxcode[l]:
            if l >= 16:
                raise MediaDecodeError("invalid Huffman code")
            code = (code << 1) | self.bit()
            l += 1
        return vals[valptr[l] + code - mincode[l]]


def _jpeg_extend(v: int, s: int) -> int:
    """F.2.4.3 magnitude-category sign extension."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def decode_jpeg(raw: bytes) -> np.ndarray:
    """REAL baseline JPEG decode with no library — the third compressed
    IMAGE codec (after GIF-LZW and PNG-DEFLATE): marker parse, canonical
    Huffman entropy decode, dequantization, orthonormal IDCT, chroma
    upsample, JFIF YCbCr->RGB. Returns (h, w, 3) float32 in [0, 1]
    (grayscale frames replicate to 3 channels, matching the other
    decoders). Baseline sequential (SOF0) only; progressive raises."""
    if raw[:2] != b"\xff\xd8":
        raise MediaDecodeError("not a JPEG payload")
    qt: dict = {}
    dc_spec: dict = {}
    ac_spec: dict = {}
    frame = None
    scan = None
    ri = 0
    i = 2
    data_pos = None
    while i + 1 < len(raw):
        if raw[i] != 0xFF:
            raise MediaDecodeError("bad JPEG marker stream")
        while raw[i + 1] == 0xFF:  # B.1.1.2: fill bytes before a marker
            i += 1
            if i + 1 >= len(raw):
                raise MediaDecodeError("truncated JPEG marker stream")
        m = raw[i + 1]
        i += 2
        if m == 0xD9 or m == 0x01 or 0xD0 <= m <= 0xD7:
            continue
        L = int.from_bytes(raw[i:i + 2], "big")
        seg = raw[i + 2:i + L]
        if m == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0xF
                if pq != 0:
                    raise MediaDecodeError("only 8-bit quant tables")
                tbl = np.frombuffer(seg[j + 1:j + 65], dtype=np.uint8)
                q = np.zeros(64, dtype=np.int64)
                q[_JPEG_ZIGZAG] = tbl  # DQT is stored in zigzag order
                qt[tq] = q.reshape(8, 8)
                j += 65
        elif m == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0xF
                bits = list(seg[j + 1:j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17:j + 17 + nv])
                (dc_spec if tc == 0 else ac_spec)[th] = _huff_decode_spec(
                    bits, vals)
                j += 17 + nv
        elif m == 0xC0:  # SOF0 baseline
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                   0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise MediaDecodeError("only baseline sequential JPEG (SOF0)")
        elif m == 0xDD:  # DRI
            ri = int.from_bytes(seg[0:2], "big")
        elif m == 0xDA:  # SOS
            ns = seg[0]
            scan = [(seg[1 + 2 * c], seg[2 + 2 * c] >> 4,
                     seg[2 + 2 * c] & 0xF) for c in range(ns)]
            data_pos = i + L
            break
        i += L
    if frame is None or scan is None:
        raise MediaDecodeError("missing SOF/SOS")
    if len(scan) != len(frame["comps"]):
        raise MediaDecodeError(
            "only single-scan interleaved baseline JPEG (the scan must "
            "cover every frame component)")

    # split entropy data into restart segments, unstuffing 0xFF00
    segs = [bytearray()]
    j = data_pos
    while j < len(raw):
        b = raw[j]
        if b == 0xFF:
            m2 = raw[j + 1] if j + 1 < len(raw) else 0xD9
            if m2 == 0x00:
                segs[-1].append(0xFF)
                j += 2
                continue
            if 0xD0 <= m2 <= 0xD7:
                segs.append(bytearray())
                j += 2
                continue
            break
        segs[-1].append(b)
        j += 1

    comps = frame["comps"]
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    mcu_cols = -(-frame["w"] // (8 * max_h))
    mcu_rows = -(-frame["h"] // (8 * max_v))
    by_id = {c["id"]: c for c in comps}
    order = []
    for cid, td, ta in scan:
        c = by_id[cid]
        c["dc"], c["ac"] = dc_spec[td], ac_spec[ta]
        c["plane"] = np.zeros(
            (mcu_rows * c["v"] * 8, mcu_cols * c["h"] * 8), dtype=np.float64)
        c["pred"] = 0
        order.append(c)

    A_T, A = _JPEG_A.T, _JPEG_A
    seg_idx = 0
    br = _JpegBitReader(segs[0])
    for mi in range(mcu_rows * mcu_cols):
        if ri and mi and mi % ri == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise MediaDecodeError(
                    "truncated JPEG: fewer restart segments than DRI implies")
            br = _JpegBitReader(segs[seg_idx])
            for c in order:
                c["pred"] = 0
        mr, mc = divmod(mi, mcu_cols)
        for c in order:
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    coef = np.zeros(64, dtype=np.int64)
                    s = br.symbol(c["dc"])
                    c["pred"] += _jpeg_extend(br.read(s), s)
                    coef[0] = c["pred"]
                    k = 1
                    while k < 64:
                        rs = br.symbol(c["ac"])
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL: sixteen zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise MediaDecodeError("AC run past block end")
                        coef[k] = _jpeg_extend(br.read(s), s)
                        k += 1
                    blk = np.zeros(64, dtype=np.float64)
                    blk[_JPEG_ZIGZAG] = coef
                    blk = blk.reshape(8, 8) * qt[c["tq"]]
                    pix = A_T @ blk @ A + 128.0
                    y0 = (mr * c["v"] + v) * 8
                    x0 = (mc * c["h"] + hh) * 8
                    c["plane"][y0:y0 + 8, x0:x0 + 8] = pix

    planes = []
    for c in comps:
        p = c["plane"]
        p = np.repeat(np.repeat(p, max_v // c["v"], axis=0),
                      max_h // c["h"], axis=1)
        planes.append(p[: frame["h"], : frame["w"]])
    if len(planes) == 1:
        g = np.clip(planes[0], 0.0, 255.0)
        rgb = np.repeat(g[:, :, None], 3, axis=2)
    else:
        y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
        rgb = np.stack([
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ], axis=2)
        rgb = np.clip(rgb, 0.0, 255.0)
    return np.round(rgb).astype(np.float32) / np.float32(255)


class _JpegBitWriter:
    """MSB-first bit writer with 0xFF byte stuffing."""

    def __init__(self):
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, val: int, nbits: int):
        for b in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((val >> b) & 1)
            self._n += 1
            if self._n == 8:
                self.buf.append(self._acc)
                if self._acc == 0xFF:
                    self.buf.append(0x00)
                self._acc = 0
                self._n = 0

    def align(self):
        while self._n:
            self.write(1, 1)


def _huff_encode_spec(bits, vals):
    codes = {}
    code = 0
    k = 0
    for l in range(1, 17):
        for _ in range(bits[l - 1]):
            codes[vals[k]] = (code, l)
            code += 1
            k += 1
        code <<= 1
    return codes


def _jpeg_category(v: int) -> int:
    return int(abs(v)).bit_length()


def encode_jpeg(img_u8: np.ndarray, *, quality: int = 85,
                subsample: bool = False, restart_interval: int = 0) -> bytes:
    """(h, w, 3) or (h, w) uint8 -> baseline JPEG bytes (test/fixture
    generator; Annex K tables, one quant + one DC/AC Huffman table for
    all components). ``subsample=True`` writes 4:2:0 (2x2 luma
    sampling); ``restart_interval`` > 0 emits DRI + RSTn markers."""
    img = np.asarray(img_u8, dtype=np.float64)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if quality < 1 or quality > 100:
        raise ValueError("quality in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.clip((_JPEG_QTABLE * scale + 50) // 100, 1, 255)
    qmat = q.reshape(8, 8).astype(np.float64)

    if gray:
        ycc = [img]
        samp = [(1, 1)]
    else:
        r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            def down(p):
                # pad odd dims by edge replication BEFORE the 2x2 mean
                pp = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)),
                            mode="edge")
                return (pp[0::2, 0::2] + pp[0::2, 1::2]
                        + pp[1::2, 0::2] + pp[1::2, 1::2]) / 4.0
            ycc = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            ycc = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]

    max_h = max(s[0] for s in samp)
    max_v = max(s[1] for s in samp)
    mcu_cols = -(-w // (8 * max_h))
    mcu_rows = -(-h // (8 * max_v))
    padded = []
    for p, (sh, sv) in zip(ycc, samp):
        th, tw = mcu_rows * sv * 8, mcu_cols * sh * 8
        pp = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                    mode="edge")
        padded.append(pp)

    dc_codes = _huff_encode_spec(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huff_encode_spec(_JPEG_AC_BITS, _JPEG_AC_VALS)
    A = _JPEG_A
    bw = _JpegBitWriter()
    preds = [0] * len(ycc)
    n_mcus = mcu_rows * mcu_cols
    rst = 0
    for mi in range(n_mcus):
        if restart_interval and mi and mi % restart_interval == 0:
            bw.align()
            bw.buf += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            preds = [0] * len(ycc)
        mr, mc = divmod(mi, mcu_cols)
        for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
            for v in range(sv):
                for hh in range(sh):
                    y0 = (mr * sv + v) * 8
                    x0 = (mc * sh + hh) * 8
                    blk = p[y0:y0 + 8, x0:x0 + 8] - 128.0
                    F = A @ blk @ A.T
                    coef = np.rint(F / qmat).astype(np.int64)
                    zz = coef.reshape(-1)[_JPEG_ZIGZAG]
                    diff = int(zz[0]) - preds[ci]
                    preds[ci] = int(zz[0])
                    s = _jpeg_category(diff)
                    code, ln = dc_codes[s]
                    bw.write(code, ln)
                    if s:
                        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
                    run = 0
                    last = np.nonzero(zz[1:])[0]
                    last_k = int(last[-1]) + 1 if len(last) else 0
                    for k in range(1, last_k + 1):
                        if zz[k] == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, ln = ac_codes[0xF0]
                            bw.write(code, ln)
                            run -= 16
                        s = _jpeg_category(int(zz[k]))
                        code, ln = ac_codes[(run << 4) | s]
                        bw.write(code, ln)
                        val = int(zz[k])
                        bw.write(val if val > 0 else val + (1 << s) - 1, s)
                        run = 0
                    if last_k < 63:
                        code, ln = ac_codes[0x00]
                        bw.write(code, ln)
    bw.align()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q[_JPEG_ZIGZAG]))
    sof = bytearray([8])
    sof += h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof.append(len(ycc))
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    out += seg(0xC0, bytes(sof))
    out += seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS)
               + bytes(_JPEG_DC_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_JPEG_AC_BITS)
               + bytes(_JPEG_AC_VALS))
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytearray([len(ycc)])
    for ci in range(len(ycc)):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, bytes(sos))
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


class DecodeImage:
    """Actor-pool stage: binary image column -> pixel tensors.

    mode="ppm"   REAL pure-numpy netpbm (P6/P5) decode
    mode="bmp"   REAL pure-numpy uncompressed 24-bit BMP decode
    mode="gif"   REAL pure-Python GIF decode (LZW — a compressed codec)
    mode="png"   REAL PNG decode (stdlib zlib DEFLATE + spec filters)
    mode="jpeg"  REAL baseline JPEG decode (Huffman + IDCT, from spec)
    mode="fake"  deterministic stub decode (MP4 stand-in)
    mode="real"  raises MediaDecodeError (only MP4 still needs a codec)
    """

    _DECODERS = {"ppm": "decode_netpbm", "bmp": "decode_bmp24",
                 "gif": "decode_gif", "png": "decode_png",
                 "jpeg": "decode_jpeg"}

    def __init__(self, mode: str = "fake", in_col: str = "media",
                 h_col: str = "height", w_col: str = "width", out_col: str = "pixels"):
        if mode not in ("fake", "real", "ppm", "bmp", "gif", "png", "jpeg"):
            raise ValueError(mode)
        self.mode = mode
        self.in_col, self.h_col, self.w_col, self.out_col = in_col, h_col, w_col, out_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if self.mode == "real":
            raise MediaDecodeError(
                "no H.26x/VPx bitstream codec available in this "
                "environment (MP4 *demux* is real: decode_mp4_mjpeg / "
                "mp4_metadata); use mode='ppm'/'bmp'/'gif'/'png'/'jpeg' "
                "for image payloads or mode='fake'"
            )
        if self.mode in self._DECODERS:
            fn = globals()[self._DECODERS[self.mode]]
            pix = [fn(raw) for raw in df[self.in_col]]
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
    rate, channels, data = None, None, None
    for cid, b0, b1 in _riff_chunks(raw, 12, len(raw)):
        body = raw[b0:b1]
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
    if rate is None or data is None:
        raise MediaDecodeError("missing fmt/data chunk")
    pcm = np.frombuffer(data, dtype="<i2")
    pcm = pcm[: (len(pcm) // channels) * channels].reshape(-1, channels)
    return pcm.astype(np.float32) / np.float32(32768.0), rate


_IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)
_IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)


def _ima_step(pred: np.ndarray, index: np.ndarray, code: np.ndarray):
    """One IMA-ADPCM update, vectorized over any batch of decoder
    states: returns (new_pred, new_index). Pure int32 per the spec's
    bit-shift reconstruction (diff = step>>3 + conditional step>>2,
    step>>1, step terms; sign in bit 3)."""
    step = _IMA_STEP_TABLE[index]
    diff = step >> 3
    diff = diff + np.where(code & 1, step >> 2, 0)
    diff = diff + np.where(code & 2, step >> 1, 0)
    diff = diff + np.where(code & 4, step, 0)
    diff = np.where(code & 8, -diff, diff)
    pred = np.clip(pred + diff, -32768, 32767)
    index = np.clip(index + _IMA_INDEX_TABLE[code & 7], 0, 88)
    return pred, index


def decode_wav_ima_adpcm(raw: bytes):
    """REAL decode of a genuinely COMPRESSED audio codec with no
    library: RIFF/WAV IMA (DVI) ADPCM, format tag 0x11, mono. 4:1
    compression — each 4-bit code reconstructs a 16-bit sample through
    the adaptive step-size recurrence. Returns (samples, rate) with
    samples (n, 1) float32 in [-1, 1].

    The recurrence is serial WITHIN a block but blocks are
    independent, so decoding runs position-major: one numpy pass per
    nibble position, vectorized across ALL blocks of the clip (the
    same layout trick as the PNG unfilter and the rolling-hash
    fingerprints)."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise MediaDecodeError("not a RIFF/WAVE payload")
    rate = block_align = data = None
    n_samples = None
    for cid, b0, b1 in _riff_chunks(raw, 12, len(raw)):
        body = raw[b0:b1]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            block_align = int.from_bytes(body[12:14], "little")
            bits = int.from_bytes(body[14:16], "little")
            if fmt != 0x11 or bits != 4:
                raise MediaDecodeError("not IMA ADPCM (tag 0x11, 4-bit)")
            if channels != 1:
                raise MediaDecodeError("only mono IMA ADPCM is supported")
        elif cid == b"fact":
            n_samples = int.from_bytes(body[0:4], "little")
        elif cid == b"data":
            data = body
    if rate is None or data is None or block_align is None:
        raise MediaDecodeError("missing fmt/data chunk")
    if block_align < 5:
        raise MediaDecodeError("IMA ADPCM block_align must be >= 5")

    def decode_blocks(blocks: np.ndarray) -> np.ndarray:
        nb = blocks.shape[0]
        pred = blocks[:, 0:2].copy().view("<i2")[:, 0].astype(np.int32)
        index = np.clip(blocks[:, 2].astype(np.int32), 0, 88)
        body = blocks[:, 4:]
        ncodes = body.shape[1] * 2
        codes = np.empty((nb, ncodes), dtype=np.int32)
        codes[:, 0::2] = body & 0x0F    # low nibble first per spec
        codes[:, 1::2] = body >> 4
        out = np.empty((nb, 1 + ncodes), dtype=np.int16)
        out[:, 0] = pred
        for t in range(ncodes):         # serial in t, vector across blocks
            pred, index = _ima_step(pred, index, codes[:, t])
            out[:, t + 1] = pred
        return out.reshape(-1)

    nb = len(data) // block_align
    pieces = []
    if nb:
        pieces.append(decode_blocks(np.frombuffer(
            data[: nb * block_align], dtype=np.uint8).reshape(nb, block_align)))
    tail = len(data) - nb * block_align
    if tail:  # spec-legal short FINAL block — decode, don't drop
        if tail < 5:
            raise MediaDecodeError("truncated IMA ADPCM final block")
        pieces.append(decode_blocks(np.frombuffer(
            data[nb * block_align:], dtype=np.uint8).reshape(1, tail)))
    if not pieces:
        return np.zeros((0, 1), dtype=np.float32), rate
    flat = np.concatenate(pieces)
    if n_samples is not None:
        flat = flat[:n_samples]
    return (flat.astype(np.float32) / np.float32(32768.0)).reshape(-1, 1), rate


def encode_wav_ima_adpcm(pcm: np.ndarray, rate: int,
                         samples_per_block: int = 505) -> bytes:
    """Mono int16 -> RIFF/WAV IMA ADPCM bytes (test/fixture generator;
    scalar reference encoder). ``samples_per_block`` must be odd so
    each block is 1 header sample + an even nibble count."""
    if samples_per_block % 2 == 0:
        raise ValueError("samples_per_block must be odd")
    pcm = np.asarray(pcm, dtype=np.int16).reshape(-1).astype(np.int32)
    block_align = 4 + (samples_per_block - 1) // 2
    index = 0
    out = bytearray()
    for s in range(0, len(pcm), samples_per_block):
        chunk = pcm[s:s + samples_per_block]
        pred = int(chunk[0])
        out += int(pred).to_bytes(2, "little", signed=True)
        out += bytes([index, 0])
        nibbles = []
        for x in chunk[1:]:
            step = int(_IMA_STEP_TABLE[index])
            diff = int(x) - pred
            code = 8 if diff < 0 else 0
            diff = abs(diff)
            if diff >= step:
                code |= 4
                diff -= step
            if diff >= step >> 1:
                code |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                code |= 1
            p, ix = _ima_step(np.array([pred]), np.array([index]),
                              np.array([code]))
            pred, index = int(p[0]), int(ix[0])
            nibbles.append(code)
        nibbles += [0] * ((samples_per_block - 1) - len(nibbles))
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            out.append(lo | (hi << 4))
    fmt = (b"fmt " + (20).to_bytes(4, "little")
           + (0x11).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + rate.to_bytes(4, "little")
           + ((rate * block_align) // samples_per_block).to_bytes(4, "little")
           + block_align.to_bytes(2, "little") + (4).to_bytes(2, "little")
           + (2).to_bytes(2, "little")
           + samples_per_block.to_bytes(2, "little"))
    fact = b"fact" + (4).to_bytes(4, "little") + len(pcm).to_bytes(4, "little")
    data = b"data" + len(out).to_bytes(4, "little") + bytes(out)
    body = b"WAVE" + fmt + fact + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_wav(raw: bytes):
    """Dispatch WAV decode on the fmt tag: 1 -> PCM16, 0x11 -> IMA
    ADPCM. Walks the chunk list to find ``fmt `` (it need not be the
    first chunk). Returns (samples (n, channels) float32, rate)."""
    if len(raw) >= 12 and raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
        for cid, b0, b1 in _riff_chunks(raw, 12, len(raw)):
            if cid == b"fmt " and b1 - b0 >= 2:
                if int.from_bytes(raw[b0:b0 + 2], "little") == 0x11:
                    return decode_wav_ima_adpcm(raw)
                break
    return decode_wav_pcm16(raw)


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
            s, rate = decode_wav(raw)
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


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (pixel-center convention: source index
    = floor((i + 0.5) * in/out)) — pure integer index arithmetic, so
    the result is a bit-exact gather of input pixels."""
    h, w = img.shape[:2]
    ri = np.minimum(((2 * np.arange(out_h) + 1) * h) // (2 * out_h), h - 1)
    ci = np.minimum(((2 * np.arange(out_w) + 1) * w) // (2 * out_w), w - 1)
    return img[ri][:, ci]


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize, half-pixel-center convention (align_corners
    False — the PIL/torchvision default): src = (dst + 0.5) * in/out
    - 0.5, edge-clamped. Fully vectorized (separable gather + lerp);
    float64 output in the input's value range."""
    src = np.asarray(img, dtype=np.float64)
    h, w = src.shape[:2]

    def axis_coords(n_in: int, n_out: int):
        x = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
        x = np.clip(x, 0.0, n_in - 1.0)
        lo = np.floor(x).astype(np.int64)
        hi = np.minimum(lo + 1, n_in - 1)
        return lo, hi, (x - lo)

    r0, r1, fr = axis_coords(h, out_h)
    c0, c1, fc = axis_coords(w, out_w)
    top = src[r0][:, c0] * (1 - fc)[None, :, None] \
        + src[r0][:, c1] * fc[None, :, None]
    bot = src[r1][:, c0] * (1 - fc)[None, :, None] \
        + src[r1][:, c1] * fc[None, :, None]
    return top * (1 - fr)[:, None, None] + bot * fr[:, None, None]


class ResizeImages:
    """Actor-pool stage: pixel tensors -> fixed (out_h, out_w)
    tensors, mode='bilinear' (float) or 'nearest' (bit-exact gather)
    — the standardize-before-embed step of an image pipeline."""

    def __init__(self, out_h: int, out_w: int, mode: str = "bilinear",
                 in_col: str = "pixels", out_col: str = "pixels"):
        if mode not in ("bilinear", "nearest"):
            raise ValueError(mode)
        self.fn = resize_bilinear if mode == "bilinear" else resize_nearest
        self.out_h, self.out_w = out_h, out_w
        self.in_col, self.out_col = in_col, out_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = [self.fn(t, self.out_h, self.out_w) for t in df[self.in_col]]
        df = df.drop(columns=[self.in_col]).copy()
        df[self.out_col] = out
        return df


def resize_images(ds, out_h: int, out_w: int, *, mode: str = "bilinear",
                  concurrency: int = 4, batch_size: int = 64,
                  in_col: str = "pixels", out_col: str = "pixels"):
    return ds.map_batches(
        ResizeImages, batch_format="pandas", batch_size=batch_size,
        concurrency=(1, concurrency),
        fn_constructor_kwargs={"out_h": out_h, "out_w": out_w,
                               "mode": mode, "in_col": in_col,
                               "out_col": out_col})


# ------------------------------------------------------------------- AVI
# Motion JPEG in a RIFF/AVI container: a REAL video codec path with no
# library — the container walk is pure chunk parsing and every frame
# is a baseline JPEG handled by decode_jpeg above. (MP4/H.264 stays the
# honest stub: motion compensation needs a codec library.)


def _riff_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) over a RIFF chunk run."""
    i = start
    while i + 8 <= end:
        cid = buf[i:i + 4]
        size = int.from_bytes(buf[i + 4:i + 8], "little")
        yield cid, i + 8, i + 8 + size
        i += 8 + size + (size & 1)  # chunks are word-aligned


def decode_avi_mjpeg(raw: bytes):
    """REAL video decode for MJPEG-in-AVI: walks the RIFF lists, pulls
    every ``00dc``/``00db`` frame chunk out of the ``movi`` list and
    decodes it with :func:`decode_jpeg`. Returns
    ``(frames, fps_micros)``: frames (n, h, w, 3) float32 in [0, 1],
    and the container's microseconds-per-frame (0 if absent)."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        raise MediaDecodeError("not a RIFF/AVI payload")
    usec_per_frame = 0
    frames = []

    def walk(start, end):
        nonlocal usec_per_frame
        for cid, b0, b1 in _riff_chunks(raw, start, end):
            if cid == b"LIST":
                walk(b0 + 4, b1)
            elif cid == b"avih":
                usec_per_frame = int.from_bytes(raw[b0:b0 + 4], "little")
            elif cid[2:4] in (b"dc", b"db") and raw[b0:b0 + 2] == b"\xff\xd8":
                frames.append(decode_jpeg(raw[b0:b1]))

    walk(12, len(raw))
    if not frames:
        raise MediaDecodeError("no MJPEG frames in AVI movi list")
    return np.stack(frames), usec_per_frame


def encode_avi_mjpeg(frames_u8, *, fps: int = 10, quality: int = 85) -> bytes:
    """(n, h, w, 3) uint8 -> minimal MJPEG AVI bytes (fixture
    generator)."""
    frames_u8 = np.asarray(frames_u8, dtype=np.uint8)
    n, h, w = frames_u8.shape[:3]
    payloads = [encode_jpeg(f, quality=quality) for f in frames_u8]

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + len(body).to_bytes(4, "little") + body + (
            b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    u32 = lambda v: int(v).to_bytes(4, "little")
    avih = (u32(1_000_000 // fps) + u32(0) + u32(0) + u32(0x10) + u32(n)
            + u32(0) + u32(1) + u32(0) + u32(w) + u32(h) + u32(0) * 4)
    strh = (b"vids" + b"MJPG" + u32(0) + u32(0) + u32(0) + u32(1)
            + u32(fps) + u32(0) + u32(n) + u32(0) + u32(0xFFFFFFFF)
            + u32(0) + u32(0) + u32(0))
    strf = (u32(40) + u32(w) + u32(h) + (1).to_bytes(2, "little")
            + (24).to_bytes(2, "little") + b"MJPG" + u32(w * h * 3)
            + u32(0) + u32(0) + u32(0) + u32(0))
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


# ------------------------------------------------------------------- MP4
# ISO Base Media File Format (ISO/IEC 14496-12): a REAL pure-Python
# demuxer — box tree walk + full sample-table resolution (stsd codec
# entry, stts timing, stsc sample->chunk map, stsz sizes, stco/co64
# offsets) — so MP4 *containers* are first-class. Sample payloads then
# dispatch by the stsd fourcc: ``jpeg``/``mjpa``/``MJPG`` (Motion JPEG)
# decode for real through decode_jpeg; ``avc1``/H.264-family entries
# raise MediaDecodeError — motion-compensated entropy decode is the one
# remaining honest stub (needs a codec library). mp4_metadata() gives
# the 100-TB-relevant cheap path: codec/frame-count/timing scan of a
# clip column WITHOUT decoding any pixel.


_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl",
                   b"edts", b"dinf", b"udta", b"mvex"}
_MP4_H26X = {b"avc1", b"avc2", b"avc3", b"avc4", b"hev1", b"hvc1",
             b"mp4v", b"vp09", b"av01"}


def _mp4_boxes(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) over an ISO-BMFF box run;
    handles 64-bit largesize (size==1) and to-end (size==0) boxes."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(buf[i:i + 4], "big")
        typ = buf[i + 4:i + 8]
        body = i + 8
        if size == 1:
            size = int.from_bytes(buf[i + 8:i + 16], "big")
            body = i + 16
        elif size == 0:
            size = end - i
        if size < body - i:
            raise MediaDecodeError(f"malformed MP4 box {typ!r}")
        yield typ, body, i + size
        i += size


def _mp4_find(buf: bytes, start: int, end: int, path: tuple):
    """Return (body_start, body_end) of the first box at `path` (a
    tuple of fourcc bytes), or None."""
    for typ, b0, b1 in _mp4_boxes(buf, start, end):
        if typ == path[0]:
            if len(path) == 1:
                return b0, b1
            return _mp4_find(buf, b0, b1, path[1:])
    return None


def _u32s(buf: bytes, at: int, n: int) -> np.ndarray:
    return np.frombuffer(buf, dtype=">u4", count=n, offset=at).astype(np.int64)


def _mp4_video_track(raw: bytes):
    """Parse the first video trak's sample tables. Returns a dict with
    codec fourcc, per-sample (offset, size) int64 arrays, width/height,
    timescale and the first stts delta."""
    if len(raw) < 12 or raw[4:8] != b"ftyp":
        raise MediaDecodeError("not an ISO-BMFF (MP4) payload")
    moov = _mp4_find(raw, 0, len(raw), (b"moov",))
    if moov is None:
        raise MediaDecodeError("MP4 has no moov box")
    for typ, t0, t1 in _mp4_boxes(raw, *moov):
        if typ != b"trak":
            continue
        mdia = _mp4_find(raw, t0, t1, (b"mdia",))
        if mdia is None:
            continue
        hdlr = _mp4_find(raw, *mdia, (b"hdlr",))
        if hdlr is None or raw[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        mdhd = _mp4_find(raw, *mdia, (b"mdhd",))
        if mdhd is None:
            raise MediaDecodeError("video trak has no mdhd")
        mver = raw[mdhd[0]]
        timescale = int.from_bytes(
            raw[mdhd[0] + (20 if mver else 12):][:4], "big")
        stbl = _mp4_find(raw, *mdia, (b"minf", b"stbl"))
        if stbl is None:
            raise MediaDecodeError("video trak has no stbl")
        boxes = {typ: (b0, b1) for typ, b0, b1 in _mp4_boxes(raw, *stbl)}
        missing = ({b"stsd", b"stsz", b"stsc"} - boxes.keys()) or (
            set() if (b"stco" in boxes or b"co64" in boxes) else {b"stco"})
        if missing:
            raise MediaDecodeError(
                f"MP4 stbl missing {sorted(m.decode() for m in missing)}")
        # stsd: first sample entry's fourcc + coded dims
        sd0, _ = boxes[b"stsd"]
        e0 = sd0 + 8  # version/flags + entry_count
        fourcc = raw[e0 + 4:e0 + 8]
        width = int.from_bytes(raw[e0 + 32:e0 + 34], "big")
        height = int.from_bytes(raw[e0 + 34:e0 + 36], "big")
        # stsz: per-sample sizes (uniform or table)
        z0, _ = boxes[b"stsz"]
        uniform = int.from_bytes(raw[z0 + 4:z0 + 8], "big")
        n_samples = int.from_bytes(raw[z0 + 8:z0 + 12], "big")
        sizes = (np.full(n_samples, uniform, dtype=np.int64) if uniform
                 else _u32s(raw, z0 + 12, n_samples))
        # stco / co64: chunk offsets
        if b"stco" in boxes:
            c0, _ = boxes[b"stco"]
            n_chunks = int.from_bytes(raw[c0 + 4:c0 + 8], "big")
            chunk_off = _u32s(raw, c0 + 8, n_chunks)
        else:
            c0, _ = boxes[b"co64"]
            n_chunks = int.from_bytes(raw[c0 + 4:c0 + 8], "big")
            chunk_off = np.frombuffer(
                raw, dtype=">u8", count=n_chunks, offset=c0 + 8
            ).astype(np.int64)
        # stsc: (first_chunk, samples_per_chunk) runs -> per-chunk counts
        s0, _ = boxes[b"stsc"]
        n_runs = int.from_bytes(raw[s0 + 4:s0 + 8], "big")
        runs = _u32s(raw, s0 + 8, n_runs * 3).reshape(n_runs, 3)
        if n_runs == 0 or int(runs[0, 0]) != 1:
            raise MediaDecodeError("MP4 stsc runs must start at chunk 1")
        per_chunk = np.zeros(n_chunks, dtype=np.int64)
        for ri in range(n_runs):
            first = int(runs[ri, 0]) - 1
            last = int(runs[ri + 1, 0]) - 1 if ri + 1 < n_runs else n_chunks
            per_chunk[first:last] = runs[ri, 1]
        if int(per_chunk.sum()) != n_samples:
            raise MediaDecodeError("MP4 stsc/stsz sample count mismatch")
        # within a chunk samples are consecutive: offsets by prefix scan
        ends = np.cumsum(sizes)
        starts = ends - sizes
        chunk_of = np.repeat(np.arange(n_chunks), per_chunk)
        chunk_first = np.concatenate(
            [[0], np.cumsum(per_chunk)[:-1]]) if n_chunks else np.array([], np.int64)
        offsets = chunk_off[chunk_of] + (starts - starts[chunk_first][chunk_of])
        # stts: first run's delta (constant-rate clips have one run)
        tt0, _ = boxes[b"stts"]
        delta = int.from_bytes(raw[tt0 + 12:tt0 + 16], "big") if int.from_bytes(
            raw[tt0 + 4:tt0 + 8], "big") else 0
        return {"codec": fourcc, "offsets": offsets, "sizes": sizes,
                "width": width, "height": height,
                "timescale": timescale, "delta": delta,
                "n_samples": n_samples}
    raise MediaDecodeError("MP4 has no video track")


def mp4_metadata(raw: bytes) -> dict:
    """Container-only scan (no pixel decode): codec fourcc, sample
    count, coded dims, usec-per-frame. The cheap first pass a video
    corpus runs at scale before deciding what to decode."""
    t = _mp4_video_track(raw)
    upf = (t["delta"] * 1_000_000 // t["timescale"]) if t["timescale"] else 0
    return {"codec": t["codec"].decode("latin1"),
            "n_frames": int(t["n_samples"]),
            "width": int(t["width"]), "height": int(t["height"]),
            "usec_per_frame": int(upf)}


def decode_mp4_mjpeg(raw: bytes):
    """REAL video decode for Motion-JPEG-in-MP4: full ISO-BMFF demux
    (see _mp4_video_track), then every sample through
    :func:`decode_jpeg`. Returns ``(frames, usec_per_frame)`` like
    :func:`decode_avi_mjpeg`. H.264-family sample entries raise
    MediaDecodeError — the demux is real, the motion-compensated
    entropy decode is the one codec this environment cannot supply."""
    t = _mp4_video_track(raw)
    if t["codec"] in _MP4_H26X:
        raise MediaDecodeError(
            f"MP4 video codec {t['codec']!r} needs a codec library "
            "(H.26x/VPx motion-compensated decode); container demux "
            "succeeded — use mp4_metadata() for the no-decode path")
    if t["codec"] not in (b"jpeg", b"mjpa", b"MJPG"):
        raise MediaDecodeError(f"unsupported MP4 video codec {t['codec']!r}")
    frames = [decode_jpeg(raw[o:o + s])
              for o, s in zip(t["offsets"], t["sizes"])]
    if not frames:
        raise MediaDecodeError("MP4 video track has no samples")
    upf = (t["delta"] * 1_000_000 // t["timescale"]) if t["timescale"] else 0
    return np.stack(frames), int(upf)


def encode_mp4_mjpeg(frames_u8, *, fps: int = 10, quality: int = 85) -> bytes:
    """(n, h, w, 3) uint8 -> minimal valid MJPEG-in-MP4 bytes (fixture
    generator): ftyp + mdat(JPEG samples) + moov with complete sample
    tables (stsd 'jpeg', stts, stsc, stsz, stco)."""
    frames_u8 = np.asarray(frames_u8, dtype=np.uint8)
    n, h, w = frames_u8.shape[:3]
    payloads = [encode_jpeg(f, quality=quality) for f in frames_u8]
    timescale = 1_000_000
    delta = timescale // fps
    dur = n * delta

    u32 = lambda v: int(v).to_bytes(4, "big")
    u16 = lambda v: int(v).to_bytes(2, "big")

    def box(typ: bytes, body: bytes) -> bytes:
        return u32(8 + len(body)) + typ + body

    def full(typ: bytes, verflags: int, body: bytes) -> bytes:
        return box(typ, u32(verflags) + body)

    ftyp = box(b"ftyp", b"isom" + u32(0x200) + b"isomiso2mp41")
    mdat_body = b"".join(payloads)
    mdat = box(b"mdat", mdat_body)
    first_off = len(ftyp) + 8  # mdat header precedes samples

    sizes = np.array([len(p) for p in payloads], dtype=np.int64)
    entry = (b"\x00" * 6 + u16(1)              # reserved + dref index
             + b"\x00" * 16                    # pre_defined/reserved
             + u16(w) + u16(h)
             + u32(0x00480000) + u32(0x00480000) + u32(0)
             + u16(1) + b"\x00" * 32 + u16(24) + u16(0xFFFF))
    stsd = full(b"stsd", 0, u32(1) + box(b"jpeg", entry))
    stts = full(b"stts", 0, u32(1) + u32(n) + u32(delta))
    stsc = full(b"stsc", 0, u32(1) + u32(1) + u32(n) + u32(1))
    stsz = full(b"stsz", 0, u32(0) + u32(n)
                + b"".join(u32(s) for s in sizes))
    stco = full(b"stco", 0, u32(1) + u32(first_off))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    dref = full(b"dref", 0, u32(1) + full(b"url ", 1, b""))
    vmhd = full(b"vmhd", 1, u16(0) + u16(0) * 3)
    minf = box(b"minf", vmhd + box(b"dinf", dref) + stbl)
    hdlr = full(b"hdlr", 0, u32(0) + b"vide" + b"\x00" * 12 + b"mjpeg\x00")
    mdhd = full(b"mdhd", 0, u32(0) + u32(0) + u32(timescale) + u32(dur)
                + u16(0x55C4) + u16(0))
    mdia = box(b"mdia", mdhd + hdlr + minf)
    matrix = (u32(0x00010000) + u32(0) * 3 + u32(0x00010000) + u32(0) * 3
              + u32(0x40000000))
    tkhd = full(b"tkhd", 7, u32(0) + u32(0) + u32(1) + u32(0) + u32(dur)
                + u32(0) * 2 + u16(0) * 4 + matrix
                + u32(w << 16) + u32(h << 16))
    trak = box(b"trak", tkhd + mdia)
    mvhd = full(b"mvhd", 0, u32(0) + u32(0) + u32(timescale) + u32(dur)
                + u32(0x00010000) + u16(0x0100) + b"\x00" * 10 + matrix
                + u32(0) * 6 + u32(2))
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# ------------------------------------------- H.264 intra (I_PCM) subset
#
# A REAL standards-subset H.264/AVC codec (ITU-T H.264 Annex B byte
# streams, baseline profile): Exp-Golomb SPS/PPS/slice-header syntax,
# emulation-prevention escaping, VUI timing, IDR slices whose
# macroblocks are all I_PCM (spec 7.3.5 / 8.3.5 — raw 4:2:0 samples,
# the lossless intra tool). This is the MJPEG-equivalent intra path:
# every frame decodes independently, no motion compensation. The
# CAVLC residual + intra-prediction path (and anything inter) remains
# out of scope and raises MediaDecodeError with the reason.


class _H264BitWriter:
    """MSB-first RBSP bit writer (no emulation escaping — that is a
    separate byte-level pass, per spec 7.4.1)."""

    def __init__(self):
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def u(self, val: int, nbits: int):
        for b in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((int(val) >> b) & 1)
            self._n += 1
            if self._n == 8:
                self.buf.append(self._acc)
                self._acc = 0
                self._n = 0

    def ue(self, v: int):
        code = int(v) + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def se(self, v: int):
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def align_zero(self):
        while self._n:
            self.u(0, 1)

    def raw_bytes(self, b: bytes):
        if self._n:
            raise ValueError("raw_bytes on unaligned writer")
        self.buf += b

    def trailing(self):
        self.u(1, 1)
        self.align_zero()


class _H264BitReader:
    """MSB-first RBSP bit reader with Exp-Golomb decode."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0

    def u(self, nbits: int) -> int:
        if self.pos + nbits > 8 * len(self.d):
            raise MediaDecodeError("truncated H.264 RBSP")
        v = 0
        for _ in range(nbits):
            byte = self.d[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise MediaDecodeError("bad Exp-Golomb code")
        return ((1 << zeros) | self.u(zeros)) - 1 if zeros else 0

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def byte_align(self):
        self.pos = (self.pos + 7) & ~7

    def raw_bytes(self, n: int) -> bytes:
        if self.pos & 7:
            raise MediaDecodeError("unaligned PCM samples")
        i = self.pos >> 3
        if i + n > len(self.d):
            raise MediaDecodeError("truncated PCM macroblock")
        self.pos += 8 * n
        return self.d[i:i + n]


def _ebsp_escape(rbsp: bytes) -> bytes:
    """Insert emulation_prevention_three_byte after every 00 00 that
    precedes a byte <= 0x03 (spec 7.4.1)."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 0x03:
            out.append(0x03)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _ebsp_unescape(ebsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    i, n = 0, len(ebsp)
    while i < n:
        b = ebsp[i]
        if zeros >= 2 and b == 0x03 and i + 1 < n and ebsp[i + 1] <= 0x03:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def _rgb_to_yuv420(img_u8: np.ndarray):
    """(h, w, 3) uint8 -> (Y, Cb, Cr) uint8 planes, chroma 2x2-mean
    subsampled — same JFIF/Rec.601 coefficients as the JPEG codec."""
    img = np.asarray(img_u8, dtype=np.float64)
    r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    def down(p):
        h2, w2 = p.shape[0] // 2 * 2, p.shape[1] // 2 * 2
        q = p[:h2, :w2]
        return (q[0::2, 0::2] + q[0::2, 1::2] + q[1::2, 0::2] + q[1::2, 1::2]) / 4.0

    to8 = lambda p: np.clip(np.round(p), 0, 255).astype(np.uint8)
    return to8(y), to8(down(cb)), to8(down(cr))


def _yuv420_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """uint8 planes -> (h, w, 3) float32 in [0, 1] (nearest-neighbour
    chroma upsample; inverse coefficients match decode_jpeg)."""
    yf = y.astype(np.float64)
    cbf = np.repeat(np.repeat(cb.astype(np.float64), 2, axis=0), 2, axis=1)
    crf = np.repeat(np.repeat(cr.astype(np.float64), 2, axis=0), 2, axis=1)
    cbf = cbf[: yf.shape[0], : yf.shape[1]] - 128.0
    crf = crf[: yf.shape[0], : yf.shape[1]] - 128.0
    rgb = np.stack(
        [yf + 1.402 * crf, yf - 0.344136 * cbf - 0.714136 * crf, yf + 1.772 * cbf],
        axis=2,
    )
    return (np.round(np.clip(rgb, 0.0, 255.0)).astype(np.float32) / np.float32(255))


_H264_START = b"\x00\x00\x00\x01"


def _h264_sps_rbsp(w_mbs: int, h_mbs: int, crop_r: int, crop_b: int, fps: int) -> bytes:
    w = _H264BitWriter()
    w.u(66, 8)          # profile_idc: baseline (implies 4:2:0, no SPS chroma fields)
    w.u(0, 8)           # constraint flags + reserved zero bits
    w.u(30, 8)          # level_idc 3.0
    w.ue(0)             # seq_parameter_set_id
    w.ue(0)             # log2_max_frame_num_minus4 -> frame_num is u(4)
    w.ue(2)             # pic_order_cnt_type: order == decode order (all-IDR)
    w.ue(1)             # max_num_ref_frames
    w.u(0, 1)           # gaps_in_frame_num_value_allowed_flag
    w.ue(w_mbs - 1)
    w.ue(h_mbs - 1)
    w.u(1, 1)           # frame_mbs_only_flag
    w.u(0, 1)           # direct_8x8_inference_flag
    crop = 1 if (crop_r or crop_b) else 0
    w.u(crop, 1)
    if crop:            # crop units are 2 luma samples for 4:2:0 frames
        w.ue(0)
        w.ue(crop_r // 2)
        w.ue(0)
        w.ue(crop_b // 2)
    w.u(1, 1)           # vui_parameters_present_flag
    w.u(0, 1)           # aspect_ratio_info_present_flag
    w.u(0, 1)           # overscan_info_present_flag
    w.u(0, 1)           # video_signal_type_present_flag
    w.u(0, 1)           # chroma_loc_info_present_flag
    w.u(1, 1)           # timing_info_present_flag
    w.u(1, 32)          # num_units_in_tick
    w.u(2 * fps, 32)    # time_scale (two ticks per frame)
    w.u(1, 1)           # fixed_frame_rate_flag
    w.u(0, 1)           # nal_hrd_parameters_present_flag
    w.u(0, 1)           # vcl_hrd_parameters_present_flag
    w.u(0, 1)           # pic_struct_present_flag
    w.u(0, 1)           # bitstream_restriction_flag
    w.trailing()
    return bytes(w.buf)


def _h264_pps_rbsp() -> bytes:
    w = _H264BitWriter()
    w.ue(0)             # pic_parameter_set_id
    w.ue(0)             # seq_parameter_set_id
    w.u(0, 1)           # entropy_coding_mode_flag: CAVLC
    w.u(0, 1)           # bottom_field_pic_order_in_frame_present_flag
    w.ue(0)             # num_slice_groups_minus1
    w.ue(0)             # num_ref_idx_l0_default_active_minus1
    w.ue(0)             # num_ref_idx_l1_default_active_minus1
    w.u(0, 1)           # weighted_pred_flag
    w.u(0, 2)           # weighted_bipred_idc
    w.se(0)             # pic_init_qp_minus26
    w.se(0)             # pic_init_qs_minus26
    w.se(0)             # chroma_qp_index_offset
    w.u(1, 1)           # deblocking_filter_control_present_flag
    w.u(0, 1)           # constrained_intra_pred_flag
    w.u(0, 1)           # redundant_pic_cnt_present_flag
    w.trailing()
    return bytes(w.buf)


def encode_h264_ipcm(frames_u8, *, fps: int = 10) -> bytes:
    """(n, h, w, 3) uint8 -> H.264 Annex B byte stream of all-I_PCM IDR
    frames (fixture generator / lossless-in-YUV intra encoder). h and w
    must be even (4:2:0 chroma + crop units of 2)."""
    frames_u8 = np.asarray(frames_u8, dtype=np.uint8)
    n, h, wdt = frames_u8.shape[:3]
    if h % 2 or wdt % 2:
        raise MediaDecodeError("I_PCM subset needs even frame dims (4:2:0)")
    w_mbs = (wdt + 15) // 16
    h_mbs = (h + 15) // 16
    pw, ph = 16 * w_mbs, 16 * h_mbs
    out = bytearray()
    out += _H264_START + b"\x67" + _ebsp_escape(
        _h264_sps_rbsp(w_mbs, h_mbs, pw - wdt, ph - h, fps))
    out += _H264_START + b"\x68" + _ebsp_escape(_h264_pps_rbsp())
    for fi in range(n):
        y, cb, cr = _rgb_to_yuv420(frames_u8[fi])
        yp = np.pad(y, ((0, ph - h), (0, pw - wdt)), mode="edge")
        cbp = np.pad(cb, ((0, (ph - h) // 2), (0, (pw - wdt) // 2)), mode="edge")
        crp = np.pad(cr, ((0, (ph - h) // 2), (0, (pw - wdt) // 2)), mode="edge")
        w = _H264BitWriter()
        w.ue(0)              # first_mb_in_slice
        w.ue(7)              # slice_type: I (all slices of this picture)
        w.ue(0)              # pic_parameter_set_id
        w.u(0, 4)            # frame_num (log2_max_frame_num == 4)
        w.ue(fi % 2)         # idr_pic_id (alternates per spec 7.4.3)
        w.u(0, 1)            # no_output_of_prior_pics_flag
        w.u(0, 1)            # long_term_reference_flag
        w.se(0)              # slice_qp_delta
        w.ue(1)              # disable_deblocking_filter_idc: off (conformant)
        for mby in range(h_mbs):
            for mbx in range(w_mbs):
                w.ue(25)     # mb_type: I_PCM
                w.align_zero()  # pcm_alignment_zero_bit
                w.raw_bytes(
                    yp[16 * mby:16 * mby + 16, 16 * mbx:16 * mbx + 16].tobytes())
                w.raw_bytes(
                    cbp[8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8].tobytes())
                w.raw_bytes(
                    crp[8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8].tobytes())
        w.trailing()
        out += _H264_START + b"\x65" + _ebsp_escape(bytes(w.buf))
    return bytes(out)


def _h264_nals(raw: bytes):
    """Split an Annex B byte stream on 00 00 (00) 01 start codes."""
    pos, n, nals = 0, len(raw), []
    while pos < n:
        i = raw.find(b"\x00\x00\x01", pos)
        if i < 0:
            break
        start = i + 3
        j = raw.find(b"\x00\x00\x01", start)
        end = j if j >= 0 else n
        nal = raw[start:end]
        while nal and nal[-1] == 0:   # trailing_zero_8bits of this NAL
            nal = nal[:-1]
        if nal:
            nals.append(nal)
        pos = end
    if not nals:
        raise MediaDecodeError("no Annex B start codes found")
    return nals


def _h264_parse_sps(r: "_H264BitReader") -> dict:
    profile = r.u(8)
    r.u(8)
    r.u(8)                       # constraint flags, level
    r.ue()                       # sps id
    if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        raise MediaDecodeError("only baseline-profile SPS supported")
    log2_mfn = r.ue() + 4
    poc_type = r.ue()
    if poc_type != 2:
        raise MediaDecodeError("only pic_order_cnt_type 2 supported")
    r.ue()                       # max_num_ref_frames
    r.u(1)                       # gaps_in_frame_num
    w_mbs = r.ue() + 1
    h_mbs = r.ue() + 1
    if r.u(1) != 1:              # frame_mbs_only_flag
        raise MediaDecodeError("interlaced H.264 not supported")
    r.u(1)                       # direct_8x8_inference_flag
    crop_r = crop_b = 0
    if r.u(1):                   # frame_cropping_flag
        r.ue()
        crop_r = 2 * r.ue()
        r.ue()
        crop_b = 2 * r.ue()
    upf = 0
    if r.u(1):                   # vui_parameters_present_flag
        if r.u(1):
            raise MediaDecodeError("aspect_ratio VUI not supported")
        if r.u(1):
            r.u(1)               # overscan_appropriate_flag
        if r.u(1):
            raise MediaDecodeError("video_signal_type VUI not supported")
        if r.u(1):
            r.ue()
            r.ue()               # chroma sample loc
        if r.u(1):               # timing_info_present_flag
            nuit = r.u(32)
            tscale = r.u(32)
            r.u(1)               # fixed_frame_rate_flag
            if tscale:
                upf = 2_000_000 * nuit // tscale
    return {
        "w_mbs": w_mbs, "h_mbs": h_mbs,
        "w": 16 * w_mbs - crop_r, "h": 16 * h_mbs - crop_b,
        "log2_max_frame_num": log2_mfn, "usec_per_frame": upf,
    }


# -------------------------- H.264 intra CAVLC (Intra_16x16) toolchain
#
# Extends the Annex B subset from I_PCM to the REAL compressed intra
# path of the baseline profile: Intra_16x16 luma prediction (V/H/DC/
# Plane, spec 8.3.3), 8x8 chroma intra prediction (DC/H/V/Plane,
# 8.3.4), the 4x4 integer core transform (8.5.12), the luma-DC 4x4
# Hadamard (8.5.10) and chroma-DC 2x2 Hadamard (8.5.11) hierarchies,
# scalar quantization, and CAVLC entropy coding (9.2: coeff_token
# Table 9-5, level prefix/suffix with the full escape ladder,
# total_zeros Tables 9-7/9-8, run_before Table 9-10). The encoder
# keeps the decoder-identical reconstruction (intra prediction feeds
# on reconstructed neighbours — pytest pins decoder == encoder recon
# bit-exactly) and falls back to I_PCM per macroblock when the
# entropy-coded payload would exceed the raw samples, so streams mix
# mb_type 25 and 1..24 like a real encoder's. Inter prediction lives
# in the P-slice toolchain further down; I_4x4 and CABAC remain out of
# scope and raise MediaDecodeError naming the missing tool.

_ZZ4 = [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
        (2, 1), (3, 0), (3, 1), (2, 2), (1, 3), (2, 3), (3, 2), (3, 3)]

# quant MF / dequant V per QP%6; columns = coefficient classes
# {(0,0),(0,2),(2,0),(2,2)} / {(1,1),(1,3),(3,1),(3,3)} / others
_H264_MF = [(13107, 5243, 8066), (11916, 4660, 7490), (10082, 4194, 6554),
            (9362, 3647, 5825), (8192, 3355, 5243), (7282, 2893, 4559)]
_H264_V = [(10, 16, 13), (11, 18, 14), (13, 20, 16),
           (14, 23, 18), (16, 25, 20), (18, 29, 23)]
# chroma QP mapping (spec Table 8-15, chroma_qp_index_offset 0)
_H264_QPC = list(range(30)) + [29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36,
                               36, 37, 37, 37, 38, 38, 38, 39, 39, 39, 39]

# in-loop deblocking thresholds (spec Tables 8-16 / 8-17, indexed by
# indexA/indexB = Clip3(0, 51, qPav + offset)); _H264_TC0 rows are
# bS 1, 2, 3
_H264_ALPHA = np.array(
    [0] * 16 + [4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25,
                28, 32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113,
                127, 144, 162, 182, 203, 226, 255, 255], np.int64)
_H264_BETA = np.array(
    [0] * 16 + [2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8, 9, 9,
                10, 10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16,
                17, 17, 18, 18], np.int64)
_H264_TC0 = np.array([
    [0] * 23 + [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 4,
                4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13],
    [0] * 21 + [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3,
                4, 4, 5, 5, 6, 7, 8, 8, 10, 11, 12, 13, 15, 17],
    [0] * 17 + [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 4,
                4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14, 16, 18, 20,
                23, 25],
], dtype=object)
_H264_TC0 = np.stack([np.asarray(r, np.int64) for r in _H264_TC0])


def _h264_qmat(tab):
    cls = [[0 if (r % 2 == 0 and c % 2 == 0) else
            1 if (r % 2 == 1 and c % 2 == 1) else 2
            for c in range(4)] for r in range(4)]
    return [np.array([[tab[m][cls[r][c]] for c in range(4)]
                      for r in range(4)], np.int64) for m in range(6)]


_MF4 = _h264_qmat(_H264_MF)
_V4 = _h264_qmat(_H264_V)

_CF = np.array([[1, 1, 1, 1], [2, 1, -1, -2],
                [1, -1, -1, 1], [1, -2, 2, -1]], np.int64)
_H4 = np.array([[1, 1, 1, 1], [1, 1, -1, -1],
                [1, -1, -1, 1], [1, -1, 1, -1]], np.int64)
_H2 = np.array([[1, 1], [1, -1]], np.int64)

# 4x4 luma block scan order within a macroblock (raster in quadrants),
# as (row, col) in 4x4-block units — neighbours always precede.
_BLK_ORDER = [(0, 0), (0, 1), (1, 0), (1, 1), (0, 2), (0, 3), (1, 2),
              (1, 3), (2, 0), (2, 1), (3, 0), (3, 1), (2, 2), (2, 3),
              (3, 2), (3, 3)]

# coeff_token VLCs (spec Table 9-5), keyed (TotalCoeff, TrailingOnes)
_CT_NC0 = {
    (0, 0): "1",
    (1, 0): "000101", (1, 1): "01",
    (2, 0): "00000111", (2, 1): "000100", (2, 2): "001",
    (3, 0): "000000111", (3, 1): "00000110", (3, 2): "0000101",
    (3, 3): "00011",
    (4, 0): "0000000111", (4, 1): "000000110", (4, 2): "00000101",
    (4, 3): "000011",
    (5, 0): "00000000111", (5, 1): "0000000110", (5, 2): "000000101",
    (5, 3): "0000100",
    (6, 0): "0000000001111", (6, 1): "00000000110", (6, 2): "0000000101",
    (6, 3): "00000100",
    (7, 0): "0000000001011", (7, 1): "0000000001110", (7, 2): "00000000101",
    (7, 3): "000000100",
    (8, 0): "0000000001000", (8, 1): "0000000001010",
    (8, 2): "0000000001101", (8, 3): "0000000100",
    (9, 0): "00000000001111", (9, 1): "00000000001110",
    (9, 2): "0000000001001", (9, 3): "00000000100",
    (10, 0): "00000000001011", (10, 1): "00000000001010",
    (10, 2): "00000000001101", (10, 3): "0000000001100",
    (11, 0): "000000000001111", (11, 1): "000000000001110",
    (11, 2): "00000000001001", (11, 3): "00000000001100",
    (12, 0): "000000000001011", (12, 1): "000000000001010",
    (12, 2): "000000000001101", (12, 3): "00000000001000",
    (13, 0): "0000000000001111", (13, 1): "000000000000001",
    (13, 2): "000000000001001", (13, 3): "000000000001100",
    (14, 0): "0000000000001011", (14, 1): "0000000000001110",
    (14, 2): "0000000000001101", (14, 3): "000000000001000",
    (15, 0): "0000000000000111", (15, 1): "0000000000001010",
    (15, 2): "0000000000001001", (15, 3): "0000000000001100",
    (16, 0): "0000000000000100", (16, 1): "0000000000000110",
    (16, 2): "0000000000000101", (16, 3): "0000000000001000",
}
_CT_NC2 = {
    (0, 0): "11",
    (1, 0): "001011", (1, 1): "10",
    (2, 0): "000111", (2, 1): "00111", (2, 2): "011",
    (3, 0): "0000111", (3, 1): "001010", (3, 2): "001001", (3, 3): "0101",
    (4, 0): "00000111", (4, 1): "000110", (4, 2): "000101", (4, 3): "0100",
    (5, 0): "00000100", (5, 1): "0000110", (5, 2): "0000101", (5, 3): "00110",
    (6, 0): "000000111", (6, 1): "00000110", (6, 2): "00000101",
    (6, 3): "001000",
    (7, 0): "00000001111", (7, 1): "000000110", (7, 2): "000000101",
    (7, 3): "000100",
    (8, 0): "00000001011", (8, 1): "00000001110", (8, 2): "00000001101",
    (8, 3): "0000100",
    (9, 0): "000000001111", (9, 1): "00000001010", (9, 2): "00000001001",
    (9, 3): "000000100",
    (10, 0): "000000001011", (10, 1): "000000001110",
    (10, 2): "000000001101", (10, 3): "00000001100",
    (11, 0): "000000001000", (11, 1): "000000001010",
    (11, 2): "000000001001", (11, 3): "00000001000",
    (12, 0): "0000000001111", (12, 1): "0000000001110",
    (12, 2): "0000000001101", (12, 3): "000000001100",
    (13, 0): "0000000001011", (13, 1): "0000000001010",
    (13, 2): "0000000001001", (13, 3): "0000000001100",
    (14, 0): "0000000000111", (14, 1): "00000000001011",
    (14, 2): "0000000000110", (14, 3): "0000000001000",
    (15, 0): "00000000001001", (15, 1): "00000000001000",
    (15, 2): "00000000001010", (15, 3): "0000000000001",
    (16, 0): "00000000000111", (16, 1): "00000000000110",
    (16, 2): "00000000000101", (16, 3): "00000000000100",
}
_CT_NC4 = {
    (0, 0): "1111",
    (1, 0): "001111", (1, 1): "1110",
    (2, 0): "001011", (2, 1): "01111", (2, 2): "1101",
    (3, 0): "001000", (3, 1): "01100", (3, 2): "01110", (3, 3): "1100",
    (4, 0): "0001111", (4, 1): "01010", (4, 2): "01011", (4, 3): "1011",
    (5, 0): "0001011", (5, 1): "01000", (5, 2): "01001", (5, 3): "1010",
    (6, 0): "0001001", (6, 1): "001110", (6, 2): "001101", (6, 3): "1001",
    (7, 0): "0001000", (7, 1): "001010", (7, 2): "001001", (7, 3): "1000",
    (8, 0): "00001111", (8, 1): "0001110", (8, 2): "0001101", (8, 3): "01101",
    (9, 0): "00001011", (9, 1): "00001110", (9, 2): "0001010",
    (9, 3): "001100",
    (10, 0): "000001111", (10, 1): "00001010", (10, 2): "00001101",
    (10, 3): "0001100",
    (11, 0): "000001011", (11, 1): "000001110", (11, 2): "00001001",
    (11, 3): "00001100",
    (12, 0): "000001000", (12, 1): "000001010", (12, 2): "000001101",
    (12, 3): "00001000",
    (13, 0): "0000001101", (13, 1): "000000111", (13, 2): "000001001",
    (13, 3): "000001100",
    (14, 0): "0000001001", (14, 1): "0000001100", (14, 2): "0000001011",
    (14, 3): "0000001010",
    (15, 0): "0000000101", (15, 1): "0000001000", (15, 2): "0000000111",
    (15, 3): "0000000110",
    (16, 0): "0000000001", (16, 1): "0000000100", (16, 2): "0000000011",
    (16, 3): "0000000010",
}
_CT_CHROMA_DC = {
    (0, 0): "01",
    (1, 0): "000111", (1, 1): "1",
    (2, 0): "000100", (2, 1): "000110", (2, 2): "001",
    (3, 0): "000011", (3, 1): "0000011", (3, 2): "0000010", (3, 3): "000101",
    (4, 0): "000010", (4, 1): "00000011", (4, 2): "00000010",
    (4, 3): "0000000",
}
_CT_TABLES = {0: _CT_NC0, 1: _CT_NC2, 2: _CT_NC4, "c": _CT_CHROMA_DC}

# total_zeros (Tables 9-7/9-8), row = TotalCoeff, col = total_zeros
_TZ4 = {
    1: ["1", "011", "010", "0011", "0010", "00011", "00010", "000011",
        "000010", "0000011", "0000010", "00000011", "00000010",
        "000000011", "000000010", "000000001"],
    2: ["111", "110", "101", "100", "011", "0101", "0100", "0011", "0010",
        "00011", "00010", "000011", "000010", "000001", "000000"],
    3: ["0101", "111", "110", "101", "0100", "0011", "100", "011", "0010",
        "00011", "00010", "000001", "00001", "000000"],
    4: ["00011", "111", "0101", "0100", "110", "101", "100", "0011", "011",
        "0010", "00010", "00001", "00000"],
    5: ["0101", "0100", "0011", "111", "110", "101", "100", "011", "0010",
        "00001", "0001", "00000"],
    6: ["000001", "00001", "111", "110", "101", "100", "011", "010",
        "0001", "001", "000000"],
    7: ["000001", "00001", "101", "100", "011", "11", "010", "0001", "001",
        "000000"],
    8: ["000001", "0001", "00001", "011", "11", "10", "010", "001",
        "000000"],
    9: ["000001", "000000", "0001", "11", "10", "001", "01", "00001"],
    10: ["00001", "00000", "001", "11", "10", "01", "0001"],
    11: ["0000", "0001", "001", "010", "1", "011"],
    12: ["0000", "0001", "01", "1", "001"],
    13: ["000", "001", "1", "01"],
    14: ["00", "01", "1"],
    15: ["0", "1"],
}
_TZC = {1: ["1", "01", "001", "000"], 2: ["1", "01", "00"], 3: ["1", "0"]}

# run_before (Table 9-10), row = zerosLeft (1..6; >6 handled in code)
_RUN = {
    1: ["1", "0"],
    2: ["1", "01", "00"],
    3: ["11", "10", "01", "00"],
    4: ["11", "10", "01", "001", "000"],
    5: ["11", "10", "011", "010", "001", "000"],
    6: ["11", "000", "001", "011", "010", "101", "100"],
}


def _vlc_decode_map(table):
    if isinstance(table, dict):
        return {code: key for key, code in table.items()}
    return {code: i for i, code in enumerate(table)}


_CT_DEC = {k: _vlc_decode_map(t) for k, t in _CT_TABLES.items()}
_TZ4_DEC = {tc: _vlc_decode_map(t) for tc, t in _TZ4.items()}
_TZC_DEC = {tc: _vlc_decode_map(t) for tc, t in _TZC.items()}
_RUN_DEC = {zl: _vlc_decode_map(t) for zl, t in _RUN.items()}


def _vlc_write(w, code: str):
    w.u(int(code, 2), len(code))


def _vlc_read(r: "_H264BitReader", dmap: dict, what: str):
    code = ""
    for _ in range(20):
        code += "01"[r.u(1)]
        hit = dmap.get(code)
        if hit is not None:
            return hit
    raise MediaDecodeError(f"invalid {what} VLC code")


def _ct_class(nC: int):
    if nC == -1:
        return "c"
    if nC < 2:
        return 0
    if nC < 4:
        return 1
    if nC < 8:
        return 2
    return "f"


def _write_coeff_token(w, tc: int, t1: int, nC: int):
    cls = _ct_class(nC)
    if cls == "f":
        w.u(3 if tc == 0 else ((tc - 1) << 2) | t1, 6)
    else:
        _vlc_write(w, _CT_TABLES[cls][(tc, t1)])


def _read_coeff_token(r, nC: int):
    cls = _ct_class(nC)
    if cls == "f":
        v = r.u(6)
        return (0, 0) if v == 3 else ((v >> 2) + 1, v & 3)
    return _vlc_read(r, _CT_DEC[cls], "coeff_token")


def _write_level(w, level_code: int, sl: int):
    if sl == 0 and level_code < 14:
        w.u(1, level_code + 1)            # level_code zeros then a 1
        return
    if sl == 0 and level_code < 30:
        w.u(1, 15)                        # level_prefix 14
        w.u(level_code - 14, 4)
        return
    if sl > 0 and (level_code >> sl) < 15:
        w.u(1, (level_code >> sl) + 1)
        w.u(level_code & ((1 << sl) - 1), sl)
        return
    # escape ladder: prefix p >= 15 carries a (p-3)-bit suffix
    p, lo = 15, (15 << sl) + (15 if sl == 0 else 0)
    while level_code >= lo + (1 << (p - 3)):
        lo += 1 << (p - 3)
        p += 1
    w.u(1, p + 1)
    w.u(level_code - lo, p - 3)


def _read_level(r, sl: int) -> int:
    p = 0
    while r.u(1) == 0:
        p += 1
        if p > 31:
            raise MediaDecodeError("bad CAVLC level_prefix")
    if sl == 0 and p == 14:
        size = 4
    elif p >= 15:
        size = p - 3
    else:
        size = sl
    suffix = r.u(size) if size else 0
    level_code = (min(15, p) << sl) + suffix
    if p >= 15 and sl == 0:
        level_code += 15
    if p >= 16:
        level_code += (1 << (p - 3)) - 4096
    return level_code


def _cavlc_encode_block(w, coeffs, nC: int, max_coeff: int) -> int:
    """CAVLC-encode one scan-ordered coefficient block (spec 9.2);
    returns TotalCoeff for the caller's nnz bookkeeping."""
    nz = [i for i, c in enumerate(coeffs) if c]
    tc = len(nz)
    t1 = 0
    for i in reversed(nz):
        if abs(int(coeffs[i])) == 1 and t1 < 3:
            t1 += 1
        else:
            break
    _write_coeff_token(w, tc, t1, nC)
    if tc == 0:
        return 0
    for j in range(t1):                       # trailing-one signs
        w.u(1 if coeffs[nz[-1 - j]] < 0 else 0, 1)
    sl = 1 if (tc > 10 and t1 < 3) else 0
    for j in range(t1, tc):
        lvl = int(coeffs[nz[-1 - j]])
        level_code = 2 * abs(lvl) - 2 + (1 if lvl < 0 else 0)
        if j == t1 and t1 < 3:
            level_code -= 2                   # first level is never +-1 then
        _write_level(w, level_code, sl)
        if sl == 0:
            sl = 1
        if abs(lvl) > (3 << (sl - 1)) and sl < 6:
            sl += 1
    tz = nz[-1] + 1 - tc
    if tc < max_coeff:
        if max_coeff == 4:
            _vlc_write(w, _TZC[tc][tz])
        else:
            _vlc_write(w, _TZ4[tc][tz])
    zeros_left = tz
    for j in range(tc - 1):
        if zeros_left == 0:
            break
        run = nz[-1 - j] - nz[-2 - j] - 1
        if zeros_left <= 6:
            _vlc_write(w, _RUN[zeros_left][run])
        elif run <= 6:
            w.u(7 - run, 3)
        else:
            w.u(1, run - 3)                   # (run-4) zeros then a 1
        zeros_left -= run
    return tc


def _cavlc_decode_block(r, nC: int, max_coeff: int):
    """Decode one CAVLC block -> (scan-ordered int64 coeffs, TotalCoeff)."""
    tc, t1 = _read_coeff_token(r, nC)
    out = np.zeros(max_coeff, np.int64)
    if tc == 0:
        return out, 0
    if tc > max_coeff:
        raise MediaDecodeError("CAVLC TotalCoeff exceeds block size")
    levels = []
    for _ in range(t1):
        levels.append(-1 if r.u(1) else 1)
    sl = 1 if (tc > 10 and t1 < 3) else 0
    for j in range(t1, tc):
        lc = _read_level(r, sl)
        if j == t1 and t1 < 3:
            lc += 2
        lvl = (lc + 2) >> 1 if lc % 2 == 0 else -((lc + 1) >> 1)
        levels.append(lvl)
        if sl == 0:
            sl = 1
        if abs(lvl) > (3 << (sl - 1)) and sl < 6:
            sl += 1
    if tc < max_coeff:
        dmap = _TZC_DEC[tc] if max_coeff == 4 else _TZ4_DEC[tc]
        tz = _vlc_read(r, dmap, "total_zeros")
    else:
        tz = 0
    zeros_left = tz
    idx = tc - 1 + tz
    for j in range(tc):
        if idx < 0 or idx >= max_coeff:
            raise MediaDecodeError("CAVLC run/zeros overflow")
        out[idx] = levels[j]
        if j == tc - 1:
            break
        run = 0
        if zeros_left > 6:
            b = r.u(3)
            if b:
                run = 7 - b
            else:
                run = 7
                while r.u(1) == 0:
                    run += 1
                    if run > max_coeff:
                        raise MediaDecodeError("bad run_before code")
        elif zeros_left > 0:
            run = _vlc_read(r, _RUN_DEC[zeros_left], "run_before")
        zeros_left -= run
        idx -= run + 1
    return out, tc


def _inv4x4(d: np.ndarray) -> np.ndarray:
    """Inverse 4x4 core transform (spec 8.5.12.2): horizontal then
    vertical butterfly with >>1 half-pel taps, final (x+32)>>6."""
    def bpass(m):            # combines along axis 0
        e0 = m[0] + m[2]
        e1 = m[0] - m[2]
        e2 = (m[1] >> 1) - m[3]
        e3 = m[1] + (m[3] >> 1)
        return np.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3])
    t = bpass(d.T).T         # rows
    t = bpass(t)             # columns
    return (t + 32) >> 6


def _quant_ac(W: np.ndarray, qp: int) -> np.ndarray:
    m, s = qp % 6, 15 + qp // 6
    fq = (1 << s) // 3
    lv = (np.abs(W) * _MF4[m] + fq) >> s
    return np.where(W < 0, -lv, lv)


def _quant_dc(had: np.ndarray, qp: int) -> np.ndarray:
    # forward DC quant = JM's halved-Hadamard + (qbits+1) shift; with
    # the dequant scalings below the whole DC chain is gain-exact
    # against the AC path (V00*MF00 = 131070 ~ 2^17)
    m, s = qp % 6, 15 + qp // 6
    fq = (1 << s) // 3
    lv = ((np.abs(had) >> 1) * _H264_MF[m][0] + 2 * fq) >> (s + 1)
    return np.where(had < 0, -lv, lv)


def _dequant_ac(levels: np.ndarray, qp: int) -> np.ndarray:
    return (levels * _V4[qp % 6]) << (qp // 6)


def _dequant_luma_dc(levels: np.ndarray, qp: int) -> np.ndarray:
    f = _H4 @ levels @ _H4
    v00 = _H264_V[qp % 6][0]
    if qp >= 12:
        return (f * v00) << (qp // 6 - 2)
    sh = 2 - qp // 6
    return (f * v00 + (1 << (sh - 1))) >> sh


def _dequant_chroma_dc(levels: np.ndarray, qpc: int) -> np.ndarray:
    # 2x2 Hadamard gain is 4 (vs 16 for the luma 4x4), so the chroma
    # path needs no analogue of 8.5.10's >>2 — plain V00 scaling is
    # the gain-exact inverse of _quant_dc here
    f = _H2 @ levels @ _H2
    return (f * _H264_V[qpc % 6][0]) << (qpc // 6)


def _pred_i16(mode: int, top, left, tl):
    """Intra_16x16 luma prediction (spec 8.3.3): 0=V 1=H 2=DC 3=Plane.
    top/left are reconstructed 16-sample borders (None if unavailable)."""
    if mode == 0:
        return np.repeat(top[None, :], 16, 0)
    if mode == 1:
        return np.repeat(left[:, None], 16, 1)
    if mode == 2:
        if top is not None and left is not None:
            d = (int(top.sum()) + int(left.sum()) + 16) >> 5
        elif top is not None:
            d = (int(top.sum()) + 8) >> 4
        elif left is not None:
            d = (int(left.sum()) + 8) >> 4
        else:
            d = 128
        return np.full((16, 16), d, np.int64)
    et = np.concatenate(([tl], top)).astype(np.int64)
    el = np.concatenate(([tl], left)).astype(np.int64)
    xs = np.arange(8, dtype=np.int64)
    hh = int(np.sum((xs + 1) * (et[9 + xs] - et[7 - xs])))
    vv = int(np.sum((xs + 1) * (el[9 + xs] - el[7 - xs])))
    a = 16 * (int(top[15]) + int(left[15]))
    b = (5 * hh + 32) >> 6
    c = (5 * vv + 32) >> 6
    yy, xx = np.mgrid[0:16, 0:16]
    return np.clip((a + b * (xx - 7) + c * (yy - 7) + 16) >> 5, 0, 255)


def _pred_chroma(mode: int, top, left, tl):
    """8x8 chroma intra prediction (spec 8.3.4): 0=DC (per-4x4-quadrant
    neighbour rules) 1=H 2=V 3=Plane."""
    if mode == 0:
        p = np.empty((8, 8), np.int64)
        t0 = top[0:4] if top is not None else None
        t1 = top[4:8] if top is not None else None
        l0 = left[0:4] if left is not None else None
        l1 = left[4:8] if left is not None else None

        def both(ts, ls):
            if ts is not None and ls is not None:
                return (int(ts.sum()) + int(ls.sum()) + 4) >> 3
            if ts is not None:
                return (int(ts.sum()) + 2) >> 2
            if ls is not None:
                return (int(ls.sum()) + 2) >> 2
            return 128

        p[0:4, 0:4] = both(t0, l0)
        p[0:4, 4:8] = ((int(t1.sum()) + 2) >> 2 if t1 is not None else
                       (int(l0.sum()) + 2) >> 2 if l0 is not None else 128)
        p[4:8, 0:4] = ((int(l1.sum()) + 2) >> 2 if l1 is not None else
                       (int(t0.sum()) + 2) >> 2 if t0 is not None else 128)
        p[4:8, 4:8] = both(t1, l1)
        return p
    if mode == 1:
        return np.repeat(left[:, None], 8, 1)
    if mode == 2:
        return np.repeat(top[None, :], 8, 0)
    et = np.concatenate(([tl], top)).astype(np.int64)
    el = np.concatenate(([tl], left)).astype(np.int64)
    xs = np.arange(4, dtype=np.int64)
    hh = int(np.sum((xs + 1) * (et[5 + xs] - et[3 - xs])))
    vv = int(np.sum((xs + 1) * (el[5 + xs] - el[3 - xs])))
    a = 16 * (int(top[7]) + int(left[7]))
    b = (34 * hh + 32) >> 6
    c = (34 * vv + 32) >> 6
    yy, xx = np.mgrid[0:8, 0:8]
    return np.clip((a + b * (xx - 3) + c * (yy - 3) + 16) >> 5, 0, 255)


# Table 9-4, Intra_4x4 column (coded_block_pattern me() mapping)
_CBP_INTRA = [47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43,
              45, 46, 16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42,
              44, 1, 2, 4, 8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33,
              34, 36, 40, 38, 41]
_CBP_INTRA_ENC = {v: i for i, v in enumerate(_CBP_INTRA)}


def _pred_i4(mode: int, t8, l4, tl):
    """One Intra_4x4 luma predictor (spec 8.3.1.2.1-8.3.1.2.9).

    ``t8`` = p[0..7, -1] (top + top-right, the caller substitutes
    p[3,-1] into x=4..7 when top-right is unavailable), ``l4`` =
    p[-1, 0..3], ``tl`` = p[-1, -1]; any of them None when
    unavailable — the caller only requests modes whose required
    neighbours exist (a conformant stream never codes others).
    Returns the 4x4 int64 prediction."""
    pr = np.empty((4, 4), np.int64)
    T = lambda i: tl if i == -1 else int(t8[i])
    L = lambda i: tl if i == -1 else int(l4[i])
    if mode == 0:                          # Vertical
        pr[:] = np.asarray(t8[:4], np.int64)[None, :]
    elif mode == 1:                        # Horizontal
        pr[:] = np.asarray(l4, np.int64)[:, None]
    elif mode == 2:                        # DC
        if t8 is not None and l4 is not None:
            pr[:] = (int(np.sum(t8[:4])) + int(np.sum(l4)) + 4) >> 3
        elif t8 is not None:
            pr[:] = (int(np.sum(t8[:4])) + 2) >> 2
        elif l4 is not None:
            pr[:] = (int(np.sum(l4)) + 2) >> 2
        else:
            pr[:] = 128
    elif mode == 3:                        # Diagonal-Down-Left
        for y in range(4):
            for x in range(4):
                if x == 3 and y == 3:
                    pr[y, x] = (T(6) + 3 * T(7) + 2) >> 2
                else:
                    pr[y, x] = (T(x + y) + 2 * T(x + y + 1)
                                + T(x + y + 2) + 2) >> 2
    elif mode == 4:                        # Diagonal-Down-Right
        for y in range(4):
            for x in range(4):
                if x > y:
                    pr[y, x] = (T(x - y - 2) + 2 * T(x - y - 1)
                                + T(x - y) + 2) >> 2
                elif x < y:
                    pr[y, x] = (L(y - x - 2) + 2 * L(y - x - 1)
                                + L(y - x) + 2) >> 2
                else:
                    pr[y, x] = (T(0) + 2 * tl + L(0) + 2) >> 2
    elif mode == 5:                        # Vertical-Right
        for y in range(4):
            for x in range(4):
                z = 2 * x - y
                if z >= 0 and z % 2 == 0:
                    pr[y, x] = (T(x - (y >> 1) - 1)
                                + T(x - (y >> 1)) + 1) >> 1
                elif z >= 0:
                    pr[y, x] = (T(x - (y >> 1) - 2)
                                + 2 * T(x - (y >> 1) - 1)
                                + T(x - (y >> 1)) + 2) >> 2
                elif z == -1:
                    pr[y, x] = (L(0) + 2 * tl + T(0) + 2) >> 2
                else:
                    pr[y, x] = (L(y - 2 * x - 1)
                                + 2 * L(y - 2 * x - 2)
                                + L(y - 2 * x - 3) + 2) >> 2
    elif mode == 6:                        # Horizontal-Down
        for y in range(4):
            for x in range(4):
                z = 2 * y - x
                if z >= 0 and z % 2 == 0:
                    pr[y, x] = (L(y - (x >> 1) - 1)
                                + L(y - (x >> 1)) + 1) >> 1
                elif z >= 0:
                    pr[y, x] = (L(y - (x >> 1) - 2)
                                + 2 * L(y - (x >> 1) - 1)
                                + L(y - (x >> 1)) + 2) >> 2
                elif z == -1:
                    pr[y, x] = (L(0) + 2 * tl + T(0) + 2) >> 2
                else:
                    pr[y, x] = (T(x - 2 * y - 1)
                                + 2 * T(x - 2 * y - 2)
                                + T(x - 2 * y - 3) + 2) >> 2
    elif mode == 7:                        # Vertical-Left
        for y in range(4):
            for x in range(4):
                i = x + (y >> 1)
                if y % 2 == 0:
                    pr[y, x] = (T(i) + T(i + 1) + 1) >> 1
                else:
                    pr[y, x] = (T(i) + 2 * T(i + 1) + T(i + 2) + 2) >> 2
    elif mode == 8:                        # Horizontal-Up
        for y in range(4):
            for x in range(4):
                z = x + 2 * y
                if z < 5 and z % 2 == 0:
                    pr[y, x] = (L(y + (x >> 1))
                                + L(y + (x >> 1) + 1) + 1) >> 1
                elif z < 5:
                    pr[y, x] = (L(y + (x >> 1))
                                + 2 * L(y + (x >> 1) + 1)
                                + L(y + (x >> 1) + 2) + 2) >> 2
                elif z == 5:
                    pr[y, x] = (L(2) + 3 * L(3) + 2) >> 2
                else:
                    pr[y, x] = L(3)
    else:
        raise MediaDecodeError(f"bad intra_4x4 pred mode {mode}")
    return pr


def _i4_neigh(yp, blk_done, by, bx):
    """Neighbour samples + availability for the 4x4 luma block at
    global block coords (by, bx): returns (t8, l4, tl) with None for
    unavailable sides. Top-right samples come from the block above-
    right only if it is ALREADY DECODED (``blk_done``, maintained in
    raster/blkIdx order — exactly the spec's decode-order rule);
    otherwise p[4..7,-1] substitute p[3,-1] (8.3.1.2)."""
    y0, x0 = 4 * by, 4 * bx
    n4w = yp.shape[1] // 4
    t8 = None
    if by > 0:
        t4 = yp[y0 - 1, x0:x0 + 4].astype(np.int64)
        if bx + 1 < n4w and blk_done[by - 1, bx + 1]:
            tr = yp[y0 - 1, x0 + 4:x0 + 8].astype(np.int64)
        else:
            tr = np.full(4, int(t4[3]), np.int64)
        t8 = np.concatenate([t4, tr])
    l4 = yp[y0:y0 + 4, x0 - 1].astype(np.int64) if bx > 0 else None
    tl = int(yp[y0 - 1, x0 - 1]) if (by > 0 and bx > 0) else None
    return t8, l4, tl


def _i4_legal_modes(t8, l4, tl):
    """Modes whose required neighbours exist (V/DDL/VL need top,
    H/HU need left, DDR/VR/HD need left+top+corner, DC always)."""
    modes = [2]
    if t8 is not None:
        modes += [0, 3, 7]
    if l4 is not None:
        modes += [1, 8]
    if t8 is not None and l4 is not None and tl is not None:
        modes += [4, 5, 6]
    return sorted(modes)


def _i4_pred_mode(i4mode, by, bx):
    """predIntra4x4PredMode (8.3.1.1): min of the left/above blocks'
    modes, where a block outside the picture is unavailable (-> DC)
    and a block in a non-Intra_4x4 macroblock counts as DC (grid
    stores -1 for those)."""
    a = int(i4mode[by, bx - 1]) if bx > 0 else -1
    b = int(i4mode[by - 1, bx]) if by > 0 else -1
    if bx > 0 and a < 0:
        a = 2
    if by > 0 and b < 0:
        b = 2
    if a < 0 or b < 0:
        return 2
    return min(a, b)


def _nc_from(grid: np.ndarray, by: int, bx: int) -> int:
    """CAVLC nC from neighbouring blocks' TotalCoeff (spec 9.2.1);
    availability is picture-bounded (single slice per frame)."""
    na = int(grid[by, bx - 1]) if bx > 0 else -1
    nb = int(grid[by - 1, bx]) if by > 0 else -1
    if na >= 0 and nb >= 0:
        return (na + nb + 1) >> 1
    if na >= 0:
        return na
    if nb >= 0:
        return nb
    return 0


class _H264Ops:
    """Replayable bit-op recorder for the per-MB CAVLC-vs-I_PCM choice."""

    __slots__ = ("ops", "bits")

    def __init__(self):
        self.ops = []
        self.bits = 0

    def u(self, v, n):
        self.ops.append((int(v), int(n)))
        self.bits += n

    def ue(self, v):
        code = int(v) + 1
        n = 2 * code.bit_length() - 1
        self.ops.append((code, n))
        self.bits += n

    def se(self, v):
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def replay(self, w: "_H264BitWriter"):
        for v, n in self.ops:
            w.u(v, n)


def _h264_scan_ac(block: np.ndarray) -> np.ndarray:
    return np.array([block[r, c] for r, c in _ZZ4[1:]], np.int64)


def _h264_unscan_ac(scan: np.ndarray) -> np.ndarray:
    out = np.zeros((4, 4), np.int64)
    for i, (r, c) in enumerate(_ZZ4[1:]):
        out[r, c] = scan[i]
    return out


def _enc_mb_intra16(w, yp, cbp, crp, ry, rcb, rcr, nnz_y, nnz_c, qp,
                    mby, mbx, pcm_threshold, type_base=0):
    """Encode ONE I_PCM / Intra_16x16+CAVLC macroblock into slice
    writer ``w`` and the decoder-identical recon planes (shared by the
    I-slice encoder and the intra fallback inside P slices, which
    passes ``type_base=5`` per the 7.4.5 mb_type mapping). Returns
    "pcm" or "i16"."""
    qpc = _H264_QPC[max(0, min(51, qp))]
    oy = yp[16 * mby:16 * mby + 16, 16 * mbx:16 * mbx + 16
            ].astype(np.int64)
    ltop = (ry[16 * mby - 1, 16 * mbx:16 * mbx + 16].astype(np.int64)
            if mby > 0 else None)
    lleft = (ry[16 * mby:16 * mby + 16, 16 * mbx - 1].astype(np.int64)
             if mbx > 0 else None)
    ltl = (int(ry[16 * mby - 1, 16 * mbx - 1])
           if (mby > 0 and mbx > 0) else None)
    lmodes = ([0] if ltop is not None else []) + \
        ([1] if lleft is not None else []) + [2] + \
        ([3] if ltl is not None else [])
    best = None
    for md in sorted(lmodes):
        pr = _pred_i16(md, ltop, lleft, ltl)
        sad = int(np.abs(oy - pr).sum())
        if best is None or sad < best[0]:
            best = (sad, md, pr)
    _, lmode, lpred = best
    res = oy - lpred
    W = np.empty((4, 4, 4, 4), np.int64)
    for br in range(4):
        for bc in range(4):
            W[br, bc] = _CF @ res[4 * br:4 * br + 4,
                                  4 * bc:4 * bc + 4] @ _CF.T
    dc_lv = _quant_dc(_H4 @ W[:, :, 0, 0] @ _H4, qp)
    ac_lv = _quant_ac(W, qp)
    ac_lv[:, :, 0, 0] = 0
    cbp_luma = 15 if ac_lv.any() else 0
    # chroma: one mode for both planes, min combined SAD
    och = {"cb": cbp[8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8
                     ].astype(np.int64),
           "cr": crp[8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8
                     ].astype(np.int64)}
    rpl = {"cb": rcb, "cr": rcr}
    ctop = {k: (rpl[k][8 * mby - 1, 8 * mbx:8 * mbx + 8
                       ].astype(np.int64) if mby > 0 else None)
            for k in och}
    cleft = {k: (rpl[k][8 * mby:8 * mby + 8, 8 * mbx - 1
                        ].astype(np.int64) if mbx > 0 else None)
             for k in och}
    ctl = {k: (int(rpl[k][8 * mby - 1, 8 * mbx - 1])
               if (mby > 0 and mbx > 0) else None) for k in och}
    cmodes = [0] + ([1] if mbx > 0 else []) + \
        ([2] if mby > 0 else []) + \
        ([3] if (mby > 0 and mbx > 0) else [])
    cbest = None
    for md in cmodes:
        sad = sum(int(np.abs(och[k] - _pred_chroma(
            md, ctop[k], cleft[k], ctl[k])).sum()) for k in och)
        if cbest is None or sad < cbest[0]:
            cbest = (sad, md)
    cmode = cbest[1]
    cpred = {k: _pred_chroma(cmode, ctop[k], cleft[k], ctl[k])
             for k in och}
    cdc_lv, cac_lv = {}, {}
    for k in och:
        cres = och[k] - cpred[k]
        Wk = np.empty((2, 2, 4, 4), np.int64)
        for br in range(2):
            for bc in range(2):
                Wk[br, bc] = _CF @ cres[4 * br:4 * br + 4,
                                        4 * bc:4 * bc + 4] @ _CF.T
        cdc_lv[k] = _quant_dc(_H2 @ Wk[:, :, 0, 0] @ _H2, qpc)
        ak = _quant_ac(Wk, qpc)
        ak[:, :, 0, 0] = 0
        cac_lv[k] = ak
    ac_any = any(cac_lv[k].any() for k in och)
    dc_any = any(cdc_lv[k].any() for k in och)
    cbp_chroma = 2 if ac_any else (1 if dc_any else 0)
    # ---- CAVLC bit recording (committed unless I_PCM is cheaper)
    mb = _H264Ops()
    mb.ue(type_base + 1 + lmode + 4 * cbp_chroma +
          12 * (1 if cbp_luma else 0))
    mb.ue(cmode)
    mb.se(0)          # mb_qp_delta
    dc_scan = np.array([dc_lv[r, c] for r, c in _ZZ4], np.int64)
    _cavlc_encode_block(mb, dc_scan,
                        _nc_from(nnz_y, 4 * mby, 4 * mbx), 16)
    if cbp_luma:
        for br, bc in _BLK_ORDER:
            gy, gx = 4 * mby + br, 4 * mbx + bc
            nnz_y[gy, gx] = _cavlc_encode_block(
                mb, _h264_scan_ac(ac_lv[br, bc]),
                _nc_from(nnz_y, gy, gx), 15)
    else:
        nnz_y[4 * mby:4 * mby + 4, 4 * mbx:4 * mbx + 4] = 0
    if cbp_chroma:
        for k in ("cb", "cr"):
            lv = cdc_lv[k]
            _cavlc_encode_block(
                mb, np.array([lv[0, 0], lv[0, 1], lv[1, 0],
                              lv[1, 1]], np.int64), -1, 4)
    if cbp_chroma == 2:
        for k in ("cb", "cr"):
            for br in range(2):
                for bc in range(2):
                    gy, gx = 2 * mby + br, 2 * mbx + bc
                    nnz_c[k][gy, gx] = _cavlc_encode_block(
                        mb, _h264_scan_ac(cac_lv[k][br, bc]),
                        _nc_from(nnz_c[k], gy, gx), 15)
    else:
        for k in ("cb", "cr"):
            nnz_c[k][2 * mby:2 * mby + 2, 2 * mbx:2 * mbx + 2] = 0
    if mb.bits > pcm_threshold:
        # I_PCM beats the entropy-coded payload: emit raw samples
        nnz_y[4 * mby:4 * mby + 4, 4 * mbx:4 * mbx + 4] = 16
        for k in och:
            nnz_c[k][2 * mby:2 * mby + 2, 2 * mbx:2 * mbx + 2] = 16
        w.ue(type_base + 25)
        w.align_zero()
        w.raw_bytes(yp[16 * mby:16 * mby + 16,
                       16 * mbx:16 * mbx + 16].tobytes())
        w.raw_bytes(cbp[8 * mby:8 * mby + 8,
                        8 * mbx:8 * mbx + 8].tobytes())
        w.raw_bytes(crp[8 * mby:8 * mby + 8,
                        8 * mbx:8 * mbx + 8].tobytes())
        ry[16 * mby:16 * mby + 16, 16 * mbx:16 * mbx + 16] = \
            yp[16 * mby:16 * mby + 16, 16 * mbx:16 * mbx + 16]
        rcb[8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8] = \
            cbp[8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8]
        rcr[8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8] = \
            crp[8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8]
        return "pcm"
    mb.replay(w)
    # ---- decoder-identical reconstruction
    dcy = _dequant_luma_dc(dc_lv, qp)
    rymb = np.empty((16, 16), np.int64)
    for br in range(4):
        for bc in range(4):
            d = (_dequant_ac(ac_lv[br, bc], qp) if cbp_luma
                 else np.zeros((4, 4), np.int64))
            d[0, 0] = dcy[br, bc]
            rymb[4 * br:4 * br + 4, 4 * bc:4 * bc + 4] = \
                lpred[4 * br:4 * br + 4, 4 * bc:4 * bc + 4] + \
                _inv4x4(d)
    ry[16 * mby:16 * mby + 16, 16 * mbx:16 * mbx + 16] = \
        np.clip(rymb, 0, 255).astype(yp.dtype)
    for k, rp in (("cb", rcb), ("cr", rcr)):
        dcc = (_dequant_chroma_dc(cdc_lv[k], qpc) if cbp_chroma
               else np.zeros((2, 2), np.int64))
        rcmb = np.empty((8, 8), np.int64)
        for br in range(2):
            for bc in range(2):
                d = (_dequant_ac(cac_lv[k][br, bc], qpc)
                     if cbp_chroma == 2 else np.zeros((4, 4),
                                                      np.int64))
                d[0, 0] = dcc[br, bc]
                rcmb[4 * br:4 * br + 4, 4 * bc:4 * bc + 4] = \
                    cpred[k][4 * br:4 * br + 4,
                             4 * bc:4 * bc + 4] + _inv4x4(d)
        rp[8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8] = \
            np.clip(rcmb, 0, 255).astype(cbp.dtype)
    return "i16"


def _enc_mb_intra4_build(yp, cbp, crp, ry, rcb, rcr, nnz_y, nnz_c,
                         qp, mby, mbx, i4mode, blk_done, type_base):
    """Build the Intra_4x4 candidate for one MB WITHOUT touching any
    shared state: per-4x4 mode search with sequential reconstruction
    feedback (each block predicts from already-reconstructed
    neighbours, quantized residual included — decoder-identical),
    chroma exactly as Intra_16x16, coded_block_pattern through the
    Intra column of Table 9-4. Returns (ops, sad, rymb, chroma-recon,
    modes, local nnz copies, local i4mode/blk_done copies) for the
    caller to commit or discard."""
    qpc = _H264_QPC[max(0, min(51, qp))]
    nny = nnz_y.copy()
    nnc = {k: nnz_c[k].copy() for k in ("cb", "cr")}
    i4m = i4mode.copy()
    done = blk_done.copy()
    oy = yp[16 * mby:16 * mby + 16, 16 * mbx:16 * mbx + 16
            ].astype(np.int64)
    rymb = ry[16 * mby:16 * mby + 16, 16 * mbx:16 * mbx + 16
              ].astype(np.int64)
    # the recon plane region for this MB is rebuilt block by block;
    # neighbour reads go through a scratch copy of the full plane so
    # cross-MB samples are the real partial recon
    plane = ry.copy()
    sad = 0
    modes = []
    lv = np.zeros((4, 4, 4, 4), np.int64)
    for br, bc in _BLK_ORDER:
        by, bx = 4 * mby + br, 4 * mbx + bc
        t8, l4, tl = _i4_neigh(plane, done, by, bx)
        best = None
        for md in _i4_legal_modes(t8, l4, tl):
            pr = _pred_i4(md, t8, l4, tl)
            s = int(np.abs(oy[4 * br:4 * br + 4, 4 * bc:4 * bc + 4]
                           - pr).sum())
            if best is None or s < best[0]:
                best = (s, md, pr)
        s, md, pr = best
        sad += s
        modes.append(md)
        i4m[by, bx] = md
        res = oy[4 * br:4 * br + 4, 4 * bc:4 * bc + 4] - pr
        W = _CF @ res @ _CF.T
        q = _quant_ac(W[None, None], qp)[0, 0]
        lv[br, bc] = q
        d = _dequant_ac(q, qp)
        rec = np.clip(pr + _inv4x4(d), 0, 255)
        plane[4 * by:4 * by + 4, 4 * bx:4 * bx + 4] = \
            rec.astype(plane.dtype)
        rymb[4 * br:4 * br + 4, 4 * bc:4 * bc + 4] = rec
        done[by, bx] = True
    cbp_luma = 0
    for g8 in range(4):
        if any(lv[br, bc].any() for br, bc in _BLK_ORDER[4 * g8:
                                                        4 * g8 + 4]):
            cbp_luma |= 1 << g8
    # ---- chroma (identical to the Intra_16x16 coder)
    och = {"cb": cbp[8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8
                     ].astype(np.int64),
           "cr": crp[8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8
                     ].astype(np.int64)}
    rpl = {"cb": rcb, "cr": rcr}
    ctop = {k: (rpl[k][8 * mby - 1, 8 * mbx:8 * mbx + 8
                       ].astype(np.int64) if mby > 0 else None)
            for k in och}
    cleft = {k: (rpl[k][8 * mby:8 * mby + 8, 8 * mbx - 1
                        ].astype(np.int64) if mbx > 0 else None)
             for k in och}
    ctl = {k: (int(rpl[k][8 * mby - 1, 8 * mbx - 1])
               if (mby > 0 and mbx > 0) else None) for k in och}
    cmodes = [0] + ([1] if mbx > 0 else []) + \
        ([2] if mby > 0 else []) + \
        ([3] if (mby > 0 and mbx > 0) else [])
    cbest = None
    for md in cmodes:
        s = sum(int(np.abs(och[k] - _pred_chroma(
            md, ctop[k], cleft[k], ctl[k])).sum()) for k in och)
        if cbest is None or s < cbest[0]:
            cbest = (s, md)
    cmode = cbest[1]
    cpred = {k: _pred_chroma(cmode, ctop[k], cleft[k], ctl[k])
             for k in och}
    cdc_lv, cac_lv = {}, {}
    for k in och:
        cres = och[k] - cpred[k]
        Wk = np.empty((2, 2, 4, 4), np.int64)
        for br in range(2):
            for bc in range(2):
                Wk[br, bc] = _CF @ cres[4 * br:4 * br + 4,
                                        4 * bc:4 * bc + 4] @ _CF.T
        cdc_lv[k] = _quant_dc(_H2 @ Wk[:, :, 0, 0] @ _H2, qpc)
        ak = _quant_ac(Wk, qpc)
        ak[:, :, 0, 0] = 0
        cac_lv[k] = ak
    ac_any = any(cac_lv[k].any() for k in och)
    dc_any = any(cdc_lv[k].any() for k in och)
    cbp_chroma = 2 if ac_any else (1 if dc_any else 0)
    mb_cbp = cbp_luma | (cbp_chroma << 4)
    # ---- bit recording
    mb = _H264Ops()
    mb.ue(type_base + 0)         # mb_type: I_4x4 (I) / 5 + 0 (P)
    for (br, bc), md in zip(_BLK_ORDER, modes):
        by, bx = 4 * mby + br, 4 * mbx + bc
        # the left/above neighbours of any block precede it in
        # _BLK_ORDER, so the fully-populated grid reads identically
        # to the decoder's progressive one
        pm = _i4_pred_mode(i4m, by, bx)
        if md == pm:
            mb.u(1, 1)           # prev_intra4x4_pred_mode_flag
        else:
            mb.u(0, 1)
            mb.u(md if md < pm else md - 1, 3)
    mb.ue(cmode)
    mb.ue(_CBP_INTRA_ENC[mb_cbp])
    if mb_cbp:
        mb.se(0)                 # mb_qp_delta
    for g8 in range(4):
        if cbp_luma & (1 << g8):
            for br, bc in _BLK_ORDER[4 * g8:4 * g8 + 4]:
                gy, gx = 4 * mby + br, 4 * mbx + bc
                nny[gy, gx] = _cavlc_encode_block(
                    mb, _h264_scan16(lv[br, bc]),
                    _nc_from(nny, gy, gx), 16)
        else:
            for br, bc in _BLK_ORDER[4 * g8:4 * g8 + 4]:
                nny[4 * mby + br, 4 * mbx + bc] = 0
    if cbp_chroma:
        for k in ("cb", "cr"):
            c = cdc_lv[k]
            _cavlc_encode_block(
                mb, np.array([c[0, 0], c[0, 1], c[1, 0],
                              c[1, 1]], np.int64), -1, 4)
    if cbp_chroma == 2:
        for k in ("cb", "cr"):
            for br in range(2):
                for bc in range(2):
                    gy, gx = 2 * mby + br, 2 * mbx + bc
                    nnc[k][gy, gx] = _cavlc_encode_block(
                        mb, _h264_scan_ac(cac_lv[k][br, bc]),
                        _nc_from(nnc[k], gy, gx), 15)
    else:
        for k in ("cb", "cr"):
            nnc[k][2 * mby:2 * mby + 2, 2 * mbx:2 * mbx + 2] = 0
    # chroma recon
    crec = {}
    for k in och:
        dcc = (_dequant_chroma_dc(cdc_lv[k], qpc) if cbp_chroma
               else np.zeros((2, 2), np.int64))
        rcmb = np.empty((8, 8), np.int64)
        for br in range(2):
            for bc in range(2):
                d = (_dequant_ac(cac_lv[k][br, bc], qpc)
                     if cbp_chroma == 2 else np.zeros((4, 4),
                                                      np.int64))
                d[0, 0] = dcc[br, bc]
                rcmb[4 * br:4 * br + 4, 4 * bc:4 * bc + 4] = \
                    cpred[k][4 * br:4 * br + 4,
                             4 * bc:4 * bc + 4] + _inv4x4(d)
        crec[k] = np.clip(rcmb, 0, 255)
    return mb, sad, rymb, crec, nny, nnc, i4m, done


def _enc_mb_intra(w, yp, cbp, crp, ry, rcb, rcr, nnz_y, nnz_c, qp,
                  mby, mbx, pcm_threshold, type_base=0, i4state=None):
    """Intra macroblock dispatcher: with ``i4state`` (the encoder's
    (i4mode, blk_done) grids) the Intra_4x4 candidate competes with
    Intra_16x16 on prediction SAD — smaller wins, ties to I16 — and
    the winner still falls back to I_PCM past ``pcm_threshold``
    bits. Without it (default) the coder is exactly the historical
    Intra_16x16/I_PCM pair, so existing streams stay byte-identical.
    Returns "i4", "i16" or "pcm"."""
    if i4state is None:
        return _enc_mb_intra16(w, yp, cbp, crp, ry, rcb, rcr, nnz_y,
                               nnz_c, qp, mby, mbx, pcm_threshold,
                               type_base=type_base)
    i4mode, blk_done = i4state

    def mark_not_i4():
        i4mode[4 * mby:4 * mby + 4, 4 * mbx:4 * mbx + 4] = -1
        blk_done[4 * mby:4 * mby + 4, 4 * mbx:4 * mbx + 4] = True

    # i16 prediction SAD (the same search _enc_mb_intra16 runs)
    oy = yp[16 * mby:16 * mby + 16, 16 * mbx:16 * mbx + 16
            ].astype(np.int64)
    ltop = (ry[16 * mby - 1, 16 * mbx:16 * mbx + 16].astype(np.int64)
            if mby > 0 else None)
    lleft = (ry[16 * mby:16 * mby + 16, 16 * mbx - 1].astype(np.int64)
             if mbx > 0 else None)
    ltl = (int(ry[16 * mby - 1, 16 * mbx - 1])
           if (mby > 0 and mbx > 0) else None)
    lmodes = ([0] if ltop is not None else []) + \
        ([1] if lleft is not None else []) + [2] + \
        ([3] if ltl is not None else [])
    sad16 = min(int(np.abs(oy - _pred_i16(md, ltop, lleft, ltl)).sum())
                for md in sorted(lmodes))
    cand = _enc_mb_intra4_build(yp, cbp, crp, ry, rcb, rcr, nnz_y,
                                nnz_c, qp, mby, mbx, i4mode, blk_done,
                                type_base)
    mb, sad4, rymb, crec, nny, nnc, i4m, done = cand
    # ~20 extra header bits (16 mode flags + longer cbp code) priced
    # at the SAD-domain lambda sqrt(0.85 * 2^((qp-12)/3)) — without
    # it the 16 local predictors win on SAD alone at every qp and
    # high-qp streams GROW (mode bits dwarf the tiny residuals)
    lam = int(20 * (0.85 * 2.0 ** ((qp - 12) / 3.0)) ** 0.5)
    if sad4 + lam >= sad16:
        mk = _enc_mb_intra16(w, yp, cbp, crp, ry, rcb, rcr, nnz_y,
                             nnz_c, qp, mby, mbx, pcm_threshold,
                             type_base=type_base)
        mark_not_i4()
        return mk
    if mb.bits > pcm_threshold:
        # I_PCM beats the I_4x4 payload: emit raw samples (same
        # fallback as the Intra_16x16 coder)
        nnz_y[4 * mby:4 * mby + 4, 4 * mbx:4 * mbx + 4] = 16
        for k in ("cb", "cr"):
            nnz_c[k][2 * mby:2 * mby + 2, 2 * mbx:2 * mbx + 2] = 16
        w.ue(type_base + 25)
        w.align_zero()
        w.raw_bytes(yp[16 * mby:16 * mby + 16,
                       16 * mbx:16 * mbx + 16].tobytes())
        w.raw_bytes(cbp[8 * mby:8 * mby + 8,
                        8 * mbx:8 * mbx + 8].tobytes())
        w.raw_bytes(crp[8 * mby:8 * mby + 8,
                        8 * mbx:8 * mbx + 8].tobytes())
        ry[16 * mby:16 * mby + 16, 16 * mbx:16 * mbx + 16] = \
            yp[16 * mby:16 * mby + 16, 16 * mbx:16 * mbx + 16]
        rcb[8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8] = \
            cbp[8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8]
        rcr[8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8] = \
            crp[8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8]
        mark_not_i4()
        return "pcm"
    # commit the I_4x4 candidate
    mb.replay(w)
    nnz_y[:] = nny
    for k in ("cb", "cr"):
        nnz_c[k][:] = nnc[k]
    i4mode[:] = i4m
    blk_done[:] = done
    ry[16 * mby:16 * mby + 16, 16 * mbx:16 * mbx + 16] = \
        rymb.astype(ry.dtype)
    rcb[8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8] = \
        crec["cb"].astype(rcb.dtype)
    rcr[8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8] = \
        crec["cr"].astype(rcr.dtype)
    return "i4"


def _encode_h264_cavlc_frame(yp, cbp, crp, qp: int, fi: int,
                             pcm_threshold: int, deblock: bool = False,
                             intra4x4: bool = False):
    """Encode one IDR frame's slice RBSP (Intra_16x16 + CAVLC, per-MB
    I_PCM fallback; with ``intra4x4`` the I_4x4 coder competes per MB
    on prediction SAD); returns (rbsp bytes, recon Y, recon Cb, recon
    Cr, deblock metadata). Reconstruction is decoder-identical by
    construction — intra prediction feeds on it (UNFILTERED: the
    caller applies the loop filter only after the frame completes)."""
    h_mbs, w_mbs = yp.shape[0] // 16, yp.shape[1] // 16
    w = _H264BitWriter()
    w.ue(0)              # first_mb_in_slice
    w.ue(7)              # slice_type: I (all slices of this picture)
    w.ue(0)              # pic_parameter_set_id
    w.u(0, 4)            # frame_num
    w.ue(fi % 2)         # idr_pic_id
    w.u(0, 1)            # no_output_of_prior_pics_flag
    w.u(0, 1)            # long_term_reference_flag
    w.se(qp - 26)        # slice_qp_delta
    if deblock:
        w.ue(0)          # disable_deblocking_filter_idc: filter ON
        w.se(0)          # slice_alpha_c0_offset_div2
        w.se(0)          # slice_beta_offset_div2
    else:
        w.ue(1)          # disable_deblocking_filter_idc: off (conformant)
    ry = np.zeros_like(yp)
    rcb = np.zeros_like(cbp)
    rcr = np.zeros_like(crp)
    nnz_y = np.zeros((4 * h_mbs, 4 * w_mbs), np.int64)
    nnz_c = {"cb": np.zeros((2 * h_mbs, 2 * w_mbs), np.int64),
             "cr": np.zeros((2 * h_mbs, 2 * w_mbs), np.int64)}
    kind = np.ones((h_mbs, w_mbs), np.int64)
    i4state = (np.full((4 * h_mbs, 4 * w_mbs), -1, np.int64),
               np.zeros((4 * h_mbs, 4 * w_mbs), bool)) \
        if intra4x4 else None
    for mby in range(h_mbs):
        for mbx in range(w_mbs):
            mk = _enc_mb_intra(w, yp, cbp, crp, ry, rcb, rcr, nnz_y,
                               nnz_c, qp, mby, mbx, pcm_threshold,
                               i4state=i4state)
            kind[mby, mbx] = 2 if mk == "pcm" else 1
    w.trailing()
    meta = {"kind": kind, "nnz_y": nnz_y,
            "mvg": np.zeros((h_mbs, w_mbs, 2), np.int64),
            "refg": np.full((h_mbs, w_mbs), -1, np.int64)}
    return bytes(w.buf), ry, rcb, rcr, meta


def encode_h264_cavlc(frames_u8, *, qp: int = 20, fps: int = 10,
                      pcm_threshold: int = 8 * 384, gop: int = 1,
                      search_range: int = 8,
                      deblock: bool = False,
                      intra4x4: bool = False) -> bytes:
    """(n, h, w, 3) uint8 -> H.264 Annex B byte stream coded
    Intra_16x16 + CAVLC at constant ``qp`` (0..51) with per-MB I_PCM
    fallback when the entropy payload exceeds ``pcm_threshold`` bits
    (default = raw 4:2:0 sample size). ``gop`` > 1 codes every gop-th
    frame as IDR and the rest as P frames (P_Skip / P_L0_16x16,
    quarter-pel motion search over +-``search_range`` full pels, intra
    fallback per MB). ``deblock=True`` turns the in-loop deblocking
    filter ON (spec 8.7, signalled with disable_deblocking_filter_idc
    0): references and output are the filtered pictures, intra
    prediction stays unfiltered, and ``decode_h264`` reproduces the
    filtered recon bit-exactly. Default off keeps streams and goldens
    byte-identical to earlier rounds. Even frame dims required."""
    raw, _ = _encode_h264_cavlc_with_recon(
        frames_u8, qp=qp, fps=fps, pcm_threshold=pcm_threshold,
        gop=gop, search_range=search_range, deblock=deblock,
        intra4x4=intra4x4)
    return raw


def _encode_h264_cavlc_with_recon(frames_u8, *, qp: int = 20,
                                  fps: int = 10,
                                  pcm_threshold: int = 8 * 384,
                                  gop: int = 1, search_range: int = 8,
                                  deblock: bool = False,
                                  intra4x4: bool = False):
    """encode_h264_cavlc + the encoder's own reconstruction as float32
    RGB frames (what a conforming decoder must reproduce bit-exactly)."""
    frames_u8 = np.asarray(frames_u8, dtype=np.uint8)
    if not 0 <= qp <= 51:
        raise MediaDecodeError("H.264 QP must be in 0..51")
    if gop < 1:
        raise MediaDecodeError("H.264 gop must be >= 1")
    n, h, wdt = frames_u8.shape[:3]
    if h % 2 or wdt % 2:
        raise MediaDecodeError("intra subset needs even frame dims (4:2:0)")
    w_mbs = (wdt + 15) // 16
    h_mbs = (h + 15) // 16
    pw, ph = 16 * w_mbs, 16 * h_mbs
    out = bytearray()
    out += _H264_START + b"\x67" + _ebsp_escape(
        _h264_sps_rbsp(w_mbs, h_mbs, pw - wdt, ph - h, fps))
    out += _H264_START + b"\x68" + _ebsp_escape(_h264_pps_rbsp())
    recon = []
    prev = None
    n_idr = 0
    fnum = 0
    for fi in range(n):
        y, cb, cr = _rgb_to_yuv420(frames_u8[fi])
        yp = np.pad(y, ((0, ph - h), (0, pw - wdt)), mode="edge")
        cbp = np.pad(cb, ((0, (ph - h) // 2), (0, (pw - wdt) // 2)),
                     mode="edge")
        crp = np.pad(cr, ((0, (ph - h) // 2), (0, (pw - wdt) // 2)),
                     mode="edge")
        if fi % gop == 0:
            rbsp, ry, rcb, rcr, meta = _encode_h264_cavlc_frame(
                yp, cbp, crp, qp, n_idr, pcm_threshold, deblock,
                intra4x4)
            out += _H264_START + b"\x65" + _ebsp_escape(rbsp)
            n_idr += 1
            fnum = 1
        else:
            rbsp, ry, rcb, rcr, meta = _encode_h264_p_frame(
                yp, cbp, crp, prev, qp, fnum, pcm_threshold,
                search_range, deblock, intra4x4)
            out += _H264_START + b"\x41" + _ebsp_escape(rbsp)
            fnum = (fnum + 1) % 16
        if deblock:
            _h264_deblock_frame(
                ry, rcb, rcr, meta["kind"],
                np.full(meta["kind"].shape, qp, np.int64),
                meta["mvg"], meta["refg"], meta["nnz_y"])
        prev = (ry, rcb, rcr)
        recon.append(_yuv420_to_rgb(
            ry[:h, :wdt], rcb[:(h + 1) // 2, :(wdt + 1) // 2],
            rcr[:(h + 1) // 2, :(wdt + 1) // 2]))
    return bytes(out), np.stack(recon)


def _h264_parse_pps(r: "_H264BitReader") -> dict:
    r.ue()                       # pps id
    r.ue()                       # sps id
    if r.u(1):
        raise MediaDecodeError("CABAC entropy coding not supported")
    r.u(1)                       # bottom_field_pic_order_in_frame
    if r.ue() != 0:
        raise MediaDecodeError("slice groups not supported")
    num_ref_default = r.ue()     # num_ref_idx_l0_default_active_minus1
    r.ue()                       # num_ref_idx_l1_default_active_minus1
    weighted = r.u(1)            # weighted_pred_flag
    r.u(2)                       # weighted_bipred_idc
    pic_init_qp = 26 + r.se()
    r.se()                       # pic_init_qs_minus26
    cq_off = r.se()              # chroma_qp_index_offset
    deblock_ctrl = r.u(1)        # deblocking_filter_control_present_flag
    if r.u(1):                   # constrained_intra_pred_flag
        raise MediaDecodeError("constrained intra prediction not supported")
    if r.u(1):                   # redundant_pic_cnt_present_flag
        # would add a redundant_pic_cnt field to EVERY slice header
        raise MediaDecodeError("redundant picture counts not supported")
    return {"pic_init_qp": pic_init_qp, "chroma_qp_offset": cq_off,
            "deblock_control": deblock_ctrl,
            "num_ref_default": num_ref_default,
            "weighted_pred": weighted}


# -------------------------- H.264 inter (P slice) toolchain
#
# Extends the baseline subset with motion-compensated prediction:
# P slices carrying P_Skip runs and P_L0_16x16 macroblocks against a
# single reference picture (the previous decoded frame), with the
# spec's quarter-sample luma interpolation (8.4.2.2.1: 6-tap
# [1,-5,20,20,-5,1] half-pel filter, centre j from unrounded
# intermediates, quarter positions as rounding-up averages),
# eighth-sample bilinear chroma interpolation (8.4.2.2.2), median
# motion-vector prediction with the availability / single-matching-
# reference rules (8.4.1.3) and the P_Skip zero-vector conditions
# (8.4.1.1), mb_skip_run coding (7.3.4), the Inter column of the
# coded_block_pattern mapping (Table 9-4), and plain 16-coefficient
# 4x4 luma residual blocks (no Intra_16x16 DC hierarchy). Intra
# macroblocks inside P slices (mb_type 5..30) reuse the shared
# Intra_16x16/I_PCM coder. Still out of scope (raising
# MediaDecodeError): B slices, 16x8/8x16/8x8 partitions, multiple
# reference pictures, CABAC, and the in-loop deblocking filter —
# emitted streams disable deblocking explicitly, so they stay
# conformant-decodable.

_CBP_INTER = [0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13,
              14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43,
              45, 46, 17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30,
              22, 25, 38, 41]           # Table 9-4, Inter column
_CBP_INTER_ENC = {v: i for i, v in enumerate(_CBP_INTER)}

_MC_TAPS = np.array([1, -5, 20, 20, -5, 1], np.int64)


def _h264_scan16(block: np.ndarray) -> np.ndarray:
    return np.array([block[r, c] for r, c in _ZZ4], np.int64)


def _h264_unscan16(scan: np.ndarray) -> np.ndarray:
    out = np.zeros((4, 4), np.int64)
    for i, (r, c) in enumerate(_ZZ4):
        out[r, c] = scan[i]
    return out


def _mc_luma(ref: np.ndarray, mvx: int, mvy: int, y0: int, x0: int,
             bh: int, bw: int) -> np.ndarray:
    """Quarter-sample luma motion compensation (spec 8.4.2.2.1) for the
    bh x bw block at (y0, x0) with quarter-pel vector (mvx, mvy).
    Out-of-picture taps clamp coordinates into the plane, exactly the
    spec's Clip3 on every full-sample position. Returns int64 in
    [0, 255]."""
    H, W = ref.shape
    iy, ix = mvy >> 2, mvx >> 2
    fy, fx = mvy & 3, mvx & 3
    rows = np.clip(y0 + iy + np.arange(-2, bh + 3), 0, H - 1)
    cols = np.clip(x0 + ix + np.arange(-2, bw + 3), 0, W - 1)
    Wd = ref[np.ix_(rows, cols)].astype(np.int64)     # (bh+5, bw+5)
    G = Wd[2:2 + bh, 2:2 + bw]
    if fx == 0 and fy == 0:
        return G
    T = _MC_TAPS
    clip1 = lambda a: np.clip(a, 0, 255)
    # horizontal 6-tap intermediates: half-pel right of each full col
    b_int = sum(int(T[k]) * Wd[:, k:k + bw] for k in range(6))
    # vertical 6-tap: half-pel below each full row, all window columns
    v_int = sum(int(T[k]) * Wd[k:k + bh, :] for k in range(6))
    b = clip1((b_int[2:2 + bh] + 16) >> 5)
    s = clip1((b_int[3:3 + bh] + 16) >> 5)            # b one row down
    h_full = clip1((v_int + 16) >> 5)
    h = h_full[:, 2:2 + bw]
    m = h_full[:, 3:3 + bw]                           # h one col right
    if fy == 0:
        if fx == 1:
            return (G + b + 1) >> 1
        if fx == 2:
            return b
        return (Wd[2:2 + bh, 3:3 + bw] + b + 1) >> 1
    if fx == 0:
        if fy == 1:
            return (G + h + 1) >> 1
        if fy == 2:
            return h
        return (Wd[3:3 + bh, 2:2 + bw] + h + 1) >> 1
    if fx != 2 and fy != 2:                           # e / g / p / r
        vv = b if fy == 1 else s
        hh = h if fx == 1 else m
        return (vv + hh + 1) >> 1
    # centre half-pel j: vertical 6-tap over UNROUNDED horizontal sums
    j_int = sum(int(T[k]) * b_int[k:k + bh] for k in range(6))
    j = clip1((j_int + 512) >> 10)
    if fx == 2 and fy == 2:
        return j
    if fy == 2:                                       # i / k
        return (h + j + 1) >> 1 if fx == 1 else (j + m + 1) >> 1
    return (b + j + 1) >> 1 if fy == 1 else (j + s + 1) >> 1  # f / q


def _mc_chroma(ref: np.ndarray, mvx: int, mvy: int, y0: int, x0: int,
               bh: int, bw: int) -> np.ndarray:
    """Eighth-sample bilinear chroma motion compensation (8.4.2.2.2)
    for the bh x bw chroma block at chroma coords (y0, x0); (mvx, mvy)
    stays in quarter-LUMA units (= eighth-chroma). Returns int64."""
    H, W = ref.shape
    iy, ix = mvy >> 3, mvx >> 3
    fy, fx = mvy & 7, mvx & 7
    rows = np.clip(y0 + iy + np.arange(0, bh + 1), 0, H - 1)
    cols = np.clip(x0 + ix + np.arange(0, bw + 1), 0, W - 1)
    Wd = ref[np.ix_(rows, cols)].astype(np.int64)
    A, B = Wd[:bh, :bw], Wd[:bh, 1:]
    C, D = Wd[1:, :bw], Wd[1:, 1:]
    return ((8 - fx) * (8 - fy) * A + fx * (8 - fy) * B +
            (8 - fx) * fy * C + fx * fy * D + 32) >> 6


def _mv_neighbor(refg, mvg, y, x):
    """(refIdx, mvx, mvy) of the macroblock at (y, x), or None when the
    MB lies outside the picture (raster decode order: y<=current row,
    so only left/top/top-right/top-left are ever asked for)."""
    if y < 0 or x < 0 or x >= refg.shape[1]:
        return None
    return (int(refg[y, x]), int(mvg[y, x, 0]), int(mvg[y, x, 1]))


def _h264_mvp16(refg, mvg, mby, mbx):
    """Median motion-vector predictor for a 16x16 partition with
    refIdxL0 = 0 (spec 8.4.1.3/8.4.1.3.1). Unavailable or intra
    neighbours contribute (refIdx -1, mv 0); top-right falls back to
    top-left; when only the left neighbour's row exists the predictor
    is mvA verbatim; a single neighbour matching the reference wins
    outright; otherwise the component-wise median of A/B/C."""
    A = _mv_neighbor(refg, mvg, mby, mbx - 1)
    B = _mv_neighbor(refg, mvg, mby - 1, mbx)
    C = _mv_neighbor(refg, mvg, mby - 1, mbx + 1)
    if C is None:
        C = _mv_neighbor(refg, mvg, mby - 1, mbx - 1)
    if B is None and C is None:
        return (A[1], A[2]) if A is not None else (0, 0)
    vals = [(-1, 0, 0) if N is None else N for N in (A, B, C)]
    match = [v for v in vals if v[0] == 0]
    if len(match) == 1:
        return match[0][1], match[0][2]
    return (sorted(v[1] for v in vals)[1], sorted(v[2] for v in vals)[1])


def _h264_skip_mv(refg, mvg, mby, mbx):
    """P_Skip motion vector (8.4.1.1): zero when the left or top MB is
    outside the picture or either is an inter MB with refIdx 0 and a
    zero vector; the 16x16 median predictor otherwise."""
    A = _mv_neighbor(refg, mvg, mby, mbx - 1)
    B = _mv_neighbor(refg, mvg, mby - 1, mbx)
    if A is None or B is None:
        return (0, 0)
    if A == (0, 0, 0) or B == (0, 0, 0):
        return (0, 0)
    return _h264_mvp16(refg, mvg, mby, mbx)


def _mc_pred_mb(ref_planes, mvx, mvy, mby, mbx):
    """(luma 16x16, {cb,cr} 8x8) int64 motion-compensated prediction."""
    ry, rcb, rcr = ref_planes
    py = _mc_luma(ry, mvx, mvy, 16 * mby, 16 * mbx, 16, 16)
    pcb = _mc_chroma(rcb, mvx, mvy, 8 * mby, 8 * mbx, 8, 8)
    pcr = _mc_chroma(rcr, mvx, mvy, 8 * mby, 8 * mbx, 8, 8)
    return py, {"cb": pcb, "cr": pcr}


def _dec_mb_inter16(r, yp, cpl, nnz_y, nnz_c, qp, cq_off, mby, mbx,
                    ref_planes, refg, mvg):
    """Decode ONE P_L0_16x16 macroblock. Returns the updated slice QP."""
    mvd_x = r.se()
    mvd_y = r.se()
    mvpx, mvpy = _h264_mvp16(refg, mvg, mby, mbx)
    mvx, mvy = mvpx + mvd_x, mvpy + mvd_y
    refg[mby, mbx] = 0
    mvg[mby, mbx] = (mvx, mvy)
    code = r.ue()
    if code > 47:
        raise MediaDecodeError("bad coded_block_pattern code")
    cbp = _CBP_INTER[code]
    if cbp:
        qp = (qp + r.se() + 52) % 52
    qpc = _H264_QPC[max(0, min(51, qp + cq_off))]
    lv = np.zeros((4, 4, 4, 4), np.int64)
    for g8 in range(4):
        if cbp & (1 << g8):
            for br, bc in _BLK_ORDER[4 * g8:4 * g8 + 4]:
                gy, gx = 4 * mby + br, 4 * mbx + bc
                scan, tc = _cavlc_decode_block(
                    r, _nc_from(nnz_y, gy, gx), 16)
                nnz_y[gy, gx] = tc
                lv[br, bc] = _h264_unscan16(scan)
    cbp_chroma = cbp >> 4
    cdc_lv = {k: np.zeros((2, 2), np.int64) for k in nnz_c}
    if cbp_chroma:
        for k in ("cb", "cr"):
            scan, _ = _cavlc_decode_block(r, -1, 4)
            cdc_lv[k] = np.array(
                [[scan[0], scan[1]], [scan[2], scan[3]]], np.int64)
    cac_lv = {k: np.zeros((2, 2, 4, 4), np.int64) for k in nnz_c}
    if cbp_chroma == 2:
        for k in ("cb", "cr"):
            for br in range(2):
                for bc in range(2):
                    gy, gx = 2 * mby + br, 2 * mbx + bc
                    scan, tc = _cavlc_decode_block(
                        r, _nc_from(nnz_c[k], gy, gx), 15)
                    nnz_c[k][gy, gx] = tc
                    cac_lv[k][br, bc] = _h264_unscan_ac(scan)
    # ---- reconstruction
    py, pch = _mc_pred_mb(ref_planes, mvx, mvy, mby, mbx)
    rymb = np.empty((16, 16), np.int64)
    for br in range(4):
        for bc in range(4):
            rymb[4 * br:4 * br + 4, 4 * bc:4 * bc + 4] = \
                py[4 * br:4 * br + 4, 4 * bc:4 * bc + 4] + \
                _inv4x4(_dequant_ac(lv[br, bc], qp))
    yp[16 * mby:16 * mby + 16, 16 * mbx:16 * mbx + 16] = \
        np.clip(rymb, 0, 255).astype(np.uint8)
    for k in ("cb", "cr"):
        dcc = (_dequant_chroma_dc(cdc_lv[k], qpc) if cbp_chroma
               else np.zeros((2, 2), np.int64))
        rcmb = np.empty((8, 8), np.int64)
        for br in range(2):
            for bc in range(2):
                d = (_dequant_ac(cac_lv[k][br, bc], qpc)
                     if cbp_chroma == 2 else np.zeros((4, 4), np.int64))
                d[0, 0] = dcc[br, bc]
                rcmb[4 * br:4 * br + 4, 4 * bc:4 * bc + 4] = \
                    pch[k][4 * br:4 * br + 4, 4 * bc:4 * bc + 4] + \
                    _inv4x4(d)
        cpl[k][8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8] = \
            np.clip(rcmb, 0, 255).astype(np.uint8)
    return qp


def _dec_mb_pskip(yp, cpl, mby, mbx, ref_planes, refg, mvg):
    """Reconstruct ONE P_Skip macroblock (prediction only)."""
    mvx, mvy = _h264_skip_mv(refg, mvg, mby, mbx)
    refg[mby, mbx] = 0
    mvg[mby, mbx] = (mvx, mvy)
    py, pch = _mc_pred_mb(ref_planes, mvx, mvy, mby, mbx)
    yp[16 * mby:16 * mby + 16, 16 * mbx:16 * mbx + 16] = \
        py.astype(np.uint8)
    for k in ("cb", "cr"):
        cpl[k][8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8] = \
            np.clip(pch[k], 0, 255).astype(np.uint8)


# ------------------------------------------- in-loop deblocking (8.7)


def _deblock_gather(plane, mby, mbx, e, vertical, half, depth):
    """(p, q) sample matrices for one edge: row i of each is the i-th
    line across the edge, columns 0..depth-1 are p0..p_{depth-1} /
    q0..q_{depth-1} (spec orientation: p walks away from the edge)."""
    sz = 16 >> half
    if vertical:
        x = sz * mbx + e
        y0 = sz * mby
        seg = plane[y0:y0 + sz, x - depth:x + depth].astype(np.int64)
        return seg[:, :depth][:, ::-1], seg[:, depth:]
    y = sz * mby + e
    x0 = sz * mbx
    seg = plane[y - depth:y + depth, x0:x0 + sz].astype(np.int64)
    return seg[:depth][::-1].T, seg[depth:].T


def _deblock_scatter(plane, mby, mbx, e, vertical, half, p, q):
    sz = 16 >> half
    depth = p.shape[1]
    both = np.concatenate([p[:, ::-1], q], axis=1)
    if vertical:
        x = sz * mbx + e
        y0 = sz * mby
        plane[y0:y0 + sz, x - depth:x + depth] = both.astype(plane.dtype)
    else:
        y = sz * mby + e
        x0 = sz * mbx
        plane[y - depth:y + depth, x0:x0 + sz] = \
            both.T.astype(plane.dtype)


def _deblock_luma_edge(plane, mby, mbx, e, vertical, bs, idx_a, idx_b):
    """Filter one 16-sample luma edge in place (spec 8.7.2.3/8.7.2.4);
    ``bs`` holds the four per-4x4-pair boundary strengths."""
    alpha = int(_H264_ALPHA[idx_a])
    beta = int(_H264_BETA[idx_b])
    if alpha == 0 or not bs.any():
        return
    p, q = _deblock_gather(plane, mby, mbx, e, vertical, 0, 4)
    bS = np.repeat(bs, 4)
    p0, p1, p2, p3 = p[:, 0], p[:, 1], p[:, 2], p[:, 3]
    q0, q1, q2, q3 = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    filt = (bS > 0) & (np.abs(p0 - q0) < alpha) \
        & (np.abs(p1 - p0) < beta) & (np.abs(q1 - q0) < beta)
    if not filt.any():
        return
    ap = np.abs(p2 - p0) < beta
    aq = np.abs(q2 - q0) < beta
    np0, np1, np2 = p0.copy(), p1.copy(), p2.copy()
    nq0, nq1, nq2 = q0.copy(), q1.copy(), q2.copy()
    strong = filt & (bS == 4)
    if strong.any():
        small = np.abs(p0 - q0) < (alpha >> 2) + 2
        sp = strong & ap & small
        np0 = np.where(
            sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
            np.where(strong, (2 * p1 + p0 + q1 + 2) >> 2, np0))
        np1 = np.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, np1)
        np2 = np.where(sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3,
                       np2)
        sq = strong & aq & small
        nq0 = np.where(
            sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
            np.where(strong, (2 * q1 + q0 + p1 + 2) >> 2, nq0))
        nq1 = np.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, nq1)
        nq2 = np.where(sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3,
                       nq2)
    normal = filt & (bS < 4)
    if normal.any():
        tc0 = _H264_TC0[np.clip(bS, 1, 3) - 1, idx_a]
        tc = tc0 + ap + aq
        delta = np.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3,
                        -tc, tc)
        np0 = np.where(normal, np.clip(p0 + delta, 0, 255), np0)
        nq0 = np.where(normal, np.clip(q0 - delta, 0, 255), nq0)
        dp1 = np.clip((p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1,
                      -tc0, tc0)
        np1 = np.where(normal & ap, p1 + dp1, np1)
        dq1 = np.clip((q2 + ((q0 + p0 + 1) >> 1) - 2 * q1) >> 1,
                      -tc0, tc0)
        nq1 = np.where(normal & aq, q1 + dq1, nq1)
    p_out = np.stack([np0, np1, np2, p3], axis=1)
    q_out = np.stack([nq0, nq1, nq2, q3], axis=1)
    _deblock_scatter(plane, mby, mbx, e, vertical, 0, p_out, q_out)


def _deblock_chroma_edge(plane, mby, mbx, e, vertical, bs, idx_a,
                         idx_b):
    """Filter one 8-sample chroma edge in place — only p0/q0 move;
    ``bs`` is the luma-derived 4-vector (each entry covers 2 rows)."""
    alpha = int(_H264_ALPHA[idx_a])
    beta = int(_H264_BETA[idx_b])
    if alpha == 0 or not bs.any():
        return
    p, q = _deblock_gather(plane, mby, mbx, e, vertical, 1, 2)
    bS = np.repeat(bs, 2)
    p0, p1 = p[:, 0], p[:, 1]
    q0, q1 = q[:, 0], q[:, 1]
    filt = (bS > 0) & (np.abs(p0 - q0) < alpha) \
        & (np.abs(p1 - p0) < beta) & (np.abs(q1 - q0) < beta)
    if not filt.any():
        return
    np0, nq0 = p0.copy(), q0.copy()
    strong = filt & (bS == 4)
    np0 = np.where(strong, (2 * p1 + p0 + q1 + 2) >> 2, np0)
    nq0 = np.where(strong, (2 * q1 + q0 + p1 + 2) >> 2, nq0)
    normal = filt & (bS < 4)
    if normal.any():
        tc = _H264_TC0[np.clip(bS, 1, 3) - 1, idx_a] + 1
        delta = np.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3,
                        -tc, tc)
        np0 = np.where(normal, np.clip(p0 + delta, 0, 255), np0)
        nq0 = np.where(normal, np.clip(q0 - delta, 0, 255), nq0)
    p_out = np.stack([np0, p1], axis=1)
    q_out = np.stack([nq0, q1], axis=1)
    _deblock_scatter(plane, mby, mbx, e, vertical, 1, p_out, q_out)


def _h264_deblock_frame(yp, cbl, crl, kind, qpg, mvg, refg, nnz_y, *,
                        off_a: int = 0, off_b: int = 0,
                        cq_off: int = 0):
    """In-loop deblocking filter over one reconstructed picture
    (spec 8.7, frame macroblocks, single slice): per MB in raster
    order, the four vertical luma edges left-to-right then the four
    horizontal edges top-to-bottom (already-filtered neighbour samples
    feed later edges, in place), chroma edges 0/4 alongside. Boundary
    strength per 4x4 pair: 4 at intra MB edges, 3 on other intra
    edges, 2 when either side's 4x4 block has coefficients, 1 on a
    reference or >= 1-pel MV difference, else 0 (this codec's inter
    MBs are single-reference 16x16, so MB-internal inter edges are
    coded-or-nothing). ``kind`` is 0 inter / 1 Intra_16x16 / 2 I_PCM;
    I_PCM macroblocks filter with QP 0 per 8.7.2. Intra prediction
    reads the UNFILTERED planes, so both codecs run this only after a
    frame completes; the filtered picture is the reference and the
    output."""
    h_mbs, w_mbs = kind.shape
    qy = np.where(kind == 2, 0, qpg).astype(np.int64)
    qc = np.asarray(_H264_QPC, np.int64)[np.clip(qy + cq_off, 0, 51)]
    intra = kind > 0

    def edge_bs(mby, mbx, e, vertical):
        bs = np.zeros(4, np.int64)
        for g in range(4):
            if vertical:
                qby, qbx = 4 * mby + g, (16 * mbx + e) // 4
                pby, pbx = qby, qbx - 1
            else:
                qby, qbx = (16 * mby + e) // 4, 4 * mbx + g
                pby, pbx = qby - 1, qbx
            pmb = (pby // 4, pbx // 4)
            qmb = (qby // 4, qbx // 4)
            if intra[pmb] or intra[qmb]:
                bs[g] = 4 if e == 0 else 3
            elif nnz_y[pby, pbx] or nnz_y[qby, qbx]:
                bs[g] = 2
            elif (refg[pmb] != refg[qmb]
                  or abs(mvg[pmb][0] - mvg[qmb][0]) >= 4
                  or abs(mvg[pmb][1] - mvg[qmb][1]) >= 4):
                bs[g] = 1
        return bs

    for mby in range(h_mbs):
        for mbx in range(w_mbs):
            for vertical in (True, False):
                for e in (0, 4, 8, 12):
                    if e == 0 and (mbx == 0 if vertical else mby == 0):
                        continue
                    bs = edge_bs(mby, mbx, e, vertical)
                    if not bs.any():
                        continue
                    if vertical:
                        pmb = (mby, mbx - 1) if e == 0 else (mby, mbx)
                    else:
                        pmb = (mby - 1, mbx) if e == 0 else (mby, mbx)
                    qpav = (int(qy[pmb]) + int(qy[mby, mbx]) + 1) >> 1
                    ia = min(max(qpav + off_a, 0), 51)
                    ib = min(max(qpav + off_b, 0), 51)
                    _deblock_luma_edge(yp, mby, mbx, e, vertical, bs,
                                       ia, ib)
                    if e in (0, 8):
                        qpavc = (int(qc[pmb]) + int(qc[mby, mbx])
                                 + 1) >> 1
                        ca = min(max(qpavc + off_a, 0), 51)
                        cb = min(max(qpavc + off_b, 0), 51)
                        for pl in (cbl, crl):
                            _deblock_chroma_edge(pl, mby, mbx, e // 2,
                                                 vertical, bs, ca, cb)


def _search_mv16(ref_y, oy, mby, mbx, sr, skip_mv, mvp):
    """Deterministic motion search for one 16x16 luma block: exhaustive
    full-pel SAD over a +-sr window (vectorized sliding windows over a
    border-clamped gather, identical cost model to clipped MC), then a
    +-3 quarter-pel refinement around the winner, with the skip vector
    and the predictor as extra candidates. First minimum in scan order
    wins. Returns (mvx, mvy, sad)."""
    H, W = ref_y.shape
    y0, x0 = 16 * mby, 16 * mbx
    rows = np.clip(np.arange(y0 - sr, y0 + sr + 16), 0, H - 1)
    cols = np.clip(np.arange(x0 - sr, x0 + sr + 16), 0, W - 1)
    reg = ref_y[np.ix_(rows, cols)].astype(np.int64)
    win = np.lib.stride_tricks.sliding_window_view(reg, (16, 16))
    sads = np.abs(win - oy).sum(axis=(2, 3))
    k = int(np.argmin(sads))
    n = 2 * sr + 1
    bdy, bdx = k // n - sr, k % n - sr
    # skip vector and predictor lead the candidate list so they win
    # SAD ties (static content then skips, like a real encoder)
    cands = [tuple(skip_mv), tuple(mvp)]
    cands += [(4 * bdx + qx, 4 * bdy + qy)
              for qy in range(-3, 4) for qx in range(-3, 4)]
    best = None
    for mvx, mvy in cands:
        sad = int(np.abs(
            _mc_luma(ref_y, mvx, mvy, y0, x0, 16, 16) - oy).sum())
        if best is None or sad < best[2]:
            best = (mvx, mvy, sad)
    return best


def _encode_h264_p_frame(yp, cbp, crp, ref_planes, qp: int,
                         frame_num: int, pcm_threshold: int,
                         search_range: int, deblock: bool = False,
                         intra4x4: bool = False):
    """Encode one P frame's slice RBSP (P_Skip / P_L0_16x16 with
    quarter-pel motion compensation; Intra_16x16/I_PCM fallback when
    intra predicts better); returns (rbsp, recon Y, recon Cb, recon
    Cr, deblock metadata). The recon is decoder-identical — inter
    prediction runs on the previous frame's (filtered, when the loop
    filter is on) recon, intra on this frame's unfiltered planes."""
    h_mbs, w_mbs = yp.shape[0] // 16, yp.shape[1] // 16
    w = _H264BitWriter()
    w.ue(0)              # first_mb_in_slice
    w.ue(5)              # slice_type: P (all slices of this picture)
    w.ue(0)              # pic_parameter_set_id
    w.u(frame_num % 16, 4)
    w.u(0, 1)            # num_ref_idx_active_override_flag
    w.u(0, 1)            # ref_pic_list_modification_flag_l0
    w.u(0, 1)            # adaptive_ref_pic_marking_mode_flag
    w.se(qp - 26)        # slice_qp_delta
    if deblock:
        w.ue(0)          # disable_deblocking_filter_idc: filter ON
        w.se(0)          # slice_alpha_c0_offset_div2
        w.se(0)          # slice_beta_offset_div2
    else:
        w.ue(1)          # disable_deblocking_filter_idc: off (conformant)
    ry = np.zeros_like(yp)
    rcb = np.zeros_like(cbp)
    rcr = np.zeros_like(crp)
    cpl = {"cb": rcb, "cr": rcr}
    kind = np.zeros((h_mbs, w_mbs), np.int64)
    i4state = (np.full((4 * h_mbs, 4 * w_mbs), -1, np.int64),
               np.zeros((4 * h_mbs, 4 * w_mbs), bool)) \
        if intra4x4 else None

    def mark_not_i4(mby, mbx):
        if i4state is not None:
            i4state[0][4 * mby:4 * mby + 4, 4 * mbx:4 * mbx + 4] = -1
            i4state[1][4 * mby:4 * mby + 4, 4 * mbx:4 * mbx + 4] = True
    nnz_y = np.zeros((4 * h_mbs, 4 * w_mbs), np.int64)
    nnz_c = {"cb": np.zeros((2 * h_mbs, 2 * w_mbs), np.int64),
             "cr": np.zeros((2 * h_mbs, 2 * w_mbs), np.int64)}
    refg = np.full((h_mbs, w_mbs), -1, np.int64)
    mvg = np.zeros((h_mbs, w_mbs, 2), np.int64)
    qpc = _H264_QPC[max(0, min(51, qp))]
    ref_y = ref_planes[0]
    run = 0
    for mby in range(h_mbs):
        for mbx in range(w_mbs):
            oy = yp[16 * mby:16 * mby + 16, 16 * mbx:16 * mbx + 16
                    ].astype(np.int64)
            skip_mv = _h264_skip_mv(refg, mvg, mby, mbx)
            mvp = _h264_mvp16(refg, mvg, mby, mbx)
            mvx, mvy, inter_sad = _search_mv16(
                ref_y, oy, mby, mbx, search_range, skip_mv, mvp)
            # intra fallback when intra predicts strictly better (the
            # shared coder redoes its own mode search)
            iltop = (ry[16 * mby - 1, 16 * mbx:16 * mbx + 16
                        ].astype(np.int64) if mby > 0 else None)
            ilft = (ry[16 * mby:16 * mby + 16, 16 * mbx - 1
                       ].astype(np.int64) if mbx > 0 else None)
            iltl = (int(ry[16 * mby - 1, 16 * mbx - 1])
                    if (mby > 0 and mbx > 0) else None)
            imodes = ([0] if iltop is not None else []) + \
                ([1] if ilft is not None else []) + [2] + \
                ([3] if iltl is not None else [])
            intra_sad = min(int(np.abs(
                oy - _pred_i16(md, iltop, ilft, iltl)).sum())
                for md in sorted(imodes))
            if intra_sad < inter_sad:
                w.ue(run)
                run = 0
                mk = _enc_mb_intra(w, yp, cbp, crp, ry, rcb, rcr,
                                   nnz_y, nnz_c, qp, mby, mbx,
                                   pcm_threshold, type_base=5,
                                   i4state=i4state)
                kind[mby, mbx] = 2 if mk == "pcm" else 1
                continue
            py, pch = _mc_pred_mb(ref_planes, mvx, mvy, mby, mbx)
            res = oy - py
            W16 = np.empty((4, 4, 4, 4), np.int64)
            for br in range(4):
                for bc in range(4):
                    W16[br, bc] = _CF @ res[4 * br:4 * br + 4,
                                            4 * bc:4 * bc + 4] @ _CF.T
            lv = _quant_ac(W16, qp)
            cbp_luma = 0
            for g8 in range(4):
                if any(lv[br, bc].any()
                       for br, bc in _BLK_ORDER[4 * g8:4 * g8 + 4]):
                    cbp_luma |= 1 << g8
            och = {"cb": cbp[8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8
                             ].astype(np.int64),
                   "cr": crp[8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8
                             ].astype(np.int64)}
            cdc_lv, cac_lv = {}, {}
            for k in och:
                cres = och[k] - pch[k]
                Wk = np.empty((2, 2, 4, 4), np.int64)
                for br in range(2):
                    for bc in range(2):
                        Wk[br, bc] = _CF @ cres[4 * br:4 * br + 4,
                                                4 * bc:4 * bc + 4] @ _CF.T
                cdc_lv[k] = _quant_dc(_H2 @ Wk[:, :, 0, 0] @ _H2, qpc)
                ak = _quant_ac(Wk, qpc)
                ak[:, :, 0, 0] = 0
                cac_lv[k] = ak
            ac_any = any(cac_lv[k].any() for k in och)
            dc_any = any(cdc_lv[k].any() for k in och)
            cbp_chroma = 2 if ac_any else (1 if dc_any else 0)
            mb_cbp = cbp_luma | (cbp_chroma << 4)
            if (mvx, mvy) == tuple(skip_mv) and mb_cbp == 0:
                # P_Skip: prediction only, zero bits
                run += 1
                refg[mby, mbx] = 0
                mvg[mby, mbx] = (mvx, mvy)
                mark_not_i4(mby, mbx)
                ry[16 * mby:16 * mby + 16, 16 * mbx:16 * mbx + 16] = \
                    py.astype(yp.dtype)
                for k, rp in (("cb", rcb), ("cr", rcr)):
                    rp[8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8] = \
                        np.clip(pch[k], 0, 255).astype(cbp.dtype)
                continue
            mb = _H264Ops()
            mb.ue(0)          # mb_type: P_L0_16x16
            mb.se(mvx - mvp[0])
            mb.se(mvy - mvp[1])
            mb.ue(_CBP_INTER_ENC[mb_cbp])
            if mb_cbp:
                mb.se(0)      # mb_qp_delta
            nzy_before = nnz_y[4 * mby:4 * mby + 4,
                               4 * mbx:4 * mbx + 4].copy()
            for g8 in range(4):
                if cbp_luma & (1 << g8):
                    for br, bc in _BLK_ORDER[4 * g8:4 * g8 + 4]:
                        gy, gx = 4 * mby + br, 4 * mbx + bc
                        nnz_y[gy, gx] = _cavlc_encode_block(
                            mb, _h264_scan16(lv[br, bc]),
                            _nc_from(nnz_y, gy, gx), 16)
            if cbp_chroma:
                for k in ("cb", "cr"):
                    c = cdc_lv[k]
                    _cavlc_encode_block(
                        mb, np.array([c[0, 0], c[0, 1], c[1, 0],
                                      c[1, 1]], np.int64), -1, 4)
            if cbp_chroma == 2:
                for k in ("cb", "cr"):
                    for br in range(2):
                        for bc in range(2):
                            gy, gx = 2 * mby + br, 2 * mbx + bc
                            nnz_c[k][gy, gx] = _cavlc_encode_block(
                                mb, _h264_scan_ac(cac_lv[k][br, bc]),
                                _nc_from(nnz_c[k], gy, gx), 15)
            if mb.bits > pcm_threshold:
                # entropy payload lost to raw samples: intra-code it
                nnz_y[4 * mby:4 * mby + 4,
                      4 * mbx:4 * mbx + 4] = nzy_before
                w.ue(run)
                run = 0
                _enc_mb_intra16(w, yp, cbp, crp, ry, rcb, rcr, nnz_y,
                                nnz_c, qp, mby, mbx, pcm_threshold,
                                type_base=5)
                continue
            w.ue(run)
            run = 0
            mb.replay(w)
            refg[mby, mbx] = 0
            mvg[mby, mbx] = (mvx, mvy)
            mark_not_i4(mby, mbx)
            # ---- decoder-identical reconstruction
            rymb = np.empty((16, 16), np.int64)
            for br in range(4):
                for bc in range(4):
                    rymb[4 * br:4 * br + 4, 4 * bc:4 * bc + 4] = \
                        py[4 * br:4 * br + 4, 4 * bc:4 * bc + 4] + \
                        _inv4x4(_dequant_ac(lv[br, bc], qp))
            ry[16 * mby:16 * mby + 16, 16 * mbx:16 * mbx + 16] = \
                np.clip(rymb, 0, 255).astype(yp.dtype)
            for k, rp in (("cb", rcb), ("cr", rcr)):
                dcc = (_dequant_chroma_dc(cdc_lv[k], qpc) if cbp_chroma
                       else np.zeros((2, 2), np.int64))
                rcmb = np.empty((8, 8), np.int64)
                for br in range(2):
                    for bc in range(2):
                        d = (_dequant_ac(cac_lv[k][br, bc], qpc)
                             if cbp_chroma == 2 else
                             np.zeros((4, 4), np.int64))
                        d[0, 0] = dcc[br, bc]
                        rcmb[4 * br:4 * br + 4, 4 * bc:4 * bc + 4] = \
                            pch[k][4 * br:4 * br + 4,
                                   4 * bc:4 * bc + 4] + _inv4x4(d)
                rp[8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8] = \
                    np.clip(rcmb, 0, 255).astype(cbp.dtype)
    if run:
        w.ue(run)
    w.trailing()
    meta = {"kind": kind, "nnz_y": nnz_y, "mvg": mvg, "refg": refg}
    return bytes(w.buf), ry, rcb, rcr, meta


def _dec_mb_intra4(r, yp, cpl, nnz_y, nnz_c, qp, cq_off, mby, mbx,
                   i4mode, blk_done):
    """Decode ONE Intra_4x4 macroblock (mb_type 0 in I slices, 5 in P
    slices): sixteen prev/rem-coded prediction modes against the
    min(left, above) predictor (8.3.1.1), intra_chroma_pred_mode,
    coded_block_pattern through Table 9-4's Intra column, 16-coeff
    CAVLC luma residual blocks, chroma exactly as Intra_16x16, then
    sequential per-block reconstruction in _BLK_ORDER with the
    decoded-block top-right availability rule. Returns the updated
    slice QP."""
    modes = []
    for br, bc in _BLK_ORDER:
        by, bx = 4 * mby + br, 4 * mbx + bc
        pm = _i4_pred_mode(i4mode, by, bx)
        if r.u(1):               # prev_intra4x4_pred_mode_flag
            md = pm
        else:
            rem = r.u(3)
            md = rem if rem < pm else rem + 1
        i4mode[by, bx] = md
        modes.append(md)
    cmode = r.ue()
    if cmode > 3:
        raise MediaDecodeError("bad intra_chroma_pred_mode")
    code = r.ue()
    if code > 47:
        raise MediaDecodeError("bad coded_block_pattern")
    mb_cbp = _CBP_INTRA[code]
    cbp_luma, cbp_chroma = mb_cbp & 15, mb_cbp >> 4
    if mb_cbp:
        qp = (qp + r.se() + 52) % 52     # mb_qp_delta, spec wrap
    qpc = _H264_QPC[max(0, min(51, qp + cq_off))]
    lv = np.zeros((4, 4, 4, 4), np.int64)
    for g8 in range(4):
        if cbp_luma & (1 << g8):
            for br, bc in _BLK_ORDER[4 * g8:4 * g8 + 4]:
                gy, gx = 4 * mby + br, 4 * mbx + bc
                scan, tc = _cavlc_decode_block(
                    r, _nc_from(nnz_y, gy, gx), 16)
                nnz_y[gy, gx] = tc
                lv[br, bc] = _h264_unscan16(scan)
        else:
            for br, bc in _BLK_ORDER[4 * g8:4 * g8 + 4]:
                nnz_y[4 * mby + br, 4 * mbx + bc] = 0
    cdc_lv = {k: np.zeros((2, 2), np.int64) for k in nnz_c}
    if cbp_chroma:
        for k in ("cb", "cr"):
            scan, _ = _cavlc_decode_block(r, -1, 4)
            cdc_lv[k] = np.array(
                [[scan[0], scan[1]], [scan[2], scan[3]]], np.int64)
    cac_lv = {k: np.zeros((2, 2, 4, 4), np.int64) for k in nnz_c}
    if cbp_chroma == 2:
        for k in ("cb", "cr"):
            for br in range(2):
                for bc in range(2):
                    gy, gx = 2 * mby + br, 2 * mbx + bc
                    scan, tc = _cavlc_decode_block(
                        r, _nc_from(nnz_c[k], gy, gx), 15)
                    nnz_c[k][gy, gx] = tc
                    cac_lv[k][br, bc] = _h264_unscan_ac(scan)
    else:
        for k in ("cb", "cr"):
            nnz_c[k][2 * mby:2 * mby + 2, 2 * mbx:2 * mbx + 2] = 0
    # ---- sequential luma reconstruction
    for (br, bc), md in zip(_BLK_ORDER, modes):
        by, bx = 4 * mby + br, 4 * mbx + bc
        t8, l4, tl = _i4_neigh(yp, blk_done, by, bx)
        if (md in (0, 3, 7) and t8 is None) \
                or (md in (1, 8) and l4 is None) \
                or (md in (4, 5, 6) and (t8 is None or l4 is None
                                         or tl is None)):
            raise MediaDecodeError(
                "intra_4x4 prediction from unavailable neighbours")
        d = _dequant_ac(lv[br, bc], qp)
        rec = np.clip(_pred_i4(md, t8, l4, tl) + _inv4x4(d), 0, 255)
        yp[4 * by:4 * by + 4, 4 * bx:4 * bx + 4] = \
            rec.astype(np.uint8)
        blk_done[by, bx] = True
    # ---- chroma (identical to the Intra_16x16 decoder)
    if (cmode == 1 and mbx == 0) or (cmode == 2 and mby == 0) \
            or (cmode == 3 and (mbx == 0 or mby == 0)):
        raise MediaDecodeError(
            "chroma prediction from unavailable neighbours")
    for k in ("cb", "cr"):
        rp = cpl[k]
        ctop = (rp[8 * mby - 1, 8 * mbx:8 * mbx + 8
                   ].astype(np.int64) if mby > 0 else None)
        cleft = (rp[8 * mby:8 * mby + 8, 8 * mbx - 1
                    ].astype(np.int64) if mbx > 0 else None)
        ctl = (int(rp[8 * mby - 1, 8 * mbx - 1])
               if (mby > 0 and mbx > 0) else None)
        cpred = _pred_chroma(cmode, ctop, cleft, ctl)
        dcc = (_dequant_chroma_dc(cdc_lv[k], qpc) if cbp_chroma
               else np.zeros((2, 2), np.int64))
        rcmb = np.empty((8, 8), np.int64)
        for br in range(2):
            for bc in range(2):
                d = (_dequant_ac(cac_lv[k][br, bc], qpc)
                     if cbp_chroma == 2 else np.zeros((4, 4),
                                                      np.int64))
                d[0, 0] = dcc[br, bc]
                rcmb[4 * br:4 * br + 4, 4 * bc:4 * bc + 4] = \
                    cpred[4 * br:4 * br + 4, 4 * bc:4 * bc + 4] \
                    + _inv4x4(d)
        rp[8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8] = \
            np.clip(rcmb, 0, 255).astype(np.uint8)
    return qp


def _dec_mb_intra16(r, mb_type, yp, cpl, nnz_y, nnz_c, qp, cq_off,
                    mby, mbx):
    """Decode ONE I_PCM (25) / Intra_16x16+CAVLC (1..24) macroblock
    into the slice planes, updating the CAVLC nnz grids in place
    (shared by the I-slice decoder and intra macroblocks inside P
    slices, whose caller passes ``mb_type - 5`` per 7.4.5). Returns
    the updated slice QP."""
    if mb_type == 25:
        r.byte_align()
        yp[16 * mby:16 * mby + 16, 16 * mbx:16 * mbx + 16] = (
            np.frombuffer(r.raw_bytes(256),
                          dtype=np.uint8).reshape(16, 16))
        cpl["cb"][8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8] = (
            np.frombuffer(r.raw_bytes(64),
                          dtype=np.uint8).reshape(8, 8))
        cpl["cr"][8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8] = (
            np.frombuffer(r.raw_bytes(64),
                          dtype=np.uint8).reshape(8, 8))
        nnz_y[4 * mby:4 * mby + 4, 4 * mbx:4 * mbx + 4] = 16
        for k in nnz_c:
            nnz_c[k][2 * mby:2 * mby + 2,
                     2 * mbx:2 * mbx + 2] = 16
        return qp
    if not 1 <= mb_type <= 24:
        raise MediaDecodeError(
            f"intra mb_type {mb_type}: only Intra_16x16 + "
            "CAVLC and I_PCM are implemented (I_4x4 needs "
            "the per-block prediction-mode coder)")
    lmode = (mb_type - 1) % 4
    q4 = (mb_type - 1) // 4
    cbp_chroma, cbp_luma = q4 % 3, 15 * (q4 // 3)
    cmode = r.ue()
    if cmode > 3:
        raise MediaDecodeError("bad intra_chroma_pred_mode")
    qp = (qp + r.se() + 52) % 52     # mb_qp_delta, spec wrap
    qpc = _H264_QPC[max(0, min(51, qp + cq_off))]
    dc_scan, _ = _cavlc_decode_block(
        r, _nc_from(nnz_y, 4 * mby, 4 * mbx), 16)
    dc_lv = np.zeros((4, 4), np.int64)
    for i, (rr, cc) in enumerate(_ZZ4):
        dc_lv[rr, cc] = dc_scan[i]
    ac_lv = np.zeros((4, 4, 4, 4), np.int64)
    if cbp_luma:
        for br, bc in _BLK_ORDER:
            gy, gx = 4 * mby + br, 4 * mbx + bc
            scan, tc = _cavlc_decode_block(
                r, _nc_from(nnz_y, gy, gx), 15)
            nnz_y[gy, gx] = tc
            ac_lv[br, bc] = _h264_unscan_ac(scan)
    else:
        nnz_y[4 * mby:4 * mby + 4, 4 * mbx:4 * mbx + 4] = 0
    cdc_lv = {k: np.zeros((2, 2), np.int64) for k in nnz_c}
    if cbp_chroma:
        for k in ("cb", "cr"):
            scan, _ = _cavlc_decode_block(r, -1, 4)
            cdc_lv[k] = np.array(
                [[scan[0], scan[1]], [scan[2], scan[3]]],
                np.int64)
    cac_lv = {k: np.zeros((2, 2, 4, 4), np.int64)
              for k in nnz_c}
    if cbp_chroma == 2:
        for k in ("cb", "cr"):
            for br in range(2):
                for bc in range(2):
                    gy, gx = 2 * mby + br, 2 * mbx + bc
                    scan, tc = _cavlc_decode_block(
                        r, _nc_from(nnz_c[k], gy, gx), 15)
                    nnz_c[k][gy, gx] = tc
                    cac_lv[k][br, bc] = _h264_unscan_ac(scan)
    else:
        for k in ("cb", "cr"):
            nnz_c[k][2 * mby:2 * mby + 2,
                     2 * mbx:2 * mbx + 2] = 0
    # ---- reconstruction
    ltop = (yp[16 * mby - 1, 16 * mbx:16 * mbx + 16
               ].astype(np.int64) if mby > 0 else None)
    lleft = (yp[16 * mby:16 * mby + 16, 16 * mbx - 1
                ].astype(np.int64) if mbx > 0 else None)
    ltl = (int(yp[16 * mby - 1, 16 * mbx - 1])
           if (mby > 0 and mbx > 0) else None)
    if (lmode == 0 and ltop is None) or \
            (lmode == 1 and lleft is None) or \
            (lmode == 3 and ltl is None):
        raise MediaDecodeError(
            "intra prediction from unavailable neighbours")
    lpred = _pred_i16(lmode, ltop, lleft, ltl)
    dcy = _dequant_luma_dc(dc_lv, qp)
    rymb = np.empty((16, 16), np.int64)
    for br in range(4):
        for bc in range(4):
            d = (_dequant_ac(ac_lv[br, bc], qp) if cbp_luma
                 else np.zeros((4, 4), np.int64))
            d[0, 0] = dcy[br, bc]
            rymb[4 * br:4 * br + 4, 4 * bc:4 * bc + 4] = \
                lpred[4 * br:4 * br + 4, 4 * bc:4 * bc + 4] + \
                _inv4x4(d)
    yp[16 * mby:16 * mby + 16, 16 * mbx:16 * mbx + 16] = \
        np.clip(rymb, 0, 255).astype(np.uint8)
    if (cmode == 1 and mbx == 0) or (cmode == 2 and mby == 0) \
            or (cmode == 3 and (mbx == 0 or mby == 0)):
        raise MediaDecodeError(
            "chroma prediction from unavailable neighbours")
    for k in ("cb", "cr"):
        rp = cpl[k]
        ctop = (rp[8 * mby - 1, 8 * mbx:8 * mbx + 8
                   ].astype(np.int64) if mby > 0 else None)
        cleft = (rp[8 * mby:8 * mby + 8, 8 * mbx - 1
                    ].astype(np.int64) if mbx > 0 else None)
        ctl = (int(rp[8 * mby - 1, 8 * mbx - 1])
               if (mby > 0 and mbx > 0) else None)
        cpred = _pred_chroma(cmode, ctop, cleft, ctl)
        dcc = _dequant_chroma_dc(cdc_lv[k], qpc)
        rcmb = np.empty((8, 8), np.int64)
        for br in range(2):
            for bc in range(2):
                d = (_dequant_ac(cac_lv[k][br, bc], qpc)
                     if cbp_chroma == 2 else
                     np.zeros((4, 4), np.int64))
                d[0, 0] = dcc[br, bc]
                rcmb[4 * br:4 * br + 4, 4 * bc:4 * bc + 4] = \
                    cpred[4 * br:4 * br + 4,
                          4 * bc:4 * bc + 4] + _inv4x4(d)
        rp[8 * mby:8 * mby + 8, 8 * mbx:8 * mbx + 8] = \
            np.clip(rcmb, 0, 255).astype(np.uint8)
    return qp


def decode_h264(raw: bytes, *, return_mb_types: bool = False):
    """REAL decode of the H.264 Annex B baseline subset: SPS/PPS, I/IDR
    slices whose macroblocks are I_PCM (mb_type 25), Intra_16x16 with
    CAVLC residuals (1..24) or Intra_4x4 (mb_type 0 — nine directional
    predictors, prev/rem mode coding, Table 9-4 Intra cbp), and P
    slices with P_Skip runs and P_L0_16x16 macroblocks — quarter-pel
    luma / eighth-pel chroma motion compensation against the previous
    decoded picture, median MV prediction per 8.4.1.3, single
    reference — plus the same intra macroblocks as fallback (mb_type
    5..30). The in-loop deblocking filter (8.7) is applied whenever
    the stream does not disable it (idc 0/2, slice alpha/beta offsets
    honoured), after each picture completes — filtered pictures are
    the references and the output. B/SP/SI slices, sub-16x16 inter
    partitions, multiple reference pictures and CABAC raise
    MediaDecodeError naming the missing tool. Returns
    ``(frames float32 [0,1], usec_per_frame)``; with
    ``return_mb_types`` a third element lists each slice's mb_type
    sequence (P_Skip macroblocks appear as -1)."""
    sps = None
    pps = {"pic_init_qp": 26, "chroma_qp_offset": 0,
           "deblock_control": 0}
    frames = []
    mb_types_out = []
    ref = None                   # previous decoded picture (padded planes)
    for nal in _h264_nals(raw):
        typ = nal[0] & 0x1F
        rbsp = _ebsp_unescape(nal[1:])
        if typ == 7:
            sps = _h264_parse_sps(_H264BitReader(rbsp))
        elif typ == 8:
            pps = _h264_parse_pps(_H264BitReader(rbsp))
        elif typ == 6 or typ == 9:
            continue             # SEI / AUD skipped
        elif typ in (1, 5):
            if sps is None:
                raise MediaDecodeError("slice before SPS")
            r = _H264BitReader(rbsp)
            if r.ue() != 0:      # first_mb_in_slice
                raise MediaDecodeError(
                    "multi-slice pictures not supported (baseline subset)")
            stype = r.ue()       # slice_type
            if stype % 5 == 2:
                p_slice = False
            elif stype % 5 == 0:
                p_slice = True
                if typ == 5:
                    raise MediaDecodeError("IDR picture with a P slice")
            else:
                raise MediaDecodeError(
                    "only I and P slices are implemented "
                    "(B/SP/SI need more reference machinery)")
            r.ue()               # pic_parameter_set_id
            r.u(sps["log2_max_frame_num"])   # frame_num
            if typ == 5:
                r.ue()           # idr_pic_id
            if p_slice:
                if pps.get("weighted_pred"):
                    raise MediaDecodeError(
                        "weighted prediction not supported")
                active_refs = pps.get("num_ref_default", 0)
                if r.u(1):       # num_ref_idx_active_override_flag
                    active_refs = r.ue()
                if active_refs != 0:
                    raise MediaDecodeError(
                        "multiple reference pictures not supported")
                if r.u(1):       # ref_pic_list_modification_flag_l0
                    raise MediaDecodeError(
                        "ref pic list modification not supported")
            if (nal[0] >> 5) & 3:            # nal_ref_idc -> dec_ref_pic_marking
                if typ == 5:
                    r.u(2)       # no_output_of_prior_pics + long_term_reference
                elif r.u(1):
                    raise MediaDecodeError("adaptive ref pic marking not supported")
            qp = pps["pic_init_qp"] + r.se()
            needs_deblock = True
            off_a = off_b = 0
            if pps["deblock_control"]:
                # idc 1 disables; 0 filters everything; 2 filters all
                # but slice boundaries — identical here (one slice per
                # picture)
                if r.ue() == 1:          # disable_deblocking_filter_idc
                    needs_deblock = False
                else:
                    off_a = 2 * r.se()   # slice_alpha_c0_offset_div2
                    off_b = 2 * r.se()   # slice_beta_offset_div2
            cq_off = pps["chroma_qp_offset"]
            w_mbs, h_mbs = sps["w_mbs"], sps["h_mbs"]
            yp = np.zeros((16 * h_mbs, 16 * w_mbs), dtype=np.uint8)
            cbpl = np.zeros((8 * h_mbs, 8 * w_mbs), dtype=np.uint8)
            crpl = np.zeros((8 * h_mbs, 8 * w_mbs), dtype=np.uint8)
            nnz_y = np.zeros((4 * h_mbs, 4 * w_mbs), np.int64)
            nnz_c = {"cb": np.zeros((2 * h_mbs, 2 * w_mbs), np.int64),
                     "cr": np.zeros((2 * h_mbs, 2 * w_mbs), np.int64)}
            cpl = {"cb": cbpl, "cr": crpl}
            mb_types = []
            kind = np.zeros((h_mbs, w_mbs), np.int64)
            qpg = np.zeros((h_mbs, w_mbs), np.int64)
            refg = np.full((h_mbs, w_mbs), -1, np.int64)
            mvg = np.zeros((h_mbs, w_mbs, 2), np.int64)
            i4mode = np.full((4 * h_mbs, 4 * w_mbs), -1, np.int64)
            blk_done = np.zeros((4 * h_mbs, 4 * w_mbs), bool)

            def mark_not_i4(mby, mbx):
                i4mode[4 * mby:4 * mby + 4, 4 * mbx:4 * mbx + 4] = -1
                blk_done[4 * mby:4 * mby + 4,
                         4 * mbx:4 * mbx + 4] = True

            if not p_slice:
                for mb in range(w_mbs * h_mbs):
                    mby, mbx = divmod(mb, w_mbs)
                    mb_type = r.ue()
                    mb_types.append(mb_type)
                    kind[mby, mbx] = 2 if mb_type == 25 else 1
                    if mb_type == 0:     # I_4x4
                        qp = _dec_mb_intra4(r, yp, cpl, nnz_y, nnz_c,
                                            qp, cq_off, mby, mbx,
                                            i4mode, blk_done)
                    else:
                        qp = _dec_mb_intra16(r, mb_type, yp, cpl,
                                             nnz_y, nnz_c, qp, cq_off,
                                             mby, mbx)
                        mark_not_i4(mby, mbx)
                    qpg[mby, mbx] = qp
            else:
                if ref is None:
                    raise MediaDecodeError(
                        "P slice without a decoded reference picture")
                total = w_mbs * h_mbs
                mb = 0
                while mb < total:
                    skip_run = r.ue()
                    if mb + skip_run > total:
                        raise MediaDecodeError("mb_skip_run past slice end")
                    for _ in range(skip_run):
                        mby, mbx = divmod(mb, w_mbs)
                        _dec_mb_pskip(yp, cpl, mby, mbx, ref, refg, mvg)
                        mb_types.append(-1)
                        qpg[mby, mbx] = qp
                        mark_not_i4(mby, mbx)
                        mb += 1
                    if mb == total:
                        break
                    mby, mbx = divmod(mb, w_mbs)
                    mb_type = r.ue()
                    mb_types.append(mb_type)
                    if mb_type == 0:
                        qp = _dec_mb_inter16(r, yp, cpl, nnz_y, nnz_c,
                                             qp, cq_off, mby, mbx, ref,
                                             refg, mvg)
                        qpg[mby, mbx] = qp
                        mark_not_i4(mby, mbx)
                    elif mb_type == 5:   # I_4x4 inside a P slice
                        qp = _dec_mb_intra4(r, yp, cpl, nnz_y, nnz_c,
                                            qp, cq_off, mby, mbx,
                                            i4mode, blk_done)
                        kind[mby, mbx] = 1
                        qpg[mby, mbx] = qp
                    elif mb_type > 5:
                        qp = _dec_mb_intra16(r, mb_type - 5, yp, cpl,
                                             nnz_y, nnz_c, qp, cq_off,
                                             mby, mbx)
                        kind[mby, mbx] = 2 if mb_type == 30 else 1
                        qpg[mby, mbx] = qp
                        mark_not_i4(mby, mbx)
                    else:
                        raise MediaDecodeError(
                            f"P mb_type {mb_type}: only P_L0_16x16, "
                            "P_Skip and the intra fallbacks are "
                            "implemented (16x8/8x16/8x8 partitions "
                            "need the sub-macroblock coder)")
                    mb += 1
            if needs_deblock:
                _h264_deblock_frame(yp, cbpl, crpl, kind, qpg, mvg,
                                    refg, nnz_y, off_a=off_a,
                                    off_b=off_b, cq_off=cq_off)
            ref = (yp, cbpl, crpl)
            h, w = sps["h"], sps["w"]
            mb_types_out.append(mb_types)
            frames.append(_yuv420_to_rgb(
                yp[:h, :w], cbpl[:(h + 1) // 2, :(w + 1) // 2],
                crpl[:(h + 1) // 2, :(w + 1) // 2]))
        else:
            raise MediaDecodeError(f"unsupported NAL unit type {typ}")
    if not frames:
        raise MediaDecodeError("H.264 stream has no decodable slices")
    if return_mb_types:
        return np.stack(frames), int(sps["usec_per_frame"]), mb_types_out
    return np.stack(frames), int(sps["usec_per_frame"])


decode_h264_intra = decode_h264      # back-compat names for the subset
decode_h264_ipcm = decode_h264


def decode_video(raw: bytes):
    """Container dispatch (magic-sniffed, like decode_wav): RIFF/AVI ->
    decode_avi_mjpeg, ISO-BMFF/MP4 -> decode_mp4_mjpeg, Annex B start
    code -> decode_h264 (the I/P baseline subset: I_PCM, Intra_16x16 +
    CAVLC, P_Skip / P_L0_16x16 GOP streams). Returns
    ``(frames, usec_per_frame)``."""
    if raw[:4] == b"RIFF":
        return decode_avi_mjpeg(raw)
    if len(raw) >= 12 and raw[4:8] == b"ftyp":
        return decode_mp4_mjpeg(raw)
    if raw[:4] == _H264_START or raw[:3] == b"\x00\x00\x01":
        return decode_h264_ipcm(raw)
    raise MediaDecodeError("unrecognized video container")


class VideoFeatures:
    """Actor-pool stage: video binary (MJPEG in AVI or MP4, dispatched
    by container magic) -> per-clip features (n_frames int64,
    usec_per_frame int64, mean_luma float64 over all frames) — the
    video analogue of AudioFeatures."""

    def __init__(self, in_col: str = "media"):
        self.in_col = in_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        nfr, upf, luma = [], [], []
        for raw in df[self.in_col]:
            fr, u = decode_video(raw)
            nfr.append(fr.shape[0])
            upf.append(u)
            luma.append(float(
                (0.299 * fr[..., 0] + 0.587 * fr[..., 1]
                 + 0.114 * fr[..., 2]).mean()))
        df = df.drop(columns=[self.in_col]).copy()
        df["n_frames"] = np.asarray(nfr, dtype=np.int64)
        df["usec_per_frame"] = np.asarray(upf, dtype=np.int64)
        df["mean_luma"] = np.asarray(luma, dtype=np.float64)
        return df


def video_features(ds, *, concurrency: int = 4, batch_size: int = 16,
                   in_col: str = "media"):
    """Large-binary-aware actor pool over MJPEG-AVI clips (small
    batches: a clip is n_frames full JPEGs)."""
    return ds.map_batches(
        VideoFeatures,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        fn_constructor_kwargs={"in_col": in_col},
    )


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


# ------------------------------------------------------- perceptual hash
# 64-bit pHash for image near-dup detection: resize to 32x32, 2-D
# DCT-II, keep the 8x8 low-frequency block, bit i = coeff_i > median.
# Classic pHash construction (Zauner, "Implementation and Benchmarking
# of Perceptual Image Hash Functions", 2010). Deterministic float64
# pipeline — rerun/layout-stable, but not SQL-expressible (DCT).


def _dct2_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (A @ x == DCT(x))."""
    k = np.arange(n, dtype=np.float64)
    a = np.sqrt(2.0 / n) * np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / (2 * n))
    a[0] *= np.sqrt(0.5)
    return a


_PHASH_A32 = _dct2_matrix(32)
_REC601 = np.array([0.299, 0.587, 0.114], dtype=np.float64)


def phash64(img: np.ndarray) -> np.uint64:
    """64-bit perceptual hash of one image ((H, W) gray or (H, W, 3)
    RGB, any dtype). Brightness shifts move only the DC coefficient,
    small noise only high frequencies — near-duplicate images land
    within a few bits of each other while distinct content is ~32 bits
    apart (independent coin flips per bit)."""
    g = np.asarray(img, dtype=np.float64)
    if g.ndim == 3:
        g = g @ _REC601
    if g.shape != (32, 32):
        g = resize_bilinear(g, 32, 32)
    d = _PHASH_A32 @ g @ _PHASH_A32.T
    block = d[:8, :8].ravel()
    bits = block > np.median(block)
    return np.uint64(np.packbits(bits).view(">u8")[0])


class PHashImages:
    """Actor-pool stage: pixel tensors -> int64 ``phash`` column (the
    uint64 hash viewed as int64, matching the simhash storage
    convention so dedup.hash64_near_dup_pairs consumes it directly).
    The DCT basis is module-level state — built once per worker, never
    per batch."""

    def __init__(self, in_col: str = "pixels", out_col: str = "phash"):
        self.in_col, self.out_col = in_col, out_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        h = np.array([phash64(t) for t in df[self.in_col]],
                     dtype=np.uint64).view(np.int64)
        df = df.drop(columns=[self.in_col]).copy()
        df[self.out_col] = h
        return df


def phash_images(ds, *, concurrency: int = 8, batch_size: int = 64,
                 in_col: str = "pixels", out_col: str = "phash"):
    """decode -> phash over a pixel-tensor column; compose with
    dedup.hash64_near_dup_pairs for image near-dup pairs."""
    return ds.map_batches(
        PHashImages, batch_format="pandas", batch_size=batch_size,
        concurrency=(1, concurrency),
        fn_constructor_kwargs={"in_col": in_col, "out_col": out_col})


def video_phash64(frames: np.ndarray, *, max_frames: int = 8) -> np.uint64:
    """64-bit video fingerprint: pHash up to ``max_frames`` evenly
    sampled frames (pixel-center sampling, same convention as
    resize_nearest), then BITWISE-MAJORITY pool across frames (bit set
    iff set in strictly more than half — ties clear). Temporal pooling
    keeps the fingerprint stable under re-encode/brightness/mild
    motion while distinct clips stay ~32 bits apart."""
    n = len(frames)
    if n == 0:
        raise MediaDecodeError("video_phash64: no frames")
    k = min(n, max_frames)
    idx = np.unique(((2 * np.arange(k) + 1) * n) // (2 * k))
    shift = np.arange(64, dtype=np.uint64)
    bits = np.stack([
        ((phash64(frames[int(i)]) >> shift) & np.uint64(1)).astype(np.int64)
        for i in idx])
    maj = bits.sum(axis=0) * 2 > len(idx)
    return np.uint64(np.packbits(maj).view(">u8")[0])


class VideoPHash:
    """Actor-pool stage: MJPEG-AVI binary column -> int64 ``vhash``
    video fingerprints (real container walk + real JPEG decode per
    sampled frame; uint64 viewed as int64 for
    dedup.hash64_near_dup_pairs)."""

    def __init__(self, in_col: str = "media", out_col: str = "vhash",
                 max_frames: int = 8):
        self.in_col, self.out_col = in_col, out_col
        self.max_frames = max_frames

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = [video_phash64(decode_avi_mjpeg(raw)[0],
                              max_frames=self.max_frames)
                for raw in df[self.in_col]]
        df = df.drop(columns=[self.in_col]).copy()
        df[self.out_col] = np.array(sigs, dtype=np.uint64).view(np.int64)
        return df


def video_phash_signatures(ds, *, concurrency: int = 8,
                           batch_size: int = 16,
                           in_col: str = "media", out_col: str = "vhash",
                           max_frames: int = 8):
    """Binary clips stay in small batches (large payloads); compose
    with dedup.hash64_near_dup_pairs for video near-dup pairs."""
    return ds.map_batches(
        VideoPHash, batch_format="pandas", batch_size=batch_size,
        concurrency=(1, concurrency),
        fn_constructor_kwargs={"in_col": in_col, "out_col": out_col,
                               "max_frames": max_frames})


# --------------------------------------------------- audio fingerprint
# Spectral-landmark fingerprinting (the Shazam constellation shape,
# Wang 2003): per-frame spectral peak, landmarks = (peak_t, peak_{t+d},
# d) packed into one int64 code. Matching clips share many landmark
# codes; candidate pairs come from a posting-list shuffle
# (dedup.shared_key_pairs), never a quadratic clip x clip scan.


def audio_landmarks(samples: np.ndarray, *, n_fft: int = 512,
                    hop: int = 256, fanout: int = 4) -> np.ndarray:
    """Distinct int64 landmark codes of one clip ((n,) mono or (n, ch)
    float/int samples, channels downmixed). Per rectangular frame the
    dominant non-DC rfft bin is the peak (argmax — ties resolve to the
    lowest bin, deterministic); each peak pairs with the next
    ``fanout`` frames' peaks: code = f1 << 20 | f2 << 8 | dt."""
    if n_fft // 2 >= 1 << 12:
        raise ValueError("audio_landmarks: n_fft//2 must fit the "
                         "12-bit peak field (n_fft < 8192)")
    if fanout >= 1 << 8:
        raise ValueError("audio_landmarks: fanout must fit the 8-bit "
                         "dt field (< 256)")
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    n = (len(x) - n_fft) // hop + 1
    if n < 2:
        return np.empty(0, dtype=np.int64)
    idx = np.arange(n)[:, None] * hop + np.arange(n_fft)[None, :]
    mag = np.abs(np.fft.rfft(x[idx], axis=1))
    peaks = 1 + np.argmax(mag[:, 1:], axis=1).astype(np.int64)
    outs = []
    for d in range(1, fanout + 1):
        if n - d < 1:
            break
        outs.append((peaks[:n - d] << 20) | (peaks[d:] << 8)
                    | np.int64(d))
    return np.unique(np.concatenate(outs))


class AudioLandmarks:
    """Actor-pool stage: WAV binary column -> exploded (id, lm) int64
    landmark rows (real RIFF walk + PCM16/ADPCM decode), ready for the
    posting-list pair shuffle."""

    def __init__(self, in_col: str = "media", id_col: str = "doc_id",
                 out_col: str = "lm", n_fft: int = 512, hop: int = 256,
                 fanout: int = 4):
        self.in_col, self.id_col, self.out_col = in_col, id_col, out_col
        self.n_fft, self.hop, self.fanout = n_fft, hop, fanout

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids, lms = [], []
        for i, raw in zip(df[self.id_col].to_numpy(np.int64),
                          df[self.in_col]):
            lm = audio_landmarks(decode_wav(raw)[0], n_fft=self.n_fft,
                                 hop=self.hop, fanout=self.fanout)
            ids.append(np.full(len(lm), i, dtype=np.int64))
            lms.append(lm)
        if not ids:
            return pd.DataFrame({self.id_col: pd.Series(dtype=np.int64),
                                 self.out_col: pd.Series(dtype=np.int64)})
        return pd.DataFrame({self.id_col: np.concatenate(ids),
                             self.out_col: np.concatenate(lms)})


def audio_landmark_rows(ds, *, concurrency: int = 8, batch_size: int = 32,
                        in_col: str = "media", id_col: str = "doc_id",
                        out_col: str = "lm"):
    return ds.map_batches(
        AudioLandmarks, batch_format="pandas", batch_size=batch_size,
        concurrency=(1, concurrency),
        fn_constructor_kwargs={"in_col": in_col, "id_col": id_col,
                               "out_col": out_col})
