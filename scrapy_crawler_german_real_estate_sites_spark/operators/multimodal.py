"""Multimodal column plumbing (task brief): treat image/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` UDFs.

The container has no image codec libraries, so decoding is pure python:
**BMP** (fixed-offset little-endian DIB header), **PPM/PGM** (ASCII
header), and **PNG** — a real IHDR+IDAT decoder (zlib is stdlib; all five
scanline filters, palette expansion, non-interlaced) plus a filter-0
encoder, so width/height/pixels are REAL for the dominant web format.
The synthetic fixture plants real images of all three families
(sources/synth.py ``_write_images``), verified against recorded ground
truth.  Only payloads needing huffman/DCT codecs (JPEG) fall back to a
deterministic md5-derived fake so the plumbing stays total, or raise with
``deterministic_fake=False``.  Swapping in PIL/opencv at deployment is a
one-function change (``decode_image``).
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame

DECODED_SCHEMA = (
    "url string, n_bytes long, width int, height int, channels int, "
    "decoded boolean, feature array<float>"
)


def _decode_bmp(raw: bytes) -> Optional[Tuple[int, int, int]]:
    """24/32/8-bit uncompressed BMP: magic 'BM', int32-LE width at byte 18,
    int32-LE height at 22 (negative = top-down), uint16-LE bpp at 28."""
    if len(raw) < 30 or raw[:2] != b"BM":
        return None
    width = int.from_bytes(raw[18:22], "little", signed=True)
    height = abs(int.from_bytes(raw[22:26], "little", signed=True))
    bpp = int.from_bytes(raw[28:30], "little")
    channels = {8: 1, 24: 3, 32: 4}.get(bpp)
    if channels is None or width <= 0 or height <= 0:
        return None
    return width, height, channels


def _decode_pnm(raw: bytes) -> Optional[Tuple[int, int, int]]:
    """PPM/PGM (P2/P3/P5/P6): ASCII 'width height maxval' header with
    '#'-comment lines allowed between tokens."""
    if len(raw) < 2 or raw[0:1] != b"P" or raw[1:2] not in b"2356":
        return None
    channels = 3 if raw[1:2] in b"36" else 1
    tokens, i, n = [], 2, len(raw)
    while len(tokens) < 2 and i < n:
        c = raw[i : i + 1]
        if c == b"#":  # comment to end of line
            while i < n and raw[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < n and raw[j : j + 1].isdigit():
                j += 1
            tokens.append(int(raw[i:j]))
            i = j
        else:
            return None
    if len(tokens) < 2 or tokens[0] <= 0 or tokens[1] <= 0:
        return None
    return tokens[0], tokens[1], channels


# ---------------------------------------------------------------------------
# PNG — real pure-python decode (zlib is stdlib; PNG's only entropy codec
# is DEFLATE).  Spec: ISO/IEC 15948 / RFC 2083.  Supported: bit depth 8,
# color types 0 (gray) / 2 (rgb) / 3 (palette) / 4 (gray+alpha) / 6 (rgba),
# all five scanline filters, non-interlaced only (Adam7 → None).
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> channels in the filtered stream / in the decoded output
_PNG_STREAM_CH = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_OUT_CH = {0: 1, 2: 3, 3: 3, 4: 2, 6: 4}


def _png_ihdr(raw: bytes) -> Optional[Tuple[int, int, int]]:
    """(width, height, channels) from the IHDR chunk — REAL header
    extraction, no inflate.  None unless 8-bit, non-interlaced, and a
    color type we fully decode (so the dims claim is backed by a working
    pixel path)."""
    if len(raw) < 33 or raw[:8] != _PNG_SIG or raw[12:16] != b"IHDR":
        return None
    w = int.from_bytes(raw[16:20], "big")
    h = int.from_bytes(raw[20:24], "big")
    depth, ctype, comp, filt, interlace = raw[24:29]
    out_ch = _PNG_OUT_CH.get(ctype)
    if (out_ch is None or depth != 8 or comp or filt or interlace
            or w <= 0 or h <= 0):
        return None
    return w, h, out_ch


def decode_png(raw: bytes):
    """Full PNG decode → numpy (height, width, channels) uint8 array, or
    None for anything _png_ihdr rejects / malformed streams.  Pure python
    + numpy: chunk walk, IDAT concat, zlib inflate, per-scanline
    de-filter (None/Sub/Up/Average/Paeth), palette expansion."""
    import zlib

    import numpy as np

    hdr = _png_ihdr(raw)
    if hdr is None:
        return None
    w, h, _ = hdr
    ctype = raw[25]
    stream_ch = _PNG_STREAM_CH[ctype]
    # chunk walk: 4-byte len, 4-byte type, data, 4-byte crc
    idat, plte, pos, n = [], None, 8, len(raw)
    while pos + 8 <= n:
        clen = int.from_bytes(raw[pos : pos + 4], "big")
        ctyp = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + clen]
        if len(data) < clen:
            return None
        if ctyp == b"IDAT":
            idat.append(data)
        elif ctyp == b"PLTE":
            plte = data
        elif ctyp == b"IEND":
            break
        pos += 12 + clen
    if not idat or (ctype == 3 and (plte is None or len(plte) % 3)):
        return None
    try:
        flat = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = w * stream_ch
    if len(flat) != h * (1 + stride):
        return None
    bpp = stream_ch  # bytes per pixel (depth 8)
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint16)
    pos = 0
    for y in range(h):
        ftype = flat[pos]
        line = np.frombuffer(flat, np.uint8, stride, pos + 1).astype(np.uint16)
        pos += 1 + stride
        if ftype == 0:
            pass
        elif ftype == 2:  # Up
            line = (line + prev) & 0xFF
        elif ftype == 1:  # Sub — sequential along the row
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((int(a) + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = int(line[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        else:
            return None
        out[y] = line.astype(np.uint8)
        prev = line
    if ctype == 3:
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = out.reshape(h, w)
        if int(idx.max(initial=0)) >= len(pal):
            return None
        return pal[idx]
    return out.reshape(h, w, stream_ch)


def encode_png(arr) -> bytes:
    """Minimal PNG writer: filter 0 on every scanline, one IDAT.  Accepts
    (h, w) gray or (h, w, {1,2,3,4}) uint8 arrays.  Canonical output for
    fixtures and the PNG resize path — decode_png(encode_png(a)) == a."""
    import zlib

    import numpy as np

    a = np.asarray(arr, np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return (
            len(data).to_bytes(4, "big") + body
            + (zlib.crc32(body) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, ctype, 0, 0, 0])
    )
    flat = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        _PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(flat)) + chunk(b"IEND", b"")
    )


def decode_image(raw: bytes) -> Optional[Tuple[int, int, int]]:
    """Real (width, height, channels) for BMP / PNG / PPM / PGM bytes;
    None for anything else (JPEG's arithmetic/huffman codecs are the one
    family left without a pure-python path)."""
    return _decode_bmp(raw) or _png_ihdr(raw) or _decode_pnm(raw)


def fake_dims(raw: bytes) -> Tuple[int, int, int]:
    """Deterministic md5-derived stand-in dims for undecodable payloads —
    keeps the pipeline total and the output oracle-checkable."""
    h = hashlib.md5(raw).digest()
    width = 64 + int.from_bytes(h[0:2], "big") % 1024
    height = 64 + int.from_bytes(h[2:4], "big") % 1024
    channels = 1 + h[4] % 4
    return width, height, channels


def decode_image_stub(raw: bytes, deterministic_fake: bool):
    """Back-compat shim: real decode when the bytes are BMP/PNM, else the
    md5 fake (or ValueError when fakes are disallowed)."""
    real = decode_image(raw)
    if real is not None:
        return real
    if not deterministic_fake:
        raise ValueError(
            "undecodable image payload (BMP/PNG/PPM/PGM decode without "
            "codec libraries; pass deterministic_fake=True for a total path)"
        )
    return fake_dims(raw)


def extract_image_features(
    df: DataFrame, url_col="url", bin_col="html", deterministic_fake=True,
    feat_dim=8,
) -> DataFrame:
    """Binary column → typed metadata + a small feature vector.  One Arrow
    batch in, one out; at scale this partitions by the binary column's
    storage bucketing, and the UDF is the only Python in the job.  The
    ``decoded`` flag says whether dims came from a real header parse."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"url": [], "n_bytes": [], "width": [], "height": [],
                   "channels": [], "decoded": [], "feature": []}
            for url, raw in zip(pdf[url_col], pdf[bin_col]):
                raw = bytes(raw)
                real = decode_image(raw)
                if real is not None:
                    w, h, c = real
                elif deterministic_fake:
                    w, h, c = fake_dims(raw)
                else:
                    raise ValueError(f"undecodable image payload at {url}")
                dig = hashlib.md5(raw + b"#feat").digest()
                feat = [dig[i] / 255.0 for i in range(feat_dim)]
                out["url"].append(url)
                out["n_bytes"].append(len(raw))
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["decoded"].append(real is not None)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return df.select(url_col, bin_col).mapInPandas(run, DECODED_SCHEMA)


# ---------------------------------------------------------------------------
# resize + frame sampling (the remaining multimodal plumbing verbs)
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = (
    "url string, out_w int, out_h int, resized boolean, image binary"
)
FRAMES_SCHEMA = "url string, frame_idx int, frame binary"


def _parse_pnm_binary(raw: bytes):
    """Full parse of binary PNM (P5 gray / P6 rgb, maxval ≤ 255):
    (w, h, channels, pixel_offset) or None."""
    if len(raw) < 2 or raw[0:1] != b"P" or raw[1:2] not in b"56":
        return None
    channels = 3 if raw[1:2] == b"6" else 1
    tokens, i, n = [], 2, len(raw)
    while len(tokens) < 3 and i < n:
        c = raw[i : i + 1]
        if c == b"#":
            while i < n and raw[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < n and raw[j : j + 1].isdigit():
                j += 1
            tokens.append(int(raw[i:j]))
            i = j
        else:
            return None
    if len(tokens) < 3 or tokens[0] <= 0 or tokens[1] <= 0 or tokens[2] > 255:
        return None
    i += 1  # exactly ONE whitespace byte separates maxval from pixels
    w, h = tokens[0], tokens[1]
    if len(raw) < i + w * h * channels:
        return None
    return w, h, channels, i


def resize_pnm(raw: bytes, out_w: int, out_h: int) -> Optional[bytes]:
    """REAL nearest-neighbor resize for binary PNM payloads (the codec-free
    format family): returns resized bytes in the same format, or None for
    anything that isn't binary P5/P6."""
    import numpy as np

    parsed = _parse_pnm_binary(raw)
    if parsed is None:
        return None
    w, h, ch, off = parsed
    px = np.frombuffer(raw, dtype=np.uint8, count=w * h * ch, offset=off)
    px = px.reshape(h, w, ch)
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    out = px[ys][:, xs]
    magic = b"P6" if ch == 3 else b"P5"
    return magic + f"\n{out_w} {out_h}\n255\n".encode() + out.tobytes()


def resize_png(raw: bytes, out_w: int, out_h: int) -> Optional[bytes]:
    """REAL nearest-neighbor resize for PNG payloads: full decode →
    index-select → re-encode (filter 0).  None for non-PNG bytes."""
    import numpy as np

    px = decode_png(raw)
    if px is None:
        return None
    h, w = px.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return encode_png(px[ys][:, xs])


def resize_any(raw: bytes, out_w: int, out_h: int) -> Optional[bytes]:
    """Dispatch resize across the decodable families (binary PNM, PNG)."""
    if raw[:8] == _PNG_SIG:
        return resize_png(raw, out_w, out_h)
    return resize_pnm(raw, out_w, out_h)


def resize_images(
    df: DataFrame, out_w: int, out_h: int, url_col="url", bin_col="image"
) -> DataFrame:
    """Binary image column → resized binary image column.  Decodable
    payloads (binary PNM, PNG) get a REAL nearest-neighbor resize;
    everything else passes through unchanged with ``resized = false``
    (total, like the decode path).  Row-local Arrow batches: no shuffle,
    partitioning inherited from the input scan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"url": [], "out_w": [], "out_h": [], "resized": [],
                   "image": []}
            for url, raw in zip(pdf[url_col], pdf[bin_col]):
                raw = bytes(raw)
                resized = resize_any(raw, out_w, out_h)
                out["url"].append(url)
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                out["resized"].append(resized is not None)
                out["image"].append(resized if resized is not None else raw)
            yield pd.DataFrame(out)

    return df.select(url_col, bin_col).mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame, frame_bytes: int, every_n: int = 1,
    url_col="url", bin_col="video",
) -> DataFrame:
    """Deterministic frame sampling over an opaque fixed-stride "video"
    layout (frame k = bytes [k*frame_bytes, (k+1)*frame_bytes)): one input
    row explodes to one row per sampled frame.  Real video containers need
    codecs this container lacks — the LAYOUT is the honest stand-in; the
    Spark-side shape (binary in, exploded frame rows out, batch-size
    change inside one Arrow pass) is the part that matters at scale.
    Trailing partial frames are dropped (fixed-stride contract)."""
    if frame_bytes <= 0 or every_n <= 0:
        raise ValueError("frame_bytes and every_n must be positive")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"url": [], "frame_idx": [], "frame": []}
            for url, raw in zip(pdf[url_col], pdf[bin_col]):
                raw = bytes(raw)
                for k in range(0, len(raw) // frame_bytes, every_n):
                    out["url"].append(url)
                    out["frame_idx"].append(k)
                    out["frame"].append(
                        raw[k * frame_bytes : (k + 1) * frame_bytes]
                    )
            yield pd.DataFrame(out)

    return df.select(url_col, bin_col).mapInPandas(run, FRAMES_SCHEMA)
