"""Multimodal column plumbing (task brief): treat image/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` UDFs.

The container has no image codec libraries, so the decoder is a pure-python
header parser for the two formats that need none: **BMP** (fixed-offset
little-endian DIB header) and **PPM/PGM** (ASCII header).  The synthetic
fixture plants real images of both kinds (sources/synth.py
``_write_images``), so (width, height, channels) is REAL extraction for
them; other binary payloads (JPEG/PNG would need zlib/huffman codecs) fall
back to a deterministic md5-derived fake so the plumbing stays total, or
raise with ``deterministic_fake=False``.  Swapping in PIL/opencv at
deployment is a one-function change (``decode_image``).
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


def decode_image(raw: bytes) -> Optional[Tuple[int, int, int]]:
    """Real (width, height, channels) for BMP / PPM / PGM bytes; None for
    anything else (formats needing entropy codecs absent in the container)."""
    return _decode_bmp(raw) or _decode_pnm(raw)


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
            "undecodable image payload (only BMP/PPM/PGM decode without "
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


def resize_images(
    df: DataFrame, out_w: int, out_h: int, url_col="url", bin_col="image"
) -> DataFrame:
    """Binary image column → resized binary image column.  Decodable
    payloads (binary PNM) get a REAL nearest-neighbor resize; everything
    else passes through unchanged with ``resized = false`` (total, like
    the decode path).  Row-local Arrow batches: no shuffle, partitioning
    inherited from the input scan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"url": [], "out_w": [], "out_h": [], "resized": [],
                   "image": []}
            for url, raw in zip(pdf[url_col], pdf[bin_col]):
                raw = bytes(raw)
                resized = resize_pnm(raw, out_w, out_h)
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
