"""Multimodal column plumbing (task brief): treat image/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` UDFs.

The container has no image/audio codecs, so the decode step is STUBBED:
``decode_image_stub`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, in which case it derives (width, height,
n_channels) deterministically from the bytes' md5 — the Spark-side
plumbing (schema, batching, partitioning, UDF signature) is real and
tested; swapping in PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

DECODED_SCHEMA = (
    "url string, n_bytes long, width int, height int, channels int, "
    "feature array<float>"
)


def decode_image_stub(raw: bytes, deterministic_fake: bool):
    if not deterministic_fake:
        raise NotImplementedError(
            "image decode requires PIL/opencv, not present in this container; "
            "pass deterministic_fake=True for the plumbing path"
        )
    h = hashlib.md5(raw).digest()
    width = 64 + int.from_bytes(h[0:2], "big") % 1024
    height = 64 + int.from_bytes(h[2:4], "big") % 1024
    channels = 1 + h[4] % 4
    return width, height, channels


def extract_image_features(
    df: DataFrame, url_col="url", bin_col="html", deterministic_fake=True,
    feat_dim=8,
) -> DataFrame:
    """Binary column → typed metadata + a small feature vector.  One Arrow
    batch in, one out; at scale this partitions by the binary column's
    storage bucketing, and the UDF is the only Python in the job."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"url": [], "n_bytes": [], "width": [], "height": [],
                   "channels": [], "feature": []}
            for url, raw in zip(pdf[url_col], pdf[bin_col]):
                raw = bytes(raw)
                w, h, c = decode_image_stub(raw, deterministic_fake)
                dig = hashlib.md5(raw + b"#feat").digest()
                feat = [dig[i] / 255.0 for i in range(feat_dim)]
                out["url"].append(url)
                out["n_bytes"].append(len(raw))
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return df.select(url_col, bin_col).mapInPandas(run, DECODED_SCHEMA)
