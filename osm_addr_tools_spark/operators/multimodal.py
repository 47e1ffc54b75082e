"""Multimodal column plumbing (driver mandate): image/audio/video as opaque
``binary`` columns with typed metadata; decode / feature-extract / resize /
frame-sample as Arrow-batched UDFs over ``mapInPandas``.

The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested. The actual codec step is STUBBED: this
container has no image/audio libraries, so ``decode=\"real\"`` raises
NotImplementedError, and the default deterministic fake decoder parses the
synthetic header format produced by :func:`synth_media`. Swapping the fake
for Pillow/ffmpeg is a one-function change that does not touch any plan.

Media table schema (engine convention):
    media_id long, kind string ('image'|'audio'|'video'),
    bytes binary, meta map<string,string>
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_DDL = "media_id long, kind string, bytes binary, meta map<string,string>"

_MAGIC = b"SYNM"  # synthetic media header: SYNM | kind(1B) | w:u16 | h:u16 | frames:u16
_KINDS = {0: "image", 1: "audio", 2: "video"}
_KIND_IDS = {v: k for k, v in _KINDS.items()}


def synth_media(spark, n: int) -> DataFrame:
    """Deterministic fake media: header + id-seeded payload bytes."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            rows = []
            for i in ids.tolist():
                kind_id = i % 3
                w, h, frames = 16 + i % 64, 16 + (i * 7) % 48, 1 + i % 30
                payload = (np.arange(w * h, dtype=np.uint8) + (i % 251)).tobytes()
                blob = _MAGIC + struct.pack("<BHHH", kind_id, w, h, frames) + payload
                rows.append(
                    (
                        i,
                        _KINDS[kind_id],
                        blob,
                        {"codec": "synm", "w": str(w), "h": str(h)},
                    )
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "bytes", "meta"])

    return spark.range(n).mapInPandas(gen, schema=MEDIA_DDL)


def _parse_header(blob: bytes):
    if blob is None or not blob.startswith(_MAGIC):
        return None
    kind_id, w, h, frames = struct.unpack("<BHHH", blob[4:11])
    return _KINDS.get(kind_id), w, h, frames


def decode_media(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode step: binary → typed struct(width, height, n_frames, ok).

    ``decoder="real"`` is the integration point for an actual codec —
    NotImplementedError here because no image/audio library exists in this
    container (STUB, clearly marked; the plan shape is identical either way).
    """
    if decoder == "real":
        raise NotImplementedError(
            "real codecs (Pillow/ffmpeg) are not installed in this environment; "
            "use decoder='fake' — the Spark plumbing is identical"
        )

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            parsed = [_parse_header(x) for x in b["bytes"]]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "width": [p[1] if p else 0 for p in parsed],
                    "height": [p[2] if p else 0 for p in parsed],
                    "n_frames": [p[3] if p else 0 for p in parsed],
                    "ok": [p is not None for p in parsed],
                }
            )

    return df.mapInPandas(
        dec,
        schema="media_id long, kind string, width int, height int, n_frames int, ok boolean",
    )


def media_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Feature extraction: binary → array<float> (deterministic byte-
    histogram projection — the fake stand-in for a real embedding model;
    batch shape and output schema are the real contract)."""

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for blob in b["bytes"]:
                if blob is None:
                    out.append([0.0] * dim)
                    continue
                arr = np.frombuffer(blob, dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
                norm = np.linalg.norm(hist)
                out.append((hist / norm if norm else hist).astype(np.float32).tolist())
            yield pd.DataFrame({"media_id": b["media_id"], "feature": out})

    return df.mapInPandas(feat, schema="media_id long, feature array<float>")


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    (generator shape: one row → many). Non-video rows pass through with
    frame_no = 0."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, kinds, frames = [], [], []
            for mid, kind, blob in zip(b["media_id"], b["kind"], b["bytes"]):
                p = _parse_header(blob)
                n = p[3] if p else 1
                if kind == "video":
                    for f in range(0, n, every_n):
                        ids.append(mid)
                        kinds.append(kind)
                        frames.append(f)
                else:
                    ids.append(mid)
                    kinds.append(kind)
                    frames.append(0)
            yield pd.DataFrame({"media_id": ids, "kind": kinds, "frame_no": frames})

    return df.mapInPandas(sample, schema="media_id long, kind string, frame_no int")
