"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata (the reference stores base64 plan pictures as an opaque string
field — reference: src/librecatastro/scrapping/scrapper.py:152-174,
cadaster_entry.py:39; we keep bytes + a typed struct instead).

The decode step needs codec libraries that are NOT in this container, so
decoding is stubbed two ways (clearly marked):
  * ``decode_image_stub``  — raises NotImplementedError (production seam)
  * deterministic fake feature extraction — hash-derived, so the Spark-side
    plumbing (schema, Arrow batching, partitioning, UDF signatures, frame
    sampling) is real and testable end-to-end.

All heavy paths are ``mapInPandas`` over Arrow batches; binary payloads
never pass through per-row Python.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),     # image | audio | video
        StructField("payload", BinaryType(), True),    # opaque encoded bytes
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("codec", StringType(), True),
                    StructField("duration_ms", IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def decode_image_stub(payload: bytes) -> np.ndarray:
    """Production decode seam — requires PIL/libjpeg, absent here."""
    raise NotImplementedError(
        "image decode requires codec libraries not present in this "
        "environment; production wires PIL/torchvision here"
    )


def _fake_features(payloads: pd.Series, dim: int = FEATURE_DIM) -> pd.Series:
    """Deterministic stand-in for a real encoder: features derived from
    sha256 of the bytes, scaled to [-1, 1]. Exercises the exact Arrow
    plumbing a real model UDF would use."""
    return pd.Series(
        [
            None
            if w is None
            else (w.astype(np.float64) / 2**31 - 1.0).astype(np.float32).tolist()
            for w in _digest_words(payloads, dim)
        ]
    )


def _digest_words(payloads: pd.Series, dim: int = FEATURE_DIM) -> list:
    """sha256-derived uint32 words per payload (None → None). The digest is
    taken over the payload's HEX string (not the raw bytes) so the DuckDB
    oracle — whose sha256() accepts VARCHAR only — can compute the exact
    same value. Per-row hashing is inherent to a content hash (the real
    seam here is a batched GPU encoder; hashlib is the stand-in)."""
    out = []
    for b in payloads:
        if b is None:
            out.append(None)
            continue
        digest = hashlib.sha256(bytes(b).hex().encode()).digest()
        raw = np.frombuffer(
            (digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype="<u4"
        )
        out.append(raw)
    return out


def feature_rows(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Canonicalizable projection of ``extract_features``: one row per
    (media_id, dim) with the feature value as an EXACT float64
    (word / 2^31 - 1 — dyadic, so bit-identical in any IEEE engine).
    This is the contract-surface shape (list-typed columns can't be
    hash-compared); the vector form stays in ``extract_features``."""
    schema = "media_id string, kind string, dim int, value double"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            words = _digest_words(pdf["payload"], dim)
            keep = [i for i, w in enumerate(words) if w is not None]
            if not keep:
                yield pd.DataFrame(
                    {
                        "media_id": pd.Series(dtype="object"),
                        "kind": pd.Series(dtype="object"),
                        "dim": pd.Series(dtype="int32"),
                        "value": pd.Series(dtype="float64"),
                    }
                )
                continue
            w = np.stack([words[i] for i in keep])  # (n, dim) uint32
            n = len(keep)
            yield pd.DataFrame(
                {
                    "media_id": np.repeat(pdf["media_id"].to_numpy()[keep], dim),
                    "kind": np.repeat(pdf["kind"].to_numpy()[keep], dim),
                    "dim": np.tile(np.arange(dim, dtype=np.int32), n),
                    "value": w.astype(np.float64).ravel() / 2**31 - 1.0,
                }
            )

    return media.mapInPandas(fn, schema=schema)


def extract_features(media: DataFrame, batch_hint: int = 64) -> DataFrame:
    """media → (media_id, kind, feature array<float>) via mapInPandas.
    Shape/batching identical to a real GPU-encoder UDF (batched Arrow in,
    fixed-dim float vectors out)."""
    schema = "media_id string, kind string, feature array<float>"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": _fake_features(pdf["payload"]),
                }
            )

    return media.mapInPandas(fn, schema=schema)


def resize_meta(media: DataFrame, max_px: int = 512) -> DataFrame:
    """Resize planning as pure metadata math (Catalyst): target dims
    preserving aspect ratio — the cheap half of a decode-resize-encode
    pipeline, kept JVM-side."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(1.0), F.lit(max_px) / F.greatest(w, h).cast("double"))
    return media.withColumn(
        "target",
        F.struct(
            F.round(w * scale).cast("int").alias("width"),
            F.round(h * scale).cast("int").alias("height"),
        ),
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: explode one row per sampled
    timestamp (decode itself is the stubbed step). Pure Catalyst
    sequence+explode — the shuffle-free fan-out a real sampler needs."""
    v = media.where(F.col("kind") == "video")
    ts = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return v.select(
        "media_id",
        F.explode(ts).alias("frame_ts_ms"),
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fixture media table (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media{i}".encode()).digest() * 4
        rows.append(
            (
                f"m{i:04d}",
                kind,
                bytearray(payload),
                (64 + i % 512, 48 + i % 384, "fake", 5000 + 250 * (i % 8)),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
