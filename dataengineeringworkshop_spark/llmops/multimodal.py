"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the actual decode is
STUBBED: ``decode_media`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder derives
metadata from the bytes (stable across runs — testable plumbing).  The
Spark-side contract — schema, batch iteration, partition-parallelism,
UDF signature — is real and is what matters at 100 TB: media bytes stay
in executor memory Arrow batches, never on the driver, and the decode
parallelizes per partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, media_type string, content binary, "
    "source string, declared_bytes long"
)

DECODED_SCHEMA = (
    "media_id long, media_type string, n_bytes long, "
    "width int, height int, channels int, duration_ms long, ok boolean"
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as fake media payloads (the
    container ships no real media), assigning a deterministic media_type."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.col("text").cast("binary").alias("content"),
        F.col("source"),
        F.col("n_chars").alias("declared_bytes"),
    )


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode/feature-extract via mapInPandas.  Real decoders (PIL,
    torchaudio, pyav) are not in this container → NotImplementedError
    unless ``fake=True`` (deterministic stand-in, same plumbing)."""
    if not fake:
        raise NotImplementedError(
            "media decode requires image/audio libs not present in this "
            "container; pass fake=True for the deterministic stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = pdf["content"].map(len)
            h = pdf["content"].map(lambda b: sum(b[:16]) if len(b) else 0)
            is_img = pdf["media_type"] == "image"
            is_vid = pdf["media_type"] == "video"
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n.astype("int64"),
                    "width": ((h % 640) + 1).where(is_img | is_vid, 0).astype("int32"),
                    "height": ((h % 480) + 1).where(is_img | is_vid, 0).astype("int32"),
                    "channels": pd.Series(3, index=pdf.index).where(is_img | is_vid, 1).astype("int32"),
                    "duration_ms": (n * 10).where(~is_img, 0).astype("int64"),
                    "ok": n > 0,
                }
            )

    return media.mapInPandas(batches, DECODED_SCHEMA)


def resize_media(
    media: DataFrame, width: int = 64, height: int = 64, fake: bool = False
) -> DataFrame:
    """Resize plumbing via mapInPandas: real resizers (PIL/opencv) are
    not in this container → NotImplementedError unless ``fake=True``,
    which emits a deterministic fixed-size payload (truncate/cycle the
    source bytes to width×height×3) — the batch shape, schema, and
    output-size contract of a real resize stage."""
    if not fake:
        raise NotImplementedError(
            "resize requires an image library not present in this container; "
            "pass fake=True for the deterministic stub"
        )
    target = width * height * 3

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            def _fit(b: bytes) -> bytes:
                if not b:
                    return bytes(target)
                reps = target // len(b) + 1
                return (b * reps)[:target]

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.Series(width, index=pdf.index, dtype="int32"),
                    "height": pd.Series(height, index=pdf.index, dtype="int32"),
                    "content": pdf["content"].map(_fit),
                }
            )

    return media.mapInPandas(
        batches, "media_id long, width int, height int, content binary"
    )


def byte_histogram_features(media: DataFrame, dim: int = 64) -> DataFrame:
    """REAL content features (no stub needed): L1-normalized ``dim``-bin
    byte histogram + Shannon entropy per payload, vectorized with numpy
    inside mapInPandas.  The shape every learned-embedding extractor
    shares: binary in → fixed-width float vector out, Arrow-batched,
    partition-parallel."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, ents = [], []
            for b in pdf["content"]:
                arr = np.frombuffer(b or b"\x00", dtype=np.uint8)
                # uniform 0..255 -> 0..dim-1 bucketing, valid for ANY dim
                buckets = (arr.astype(np.int32) * dim) >> 8
                hist = np.bincount(buckets, minlength=dim)[:dim].astype(np.float64)
                total = hist.sum() or 1.0
                p = hist / total
                nz = p[p > 0]
                feats.append([float(x) for x in p])
                ents.append(float(-(nz * np.log2(nz)).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "features": feats,
                    "byte_entropy": ents,
                }
            )

    return media.mapInPandas(
        batches, "media_id long, features array<double>, byte_entropy double"
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' plumbing for video payloads: slice the byte stream
    into fixed-size chunks with positions — pure JVM array ops (the real
    pipeline would replace the slicer with a codec UDF, same shape)."""
    chunks = F.expr(
        f"transform(sequence(1, greatest(int(ceil(length(content) / {every_n_bytes})), 1)), "
        f"i -> substring(content, (i - 1) * {every_n_bytes} + 1, {every_n_bytes}))"
    )
    return (
        media.filter(F.col("media_type") == "video")
        .select("media_id", F.posexplode(chunks).alias("frame_no", "frame_bytes"))
        .withColumn("frame_len", F.length("frame_bytes").cast("long"))
    )
