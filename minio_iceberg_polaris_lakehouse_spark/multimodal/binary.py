"""Multimodal column support (EXT scope, SURVEY.md §2.14 X4): image/audio/
video payloads as opaque BINARY columns with typed metadata, processed by
Arrow-batched pandas iterators (`mapInPandas`).

The image path is REAL: blobs are actual PNG files (encoded by the
engine's pure-stdlib codec, multimodal/png.py) and the decode/resize
kernels parse them — signature, CRC-checked chunks, zlib inflate, scanline
unfiltering — yielding true width/height/luma. Non-PNG payloads (e.g.
audio/video, for which the container ships no codec) fall back to the
clearly-marked deterministic stub (`fake_decode_image`), keeping the
plumbing testable for every media type.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from minio_iceberg_polaris_lakehouse_spark.registry import register
from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table

# Typed metadata schema for a multimodal asset column.
ASSET_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("blob", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_luma", IntegerType()),
    ]
)


def fake_decode_image(blob: bytes) -> tuple[int, int, int]:
    """STUB decode for media types without a codec in this container
    (audio/video): deterministic (width, height, mean_luma)
    pseudo-properties from the blob's sha256, keeping downstream
    assertions exact. PNG blobs never reach this — see decode_image."""
    h = hashlib.sha256(blob).digest()
    return (64 + h[0] % 192, 64 + h[1] % 192, h[2])


def decode_image(blob: bytes) -> tuple[int, int, int]:
    """Dispatch: REAL decode for PNG blobs (multimodal/png.py — full
    signature/CRC/inflate/unfilter parse), stub for anything else."""
    from minio_iceberg_polaris_lakehouse_spark.multimodal import png

    if bytes(blob[:8]) == png.PNG_SIG:
        pixels = png.decode_png(bytes(blob))
        h, w = pixels.shape[:2]
        return (w, h, png.mean_luma(pixels))
    return fake_decode_image(blob)


def _doc_pixels(doc_id: int, payload: bytes):
    """Deterministic grayscale pixel grid for a document: the payload
    bytes tiled into a (h, w) image whose shape derives from doc_id and
    length — every byte of content contributes to the real luma."""
    import numpy as np

    w = 32 + (len(payload) % 48)
    h = 24 + (doc_id % 40)
    buf = np.frombuffer(payload, dtype=np.uint8)
    if buf.size == 0:
        buf = np.zeros(1, dtype=np.uint8)
    reps = -(-(w * h) // buf.size)  # ceil division
    return np.tile(buf, reps)[: w * h].reshape(h, w)


def assets_from_documents(df: DataFrame) -> DataFrame:
    """Model the documents table as a multimodal asset table: the text
    payload becomes an opaque BINARY blob (exactly how image bytes would
    arrive from an object store)."""
    blob = F.encode(F.col("text"), "utf-8")
    return df.select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        blob.alias("blob"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
    )


def png_assets_from_documents(df: DataFrame) -> DataFrame:
    """Asset table with REAL image blobs: each document's text renders to
    a deterministic grayscale pixel grid, PNG-encoded by the engine's
    codec — the decode kernels then exercise an actual parse, not a stub.
    mapInPandas keeps the encode Arrow-batched and shuffle-free."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from minio_iceberg_polaris_lakehouse_spark.multimodal import png

        for pdf in batches:
            blobs = [
                png.encode_png(_doc_pixels(did, text.encode("utf-8")))
                for did, text in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "image/png",
                    "blob": blobs,
                    "n_bytes": [len(b) for b in blobs],
                }
            )

    return df.select("doc_id", "text").mapInPandas(kernel, ASSET_SCHEMA)


def decode_assets(assets: DataFrame) -> DataFrame:
    """Arrow-batched decode over partitions: `mapInPandas` streams record
    batches through Python once, yielding typed metadata — the pattern for
    any per-blob kernel (resize, frame-sample, feature-extract). Scale: the
    only Python touchpoint, O(bytes) per partition, no shuffle."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_image(b) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "mean_luma": [d[2] for d in decoded],
                }
            )

    return assets.mapInPandas(decode, DECODED_SCHEMA)


@register(
    "mm_blob_stats",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_assets,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def mm_blob_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column statistics per source: documents modeled as opaque
    blobs (utf-8 payload standing in for image bytes)."""
    d = load_table(spark, sf_dir, "documents")
    assets = assets_from_documents(d).join(d.select("doc_id", "source"), "doc_id")
    return (
        assets.groupBy("source")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.max("n_bytes").cast("long").alias("max_bytes"),
        )
        .orderBy("source")
    )


@register("mm_decode_features", oracle=None)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode pipeline end-to-end over REAL image bytes: document text →
    PNG encode kernel → mapInPandas PNG decode (signature/CRC/inflate/
    unfilter) → true width/height/luma → aggregate. Rows-only check (the
    PNG byte stream is engine-rendered, not SQL-expressible); the codec
    itself is cross-validated against Java ImageIO in
    tests/test_multimodal.py."""
    d = load_table(spark, sf_dir, "documents")
    decoded = decode_assets(png_assets_from_documents(d))
    return (
        decoded.groupBy((F.col("mean_luma") / 32).cast("int").alias("luma_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.avg(F.col("width").cast("double")).alias("avg_width"),
            F.avg(F.col("height").cast("double")).alias("avg_height"),
        )
        .orderBy("luma_bucket")
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("blob", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def fake_resize(blob: bytes, w: int, h: int) -> bytes:
    """STUB resize for non-PNG payloads: the output blob is a
    deterministic digest-prefixed slice sized proportionally to w*h, so
    byte-length assertions stay exact."""
    h_ = hashlib.sha256(blob + f"{w}x{h}".encode()).digest()
    return h_ + blob[: max(0, (w * h) // 64 - len(h_))]


def resize_blob(blob: bytes, w: int, h: int) -> bytes:
    """REAL resize for PNG blobs: decode → vectorized nearest-neighbor →
    re-encode; stub for media without a codec."""
    from minio_iceberg_polaris_lakehouse_spark.multimodal import png

    if bytes(blob[:8]) == png.PNG_SIG:
        return png.encode_png(png.resize_nearest(png.decode_png(bytes(blob)), w, h))
    return fake_resize(blob, w, h)


def resize_assets(assets: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Batch resize over partitions — same mapInPandas shape as decode;
    output keeps the BINARY column so stages chain (decode → resize →
    feature-extract) without leaving Arrow."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [resize_blob(b, width, height) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "blob": out,
                    "width": width,
                    "height": height,
                }
            )

    return assets.mapInPandas(kernel, RESIZED_SCHEMA)


@register("mm_frame_sample", oracle=None)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling pipeline end-to-end: blob → per-frame fan-out with
    feature vectors (multimodal/frames.py) → JVM-side per-document norm
    aggregation. Rows-only check (stubbed codec); tests assert the fan-out
    arithmetic against the stub."""
    from minio_iceberg_polaris_lakehouse_spark.multimodal.frames import (
        frame_feature_norms,
        sample_frames,
    )

    d = load_table(spark, sf_dir, "documents")
    frames = sample_frames(assets_from_documents(d))
    return frame_feature_norms(frames).orderBy("doc_id")


@register("mm_resize_stats", oracle=None)
def mm_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pipeline over REAL PNGs: encode → decode → nearest-neighbor
    resize to 224×224 → re-encode → byte accounting. Rows-only check (PNG
    byte stream is engine-rendered); tests assert the resized blobs decode
    to the requested dimensions with content-derived pixels."""
    d = load_table(spark, sf_dir, "documents")
    resized = resize_assets(png_assets_from_documents(d), 224, 224)
    return (
        resized.groupBy("width", "height")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.octet_length("blob")).cast("long").alias("total_bytes"),
        )
        .orderBy("width")
    )


# Fixed corpus for the PNG-path driver golden: deterministic texts whose
# encode→decode roundtrip output is pinned as a literal-VALUES oracle
# (the ref_table_history trick — the sf tables can't serve here because
# the PNG byte stream is engine-rendered, and document text differs per
# scale factor). Varied lengths/content exercise width derivation, the
# tiling remainder path, and low/high-luma payloads.
_PNG_GOLDEN_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "pack my box with five dozen liquor jugs, then pack twelve more"),
    (2, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
    (3, "Sphinx of black quartz, judge my vow. Sphinx of black quartz, judge my vow."),
    (4, "0123456789" * 13),
    (5, "mixed CASE with   spaces\tand\nnewlines plus punctuation!!! ???"),
]

# expected (doc_id, width, height, mean_luma) — recompute with
# tools/mm_golden_expect.py if _doc_pixels or the corpus changes
_PNG_GOLDEN_ROWS = [
    (0, 75, 24, 95),
    (1, 46, 25, 94),
    (2, 72, 26, 97),
    (3, 59, 27, 91),
    (4, 66, 28, 52),
    (5, 45, 29, 86),
]

_PNG_GOLDEN_ORACLE = "SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(width AS INT) AS width, CAST(height AS INT) AS height, CAST(mean_luma AS INT) AS mean_luma FROM (VALUES {vals}) AS t(doc_id, width, height, mean_luma) ORDER BY doc_id".format(
    vals=", ".join(f"({d}, {w}, {h}, {l})" for d, w, h, l in _PNG_GOLDEN_ROWS)
)


@register("mm_png_decode_roundtrip", oracle=_PNG_GOLDEN_ORACLE)
def mm_png_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG path with a DRIVER-CHECKABLE exact oracle (r11 verdict "Next
    round" #6 — the other mm_* kernels are rows-only by declared design):
    a fixed six-document corpus renders to deterministic pixel grids,
    PNG-encodes through the engine codec (multimodal/png.py), and decodes
    back through the same Arrow-batched mapInPandas kernel every real
    asset takes (decode_assets: signature check, CRC-verified chunks,
    zlib inflate, scanline unfilter). The oracle pins the roundtripped
    (width, height, mean_luma) per document as literal VALUES, so the
    driver hash proves the full encode→decode chain bit-reproduces the
    recorded truth — any codec, tiling, or luma regression flips the
    hash. sf_dir is unused by design: the PNG byte stream is
    engine-rendered and document text differs per scale factor."""
    docs = spark.createDataFrame(_PNG_GOLDEN_DOCS, "doc_id long, text string")
    decoded = decode_assets(png_assets_from_documents(docs))
    return decoded.select("doc_id", "width", "height", "mean_luma").orderBy("doc_id")
