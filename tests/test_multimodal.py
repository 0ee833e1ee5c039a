"""Multimodal plumbing: binary columns through Arrow-batched kernels —
determinism, schema, fan-out shape."""

from __future__ import annotations

from minio_iceberg_polaris_lakehouse_spark.multimodal import frames as FR
from minio_iceberg_polaris_lakehouse_spark.multimodal.binary import (
    assets_from_documents,
    decode_assets,
    fake_decode_image,
)
from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table


def test_decode_deterministic_and_schema(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(50)
    decoded = decode_assets(assets_from_documents(d))
    assert decoded.columns == ["doc_id", "width", "height", "mean_luma"]
    a = sorted(map(tuple, decoded.collect()))
    b = sorted(map(tuple, decode_assets(assets_from_documents(d)).collect()))
    assert a == b  # stub is deterministic across runs/partitionings
    # matches a driver-side call of the same kernel
    row = d.select("doc_id", "text").collect()[0]
    w, h, luma = fake_decode_image(row.text.encode())
    got = {r.doc_id: (r.width, r.height, r.mean_luma) for r in decoded.collect()}
    assert got[row.doc_id] == (w, h, luma)


def test_frame_sampling_fanout(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(40)
    assets = assets_from_documents(d)
    frames = FR.sample_frames(assets)
    rows = frames.collect()
    assert frames.columns == ["doc_id", "frame_idx", "frame_ts_ms", "feature", "frame_bytes"]
    assert len(rows) >= 40  # ≥1 frame per asset
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, fr in by_doc.items():
        idxs = sorted(f.frame_idx for f in fr)
        assert idxs == list(range(len(fr)))  # dense frame indices
        assert all(len(f.feature) == FR.FEATURE_DIM for f in fr)
        assert all(f.frame_ts_ms == f.frame_idx * 1000 for f in fr)


def test_frame_norms_aggregate(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(40)
    out = FR.frame_feature_norms(FR.sample_frames(assets_from_documents(d)))
    rows = out.collect()
    assert len(rows) == 40
    assert all(0 < r.mean_feature_norm < FR.FEATURE_DIM for r in rows)


def test_resize_then_decode_chains_in_arrow(spark, sf_dir):
    """decode(resize(assets)) — kernels chain through the BINARY column;
    output dims are the requested ones and blobs are deterministic."""
    from minio_iceberg_polaris_lakehouse_spark.multimodal.binary import (
        assets_from_documents,
        resize_assets,
    )

    d = load_table(spark, sf_dir, "documents").limit(20)
    resized = resize_assets(assets_from_documents(d), 128, 96)
    rows = {r.doc_id: r for r in resized.collect()}
    again = {r.doc_id: r for r in resize_assets(assets_from_documents(d), 128, 96).collect()}
    assert all(r.width == 128 and r.height == 96 for r in rows.values())
    assert all(bytes(rows[k].blob) == bytes(again[k].blob) for k in rows)


def test_frame_sample_query_matches_stub_arithmetic(spark, sf_dir):
    """The registered mm_frame_sample query yields exactly the stub's
    per-document frame count (n = 1 + sha256(blob)[0] % 4)."""
    import hashlib

    from minio_iceberg_polaris_lakehouse_spark.registry import all_queries

    got = {r.doc_id: r for r in all_queries()["mm_frame_sample"].spark(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    for r in docs:
        want = 1 + hashlib.sha256(r.text.encode()).digest()[0] % 4
        assert got[r.doc_id].n_frames == want, r.doc_id


def test_golden_bytes_fixture(spark):
    """Golden-bytes regression pin: FIXED blobs with COMMITTED expected
    outputs (precomputed constants, not recomputed from the stub at test
    time) — if the decode/resize plumbing or the stub kernel changes
    shape or values, this fails loudly instead of drifting silently.
    When a real codec (PIL/ffmpeg) replaces the stub, regenerate these
    constants from real decodes of committed image bytes."""
    import hashlib

    from minio_iceberg_polaris_lakehouse_spark.multimodal.binary import (
        DECODED_SCHEMA,
        decode_assets,
        resize_assets,
    )

    blobs = [
        (0, b"golden-asset-0"),
        (1, b"golden-asset-1"),
        (2, b"\x00\x01\x02PNG-ish\xff"),
    ]
    assets = spark.createDataFrame(
        [(i, "image/fake", b, len(b)) for i, b in blobs],
        "doc_id long, media_type string, blob binary, n_bytes long",
    )

    decoded = {r.doc_id: (r.width, r.height, r.mean_luma) for r in decode_assets(assets).collect()}
    assert decoded == {
        0: (253, 64, 105),
        1: (109, 67, 150),
        2: (144, 146, 107),
    }
    assert [f.name for f in DECODED_SCHEMA.fields] == ["doc_id", "width", "height", "mean_luma"]

    resized = {r.doc_id: r for r in resize_assets(assets, 224, 224).collect()}
    got = {i: (len(r.blob), hashlib.sha256(bytes(r.blob)).hexdigest()[:16]) for i, r in resized.items()}
    assert got == {
        0: (46, "a0468156c7aa0965"),
        1: (46, "e830f324b3b532d4"),
        2: (43, "d948f602bcf7de57"),
    }
