"""Puffin / deletion-vector codec: spec conformance is established by
cross-validating the pure-Python roaring serialization BOTH directions
against org.roaringbitmap (on Spark's classpath — an independent
reference implementation), including Java-written RUN containers the
Python writer never emits."""

from __future__ import annotations

import random

import pytest

from minio_iceberg_polaris_lakehouse_spark import puffin


def _java_roaring32_bytes(jvm, values) -> bytes:
    rb = jvm.org.roaringbitmap.RoaringBitmap()
    for v in values:
        rb.add(v if v < 2**31 else v - 2**32)  # java int is signed
    baos = jvm.java.io.ByteArrayOutputStream()
    rb.serialize(jvm.java.io.DataOutputStream(baos))
    return bytes(baos.toByteArray())


def _java_roaring32_parse(jvm, buf: bytes) -> list[int]:
    rb = jvm.org.roaringbitmap.RoaringBitmap()
    bais = jvm.java.io.ByteArrayInputStream(buf)
    rb.deserialize(jvm.java.io.DataInputStream(bais))
    it = rb.iterator()
    out = []
    while it.hasNext():
        v = it.next()
        out.append(v if v >= 0 else v + 2**32)
    return sorted(out)


CASES = [
    [],
    [0],
    [0, 1, 2, 65535, 65536, 65537],
    list(range(5000)),  # forces a bitmap container
    [2**32 - 1, 2**31, 123456789],
    sorted(random.Random(7).sample(range(2**32), 2000)),
    sorted(random.Random(9).sample(range(200_000), 9000)),  # mixed containers
]


@pytest.mark.parametrize("values", CASES, ids=range(len(CASES)))
def test_roaring32_python_roundtrip(values):
    buf = puffin.serialize_roaring32(values)
    got, used = puffin.deserialize_roaring32(buf)
    assert used == len(buf)
    assert got == sorted(set(values))


@pytest.mark.parametrize("values", CASES, ids=range(len(CASES)))
def test_roaring32_matches_java_bytes(spark, values):
    """Python serialization is byte-identical to org.roaringbitmap's for
    the no-run layout — not merely inter-parseable."""
    jvm = spark._jvm
    assert puffin.serialize_roaring32(values) == _java_roaring32_bytes(jvm, values)


def test_roaring32_python_reads_java_run_containers(spark):
    """Java runOptimize() emits RUN containers (SERIAL_COOKIE layout);
    the Python reader must handle them."""
    jvm = spark._jvm
    values = list(range(1000, 3000)) + list(range(70000, 70100)) + [5, 9]
    rb = jvm.org.roaringbitmap.RoaringBitmap()
    for v in values:
        rb.add(v)
    assert rb.runOptimize()  # must actually produce runs
    baos = jvm.java.io.ByteArrayOutputStream()
    rb.serialize(jvm.java.io.DataOutputStream(baos))
    buf = bytes(baos.toByteArray())
    got, used = puffin.deserialize_roaring32(buf)
    assert used == len(buf)
    assert got == sorted(set(values))


def test_roaring32_java_reads_python_bytes(spark):
    jvm = spark._jvm
    values = sorted(random.Random(3).sample(range(2**32), 5000))
    assert _java_roaring32_parse(jvm, puffin.serialize_roaring32(values)) == values


def test_roaring64_portable_roundtrip_and_java_parse(spark):
    """64-bit portable layout: Python round-trip, and Java
    Roaring64NavigableMap reads the Python bytes (deserializePortable)."""
    values = [0, 1, 2**31, 2**32 - 1, 2**32, 2**32 + 7, 2**40, 2**63 + 5]
    buf = puffin.serialize_roaring64(values)
    got, used = puffin.deserialize_roaring64(buf)
    assert used == len(buf) and got == sorted(values)
    jvm = spark._jvm
    nav = jvm.org.roaringbitmap.longlong.Roaring64NavigableMap()
    bais = jvm.java.io.ByteArrayInputStream(buf)
    try:
        nav.deserializePortable(jvm.java.io.DataInputStream(bais))
    except Exception:
        pytest.skip("Roaring64NavigableMap.deserializePortable absent in this version")
    for v in values:
        signed = v if v < 2**63 else v - 2**64
        assert nav.contains(signed), v


def test_roaring64_python_reads_java_portable(spark):
    jvm = spark._jvm
    nav = jvm.org.roaringbitmap.longlong.Roaring64NavigableMap()
    values = [1, 2**32 + 3, 2**33, 2**50 + 123]
    for v in values:
        nav.addLong(v)
    baos = jvm.java.io.ByteArrayOutputStream()
    try:
        nav.serializePortable(jvm.java.io.DataOutputStream(baos))
    except Exception:
        pytest.skip("Roaring64NavigableMap.serializePortable absent in this version")
    got, _ = puffin.deserialize_roaring64(bytes(baos.toByteArray()))
    assert got == values


def test_deletion_vector_blob_layout():
    positions = [0, 5, 1_000_000, 2**33]
    blob = puffin.encode_deletion_vector(positions)
    # BE length prefix covers magic+vector; magic next
    import struct

    (ln,) = struct.unpack_from(">I", blob, 0)
    assert blob[4:8] == puffin.DV_MAGIC
    assert len(blob) == 4 + ln + 4
    assert puffin.decode_deletion_vector(blob) == positions
    # CRC tamper is caught
    bad = bytearray(blob)
    bad[10] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|magic"):
        puffin.decode_deletion_vector(bytes(bad))


def test_puffin_container_roundtrip():
    dvs = {
        "/wh/db/t/data-1.parquet": [3, 4, 5],
        "/wh/db/t/data-2.parquet": list(range(100)),
    }
    buf, index = puffin.write_dv_puffin(dvs, snapshot_id=42, seq=7)
    assert buf[:4] == puffin.MAGIC and buf[-4:] == puffin.MAGIC
    footer = puffin.read_puffin_footer(buf)
    assert {b["type"] for b in footer["blobs"]} == {"deletion-vector-v1"}
    assert all(b["snapshot-id"] == 42 and b["sequence-number"] == 7 for b in footer["blobs"])
    for path, ent in index.items():
        blob = buf[ent["offset"] : ent["offset"] + ent["length"]]
        assert puffin.decode_deletion_vector(blob) == sorted(dvs[path])
        assert ent["cardinality"] == len(dvs[path])
