"""Byte-level cross-validation of the pure-stdlib compact theta sketch
(theta.py) against org.apache.datasketches (datasketches-java 6.2.0, on
Spark's classpath) — the same both-directions discipline test_puffin.py
applies to Roaring bitmaps:

- Java-written compact sketches (empty / single / exact mode) must be
  BYTE-IDENTICAL to Python's serialization of the same value set.
- Python-written sketches (exact AND estimation mode) must load in Java
  with the same retained entries, theta, and estimate.
- Java estimation-mode sketches must parse in Python with Java's own
  estimate.
"""

from __future__ import annotations

import pytest

from minio_iceberg_polaris_lakehouse_spark import theta as TH


def _java_compact_bytes(spark, values: list[bytes]) -> bytes:
    US = spark._jvm.org.apache.datasketches.theta.UpdateSketch
    sk = US.builder().build()
    for v in values:
        sk.update(bytearray(v))
    return bytes(sk.compact().toByteArray())


def _java_wrap(spark, buf: bytes):
    jvm = spark._jvm
    mem = jvm.org.apache.datasketches.memory.Memory.wrap(bytearray(buf))
    return jvm.org.apache.datasketches.theta.Sketches.wrapCompactSketch(mem)


def test_hash_matches_java(spark):
    jvm = spark._jvm
    US = jvm.org.apache.datasketches.theta.UpdateSketch
    for payload in [b"hello", b"", b"a" * 16, b"0123456789abcdef0", bytes(range(33))]:
        if not payload:
            continue  # Java rejects empty byte[] updates
        sk = US.builder().build()
        sk.update(bytearray(payload))
        c = sk.compact()
        ents, th = TH.deserialize_compact(bytes(c.toByteArray()))
        assert ents == [TH.theta_hash(payload)], payload


@pytest.mark.parametrize("n", [0, 1, 2, 3, 100, 4096])
def test_exact_mode_byte_identical(spark, n):
    values = [f"v{i}".encode() for i in range(n)]
    jb = _java_compact_bytes(spark, values)
    pb = TH.sketch_from_hashes(TH.theta_hash(v) for v in values)
    assert pb == jb


def test_python_estimation_sketch_reads_in_java(spark):
    true_n = 20_000
    hashes = [TH.theta_hash(f"row-{i}".encode()) for i in range(true_n)]
    buf = TH.sketch_from_hashes(hashes)
    ents, th = TH.deserialize_compact(buf)
    assert len(ents) == 4096 and th <= (1 << 63) - 1
    jsk = _java_wrap(spark, buf)
    assert jsk.getRetainedEntries(True) == 4096
    assert jsk.getEstimate() == pytest.approx(TH.estimate(4096, th))
    # KMV with k=4096 has ~1.6% relative error at 3 sigma
    assert jsk.getEstimate() == pytest.approx(true_n, rel=0.05)


def test_java_estimation_sketch_reads_in_python(spark):
    values = [f"jv-{i}".encode() for i in range(30_000)]
    jb = _java_compact_bytes(spark, values)
    ents, th = TH.deserialize_compact(jb)
    jsk = _java_wrap(spark, jb)
    assert len(ents) == jsk.getRetainedEntries(True)
    assert TH.estimate(len(ents), th) == pytest.approx(jsk.getEstimate())
    assert TH.sketch_estimate(jb) == pytest.approx(30_000, rel=0.05)


def test_seed_hash_constant(spark):
    # DataSketches computeSeedHash(9001) — the LE u16 all its sketches stamp
    jb = _java_compact_bytes(spark, [b"x", b"y"])
    assert int.from_bytes(jb[6:8], "little") == TH.seed_hash()
