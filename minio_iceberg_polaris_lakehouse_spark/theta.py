"""Apache DataSketches compact theta sketches, pure stdlib.

Iceberg publishes table/column NDV statistics as Puffin files holding
`apache-datasketches-theta-v1` blobs (one per column), referenced from
table metadata's `statistics` list — the open-format contract that lets
ANY engine's planner read another engine's ANALYZE output (the
reference's "every engine reads the same table" story, README.md:169-178,
extended from data to statistics). This module implements the
DataSketches CompactThetaSketch wire format so the engine's ANALYZE can
write it and foreign readers (Trino, Spark+Iceberg, DataSketches
itself) can consume it.

Wire format (SerVer 3, derived empirically against
org.apache.datasketches:datasketches-java:6.2.0 on Spark's classpath and
byte-cross-validated in tests/test_theta.py):

- byte 0: preamble longs — 1 (empty / single item), 2 (exact mode),
  3 (estimation mode)
- byte 1: serial version = 3;  byte 2: family = 3 (COMPACT)
- bytes 3-4: lgNomLongs/lgArrLongs (unused by compact = 0)
- byte 5: flags — READ_ONLY=2 | EMPTY=4 | COMPACT=8 | ORDERED=16 |
  SINGLE_ITEM=32
- bytes 6-7: seed hash (LE u16; 0 for empty sketches)
- exact mode adds: LE u32 retained count, LE f32 sampling p (=1.0)
- estimation mode adds: LE u64 thetaLong after those
- then the retained hashes, ascending LE u64

Hashing: MurmurHash3 x64 128 of the value's bytes with the DataSketches
default seed 9001; the sketch retains `h1 >>> 1` (so hashes live in
[1, 2^63-1]). The KMV estimator: keep the k smallest distinct hashes;
in estimation mode thetaLong = the (k+1)-th smallest and
estimate = retained / (thetaLong / 2^63).

Scale note: building a sketch needs only each partition's k+1 smallest
distinct hashes — warehouse.Table.analyze computes those executor-side
and ships O(k) longs per column to the driver, never values.
"""

from __future__ import annotations

import struct

DEFAULT_SEED = 9001
DEFAULT_LG_K = 12  # nominal 4096 entries — DataSketches' default
_LONG_MAX = (1 << 63) - 1
_M64 = (1 << 64) - 1

_FLAG_READ_ONLY = 2
_FLAG_EMPTY = 4
_FLAG_COMPACT = 8
_FLAG_ORDERED = 16
_FLAG_SINGLE_ITEM = 32


def murmur3_x64_128(data: bytes, seed: int = DEFAULT_SEED) -> tuple[int, int]:
    """MurmurHash3 x64 128-bit (the DataSketches/Guava variant)."""
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & _M64

    def fmix(k: int) -> int:
        k ^= k >> 33
        k = (k * 0xFF51AFD7ED558CCD) & _M64
        k ^= k >> 33
        k = (k * 0xC4CEB9FE1A85EC53) & _M64
        k ^= k >> 33
        return k

    h1 = h2 = seed
    n = len(data) // 16
    for i in range(n):
        k1, k2 = struct.unpack_from("<QQ", data, i * 16)
        k1 = (k1 * c1) & _M64
        k1 = rotl(k1, 31)
        k1 = (k1 * c2) & _M64
        h1 ^= k1
        h1 = rotl(h1, 27)
        h1 = (h1 + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64
        k2 = (k2 * c2) & _M64
        k2 = rotl(k2, 33)
        k2 = (k2 * c1) & _M64
        h2 ^= k2
        h2 = rotl(h2, 31)
        h2 = (h2 + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64
    tail = data[n * 16 :]
    if tail:
        t = tail + b"\x00" * (16 - len(tail))
        if len(tail) > 8:
            (k2,) = struct.unpack_from("<Q", t, 8)
            k2 = (k2 * c2) & _M64
            k2 = rotl(k2, 33)
            k2 = (k2 * c1) & _M64
            h2 ^= k2
        (k1,) = struct.unpack_from("<Q", t, 0)
        k1 = (k1 * c1) & _M64
        k1 = rotl(k1, 31)
        k1 = (k1 * c2) & _M64
        h1 ^= k1
    h1 ^= len(data)
    h2 ^= len(data)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    return h1, h2


def theta_hash(data: bytes, seed: int = DEFAULT_SEED) -> int:
    """The hash a theta sketch retains for ``data``: murmur h1 >>> 1,
    in [0, 2^63-1]; DataSketches treats 0 as 'no value' (probability
    2^-63 — callers may ignore the collision)."""
    return murmur3_x64_128(data, seed)[0] >> 1


def seed_hash(seed: int = DEFAULT_SEED) -> int:
    """DataSketches' 16-bit seed fingerprint: murmur of the seed itself
    (as LE u64, hashed with seed 0), low 16 bits."""
    return murmur3_x64_128(struct.pack("<Q", seed), 0)[0] & 0xFFFF


def serialize_compact(
    entries: list[int], theta: int = _LONG_MAX + 1, seed: int = DEFAULT_SEED
) -> bytes:
    """Serialize an ordered compact theta sketch. ``entries`` are the
    retained hashes (any order; deduplicated + sorted here); ``theta``
    defaults to 'exact mode' (> LONG_MAX encodes as no theta field —
    matching Java, which writes no thetaLong when theta == LONG_MAX)."""
    ents = sorted(set(entries))
    if any(e >= theta for e in ents):
        raise ValueError("retained entry >= theta")
    if not ents:
        return struct.pack(
            "<BBBBBBH", 1, 3, 3, 0, 0,
            _FLAG_READ_ONLY | _FLAG_EMPTY | _FLAG_COMPACT | _FLAG_ORDERED, 0,
        )
    sh = seed_hash(seed)
    if len(ents) == 1 and theta > _LONG_MAX:
        head = struct.pack(
            "<BBBBBBH", 1, 3, 3, 0, 0,
            _FLAG_READ_ONLY | _FLAG_COMPACT | _FLAG_ORDERED | _FLAG_SINGLE_ITEM,
            sh,
        )
        return head + struct.pack("<Q", ents[0])
    flags = _FLAG_READ_ONLY | _FLAG_COMPACT | _FLAG_ORDERED
    if theta > _LONG_MAX:  # exact mode: no thetaLong on the wire
        head = struct.pack("<BBBBBBH", 2, 3, 3, 0, 0, flags, sh)
        head += struct.pack("<If", len(ents), 1.0)
    else:
        head = struct.pack("<BBBBBBH", 3, 3, 3, 0, 0, flags, sh)
        head += struct.pack("<If", len(ents), 1.0)
        head += struct.pack("<Q", theta)
    return head + struct.pack(f"<{len(ents)}Q", *ents)


def deserialize_compact(buf: bytes) -> tuple[list[int], int]:
    """Parse a compact theta sketch → (sorted retained hashes,
    thetaLong). Accepts empty / single-item / exact / estimation forms."""
    pre, ver, fam = buf[0], buf[1], buf[2]
    if ver != 3 or fam != 3:
        raise ValueError(f"not a compact theta sketch (serVer {ver}, family {fam})")
    flags = buf[5]
    if flags & _FLAG_EMPTY:
        return [], _LONG_MAX + 1
    if pre == 1:
        if not flags & _FLAG_SINGLE_ITEM:
            raise ValueError("preamble=1 without EMPTY or SINGLE_ITEM flag")
        return [struct.unpack_from("<Q", buf, 8)[0]], _LONG_MAX + 1
    (count,) = struct.unpack_from("<I", buf, 8)
    if pre == 2:
        theta = _LONG_MAX + 1
        off = 16
    elif pre == 3:
        (theta,) = struct.unpack_from("<Q", buf, 16)
        off = 24
    else:
        raise ValueError(f"unsupported preamble longs {pre}")
    return sorted(struct.unpack_from(f"<{count}Q", buf, off)), theta


def estimate(retained: int, theta: int) -> float:
    """The theta/KMV estimator: retained / (theta / 2^63)."""
    if theta > _LONG_MAX:
        return float(retained)
    return retained * float(1 << 63) / float(theta)


def sketch_from_hashes(hashes, lg_k: int = DEFAULT_LG_K) -> bytes:
    """Build the compact sketch for a stream of retained-form hashes
    (each ``theta_hash`` output). Keeps the k smallest distinct; in
    estimation mode thetaLong = the (k+1)-th smallest (KMV)."""
    k = 1 << lg_k
    distinct = sorted(set(hashes))
    if len(distinct) <= k:
        return serialize_compact(distinct)
    return serialize_compact(distinct[:k], theta=distinct[k])


def sketch_estimate(buf: bytes) -> float:
    ents, theta = deserialize_compact(buf)
    return estimate(len(ents), theta)


def _min_signed_len(v: int) -> int:
    """Byte length of the MINIMAL two's-complement encoding of ``v`` —
    exactly Java ``BigInteger.toByteArray()``'s length, which the
    Iceberg spec's decimal single-value serialization requires. The
    naive ``bit_length()//8 + 1`` over-pads exact negative powers of
    2^(8k-1) (e.g. -128 → 2 bytes ff80 instead of the minimal 80),
    diverging bucket hashes and theta sketches from spec-compliant
    engines for those values (Java bitLength() of a negative is the
    bit length of ~v)."""
    return ((v if v >= 0 else ~v).bit_length() // 8) + 1


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x86 32-bit — the hash Iceberg's bucket transform is
    specified over (spec Appendix B; cross-validated against Guava's
    murmur3_32_fixed in tests). Returns the SIGNED 32-bit value, Java
    parity."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    M = 0xFFFFFFFF

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (32 - r))) & M

    h = seed & M
    n4 = len(data) // 4
    for i in range(n4):
        k = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        k = (k * c1) & M
        k = rotl(k, 15)
        k = (k * c2) & M
        h ^= k
        h = rotl(h, 13)
        h = (h * 5 + 0xE6546B64) & M
    tail = data[n4 * 4 :]
    if tail:
        k = int.from_bytes(tail + b"\x00" * (4 - len(tail)), "little")
        k = (k * c1) & M
        k = rotl(k, 15)
        k = (k * c2) & M
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & M
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & M
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def murmur3_32_long_vec(vals):
    """Vectorized murmur3_x86_32 over int64 values hashed as their
    8-byte little-endian form (the Iceberg bucket input for every
    integer/date/timestamp type) — numpy uint32 arithmetic wraps mod
    2^32 exactly like the scalar form. Returns int32 hashes."""
    import numpy as np

    v = np.asarray(vals, dtype=np.int64).astype(np.uint64)
    c1, c2 = np.uint32(0xCC9E2D51), np.uint32(0x1B873593)

    def rotl(x, r):
        return (x << np.uint32(r)) | (x >> np.uint32(32 - r))

    h = np.zeros(len(v), dtype=np.uint32)  # seed 0
    for k0 in ((v & np.uint64(0xFFFFFFFF)), (v >> np.uint64(32))):
        k = k0.astype(np.uint32)
        k = k * c1
        k = rotl(k, 15)
        k = k * c2
        h ^= k
        h = rotl(h, 13)
        h = h * np.uint32(5) + np.uint32(0xE6546B64)
    h ^= np.uint32(8)  # input length
    h ^= h >> np.uint32(16)
    h = h * np.uint32(0x85EBCA6B)
    h ^= h >> np.uint32(13)
    h = h * np.uint32(0xC2B2AE35)
    h ^= h >> np.uint32(16)
    return h.astype(np.int32)


def iceberg_bucket(value, n: int, type_str: str) -> int | None:
    """Iceberg's bucket[N] transform of ``value`` (spec Appendix B:
    int/long/date/time/timestamp hash as the 8-byte little-endian long,
    strings as UTF-8, decimals as minimal big-endian unscaled). Returns
    None for values/types the transform can't be derived for
    (conservative: callers skip pruning)."""
    import datetime
    import decimal

    t = str(type_str)
    try:
        if t in ("int", "long", "bigint", "smallint", "tinyint"):
            data = struct.pack("<q", int(value))
        elif t == "date":
            if isinstance(value, str):
                value = (
                    datetime.date.fromisoformat(value) - datetime.date(1970, 1, 1)
                ).days
            data = struct.pack("<q", int(value))
        elif t == "string":
            data = str(value).encode("utf-8")
        elif t.startswith("timestamp"):
            if isinstance(value, str):
                ts = datetime.datetime.fromisoformat(value)
                if ts.tzinfo is None:
                    ts = ts.replace(tzinfo=datetime.timezone.utc)
                value = int(ts.timestamp() * 1_000_000)
            data = struct.pack("<q", int(value))
        elif t.startswith("decimal"):
            m = __import__("re").fullmatch(r"decimal\((\d+),\s*(\d+)\)", t)
            scale = int(m.group(2)) if m else 0
            unscaled = int(decimal.Decimal(str(value)).scaleb(scale))
            data = unscaled.to_bytes(_min_signed_len(unscaled), "big", signed=True)
        else:
            return None
    except (ValueError, TypeError, decimal.InvalidOperation):
        return None
    return (murmur3_x86_32(data) & 0x7FFFFFFF) % n


def single_value_converter(spark_type):
    """Iceberg single-value binary serialization (spec Appendix D) for
    one atomic Spark type — the bytes a theta NDV sketch hashes, so two
    engines sketching the same column agree hash-for-hash. Returns a
    ``value -> bytes`` callable, or None for types the statistics spec
    doesn't sketch (arrays/maps/structs/variant)."""
    import datetime
    import decimal

    from pyspark.sql import types as T

    if isinstance(spark_type, T.BooleanType):
        return lambda v: b"\x01" if v else b"\x00"
    if isinstance(spark_type, (T.ByteType, T.ShortType, T.IntegerType)):
        return lambda v: struct.pack("<i", int(v))
    if isinstance(spark_type, T.LongType):
        return lambda v: struct.pack("<q", int(v))
    if isinstance(spark_type, T.FloatType):
        return lambda v: struct.pack("<f", float(v))
    if isinstance(spark_type, T.DoubleType):
        return lambda v: struct.pack("<d", float(v))
    if isinstance(spark_type, T.StringType):
        return lambda v: str(v).encode("utf-8")
    if isinstance(spark_type, T.BinaryType):
        return bytes
    if isinstance(spark_type, T.DateType):
        epoch = datetime.date(1970, 1, 1)

        def conv_date(v):
            if hasattr(v, "astype") and not hasattr(v, "toordinal"):
                # numpy.datetime64 from a pandas block
                return struct.pack("<i", int(v.astype("datetime64[D]").astype("int64")))
            d = v.date() if hasattr(v, "date") and not isinstance(v, datetime.date) else v
            return struct.pack("<i", (d - epoch).days)

        return conv_date
    if isinstance(spark_type, T.TimestampType) or (
        hasattr(T, "TimestampNTZType") and isinstance(spark_type, T.TimestampNTZType)
    ):

        def conv_ts(v):
            # microseconds since epoch, whatever pandas hands over
            if hasattr(v, "value"):  # pd.Timestamp: ns since epoch
                return struct.pack("<q", int(v.value) // 1000)
            if hasattr(v, "astype") and not hasattr(v, "timestamp"):
                # numpy.datetime64
                return struct.pack(
                    "<q", int(v.astype("datetime64[us]").astype("int64"))
                )
            ts = v if v.tzinfo else v.replace(tzinfo=datetime.timezone.utc)
            return struct.pack("<q", int(ts.timestamp() * 1_000_000))

        return conv_ts
    if isinstance(spark_type, T.DecimalType):

        def conv_dec(v):
            unscaled = int(decimal.Decimal(v).scaleb(spark_type.scale))
            return unscaled.to_bytes(_min_signed_len(unscaled), "big", signed=True)

        return conv_dec
    return None
