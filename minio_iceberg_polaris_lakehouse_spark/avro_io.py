"""Minimal Apache Avro 1.11 object-container-file writer + reader, pure
stdlib (json/zlib/struct/os). Built from the PUBLIC Avro specification
(https://avro.apache.org/docs/1.11.1/specification/): binary encoding
(zigzag varints, length-prefixed bytes/strings, union-by-branch-index,
block-encoded arrays/maps) and the container framing (magic ``Obj\\x01``,
file-metadata map carrying ``avro.schema``/``avro.codec``, 16-byte sync
marker, deflate-compressed data blocks).

Purpose: real Iceberg metadata requires Avro manifest lists and manifest
files (reference README.md:169-175 shows ``snap-….avro``;
getting_started.ipynb:152 a real manifest path). The container has no
Avro package, so the engine carries this ~200-line implementation; its
byte output is verified in tests against the INDEPENDENT Java Avro
implementation already on Spark's classpath (``avro-1.12.1.jar``, read
through ``org.apache.avro.file.DataFileReader`` via Py4J).

Supported type surface (everything Iceberg manifests need): null,
boolean, int, long, float, double, bytes, string, fixed, record, array,
map, unions. Logical types ride on the underlying primitive unchanged
(Avro semantics). Not supported: enums, recursive named-type references.
"""

from __future__ import annotations

import io
import json
import struct
import uuid
import zlib

from minio_iceberg_polaris_lakehouse_spark import fsio

MAGIC = b"Obj\x01"
SYNC = b"\x00\x01\x02\x03\x04\x05\x06\x07\x08\x09\x0a\x0b\x0c\x0d\x0e\x0f"


# ---------------------------------------------------------------------------
# binary encoding (spec §Binary Encoding)
# ---------------------------------------------------------------------------
def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(out: io.BytesIO, n: int) -> None:
    n = _zigzag(n)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def write_bytes(out: io.BytesIO, b: bytes) -> None:
    write_long(out, len(b))
    out.write(b)


def write_string(out: io.BytesIO, s: str) -> None:
    write_bytes(out, s.encode("utf-8"))


def _schema_type(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def write_datum(out: io.BytesIO, schema, value) -> None:
    """Encode ``value`` per ``schema`` (parsed JSON form). Records are
    plain dicts, arrays lists, maps dicts, fixed bytes."""
    t = _schema_type(schema)
    if isinstance(schema, list):  # union: branch index, then the datum
        branch = _pick_union_branch(schema, value)
        write_long(out, branch)
        write_datum(out, schema[branch], value)
    elif t == "null":
        if value is not None:
            raise ValueError(f"non-null {value!r} for null schema")
    elif t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        write_long(out, int(value))
    elif t == "float":
        out.write(struct.pack("<f", float(value)))
    elif t == "double":
        out.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        write_bytes(out, bytes(value))
    elif t == "string":
        write_string(out, value)
    elif t == "fixed":
        b = bytes(value)
        if len(b) != schema["size"]:
            raise ValueError(f"fixed size {len(b)} != {schema['size']}")
        out.write(b)
    elif t == "record":
        for f in schema["fields"]:
            try:
                write_datum(out, f["type"], value.get(f["name"]))
            except Exception as e:
                raise ValueError(f"field {f['name']}: {e}") from e
    elif t == "array":
        items = list(value or [])
        if items:
            write_long(out, len(items))
            for it in items:
                write_datum(out, schema["items"], it)
        write_long(out, 0)
    elif t == "map":
        entries = dict(value or {})
        if entries:
            write_long(out, len(entries))
            for k, v in entries.items():
                write_string(out, k)
                write_datum(out, schema["values"], v)
        write_long(out, 0)
    else:
        raise ValueError(f"unsupported Avro type {t!r}")


def _pick_union_branch(union: list, value) -> int:
    def matches(s) -> bool:
        t = _schema_type(s)
        if value is None:
            return t == "null"
        if t in ("record", "map"):
            return isinstance(value, dict)
        if t == "array":
            return isinstance(value, list)
        if t == "string":
            return isinstance(value, str)
        if t in ("bytes", "fixed"):
            return isinstance(value, (bytes, bytearray))
        if t == "boolean":
            return isinstance(value, bool)
        if t in ("int", "long"):
            return isinstance(value, int) and not isinstance(value, bool)
        if t in ("float", "double"):
            return isinstance(value, (int, float)) and not isinstance(value, bool)
        return False

    for i, s in enumerate(union):
        if matches(s):
            return i
    raise ValueError(f"no union branch in {union} for {value!r}")


# ---------------------------------------------------------------------------
# binary decoding (for the self-contained round-trip check)
# ---------------------------------------------------------------------------
class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError
        self.pos += n
        return b

    def read_long(self) -> int:
        n, shift = 0, 0
        while True:
            b = self.read(1)[0]
            n |= (b & 0x7F) << shift
            if not b & 0x80:
                return _unzigzag(n)
            shift += 7

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())

    def read_string(self) -> str:
        return self.read_bytes().decode("utf-8")


def read_datum(r: _Reader, schema):
    t = _schema_type(schema)
    if isinstance(schema, list):
        return read_datum(r, schema[r.read_long()])
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) == b"\x01"
    if t in ("int", "long"):
        return r.read_long()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.read_bytes()
    if t == "string":
        return r.read_string()
    if t == "fixed":
        return r.read(schema["size"])
    if t == "record":
        return {f["name"]: read_datum(r, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                n = -n
                r.read_long()
            for _ in range(n):
                out.append(read_datum(r, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                # key MUST be read before the value: Python evaluates the
                # RHS of `d[k] = v` first, which would swap the stream order
                k = r.read_string()
                out[k] = read_datum(r, schema["values"])
    raise ValueError(f"unsupported Avro type {t!r}")


# ---------------------------------------------------------------------------
# object container files (spec §Object Container Files)
# ---------------------------------------------------------------------------
def write_container(
    path: str,
    schema: dict,
    records: list[dict],
    metadata: dict[str, str] | None = None,
    codec: str = "deflate",
) -> None:
    """Write an Avro object container file atomically (temp + rename)."""
    header = io.BytesIO()
    header.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
        **{k: v.encode() if isinstance(v, str) else v for k, v in (metadata or {}).items()},
    }
    write_long(header, len(meta))
    for k, v in meta.items():
        write_string(header, k)
        write_bytes(header, v)
    write_long(header, 0)
    header.write(SYNC)

    body = io.BytesIO()
    for rec in records:
        write_datum(body, schema, rec)
    raw = body.getvalue()
    if codec == "deflate":
        # spec: raw deflate stream, no zlib header/checksum
        payload = zlib.compress(raw)[2:-4]
    elif codec == "null":
        payload = raw
    else:
        raise ValueError(f"unsupported codec {codec}")

    buf = io.BytesIO()
    buf.write(header.getvalue())
    if records:
        block = io.BytesIO()
        write_long(block, len(records))
        write_bytes(block, payload)
        block.write(SYNC)
        buf.write(block.getvalue())
    fsio.write_bytes_atomic(path, buf.getvalue(), uuid.uuid4().hex)


def read_container(path: str) -> tuple[dict, dict[str, bytes], list]:
    """Read an Avro object container file → (schema, metadata, records)."""
    r = _Reader(fsio.read_bytes(path))
    if r.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro container file")
    meta: dict[str, bytes] = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            # key first — `d[k] = v` evaluates v before k
            k = r.read_string()
            meta[k] = r.read_bytes()
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = r.read(16)
    records = []
    while r.pos < len(r.buf):
        count = r.read_long()
        payload = r.read_bytes()
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec}")
        br = _Reader(payload)
        for _ in range(count):
            records.append(read_datum(br, schema))
        if r.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return schema, meta, records
