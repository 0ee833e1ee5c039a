"""Read a standard Iceberg-v2 FILESYSTEM table from its metadata — the
consumer side of the open-format promise (reference README.md:169-178:
"any engine can read the table by walking the metadata tree").

`read_iceberg_table(spark, location)` resolves `version-hint.text` →
`vN.metadata.json` → manifest-list Avro → manifest Avros → parquet data
files, applies content=1 POSITIONAL and content=2 EQUALITY delete files
(per the Iceberg v2 sequence-number rule), and returns a plain
DataFrame — using none of the engine's private snapshot log. It reads
tables this engine exported AND any other filesystem table following
the same spec subset (v2, positional + equality deletes, identity-style
layout where logical columns live in the data files) — including
Flink/CDC-written tables, whose writers emit equality deletes.

Schema evolution is resolved the way Iceberg resolves it — by FIELD ID,
not by name: each data manifest is read with the schema version its
adding snapshot recorded, then aligned to the selected snapshot's
schema by matching field ids (renames map, dropped columns disappear,
added columns NULL-fill, int→long/float→double widenings cast).

Scale: metadata walking is driver-side and O(manifests); the data read
is a normal distributed parquet scan per schema-generation (file groups
union after alignment). Positional-delete application is an anti-join
on (file path, row position) using Spark's `_metadata.row_index`;
equality-delete application is a null-safe anti-join on the delete
file's `equality_ids` columns gated by `data_seq < delete_seq` (so a
key re-inserted AFTER the delete survives). Both join the broadcast
tombstone side — delete files are metadata-sized next to the data they
tombstone — so neither shuffles the data.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from minio_iceberg_polaris_lakehouse_spark import avro_io, fsio

_PRIM_TO_SPARK = {
    "int": T.IntegerType(),
    "long": T.LongType(),
    "string": T.StringType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "timestamptz": T.TimestampType(),
    "timestamp": T.TimestampNTZType(),
    "binary": T.BinaryType(),
    "uuid": T.StringType(),
}

# legal Iceberg primitive-type promotions (spec §Schema Evolution)
_WIDENS = {("int", "long"), ("float", "double")}


def _is_dv_entry(data_file: dict) -> bool:
    """True for an Iceberg v3 deletion-vector entry: content=1 with a
    referenced_data_file + Puffin byte range (fields 143-145) instead of
    a parquet (file_path, pos) tombstone file."""
    return (
        data_file.get("referenced_data_file") is not None
        and data_file.get("content_offset") is not None
    )


def _dv_tombstones(spark: SparkSession, specs: list[dict]) -> DataFrame:
    """Decode deletion-vector blobs into (__file, __pos) tombstone rows.

    One executor task per blob (``mapInPandas`` over the blob index) —
    the decoded positions never pass through the driver, and at cluster
    scale each task range-reads only its own ``[offset, offset+length)``
    slice of the Puffin container (a DV is bounded by its data file's
    row count, so a task's output is at most one file's worth of
    positions). ``referenced`` paths arrive URI-normalized so they join
    ``_metadata.file_path`` exactly like parquet tombstones."""
    import pandas as pd

    spec_df = spark.createDataFrame(
        [
            (s["puffin"], int(s["offset"]), int(s["length"]), s["referenced"])
            for s in specs
        ],
        "puffin string, offset long, length long, referenced string",
    ).repartition(min(len(specs), 32))

    def _decode(batches):
        from minio_iceberg_polaris_lakehouse_spark import fsio as _fsio
        from minio_iceberg_polaris_lakehouse_spark import puffin as _puffin

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                with _fsio.open_binary(row.puffin) as fh:
                    fh.seek(int(row.offset))
                    blob = fh.read(int(row.length))
                positions = _puffin.decode_deletion_vector(blob)
                yield pd.DataFrame(
                    {"__file": row.referenced, "__pos": pd.Series(positions, dtype="int64")}
                )

    return spec_df.mapInPandas(_decode, "__file string, __pos long")


def _legal_promotion(src, tgt) -> bool:
    """True iff src -> tgt is a promotion the spec allows: int→long,
    float→double, or decimal precision growth at the same scale. Nested
    (dict) types only match exactly — handled by the == check upstream,
    so any dict pair reaching here is an illegal change."""
    if not (isinstance(src, str) and isinstance(tgt, str)):
        return False
    if (src, tgt) in _WIDENS:
        return True
    ms = re.fullmatch(r"decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)", src)
    mt = re.fullmatch(r"decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)", tgt)
    return bool(
        ms and mt and ms.group(2) == mt.group(2) and int(mt.group(1)) >= int(ms.group(1))
    )


def _spark_type(t) -> T.DataType:
    if isinstance(t, str):
        if t in _PRIM_TO_SPARK:
            return _PRIM_TO_SPARK[t]
        m = re.fullmatch(r"decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)", t)
        if m:
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
        raise ValueError(f"unsupported Iceberg type: {t}")
    if isinstance(t, dict) and t.get("type") == "struct":
        return T.StructType(
            [
                T.StructField(f["name"], _spark_type(f["type"]), not f.get("required"))
                for f in t["fields"]
            ]
        )
    if isinstance(t, dict) and t.get("type") == "list":
        return T.ArrayType(_spark_type(t["element"]), not t.get("element-required"))
    if isinstance(t, dict) and t.get("type") == "map":
        return T.MapType(
            _spark_type(t["key"]), _spark_type(t["value"]), not t.get("value-required")
        )
    raise ValueError(f"unsupported Iceberg type: {t!r}")


def _struct(schema_json: dict) -> T.StructType:
    return T.StructType(
        [
            T.StructField(f["name"], _spark_type(f["type"]), not f.get("required"))
            for f in schema_json["fields"]
        ]
    )


def resolve_metadata_path(location: str) -> str:
    """Accept a table dir, a metadata dir, or a vN.metadata.json path."""
    if location.endswith(".metadata.json"):
        return location
    mdir = location if fsio.basename(location) == "metadata" else os.path.join(location, "metadata")
    hint = fsio.read_text(os.path.join(mdir, "version-hint.text")).strip()
    return os.path.join(mdir, f"v{hint}.metadata.json")


def _entry_seq(entry: dict, manifest_rec: dict) -> int:
    """Data sequence number of a manifest entry: the entry's own
    sequence_number, inheriting the manifest-list record's when null
    (Iceberg v2 metadata inheritance for status=ADDED entries); 0 for
    v1-style metadata that carries neither."""
    seq = entry.get("sequence_number")
    if seq is None:
        seq = manifest_rec.get("sequence_number")
    return int(seq) if seq is not None else 0



def _default_lit(f: dict, out_t):
    """Iceberg v3 `initial-default` as a Spark literal: the JSON
    single-value forms for primitives (numbers, strings, booleans; date/
    timestamp as their ISO-string or epoch-unit encodings) cast to the
    field's Spark type. Non-primitive defaults (struct/list/map) are not
    produced by any writer we read; fall back to NULL rather than guess."""
    v = f.get("initial-default")
    if v is None or isinstance(v, (dict, list)):
        return F.lit(None).cast(out_t)
    t = f["type"]
    if t == "date" and isinstance(v, int):
        return F.date_add(F.lit("1970-01-01").cast("date"), v)
    if isinstance(t, str) and t.startswith("timestamp") and isinstance(v, int):
        return (F.lit(v) / F.lit(1_000_000)).cast("timestamp")  # micros
    return F.lit(v).cast(out_t)


def _align_cols(file_schema: dict, target: dict) -> list:
    """Field-id schema alignment, shared by every reader path: for each
    target field, the file's column with the SAME FIELD ID is renamed to
    the target name; a missing id fills the field's v3 `initial-default`
    when declared, else NULL (column added after the file was written);
    equal types pass through; legal promotions (int→long, float→double,
    decimal precision growth) cast; anything else is metadata
    corruption, not evolution — silently casting would truncate/NULL
    data, so it raises."""
    by_fid = {f["id"]: f for f in file_schema["fields"]}
    cols = []
    for f in target["fields"]:
        src = by_fid.get(f["id"])
        out_t = _spark_type(f["type"])
        if src is None:
            cols.append(_default_lit(f, out_t).alias(f["name"]))
        elif src["type"] == f["type"]:
            cols.append(F.col(src["name"]).alias(f["name"]))
        elif _legal_promotion(src["type"], f["type"]):
            cols.append(F.col(src["name"]).cast(out_t).alias(f["name"]))
        else:
            raise ValueError(
                f"illegal type change for field id {f['id']} "
                f"({f['name']}): {src['type']!r} -> {f['type']!r}"
            )
    return cols


def _decode_bound(raw: bytes, type_str: str):
    """Inverse of Iceberg's single-value binary serialization (spec
    Appendix D) for the bound types manifests carry. Returns None for
    types this pruner doesn't compare (conservative: no skip)."""
    import struct as _st

    if not isinstance(raw, (bytes, bytearray)):
        return None
    t = str(type_str)
    try:
        if t in ("int", "date") and len(raw) == 4:
            return _st.unpack("<i", raw)[0]
        if t in ("long", "time") or t.startswith("timestamp"):
            return _st.unpack("<q", raw)[0] if len(raw) == 8 else None
        if t == "float" and len(raw) == 4:
            return _st.unpack("<f", raw)[0]
        if t == "double" and len(raw) == 8:
            return _st.unpack("<d", raw)[0]
        if t == "string":
            return raw.decode("utf-8")
        if t.startswith("decimal"):
            import decimal as _dec
            import re as _re

            m = _re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", t)
            scale = int(m.group(2)) if m else 0
            unscaled = int.from_bytes(raw, "big", signed=True)
            return _dec.Decimal(unscaled).scaleb(-scale)
    except (ValueError, _st.error):
        return None
    return None


import contextvars as _contextvars

# Session timezone the CURRENT scan's predicate literals were written
# in. Spark evaluates a zone-less timestamp literal against a
# timestamptz column in spark.sql.session.timeZone, NOT UTC — a pruner
# that assumes UTC derives an instant offset from what Spark's row
# filter matches and can exclude the file holding the matching row.
# Entry points (read_iceberg_table & co) set this from the live session
# conf; pure-function callers (tests) get the UTC default.
_SESSION_TZ = _contextvars.ContextVar("iceberg_reader_session_tz", default="UTC")


def _session_zone():
    """tzinfo for _SESSION_TZ, or None when the zone name is unknown
    (conservative: callers decline to prune naive literals)."""
    import datetime as _dt

    from minio_iceberg_polaris_lakehouse_spark.tzones import is_utcish

    name = _SESSION_TZ.get()
    if is_utcish(name):
        return _dt.timezone.utc
    m = re.fullmatch(r"(?:GMT|UTC)?([+-])(\d{1,2}):?(\d{2})?", name)
    if m:
        sign = 1 if m.group(1) == "+" else -1
        mins = int(m.group(2)) * 60 + int(m.group(3) or 0)
        return _dt.timezone(sign * _dt.timedelta(minutes=mins))
    try:
        from zoneinfo import ZoneInfo

        return ZoneInfo(name)
    except Exception:
        return None


def _resolve_naive(d):
    """Map a NAIVE wall-clock datetime (a predicate literal on a
    timestamptz column) to the aware UTC instant Spark's row filter will
    use — via the session zone. Returns None (no pruning) for unknown
    zones and for DST-ambiguous/nonexistent wall times, where Python's
    fold disambiguation need not match Spark's."""
    import datetime as _dt

    z = _session_zone()
    if z is None:
        return None
    if z is _dt.timezone.utc:
        return d.replace(tzinfo=_dt.timezone.utc)
    a = d.replace(tzinfo=z)
    b = d.replace(tzinfo=z, fold=1)
    if a.utcoffset() != b.utcoffset():
        return None
    return a.astimezone(_dt.timezone.utc)


def _ts_micros(s: str, session_naive: bool = False) -> int | None:
    """Parse a timestamp string (path-encoded partition value or
    predicate literal, ' ' or 'T' separator, optional offset) to UTC
    epoch micros; None when unparsable (conservative: no pruning).
    ``session_naive`` marks a PREDICATE literal on a timestamptz
    column, whose zone-less form Spark reads in the session zone —
    partition-side values stay UTC (the spec path-encodes instants)."""
    import datetime as _dt

    try:
        d = _dt.datetime.fromisoformat(s)
    except ValueError:
        return None
    if d.tzinfo is None:
        d = _resolve_naive(d) if session_naive else d.replace(tzinfo=_dt.timezone.utc)
        if d is None:
            return None
    delta = d - _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
    return (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds


def _coerce_vals(pv, v, col_type) -> tuple | None:
    """(a, b) made comparable for pruning, or None (no pruning on this
    pair — conservative)."""
    import datetime as _dt

    if pv is None or v is None:
        return None
    if isinstance(pv, bool) or isinstance(v, bool):
        return None
    t = str(col_type)
    if t.startswith("decimal"):
        # decimal partition values appear as path strings ('10.00'),
        # Avro-decoded Decimals, or derived-literal Decimals — compare
        # everything in exact Decimal space, never as text
        import decimal as _dec

        try:
            a = pv if isinstance(pv, _dec.Decimal) else _dec.Decimal(str(pv))
            b = v if isinstance(v, _dec.Decimal) else _dec.Decimal(str(v))
            return (a, b)
        except _dec.InvalidOperation:
            return None
    if isinstance(pv, (int, float)) and isinstance(v, (int, float)):
        return (pv, v)
    if isinstance(pv, str) and isinstance(v, str):
        # raw lexicographic comparison is only sound for STRING columns:
        # identity-partitioned timestamps path-encode as
        # '2024-01-01 10:00:00', and an equivalent literal in another
        # format ('2024-01-01T10:00:00', no-seconds) compares unequal /
        # mis-ordered AS TEXT — excluding the file that holds the
        # matching instant. Parse typed columns to their numeric space.
        if t == "string":
            return (pv, v)
        if t.startswith("timestamp"):
            # pv is the partition/bound side (UTC-encoded per spec);
            # v is the predicate literal (session-zone when naive + tz)
            a = _ts_micros(pv)
            b = _ts_micros(v, session_naive=(t == "timestamptz"))
            return None if a is None or b is None else (a, b)
        if t == "date":
            try:
                return (
                    _dt.date.fromisoformat(pv).toordinal(),
                    _dt.date.fromisoformat(v).toordinal(),
                )
            except ValueError:
                return None
        return None
    if isinstance(pv, int) and isinstance(v, str) and t == "date":
        try:
            return (pv, (_dt.date.fromisoformat(v) - _dt.date(1970, 1, 1)).days)
        except ValueError:
            return None
    if t.startswith("timestamp") and not isinstance(pv, float) and not isinstance(v, float):
        # binary-decoded manifest bounds are epoch micros (int); literals
        # and path-encoded partition values are strings — parse the
        # string side so identity-timestamp summaries prune too
        if isinstance(pv, int) and isinstance(v, str):
            b = _ts_micros(v, session_naive=(t == "timestamptz"))
            return None if b is None else (pv, b)
        if isinstance(pv, str) and isinstance(v, int):
            a = _ts_micros(pv)
            return None if a is None else (a, v)
        return None
    if isinstance(pv, str) and isinstance(v, (int, float)):
        try:  # path-encoded partition value vs numeric literal
            return (type(v)(pv), v)
        except (TypeError, ValueError):
            return None
    return None


def _transform_pred(transform: str, v, col_type) -> tuple[object, bool] | None:
    """Map a PREDICATE value into partition space under an Iceberg
    transform: returns (partition_value, monotonic) or None when the
    derivation isn't possible (conservative — no pruning). Monotonic
    transforms (day/month/year/hour/numeric truncate) also prune
    ranges; bucket prunes equality only."""
    import datetime as _dt

    t = str(col_type)

    def _as_dt(x) -> _dt.datetime | None:
        try:
            if isinstance(x, str):
                d = _dt.datetime.fromisoformat(x)
            elif isinstance(x, _dt.datetime):
                d = x
            elif isinstance(x, _dt.date):
                d = _dt.datetime(x.year, x.month, x.day)
            else:
                return None
            # Iceberg temporal transforms are defined over UTC micros:
            # an offset-bearing literal must be converted (not just
            # tagged) before its calendar fields are read, or e.g.
            # '2024-01-01T23:00:00-05:00' (UTC day 2024-01-02) maps to
            # day 19723 and prunes files holding matching rows. A NAIVE
            # literal on a timestamptz column is read by Spark in the
            # SESSION zone, not UTC — resolve it the same way (None on
            # unknown zone / ambiguous wall time → no pruning).
            if d.tzinfo is None:
                d = _resolve_naive(d) if t == "timestamptz" else d.replace(
                    tzinfo=_dt.timezone.utc
                )
                if d is None:
                    return None
            return d.astimezone(_dt.timezone.utc)
        except ValueError:
            return None

    if transform == "identity":
        return (v, True)
    if transform in ("day", "month", "year", "hour"):
        d = _as_dt(v)
        if d is None:
            return None
        if transform == "day":
            return ((d.date() - _dt.date(1970, 1, 1)).days, True)
        if transform == "month":
            return ((d.year - 1970) * 12 + d.month - 1, True)
        if transform == "year":
            return (d.year - 1970, True)
        # exact micros floor division: int(timestamp()) truncates toward
        # zero, mapping pre-1970 fractional-second instants one hour high
        delta = d - _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
        micros = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
        return (micros // 3_600_000_000, True)
    m = re.fullmatch(r"bucket\[(\d+)\]", transform)
    if m:
        from minio_iceberg_polaris_lakehouse_spark.theta import iceberg_bucket

        vv = v
        if t.startswith("timestamp") and isinstance(v, str):
            # resolve the literal to the instant Spark's row filter will
            # match BEFORE hashing (iceberg_bucket's own string fallback
            # reads naive as UTC — wrong bucket under a non-UTC session
            # on a timestamptz column → row loss)
            vv = _ts_micros(v, session_naive=(t == "timestamptz"))
            if vv is None:
                return None
        b = iceberg_bucket(vv, int(m.group(1)), t)
        return None if b is None else (b, False)
    m = re.fullmatch(r"truncate\[(\d+)\]", transform)
    if m:
        w = int(m.group(1))
        # The COLUMN type decides the partition space, not the literal's
        # Python type: an integer SQL literal on a DECIMAL column (WHERE
        # amt = 10, parsed to int) must route through the unscaled-width
        # floor branch below — the int fast path would derive
        # 10 - 10 % 50 = 0 instead of 10.00, silently excluding the file
        # that holds the matching row.
        dm = re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", t)
        if isinstance(v, int) and not isinstance(v, bool) and dm is None:
            return (v - (v % w), True)
        if dm is not None:
            # spec: decimal truncate width applies to the UNSCALED value
            # with floor semantics (Python Decimal % keeps the dividend's
            # sign — normalize); monotone, so ranges map through
            import decimal as _dec

            try:
                dv = v if isinstance(v, _dec.Decimal) else _dec.Decimal(str(v))
            except _dec.InvalidOperation:
                return None
            step = _dec.Decimal(w).scaleb(-int(dm.group(2)))
            r = dv % step
            if r < 0:
                r += step
            return (dv - r, True)
        if isinstance(v, str):
            # string truncate keeps the W-char prefix; prefix order is
            # consistent with string order → monotonic for pruning
            return (v[:w], True)
    return None


def _bounds_exclude(lo_b, hi_b, col, t, eq, between) -> bool:
    """True iff a [lo_b, hi_b] value range provably excludes the
    eq/between predicate on ``col`` (None bounds never exclude)."""
    if eq and col in eq:
        v = eq[col]
        c = _coerce_vals(hi_b, v, t)
        if c is not None and c[0] < c[1]:
            return True  # range max < wanted value
        c = _coerce_vals(lo_b, v, t)
        if c is not None and c[0] > c[1]:
            return True  # range min > wanted value
    if between and col in between:
        lo, hi = between[col]
        if hi is not None:
            c = _coerce_vals(lo_b, hi, t)
            if c is not None and c[0] > c[1]:
                return True  # range min > predicate hi
        if lo is not None:
            c = _coerce_vals(hi_b, lo, t)
            if c is not None and c[0] < c[1]:
                return True  # range max < predicate lo
    return False


def _partition_space_type(transform: str, col_type) -> str:
    """The type partition-space values (and summary bounds) carry under
    a transform."""
    if transform == "day":
        return "date"
    if transform in ("month", "year", "hour") or transform.startswith("bucket"):
        return "int"
    return str(col_type)  # identity / truncate keep the source type


def _part_range_excl(
    lo_b, hi_b, col, col_type, transform, eq, between, bucket_ok: bool = True
) -> bool:
    """True iff a partition-space value range [lo_b, hi_b] provably
    excludes the predicate on the SOURCE column under ``transform`` —
    predicate values are mapped into partition space first (hidden
    partitioning on the consumer side); non-monotonic transforms
    (bucket) prune equality only, and ONLY when ``bucket_ok`` says the
    writer used the Iceberg-spec bucket hash (this engine's own exports
    stamp write.bucket-hash=spark-murmur3-seed42 — deriving spec
    buckets against those values would prune WRONG files)."""
    if transform.startswith("bucket") and not bucket_ok:
        return False
    if eq and col in eq:
        d = _transform_pred(transform, eq[col], col_type)
        if d is not None:
            c = _coerce_vals(hi_b, d[0], col_type)
            if c is not None and c[0] < c[1]:
                return True
            c = _coerce_vals(lo_b, d[0], col_type)
            if c is not None and c[0] > c[1]:
                return True
    if between and col in between:
        lo, hi = between[col]
        if hi is not None:
            d = _transform_pred(transform, hi, col_type)
            if d is not None and d[1]:
                c = _coerce_vals(lo_b, d[0], col_type)
                if c is not None and c[0] > c[1]:
                    return True
        if lo is not None:
            d = _transform_pred(transform, lo, col_type)
            if d is not None and d[1]:
                c = _coerce_vals(hi_b, d[0], col_type)
                if c is not None and c[0] < c[1]:
                    return True
    return False


def _bucket_hash_ok(md: dict) -> bool:
    """True iff bucket partition VALUES in this table follow the
    Iceberg-spec bucket hash (the spec requires it; only this engine's
    own exports stamp a different hash).

    An ABSENT stamp is trusted as spec-hashed only for genuinely
    foreign metadata: exports this engine produced BEFORE the stamp
    existed carry Spark murmur3(seed 42) bucket values with no
    property, and deriving spec buckets against those would prune the
    WRONG files. Our exporter is detectable without a property — it is
    the only writer that mirrors each manifest list to a sibling
    `snap-<id>.manifest-list.json` debug document — so unstamped
    metadata whose current snapshot has that mirror is treated as
    legacy-engine-hashed (no bucket pruning)."""
    stamp = (md.get("properties") or {}).get("write.bucket-hash")
    if stamp == "iceberg-murmur3":
        return True
    if stamp is not None:
        return False
    # no stamp: version-gate against this engine's pre-stamp exports;
    # undeterminable provenance (None) fails CLOSED — no bucket pruning
    return _is_own_export(md) is False


def _is_own_export(md: dict) -> bool | None:
    """Whether this metadata tree was produced by THIS engine's exporter
    — detectable without any property because only our exporter mirrors
    each manifest list to a sibling `snap-<id>.manifest-list.json` debug
    document. Returns None when provenance cannot be determined (treat
    conservatively at the call site).

    Checks EVERY snapshot's mirror, not just the current one, and the
    metadata directory itself: a pre-stamp export whose current
    snapshot's mirror was expired/cleaned would otherwise classify as
    foreign and get spec-hash bucket pruning against Spark-hashed
    values (wrong-file pruning, row loss). Any exists()/listdir error
    is inconclusive → None (callers fail closed: no bucket pruning)."""
    mirrors: list[str] = []
    for s in md.get("snapshots", []):
        ml = s.get("manifest-list", "")
        mirror = re.sub(r"-manifest-list\.avro$", ".manifest-list.json", ml)
        if mirror != ml:
            mirrors.append(mirror)
    inconclusive = False
    for mirror in mirrors:
        try:
            if fsio.exists(mirror):
                return True
        except Exception:
            inconclusive = True
    # snapshot entries may point at expired paths — also scan the live
    # metadata directory for ANY of our mirror documents
    for mirror in mirrors[:1]:
        mdir = mirror.rsplit("/", 1)[0] if "/" in mirror else mirror
        try:
            if any(
                n.startswith("snap-") and n.endswith(".manifest-list.json")
                for n in fsio.listdir(mdir)
            ):
                return True
        except Exception:
            inconclusive = True
    if inconclusive:
        return None
    return False


def _manifest_pruner(md: dict, target: dict, eq: dict | None, between: dict | None):
    """Build `keep(manifest_list_record) -> bool`: manifest-LIST level
    pruning from the spec's field 507 `partitions` summaries — a DATA
    manifest whose partition value range provably excludes the
    predicate (after mapping predicate values through the partition
    TRANSFORM: identity/day/month/year/hour/bucket/truncate) is skipped
    WITHOUT opening its Avro (planning cost O(matching manifests), the
    first level of Iceberg's two-level scan planning). Delete manifests
    and manifests without summaries are always kept."""
    if not eq and not between:
        return None
    specs = {s["spec-id"]: s.get("fields", []) for s in md.get("partition-specs", [])}
    by_id = {int(f["id"]): f["name"] for f in target.get("fields", [])}
    type_by_name = {f["name"]: f["type"] for f in target.get("fields", [])}
    pred_cols = set(eq or ()) | set(between or ())
    bucket_ok = _bucket_hash_ok(md)
    own_export = _is_own_export(md)

    def dec_bound(raw: bytes, bt: str):
        """Partition-space bound decode, provenance-aware for DECIMAL:
        this engine's exporter string-encodes decimal partition values
        (avro string fallback) and its summary min/max are therefore
        STRING-ordered ('-0.50' < '-10.50' — not a decimal range at
        all), while the spec encodes unscaled big-endian bytes whose
        decode IS decimal-ordered. Own/unknown provenance → None (no
        manifest-LIST pruning on decimal summaries; the manifest-level
        FILE pruner still prunes exactly from typed partition values —
        costs one Avro decode, never rows); genuinely foreign → spec
        bytes."""
        if str(bt).startswith("decimal") and own_export is not False:
            return None
        return _decode_bound(raw, bt)

    def keep(m: dict) -> bool:
        if m.get("content") == 1:
            return True
        summaries = m.get("partitions")
        if not summaries:
            return True
        fields = specs.get(int(m.get("partition_spec_id", 0)), [])
        for f, s in zip(fields, summaries):
            if not isinstance(s, dict):
                continue
            col = by_id.get(int(f.get("source-id", -1)))
            if col is None or col not in pred_cols:
                continue
            tr = f.get("transform", "identity")
            ct = type_by_name.get(col)
            bt = _partition_space_type(tr, ct)
            lo_b = (
                dec_bound(s["lower_bound"], bt)
                if s.get("lower_bound") is not None
                else None
            )
            hi_b = (
                dec_bound(s["upper_bound"], bt)
                if s.get("upper_bound") is not None
                else None
            )
            if _part_range_excl(lo_b, hi_b, col, ct, tr, eq, between, bucket_ok):
                return False
        return True

    return keep


def _file_pruner(md: dict, target: dict, eq: dict | None, between: dict | None):
    """Build `keep(spec_id, data_file) -> bool` for manifest-level file
    pruning over open metadata: PARTITION VALUES (predicates mapped
    through the partition transform — hidden partitioning) and, when
    the manifest carries them, per-column lower/upper BOUNDS.
    Conservative everywhere — incomparable, absent, or null values keep
    the file; only a provable exclusion skips. Returns None when there
    is nothing to prune on."""
    if not eq and not between:
        return None

    specs = {s["spec-id"]: s.get("fields", []) for s in md.get("partition-specs", [])}
    by_id = {int(f["id"]): f["name"] for f in target.get("fields", [])}
    type_by_name = {f["name"]: f["type"] for f in target.get("fields", [])}
    type_by_id = {int(f["id"]): f["type"] for f in target.get("fields", [])}
    bucket_ok = _bucket_hash_ok(md)

    def bound_map(raw) -> dict[int, bytes]:
        if isinstance(raw, dict):
            return {int(k): v for k, v in raw.items()}
        if isinstance(raw, list):  # avro k/v record array form
            return {
                int(r["key"]): r["value"]
                for r in raw
                if isinstance(r, dict) and "key" in r and "value" in r
            }
        return {}

    pred_cols = set(eq or ()) | set(between or ())

    def keep(spec_id: int, data_file: dict) -> bool:
        part = data_file.get("partition")
        if isinstance(part, dict):
            for f in specs.get(spec_id, []):
                col = by_id.get(int(f.get("source-id", -1)))
                if col is None or col not in pred_cols:
                    continue
                pv = part.get(f["name"])
                if pv is None:
                    continue
                tr = f.get("transform", "identity")
                # a single partition value is a degenerate [pv, pv]
                # range — the transform-aware exclusion covers identity,
                # day/month/year/hour, bucket (eq only), and truncate
                if _part_range_excl(
                    pv, pv, col, type_by_name.get(col), tr, eq, between, bucket_ok
                ):
                    return False
        lbs = bound_map(data_file.get("lower_bounds"))
        ubs = bound_map(data_file.get("upper_bounds"))
        for fid in set(lbs) | set(ubs):
            col = by_id.get(fid)
            if col is None or col not in pred_cols:
                continue
            t = type_by_id.get(fid)
            lo_b = _decode_bound(lbs[fid], t) if fid in lbs else None
            hi_b = _decode_bound(ubs[fid], t) if fid in ubs else None
            if _bounds_exclude(lo_b, hi_b, col, t, eq, between):
                return False
        return True

    return keep


def read_iceberg_table(
    spark: SparkSession,
    location: str,
    snapshot_id: int | None = None,
    as_of_ms: int | None = None,
    ref: str | None = None,
    _keep_lineage: bool = False,
    _keep_seq: bool = False,
    row_lineage: bool = False,
    eq: dict | None = None,
    between: dict | None = None,
) -> DataFrame:
    """Open the table at ``location`` (table dir / metadata dir /
    metadata file) as a DataFrame; optional time travel by snapshot id,
    timestamp (milliseconds), or a named branch/tag from the metadata
    document's ``refs`` map (Iceberg's ref time travel — VERSION AS OF
    'audit-2024' works on a foreign table exactly as on a native one).

    ``row_lineage=True`` adds Iceberg v3's `_row_id` /
    `_last_updated_sequence_number` from the OPEN metadata alone:
    per-file first-row-ids come from the exported manifest-list JSON
    mirror (joined as a broadcast, not collected per row), materialized
    lineage columns in rewritten files (detected from one parquet footer
    per file group, metadata-only) win over derivation, and the update
    sequence falls back to the file's data sequence — the same rules the
    native reader applies, so engine and foreign reads agree bit-for-bit
    across compaction/CoW rewrites. Tables whose metadata predates row
    lineage yield NULL ids (the spec's 'not assigned').

    ``eq`` / ``between`` are OPTIONAL scan predicates (column →
    value / (lo, hi)) used for manifest-level FILE PRUNING only —
    Iceberg scan planning over the open metadata: data files whose
    identity-transform partition value (and, when the manifest carries
    them, column bounds) provably exclude the predicate never reach
    Spark's planner. Pruning is conservative (incomparable or absent
    values keep the file) and NEVER replaces the query's own filter —
    the caller still applies its full WHERE on top, so a missed prune
    costs IO, never correctness."""
    md = json.loads(fsio.read_text(resolve_metadata_path(location)))
    snaps = md.get("snapshots", [])
    schemas = {s["schema-id"]: s for s in md.get("schemas", [])}
    if ref is not None:
        if snapshot_id is not None or as_of_ms is not None:
            raise ValueError("ref is exclusive with snapshot_id/as_of_ms")
        rec = (md.get("refs") or {}).get(ref)
        if rec is None:
            raise ValueError(f"no branch or tag {ref!r} at {location}")
        snapshot_id = int(rec["snapshot-id"])
    if snapshot_id is not None:
        snap = next((s for s in snaps if s["snapshot-id"] == snapshot_id), None)
        if snap is None:
            raise ValueError(f"no snapshot {snapshot_id} at {location}")
    elif as_of_ms is not None:
        older = [s for s in snaps if s["timestamp-ms"] <= as_of_ms]
        if not older:
            raise ValueError(f"no snapshot at or before {as_of_ms} at {location}")
        snap = max(older, key=lambda s: s["timestamp-ms"])
    else:
        cur = md.get("current-snapshot-id")
        snap = next((s for s in snaps if s["snapshot-id"] == cur), None)

    target_sid = snap.get("schema-id", md["current-schema-id"]) if snap else md["current-schema-id"]
    target = schemas[target_sid]

    if row_lineage and _keep_lineage:
        raise ValueError("row_lineage is exclusive with the internal _keep_lineage")

    def _empty() -> DataFrame:
        e = spark.createDataFrame([], _struct(target))
        if _keep_lineage:
            e = e.withColumn("__file", F.lit(None).cast("string")).withColumn(
                "__pos", F.lit(None).cast("long")
            )
            if _keep_seq:
                e = e.withColumn("__seq", F.lit(None).cast("long"))
        if row_lineage:
            e = e.withColumn("_row_id", F.lit(None).cast("long")).withColumn(
                "_last_updated_sequence_number", F.lit(None).cast("long")
            )
        return e

    if snap is None:  # table created but never committed to
        return _empty()

    # schema version each snapshot wrote under — manifests carry their
    # adding snapshot, which dates the physical column names in the files
    schema_of_snap = {s["snapshot-id"]: s.get("schema-id", target_sid) for s in snaps}

    _s, _m, manifests = avro_io.read_container(snap["manifest-list"])
    # data files group by the SCHEMA THEY WERE WRITTEN WITH. The
    # authoritative source is the manifest's own embedded schema metadata
    # (written at the manifest's creation, immutable) — the
    # adding-snapshot lookup is only the fallback, because expiry can
    # remove the adding snapshot from the metadata document while its
    # manifest stays referenced, and falling back to the TARGET schema
    # would silently NULL every renamed column in those files.
    # Each group also carries its DATA SEQUENCE number (Iceberg v2:
    # entry-level sequence_number, inheriting from the manifest-list
    # record when null) — equality deletes only hit rows whose data
    # sequence predates the delete file's.
    groups: dict[tuple[str, int], tuple[dict, int, list[str]]] = {}
    delete_paths: list[str] = []
    dv_specs: list[dict] = []  # v3 deletion vectors: {puffin, offset, length, referenced}
    eq_deletes: list[dict] = []  # {path, ids, seq, schema}
    avro_first_rows: dict[str, int] = {}  # v3 lineage read from the Avro records
    # two-level scan planning (Iceberg's): (1) manifest-LIST pruning —
    # whole DATA manifests whose field-507 partition summaries exclude
    # the predicate are skipped without opening their Avro; (2) file
    # pruning inside kept manifests (partition values + bounds). Delete
    # manifests are NEVER pruned — a tombstone for a pruned file simply
    # finds no rows in the anti-join.
    # naive predicate literals on timestamptz columns are read by Spark
    # in the SESSION zone — thread it so the pruners derive the same
    # instant the row filter will match (a UTC assumption under a
    # non-UTC session excludes the file holding the matching row)
    try:
        _SESSION_TZ.set(spark.conf.get("spark.sql.session.timeZone") or "UTC")
    except Exception:
        _SESSION_TZ.set("UTC")
    keep_file = _file_pruner(md, target, eq, between)
    keep_manifest = _manifest_pruner(md, target, eq, between)
    for m in manifests:
        if keep_manifest is not None and not keep_manifest(m):
            continue
        _s2, m2, entries = avro_io.read_container(m["manifest_path"])
        # status 2 = DELETED: the entry records a file REMOVED by this
        # snapshot lineage — reading it would resurrect deleted rows
        live = [e for e in entries if e.get("status") != 2]
        emb = m2.get("schema")
        if emb is not None:
            fschema = json.loads(emb.decode() if isinstance(emb, bytes) else emb)
        else:
            sid = schema_of_snap.get(m["added_snapshot_id"], target_sid)
            fschema = schemas[sid]
        if m["content"] == 1:
            for e in live:
                if e["data_file"].get("content") == 2:
                    ids = e["data_file"].get("equality_ids")
                    if not ids:
                        raise ValueError(
                            f"equality-delete file without equality_ids in "
                            f"{m['manifest_path']} — cannot apply; silently "
                            "ignoring it would return deleted rows"
                        )
                    eq_deletes.append(
                        {
                            "path": e["data_file"]["file_path"],
                            "ids": list(ids),
                            "seq": _entry_seq(e, m),
                            "schema": fschema,
                        }
                    )
                elif _is_dv_entry(e["data_file"]):
                    dv_specs.append(
                        {
                            "puffin": e["data_file"]["file_path"],
                            "offset": int(e["data_file"]["content_offset"]),
                            "length": int(e["data_file"]["content_size_in_bytes"]),
                            "referenced": re.sub(
                                r"^file:(//)?",
                                "",
                                e["data_file"]["referenced_data_file"],
                            ),
                        }
                    )
                elif (e["data_file"].get("file_format") or "").upper() == "PUFFIN":
                    # a Puffin delete entry MUST carry fields 143-145;
                    # falling through to the parquet tombstone path would
                    # fail confusingly (or worse, silently skip deletes)
                    raise ValueError(
                        f"PUFFIN delete entry without referenced_data_file/"
                        f"content_offset in {m['manifest_path']} — cannot "
                        "apply; silently ignoring it would return deleted rows"
                    )
                else:
                    delete_paths.append(e["data_file"]["file_path"])
            continue
        skey = json.dumps(fschema, sort_keys=True)
        # Iceberg v3 row lineage from the AVRO records (what a real v3
        # writer produces): explicit per-file first_row_id when present,
        # else the spec's inheritance rule — manifest-list record's
        # first_row_id plus the running record_count of prior entries in
        # this manifest that also omitted it. The JSON mirror (this
        # engine's own export) is only the fallback below.
        man_base = m.get("first_row_id")
        inherit_off = 0
        for e in live:
            seq = _entry_seq(e, m)
            # lineage bookkeeping runs for EVERY entry (the inheritance
            # offset must not shift when a file is pruned); only the
            # read list is pruned
            if keep_file is None or keep_file(
                int(m.get("partition_spec_id", 0)), e["data_file"]
            ):
                groups.setdefault((skey, seq), (fschema, seq, []))[2].append(
                    e["data_file"]["file_path"]
                )
            if row_lineage:
                frid = e["data_file"].get("first_row_id")
                if frid is None and e.get("first_row_id") is not None:
                    frid = e["first_row_id"]  # entry-level placement
                path_norm = re.sub(r"^file:(//)?", "", e["data_file"]["file_path"])
                if frid is not None:
                    avro_first_rows[path_norm] = int(frid)
                elif man_base is not None:
                    avro_first_rows[path_norm] = int(man_base) + inherit_off
                    inherit_off += int(e["data_file"].get("record_count") or 0)

    if not groups:
        return _empty()

    meta_cols = [
        F.regexp_replace(F.col("_metadata.file_path"), "^file:(//)?", "").alias("__file"),
        F.col("_metadata.row_index").alias("__pos"),
    ]
    parts: list[DataFrame] = []
    for file_schema, seq, files in groups.values():
        if not files:
            continue
        base_struct = _struct(file_schema)
        cols = _align_cols(file_schema, target)
        if not row_lineage:
            df = spark.read.schema(base_struct).parquet(*files)
            parts.append(df.select(*cols, *meta_cols, F.lit(seq).alias("__seq")))
            continue
        # footer sniff per FILE (metadata-only, handle closed): rewritten
        # files carry materialized _lin_* columns the schema JSON never
        # lists — they win over derivation, exactly as in the native
        # reader. Sniffing only one file per group would mis-resolve ids
        # whenever foreign metadata mixes materialized and
        # non-materialized files in one (schema, seq) group.
        import pyarrow.parquet as _pq

        def _has_lin(path: str) -> bool:
            with fsio.open_binary(path) as fh:
                return "_lin_row_id" in _pq.ParquetFile(fh).schema_arrow.names

        with_lin = [f for f in files if _has_lin(f)]
        without_lin = [f for f in files if f not in set(with_lin)]
        if with_lin:
            lin_struct = T.StructType(
                list(base_struct.fields)
                + [
                    T.StructField("_lin_row_id", T.LongType(), True),
                    T.StructField("_lin_upd_seq", T.LongType(), True),
                ]
            )
            df = spark.read.schema(lin_struct).parquet(*with_lin)
            parts.append(
                df.select(
                    *cols,
                    *meta_cols,
                    F.lit(seq).alias("__seq"),
                    F.col("_lin_row_id").alias("__lin_row_id"),
                    F.col("_lin_upd_seq").alias("__lin_upd_seq"),
                )
            )
        if without_lin:
            df = spark.read.schema(base_struct).parquet(*without_lin)
            parts.append(
                df.select(
                    *cols,
                    *meta_cols,
                    F.lit(seq).alias("__seq"),
                    F.lit(None).cast("long").alias("__lin_row_id"),
                    F.lit(None).cast("long").alias("__lin_upd_seq"),
                )
            )
    if not parts:  # every entry was status=2 / groups held no files
        return _empty()
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)

    if dv_specs and keep_file is not None:
        # a pruned scan never reads rows a DV for a PRUNED data file could
        # tombstone — the manifest names each DV's referenced file, so
        # skip decoding those blobs entirely (parquet positional-delete
        # files name their targets only per ROW, so they still all load
        # and simply match nothing)
        kept = {
            re.sub(r"^file:(//)?", "", f)
            for _sch, _seq, fl in groups.values()
            for f in fl
        }
        dv_specs = [d for d in dv_specs if d["referenced"] in kept]
    if delete_paths or dv_specs:
        tombs = None
        if delete_paths:
            # normalize the tombstone side too: legacy/foreign delete files
            # may record file: URIs while _metadata.file_path was already
            # stripped above — an unnormalized mismatch silently un-applies
            # the delete
            tombs = spark.read.parquet(*delete_paths).select(
                F.regexp_replace(F.col("file_path"), "^file:(//)?", "").alias("__file"),
                F.col("pos").alias("__pos"),
            )
        if dv_specs:
            # v3 deletion vectors decode executor-side to the same
            # (__file, __pos) shape and ride the same anti-join
            dvt = _dv_tombstones(spark, dv_specs)
            tombs = dvt if tombs is None else tombs.unionByName(dvt)
        tombs = tombs.dropDuplicates(["__file", "__pos"])
        out = out.join(F.broadcast(tombs), ["__file", "__pos"], "left_anti")
    for rec in eq_deletes:
        out = _apply_eq_delete(spark, out, rec, target)
    if _keep_lineage:
        # internal (delete writer / changelog): live rows WITH their
        # (file, position) identity — __file is URI-normalized like the
        # delete files; _keep_seq additionally keeps the data sequence
        # (the eq-delete changelog's `data_seq < delete_seq` gate)
        return out if _keep_seq else out.drop("__seq")
    if row_lineage:
        # per-file first-row-ids, two sources merged (maps are
        # manifest-sized → broadcast join, never a collect per row):
        # the AVRO manifest records (what a genuine v3 writer carries —
        # explicit or inherited, collected above) win; the export's
        # manifest-list JSON mirror fills anything the Avro lacked
        # (this engine's own pre-v3-avro exports).
        mlist_json = re.sub(
            r"-manifest-list\.avro$", ".manifest-list.json", snap["manifest-list"]
        )
        first_map: dict[str, int] = {}
        try:
            mirror = json.loads(fsio.read_text(mlist_json))
            for man in mirror.get("manifests", []):
                for fe in man.get("data_files", []):
                    if fe.get("first_row_id") is not None:
                        first_map[re.sub(r"^file:(//)?", "", fe["file_path"])] = int(
                            fe["first_row_id"]
                        )
        except (OSError, ValueError):
            pass  # no mirror: Avro-only (or pre-lineage → ids stay NULL)
        first_map.update(avro_first_rows)
        first_rows = list(first_map.items())
        if first_rows:
            firsts = spark.createDataFrame(
                first_rows, "__file string, __first bigint"
            ).dropDuplicates(["__file"])
            out = out.join(F.broadcast(firsts), ["__file"], "left")
        else:
            out = out.withColumn("__first", F.lit(None).cast("long"))
        out = out.select(
            *[c for c in out.columns if not c.startswith("__")],
            F.coalesce(
                F.col("__lin_row_id"), (F.col("__first") + F.col("__pos")).cast("long")
            ).alias("_row_id"),
            F.coalesce(F.col("__lin_upd_seq"), F.col("__seq")).alias(
                "_last_updated_sequence_number"
            ),
        )
        return out
    return out.drop("__file", "__pos", "__seq")


def incremental_read_iceberg_table(
    spark: SparkSession,
    location: str,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """Iceberg-style incremental APPEND scan over a FOREIGN table's open
    metadata: the rows added by snapshots (from, to] — the manifests
    present in `to`'s manifest list but not in `from`'s, read with the
    same field-id schema alignment as the full scan. The
    change-consumption primitive a downstream pipeline polls, O(new
    data), never a rescan.

    Mirrors warehouse.Table.incremental_scan's contract exactly:
    - a missing `from` snapshot raises SnapshotNotFoundError-equivalent
      (ValueError here; the streaming source maps it) — an expired
      checkpoint must fail loudly, not silently skip;
    - an interval that REMOVES a manifest (rewrite/compaction/overwrite)
      or ADDS delete manifests is not expressible as pure appends and
      raises — the consumer falls back to a full re-read."""
    md = json.loads(fsio.read_text(resolve_metadata_path(location)))
    snaps = md.get("snapshots", [])
    by_id = {s["snapshot-id"]: s for s in snaps}
    if from_snapshot_id not in by_id:
        raise ValueError(f"snapshot {from_snapshot_id} not found at {location}")
    if to_snapshot_id is None:
        to_snapshot_id = md.get("current-snapshot-id")
    if to_snapshot_id not in by_id:
        raise ValueError(f"snapshot {to_snapshot_id} not found at {location}")
    schemas = {s["schema-id"]: s for s in md.get("schemas", [])}
    target_sid = by_id[to_snapshot_id].get("schema-id", md["current-schema-id"])
    target = schemas[target_sid]
    if to_snapshot_id == from_snapshot_id:
        return spark.createDataFrame([], _struct(target))

    def _mans(snap) -> dict[str, dict]:
        _s, _m, recs = avro_io.read_container(snap["manifest-list"])
        return {r["manifest_path"]: r for r in recs}

    base = _mans(by_id[from_snapshot_id])
    head = _mans(by_id[to_snapshot_id])
    removed = [p for p in base if p not in head]
    if removed:
        raise ValueError(
            f"incremental scan crosses replacing snapshot(s): manifests "
            f"removed {removed[:3]}{'…' if len(removed) > 3 else ''} — data "
            "was rewritten; fall back to a full scan"
        )
    added = [r for p, r in head.items() if p not in base]
    if any(r.get("content") == 1 for r in added):
        raise ValueError(
            "incremental scan crosses row-level DELETEs — not expressible "
            "as pure appends; fall back to a full scan"
        )

    parts: list[DataFrame] = []
    for man in added:
        _s2, m2, entries = avro_io.read_container(man["manifest_path"])
        live = [e for e in entries if e.get("status") != 2]
        emb = m2.get("schema")
        fschema = (
            json.loads(emb.decode() if isinstance(emb, bytes) else emb)
            if emb is not None
            else target
        )
        files = [e["data_file"]["file_path"] for e in live]
        if not files:
            continue
        df = spark.read.schema(_struct(fschema)).parquet(*files)
        parts.append(df.select(*_align_cols(fschema, target)))
    if not parts:
        return spark.createDataFrame([], _struct(target))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def changes_iceberg_table(
    spark: SparkSession,
    location: str,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """CDC changelog over a FOREIGN table's open metadata — the consumer
    twin of warehouse.Table.changes for tables this engine didn't write
    (a Flink/CDC-fed Iceberg table consumed into a bronze→silver
    pipeline). Returns the interval's row-level changes tagged
    `_change_type` ('insert' | 'delete') and `_commit_snapshot_id`
    (the snapshot whose manifest-list diff introduced the change).

    Scope and guarantees:
    - appended data manifests → 'insert' rows (field-id aligned);
    - added POSITIONAL delete manifests → the deleted rows re-read from
      their data files and emitted as 'delete' (the tombstone side
      broadcast);
    - added EQUALITY delete manifests (content=2 — what Flink upsert
      sinks and this engine's upsert_iceberg_table commit) → the
      parent-state rows matching the delete keys under the v2 sequence
      rule, emitted as 'delete'; an upsert snapshot therefore reads as
      delete(old image) + insert(new image), the exact feed a
      downstream MERGE applies;
    - an interval that REMOVES a manifest (rewrite/compaction) raises —
      distinguishing a rewrite from a logical change needs the writer's
      private lineage, and guessing silently would corrupt a downstream
      MERGE. The caller falls back to a full re-sync.

    Rows also carry `_change_ordinal`: the commit's 0-based position
    within the interval (parent-chain order), so a consumer applies
    multi-commit windows in commit order."""
    md = json.loads(fsio.read_text(resolve_metadata_path(location)))
    by_id = {s["snapshot-id"]: s for s in md.get("snapshots", [])}
    # from=0 is the virtual before-first snapshot: the FULL changelog
    # replay (every snapshot's manifests diff against an empty base)
    if from_snapshot_id != 0 and from_snapshot_id not in by_id:
        raise ValueError(f"snapshot {from_snapshot_id} not found at {location}")
    if to_snapshot_id is None:
        to_snapshot_id = md.get("current-snapshot-id")
    if to_snapshot_id not in by_id:
        raise ValueError(f"snapshot {to_snapshot_id} not found at {location}")
    schemas = {s["schema-id"]: s for s in md.get("schemas", [])}
    target = schemas[by_id[to_snapshot_id].get("schema-id", md["current-schema-id"])]
    out_schema = T.StructType(
        _struct(target).fields
        + [
            T.StructField("_change_type", T.StringType(), False),
            T.StructField("_commit_snapshot_id", T.LongType(), False),
            T.StructField("_change_ordinal", T.IntegerType(), False),
        ]
    )
    # Commit order comes from the PARENT POINTERS, never from sorting
    # snapshot ids: real writers (Flink, Spark+Iceberg) draw random
    # int64 ids, so id order has no relation to commit order. Walk
    # to_snapshot_id → parents until from_snapshot_id (or the root for
    # the virtual 0); a from that is not an ancestor means the
    # checkpoint diverged from this lineage — fail loudly.
    chain: list[dict] = []
    cur_id = to_snapshot_id
    seen: set[int] = set()
    while cur_id is not None and cur_id in by_id and cur_id not in seen:
        if cur_id == from_snapshot_id:
            break
        seen.add(cur_id)
        chain.append(by_id[cur_id])
        cur_id = by_id[cur_id].get("parent-snapshot-id")
        if cur_id is not None:
            cur_id = int(cur_id)
    else:
        if from_snapshot_id != 0:
            raise ValueError(
                f"snapshot {from_snapshot_id} is not an ancestor of "
                f"{to_snapshot_id} at {location} — lineage diverged; "
                "full re-sync required"
            )
    interval = list(reversed(chain))
    if not interval:
        return spark.createDataFrame([], out_schema)

    def _mans(snap) -> dict[str, dict]:
        _s, _m, recs = avro_io.read_container(snap["manifest-list"])
        return {r["manifest_path"]: r for r in recs}

    def _aligned(fschema: dict, files: list[str], with_pos: bool) -> DataFrame:
        df = spark.read.schema(_struct(fschema)).parquet(*files)
        cols = _align_cols(fschema, target)
        extra = (
            [
                F.regexp_replace(
                    F.col("_metadata.file_path"), "^file:(//)?", ""
                ).alias("__file"),
                F.col("_metadata.row_index").alias("__pos"),
            ]
            if with_pos
            else []
        )
        return df.select(*cols, *extra)

    def _manifest_schema(m2: dict) -> dict:
        emb = m2.get("schema")
        if emb is None:
            return target
        return json.loads(emb.decode() if isinstance(emb, bytes) else emb)

    # data files present at any point, by path → their schema generation
    # (for re-reading rows a later positional delete tombstones). Keys
    # are URI-NORMALIZED ('file:'-stripped) because the lookups below
    # come from the tombstones' normalized __file column — a foreign
    # writer recording file: URIs in its manifests must still resolve.
    def _norm(p: str) -> str:
        return re.sub(r"^file:(//)?", "", p)

    file_schema: dict[str, dict] = {}
    prev = _mans(by_id[from_snapshot_id]) if from_snapshot_id != 0 else {}
    for p, rec in prev.items():
        if rec.get("content") == 0:
            _s2, m2, entries = avro_io.read_container(p)
            fs = _manifest_schema(m2)
            for e in entries:
                if e.get("status") != 2 and e["data_file"].get("content", 0) == 0:
                    file_schema[_norm(e["data_file"]["file_path"])] = fs

    parts: list[DataFrame] = []
    for ordinal, snap in enumerate(interval):
        sid = snap["snapshot-id"]
        cur = _mans(snap)
        removed = [p for p in prev if p not in cur]
        if removed:
            raise ValueError(
                f"changelog crosses replacing snapshot {sid}: manifests "
                "removed — data was rewritten; full re-sync required"
            )
        # TWO passes over the snapshot's new manifests: all DATA
        # manifests register their files first, THEN delete manifests
        # resolve against them — the manifest LIST carries no ordering
        # guarantee, and a same-snapshot (data + positional-delete)
        # commit may list the delete manifest first
        new_mans = sorted(
            ((p, rec) for p, rec in cur.items() if p not in prev),
            key=lambda pr: pr[1].get("content") or 0,
        )
        for p, rec in new_mans:
            _s2, m2, entries = avro_io.read_container(p)
            live = [e for e in entries if e.get("status") != 2]
            fs = _manifest_schema(m2)
            if rec.get("content") == 0:
                files = []
                for e in live:
                    files.append(e["data_file"]["file_path"])
                    file_schema[_norm(e["data_file"]["file_path"])] = fs
                if files:
                    parts.append(
                        _aligned(fs, files, with_pos=False).select(
                            "*",
                            F.lit("insert").alias("_change_type"),
                            F.lit(sid).cast("long").alias("_commit_snapshot_id"),
                            F.lit(ordinal).cast("int").alias("_change_ordinal"),
                        )
                    )
            else:
                eq = [e for e in live if e["data_file"].get("content") == 2]
                if eq:
                    # equality deletes: the retired rows are the PARENT
                    # state's rows matching the delete keys under the v2
                    # sequence rule — all derivable from open metadata
                    # (parent read applies every older delete, so a row
                    # an earlier commit already killed never re-emits;
                    # same-snapshot data files are absent from the
                    # parent by construction). O(parent live data) per
                    # eq-delete commit, like the engine's own changelog.
                    parent_id = snap.get("parent-snapshot-id")
                    if parent_id is None:
                        prev = cur
                        continue  # eq delete on an empty table: no rows die
                    alive = read_iceberg_table(
                        spark,
                        location,
                        snapshot_id=int(parent_id),
                        _keep_lineage=True,
                        _keep_seq=True,
                    )
                    hits: DataFrame | None = None
                    for e in eq:
                        ids = e["data_file"].get("equality_ids")
                        if not ids:
                            raise ValueError(
                                f"equality-delete file without equality_ids "
                                f"in snapshot {sid}"
                            )
                        rec = {
                            "path": e["data_file"]["file_path"],
                            "ids": list(ids),
                            "seq": _entry_seq(e, cur[p]),
                            "schema": fs,
                        }
                        h = _eq_delete_hits(spark, alive, rec, target)
                        hits = h if hits is None else hits.unionByName(h)
                    if hits is not None:
                        dead = hits.dropDuplicates(["__file", "__pos"]).drop(
                            "__file", "__pos", "__seq"
                        )
                        parts.append(
                            dead.select(
                                "*",
                                F.lit("delete").alias("_change_type"),
                                F.lit(sid).cast("long").alias("_commit_snapshot_id"),
                                F.lit(ordinal).cast("int").alias("_change_ordinal"),
                            )
                        )
                    # positional entries may ride the same manifest
                    live = [e for e in live if e["data_file"].get("content") != 2]
                dv_entries = [e for e in live if _is_dv_entry(e["data_file"])]
                del_files = [
                    e["data_file"]["file_path"]
                    for e in live
                    if not _is_dv_entry(e["data_file"])
                ]
                if not del_files and not dv_entries:
                    continue
                tombs = None
                if del_files:
                    tombs = spark.read.parquet(*del_files).select(
                        F.regexp_replace(
                            F.col("file_path"), "^file:(//)?", ""
                        ).alias("__file"),
                        F.col("pos").alias("__pos"),
                    )
                if dv_entries:
                    dvt = _dv_tombstones(
                        spark,
                        [
                            {
                                "puffin": e["data_file"]["file_path"],
                                "offset": int(e["data_file"]["content_offset"]),
                                "length": int(e["data_file"]["content_size_in_bytes"]),
                                "referenced": _norm(
                                    e["data_file"]["referenced_data_file"]
                                ),
                            }
                            for e in dv_entries
                        ],
                    )
                    tombs = dvt if tombs is None else tombs.unionByName(dvt)
                tombs = tombs.dropDuplicates(["__file", "__pos"])
                # the tombstoned data files, re-read under their own
                # schema generation; semi-join keeps only deleted rows
                targets = sorted(
                    {
                        r["__file"]
                        for r in tombs.select("__file").distinct().collect()
                    }
                )
                by_gen: dict[str, tuple[dict, list[str]]] = {}
                for fpath in targets:
                    fs2 = file_schema.get(fpath)
                    if fs2 is None:
                        raise ValueError(
                            f"delete file in snapshot {sid} targets unknown "
                            f"data file {fpath}"
                        )
                    key = json.dumps(fs2, sort_keys=True)
                    by_gen.setdefault(key, (fs2, []))[1].append(fpath)
                for fs2, fpaths in by_gen.values():
                    deleted = (
                        _aligned(fs2, fpaths, with_pos=True)
                        .join(F.broadcast(tombs), ["__file", "__pos"], "left_semi")
                        .drop("__file", "__pos")
                    )
                    parts.append(
                        deleted.select(
                            "*",
                            F.lit("delete").alias("_change_type"),
                            F.lit(sid).cast("long").alias("_commit_snapshot_id"),
                            F.lit(ordinal).cast("int").alias("_change_ordinal"),
                        )
                    )
        prev = cur
    if not parts:
        return spark.createDataFrame([], out_schema)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _eq_delete_keys_cond(spark, out: DataFrame, rec: dict, target: dict):
    """(broadcastable keys frame, join condition) of one equality-delete
    file against lineage-bearing rows ``out`` — the shared core of the
    anti-join (read path) and semi-join (changelog) applications."""
    by_id_src = {f["id"]: f for f in rec["schema"]["fields"]}
    by_id_tgt = {f["id"]: f for f in target["fields"]}
    pairs = []
    for fid in rec["ids"]:
        src = by_id_src.get(fid)
        tgt = by_id_tgt.get(fid)
        if src is None or tgt is None:
            raise ValueError(
                f"equality-delete field id {fid} not resolvable "
                f"(in delete schema: {src is not None}, in target: {tgt is not None})"
            )
        pairs.append((src["name"], tgt))
    keys = (
        spark.read.parquet(rec["path"])
        .select(
            *[
                F.col(sname).cast(_spark_type(tgt["type"])).alias(f"__eq_{tgt['name']}")
                for sname, tgt in pairs
            ]
        )
        .dropDuplicates([f"__eq_{tgt['name']}" for _, tgt in pairs])
    )
    cond = out["__seq"] < F.lit(int(rec["seq"]))
    for _, tgt in pairs:
        cond = cond & out[tgt["name"]].eqNullSafe(F.col(f"__eq_{tgt['name']}"))
    return keys, cond


def _eq_delete_hits(
    spark: SparkSession, out: DataFrame, rec: dict, target: dict
) -> DataFrame:
    """Rows of ``out`` one equality-delete file RETIRES (semi-join form,
    for the changelog's 'delete' emission)."""
    keys, cond = _eq_delete_keys_cond(spark, out, rec, target)
    return out.join(F.broadcast(keys), cond, "left_semi")


def _apply_eq_delete(
    spark: SparkSession, out: DataFrame, rec: dict, target: dict
) -> DataFrame:
    """Anti-join the live rows against one equality-delete file.

    Key columns are identified by FIELD ID (`equality_ids`): resolved to
    their name in the delete file's own schema generation (the column
    name physically in the delete parquet) and independently to their
    name in the target schema (the column name in the aligned data rows
    — a rename between the two is legal). Comparison is null-safe and
    gated on the v2 sequence rule `data_seq < delete_seq`, so a key
    re-inserted after the delete is NOT tombstoned. Mirrors
    warehouse.Table._apply_eq_deletes / _eq_match_cond for the engine's
    own tables; delete side broadcast (metadata-sized)."""
    keys, cond = _eq_delete_keys_cond(spark, out, rec, target)
    return out.join(F.broadcast(keys), cond, "left_anti")


# ---------------- metadata tables from the open metadata ----------------
# The same .snapshots/.history/.files surface the engine's own tables
# expose (warehouse.py:2357-2432), derived for FOREIGN tables purely from
# the Iceberg metadata document + manifest Avros — column-compatible, so
# SQL written against a native table's metadata views runs unchanged
# after a register_table attach. Driver-side and O(manifests), like all
# Iceberg metadata planning.


def _ts(ms: int):
    import datetime

    return datetime.datetime.fromtimestamp(
        ms / 1000, tz=datetime.timezone.utc
    ).replace(tzinfo=None)


def read_iceberg_snapshots(spark: SparkSession, location: str) -> DataFrame:
    """`.snapshots` over open metadata: one row per snapshot in the
    metadata document (committed_at, ids, operation from the summary,
    manifest-list path, stringified summary)."""
    md = json.loads(fsio.read_text(resolve_metadata_path(location)))
    schema = (
        "committed_at timestamp, snapshot_id bigint, parent_id bigint, "
        "operation string, manifest_list string, summary map<string,string>, "
        "first_row_id bigint"
    )
    rows = [
        (
            _ts(s["timestamp-ms"]),
            int(s["snapshot-id"]),
            (int(s["parent-snapshot-id"]) if s.get("parent-snapshot-id") is not None else None),
            (s.get("summary") or {}).get("operation"),
            s.get("manifest-list"),
            {k: str(v) for k, v in (s.get("summary") or {}).items() if k != "operation"},
            # Iceberg v3 row lineage, round-tripped from the exported
            # metadata document (absent on v2 writers' tables)
            (int(s["first-row-id"]) if s.get("first-row-id") is not None else None),
        )
        for s in md.get("snapshots", [])
    ]
    return spark.createDataFrame(rows, schema)


def read_iceberg_statistics(spark: SparkSession, location: str) -> DataFrame:
    """`.statistics` over open metadata: decode the table's Puffin
    statistics files (the Iceberg `statistics` list ANALYZE publishes) —
    one row per `apache-datasketches-theta-v1` blob with the column it
    covers (field id resolved through the current schema), the sketch's
    own NDV estimate (decoded from the compact theta bytes by the
    pure-stdlib reader — proof the blob is really a DataSketches
    sketch, not a number hiding in properties), the writer-stamped
    `ndv` property, and the snapshot analyzed. Blob payloads are
    O(k)-sized; this is driver-side metadata work like every other
    metadata table."""
    from minio_iceberg_polaris_lakehouse_spark import puffin as PUF
    from minio_iceberg_polaris_lakehouse_spark import theta as TH

    md = json.loads(fsio.read_text(resolve_metadata_path(location)))
    schemas = {s["schema-id"]: s for s in md.get("schemas", [])}
    cur_schema = schemas.get(md.get("current-schema-id"), {"fields": []})
    by_id = {int(f["id"]): f["name"] for f in cur_schema.get("fields", [])}
    rows = []
    for entry in md.get("statistics", []):
        buf = fsio.read_bytes(entry["statistics-path"])
        footer = PUF.read_puffin_footer(buf)
        for bm in footer["blobs"]:
            if bm.get("type") != "apache-datasketches-theta-v1":
                continue
            payload = PUF.read_puffin_blob(buf, bm)
            est = TH.sketch_estimate(payload)
            fid = (bm.get("fields") or [None])[0]
            rows.append(
                (
                    by_id.get(int(fid)) if fid is not None else None,
                    int(round(est)),
                    (
                        int(bm.get("properties", {}).get("ndv"))
                        if bm.get("properties", {}).get("ndv") is not None
                        else None
                    ),
                    int(bm.get("snapshot-id", entry["snapshot-id"])),
                    entry["statistics-path"],
                )
            )
    return spark.createDataFrame(
        rows,
        "column string, ndv bigint, ndv_property bigint, "
        "snapshot_id bigint, statistics_path string",
    )


def read_iceberg_partitions(spark: SparkSession, location: str) -> DataFrame:
    """`.partitions` over open metadata: the spec's PARTITION STATISTICS
    file (written by compute_partition_stats, referenced from the
    metadata document's `partition-statistics` list), read back as a
    DataFrame with the partition struct flattened to its path-encoded
    string form — column-compatible with the native `.partitions`
    metadata view plus the delete/byte/last-updated columns the stats
    file carries. Raises if the table has never published partition
    statistics (guessing from manifests here would silently diverge
    from what a real stats-file consumer sees)."""
    md = json.loads(fsio.read_text(resolve_metadata_path(location)))
    entries = md.get("partition-statistics", [])
    cur = md.get("current-snapshot-id")
    entry = next((e for e in entries if e["snapshot-id"] == cur), None) or (
        entries[-1] if entries else None
    )
    if entry is None:
        raise ValueError(
            f"{location} has no partition-statistics files — run "
            "CALL system.compute_partition_stats on the owning engine"
        )
    df = spark.read.parquet(entry["statistics-path"])
    part_fields = [f.name for f in df.schema["partition"].dataType.fields]
    part_str = F.concat_ws(
        "/",
        *[
            F.when(
                F.col(f"partition.{n}").isNotNull(),
                F.concat(F.lit(f"_p_{n}="), F.col(f"partition.{n}")),
            )
            for n in part_fields
        ],
    )
    return df.select(
        F.when(part_str == "", None).otherwise(part_str).alias("partition"),
        F.col("data_record_count").alias("record_count"),
        F.col("data_file_count").alias("file_count"),
        "spec_id",
        "total_data_file_size_in_bytes",
        "position_delete_record_count",
        "position_delete_file_count",
        "equality_delete_record_count",
        "equality_delete_file_count",
        "last_updated_at",
        "last_updated_snapshot_id",
    ).orderBy("partition")


def read_iceberg_history(spark: SparkSession, location: str) -> DataFrame:
    """`.history` over open metadata: the snapshot-log (when each
    snapshot became current), flagged with main-lineage ancestry walked
    from current-snapshot-id via parent pointers."""
    md = json.loads(fsio.read_text(resolve_metadata_path(location)))
    parents = {
        int(s["snapshot-id"]): (
            int(s["parent-snapshot-id"]) if s.get("parent-snapshot-id") is not None else None
        )
        for s in md.get("snapshots", [])
    }
    ancestors: set[int] = set()
    cur = md.get("current-snapshot-id")
    while cur is not None and cur not in ancestors:
        ancestors.add(int(cur))
        cur = parents.get(int(cur))
    log = md.get("snapshot-log") or [
        # a metadata doc without a snapshot-log (minimal writers) still
        # has commit times on the snapshots themselves
        {"timestamp-ms": s["timestamp-ms"], "snapshot-id": s["snapshot-id"]}
        for s in md.get("snapshots", [])
    ]
    schema = (
        "made_current_at timestamp, snapshot_id bigint, parent_id bigint, "
        "is_current_ancestor boolean"
    )
    rows = [
        (
            _ts(e["timestamp-ms"]),
            int(e["snapshot-id"]),
            parents.get(int(e["snapshot-id"])),
            int(e["snapshot-id"]) in ancestors,
        )
        for e in log
    ]
    return spark.createDataFrame(rows, schema)


def read_iceberg_files(spark: SparkSession, location: str) -> DataFrame:
    """`.files` over open metadata: one row per live file entry of the
    current snapshot's manifests — data files (content 0) and delete
    files (content 1 positional / 2 equality), with the manifest-recorded
    counts and sizes. No data file is opened."""
    md = json.loads(fsio.read_text(resolve_metadata_path(location)))
    cur = md.get("current-snapshot-id")
    snap = next((s for s in md.get("snapshots", []) if s["snapshot-id"] == cur), None)
    schema = (
        "content int, file_path string, file_format string, spec_id int, "
        "record_count bigint, file_size_in_bytes bigint"
    )
    if snap is None:
        return spark.createDataFrame([], schema)
    rows = []
    _s, _m, manifests = avro_io.read_container(snap["manifest-list"])
    for m in manifests:
        _s2, _m2, entries = avro_io.read_container(m["manifest_path"])
        for e in entries:
            if e.get("status") == 2:  # DELETED entry — not live
                continue
            df_ = e["data_file"]
            rows.append(
                (
                    int(df_.get("content") or 0),
                    df_["file_path"],
                    (df_.get("file_format") or "PARQUET"),
                    int(m.get("partition_spec_id") or 0),
                    int(df_.get("record_count") or 0),
                    int(df_.get("file_size_in_bytes") or 0),
                )
            )
    return spark.createDataFrame(rows, schema)


def read_iceberg_refs(spark: SparkSession, location: str) -> DataFrame:
    """`.refs` over open metadata: the metadata document's branch/tag
    map (column-compatible with the native refs view)."""
    md = json.loads(fsio.read_text(resolve_metadata_path(location)))
    schema = "name string, type string, snapshot_id bigint"
    rows = [
        (name, str(rec.get("type", "branch")).upper(), int(rec["snapshot-id"]))
        for name, rec in sorted((md.get("refs") or {}).items())
    ]
    return spark.createDataFrame(rows, schema)


def read_iceberg_schema(location: str) -> T.StructType:
    """Current schema from the metadata document alone — O(1) metadata
    cost, no manifest walk (for DESCRIBE-style callers that only need
    column names/types, not a scan plan)."""
    md = json.loads(fsio.read_text(resolve_metadata_path(location)))
    schemas = {s["schema-id"]: s for s in md.get("schemas", [])}
    return _struct(schemas[md["current-schema-id"]])
