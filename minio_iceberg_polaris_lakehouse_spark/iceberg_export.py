"""Iceberg v2 format-compatible metadata export.

The reference's whole point is an OPEN table format: any engine can read
the table by walking `vN.metadata.json` → manifest list → manifests →
data files (reference README.md:169-178 shows the metadata tree;
getting_started.ipynb:137-152 the real paths). The engine's internal
snapshot log (`_meta.json`/`_snapshots.json`) is private, so alongside it
every commit also writes metadata following the PUBLIC Apache Iceberg
table-spec (https://iceberg.apache.org/spec/ — field names, layout and
the filesystem-table `version-hint.text` convention):

    <table>/metadata/v<N>.metadata.json      table metadata (spec §Table Metadata)
    <table>/metadata/snap-<id>.manifest-list.json
    <table>/metadata/version-hint.text       latest metadata version

so an independent reader can resolve the current schema (with stable
field ids), partition specs, the snapshot chain, and the exact data-file
list with record counts/sizes — without this engine's code.

Both metadata levels are written in the REAL binary layout: manifest
lists and manifests are Avro object-container files (deflate codec,
field-id annotated schemas) produced by the engine's pure-stdlib Avro
writer (avro_io.py, byte-validated in tests against the independent Java
Avro implementation on Spark's classpath). A spec-shaped JSON rendering
of each manifest list (`snap-<id>.manifest-list.json`, both levels
inlined) is kept alongside as a human-debuggable sibling; the metadata
document's `manifest-list` field points at the Avro file, as the spec
requires (reference README.md:169-175 shows `snap-….avro`).

Cost model: export is driver-side JSON/Avro of O(files) entries built
from footer stats CACHED at write time (per-dir .stats.json sidecars) — no
data reads, no Spark job, same order of work as Iceberg's own commit
path. Per-dir manifest Avro files are immutable and written once.
"""

from __future__ import annotations

import datetime
import hashlib
import json
import os
import struct
import urllib.parse
import uuid

from pyspark.sql import functions as F
from pyspark.sql import types as T

from minio_iceberg_polaris_lakehouse_spark import avro_io, fsio
from minio_iceberg_polaris_lakehouse_spark.warehouse import (
    DIR_STATS_FILE,
    Table,
    _atomic_write_json,
    _load_dir_stats,
    _parquet_footer_stats,
)

_PRIMITIVES: dict[str, str] = {
    "integer": "int",
    "long": "long",
    "short": "int",
    "byte": "int",
    "string": "string",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamptz",  # Spark TimestampType is tz-adjusted
    "timestamp_ntz": "timestamp",
    "binary": "binary",
}


def _iceberg_type(dt: T.DataType, next_id: list[int]):
    """Spark type → Iceberg spec type (JSON form). Nested types allocate
    element/field ids from the shared counter, per the spec."""
    name = dt.typeName()
    if name in _PRIMITIVES:
        return _PRIMITIVES[name]
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    if isinstance(dt, T.ArrayType):
        next_id[0] += 1
        eid = next_id[0]
        return {
            "type": "list",
            "element-id": eid,
            "element": _iceberg_type(dt.elementType, next_id),
            "element-required": not dt.containsNull,
        }
    if isinstance(dt, T.MapType):
        next_id[0] += 2
        kid, vid = next_id[0] - 1, next_id[0]
        return {
            "type": "map",
            "key-id": kid,
            "key": _iceberg_type(dt.keyType, next_id),
            "value-id": vid,
            "value": _iceberg_type(dt.valueType, next_id),
            "value-required": not dt.valueContainsNull,
        }
    if isinstance(dt, T.StructType):
        fields = []
        for f in dt.fields:
            next_id[0] += 1
            fields.append(
                {
                    "id": next_id[0],
                    "name": f.name,
                    "required": not f.nullable,
                    "type": _iceberg_type(f.dataType, next_id),
                }
            )
        return {"type": "struct", "fields": fields}
    raise ValueError(f"no Iceberg mapping for Spark type {dt.simpleString()}")


def _transform_name(transform: str) -> str:
    """Engine transform string → Iceberg spec transform name
    (bucket<N> → bucket[N], truncate<N> → truncate[N])."""
    if transform in ("identity", "day", "month", "year", "hour"):
        return transform
    for prefix in ("bucket", "truncate"):
        if transform.startswith(prefix) and transform[len(prefix) :].isdigit():
            return f"{prefix}[{int(transform[len(prefix):])}]"
    return transform


def _default_json(lit: str, dtype: T.DataType):
    """A column's DEFAULT SQL literal as the Iceberg v3 JSON
    single-value form: numbers as numbers, strings unquoted, booleans as
    booleans, decimals as their exact string form (JSON floats would
    drop scale), date/timestamp literals as their ISO strings."""
    s = lit.strip()
    if len(s) >= 2 and s[0] == s[-1] and s[0] in "'\"":
        s = s[1:-1]
    if isinstance(dtype, T.BooleanType):
        return s.lower() == "true"
    if isinstance(dtype, T.DecimalType):
        return s
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return float(s)
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return int(s)
    return s


def _schema_json(meta: dict, schema_id: int, schema: T.StructType) -> dict:
    ids = meta.get("column_ids", {})
    defaults = meta.get("column_defaults", {})
    write_defaults = meta.get("column_write_defaults", {})
    last = int(meta.get("last_column_id", len(schema.fields)))
    counter = [last]
    fields = []
    for i, f in enumerate(schema.fields):
        rec = {
            "id": int(ids.get(f.name, i + 1)),
            "name": f.name,
            "required": not f.nullable,
            "type": _iceberg_type(f.dataType, counter),
        }
        if f.name in defaults:
            # Iceberg v3 default values: external readers backfill
            # pre-evolution files with initial-default and writers fill
            # omitted columns with write-default — the same contract the
            # engine honors internally (warehouse.Table.add_column)
            rec["initial-default"] = _default_json(defaults[f.name], f.dataType)
        wd = write_defaults[f.name] if f.name in write_defaults else defaults.get(f.name)
        if wd is not None:
            rec["write-default"] = _default_json(wd, f.dataType)
        fields.append(rec)
    out = {"type": "struct", "schema-id": schema_id, "fields": fields}
    ident = meta.get("identifier_fields") or []
    if ident:
        # Iceberg schema identifier-field-ids: the declared row-identity
        # key (what upsert()/CDC writers key equality deletes on)
        out["identifier-field-ids"] = [
            int(ids.get(c, schema.fieldNames().index(c) + 1)) for c in ident
        ]
    return out


def _partition_specs(meta: dict, ids: dict) -> list[dict]:
    specs = []
    history = meta.get("spec_history") or [meta["partition"]]
    for spec_id, spec in enumerate(history):
        fields = []
        if spec.get("source") is not None:
            transform = _transform_name(spec.get("transform", "identity"))
            fields.append(
                {
                    "name": f"_p_{spec.get('transform', 'identity')}_{spec['source']}",
                    "transform": transform,
                    "source-id": int(ids.get(spec["source"], 0)),
                    "field-id": 1000 + spec_id,
                }
            )
        specs.append({"spec-id": spec_id, "fields": fields})
    return specs


# ---------------------------------------------------------------------------
# Avro manifest / manifest-list layer (Iceberg spec §Manifests, §Manifest
# Lists — schemas carry the spec's field-ids so id-based schema resolution
# works in real readers)
# ---------------------------------------------------------------------------
_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        {
            # spec field 507: per-partition-field value summaries — what
            # lets a reader skip a WHOLE manifest (and its avro open)
            # when the predicate provably excludes its value range
            "name": "partitions",
            "type": [
                "null",
                {
                    "type": "array",
                    "element-id": 508,
                    "items": {
                        "type": "record",
                        "name": "r508",
                        "fields": [
                            {
                                "name": "contains_null",
                                "type": "boolean",
                                "field-id": 509,
                            },
                            {
                                "name": "contains_nan",
                                "type": ["null", "boolean"],
                                "default": None,
                                "field-id": 518,
                            },
                            {
                                "name": "lower_bound",
                                "type": ["null", "bytes"],
                                "default": None,
                                "field-id": 510,
                            },
                            {
                                "name": "upper_bound",
                                "type": ["null", "bytes"],
                                "default": None,
                                "field-id": 511,
                            },
                        ],
                    },
                },
            ],
            "default": None,
            "field-id": 507,
        },
    ],
}

# identity-transform partition values: Spark type name -> Avro schema
_AVRO_IDENTITY = {
    "integer": "int",
    "long": "long",
    "short": "int",
    "byte": "int",
    "string": "string",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "date": {"type": "int", "logicalType": "date"},
}
def _avro_transform_type(transform: str, meta: dict, source: str) -> object:
    """Avro type of a derived partition value. truncate keeps the source's
    type (string fallback when the source was dropped — values parse from
    the hive path anyway)."""
    if transform == "day":
        return {"type": "int", "logicalType": "date"}
    if transform in ("month", "hour"):
        # spec partition-space values: months / hours from epoch as int
        # (the engine's hive paths encode yyyy-MM / yyyy-MM-dd-HH;
        # _partition_value converts by field-name prefix)
        return "int"
    if transform == "year" or transform.startswith("bucket"):
        return "int"
    if transform.startswith("truncate"):
        schema = T.StructType.fromJson(json.loads(meta["schema"]))
        if source in schema.fieldNames():
            return _AVRO_IDENTITY.get(schema[source].dataType.typeName(), "string")
    return "string"


def _bound_bytes(v, avro_type) -> bytes | None:
    """Iceberg single-value serialization of a partition value for the
    manifest-list field summary's lower/upper bound."""
    if v is None:
        return None
    t = avro_type.get("type") if isinstance(avro_type, dict) else avro_type
    try:
        if t == "int":
            return struct.pack("<i", int(v))
        if t == "long":
            return struct.pack("<q", int(v))
        if t == "float":
            return struct.pack("<f", float(v))
        if t == "double":
            return struct.pack("<d", float(v))
        if t == "boolean":
            return b"\x01" if v else b"\x00"
        if t == "string":
            return str(v).encode("utf-8")
    except (ValueError, struct.error):
        return None
    return None


def _is_utcish_tz(tz) -> bool:
    """True when a dir's recorded write-session zone is UTC (or unset —
    zone-free transforms / legacy dirs). Alias list shared with the
    scan-side and reader-side guards (tzones.py)."""
    from minio_iceberg_polaris_lakehouse_spark.tzones import is_utcish

    return tz is None or is_utcish(tz)


def _partition_summary(files: list[dict], part_field, tz=None) -> list[dict] | None:
    """The manifest-list `partitions` field-summary list for one
    manifest's files (this engine's one-partition-field specs)."""
    if part_field is None:
        return None
    name, avro_type = part_field[0], part_field[1]
    vals = [_partition_value(f["path"], name, avro_type, tz=tz) for f in files]
    present = [v for v in vals if v is not None]
    try:
        lo, hi = (min(present), max(present)) if present else (None, None)
    except TypeError:
        lo = hi = None
    return [
        {
            "contains_null": any(v is None for v in vals),
            "contains_nan": None,
            "lower_bound": _bound_bytes(lo, avro_type),
            "upper_bound": _bound_bytes(hi, avro_type),
        }
    ]


def _partition_avro_field(meta: dict, spec: dict) -> tuple[str, object] | None:
    """(field_name, avro_type) for a dir's partition column, or None for
    unpartitioned specs. Sources dropped from the current schema fall back
    to string (values parse from the hive path anyway)."""
    source = spec.get("source")
    if source is None:
        return None
    transform = spec.get("transform", "identity")
    name = f"_p_{transform}_{source}"
    if transform != "identity":
        return name, _avro_transform_type(transform, meta, source)
    schema = T.StructType.fromJson(json.loads(meta["schema"]))
    if source in schema.fieldNames():
        return name, _AVRO_IDENTITY.get(schema[source].dataType.typeName(), "string")
    return name, "string"


def _partition_value(rel_path: str, field_name: str, avro_type, tz=None) -> object:
    """Decode the hive-style partition value embedded in a data file's
    relative path (``_p_day_ts=2024-11-25/part-….parquet``) to the typed
    Avro datum. Unparseable / __HIVE_DEFAULT_PARTITION__ → None.

    ``tz`` is the dir's recorded write-session zone (warehouse spec_rec
    'tz'): the spec defines temporal transforms over UTC micros, but the
    engine's hive dirs extract calendar fields in the write session's
    zone. A non-UTC temporal dir genuinely straddles two UTC
    day/hour/month buckets, so NO single spec value is correct for its
    files — export NULL (spec 'unknown': consumers keep the file and
    filter rows) instead of a shifted value a compliant reader would
    prune wrongly on (row loss in ANY spec-following engine)."""
    if not _is_utcish_tz(tz) and any(
        field_name.startswith(p) for p in ("_p_day_", "_p_month_", "_p_year_", "_p_hour_")
    ):
        return None
    for part in rel_path.split(os.sep)[:-1]:
        if "=" not in part:
            continue
        k, _, raw = part.partition("=")
        if k != field_name:
            continue
        val = urllib.parse.unquote(raw)
        if val == "__HIVE_DEFAULT_PARTITION__":
            return None
        try:
            if isinstance(avro_type, dict) and avro_type.get("logicalType") == "date":
                return (datetime.date.fromisoformat(val) - datetime.date(1970, 1, 1)).days
            # spec partition-space conversions for the engine's
            # string-encoded hive paths (field name carries the transform)
            if field_name.startswith("_p_month_"):
                y, m = val.split("-", 1)
                return (int(y) - 1970) * 12 + int(m) - 1
            if field_name.startswith("_p_hour_"):
                y, m, d, h = val.split("-")
                ts = datetime.datetime(int(y), int(m), int(d), int(h), tzinfo=datetime.timezone.utc)
                return int(ts.timestamp()) // 3600
            if avro_type == "int" or avro_type == "long":
                return int(val)
            if avro_type == "double" or avro_type == "float":
                return float(val)
            if avro_type == "boolean":
                return val.lower() == "true"
            return val
        except ValueError:
            return None
    return None


def _manifest_entry_schema(partition_field) -> dict:
    """Entry schema with the partition record's fields. Accepts the
    engine's single ``(name, avro_type)`` tuple (field-id 1000, its own
    spec convention) or a list of ``(name, avro_type, field_id)`` for
    foreign specs with several fields / explicit ids."""
    part_fields = []
    if partition_field is not None:
        triples = (
            partition_field
            if isinstance(partition_field, list)
            else [(partition_field[0], partition_field[1], 1000)]
        )
        for name, avro_type, fid in triples:
            part_fields.append(
                {"name": name, "type": ["null", avro_type], "default": None, "field-id": fid}
            )
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "default": None, "field-id": 1},
            {
                "name": "sequence_number",
                "type": ["null", "long"],
                "default": None,
                "field-id": 3,
            },
            {
                "name": "file_sequence_number",
                "type": ["null", "long"],
                "default": None,
                "field-id": 4,
            },
            {
                "name": "data_file",
                "field-id": 2,
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": "int", "field-id": 134},
                        {"name": "file_path", "type": "string", "field-id": 100},
                        {"name": "file_format", "type": "string", "field-id": 101},
                        {
                            "name": "partition",
                            "field-id": 102,
                            "type": {"type": "record", "name": "r102", "fields": part_fields},
                        },
                        {"name": "record_count", "type": "long", "field-id": 103},
                        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                        {
                            # Iceberg v2 equality_ids (field-id 135): the
                            # schema field ids an EQUALITY_DELETES file
                            # (content=2) keys on; null for data and
                            # positional-delete files. Absent from a
                            # record dict → encodes the null branch, so
                            # every existing write site is unaffected.
                            "name": "equality_ids",
                            "type": [
                                "null",
                                {"type": "array", "items": "int", "element-id": 136},
                            ],
                            "default": None,
                            "field-id": 135,
                        },
                        {
                            # Iceberg v3 deletion vectors (spec
                            # §Deletion Vectors): a content=1 entry whose
                            # file_path is a PUFFIN file carries the data
                            # file its DV tombstones (field-id 143) and
                            # the blob's byte range within the Puffin
                            # container (144/145). Null for parquet
                            # positional-delete files and data files —
                            # absent keys encode the null branch, so v2
                            # write sites are unaffected.
                            "name": "referenced_data_file",
                            "type": ["null", "string"],
                            "default": None,
                            "field-id": 143,
                        },
                        {
                            "name": "content_offset",
                            "type": ["null", "long"],
                            "default": None,
                            "field-id": 144,
                        },
                        {
                            "name": "content_size_in_bytes",
                            "type": ["null", "long"],
                            "default": None,
                            "field-id": 145,
                        },
                        {
                            # Iceberg v3 row lineage (field-id 142): the
                            # first row id assigned to this data file —
                            # genuine v3 readers take lineage from HERE;
                            # the manifest-list JSON mirror is only this
                            # engine's debuggable copy. Null for delete
                            # files and pre-lineage commits.
                            "name": "first_row_id",
                            "type": ["null", "long"],
                            "default": None,
                            "field-id": 142,
                        },
                    ],
                },
            },
        ],
    }


def _write_manifest_avro(
    table: Table,
    meta: dict,
    dirname: str,
    files: list[dict],
    added_snapshot_id: int,
    seq: int,
    spec_rec: dict,
    content: int = 0,
) -> str:
    """One immutable Avro manifest per data directory (written once;
    manifests are content-addressed by dir, which is itself immutable).
    ``content`` is the Iceberg v2 file-content code: 0 = DATA,
    1 = POSITION_DELETES (merge-on-read tombstone files)."""
    mdir = os.path.join(table.path, "metadata")
    path = os.path.join(mdir, f"manifest-{dirname}.avro")
    if fsio.isfile(path):
        return path
    part_field = _partition_avro_field(meta, spec_rec)
    schema = _manifest_entry_schema(part_field)
    # v3 row lineage IN the Avro records (field-id 142): per data file,
    # the dir's commit-assigned base + its row-count offset in canonical
    # path order — identical to the JSON mirror's rule, so genuine v3
    # consumers (which never read the mirror) see the same ids
    first_ids: dict[str, int] = {}
    row_base = meta.get("dir_row_ids", {}).get(dirname) if content == 0 else None
    if row_base is not None:
        off = 0
        for f in sorted(files, key=lambda r: r["path"]):
            first_ids[f["path"]] = int(row_base) + off
            off += int(f.get("rows", 0))
    records = []
    for f in files:
        partition: dict[str, object] = {}
        if part_field is not None:
            partition[part_field[0]] = _partition_value(
                f["path"], part_field[0], part_field[1], tz=spec_rec.get("tz")
            )
        records.append(
            {
                "status": 1,  # ADDED (in its adding snapshot)
                "snapshot_id": added_snapshot_id,
                "sequence_number": seq,
                "file_sequence_number": seq,
                "data_file": {
                    "content": content,
                    "file_path": os.path.join(table.path, dirname, f["path"]),
                    "file_format": "PARQUET",
                    "partition": partition,
                    "record_count": f["rows"],
                    "file_size_in_bytes": f["bytes"],
                    **(
                        {"first_row_id": first_ids[f["path"]]}
                        if f["path"] in first_ids
                        else {}
                    ),
                },
            }
        )
    ids = meta.get("column_ids", {})
    iceberg_schema = _schema_json(meta, 0, T.StructType.fromJson(json.loads(meta["schema"])))
    specs = _partition_specs(meta, ids)
    sid = min(int(spec_rec.get("spec_id", 0)), len(specs) - 1)
    avro_io.write_container(
        path,
        schema,
        records,
        metadata={
            "schema": json.dumps(iceberg_schema),
            "partition-spec": json.dumps(specs[sid]["fields"]),
            "partition-spec-id": str(sid),
            "format-version": "2",
            "content": "data" if content == 0 else "deletes",
        },
    )
    return path


def _compile_eq_deletes(table: Table, meta: dict, snap: dict) -> str | None:
    """Compile a snapshot's live EQUALITY deletes into a POSITIONAL
    delete parquet dir (Iceberg v2 `(file_path, pos)` schema) so the
    export carries only content=0/1 manifests any v2 reader understands —
    without this, an external reader would see equality-deleted keys as
    live rows, breaking the open-format promise the reference is built on
    (reference README.md:169-178).

    Honors sequence numbers by construction: the semi-join keeps only
    rows whose data sequence PREDATES the delete's (`_seq < rec.seq`),
    so re-inserted keys are never tombstoned — the applicability rule is
    baked into the emitted positions, making the compiled file valid
    under any reader's sequence handling.

    Cost: one Spark job per DISTINCT (eq-delete set, affected dirs)
    fingerprint — the output dir is content-addressed and immutable, so
    the every-commit export path reuses it for free (appends after the
    delete change neither term: new dirs carry higher sequences). The
    job itself is the same broadcast semi-join shape as the engine's own
    eq-delete read path: O(data scanned once), delete keys broadcast."""
    eq_recs = snap.get("eq_deletes", [])
    if not eq_recs:
        return None
    seqs = table._dir_seqs()
    max_seq = max(int(r["seq"]) for r in eq_recs)
    affected = sorted(d for d in snap["manifest"] if int(seqs.get(d, 1)) < max_seq)
    if not affected:
        return None
    fp = hashlib.sha1(
        json.dumps(
            {
                "eq": sorted((r["dir"], int(r["seq"]), list(r["cols"])) for r in eq_recs),
                "dirs": affected,
            },
            sort_keys=True,
        ).encode()
    ).hexdigest()[:12]
    dirname = f"eqpos-{fp}"  # no data-/delete- prefix: GC never touches it
    out = os.path.join(table.path, dirname)
    if fsio.isfile(os.path.join(out, DIR_STATS_FILE)):
        return dirname
    schema = T.StructType.fromJson(json.loads(snap.get("schema") or meta["schema"]))
    df = table._read_dirs(snap["manifest"], schema, file_pos=True, seq_of=seqs)
    matched = None
    for rec in eq_recs:
        m = df.join(
            F.broadcast(table._eq_key_frame(rec)), table._eq_match_cond(df, rec), "left_semi"
        )
        matched = m if matched is None else matched.unionByName(m)
    hits = (
        matched
        # plain absolute path, byte-identical to the manifests' file_path
        # (Spark's _metadata.file_path is a file: URI)
        .select(
            F.regexp_replace(F.col("_file"), "^file:(//)?", "").alias("file_path"),
            F.col("_pos").alias("pos"),
        )
        .dropDuplicates(["file_path", "pos"])
        # the spec requires position-delete rows sorted by (file_path, pos)
        .orderBy("file_path", "pos")
        .coalesce(1)
    )
    # Crash-safe publish: build the dir (parquet + stats sidecar) at a
    # temp path, then rename into place. The sidecar's presence is the
    # completeness marker checked above, so a dir at the final path is
    # always whole; a half-written leftover from a crash between the
    # parquet write and the sidecar (which would make every later export
    # — and hence every commit — fail with 'path already exists') is
    # detected by its missing sidecar and replaced.
    tmp = os.path.join(table.path, f".{dirname}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}")
    hits.write.option("compression", "zstd").parquet(tmp)
    # deterministic file names: the dir's content is a pure function of
    # its fingerprint (hits are globally sorted and coalesced), so naming
    # the parts by index makes a rebuilt dir path-identical to the
    # original — already-exported immutable manifests that recorded the
    # old file path stay valid after a self-heal
    for i, f in enumerate(sorted(p for p in fsio.listdir(tmp) if p.endswith(".parquet"))):
        fsio.rename(os.path.join(tmp, f), os.path.join(tmp, f"eqpos-{i:05d}.parquet"))
    for f in fsio.listdir(tmp):  # Spark job markers don't belong in the artifact
        if f == "_SUCCESS" or f.endswith(".crc"):
            fsio.remove(os.path.join(tmp, f))
    _parquet_footer_stats(tmp)
    if fsio.isdir(out):
        if fsio.isfile(os.path.join(out, DIR_STATS_FILE)):
            # a concurrent exporter published the identical fingerprint
            fsio.rmtree(tmp, ignore_errors=True)
            return dirname
        fsio.rmtree(out)  # crashed leftover without sidecar
    try:
        fsio.rename(tmp, out)
    except OSError:
        # lost a publish race: keep the winner if complete, else re-raise
        if not fsio.isfile(os.path.join(out, DIR_STATS_FILE)):
            raise
        fsio.rmtree(tmp, ignore_errors=True)
    return dirname


def write_iceberg_metadata(table: Table) -> str:
    """Export the table's current state as Iceberg-v2-shaped metadata.
    Returns the metadata file path. Called after every commit; safe to
    call standalone. Equality deletes are compiled into positional
    delete files at export time (_compile_eq_deletes), so external
    readers see exactly the engine's own row set."""
    meta = table._meta()
    snaps = table._snaps()
    mains = [s for s in snaps if not s.get("branch")]
    ids = meta.get("column_ids", {})
    mdir = os.path.join(table.path, "metadata")
    fsio.makedirs(mdir, exist_ok=True)

    # distinct schemas across snapshots (dedup by json), current last
    schema_versions: list[str] = []
    for s in snaps:
        sj = s.get("schema") or meta["schema"]
        if sj not in schema_versions:
            schema_versions.append(sj)
    if meta["schema"] not in schema_versions:
        schema_versions.append(meta["schema"])
    schemas = [
        _schema_json(meta, i, T.StructType.fromJson(json.loads(sj)))
        for i, sj in enumerate(schema_versions)
    ]
    current_schema_id = schema_versions.index(meta["schema"])

    dir_specs = meta.get("dir_specs", {})
    # equality deletes surface to external readers as compiled positional
    # delete dirs, one per distinct (eq set, affected dirs) fingerprint
    eqpos: dict[int, str] = {}
    for s in snaps:
        d = _compile_eq_deletes(table, meta, s)
        if d:
            eqpos[s["snapshot_id"]] = d
    # a dir's adding snapshot = its first appearance in the chain (drives
    # the manifest's added_snapshot_id/sequence_number and the list's
    # added-vs-existing counts)
    added_in: dict[str, tuple[int, int]] = {}
    for seq, s in enumerate(snaps, start=1):
        extra = [eqpos[s["snapshot_id"]]] if s["snapshot_id"] in eqpos else []
        for d in s["manifest"] + s.get("delete_dirs", []) + extra:
            added_in.setdefault(d, (s["snapshot_id"], seq))
    snapshot_entries = []
    for seq, s in enumerate(snaps, start=1):
        manifest_list_avro = os.path.join(mdir, f"snap-{s['snapshot_id']}-manifest-list.avro")
        manifest_list_json = os.path.join(mdir, f"snap-{s['snapshot_id']}.manifest-list.json")
        manifests_json = []
        list_records = []
        for d in s["manifest"]:
            files = _load_dir_stats(table.path, d, meta)
            spec_rec = dir_specs.get(d, {"source": None, "transform": "identity", "spec_id": 0})
            add_snap, add_seq = added_in.get(d, (s["snapshot_id"], seq))
            mpath = _write_manifest_avro(table, meta, d, files, add_snap, add_seq, spec_rec)
            rows = sum(f["rows"] for f in files)
            added = add_snap == s["snapshot_id"]
            list_records.append(
                {
                    "manifest_path": mpath,
                    "manifest_length": fsio.getsize(mpath),
                    "partition_spec_id": int(spec_rec.get("spec_id", 0)),
                    "content": 0,  # data
                    "sequence_number": add_seq,
                    "min_sequence_number": add_seq,
                    "added_snapshot_id": add_snap,
                    "added_files_count": len(files) if added else 0,
                    "existing_files_count": 0 if added else len(files),
                    "deleted_files_count": 0,
                    "added_rows_count": rows if added else 0,
                    "existing_rows_count": 0 if added else rows,
                    "deleted_rows_count": 0,
                    # field 507: partition value summary — readers skip
                    # this manifest (never opening its avro) when a
                    # predicate provably excludes its value range
                    "partitions": _partition_summary(
                        files, _partition_avro_field(meta, spec_rec), tz=spec_rec.get("tz")
                    ),
                }
            )
            # Iceberg v3 row lineage in the debuggable JSON mirror: each
            # data file's first_row_id = the dir's commit-assigned base +
            # its row-count offset in canonical path order (the same rule
            # Table._lineage_cols derives `_row_id` with)
            row_base = meta.get("dir_row_ids", {}).get(d)
            first_ids: dict[str, int | None] = {}
            off = 0
            for f in sorted(files, key=lambda r: r["path"]):
                first_ids[f["path"]] = (int(row_base) + off) if row_base is not None else None
                off += int(f.get("rows", 0))
            manifests_json.append(
                {
                    "manifest_path": mpath,
                    "partition_spec_id": int(spec_rec.get("spec_id", 0)),
                    "added_snapshot_id": add_snap,
                    "data_files": [
                        {
                            "content": 0,  # 0 = DATA (v2 spec)
                            "file_path": os.path.join(table.path, d, f["path"]),
                            "file_format": "PARQUET",
                            "record_count": f["rows"],
                            "file_size_in_bytes": f["bytes"],
                            "first_row_id": first_ids[f["path"]],
                        }
                        for f in files
                    ],
                }
            )
        eq_extra = [eqpos[s["snapshot_id"]]] if s["snapshot_id"] in eqpos else []
        for d in s.get("delete_dirs", []) + eq_extra:
            files = _load_dir_stats(table.path, d, meta)
            add_snap, add_seq = added_in.get(d, (s["snapshot_id"], seq))
            spec_rec = dir_specs.get(d, {"source": None, "transform": "identity", "spec_id": 0})
            mpath = _write_manifest_avro(
                table, meta, d, files, add_snap, add_seq, spec_rec, content=1
            )
            rows = sum(f["rows"] for f in files)
            added = add_snap == s["snapshot_id"]
            list_records.append(
                {
                    "manifest_path": mpath,
                    "manifest_length": fsio.getsize(mpath),
                    "partition_spec_id": int(spec_rec.get("spec_id", 0)),
                    "content": 1,  # POSITION_DELETES manifest
                    "sequence_number": add_seq,
                    "min_sequence_number": add_seq,
                    "added_snapshot_id": add_snap,
                    "added_files_count": len(files) if added else 0,
                    "existing_files_count": 0 if added else len(files),
                    "deleted_files_count": 0,
                    "added_rows_count": rows if added else 0,
                    "existing_rows_count": 0 if added else rows,
                    "deleted_rows_count": 0,
                }
            )
        avro_io.write_container(
            manifest_list_avro,
            _MANIFEST_LIST_SCHEMA,
            list_records,
            metadata={
                "snapshot-id": str(s["snapshot_id"]),
                "parent-snapshot-id": str(s["parent_id"]),
                "sequence-number": str(seq),
                "format-version": "2",
            },
        )
        # human-debuggable sibling with both metadata levels inlined
        _atomic_write_json(manifest_list_json, {"manifests": manifests_json})
        schema_json = s.get("schema") or meta["schema"]
        snapshot_entries.append(
            {
                "snapshot-id": s["snapshot_id"],
                "parent-snapshot-id": s["parent_id"],
                "sequence-number": seq,
                "timestamp-ms": s["committed_at_ms"],
                "manifest-list": manifest_list_avro,
                "summary": {
                    "operation": (
                        s["operation"] if s["operation"] in ("append", "replace", "overwrite", "delete") else "overwrite"
                    ),
                    **{k: str(v) for k, v in s.get("summary", {}).items()},
                },
                "schema-id": schema_versions.index(schema_json),
                # Iceberg v3 row lineage (readers of v2 ignore unknown
                # fields): the first row id carved out for files this
                # commit added; absent on commits that added no data
                **(
                    {"first-row-id": int(s["first_row_id"])}
                    if s.get("first_row_id") is not None
                    else {}
                ),
            }
        )

    doc = {
        "format-version": 2,
        "table-uuid": meta.get("table_uuid", "00000000-0000-0000-0000-000000000000"),
        "location": table.path,
        "last-sequence-number": len(snaps),
        "last-updated-ms": snaps[-1]["committed_at_ms"] if snaps else meta.get("created_at_ms", 0),
        "last-column-id": int(meta.get("last_column_id", len(ids))),
        "schemas": schemas,
        "current-schema-id": current_schema_id,
        "partition-specs": _partition_specs(meta, ids),
        # position of the CURRENT spec in history, not the last index:
        # evolving back to a previously used spec (A->B->A) dedups history,
        # so current may sit at an earlier position — must agree with the
        # spec_id new data files are stamped with (Table._current_spec_id)
        "default-spec-id": table._current_spec_id(meta),
        "last-partition-id": 1000 + len(meta.get("spec_history", [0])) - 1,
        # the engine's DEFAULT bucket transform hashes with Spark's
        # murmur3 (seed 42), NOT the Iceberg-spec bucket hash — stamp
        # that so a spec-aware consumer never derives bucket predicates
        # against these partition values (read_iceberg_table's pruner
        # checks it). Tables that opted into the spec hash
        # (write.bucket-hash=iceberg-murmur3) keep their own property.
        "properties": {
            **meta.get("properties", {}),
            **(
                {"write.bucket-hash": "spark-murmur3-seed42"}
                if (
                    "write.bucket-hash" not in meta.get("properties", {})
                    and any(
                        str(s.get("transform", "")).startswith("bucket")
                        for s in (meta.get("spec_history") or [meta["partition"]])
                    )
                )
                else {}
            ),
        },
        # main's head — branch-staged (write-audit-publish) snapshots are
        # present in "snapshots" but referenced only by their named ref
        "current-snapshot-id": mains[-1]["snapshot_id"] if mains else -1,
        # v3 row-lineage counter (ignored by v2 readers): the next unused
        # row id — every committed data dir advanced it by its row count
        "next-row-id": int(meta.get("next_row_id", 0)),
        "snapshots": snapshot_entries,
        "snapshot-log": [
            {"timestamp-ms": s["committed_at_ms"], "snapshot-id": s["snapshot_id"]}
            for s in mains
        ],
        "metadata-log": [],
        # the Iceberg sort-order list: order 0 is always the unsorted
        # order; WRITE ORDERED BY publishes order 1 (identity transform,
        # asc, nulls-first — matching this engine's sortWithinPartitions
        # write clustering) and makes it the default
        "sort-orders": [{"order-id": 0, "fields": []}]
        + (
            [
                {
                    "order-id": 1,
                    "fields": [
                        {
                            "transform": "identity",
                            "source-id": int(ids.get(c, 0)),
                            "direction": "asc",
                            "null-order": "nulls-first",
                        }
                        for c in meta["sort_order"]
                    ],
                }
            ]
            if meta.get("sort_order")
            else []
        ),
        "default-sort-order-id": 1 if meta.get("sort_order") else 0,
        # Puffin statistics files (apache-datasketches-theta-v1 NDV
        # sketches written by ANALYZE) — the Iceberg-spec `statistics`
        # list, so foreign planners read this engine's stats the same
        # way they read its deletes
        "statistics": [
            e
            for e in meta.get("statistics_files", [])
            if any(s["snapshot_id"] == e["snapshot-id"] for s in snaps)
        ],
        # the spec's partition-statistics list (compute_partition_stats
        # writes the referenced Parquet file)
        "partition-statistics": [
            e
            for e in meta.get("partition_statistics_files", [])
            if any(s["snapshot_id"] == e["snapshot-id"] for s in snaps)
        ],
        "refs": {
            **(
                {"main": {"snapshot-id": mains[-1]["snapshot_id"], "type": "branch"}}
                if mains
                else {}
            ),
            **{
                name: {"snapshot-id": int(rec["snapshot_id"]), "type": rec["type"].lower()}
                for name, rec in meta.get("refs", {}).items()
            },
        },
    }
    # monotonic metadata version persisted in table meta — snapshot
    # expiry shrinks the snapshot list, so len(snaps) would regress and
    # overwrite historical vN files
    version = int(meta.get("metadata_version", 0)) + 1
    meta["metadata_version"] = version
    table._write_meta(meta)
    path = os.path.join(mdir, f"v{version}.metadata.json")
    _atomic_write_json(path, doc)
    fsio.write_bytes_atomic(
        os.path.join(mdir, "version-hint.text"), str(version).encode(), uuid.uuid4().hex
    )
    return path
