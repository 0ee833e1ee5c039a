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

Documented divergence: real Iceberg manifest lists / manifests are Avro
files; this container has no Avro writer, so both levels are collapsed
into ONE spec-shaped JSON document per snapshot (`manifest-list` entries
carry the data files inline). Every field name matches the Avro schema's
(`manifest_path`, `data_file.file_path`, `record_count`, ...), making a
future Avro writer a serialization swap, not a redesign.

Cost model: export is driver-side JSON of O(files) entries built from
footer stats CACHED at write time (warehouse.py `dir_stats`) — no data
reads, no Spark job, same order of work as Iceberg's own commit path.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from minio_iceberg_polaris_lakehouse_spark.warehouse import Table, _atomic_write_json

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


_TRANSFORM_NAMES = {
    "identity": "identity",
    "day": "day",
    "month": "month",
    "year": "year",
    "bucket16": "bucket[16]",
}


def _schema_json(meta: dict, schema_id: int, schema: T.StructType) -> dict:
    ids = meta.get("column_ids", {})
    last = int(meta.get("last_column_id", len(schema.fields)))
    counter = [last]
    fields = []
    for i, f in enumerate(schema.fields):
        fields.append(
            {
                "id": int(ids.get(f.name, i + 1)),
                "name": f.name,
                "required": not f.nullable,
                "type": _iceberg_type(f.dataType, counter),
            }
        )
    return {"type": "struct", "schema-id": schema_id, "fields": fields}


def _partition_specs(meta: dict, ids: dict) -> list[dict]:
    specs = []
    history = meta.get("spec_history") or [meta["partition"]]
    for spec_id, spec in enumerate(history):
        fields = []
        if spec.get("source") is not None:
            transform = _TRANSFORM_NAMES[spec.get("transform", "identity")]
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


def write_iceberg_metadata(table: Table) -> str:
    """Export the table's current state as Iceberg-v2-shaped metadata.
    Returns the metadata file path. Called after every commit; safe to
    call standalone."""
    meta = table._meta()
    snaps = table._snaps()
    ids = meta.get("column_ids", {})
    mdir = os.path.join(table.path, "metadata")
    os.makedirs(mdir, exist_ok=True)

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

    dir_stats = meta.get("dir_stats", {})
    dir_specs = meta.get("dir_specs", {})
    snapshot_entries = []
    for seq, s in enumerate(snaps, start=1):
        manifest_list = os.path.join(mdir, f"snap-{s['snapshot_id']}.manifest-list.json")
        manifests = []
        for d in s["manifest"]:
            files = dir_stats.get(d, [])
            manifests.append(
                {
                    "manifest_path": os.path.join(table.path, d),
                    "partition_spec_id": int(dir_specs.get(d, {}).get("spec_id", 0)),
                    "added_snapshot_id": s["snapshot_id"],
                    "data_files": [
                        {
                            "content": 0,  # 0 = DATA (v2 spec)
                            "file_path": os.path.join(table.path, d, f["path"]),
                            "file_format": "PARQUET",
                            "record_count": f["rows"],
                            "file_size_in_bytes": f["bytes"],
                        }
                        for f in files
                    ],
                }
            )
        _atomic_write_json(manifest_list, {"manifests": manifests})
        schema_json = s.get("schema") or meta["schema"]
        snapshot_entries.append(
            {
                "snapshot-id": s["snapshot_id"],
                "parent-snapshot-id": s["parent_id"],
                "sequence-number": seq,
                "timestamp-ms": s["committed_at_ms"],
                "manifest-list": manifest_list,
                "summary": {
                    "operation": (
                        s["operation"] if s["operation"] in ("append", "replace", "overwrite", "delete") else "overwrite"
                    ),
                    **{k: str(v) for k, v in s.get("summary", {}).items()},
                },
                "schema-id": schema_versions.index(schema_json),
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
        "properties": meta.get("properties", {}),
        "current-snapshot-id": snaps[-1]["snapshot_id"] if snaps else -1,
        "snapshots": snapshot_entries,
        "snapshot-log": [
            {"timestamp-ms": s["committed_at_ms"], "snapshot-id": s["snapshot_id"]}
            for s in snaps
        ],
        "metadata-log": [],
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "refs": (
            {"main": {"snapshot-id": snaps[-1]["snapshot_id"], "type": "branch"}}
            if snaps
            else {}
        ),
    }
    # monotonic metadata version persisted in table meta — snapshot
    # expiry shrinks the snapshot list, so len(snaps) would regress and
    # overwrite historical vN files
    version = int(meta.get("metadata_version", 0)) + 1
    meta["metadata_version"] = version
    table._write_meta(meta)
    path = os.path.join(mdir, f"v{version}.metadata.json")
    _atomic_write_json(path, doc)
    with open(os.path.join(mdir, "version-hint.text.tmp"), "w") as f:
        f.write(str(version))
    os.replace(
        os.path.join(mdir, "version-hint.text.tmp"), os.path.join(mdir, "version-hint.text")
    )
    return path
