"""S11 beyond session conf (SURVEY §2.1): the engine's full
commit/read/maintain/export path with the TABLE ROOT on a non-``file:``
scheme, resolved through Hadoop's FileSystem API — the deployment shape
of the reference stack (MinIO behind ``s3a://``, docker-compose.yml:
24-44), where warehouse paths are object-store URIs, not local paths.

The test mounts a ``viewfs://`` namespace (Hadoop's client-side
mount-table federation, in hadoop-common — a real second scheme with its
own FileSystem implementation, no network) over a local target dir.
Because ``viewfs://…`` URIs are NOT valid local paths, any engine code
that bypassed the fsio facade and called ``os.*`` on a table URI fails
this test immediately — the green run mechanically pins that every
table-path touch goes through the facade Spark's connectors stand
behind.

Also exercised directly: the fsio primitives the commit protocol rests
on (create-exclusive locking, atomic replace, fail-if-exists rename)
against the Hadoop-backed scheme.
"""

from __future__ import annotations

import json
import os

import pytest

from minio_iceberg_polaris_lakehouse_spark import fsio
from minio_iceberg_polaris_lakehouse_spark.warehouse import Warehouse


@pytest.fixture()
def mock_uri(spark, tmp_path):
    # unique mount-table authority per test: Hadoop caches FileSystem
    # instances (and ViewFileSystem its mount table) by scheme+authority
    import uuid

    auth = f"graft{uuid.uuid4().hex[:8]}"
    spark._jsc.hadoopConfiguration().set(
        f"fs.viewfs.mounttable.{auth}.link./wh", f"file://{tmp_path}"
    )
    return f"viewfs://{auth}/wh/warehouse", str(tmp_path / "warehouse")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_full_table_lifecycle_on_mock_scheme(spark, mock_uri):
    uri, local = mock_uri
    wh = Warehouse(spark, uri)
    assert wh.root == uri  # abspath must not mangle the scheme
    t = wh.create_table("db", "users", "id int, name string")
    t.insert_values([(1, "a"), (2, "b")])
    t.insert_values([(3, "c")])
    assert _rows(t.read()) == [(1, "a"), (2, "b"), (3, "c")]
    # time travel reads resolve through the same scheme
    assert t.read(version=1).count() == 2
    # row-level delete (CoW rewrite: Spark writes the new dir to mock://)
    t.delete_where("id = 2")
    assert _rows(t.read()) == [(1, "a"), (3, "c")]
    # metadata tables walk the snapshot log through the facade
    assert t.history().count() == t.snapshots().count() == len(t._snaps())
    files = t.files().collect()
    assert files and all(r.file_path.startswith("viewfs://") for r in files)
    # maintenance: expiry GC walks and deletes through the facade
    t.expire_snapshots(keep_last=1)
    assert _rows(t.read()) == [(1, "a"), (3, "c")]
    # the bytes really landed where the scheme points (RawLocalFileSystem
    # maps mock://<path> to <path>): independent local inspection
    meta = json.load(open(os.path.join(local, "db", "users", "_meta.json")))
    assert meta["schema"]
    # Iceberg export was written per-commit through the same facade
    hint = open(os.path.join(local, "db", "users", "metadata", "version-hint.text")).read()
    md = json.load(
        open(os.path.join(local, "db", "users", "metadata", f"v{hint}.metadata.json"))
    )
    assert md["current-snapshot-id"] == t.current_snapshot_id()
    # the standalone metadata reader resolves the same viewfs:// root
    # end to end (metadata via the facade, data via Spark's connector)
    from minio_iceberg_polaris_lakehouse_spark.sources.iceberg_reader import (
        read_iceberg_table,
    )

    assert _rows(read_iceberg_table(spark, t.path)) == [(1, "a"), (3, "c")]


def test_sql_frontend_on_mock_scheme(spark, mock_uri):
    from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL

    uri, _local = mock_uri
    lake = LakehouseSQL(spark, uri)
    lake.sql("CREATE TABLE polaris.db.t (id INT, v STRING) USING ICEBERG")
    lake.sql("INSERT INTO polaris.db.t VALUES (1, 'x'), (2, 'y')")
    assert lake.sql("SELECT COUNT(*) AS n FROM db.t").collect()[0].n == 2
    lake.sql("UPDATE polaris.db.t SET v = 'z' WHERE id = 2")
    assert _rows(lake.sql("SELECT id, v FROM db.t ORDER BY id")) == [(1, "x"), (2, "z")]


def test_fsio_primitives_on_mock_scheme(spark, mock_uri):
    uri, local = mock_uri
    root = f"{uri}/prim"
    fsio.makedirs(root)
    assert fsio.isdir(root) and not fsio.isfile(root)
    # atomic write + read round-trip
    fsio.write_bytes_atomic(f"{root}/a.json", b'{"k": 1}', "t1")
    assert json.loads(fsio.read_text(f"{root}/a.json")) == {"k": 1}
    assert fsio.getsize(f"{root}/a.json") == len(b'{"k": 1}')
    assert fsio.getmtime(f"{root}/a.json") > 0
    # listdir / walk see through the scheme
    fsio.makedirs(f"{root}/sub")
    fsio.write_bytes(f"{root}/sub/b.bin", b"\x00\x01")
    assert fsio.listdir(root) == sorted(["a.json", "sub"])
    walked = {d: (sorted(dd), sorted(ff)) for d, dd, ff in fsio.walk(root)}
    assert walked[root] == (["sub"], ["a.json"])
    assert walked[f"{root}/sub"] == ([], ["b.bin"])
    assert fsio.read_bytes(f"{root}/sub/b.bin") == b"\x00\x01"
    # create-exclusive: second acquire must lose
    assert fsio.try_create_exclusive(f"{root}/lock", b"tok1") is True
    assert fsio.try_create_exclusive(f"{root}/lock", b"tok2") is False
    assert fsio.read_text(f"{root}/lock") == "tok1"
    # rename keeps the fail-if-exists contract
    with pytest.raises(FileExistsError):
        fsio.rename(f"{root}/a.json", f"{root}/lock")
    fsio.rename(f"{root}/a.json", f"{root}/moved.json")
    assert not fsio.exists(f"{root}/a.json") and fsio.isfile(f"{root}/moved.json")
    # replace overwrites
    fsio.write_bytes(f"{root}/new", b"v2")
    fsio.replace(f"{root}/new", f"{root}/moved.json")
    assert fsio.read_bytes(f"{root}/moved.json") == b"v2"
    fsio.remove(f"{root}/lock")
    assert not fsio.exists(f"{root}/lock")
    fsio.rmtree(root)
    assert not fsio.exists(root)
    # and everything above really happened on the local dir the scheme maps to
    assert not os.path.exists(os.path.join(local, "prim"))


def test_remote_open_binary_is_ranged_and_seekable(spark, mock_uri):
    """open_binary on a remote path must support seek/partial reads so
    parquet footer parsing never pulls a whole data file to the driver."""
    import pyarrow.parquet as pq

    uri, local = mock_uri
    fsio.makedirs(uri)
    payload = bytes(range(256)) * 40
    fsio.write_bytes(f"{uri}/blob.bin", payload)
    f = fsio.open_binary(f"{uri}/blob.bin")
    assert f.seekable()
    assert f.seek(0, 2) == len(payload)  # size via seek-end
    f.seek(10)
    assert f.read(5) == payload[10:15]
    f.seek(-4, 2)
    assert f.read() == payload[-4:]
    f.close()
    # and pyarrow reads a real footer through it
    spark.range(100).toDF("n").coalesce(1).write.parquet(f"{uri}/pqdir")
    part = next(p for p in fsio.listdir(f"{uri}/pqdir") if p.endswith(".parquet"))
    pf = pq.ParquetFile(fsio.open_binary(f"{uri}/pqdir/{part}"))
    assert pf.metadata.num_rows == 100
