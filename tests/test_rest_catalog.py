"""Loopback Iceberg REST catalog (rest_catalog.py): the reference's
setup-polaris.sh bootstrap flow replayed over real HTTP, then the
Iceberg REST surface — namespaces, tables, loadTable, and CAS commits
with conflict/retry — against engine-backed warehouses."""

from __future__ import annotations

import json
import os

import pytest

from minio_iceberg_polaris_lakehouse_spark.rest_catalog import (
    CommitConflict,
    RestCatalogClient,
    make_server,
)
from minio_iceberg_polaris_lakehouse_spark.warehouse import Warehouse

CID, SECRET = "30d861989a2b1605", "c93e64ae4132aba1"


@pytest.fixture()
def server(tmp_path):
    srv, port = make_server(str(tmp_path), CID, SECRET)
    yield f"http://127.0.0.1:{port}", str(tmp_path)
    srv.shutdown()


def test_oauth_bootstrap_flow(server, spark):
    """setup-polaris.sh:17-75 — token, create catalog, list catalogs;
    bad credentials and missing tokens are rejected."""
    url, _root = server
    with pytest.raises(RuntimeError, match="NotAuthorizedException"):
        RestCatalogClient(url, CID, "wrong-secret")
    cli = RestCatalogClient(url, CID, SECRET)
    assert cli.token
    cli.create_catalog("my_catalog", _root + "/my_catalog")
    assert cli.list_catalogs() == ["my_catalog"]
    # duplicate create → AlreadyExists
    with pytest.raises(RuntimeError, match="AlreadyExistsException"):
        cli.create_catalog("my_catalog", _root + "/my_catalog")
    # a forged token is 401
    forged = RestCatalogClient(url, CID, SECRET)
    forged.token = "feedfacefeedface"
    with pytest.raises(RuntimeError, match="NotAuthorizedException"):
        forged.list_catalogs()
    # config endpoint answers per-catalog
    assert cli.config("my_catalog")["overrides"]["prefix"] == "my_catalog"


def test_table_lifecycle_and_pointer_commits(server, spark):
    """Create through REST, write through the engine on the shared
    filesystem, publish by moving the catalog pointer — the exact
    division of labor of Spark + Polaris + MinIO."""
    url, root = server
    cli = RestCatalogClient(url, CID, SECRET)
    cli.create_catalog("cat", root + "/cat")
    cli.create_namespace("cat", "db")
    assert cli.list_namespaces("cat") == ["db"]

    created = cli.create_table("cat", "db", "users", "id int, name string")
    loc0 = created["metadata-location"]
    assert created["metadata"]["current-snapshot-id"] is None or created[
        "metadata"
    ]["current-snapshot-id"] in (0, -1, None)
    assert cli.list_tables("cat", "db") == ["users"]

    # the engine-side writer attaches to the same storage (shared FS)
    wh = Warehouse(spark, root + "/cat")
    tab = wh.table("db", "users")

    def stage(cur):
        tab.insert_values([(1, "a"), (2, "b")])
        hint = open(os.path.join(tab.path, "metadata", "version-hint.text")).read()
        return os.path.join(tab.path, "metadata", f"v{hint}.metadata.json")

    out = cli.commit_with_retry("cat", "db", "users", stage)
    assert out["metadata-location"] != loc0
    loaded = cli.load_table("cat", "db", "users")
    assert loaded["metadata"]["current-snapshot-id"] == 1
    # the pointed-to metadata is the real export (readable standalone)
    doc = json.loads(open(loaded["metadata-location"]).read())
    assert doc["current-snapshot-id"] == 1

    cli.drop_table("cat", "db", "users")
    assert cli.list_tables("cat", "db") == []
    with pytest.raises(RuntimeError, match="NoSuchTableException"):
        cli.load_table("cat", "db", "users")


def test_commit_cas_conflict_and_retry(server, spark):
    """Two writers race: the loser's assert-metadata-location fails with
    CommitFailedException (409) and its retry loop re-stages on the
    winner's pointer — optimistic concurrency at the catalog, Polaris
    style."""
    url, root = server
    cli_a = RestCatalogClient(url, CID, SECRET)
    cli_a.create_catalog("cat", root + "/cat")
    cli_a.create_namespace("cat", "db")
    cli_a.create_table("cat", "db", "t", "id int")
    cli_b = RestCatalogClient(url, CID, SECRET)

    wh = Warehouse(spark, root + "/cat")
    tab = wh.table("db", "t")

    def loc_now():
        hint = open(os.path.join(tab.path, "metadata", "version-hint.text")).read()
        return os.path.join(tab.path, "metadata", f"v{hint}.metadata.json")

    # both read the same base
    base_a = cli_a.load_table("cat", "db", "t")["metadata-location"]
    base_b = cli_b.load_table("cat", "db", "t")["metadata-location"]
    assert base_a == base_b
    # A stages and commits first
    tab.insert_values([(1,)])
    cli_a.commit_table("cat", "db", "t", base_a, loc_now())
    # B's CAS on the stale base must 409
    tab.insert_values([(2,)])
    with pytest.raises(CommitConflict):
        cli_b.commit_table("cat", "db", "t", base_b, loc_now())
    # ...and the standard retry loop lands it on the fresh base
    attempts = []

    def stage_b(cur):
        attempts.append(cur["metadata-location"])
        return loc_now()

    out = cli_b.commit_with_retry("cat", "db", "t", stage_b)
    assert out["metadata"]["current-snapshot-id"] == 2
    # multi-catalog isolation: a second catalog has its own namespace set
    cli_a.create_catalog("cat2", root + "/cat2")
    cli_a.create_namespace("cat2", "other")
    assert cli_a.list_namespaces("cat2") == ["other"]
    assert "other" not in cli_a.list_namespaces("cat")


def test_sql_session_from_rest(server, spark):
    """LakehouseSQL.from_rest: connect by URL + credentials (the way
    the reference's Spark session binds to Polaris), resolve the
    catalog's base location, and run the notebook SQL against it."""
    from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL
    from minio_iceberg_polaris_lakehouse_spark.warehouse import WarehouseError

    url, root = server
    boot = RestCatalogClient(url, CID, SECRET)
    boot.create_catalog("my_catalog", root + "/my_catalog")
    lake = LakehouseSQL.from_rest(spark, url, CID, SECRET)
    lake.sql("CREATE NAMESPACE IF NOT EXISTS polaris.test_db")
    lake.sql("CREATE TABLE polaris.test_db.t (id INT, name STRING) USING ICEBERG")
    lake.sql("INSERT INTO polaris.test_db.t VALUES (1, 'Hello'), (2, 'World')")
    assert lake.sql("SELECT COUNT(*) AS n FROM test_db.t").collect()[0].n == 2
    # the data landed under the catalog's base location
    assert os.path.isdir(os.path.join(root, "my_catalog", "test_db", "t"))
    # the kept client is live: catalog-level ops work from the session
    assert lake.rest.list_catalogs() == ["my_catalog"]
    with pytest.raises(WarehouseError, match="no catalog"):
        LakehouseSQL.from_rest(spark, url, CID, SECRET, catalog_name="nope")
