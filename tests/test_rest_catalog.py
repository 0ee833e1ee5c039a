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


def _meta_loc(tab):
    hint = open(os.path.join(tab.path, "metadata", "version-hint.text")).read().strip()
    return os.path.join(tab.path, "metadata", f"v{hint}.metadata.json")


def test_concurrent_appends_through_rest_catalog(server, spark):
    """The REST mirror of test_warehouse.py::
    test_concurrent_appends_both_survive — four writers racing through
    `commit_with_retry` (the catalog's CAS + 409-retry loop, the
    deployment topology where Polaris arbitrates commits,
    setup-polaris.sh:37-56). A barrier forces every writer to load the
    SAME base pointer, so at most one CAS wins per round and the rest
    must 409 and re-stage. All appends survive; the final pointer serves
    every row through the open-metadata reader."""
    import threading

    from minio_iceberg_polaris_lakehouse_spark.sources.iceberg_reader import (
        read_iceberg_table,
    )

    url, root = server
    boot = RestCatalogClient(url, CID, SECRET)
    boot.create_catalog("cat", root + "/cat")
    boot.create_namespace("cat", "db")
    boot.create_table("cat", "db", "race", "id int, v string")
    wh = Warehouse(spark, root + "/cat")
    wh.table("db", "race").insert_values([(0, "base")])
    boot.commit_with_retry(
        "cat", "db", "race", lambda cur: _meta_loc(wh.table("db", "race"))
    )

    n_writers = 4
    barrier = threading.Barrier(n_writers)
    loads: list[str] = []  # bases seen by do_commit (re-stages add more)
    errs: list[Exception] = []

    def writer(i):
        try:
            cli = RestCatalogClient(url, CID, SECRET)
            appended = [False]

            def stage(cur):
                loads.append(cur["metadata-location"])
                if not appended[0]:
                    # wait until EVERY writer holds the same base: the
                    # CAS race is then guaranteed, not scheduler luck
                    barrier.wait(timeout=30)
                    appended[0] = True
                    # data + metadata staged on the shared filesystem
                    # (like Spark against Polaris); the CATALOG decides
                    # whose pointer swap lands
                    wh.table("db", "race").append(
                        spark.createDataFrame([(i, f"w{i}")], "id int, v string")
                    )
                return _meta_loc(wh.table("db", "race"))

            cli.commit_with_retry("cat", "db", "race", stage, max_attempts=10)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(1, n_writers + 1)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    # losers re-staged: more loads than writers proves 409s were taken
    assert len(loads) > n_writers
    final = boot.load_table("cat", "db", "race")["metadata-location"]
    got = read_iceberg_table(spark, final)
    assert sorted(r.id for r in got.collect()) == [0, 1, 2, 3, 4]


def test_conflicting_delete_through_rest_catalog(server, spark):
    """The REST mirror of test_warehouse.py::
    test_read_modify_write_conflict_detected: a writer who staged a
    delete against a base the catalog has moved past must get a 409 on
    the pointer swap (not silently drop the concurrent append), and the
    standard retry loop publishes a final state containing BOTH the
    delete and the concurrent row."""
    from minio_iceberg_polaris_lakehouse_spark.sources.iceberg_reader import (
        read_iceberg_table,
    )

    url, root = server
    cli_a = RestCatalogClient(url, CID, SECRET)
    cli_b = RestCatalogClient(url, CID, SECRET)
    cli_a.create_catalog("cat", root + "/cat")
    cli_a.create_namespace("cat", "db")
    cli_a.create_table("cat", "db", "t", "id int, v string")
    wh = Warehouse(spark, root + "/cat")
    tab = wh.table("db", "t")
    tab.insert_values([(1, "a"), (2, "b")])
    cli_a.commit_with_retry("cat", "db", "t", lambda cur: _meta_loc(tab))

    # A reads its base; B commits an append through the catalog meanwhile
    base_a = cli_a.load_table("cat", "db", "t")["metadata-location"]
    wh.table("db", "t").append(spark.createDataFrame([(3, "c")], "id int, v string"))
    cli_b.commit_with_retry("cat", "db", "t", lambda cur: _meta_loc(tab))

    # A stages its delete and attempts the swap on the STALE base → 409
    wh.table("db", "t").delete_where("id = 2")
    with pytest.raises(CommitConflict):
        cli_a.commit_table("cat", "db", "t", base_a, _meta_loc(tab))
    # the retry loop re-loads the fresh base and lands
    cli_a.commit_with_retry("cat", "db", "t", lambda cur: _meta_loc(tab))
    final = cli_b.load_table("cat", "db", "t")["metadata-location"]
    got = sorted(
        (r.id, r.v) for r in read_iceberg_table(spark, final).collect()
    )
    assert got == [(1, "a"), (3, "c")]


def test_view_lifecycle_through_rest(spark, tmp_path):
    """Iceberg REST view spec: create -> load (spec-shaped metadata with
    versions/representations) -> SELECT through an engine session bound
    to the same warehouse -> replace (version 2, version-log grows) ->
    list -> drop."""
    from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL

    srv, port = make_server(str(tmp_path), "cid", "sec")
    try:
        cli = RestCatalogClient(f"http://127.0.0.1:{port}", "cid", "sec")
        cli.create_catalog("cat", str(tmp_path / "cat"))
        cli.create_namespace("cat", "db")
        lake = LakehouseSQL(spark, str(tmp_path / "cat"))
        lake.sql("CREATE TABLE polaris.db.base (id INT, v STRING) USING iceberg")
        lake.sql("INSERT INTO db.base VALUES (1, 'a'), (2, 'b'), (3, 'c')")

        out = cli.create_view("cat", "db", "big_ids", "SELECT id FROM db.base WHERE id >= 2")
        md = out["metadata"]
        assert md["current-version-id"] == 1 and md["format-version"] == 1
        rep = md["versions"][-1]["representations"][0]
        assert rep["type"] == "sql" and "WHERE id >= 2" in rep["sql"]
        assert out["metadata-location"].endswith("v1.view-metadata.json")

        # the engine session SELECTs the catalog-created view immediately
        got = sorted(r.id for r in lake.sql("SELECT id FROM db.big_ids").collect())
        assert got == [2, 3]

        # replace: new SQL, version 2, log grows, engine follows
        out2 = cli.replace_view("cat", "db", "big_ids", "SELECT id FROM db.base WHERE id = 1")
        assert out2["metadata"]["current-version-id"] == 2
        assert [e["version-id"] for e in out2["metadata"]["version-log"]] == [1, 2]
        assert [r.id for r in lake.sql("SELECT id FROM db.big_ids").collect()] == [1]

        assert cli.list_views("cat", "db") == ["big_ids"]
        # duplicate create -> 409
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="exists"):
            cli.create_view("cat", "db", "big_ids", "SELECT 1 AS x")
        cli.drop_view("cat", "db", "big_ids")
        assert cli.list_views("cat", "db") == []
        with _pytest.raises(RuntimeError, match="no view"):
            cli.load_view("cat", "db", "big_ids")
    finally:
        srv.shutdown()


def test_engine_created_view_loads_through_rest(spark, tmp_path):
    """A view created by the ENGINE (CREATE VIEW in SQL) lazily exports
    spec metadata on the first REST loadView — the same lazy-export
    contract tables have."""
    from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL

    srv, port = make_server(str(tmp_path), "cid", "sec")
    try:
        cli = RestCatalogClient(f"http://127.0.0.1:{port}", "cid", "sec")
        cli.create_catalog("cat", str(tmp_path / "cat"))
        cli.create_namespace("cat", "db")
        lake = LakehouseSQL(spark, str(tmp_path / "cat"))
        lake.sql("CREATE TABLE polaris.db.t (id INT) USING iceberg")
        lake.sql("CREATE VIEW db.v AS SELECT id FROM db.t")
        md = cli.load_view("cat", "db", "v")["metadata"]
        assert md["current-version-id"] == 1
        assert "SELECT id FROM db.t" in md["versions"][-1]["representations"][0]["sql"]
    finally:
        srv.shutdown()


def test_concurrent_view_creates_one_wins(spark, tmp_path):
    """Two racing createView calls on one name: exactly one 200, one 409
    (the same guarantee table creates have)."""
    import threading

    srv, port = make_server(str(tmp_path), "cid", "sec")
    try:
        cli = RestCatalogClient(f"http://127.0.0.1:{port}", "cid", "sec")
        cli.create_catalog("cat", str(tmp_path / "cat"))
        cli.create_namespace("cat", "db")
        from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL

        lake = LakehouseSQL(spark, str(tmp_path / "cat"))
        lake.sql("CREATE TABLE polaris.db.t (id INT) USING iceberg")
        results = []

        def create(sql):
            try:
                cli.create_view("cat", "db", "race_v", sql)
                results.append("ok")
            except RuntimeError as e:
                results.append("conflict" if "exists" in str(e) else f"other:{e}")

        ts = [
            threading.Thread(target=create, args=(f"SELECT id FROM db.t WHERE id > {i}",))
            for i in range(2)
        ]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert sorted(results) == ["conflict", "ok"]
        assert cli.list_views("cat", "db") == ["race_v"]
    finally:
        srv.shutdown()


def test_load_view_tracks_engine_side_replace_and_drop(spark, tmp_path):
    """The warehouse view registry is the source of truth: loadView must
    reflect an ENGINE-side CREATE OR REPLACE (new version appended) and
    404 after an engine-side DROP; createView on the freed name works."""
    from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL

    srv, port = make_server(str(tmp_path), "cid", "sec")
    try:
        cli = RestCatalogClient(f"http://127.0.0.1:{port}", "cid", "sec")
        cli.create_catalog("cat", str(tmp_path / "cat"))
        cli.create_namespace("cat", "db")
        lake = LakehouseSQL(spark, str(tmp_path / "cat"))
        lake.sql("CREATE TABLE polaris.db.t (id INT) USING iceberg")
        cli.create_view("cat", "db", "v", "SELECT id FROM db.t")
        lake.sql("CREATE OR REPLACE VIEW db.v AS SELECT id AS renamed FROM db.t")
        md = cli.load_view("cat", "db", "v")["metadata"]
        assert md["current-version-id"] == 2
        assert "renamed" in md["versions"][-1]["representations"][0]["sql"]
        lake.sql("DROP VIEW db.v")
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="no view"):
            cli.load_view("cat", "db", "v")
        cli.create_view("cat", "db", "v", "SELECT 1 AS x")  # name freed
        assert cli.list_views("cat", "db") == ["v"]
    finally:
        srv.shutdown()


def test_rename_table_through_rest(server, spark):
    """renameTable (POST /v1/{prefix}/tables/rename): catalog-identifier
    move — data/snapshots intact, CAS pointer follows the identity, the
    old name 404s, destination collisions 409."""
    url, root = server
    cli = RestCatalogClient(url, CID, SECRET)
    cli.create_catalog("cat", root + "/cat")
    cli.create_namespace("cat", "db")
    cli.create_table("cat", "db", "t", "id int, v string")
    wh = Warehouse(spark, root + "/cat")
    wh.table("db", "t").insert_values([(1, "a"), (2, "b")])

    cli.rename_table("cat", "db", "t", "db", "t2")
    assert cli.list_tables("cat", "db") == ["t2"]
    md = cli.load_table("cat", "db", "t2")["metadata"]
    assert md["current-snapshot-id"] is not None
    with pytest.raises(RuntimeError, match="NoSuchTableException"):
        cli.load_table("cat", "db", "t")
    # engine reads under the new identity see the data
    got = sorted(tuple(r) for r in wh.table("db", "t2").read().collect())
    assert got == [(1, "a"), (2, "b")]
    # destination taken → 409 AlreadyExists
    cli.create_table("cat", "db", "t3", "id int")
    with pytest.raises(RuntimeError, match="AlreadyExistsException"):
        cli.rename_table("cat", "db", "t3", "db", "t2")
    # unknown source → 404
    with pytest.raises(RuntimeError, match="NoSuchTableException"):
        cli.rename_table("cat", "db", "ghost", "db", "x")


def test_commit_transaction_rejects_unknown_requirement_and_duplicates(server, spark):
    """The 409 contract holds only if unsupported requirement types are
    refused (400), not silently 'validated'; duplicate identifiers in
    one transaction (last write would win silently) are refused too."""
    url, root = server
    cli = RestCatalogClient(url, CID, SECRET)
    cli.create_catalog("cat", root + "/cat")
    cli.create_namespace("cat", "db")
    cli.create_table("cat", "db", "a", "id int")
    cur = cli.load_table("cat", "db", "a")["metadata-location"]

    def post(changes):
        return cli._post_json(
            "/api/catalog/v1/cat/transactions/commit", {"table-changes": changes}
        )

    change = {
        "identifier": {"namespace": ["db"], "name": "a"},
        "metadata-location": cur,
        "requirements": [
            {"type": "assert-ref-snapshot-id", "ref": "main", "snapshot-id": 1}
        ],
    }
    with pytest.raises(RuntimeError, match="unsupported requirement type"):
        post([change])
    ok = dict(
        change,
        requirements=[
            {"type": "assert-metadata-location", "metadata-location": cur}
        ],
    )
    with pytest.raises(RuntimeError, match="duplicate table"):
        post([ok, dict(ok)])
    assert post([ok])["committed"] == 1  # clean commit still works
    # and nothing moved on the refused attempts
    assert cli.load_table("cat", "db", "a")["metadata-location"] == cur
