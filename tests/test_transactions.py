"""Multi-table transactions (transactions.py + the REST
commitTransaction endpoint): atomic all-or-nothing commits across
tables, snapshot-isolation conflict detection, zero partial publishes."""

from __future__ import annotations

import os

import pytest

from minio_iceberg_polaris_lakehouse_spark.rest_catalog import (
    CommitConflict,
    RestCatalogClient,
    make_server,
)
from minio_iceberg_polaris_lakehouse_spark.transactions import TransactionError
from minio_iceberg_polaris_lakehouse_spark.warehouse import (
    CommitConflictError,
    Warehouse,
)

CID, SECRET = "30d861989a2b1605", "c93e64ae4132aba1"


@pytest.fixture()
def wh(spark, tmp_path):
    w = Warehouse(spark, str(tmp_path / "wh"))
    w.create_namespace("db")
    a = w.create_table("db", "a", "id int, v string")
    b = w.create_table("db", "b", "id int, v string")
    a.insert_values([(1, "a1")])
    b.insert_values([(1, "b1")])
    return w


def _vals(tab):
    return sorted((r.id, r.v) for r in tab.read().collect())


def test_two_table_commit_is_atomic_and_invisible_until_commit(wh, spark):
    a, b = wh.table("db", "a"), wh.table("db", "b")
    with wh.transaction() as txn:
        txn.table("db", "a").insert_values([(2, "a2")])
        txn.table("db", "b").delete_where("id = 1")
        # staged state invisible to main readers mid-transaction
        assert _vals(a) == [(1, "a1")]
        assert _vals(b) == [(1, "b1")]
        # ...but visible to the transaction itself (read-your-writes)
        assert sorted(
            (r.id, r.v) for r in txn.table("db", "a").read().collect()
        ) == [(1, "a1"), (2, "a2")]
    assert _vals(a) == [(1, "a1"), (2, "a2")]
    assert _vals(b) == []
    # transaction branches are gone from both tables
    assert not [r for r in a._meta().get("refs", {}) if r.startswith("__txn_")]
    assert not [r for r in b._meta().get("refs", {}) if r.startswith("__txn_")]


def test_exception_aborts_everything(wh):
    a, b = wh.table("db", "a"), wh.table("db", "b")
    with pytest.raises(RuntimeError, match="boom"):
        with wh.transaction() as txn:
            txn.table("db", "a").insert_values([(2, "a2")])
            txn.table("db", "b").insert_values([(2, "b2")])
            raise RuntimeError("boom")
    assert _vals(a) == [(1, "a1")]
    assert _vals(b) == [(1, "b1")]
    assert not [r for r in a._meta().get("refs", {}) if r.startswith("__txn_")]


def test_conflict_on_any_table_publishes_nothing(wh, spark):
    """The concurrent writer hits table 'b' — which sorts AFTER 'a' in
    the canonical lock/publish order — so the conflict is discovered
    after 'a' already validated: the validate-all phase must still leave
    'a' unpublished."""
    a, b = wh.table("db", "a"), wh.table("db", "b")
    txn = wh.transaction()
    txn.table("db", "a").insert_values([(2, "a2")])
    txn.table("db", "b").insert_values([(2, "b2")])
    b.insert_values([(9, "intruder")])  # concurrent main commit
    with pytest.raises(CommitConflictError):
        txn.commit()
    assert _vals(a) == [(1, "a1")]  # nothing from the transaction landed
    assert _vals(b) == [(1, "b1"), (9, "intruder")]
    assert not [r for r in a._meta().get("refs", {}) if r.startswith("__txn_")]
    assert not [r for r in b._meta().get("refs", {}) if r.startswith("__txn_")]


def test_update_merge_overwrite_inside_transaction(wh, spark):
    with wh.transaction() as txn:
        txn.table("db", "a").update_where({"v": "'A1'"}, "id = 1")
        src = spark.createDataFrame([(1, "B1"), (5, "b5")], "id int, v string")
        txn.table("db", "b").merge_into(src, on="id")
    assert _vals(wh.table("db", "a")) == [(1, "A1")]
    assert _vals(wh.table("db", "b")) == [(1, "B1"), (5, "b5")]


def test_multiple_ops_same_table_chain_on_branch(wh):
    with wh.transaction() as txn:
        t = txn.table("db", "a")
        t.insert_values([(2, "a2")])
        t.insert_values([(3, "a3")])
        t.delete_where("id = 1")
    assert _vals(wh.table("db", "a")) == [(2, "a2"), (3, "a3")]


def test_empty_table_refused_loudly(wh):
    wh.create_table("db", "empty", "id int, v string")
    txn = wh.transaction()
    with pytest.raises(TransactionError, match="no snapshots"):
        txn.table("db", "empty")
    txn.abort()


def test_closed_transaction_rejects_further_use(wh, spark):
    txn = wh.transaction()
    txn.table("db", "a").insert_values([(2, "a2")])
    txn.commit()
    with pytest.raises(TransactionError, match="committed"):
        txn.table("db", "b")
    # commit is not repeatable either
    with pytest.raises(TransactionError):
        txn.commit()


def test_two_racing_transactions_one_wins_wholly(wh, spark):
    """Two transactions stage conflicting row-level DML on the SAME two
    tables and commit concurrently: exactly one commits (both its
    tables), the other aborts (neither of its tables) — never a mix.
    Appends alone are commutative, so the conflicting op here is an
    UPDATE (a replace commit) on each table."""
    import threading

    results: dict[str, Exception | dict] = {}

    def run(tag: str):
        txn = wh.transaction()
        try:
            txn.table("db", "a").update_where({"v": f"'{tag}'"}, "id = 1")
            txn.table("db", "b").update_where({"v": f"'{tag}'"}, "id = 1")
            results[tag] = txn.commit()
        except Exception as e:
            results[tag] = e

    t1 = threading.Thread(target=run, args=("T1",))
    t2 = threading.Thread(target=run, args=("T2",))
    t1.start(), t2.start()
    t1.join(), t2.join()
    committed = [k for k, v in results.items() if isinstance(v, dict)]
    failed = [k for k, v in results.items() if isinstance(v, Exception)]
    assert len(committed) == 1 and len(failed) == 1, results
    # the failure is the documented conflict type
    assert isinstance(results[failed[0]], CommitConflictError), results[failed[0]]
    win = committed[0]
    # BOTH tables carry the winner's value; the loser left no trace
    assert _vals(wh.table("db", "a")) == [(1, win)]
    assert _vals(wh.table("db", "b")) == [(1, win)]
    for t in ("a", "b"):
        refs = wh.table("db", t)._meta().get("refs", {})
        assert not [r for r in refs if r.startswith("__txn_")]


def test_fuzz_transactions_model_check(spark, tmp_path):
    """Randomized multi-table transactions vs a dict model: random
    insert/update/delete batches across 3 tables, a rival writer
    interleaving 30% of the time between staging and commit. Committed
    transactions apply their WHOLE op set to the model; conflicted ones
    apply NOTHING (the rival's row alone lands). After every round, all
    three tables equal the model and no transaction branch survives."""
    import random

    from minio_iceberg_polaris_lakehouse_spark.warehouse import Warehouse

    rng = random.Random(7)
    wh = Warehouse(spark, str(tmp_path / "fuzzwh"))
    names = ["a", "b", "c"]
    model: dict[str, dict[int, int]] = {}
    next_id = 1000
    for n in names:
        t = wh.create_table("db", n, "id int, v int")
        seed = [(i, i * 10) for i in range(1, 4)]
        t.insert_values(seed)
        model[n] = dict(seed)

    def check():
        for n in names:
            got = {r.id: r.v for r in wh.table("db", n).read().collect()}
            assert got == model[n], (n, got, model[n])
            refs = wh.table("db", n)._meta().get("refs", {})
            assert not [r for r in refs if r.startswith("__txn_")]

    for _round in range(10):
        touched = rng.sample(names, rng.randint(1, 3))
        txn = wh.transaction()
        # the transaction's read-your-writes view, mirrored exactly: ops
        # chain on the branch, so targets are chosen from (and applied
        # to) the PENDING state — same-transaction inserts are fair game
        pending = {n: dict(model[n]) for n in touched}
        for n in touched:
            h = txn.table("db", n)
            for _ in range(rng.randint(1, 2)):
                kind = rng.choice(["insert", "update", "delete"])
                if kind == "insert" or not pending[n]:
                    next_id += 1
                    val = rng.randint(0, 99)
                    h.insert_values([(next_id, val)])
                    pending[n][next_id] = val
                elif kind == "update":
                    k = rng.choice(sorted(pending[n]))
                    d = rng.randint(1, 9)
                    h.update_where({"v": f"v + {d}"}, f"id = {k}")
                    pending[n][k] += d
                else:
                    k = rng.choice(sorted(pending[n]))
                    h.delete_where(f"id = {k}")
                    pending[n].pop(k)
        rival = None
        if rng.random() < 0.3:
            rn = rng.choice(touched)
            next_id += 1
            rival = (rn, next_id, rng.randint(0, 99))
            wh.table("db", rn).insert_values([(next_id, rival[2])])
        try:
            txn.commit()
            committed = True
        except CommitConflictError:
            committed = False
        assert committed == (rival is None)  # rival ⇒ conflict, else clean
        if rival is not None:
            model[rival[0]][rival[1]] = rival[2]
        if committed:
            for n in touched:
                model[n] = pending[n]
        check()


# ---------------------------------------------------------------- REST


@pytest.fixture()
def server(tmp_path):
    srv, port = make_server(str(tmp_path), CID, SECRET)
    yield f"http://127.0.0.1:{port}", str(tmp_path)
    srv.shutdown()


def _loc(tab):
    hint = open(os.path.join(tab.path, "metadata", "version-hint.text")).read()
    return os.path.join(tab.path, "metadata", f"v{hint}.metadata.json")


def test_rest_commit_transaction_atomic(server, spark):
    """Iceberg REST commitTransaction: one request swaps BOTH tables'
    pointers under the catalog mutex."""
    url, root = server
    cli = RestCatalogClient(url, CID, SECRET)
    cli.create_catalog("cat", root + "/cat")
    cli.create_namespace("cat", "db")
    cli.create_table("cat", "db", "x", "id int")
    cli.create_table("cat", "db", "y", "id int")
    wh = Warehouse(spark, root + "/cat")
    tx, ty = wh.table("db", "x"), wh.table("db", "y")
    base_x = cli.load_table("cat", "db", "x")["metadata-location"]
    base_y = cli.load_table("cat", "db", "y")["metadata-location"]
    tx.insert_values([(1,)])
    ty.insert_values([(2,)])
    cli.commit_transaction(
        "cat",
        [("db", "x", base_x, _loc(tx)), ("db", "y", base_y, _loc(ty))],
    )
    assert cli.load_table("cat", "db", "x")["metadata-location"] == _loc(tx)
    assert cli.load_table("cat", "db", "y")["metadata-location"] == _loc(ty)


def test_rest_commit_transaction_all_or_nothing_on_conflict(server, spark):
    """A stale requirement on the SECOND table 409s the whole request —
    the first table's pointer must not move either."""
    url, root = server
    cli = RestCatalogClient(url, CID, SECRET)
    cli.create_catalog("cat", root + "/cat")
    cli.create_namespace("cat", "db")
    cli.create_table("cat", "db", "x", "id int")
    cli.create_table("cat", "db", "y", "id int")
    wh = Warehouse(spark, root + "/cat")
    tx, ty = wh.table("db", "x"), wh.table("db", "y")
    base_x = cli.load_table("cat", "db", "x")["metadata-location"]
    base_y = cli.load_table("cat", "db", "y")["metadata-location"]
    # a rival moves y's pointer first
    ty.insert_values([(99,)])
    cli.commit_table("cat", "db", "y", base_y, _loc(ty))
    moved_y = cli.load_table("cat", "db", "y")["metadata-location"]
    tx.insert_values([(1,)])
    ty.insert_values([(2,)])
    with pytest.raises(CommitConflict):
        cli.commit_transaction(
            "cat",
            [("db", "x", base_x, _loc(tx)), ("db", "y", base_y, _loc(ty))],
        )
    # neither pointer moved: x still at base, y still at the rival's
    assert cli.load_table("cat", "db", "x")["metadata-location"] == base_x
    assert cli.load_table("cat", "db", "y")["metadata-location"] == moved_y


def test_mid_publish_failure_preserves_staged_branches(wh, monkeypatch):
    """A failure AFTER phase 2 has begun (some tables fast-forwarded)
    must NOT drop the unpublished tables' staged branches — that work
    would be irrecoverable. The commit raises a torn-state error naming
    the published tables and the surviving branch."""
    from minio_iceberg_polaris_lakehouse_spark.warehouse import Table

    txn = wh.transaction()
    txn.table("db", "a").insert_values([(2, "a2")])
    txn.table("db", "b").insert_values([(2, "b2")])
    real_ff = Table._fast_forward_locked
    calls = {"publish": 0}

    def flaky(self, branch, check_only=False):
        if not check_only:
            calls["publish"] += 1
            if calls["publish"] == 2:  # second table's publish dies (IO)
                raise OSError("disk gone")
        return real_ff(self, branch, check_only=check_only)

    monkeypatch.setattr(Table, "_fast_forward_locked", flaky)
    with pytest.raises(TransactionError, match="MID-PUBLISH") as ei:
        txn.commit()
    assert "db.a" in str(ei.value) and "db.b" in str(ei.value)
    monkeypatch.undo()
    # table a published; table b did not, but its staged branch survives
    assert (2, "a2") in _vals(wh.table("db", "a"))
    b = wh.table("db", "b")
    assert (2, "b2") not in _vals(b)
    branch = str(ei.value).split("branch '")[1].split("'")[0]
    staged = sorted((r.id, r.v) for r in b.read(version=branch).collect())
    assert (2, "b2") in staged  # manual fast-forward/repair is possible
    b.fast_forward(branch)
    assert (2, "b2") in _vals(b)


def test_committed_metadata_stops_advertising_txn_branch(wh):
    """After a clean commit the exported open metadata must not keep the
    dropped __txn_* ref (a stale advertised branch would dangle for any
    foreign reader until some later commit rewrote the document)."""
    import json

    from minio_iceberg_polaris_lakehouse_spark import fsio
    from minio_iceberg_polaris_lakehouse_spark.sources.iceberg_reader import (
        resolve_metadata_path,
    )

    with wh.transaction() as txn:
        txn.table("db", "a").insert_values([(3, "a3")])
    md = json.loads(fsio.read_text(resolve_metadata_path(wh.table("db", "a").path)))
    assert not any(r.startswith("__txn_") for r in md.get("refs", {}))
