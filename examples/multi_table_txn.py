"""Multi-table transactions, end to end — the atomic cross-table commit
a warehouse consistency contract needs (orders + order_lines must move
together), composed from this engine's pieces:

  1. engine-side transaction          transactions.py (hidden WAP branch
                                      per table, validate-all-then-
                                      publish-all, read-your-writes)
  2. conflict detection               a rival commit mid-transaction
                                      aborts the WHOLE transaction
  3. row lineage across the commit    Iceberg v3 _row_id stays stable
                                      through the transactional UPDATE
  4. catalog-atomic variant           the loopback REST catalog's
                                      commitTransaction swaps BOTH
                                      pointers under one mutex

Run:  python examples/multi_table_txn.py  [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    from pyspark.sql import SparkSession

    from minio_iceberg_polaris_lakehouse_spark.rest_catalog import (
        RestCatalogClient,
        make_server,
    )
    from minio_iceberg_polaris_lakehouse_spark.warehouse import (
        CommitConflictError,
        Warehouse,
    )

    root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="txn_")
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("multi-table-txn")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    wh = Warehouse(spark, os.path.join(root, "wh"))
    wh.create_namespace("sales")
    orders = wh.create_table("sales", "orders", "order_id int, status string")
    lines = wh.create_table("sales", "order_lines", "order_id int, qty int")
    orders.insert_values([(1, "open")])
    lines.insert_values([(1, 5)])

    # -- 1+3: one transaction updates the order AND appends its lines --
    with wh.transaction() as txn:
        txn.table("sales", "orders").update_where(
            {"status": "'shipped'"}, "order_id = 1"
        )
        txn.table("sales", "order_lines").insert_values([(1, 2)])
        # invisible to main readers until the block exits
        assert orders.read().filter("status = 'shipped'").count() == 0
    assert orders.read().filter("status = 'shipped'").count() == 1
    assert lines.read().count() == 2
    rid = orders.read(lineage=True).collect()[0]._row_id
    print(f"txn committed atomically; order kept _row_id={rid} through UPDATE")

    # -- 2: a rival commit between stage and commit aborts EVERYTHING --
    txn = wh.transaction()
    txn.table("sales", "orders").update_where({"status": "'lost'"}, "order_id = 1")
    txn.table("sales", "order_lines").insert_values([(1, 99)])
    orders.insert_values([(2, "open")])  # rival wins the race
    try:
        txn.commit()
        raise AssertionError("conflict not detected")
    except CommitConflictError:
        pass
    assert orders.read().filter("status = 'lost'").count() == 0
    assert lines.read().filter("qty = 99").count() == 0
    print("rival commit detected: transaction aborted, zero tables published")

    # -- 4: the same contract at the catalog — REST commitTransaction --
    srv, port = make_server(root, "client-id-0123", "secret-0123")
    try:
        cli = RestCatalogClient(
            f"http://127.0.0.1:{port}", "client-id-0123", "secret-0123"
        )
        cli.create_catalog("cat", os.path.join(root, "cat"))
        cli.create_namespace("cat", "db")
        cli.create_table("cat", "db", "x", "id int")
        cli.create_table("cat", "db", "y", "id int")
        cwh = Warehouse(spark, os.path.join(root, "cat"))
        tx, ty = cwh.table("db", "x"), cwh.table("db", "y")
        base_x = cli.load_table("cat", "db", "x")["metadata-location"]
        base_y = cli.load_table("cat", "db", "y")["metadata-location"]
        tx.insert_values([(1,)])
        ty.insert_values([(2,)])

        def loc(tab):
            hint = open(
                os.path.join(tab.path, "metadata", "version-hint.text")
            ).read()
            return os.path.join(tab.path, "metadata", f"v{hint}.metadata.json")

        cli.commit_transaction(
            "cat", [("db", "x", base_x, loc(tx)), ("db", "y", base_y, loc(ty))]
        )
        assert cli.load_table("cat", "db", "x")["metadata-location"] == loc(tx)
        print("REST commitTransaction swapped both pointers atomically")
    finally:
        srv.shutdown()

    print("multi-table transaction demo complete")


if __name__ == "__main__":
    main()
