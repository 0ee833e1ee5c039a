"""Getting started — the reference stack's first-session flow, end to
end on this engine (reference workspace/notebooks/getting_started.ipynb
+ setup-polaris.sh, replayed against the PySpark-native implementation).

What the reference does with four containers (Spark + Polaris + MinIO +
Jupyter), this script does in one process:

1. bootstrap a (loopback) Polaris-shaped REST catalog: OAuth token →
   create catalog → list catalogs            [setup-polaris.sh:17-75]
2. run the notebook's SQL through the engine's SQL front-end:
   CREATE NAMESPACE / CREATE TABLE / INSERT / SELECT / DESCRIBE /
   time travel / snapshots                  [getting_started.ipynb]
3. read the table back through the OPEN metadata alone — REST
   loadTable → vN.metadata.json → Avro manifests → parquet — with the
   standalone reader (no engine internals)  [README.md:169-178]

Run:  python examples/getting_started.py  [warehouse_dir]
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
    from minio_iceberg_polaris_lakehouse_spark.sources.iceberg_reader import (
        read_iceberg_table,
    )
    from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL

    root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="lakehouse_")
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("getting-started")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # -- 1. Polaris-shaped bootstrap (loopback) --------------------------
    srv, port = make_server(root, "30d861989a2b1605", "c93e64ae4132ecb1")
    cli = RestCatalogClient(f"http://127.0.0.1:{port}", "30d861989a2b1605", "c93e64ae4132ecb1")
    print("[1/3] OAuth token obtained")
    cli.create_catalog("my_catalog", os.path.join(root, "my_catalog"))
    print("      catalogs:", cli.list_catalogs())

    # -- 2. the notebook's SQL, statement for statement ------------------
    lake = LakehouseSQL(spark, os.path.join(root, "my_catalog"))
    lake.sql("CREATE NAMESPACE IF NOT EXISTS polaris.test_db")
    lake.sql(
        "CREATE TABLE IF NOT EXISTS polaris.test_db.test_table (id INT, name STRING) USING iceberg"
    )
    lake.sql("INSERT INTO polaris.test_db.test_table VALUES (1, 'Hello'), (2, 'World')")
    print("[2/3] notebook flow:")
    lake.sql("SELECT * FROM polaris.test_db.test_table").show()
    lake.sql("SELECT COUNT(*) AS total FROM polaris.test_db.test_table").show()
    lake.sql("INSERT INTO polaris.test_db.test_table VALUES (3, 'Lakehouse')")
    lake.sql("SELECT * FROM polaris.test_db.test_table VERSION AS OF 1").show()
    lake.sql("SELECT snapshot_id, operation FROM polaris.test_db.test_table.snapshots").show()

    # -- 3. open-format readback: catalog pointer -> standalone reader ---
    tab = lake.wh.table("test_db", "test_table")
    hint = open(os.path.join(tab.path, "metadata", "version-hint.text")).read()
    new_loc = os.path.join(tab.path, "metadata", f"v{hint}.metadata.json")
    cli.create_namespace("my_catalog", "test_db")
    cli.create_table("my_catalog", "test_db", "registered", "id int")  # catalog CRUD demo
    print("[3/3] open-format readback via metadata alone:")
    read_iceberg_table(spark, new_loc).orderBy("id").show()

    srv.shutdown()
    print(f"done — warehouse at {root}")


if __name__ == "__main__":
    main()
