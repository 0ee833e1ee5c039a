"""CDC-to-lakehouse, end to end — the streaming upsert loop a change-data
feed drives, composed from this engine's pieces:

  1. row identity + upsert routing       ALTER TABLE ... SET IDENTIFIER
                                         FIELDS / write.upsert.enabled
  2. streaming upsert sink               streaming/table_sink.py
                                         (exactly-once batch dedup)
  3. incremental materialized view       matview.py (folds the upserts'
                                         delete+insert changelog deltas)
  4. CDC changelog readout               Table.changes()
  5. open-format handoff                 the same table read back by the
                                         standalone Iceberg reader, then
                                         UPSERTed from OUTSIDE the engine
                                         (raw content=2 equality deletes)

Run:  python examples/cdc_upsert_pipeline.py  [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    from pyspark.sql import SparkSession

    from minio_iceberg_polaris_lakehouse_spark.sources.iceberg_reader import (
        read_iceberg_table,
    )
    from minio_iceberg_polaris_lakehouse_spark.sources.iceberg_writer import (
        upsert_iceberg_table,
    )
    from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL
    from minio_iceberg_polaris_lakehouse_spark.streaming.table_sink import TableSink

    root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="cdc_")
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("cdc-upsert")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # -- 1. a keyed table: identity declared, INSERTs route as upserts --
    lake = LakehouseSQL(spark, os.path.join(root, "wh"))
    lake.sql("CREATE TABLE polaris.crm.accounts (id INT, tier STRING, mrr INT) USING iceberg")
    lake.sql("ALTER TABLE crm.accounts SET IDENTIFIER FIELDS id")
    lake.sql("ALTER TABLE crm.accounts SET TBLPROPERTIES ('write.upsert.enabled'='true')")
    lake.sql("INSERT INTO crm.accounts VALUES (1, 'free', 0), (2, 'pro', 49), (3, 'pro', 49)")
    tab = lake.wh.table("crm", "accounts")
    print("[1/5] seeded", tab.read().count(), "accounts")

    # -- 2. a CDC feed: micro-batches through the exactly-once upsert sink
    sink = TableSink(tab, "crm-cdc", mode="upsert")
    sink.write_batch(
        spark.createDataFrame([(2, "enterprise", 499), (4, "free", 0)], tab.schema()), 0
    )
    sink.write_batch(spark.createDataFrame([(4, "pro", 49)], tab.schema()), 1)
    sink.write_batch(spark.createDataFrame([(4, "pro", 49)], tab.schema()), 1)  # replay: no-op
    print("[2/5] after 2 CDC batches (+1 deduped replay):")
    tab.read().orderBy("id").show()

    # -- 3. a materialized view folds the upserts' delta changelog ------
    lake.sql(
        "CREATE MATERIALIZED VIEW crm.mrr_by_tier AS "
        "SELECT tier, SUM(mrr) AS total_mrr, COUNT(*) AS n "
        "FROM crm.accounts GROUP BY tier"
    )
    sink.write_batch(spark.createDataFrame([(1, "pro", 49)], tab.schema()), 2)
    mode = lake.sql("REFRESH MATERIALIZED VIEW crm.mrr_by_tier").collect()[0].mode
    print(f"[3/5] MV refreshed ({mode}):")
    lake.sql("SELECT * FROM crm.mrr_by_tier ORDER BY tier").show()

    # -- 4. the CDC changelog a downstream consumer would apply ----------
    print("[4/5] changelog of the last upsert (delete old + insert new):")
    tab.changes(from_version=tab.current_snapshot_id() - 1).orderBy(
        "id", "_change_type"
    ).show()

    # -- 5. open-format handoff: read AND upsert from outside the engine -
    outside = read_iceberg_table(spark, tab.path)
    assert sorted(map(tuple, outside.collect())) == sorted(map(tuple, tab.read().collect()))
    upsert_iceberg_table(
        spark, tab.path, spark.createDataFrame([(3, "enterprise", 499)], tab.schema())
    )
    print("[5/5] after a FOREIGN upsert (raw content=2 equality delete):")
    read_iceberg_table(spark, tab.path).orderBy("id").show()
    print("done:", root)


if __name__ == "__main__":
    main()
