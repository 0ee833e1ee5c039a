"""Tour of the SQL dialect surface — the modern-warehouse clauses this
engine adds on top of stock Spark SQL, each rewritten into standard
Catalyst plans (sql_frontend.py) and oracle-checked against DuckDB
running the identical clause text natively:

  1. QUALIFY                 window filter sugar (rel_qualify_topn),
                             incl. predicates over UNPROJECTED base
                             columns (rel_qualify_unprojected) and the
                             reserved-word contract (identifiers named
                             qualify keep working)
  2. ASOF [LEFT] JOIN        most-recent-at-or-before match, incl. a
                             chained join after it
  3. star EXCLUDE / REPLACE  projection modifiers
  4. GROUP BY ALL / ORDER BY ALL  (native Spark 4; rel_groupby_all)
  5. WITH RECURSIVE          bounded-depth graph walk (native Spark 4)
  6. LATERAL                 correlated top-1 per outer row (native)
  7. VERSION AS OF           time travel over the same tables
  8. SELECT DISTINCT ON      first row per key group in ORDER BY order
                             (rel_distinct_on; desugars into QUALIFY)
  9. FROM-first syntax       `FROM t SELECT x`; bare `FROM t` = SELECT *
                             (rel_from_first; composes with every other
                             clause above, and as an INSERT source)
 10. UNION [ALL] BY NAME     name-aligned set union, NULL-filling absent
                             columns (rel_union_by_name); also INSERT
                             INTO t BY NAME <query> for name-aligned DML
 11. PIVOT / UNPIVOT         standalone statement forms with
                             auto-detected pivot values
                             (rel_pivot_statement)
 12. COLUMNS('regex')        star expression: apply one expression to
                             every matching column (rel_columns_regex)

The keywords are contextually reserved exactly as in DuckDB — the full
contract is in sql_frontend.py's module docstring.

Run:  python examples/sql_dialect_tour.py  [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    from minio_iceberg_polaris_lakehouse_spark.session import get_spark
    from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL

    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="lh_tour_")
    spark = get_spark(app_name="sql-dialect-tour", shuffle_partitions=4)
    lake = LakehouseSQL(spark, workdir)

    lake.sql("CREATE TABLE polaris.shop.sales (region STRING, rep STRING, amt INT) USING ICEBERG")
    lake.sql(
        "INSERT INTO shop.sales VALUES "
        "('eu', 'ada', 120), ('eu', 'bob', 90), ('eu', 'cyd', 200), "
        "('us', 'dee', 310), ('us', 'eli', 150), ('us', 'fay', 40)"
    )
    lake.sql("CREATE TABLE polaris.shop.fx (ccy STRING, ts INT, rate DOUBLE) USING ICEBERG")
    lake.sql(
        "INSERT INTO shop.fx VALUES "
        "('EUR', 1, 1.05), ('EUR', 5, 1.10), ('USD', 2, 1.00)"
    )
    lake.sql("CREATE TABLE polaris.shop.trades (ccy STRING, ts INT, qty INT) USING ICEBERG")
    lake.sql("INSERT INTO shop.trades VALUES ('EUR', 3, 10), ('EUR', 7, 20), ('USD', 1, 5)")

    print("== 1. QUALIFY: top-2 reps per region ==")
    lake.sql(
        "SELECT region, rep, amt, "
        "ROW_NUMBER() OVER (PARTITION BY region ORDER BY amt DESC) AS rn "
        "FROM shop.sales QUALIFY rn <= 2 ORDER BY region, rn"
    ).show()

    print("== 1b. QUALIFY over an UNPROJECTED base column ==")
    # region/amt drive the window but only rep is selected — the rewrite
    # projects them into the inner subquery and folds them back out
    lake.sql(
        "SELECT rep FROM shop.sales "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY region ORDER BY amt DESC) = 1 "
        "ORDER BY rep"
    ).show()

    print("== 1c. reserved exactly as in DuckDB: a column NAMED qualify ==")
    lake.sql("CREATE TABLE polaris.shop.audit (qualify INT, note STRING) USING ICEBERG")
    lake.sql("INSERT INTO shop.audit VALUES (1, 'ok'), (2, 'check')")
    lake.sql("SELECT qualify, note FROM shop.audit WHERE qualify = 2").show()

    print("== 1d. QUALIFY with a named WINDOW clause ==")
    lake.sql(
        "SELECT rep FROM shop.sales "
        "WINDOW w AS (PARTITION BY region ORDER BY amt DESC) "
        "QUALIFY ROW_NUMBER() OVER w = 1 ORDER BY rep"
    ).show()

    print("== 2. ASOF JOIN: each trade priced at the latest prior fx rate ==")
    lake.sql(
        "SELECT t.ccy, t.ts, t.qty, f.ts AS rate_ts, f.rate "
        "FROM shop.trades t ASOF JOIN shop.fx f "
        "ON t.ccy = f.ccy AND t.ts >= f.ts ORDER BY t.ccy, t.ts"
    ).show()
    print("   (ASOF LEFT JOIN keeps trades with no prior rate, NULL-padded)")

    print("== 2b. ASOF JOIN chained with a plain join ==")
    lake.sql("CREATE TABLE polaris.shop.ccy_names (ccy STRING, nm STRING) USING ICEBERG")
    lake.sql("INSERT INTO shop.ccy_names VALUES ('EUR', 'euro'), ('USD', 'dollar')")
    lake.sql(
        "SELECT t.ccy, n.nm, t.ts, f.rate FROM shop.trades t "
        "ASOF JOIN shop.fx f ON t.ccy = f.ccy AND t.ts >= f.ts "
        "JOIN shop.ccy_names n ON n.ccy = t.ccy ORDER BY t.ccy, t.ts"
    ).show()

    print("== 3. star EXCLUDE / REPLACE ==")
    lake.sql(
        "SELECT * EXCLUDE (rep) REPLACE (amt * 100 AS amt) "
        "FROM shop.sales ORDER BY region, amt LIMIT 3"
    ).show()

    print("== 4. GROUP BY ALL / ORDER BY ALL (native Spark 4) ==")
    lake.sql(
        "SELECT region, COUNT(*) AS reps, SUM(amt) AS total "
        "FROM shop.sales GROUP BY ALL ORDER BY ALL"
    ).show()

    print("== 5. WITH RECURSIVE: org chart depth ==")
    lake.sql("CREATE TABLE polaris.shop.org (emp STRING, boss STRING) USING ICEBERG")
    lake.sql(
        "INSERT INTO shop.org VALUES ('ada', NULL), ('bob', 'ada'), "
        "('cyd', 'bob'), ('dee', 'bob')"
    )
    lake.sql(
        "WITH RECURSIVE chain AS ("
        "  SELECT emp, 0 AS depth FROM shop.org WHERE boss IS NULL "
        "  UNION ALL "
        "  SELECT o.emp, c.depth + 1 FROM shop.org o JOIN chain c ON o.boss = c.emp"
        ") SELECT * FROM chain ORDER BY depth, emp"
    ).show()

    print("== 6. LATERAL: best rep per region, correlated top-1 ==")
    lake.sql(
        "SELECT r.region, b.rep, b.amt FROM "
        "(SELECT DISTINCT region FROM shop.sales) r, "
        "LATERAL (SELECT rep, amt FROM shop.sales s WHERE s.region = r.region "
        "ORDER BY amt DESC LIMIT 1) b ORDER BY r.region"
    ).show()

    print("== 7. time travel: sales before the second insert ==")
    lake.sql("INSERT INTO shop.sales VALUES ('ap', 'gil', 75)")
    first = lake.sql("SELECT snapshot_id FROM shop.sales.snapshots ORDER BY committed_at").collect()[0][0]
    n_then = lake.sql(f"SELECT COUNT(*) AS n FROM shop.sales VERSION AS OF {first}").collect()[0].n
    n_now = lake.sql("SELECT COUNT(*) AS n FROM shop.sales").collect()[0].n
    print(f"   rows at first snapshot: {n_then}; rows now: {n_now}")

    print("== 8. DISTINCT ON: each region's top sale ==")
    lake.sql(
        "SELECT DISTINCT ON (region) region, rep, amt "
        "FROM shop.sales ORDER BY region, amt DESC"
    ).show()

    print("== 9. FROM-first: the FROM clause leads, SELECT optional ==")
    lake.sql("FROM shop.sales WHERE amt >= 200").show()
    lake.sql(
        "FROM shop.sales SELECT region, COUNT(*) AS reps GROUP BY region "
        "ORDER BY region"
    ).show()
    print("   (also as an INSERT source: INSERT INTO t FROM s)")

    print("== 10. UNION ALL BY NAME: branches align by column NAME ==")
    lake.sql(
        "SELECT region, rep FROM shop.sales WHERE amt > 250 "
        "UNION ALL BY NAME "
        "SELECT rep, region FROM shop.sales WHERE amt < 50 "
        "ORDER BY region, rep"
    ).show()

    print("== 11. PIVOT: reps-per-region counts spread into columns ==")
    lake.sql(
        "PIVOT shop.sales ON region USING COUNT(*) AS reps "
        "GROUP BY rep ORDER BY rep LIMIT 4"
    ).show()

    print("== 12. COLUMNS('regex'): one aggregate over every match ==")
    lake.sql("SELECT max(COLUMNS('re.*')) FROM shop.sales").show()
    print("dialect tour complete")


if __name__ == "__main__":
    main()
