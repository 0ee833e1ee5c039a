"""Breadth batch 4: GROUPING SETS, UNPIVOT, distribution windows
(cume_dist / percent_rank), map-typed columns, and bitwise functions.

All SQL-expressible → every query here carries a DuckDB oracle. Reference
parity note: the reference's engine is stock Spark SQL (reference:
workspace/notebooks/iceberg_queries.ipynb:291-299), so each of these runs
unchanged on its stack; they widen SURVEY.md §2.4/2.5/2.8 coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from minio_iceberg_polaris_lakehouse_spark.registry import register
from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table


@register(
    "rel_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(26,8))) AS DOUBLE) AS total,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def rel_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup nor cube): per-status totals,
    per-priority totals, and the grand total in one pass — Spark expands
    to a single Expand + one aggregate, not three scans."""
    # collision-proof view name: registering this as plain "orders" would
    # shadow the session-wide corpus view of the same name for every
    # later unqualified query in the session
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_rel_gsets_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(26,8))) AS DOUBLE) AS total,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
        FROM _rel_gsets_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


@register(
    "rel_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, val FROM (
        SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS val
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem) t
    WHERE l_orderkey <= 100
    ORDER BY l_orderkey, l_linenumber, metric
    """,
)
def rel_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long UNPIVOT (melt): three measure columns become (metric, val)
    rows. Spark's unpivot is a single Expand node — one scan, not a
    UNION ALL of three (the oracle states the equivalent relational
    result the portable way)."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return (
        l.unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice", "l_discount"],
            "metric",
            "val",
        )
        .withColumn("metric", F.regexp_replace("metric", "^l_", ""))
        .orderBy("l_orderkey", "l_linenumber", "metric")
    )


@register(
    "win_cume_dist_percent_rank",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ROUND(cume_dist() OVER w, 6) AS cdist,
           ROUND(percent_rank() OVER w, 6) AS prank
    FROM customer
    WHERE c_custkey <= 300
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    ORDER BY c_custkey
    """,
)
def win_cume_dist_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions. The window orders by (acctbal,
    custkey) — a total order — so rank positions, hence the rational
    cume_dist/percent_rank values, are engine-independent."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
    ).orderBy("c_custkey")


@register(
    "fn_map_suite",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status_val,
           o_orderpriority AS prio_val,
           2 AS map_size,
           'prio' AS second_key
    FROM orders
    WHERE o_orderkey <= 200
    ORDER BY o_orderkey
    """,
)
def fn_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: map_from_arrays construction, element_at
    lookup, size, map_keys. The oracle states the expected *values*
    directly (a map built from known keys must yield exactly these
    lookups), keeping the compared schema map-free and portable."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    m = F.map_from_arrays(
        F.array(F.lit("status"), F.lit("prio")),
        F.array(F.col("o_orderstatus"), F.col("o_orderpriority")),
    )
    return o.select(
        "o_orderkey",
        F.element_at(m, "status").alias("status_val"),
        F.element_at(m, "prio").alias("prio_val"),
        F.size(m).alias("map_size"),
        F.element_at(F.map_keys(m), 2).alias("second_key"),
    ).orderBy("o_orderkey")


@register(
    "fn_bitwise_suite",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 4096 AS with_flag,
           xor(o_orderkey, 21845) AS xored,
           o_orderkey << 2 AS shifted_l,
           o_orderkey >> 3 AS shifted_r,
           CAST(bit_count(o_orderkey) AS INT) AS n_bits
    FROM orders
    WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
)
def fn_bitwise_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator surface (the primitives behind the SimHash /
    LSH signature builders elsewhere in the engine)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft(k, 2).alias("shifted_l"),
        F.shiftright(k, 3).alias("shifted_r"),
        F.bit_count(k).cast("int").alias("n_bits"),
    ).orderBy("o_orderkey")


@register(
    "agg_approx_distinct_gate",
    oracle="""
    SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS exact_orders,
           true AS hll_within_2pct
    FROM orders
    """,
)
def agg_approx_distinct_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based distinct counting with an IN-PLAN accuracy gate (the
    recall-gate pattern the ANN queries use): HyperLogLog++
    (approx_count_distinct, rsd 0.5%) runs next to the exact
    count-distinct on two key columns, and the result row carries the
    claim `|hll - exact| / exact < 0.02` — a sketch drifting out of its
    bound flips the boolean and fails the oracle hash, so the driver
    check certifies the sketch's accuracy, not just that it ran.

    Scale: approx_count_distinct is the 100 TB tool here — a fixed-size
    HLL register set per partition merges map-side (one small sketch
    per partition crosses the exchange, vs count-distinct's shuffle of
    every distinct value); the exact twin exists to gate it at test SF."""
    o = load_table(spark, sf_dir, "orders")
    # exact and sketch run as SEPARATE 1-row aggregates joined after:
    # mixing count_distinct with approx_count_distinct in one agg makes
    # Catalyst plan the multi-distinct Expand strategy, whose
    # intermediate groups carry the HLL register words as thousands of
    # per-group columns (measured: OOMs a 1 GB driver on 15k rows);
    # split, each side is its own partial-aggregated scan
    exact = o.agg(
        F.count_distinct("o_custkey").cast("long").alias("exact_customers"),
        F.count_distinct("o_orderkey").cast("long").alias("exact_orders"),
    )
    approx = o.agg(
        F.approx_count_distinct("o_custkey", 0.005).alias("hc"),
        F.approx_count_distinct("o_orderkey", 0.005).alias("ho"),
    )
    agg = exact.crossJoin(F.broadcast(approx))
    within = (
        F.abs(F.col("hc") - F.col("exact_customers")) / F.col("exact_customers") < 0.02
    ) & (F.abs(F.col("ho") - F.col("exact_orders")) / F.col("exact_orders") < 0.02)
    return agg.select(
        "exact_customers", "exact_orders", within.alias("hll_within_2pct")
    )
