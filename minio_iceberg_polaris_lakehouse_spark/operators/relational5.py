"""Breadth batch 5: recursive CTEs and LATERAL correlated subqueries —
the two big ANSI SELECT features Spark gained in 4.x that the reference's
stack (stock Spark SQL, reference workspace/notebooks/
iceberg_queries.ipynb:291-299) picks up by upgrading, so a user of the
reference expects them from this engine's SQL surface too.

Both are SQL-expressible → DuckDB oracles.

Scale design: a bounded-depth recursive CTE executes as one frontier
join + union per level — each level is an equi-join on the recursion
key (shuffle on `src`), never a cartesian, and the depth bound keeps the
plan finite and predictable at 100 TB (same shape as the pagerank loop,
operators/pagerank.py). The LATERAL top-1 decorrelates into a window
rank over the joined child — one exchange, no per-row re-execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minio_iceberg_polaris_lakehouse_spark.registry import register
from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table


@register(
    "rel_recursive_reachability",
    oracle="""
    WITH RECURSIVE edges AS (
        SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE l.l_quantity >= 49 AND c.c_nationkey <> s.s_nationkey
    ), hops AS (
        SELECT CAST(0 AS INT) AS nation, 0 AS d
        UNION ALL
        SELECT e.dst AS nation, h.d + 1 AS d
        FROM hops h JOIN edges e ON e.src = h.nation
        WHERE h.d < 3
    )
    SELECT nation, CAST(MIN(d) AS INT) AS min_hops
    FROM hops GROUP BY nation ORDER BY nation
    """,
)
def rel_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE over the trade graph: min-hop distance from nation 0
    through high-volume trade edges (distinct customer-nation →
    supplier-nation pairs with l_quantity >= 49), depth-bounded at 3.
    Each recursion level is one frontier⋈edges equi-join — the edges
    relation is nation×nation (≤ 625 rows at any SF, broadcastable), so
    the recursion cost is O(levels), independent of fact size; the fact
    scan happens once to build the edge list."""
    for t in ("lineitem", "orders", "customer", "supplier"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"_rec_{t}")
    return spark.sql(
        """
        WITH RECURSIVE edges AS (
            SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
            FROM _rec_lineitem l
            JOIN _rec_orders o ON l.l_orderkey = o.o_orderkey
            JOIN _rec_customer c ON o.o_custkey = c.c_custkey
            JOIN _rec_supplier s ON l.l_suppkey = s.s_suppkey
            WHERE l.l_quantity >= 49 AND c.c_nationkey <> s.s_nationkey
        ), hops AS (
            SELECT CAST(0 AS INT) AS nation, 0 AS d
            UNION ALL
            SELECT e.dst AS nation, h.d + 1 AS d
            FROM hops h JOIN edges e ON e.src = h.nation
            WHERE h.d < 3
        )
        SELECT nation, CAST(MIN(d) AS INT) AS min_hops
        FROM hops GROUP BY nation ORDER BY nation
        """
    )


@register(
    "rel_lateral_topk",
    oracle="""
    SELECT r.r_name, l.n_name, l.cust_cnt
    FROM region r,
    LATERAL (
        SELECT n.n_name, CAST(COUNT(c.c_custkey) AS BIGINT) AS cust_cnt
        FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
        WHERE n.n_regionkey = r.r_regionkey
        GROUP BY n.n_name
        ORDER BY cust_cnt DESC, n.n_name
        LIMIT 1
    ) l
    ORDER BY r.r_name
    """,
)
def rel_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery with ORDER BY ... LIMIT 1: per region,
    the nation with the most customers (ties broken by name). Catalyst
    decorrelates the lateral into a join + per-group window limit — one
    plan, no per-outer-row re-execution; the oracle states the identical
    LATERAL form DuckDB executes natively."""
    load_table(spark, sf_dir, "region").createOrReplaceTempView("_lat_region")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("_lat_nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_lat_customer")
    return spark.sql(
        """
        SELECT r.r_name, l.n_name, l.cust_cnt
        FROM _lat_region r,
        LATERAL (
            SELECT n.n_name, COUNT(c.c_custkey) AS cust_cnt
            FROM _lat_nation n JOIN _lat_customer c ON c.c_nationkey = n.n_nationkey
            WHERE n.n_regionkey = r.r_regionkey
            GROUP BY n.n_name
            ORDER BY cust_cnt DESC, n.n_name
            LIMIT 1
        ) l
        ORDER BY r.r_name
        """
    )


@register(
    "rel_qualify_topn",
    oracle="""
    SELECT n.n_regionkey AS region, n.n_name AS nation,
           CAST(COUNT(c.c_custkey) AS BIGINT) AS cust_cnt,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY n.n_regionkey
               ORDER BY COUNT(c.c_custkey) DESC, n.n_name) AS INT) AS rn
    FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_regionkey, n.n_name
    QUALIFY rn <= 2
    ORDER BY region, rn
    """,
)
def rel_qualify_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY — the window-filter clause of DuckDB/Snowflake/BigQuery
    that Spark SQL lacks: per-region top-2 nations by customer count,
    written WITH the clause and rewritten by sql_frontend.qualify_sql
    into standard SQL (inner projection of the predicate as a boolean
    column + outer filter + `* EXCEPT`) that Catalyst runs unchanged.
    The oracle is the IDENTICAL QUALIFY text DuckDB executes natively,
    so the hash proves the rewrite's semantics match the dialect that
    defines the clause — alias references included (`rn` is a
    select-list alias over a window over a grouped aggregate). Plan
    shape: one aggregate exchange + one window over it + a filter —
    the same WindowGroupLimit-eligible top-k form as win_top3."""
    from minio_iceberg_polaris_lakehouse_spark.sql_frontend import qualify_sql

    load_table(spark, sf_dir, "nation").createOrReplaceTempView("_qf_nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_qf_customer")
    return spark.sql(
        qualify_sql(
            """
            SELECT n.n_regionkey AS region, n.n_name AS nation,
                   CAST(COUNT(c.c_custkey) AS BIGINT) AS cust_cnt,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY n.n_regionkey
                       ORDER BY COUNT(c.c_custkey) DESC, n.n_name) AS INT) AS rn
            FROM _qf_nation n JOIN _qf_customer c ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_regionkey, n.n_name
            QUALIFY rn <= 2
            ORDER BY region, rn
            """
        )
    )


_ASOF_TEXT = """
    SELECT p.event_id, p.user_id, c.ts AS click_ts
    FROM (SELECT event_id, user_id, ts FROM {events} WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT user_id, ts FROM {events} WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
"""


@register(
    "rel_asof_join_sql",
    oracle=_ASOF_TEXT.format(events="events"),
)
def rel_asof_join_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB-style ASOF JOIN through the SQL surface: for each
    purchase, the single click row of the same user with the greatest
    ts at-or-before it — INNER semantics (purchases with no prior click
    drop). The statement is rewritten by sql_frontend.asof_sql into a
    LATERAL top-1 Catalyst decorrelates (join + WindowGroupLimit); the
    oracle is the IDENTICAL ASOF JOIN text DuckDB executes natively, so
    the hash proves the rewrite matches the dialect that defines the
    clause. Scale note (also in the rewriter's docstring): Catalyst's
    decorrelation domain-joins DISTINCT left timestamps — exact, fine
    for dimension-sized sides; the billion×billion as-of path is the
    union+carry operator `rel_asof_join` (one shuffle, no inequality
    join), which implements the same semantics LEFT-joined."""
    from minio_iceberg_polaris_lakehouse_spark.sql_frontend import asof_sql

    load_table(spark, sf_dir, "events").createOrReplaceTempView("_asql_events")
    return spark.sql(asof_sql(_ASOF_TEXT.format(events="_asql_events")))


_STAR_TEXT = """
    SELECT * EXCLUDE (n_regionkey) REPLACE (UPPER(n_name) AS n_name)
    FROM {nation} ORDER BY n_nationkey
"""


@register(
    "rel_star_exclude_replace",
    oracle=_STAR_TEXT.format(nation="nation"),
)
def rel_star_exclude_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB/Snowflake star modifiers through the SQL surface:
    `* EXCLUDE (col) REPLACE (expr AS col)` rewrites
    (sql_frontend.dialect_sql) into Spark's native `* EXCEPT` with the
    two column lists merged and the replacement expressions appended.
    The oracle is the IDENTICAL modifier text DuckDB executes natively;
    the driver's column-name-sorted comparison makes the position
    difference (replaced columns move to the end) invisible, exactly
    as documented in the rewriter."""
    from minio_iceberg_polaris_lakehouse_spark.sql_frontend import dialect_sql

    load_table(spark, sf_dir, "nation").createOrReplaceTempView("_star_nation")
    return spark.sql(dialect_sql(_STAR_TEXT.format(nation="_star_nation")))


_QUNPROJ_TEXT = """
    SELECT o_orderkey, o_totalprice
    FROM {orders}
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY o_custkey
        ORDER BY o_totalprice DESC, o_orderkey) = 1
    ORDER BY o_orderkey
"""


@register(
    "rel_qualify_unprojected",
    oracle=_QUNPROJ_TEXT.format(orders="orders"),
)
def rel_qualify_unprojected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY over a base column ABSENT from the select list — the
    standard dialect idiom (DuckDB docs' first QUALIFY example has this
    shape): each customer's single most expensive order, with the
    partitioning column o_custkey unprojected. sql_frontend's rewrite
    projects predicate-referenced base columns into the inner subquery
    under _lh_qc{i} helper aliases and folds them back out of the outer
    projection (r10 verdict "What's missing" #1). The oracle is the
    IDENTICAL text DuckDB executes natively, so the hash proves both the
    injection's scoping and that no helper column leaks."""
    from minio_iceberg_polaris_lakehouse_spark.sql_frontend import qualify_sql

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_qu_orders")
    return spark.sql(qualify_sql(_QUNPROJ_TEXT.format(orders="_qu_orders")))


_GBALL_TEXT = """
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM {lineitem}
    GROUP BY ALL
    ORDER BY ALL
"""


@register(
    "rel_groupby_all",
    oracle=_GBALL_TEXT.format(lineitem="lineitem"),
)
def rel_groupby_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL — the DuckDB-origin shorthand Spark
    4.x supports natively (SURVEY §2.15 Q5): identical statement text on
    both engines, so the hash proves the native dialect feature agrees
    with DuckDB's definition (group on every non-aggregate select item;
    order by all output columns left-to-right). Decimal-exact SUM cast
    back to DOUBLE per the registry's determinism rules; plan is the
    same partial-agg + exchange + final-agg as an explicit GROUP BY."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_gba_lineitem")
    return spark.sql(_GBALL_TEXT.format(lineitem="_gba_lineitem"))


_QWIN_TEXT = """
    SELECT o_orderkey, o_totalprice
    FROM {orders}
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    QUALIFY ROW_NUMBER() OVER w = 1
    ORDER BY o_orderkey
"""


@register(
    "rel_qualify_named_window",
    oracle=_QWIN_TEXT.format(orders="orders"),
)
def rel_qualify_named_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY referencing a named WINDOW clause — standard clause order
    puts WINDOW between HAVING and QUALIFY, so the rewrite RELOCATES the
    definition to the subquery wrapper where the predicate's `OVER w`
    resolves (sql_frontend: _WINDOW_CLAUSE_RE extraction), composing
    with unprojected-column injection (o_custkey/o_totalprice inside the
    relocated definition rewrite to the same _lh_qc helpers). The oracle
    is the IDENTICAL text DuckDB executes natively."""
    from minio_iceberg_polaris_lakehouse_spark.sql_frontend import qualify_sql

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_qw_orders")
    return spark.sql(qualify_sql(_QWIN_TEXT.format(orders="_qw_orders")))
