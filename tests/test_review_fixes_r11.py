"""Regression pins for the round-10 verdict + advice findings — all four
are dialect-layer false-positive / misparse classes:

1. The QUALIFY rewrite hijacked identifiers named ``qualify``
   (`SELECT qualify FROM t`, `WHERE qualify = 3` died with mangled-SQL
   parse errors). Fixed by _qualify_plausible: the token is only a
   clause when the head contains a depth-0 FROM and does not end in an
   expression-expecting position.
2. QUALIFY + top-level DISTINCT silently evaluated DISTINCT FIRST,
   diverging from the dialects that define the clause (QUALIFY before
   DISTINCT). r11 made it a named WarehouseError; r12 supports the
   combination directly (DISTINCT moves to the outer projection).
3. ``A ASOF JOIN B ON … JOIN C ON …`` swallowed the chained join into
   the ON condition (misleading inequality-conjunct error), and the
   right-side regex capped subquery paren nesting at two levels. Fixed:
   _ASOF_END_RE cuts at a depth-0 join keyword, the right side parses
   with _balanced_paren_group, and BOTH variants emit explicit
   ``JOIN LATERAL … ON true`` so the chain associates left-deep.
4. _QTAIL_RE only knew ORDER BY/LIMIT/OFFSET; SORT BY / DISTRIBUTE BY /
   CLUSTER BY / WINDOW tails were swallowed into the predicate.

Plus the unprojected-base-column QUALIFY idiom (verdict "What's missing"
#1): predicates may reference base columns absent from the select list —
they are projected into the inner subquery under _lh_qc{i} helpers and
folded back out of the outer projection.
"""

from __future__ import annotations

import pytest

from minio_iceberg_polaris_lakehouse_spark.sql_frontend import (
    LakehouseSQL,
    WarehouseError,
    asof_sql,
    dialect_sql,
    qualify_sql,
)


@pytest.fixture()
def lake(spark, tmp_path):
    return LakehouseSQL(spark, str(tmp_path / "wh"))


# ------------------------------------------------- 1. qualify-as-identifier


def test_qualify_identifier_not_hijacked():
    """The r10 reproducers: previously-valid statements using qualify as
    an identifier pass through the rewrite byte-identical."""
    untouched = [
        "SELECT qualify FROM t",
        "SELECT x FROM t WHERE qualify = 3",
        "SELECT a AS qualify FROM t",
        "SELECT x FROM t ORDER BY qualify",
        "SELECT a * qualify FROM t",
        "SELECT x, qualify FROM t",
        "SELECT x FROM t WHERE qualify = 3 AND qualify < 9",
        "SELECT t.qualify FROM t",
        "SELECT upper(qualify) FROM t",
        "SELECT x FROM t GROUP BY x HAVING max(qualify) > 2",
    ]
    for s in untouched:
        assert qualify_sql(s) == s, s
        assert dialect_sql(s) == s, s


def test_qualify_identifier_runs_end_to_end(lake):
    """A column literally named qualify stays queryable through the full
    front end — the r10 verdict's regression class."""
    lake.sql("CREATE TABLE polaris.db.qi (qualify INT, v INT) USING ICEBERG")
    lake.sql("INSERT INTO db.qi VALUES (1, 10), (2, 20), (3, 30)")
    df = lake.sql("SELECT qualify FROM db.qi WHERE qualify >= 2 ORDER BY qualify")
    assert [r[0] for r in df.collect()] == [2, 3]
    df2 = lake.sql("SELECT qualify AS q, v FROM db.qi ORDER BY qualify DESC LIMIT 1")
    assert [tuple(r) for r in df2.collect()] == [(3, 30)]


def test_qualify_clause_still_fires_after_guard(lake):
    """The guard must not eat the real clause: plain, grouped, and
    GROUP-BY-headed QUALIFY statements all still rewrite."""
    out = qualify_sql(
        "SELECT g, ROW_NUMBER() OVER (ORDER BY g) AS rn FROM t QUALIFY rn = 1"
    )
    assert "_lh_qualify" in out
    out2 = qualify_sql(
        "SELECT g, COUNT(*) AS c FROM t GROUP BY g "
        "QUALIFY ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC) <= 2"
    )
    assert "_lh_qualify" in out2
    lake.sql("CREATE TABLE polaris.db.qg (g STRING, v INT) USING ICEBERG")
    lake.sql("INSERT INTO db.qg VALUES ('a', 3), ('a', 1), ('b', 9)")
    df = lake.sql(
        "SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v DESC) AS rn "
        "FROM db.qg QUALIFY rn = 1 ORDER BY g"
    )
    assert [tuple(r) for r in df.collect()] == [("a", 3, 1), ("b", 9, 1)]


# --------------------------------------------- 2. QUALIFY before DISTINCT


def test_qualify_distinct_rewrites():
    """r12: QUALIFY + top-level DISTINCT is supported directly — the
    DISTINCT strips from the inner core (windows see pre-DISTINCT rows)
    and re-applies on the outer projection, matching the dialect's
    QUALIFY-before-DISTINCT order. (Until r11 this raised a named error.)"""
    out = qualify_sql(
        "SELECT DISTINCT g FROM t "
        "QUALIFY ROW_NUMBER() OVER (ORDER BY g) = 1"
    )
    assert out.startswith("SELECT DISTINCT * EXCEPT"), out
    assert "FROM (SELECT g FROM t)" in out  # inner core lost the keyword
    # the manual workaround ALSO composes now: the inner QUALIFY at
    # depth>0 rewrites recursively (r11 advice — it used to pass through
    # unrewritten and die at Spark's parser)
    s = (
        "SELECT DISTINCT g FROM (SELECT g, v FROM t "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) = 1) q"
    )
    out2 = qualify_sql(s)
    assert "_lh_qualify" in out2 and out2.startswith("SELECT DISTINCT g FROM (")


# --------------------------------------- unprojected base columns (idiom)


def test_qualify_unprojected_base_columns(lake):
    """DuckDB docs' first QUALIFY example shape: the window partitions
    and orders on columns absent from the select list."""
    lake.sql("CREATE TABLE polaris.db.qu (g STRING, v INT, ts INT) USING ICEBERG")
    lake.sql(
        "INSERT INTO db.qu VALUES ('a', 1, 100), ('a', 2, 200), ('b', 3, 50)"
    )
    df = lake.sql(
        "SELECT v FROM db.qu "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY g ORDER BY ts DESC) = 1 "
        "ORDER BY v"
    )
    assert df.columns == ["v"]
    assert [r[0] for r in df.collect()] == [2, 3]
    # qualified references resolve inside the inner scope too
    df2 = lake.sql(
        "SELECT q.v AS val FROM db.qu q "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY q.g ORDER BY q.ts DESC) = 1 "
        "ORDER BY val"
    )
    assert df2.columns == ["val"]
    assert [r[0] for r in df2.collect()] == [2, 3]
    # select-list aliases keep winning over injection (rn is an output)
    df3 = lake.sql(
        "SELECT g, ROW_NUMBER() OVER (PARTITION BY g ORDER BY ts DESC) AS rn "
        "FROM db.qu QUALIFY rn = 1 ORDER BY g"
    )
    assert [tuple(r) for r in df3.collect()] == [("a", 1), ("b", 1)]


def test_qualify_injection_never_fires_on_star():
    """Star projections expose every base column — no helper injection."""
    out = qualify_sql(
        "SELECT * FROM t QUALIFY ROW_NUMBER() OVER (PARTITION BY g ORDER BY ts) = 1"
    )
    assert "_lh_qc" not in out and "_lh_qualify" in out
    out2 = qualify_sql(
        "SELECT t.* FROM t QUALIFY ROW_NUMBER() OVER (ORDER BY ts) = 1"
    )
    assert "_lh_qc" not in out2


# ------------------------------------------------------ 3. ASOF chaining


def test_asof_chained_join(lake):
    lake.sql("CREATE TABLE polaris.db.ac_l (k INT, ts INT) USING ICEBERG")
    lake.sql("CREATE TABLE polaris.db.ac_r (k INT, ts INT, v STRING) USING ICEBERG")
    lake.sql("CREATE TABLE polaris.db.ac_d (k INT, nm STRING) USING ICEBERG")
    lake.sql("INSERT INTO db.ac_l VALUES (1, 10), (1, 20), (2, 5)")
    lake.sql("INSERT INTO db.ac_r VALUES (1, 8, 'x'), (1, 15, 'y'), (2, 9, 'z')")
    lake.sql("INSERT INTO db.ac_d VALUES (1, 'one'), (2, 'two')")
    df = lake.sql(
        "SELECT l.k, l.ts, r.ts AS rts, d.nm FROM db.ac_l l "
        "ASOF JOIN db.ac_r r ON l.k = r.k AND l.ts >= r.ts "
        "JOIN db.ac_d d ON d.k = l.k ORDER BY l.k, l.ts"
    )
    assert [tuple(x) for x in df.collect()] == [
        (1, 10, 8, "one"),
        (1, 20, 15, "one"),
    ]
    # LEFT variant chains too, and keeps the unmatched left row
    df2 = lake.sql(
        "SELECT l.k, l.ts, r.ts AS rts, d.nm FROM db.ac_l l "
        "ASOF LEFT JOIN db.ac_r r ON l.k = r.k AND l.ts >= r.ts "
        "LEFT JOIN db.ac_d d ON d.k = l.k ORDER BY l.k, l.ts"
    )
    assert [tuple(x) for x in df2.collect()] == [
        (1, 10, 8, "one"),
        (1, 20, 15, "one"),
        (2, 5, None, "two"),
    ]


def test_asof_deep_subquery_right_side():
    """The old right-side regex capped paren nesting at two levels —
    three-deep subqueries must parse now."""
    out = asof_sql(
        "SELECT 1 FROM a ASOF JOIN "
        "(SELECT * FROM (SELECT * FROM (SELECT 1 AS t) z) y) b ON a.t >= b.t"
    )
    assert "LATERAL" in out and "JOIN" in out


def test_asof_guards_still_loud():
    with pytest.raises(WarehouseError, match="inequality"):
        asof_sql("SELECT 1 FROM a ASOF JOIN b ON a.k = b.k")
    with pytest.raises(WarehouseError, match="alias"):
        asof_sql("SELECT 1 FROM a ASOF JOIN (SELECT 1) ON a.k = b.k")


# ---------------------------------------------------- 4. QUALIFY tails


def test_qualify_carries_spark_tail_clauses(lake):
    """SORT BY / DISTRIBUTE BY / CLUSTER BY tails carry through the
    rewrite instead of being swallowed into the predicate."""
    for tail in ("SORT BY g", "DISTRIBUTE BY g", "CLUSTER BY g"):
        out = qualify_sql(
            f"SELECT g, v FROM t QUALIFY ROW_NUMBER() OVER (ORDER BY v) = 1 {tail}"
        )
        assert out.rstrip().endswith(tail), out
        assert tail not in out.split("_lh_qualify")[1].split(")")[0]
    lake.sql("CREATE TABLE polaris.db.qt (g STRING, v INT) USING ICEBERG")
    lake.sql("INSERT INTO db.qt VALUES ('a', 3), ('a', 1), ('b', 9)")
    df = lake.sql(
        "SELECT g, v FROM db.qt "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY g ORDER BY v DESC) = 1 "
        "DISTRIBUTE BY g"
    )
    assert sorted(tuple(r) for r in df.collect()) == [("a", 3), ("b", 9)]


def test_qualify_injection_skips_syntax_tokens():
    """INTERVAL unit keywords and function names with whitespace before
    the paren must never be injected as helper projections."""
    out = qualify_sql(
        "SELECT g FROM t QUALIFY MAX(ts) OVER (PARTITION BY g) "
        "> CURRENT_TIMESTAMP - INTERVAL 1 DAY"
    )
    assert "DAY AS" not in out and "INTERVAL AS" not in out, out
    assert "ts AS _lh_qc0" in out  # the real base column IS injected
    out2 = qualify_sql("SELECT g FROM t QUALIFY ROW_NUMBER  () OVER (ORDER BY g) = 1")
    assert "ROW_NUMBER AS" not in out2, out2


def test_qualify_named_window_clause(lake):
    """WINDOW … QUALIFY: the named-window definition relocates to the
    predicate's scope, composes with injection, and identifiers named
    window stay untouched."""
    lake.sql("CREATE TABLE polaris.db.qw (g STRING, v INT, ts INT) USING ICEBERG")
    lake.sql("INSERT INTO db.qw VALUES ('a', 1, 100), ('a', 2, 200), ('b', 3, 50)")
    df = lake.sql(
        "SELECT v FROM db.qw WINDOW w AS (PARTITION BY g ORDER BY ts DESC) "
        "QUALIFY ROW_NUMBER() OVER w = 1 ORDER BY v"
    )
    assert df.columns == ["v"]
    assert [r[0] for r in df.collect()] == [2, 3]
    # multiple named windows in one clause
    df2 = lake.sql(
        "SELECT v FROM db.qw WINDOW w AS (PARTITION BY g ORDER BY ts DESC), "
        "w2 AS (ORDER BY ts) "
        "QUALIFY ROW_NUMBER() OVER w = 1 AND ROW_NUMBER() OVER w2 >= 1 ORDER BY v"
    )
    assert [r[0] for r in df2.collect()] == [2, 3]
    # an identifier named window is not a clause
    s = "SELECT window FROM t2 WHERE window = 3"
    assert qualify_sql(s) == s
