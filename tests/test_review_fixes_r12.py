"""Regression pins for the round-11 verdict + advice findings — all in
the SQL dialect layer:

1. QUALIFY + top-level DISTINCT now runs (verdict "Next round" #1): the
   DISTINCT keyword strips from the inner core — windows see the
   pre-DISTINCT rows, the dialect's defined order — and re-applies on
   the outer projection after the helpers fold away. The r11 named
   error is gone.
2. The dialect rewrites (QUALIFY, ASOF JOIN) now apply at EVERY subquery
   depth via _recurse_parens (r11 advice, medium: the depth-0-only scan
   meant `FROM (… QUALIFY …)` passed through unrewritten and died at
   Spark's parser, while the DISTINCT error message recommended exactly
   that unexecutable wrapping).
3. _qualify_injections compares predicate tokens to select-list output
   names CASE-INSENSITIVELY (r11 advice, low: Spark resolves
   identifiers case-insensitively under the default caseSensitive=false,
   so `alias rn, predicate RN = 1` was wrongly injected as a base-column
   projection).
4. `GROUP BY ALL … QUALIFY` rewrites (r11 advice, low: a head ending in
   ALL was mis-read as expression-expecting, so the clause never fired).
   Injection is skipped under GROUP BY ALL — a helper projection would
   silently become a grouping key.
5. ASOF JOIN MATCH_CONDITION (…) USING (…) — Snowflake's other as-of
   spelling — desugars to the ON form (verdict stretch #8).
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


# ------------------------------------------- 1. QUALIFY + DISTINCT runs


def test_qualify_distinct_semantics(lake):
    """QUALIFY evaluates BEFORE DISTINCT: the count window must see the
    duplicate-bearing rows. A DISTINCT-first evaluation would see
    count 1 everywhere and return nothing."""
    lake.sql("CREATE TABLE polaris.db.qd (g STRING) USING ICEBERG")
    lake.sql("INSERT INTO db.qd VALUES ('a'), ('a'), ('b')")
    df = lake.sql(
        "SELECT DISTINCT g FROM db.qd "
        "QUALIFY COUNT(*) OVER (PARTITION BY g) > 1 ORDER BY g"
    )
    assert df.columns == ["g"]
    assert [r[0] for r in df.collect()] == ["a"]


def test_qualify_distinct_with_injection(lake):
    """DISTINCT composes with unprojected-base-column injection: the
    helper columns fold away BEFORE the outer DISTINCT collapses rows,
    so the injected ts never leaks into the dedup key."""
    lake.sql("CREATE TABLE polaris.db.qdi (g STRING, v INT, ts INT) USING ICEBERG")
    lake.sql(
        "INSERT INTO db.qdi VALUES ('a', 1, 100), ('a', 1, 200), ('b', 2, 50)"
    )
    df = lake.sql(
        "SELECT DISTINCT g, v FROM db.qdi "
        "QUALIFY COUNT(*) OVER (PARTITION BY g) > 1 ORDER BY g"
    )
    # both 'a' rows survive the qualify; DISTINCT over (g, v) collapses
    # them to ONE row despite their differing (excluded) ts helper
    assert df.columns == ["g", "v"]
    assert [tuple(r) for r in df.collect()] == [("a", 1)]


# ------------------------------- 2. rewrites at every subquery depth


def test_qualify_in_derived_table(lake):
    lake.sql("CREATE TABLE polaris.db.sq (g STRING, v INT) USING ICEBERG")
    lake.sql("INSERT INTO db.sq VALUES ('a', 3), ('a', 1), ('b', 9), ('b', 2)")
    df = lake.sql(
        "SELECT q.g, SUM(q.v) AS s FROM (SELECT g, v FROM db.sq "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY g ORDER BY v DESC) = 1) q "
        "GROUP BY q.g ORDER BY q.g"
    )
    assert [tuple(r) for r in df.collect()] == [("a", 3), ("b", 9)]


def test_qualify_in_cte(lake):
    lake.sql("CREATE TABLE polaris.db.cq (g STRING, v INT) USING ICEBERG")
    lake.sql("INSERT INTO db.cq VALUES ('a', 3), ('a', 1), ('b', 9)")
    df = lake.sql(
        "WITH best AS (SELECT g, v FROM db.cq "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY g ORDER BY v DESC) = 1) "
        "SELECT g, v FROM best ORDER BY g"
    )
    assert [tuple(r) for r in df.collect()] == [("a", 3), ("b", 9)]


def test_qualify_nested_depths_independent():
    """One QUALIFY per LEVEL is fine (the multiple-clause guard is
    per-level); inner and outer both rewrite."""
    out = qualify_sql(
        "SELECT x FROM (SELECT x FROM t QUALIFY ROW_NUMBER() OVER (ORDER BY x) <= 5) q "
        "QUALIFY ROW_NUMBER() OVER (ORDER BY x DESC) = 1"
    )
    assert out.count("_lh_qualify") >= 4  # two independent rewrites
    # two at the SAME level still raises, per level
    with pytest.raises(WarehouseError, match="multiple"):
        qualify_sql(
            "SELECT x FROM t QUALIFY a = 1 QUALIFY b = 2"
        )


def test_asof_in_subquery(lake):
    lake.sql("CREATE TABLE polaris.db.al (k INT, ts INT) USING ICEBERG")
    lake.sql("CREATE TABLE polaris.db.ar (k INT, ts INT, v STRING) USING ICEBERG")
    lake.sql("INSERT INTO db.al VALUES (1, 10), (2, 5)")
    lake.sql("INSERT INTO db.ar VALUES (1, 8, 'x'), (1, 15, 'y'), (2, 3, 'z')")
    df = lake.sql(
        "SELECT s.k, s.rts FROM (SELECT l.k, r.ts AS rts FROM db.al l "
        "ASOF JOIN db.ar r ON l.k = r.k AND l.ts >= r.ts) s ORDER BY s.k"
    )
    assert [tuple(r) for r in df.collect()] == [(1, 8), (2, 3)]


def test_recursion_leaves_non_subquery_parens_alone():
    """Function args, IN lists, window specs: byte-identical through the
    recursive pass."""
    untouched = [
        "SELECT upper(qualify) FROM t",
        "SELECT x FROM t WHERE x IN (1, 2, 3)",
        "SELECT g, SUM(v) OVER (PARTITION BY g ORDER BY ts) FROM t",
        "CREATE TABLE polaris.db.t (qualify INT, v STRING) USING ICEBERG",
        "SELECT CASE WHEN (x > 1) THEN (x + 2) ELSE (x - 2) END FROM t",
    ]
    for s in untouched:
        assert qualify_sql(s) == s, s
        assert asof_sql(s) == s, s
        assert dialect_sql(s) == s, s


# --------------------------------- 3. case-insensitive alias matching


def test_qualify_alias_reference_case_insensitive(lake):
    """Predicate `RN = 1` must bind to select alias `rn` (Spark default
    caseSensitive=false), NOT inject RN as a base-column helper."""
    out = qualify_sql(
        "SELECT g, ROW_NUMBER() OVER (ORDER BY g) AS rn FROM t QUALIFY RN = 1"
    )
    assert "_lh_qc" not in out, out
    lake.sql("CREATE TABLE polaris.db.ci (g STRING, v INT) USING ICEBERG")
    lake.sql("INSERT INTO db.ci VALUES ('b', 1), ('a', 2)")
    df = lake.sql(
        "SELECT g, ROW_NUMBER() OVER (ORDER BY g) AS rn FROM db.ci QUALIFY RN = 1"
    )
    assert [tuple(r) for r in df.collect()] == [("a", 1)]
    # plain column names keep injecting case-insensitively too
    out2 = qualify_sql(
        "SELECT g FROM t QUALIFY ROW_NUMBER() OVER (PARTITION BY G ORDER BY ts) = 1"
    )
    assert "G AS _lh_qc" not in out2 or "g," in out2.lower()


def test_named_window_definition_case_insensitive():
    """`WINDOW W AS (…) … OVER w` — the defined-name exclusion casefolds."""
    out = qualify_sql(
        "SELECT v FROM t WINDOW W AS (PARTITION BY g ORDER BY ts DESC) "
        "QUALIFY ROW_NUMBER() OVER w = 1"
    )
    assert "w AS _lh_qc" not in out, out


# --------------------------------------- 4. GROUP BY ALL … QUALIFY


def test_groupby_all_qualify(lake):
    lake.sql("CREATE TABLE polaris.db.ga (g STRING, v INT) USING ICEBERG")
    lake.sql("INSERT INTO db.ga VALUES ('a', 1), ('a', 2), ('b', 3), ('c', 4)")
    df = lake.sql(
        "SELECT g, COUNT(*) AS c FROM db.ga GROUP BY ALL "
        "QUALIFY ROW_NUMBER() OVER (ORDER BY c DESC, g) = 1"
    )
    assert [tuple(r) for r in df.collect()] == [("a", 2)]
    # no helper injection under GROUP BY ALL (it would alter the grouping)
    out = qualify_sql(
        "SELECT g, COUNT(*) AS c FROM t GROUP BY ALL "
        "QUALIFY ROW_NUMBER() OVER (ORDER BY c DESC) <= 2"
    )
    assert "_lh_qualify" in out and "_lh_qc" not in out, out
    # a trailing SELECT ALL head is still expression-expecting — an
    # identifier named qualify there is NOT the clause
    s = "SELECT ALL qualify FROM t"
    assert qualify_sql(s) == s


# ------------------------------- 5. ASOF MATCH_CONDITION / USING sugar


def test_asof_match_condition_using(lake):
    lake.sql("CREATE TABLE polaris.db.ml (k INT, ts INT) USING ICEBERG")
    lake.sql("CREATE TABLE polaris.db.mr (k INT, ts INT, v STRING) USING ICEBERG")
    lake.sql("INSERT INTO db.ml VALUES (1, 10), (1, 20), (2, 5)")
    lake.sql("INSERT INTO db.mr VALUES (1, 8, 'x'), (1, 15, 'y'), (2, 9, 'z')")
    df = lake.sql(
        "SELECT l.k, l.ts, r.v FROM db.ml l ASOF JOIN db.mr r "
        "MATCH_CONDITION (l.ts >= r.ts) USING (k) ORDER BY l.k, l.ts"
    )
    assert [tuple(r) for r in df.collect()] == [(1, 10, "x"), (1, 20, "y")]
    # LEFT variant with explicit ON
    df2 = lake.sql(
        "SELECT l.k, l.ts, r.v FROM db.ml l ASOF LEFT JOIN db.mr r "
        "MATCH_CONDITION (l.ts >= r.ts) ON l.k = r.k ORDER BY l.k, l.ts"
    )
    assert [tuple(r) for r in df2.collect()] == [
        (1, 10, "x"),
        (1, 20, "y"),
        (2, 5, None),
    ]


def test_asof_match_condition_guards():
    # USING requires the single-inequality shape so keys can qualify
    with pytest.raises(WarehouseError, match="MATCH_CONDITION"):
        asof_sql(
            "SELECT 1 FROM a ASOF JOIN b "
            "MATCH_CONDITION (a.ts >= b.ts AND a.x = b.x) USING (k)"
        )
    with pytest.raises(WarehouseError, match="USING"):
        asof_sql("SELECT 1 FROM a ASOF JOIN b MATCH_CONDITION (a.ts >= b.ts) USING ()")
    # identifier named match_condition in expression position: untouched
    s = "SELECT match_condition FROM t"
    assert asof_sql(s) == s


# --------------------------- 6. extended-section bench envelope gate


def test_extended_envelope_committed_and_fresh():
    """BENCH_ENVELOPE.json exists, was built by tools/extended_envelope.py
    from the idle records, and covers every EXTENDED bench operator that
    has at least one idle sample."""
    import json
    from pathlib import Path

    import bench

    env = json.loads(Path(bench.ENVELOPE_PATH).read_text())
    assert env["metric"] == "extended_envelope"
    assert env["sources"], "envelope built from no idle records"
    for name, e in env["queries"].items():
        assert e["lo"] <= e["median"] <= e["hi"], name
        assert e["n"] >= 1, name
    # rebuilding from the same committed records is a fixed point
    import sys

    sys.path.insert(0, str(Path(bench.ENVELOPE_PATH).parent / "tools"))
    from extended_envelope import build

    assert build()["queries"] == env["queries"]


def test_extended_drift_gate_flags_both_scales_only():
    """A query flags only when BOTH the raw and probe-adjusted ratios
    exceed EXT_DRIFT_RATIO: genuine plan regressions flag, contended-host
    inflation does not."""
    import bench

    ref = bench.PROBE_REF_S
    # genuine regression on an idle host: flags
    flags = bench._extended_drift({"ml_kmeans_clusters": 99.0}, ref, ref)
    assert set(flags) == {"ml_kmeans_clusters"}
    f = flags["ml_kmeans_clusters"]
    assert f["ratio"] > bench.EXT_DRIFT_RATIO < f["adjusted_ratio"]
    # same seconds on a 3x-slow host: adjusted ratio clears it
    assert bench._extended_drift({"ml_kmeans_clusters": 5.0}, 3 * ref, 3 * ref) == {}
    # healthy reading: no flag
    assert bench._extended_drift({"ml_kmeans_clusters": 2.7}, ref, ref) == {}
    # unknown query (no envelope row): skipped, not flagged
    assert bench._extended_drift({"brand_new_operator": 50.0}, ref, ref) == {}


def test_extended_drift_in_summary_fits_budget():
    """The summary stays inside the driver's stdout tail window even with
    every extended operator flagged (worst case)."""
    import json

    import bench

    drift = {
        n: {"sec": 12345.678, "envelope_median": 1.0, "ratio": 12345.68,
            "adjusted_ratio": 12345.68}
        for n in bench.EXTENDED
    }
    result = {
        "metric": "headline_queries_total_runtime",
        "value": 12345.678,
        "unit": "sec",
        "sf": 0.1,
        "queries": {name: 12345.6789 for name in bench.HEADLINE},
        "iters": 5,
        "probe_degraded": True,
        "load_contaminated": True,
        "cpu_probe_s": 0.42,
        "cpu_probe_after_s": 0.42,
        "extended_drift": drift,
        "sf1_scale_check": {
            "total": 123.456,
            "worst_query_scaling": {"query": "rel_q9_profit_by_nation_year", "ratio": 12.34},
        },
    }
    s = bench._summarize(result)
    assert s["ext_drift"] == {n: 12345.68 for n in bench.EXTENDED}
    line = json.dumps(s, separators=(",", ":"))
    assert len(line.encode()) <= bench.SUMMARY_BUDGET_B
    # and a healthy run carries no ext_drift key at all
    result["extended_drift"] = {}
    assert "ext_drift" not in bench._summarize(result)


# ------------------- 7. data-driven SimHash band widening (WWW'07)


def _fp_df(spark, fps):
    return spark.createDataFrame(
        [(i, f) for i, f in enumerate(fps)], "doc_id long, simhash long"
    )


def _suppress(spark, fp, wide):
    from pyspark.sql import functions as F

    from minio_iceberg_polaris_lakehouse_spark.operators.dedup import (
        SIMHASHX_HAMMING_K,
        _simhashx_candidates,
    )

    hits = _simhashx_candidates(fp, wide).filter(
        F.col("hamming") <= SIMHASHX_HAMMING_K
    )
    return sorted(
        tuple(r)
        for r in hits.groupBy("doc_id")
        .agg(
            F.min("rep").alias("rep_id"),
            F.min_by("hamming", "rep").cast("int").alias("hamming"),
        )
        .collect()
    )


def test_simhash_wide_blocking_cuts_candidates_same_output(spark):
    """Skew-dense fixture: 200 fingerprints share band 0 (low 8 bits)
    byte-for-byte but are far apart in the high bits, plus a few genuine
    near-dup pairs. Plain 8-bit blocking pays a ~200² false-candidate
    bucket; C(6,3) combination blocking verifies far fewer pairs and the
    suppression output is IDENTICAL (pigeonhole guarantee: no false
    negatives at Hamming <= 3)."""
    import random

    from minio_iceberg_polaris_lakehouse_spark.operators.dedup import (
        _simhashx_candidates,
    )

    rng = random.Random(7)
    fps = []
    # one mega-bucket in band 0: identical low byte, scattered high bits
    for _ in range(200):
        fps.append((rng.getrandbits(23) << 8) | 0xAB)
    # genuine near-dups: pairs at Hamming 1-3 of scattered bases
    for _ in range(20):
        base = rng.getrandbits(31)
        fps.append(base)
        flipped = base
        for b in rng.sample(range(31), rng.randint(1, 3)):
            flipped ^= 1 << b
        fps.append(flipped)
    fp = _fp_df(spark, fps)
    narrow_cand = _simhashx_candidates(fp, wide=False).count()
    wide_cand = _simhashx_candidates(fp, wide=True).count()
    assert wide_cand < narrow_cand / 4, (narrow_cand, wide_cand)
    assert _suppress(spark, fp, wide=True) == _suppress(spark, fp, wide=False)


def test_simhash_bucket_guard_measures_fraction(spark):
    from minio_iceberg_polaris_lakehouse_spark.operators.dedup import (
        _simhashx_max_bucket_frac,
    )

    # 90 of 100 docs share band 0 (low byte); all other bands scattered
    import random as _random

    r = _random.Random(11)
    fps = [(r.getrandbits(23) << 8) | 0x11 for _ in range(90)] + [
        r.getrandbits(31) & ~0xFF | ((i * 37) % 251) for i in range(1, 11)
    ]
    frac = _simhashx_max_bucket_frac(_fp_df(spark, fps))
    assert 0.85 <= frac <= 0.95, frac
    # uniform fingerprints -> tiny max bucket
    import random

    rng = random.Random(3)
    uni = [rng.getrandbits(31) for _ in range(400)]
    assert _simhashx_max_bucket_frac(_fp_df(spark, uni)) < 0.2


def test_simhash_hamming_operator_still_oracle_green(spark, sf_dir):
    """The public operator (now guard-driven — this corpus trips the wide
    path) still hash-matches the DuckDB oracle."""
    from minio_iceberg_polaris_lakehouse_spark.registry import all_queries

    from tests.oracle_harness import compare, duck_connection

    q = all_queries()["dedup_simhash_hamming"]
    con = duck_connection(sf_dir)
    try:
        assert not compare(spark, con, q.spark, q.oracle, sf_dir, require_rows=True)
    finally:
        con.close()


# ----------------------------------- 8. DISTINCT ON dialect feature


def test_distinct_on_end_to_end(lake):
    lake.sql("CREATE TABLE polaris.db.don (k STRING, v INT, ts INT) USING ICEBERG")
    lake.sql(
        "INSERT INTO db.don VALUES ('a', 1, 10), ('a', 2, 30), ('a', 3, 20), "
        "('b', 4, 5)"
    )
    # keep the latest row per key; order/key columns projected
    df = lake.sql(
        "SELECT DISTINCT ON (k) k, v FROM db.don ORDER BY k, ts DESC"
    )
    assert df.columns == ["k", "v"]
    assert [tuple(r) for r in df.collect()] == [("a", 2), ("b", 4)]
    # unprojected key + order columns: injection carries the outer sort
    df2 = lake.sql("SELECT DISTINCT ON (k) v FROM db.don ORDER BY k, ts DESC")
    assert df2.columns == ["v"]
    assert [r[0] for r in df2.collect()] == [2, 4]
    # LIMIT tail, no ORDER BY (dialect: arbitrary row per group)
    df3 = lake.sql("SELECT DISTINCT ON (k) k FROM db.don LIMIT 1")
    assert df3.count() == 1


def test_distinct_on_guards():
    from minio_iceberg_polaris_lakehouse_spark.sql_frontend import dialect_sql

    with pytest.raises(WarehouseError, match="DISTINCT ON"):
        dialect_sql("SELECT DISTINCT ON () v FROM t")
    # plain DISTINCT and identifiers never trigger
    for s in [
        "SELECT DISTINCT x FROM t",
        "SELECT DISTINCT on_hand FROM t",
    ]:
        assert dialect_sql(s) == s, s


def test_qualify_tail_over_unprojected_columns(lake):
    """r12: `QUALIFY … ORDER BY <unprojected base column>` — valid in the
    source dialect — now injects the sort column and resolves through
    the outer `* EXCEPT` (previously died unresolvable at Spark)."""
    lake.sql("CREATE TABLE polaris.db.qtail (g STRING, v INT, ts INT) USING ICEBERG")
    lake.sql(
        "INSERT INTO db.qtail VALUES ('a', 1, 300), ('a', 2, 100), ('b', 3, 200)"
    )
    df = lake.sql(
        "SELECT v FROM db.qtail "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) = 1 "
        "ORDER BY ts"
    )
    assert df.columns == ["v"]
    # rows kept: ('a', v=1, ts=300) and ('b', v=3, ts=200);
    # ORDER BY ts ascending puts ts=200 first
    assert [r[0] for r in df.collect()] == [3, 1]


# ------------------------------ 9. DISTINCT ON probe classes (misparse)


DON_PASSTHROUGH = [
    "SELECT DISTINCT x FROM t",
    "SELECT DISTINCT on_hand FROM t",
    "SELECT DISTINCT ON FROM t",  # no paren list -> identifier, not the clause
    "SELECT 'DISTINCT ON (x)' AS s FROM t",
    "SELECT count(DISTINCT x) FROM t",
    "SELECT /* DISTINCT ON (k) */ x FROM t",
    "SELECT x FROM t WHERE y IN (SELECT DISTINCT z FROM u)",
]


@pytest.mark.parametrize("stmt", DON_PASSTHROUGH)
def test_distinct_on_passthrough(stmt):
    assert dialect_sql(stmt) == stmt


def test_distinct_on_expression_keys(lake):
    """Expression keys (`DISTINCT ON (upper(k))`) inject the base column
    and the outer sort carries the expression over the helper — Spark
    resolves it through `* EXCEPT` against the subquery child."""
    lake.sql("CREATE TABLE polaris.db.donx (k STRING, v INT, ts INT) USING ICEBERG")
    lake.sql(
        "INSERT INTO db.donx VALUES ('Aa',1,10), ('aB',2,30), ('AC',3,20), "
        "('b',4,5), ('B',5,7)"
    )
    df = lake.sql(
        "SELECT DISTINCT ON (upper(substr(k,1,1))) v FROM db.donx "
        "ORDER BY upper(substr(k,1,1)), ts DESC"
    )
    assert sorted(r[0] for r in df.collect()) == [2, 5]


# -------------------------------------- 10. FROM-first syntax (Q8)


FF_PASSTHROUGH = [
    "SELECT x FROM t",
    "SELECT trim(BOTH ' ' FROM x) FROM t",
    "SELECT substring('abcdef' FROM 2 FOR 3) AS s FROM t",
    "SELECT extract(YEAR FROM ts) FROM t",
    "SELECT * EXCEPT (a) FROM t",
    "SELECT 'FROM t' AS s FROM u",
    "INSERT INTO x SELECT * FROM t",
    "SELECT x FROM t UNION ALL SELECT y FROM u",
    "SELECT * EXCEPT (a) FROM t UNION SELECT * FROM u",
    "SELECT x FROM t\nUNION\nSELECT y FROM u\nEXCEPT\nSELECT z FROM v",
    "WITH c AS (SELECT 1 AS x) SELECT * FROM c",
]


@pytest.mark.parametrize("stmt", FF_PASSTHROUGH)
def test_from_first_passthrough(stmt):
    assert dialect_sql(stmt) == stmt


FF_REWRITES = [
    ("FROM t", "SELECT * FROM t"),
    ("FROM t SELECT x", "SELECT x FROM t"),
    ("FROM t WHERE x > 1", "SELECT * FROM t WHERE x > 1"),
    (
        "FROM t SELECT x WHERE p ORDER BY x LIMIT 3",
        "SELECT x FROM t WHERE p ORDER BY x LIMIT 3",
    ),
    (
        "FROM t SELECT count(*) AS n GROUP BY k",
        "SELECT count(*) AS n FROM t GROUP BY k",
    ),
    ("FROM t SELECT DISTINCT x", "SELECT DISTINCT x FROM t"),
    (
        "FROM a JOIN b ON a.k = b.k SELECT a.x, b.y",
        "SELECT a.x, b.y FROM a JOIN b ON a.k = b.k",
    ),
    ("FROM a UNION FROM b", "SELECT * FROM a UNION SELECT * FROM b"),
    (
        "SELECT * FROM (FROM t SELECT x WHERE x > 1) q",
        "SELECT * FROM (SELECT x FROM t WHERE x > 1) q",
    ),
    (
        "WITH c AS (FROM t) FROM c",
        "WITH c AS (SELECT * FROM t) SELECT * FROM c",
    ),
]


@pytest.mark.parametrize("stmt,expect", FF_REWRITES)
def test_from_first_rewrites(stmt, expect):
    assert dialect_sql(stmt) == expect


def test_from_first_composes_with_other_rewrites():
    # star sugar after desugaring
    assert dialect_sql("FROM t SELECT * EXCLUDE (a)") == "SELECT * EXCEPT (a) FROM t"
    # QUALIFY after desugaring: fires the qualify rewrite
    out = dialect_sql("FROM t SELECT x QUALIFY ROW_NUMBER() OVER (ORDER BY x) = 1")
    assert "_lh_qualify" in out and out.startswith("SELECT * EXCEPT")
    # DISTINCT ON after desugaring
    out = dialect_sql("FROM t SELECT DISTINCT ON (k) k, v ORDER BY k, ts DESC")
    assert "ROW_NUMBER() OVER (PARTITION BY k" in out


def test_from_first_end_to_end(lake):
    lake.sql("CREATE TABLE polaris.db.ff (k STRING, v INT) USING ICEBERG")
    lake.sql("INSERT INTO db.ff VALUES ('a', 1), ('a', 2), ('b', 3)")
    assert lake.sql("FROM db.ff").count() == 3
    df = lake.sql(
        "FROM db.ff SELECT k, CAST(SUM(v) AS BIGINT) AS s "
        "WHERE v > 1 GROUP BY k ORDER BY k"
    )
    assert [tuple(r) for r in df.collect()] == [("a", 2), ("b", 3)]
    assert lake.sql("FROM db.ff UNION ALL FROM db.ff").count() == 6


def test_from_first_guard():
    with pytest.raises(WarehouseError, match="select list"):
        dialect_sql("FROM t SELECT WHERE x > 1")


def test_from_first_insert_source(lake):
    """INSERT INTO … FROM t (the dialect's FROM-first source query) and
    INSERT OVERWRITE … FROM t both route the body through the query
    rewriter."""
    lake.sql("CREATE TABLE polaris.db.ffsrc (k STRING, v INT) USING ICEBERG")
    lake.sql("INSERT INTO db.ffsrc VALUES ('a', 1), ('b', 2)")
    lake.sql("CREATE TABLE polaris.db.ffdst (k STRING, v INT) USING ICEBERG")
    lake.sql("INSERT INTO db.ffdst FROM db.ffsrc")
    assert lake.sql("SELECT count(*) AS n FROM db.ffdst").collect()[0][0] == 2
    lake.sql("INSERT OVERWRITE db.ffdst FROM db.ffsrc SELECT k, v WHERE v > 1")
    assert [tuple(r) for r in lake.sql("FROM db.ffdst").collect()] == [("b", 2)]
    # column-list INSERT with FROM-first body
    lake.sql("INSERT INTO db.ffdst (v, k) FROM db.ffsrc SELECT v, k")
    assert lake.sql("SELECT count(*) AS n FROM db.ffdst").collect()[0][0] == 3


def test_from_first_metadata_fastpath(lake):
    """The head-desugar at dispatch lets FROM-first statements reach the
    metadata fast path and scan hints as canonical SELECTs."""
    lake.sql("CREATE TABLE polaris.db.ffmeta (k STRING) USING ICEBERG")
    lake.sql("INSERT INTO db.ffmeta VALUES ('x'), ('y')")
    assert lake.sql("FROM db.ffmeta SELECT count(*) AS n").collect()[0][0] == 2


def test_from_first_in_ddl_bodies(lake):
    """CTAS, CREATE VIEW, ALTER VIEW, CREATE MATERIALIZED VIEW, and
    EXPLAIN all accept FROM-first bodies; view definitions persist in
    canonical SELECT-first form (the MV delta deriver re-parses stored
    SQL)."""
    lake.sql("CREATE TABLE polaris.db.ffd (k STRING, v INT) USING ICEBERG")
    lake.sql("INSERT INTO db.ffd VALUES ('a', 1), ('b', 2), ('b', 3)")
    lake.sql("CREATE TABLE db.ffd2 AS FROM db.ffd SELECT k, v WHERE v > 1")
    assert lake.sql("SELECT count(*) AS n FROM db.ffd2").collect()[0][0] == 2
    lake.sql("CREATE VIEW db.ffv AS FROM db.ffd SELECT k, v")
    assert lake.sql("FROM db.ffv").count() == 3
    lake.sql("ALTER VIEW db.ffv AS FROM db.ffd SELECT k WHERE v >= 2")
    assert lake.sql("FROM db.ffv").count() == 2
    plan = lake.sql("EXPLAIN FROM db.ffd SELECT k WHERE v = 1").collect()[0][0]
    assert "Filter" in plan or "filter" in plan
    lake.sql(
        "CREATE MATERIALIZED VIEW db.ffmv AS "
        "FROM db.ffd SELECT k, CAST(SUM(v) AS BIGINT) AS s GROUP BY k"
    )
    assert sorted(tuple(r) for r in lake.sql("FROM db.ffmv SELECT k, s").collect()) == [
        ("a", 1),
        ("b", 5),
    ]
    # stored definitions are canonical (no FROM-first text persisted)
    views = {r["viewName"]: r for r in lake.sql("SHOW VIEWS IN db").collect()}
    assert "ffv" in views
    # incremental refresh still works over the canonicalized definition
    lake.sql("INSERT INTO db.ffd VALUES ('a', 10)")
    lake.sql("REFRESH MATERIALIZED VIEW db.ffmv")
    assert sorted(tuple(r) for r in lake.sql("FROM db.ffmv SELECT k, s").collect()) == [
        ("a", 11),
        ("b", 5),
    ]


# -------------------------------------- 11. UNION BY NAME (Q9)


def test_union_by_name_alignment_and_null_fill(lake):
    lake.sql("CREATE TABLE polaris.db.ubna (id INT, nm STRING) USING ICEBERG")
    lake.sql("INSERT INTO db.ubna VALUES (1, 'x'), (2, 'y')")
    lake.sql("CREATE TABLE polaris.db.ubnb (nm STRING, id INT) USING ICEBERG")
    lake.sql("INSERT INTO db.ubnb VALUES ('y', 2), ('z', 3)")
    # opposite column order aligns by NAME; ALL keeps the duplicate
    df = lake.sql(
        "SELECT id, nm FROM db.ubna UNION ALL BY NAME "
        "SELECT nm, id FROM db.ubnb ORDER BY id, nm"
    )
    assert [tuple(r) for r in df.collect()] == [
        (1, "x"), (2, "y"), (2, "y"), (3, "z"),
    ]
    # plain separator dedups; missing column NULL-fills
    df2 = lake.sql(
        "SELECT id, nm FROM db.ubna UNION BY NAME "
        "SELECT id FROM db.ubnb ORDER BY id, nm NULLS FIRST"
    )
    assert [tuple(r) for r in df2.collect()] == [
        (1, "x"), (2, None), (2, "y"), (3, None),
    ]
    # FROM-first branches compose
    assert lake.sql("FROM db.ubna UNION ALL BY NAME FROM db.ubna").count() == 4


def test_union_by_name_guards():
    from minio_iceberg_polaris_lakehouse_spark.sql_frontend import (
        has_union_by_name,
        union_by_name_df,
    )

    assert not has_union_by_name("SELECT 'UNION BY NAME' AS s FROM a")
    assert not has_union_by_name("SELECT x FROM (SELECT 1 UNION BY NAME SELECT 2) q")
    with pytest.raises(WarehouseError, match="WITH"):
        union_by_name_df(None, "WITH c AS (SELECT 1) SELECT * FROM c UNION BY NAME SELECT 2")
    with pytest.raises(WarehouseError, match="plain set operator"):
        union_by_name_df(None, "SELECT 1 UNION BY NAME SELECT 2 UNION SELECT 3")


def test_insert_by_name(lake):
    """INSERT INTO t BY NAME <query> — source output names pick target
    columns in any order/subset; omitted columns fill NULL/DEFAULT."""
    lake.sql(
        "CREATE TABLE polaris.db.ibn (k STRING, v INT, note STRING) USING ICEBERG"
    )
    lake.sql(
        "INSERT INTO db.ibn BY NAME (SELECT 7 AS v, 'a' AS k)"
    )  # the dialect's documented parenthesized form
    assert [tuple(r) for r in lake.sql("FROM db.ibn").collect()] == [("a", 7, None)]
    # FROM-first body + reordered subset again
    lake.sql("CREATE TABLE polaris.db.ibnsrc (note STRING, k STRING) USING ICEBERG")
    lake.sql("INSERT INTO db.ibnsrc VALUES ('n1', 'b')")
    lake.sql("INSERT INTO db.ibn BY NAME FROM db.ibnsrc SELECT note, k")
    rows = sorted(tuple(r) for r in lake.sql("FROM db.ibn").collect())
    assert rows == [("a", 7, None), ("b", None, "n1")]
    with pytest.raises(WarehouseError, match="unknown columns"):
        lake.sql("INSERT INTO db.ibn BY NAME SELECT 1 AS nope")
    with pytest.raises(WarehouseError, match="query body"):
        lake.sql("INSERT INTO db.ibn BY NAME VALUES (1)")


def test_create_or_replace_table(lake):
    # plain: replace drops + recreates with the new schema
    lake.sql("CREATE OR REPLACE TABLE polaris.db.cor (k STRING) USING ICEBERG")
    lake.sql("INSERT INTO db.cor VALUES ('a')")
    lake.sql("CREATE OR REPLACE TABLE polaris.db.cor (k STRING, v INT) USING ICEBERG")
    assert lake.sql("FROM db.cor").count() == 0
    assert lake.sql("FROM db.cor").columns == ["k", "v"]
    # RTAS same schema: atomic overwrite, history survives
    lake.sql("INSERT INTO db.cor VALUES ('a', 1), ('b', 2)")
    lake.sql(
        "CREATE OR REPLACE TABLE db.cor AS SELECT k, v FROM db.cor WHERE v > 1"
    )
    assert [tuple(r) for r in lake.sql("FROM db.cor").collect()] == [("b", 2)]
    assert lake.sql("SELECT count(*) AS n FROM db.cor.snapshots").collect()[0][0] >= 2
    # RTAS schema change, self-referencing: staged before the swap
    lake.sql(
        "CREATE OR REPLACE TABLE db.cor AS "
        "FROM db.cor SELECT k, CAST(v AS DOUBLE) AS vd, 'x' AS tag"
    )
    assert [tuple(r) for r in lake.sql("FROM db.cor").collect()] == [("b", 2.0, "x")]


# -------------------------------------- 12. PIVOT / UNPIVOT statements


def test_pivot_statement_forms(lake):
    lake.sql("CREATE TABLE polaris.db.pv (st STRING, pri STRING, amt DOUBLE) USING ICEBERG")
    lake.sql(
        "INSERT INTO db.pv VALUES ('O','hi',10.5), ('O','lo',4.0), "
        "('F','hi',2.0), ('F','hi',3.0)"
    )
    # aliased count: {value}_n names, empty cells read 0 (not NULL)
    df = lake.sql("PIVOT db.pv ON pri USING COUNT(*) AS n GROUP BY st ORDER BY st")
    assert df.columns == ["st", "hi_n", "lo_n"]
    assert [tuple(r) for r in df.collect()] == [("F", 2, 0), ("O", 1, 1)]
    # multi-agg: {value}_{alias}; sum cells stay NULL (dialect parity)
    df2 = lake.sql(
        "PIVOT db.pv ON pri USING SUM(amt) AS s, COUNT(*) AS n "
        "GROUP BY st ORDER BY st"
    )
    assert df2.columns == ["st", "hi_s", "hi_n", "lo_s", "lo_n"]
    assert [tuple(r) for r in df2.collect()] == [
        ("F", 5.0, 2, None, 0), ("O", 10.5, 1, 4.0, 1),
    ]
    # IN restriction + implicit GROUP BY (remaining columns)
    df3 = lake.sql("PIVOT db.pv ON pri IN ('hi') USING SUM(amt) AS s")
    assert sorted(df3.columns) == ["hi_s", "st"]
    # no USING defaults to unaliased COUNT(*)
    df4 = lake.sql("PIVOT db.pv ON pri GROUP BY st ORDER BY st")
    assert df4.columns == ["st", "hi", "lo"]
    with pytest.raises(WarehouseError, match="AS aliases"):
        lake.sql("PIVOT db.pv ON pri USING SUM(amt), COUNT(*) GROUP BY st")
    with pytest.raises(WarehouseError, match="single ON column"):
        lake.sql("PIVOT db.pv ON pri, st USING COUNT(*) AS n")


def test_unpivot_statement_forms(lake):
    lake.sql("CREATE TABLE polaris.db.upv (id INT, a INT, b INT) USING ICEBERG")
    lake.sql("INSERT INTO db.upv VALUES (1, 10, NULL), (2, NULL, 30)")
    # NULL value rows drop (dialect parity; Spark's unpivot keeps them)
    df = lake.sql("UNPIVOT db.upv ON a, b INTO NAME k VALUE v ORDER BY id")
    assert df.columns == ["id", "k", "v"]
    assert [tuple(r) for r in df.collect()] == [(1, "a", 10), (2, "b", 30)]
    # COLUMNS(* EXCLUDE (…)) sugar
    df2 = lake.sql(
        "UNPIVOT db.upv ON COLUMNS(* EXCLUDE (id)) INTO NAME k VALUE v ORDER BY id"
    )
    assert [tuple(r) for r in df2.collect()] == [(1, "a", 10), (2, "b", 30)]
    with pytest.raises(WarehouseError, match="unknown columns"):
        lake.sql("UNPIVOT db.upv ON nope INTO NAME k VALUE v")


# -------------------------------------- 13. COLUMNS() star expression


def test_columns_expansion_forms(lake):
    lake.sql(
        "CREATE TABLE polaris.db.cx (l_a INT, l_b DOUBLE, c_a STRING, c_b STRING) "
        "USING ICEBERG"
    )
    lake.sql("INSERT INTO db.cx VALUES (1, 2.5, 'x', 'y'), (4, 0.5, 'p', 'q')")
    # regex is an unanchored SEARCH, expansion in schema order
    df = lake.sql("SELECT COLUMNS('a') FROM db.cx ORDER BY l_a")
    assert df.columns == ["l_a", "c_a"]
    # function application keeps the bare column names
    df2 = lake.sql("SELECT min(COLUMNS('l_.*')) FROM db.cx")
    assert df2.columns == ["l_a", "l_b"]
    assert [tuple(r) for r in df2.collect()] == [(1, 0.5)]
    # COLUMNS(* EXCLUDE (…)) and expression application
    df3 = lake.sql("SELECT COLUMNS(* EXCLUDE (c_a, c_b)) FROM db.cx ORDER BY l_a")
    assert df3.columns == ["l_a", "l_b"]
    df4 = lake.sql("SELECT COLUMNS('l_.*') + 1 FROM db.cx ORDER BY l_a")
    assert [tuple(r) for r in df4.collect()] == [(2, 3.5), (5, 1.5)]
    # guards
    with pytest.raises(WarehouseError, match="no columns match"):
        lake.sql("SELECT COLUMNS('zzz') FROM db.cx")
    with pytest.raises(WarehouseError, match="explicit alias"):
        lake.sql("SELECT COLUMNS('a') AS x FROM db.cx")
    # a column named `columns` keeps the identifier meaning
    lake.sql("CREATE TABLE polaris.db.cxi (columns INT) USING ICEBERG")
    lake.sql("INSERT INTO db.cxi VALUES (5)")
    assert lake.sql("SELECT columns FROM db.cxi").collect()[0][0] == 5


def test_trailing_comma_tolerance(lake):
    """Dialect trailing commas: before FROM / any clause keyword / at
    statement end; never inside function argument lists or strings."""
    lake.sql("CREATE TABLE polaris.db.tc (a INT, b INT) USING ICEBERG")
    lake.sql("INSERT INTO db.tc VALUES (1, 2)")
    assert lake.sql("SELECT a, b, FROM db.tc").collect() == lake.sql(
        "SELECT a, b FROM db.tc"
    ).collect()
    assert lake.sql("SELECT a, FROM db.tc WHERE b > 0").columns == ["a"]
    assert lake.sql("SELECT a, b FROM db.tc GROUP BY a, b,").count() == 1
    for s in [
        "SELECT a, b FROM t",
        "SELECT 'a, FROM x' AS s FROM t",
        "SELECT f(a, b) FROM t",
        # QUALIFY / WINDOW are identifier-legal, so a comma before them is
        # a projection comma, not a trailing comma (the original set
        # included both and corrupted these into aliases — r12 fix)
        "SELECT x, qualify FROM t",
        "SELECT x, window FROM t",
        "SELECT a, b, window FROM t WHERE b > 0",
    ]:
        assert dialect_sql(s) == s, s
