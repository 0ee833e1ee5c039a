"""Property fuzz for the SQL front-end's two newest statement families
(sql_frontend.py: MERGE INTO forms and CALL …system procedures).

The existing fuzz suites cover the rewriter (casing/aliases/literals)
and view bodies; this one drives the MERGE grammar across
matched/not-matched clause permutations, alias shadowing (a target
alias named like the source table and vice versa), subquery vs table
sources, keyword case and whitespace — each against a plain-Python
dict model of upsert/delete semantics — and the CALL argument grammar
across quote styles, spacing, optional arguments, and case.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_counter = [0]


def _fresh_lake(spark, tmp_path_factory):
    from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL

    _counter[0] += 1
    return LakehouseSQL(spark, str(tmp_path_factory.mktemp(f"mcf{_counter[0]}")))


def _case_mix(word: str, flags: list[bool]) -> str:
    return "".join(
        c.upper() if flags[i % len(flags)] else c.lower() for i, c in enumerate(word)
    )


_row = st.tuples(st.integers(0, 6), st.sampled_from(["a", "b", "c"]))
_rows = st.lists(_row, max_size=5, unique_by=lambda r: r[0])
_flags = st.lists(st.booleans(), min_size=1, max_size=3)
_ws = st.sampled_from([" ", "  ", "\n", "\n  "])


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    tgt=_rows,
    src=_rows,
    form=st.sampled_from(["upsert", "delete", "delete_insert"]),
    t_alias=st.sampled_from([None, "t", "s1"]),  # "s1" SHADOWS the source table name
    s_alias=st.sampled_from([None, "s", "t1"]),  # "t1" shadows the target
    use_subquery=st.booleans(),
    flags=_flags,
    ws=_ws,
)
def test_merge_permutations_match_dict_model(
    spark, tmp_path_factory, tgt, src, form, t_alias, s_alias, use_subquery, flags, ws
):
    lake = _fresh_lake(spark, tmp_path_factory)
    lake.sql("CREATE TABLE polaris.p.t1 (id INT, v STRING) USING ICEBERG")
    lake.sql("CREATE TABLE polaris.p.s1 (id INT, v STRING) USING ICEBERG")
    if tgt:
        lake.sql(
            "INSERT INTO polaris.p.t1 VALUES "
            + ", ".join(f"({i}, '{v}')" for i, v in tgt)
        )
    if src:
        lake.sql(
            "INSERT INTO polaris.p.s1 VALUES "
            + ", ".join(f"({i}, '{v}')" for i, v in src)
        )

    kw = lambda w: _case_mix(w, flags)  # noqa: E731
    t_ref = "polaris.p.t1" + (f" {kw('AS')} {t_alias}" if t_alias else "")
    src_txt = f"({kw('SELECT')} id, v {kw('FROM')} p.s1)" if use_subquery else "p.s1"
    s_ref = src_txt + (f" {kw('AS')} {s_alias}" if s_alias else "")
    tq = t_alias or "t1"
    sq = s_alias or "s1"
    clauses = {
        "upsert": (
            f"{kw('WHEN')} {kw('MATCHED')} {kw('THEN')} {kw('UPDATE')} {kw('SET')} *"
            f"{ws}{kw('WHEN')} {kw('NOT')} {kw('MATCHED')} {kw('THEN')} {kw('INSERT')} *"
        ),
        "delete": f"{kw('WHEN')} {kw('MATCHED')} {kw('THEN')} {kw('DELETE')}",
        "delete_insert": (
            f"{kw('WHEN')} {kw('MATCHED')} {kw('THEN')} {kw('DELETE')}"
            f"{ws}{kw('WHEN')} {kw('NOT')} {kw('MATCHED')} {kw('THEN')} {kw('INSERT')} *"
        ),
    }[form]
    lake.sql(
        f"{kw('MERGE')}{ws}{kw('INTO')} {t_ref}{ws}{kw('USING')} {s_ref}"
        f"{ws}{kw('ON')} {tq}.id = {sq}.id{ws}{clauses}"
    )

    t_map, s_map = dict(tgt), dict(src)
    if form == "upsert":
        want = {**t_map, **s_map}
    elif form == "delete":
        want = {i: v for i, v in t_map.items() if i not in s_map}
    else:
        want = {i: v for i, v in t_map.items() if i not in s_map}
        want.update({i: v for i, v in s_map.items() if i not in t_map})
    got = {r.id: r.v for r in lake.sql("SELECT id, v FROM p.t1").collect()}
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    q=st.sampled_from(["'", '"']),
    flags=_flags,
    ws=_ws,
    retain=st.one_of(st.none(), st.integers(1, 3)),
    rollback_to=st.integers(1, 3),
)
def test_call_argument_forms(spark, tmp_path_factory, q, flags, ws, retain, rollback_to):
    lake = _fresh_lake(spark, tmp_path_factory)
    kw = lambda w: _case_mix(w, flags)  # noqa: E731
    lake.sql("CREATE TABLE polaris.p.c (id INT) USING ICEBERG")
    for i in range(3):
        lake.sql(f"INSERT INTO polaris.p.c VALUES ({i})")

    # rollback_to_snapshot: quote style / spacing / keyword case
    out = lake.sql(
        f"{kw('CALL')} polaris.system.{kw('rollback_to_snapshot')}{ws}("
        f"{ws}table{ws}=>{ws}{q}p.c{q},{ws}snapshot_id{ws}=>{ws}{rollback_to}{ws})"
    ).collect()[0]
    assert out.current_snapshot_id == rollback_to
    assert lake.sql("SELECT COUNT(*) AS n FROM p.c").collect()[0].n == rollback_to

    # roll forward again so expire has history to chew on
    lake.sql("INSERT INTO polaris.p.c VALUES (99)")

    # expire_snapshots: optional retain_last present/absent
    arg = f",{ws}retain_last{ws}=>{ws}{retain}" if retain is not None else ""
    lake.sql(
        f"{kw('CALL')} polaris.system.{kw('expire_snapshots')}{ws}("
        f"{ws}table{ws}=>{ws}{q}p.c{q}{arg}{ws})"
    )
    t = lake.wh.table("p", "c")
    assert len(t._snaps()) == (retain if retain is not None else 1)
    # the surviving state is unchanged by maintenance
    assert lake.sql("SELECT COUNT(*) AS n FROM p.c").collect()[0].n == rollback_to + 1

    # remove_orphan_files tolerates the same formatting dimensions
    orphans = lake.sql(
        f"{kw('CALL')} polaris.system.{kw('remove_orphan_files')}{ws}("
        f"{ws}table{ws}=>{ws}{q}p.c{q}{ws})"
    ).collect()[0]
    assert orphans.orphan_file_location_count == 0


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    q=st.sampled_from(["'", '"']),
    flags=_flags,
    ws=_ws,
    strategy=st.one_of(st.none(), st.sampled_from(["binpack", "sort"])),
    partitions=st.one_of(st.none(), st.integers(1, 2)),
)
def test_call_rewrite_data_files_optional_args(
    spark, tmp_path_factory, q, flags, ws, strategy, partitions
):
    lake = _fresh_lake(spark, tmp_path_factory)
    kw = lambda w: _case_mix(w, flags)  # noqa: E731
    lake.sql("CREATE TABLE polaris.p.r (id INT, v STRING) USING ICEBERG")
    for i in range(3):
        lake.sql(f"INSERT INTO polaris.p.r VALUES ({i}, 'x{i}')")
    args = f"{ws}table{ws}=>{ws}{q}p.r{q}"
    if strategy is not None:
        sort = f",{ws}sort_order{ws}=>{ws}{q}id{q}" if strategy == "sort" else ""
        args += f",{ws}strategy{ws}=>{ws}{q}{strategy}{q}" + sort
    if partitions is not None:
        args += f",{ws}target_partitions{ws}=>{ws}{partitions}"
    lake.sql(
        f"{kw('CALL')} polaris.system.{kw('rewrite_data_files')}{ws}({args}{ws})"
    )
    got = sorted((r.id, r.v) for r in lake.sql("SELECT id, v FROM p.r").collect())
    assert got == [(0, "x0"), (1, "x1"), (2, "x2")]


def test_merge_rejects_mismatched_on_columns(spark, tmp_path_factory):
    from minio_iceberg_polaris_lakehouse_spark.warehouse import WarehouseError

    lake = _fresh_lake(spark, tmp_path_factory)
    lake.sql("CREATE TABLE polaris.p.t1 (id INT, v STRING) USING ICEBERG")
    lake.sql("CREATE TABLE polaris.p.s1 (id INT, v STRING) USING ICEBERG")
    with pytest.raises(WarehouseError, match="same column name"):
        lake.sql(
            "MERGE INTO polaris.p.t1 USING p.s1 ON t1.id = s1.v "
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
        )


def test_merge_conditional_matched_arms(spark, tmp_path):
    from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL

    lake = LakehouseSQL(spark, str(tmp_path / "mc_wh"))
    """WHEN MATCHED AND <cond>: only matched rows passing the condition
    take the arm; the rest carry over unchanged (incl. NULL-predicate
    rows — SQL three-valued logic means the arm does not fire)."""
    lake.sql("CREATE TABLE polaris.db.mc (id INT, v INT) USING ICEBERG")
    lake.sql("INSERT INTO db.mc VALUES (1, 10), (2, 20), (3, NULL), (4, 40)")
    lake.sql("CREATE TABLE polaris.db.mc_src (id INT, v INT) USING ICEBERG")
    lake.sql("INSERT INTO db.mc_src VALUES (1, 11), (2, 5), (3, 33), (9, 99)")
    # update only where the source value is HIGHER; NULL target compares
    # NULL -> arm does not fire, row carries over
    lake.sql(
        "MERGE INTO db.mc t USING db.mc_src s ON t.id = s.id "
        "WHEN MATCHED AND s.v > t.v THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    got = sorted((r.id, r.v) for r in lake.sql("SELECT id, v FROM db.mc").collect())
    assert got == [(1, 11), (2, 20), (3, None), (4, 40), (9, 99)]
    # conditional DELETE: drop matched rows whose source value < 50
    lake.sql("CREATE TABLE polaris.db.mc_del (id INT, v INT) USING ICEBERG")
    lake.sql("INSERT INTO db.mc_del VALUES (1, 11), (2, 20), (9, 99)")
    lake.sql(
        "MERGE INTO db.mc_del t USING db.mc_src s ON t.id = s.id "
        "WHEN MATCHED AND s.v < 50 THEN DELETE"
    )
    got = sorted((r.id, r.v) for r in lake.sql("SELECT id, v FROM db.mc_del").collect())
    # ids 1 (s.v=11) and 2 (s.v=5) match below 50 and drop; 9 (s.v=99)
    # matches but fails the condition and carries over
    assert got == [(9, 99)]


def test_merge_condition_uses_statement_aliases(spark, tmp_path):
    """The conditional arm resolves against the STATEMENT's aliases —
    including swapped s/t naming — not hardcoded internals."""
    from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL

    lake = LakehouseSQL(spark, str(tmp_path / "ma_wh"))
    lake.sql("CREATE TABLE polaris.db.a1 (id INT, v INT) USING ICEBERG")
    lake.sql("INSERT INTO db.a1 VALUES (1, 10), (2, 20)")
    lake.sql("CREATE TABLE polaris.db.a2 (id INT, v INT) USING ICEBERG")
    lake.sql("INSERT INTO db.a2 VALUES (1, 99), (2, 1)")
    # adversarial: target aliased 's', source aliased 't' — the condition
    # must still mean "source value greater than target value"
    lake.sql(
        "MERGE INTO db.a1 AS s USING db.a2 AS t ON s.id = t.id "
        "WHEN MATCHED AND t.v > s.v THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    got = sorted((r.id, r.v) for r in lake.sql("SELECT id, v FROM db.a1").collect())
    assert got == [(1, 99), (2, 20)]
    # arbitrary aliases work too
    lake.sql("CREATE TABLE polaris.db.a3 (id INT, v INT) USING ICEBERG")
    lake.sql("INSERT INTO db.a3 VALUES (1, 5)")
    lake.sql(
        "MERGE INTO db.a3 tgt USING db.a2 src ON tgt.id = src.id "
        "WHEN MATCHED AND src.v >= 99 THEN DELETE"
    )
    assert lake.sql("SELECT * FROM db.a3").count() == 0
