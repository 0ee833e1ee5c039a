"""tools/make_scale_data.py fidelity: K× replicas must preserve schemas
byte-for-byte and join fan-outs exactly — otherwise the scale headroom
measurements in SCALE.md measure data drift, not the engine."""

from __future__ import annotations

import subprocess
import sys

import duckdb
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def dst(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scale") / "k2")
    subprocess.run(
        [sys.executable, "tools/make_scale_data.py", SRC, out, "2"],
        check=True,
        capture_output=True,
    )
    return out


def test_schemas_and_row_counts(dst):
    con = duckdb.connect()
    for t in TABLES:
        a = pq.read_schema(f"{SRC}/{t}.parquet")
        b = pq.read_schema(f"{dst}/{t}.parquet")
        assert [(f.name, str(f.type)) for f in a] == [
            (f.name, str(f.type)) for f in b
        ], t
        n_src = con.execute(f"SELECT count(*) FROM '{SRC}/{t}.parquet'").fetchone()[0]
        n_dst = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        expect = n_src if t in ("region", "nation") else 2 * n_src
        assert n_dst == expect, (t, n_src, n_dst)


def test_join_fanout_preserved(dst):
    """Every lineitem row must still join exactly one order/part/supplier
    and keys must not collide across copies — the property that makes a
    K× run a clean scaling measurement."""
    con = duckdb.connect()
    for fk, dim, pk in [
        ("l_orderkey", "orders", "o_orderkey"),
        ("l_partkey", "part", "p_partkey"),
        ("l_suppkey", "supplier", "s_suppkey"),
    ]:
        dangling = con.execute(
            f"SELECT count(*) FROM '{dst}/lineitem.parquet' l "
            f"LEFT JOIN '{dst}/{dim}.parquet' d ON l.{fk} = d.{pk} "
            f"WHERE d.{pk} IS NULL"
        ).fetchone()[0]
        assert dangling == 0, (fk, dangling)
        dup = con.execute(
            f"SELECT count(*) - count(DISTINCT {pk}) FROM '{dst}/{dim}.parquet'"
        ).fetchone()[0]
        assert dup == 0, (dim, dup)


def test_documents_decorrelated_across_copies(dst):
    """Copy texts are word-shuffled: same length/words, different shingle
    order — so near-dup density stays that of the source corpus."""
    con = duckdb.connect()
    n = con.execute(f"SELECT count(*) FROM '{SRC}/documents.parquet'").fetchone()[0]
    stride = (
        con.execute(f"SELECT max(doc_id) FROM '{SRC}/documents.parquet'").fetchone()[0]
        + 1
    )
    same_text, total = con.execute(
        f"SELECT sum(CASE WHEN a.text = b.text THEN 1 ELSE 0 END), count(*) "
        f"FROM '{dst}/documents.parquet' a JOIN '{dst}/documents.parquet' b "
        f"ON b.doc_id = a.doc_id + {stride} "
        f"WHERE a.doc_id <= {stride}"
    ).fetchone()
    assert total == n
    # multi-word docs must differ after the shuffle (single-word docs can't)
    multi = con.execute(
        f"SELECT count(*) FROM '{SRC}/documents.parquet' "
        f"WHERE len(regexp_split_to_array(trim(text), '\\s+')) > 3"
    ).fetchone()[0]
    assert same_text <= n - multi * 0.9  # allow rare shuffle fixed points
