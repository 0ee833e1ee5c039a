"""Scale-factor headroom data generator: replicate an existing testdata
dir K× with consistent key shifting, preserving every schema byte-for-byte
(the driver's synthetic types differ from stock TPC-H — double prices,
timestamp order dates — so real dbgen output would not load).

Key scheme per copy i (0 = the original rows, unshifted):
- every table's primary key shifts by i * (max_key) so copies never collide
- foreign keys shift by the SAME stride, so copy i of lineitem joins copy i
  of orders/part/supplier — join fan-outs are IDENTICAL to the source dir,
  which is what makes the K× run a clean scaling measurement
- region/nation stay fixed (25 nations at every TPC-H scale factor)
- documents: each copy's text is word-shuffled with a per-(copy, doc)
  deterministic permutation — shingle sets decorrelate across copies, so
  near-duplicate DENSITY stays that of the source corpus (plain text
  replication would add K² cross-copy candidate pairs for every doc and
  the dedup timing would measure that data artifact, not the plan)
- embeddings: vec_id shifts; vectors replicate as-is (the ANN gates
  compare against an in-plan exact twin on the same data, so duplicate
  vectors stay self-consistent; timing is what the scale run measures)

Usage: python tools/make_scale_data.py SRC_DIR DST_DIR K
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SHIFT_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
COPY_AS_IS = ["region", "nation"]


def _stride(con: duckdb.DuckDBPyConnection, src: str, table: str, col: str) -> int:
    # max+1: ids may start at 0, so a max-only stride would make copy i's
    # lowest key collide with copy i-1's highest
    return (
        con.execute(
            f"SELECT max({col}) FROM read_parquet('{src}/{table}.parquet')"
        ).fetchone()[0]
        + 1
    )


_STRIDE_SOURCE = {  # column -> (owning table, its key) the stride comes from
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
}


def _replicate_relational(con, src: str, dst: str, k: int) -> None:
    strides = {
        c: _stride(con, src, owner, key) for c, (owner, key) in _STRIDE_SOURCE.items()
    }
    for t, cols in SHIFT_KEYS.items():
        schema = pq.read_schema(f"{src}/{t}.parquet")
        exprs = []
        for f in schema.names:
            if f in cols:
                exprs.append(f"CAST({f} + i * {strides[f]} AS BIGINT) AS {f}")
            else:
                exprs.append(f)
        con.execute(
            f"COPY (SELECT {', '.join(exprs)} "
            f"FROM read_parquet('{src}/{t}.parquet'), range({k}) r(i) "
            f"ORDER BY i) TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )


def _shuffle_words(text: str, salt: int) -> str:
    words = text.split()
    keyed = sorted(
        range(len(words)),
        key=lambda j: hashlib.blake2b(
            f"{salt}:{j}".encode(), digest_size=8
        ).digest(),
    )
    return " ".join(words[j] for j in keyed)


def _replicate_documents(src: str, dst: str, k: int) -> None:
    tb = pq.read_table(f"{src}/documents.parquet")
    n = tb.num_rows
    stride = (max(tb["doc_id"].to_pylist()) + 1) if n else 0
    parts = [tb]
    for i in range(1, k):
        ids = [d + i * stride for d in tb["doc_id"].to_pylist()]
        texts = [_shuffle_words(t, i * 1_000_003 + d) for t, d in zip(tb["text"].to_pylist(), ids)]
        cols = {}
        for name in tb.schema.names:
            if name == "doc_id":
                cols[name] = pa.array(ids, type=tb.schema.field(name).type)
            elif name == "text":
                cols[name] = pa.array(texts, type=tb.schema.field(name).type)
            else:
                cols[name] = tb[name]
        parts.append(pa.table(cols, schema=tb.schema))
    pq.write_table(pa.concat_tables(parts), f"{dst}/documents.parquet")


def _replicate_embeddings(src: str, dst: str, k: int) -> None:
    tb = pq.read_table(f"{src}/embeddings.parquet")
    stride = (max(tb["vec_id"].to_pylist()) + 1) if tb.num_rows else 0
    parts = [tb]
    for i in range(1, k):
        cols = {}
        for name in tb.schema.names:
            if name == "vec_id":
                cols[name] = pa.array(
                    [v + i * stride for v in tb["vec_id"].to_pylist()],
                    type=tb.schema.field(name).type,
                )
            else:
                cols[name] = tb[name]
        parts.append(pa.table(cols, schema=tb.schema))
    pq.write_table(pa.concat_tables(parts), f"{dst}/embeddings.parquet")


def main() -> None:
    src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    _replicate_relational(con, src, dst, k)
    _replicate_documents(src, dst, k)
    _replicate_embeddings(src, dst, k)
    for t in [*SHIFT_KEYS, *COPY_AS_IS, "documents", "embeddings"]:
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
