"""Incremental ANN index maintenance — keep a persisted IVF index in
sync with a LIVE embedding table without rebuilding it.

`similarity.build_ivf_index` materializes the 100 TB serving shape (a
cell-partitioned index + a metadata-sized centroid table) but rebuilds
from scratch. A production vector store churns: new documents arrive,
deleted documents must leave the index. This module closes that loop
with the engine's own CDC machinery:

- the CORPUS is a warehouse table (`vec_id bigint, e array<double>`)
  taking ordinary appends / deletes / upserts;
- the INDEX is a cell-partitioned warehouse table with `vec_id`
  declared as its identifier field, so applying churn is the standard
  CDC pair: `upsert()` (one equality-delete + data snapshot) for new or
  re-embedded vectors, `delete_keys()` for removals — both O(batch),
  the index is never rescanned;
- `refresh_ivf_index` reads the corpus CHANGELOG since the last indexed
  snapshot (`Table.changes` — O(changed data)), resolves each changed
  key's FINAL state in the window, assigns new vectors against the
  FROZEN centroids (broadcast, map-side argmax — one row per vector
  crosses the exchange), and applies exactly that delta. The
  watermark (`ivf.last-indexed-snapshot`) rides the index table's
  properties, so refresh is resumable and idempotent.

Centroids stay frozen between rebuilds — standard IVF practice (faiss
`add` after `train`): assignment quality degrades only as the data
distribution drifts, and the refresh result is BY CONSTRUCTION equal to
a full rebuild with the same centroids, which is what the tests pin.

At 100 TB: refresh cost is O(churn) + one upsert/delete commit on the
index; a nightly rebuild would be O(corpus). The serving path
(`similarity.ivf_indexed_topk`'s partition-pruned scan shape) is
unchanged — readers see the index flip atomically per commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from minio_iceberg_polaris_lakehouse_spark.operators.similarity import (
    K_COARSE,
    as_double,
    dot,
    norm,
)
from minio_iceberg_polaris_lakehouse_spark.warehouse import Table, Warehouse

WATERMARK_PROP = "ivf.last-indexed-snapshot"


def assign_cells(vectors: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, cell, e): argmax-cosine assignment against the broadcast
    centroid table — the same operand order as similarity._ivf_scored,
    folded map-side as MAX(struct(csim, -cell)) so ONE row per vector
    crosses the exchange, never K_COARSE."""
    vn = vectors.select("vec_id", "e", norm(F.col("e")).alias("ne"))
    scored = vn.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "e",
        "cell",
        (dot(F.col("e"), F.col("ce")) / (F.col("ne") * F.col("nce"))).alias("csim"),
    )
    best = scored.groupBy("vec_id").agg(
        F.max(F.struct(F.col("csim"), (-F.col("cell")).alias("nc"))).alias("b"),
        F.first("e").alias("e"),
    )
    return best.select("vec_id", (-F.col("b.nc")).cast("int").alias("cell"), "e")


def build_ivf_index_tables(
    wh: Warehouse, corpus: Table, ns: str = "ann"
) -> tuple[Table, Table]:
    """Full build from a warehouse-table corpus: deterministic
    xxhash64-ranked K_COARSE sample as the frozen coarse quantizer
    (no stored model, no driver-side fit), one assignment pass, index
    written cell-partitioned with `vec_id` as its identifier field (the
    key refresh's upsert/delete_keys apply churn by). Records the
    corpus snapshot it indexed as the refresh watermark."""
    v = corpus.read().select("vec_id", as_double("e").alias("e"))
    vn = v.select("vec_id", "e", norm(F.col("e")).alias("ne"))
    seeds = (
        vn.withColumn("h", F.xxhash64("vec_id", F.lit(7))).orderBy("h").limit(K_COARSE)
    )
    cells = seeds.select(
        F.row_number().over(Window.orderBy("h")).cast("int").alias("cell"),
        F.col("e").alias("ce"),
        F.col("ne").alias("nce"),
    )
    cent = wh.create_table(
        ns, "ivf_centroids", "cell int, ce array<double>, nce double",
        if_not_exists=True,
    )
    idx = wh.create_table(
        ns, "ivf_index", "vec_id bigint, cell int, e array<double>",
        partition_by="cell", if_not_exists=True,
    )
    cent.overwrite(cells)
    idx.overwrite(assign_cells(v, cent.read()).repartition("cell"))
    idx.set_identifier_fields("vec_id")
    idx.set_properties({WATERMARK_PROP: str(corpus.current_snapshot_id() or 0)})
    return idx, cent


def _final_changes(corpus: Table, last: int | None):
    """(live, dead): each changed key's FINAL state in the changelog
    window (last, current]. The HIGHEST ordinal wins; a delete and an
    insert in the same commit (copy-on-write update, upsert) resolve to
    the insert — row replaced, not removed."""
    ch = corpus.changes(from_version=last)
    rank = F.struct(
        F.col("_change_ordinal"),
        F.when(F.col("_change_type") == "insert", 1).otherwise(0).alias("ins"),
    )
    final = (
        ch.groupBy("vec_id")
        .agg(F.max_by(F.struct("_change_type", "e"), rank).alias("f"))
        .select("vec_id", F.col("f._change_type").alias("op"), F.col("f.e").alias("e"))
    )
    live = final.filter("op = 'insert'").select("vec_id", as_double("e").alias("e"))
    dead = final.filter("op = 'delete'").select("vec_id")
    return live, dead


def refresh_ivf_index(wh: Warehouse, corpus: Table, ns: str = "ann") -> dict:
    """Fold the corpus churn since the last indexed snapshot into the
    index: O(changed data) read, O(delta) writes, frozen centroids.
    Returns {'upserted': n, 'deleted': n, 'from': sid, 'to': sid}."""
    idx = wh.table(ns, "ivf_index")
    cent = wh.table(ns, "ivf_centroids")
    last = int(idx.properties().get(WATERMARK_PROP, "0")) or None
    cur = corpus.current_snapshot_id()
    if cur == last:
        return {"upserted": 0, "deleted": 0, "from": last, "to": cur}
    live, dead = _final_changes(corpus, last)
    n_up, n_del = live.count(), dead.count()
    if n_up:
        idx.upsert(assign_cells(live, cent.read()))
    if n_del:
        idx.delete_keys(dead)
    idx.set_properties({WATERMARK_PROP: str(cur)})
    return {"upserted": n_up, "deleted": n_del, "from": last, "to": cur}


# ---------------------------------------------------------------- PQ twin
# The product-quantization index (similarity_pq: 64×-compressed codes +
# a persisted codebook) maintains with the SAME changelog discipline —
# frozen codebook between rebuilds, churn applied as keyed upsert /
# delete_keys on the codes table, Arrow-batched encode of ONLY the delta.


def _books_from_table(cent_rows) -> "object":
    import numpy as np

    from minio_iceberg_polaris_lakehouse_spark.operators.similarity_pq import (
        K_CODES,
        M_SUB,
    )

    sub = len(cent_rows[0].center)
    books = np.empty((M_SUB, K_CODES, sub))
    for r in cent_rows:
        books[r.m][r.code] = r.center
    return books


def build_pq_index_tables(
    wh: Warehouse, corpus: Table, ns: str = "ann"
) -> tuple[Table, Table]:
    """Full PQ build from a warehouse-table corpus: deterministic
    xxhash64-ranked training sample (O(N_TRAIN) driver movement — the
    faiss train step), codebook persisted as a table, corpus encoded by
    the Arrow-batched kernel, codes keyed by `vec_id` for refresh."""
    import numpy as np

    from minio_iceberg_polaris_lakehouse_spark.operators.similarity_pq import (
        K_CODES,
        M_SUB,
        N_TRAIN,
        _encode_codes,
        train_codebook,
    )

    v = corpus.read().select("vec_id", as_double("e").alias("e"))
    sample = (
        v.withColumn("h", F.xxhash64("vec_id", F.lit(11)))
        .orderBy("h", "vec_id")
        .limit(N_TRAIN)
        .collect()
    )
    books = train_codebook(np.array([r.e for r in sample], dtype=np.float64))
    book_t = wh.create_table(
        ns, "pq_codebook", "m int, code int, center array<double>", if_not_exists=True
    )
    codes_t = wh.create_table(
        ns, "pq_codes", "vec_id bigint, codes array<int>", if_not_exists=True
    )
    book_t.overwrite(
        wh.spark.createDataFrame(
            [
                (m, k, [float(x) for x in books[m][k]])
                for m in range(M_SUB)
                for k in range(K_CODES)
            ],
            "m int, code int, center array<double>",
        )
    )
    codes_t.overwrite(v.select("vec_id", _encode_codes(books)(F.col("e")).alias("codes")))
    codes_t.set_identifier_fields("vec_id")
    codes_t.set_properties({WATERMARK_PROP: str(corpus.current_snapshot_id() or 0)})
    return codes_t, book_t


def refresh_pq_index(wh: Warehouse, corpus: Table, ns: str = "ann") -> dict:
    """O(churn) PQ refresh: encode ONLY the delta against the frozen
    codebook (read back from the catalog — serving nodes never
    retrain), apply as keyed upsert + delete_keys."""
    from minio_iceberg_polaris_lakehouse_spark.operators.similarity_pq import (
        _encode_codes,
    )

    codes_t = wh.table(ns, "pq_codes")
    book_t = wh.table(ns, "pq_codebook")
    last = int(codes_t.properties().get(WATERMARK_PROP, "0")) or None
    cur = corpus.current_snapshot_id()
    if cur == last:
        return {"upserted": 0, "deleted": 0, "from": last, "to": cur}
    live, dead = _final_changes(corpus, last)
    n_up, n_del = live.count(), dead.count()
    if n_up:
        books = _books_from_table(book_t.read().collect())
        codes_t.upsert(
            live.select("vec_id", _encode_codes(books)(F.col("e")).alias("codes"))
        )
    if n_del:
        codes_t.delete_keys(dead)
    codes_t.set_properties({WATERMARK_PROP: str(cur)})
    return {"upserted": n_up, "deleted": n_del, "from": last, "to": cur}


# ---------------------------------------------------------------- LSH twin
# The r11 exact-oracle LSH index (similarity.build_lsh_index: persisted
# integer-exact signatures, 8 rows per vector) maintains with the same
# changelog discipline. The hash family is STATELESS (seeded arithmetic,
# no trained model), so unlike IVF/PQ there is nothing frozen to drift:
# a maintained index is bit-identical to a full rebuild FOREVER, not
# just until the distribution moves.

LSH_WATERMARK_PROP = "lsh.last-indexed-snapshot"


def build_lsh_index_tables(wh: Warehouse, corpus: Table, ns: str = "ann") -> Table:
    """Full signature build from a warehouse-table corpus, with
    (vec_id, table_id) as the composite identifier the refresh applies
    churn by — one vector owns exactly N_TABLES index rows, and an
    upsert batch carrying all of them has unique keys."""
    from minio_iceberg_polaris_lakehouse_spark.operators.similarity import (
        lshx_signatures,
    )

    v = corpus.read().select("vec_id", as_double("e").alias("e"))
    idx = wh.create_table(
        ns,
        "lsh_index",
        "vec_id bigint, table_id int, bucket int, e array<double>",
        partition_by="table_id",
        if_not_exists=True,
    )
    idx.overwrite(lshx_signatures(v).repartitionByRange("table_id", "bucket"))
    idx.set_identifier_fields("vec_id", "table_id")
    idx.set_properties({LSH_WATERMARK_PROP: str(corpus.current_snapshot_id() or 0)})
    return idx


def refresh_lsh_index(wh: Warehouse, corpus: Table, ns: str = "ann") -> dict:
    """O(churn) LSH refresh: re-signature ONLY the delta (48-projection
    fold over changed vectors), apply as keyed upsert; removals expand
    to their N_TABLES composite keys for delete_keys — the index is
    never rescanned."""
    from minio_iceberg_polaris_lakehouse_spark.operators.similarity import (
        N_TABLES,
        lshx_signatures,
    )

    idx = wh.table(ns, "lsh_index")
    last = int(idx.properties().get(LSH_WATERMARK_PROP, "0")) or None
    cur = corpus.current_snapshot_id()
    if cur == last:
        return {"upserted": 0, "deleted": 0, "from": last, "to": cur}
    live, dead = _final_changes(corpus, last)
    n_up, n_del = live.count(), dead.count()
    if n_up:
        idx.upsert(lshx_signatures(live))
    if n_del:
        tables = idx.spark.range(N_TABLES).select(F.col("id").cast("int").alias("table_id"))
        idx.delete_keys(dead.crossJoin(tables))
    idx.set_properties({LSH_WATERMARK_PROP: str(cur)})
    return {"upserted": n_up, "deleted": n_del, "from": last, "to": cur}
