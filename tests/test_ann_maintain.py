"""Incremental IVF index maintenance (operators/ann_maintain.py): the
refresh must equal a full rebuild with the same frozen centroids, cost
O(churn), and survive resumption/no-op cases."""

from __future__ import annotations

import random

import pytest

from minio_iceberg_polaris_lakehouse_spark.operators.ann_maintain import (
    WATERMARK_PROP,
    build_ivf_index_tables,
    refresh_ivf_index,
)
from minio_iceberg_polaris_lakehouse_spark.warehouse import Warehouse


def _vecs(rng, ids):
    return [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in ids]


@pytest.fixture()
def setup(spark, tmp_path):
    rng = random.Random(11)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    corpus = wh.create_table("ann", "corpus", "vec_id bigint, e array<double>")
    corpus.append(
        spark.createDataFrame(_vecs(rng, range(40)), "vec_id bigint, e array<double>")
    )
    idx, cent = build_ivf_index_tables(wh, corpus)
    return rng, wh, corpus, idx, cent


def _index_state(idx):
    return {r.vec_id: r.cell for r in idx.read().collect()}


def test_build_assigns_every_vector_once(setup):
    _rng, _wh, corpus, idx, cent = setup
    state = _index_state(idx)
    assert len(state) == 40
    assert set(state) == set(range(40))
    k = cent.read().count()
    assert 0 < k and set(state.values()) <= set(range(1, k + 1))
    assert idx.identifier_fields() == ["vec_id"]


def test_refresh_equals_full_rebuild(setup, spark, tmp_path):
    """Append + delete churn, then refresh: the index must match a
    from-scratch rebuild that uses the SAME centroids — assignment is a
    pure function of (vector, centroids), so incremental == full."""
    rng, wh, corpus, idx, cent = setup
    corpus.append(
        spark.createDataFrame(_vecs(rng, range(40, 55)), "vec_id bigint, e array<double>")
    )
    corpus.delete_where("vec_id IN (3, 17, 29)", mode="merge-on-read")
    out = refresh_ivf_index(wh, corpus)
    assert out["upserted"] == 15 and out["deleted"] == 3
    got = _index_state(idx)
    assert set(got) == set(range(55)) - {3, 17, 29}
    # rebuild twin with the same centroids
    from minio_iceberg_polaris_lakehouse_spark.operators.ann_maintain import (
        assign_cells,
    )
    from minio_iceberg_polaris_lakehouse_spark.operators.similarity import as_double
    from pyspark.sql import functions as F

    full = assign_cells(
        corpus.read().select("vec_id", as_double("e").alias("e")), cent.read()
    )
    want = {r.vec_id: r.cell for r in full.collect()}
    assert got == want


def test_refresh_is_o_churn_not_o_corpus(setup, spark):
    """The index commits record O(delta) added rows, proving the corpus
    was not re-indexed."""
    rng, wh, corpus, idx, _cent = setup
    corpus.append(
        spark.createDataFrame(_vecs(rng, range(40, 44)), "vec_id bigint, e array<double>")
    )
    before = idx.current_snapshot_id()
    refresh_ivf_index(wh, corpus)
    snaps = [s for s in idx._snaps() if s["snapshot_id"] > before]
    added = sum(int(s["summary"].get("added-records", 0)) for s in snaps)
    assert added == 4  # only the delta crossed into the index


def test_refresh_noop_and_resumable(setup, spark):
    rng, wh, corpus, idx, _cent = setup
    assert refresh_ivf_index(wh, corpus)["upserted"] == 0  # already current
    corpus.append(
        spark.createDataFrame(_vecs(rng, [100]), "vec_id bigint, e array<double>")
    )
    out1 = refresh_ivf_index(wh, corpus)
    assert (out1["upserted"], out1["deleted"]) == (1, 0)
    # idempotent: a second refresh sees no new snapshots
    out2 = refresh_ivf_index(wh, corpus)
    assert (out2["upserted"], out2["deleted"]) == (0, 0)
    assert int(idx.properties()[WATERMARK_PROP]) == corpus.current_snapshot_id()


def test_reembedded_vector_moves_cell(setup, spark):
    """An upserted (re-embedded) vector re-assigns: delete+insert in the
    corpus window resolves to the NEW embedding, and the index's upsert
    replaces the old row — no duplicate vec_id."""
    rng, wh, corpus, idx, cent = setup
    corpus.set_identifier_fields("vec_id")
    new_e = [10.0] + [0.0] * 7  # far from the old random vector
    corpus.upsert(
        spark.createDataFrame([(5, new_e)], "vec_id bigint, e array<double>")
    )
    refresh_ivf_index(wh, corpus)
    rows = idx.read().filter("vec_id = 5").collect()
    assert len(rows) == 1
    assert rows[0].e == new_e
    # and its cell is the argmax against the frozen centroids
    from minio_iceberg_polaris_lakehouse_spark.operators.ann_maintain import (
        assign_cells,
    )

    want = assign_cells(
        spark.createDataFrame([(5, new_e)], "vec_id bigint, e array<double>"),
        cent.read(),
    ).collect()[0].cell
    assert rows[0].cell == want


def test_pq_refresh_equals_full_reencode(setup, spark):
    """PQ twin: build codes+codebook from the corpus table, churn, then
    refresh — the codes table must equal re-encoding the whole corpus
    with the SAME frozen codebook."""
    from pyspark.sql import functions as F

    from minio_iceberg_polaris_lakehouse_spark.operators.ann_maintain import (
        _books_from_table,
        build_pq_index_tables,
        refresh_pq_index,
    )
    from minio_iceberg_polaris_lakehouse_spark.operators.similarity import as_double
    from minio_iceberg_polaris_lakehouse_spark.operators.similarity_pq import (
        _encode_codes,
    )

    rng, wh, corpus, _idx, _cent = setup
    codes_t, book_t = build_pq_index_tables(wh, corpus)
    assert codes_t.read().count() == 40
    corpus.append(
        spark.createDataFrame(_vecs(rng, range(40, 50)), "vec_id bigint, e array<double>")
    )
    corpus.delete_where("vec_id IN (1, 2)", mode="merge-on-read")
    out = refresh_pq_index(wh, corpus)
    assert (out["upserted"], out["deleted"]) == (10, 2)
    got = {r.vec_id: tuple(r.codes) for r in codes_t.read().collect()}
    books = _books_from_table(book_t.read().collect())
    full = corpus.read().select(
        "vec_id", _encode_codes(books)(as_double(F.col("e"))).alias("codes")
    )
    want = {r.vec_id: tuple(r.codes) for r in full.collect()}
    assert got == want
    # idempotent
    out2 = refresh_pq_index(wh, corpus)
    assert (out2["upserted"], out2["deleted"]) == (0, 0)


# ---------------------------------------------------------------- LSH twin


@pytest.fixture()
def lsh_setup(spark, tmp_path):
    from minio_iceberg_polaris_lakehouse_spark.operators.ann_maintain import (
        build_lsh_index_tables,
    )

    rng = random.Random(23)
    wh = Warehouse(spark, str(tmp_path / "whl"))
    corpus = wh.create_table("ann", "corpus", "vec_id bigint, e array<double>")
    corpus.append(
        spark.createDataFrame(_vecs(rng, range(30)), "vec_id bigint, e array<double>")
    )
    idx = build_lsh_index_tables(wh, corpus)
    return rng, wh, corpus, idx


def _lsh_state(idx):
    return {(r.vec_id, r.table_id): r.bucket for r in idx.read().collect()}


def test_lsh_build_shape(lsh_setup):
    from minio_iceberg_polaris_lakehouse_spark.operators.similarity import N_TABLES

    _rng, _wh, _corpus, idx = lsh_setup
    state = _lsh_state(idx)
    assert len(state) == 30 * N_TABLES
    assert idx.identifier_fields() == ["vec_id", "table_id"]


def test_lsh_refresh_equals_full_rebuild(lsh_setup, spark, tmp_path):
    """Append + delete + re-embed churn, then refresh: the maintained
    index must be row-identical to a from-scratch rebuild — the hash
    family is stateless (no trained model), so unlike IVF the equality
    holds forever, not just until distribution drift."""
    from minio_iceberg_polaris_lakehouse_spark.operators.ann_maintain import (
        build_lsh_index_tables,
        refresh_lsh_index,
    )
    from minio_iceberg_polaris_lakehouse_spark.operators.similarity import N_TABLES

    rng, wh, corpus, idx = lsh_setup
    corpus.append(
        spark.createDataFrame(_vecs(rng, range(30, 42)), "vec_id bigint, e array<double>")
    )
    corpus.delete_where("vec_id IN (2, 11)", mode="merge-on-read")
    corpus.set_identifier_fields("vec_id")
    corpus.upsert(  # re-embed vector 5: its 8 signature rows must move
        spark.createDataFrame(_vecs(rng, [5]), "vec_id bigint, e array<double>")
    )
    out = refresh_lsh_index(wh, corpus)
    assert out["upserted"] == 13 and out["deleted"] == 2  # 12 new + 1 re-embed
    got = _lsh_state(idx)
    wh2 = Warehouse(idx.spark, str(tmp_path / "wh2"))
    corpus2 = wh2.create_table("ann", "corpus", "vec_id bigint, e array<double>")
    corpus2.append(corpus.read())
    want = _lsh_state(build_lsh_index_tables(wh2, corpus2))
    assert got == want
    assert len(got) == 40 * N_TABLES
    # no-op refresh is cheap and resumable
    out2 = refresh_lsh_index(wh, corpus)
    assert out2 == {"upserted": 0, "deleted": 0,
                    "from": corpus.current_snapshot_id(),
                    "to": corpus.current_snapshot_id()}
