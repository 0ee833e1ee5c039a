"""Streaming write INTO a warehouse table (streaming/table_sink.py):
exactly-once micro-batch appends with batch-id dedup in the snapshot
summary, a true Structured Streaming query through the sink, and the
bronze→silver loop composed from table_source + table_sink."""

from __future__ import annotations

import pytest

from minio_iceberg_polaris_lakehouse_spark.streaming.table_sink import (
    TableSink,
    write_stream_to_table,
)
from minio_iceberg_polaris_lakehouse_spark.streaming.table_source import TableStream
from minio_iceberg_polaris_lakehouse_spark.warehouse import Warehouse


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "warehouse"))


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_batch_commit_and_replay_dedup(wh, spark):
    t = wh.create_table("db", "snk1", "id int, v string")
    sink = TableSink(t, "q1")
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], t.schema())
    assert sink.write_batch(b0, 0) is not None
    # replay of batch 0 (crash between commit and checkpoint): no-op
    assert sink.write_batch(b0, 0) is None
    assert _rows(t.read()) == [(1, "a"), (2, "b")]
    assert sink.write_batch(spark.createDataFrame([(3, "c")], t.schema()), 1) is not None
    assert _rows(t.read()) == [(1, "a"), (2, "b"), (3, "c")]
    # each committed batch is one append snapshot stamped with its id
    ids = sink.committed_batch_ids()
    assert ids == {0, 1}
    # a different query's ids don't collide
    other = TableSink(t, "q2")
    assert other.committed_batch_ids() == set()
    assert other.write_batch(spark.createDataFrame([(9, "z")], t.schema()), 0) is not None
    assert t.read().count() == 4


def test_replay_dedup_survives_snapshot_expiry(wh, spark):
    """expire_snapshots erases the snapshot summaries the set-scan dedup
    reads; the persistent high-water batch id in table meta must still
    reject a checkpoint replay of an already-landed batch."""
    t = wh.create_table("db", "snk_exp", "id int, v string")
    sink = TableSink(t, "q1")
    b0 = spark.createDataFrame([(1, "a")], t.schema())
    b1 = spark.createDataFrame([(2, "b")], t.schema())
    assert sink.write_batch(b0, 0) is not None
    assert sink.write_batch(b1, 1) is not None
    t.expire_snapshots(keep_last=1)
    assert sink.committed_batch_ids() == {1}  # batch 0's summary expired
    assert sink.high_water_batch_id() == 1
    # replay of batch 0 after expiry: still a no-op
    assert sink.write_batch(b0, 0) is None
    assert sink.write_batch(b1, 1) is None
    assert _rows(t.read()) == [(1, "a"), (2, "b")]
    # genuinely new batch still lands
    assert sink.write_batch(spark.createDataFrame([(3, "c")], t.schema()), 2) is not None
    assert sink.high_water_batch_id() == 2


def test_structured_streaming_query_end_to_end(wh, spark, tmp_path):
    src_dir = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string").write.parquet(src_dir)
    t = wh.create_table("db", "snk2", "id int, v string")
    stream = spark.readStream.schema("id int, v string").parquet(src_dir)
    write_stream_to_table(stream, t, ckpt, "fileq")
    assert _rows(t.read()) == [(1, "a"), (2, "b")]
    n_snaps = len(t._snaps())
    # restart with the same checkpoint and no new data: nothing re-commits
    stream2 = spark.readStream.schema("id int, v string").parquet(src_dir)
    write_stream_to_table(stream2, t, ckpt, "fileq")
    assert len(t._snaps()) == n_snaps
    assert _rows(t.read()) == [(1, "a"), (2, "b")]


def test_fresh_checkpoint_same_query_name_not_swallowed(wh, spark, tmp_path):
    """Batch ids are only monotonic within one checkpoint lineage: a
    query restarted under the SAME name with a FRESH checkpoint restarts
    at batch 0, and the old lineage's persisted watermark must not
    silently drop its batches (the pre-fix behavior). Dedup identity is
    (query_name, Spark checkpoint query id)."""
    src_dir = str(tmp_path / "src")
    spark.createDataFrame([(1, "a")], "id int, v string").write.parquet(src_dir)
    t = wh.create_table("db", "snk_fresh", "id int, v string")
    stream = spark.readStream.schema("id int, v string").parquet(src_dir)
    write_stream_to_table(stream, t, str(tmp_path / "ckpt1"), "q")
    assert _rows(t.read()) == [(1, "a")]
    # new data arrives; the operator restarts the query with a NEW
    # checkpoint (e.g. after losing the old one) — batch ids reset to 0
    spark.createDataFrame([(2, "b")], "id int, v string").write.mode("append").parquet(src_dir)
    stream2 = spark.readStream.schema("id int, v string").parquet(src_dir)
    write_stream_to_table(stream2, t, str(tmp_path / "ckpt2"), "q")
    # the fresh lineage re-reads everything (exactly-once holds only
    # within a lineage); the regression being pinned is that its batches
    # LAND at all — (2, 'b') must be present
    rows = _rows(t.read())
    assert (2, "b") in rows
    assert (1, "a") in rows
    # replays within the new lineage still dedup
    n = len(t._snaps())
    stream3 = spark.readStream.schema("id int, v string").parquet(src_dir)
    write_stream_to_table(stream3, t, str(tmp_path / "ckpt2"), "q")
    assert len(t._snaps()) == n


def test_reset_watermark_for_locationless_sink(wh, spark):
    """A sink constructed without a checkpoint location can't detect a
    lineage change automatically; reset_watermark() is the explicit
    escape hatch."""
    t = wh.create_table("db", "snk_rst", "id int, v string")
    s1 = TableSink(t, "q")
    assert s1.write_batch(spark.createDataFrame([(1, "a")], t.schema()), 0) is not None
    t.insert_values([(9, "z")])  # non-streaming commit so expiry can...
    t.expire_snapshots(keep_last=1)  # ...drop batch 0's summary, leaving
    # only the meta watermark...
    s2 = TableSink(t, "q")
    s2.reset_watermark()
    # ...which, once reset, lets a new run's batch 0 land
    assert s2.write_batch(spark.createDataFrame([(2, "b")], t.schema()), 0) is not None
    assert (2, "b") in _rows(t.read())


def test_bronze_to_silver_pipeline(wh, spark):
    """The medallion loop: bronze table streams out (append snapshots),
    a transform runs per batch, silver table streams in — incremental
    end to end, each side exactly-once."""
    from pyspark.sql import functions as F

    bronze = wh.create_table("db", "bronze", "id int, v string")
    silver = wh.create_table("db", "silver", "id int, v_upper string")
    bronze.insert_values([(1, "a"), (2, "b")])
    src = TableStream(bronze)
    sink = TableSink(silver, "b2s")

    def pump():
        for df, _frm, to in src.drain():
            sink.write_batch(df.select("id", F.upper("v").alias("v_upper")), to)

    pump()
    assert _rows(silver.read()) == [(1, "A"), (2, "B")]
    bronze.insert_values([(3, "c")])
    pump()
    assert _rows(silver.read()) == [(1, "A"), (2, "B"), (3, "C")]
    # re-pump with no new bronze commits: silver unchanged
    pump()
    assert silver.read().count() == 3


def test_pre_upgrade_records_still_dedup_replays(wh, spark, tmp_path):
    """Records written before checkpoint-lineage tracking carry no
    checkpoint id (summary key absent, bare-int watermark). A replay
    from the SAME checkpoint after upgrading must still be a no-op —
    legacy records match any lineage (exactly-once wins the ambiguity;
    reset_watermark() is the documented escape hatch for a genuinely
    fresh lineage blocked by one)."""
    t = wh.create_table("db", "snk_up", "id int, v string")
    legacy = TableSink(t, "q")  # location-less == legacy record shape
    assert legacy.write_batch(spark.createDataFrame([(1, "a")], t.schema()), 0) is not None
    # strip to the pre-upgrade forms explicitly
    meta = t._meta()
    assert meta["streaming_sinks"]["q"]["checkpoint"] is None
    meta["streaming_sinks"]["q"] = 0  # bare int, as the old code wrote
    t._write_meta(meta)
    # post-upgrade sink with a real checkpoint lineage replays batch 0
    ckpt = tmp_path / "ck"
    ckpt.mkdir()
    (ckpt / "metadata").write_text('{"id": "11111111-2222"}')
    s2 = TableSink(t, "q", checkpoint_location=str(ckpt))
    assert s2.write_batch(spark.createDataFrame([(1, "dup")], t.schema()), 0) is None
    assert t.read().count() == 1
    # a NEW batch from the new lineage still lands
    assert s2.write_batch(spark.createDataFrame([(2, "b")], t.schema()), 1) is not None
    assert t.read().count() == 2


def test_upsert_mode_sink_replaces_keys(wh, spark):
    """Upsert-mode micro-batches: each batch replaces rows by identifier
    key (the Flink streaming-upsert shape) and replays are no-ops —
    crucially a replayed OLD batch must not re-kill a newer batch's
    rows."""
    t = wh.create_table("db", "snk_ups", "id int, v string")
    t.set_identifier_fields("id")
    sink = TableSink(t, "cdc", mode="upsert")
    sink.write_batch(spark.createDataFrame([(1, "a"), (2, "b")], t.schema()), 0)
    sink.write_batch(spark.createDataFrame([(2, "b2"), (3, "c")], t.schema()), 1)
    assert sorted(map(tuple, t.read().collect())) == [(1, "a"), (2, "b2"), (3, "c")]
    assert t._resolve()["summary"]["upsert"] == "true"
    # replay of batch 1 (crash between commit and checkpoint write):
    # no new snapshot, no double-kill, rows unchanged
    before = t.current_snapshot_id()
    assert sink.write_batch(spark.createDataFrame([(2, "b2"), (3, "c")], t.schema()), 1) is None
    assert t.current_snapshot_id() == before
    # replay of the EARLIER batch 0 after batch 1: also a no-op — key 2
    # keeps batch 1's value
    assert sink.write_batch(spark.createDataFrame([(1, "a"), (2, "b")], t.schema()), 0) is None
    assert sorted(map(tuple, t.read().collect())) == [(1, "a"), (2, "b2"), (3, "c")]


def test_upsert_mode_structured_streaming_end_to_end(wh, spark, tmp_path):
    """A real Structured Streaming query draining a file source into an
    upsert-mode sink: the second drain carries updated values for
    existing keys and the table converges to latest-per-key."""
    import json as _json

    from minio_iceberg_polaris_lakehouse_spark.streaming.table_sink import (
        write_stream_to_table,
    )

    t = wh.create_table("db", "snk_ups_e2e", "id int, v string")
    t.set_identifier_fields("id")
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = (
            spark.readStream.schema("id int, v string").json(str(src))
        )
        write_stream_to_table(stream, t, ckpt, query_name="e2e", mode="upsert")

    (src / "b0.json").write_text(
        "\n".join(_json.dumps(r) for r in [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}])
    )
    drain()
    assert sorted(map(tuple, t.read().collect())) == [(1, "a"), (2, "b")]
    (src / "b1.json").write_text(
        "\n".join(_json.dumps(r) for r in [{"id": 2, "v": "b2"}, {"id": 3, "v": "c"}])
    )
    drain()
    assert sorted(map(tuple, t.read().collect())) == [(1, "a"), (2, "b2"), (3, "c")]
