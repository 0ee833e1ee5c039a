"""Streaming write INTO a warehouse table — the Iceberg streaming-sink
model (`df.writeStream.format("iceberg")` in the reference's stack,
completing the stream→lakehouse loop the reference lists as its
unexplored next step, SETUP_GUIDE_WIN.md:473).

Exactly-once contract: every micro-batch lands as ONE append snapshot
stamped with its epoch/batch id in the snapshot summary. Structured
Streaming's failure mode is a batch REPLAY (crash after the sink commits
but before the checkpoint advances); the sink detects the already-
committed batch id in the snapshot log and skips it, so replays are
no-ops and each batch's rows appear exactly once — the same dedup-by-
commit-metadata design Iceberg's real streaming sink uses. The scan is
O(snapshots) over the JSON log, metadata-only.

Scale: each micro-batch is an append commit (commutative, lock-fast);
the table's snapshot log grows by one entry per trigger, which is what
`expire_snapshots` is for. Data volume per commit equals the batch —
nothing is rewritten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from minio_iceberg_polaris_lakehouse_spark.warehouse import Table

_BATCH_KEY = "streaming-batch-id"
_QUERY_KEY = "streaming-query"


class TableSink:
    """foreachBatch-compatible sink with exactly-once batch dedup."""

    def __init__(self, table: Table, query_name: str = "stream"):
        self.table = table
        self.query_name = query_name

    def committed_batch_ids(self) -> set[int]:
        return {
            int(s["summary"][_BATCH_KEY])
            for s in self.table._snaps()
            if _BATCH_KEY in s.get("summary", {})
            and s["summary"].get(_QUERY_KEY) == self.query_name
        }

    def high_water_batch_id(self) -> int | None:
        """Highest batch id ever committed by this query, persisted in
        table meta — expire_snapshots erases the snapshot summaries the
        set-scan dedup relies on, but meta survives expiry, so a
        checkpoint replay of an old batch after history expiry is still
        a no-op (batch ids are monotonic per Structured Streaming
        query/checkpoint, so a single watermark suffices)."""
        rec = self.table._meta().get("streaming_sinks", {}).get(self.query_name)
        return int(rec) if rec is not None else None

    def write_batch(self, batch_df: DataFrame, batch_id: int) -> int | None:
        """Commit one micro-batch; returns the snapshot id, or None when
        the batch id was already committed (a replay after a crash
        between the table commit and the checkpoint write)."""
        hw = self.high_water_batch_id()
        if hw is not None and int(batch_id) <= hw:
            return None
        if int(batch_id) in self.committed_batch_ids():
            return None
        p = self.table._write_data(batch_df)
        sid = self.table._commit_add(
            "append",
            [p],
            {
                "added-records": p.rows,
                _BATCH_KEY: int(batch_id),
                _QUERY_KEY: self.query_name,
            },
        )
        # advance the persistent watermark under the commit lock (a crash
        # between commit and this write is still covered by the snapshot-
        # summary scan above)
        lock, token = self.table._acquire_commit_lock()
        try:
            meta = self.table._meta()
            sinks = meta.setdefault("streaming_sinks", {})
            if int(sinks.get(self.query_name, -1)) < int(batch_id):
                sinks[self.query_name] = int(batch_id)
                self.table._write_meta(meta)
        finally:
            self.table._release_commit_lock(lock, token)
        return sid

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self.write_batch(batch_df, batch_id)


def write_stream_to_table(
    stream_df: DataFrame,
    table: Table,
    checkpoint_dir: str,
    query_name: str = "stream",
) -> None:
    """Run a Structured Streaming query that appends every micro-batch to
    ``table`` exactly once (availableNow trigger: drain what's available,
    then stop — the batch-and-resume pattern; a production query would
    use a processingTime trigger with the same sink)."""
    sink = TableSink(table, query_name)
    q = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
