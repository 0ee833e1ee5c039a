"""Structured Streaming surface (SURVEY.md §2.12 EXT): the reference lists
streaming as an unexplored next step (SETUP_GUIDE_WIN.md:473); this module
implements it — file-source streams over the same parquet tables, event-time
windows with watermarks, a custom stateful operator via
applyInPandasWithState, and micro-batch sinks.

The batch queries in streaming/windows.py use the *same* window expressions;
Structured Streaming's incremental execution of an identical logical plan is
exactly Spark's design. Everything here runs with Trigger.AvailableNow so
tests are deterministic and bounded.

Scale notes: state-store ops key by (user_id / window), so state shards with
the shuffle; watermarks bound state size — without them a 100 TB stream
accumulates unbounded window state. foreachBatch writes land as idempotent
per-batch parquet commits.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType



def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a bounded file-source stream (schema pinned from
    the batch loader; ns-timestamp conversion applied identically)."""
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the sf directory holds every table; pathGlobFilter restricts the
    # stream to the events file
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # watermarks require TIMESTAMP (tz-aware); session tz is UTC so the
    # instant matches the batch loader's timestamp_ntz values
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_counts(stream: DataFrame, window: str = "1 hour", watermark: str = "30 minutes") -> DataFrame:
    """Watermarked tumbling-window aggregation — late events beyond the
    watermark are dropped and window state is evicted (bounded state)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(26,8)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events", "total_value")
    )


SESSION_STATE_SCHEMA = "n_events bigint, total_value double, last_ts timestamp"
SESSION_OUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, closed boolean"
)


def sessionize_stateful(stream: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful operator: per-user running session state via
    applyInPandasWithState (the arbitrary-state API) — the pattern for
    operators Spark's built-ins can't express (custom eviction, running
    ML features, CDC merge). State keys shard with the shuffle on user_id.

    Sessions CLOSE by event-time timeout: after each batch the state arms
    a timeout at last_event + gap; when the watermark passes it, the
    group is invoked with hasTimedOut, emits its final row with
    closed=True, and the state is REMOVED — bounded state through
    eviction, not just bounded ingestion (the part NoTimeout demos leave
    out)."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            n, total, _last_ts = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "closed": [True],
                }
            )
            return
        if state.exists:
            n, total, last_ts = state.get
        else:
            n, total, last_ts = 0, 0.0, None
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            n += len(pdf)
            total += float(pdf["value"].sum())
            last = pdf["ts"].iloc[-1]
            last_ts = last if last_ts is None else max(last_ts, last)
        state.update((n, total, last_ts))
        # arm the session-close timer: fires when watermark > last + gap
        state.setTimeoutTimestamp(
            int(pd.Timestamp(last_ts).value // 1_000_000) + gap_minutes * 60_000
        )
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "closed": [False],
            }
        )

    return (
        stream.withWatermark("ts", f"{gap_minutes} minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


KEEPFIRST_STATE_SCHEMA = "best_ts timestamp, best_event_id bigint, best_value double"
KEEPFIRST_OUT_SCHEMA = "user_id bigint, event_type string, event_id bigint, ts timestamp, value double"


def dedup_stream_keep_first_event_time(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """EVENT-TIME keep-first dedup: per (user_id, event_type), emit the
    row with the MINIMUM event time — not the first-ARRIVING row that
    `dropDuplicatesWithinWatermark` keeps (see `dedup_stream`; the round-1
    advisor flagged the difference). Arrival order and event order differ
    whenever data is late or replayed, so this is the policy a training
    pipeline usually actually wants.

    Implemented with applyInPandasWithState: state holds only the current
    minimum-ts candidate per key (three scalars — bounded regardless of
    stream length), each update emits the current winner (update mode:
    downstream sinks upsert by key). State shards with the shuffle on the
    group key."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        best_ts, best_id, best_val = state.get if state.exists else (None, None, None)
        for pdf in pdfs:
            for _, row in pdf.sort_values(["ts", "event_id"]).head(1).iterrows():
                if best_ts is None or (row["ts"], row["event_id"]) < (best_ts, best_id):
                    best_ts, best_id, best_val = row["ts"], int(row["event_id"]), float(row["value"])
        state.update((best_ts, best_id, best_val))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "event_type": [key[1]],
                "event_id": [best_id],
                "ts": [best_ts],
                "value": [best_val],
            }
        )

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            update,
            outputStructType=KEEPFIRST_OUT_SCHEMA,
            stateStructType=KEEPFIRST_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append") -> DataFrame:
    """Execute a bounded stream to completion (AvailableNow) into an
    in-memory sink; returns the result table."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def run_foreach_batch_to_parquet(stream_df: DataFrame, path: str) -> None:
    """Micro-batch sink with EXACTLY-ONCE semantics on retries: each batch
    overwrites its own `batch_id=N` partition directory, so a batch that
    is retried after a partial failure replaces its previous partial
    output instead of appending duplicates (the checkpointed batch id is
    Structured Streaming's idempotence token; the sink must key on it)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    q = stream_df.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()


def dedup_stream(stream: DataFrame, keys: list[str] | None = None, watermark: str = "1 hour") -> DataFrame:
    """Streaming deduplication: keep the first-SEEN event per key (arrival
    order — dropDuplicatesWithinWatermark retains whichever row arrives
    first, not the minimum-event-time row; for the event-time policy use
    `dedup_stream_keep_first_event_time`), with state
    expiry bounded by the watermark (dropDuplicatesWithinWatermark — the
    state store only holds keys newer than watermark, so a 100 TB/day
    stream doesn't accumulate an unbounded key set the way plain
    dropDuplicates on a stream would)."""
    keys = keys or ["user_id", "event_type"]
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def stream_stream_join(
    clicks: DataFrame, purchases: DataFrame, horizon_minutes: int = 60
) -> DataFrame:
    """Stream-stream inner join: purchases attributed to a same-user click
    within a time horizon. Both sides are watermarked and the join
    condition carries the time bound — that pair is what lets Spark evict
    buffered rows instead of holding both streams forever (state is
    bounded by watermark + horizon)."""
    c = clicks.withWatermark("ts", "30 minutes").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.withWatermark("ts", "30 minutes").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {horizon_minutes} MINUTES")
        ),
        "inner",
    )
