"""Event-stream batch analytics over the `events` table: conversion
funnel and gap-based sessionization — the window/conditional-aggregate
shapes behind product analytics on an event log. (The streaming
equivalents live in streaming/; these are the batch, oracle-checkable
forms. Reference parity: stock Spark SQL surface, as with every operator
— reference workspace/notebooks/iceberg_queries.ipynb:291-299.)

Scale notes: both queries shuffle once on user_id (the natural key; the
testdata's ~750 users per sf stand in for hundreds of millions — the
per-user row group stays small, which is what the window sort needs);
the funnel's conditional MINs partial-aggregate map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from minio_iceberg_polaris_lakehouse_spark.registry import register
from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table


@register(
    "evt_click_purchase_funnel",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
        FROM events GROUP BY user_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN first_click IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clicked,
           CAST(SUM(CASE WHEN first_purchase IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_purchased,
           CAST(SUM(CASE WHEN first_purchase > first_click THEN 1 ELSE 0 END) AS BIGINT)
               AS n_converted_after_click
    FROM firsts
    """,
)
def evt_click_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: per-user first click / first purchase
    (conditional MIN — NULL-skipping on both engines), then corpus-level
    stage counts. One shuffle on user_id, then a 1-row reduce."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    return firsts.agg(
        F.count("*").alias("n_users"),
        F.sum(F.when(F.col("first_click").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clicked"),
        F.sum(F.when(F.col("first_purchase").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_purchased"),
        F.sum(F.when(F.col("first_purchase") > F.col("first_click"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_converted_after_click"),
    )


@register(
    "evt_sessionization",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    per_user AS (
        SELECT user_id,
               CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM flagged GROUP BY user_id)
    SELECT user_id, n_sessions, n_events,
           ROUND(CAST(n_events AS DOUBLE) / n_sessions, 6) AS events_per_session
    FROM per_user
    ORDER BY user_id
    """,
)
def evt_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity): LAG over a
    (ts, event_id)-total-ordered window marks session starts; session
    count per user is a plain SUM of the markers — the batch counterpart
    of the streaming session_window operator."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap (a seconds-level cast would truncate and
    # disagree with the oracle's interval math at the 30-min boundary)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_us = us - F.lag(us).over(w)
    flagged = e.select(
        "user_id",
        F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1).otherwise(0).alias("new_sess"),
    )
    per_user = flagged.groupBy("user_id").agg(
        F.sum("new_sess").cast("bigint").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )
    return per_user.select(
        "user_id",
        "n_sessions",
        "n_events",
        F.round(F.col("n_events").cast("double") / F.col("n_sessions"), 6).alias(
            "events_per_session"
        ),
    ).orderBy("user_id")


@register(
    "evt_cohort_retention",
    oracle="""
    WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    firsts AS (SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY user_id),
    act AS (SELECT f.cohort_day, DATEDIFF('day', f.cohort_day, d.day) AS day_offset,
                   d.user_id
            FROM days d JOIN firsts f USING (user_id)
            WHERE DATEDIFF('day', f.cohort_day, d.day) <= 7),
    counts AS (SELECT cohort_day, CAST(day_offset AS INT) AS day_offset,
                      CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
               FROM act GROUP BY cohort_day, day_offset),
    sizes AS (SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS n_cohort
              FROM firsts GROUP BY cohort_day)
    SELECT c.cohort_day, c.day_offset, c.n_active, s.n_cohort,
           CAST(ROUND(CAST(c.n_active AS DOUBLE) / CAST(s.n_cohort AS DOUBLE), 6)
                AS DOUBLE) AS retention
    FROM counts c JOIN sizes s USING (cohort_day)
    ORDER BY cohort_day, day_offset
    """,
)
def evt_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the product-analytics staple: users
    cohorted by FIRST-active day, then for each day offset 0..7 the
    fraction of the cohort active again that day. Offset 0 is 1.0 by
    construction (a sanity anchor the oracle hash also pins).

    Plan: one distinct (user, day) projection feeds BOTH the cohort
    derivation (min-day per user) and the activity join — Spark reuses
    the exchange; the join is user-keyed (no skew: one row per user per
    active day), and the two final aggregates are map-side combined.
    The single IEEE division happens once per output row on two exact
    BIGINTs, rounded to 6 — deterministic cross-engine."""
    e = load_table(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("day")).dropDuplicates(
        ["user_id", "day"]
    )
    firsts = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    act = (
        days.join(firsts, "user_id")
        .withColumn("day_offset", F.datediff("day", "cohort_day").cast("int"))
        .filter(F.col("day_offset") <= 7)
    )
    counts = act.groupBy("cohort_day", "day_offset").agg(
        F.countDistinct("user_id").cast("long").alias("n_active")
    )
    sizes = firsts.groupBy("cohort_day").agg(F.count("*").cast("long").alias("n_cohort"))
    return (
        counts.join(sizes, "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "n_active",
            "n_cohort",
            F.round(
                F.col("n_active").cast("double") / F.col("n_cohort").cast("double"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_day", "day_offset")
    )
