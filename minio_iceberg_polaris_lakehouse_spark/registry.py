"""Central query registry.

Every operator the engine implements registers here as a named query:
a Spark builder ``(spark, sf_dir) -> DataFrame`` plus (when the semantics
are SQL-expressible) an equivalent ANSI-SQL oracle string that DuckDB runs
on the same parquet tables. `__spark_entry__.py` re-exports this registry
for the driver; `tests/test_oracle_parity.py` replays the exact same
comparison locally.

Determinism rules every registered query follows (so that a value-hash
comparison against another engine is meaningful):
- Every computed column is aliased identically on both sides.
- Floating-point SUMs go through an exact decimal accumulation
  (``SUM(CAST(x AS DECIMAL(18,4)))``) then cast back to DOUBLE — IEEE
  double addition is order-sensitive and Spark/DuckDB (and Spark with
  itself, under AQE) would otherwise disagree in the last ulps.
- Integer-typed aggregates are cast explicitly (DuckDB SUM(BIGINT) is
  HUGEINT, Spark's is BIGINT; DuckDB year() is BIGINT, Spark's is INT).
- ORDER BY always ends with a unique tiebreaker column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL; None → driver does a rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}

# The driver's CORRECTNESS gate records at most ~50 queries in registration
# order, so the first 50 names must cover EVERY operator family of
# SURVEY.md §2 and §2.14 (round-1 verdict: dedup/similarity/streaming/UDF/
# multimodal had zero driver entries because TPC-H variants filled the cap).
# This list is the curated coverage set — one or more representatives per
# family, preferring queries the driver has not yet verified; everything
# not listed follows in registration order (and still runs in the local
# oracle-parity suite, which has no cap).
_PRIORITY: list[str] = [
    # flagship + reference goldens (scan, filter, J1, A1, sort, decimal)
    "flagship_revenue_by_nation",
    "ref_count_star",
    "ref_join_users_orders",
    "ref_join_users_orders_decimal",
    "ref_duplicate_append",
    # warehouse metadata tables + time travel through the SQL front-end
    # (S3/S4/S5) — deterministic fixture, literal-VALUES oracles
    "ref_table_history",
    "ref_table_snapshots",
    "ref_time_travel_counts",
    # schema evolution (D10) through SQL DDL — ADD COLUMN NULL backfill +
    # RENAME, literal-VALUES oracle
    "ref_schema_evolution",
    # merge-on-read DELETE (M1) with live _deleted metadata column
    "ref_mor_delete",
    # CDC changelog scan (create_changelog_view): tagged insert/delete feed
    "ref_table_changes",
    # write-audit-publish (§2.11): branch-staged INSERT + fast_forward
    "ref_wap_publish",
    # scan-time file skipping from manifest stats (README.md:138-139) over
    # a WRITE ORDERED BY clustered table
    "ref_file_skipping",
    "rel_filter_projection",
    # join family (J2-J9 + range + as-of); right/full outer rotated out
    # in r5 after two all-green driver rounds — their slots give driver-
    # grade evidence to families resting on the local replica (the
    # rotated-out veterans stay oracle-checked in test_oracle_parity.py)
    "rel_join_left_outer",
    "rel_join_anti",
    # cross join follows in registration order (still oracle-checked
    # locally); its window slot went to the merge-on-read golden
    "rel_range_join",
    "rel_asof_join",
    # subqueries (correlated/scalar variants follow in registration order)
    "rel_in_subquery",
    # aggregation family (A2-A12)
    "rel_pricing_summary",
    "rel_groupby_having",
    "rel_count_distinct",
    # grouping analytics: rollup + the never-driver-checked grouping-sets
    # and cube variants (rotated in r5)
    "rel_rollup",
    "rel_grouping_sets",
    "rel_cube",
    "rel_approx_sketches",
    "agg_median_approx",
    # window functions (§2.5)
    "win_top3_per_segment",
    # sort / top-k (O1-O3)
    "rel_topk_orders",
    # scalar-function suites (F5): math + json rotated in r5 (string/date
    # veterans rotated out after two green rounds, still local-checked)
    "fn_math_suite",
    "fn_json_extract",
    "fn_date_suite",
    # streaming windows + event analytics (§2.12)
    "stream_tumbling_window",
    "stream_session_window",
    "evt_sessionization",
    # UDF surface (§2.13)
    "udf_vector_norm",
    "udf_grouped_stats",
    "udf_grouped_agg_median",
    # X1/X2 dedup
    "dedup_exact_keep_first",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    # X3 similarity (int8 + multi-probe-LSH recall gates rotated in r5;
    # rel_join_semi yielded its slot after three green rounds)
    "sim_topk_bruteforce",
    "sim_ann_ivf",
    "sim_ann_int8",
    "sim_ann_lsh",
    # X5 text analysis (the end-to-end curation funnel: X1+X5; train/eval
    # contamination audit; Gopher-style repetition signals) + X4 multimodal
    "text_curation_pipeline",
    "text_contamination",
    "text_repetition_signals",
    "mm_blob_stats",
]


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a Spark query builder under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, spark=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Import every operator module (side effect: registration) and return
    the full registry, priority coverage set first (see _PRIORITY)."""
    import minio_iceberg_polaris_lakehouse_spark.operators.relational  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.operators.relational2  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.operators.relational3  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.operators.tpch_extra  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.operators.tpch_more  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.operators.relational4  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.operators.events  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.operators.reference_golden  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.operators.windows  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.operators.setops  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.operators.skew  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.operators.dedup  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.operators.similarity  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.functions.text  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.functions.scalars  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.functions.udfs  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.streaming.windows  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.multimodal.binary  # noqa: F401

    missing = [n for n in _PRIORITY if n not in _REGISTRY]
    if missing:
        raise RuntimeError(f"_PRIORITY names not registered: {missing}")
    ordered = {n: _REGISTRY[n] for n in _PRIORITY}
    ordered.update((n, q) for n, q in _REGISTRY.items() if n not in ordered)
    return ordered
