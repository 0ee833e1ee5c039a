"""Benchmark runner: times the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from minio_iceberg_polaris_lakehouse_spark.registry import all_queries
from minio_iceberg_polaris_lakehouse_spark.session import get_spark

HEADLINE = [
    "flagship_revenue_by_nation",
    "rel_pricing_summary",
    "rel_join_left_outer",
    "rel_topk_orders",
    "win_top3_per_segment",
    "stream_tumbling_window",
    "stream_session_window",
    "dedup_exact_keep_first",
    "dedup_minhash_lsh",
    "sim_topk_bruteforce",
    "text_quality_score",
    "text_fingerprint",
    "rel_asof_join",
    "rel_range_join",
    "rel_q9_profit_by_nation_year",
    "text_bpe_tokens",
    "rel_q5_local_supplier_volume",
    "rel_q21_waiting_supplier",
    "sim_ann_ivf",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    # one untimed pass: session/codegen/JIT + file-index warm-up so the
    # measured numbers reflect steady-state query cost, not first-query setup
    registry["flagship_revenue_by_nation"].spark(spark, sf_dir).count()

    # Each query is timed twice and the MIN is reported: a single pass
    # mixes per-query codegen/JIT compilation and OS page-cache state into
    # the number (observed ±5-8% run-to-run on the same commit); min-of-2
    # measures the steady-state plan execution the engine actually
    # delivers on a warm cluster.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = registry[name]
        best, n = float("inf"), 0
        for _ in range(2):
            t0 = time.perf_counter()
            n = q.spark(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
