"""Benchmark runner: times the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import statistics
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
    "sim_ann_ivf_topk",
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

    # Per query: one untimed warm-up (per-query codegen/JIT + page cache),
    # then ITERS timed runs. MIN is the reported number (steady-state plan
    # execution on a warm cluster); stddev across the timed runs is
    # published so round-over-round deltas are attributable — r2's n=2
    # left sub-1.3s "regressions" indistinguishable from noise.
    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "5"))
    timings: dict[str, float] = {}
    stddevs: dict[str, float] = {}
    for name in HEADLINE:
        q = registry[name]
        q.spark(spark, sf_dir).count()  # per-query warm-up, untimed
        runs: list[float] = []
        n = 0
        for _ in range(iters):
            t0 = time.perf_counter()
            n = q.spark(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)
        stddevs[name] = round(statistics.stdev(runs), 4) if len(runs) > 1 else 0.0
        print(
            f"# {name}: min {timings[name]:.3f}s sd {stddevs[name]:.4f} ({n} rows)",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "stddev": stddevs,
                "iters": iters,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
