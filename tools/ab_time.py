"""Quick A/B timer for individual registered queries (guide §1): warm
session, 1 untimed warm-up + N timed runs per query, reports min/median.
Usage:
    python tools/ab_time.py [-n ITERS] QUERY [QUERY...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1).
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from minio_iceberg_polaris_lakehouse_spark.registry import all_queries
from minio_iceberg_polaris_lakehouse_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    iters = 5
    if args and args[0] == "-n":
        iters = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-time")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    for name in args:
        q = registry[name]
        q.spark(spark, sf_dir).count()  # warm-up, untimed
        runs = []
        for _ in range(iters):
            t0 = time.perf_counter()
            q.spark(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        print(
            f"{name}: min {min(runs):.3f}s median {statistics.median(runs):.3f}s "
            f"n={iters} sf={sf_dir}"
        )


if __name__ == "__main__":
    main()
