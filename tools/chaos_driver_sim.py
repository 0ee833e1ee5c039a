"""Driver-sim under load: replay the 50-slot correctness window the way
the driver does (vanilla SparkSession, cwd outside the repo, DuckDB
oracle comparison at sf0.01) WHILE a background load generator
saturates the host's CPUs.

Why: the r7 postmortem — three queries green in every idle local
replica hash-failed only in the driver environment. Idle replicas
cannot catch environment-sensitivity (timing-dependent fallbacks,
contention-triggered except-paths); this harness makes contention part
of the test.

Usage:
    python tools/chaos_driver_sim.py [--load N] [--sf-dir DIR] [--limit K]

--load N   background CPU-burner processes (default: cpu_count, i.e.
           100% nominal saturation on top of Spark's own work)
--limit K  only the first K window queries (default: all 50)

Exit code 0 iff every window query hash-matches its oracle under load.
Writes one JSON line (per-query ok/fail + loadavg before/after) so a
run can be recorded in SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _burn(stop_flag_path: str) -> None:
    """Pure-CPU load: keeps one core busy until the flag file appears."""
    x = 1.0001
    while not os.path.exists(stop_flag_path):
        for _ in range(200_000):
            x = x * 1.0000001 + 1e-9
        if x > 1e9:
            x = 1.0001


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--load", type=int, default=os.cpu_count() or 8)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=50)
    args = ap.parse_args()

    os.chdir("/tmp")  # the driver's cwd is never the repo — match it
    stop_flag = f"/tmp/chaos_stop_{os.getpid()}"
    procs = [
        multiprocessing.Process(target=_burn, args=(stop_flag,), daemon=True)
        for _ in range(args.load)
    ]
    for p in procs:
        p.start()
    load_start = os.getloadavg()

    try:
        import duckdb
        from pyspark.sql import SparkSession

        import __spark_entry__ as m

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("chaos-driver-sim")
            .config("spark.sql.shuffle.partitions", "8")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        qs, osql = m.queries(), m.oracle_sql()
        con = duckdb.connect()
        for t in [
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        ]:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
            )
        window = list(qs)[: args.limit]
        results: dict[str, bool] = {}
        t0 = time.time()
        for name in window:
            try:
                s = sorted(
                    tuple(str(x) for x in r)
                    for r in qs[name](spark, args.sf_dir).collect()
                )
                d = sorted(
                    tuple(str(x) for x in r) for r in con.execute(osql[name]).fetchall()
                )
                results[name] = s == d
            except Exception as e:  # a crash under load is a failure too
                print(f"# {name}: {type(e).__name__}: {e}", file=sys.stderr)
                results[name] = False
            print(f"# {name}: {'ok' if results[name] else 'FAIL'}", file=sys.stderr)
        elapsed = round(time.time() - t0, 1)
    finally:
        open(stop_flag, "w").close()
        for p in procs:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()
        try:
            os.remove(stop_flag)
        except OSError:
            pass

    bad = [n for n, ok in results.items() if not ok]
    print(
        json.dumps(
            {
                "metric": "chaos_driver_sim",
                "queries": len(results),
                "green": len(results) - len(bad),
                "failed": bad,
                "load_procs": args.load,
                "loadavg_start": round(load_start[0], 1),
                "loadavg_end": round(os.getloadavg()[0], 1),
                "elapsed_s": elapsed,
                "sf_dir": args.sf_dir,
            }
        )
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
