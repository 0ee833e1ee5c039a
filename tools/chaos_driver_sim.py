"""Driver-sim under load: replay the 50-slot correctness window the way
the driver does (vanilla SparkSession, cwd outside the repo, DuckDB
oracle comparison at sf0.01) WHILE a background load generator
saturates the host's CPUs.

Why: the r7/r8 postmortems — three queries green in every idle local
replica hash-failed only in the driver environment, twice. The r8 sim
compared ``str(row)`` stringification, ran local[8], and only ever
tested one-process / in-order / single-invocation execution; its 50/50
greens were read as proof the driver would pass, and the driver then
failed. This version closes every one of those fidelity gaps:

- comparison goes through ``tests.oracle_harness.compare`` — the SAME
  normalize-sort-hash semantics as the local gate replica;
- the session defaults to ``local[32]`` (the driver's core count) and
  VANILLA confs (no shuffle-partition override — the real driver's
  session is not ours to configure);
- ``--shuffle [SEED]`` permutes the window order (fixture-interference
  ordering bugs);
- ``--repeat N`` invokes every callable N times and compares each
  result (second-invocation cache divergence);
- ``--isolate`` runs each query in its OWN subprocess with a fresh
  SparkSession (per-query-process drivers, cold fixture caches every
  time).

Usage:
    python tools/chaos_driver_sim.py [--load N] [--sf-dir DIR] [--limit K]
        [--master local[32]] [--shuffle [SEED]] [--repeat N] [--isolate]

Exit code 0 iff every window query matches its oracle under load.
Writes one JSON line (per-query ok/fail + loadavg before/after) so a
run can be recorded in SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing
import os
import random
import subprocess
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


def _open_session(master: str):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(master).appName("chaos-driver-sim").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _check_one(spark, con, name: str, sf_dir: str, repeat: int) -> list[str]:
    """Gate-fidelity check of one window query: every invocation (repeat
    axis) must match the oracle through oracle_harness.compare."""
    import __spark_entry__ as m
    from tests.oracle_harness import compare

    qs, osql = m.queries(), m.oracle_sql()
    problems: list[str] = []
    for i in range(repeat):
        p = compare(spark, con, qs[name], osql[name], sf_dir)
        if p:
            problems.extend(f"invocation {i + 1}: {x}" for x in p)
    return problems


def _child_main(name: str, sf_dir: str, master: str, repeat: int) -> int:
    """--isolate child: fresh process, fresh SparkSession, one query."""
    os.chdir("/tmp")
    from tests.oracle_harness import duck_connection

    spark = _open_session(master)
    try:
        problems = _check_one(spark, duck_connection(sf_dir), name, sf_dir, repeat)
    except Exception as e:
        print(f"# {name}: {type(e).__name__}: {e}", file=sys.stderr)
        return 1
    for p in problems:
        print(f"# {name}: {p}", file=sys.stderr)
    return 1 if problems else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--load", type=int, default=os.cpu_count() or 8)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=50)
    ap.add_argument("--master", default="local[32]")
    ap.add_argument(
        "--shuffle", nargs="?", const=-1, type=int, default=None,
        metavar="SEED", help="permute window order (random seed, or none)",
    )
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--isolate", action="store_true")
    ap.add_argument(
        "--only", default=None,
        help="comma-separated query names (subset of the window) to check",
    )
    ap.add_argument("--_child", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args._child:
        return _child_main(args._child, args.sf_dir, args.master, args.repeat)

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
        import __spark_entry__ as m
        from tests.oracle_harness import duck_connection

        qs = m.queries()
        window = list(qs)[: args.limit]
        if args.only:
            wanted = [n.strip() for n in args.only.split(",") if n.strip()]
            missing = [n for n in wanted if n not in qs]
            if missing:
                print(f"# unknown queries: {missing}", file=sys.stderr)
                return 2
            window = wanted
        order_seed = None
        if args.shuffle is not None:
            order_seed = args.shuffle if args.shuffle >= 0 else random.randrange(1 << 30)
            random.Random(order_seed).shuffle(window)
            print(f"# window order shuffled with seed {order_seed}", file=sys.stderr)

        results: dict[str, bool] = {}
        t0 = time.time()
        if args.isolate:
            for name in window:
                r = subprocess.run(
                    [
                        sys.executable, os.path.abspath(__file__),
                        "--_child", name, "--sf-dir", args.sf_dir,
                        "--master", args.master, "--repeat", str(args.repeat),
                    ],
                    cwd="/tmp",
                )
                results[name] = r.returncode == 0
                print(f"# {name}: {'ok' if results[name] else 'FAIL'}", file=sys.stderr)
        else:
            spark = _open_session(args.master)
            con = duck_connection(args.sf_dir)
            for name in window:
                try:
                    problems = _check_one(spark, con, name, args.sf_dir, args.repeat)
                    for p in problems:
                        print(f"# {name}: {p}", file=sys.stderr)
                    results[name] = not problems
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
                "master": args.master,
                "repeat": args.repeat,
                "isolate": args.isolate,
                "shuffle_seed": order_seed,
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
