"""In-driver telemetry for the repeat driver-red goldens.

Three queries (`ref_matview_incremental`, `ref_matview_join`,
`udf_python_udtf`) have hash-failed in the driver's correctness window
for two consecutive rounds while passing every local reproduction
(local[8], local[32], Arrow-UDTF, chaos replays under saturation).
Nothing in the repo recorded what those goldens actually computed
*inside the driver's environment* — so each round's fix was a guess.

This module appends one JSON line per instrumented invocation to
``DIAG_GOLDENS.jsonl`` at the repo root: timestamp, applicationId,
a per-(app, name) invocation counter, master / parallelism, the
comparison-relevant session confs, and a query-specific payload (the
REFRESH result row for the MVs; sample cents/amount values for the
UDTF). The file is append-only and written OUTSIDE the returned
DataFrame, so it is invisible to the oracle comparison; every write is
wrapped so telemetry can never break the query it observes.

Scale note: this is driver-side, O(1) per golden invocation — never on
an executor path.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
from pathlib import Path

from pyspark.sql import SparkSession

DIAG_PATH = Path(__file__).resolve().parents[1] / "DIAG_GOLDENS.jsonl"

# Session confs that plausibly perturb golden results across
# environments: shuffle/AQE layout, ANSI semantics, Arrow paths,
# time zone, codegen. Recorded per invocation.
_CONF_KEYS = (
    "spark.master",
    "spark.sql.shuffle.partitions",
    "spark.default.parallelism",
    "spark.sql.adaptive.enabled",
    "spark.sql.ansi.enabled",
    "spark.sql.session.timeZone",
    "spark.sql.execution.arrow.pyspark.enabled",
    "spark.sql.execution.pythonUDTF.arrow.enabled",
    "spark.sql.codegen.wholeStage",
    "spark.sql.files.maxPartitionBytes",
)

_LOCK = threading.Lock()
_COUNTERS: dict[tuple[str, str], int] = {}
# rotate the artifact once it exceeds this, keeping the newest lines
_MAX_BYTES = 1_000_000


def _conf_snapshot(spark: SparkSession) -> dict:
    out: dict[str, str | None] = {}
    for k in _CONF_KEYS:
        try:
            out[k] = spark.conf.get(k, None)
        except Exception:
            out[k] = "<unreadable>"
    return out


def record(name: str, spark: SparkSession, payload: dict) -> None:
    """Append one telemetry line for golden ``name``; never raises."""
    try:
        sc = spark.sparkContext
        app = sc.applicationId
        with _LOCK:
            n = _COUNTERS.get((app, name), 0) + 1
            _COUNTERS[(app, name)] = n
        line = {
            "name": name,
            "ts": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
            "app_id": app,
            "invocation": n,
            "pid": os.getpid(),
            "python": sys.version.split()[0],
            "master": sc.master,
            "default_parallelism": sc.defaultParallelism,
            "tz_env": os.environ.get("TZ"),
            "tmpdir": os.environ.get("TMPDIR"),
            "cwd": os.getcwd(),
            "confs": _conf_snapshot(spark),
            "payload": payload,
        }
        with _LOCK:
            # bounded artifact: local suite/chaos runs also append here,
            # and an unbounded log would bury the driver-run lines.
            # Rotation NEVER rewrites in place — concurrent processes
            # (chaos --isolate children, parallel pytest workers, the
            # driver's per-query apps) hold their own append handles, and
            # a read-truncate-rewrite would drop lines they interleave.
            # os.replace is atomic: in-flight appenders keep writing to
            # the renamed inode; new lines go to a fresh append handle.
            try:
                if DIAG_PATH.stat().st_size > _MAX_BYTES:
                    os.replace(DIAG_PATH, DIAG_PATH.with_suffix(".rotated.jsonl"))
            except OSError:
                pass
            with open(DIAG_PATH, "a", encoding="utf-8") as f:
                f.write(json.dumps(line, default=str) + "\n")
    except Exception:
        # Telemetry must never alter golden behavior.
        pass
