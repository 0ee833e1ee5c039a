"""The examples/ scripts must actually run: they are the demo surface a
new user executes first, and they exercise REST bootstrap + SQL + the
open-metadata reader (getting_started) and the full curation operator
chain (curation_pipeline) end to end in a fresh interpreter."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script: str, *args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), *args],
        capture_output=True,
        text=True,
        timeout=480,
        cwd=REPO,
    )


def test_getting_started_example(tmp_path):
    r = _run("getting_started.py", str(tmp_path / "wh"))
    assert r.returncode == 0, r.stderr[-2000:]


def test_curation_pipeline_example():
    r = _run("curation_pipeline.py", "/root/testdata/sf0.001")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "residual_pii" in r.stdout and "audio sidecar" in r.stdout


def test_multi_table_txn_example(tmp_path):
    r = _run("multi_table_txn.py", str(tmp_path / "txn"))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "committed atomically" in r.stdout
    assert "zero tables published" in r.stdout
    assert "swapped both pointers atomically" in r.stdout


def test_cdc_upsert_pipeline_example(tmp_path):
    r = _run("cdc_upsert_pipeline.py", str(tmp_path / "cdc"))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "MV refreshed (incremental)" in r.stdout
    assert "FOREIGN upsert" in r.stdout


def test_sql_dialect_tour_example(tmp_path):
    r = _run("sql_dialect_tour.py", str(tmp_path / "tour"))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dialect tour complete" in r.stdout
    assert "rows at first snapshot: 6; rows now: 7" in r.stdout
