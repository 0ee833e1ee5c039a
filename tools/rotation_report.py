"""Print the driver-evidence status of every registered query, so
rotating the 50-slot correctness window each round is mechanical.

Usage: python tools/rotation_report.py
Reads CORRECTNESS_r*.json at the repo root and the live registry;
reports per-query green-round counts, the current window with
first-timer marks, and the never-driver-checked remainder to pull from
next round.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from minio_iceberg_polaris_lakehouse_spark.registry import all_queries  # noqa: E402


def main() -> None:
    qs = all_queries()
    rounds: dict[str, list[str]] = {}
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        tag = os.path.basename(f)[12:-5]
        for name, res in json.load(open(f)).items():
            ok = res.get("hash_match") or (res.get("rows_match") and res.get("err") is None)
            rounds.setdefault(name, []).append(tag + ("+" if ok else "!"))
    window = list(qs)[:50]
    print(f"registered: {len(qs)}  window: {len(window)}  "
          f"driver-checked union: {len(set(rounds) | set(window))}")
    print("\n-- window (first-timers marked *) --")
    for n in window:
        mark = "*" if n not in rounds else " "
        oracle = " " if qs[n].oracle else "R"  # R = rows-only
        print(f" {mark}{oracle} {n:35s} {' '.join(rounds.get(n, []))}")
    never = [n for n in qs if n not in rounds and n not in window]
    print(f"\n-- never driver-checked and outside the window ({len(never)}) --")
    for n in never:
        print(f"  {'R' if qs[n].oracle is None else ' '} {n}")
    vets = sorted(
        ((n, len(rounds[n])) for n in window if n in rounds and len(rounds[n]) >= 3),
        key=lambda kv: -kv[1],
    )
    print(f"\n-- in-window veterans with >=3 green rounds (rotation candidates: {len(vets)}) --")
    for n, k in vets:
        print(f"  {k}  {n}")
    # the other half of the rotation trade: oracle-backed alumni whose
    # LAST driver check is oldest (stalest first) — the incoming pool
    # matching the r10-verdict policy (re-earn green on a recent tree)
    stale = sorted(
        (
            (n, max(int(t.rstrip("+!").lstrip("r")) for t in rounds[n]))
            for n in rounds
            if n in qs and n not in window and qs[n].oracle is not None
        ),
        key=lambda kv: kv[1],
    )
    print(f"\n-- stalest oracle-backed alumni outside the window ({len(stale)}; seat the oldest) --")
    for n, r in stale[:25]:
        print(f"  r{r:02d}  {n}")


if __name__ == "__main__":
    main()
