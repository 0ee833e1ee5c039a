"""Build BENCH_ENVELOPE.json — the cross-round timing envelope for the
bench's EXTENDED operator section (r11 verdict "Next round" #3: the
costliest operators in the repo sit outside the 19-query headline set,
so a plan regression there only showed up as silent extended-number
drift; the envelope gives bench.py a band to flag against, the way the
headline section already has probe gates).

Sources: the committed BENCH_idle_r*.json full records (idle-host runs —
the only ones whose extended numbers are machine-speed-clean). Per query:
median + low/high band + sample count. Re-run after a deliberate plan
change or when a new idle record lands:

    python tools/extended_envelope.py          # rewrite BENCH_ENVELOPE.json
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..")


def build() -> dict:
    samples: dict[str, list[float]] = {}
    used: list[str] = []
    for f in sorted(glob.glob(os.path.join(ROOT, "BENCH_idle_r*.json"))):
        try:
            rec = json.load(open(f))
        except (OSError, json.JSONDecodeError):
            continue
        ext = rec.get("extended")
        if not isinstance(ext, dict) or not ext:
            continue
        used.append(os.path.basename(f))
        for name, sec in ext.items():
            if isinstance(sec, (int, float)) and sec > 0:
                samples.setdefault(name, []).append(float(sec))
    env = {
        name: {
            "median": round(statistics.median(vals), 3),
            "lo": round(min(vals), 3),
            "hi": round(max(vals), 3),
            "n": len(vals),
        }
        for name, vals in sorted(samples.items())
    }
    return {"metric": "extended_envelope", "sources": used, "queries": env}


if __name__ == "__main__":
    out = build()
    path = os.path.join(ROOT, "BENCH_ENVELOPE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {os.path.abspath(path)}: {len(out['queries'])} queries "
          f"from {len(out['sources'])} idle records", file=sys.stderr)
