#!/usr/bin/env python
"""Probe-gated bench watcher (the BASELINE.md §end-of-r4 pattern, as a tool).

The shared host degrades for hours at a time (see CLAUDE.md §benchmarking):
recording BENCH in such a window makes a round look like a regression it
isn't (the r3 lesson), and a manual operator wastes the short green windows.
This loop mechanizes the documented discipline:

  - every ``--interval`` seconds, run jobs/host_probe.py;
  - only when it prints ``ok`` (and warm-copy clears ``--min-gbps``, default
    above the probe's own floor because bench needs a SUSTAINED window, not
    a momentary one) run ``python bench.py``;
  - stamp the attempt to ``--outdir`` (default /tmp/bench_candidates)
    whatever happens — candidates are NEVER auto-promoted to
    BENCH_local.json; the operator inspects the warm-touch and
    probe_after stamps and promotes by hand (cp + git commit);
  - exit 0 on the first GREEN candidate (probe_after_ok true AND the
    start-of-run warm touch — best of first + retry — above
    ``--min-warm-touch``) or rc 1 when ``--budget-s``
    runs out.

Nothing here runs concurrently with anything: one bench at a time, and the
caller is expected not to run pytest alongside (CLAUDE.md rule).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "jobs"))

from round_artifacts import MIN_WARM_TOUCH_MB_S, best_warm_touch  # one home


def probe() -> dict:
    out = subprocess.run(
        [sys.executable, str(REPO / "jobs" / "host_probe.py")],
        capture_output=True,
        text=True,
        timeout=300,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=float, default=300.0)
    ap.add_argument("--budget-s", type=float, default=7200.0)
    ap.add_argument("--min-gbps", type=float, default=14.0)
    ap.add_argument("--min-warm-touch", type=float, default=MIN_WARM_TOUCH_MB_S)
    ap.add_argument("--outdir", default="/tmp/bench_candidates")
    args = ap.parse_args()

    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    t0 = time.time()
    attempt = 0
    while time.time() - t0 < args.budget_s:
        p = probe()
        print(f"[watcher] probe: {json.dumps(p)}", flush=True)
        if not p.get("ok") or p.get("warm_copy_gb_s", 0.0) < args.min_gbps:
            time.sleep(args.interval)
            continue
        attempt += 1
        print(f"[watcher] window open -> bench attempt {attempt}", flush=True)
        run = subprocess.run(
            [sys.executable, str(REPO / "bench.py")],
            capture_output=True,
            text=True,
            timeout=3600,
            cwd=str(REPO),
        )
        line = next(
            (l for l in reversed(run.stdout.strip().splitlines()) if l.startswith("{")),
            None,
        )
        if line is None:
            print(f"[watcher] bench produced no JSON (rc={run.returncode})", flush=True)
            time.sleep(args.interval)
            continue
        rec = json.loads(line)
        rec["_watcher_pre_probe"] = p
        path = outdir / f"bench_{int(time.time())}.json"
        path.write_text(json.dumps(rec) + "\n")
        green = bool(rec.get("probe_after_ok")) and (
            best_warm_touch(rec) >= args.min_warm_touch
        )
        print(
            f"[watcher] candidate {path} headline={rec.get('value')} "
            f"warm_touch={rec.get('warm_touch_mb_s')} green={green}",
            flush=True,
        )
        if green:
            print(f"[watcher] GREEN candidate: {path} — promote by hand", flush=True)
            return 0
        time.sleep(args.interval)
    print("[watcher] budget exhausted without a green candidate", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
