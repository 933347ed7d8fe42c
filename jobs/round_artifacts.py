#!/usr/bin/env python
"""One-command round-artifact generation (VERDICT r3 item 9).

Turns the r3 process failure — queries shipped after the artifacts were
cut, artifacts recorded in a degraded host window — into a mechanical
impossibility:

  1. runs the host probe and REFUSES to record anything unless it prints
     ok (override with --force, which stamps the refusal into the
     artifact instead);
  2. replays the driver's CORRECTNESS harness over ALL ``queries()``
     entries at sf0.01 with the dtype-strict canon
     (openie_spark/plans/compare.py — the same module the pytest gate
     uses), writing CORRECTNESS_local.json in the driver's row format;
  3. runs bench.py (which re-probes and stamps itself), writing
     BENCH_local.json.

Run it at round close: if CORRECTNESS_local.json has a false anywhere,
the driver's run will too.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "jobs"))

SF_DIR = "/root/testdata/sf0.01"

# Warm-touch floor for PROMOTING a bench record (MB/s).  The stamp is
# measured AT THE START of bench.py (before the suite; bench.py retries
# once when the first touch reads cold), so this gate rejects records
# whose window was already bad at launch; MID-run collapse is what the
# probe_after_ok stamp catches.  CALIBRATION (measured end-r4): the
# metric's value depends on guest memory state, not just host health —
# with a ~120 GB free pool every 12 GB touch faults genuinely
# hypervisor-cold frames and the HEALTHY steady rate reads 400-700 MB/s
# (probed 3x back-to-back in a window whose endpoint probes and
# compute-bound bench lines were all green), while a frames-recycled
# state (page cache full, MemAvailable cap small) reads 1000+.  The
# genuinely-degraded episode read 124 MB/s with probe_after FAILED and
# memory-bound lines 1.3-3x inflated.  The floor therefore sits between
# the degraded episode and the cold-pool healthy band.  The gate takes
# the BEST of the first touch and bench.py's retry (a healthy window
# whose first touch hit a cold pool must not be parked forever).  Same
# floor as bench_watcher's --min-warm-touch default (it imports this
# constant and best_warm_touch).
MIN_WARM_TOUCH_MB_S = 300.0


def best_warm_touch(bench: dict) -> float:
    """The start-of-run warm-touch stamp a promotion gate should read:
    max of the first touch and the retry (bench.py re-touches once when
    the first reading is cold)."""
    return max(
        float(bench.get("warm_touch_mb_s", 0.0)),
        float(bench.get("warm_touch_mb_s_retry", 0.0)),
    )
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def run_correctness(spark) -> dict:
    import duckdb

    import __spark_entry__ as entrymod
    from openie_spark.plans.compare import compare_frames

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{Path(SF_DIR)}/{t}.parquet')"
        )

    oracles = entrymod.oracle_sql()
    results: dict[str, dict] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        try:
            pdf = fn(spark, SF_DIR).toPandas()
            if name in oracles:
                row = compare_frames(pdf, con.sql(oracles[name]).df())
            else:
                row = {
                    "rows_match": None,
                    "schema_match": None,
                    "hash_match": None,
                    "spark_rows": len(pdf),
                    "oracle_rows": None,
                    "err": "no_oracle",
                }
        except Exception as e:  # a crashed query must surface, not abort the sweep
            row = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": None,
                "oracle_rows": None,
                "err": f"{type(e).__name__}: {e}"[:500],
            }
        row["wall_s"] = round(time.perf_counter() - t0, 2)
        results[name] = row
        flag = row["hash_match"]
        status = "PASS" if flag else ("rows-only" if row["err"] == "no_oracle" else "FAIL")
        print(f"  {name}: {status} ({row['wall_s']}s)", flush=True)
    return results


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--force", action="store_true", help="record despite a degraded-host probe")
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument(
        "--bench-only",
        action="store_true",
        help="re-record BENCH_local.json without replaying the correctness "
        "sweep (for when the host degraded mid-bench but the sweep is good)",
    )
    ap.add_argument("--out-dir", default=str(REPO))
    args = ap.parse_args()
    out_dir = Path(args.out_dir)
    fails: list[str] = []  # stays empty under --bench-only

    from host_probe import probe

    p = probe()
    print("host probe:", json.dumps(p), flush=True)
    # The probe gate protects TIMINGS; the correctness sweep is a value
    # compare and is valid in any window, so --skip-bench runs regardless.
    if not p["ok"] and not (args.force or args.skip_bench):
        print(
            "REFUSING to record bench timings in a degraded-host window "
            "(CLAUDE.md rule). Warm up / wait and re-run, pass --force, or "
            "use --skip-bench for the window-independent correctness sweep.",
            file=sys.stderr,
        )
        return 1

    if not args.bench_only:
        from openie_spark.session import get_spark

        spark = get_spark(
            app="round-artifacts",
            master="local[8]",
            shuffle_partitions=16,
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        results = run_correctness(spark)
        spark.stop()

        fails = [n for n, r in results.items() if r["hash_match"] is False]
        n_pass = sum(1 for r in results.values() if r["hash_match"])
        corr = {"_probe": p, **results}
        (out_dir / "CORRECTNESS_local.json").write_text(json.dumps(corr, indent=2))
        print(
            f"correctness: {n_pass} hash-match, {len(fails)} FAIL "
            f"({fails if fails else 'clean'}), {len(results)} total",
            flush=True,
        )

    if not args.skip_bench:
        out = subprocess.run(
            [sys.executable, str(REPO / "bench.py")],
            capture_output=True,
            text=True,
            check=False,
        )
        line = next(
            (l for l in reversed(out.stdout.splitlines()) if l.startswith("{")), None
        )
        if line is None:
            print("bench.py produced no JSON line", file=sys.stderr)
            print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
            return 1
        bench = {"_probe_pre": p, **json.loads(line)}
        # The pre-run probe gates ENTRY, but a shared host can degrade
        # MID-run (seen late r4: pre-probe 16.4 GB/s warm-copy, post-run
        # 3.7 — memory-bound lines inflated 2x).  bench.py re-probes
        # after the run and stamps probe_after_ok; a record cut in a
        # window that went bad is not a record — park it as a candidate
        # instead of overwriting BENCH_local.json.
        degraded_after = bench.get("probe_after_ok") is False
        degraded_start = best_warm_touch(bench) < MIN_WARM_TOUCH_MB_S
        degraded = degraded_after or degraded_start
        target = "BENCH_candidate.json" if degraded and not args.force else "BENCH_local.json"
        (out_dir / target).write_text(json.dumps(bench, indent=2))
        print("bench:", line, flush=True)
        if target != "BENCH_local.json":
            why = (
                "probe_after_ok=false"
                if degraded_after
                else f"start-of-run warm_touch {best_warm_touch(bench)} < {MIN_WARM_TOUCH_MB_S} MB/s"
            )
            print(
                f"host degraded mid-bench ({why}): wrote "
                f"{target}; BENCH_local.json left untouched — re-run "
                "`python jobs/round_artifacts.py --bench-only` (or "
                "bench_watcher) in a green window",
                flush=True,
            )

    return 2 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
