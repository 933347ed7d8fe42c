"""Smoke-pin the round-artifact CLI's flag combinations (jobs/
round_artifacts.py) — regression for the --bench-only UnboundLocalError
(`fails` was only assigned on the correctness branch)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]


def test_bench_only_skip_bench_exits_clean(tmp_path):
    # --bench-only + --skip-bench does no work at all — it must still get
    # past the return without touching the correctness-branch locals.
    # --force bypasses the host-health gate (this is not a timing run).
    out = subprocess.run(
        [
            sys.executable,
            str(REPO / "jobs" / "round_artifacts.py"),
            "--bench-only",
            "--skip-bench",
            "--force",
            "--out-dir",
            str(tmp_path),
        ],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-1000:]
    assert not (tmp_path / "CORRECTNESS_local.json").exists()
    assert not (tmp_path / "BENCH_local.json").exists()
