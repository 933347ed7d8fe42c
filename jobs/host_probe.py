#!/usr/bin/env python
"""Pre-benchmark host health probe.  Run BEFORE any timing measurement;
refuse to record numbers when the host is in a degraded episode.

Three signals, printed as one JSON line:

  cold_touch_mb_s   first-touch rate of never-touched pages.  After this
                    VM reboots/restores, ALL free memory is cold and the
                    guest faults pages in from the hypervisor lazily —
                    measured as low as ~5 MB/s right after a restore
                    (98 s to first-touch 512 MB), recovering to ~1 GB/s
                    once frames have been faulted once and recycled by
                    the guest.  JVM heaps + Arrow buffers allocate fresh
                    pages, so a cold machine inflates memory-bound
                    stages 10-100x while cache-resident work looks
                    normal — a profile that mimics (and dwarfs)
                    hypervisor steal.
  warm_copy_gb_s    steady-state memcpy on already-touched pages
                    (BASELINE.md band: ~20-90 GB/s depending on hour).
  steal_pct         hypervisor steal over a 5 s window (/proc/stat).

Gate used by the working notes: cold_touch >= 500 MB/s AND
warm_copy >= 10 GB/s AND steal <= 15%, else warm up (touch a few GB,
rerun) or wait.
"""

from __future__ import annotations

import json
import time


def cold_touch_mb_s(mb: int = 256) -> float:
    # bytearray(n) zero-fills — the memset is the first touch of every
    # page, so timing the allocation alone measures the fault rate
    t0 = time.perf_counter()
    b = bytearray(mb * 1024 * 1024)
    dt = time.perf_counter() - t0
    del b
    return round(mb / dt, 1)


def warm_copy_gb_s(mb: int = 256) -> float:
    import numpy as np

    a = np.ones(mb * 1024 * 1024 // 8)
    b = np.empty_like(a)
    np.copyto(b, a)  # fault both once
    t0 = time.perf_counter()
    np.copyto(b, a)
    return round(a.nbytes * 2 / (time.perf_counter() - t0) / 1e9, 1)


def steal_pct(window_s: float = 5.0) -> float:
    def read():
        f = open("/proc/stat").readline().split()
        return int(f[8]), sum(map(int, f[1:]))

    s1, t1 = read()
    time.sleep(window_s)
    s2, t2 = read()
    return round(100 * (s2 - s1) / max(1, t2 - t1), 2)


def probe(steal_window_s: float = 5.0) -> dict:
    """All three signals plus the gate verdict, as a dict (importable —
    bench.py stamps its artifact with this)."""
    out = {
        "cold_touch_mb_s": cold_touch_mb_s(),
        "warm_copy_gb_s": warm_copy_gb_s(),
        "steal_pct": steal_pct(steal_window_s),
    }
    out["ok"] = (
        out["cold_touch_mb_s"] >= 500
        and out["warm_copy_gb_s"] >= 10
        and out["steal_pct"] <= 15
    )
    return out


def main() -> None:
    print(json.dumps(probe()))


if __name__ == "__main__":
    main()
