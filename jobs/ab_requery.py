#!/usr/bin/env python
"""Interleaved A/B re-measure of individual headline queries (VERDICT r2
item 8): run one rep of the named queries from a given source tree, print a
JSON line with timings + hypervisor steal%.  The DRIVER of the protocol is
the shell loop that alternates trees (BASELINE.md §scaling: interleave A/B
on this shared-steal host, never average same-tree back-to-back reps).

Usage: python jobs/ab_requery.py <tree_root> <label>
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

TREE = sys.argv[1]
LABEL = sys.argv[2]
sys.path.insert(0, str(Path(TREE).resolve()))

SF_DIR = "/root/testdata/sf0.1"
CPUS = 32


def steal_jiffies() -> tuple[int, int]:
    parts = open("/proc/stat").readline().split()
    vals = list(map(int, parts[1:]))
    return vals[7], sum(vals)  # steal, total


def main() -> int:
    from pyspark.sql import functions as F  # noqa: F401

    from openie_spark.operators.dedup import minhash_dup_pairs
    from openie_spark.plans import registry
    from openie_spark.session import get_spark

    spark = get_spark(
        app=f"ab-{LABEL}",
        master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.files.maxPartitionBytes": "4m",
            "spark.sql.files.openCostInBytes": "512k",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warm the worker pool (first UDF job pays fork+import, BASELINE.md)
    force(minhash_dup_pairs(documents.limit(64), "doc_id", "text", 0.8))

    out = {"label": LABEL, "tree": TREE}
    for name, fn in (
        ("minhash_dedup", lambda: force(minhash_dup_pairs(documents, "doc_id", "text", 0.8))),
        ("events_hourly", lambda: force(registry.q_events_hourly(spark, SF_DIR))),
    ):
        s0, t0j = steal_jiffies()
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        s1, t1j = steal_jiffies()
        out[name] = round(dt, 3)
        out[f"{name}_steal_pct"] = round(
            100.0 * (s1 - s0) / max(1, t1j - t0j), 2
        )
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
