#!/usr/bin/env python
"""Scaling-efficiency protocol (BASELINE.md §scaling): run the IDENTICAL
full pipeline (extract → link → canonicalize → materialize) on the IDENTICAL
input at two parallelism levels — the sandbox substitute for N vs 4N
executors — and report throughput at both plus
``efficiency = (thr_4N / thr_N) / 4`` (pass ≥ 0.8).

    python jobs/bench_scaling.py --docs 2000000 --reps 3 --cores 8,32 \
        --out BENCH_SCALING.json

Timing excludes SparkSession startup and corpus generation (cached fixture);
each repetition uses a fresh output catalog (no resume short-circuit).
n_triples is counted once, untimed, for the triples/sec metric.
"""

from __future__ import annotations

import argparse
import json
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def run_level(cores: int, docs_path: str, alias_path: str, reps: int) -> dict:
    from openie_spark.catalog import ParquetCatalog
    from openie_spark.operators.extract import extract_stage
    from openie_spark.plans.pipeline import PipelineConfig, run_pipeline
    from openie_spark.session import get_spark
    from openie_spark.sources.tables import load_alias_dict, load_docs

    spark = get_spark(
        app=f"scale-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_docs(spark, docs_path)
    aliases = load_alias_dict(spark, alias_path)
    n_docs = docs.count()  # untimed; also warms the scan
    n_triples = extract_stage(docs).count()  # untimed; triples/sec denominator

    walls, stage_walls = [], []
    for rep in range(reps):
        out_dir = tempfile.mkdtemp(prefix=f"scale-{cores}-{rep}-")
        try:
            t0 = time.perf_counter()
            res = run_pipeline(
                spark,
                docs,
                aliases,
                ParquetCatalog(spark, out_dir),
                PipelineConfig(run_id=f"scale{rep}", collect_counts=False),
            )
            walls.append(time.perf_counter() - t0)
            stage_walls.append(
                {
                    k: res[k]
                    for k in (
                        "extract_wall_ms",
                        "link_wall_ms",
                        "canonicalize_wall_ms",
                        "materialize_wall_ms",
                    )
                }
            )
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()
    wall = statistics.median(walls)
    return {
        "cores": cores,
        "n_docs": n_docs,
        "n_triples": n_triples,
        "walls_sec": [round(w, 2) for w in walls],
        "median_wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 1),
        "triples_per_sec": round(n_triples / wall, 1),
        "stage_walls_ms": stage_walls,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cores", default="8,32")
    ap.add_argument("--out", default="BENCH_SCALING.json")
    args = ap.parse_args()

    from openie_spark.fixtures import store
    from openie_spark.fixtures.entities import alias_rows
    from openie_spark.fixtures.gen_scale import ensure_scale_corpus
    from tests.conftest import ALIAS_PA

    t0 = time.perf_counter()
    docs_path = ensure_scale_corpus(args.docs)
    alias_path = store.ensure(
        "alias_dict", lambda p: store.write_rows(alias_rows(), ALIAS_PA, p)
    )
    print(f"corpus ready in {time.perf_counter()-t0:.0f}s: {docs_path}", file=sys.stderr)

    levels = [int(c) for c in args.cores.split(",")]
    results = [run_level(c, docs_path, alias_path, args.reps) for c in levels]

    lo, hi = results[0], results[-1]
    ratio = hi["cores"] / lo["cores"]
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / ratio
    report = {
        "protocol": "BASELINE.md sandbox substitute: local[N] vs local[4N], identical input",
        "n_docs": args.docs,
        "reps": args.reps,
        "levels": results,
        "speedup": round(hi["docs_per_sec"] / lo["docs_per_sec"], 2),
        "efficiency": round(eff, 3),
        "pass": eff >= 0.8,
    }
    Path(args.out).write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
