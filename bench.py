#!/usr/bin/env python
"""Headline benchmark (driver-run per round; see BASELINE.md).

Runs the engine's headline operators at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Two workload families:

  * KG construction (the north-star pipeline): fused extraction UDF over a
    deterministic golden-grammar corpus scaled with sf (cached under
    .fixtures), then the full extract→link→canonicalize→materialize pipeline.
    Reported alongside as docs/sec + triples/sec — the BASELINE.json metric.
  * Relational / training-data operators over the driver parquet tables:
    aggregation, joins, window ranking, MinHash + SimHash dedup, brute-force
    ANN, text quality.

Execution is forced with the `noop` datasource writer (full materialization,
no driver-side collect).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def sf_of(sf_dir: str) -> float:
    name = Path(sf_dir).name  # e.g. "sf0.1"
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.0


def warm_host_memory(gb: int = 12, budget_s: float = 60.0) -> float:
    """Fault guest memory frames in BEFORE timing (see CLAUDE.md /
    BASELINE.md round-3 advisory): after a VM restore, free memory is
    cold and first-touch can run 10-100x slow, so the first JVM/Arrow
    allocations pay hypervisor faults mid-measurement.  Touching pages
    here and freeing them returns once-faulted frames to the guest free
    list, which the executors then reuse fault-free.  Time-capped so a
    severely degraded host skips warming instead of stalling the bench.
    Returns the achieved touch rate in MB/s (a free health probe)."""
    # bytearray(n) zero-fills the allocation — that memset IS the first
    # touch of every page, so no per-page loop is needed; small chunks
    # keep the budget check responsive on a severely degraded host.
    # Chunks are HELD LIVE until the end (r3 ADVICE): freeing each 64 MB
    # chunk munmaps it and the kernel hands the same just-faulted frames
    # straight back to the next allocation, so an alloc/free loop mostly
    # re-touches one hot chunk instead of faulting `gb` of distinct
    # hypervisor-cold frames.
    # Cap by MemAvailable/2 so holding the chunks live can't push the box
    # (this process + the 8g driver JVM + page cache) into swap/OOM.
    try:
        avail_kb = next(
            int(l.split()[1])
            for l in open("/proc/meminfo")
            if l.startswith("MemAvailable:")
        )
        gb = max(1, min(gb, int(avail_kb / 1024 / 1024 / 2)))
    except (OSError, StopIteration):
        pass
    chunk = 64 * 1024 * 1024
    live: list[bytearray] = []
    touched = 0
    t0 = time.perf_counter()
    while touched < gb * 1024**3 and time.perf_counter() - t0 < budget_s:
        live.append(bytearray(chunk))
        touched += chunk
    dt = max(1e-9, time.perf_counter() - t0)
    live.clear()  # one bulk release after every distinct frame is faulted
    return round(touched / 1024**2 / dt, 1)


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_of(sf_dir)

    from openie_spark.fixtures import store
    from openie_spark.fixtures.entities import ensure_alias_dict
    from openie_spark.fixtures.gen_golden import golden_docs
    from openie_spark.session import get_spark
    from openie_spark.sources.tables import load_alias_dict, load_docs

    # deterministic KG bench corpus, scaled with sf, cached as parquet
    n_docs = max(2000, int(2_000_000 * sf))
    if n_docs >= 50_000:  # multiprocess chunked generator + parallel scan
        from openie_spark.fixtures.gen_scale import ensure_scale_corpus

        docs_path = ensure_scale_corpus(n_docs)
    else:
        docs_path = store.ensure(
            f"bench_docs_{n_docs}",
            lambda p: store.write_docs(golden_docs(n_docs=n_docs), p),
        )
    alias_path = ensure_alias_dict()

    spark = get_spark(app="openie-bench", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus,
                      extra_conf={"spark.ui.showConsoleProgress": "false",
                                  # corpus files are a few MB — size scan
                                  # splits accordingly (BASELINE.md)
                                  "spark.sql.files.maxPartitionBytes": "4m",
                                  "spark.sql.files.openCostInBytes": "512k"})
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from openie_spark.catalog import ParquetCatalog
    from openie_spark.operators.dedup import minhash_dup_pairs, simhash_dup_pairs
    from openie_spark.operators.extract import extract_stage
    from openie_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        srp_topk,
    )
    from openie_spark.operators.text_analysis import (
        with_lang_id,
        with_quality,
        with_token_counts,
    )
    from openie_spark.plans import registry
    from openie_spark.plans.pipeline import PipelineConfig, run_pipeline

    docs = load_docs(spark, docs_path)
    aliases = load_alias_dict(spark, alias_path)
    documents = spark.read.parquet(str(Path(sf_dir) / "documents.parquet"))
    embeddings = spark.read.parquet(str(Path(sf_dir) / "embeddings.parquet"))

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}
    # Warm + probe, with one retry: BENCH_r03 was recorded in a degraded
    # window and read as a 2.2x regression that wasn't (VERDICT r3 item 3).
    # The driver runs this script unconditionally, so we cannot refuse to
    # record — instead the artifact carries the probe verdict itself and a
    # second warm-up attempt is made if the first window looks degraded.
    sys.path.insert(0, str(Path(__file__).resolve().parent / "jobs"))
    from host_probe import probe  # jobs/host_probe.py

    extras["warm_touch_mb_s"] = warm_host_memory()
    p = probe()
    if not p["ok"]:
        extras["warm_touch_mb_s_retry"] = warm_host_memory()
        p = probe()
    extras["probe_ok"] = p["ok"]
    extras["probe_cold_touch_mb_s"] = p["cold_touch_mb_s"]
    extras["probe_warm_copy_gb_s"] = p["warm_copy_gb_s"]
    extras["probe_steal_pct"] = p["steal_pct"]

    # -- warm the JVM + Python worker pool once (not timed) -----------------
    force(docs.limit(64).select("doc_id", F.explode(
        F.filter("spans", lambda s: s["kind"] == F.lit("text"))).alias("s")))
    extract_stage(docs.limit(2048)).count()

    def timed(name: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 3)

    # -- KG construction headline ------------------------------------------
    n_triples = 0

    def run_extract():
        nonlocal n_triples
        n_triples = extract_stage(docs).count()

    timed("kg_extract", run_extract)
    extras["bench_docs"] = n_docs
    extras["bench_triples"] = n_triples
    extras["docs_per_sec"] = round(n_docs / timings["kg_extract"], 1)
    extras["triples_per_sec"] = round(n_triples / timings["kg_extract"], 1)

    out_dir = tempfile.mkdtemp(prefix="openie-bench-")
    try:
        timed(
            "kg_pipeline",
            lambda: run_pipeline(
                spark, docs, aliases, ParquetCatalog(spark, out_dir),
                PipelineConfig(run_id="bench"),
            ),
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    # -- relational operators over driver tables ----------------------------
    timed("pricing_summary", lambda: force(registry.q_pricing_summary(spark, sf_dir)))
    timed("segment_revenue", lambda: force(registry.q_segment_revenue(spark, sf_dir)))
    timed("latest_order", lambda: force(registry.q_latest_order(spark, sf_dir)))
    timed("events_hourly", lambda: force(registry.q_events_hourly(spark, sf_dir)))

    # -- training-data operators -------------------------------------------
    timed(
        "events_asof_order",
        lambda: force(registry.q_events_asof_order(spark, sf_dir)),
    )
    timed(
        "session_concurrency",
        lambda: force(registry.q_session_concurrency(spark, sf_dir)),
    )
    timed(
        "minhash_dedup",
        lambda: force(minhash_dup_pairs(documents, "doc_id", "text", 0.8)),
    )
    timed(
        "simhash_dedup",
        lambda: force(simhash_dup_pairs(documents, "doc_id", "text")),
    )
    probes = embeddings.where(F.col("vec_id") % 100 == 0)
    timed(
        "ann_topk_brute",
        lambda: force(brute_force_topk(embeddings, probes, k=5)),
    )
    timed(
        "ann_topk_srp",
        lambda: force(srp_topk(embeddings, probes, k=5)),
    )
    timed(
        "ann_topk_ivf",
        lambda: force(ivf_topk(embeddings, probes, k=5)),
    )
    timed(
        "text_quality",
        lambda: force(
            with_token_counts(with_quality(with_lang_id(documents)))
        ),
    )
    timed(
        "cooccurrence_lift",
        lambda: force(registry.q_cooccurrence_lift(spark, sf_dir)),
    )
    timed(
        "bloom_prune_join",
        lambda: force(registry.q_bloom_prune_join(spark, sf_dir)),
    )
    timed(
        "pps_sample",
        lambda: force(registry.q_pps_sample(spark, sf_dir)),
    )
    timed(
        "relation_cardinality",
        lambda: force(registry.q_relation_cardinality(spark, sf_dir)),
    )
    # Back in the headline as of r4: the degree-capped, dict-encoded,
    # single-(h,t)-shuffle plan (operators/rules.py) took this from 145 s
    # (r3, degraded window) / 68 s (clean, naive plan) to ~13-15 s on the
    # 18.5M-path composition (measured decomposition: join 2 s, the one
    # 18M-row (h,t) exchange + dedup ~8 s, support join + aggs ~4 s —
    # dedup factor is 1.06, so map-side partial dedup cannot shrink the
    # exchange; the remaining weight is inherent to exact body counting).
    timed(
        "rule_support",
        lambda: force(registry.q_rule_support(spark, sf_dir)),
    )
    # r4 additions: the 6-table star join (TPC-H Q5 shape) and the
    # deterministic DeepWalk corpus (3 edge scans + map-side min aggs).
    timed(
        "supplier_volume",
        lambda: force(registry.q_supplier_volume(spark, sf_dir)),
    )
    timed(
        "kg_walks",
        lambda: force(registry.q_kg_walks(spark, sf_dir)),
    )
    # final-r4 additions: windowed funnel (one user_id exchange shared by
    # both running-min windows), cohort grid, decile binning (broadcast
    # percentile boundaries).
    timed(
        "funnel",
        lambda: force(registry.q_funnel(spark, sf_dir)),
    )
    timed(
        "cohort_retention",
        lambda: force(registry.q_cohort_retention(spark, sf_dir)),
    )
    timed(
        "quality_bins",
        lambda: force(registry.q_quality_bins(spark, sf_dir)),
    )
    # 100-query-surface additions: SemDeDup pruning (integer k-means +
    # per-cluster quantized-cosine pair stage) and entity salience
    # (5-round integer PageRank over the ~2M-edge star KG).
    timed(
        "semantic_prune",
        lambda: force(registry.q_semantic_prune(spark, sf_dir)),
    )
    timed(
        "entity_salience",
        lambda: force(registry.q_entity_salience(spark, sf_dir)),
    )
    # continuation addition: SPARQL-style BGP with a 4-pattern nation
    # cycle over the star KG (operators/bgp.py) — the KG-query headline.
    timed(
        "kg_bgp",
        lambda: force(registry.q_kg_bgp(spark, sf_dir)),
    )

    # Post-run probe: a window can degrade MID-run (BENCH r4: probe-ok at
    # start, warm-touch collapsed during the suite and inflated the
    # bandwidth-bound kg_pipeline line 3x).  Stamping both endpoints lets
    # a reader separate ambient collapse from code regression.
    p2 = probe()
    extras["probe_after_ok"] = p2["ok"]
    extras["probe_after_warm_copy_gb_s"] = p2["warm_copy_gb_s"]
    extras["probe_after_cold_touch_mb_s"] = p2["cold_touch_mb_s"]

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                **extras,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
