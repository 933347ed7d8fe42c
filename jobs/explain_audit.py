#!/usr/bin/env python
"""Physical-plan audit: dump `.explain("formatted")` for the headline
queries into PLANS.md so plan quality (pushdown, pruning, broadcast
choices, codegen spans, absence of cartesians / row-Python) is reviewable
without re-running anything.

    python jobs/explain_audit.py [--sf-dir /root/testdata/sf0.01] [--out PLANS.md]

Plans are captured AFTER execution where AQE rewrites matter (the final
adaptive plan is the one that ran), except for queries whose construction
already executes jobs (marked `logical-only`).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# (name, run_first) — run_first executes the query so the AQE final plan is
# captured; queries that collect during construction are skipped from run.
AUDIT = [
    ("pricing_summary", True),
    ("region_customers", True),
    ("segment_revenue", True),
    ("latest_order", True),
    ("sessionize", True),
    ("events_asof_order", True),
    ("session_concurrency", True),
    ("value_percentiles", True),
    ("exact_dedup", True),
    ("ngram_jaccard", True),
    ("minhash_dedup", True),
    ("simhash_dedup", True),
    ("ann_topk", True),
    ("ann_topk_srp", True),
    ("ann_topk_ivf", True),
    ("extract_triples", True),
    ("mentions", True),
    ("entity_links", True),
    ("pivot_segment_status", True),
    ("train_val_split", True),
    ("dep_arc_stats", True),
    ("repetition_stats", True),
    ("curation_manifest", True),
    ("doc_chunks", True),
    ("triangle_counts", True),
    ("pagerank", True),
    ("scc", True),
    ("scc_layers", True),
    ("khop_distances", True),
    ("sssp", True),
    ("bloom_prune_join", True),
    ("embedding_quantize", True),
    ("cooccurrence_lift", True),
    ("linkpred", True),
    ("pps_sample", True),
    ("relation_cardinality", True),
    ("rule_support", True),
    ("attribution", True),
    ("vocab_encode", True),
    ("seq_pack", True),
    ("mis", True),
    ("dup_ngram_stats", True),
    ("domain_mix", True),
    ("blocking_quality", True),
    ("triple_intervals", True),
    ("kg_asof", True),
    ("supplier_volume", True),
    ("kg_walks", True),
    ("kg_skipgrams", True),
    ("label_prop", True),
    ("hits", True),
    ("chunk_dedup", True),
    ("kmeans", True),
    ("term_retrieval", True),
    ("kg_eval", True),
    ("token_budget_mix", True),
    ("funnel", True),
    ("cohort_retention", True),
    ("quality_bins", True),
    ("session_transitions", True),
    ("rolling_distinct", True),
    ("burst_hours", True),
    ("semantic_prune", True),
    ("ppr", True),
    ("entity_salience", True),
    ("importance_scores", True),
    ("bpe_encode", True),
    ("value_mad", True),
    ("kg_bgp", True),
    ("kg_bgp_optional", True),
]

CHECKS = {
    "PushedFilters": "filter pushdown reached the scan",
    "ReadSchema": "column pruning reached the scan",
    "BroadcastHashJoin": "small side broadcast",
    "WholeStageCodegen": "JVM codegen span",
}
RED_FLAGS = ("CartesianProduct", "BatchEvalPython")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=str(REPO / "PLANS.md"))
    ap.add_argument("--max-lines", type=int, default=80)
    args = ap.parse_args()

    from openie_spark.plans import registry
    from openie_spark.session import get_spark

    spark = get_spark(
        app="explain-audit",
        master="local[8]",
        shuffle_partitions=16,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    sections = []
    flags_found: dict[str, list[str]] = {}
    for name, run_first in AUDIT:
        df = registry.QUERIES[name](spark, args.sf_dir)
        if run_first:
            # collect() executes THIS Dataset's QueryExecution — a sink
            # write (or count) would plan and run a separate QE, leaving
            # df's own plan un-executed and the AQE rewrites uncaptured
            # (the artifact would show isFinalPlan=false everywhere)
            df.collect()
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        lines = txt.splitlines()
        shown = lines[: args.max_lines]
        if len(lines) > args.max_lines:
            shown.append(f"... ({len(lines) - args.max_lines} more lines)")
        present = [k for k in CHECKS if k in txt]
        red = [k for k in RED_FLAGS if k in txt]
        if red:
            flags_found[name] = red
        hdr = (
            f"## {name}\n\n"
            f"present: {', '.join(present) or '-'}"
            + (f" | **RED FLAGS: {', '.join(red)}**" if red else "")
            + "\n\n```\n" + "\n".join(shown) + "\n```\n"
        )
        sections.append(hdr)
        print(f"{name}: ok" + (f" RED {red}" if red else ""))

    body = (
        "# PLANS — formatted physical plans of the headline queries\n\n"
        f"Generated by `jobs/explain_audit.py` at sf dir `{args.sf_dir}`; "
        "plans captured post-execution (AQE-final) on local[8].\n"
        "Red-flag scan: CartesianProduct / BatchEvalPython (row-Python).\n\n"
        + "\n".join(sections)
    )
    Path(args.out).write_text(body)
    print(f"wrote {args.out}; red flags: {flags_found or 'none'}")
    spark.stop()
    # the deliberate BroadcastNestedLoopJoin in ann_topk (tiny probe
    # broadcast) is not a red flag; cartesians and row-Python are
    return 1 if flags_found else 0


if __name__ == "__main__":
    sys.exit(main())
