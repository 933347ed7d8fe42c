"""Spec-side triples fixture: the pure-Python frozen rule set
(spec/rules.py) applied single-process to EXACTLY the docs the registry's
``_docs()`` loads (interleaved sf docs + golden grammar corpus).

This is the independent oracle side for the extraction-derived aggregate
queries (``clause_stats``, ``dep_arc_stats``): Spark's distributed
mapInArrow kernel and this single-process run share only the frozen spec,
so a DuckDB aggregate over this parquet cross-checks the whole
distributed path (Arrow round-trip, partitioning, explode/split logic)
— not just the rule semantics the L2 golden gate already pins.

Cache key carries RULESET_VERSION + the sf dir name, so a ruleset bump
or a different scale regenerates automatically (CLAUDE.md fixture rule).
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa

from openie_spark.fixtures import store

TRIPLES_PA = pa.schema(
    [
        pa.field("doc_id", pa.string(), nullable=False),
        pa.field("clause_type", pa.string(), nullable=False),
        pa.field("rel", pa.string(), nullable=False),
        pa.field("deps", pa.string(), nullable=False),
        pa.field("conj", pa.int32(), nullable=False),
    ]
)


def spec_triples_rows(sf_dir: str) -> list[dict]:
    from openie_spark.fixtures.gen_docs import docs_interleaved
    from openie_spark.fixtures.gen_golden import golden_docs
    from openie_spark.spec import rules

    rows = []
    for d in docs_interleaved(sf_dir) + golden_docs():
        for t in rules.extract_document(d["spans"]):
            rows.append(
                {
                    "doc_id": d["doc_id"],
                    "clause_type": t.clause_type,
                    "rel": t.rel,
                    "deps": t.deps,
                    "conj": t.conj,
                }
            )
    return rows


def spec_triples_path(sf_dir: str) -> str:
    from openie_spark.spec import rules

    name = f"spec_triples_{rules.RULESET_VERSION}_{Path(sf_dir).name}"
    return store.ensure(
        name,
        lambda p: store.write_rows(spec_triples_rows(sf_dir), TRIPLES_PA, p),
    )
