"""Spec-side triples fixture: the pure-Python frozen rule set
(spec/rules.py) applied single-process to EXACTLY the docs the registry's
``_docs()`` loads (interleaved sf docs + golden grammar corpus).

This is the independent oracle side for the extraction-derived queries
(``extract_triples``, ``mentions``, ``clause_stats``, ``dep_arc_stats``):
Spark's distributed mapInArrow kernel and this single-process run share
only the frozen spec, so a DuckDB scan/aggregate over this parquet
cross-checks the whole distributed path (Arrow round-trip, partitioning,
explode/split logic) — not just the rule semantics the L2 golden gate
already pins.  The fixture carries the FULL triple row (every
TRIPLE_STRUCT column) so the identity oracle on ``extract_triples``
value-hashes all of it, including the ``conf`` doubles (bit-identical by
construction: both sides run the same pure-Python rule kernel per row,
never a reassociated float reduction).

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
        pa.field("sent_idx", pa.int32(), nullable=False),
        pa.field("subj", pa.string(), nullable=False),
        pa.field("rel", pa.string(), nullable=False),
        pa.field("arg", pa.string(), nullable=False),
        pa.field("subj_norm", pa.string(), nullable=False),
        pa.field("arg_norm", pa.string(), nullable=False),
        pa.field("conf", pa.float64(), nullable=False),
        pa.field("clause_type", pa.string(), nullable=False),
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
            r = t._asdict()
            r["doc_id"] = d["doc_id"]
            rows.append(r)
    return rows


def spec_triples_path(sf_dir: str) -> str:
    from openie_spark.spec import rules

    # 'full' tags the schema revision (all TRIPLE_STRUCT columns); the old
    # 5-column fixtures self-retire under the previous name.  The content
    # fingerprint of the EXTERNAL input makes a regenerated testdata dir
    # self-invalidate (same discipline as the dedup/ANN twins).
    fp = store.file_fingerprint(Path(sf_dir) / "documents.parquet")
    name = f"spec_triples_{rules.RULESET_VERSION}_full_{Path(sf_dir).name}_{fp}"
    return store.ensure(
        name,
        lambda p: store.write_rows(spec_triples_rows(sf_dir), TRIPLES_PA, p),
    )
