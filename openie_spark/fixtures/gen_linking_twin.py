"""Pure-Python single-process twin of the FULL entity-linking stage — the
oracle side for ``entity_links``.

The abstaining oracle (spec/linking_oracle.oracle_links) already decides
exact/lsh/minted per mention; the one thing it could not produce was the
minted entity-id VALUES (Spark's ``xxhash64``).  functions/hashing.xxh64
(pure-Python XXH64, validated bit-identical to Spark's) closes that gap,
so the twin now emits the complete (mention_norm, entity_id, method) row
set and the driver value-hash pins the whole distributed stage: broadcast
exact join, LSH banding + Jaccard verify + (jaccard, entity_id,
alias_norm) tiebreak, and deterministic minting.

Mentions are read from the spec-side triples fixture (gen_spec_triples) —
the same single-process extraction run the extract_triples identity
oracle uses — so this fixture is independent of every Spark stage it
checks.  Cache key carries the ruleset version (mentions derive from the
triples) and a twin version tag.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from openie_spark.fixtures import store

LINKS_PA = pa.schema(
    [
        pa.field("mention_norm", pa.string(), nullable=False),
        pa.field("entity_id", pa.int64(), nullable=False),
        pa.field("method", pa.string(), nullable=False),
    ]
)


def entity_link_rows(sf_dir: str) -> list[dict]:
    from openie_spark.fixtures.entities import alias_rows
    from openie_spark.fixtures.gen_spec_triples import spec_triples_path
    from openie_spark.functions.hashing import xxh64
    from openie_spark.spec.linking_oracle import oracle_links

    t = pq.read_table(
        spec_triples_path(sf_dir), columns=["subj_norm", "arg_norm"]
    ).to_pylist()
    mentions = [r["subj_norm"] for r in t] + [
        r["arg_norm"] for r in t if r["arg_norm"] != ""
    ]
    links = oracle_links(mentions, alias_rows())
    rows = []
    for m in sorted(links):
        eid, method = links[m]
        if eid is None:  # minted: Spark xxhash64(mention_norm), seed 42
            eid = xxh64(m.encode("utf-8"))
        rows.append({"mention_norm": m, "entity_id": eid, "method": method})
    return rows


def entity_links_path(sf_dir: str) -> str:
    from openie_spark.spec import rules

    # content-fingerprint the external input (dedup/ANN twin discipline)
    fp = store.file_fingerprint(Path(sf_dir) / "documents.parquet")
    name = f"linking_twin_{rules.RULESET_VERSION}_v1_{Path(sf_dir).name}_{fp}"
    return store.ensure(
        name,
        lambda p: store.write_rows(entity_link_rows(sf_dir), LINKS_PA, p),
    )
