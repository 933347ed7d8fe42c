"""docs_interleaved — derive the input_hint-shaped table from the driver's
flat `documents` parquet (FIXTURES.md §2).  Pure pyarrow (no Spark) so the
oracle and the pipeline consume byte-identical inputs.

Derivation (deterministic): doc_id = str(documents.doc_id); text chunked and
media-interleaved by `interleave_spans` keyed on the integer doc_id.  For
bench scale-up, docs are replicated with suffixed doc_id = f"{orig}-{r}".
"""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq

from openie_spark.fixtures.interleave import interleave_spans


def docs_interleaved(sf_dir: str, replicate: int = 1) -> list[dict]:
    table = pq.read_table(Path(sf_dir) / "documents.parquet", columns=["doc_id", "text"])
    docs: list[dict] = []
    for rec in table.to_pylist():
        k = int(rec["doc_id"])
        base_id = str(rec["doc_id"])
        text = rec["text"] or ""
        if replicate == 1:
            docs.append({"doc_id": base_id, "spans": interleave_spans(k, base_id, text)})
        else:
            for r in range(replicate):
                did = f"{base_id}-{r}"
                docs.append({"doc_id": did, "spans": interleave_spans(k + r, did, text)})
    return docs
