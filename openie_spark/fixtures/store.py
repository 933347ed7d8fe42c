"""Fixture materialization: pure-pyarrow parquet writers + a content cache.

Fixtures are generated deterministically (seeded) and cached as parquet under
<repo>/.fixtures (gitignored).  Pyarrow is used directly so the oracle side
never needs a SparkSession; Spark reads the same files with the explicit
DOC_SCHEMA contract.
"""

from __future__ import annotations

import os
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

def _default_fixture_dir() -> Path:
    env = os.environ.get("OPENIE_FIXTURE_DIR")
    if env:
        return Path(env)
    repo_root = Path(__file__).resolve().parents[2]
    # Under ``--py-files`` zipimport __file__ points INSIDE the archive and
    # its parents are not real directories; fixtures are driver-side
    # scratch, so fall back to the working directory (override with
    # OPENIE_FIXTURE_DIR for a shared location).
    if repo_root.is_dir():
        return repo_root / ".fixtures"
    return Path.cwd() / ".fixtures"


FIXTURE_DIR = _default_fixture_dir()

SPAN_PA = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

DOC_PA = pa.schema(
    [pa.field("doc_id", pa.string(), nullable=False), pa.field("spans", pa.list_(SPAN_PA), nullable=False)]
)


def file_fingerprint(path: str | Path) -> str:
    """Short md5 of a file's bytes — cache-key component for fixtures
    derived from EXTERNAL inputs (the driver-generated testdata parquet),
    so a regenerated input self-invalidates the fixture instead of
    silently serving stale rows (the stream_sessions discipline)."""
    import hashlib

    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()[:12]


def docs_to_table(docs: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(
        [{"doc_id": d["doc_id"], "spans": d["spans"]} for d in docs], schema=DOC_PA
    )


def write_docs(docs: list[dict], path: str | Path, row_group_size: int = 4096) -> str:
    # small row groups keep single-file fixtures splittable into parallel
    # scan tasks (one giant row group = one task no matter the core count)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(docs_to_table(docs), path, row_group_size=row_group_size)
    return str(path)


def ensure(name: str, builder) -> str:
    """Build-once cache: returns the parquet path for fixture `name`,
    calling `builder(path)` to materialize it on first use."""
    FIXTURE_DIR.mkdir(parents=True, exist_ok=True)
    path = FIXTURE_DIR / f"{name}.parquet"
    if not path.exists():
        tmp = path.with_suffix(".tmp.parquet")
        builder(tmp)
        tmp.rename(path)
    return str(path)


def write_rows(rows: list[dict], schema: pa.Schema, path: str | Path) -> str:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), path)
    return str(path)
