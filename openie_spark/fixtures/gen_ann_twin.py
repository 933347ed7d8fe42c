"""Pure-Python single-process twin of the SRP / IVF ANN paths — the
oracle side for ``ann_topk_srp``, ``ann_topk_ivf`` and ``cosine_near_dup``.

Same discipline as the other twins: share ONLY the frozen per-vector
kernels (srp_keys_scalar — the pinned spec the batch kernel is asserted
bit-identical to; the IVF cell assignment; the JVM cosine semantics),
re-execute the blocking (band/cell bucket pairing), candidate dedup,
verify and per-query ranking single-process, and let a DuckDB identity
scan value-hash every row.

Two JVM semantics are mirrored exactly (both probed bit-identical in
tests/unit/test_hashing.py and the parity gate):

  - ``cosine_col`` over array<float>: Spark's ``zip_with(a,b,x*y)``
    multiplies in FLOAT32 and ``aggregate(.., 0.0D, acc+v)`` accumulates
    in double — so the twin computes float32 products widened to double,
    in array order (``_cosine_f32`` below), NOT a numpy float64 dot.
  - IVF seed selection orders by ``(xxhash64(vec_id), vec_id)``:
    functions/hashing.xxh64 over the 8-byte little-endian signed value is
    bit-identical to Spark's xxhash64 on BIGINT.
"""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from openie_spark.fixtures import store

TOPK_PA = pa.schema(
    [
        pa.field("query_id", pa.int64(), nullable=False),
        pa.field("neighbor_id", pa.int64(), nullable=False),
        pa.field("rank", pa.int32(), nullable=False),
        pa.field("cosine", pa.float64(), nullable=False),
    ]
)

NEARDUP_PA = pa.schema(
    [
        pa.field("id_a", pa.int64(), nullable=False),
        pa.field("id_b", pa.int64(), nullable=False),
        pa.field("cosine", pa.float64(), nullable=False),
    ]
)


def _vecs(sf_dir: str) -> list[tuple[int, np.ndarray]]:
    t = pq.read_table(
        Path(sf_dir) / "embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return [
        (int(r["vec_id"]), np.asarray(r["embedding"], dtype=np.float32))
        for r in t.to_pylist()
    ]


def _cosine_f32(a: np.ndarray, b: np.ndarray) -> float:
    """Twin of operators.similarity.cosine_col on array<float> columns:
    float32 elementwise products, double accumulation in array order."""
    dot = 0.0
    for x, y in zip(a, b):
        dot += float(x * y)  # np.float32 * np.float32 -> float32 product
    na = 0.0
    for x in a:
        na += float(x * x)
    nb = 0.0
    for y in b:
        nb += float(y * y)
    return dot / (math.sqrt(na) * math.sqrt(nb))


def _topk_rows(
    queries: list[tuple[int, np.ndarray]],
    cand: dict[int, set[int]],
    by_id: dict[int, np.ndarray],
    k: int,
) -> list[dict]:
    rows = []
    for qid, qv in queries:
        scored = [
            (_cosine_f32(qv, by_id[nid]), nid) for nid in cand.get(qid, ())
        ]
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rank, (cos, nid) in enumerate(scored[:k], start=1):
            rows.append(
                {"query_id": qid, "neighbor_id": nid, "rank": rank, "cosine": cos}
            )
    rows.sort(key=lambda r: (r["query_id"], r["rank"]))
    return rows


def srp_topk_rows(sf_dir: str, k: int = 5) -> list[dict]:
    from openie_spark.operators.similarity import SRP_DIM, srp_keys_scalar

    vecs = _vecs(sf_dir)
    by_id = dict(vecs)
    keys = {
        i: srp_keys_scalar(v)
        for i, v in vecs
        if v is not None and len(v) == SRP_DIM
    }
    buckets: dict[int, list[int]] = {}
    for i, ks in keys.items():
        for kk in ks:
            buckets.setdefault(kk, []).append(i)
    queries = [(i, v) for i, v in vecs if i % 100 == 0]
    cand: dict[int, set[int]] = {}
    for qid, _ in queries:
        s: set[int] = set()
        for kk in keys.get(qid, ()):
            s.update(buckets.get(kk, ()))
        s.discard(qid)
        cand[qid] = s
    return _topk_rows(queries, cand, by_id, k)


def ivf_topk_rows(sf_dir: str, k: int = 5) -> list[dict]:
    from openie_spark.functions.hashing import xxh64
    from openie_spark.operators.similarity import (
        IVF_N_CENTROIDS,
        IVF_NPROBE,
        _ivf_cells_batch,
    )

    vecs = _vecs(sf_dir)
    by_id = dict(vecs)
    # seed centroids: smallest (xxhash64(id), id) — the Spark collect twin
    seed_ids = sorted(
        (xxh64(i.to_bytes(8, "little", signed=True)), i) for i, _ in vecs
    )[:IVF_N_CENTROIDS]
    c = np.asarray(
        [[float(x) for x in by_id[i]] for _, i in seed_ids], dtype=np.float64
    )
    norms = np.linalg.norm(c, axis=1)
    norms[norms == 0] = 1.0
    cmat = c / norms[:, None]
    ids = [i for i, _ in vecs]
    vlist = [v for _, v in vecs]
    probe_cells = _ivf_cells_batch(cmat, vlist, IVF_NPROBE)
    index_cells = _ivf_cells_batch(cmat, vlist, 1)
    cell_members: dict[int, list[int]] = {}
    for i, cells in zip(ids, index_cells):
        if cells:
            cell_members.setdefault(cells[0], []).append(i)
    queries = [(i, v) for i, v in vecs if i % 100 == 0]
    probe_by_id = dict(zip(ids, probe_cells))
    cand: dict[int, set[int]] = {}
    for qid, _ in queries:
        s: set[int] = set()
        for cell in probe_by_id.get(qid, ()):
            s.update(cell_members.get(cell, ()))
        s.discard(qid)
        cand[qid] = s
    return _topk_rows(queries, cand, by_id, k)


def cosine_near_dup_rows(sf_dir: str, threshold: float = 0.95) -> list[dict]:
    from openie_spark.operators.similarity import SRP_DIM, srp_keys_scalar

    vecs = _vecs(sf_dir)
    by_id = dict(vecs)
    buckets: dict[int, list[int]] = {}
    for i, v in vecs:
        if v is None or len(v) != SRP_DIM:
            continue
        for kk in srp_keys_scalar(v):
            buckets.setdefault(kk, []).append(i)
    cand: set[tuple[int, int]] = set()
    for ids in buckets.values():
        if len(ids) > 1:
            ids = sorted(ids)
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    cand.add((ids[x], ids[y]))
    rows = []
    for a, b in sorted(cand):
        cos = _cosine_f32(by_id[a], by_id[b])
        if cos >= threshold:
            rows.append({"id_a": a, "id_b": b, "cosine": cos})
    return rows


def _key(tag: str, sf_dir: str) -> str:
    # content-fingerprinted on the embeddings input (the external,
    # driver-generated table) so a regenerated testdata set self-invalidates
    fp = store.file_fingerprint(Path(sf_dir) / "embeddings.parquet")
    return f"ann_twin_{tag}_v1_{Path(sf_dir).name}_{fp}"


def srp_topk_path(sf_dir: str) -> str:
    return store.ensure(
        _key("srp", sf_dir), lambda p: store.write_rows(srp_topk_rows(sf_dir), TOPK_PA, p)
    )


def ivf_topk_path(sf_dir: str) -> str:
    return store.ensure(
        _key("ivf", sf_dir), lambda p: store.write_rows(ivf_topk_rows(sf_dir), TOPK_PA, p)
    )


def cosine_near_dup_path(sf_dir: str) -> str:
    return store.ensure(
        _key("neardup", sf_dir),
        lambda p: store.write_rows(cosine_near_dup_rows(sf_dir), NEARDUP_PA, p),
    )
