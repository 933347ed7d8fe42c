"""Pure-Python single-process twin of the blocking-quality metrics — the
oracle side for ``blocking_quality``.

Entity-resolution blocking is evaluated by two standard metrics (Christen,
"Data Matching", 2012): pairs completeness (the fraction of truly-matching
pairs the blocker retains — blocking recall) and reduction ratio (the
fraction of the full cross-product the blocker prunes).  The twin replays
the SAME frozen MinHash/LSH scheme (functions/minhash.py) the Spark
blocker uses, plus a brute-force exact-Jaccard pass over the bounded alias
dictionary as ground truth, and emits ONE row of exact integers:

    n_mentions        distinct non-exact mentions entering the LSH blocker
    n_aliases         distinct alias_norm values (the pair-space dimension)
    n_true_pairs      (mention, alias) pairs with exact Jaccard >= threshold
    n_cand_pairs      pairs sharing >= 1 LSH band key
    n_found_pairs     true pairs among the candidates
    pairs_completeness_ppm  n_found * 1e6 // n_true  (1e6 if no true pairs)
    reduction_ratio_ppm     (M*A - n_cand) * 1e6 // (M*A)

Everything is integer arithmetic (ppm via floor division), so the driver
value-hash is exact — no float accumulation anywhere.

Mentions come from the spec-side triples fixture (gen_spec_triples), the
same single-process extraction the entity_links twin uses, so this fixture
is independent of every Spark stage it checks.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from openie_spark.fixtures import store

METRICS_PA = pa.schema(
    [
        pa.field("n_mentions", pa.int64(), nullable=False),
        pa.field("n_aliases", pa.int64(), nullable=False),
        pa.field("n_true_pairs", pa.int64(), nullable=False),
        pa.field("n_cand_pairs", pa.int64(), nullable=False),
        pa.field("n_found_pairs", pa.int64(), nullable=False),
        pa.field("pairs_completeness_ppm", pa.int64(), nullable=False),
        pa.field("reduction_ratio_ppm", pa.int64(), nullable=False),
    ]
)


def blocking_quality_row(sf_dir: str) -> dict:
    from openie_spark.fixtures.entities import alias_rows
    from openie_spark.fixtures.gen_spec_triples import spec_triples_path
    from openie_spark.functions import minhash as mh

    t = pq.read_table(
        spec_triples_path(sf_dir), columns=["subj_norm", "arg_norm"]
    ).to_pylist()
    mentions = set(r["subj_norm"] for r in t) | set(
        r["arg_norm"] for r in t if r["arg_norm"] != ""
    )

    # the blocker's actual input: distinct mentions MINUS exact alias hits
    # (linking.link_mentions routes exact hits around the LSH path)
    exact_aliases = {r["alias_norm"] for r in alias_rows()}
    rest = sorted(mentions - exact_aliases)

    aliases = sorted({r["alias_norm"] for r in alias_rows()})
    a_pre = [(a, set(mh.band_keys_for(a)), mh.shingles(a)) for a in aliases]

    n_true = n_cand = n_found = 0
    for m in rest:
        m_bands = set(mh.band_keys_for(m))
        m_sh = mh.shingles(m)
        for _a, a_bands, a_sh in a_pre:
            cand = bool(m_bands & a_bands)
            true = mh.jaccard(m_sh, a_sh) >= mh.JACCARD_THRESHOLD
            n_cand += cand
            n_true += true
            n_found += cand and true

    n_m, n_a = len(rest), len(aliases)
    space = n_m * n_a
    return {
        "n_mentions": n_m,
        "n_aliases": n_a,
        "n_true_pairs": n_true,
        "n_cand_pairs": n_cand,
        "n_found_pairs": n_found,
        "pairs_completeness_ppm": (
            n_found * 1_000_000 // n_true if n_true else 1_000_000
        ),
        "reduction_ratio_ppm": (
            (space - n_cand) * 1_000_000 // space if space else 1_000_000
        ),
    }


def blocking_quality_path(sf_dir: str) -> str:
    from openie_spark.spec import rules

    fp = store.file_fingerprint(Path(sf_dir) / "documents.parquet")
    name = f"blocking_twin_{rules.RULESET_VERSION}_v1_{Path(sf_dir).name}_{fp}"
    return store.ensure(
        name,
        lambda p: store.write_rows([blocking_quality_row(sf_dir)], METRICS_PA, p),
    )
