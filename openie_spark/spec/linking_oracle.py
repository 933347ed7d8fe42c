"""Pure-Python linking oracle — the single-process twin of
operators/linking.py (same frozen MinHash/LSH scheme from
functions/minhash.py, same thresholds and tie-breaks).

For minted mentions the oracle asserts only the METHOD: minted ids are
Spark xxhash64 values, which the oracle deliberately does not replicate —
their correctness property is determinism (tested by re-running the pipeline
at different parallelism), not any particular value.
"""

from __future__ import annotations

from openie_spark.functions import minhash as mh


def oracle_links(
    mention_norms: list[str], alias_rows: list[dict]
) -> dict[str, tuple[int | None, str]]:
    by_alias: dict[str, list[dict]] = {}
    for r in alias_rows:
        by_alias.setdefault(r["alias_norm"], []).append(r)

    alias_bands: list[tuple[dict, set[int], list[str]]] = []
    for r in alias_rows:
        sh = mh.shingles(r["alias_norm"])
        alias_bands.append((r, set(mh.band_keys_for(r["alias_norm"])), sh))

    out: dict[str, tuple[int | None, str]] = {}
    for m in sorted(set(mention_norms)):
        # exact path: min entity_id among exact alias hits
        hits = by_alias.get(m)
        if hits:
            out[m] = (min(h["entity_id"] for h in hits), "exact")
            continue
        # LSH path
        m_bands = set(mh.band_keys_for(m))
        m_sh = mh.shingles(m)
        best: tuple[float, int, str] | None = None  # (-jaccard, entity_id, alias)
        for r, a_bands, a_sh in alias_bands:
            if not (m_bands & a_bands):
                continue
            j = mh.jaccard(m_sh, a_sh)
            if j < mh.JACCARD_THRESHOLD:
                continue
            key = (-j, r["entity_id"], r["alias_norm"])
            if best is None or key < best:
                best = key
        if best is not None:
            out[m] = (best[1], "lsh")
        else:
            out[m] = (None, "minted")
    return out
