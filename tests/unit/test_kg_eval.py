"""KG-completion evaluation (operators/kg_eval.py): equality with a
brute-force pure-Python replay (full candidate ranking materialized),
the filtered-vs-raw ranking distinction, and exact-integer metrics."""

from __future__ import annotations

import hashlib

from openie_spark.operators.kg_eval import (
    HITS_KS,
    MRR_SCALE,
    kg_completion_eval,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _reference(edges: list[tuple[str, int, int]], pct: int) -> dict:
    """Brute-force replay: materialize the full per-relation candidate
    ranking (which the Spark plan deliberately never does) and compute
    filtered ranks + metrics with plain dicts."""
    e = sorted(set(edges))
    by_pred: dict[str, list[tuple[int, int]]] = {}
    for p, h, t in e:
        by_pred.setdefault(p, []).append((h, t))
    out: dict[str, dict] = {}
    for p, pairs in by_pred.items():
        score: dict[int, int] = {}
        for _, t in pairs:
            score[t] = score.get(t, 0) + 1
        ranking = sorted(score, key=lambda t: (-score[t], t))
        pos = {t: i + 1 for i, t in enumerate(ranking)}
        true_tails: dict[int, set[int]] = {}
        for h, t in pairs:
            true_tails.setdefault(h, set()).add(t)
        franks = []
        for h, t in pairs:
            if _h60(f"{p}|{h}|{t}") % 100 >= pct:
                continue
            better_true = sum(
                1 for t2 in true_tails[h] if t2 != t and pos[t2] < pos[t]
            )
            franks.append(pos[t] - better_true)
        if not franks:
            continue
        out[p] = {
            "n_test": len(franks),
            **{f"hits{k}": sum(1 for r in franks if r <= k) for k in HITS_KS},
            "sum_rank": sum(franks),
            "sum_rr_micros": sum(MRR_SCALE // r for r in franks),
        }
        out[p]["mrr_micro"] = out[p]["sum_rr_micros"] // out[p]["n_test"]
    return out


def _collect(df) -> dict:
    return {
        r["pred"]: {k: r[k] for k in r.asDict() if k != "pred"}
        for r in df.collect()
    }


def _graph() -> list[tuple[str, int, int]]:
    # two relations; 'likes' has a popularity gradient (tail 1 in 3 edges,
    # tail 2 in 2, tails 3..5 in 1) plus multi-true heads so the filtered
    # correction is exercised; 'knows' is uniform so ties resolve by id.
    return [
        ("likes", 10, 1),
        ("likes", 11, 1),
        ("likes", 12, 1),
        ("likes", 10, 2),
        ("likes", 13, 2),
        ("likes", 10, 3),
        ("likes", 11, 4),
        ("likes", 12, 5),
        ("knows", 20, 6),
        ("knows", 21, 7),
        ("knows", 22, 8),
    ]


def test_matches_bruteforce_reference(spark):
    edges = _graph()
    df = spark.createDataFrame(edges, "pred string, head bigint, tail bigint")
    got = _collect(kg_completion_eval(df, test_sample_pct=100))
    assert got == _reference(edges, 100)


def test_hash_sampled_subset_matches(spark):
    edges = [
        ("r", h, t) for h in range(50) for t in range(1 + h % 4)
    ]  # enough rows that pct=50 keeps a non-trivial subset
    df = spark.createDataFrame(edges, "pred string, head bigint, tail bigint")
    got = _collect(kg_completion_eval(df, test_sample_pct=50))
    assert got == _reference(edges, 50)


def test_filtered_rank_beats_raw_rank(spark):
    # head 10 holds the top-2 most popular tails of 'likes' AND tail 3:
    # tail 3's raw rank is 3, but both better-ranked candidates are true
    # facts of head 10, so its filtered rank must be 1 (a hit@1).
    edges = _graph()
    df = spark.createDataFrame(edges, "pred string, head bigint, tail bigint")
    ref = _reference(edges, 100)
    # sanity of the fixture itself: every 'likes' test triple of head 10
    # lands filtered-rank 1 (raw ranks 1, 2, 3 minus 0, 1, 2 better-true).
    assert ref["likes"]["hits1"] >= 3
    got = _collect(kg_completion_eval(df, test_sample_pct=100))
    assert got["likes"] == ref["likes"]


def test_ranks_are_positive_and_bounded(spark):
    edges = _graph()
    df = spark.createDataFrame(edges, "pred string, head bigint, tail bigint")
    got = _collect(kg_completion_eval(df, test_sample_pct=100))
    for m in got.values():
        assert m["n_test"] >= 1
        assert m["sum_rank"] >= m["n_test"]  # every rank >= 1
        assert m["hits1"] <= m["hits3"] <= m["hits10"] <= m["n_test"]
        assert 0 < m["mrr_micro"] <= MRR_SCALE


def test_deterministic_across_parallelism(spark):
    edges = _graph() * 3  # duplicates must collapse via distinct edges
    df = spark.createDataFrame(
        sorted(set(edges)), "pred string, head bigint, tail bigint"
    )
    a = _collect(kg_completion_eval(df.repartition(1), test_sample_pct=100))
    b = _collect(kg_completion_eval(df.repartition(16), test_sample_pct=100))
    assert a == b
