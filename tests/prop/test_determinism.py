"""L3b: identical output under different parallelism (SURVEY.md §5.2).

The whole correctness story (P/R = 1.0 vs the oracle, byte-stable golden
files) requires that partitioning never leaks into results.  This runs the
extraction + linking path at local[1] and local[8] in separate processes
(one JVM cannot host two masters) and compares canonical output hashes."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]

CODE = r"""
import hashlib, sys
from openie_spark.session import get_spark
from openie_spark.fixtures import store
from openie_spark.fixtures.entities import alias_rows
from openie_spark.fixtures.gen_golden import golden_docs
from openie_spark.operators.extract import extract_stage, mentions_from_triples
from openie_spark.operators.linking import link_mentions
from openie_spark.fixtures.entities import ensure_alias_dict
from openie_spark.sources.tables import load_alias_dict, load_docs

master, shuffle = sys.argv[1], int(sys.argv[2])
spark = get_spark(app="det", master=master, shuffle_partitions=shuffle,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
docs_path = store.ensure("golden_docs", lambda p: store.write_docs(golden_docs(), p))
alias_path = ensure_alias_dict()
docs = load_docs(spark, docs_path)
triples = extract_stage(docs)
links = link_mentions(mentions_from_triples(triples), load_alias_dict(spark, alias_path))
h = hashlib.sha256()
for r in sorted(map(repr, triples.collect())):
    h.update(r.encode())
for r in sorted(map(repr, links.collect())):
    h.update(r.encode())
# the temporal joins rely on explicit total orders for tie-breaks — hash
# them across parallelism levels too
from openie_spark.plans.registry import QUERIES
for name in ("events_asof_order", "session_concurrency"):
    for r in sorted(map(repr, QUERIES[name](spark, "/root/testdata/sf0.01").collect())):
        h.update(r.encode())
print("HASH:" + h.hexdigest())
spark.stop()
"""


def _run(master: str, shuffle: int) -> str:
    out = subprocess.run(
        [sys.executable, "-c", CODE, master, str(shuffle)],
        cwd=REPO, capture_output=True, text=True, timeout=600, check=True,
    ).stdout
    for line in out.splitlines():
        if line.startswith("HASH:"):
            return line[5:]
    raise AssertionError(f"no hash in output: {out}")


def test_parallelism_independent_output():
    h1 = _run("local[1]", 1)
    h8 = _run("local[8]", 16)
    assert h1 == h8
