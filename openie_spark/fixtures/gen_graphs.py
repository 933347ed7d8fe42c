"""sameas_edges fixtures for connected-components tests (FIXTURES.md §5).

Three deterministic shapes with known components:
  (a) chain of 1000 nodes — worst case for star-round count,
  (b) 50 disjoint cliques of 20,
  (c) star of 10k leaves + 5 isolated nodes (isolated = self-loop rows so
      they appear in the vertex universe).

Expected representative = min(component).
"""

from __future__ import annotations


def chain(n: int = 1000, base: int = 0) -> tuple[list[tuple[int, int]], dict[int, int]]:
    edges = [(base + i, base + i + 1) for i in range(n - 1)]
    expected = {base + i: base for i in range(n)}
    return edges, expected


def cliques(k: int = 50, size: int = 20, base: int = 100_000):
    edges, expected = [], {}
    for c in range(k):
        nodes = [base + c * size + i for i in range(size)]
        edges.extend((nodes[i], nodes[j]) for i in range(size) for j in range(i + 1, size))
        for v in nodes:
            expected[v] = nodes[0]
    return edges, expected


def star(leaves: int = 10_000, base: int = 1_000_000, isolated: int = 5):
    hub = base
    edges = [(hub, base + 1 + i) for i in range(leaves)]
    expected = {hub: hub}
    expected.update({base + 1 + i: hub for i in range(leaves)})
    iso_base = base + leaves + 10
    edges.extend((iso_base + i, iso_base + i) for i in range(isolated))  # self-loops
    expected.update({iso_base + i: iso_base + i for i in range(isolated)})
    return edges, expected


def all_graphs():
    e1, x1 = chain()
    e2, x2 = cliques()
    e3, x3 = star()
    return e1 + e2 + e3, {**x1, **x2, **x3}
