"""sameas_edges fixtures for connected-components tests (FIXTURES.md §5).

Three deterministic shapes with known components:
  (a) chain of 1000 nodes — worst case for star-round count,
  (b) 50 disjoint cliques of 20,
  (c) star of 10k leaves + 5 isolated nodes (isolated = self-loop rows so
      they appear in the vertex universe).

Expected representative = min(component).

The module constants below are the SINGLE source of truth for the graph
shapes: the Python generators AND the DuckDB oracle SQL (``edges_sql`` →
registry ``connected_components`` oracle) are both derived from them, so
changing a shape cannot desynchronize operator and oracle (the lang_id
lockstep pattern, registry.py).
"""

from __future__ import annotations

CHAIN_N = 1000
CHAIN_BASE = 0
CLIQUES_K = 50
CLIQUE_SIZE = 20
CLIQUES_BASE = 100_000
STAR_LEAVES = 10_000
STAR_BASE = 1_000_000
STAR_ISOLATED = 5
STAR_ISO_BASE = STAR_BASE + STAR_LEAVES + 10


def chain(n: int = CHAIN_N, base: int = CHAIN_BASE) -> tuple[list[tuple[int, int]], dict[int, int]]:
    edges = [(base + i, base + i + 1) for i in range(n - 1)]
    expected = {base + i: base for i in range(n)}
    return edges, expected


def cliques(k: int = CLIQUES_K, size: int = CLIQUE_SIZE, base: int = CLIQUES_BASE):
    edges, expected = [], {}
    for c in range(k):
        nodes = [base + c * size + i for i in range(size)]
        edges.extend((nodes[i], nodes[j]) for i in range(size) for j in range(i + 1, size))
        for v in nodes:
            expected[v] = nodes[0]
    return edges, expected


def star(leaves: int = STAR_LEAVES, base: int = STAR_BASE, isolated: int = STAR_ISOLATED):
    hub = base
    edges = [(hub, base + 1 + i) for i in range(leaves)]
    expected = {hub: hub}
    expected.update({base + 1 + i: hub for i in range(leaves)})
    iso_base = STAR_ISO_BASE if base == STAR_BASE and leaves == STAR_LEAVES else base + leaves + 10
    edges.extend((iso_base + i, iso_base + i) for i in range(isolated))  # self-loops
    expected.update({iso_base + i: iso_base + i for i in range(isolated)})
    return edges, expected


GRID_H = 30
GRID_W = 30
GRID_BASE = 2_000_000


def grid(h: int = GRID_H, w: int = GRID_W, base: int = GRID_BASE) -> list[tuple[int, int]]:
    """h×w lattice (right + down edges).  Node (r,c) ↦ base + r*w + c.
    Rich common-neighbor structure for link prediction: diagonal pairs
    share exactly 2 neighbors, straight distance-2 pairs exactly 1."""
    edges = []
    for r in range(h):
        for c in range(w):
            i = base + r * w + c
            if c < w - 1:
                edges.append((i, i + 1))
            if r < h - 1:
                edges.append((i, i + w))
    return edges


def all_graphs():
    e1, x1 = chain()
    e2, x2 = cliques()
    e3, x3 = star()
    return e1 + e2 + e3, {**x1, **x2, **x3}


# ---------------------------------------------------------------------------
# Directed fixture for strongly-connected components (operators/scc.py).
# Same single-source-of-truth discipline: the constants below drive BOTH
# ``digraph()`` (Python edge list) and ``digraph_sql()`` (DuckDB CTE body),
# so operator input and oracle input cannot desynchronize.  Shapes chosen so
# every SCC regime appears: pure directed cycles (one SCC each), an
# ascending chain (all singletons — exercises multi-round root extraction
# under hash priorities), a doubly-linked path (one SCC that is NOT a simple
# cycle), a non-invertible functional graph i -> (A*i+B) mod N (rho shapes:
# cycle SCCs fed by singleton tails), two cycles joined by a ONE-WAY bridge
# (must stay two SCCs), and self-loop isolated markers (singletons).
# Tuned so the coloring operator converges in 3 outer rounds / ~39 inner
# fixpoint iterations (prototype-measured) — iteration count is test cost.

DCYC_K = 20          # disjoint directed cycles
DCYC_LEN = 8
DCYC_BASE = 3_000_000
DCHAIN_N = 12        # ascending chain (singleton SCCs)
DCHAIN_BASE = 3_010_000
DBIPATH_N = 8        # i <-> i+1 doubly-linked path (one SCC)
DBIPATH_BASE = 3_020_000
DFUN_N = 60          # functional graph i -> (A*i+B) mod N, gcd(A,N)>1
DFUN_A = 5
DFUN_B = 7
DFUN_BASE = 3_030_000
DBRIDGE_LEN = 8      # two cycles + one-way bridge edge
DBRIDGE_BASE = 3_040_000
DBRIDGE_OFF = 100    # second cycle starts at DBRIDGE_BASE + DBRIDGE_OFF
DBRIDGE_SRC_I = 3    # bridge: (BASE+3) -> (BASE+OFF+5)
DBRIDGE_DST_I = 5
DISO_N = 5           # self-loop isolated markers
DISO_BASE = 3_050_000


def digraph() -> list[tuple[int, int]]:
    """Directed edge list for the SCC fixture (see constants above)."""
    edges: list[tuple[int, int]] = []
    for c in range(DCYC_K):
        for i in range(DCYC_LEN):
            edges.append(
                (DCYC_BASE + c * DCYC_LEN + i, DCYC_BASE + c * DCYC_LEN + (i + 1) % DCYC_LEN)
            )
    for i in range(DCHAIN_N - 1):
        edges.append((DCHAIN_BASE + i, DCHAIN_BASE + i + 1))
    for i in range(DBIPATH_N - 1):
        edges.append((DBIPATH_BASE + i, DBIPATH_BASE + i + 1))
        edges.append((DBIPATH_BASE + i + 1, DBIPATH_BASE + i))
    for i in range(DFUN_N):
        edges.append((DFUN_BASE + i, DFUN_BASE + (DFUN_A * i + DFUN_B) % DFUN_N))
    for i in range(DBRIDGE_LEN):
        edges.append((DBRIDGE_BASE + i, DBRIDGE_BASE + (i + 1) % DBRIDGE_LEN))
        edges.append(
            (
                DBRIDGE_BASE + DBRIDGE_OFF + i,
                DBRIDGE_BASE + DBRIDGE_OFF + (i + 1) % DBRIDGE_LEN,
            )
        )
    edges.append(
        (DBRIDGE_BASE + DBRIDGE_SRC_I, DBRIDGE_BASE + DBRIDGE_OFF + DBRIDGE_DST_I)
    )
    for i in range(DISO_N):
        edges.append((DISO_BASE + i, DISO_BASE + i))
    return edges


def digraph_sql() -> str:
    """DuckDB SQL producing EXACTLY the ``digraph()`` edge list (CTE body),
    generated from the same shape constants."""
    return f"""
  SELECT {DCYC_BASE} + c * {DCYC_LEN} + i AS src,
         {DCYC_BASE} + c * {DCYC_LEN} + (i + 1) % {DCYC_LEN} AS dst
  FROM range(0, {DCYC_K}) tc(c), range(0, {DCYC_LEN}) ti(i)
  UNION ALL
  SELECT {DCHAIN_BASE} + i AS src, {DCHAIN_BASE} + i + 1 AS dst
  FROM range(0, {DCHAIN_N - 1}) t(i)
  UNION ALL
  SELECT {DBIPATH_BASE} + i AS src, {DBIPATH_BASE} + i + 1 AS dst
  FROM range(0, {DBIPATH_N - 1}) t(i)
  UNION ALL
  SELECT {DBIPATH_BASE} + i + 1 AS src, {DBIPATH_BASE} + i AS dst
  FROM range(0, {DBIPATH_N - 1}) t(i)
  UNION ALL
  SELECT {DFUN_BASE} + i AS src,
         {DFUN_BASE} + ({DFUN_A} * i + {DFUN_B}) % {DFUN_N} AS dst
  FROM range(0, {DFUN_N}) t(i)
  UNION ALL
  SELECT {DBRIDGE_BASE} + i AS src,
         {DBRIDGE_BASE} + (i + 1) % {DBRIDGE_LEN} AS dst
  FROM range(0, {DBRIDGE_LEN}) t(i)
  UNION ALL
  SELECT {DBRIDGE_BASE} + {DBRIDGE_OFF} + i AS src,
         {DBRIDGE_BASE} + {DBRIDGE_OFF} + (i + 1) % {DBRIDGE_LEN} AS dst
  FROM range(0, {DBRIDGE_LEN}) t(i)
  UNION ALL
  SELECT {DBRIDGE_BASE + DBRIDGE_SRC_I} AS src,
         {DBRIDGE_BASE + DBRIDGE_OFF + DBRIDGE_DST_I} AS dst
  UNION ALL
  SELECT {DISO_BASE} + i AS src, {DISO_BASE} + i AS dst
  FROM range(0, {DISO_N}) t(i)
"""


def linkpred_graphs() -> list[tuple[int, int]]:
    """Edge list for the link-prediction fixture: the CC shapes (chain
    contributes distance-2 pairs, cliques contribute none — fully adjacent,
    star exercises the hub-degree cap) plus the lattice."""
    e, _ = all_graphs()
    return e + grid()


def edges_sql() -> str:
    """DuckDB SQL producing EXACTLY the ``all_graphs()`` edge list (as a
    CTE body), generated from the same shape constants."""
    return f"""
  SELECT i AS src, i + 1 AS dst
  FROM range({CHAIN_BASE}, {CHAIN_BASE + CHAIN_N - 1}) t(i)
  UNION ALL
  SELECT {CLIQUES_BASE} + c * {CLIQUE_SIZE} + i AS src,
         {CLIQUES_BASE} + c * {CLIQUE_SIZE} + j AS dst
  FROM range(0, {CLIQUES_K}) tc(c),
       range(0, {CLIQUE_SIZE}) ti(i),
       range(0, {CLIQUE_SIZE}) tj(j)
  WHERE i < j
  UNION ALL
  SELECT {STAR_BASE} AS src, {STAR_BASE} + 1 + i AS dst
  FROM range(0, {STAR_LEAVES}) t(i)
  UNION ALL
  SELECT {STAR_ISO_BASE} + i AS src, {STAR_ISO_BASE} + i AS dst
  FROM range(0, {STAR_ISOLATED}) t(i)
"""


def linkpred_edges_sql() -> str:
    """DuckDB SQL producing EXACTLY the ``linkpred_graphs()`` edge list
    (CTE body) — derived from the same shape constants."""
    return f"""{edges_sql()}
  UNION ALL
  SELECT {GRID_BASE} + r * {GRID_W} + c AS src,
         {GRID_BASE} + r * {GRID_W} + c + 1 AS dst
  FROM range(0, {GRID_H}) tr(r), range(0, {GRID_W - 1}) tc(c)
  UNION ALL
  SELECT {GRID_BASE} + r * {GRID_W} + c AS src,
         {GRID_BASE} + (r + 1) * {GRID_W} + c AS dst
  FROM range(0, {GRID_H - 1}) tr(r), range(0, {GRID_W}) tc(c)
"""
