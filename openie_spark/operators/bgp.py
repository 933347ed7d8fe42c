"""SPARQL-style basic-graph-pattern (BGP) matching over the constructed KG
— the query side of the construct → link → canonicalize → materialize loop
(public semantics: SPARQL 1.1 BGP evaluation, W3C REC; no reference code
exists — the mount is empty, see SURVEY.md §0).

A pattern is a (subject, predicate, object) triple whose terms are either
variables (strings starting with ``?``) or constants (``int`` entity ids
for subject/object, a ``str`` predicate name).  Matching is the natural
join of the patterns on their shared variables; the result is the set of
DISTINCT bindings of the selected variables (i.e. ``SELECT DISTINCT`` in
SPARQL terms — set semantics makes the operator exactly reproducible in
any engine, which the DuckDB twin below exploits).

Supported shapes (all tested):
  - constant predicates (pushed to the scan as an equality filter);
  - variable predicates (``?p`` binds the pred column);
  - repeated variables WITHIN one pattern (``?x knows ?x`` → head = tail
    filter before the join);
  - repeated variables ACROSS patterns (the join keys);
  - cycle constraints (a variable closing back over several patterns —
    the case a single flat join query cannot express without aliasing);
  - disconnected pattern groups (cartesian of the groups; documented,
    not recommended at scale).

Scale shape (100 TB posture).  Each pattern is one scan of the edge
table with its constant terms pushed down (pred/head/tail equality
filters reach the parquet scan), then binary hash equi-joins on the
shared-variable keys, left-to-right in caller order.  Catalyst + AQE
handle the physical strategy: selective patterns (constant pred on a
small relation) become broadcast sides, and AQE's skew-join splitting
covers hub entities on the join keys.  Callers order patterns so each
one shares a variable with the prefix (the classic greedy BGP join
ordering); a worst-case-optimal multiway join (Leapfrog Triejoin) is
deliberately out of scope — on Spark the binary-join + AQE formulation
is the idiomatic and measured-adequate plan for star/cycle patterns.

One-home rule: ``KG_BGP_PATTERNS`` / ``KG_BGP_SELECT`` drive BOTH the
registry's Spark query (`q_kg_bgp`) and its DuckDB oracle
(``bgp_sql``-generated) — change them only here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Term = "str | int"
TriplePattern = "tuple[Term, Term, Term]"

# pattern order is (subject, predicate, object); edge columns are named
# (pred, head, tail) — this maps between the two.
_COLS = ("head", "pred", "tail")


def _is_var(term) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _vname(term: str) -> str:
    return term[1:]


def match_bgp(
    edges: DataFrame,
    patterns: "list[TriplePattern]",
    select: "list[str] | None" = None,
) -> DataFrame:
    """edges(pred, head, tail) × triple patterns → DISTINCT bindings of
    the selected variables (one output column per variable, named without
    the ``?``).  ``select`` defaults to every variable in first-appearance
    order.  See module docstring for semantics and plan shape."""
    result = None
    seen: list[str] = []
    for pat in patterns:
        if len(pat) != 3:
            raise ValueError(f"pattern must be a (s, p, o) triple: {pat!r}")
        df = edges.select("pred", "head", "tail")
        bound: dict[str, str] = {}  # var -> source column in THIS pattern
        for term, col in zip(pat, _COLS):
            if _is_var(term):
                v = _vname(term)
                if v in bound:  # repeated variable inside one pattern
                    df = df.where(F.col(col) == F.col(bound[v]))
                else:
                    bound[v] = col
            elif col == "pred":
                df = df.where(F.col("pred") == term)
            else:
                df = df.where(F.col(col) == int(term))
        frame = df.select(*[F.col(c).alias(v) for v, c in bound.items()])
        for v in bound:
            if v not in seen:
                seen.append(v)
        if result is None:
            result = frame
        else:
            shared = [v for v in frame.columns if v in result.columns]
            result = (
                result.join(frame, on=shared, how="inner")
                if shared
                else result.crossJoin(frame)
            )
    if not seen:
        raise ValueError("BGP needs at least one variable")
    out = [_vname(v) if _is_var(v) else v for v in (select or seen)]
    return result.select(*out).distinct()


def bgp_sql(
    edges_sql: str,
    patterns: "list[TriplePattern]",
    select: "list[str] | None" = None,
) -> str:
    """DuckDB twin of ``match_bgp`` — generated from the SAME pattern
    list, so the two sides cannot fork.  Later occurrences of a variable
    equate to its FIRST reference (the same equi-join `match_bgp`'s
    ``join(on=shared)`` performs; all columns are null-free so inner-join
    and WHERE-equality semantics coincide)."""
    refs: dict[str, str] = {}
    seen: list[str] = []
    conds: list[str] = []
    for i, pat in enumerate(patterns):
        if len(pat) != 3:
            raise ValueError(f"pattern must be a (s, p, o) triple: {pat!r}")
        for term, col in zip(pat, _COLS):
            ref = f"t{i}.{col}"
            if _is_var(term):
                v = _vname(term)
                if v in refs:
                    conds.append(f"{ref} = {refs[v]}")
                else:
                    refs[v] = ref
                    seen.append(v)
            elif col == "pred":
                conds.append("{} = '{}'".format(ref, term.replace("'", "''")))
            else:
                conds.append(f"{ref} = {int(term)}")
    if not seen:
        raise ValueError("BGP needs at least one variable")
    out = [_vname(v) if _is_var(v) else v for v in (select or seen)]
    sel = ", ".join(f"{refs[v]} AS {v}" for v in out)
    froms = ", ".join(f"({edges_sql}) t{i}" for i in range(len(patterns)))
    where = " AND ".join(conds) if conds else "TRUE"
    return f"SELECT DISTINCT {sel} FROM {froms} WHERE {where}"


# ---------------------------------------------------------------------------
# Headline BGP over the star KG (one home — registry Spark + SQL sides both
# read these): orders shipped by a supplier located in the SAME nation the
# ordering customer is based in.  The ?n cycle closing over four patterns
# is exactly what a flat single-pass join query cannot express without
# re-aliasing the edge table per pattern — i.e. a real BGP.
# ---------------------------------------------------------------------------

KG_BGP_PATTERNS = [
    ("?o", "placed_by", "?c"),
    ("?c", "based_in", "?n"),
    ("?o", "ships_from", "?s"),
    ("?s", "located_in", "?n"),
]
KG_BGP_SELECT = ["?n", "?o", "?c", "?s"]
