"""openie_spark — a from-scratch PySpark-native open-information-extraction
and knowledge-graph construction engine.

Capability surface reconstructed from the authoritative description of
krullgit/openIE (BASELINE.json north_star/north_rule; the reference tree at
/root/reference was empty at survey time — see SURVEY.md §0).  Everything here
is an idiomatic Spark design, not a port: DataFrame/Catalyst plans, vectorized
pandas/Arrow UDFs for extraction (never per-row Python), broadcast joins for
dimensions, MinHash-LSH blocking for linking, iterative large-star/small-star
connected components, salted repartitioning + AQE for skew, and a
checkpoint/lineage table for idempotent resume.
"""

__version__ = "0.1.0"

# single source of truth for the ruleset version is the frozen spec —
# re-exported here for convenience, never defined independently
from openie_spark.spec.rules import RULESET_VERSION as RULESET_VERSION  # noqa: E402
