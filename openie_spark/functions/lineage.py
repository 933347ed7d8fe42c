"""Lineage-truncation seam (SURVEY.md §4.2-E, fault-tolerance caveat).

``localCheckpoint`` truncates lineage into executor-local, NON-replicated
blocks: the recompute-avoidance is free in this single-JVM sandbox, but on a
real multi-executor cluster a single lost executor makes every downstream
stage unrecoverable.  All pipeline lineage cuts therefore go through this
seam, configured by ``spark.openie.lineageCut``:

  - ``local``   (default): ``localCheckpoint`` — fastest, sandbox/dev and
    clusters where task retry is an acceptable recovery story;
  - ``persist``: ``persist(MEMORY_AND_DISK)`` — keeps the lineage graph, so
    a lost block is recomputed from source instead of killing the job; the
    right setting at the 1000-executor posture;
  - ``none``: no cut at all (debugging; iterative plans will re-analyze).

Reliable ``checkpoint()`` (HDFS-replicated) is deliberately not offered
here: it needs ``setCheckpointDir`` on shared storage and doubles the write
volume — clusters that want it should persist + write the stage table via
the catalog instead (the pipeline already materializes every stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

CONF_KEY = "spark.openie.lineageCut"


def cut_lineage(df: DataFrame, eager: bool = False) -> DataFrame:
    """Truncate (or checkpoint-tag) a stage boundary per the session conf."""
    try:
        mode = df.sparkSession.conf.get(CONF_KEY, "local")
    except Exception:
        mode = "local"
    if mode == "none":
        return df
    if mode == "persist":
        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        if eager:
            out.count()
        return out
    return df.localCheckpoint(eager=eager)
