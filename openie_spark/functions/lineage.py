"""Lineage-truncation seam (SURVEY.md §4.2-E, fault-tolerance caveat).

``localCheckpoint`` truncates lineage into executor-local, NON-replicated
blocks: the recompute-avoidance is free in this single-JVM sandbox, but on a
real multi-executor cluster a single lost executor makes every downstream
stage unrecoverable.  All pipeline lineage cuts go through this seam,
configured by ``spark.openie.lineageCut``:

  - ``local`` (default): ``localCheckpoint`` — fastest; sandbox/dev, and
    clusters where rerunning the stage is an acceptable recovery story;
  - ``reliable``: ``checkpoint`` to the replicated checkpoint directory
    (``spark.openie.checkpointDir`` must point at shared storage) — a lost
    executor costs nothing; the right setting at the 1000-executor posture;
  - ``none``: no cut at all.  ONLY for straight-line debugging: the
    iterative stages (connected components) grow their logical plan every
    round without a cut, and plain ``persist`` has the same flaw (it caches
    data but does NOT truncate the plan — a persist-based mode hung the CC
    loop in testing, which is why it does not exist here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

CONF_KEY = "spark.openie.lineageCut"
CKPT_DIR_KEY = "spark.openie.checkpointDir"


def cut_lineage(df: DataFrame, eager: bool = False) -> DataFrame:
    """Truncate a stage-boundary lineage per the session conf."""
    spark = df.sparkSession
    try:
        mode = spark.conf.get(CONF_KEY, "local")
    except Exception:
        mode = "local"
    if mode == "none":
        return df
    if mode == "reliable":
        sc = spark.sparkContext
        if not sc._jsc.sc().getCheckpointDir().isDefined():
            try:
                ckdir = spark.conf.get(CKPT_DIR_KEY, "")
            except Exception:
                ckdir = ""
            if not ckdir:
                raise RuntimeError(
                    f"{CONF_KEY}=reliable requires {CKPT_DIR_KEY} (a shared "
                    "checkpoint directory) or a prior setCheckpointDir call"
                )
            sc.setCheckpointDir(ckdir)
        # Reliable checkpoints have Spark's classic double-computation: the
        # checkpoint write is a SECOND job that recomputes the RDD from
        # scratch unless it is cached.  Persist around an eager checkpoint
        # (the cache is dropped as soon as the checkpoint files exist), and
        # force eager — a lazy reliable cut would recompute at first action
        # AND at checkpoint time, doubling per-round work in exactly the
        # multi-executor posture this mode targets.
        df = df.persist()
        try:
            out = df.checkpoint(eager=True)
        finally:
            df.unpersist()
        return out
    return df.localCheckpoint(eager=eager)
