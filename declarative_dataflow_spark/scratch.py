"""Scratch-materialization router: one switch between executor-local
and cluster-reliable lineage truncation.

Every operator in this package truncates lineage on scratch tables
(shingle sets, fixpoint rounds, both sides of self-joins) via
``DataFrame.localCheckpoint`` — the right default locally AND the
right mechanics generally: blocks are reaped by the ContextCleaner as
soon as the caller drops the result, where a ``persist()`` holds a
strong CacheManager reference a lazy operator can never unpersist
(the r7 marathon leak). But localCheckpoint blocks are EXECUTOR-LOCAL
and unreplicated: on a real cluster, losing one executor kills every
job whose truncated lineage lived there instead of recomputing
(documented trade, operators/dedup.py). A 1000-executor deployment
that wants recompute-on-loss sets::

    spark.conf.set("spark.declarativeDataflow.reliableScratch", "true")
    # optional; defaults to a temp dir locally — point it at the
    # cluster FS (HDFS/S3) in a real deployment:
    spark.conf.set("spark.declarativeDataflow.scratchDir", "hdfs://...")

and every scratch materialization in the package routes through
RELIABLE ``DataFrame.checkpoint`` (written to the checkpoint dir,
re-readable after executor loss) instead. Default is off — behavior
is bit-identical to stock localCheckpoint.

DISK-GROWTH TRADE (reliable mode): Spark never deletes reliable
checkpoint files on its own — the ContextCleaner only reaps them when
``spark.cleaner.referenceTracking.cleanCheckpoints=true`` was set at
SparkContext CREATION time (it is a static conf; it cannot be flipped
mid-session, so :func:`ensure_checkpoint_dir` can only verify it, not
set it). With ~170 scratch sites per workload, a long-running flagged
session without that conf grows the checkpoint dir without bound —
the exact leak class the localCheckpoint default was chosen to avoid.
A deployment that flips ``reliableScratch`` on MUST either start the
context with the cleaner conf::

    SparkSession.builder.config(
        "spark.cleaner.referenceTracking.cleanCheckpoints", "true")

or reap the scratchDir externally (ttl'd bucket / cron). In local
mode :func:`ensure_checkpoint_dir` emits a one-time warning when the
flag is on and the cleaner conf is not.

Scope note: because the router is a process-wide class-attribute
patch, a session that sets ``reliableScratch=true`` also reroutes the
USER'S OWN ``df.localCheckpoint()`` calls in that session to reliable
checkpoints (same storage-level caveat as below). That is usually
what a cluster deployment wants — all lineage truncation survives
executor loss — but it is a behavior change beyond this package's
operators; flip the flag per operator block if user scratch should
stay executor-local.

Mechanism: the package has ~170 scratch sites; rather than threading
a flag through every operator signature, :func:`install` (called once
at package import) replaces ``DataFrame.localCheckpoint`` with a
router that reads the session conf PER CALL — so the flag can be
flipped per session, mid-session, or per operator block, and code
that never sets it sees the stock method's exact semantics (the
original bound method handles the default path). The patch is
process-wide by construction (it is a class attribute), which is the
deliberate trade for zero signature churn; it is idempotent and keeps
a handle to the original for tests.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame

RELIABLE_FLAG = "spark.declarativeDataflow.reliableScratch"
SCRATCH_DIR = "spark.declarativeDataflow.scratchDir"

# The stock method, kept for the default path and for tests.
_stock_local_checkpoint = None


def reliable_scratch_enabled(spark) -> bool:
    """True iff this session opted into reliable scratch checkpoints."""

    try:
        return str(spark.conf.get(RELIABLE_FLAG, "false")).lower() == "true"
    except Exception:
        return False


_cleaner_warned = False


def _warn_if_no_cleaner(sc) -> None:
    """One-time warning when reliable scratch will leak checkpoint
    files: spark.cleaner.referenceTracking.cleanCheckpoints is a
    STATIC conf (read at context creation — cannot be set here), so
    the best the router can do at runtime is tell the operator the
    dir will grow without bound until it is reaped externally."""

    global _cleaner_warned
    if _cleaner_warned:
        return
    _cleaner_warned = True
    try:
        clean = sc.getConf().get(
            "spark.cleaner.referenceTracking.cleanCheckpoints", "false"
        )
    except Exception:
        return
    if str(clean).lower() != "true":
        import warnings

        warnings.warn(
            "reliableScratch is on but spark.cleaner.referenceTracking"
            ".cleanCheckpoints was not set at context creation: Spark "
            "will never delete reliable checkpoint files, so the "
            "checkpoint dir grows without bound in long sessions. Set "
            "the conf on the builder or reap the scratchDir externally "
            "(see declarative_dataflow_spark.scratch docstring).",
            stacklevel=3,
        )


def ensure_checkpoint_dir(spark) -> str:
    """Make sure the SparkContext has a checkpoint dir; returns it.
    Order: an already-set context dir wins (the deployment's choice),
    then the ``scratchDir`` conf, then a temp dir keyed by application
    id (local-mode convenience — a cluster MUST point scratchDir or
    setCheckpointDir at a shared FS for the reliability to be real)."""

    sc = spark.sparkContext
    _warn_if_no_cleaner(sc)
    current = sc.getCheckpointDir()
    if current:
        return current
    configured = None
    try:
        configured = spark.conf.get(SCRATCH_DIR, None)
    except Exception:
        configured = None
    d = configured or os.path.join(
        tempfile.gettempdir(), f"ddf_scratch_{sc.applicationId}"
    )
    sc.setCheckpointDir(d)
    return d


def install() -> None:
    """Install the scratch router onto DataFrame.localCheckpoint.
    Idempotent; called at package import (declarative_dataflow_spark
    and .session both import this module).

    Spark 4 note: ``pyspark.sql.DataFrame`` is the ABSTRACT parent —
    classic-mode instances are ``pyspark.sql.classic.dataframe.
    DataFrame``, whose own ``localCheckpoint`` would shadow a patch on
    the base class (verified: a base-class patch never routes). The
    router therefore lands on the concrete classic class, falling back
    to the base for older/newer layouts."""

    global _stock_local_checkpoint
    if _stock_local_checkpoint is not None:
        return
    target = DataFrame
    try:
        from pyspark.sql.classic.dataframe import (  # type: ignore
            DataFrame as _ClassicDataFrame,
        )

        if "localCheckpoint" in vars(_ClassicDataFrame):
            target = _ClassicDataFrame
    except ImportError:
        pass
    _stock_local_checkpoint = target.localCheckpoint

    def _routed_local_checkpoint(self, eager: bool = True, storageLevel=None):
        spark = self.sparkSession
        if reliable_scratch_enabled(spark):
            # reliable checkpoint has no storage-level knob (blocks go
            # to the checkpoint dir, not the block manager) — the
            # caller's preference is moot on this path by construction.
            ensure_checkpoint_dir(spark)
            return self.checkpoint(eager=eager)
        if storageLevel is not None:
            return _stock_local_checkpoint(
                self, eager=eager, storageLevel=storageLevel
            )
        return _stock_local_checkpoint(self, eager=eager)

    _routed_local_checkpoint.__doc__ = (
        "Scratch router (declarative_dataflow_spark.scratch): stock "
        "localCheckpoint unless the session sets "
        f"{RELIABLE_FLAG}=true, in which case a RELIABLE checkpoint "
        "to the checkpoint dir (cluster-FS recompute-on-loss). See "
        "the module docstring."
    )
    _routed_local_checkpoint.__name__ = "localCheckpoint"
    target.localCheckpoint = _routed_local_checkpoint


install()
