"""Caller-owned persist-handle protocol.

Operators that ``persist()`` an intermediate (a signature/sketch table
consumed several times by the returned lazy plan) cannot unpersist it
themselves: they return a LAZY DataFrame and never learn when the
caller materializes it.  Unpersisting early would silently recompute
the sketch pipeline once per consumer — the exact cost the persist
exists to avoid.

Protocol: the operator attaches every persisted handle to the returned
DataFrame as ``_tl_persisted`` (a tuple).  The consumer materializes
the result, then calls :func:`unpersist_handles`.  Composite operators
(e.g. :func:`tl_spark.curation.curate`) propagate child handles upward
so one call at the job boundary releases everything —
``run_curation_job`` is the model consumer.

Tests pin the contract: after ``unpersist_handles`` the session's
``getPersistentRDDs()`` map is empty (tests/test_operators.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def attach_handles(out: DataFrame, *cached: DataFrame) -> DataFrame:
    """Attach persisted DataFrames to ``out`` for later unpersisting.

    Appends to (never replaces) any handles ``out`` already carries, so
    composite operators can layer their own caches on top of a child's.
    """
    out._tl_persisted = tuple(getattr(out, "_tl_persisted", ())) + tuple(cached)
    return out


def carried_handles(df: DataFrame) -> tuple[DataFrame, ...]:
    """The persisted handles a DataFrame carries (possibly empty)."""
    return tuple(getattr(df, "_tl_persisted", ()))


def keep_handles(out: DataFrame, *sources: DataFrame) -> DataFrame:
    """Re-attach the handles carried by ``sources`` onto ``out``.

    Handles live in a plain Python attribute, so ANY DataFrame
    transformation (``.select``/``.filter``/``.orderBy``) silently
    drops them — a wrapper that post-processes an operator's output
    MUST call this on its final DataFrame or the caches leak past
    ``unpersist_handles``.
    """
    for src in sources:
        attach_handles(out, *carried_handles(src))
    return out


def unpersist_handles(df: DataFrame) -> None:
    """Release every cache the DataFrame's plan persisted.

    Call AFTER materializing (collect/write); the plan stays valid
    afterwards but re-running it recomputes the sketch pipeline.
    Idempotent: handles are cleared after release.
    """
    for cached in carried_handles(df):
        cached.unpersist()
    df._tl_persisted = ()
