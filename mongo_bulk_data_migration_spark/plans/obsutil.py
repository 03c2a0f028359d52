"""Narrow, auditable reads of :class:`pyspark.sql.Observation` metrics.

An ``Observation`` attached to a branch that AQE's empty-relation propagation
eliminates never gets filled: the JVM-side row stays empty and
``PythonSQLUtils.toPyRow`` fails its ``assert`` (probed on pyspark 4.1.2 —
``Py4JJavaError`` wrapping ``java.lang.AssertionError`` raised from
``toPyRow``).  That ONE condition is a legitimate "the branch produced no
rows" signal; every other failure (interrupted job, commit error surfacing
through the read path) must propagate instead of silently reading as zero
(ADVICE r2: a failed WAL append must not look like a clean no-op).
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import Observation


def observed(obs: Observation, default: Mapping[str, Any] | None = None) -> dict[str, Any]:
    """Return ``obs.get``, or ``default`` ONLY for the eliminated-node case."""
    try:
        return obs.get
    except Exception as e:  # narrow by signature, not by blanket swallow
        if _is_unfilled(e):
            return dict(default or {})
        raise


def _is_unfilled(e: Exception) -> bool:
    try:
        from py4j.protocol import Py4JJavaError
    except ImportError:  # pragma: no cover - py4j always ships with pyspark
        return False
    if not isinstance(e, Py4JJavaError):
        return False
    msg = str(e)
    return "toPyRow" in msg and "AssertionError" in msg
