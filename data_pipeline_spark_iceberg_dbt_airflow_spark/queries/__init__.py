"""Query registry package.

Submodules register named (PySpark, oracle-SQL) pairs on import; call
``all_queries()`` (re-exported here) to get the full inventory.
"""

from __future__ import annotations

from .registry import QuerySpec, all_queries, get, register  # noqa: F401

_LOADED = False


def _load_all() -> None:
    """Import every query module exactly once (registration side effects)."""
    global _LOADED
    if _LOADED:
        return
    _LOADED = True
    from . import (  # noqa: F401, PLC0415
        aggregates,
        analytics,
        dedup,
        joins,
        reference,
        reshape,
        scalars,
        setops,
        similarity,
        sorts,
        streaming_batch,
        subqueries,
        training,
        text,
        udf_surface,
        windows,
    )
