"""Execution-metrics probe: turn scale CLAIMS into measured numbers.

The repo's plan-shape tests prove a query compiles to the right
operators (broadcast here, no Sort there); this module proves the
runtime BEHAVIOR: after an action executes, every physical node carries
its SQLMetric values (the same numbers the Spark UI shows), and walking
the executed plan sums the ones that matter at 100 TB:

- ``shuffle_bytes`` / ``shuffle_records`` (ShuffleExchange writes) --
  THE scale currency. "Exact dedup shuffles 16-byte digests, never
  text" stops being a docstring and becomes an assertion that shuffle
  bytes are a small fraction of corpus bytes (tests/test_metrics.py).
- ``broadcast_bytes`` (BroadcastExchange dataSize) -- how much actually
  rides to every executor.
- ``spill_bytes`` -- nonzero means a partition outgrew memory; the
  knob-sizing feedback signal.

Works with AQE (descends AdaptiveSparkPlanExec into the final plan and
through query stages) and with the UI disabled -- metrics come from the
plan tree via py4j, no REST endpoint. Reused exchanges are skipped so
shared subplans are not double-counted.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class ExecutionMetrics:
    shuffle_bytes: int
    shuffle_records: int
    shuffle_count: int  # distinct shuffle exchanges that executed
    broadcast_bytes: int
    spill_bytes: int


def _node_metrics(node) -> dict[str, int]:
    out = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        out[kv._1()] = kv._2().value()
    return out


def _walk(node, acc: dict, seen: set) -> None:
    nid = node.id()
    if nid in seen:
        return
    seen.add(nid)
    name = node.getClass().getSimpleName()
    if name == "ReusedExchangeExec":
        return  # mirror of an exchange counted where it executed
    m = _node_metrics(node)
    if name == "ShuffleExchangeExec":
        acc["shuffle_bytes"] += int(m.get("shuffleBytesWritten", 0))
        acc["shuffle_records"] += int(m.get("shuffleRecordsWritten", 0))
        acc["shuffle_count"] += 1
    if name == "BroadcastExchangeExec":
        acc["broadcast_bytes"] += int(m.get("dataSize", 0))
    acc["spill_bytes"] += int(m.get("spillSize", 0)) + int(
        m.get("memoryBytesSpilled", 0)
    )
    if name == "AdaptiveSparkPlanExec":
        _walk(node.executedPlan(), acc, seen)
        return
    if name.endswith("QueryStageExec"):
        _walk(node.plan(), acc, seen)
    ch = node.children().iterator()
    while ch.hasNext():
        _walk(ch.next(), acc, seen)
    # subqueries (scalar/IN) execute off the main child chain
    sq = node.subqueries().iterator()
    while sq.hasNext():
        _walk(sq.next(), acc, seen)


def measure(df: DataFrame, action=None) -> tuple[object, ExecutionMetrics]:
    """Run ``action(df)`` (default ``.collect()``) and return its result
    plus the summed execution metrics of the plan that ran.

    The action must execute THIS DataFrame's own queryExecution --
    ``.collect()`` does; ``.count()``/``.write`` build a separate plan
    whose metrics would not land on ``df``'s nodes. Metrics accumulate
    on the plan object: call on a freshly built DataFrame for one
    query's numbers (a re-used plan would carry prior totals).
    """
    result = action(df) if action is not None else df.collect()
    acc = {
        "shuffle_bytes": 0,
        "shuffle_records": 0,
        "shuffle_count": 0,
        "broadcast_bytes": 0,
        "spill_bytes": 0,
    }
    _walk(df._jdf.queryExecution().executedPlan(), acc, set())
    return result, ExecutionMetrics(**acc)
