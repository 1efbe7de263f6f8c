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


# --- derived-expression re-inline guard (round-11, VERDICT r10 task 4) ------
#
# Three rounds in a row hit the same Catalyst pessimization class:
# a filter/lambda referencing an EXPENSIVE derived column lets the
# optimizer substitute the producer expression into the consumer
# (CollapseProject / predicate pushdown), so the assembly re-runs per
# predicate -- or, inlined into a higher-order-function lambda, per
# ELEMENT (r8 logreg featurize, r8 hash_embed norm, r10 sem zero-vector
# filter: 61.1s -> 10.2s at 1M from one filter reorder). These walkers
# detect the class on the OPTIMIZED logical plan, where the re-inline
# has already happened, instead of waiting for the wall-clock symptom.

#: Rule A: an expression subtree at least this many nodes big appearing
#: MORE THAN ONCE in one optimized plan is a re-inlined producer (the
#: plan evaluates it that many times per row). Calibrated against every
#: DAG stage plan and the registry: benign duplicates (join keys, small
#: shared arithmetic) stay far below it, the hash_embed assembly that
#: bit rounds 8/10 is hundreds of nodes.
REINLINE_MIN_SIZE = 24

#: Rule B: a subtree at least this big, inside a lambda body, that uses
#: NO variable of any enclosing lambda (loop-invariant) re-runs per
#: ARRAY ELEMENT -- the O(dim^2)-per-row shape of the r8 norm bug.
LAMBDA_INVARIANT_MIN_SIZE = 10


def _seq(jseq):
    it = jseq.iterator()
    while it.hasNext():
        yield it.next()


def _walk_expr(e, scope: frozenset, registry: dict, findings: list) -> tuple:
    """Post-order over one expression tree.

    Returns (size, free_lambda_var_ids, has_attribute_ref). ``scope``
    holds the exprIds of lambda variables bound by ENCLOSING lambdas;
    a subtree whose free lambda vars miss the scope entirely is
    loop-invariant where it sits.
    """
    cls = e.getClass().getSimpleName()
    if cls == "NamedLambdaVariable":
        return 1, frozenset((e.exprId().id(),)), False
    if cls in ("AttributeReference", "BoundReference"):
        return 1, frozenset(), True
    if cls == "LambdaFunction":
        bound = frozenset(
            v.exprId().id() for v in _seq(e.arguments())
        )
        inner = scope | bound
        size, free, has_attr = 1, frozenset(), False
        for c in _seq(e.children()):
            s, f, h = _walk_expr(c, inner, registry, findings)
            size += s
            free |= f
            has_attr = has_attr or h
        return size, free - bound, has_attr
    size, free, has_attr = 1, frozenset(), False
    for c in _seq(e.children()):
        s, f, h = _walk_expr(c, scope, registry, findings)
        size += s
        free |= f
        has_attr = has_attr or h
    if has_attr and size >= LAMBDA_INVARIANT_MIN_SIZE:
        if scope and not (free & scope):
            findings.append(
                ("lambda-invariant", size, e.toString()[:200])
            )
    if has_attr and size >= REINLINE_MIN_SIZE:
        # exprId-sensitive key (the rendered tree carries attr#id):
        # structurally-equal projections over DIFFERENT inputs (union
        # branches) must NOT merge -- only a true re-inline duplicates
        # the same attributes
        registry.setdefault(e.toString(), []).append(size)
    return size, free, has_attr


def derived_reinline_findings(df: DataFrame) -> list[tuple]:
    """Scan ``df``'s optimized logical plan for the derived-expression
    traps; returns [] when clean, else (kind, size/count, rendering)
    tuples. Run on the PRE-materialization stage frame (a checkpointed
    frame's plan is an opaque LogicalRDD with nothing left to scan)."""
    plan = df._jdf.queryExecution().optimizedPlan()
    registry: dict[str, list[int]] = {}
    findings: list[tuple] = []
    seen: set = set()

    def walk_plan(node) -> None:
        # object identity: logical nodes have no id(); cycles impossible
        # but shared cached subplans are fine to skip
        if id(node) in seen:
            return
        seen.add(id(node))
        for e in _seq(node.expressions()):
            _walk_expr(e, frozenset(), registry, findings)
        for c in _seq(node.children()):
            walk_plan(c)
        for sq in _seq(node.subqueries()):
            walk_plan(sq)

    walk_plan(plan)
    # report only the LARGEST duplicated subtree per duplicate family:
    # every sub-subtree of a re-inlined producer duplicates with it
    dup = [
        (rendering, sizes)
        for rendering, sizes in registry.items()
        if len(sizes) > 1
    ]
    if dup:
        rendering, sizes = max(dup, key=lambda kv: kv[1][0])
        findings.append(
            ("re-inlined", f"{len(sizes)}x size {sizes[0]}", rendering[:200])
        )
    return findings


def assert_no_derived_reinline(df: DataFrame, label: str = "") -> None:
    """Raise AssertionError when the plan carries a re-inlined derived
    producer or a loop-invariant lambda subtree (the r8/r10 trap class)."""
    findings = derived_reinline_findings(df)
    assert not findings, f"derived-expression trap in {label}: {findings}"
