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

    Returns (size, free_lambda_var_ids, has_attribute_ref, shash).
    ``scope`` holds the exprIds of lambda variables bound by ENCLOSING
    lambdas; a subtree whose free lambda vars miss the scope entirely
    is loop-invariant where it sits. ``shash`` is a structural hash
    built in the same pass -- class names composed over child hashes,
    attr leaves contributing their exprId and literal leaves their
    value hashCode -- so duplicate detection is exprId-SENSITIVE
    (structurally-equal projections over DIFFERENT inputs, e.g. union
    branches, must not merge; only a true re-inline duplicates the
    same attributes) WITHOUT rendering every >=24-node subtree to a
    string: the r11 review measured the old per-subtree toString as
    O(n^2) py4j work on exactly the hundreds-of-node producers this
    guard targets. Renders happen once per REPORTED family.
    """
    cls = e.getClass().getSimpleName()
    if cls == "NamedLambdaVariable":
        vid = e.exprId().id()
        return 1, frozenset((vid,)), False, hash(("lamvar", vid))
    if cls == "AttributeReference":
        return 1, frozenset(), True, hash((cls, e.exprId().id()))
    if cls == "BoundReference":
        return 1, frozenset(), True, hash((cls, e.hashCode()))
    if cls == "Literal":
        return 1, frozenset(), False, hash((cls, e.hashCode()))
    if cls == "LambdaFunction":
        bound = frozenset(
            v.exprId().id() for v in _seq(e.arguments())
        )
        inner = scope | bound
        size, free, has_attr, hs = 1, frozenset(), False, [cls]
        for c in _seq(e.children()):
            s, f, h, ch = _walk_expr(c, inner, registry, findings)
            size += s
            free |= f
            has_attr = has_attr or h
            hs.append(ch)
        return size, free - bound, has_attr, hash(tuple(hs))
    # Parameterized interior nodes (Cast target type, GetStructField
    # ordinal, date-trunc level, ...) carry constructor args that are
    # NOT children, so class-name + child hashes alone can merge
    # distinct same-shape subtrees into a false family (r11 ADVICE).
    # The dataType discriminates the common cases (a Cast differs from
    # its child exactly by type; struct fields differ by field type in
    # practice) for one extra py4j call per node; residual collisions
    # (same-typed distinct params, Python hash collisions) are cleared
    # by the toString confirmation at report time.
    try:
        disc = e.dataType().simpleString()
    except Exception:
        disc = ""
    size, free, has_attr, hs = 1, frozenset(), False, [cls, disc]
    for c in _seq(e.children()):
        s, f, h, ch = _walk_expr(c, scope, registry, findings)
        size += s
        free |= f
        has_attr = has_attr or h
        hs.append(ch)
    shash = hash(tuple(hs))
    if has_attr and size >= LAMBDA_INVARIANT_MIN_SIZE:
        if scope and not (free & scope):
            findings.append(
                ("lambda-invariant", size, e.toString()[:200])
            )
    if has_attr and size >= REINLINE_MIN_SIZE:
        registry.setdefault((shash, size), []).append(e)
    return size, free, has_attr, shash


def derived_reinline_findings(df: DataFrame) -> list[tuple]:
    """Scan ``df``'s optimized logical plan for the derived-expression
    traps; returns [] when clean, else (kind, size/count, rendering)
    tuples. Run on the PRE-materialization stage frame (a checkpointed
    frame's plan is an opaque LogicalRDD with nothing left to scan)."""
    plan = df._jdf.queryExecution().optimizedPlan()
    registry: dict[tuple, list] = {}
    findings: list[tuple] = []
    # Optimized logical plans are DAGs, not trees: a self-union /
    # self-join reuses the SAME child plan object on both branches, so
    # an unguarded walk visits shared subtrees once per path (inflated
    # duplicate counts; exponential time on deep self-composition --
    # r11 ADVICE). Dedup must be on JVM object identity: id() of
    # transient Py4J wrappers is unusable (CPython reuses freed
    # addresses, and two wrappers for one JVM node have different
    # ids), so keep a JVM-side java.util.IdentityHashMap -- exact
    # reference identity, and holding the map pins every visited node.
    seen = df.sparkSession._jvm.java.util.IdentityHashMap()

    def walk_plan(node) -> None:
        if seen.containsKey(node):
            return
        seen.put(node, node)
        for e in _seq(node.expressions()):
            _walk_expr(e, frozenset(), registry, findings)
        for c in _seq(node.children()):
            walk_plan(c)
        for sq in _seq(node.subqueries()):
            walk_plan(sq)

    walk_plan(plan)
    # report only the LARGEST duplicated subtree per duplicate family
    # (every sub-subtree of a re-inlined producer duplicates with it),
    # and only after CONFIRMING the family by rendering: the structural
    # hash is a filter, not proof -- same-typed distinct parameters or
    # a Python hash collision could merge different subtrees, and this
    # guard fails builds (r11 ADVICE). True re-inlines are exact copies
    # (same exprIds), so their renderings are identical; renders happen
    # only on the rare >1-exemplar families, keeping the walk itself
    # render-free (the r11 O(n^2)-toString concern).
    confirmed = []
    for (shash, size), exemplars in registry.items():
        if len(exemplars) < 2:
            continue
        groups: dict[str, int] = {}
        for ex in exemplars:
            s = ex.toString()
            groups[s] = groups.get(s, 0) + 1
        rendering, n = max(groups.items(), key=lambda kv: kv[1])
        if n > 1:
            confirmed.append((size, n, rendering))
    if confirmed:
        size, n, rendering = max(confirmed)
        findings.append(("re-inlined", f"{n}x size {size}", rendering[:200]))
    return findings


def assert_no_derived_reinline(df: DataFrame, label: str = "") -> None:
    """Raise AssertionError when the plan carries a re-inlined derived
    producer or a loop-invariant lambda subtree (the r8/r10 trap class)."""
    findings = derived_reinline_findings(df)
    assert not findings, f"derived-expression trap in {label}: {findings}"
