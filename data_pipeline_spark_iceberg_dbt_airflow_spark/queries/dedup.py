"""Deduplication operators over the ``documents`` table.

The reference has no dedup surface of its own (its tables are append-only
micro-batches, /root/reference/Iceberg-dbt-project/scripts/
extract_bitcoin_prices.py:150-193); these operators are the
training-data-pipeline extension the north-star calls for: exact dedup
(hash-groupBy + keep-first-row), n-gram Jaccard near-dup, MinHash+LSH
banded near-dup, and SimHash fingerprinting, all expressed as declarative
DataFrame plans with DuckDB oracles running the identical formula.

Registry budget note (round 3): 3 consolidated entries (was 5) so the
driver's 50-entry verification window covers the whole repo. The two exact
variants merged into one query (hash grouping + min_by survivors); the two
near-dup variants merged into one two-branch query that SHARES the
materialized shingle index -- previously each rebuilt it (the top-2 bench
cost, VERDICT r2).

Cross-engine determinism: every hash bottoms out in ``md5`` over an
explicit UTF-8 string (hex output is identical in Spark and DuckDB; the
60-bit shingle id ``sid`` lifts the prefix to BIGINT via Spark
``conv(hex, 16, 10)`` = DuckDB ``CAST('0x' || hex AS BIGINT)``, verified
equal), computed ONCE at index build. MinHash permutations are
Carter-Wegman multiply-adds over the top 28 bits of ``sid`` (see
``MH_P``), so (a) each shingle row is md5-hashed once at build, never
per consumer, and (b) the per-doc MIN aggregates over fixed-width BIGINT
buffers: Spark can only HashAggregate fixed-width buffers, and a MIN
over a raw hex STRING silently degrades the whole signature build to a
double SortAggregate (measured 4.8s -> 1.3s at sf0.1 from the
numeric-buffer change alone).

Scale design (100 TB):
- Exact dedup is a single hash-shuffle on md5(text) -- the canonical
  map-side-combinable groupBy; never a sort, never shuffles raw text.
- Near-dup NEVER does all-pairs: candidate pairs come from an equi-join
  on shared shingles (inverted index) or shared LSH band keys, both plain
  hash-shuffles on the join key. A document-frequency cap drops
  stop-shingles so one hot shingle cannot produce a quadratic pair blowup
  (the classic skew killer; cap mirrored in the oracle so semantics stay
  exact).
- MinHash signatures are 8 permutations -> 4 bands x 2 rows; signature
  build is one map-side-combinable groupBy. Banding makes the join linear
  in near-dup density rather than quadratic in corpus size.
- The shingle index is persisted ONCE per (session, sf_dir) and shared by
  every consumer in the plan; ``release_shingle_index`` frees it (bench.py
  calls it after the dedup timings; long-lived sessions own the lifetime).

Measured scale-law (local[32], round 4, post sid/n_sh index redesign):
a synthetic 10x corpus (50k docs, every doc in a 10-way near-dup
clique) runs the full verified near-dup query in 5.0s vs 1.7s at sf0.1
-- 2.9x the time for 10x the docs and ~1600x the verified pairs
(405k vs 256): cost tracks input + output size, not corpus^2, which is
the whole point of the inverted-index/banded design. Connected
components over that 405k-pair graph labels all 50k docs in ~11s
(min-label propagation to convergence; edge materialization dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import read_table, session_token, table_row_count
from ..operators.graph import connected_components
from .registry import register

#: Shingles appearing in more than this many docs are dropped (stop-shingle
#: cap; keeps the inverted-index join linear under skew). This is the FLOOR
#: of the effective cap -- see :func:`df_cap_for`; the oracle CTEs compute
#: the SAME max(floor, ratio*N) in SQL from the documents table itself
#: (r12, ADVICE: a literal floor in the oracle silently diverged from the
#: engine for any corpus above the 1M crossover).
DF_CAP = 100

#: Stop-shingle definition as a corpus FRACTION: df > 0.01% of documents.
#: An absolute cap is scale-WRONG by construction -- for a fixed content
#: distribution every shingle's df grows linearly with N, so a fixed cap
#: removes an ever-growing share of the index. Measured on the stress
#: corpus (r11, SCALING.md): at 1M docs the fixed cap dropped 5.1% of
#: shingle instances; at 4M, 69.4% -- residual per-doc shingle sets
#: shrank to the rare tail, residual-Jaccard variance exploded, and the
#: lexical rung falsely merged ~192k docs (canonical rate 87.9% -> 83.1%
#: on a corpus whose planted dup structure is scale-invariant), silently
#: absorbing the semantic-dup plant upstream of the sem stage. The ratio
#: form keeps the capped SHARE N-invariant (df > r*N at scale s*N  <=>
#: df > r*N at N, for dfs scaling with N): the 0.01%-of-docs quantile the
#: 1M floor empirically corresponds to.
DF_CAP_RATIO = 1e-4


def df_cap_for(n_rows: int | None) -> int:
    """Effective stop-shingle cap for an ``n_rows``-document corpus:
    max(DF_CAP, DF_CAP_RATIO * N). None (unknown size) -> the floor."""
    if n_rows is None:
        return DF_CAP
    return max(DF_CAP, int(n_rows * DF_CAP_RATIO))

#: Near-dup verification threshold on true n-gram Jaccard.
JACCARD_THRESHOLD = 0.5

#: Line-level dedup: normalized tokens per "line" (the corpus carries no
#: newlines, so fixed windows stand in for newline splits), and the
#: minimum corpus-wide occurrence count for a line to enter the
#: boilerplate strip-list. Mirrored in the oracle.
LINE_TOKENS = 10
LINE_MIN_DUP = 2

_NORM = "trim(regexp_replace(lower(text), '\\\\s+', ' '))"

#: Shared oracle CTEs: whitespace-normalized word tokens -> distinct word
#: 3-gram shingles per doc -> document-frequency-capped shingle index.
#: Shingles are carried as ``sid``, the top-60-bit md5 prefix lifted to
#: BIGINT (identical in both engines) -- the raw shingle STRING never
#: leaves the tokenize stage, so every downstream join/groupBy shuffles
#: 8-byte keys instead of ~25-byte text (round-4 perf change; a 60-bit
#: collision across distinct shingles is ~n^2/2^61 and, because BOTH
#: engines key on sid, affects both identically -- semantics stay
#: engine-equal by construction).
def oracle_shingle_ctes(df_cap: int = DF_CAP, df_cap_ratio: float = DF_CAP_RATIO) -> str:
    """Render the shared shingle CTEs with the scale-aware stop-shingle
    cap computed FROM THE DATA, exactly as the engine's ``df_cap_for(N)``:
    GREATEST(floor, trunc(ratio * N)) with N = COUNT(*) over the whole
    documents table (the engine uses the parquet footer count of the same
    table). FLOOR before the cast mirrors Python int() truncation (DuckDB
    CAST rounds to nearest). At every driver/bench scale (N < 1M) this
    reduces to the literal floor, so r1-r11 oracle hashes are unchanged;
    above the crossover the differential is now ENFORCED rather than
    guarded by a comment (r12, ADVICE). Parameterized so tests can cross
    the regime boundary on a small corpus."""
    return rf"""
    toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        FROM documents),
    shingles AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(len(t) - 2),
                      i -> CAST(('0x' || substr(md5(t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]), 1, 15))
                               AS BIGINT))) AS sid
        FROM toks WHERE len(t) >= 3),
    capped AS (
        SELECT s.doc_id, s.sid
        FROM shingles s
        JOIN (SELECT sid FROM shingles
              GROUP BY sid
              HAVING COUNT(*) <= GREATEST({df_cap},
                     CAST(FLOOR((SELECT COUNT(*) FROM documents) * {df_cap_ratio}) AS BIGINT))) keep
          USING (sid))
"""


ORACLE_SHINGLE_CTES = oracle_shingle_ctes()


def _tokens_col() -> F.Column:
    """Whitespace-normalized word tokens (identical to the oracle's CTE)."""
    return F.split(F.expr(_NORM), " ")


#: Build the shingle rows with the Arrow kernel (default) instead of the
#: Catalyst transform/md5 expression. The expression path stays as the
#: reference rendering (same formula as the DuckDB oracle CTEs) and is
#: pinned bit-equal to the kernel by tests/test_dedup.py's differential;
#: flip to False to fall back. Rationale: transform(sequence(...)) +
#: per-element md5/conv/substr is CodegenFallback -- interpreted
#: per-shingle expression eval was the dominant lexical-stage term at 1M
#: docs (44.2s of ~77s, tools/lexical_attrib.py r10), while hashlib.md5
#: over Arrow batches does the identical arithmetic at C speed.
SHINGLE_KERNEL = True


#: Cached executor-probe verdicts, keyed by the session-lifetime token
#: (one tiny probe job per session, not per index build).
_LOCALE_PROBE_CACHE: dict = {}

#: The probe string exercises every Java locale-sensitive lowercase
#: rule: 'I' diverges under tr/az (dotless ı), 'Ì' under lt (i +
#: combining dot + grave), and the non-ASCII 'Ä' forces Catalyst's
#: ``lower()`` off its ASCII fast path onto the locale-dependent
#: ``toLowerCase()`` branch. Python's ``str.lower()`` is
#: locale-independent, so equality on this string certifies the
#: kernel's bit-equality assumption for arbitrary text.
_LOCALE_PROBE = "IÄÌ"


def _kernel_locale_ok(spark) -> bool:
    """Runtime guard for the shingle kernel's one environmental
    assumption (r12, VERDICT r11 item 2): its ``str.lower()`` is
    bit-equal to Catalyst's ``lower()`` only when the JVM evaluating
    the expression lowercases like Unicode default casing (a Turkish
    executor's dotless-i diverges silently).

    r13 (ADVICE r12): probe BEHAVIORALLY on an EXECUTOR, not the driver
    JVM's locale name -- Catalyst's ``lower()`` runs executor-side, and
    a cluster can set ``user.language`` per executor via
    ``spark.executor.extraJavaOptions``. One tiny non-constant-foldable
    job (the ``when(id < 0, ...)`` dependence on the range column keeps
    the optimizer from folding ``lower()`` on the driver) evaluates the
    probe where real shingling would run and compares against Python's
    locale-independent ``str.lower()``. Cached once per session token;
    any mismatch or probe failure falls back to the expression path.
    Caveat that remains: the probe samples ONE executor -- a fleet with
    heterogeneous per-executor locales (no launcher configures this)
    could still pass; homogeneous-fleet is the documented assumption.
    """
    key = session_token(spark)
    if key in _LOCALE_PROBE_CACHE:
        return _LOCALE_PROBE_CACHE[key]
    try:
        row = (
            spark.range(1)
            .select(
                F.lower(
                    F.concat(
                        F.lit(_LOCALE_PROBE),
                        F.when(F.col("id") < 0, F.lit("x")).otherwise(
                            F.lit("")
                        ),
                    )
                ).alias("lo")
            )
            .head()
        )
        ok = row is not None and row["lo"] == _LOCALE_PROBE.lower()
    except Exception:
        ok = False
    _LOCALE_PROBE_CACHE[key] = ok
    return ok


def _shingle_rows_expr(docs: DataFrame) -> DataFrame:
    """(doc_id, sid) shingle rows via the Catalyst expression rendering.

    The literal Spark-SQL transcription of ORACLE_SHINGLE_CTES: one
    interpreted md5+conv per shingle inside transform(sequence(...)).
    Kept as the cross-engine reference the kernel is differenced
    against; not the default build path (see SHINGLE_KERNEL).
    """
    return (
        docs.select("doc_id", _tokens_col().alias("t"))
        .where(F.size("t") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "array_distinct(transform(sequence(0, size(t)-3),"
                    " i -> cast(conv(substr(md5(encode(concat_ws(' ',"
                    " t[i], t[i+1], t[i+2]), 'UTF-8')), 1, 15), 16, 10)"
                    " as bigint)))"
                )
            ).alias("sid"),
        )
    )


def _shingle_rows_kernel(docs: DataFrame) -> DataFrame:
    """(doc_id, sid) shingle rows via an Arrow ``mapInPandas`` kernel.

    Bit-equal to :func:`_shingle_rows_expr` by construction, term by
    term (the differential test pins it on real + adversarial corpora):

    - ``lower(text)`` -> ``str.lower()``. NOT universally bit-equal:
      Spark's non-ASCII path delegates to JVM ``toLowerCase()`` under
      the DEFAULT locale and the JVM's Unicode tables, so a Turkish
      default locale (dotless-i) or a JVM/CPython Unicode-version skew
      can diverge on exotic planes (r11 review). Equal under the
      root/en locale this engine ships with; the differential test
      (ASCII + U+00A0 + 1:M folds) pins the deployed environment, and
      a deployment changing the JVM locale must re-run it.
    - ``regexp_replace(.., '\\\\s+', ' ')`` -> a compiled
      ``[ \\t\\n\\x0b\\f\\r]+`` pattern. Java's ``\\s`` is the ASCII
      class ONLY -- Python's ``\\s`` also eats Unicode whitespace
      (U+00A0 etc.), which would silently merge tokens the expression
      path keeps apart (the round-4 ``str.split()`` lesson), so the
      Java class is spelled out.
    - ``trim`` -> ``strip(' ')`` (Spark trim removes 0x20 only).
    - ``split(s, ' ')`` -> ``s.split(' ')`` (both keep empty fields).
    - sid: ``conv(substr(md5_hex, 1, 15), 16, 10)`` = the top 60 bits
      of the digest = ``int.from_bytes(digest[:8], 'big') >> 4`` --
      exact integers well under 2**63, no float rounding anywhere.
    - ``array_distinct`` -> a per-doc ``set`` (downstream is pure set
      semantics: groupBys and joins, never row order).

    Scale shape: embarrassingly parallel over doc rows -- no shuffle,
    no state, output is the same 16-byte (doc_id, sid) stream the
    expression path emits, so every downstream exchange is unchanged.

    ``mapInArrow``, not ``mapInPandas`` (r11 review): the Arrow->pandas
    conversion turns a bigint column containing ANY null into float64 --
    a NULL doc_id then crashed the int64 cast, and every non-null id
    above 2**53 sharing that batch was silently rounded. Arrow batches
    keep int64-with-nulls exact, and a NULL-id doc's shingle rows flow
    through with a NULL id exactly as the expression path emits them.
    """
    import pyarrow as pa

    def gen(batches):
        import hashlib
        import re

        md5 = hashlib.md5
        ws = re.compile("[ \t\n\x0b\f\r]+")
        for batch in batches:
            cols = batch.to_pydict()
            doc_ids: list[int | None] = []
            sids: list[int] = []
            for doc_id, text in zip(cols["doc_id"], cols["text"]):
                if not isinstance(text, str):
                    continue  # NULL text: expr path filters size(NULL)=-1
                toks = ws.sub(" ", text.lower()).strip(" ").split(" ")
                n = len(toks) - 2
                if n < 1:
                    continue
                seen = {
                    int.from_bytes(
                        md5(
                            " ".join(toks[i : i + 3]).encode("utf-8")
                        ).digest()[:8],
                        "big",
                    )
                    >> 4
                    for i in range(n)
                }
                doc_ids.extend([doc_id] * len(seen))
                sids.extend(seen)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(doc_ids, type=pa.int64()),
                    pa.array(sids, type=pa.int64()),
                ],
                ["doc_id", "sid"],
            )

    return docs.select("doc_id", "text").mapInArrow(
        gen, schema="doc_id bigint, sid bigint"
    )


#: One persisted shingle index per (JVM session, sf_dir). Bounded by the
#: number of distinct corpora a session touches (not by invocation count),
#: and releasable -- the round-2 persist()-per-call leak is gone. Keyed on
#: the session-lifetime token (io.session_token), not id(spark): a recycled
#: CPython id can never alias a stopped session's persisted plans.
_INDEX_CACHE: dict[tuple[str, str], DataFrame] = {}

#: The pre-cap raw explode backing each index (kept pinned so the df-cap
#: aggregate and the capped output share ONE tokenize+md5 pass).
_RAW_CACHE: dict[tuple[str, str], DataFrame] = {}

#: (table_name, bucket_count) backing each TABLE-BACKED index cache
#: entry (materialize_shingle_index). Recorded so a later call with
#: different arguments, or a dropped backing table, rebuilds instead of
#: silently returning the stale frame (ADVICE r13).
_TABLE_META: dict[tuple[str, str], tuple[str, int]] = {}


def shingled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct word 3-gram shingle ids per doc, document-frequency capped.

    The inverted-index building block shared by the Jaccard and MinHash
    near-dup branches: ``(doc_id, sid, n_sh)`` -- all BIGINT -- where
    ``sid`` is the top-60-bit md5 prefix of the shingle text and
    ``n_sh`` the doc's capped shingle count. Hashing happens ONCE here,
    inside the Arrow shingle kernel (round 3 recomputed md5 per
    consumer; round 11 moved the tokenize+md5 pass off the interpreted
    transform -- see SHINGLE_KERNEL);
    per-doc dedup happens ROW-SIDE (array_distinct before explode -- no
    corpus-wide distinct shuffle); the df-cap is one groupBy(sid) +
    broadcast anti-join; ``n_sh`` is a sort-free count over a
    partition-only window, which leaves the PERSISTED index partitioned
    by doc_id -- the minhash signature groupBy(doc_id) then runs with
    ZERO exchange. The index is 24 bytes/row -- at 100 TB it shuffles
    ids, never text. Persisted once per (session, sf_dir) and freed via
    :func:`release_shingle_index`.
    """
    key = (session_token(spark), sf_dir)
    if key in _INDEX_CACHE:
        return _INDEX_CACHE[key]
    raw, out = _index_lineage(spark, sf_dir)
    out = out.persist()
    # Both caches stay pinned for the session (the raw explode is ~16
    # bytes/shingle -- trivial next to the executor heap) and are freed
    # together by release_shingle_index: an eager count() here would
    # serialize an extra action into every cold build (measured +0.5s at
    # sf0.1) just to drop the raw cache early.
    _INDEX_CACHE[key] = out
    _RAW_CACHE[key] = raw
    return out


#: Raw-explode persist sizing (r15, VERDICT r14 #5). The pre-cap
#: shingle explode is persisted so the df-cap aggregate and the capped
#: output share ONE tokenize+md5 pass -- but at 8M docs the 488M-row
#: MEMORY persist no longer fits beside execution memory and the
#: "kernel" build term inherited a spill round-trip (exponent 1.7,
#: SCALING.md r14). Above the estimated-size bound the persist degrades
#: to DISK_ONLY: one serialized write + two streaming reads, zero
#: execution-memory theft, and the explode still runs once. Estimate =
#: footer row count x observed shingles/doc x ~24 B/row of cached
#: columnar; bound = 1/8 of the JVM heap, leaving the protected
#: storage pool (spark.memory.fraction x storageFraction = 0.3 heap)
#: to the capped index the session actually keeps plus margin for the
#: build's own shuffles.
RAW_SHINGLES_PER_DOC_EST = 60
RAW_ROW_CACHE_BYTES = 24
RAW_PERSIST_HEAP_FRACTION = 0.125


def _heap_bytes(spark: SparkSession) -> int:
    """Executor-heap estimate for the persist gate: executor memory if
    set, else driver memory (local mode: the one JVM), else the 1g
    Spark default. Parse failures take the default -- the gate is a
    layout choice, never worth failing a build over."""
    for key in ("spark.executor.memory", "spark.driver.memory"):
        try:
            v = spark.conf.get(key, None)
        except Exception:
            v = None
        if v:
            try:
                # Spark's JavaUtils grammar: optional one- OR two-letter
                # suffix ('8g' == '8gb'), case-insensitive; a UNITLESS
                # value for *.memory is MiB (byteStringAsMb), not bytes.
                s = v.strip().lower()
                mult = {"k": 2**10, "m": 2**20, "g": 2**30, "t": 2**40}
                if s.endswith("b") and len(s) > 1 and s[-2] in mult:
                    return int(float(s[:-2]) * mult[s[-2]])
                if s and s[-1] in mult:
                    return int(float(s[:-1]) * mult[s[-1]])
                return int(float(s) * 2**20)
            except (ValueError, TypeError):
                continue
    return 2**30


def _raw_persist_level(n_docs: int | None, heap_bytes: int):
    """StorageLevel for the raw shingle explode: MEMORY_AND_DISK (the
    plain-persist default) while the estimated cache fits the heap
    budget, DISK_ONLY above it. ``None`` (unprobeable corpus) keeps the
    memory tier -- small/unknown corpora are exactly where it pays."""
    from pyspark import StorageLevel

    if n_docs is None:
        return StorageLevel.MEMORY_AND_DISK_DESER
    est = n_docs * RAW_SHINGLES_PER_DOC_EST * RAW_ROW_CACHE_BYTES
    if est > heap_bytes * RAW_PERSIST_HEAP_FRACTION:
        return StorageLevel.DISK_ONLY
    return StorageLevel.MEMORY_AND_DISK_DESER


def _index_lineage(
    spark: SparkSession, sf_dir: str, repartition_to: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """The shingle-index build lineage, UNCACHED: returns ``(raw, out)``
    where ``raw`` is the persisted (not yet populated) pre-cap explode
    and ``out`` the lazy capped+counted index frame. ``shingled_docs``
    persists ``out`` for the in-memory cache; ``materialize_shingle_
    index``'s cold path writes ``out`` straight to the bucketed table
    and unpersists ``raw`` -- never paying a cache populate for rows
    whose only consumer is the table write (r14, VERDICT r13 #1).

    ``repartition_to`` hash-partitions the capped rows by doc_id BEFORE
    the n_sh window: the window's ClusteredDistribution(doc_id) is then
    already satisfied (no second exchange), and the frame leaves with
    exactly the murmur3-pmod layout ``write_bucketed`` would otherwise
    repartition for -- so the table write can run pre-partitioned and
    the whole build pays ONE doc_id shuffle instead of two.
    """
    # Shingling is the CPU-bound stage of the whole dedup family; make sure
    # it runs on every core even when the scan is a single parquet split.
    docs = read_table(spark, sf_dir, "documents", widen=True)
    use_kernel = SHINGLE_KERNEL and _kernel_locale_ok(spark)
    if SHINGLE_KERNEL and not use_kernel:
        import warnings

        warnings.warn(
            "shingle kernel disabled: non-root/en JVM default locale "
            "breaks its lower() bit-equality; using the Catalyst "
            "expression rendering (see _kernel_locale_ok)"
        )
    sh = (
        _shingle_rows_kernel(docs)
        if use_kernel
        else _shingle_rows_expr(docs)
    )
    # Scale-aware cap: footer row count (no Spark job); an unprobeable
    # corpus pays ONE count job rather than silently taking the
    # absolute floor at scale (the r10 lexical-gate posture -- and the
    # floor-at-scale failure is exactly the r11 4M over-merge,
    # see DF_CAP_RATIO).
    n_docs = table_row_count(sf_dir, "documents")
    if n_docs is None:
        n_docs = docs.count()
    # The df-cap drops HOT shingles, and hot shingles are few by
    # definition (df > DF_CAP can hold for at most n_rows/DF_CAP distinct
    # shingles) -- so ship the DROP set as a broadcast anti-join instead
    # of shuffle-joining the full index against the (nearly-everything)
    # keep set: the only shuffle left in the cap is the df count itself.
    # The tokenize+md5 explode is the CPU-heavy pass; pin it once so the
    # df-cap aggregate and the capped+counted output both read the cache
    # instead of re-shingling (round 3 ran the explode twice per build)
    # -- on DISK above the memory bound (see _raw_persist_level).
    raw = sh.persist(_raw_persist_level(n_docs, _heap_bytes(spark)))
    cap = df_cap_for(n_docs)
    drop = (
        raw.groupBy("sid")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > cap)
        .select("sid")
    )
    capped = raw.join(F.broadcast(drop), "sid", "left_anti")
    if repartition_to is not None:
        capped = capped.repartition(repartition_to, "doc_id")
    out = capped.select(
        "doc_id",
        "sid",
        F.count(F.lit(1))
        .over(Window.partitionBy("doc_id"))
        .alias("n_sh"),
    )
    return raw, out


def release_shingle_index(spark: SparkSession | None = None) -> None:
    """Unpersist cached shingle indexes (all, or one session's)."""
    tok = None if spark is None else session_token(spark)
    for cache in (_INDEX_CACHE, _RAW_CACHE):
        for key in list(cache):
            if tok is None or key[0] == tok:
                df = cache.pop(key)
                try:
                    df.unpersist()
                except Exception:
                    # a table-backed index (materialize_shingle_index)
                    # has nothing to unpersist; dropping the cache
                    # entry is the whole release
                    pass
    for key in list(_TABLE_META):
        if tok is None or key[0] == tok:
            _TABLE_META.pop(key, None)


def materialize_shingle_index(
    spark: SparkSession, sf_dir: str, table: str, bucket_count: int = 32
) -> DataFrame:
    """Swap the session's cached shingle index for a BUCKETED TABLE scan
    (r13, VERDICT r12 "what's wrong" #1).

    The index is shared by two DAG stages (doc_clusters' minhash pass
    and the contamination screen). As a .persist() cache that sharing
    is hostage to the executor cache tier: at 4M docs the heavy stages
    between the two consumers (doc_lm's bigram explode) evict the
    raw-explode + index blocks under execution-memory pressure, and the
    contamination stage silently repaid the recompute -- in-DAG wall
    66.1s vs 14.5s for the same operator over a pinned index
    (SCALING.md r12, tools/contam_ab.py). Materializing the boundary as
    a bucketed+sorted doc_id table -- exactly how every other DAG stage
    boundary already crosses stages above BUCKETED_DAG_BOUND -- makes
    the second consumer's input a 24-byte-row columnar scan no cache
    tier can take away, and the doc_id bucketing keeps the minhash
    ``groupBy(doc_id)`` exchange-free like the cache's window layout
    did. The write is one extra pass over rows the build was already
    producing; the in-memory tiers are freed immediately after.

    Idempotent per (session, corpus, table, bucket_count): a second
    call whose cache entry already reads THIS ``table`` at THIS
    ``bucket_count`` returns it without rebuilding; a different table
    name or bucket count, or a backing table dropped externally
    (``tableExists`` is re-probed on the cached path), rebuilds
    instead of silently serving the stale frame (ADVICE r13).
    """
    from ..operators.layout import write_bucketed

    key = (session_token(spark), sf_dir)
    cached = _INDEX_CACHE.get(key)
    table_backed = cached is not None and key not in _RAW_CACHE
    if table_backed:
        meta = _TABLE_META.get(key)
        if meta == (table, bucket_count) and spark.catalog.tableExists(
            table
        ):
            # already backed by the requested table (the raw tier is
            # only present for the in-memory build)
            return cached
        if meta is None or not spark.catalog.tableExists(meta[0]):
            # the cached frame scans a table that no longer exists --
            # evict BEFORE shingled_docs would hand it back as the
            # rebuild source and crash at read time
            _INDEX_CACHE.pop(key, None)
            _TABLE_META.pop(key, None)
        elif meta[0] == table:
            # SAME table, DIFFERENT bucket count (ADVICE r14): the
            # cached frame scans the very table this call must
            # overwrite -- using it as the write source raises
            # UNSUPPORTED_OVERWRITE.TABLE. Evict and rebuild cold from
            # the raw corpus instead.
            _INDEX_CACHE.pop(key, None)
            _TABLE_META.pop(key, None)
        # else: a DIFFERENT old table still exists; shingled_docs
        # returns its scan, a valid (and cheap) source for the
        # re-bucketed write
    if key not in _INDEX_CACHE:
        # COLD build-to-table (r14, VERDICT r13 #1): the r13 shape went
        # through shingled_docs' persist, so the write action populated
        # a 231M-row (at 4M docs) index cache whose ONLY reader was the
        # write itself -- then popped it. Building the uncached lineage
        # pre-partitioned instead (a) skips that dead cache populate
        # and (b) collapses the n_sh window exchange and the writer's
        # bucket repartition into ONE doc_id shuffle (same murmur3-pmod
        # layout, see _index_lineage). Rows identical either way: the
        # repartition only moves WHERE the window runs.
        raw, out = _index_lineage(spark, sf_dir, repartition_to=bucket_count)
        try:
            write_bucketed(
                out, table, "doc_id", bucket_count, sort=True,
                pre_partitioned=True,
            )
        finally:
            # a failed write must not leak the persisted raw explode
            # for the rest of the session (ADVICE r14): it is neither
            # registered in _RAW_CACHE nor reachable by
            # release_shingle_index once this frame goes out of scope
            raw.unpersist()
    else:
        # warm in-memory index: write it out from the cache, then drop
        # the memory tiers
        idx = shingled_docs(spark, sf_dir)
        write_bucketed(idx, table, "doc_id", bucket_count, sort=True)
        for cache in (_INDEX_CACHE, _RAW_CACHE):
            if key in cache:
                cache.pop(key).unpersist()
    _TABLE_META[key] = (table, bucket_count)
    # BARE table scan, deliberately un-persisted (r13, measured BOTH
    # ways at 4M): persisting the scan pinned ~231M rows of cache
    # blocks through the rest of the DAG and recreated the r12
    # memory-tier contention downstream (doc_clusters 236 -> 421s,
    # doc_lm 59 -> 142s same-day), while the bare scan's per-pass
    # columnar re-read costs doc_clusters ~44s and leaves every later
    # stage's memory alone (contaminated 31.7s -> 14.6s under the
    # persist shows the scan re-read is ~15s -- a price each consumer
    # pays locally instead of exporting eviction pressure). At 100 TB
    # the index never fits executor storage anyway; the disk-backed
    # boundary IS the scale shape.
    out = spark.table(table)
    _INDEX_CACHE[key] = out
    return out


#: Decontamination defaults: the benchmark slice is every doc_id divisible
#: by CONTAM_BENCH_MOD (a stand-in for a real eval-set table -- the
#: testdata ships no separate benchmark corpus), and a training doc is
#: contaminated when it shares at least CONTAM_MIN_OVERLAP capped
#: shingles with ANY single benchmark doc. Mirrored in the oracle.
CONTAM_BENCH_MOD = 97
CONTAM_MIN_OVERLAP = 10


def contaminated_docs(
    sh: DataFrame,
    bench_mod: int = CONTAM_BENCH_MOD,
    min_overlap: int = CONTAM_MIN_OVERLAP,
) -> DataFrame:
    """Benchmark decontamination: training docs overlapping the eval set.

    The standard LLM-corpus hygiene step (n-gram-overlap decontamination):
    a training document is flagged when it shares >= ``min_overlap``
    shingles with any one benchmark document. Input is the shared capped
    shingle index (:func:`shingled_docs`), so tokenize+md5 is never
    re-run and the DF_CAP stop-shingle bound already protects the join
    from hot-shingle pair blowup.

    Scale shape: the benchmark side is SMALL by definition (eval suites
    are thousands of docs, the corpus is billions), so its posting list
    broadcasts and the training side streams through one broadcast
    equi-join on the 8-byte sid + one map-side-combinable pair count --
    the corpus never shuffles. Output: (doc_id, bench_doc, overlap) per
    contaminated (train, benchmark) pair; dropping flagged docs is then
    a left_anti join on doc_id.

    Measured scale-law (local[32], round 4, cached index both sides):
    the sf0.1 corpus (5k docs, 2 contaminated pairs) screens in 0.55s;
    a 10x replicated corpus (50k docs, 4,353 pairs -- every replica of
    a benchmark doc overlaps it) screens in 0.80s. 10x the input and
    ~2000x the output for 1.4x wall-clock: cost tracks the
    broadcast-join probe volume, never corpus x benchmark.
    """
    bench = sh.where(F.col("doc_id") % bench_mod == 0).select(
        F.col("doc_id").alias("bench_doc"), "sid"
    )
    train = sh.where(F.col("doc_id") % bench_mod != 0).select("doc_id", "sid")
    return (
        train.join(F.broadcast(bench), "sid")
        .groupBy("doc_id", "bench_doc")
        .agg(F.count(F.lit(1)).alias("overlap"))
        .where(F.col("overlap") >= min_overlap)
    )


@register(
    "dedup_exact_keep_first",
    oracle=rf"""
        WITH doc_stats AS (
            SELECT 'doc' AS level,
                   md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                       AS text_hash,
                   MIN(doc_id) AS keep_doc_id,
                   COUNT(*) AS dup_cnt,
                   COUNT(DISTINCT md5(text)) AS raw_variants
            FROM documents
            GROUP BY 2),
        lines AS (
            SELECT doc_id,
                   md5(array_to_string(list_slice(wt, i + 1, i + {LINE_TOKENS}), ' '))
                       AS text_hash
            FROM (SELECT doc_id,
                         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS wt
                  FROM documents),
                 UNNEST(range(0, len(wt), {LINE_TOKENS})) AS u(i)),
        line_stats AS (
            SELECT 'line' AS level, text_hash,
                   MIN(doc_id) AS keep_doc_id,
                   COUNT(*) AS dup_cnt,
                   COUNT(DISTINCT doc_id) AS raw_variants
            FROM lines
            GROUP BY 2
            HAVING COUNT(*) >= {LINE_MIN_DUP}),
        stats AS (SELECT * FROM doc_stats UNION ALL SELECT * FROM line_stats)
        SELECT s.level, s.text_hash, s.keep_doc_id, s.dup_cnt,
               s.raw_variants, d.lang AS keep_lang, d.source AS keep_source
        FROM stats s JOIN documents d ON d.doc_id = s.keep_doc_id
    """,
    doc="Exact dedup, hash-groupBy + keep-first-row merged (was "
    "dedup_exact_hash + dedup_keep_first_normalized), plus the "
    "line-level pass (round 4) under a `level` marker. level='doc': one "
    "surviving row per normalized-content digest (lowercase, collapsed "
    "whitespace), with the duplicate count, the count of distinct RAW "
    "digests inside the group (how many byte-level variants the "
    "normalization folded), and the survivor's full attributes. "
    "level='line': the RefinedWeb/C4-style intra-corpus span dedup -- "
    "text is segmented into fixed 10-token lines (the corpus carries no "
    "newlines; a real crawl splits on them with identical plumbing) and "
    "every line occurring >= 2 times anywhere in the corpus is emitted "
    "with its occurrence count (dup_cnt) and distinct-document reach "
    "(raw_variants): exactly the boilerplate strip-list a curation "
    "pipeline joins back against the corpus. Both branches carry ONLY "
    "fixed-width buffers (min key, counts) so they stay map-side-"
    "combinable HashAggregates on 128-bit digests (min_by over string "
    "columns would silently degrade the whole chain to SortAggregate -- "
    "string buffers are not hash-aggregable); survivor attributes come "
    "from ONE shared, column-pruned (doc_id, lang, source -- never "
    "text) equi-join on the keep key, serving both branches after the "
    "union. Plan-asserted no-Sort in tests/test_llm_ops.py. "
    "Never orderBy/dropDuplicates on raw text, which shuffles full "
    "documents; digests are 16 bytes, and the line explode emits "
    "digests only -- line text dies inside the scan stage's codegen.",
    bench=True,
    tags=("dedup", "llm-data"),
)
def dedup_exact_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT widened (measured, round 5): widening would repartition-
    # shuffle raw document text -- exactly what this entry's design
    # avoids -- to parallelize digest work too light to amortize it
    # (one md5 per doc + stride-10 line digests; 0.47s -> 0.76s when
    # tried). The span operator makes the opposite call for the
    # opposite reason: its stride-1 digest volume is ~10x this.
    docs = read_table(spark, sf_dir, "documents")
    doc_stats = (
        docs.groupBy(F.md5(F.encode(F.expr(_NORM), "UTF-8")).alias("text_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("dup_cnt"),
            F.countDistinct(F.md5(F.encode("text", "UTF-8"))).alias(
                "raw_variants"
            ),
        )
        .select(F.lit("doc").alias("level"), "*")
    )
    # Line segmentation is one map-side transform+explode over the token
    # array; only the 16-byte line digest leaves the stage. NULL text ->
    # NULL token array -> explode drops the row (UNNEST(range(0, NULL))
    # likewise yields nothing in the oracle).
    lines = docs.withColumn("wt", _tokens_col()).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(wt) - 1, {LINE_TOKENS}),"
                f" i -> md5(encode(concat_ws(' ', slice(wt, i + 1,"
                f" {LINE_TOKENS})), 'UTF-8')))"
            )
        ).alias("text_hash"),
    )
    line_stats = (
        lines.groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("dup_cnt"),
            F.countDistinct("doc_id").alias("raw_variants"),
        )
        .where(F.col("dup_cnt") >= LINE_MIN_DUP)
        .select(F.lit("line").alias("level"), "*")
    )
    attrs = docs.select(
        F.col("doc_id").alias("keep_doc_id"),
        F.col("lang").alias("keep_lang"),
        F.col("source").alias("keep_source"),
    )
    stats = doc_stats.unionByName(line_stats)
    return stats.join(attrs, "keep_doc_id").select(
        "level", "text_hash", "keep_doc_id", "dup_cnt", "raw_variants",
        "keep_lang", "keep_source",
    )


#: MinHash geometry: NUM_PERM permutations split into BANDS bands of
#: ROWS_PER_BAND rows. P(candidate) = 1 - (1 - j^r)^b. Round-10 sweep
#: (tools/lsh_sweep.py, 1M planted corpus, exact path as reference):
#: 8 perms / 4x2 missed 515 of 101,143 true pairs (recall 0.9949,
#: candidates+verify 8.6s); 16 perms / 8x2 missed 108 (recall 0.9989)
#: for 10.8s -- ~79% of the drift bought back for ~2s at 1M, so 16/8x2
#: is the default. Worst-case P(miss) exactly AT the 0.5 threshold:
#: (1-0.25)^8 = 0.100 (was 0.32); at the j~0.9 of real near-copies:
#: 1.7e-6 (was (1-0.81)^4 = 1.3e-3).
NUM_PERM = 16
ROWS_PER_BAND = 2

#: Carter-Wegman permutation family: perm_s(h) = (a_s*h + b_s) mod MH_P
#: over a 28-bit base hash h = md5 prefix. ONE md5 per shingle row feeds
#: all NUM_PERM permutations as multiply-adds (the classic minhash hash
#: family) -- vs hashing '<seed>|shingle' NUM_PERM times, which spends
#: 8x the md5 + string-concat work for the same independence guarantee.
#: MH_P = 2^31 - 1 (prime > the 2^28 base-hash universe); a_s*h fits
#: BIGINT (< 2^59). Coefficients are md5-derived once and inlined as
#: literals in BOTH engines.
MH_P = 2147483647


def _mh_coeffs(s: int) -> tuple[int, int]:
    import hashlib

    a = (
        int.from_bytes(hashlib.md5(f"a|{s}".encode()).digest()[:8], "big")
        % (MH_P - 1)
        + 1
    )
    b = int.from_bytes(hashlib.md5(f"b|{s}".encode()).digest()[:8], "big") % MH_P
    return a, b


def _pair_jaccard(sh: DataFrame) -> DataFrame:
    """(doc_a, doc_b, jaccard) for every pair sharing a capped shingle.

    Inverted-index equi-join on the 8-byte ``sid``; Jaccard =
    |intersection| / |union| from exact integer counts. Per-doc sizes
    ride INTO the join straight from the index (``n_sh`` is baked in at
    build), which enables the SIZE-COMPATIBILITY PREFILTER: jaccard >= t
    forces min(na, nb) >= t * max(na, nb) (icnt <= min(na, nb) and
    icnt*(1+t) >= t*(na+nb)), so incompatibly-sized pairs are dropped
    inside the join's codegen stage, before the pair-count aggregate --
    provably lossless, so the oracle keeps the naive formulation. The
    round-3 post-aggregate size joins are gone: na/nb come out of the
    aggregate as min() of the attached columns (constant per group).

    Considered and rejected: AllPairs/PPJoin prefix filtering (candidate
    pairs restricted to rare-first shingle prefixes). Measured at sf0.1
    it LOSES here -- 310k distinct candidate pairs survive the prefix
    (the corpus shares template phrases), so the verification expansion
    (candidates x posting lists, ~15M rows) dwarfs the direct
    1.3M-row co-occurrence count it was meant to avoid. The direct
    count is one shuffle + one combinable aggregate, ~0.6s warm.
    """
    a, b = _posting_sides(sh)
    return _jaccard_tail(
        a.join(b, "sid").where(F.col("doc_a") < F.col("doc_b"))
    )


def _posting_sides(sh: DataFrame) -> tuple:
    """The two aliased posting-list projections every pair join uses:
    (doc_a, sid, na) and (doc_b, sid, nb), sizes baked in at build."""
    a = sh.select(
        F.col("doc_id").alias("doc_a"), "sid", F.col("n_sh").alias("na")
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"), "sid", F.col("n_sh").alias("nb")
    )
    return a, b


def _jaccard_tail(joined: DataFrame) -> DataFrame:
    """Shared verification tail of both candidate paths: ``joined``
    carries one row per (pair, shared shingle) with doc_a/doc_b/na/nb.
    Applies the size-compatibility prefilter (jaccard >= t forces
    min(na, nb) >= t * max(na, nb) -- provably lossless, so it runs
    inside the join's codegen stage), the combinable pair-count
    aggregate, and the exact Jaccard threshold. ONE definition so the
    direct inverted-index path and the banded-MinHash verify path can
    never diverge on threshold or prefilter semantics."""
    t = JACCARD_THRESHOLD
    inter = (
        joined.where(
            F.greatest("na", "nb") * F.lit(t) <= F.least("na", "nb")
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("icnt"),
            F.min("na").alias("na"),
            F.min("nb").alias("nb"),
        )
    )
    jac = F.col("icnt").cast("double") / (
        F.col("na") + F.col("nb") - F.col("icnt")
    )
    return inter.select(
        "doc_a", "doc_b", jac.alias("jaccard")
    ).where(F.col("jaccard") >= JACCARD_THRESHOLD)


def _verify_candidates(sh: DataFrame, cand: DataFrame) -> DataFrame:
    """Exact Jaccard over an EXPLICIT candidate pair set.

    Same output contract as :func:`_pair_jaccard` restricted to
    ``cand`` rows: the intersection count comes from joining each
    candidate against both posting lists (one |cand| x shingles/doc
    expansion, then an equi-join back onto the index), so cost is
    linear in |candidates|, never in corpus pair density. This is the
    verification half of the banded-MinHash scale path: at 100 TB the
    inverted-index self-join's pair emission grows with per-shingle
    document frequency squared (VERDICT r8: 11.4x wall for 5x docs on
    a constant-dup-fraction corpus), while LSH band keys emit only
    genuinely-similar candidates, so verify-what-LSH-found is the
    bounded plan. The size-compatibility prefilter is the same
    provably-lossless gate _pair_jaccard applies.

    r13: both posting sides are first SEMI-JOIN-REDUCED to the
    candidate-touched id set -- only docs appearing in some candidate
    pair can contribute an intersection row (lossless by definition of
    the two equi-joins; n_sh sizes ride the index columns, so nothing
    else is read from dropped docs). The payoff is the verify stage's
    dominant exchange: the (doc_b, sid) join re-shuffles the posting
    side, which was the FULL corpus x ~55-shingle index; reduced, it is
    bounded by the candidate docs' lists (|ids| <= 2|cand|). The id set
    stays un-hinted: it is doc_id-keyed like the index's cached
    partitioning, so the semi join reuses the index layout and AQE
    broadcasts the id side when it is small -- no driver-size
    assumption at 100 TB.
    """
    ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    touched = sh.join(ids, "doc_id", "left_semi")
    a, b = _posting_sides(touched)
    return _jaccard_tail(cand.join(a, "doc_a").join(b, ["doc_b", "sid"]))


def _minhash_candidates(sh: DataFrame) -> DataFrame:
    """LSH candidate pairs: docs sharing any (band, band_key)."""
    # All NUM_PERM min-hashes in ONE map-side-combinable groupBy(doc_id) --
    # no seeds x shingles row expansion, no per-(doc, seed) shuffle. The
    # 28-bit base hash is the TOP 28 BITS of the stored 60-bit sid
    # (shiftright 32 = the first-7-hex-chars prefix round 3 re-derived
    # with a fresh md5 per shingle row per query -- that md5 now runs
    # once, at index build). Each permutation is a Carter-Wegman
    # multiply-add over it (see MH_P). Buffers are BIGINT, so the
    # aggregate stays a HashAggregate (a min over a hex STRING would
    # force SortAggregate); identical to the oracle's seeds branch.
    hashed = sh.withColumn("h0", F.shiftright("sid", 32))
    minh = hashed.groupBy("doc_id").agg(
        *[
            F.min(
                (F.lit(a) * F.col("h0") + F.lit(b)) % F.lit(MH_P)
            ).alias(f"m{s}")
            for s, (a, b) in (
                (s, _mh_coeffs(s)) for s in range(NUM_PERM)
            )
        ]
    )
    # Band keys row-side: band b = seeds [b*r, b*r+r) in seed order.
    # r15 (guide §2.3, narrower types): with ROWS_PER_BAND == 2 the two
    # 31-bit minhash values (each < MH_P = 2^31 - 1) pack EXACTLY into
    # one BIGINT (m0 << 31 | m1 < 2^62) -- an injective encoding, so
    # equality classes (and with them the candidate set, the verified
    # pairs, and the oracle hash) are untouched while the band self-join
    # shuffles 8-byte longs instead of ~20-byte strings and compares
    # longs instead of strings. The oracle keeps its string_agg
    # rendering: its band_key is internal to its own cand CTE, never
    # output, and injectivity makes the two candidate sets identical.
    # Any other geometry falls back to the comma-join string key (r > 2
    # could overflow 63 bits).
    if ROWS_PER_BAND == 2:
        def _band_key(b: int) -> F.Column:
            return (
                F.col(f"m{b * 2}") * F.lit(2147483648)  # << 31
                + F.col(f"m{b * 2 + 1}")
            ).alias("band_key")
    else:
        def _band_key(b: int) -> F.Column:
            return F.concat_ws(
                ",",
                *[
                    F.col(f"m{s}")
                    for s in range(
                        b * ROWS_PER_BAND, (b + 1) * ROWS_PER_BAND
                    )
                ],
            ).alias("band_key")

    band_structs = [
        F.struct(F.lit(b).alias("band"), _band_key(b))
        for b in range(NUM_PERM // ROWS_PER_BAND)
    ]
    bands = minh.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


_ORACLE_NGRAM_BRANCH = f"""
        n AS (SELECT doc_id, COUNT(*) AS n_sh FROM capped GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS icnt
            FROM capped a
            JOIN capped b ON a.sid = b.sid AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id),
        ngram_pairs AS (
            SELECT i.doc_a, i.doc_b,
                   CAST(icnt AS DOUBLE) / (na.n_sh + nb.n_sh - icnt) AS jaccard
            FROM inter i
            JOIN n na ON na.doc_id = i.doc_a
            JOIN n nb ON nb.doc_id = i.doc_b
            WHERE CAST(icnt AS DOUBLE) / (na.n_sh + nb.n_sh - icnt)
                  >= {JACCARD_THRESHOLD})
"""

_ORACLE_SEED_ROWS = ", ".join(
    f"({s}, {a}, {b})" for s, (a, b) in ((s, _mh_coeffs(s)) for s in range(NUM_PERM))
)

_ORACLE_MINHASH_BRANCH = f"""
        seeds(seed, a, b) AS (SELECT * FROM (VALUES {_ORACLE_SEED_ROWS})),
        hashed AS (
            SELECT doc_id, sid // 4294967296 AS h0
            FROM capped),
        minh AS (
            SELECT doc_id, seed,
                   MIN((a * h0 + b) % {MH_P}) AS minh
            FROM hashed CROSS JOIN seeds
            GROUP BY doc_id, seed),
        bands AS (
            SELECT doc_id, seed // {ROWS_PER_BAND} AS band,
                   string_agg(CAST(minh AS VARCHAR), ',' ORDER BY seed)
                       AS band_key
            FROM minh GROUP BY doc_id, seed // {ROWS_PER_BAND}),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a
            JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                        AND a.doc_id < b.doc_id),
        -- Equal band keys usually mean a shared capped shingle, but the
        -- 28-bit md5-prefix base hash CAN collide across distinct
        -- shingles, so a raw LSH candidate need not share one. The
        -- subset property holds for VERIFIED pairs: a no-shared-shingle
        -- candidate has true Jaccard 0 (< 0.5) and is dropped
        -- identically by this intersection join and by the Spark
        -- left-join flag, so minhash-VERIFIED = ngram-verified
        -- restricted to candidates.
        minhash_pairs AS (
            SELECT p.doc_a, p.doc_b, p.jaccard
            FROM ngram_pairs p
            JOIN cand c ON c.doc_a = p.doc_a AND c.doc_b = p.doc_b)
"""


@register(
    "dedup_neardup_verified",
    oracle=f"""
        WITH {ORACLE_SHINGLE_CTES},
        {_ORACLE_NGRAM_BRANCH},
        {_ORACLE_MINHASH_BRANCH}
        SELECT 'ngram' AS method, doc_a, doc_b, jaccard FROM ngram_pairs
        UNION ALL
        SELECT 'minhash' AS method, doc_a, doc_b, jaccard FROM minhash_pairs
    """,
    doc="Near-duplicate mining, both candidate generators over ONE shared "
    "shingle index (was dedup_ngram_jaccard + dedup_minhash_lsh, which "
    "each rebuilt it -- the top-2 r2 bench cost): method='ngram' pairs "
    "share at least one word-3-gram (inverted-index equi-join, NOT "
    "all-pairs; df-cap kills hot-shingle pair blowup), method='minhash' "
    "pairs share an LSH band (16 md5-keyed permutations banded 8x2, the "
    "round-10 sweep-validated geometry -- band keys are 1 row per "
    "(doc, band), so the candidate join input is "
    "8 rows/doc regardless of document length: the 100 TB path). Both "
    "candidate sets are VERIFIED against true shingle Jaccard >= 0.5, so "
    "both branches emit exact values. The minhash-VERIFIED set is a "
    "subset of the ngram-verified set: a raw LSH candidate without a "
    "shared shingle is possible (the 28-bit md5-prefix hash can collide "
    "across shingles) but has Jaccard < 0.5 and fails the gate on both "
    "engines identically, so the expensive intersection-count join runs "
    "ONCE: the LSH candidate set "
    "left-joins onto the verified ngram pairs as a flag and each row "
    "explodes into its method markers -- round-3 change; the r2 shape "
    "verified minhash candidates through a second shingle intersection.",
    bench=True,
    tags=("dedup", "llm-data", "minhash"),
)
def dedup_neardup_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = shingled_docs(spark, sf_dir)
    verified = _pair_jaccard(sh)
    mh = _minhash_candidates(sh).withColumn("is_mh", F.lit(1))
    return (
        verified.join(mh, ["doc_a", "doc_b"], "left")
        .select(
            F.explode(
                F.when(
                    F.col("is_mh").isNotNull(),
                    F.array(F.lit("ngram"), F.lit("minhash")),
                ).otherwise(F.array(F.lit("ngram")))
            ).alias("method"),
            "doc_a",
            "doc_b",
            "jaccard",
        )
    )


#: Iteration ceiling for label propagation -- a backstop, not a truncation:
#: the loop exits on convergence (no label changed), and near-dup clusters
#: are shallow (diameter ~ 2-3), so hitting this would indicate a bug.
MAX_CC_ITERATIONS = 20  # passed to operators/graph.connected_components

#: Seed-only SemDeDup rendering for the driver oracle (method='semantic'
#: below): k-means with max_iterations=0 makes the cells the k md5-ranked
#: seed vectors -- deterministic SQL-expressible arithmetic end to end
#: (assignment argmin, centroid cosine, blocked pairs, components, keeper
#: argmin), the same trick that hash-oracled the kseed and PQ branches.
#: eps=0.6 (pair threshold 0.4, the family's PAIR_THRESHOLD regime) is
#: deliberately looser than the production default (semdedup.DEFAULT_EPS
#: = 0.03): the synthetic embeddings carry no true paraphrase pairs at
#: 0.97 cosine, and an edgeless oracle would pin nothing.
SEM_ORACLE_K = 4
SEM_ORACLE_EPS = 0.6


def _oracle_semantic_ctes() -> str:
    """DuckDB CTEs mirroring semdedup(k=SEM_ORACLE_K, eps=SEM_ORACLE_EPS,
    max_iterations=0) over the embeddings table. Norm/dot parity with the
    JVM fold and the driver-side Python seed norms is bitwise (verified:
    list_sum is the same strict left-to-right float64 fold)."""
    from .similarity import EMB_DIM, _o_dot, _o_norm, _o_sqdist

    threshold = 1.0 - SEM_ORACLE_EPS  # same float both engines
    return f"""
        svalid AS (SELECT vec_id, embedding FROM embeddings
                   WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
                     AND len(embedding) = {EMB_DIM}
                     AND len(list_filter(embedding,
                             x -> isnan(CAST(x AS DOUBLE)))) = 0),
        sseeds AS (SELECT cid, cent FROM (
                     SELECT ROW_NUMBER() OVER (
                                ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                         vec_id) - 1 AS cid,
                            embedding AS cent
                     FROM svalid)
                   WHERE cid < {SEM_ORACLE_K}),
        sassign AS (SELECT vec_id, cid, cos FROM (
                      SELECT e.vec_id, s.cid,
                             {_o_dot("e.embedding", "s.cent")}
                               / ({_o_norm("e.embedding")}
                                  * {_o_norm("s.cent")}) AS cos,
                             ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                 ORDER BY {_o_sqdist("e.embedding", "s.cent")},
                                          s.cid) AS rn
                      FROM svalid e CROSS JOIN sseeds s)
                    WHERE rn = 1),
        sedge AS (SELECT a.vec_id AS ea, b.vec_id AS eb
                  FROM sassign a
                  JOIN sassign b ON a.cid = b.cid AND a.vec_id < b.vec_id
                  JOIN svalid va ON va.vec_id = a.vec_id
                  JOIN svalid vb ON vb.vec_id = b.vec_id
                  WHERE {_o_dot("va.embedding", "vb.embedding")}
                          / ({_o_norm("va.embedding")}
                             * {_o_norm("vb.embedding")}) >= {threshold}),
        sboth AS (SELECT ea AS a, eb AS b FROM sedge
                  UNION ALL
                  SELECT eb AS a, ea AS b FROM sedge),
        sreach AS (
            SELECT a AS vec_id, a AS r FROM sboth
            UNION
            SELECT sreach.vec_id, e.b AS r
            FROM sreach JOIN sboth e ON sreach.r = e.a),
        scomp AS (SELECT vec_id, MIN(r) AS component
                  FROM sreach GROUP BY vec_id),
        srep AS (SELECT component, vec_id AS rep FROM (
                   SELECT c.component, c.vec_id,
                          ROW_NUMBER() OVER (PARTITION BY c.component
                              ORDER BY a.cos, c.vec_id) AS rn
                   FROM scomp c JOIN sassign a USING (vec_id))
                 WHERE rn = 1),
        slab AS (SELECT e.vec_id AS doc_id,
                        COALESCE(c.component, e.vec_id) AS cluster_id,
                        a.cos AS score,
                        CAST(CASE WHEN c.component IS NULL THEN 1
                                  WHEN r.rep = e.vec_id THEN 1
                                  ELSE 0 END AS INT) AS is_canonical
                 FROM embeddings e
                 LEFT JOIN sassign a ON a.vec_id = e.vec_id
                 LEFT JOIN scomp c ON c.vec_id = e.vec_id
                 LEFT JOIN srep r ON r.component = c.component),
        ssz AS (SELECT cluster_id, COUNT(*) AS cluster_size
                FROM slab GROUP BY cluster_id)"""


@register(
    "dedup_cluster_components",
    oracle=f"""
        WITH RECURSIVE {ORACLE_SHINGLE_CTES},
        {_ORACLE_NGRAM_BRANCH},
        edges AS (
            SELECT doc_a AS a, doc_b AS b FROM ngram_pairs
            UNION ALL
            SELECT doc_b AS a, doc_a AS b FROM ngram_pairs),
        reach AS (
            SELECT a AS doc_id, a AS r FROM edges
            UNION
            SELECT reach.doc_id, e.b AS r
            FROM reach JOIN edges e ON reach.r = e.a),
        comp AS (SELECT doc_id, MIN(r) AS cluster_id
                 FROM reach GROUP BY doc_id),
        lab AS (
            SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN comp c USING (doc_id)),
        sz AS (SELECT cluster_id, COUNT(*) AS cluster_size
               FROM lab GROUP BY cluster_id),
        {_oracle_semantic_ctes()}
        SELECT 'ngram' AS method, l.doc_id, l.cluster_id, s.cluster_size,
               CAST(l.doc_id = l.cluster_id AS INT) AS is_canonical,
               CAST(NULL AS DOUBLE) AS score
        FROM lab l JOIN sz s USING (cluster_id)
        UNION ALL
        SELECT 'semantic' AS method, l.doc_id, l.cluster_id, s.cluster_size,
               l.is_canonical, l.score
        FROM slab l JOIN ssz s USING (cluster_id)
        WHERE (SELECT count(*) FROM sseeds) = {SEM_ORACLE_K}
    """,
    doc="Duplicate-cluster assignment: connected components over the "
    "verified near-dup pair graph, two edge sources under one schema. "
    "method='ngram': edges = ngram-Jaccard pairs >= 0.5 from the shared "
    "shingle index over documents, so transitively-linked documents "
    "collapse into one cluster keyed by the minimum doc_id -- the step "
    "after pair mining in a dedup pipeline (A~B and B~C must yield ONE "
    "survivor even when A~C was never scored). method='semantic' (round "
    "7): the full SemDeDup operator (queries/semdedup.py, Abbas et al. "
    "2023) over the embeddings table under its seed-only rendering -- "
    "k-means cells = the 4 md5-ranked seeds (max_iterations=0), blocked "
    "within-cell pairs at cosine >= 0.4, components, and the keeper "
    "argmin (LOWEST centroid cosine, ties to smallest id; score = that "
    "centroid cosine, hash-pinning the literal-inlined CASE arithmetic). "
    "Spark side is iterative min-label propagation shared by both "
    "branches (operators/graph.py): per round, each node takes the min "
    "of its label and its neighbors' labels (one equi-join + one "
    "combinable groupBy per round), run to CONVERGENCE with a driver-side "
    "scalar change-count per round (the legitimate collect: one number "
    "per iteration, never rows). localCheckpoint truncates lineage each "
    "round so the plan stays O(1) deep; rounds ~ graph diameter, and "
    "near-dup components are shallow. The iteration set holds ONLY nodes "
    "incident to an edge -- singleton docs (the overwhelming mass at "
    "100 TB) never enter the loop and are labeled by one final left "
    "join. Oracle is the same fixpoint via DuckDB's recursive CTE "
    "(transitive closure, then MIN over the reach set), one recursive "
    "closure per branch. Fully value-hashed -- neither iterative path "
    "gets a weaker rows-only check.",
    tags=("dedup", "llm-data", "iterative", "semantic"),
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    ngram_rows = lexical_components(spark, sf_dir)
    sem_rows = semantic_components(spark, sf_dir)
    if sem_rows is None:
        return ngram_rows
    return ngram_rows.unionByName(sem_rows)


#: Above this many documents (footer row count -- no Spark job), the
#: lexical candidate generator switches from the full inverted-index
#: self-join to banded MinHash + explicit verification. Below it the
#: direct path is both exact and cheap (VERDICT r8: 21.4s at 200k);
#: above it the self-join's pair emission is the measured superlinear
#: band (243s at 1M). The LSH path can in principle miss a
#: borderline-Jaccard pair that shares no full band (P(miss) =
#: (1-j^2)^8 at the round-10 16/8x2 geometry; ~1.7e-6 at the j~0.9 of
#: real near-copies, worst-case 0.100 exactly AT the 0.5 threshold --
#: measured at 1M: 108 of 101,143 true pairs, recall 0.9989), which is
#: the standard MinHash-LSH recall trade every near-dup pipeline makes;
#: the driver's sf0.01 oracle corpus stays far below the bound, so the
#: oracle hash pins the exact path.
LEXICAL_LSH_BOUND = 250_000


def _digest_rep_map(spark: SparkSession, sf_dir: str, sh: DataFrame) -> DataFrame:
    """(doc_id, rep) over shingle-bearing docs; rep = min doc_id among
    docs whose NORMALIZED text is byte-identical (md5 digest groups).

    Exact-duplicate documents have identical shingle sets, so (a) a
    digest group with any capped shingle is a Jaccard-1.0 clique and
    (b) for any outside doc x, edge(member, x) holds iff edge(rep, x)
    holds. Components over representatives therefore expand EXACTLY to
    components over all docs, with the same min-id labels (each group's
    min IS its rep). Collapsing before the pair join keeps O(c^2)
    identical-pair rows out of the inverted-index join and the CC edge
    set -- the other half of the r8 superlinear band. Restricted to
    docs present in ``sh`` so that duplicate groups whose shingles were
    all df-capped away stay singletons, exactly as the uncollapsed
    graph leaves them (they share no surviving shingle, hence no edge).
    """
    docs = read_table(spark, sf_dir, "documents", widen=True)
    dig = docs.select(
        "doc_id",
        F.md5(F.encode(F.expr(_NORM), "UTF-8")).alias("dg"),
    ).join(sh.select("doc_id").distinct(), "doc_id")
    return dig.select(
        "doc_id",
        F.min("doc_id").over(Window.partitionBy("dg")).alias("rep"),
    )


def lexical_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The method='ngram' branch of :func:`dedup_cluster_components`,
    exposed on its own because the two branches label DIFFERENT id
    spaces: ngram clusters key documents.doc_id, semantic clusters key
    embeddings.vec_id, and the fixtures' id ranges overlap. Consumers
    that mean "the lexical duplicate clusters over documents" (the
    curation DAG's canonical filter, the closure test) must call THIS,
    not the multiplexed registry entry -- at HEAD~ the DAG consumed the
    union and a non-canonical ngram duplicate whose id collided with a
    canonical vec_id was resurrected through the left-semi keep filter
    (431 polluted clusters at sf0.001, VERDICT r7).

    Round-9 scale shape (VERDICT r8's one `weak`): exact-duplicate
    digest groups are collapsed to their min-id representative BEFORE
    the pair join (see :func:`_digest_rep_map` for the equivalence
    argument -- this is semantics-exact at any size), and above
    ``LEXICAL_LSH_BOUND`` docs candidate pairs come from the banded
    MinHash index + explicit verification instead of the full
    inverted-index self-join (standard LSH recall trade, documented at
    the bound). Labels fold back over digest groups with one join.

    The propagation loop lives in operators/graph.py (extracted round 4
    so embedding-cosine pairs can cluster through the same operator);
    convergence semantics, checkpointing, and the loud non-convergence
    failure are unchanged.
    """
    sh = shingled_docs(spark, sf_dir)
    # Eager-checkpointed: consumed by the rep filter, the pair join's
    # lineage (truncated inside connected_components anyway), and the
    # final fold -- without it the digest scan would re-run per consumer.
    rep_map = _digest_rep_map(spark, sf_dir, sh).localCheckpoint(eager=True)
    rep_sh = sh.join(
        rep_map.where(F.col("doc_id") == F.col("rep")).select("doc_id"),
        "doc_id",
    )
    n_docs = table_row_count(sf_dir, "documents")
    if n_docs is None:
        # The footer probe covers single files and directories of part
        # files; anything it cannot read gets ONE count job rather than
        # a silent default -- before round 10 an unprobeable corpus fell
        # back to the direct self-join, i.e. the superlinear path, at
        # exactly the multi-file scale the LSH gate exists for (round-9
        # ADVICE). count(*) over parquet is a column-pruned metadata
        # scan: trivial next to either candidate path -- and the result
        # is pinned so later probes of the same table are free.
        from ..io import record_row_count

        n_docs = read_table(spark, sf_dir, "documents").count()
        record_row_count(sf_dir, "documents", n_docs)
    if n_docs > LEXICAL_LSH_BOUND:
        pairs = _verify_candidates(rep_sh, _minhash_candidates(rep_sh))
    else:
        pairs = _pair_jaccard(rep_sh)
    labels = connected_components(
        pairs.select("doc_a", "doc_b"),
        max_iterations=MAX_CC_ITERATIONS,
    )
    rep_lab = rep_map.join(
        labels.withColumnRenamed("doc_id", "rep"), "rep", "left"
    ).select("doc_id", F.coalesce("label", "rep").alias("label"))
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    lab = docs.join(rep_lab, "doc_id", "left").select(
        "doc_id", F.coalesce("label", "doc_id").alias("cluster_id")
    )
    sizes = lab.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return lab.join(sizes, "cluster_id").select(
        F.lit("ngram").alias("method"),
        "doc_id",
        "cluster_id",
        "cluster_size",
        (F.col("doc_id") == F.col("cluster_id"))
        .cast("int")
        .alias("is_canonical"),
        F.lit(None).cast("double").alias("score"),
    )


def semantic_components(
    spark: SparkSession, sf_dir: str
) -> DataFrame | None:
    """The method='semantic' branch: the REAL semdedup operator
    (centroid fit, blocked pair mining, components, keeper argmin)
    under its seed-only fit, labeled by embeddings.vec_id.

    Returns ``None`` -- the branch contributes ZERO rows -- when the
    corpus has no embeddings table at all (probed explicitly: a corpus
    directory without embeddings.parquet is a normal text-only corpus,
    not an error; ``read_table``'s pyarrow footer probe raises
    FileNotFoundError, which the old ``except ValueError`` guard let
    crash the whole curation DAG) or has fewer than k valid vectors (no
    cells to block the pair search -- CorpusTooSmallError subclasses
    ValueError; the bare ValueError is kmeans_fit's empty-vector-column
    probe). Both gates mirror the oracle's
    ``(SELECT count(*) FROM sseeds) = k`` predicate, which yields zero
    semantic rows for the same corpora.

    ``dim=EMB_DIM`` pins fit validity to the oracle's svalid gate
    (vec_id NOT NULL, exactly EMB_DIM-wide vectors), so a dirty fixture
    cannot diverge on seed ranking or derived width.
    """
    import os

    from ..io import table_path
    from .semdedup import semdedup
    from .similarity import EMB_DIM

    if not os.path.exists(table_path(sf_dir, "embeddings")):
        return None
    try:
        sem = semdedup(
            read_table(spark, sf_dir, "embeddings"),
            k=SEM_ORACLE_K,
            eps=SEM_ORACLE_EPS,
            max_iterations=0,
            dim=EMB_DIM,
        )
    except ValueError:
        return None
    sem_lab = sem.select(
        F.col("vec_id").alias("doc_id"),
        F.coalesce("component", "vec_id").alias("cluster_id"),
        F.col("keep").cast("int").alias("is_canonical"),
        F.col("cos_centroid").alias("score"),
    )
    sem_sizes = sem_lab.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sem_lab.join(sem_sizes, "cluster_id").select(
        F.lit("semantic").alias("method"),
        "doc_id",
        "cluster_id",
        "cluster_size",
        "is_canonical",
        "score",
    )


@register(
    "dedup_simhash",
    oracle=r"""
        WITH toks AS (
            SELECT doc_id,
                   string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
            FROM documents),
        tok AS (
            SELECT DISTINCT doc_id, unnest(t) AS tok FROM toks),
        tokf AS (SELECT doc_id, tok FROM tok WHERE length(tok) > 0),
        bits AS (
            SELECT doc_id, b.bit,
                   SUM(CASE WHEN ascii(substr(md5(tok), CAST(b.bit AS INT) + 1, 1)) % 2 = 1
                            THEN 1 ELSE -1 END) AS s
            FROM tokf CROSS JOIN (SELECT unnest(range(16)) AS bit) b
            GROUP BY doc_id, b.bit)
        SELECT doc_id,
               CAST(SUM(CASE WHEN s > 0 THEN 1 << bit ELSE 0 END) AS BIGINT)
                   AS simhash
        FROM bits GROUP BY doc_id
    """,
    doc="SimHash document fingerprinting: 16-bit signature where bit i is "
    "the sign of the sum over distinct tokens of +/-1 votes derived from "
    "bit i of each token's md5 (ascii-parity of the i-th hex digit -- "
    "identical in both engines). Near-dup docs land at small Hamming "
    "distance. Two shuffles: (doc, bit) vote sum, then per-doc bit "
    "packing; both map-side combinable. Docs with no tokens are absent.",
    tags=("dedup", "llm-data", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents", widen=True)
    tok = (
        docs.select("doc_id", F.explode(_tokens_col()).alias("tok"))
        .where(F.length("tok") > 0)
        .distinct()
    )
    bits = spark.range(16).withColumnRenamed("id", "bit")
    votes = tok.crossJoin(F.broadcast(bits)).select(
        "doc_id",
        "bit",
        F.expr(
            "CASE WHEN ascii(substring(md5(encode(tok, 'UTF-8')),"
            " CAST(bit AS INT) + 1, 1)) % 2 = 1 THEN 1 ELSE -1 END"
        ).alias("c"),
    )
    per_bit = votes.groupBy("doc_id", "bit").agg(F.sum("c").alias("s"))
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.expr("CASE WHEN s > 0 THEN shiftleft(1, CAST(bit AS INT)) ELSE 0 END")
        ).alias("simhash")
    )


def strip_boilerplate(
    docs: DataFrame,
    min_dup: int = LINE_MIN_DUP,
    *,
    broadcast_frequent: bool = True,
) -> DataFrame:
    """Consume the line-mining output: rewrite every document with its
    boilerplate lines REMOVED (the RefinedWeb/C4 cleanup step that
    `dedup_exact_keep_first` level='line' only reports).

    Output: (doc_id, text) with ORIGINAL CASE preserved -- segments of
    LINE_TOKENS case-preserved tokens whose LOWERCASED digest occurs >=
    min_dup times anywhere in the corpus are dropped, survivors re-join
    in order. Digests ride the same lowercased channel as the
    level='line' mining output (lower() distributes over the
    space-joined window, so the two channels agree byte for byte);
    the one residual normalization is that whitespace RUNS collapse to
    single spaces (tokenization cannot recover them). NULL text stays
    NULL; a document that was ALL boilerplate becomes ''.

    Scale shape -- text never shuffles: the mining explode emits 16-byte
    line digests only; the frequent-digest table (corpus-sublinear)
    joins those digests and folds BACK to one small per-document array
    of locally-frequent digests; the rewrite then happens map-side
    inside the scan stage (transform + array_contains + array_join
    against that broadcast-sized per-doc array). The only shuffles are
    the digest count and the (doc_id, tiny-array) reassembly join --
    document text crosses no exchange. At blocklist scale the frequent
    set can additionally ride the bloom gate (operators/bloom.py)
    before the exact join.

    ``broadcast_frequent`` (default True) hints the corpus-frequent
    digest table for broadcast. The table is corpus-sublinear but
    UNBOUNDED (every digest with count >= min_dup), so at blocklist
    scale -- where it can outgrow executor memory -- pass False to fall
    back to a partitioned shuffle join (mirrors lm_score_docs'
    broadcast_model knob).
    """
    segs = F.expr(
        f"transform(sequence(0, size(wt) - 1, {LINE_TOKENS}),"
        f" i -> concat_ws(' ', slice(wt, i + 1, {LINE_TOKENS})))"
    )
    # case-PRESERVED tokens (whitespace-collapsed only); the digest
    # lowercases per segment, matching _tokens_col()'s channel exactly
    case_tokens = F.split(
        F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")), " "
    )
    with_segs = docs.withColumn("wt", case_tokens).withColumn("segs", segs)
    # 16-byte BINARY digests (r16, same §2.3 bijection as the span
    # digests: unhex of md5 is injective, so the frequent-digest
    # equality classes -- and with them every output row -- are
    # untouched while the corpus-sized digest aggregate and the
    # per-doc reassembly join shuffle half the key bytes)
    digests = with_segs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(segs,"
                " s -> unhex(md5(encode(lower(s), 'UTF-8'))))"
            )
        ).alias("h"),
    )
    frequent = (
        digests.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= min_dup)
        .select("h")
    )
    # per-doc set of frequent digests present in THAT doc (small: bounded
    # by segments per doc), joined back on doc_id
    if broadcast_frequent:
        frequent = F.broadcast(frequent)
    doc_freq = (
        digests.join(frequent, "h")
        .groupBy("doc_id")
        .agg(F.collect_set("h").alias("freq_h"))
    )
    rewritten = (
        with_segs.join(doc_freq, "doc_id", "left")
        .withColumn(
            "freq_h",
            F.coalesce("freq_h", F.expr("CAST(array() AS ARRAY<BINARY>)")),
        )
        .select(
            "doc_id",
            F.when(F.col("wt").isNull(), F.lit(None).cast("string"))
            .otherwise(
                F.array_join(
                    F.expr(
                        "filter(segs, s -> NOT array_contains("
                        "freq_h, unhex(md5(encode(lower(s), 'UTF-8')))))"
                    ),
                    " ",
                )
            )
            .alias("text"),
        )
    )
    return rewritten


def split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-hygiene screen: val/test documents that NEAR-DUPLICATE a
    train document -- the leakage that silently inflates every held-out
    metric and that per-doc decontamination misses (the eval doc is not
    IN the training set, a near-copy of it is).

    Composes the existing machinery end to end: the verified near-dup
    pair graph (shared persisted shingle index) joined against the
    deterministic hash split (``train_sample_split``'s thresholds), kept
    where a pair crosses the train/eval boundary. Output: one row per
    leaked eval doc with its closest train counterpart.

    Scale shape: the pair graph is the expensive part and is already
    built/bounded by the near-dup operator; the split is a scan-local
    projection; the boundary check is a projection over the (tiny)
    verified pair set. The remedy -- drop or re-split the leaked docs --
    is one anti-join, same as decontamination.
    """
    from .training import split_col

    pairs = _pair_jaccard(shingled_docs(spark, sf_dir))
    splits = read_table(spark, sf_dir, "documents").select(
        "doc_id", split_col().alias("split")
    )
    sa = splits.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    sb = splits.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    crossed = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(
            ((F.col("split_a") == "train") & (F.col("split_b") != "train"))
            | ((F.col("split_b") == "train") & (F.col("split_a") != "train"))
        )
    )
    eval_doc = F.when(F.col("split_a") == "train", F.col("doc_b")).otherwise(
        F.col("doc_a")
    )
    train_doc = F.when(F.col("split_a") == "train", F.col("doc_a")).otherwise(
        F.col("doc_b")
    )
    eval_split = F.when(
        F.col("split_a") == "train", F.col("split_b")
    ).otherwise(F.col("split_a"))
    w = Window.partitionBy("eval_doc").orderBy(
        F.desc("jaccard"), F.asc("train_doc")
    )
    return (
        crossed.select(
            eval_doc.alias("eval_doc"),
            eval_split.alias("eval_split"),
            train_doc.alias("train_doc"),
            "jaccard",
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


#: Build the stride-1 span digests with the Arrow kernel (default)
#: instead of the Catalyst transform/md5 expression -- the same
#: playbook as SHINGLE_KERNEL (r15, VERDICT r14 #3: the interpreted
#: explode was span_deduped's dominant term, 120.1s/216M spans at 4M
#: per tools/span_attrib.py, and the composed operator pays it TWICE:
#: once for the frequent-digest aggregate, once for the flag join).
#: The expression path stays as the oracle-mirroring reference and is
#: pinned bit-equal by tests/test_span_kernel.py's differential; the
#: kernel engages only when the behavioral locale probe certifies
#: lower() bit-equality (see _kernel_locale_ok).
SPAN_KERNEL = True

#: Above this many documents (footer row count) size-aware callers ask
#: for the kernel; below it the expression path wins -- the kernel's
#: fixed per-task Python/Arrow overhead dominates tiny inputs (measured
#: sf0.1/5k docs: expr 0.46s vs kernel 0.88s) while the per-span C
#: speed dominates at scale (1M docs: expr 19.8s vs kernel 13.4s for
#: the same 54M-span explode; the 4M in-DAG term was 120s interpreted).
SPAN_KERNEL_BOUND = 250_000


def _span_occ_expr(with_toks: DataFrame, window: int) -> DataFrame:
    """(doc_id, pos, h) stride-1 span digests via the Catalyst
    expression rendering -- the literal Spark-SQL transcription of the
    dedup_span_mask oracle's occ CTE, with ``h`` carried as the
    16-BYTE BINARY digest instead of the 32-char hex rendering (r15:
    the digest is grouped/joined on, never output, and unhex is a
    bijection, so equality classes -- and with them every downstream
    row -- are untouched while the corpus-sized aggregate and join
    shuffle half the key bytes; measured 42.2s -> 35.5s for the 1M
    frequent-table stage). ``with_toks`` must carry the case-preserved
    token array ``wt``. Short docs are guarded explicitly (sequence()
    counts DOWN past an inverted bound)."""
    return with_toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"IF(size(wt) >= {window},"
                f" transform(sequence(0, size(wt) - {window}),"
                f" i -> unhex(md5(encode(lower(concat_ws(' ',"
                f" slice(wt, i + 1, {window}))), 'UTF-8')))),"
                " CAST(array() AS ARRAY<BINARY>))"
            )
        ).alias("pos", "h"),
    )


def _span_occ_kernel(docs: DataFrame, window: int) -> DataFrame:
    """(doc_id, pos, h) stride-1 span digests via a ``mapInArrow``
    kernel, bit-equal to :func:`_span_occ_expr` term by term (the
    differential test pins it on real + adversarial corpora):

    - tokens: ``split(trim(regexp_replace(text, '\\\\s+', ' ')), ' ')``
      with CASE PRESERVED -> the compiled Java-ASCII whitespace class
      ``[ \\t\\n\\x0b\\f\\r]+`` (Python's ``\\s`` also eats Unicode
      whitespace -- the shingle-kernel lesson), ``strip(' ')`` (Spark
      trim removes 0x20 only), ``s.split(' ')`` (both keep empties).
    - digest: ``unhex(md5(encode(lower(concat_ws(' ', window)),
      'UTF-8')))`` -> ``md5(' '.join(toks[i:i+w]).lower().encode())
      .digest()`` -- identical 16 raw bytes (unhex of the hex rendering
      IS the digest); lower() runs on the JOINED window in both
      renderings, and the kernel only engages when the executor locale
      probe certifies Python/JVM lowercase equality (same guard as
      SHINGLE_KERNEL).
    - NULL text emits no rows (``size(NULL) = -1`` fails the length
      guard); a NULL doc_id's span rows flow through with a NULL id
      exactly as posexplode emits them; docs shorter than ``window``
      tokens emit nothing.

    Scale shape: embarrassingly parallel over doc rows -- no shuffle,
    no state; output is the same (doc_id, int pos, 32-hex digest)
    stream the expression path emits, so every downstream exchange is
    unchanged. mapInArrow (not mapInPandas) for the same
    int64-with-NULL exactness reason as the shingle kernel.
    """
    import pyarrow as pa

    def gen(batches):
        import hashlib
        import re

        md5 = hashlib.md5
        ws = re.compile("[ \t\n\x0b\f\r]+")
        for batch in batches:
            texts = batch.column("text").to_pylist()
            # replicate doc_id by Arrow take() instead of rebuilding it
            # from Python objects: the input column's exact type (and
            # NULLs) pass through, so the kernel is doc_id-type-agnostic
            # -- any schema the expression path handles, this does too.
            idxs: list[int] = []
            poss: list[int] = []
            hs: list[bytes] = []
            for row_i, text in enumerate(texts):
                if not isinstance(text, str):
                    continue
                toks = ws.sub(" ", text).strip(" ").split(" ")
                n = len(toks) - window + 1
                if n < 1:
                    continue
                idxs.extend([row_i] * n)
                poss.extend(range(n))
                joined = " ".join(toks)
                # running char offsets let each window digest slice the
                # joined string instead of re-joining per position
                hs.extend(
                    md5(joined[s:e].lower().encode("utf-8")).digest()
                    for s, e in _window_offsets(toks, window)
                )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id").take(
                        pa.array(idxs, type=pa.int64())
                    ),
                    pa.array(poss, type=pa.int32()),
                    pa.array(hs, type=pa.binary()),
                ],
                ["doc_id", "pos", "h"],
            )

    id_type = docs.schema["doc_id"].dataType.simpleString()
    return docs.select("doc_id", "text").mapInArrow(
        gen, schema=f"doc_id {id_type}, pos int, h binary"
    )


def _window_offsets(toks: list[str], window: int):
    """(start, end) char offsets of each ``window``-token span inside
    ``' '.join(toks)`` -- one pass, so the kernel never re-joins the
    same tokens per position. ``' '.join(toks[i:i+w])`` equals the
    slice between the i-th token's start and the (i+w-1)-th token's
    end by construction (single-space joins both ways)."""
    starts: list[int] = []
    pos = 0
    for t in toks:
        starts.append(pos)
        pos += len(t) + 1
    ends = [s + len(t) for s, t in zip(starts, toks)]
    n = len(toks) - window + 1
    return zip(starts[:n], ends[window - 1 :])


def mask_repeated_spans(
    docs: DataFrame,
    window: int = LINE_TOKENS,
    min_dup: int = LINE_MIN_DUP,
    *,
    keep_first: bool = True,
    broadcast_frequent: bool = True,
    kernel: bool | None = None,
) -> DataFrame:
    """Substring-level dedup: mask token SPANS that repeat across the
    corpus -- the passage-granularity step between doc-level dedup (too
    coarse: two docs sharing one long quote are not duplicates) and
    line-level boilerplate strip (too rigid: fixed non-overlapping
    segments miss any repeat that straddles a segment boundary).

    Distributed approximation of suffix-array ExactSubstr dedup (Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): every OVERLAPPING ``window``-token span is digested
    (stride 1, so a repeated passage is caught at ANY alignment); spans
    whose digest occurs >= ``min_dup`` times corpus-wide are flagged;
    per doc, flagged spans MERGE into maximal intervals (overlapping
    windows of one long repeat coalesce, so the whole repeated passage
    masks as a unit, exactly the maximal-repeat behavior the suffix
    array computes exactly); covered tokens are dropped and survivors
    re-join in order. The approximation vs the suffix array: repeats
    shorter than ``window`` tokens are invisible, and a repeat of
    length L is detected only via its full-window sub-spans (detected
    extent = the union of flagged windows). The reference has no such
    operator (its corpus is numeric micro-batches); this is north-star
    extension surface, inventoried in SURVEY 2.12.

    ``keep_first=True`` (the paper's semantics) leaves the globally
    FIRST occurrence of each repeated span intact -- first = min
    (doc_id, pos) over the span digest's occurrences, a deterministic
    total order -- and masks the rest, so content survives exactly
    once. ``keep_first=False`` strips every occurrence (the
    boilerplate-removal stance of ``strip_boilerplate``, for spans
    frequent enough to be template noise).

    Output: (doc_id, text, masked_tokens, n_spans -- the count of
    maximal merged intervals). ORIGINAL CASE is preserved
    in survivors; digests ride the lowercased whitespace-collapsed
    channel (lower() distributes over the space-joined window, matching
    ``_tokens_col``/``strip_boilerplate`` byte for byte). NULL text
    stays NULL; a doc shorter than ``window`` tokens has no spans and
    passes through (the explicit size guard matters: ``sequence(0, n)``
    with n < 0 counts DOWN, it is not empty). A doc that was entirely
    repeated spans becomes ''.

    Scale shape -- document text never shuffles: the stride-1 explode
    emits (doc_id, pos, 16-byte digest) rows, ~1 per corpus token (the
    same order of work as the shingle index, which is also stride-1);
    the occurrence count is one map-side-combinable HashAggregate on
    the digest; the frequent table (corpus-sublinear, digest + first
    occurrence) joins back to the position rows -- broadcast by
    default, ``broadcast_frequent=False`` for blocklist-scale corpora
    (same knob as ``strip_boilerplate``); interval merge is one window
    + one combinable groupBy, all keyed by doc_id with (int, int)
    records; the rewrite happens map-side inside the final scan stage
    against each doc's own (tiny) merged-interval array. Unlike pair
    mining there is NO quadratic candidate stage to cap: a corpus-hot
    span digest joins ONE frequent-table row however often it occurs,
    so skew cannot blow up the join -- cost is linear in occurrences by
    construction.

    Measured scale-law (local[32], round 5, warm, best-of-2): a
    dup-heavy synthetic corpus (every doc carries a ~30-token passage
    repeated ~10x corpus-wide, ~90 tokens/doc) runs in 1.53s at 5k docs
    and 3.67s at 50k docs -- 2.4x the time for 10x the docs and 10x the
    masked output (135k -> 1.35M tokens): cost tracks input + output,
    not corpus^2.
    """
    case_tokens = F.split(
        F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")), " "
    )
    with_toks = docs.withColumn("wt", case_tokens)
    # stride-1 window digests with positions -- the Arrow kernel when
    # the caller asks for it (``kernel=None`` defaults to on; size-
    # aware callers pass ``n_docs > SPAN_KERNEL_BOUND``) AND the locale
    # probe certifies lower() bit-equality; else the expression
    # rendering (see SPAN_KERNEL; both paths differential-pinned
    # bit-equal). The composed operator evaluates occ twice (frequent
    # aggregate + flag join), so this is the dominant term.
    use_kernel = SPAN_KERNEL if kernel is None else kernel
    occ = (
        _span_occ_kernel(docs, window)
        if use_kernel and SPAN_KERNEL and _kernel_locale_ok(docs.sparkSession)
        else _span_occ_expr(with_toks, window)
    )
    frequent = (
        occ.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.min(F.struct("doc_id", "pos")).alias("first"),
        )
        .where(F.col("c") >= min_dup)
        .select("h", "first.doc_id", "first.pos")
        .withColumnRenamed("doc_id", "first_doc")
        .withColumnRenamed("pos", "first_pos")
    )
    if broadcast_frequent:
        frequent = F.broadcast(frequent)
    flagged = occ.join(frequent, "h")
    if keep_first:
        flagged = flagged.where(
            (F.col("doc_id") != F.col("first_doc"))
            | (F.col("pos") != F.col("first_pos"))
        )
    # merge overlapping/adjacent flagged windows into maximal intervals
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    spans = flagged.select(
        "doc_id", "pos", (F.col("pos") + F.lit(window)).alias("end")
    )
    prev_max = F.max("end").over(
        w_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = (
        spans.withColumn(
            "new_island",
            F.when(
                prev_max.isNull() | (F.col("pos") > prev_max), F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .withColumn("island", F.sum("new_island").over(w_doc))
        .groupBy("doc_id", "island")
        .agg(F.min("pos").alias("s"), F.max("end").alias("e"))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("s", "e"))).alias("ivs"))
    )
    rewritten = (
        with_toks.join(islands, "doc_id", "left")
        .withColumn(
            "ivs",
            F.coalesce(
                "ivs", F.expr("CAST(array() AS ARRAY<STRUCT<s: INT, e: INT>>)")
            ),
        )
        .select(
            "doc_id",
            F.when(F.col("wt").isNull(), F.lit(None).cast("string"))
            .otherwise(
                # array_join skips NULL elements: covered tokens null
                # out map-side and vanish from the joined text
                F.expr(
                    "array_join(transform(wt, (tok, i) ->"
                    " IF(exists(ivs, iv -> i >= iv.s AND i < iv.e),"
                    " CAST(NULL AS STRING), tok)), ' ')"
                )
            )
            .alias("text"),
            F.coalesce(
                F.expr("aggregate(ivs, 0, (acc, iv) -> acc + iv.e - iv.s)"),
                F.lit(0),
            ).alias("masked_tokens"),
            F.size("ivs").alias("n_spans"),
        )
    )
    return rewritten


@register(
    "dedup_span_mask",
    oracle=rf"""
        WITH toks AS (
            SELECT doc_id,
                   string_split(trim(regexp_replace(text, '\s+', ' ', 'g')),
                                ' ') AS wt
            FROM documents
            WHERE text IS NOT NULL),
        occ AS (
            SELECT doc_id, i,
                   md5(lower(array_to_string(
                       list_slice(wt, i + 1, i + {LINE_TOKENS}), ' '))) AS h
            FROM toks, UNNEST(range(0, len(wt) - {LINE_TOKENS - 1})) AS u(i)
            WHERE len(wt) >= {LINE_TOKENS}),
        flagged AS (
            SELECT doc_id, i FROM (
                SELECT doc_id, i,
                       COUNT(*) OVER (PARTITION BY h) AS c,
                       ROW_NUMBER() OVER (PARTITION BY h
                                          ORDER BY doc_id, i) AS rn
                FROM occ)
            WHERE c >= {LINE_MIN_DUP} AND rn > 1),
        islands AS (
            SELECT doc_id, island,
                   MIN(i) AS s, MAX(i + {LINE_TOKENS}) AS e
            FROM (
                SELECT doc_id, i,
                       SUM(CASE WHEN pm IS NULL OR i > pm
                                THEN 1 ELSE 0 END)
                           OVER (PARTITION BY doc_id ORDER BY i) AS island
                FROM (
                    SELECT doc_id, i,
                           MAX(i + {LINE_TOKENS}) OVER (
                               PARTITION BY doc_id ORDER BY i
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS pm
                    FROM flagged))
            GROUP BY doc_id, island),
        doc_islands AS (
            SELECT doc_id,
                   CAST(SUM(e - s) AS BIGINT) AS masked_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_spans
            FROM islands GROUP BY doc_id),
        tok_rows AS (
            SELECT t.doc_id, u.i, t.wt[u.i + 1] AS tok
            FROM toks t
            JOIN doc_islands d ON d.doc_id = t.doc_id,
            UNNEST(range(0, len(t.wt))) AS u(i)),
        survivors AS (
            SELECT t.doc_id, t.i, t.tok
            FROM tok_rows t
            LEFT JOIN islands v
              ON v.doc_id = t.doc_id AND t.i >= v.s AND t.i < v.e
            WHERE v.doc_id IS NULL),
        agg AS (
            SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS masked_text
            FROM survivors GROUP BY doc_id)
        SELECT d.doc_id,
               md5(coalesce(a.masked_text, '')) AS masked_text_hash,
               d.masked_tokens, d.n_spans
        FROM doc_islands d LEFT JOIN agg a ON a.doc_id = d.doc_id
    """,
    doc="Substring-level span dedup (round 5): `mask_repeated_spans` -- the "
    "distributed ExactSubstr approximation (Lee et al. 2022) -- over the "
    "documents corpus with the default (window=10, min_dup=2, keep_first) "
    "geometry, rendered driver-hashable as one row per AFFECTED doc: "
    "doc_id, md5 of the masked text (so the full rewritten content is "
    "value-checked without emitting corpus text), total masked tokens, "
    "and the count of maximal merged intervals. The oracle recomputes the "
    "whole pipeline relationally in DuckDB -- stride-1 window digests, "
    "first-occurrence exemption via ROW_NUMBER over (doc_id, pos), "
    "gaps-and-islands interval merge, and a survivor-token string_agg "
    "rebuild -- so keep-first semantics, interval coalescing, and the "
    "exact byte-level rewrite are all cross-engine-pinned. Scale shape "
    "documented on the operator: text never shuffles; digests+positions "
    "do (~1 row per corpus token, same order as the shingle index); no "
    "quadratic candidate stage exists to cap.",
    bench=True,
    tags=("dedup", "span", "llm-data"),
)
def dedup_span_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Widen the single-file scan BEFORE the stride-1 explode: the
    # per-position md5 is the dominant map cost and must spread over
    # every core, not ride one parquet split (at warehouse scale the
    # table arrives as thousands of splits and this is a guarded no-op).
    docs = read_table(spark, sf_dir, "documents", widen=True).select(
        "doc_id", "text"
    )
    # size-gated kernel choice: the Arrow digest kernel wins above
    # SPAN_KERNEL_BOUND docs and loses to its fixed per-task overhead
    # below it (both paths bit-equal, so this is purely a cost choice)
    n_docs = table_row_count(sf_dir, "documents")
    return (
        mask_repeated_spans(
            docs, kernel=n_docs is not None and n_docs > SPAN_KERNEL_BOUND
        )
        .where(F.col("masked_tokens") > 0)
        .select(
            "doc_id",
            F.md5(F.encode("text", "UTF-8")).alias("masked_text_hash"),
            F.col("masked_tokens").cast("long").alias("masked_tokens"),
            F.col("n_spans").cast("long").alias("n_spans"),
        )
    )


#: Containment gate: |A ∩ B| / min(|A|, |B|) -- the asymmetric overlap
#: measure. 0.9 means 90% of the SMALLER doc's shingles appear in the
#: larger one.
CONTAINMENT_THRESHOLD = 0.9

#: Containment is meaningless for trivially small shingle sets (any two
#: docs sharing one template phrase would "contain" a 2-shingle doc);
#: both sides must carry at least this many capped shingles.
CONTAINMENT_MIN_SH = 5


def containment_pairs(
    sh: DataFrame,
    threshold: float = CONTAINMENT_THRESHOLD,
    min_shingles: int = CONTAINMENT_MIN_SH,
) -> DataFrame:
    """Doc-in-doc detection: pairs where the SMALLER document's shingle
    set is (near-)contained in the larger one's -- the quote-expansion /
    page-plus-boilerplate duplication that symmetric Jaccard
    structurally misses. A doc B embedded verbatim in a 3x-longer doc A
    has containment 1.0 but Jaccard ~1/3, far below
    ``JACCARD_THRESHOLD``, so ``dedup_neardup_verified`` keeps both; a
    training corpus usually wants the contained copy dropped (its
    content already rides the superset doc).

    Same machinery as the near-dup miner -- ``sh`` is the (doc_id,
    sid, n_sh) shingle index, normally the SHARED persisted
    ``shingled_docs`` output; inverted-index equi-join on the 8-byte
    sid, one map-side-combinable pair-count aggregate -- with the
    asymmetric
    gate containment = |A ∩ B| / min(|A|, |B|) >= ``threshold``. The
    size-compatibility prefilter that protects the Jaccard join is
    deliberately ABSENT (incompatibly-sized pairs are exactly the
    interesting ones); what bounds the join instead is the
    ``min_shingles`` floor (pruned at the index scan: both sides must
    carry >= ``min_shingles`` capped shingles, killing the
    every-tiny-doc-is-contained blowup) plus the same DF_CAP
    stop-shingle cap that keeps candidate generation linear.

    Output: (doc_a, doc_b, containment, jaccard, contained_doc) with
    doc_a < doc_b; ``contained_doc`` is the smaller-shingle-set side
    (ties to the smaller id -- deterministic). Jaccard rides along for
    free from the same counts, so callers can distinguish "true subset"
    (high containment, low jaccard) from "plain near-dup" (both high).
    """
    sh = sh.where(F.col("n_sh") >= F.lit(min_shingles))
    a = sh.select(
        F.col("doc_id").alias("doc_a"), "sid", F.col("n_sh").alias("na")
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"), "sid", F.col("n_sh").alias("nb")
    )
    inter = (
        a.join(b, "sid")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("icnt"),
            F.min("na").alias("na"),
            F.min("nb").alias("nb"),
        )
    )
    cont = F.col("icnt").cast("double") / F.least("na", "nb")
    jac = F.col("icnt").cast("double") / (
        F.col("na") + F.col("nb") - F.col("icnt")
    )
    contained = F.when(F.col("na") < F.col("nb"), F.col("doc_a")).otherwise(
        F.when(F.col("nb") < F.col("na"), F.col("doc_b")).otherwise(
            F.least("doc_a", "doc_b")
        )
    )
    return inter.select(
        "doc_a",
        "doc_b",
        cont.alias("containment"),
        jac.alias("jaccard"),
        contained.alias("contained_doc"),
    ).where(F.col("containment") >= F.lit(threshold))
