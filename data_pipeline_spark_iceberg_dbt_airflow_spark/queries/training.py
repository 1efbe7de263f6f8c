"""Training-data pipeline operators over ``documents``.

The north-star brief adds the operations a large-scale LLM training-data
pipeline needs beyond classic analytics (BASELINE.json; dedup / text /
similarity live in their own modules). This module covers the curation
steps between "cleaned corpus" and "training batches":

- deterministic sampling + split   (train_sample_split, consolidated)
- document chunking                (train_chunk_documents)
- sequence packing into bins       (train_pack_sequences)
- deterministic global shuffle     (train_global_shuffle)

Cross-engine determinism: every random-looking decision is a pure function
of the row key via md5 hex (the engine-portable hash this repo standardizes
on, see queries/dedup.py) -- lexicographic comparison against hex
thresholds replaces rand(). A row's sample membership, split, and shuffle
position are therefore stable across engines, runs, AND backfills: at
100 TB re-sampling a corpus must not reshuffle previously assigned rows,
which rand()-based sampling cannot guarantee.

Oracle type discipline (round-3 fix): DuckDB SUM(BIGINT) widens to HUGEINT
(pandas float64) while Spark stays BIGINT -- every integer SUM in an
oracle is CAST back to BIGINT. The chunking oracle derives its fan-out
per-row (unnest of a range list) instead of joining a fixed range(0, 64)
table, so documents beyond 64 chunks cannot silently diverge; both sides
guard n_chars > 0.

Scale design (100 TB):
- Sampling/split are scan-local predicates/projections -- no shuffle; the
  md5 predicate doesn't prune parquet, but each executor drops rows at scan
  time so only the sampled fraction reaches downstream operators.
- Chunking is a map-side fan-out (sequence + posexplode), no join against a
  numbers table and no shuffle.
- Packing partitions by ``lang`` so each window sorts one shard -- a
  running sum within key-partitioned windows, not a global sort. A real
  100 TB run shards by (lang, hash-bucket) the same way; bins never span
  shards by design.
- Global shuffle is the one intentionally global op: rows are bucketed by
  the hash's first byte (256 ordered buckets), ranked bucket-locally in
  parallel, and offset by the broadcast running count of the preceding
  buckets -- global positions without a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import read_table
from .registry import register

#: 512-char chunks advancing 400 chars -> 112-char overlap between chunks.
CHUNK_SIZE = 512
CHUNK_STRIDE = 400

#: Packing budget in characters (stand-in for tokens; same arithmetic).
PACK_BUDGET = 8192

#: Weighted-sample branch of train_sample_split: draw size and the hash
#: seed shared by weighted_sample and the oracle's key CTE.
WEIGHTED_K = 100
_WS_SEED = "ws1"

#: Hash-split boundaries (hex prefixes of md5(doc_id)): < TRAIN -> train,
#: < VAL -> val, else test (~80/10/10). THE single source of truth --
#: the oracle SQL, the Spark split expression, the pipeline's assigned
#: stage, and dedup.split_leakage all reference these.
SPLIT_TRAIN_HEX = "cc"
SPLIT_VAL_HEX = "e6"


def split_col() -> F.Column:
    """train/val/test assignment from md5(doc_id)'s first hex byte."""
    pfx = F.substring(_doc_hash(), 1, 2)
    return (
        F.when(pfx < SPLIT_TRAIN_HEX, "train")
        .when(pfx < SPLIT_VAL_HEX, "val")
        .otherwise("test")
    )


def _doc_hash() -> F.Column:
    """md5 hex of the document key -- the deterministic 'randomness'."""
    return F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8"))


_ORACLE_HASH = "md5(CAST(doc_id AS VARCHAR))"


@register(
    "train_sample_split",
    oracle=f"""
        WITH wkeys AS (
            SELECT doc_id,
                   ln((CAST(list_sum(list_transform(range(13),
                         i -> (strpos('0123456789abcdef',
                                 substr(md5('{_WS_SEED}' || CAST(doc_id AS VARCHAR)),
                                        CAST(i + 1 AS INT), 1)) - 1)
                              * (16 ** (12 - i)))) AS DOUBLE) + 1.0)
                      / {float(16**13 + 1)!r})
                   / CAST(n_chars + 1 AS DOUBLE) AS k
            FROM documents
            WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
              AND n_chars + 1 > 0
        ),
        wsel AS (SELECT doc_id FROM wkeys ORDER BY k DESC, doc_id
                 LIMIT {WEIGHTED_K})
        SELECT CASE WHEN substr({_ORACLE_HASH}, 1, 2) < '{SPLIT_TRAIN_HEX}'
                         THEN 'train'
                    WHEN substr({_ORACLE_HASH}, 1, 2) < '{SPLIT_VAL_HEX}'
                         THEN 'val'
                    ELSE 'test' END AS split,
               lang,
               COUNT(*) AS n_docs,
               COUNT(*) FILTER (WHERE substr({_ORACLE_HASH}, 1, 2) < '1a')
                   AS n_sampled,
               COUNT(*) FILTER (WHERE
                   substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 2) <
                   CASE WHEN source IN ('src0','src1','src2','src3','src4')
                        THEN '40' ELSE 'cc' END) AS n_mixture,
               COUNT(*) FILTER (WHERE doc_id IN (SELECT doc_id FROM wsel))
                   AS n_weighted,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY 1, 2
    """,
    doc="Deterministic sampling + train/val/test assignment, consolidated "
    "(was train_hash_sample + train_split_assign): hash-based 80/10/10 "
    "split via hex thresholds 0xcc/0xe6 on md5(doc_id), counted per "
    "(split, lang), with n_sampled additionally counting the ~10% subset "
    "whose hex prefix falls below 0x1a (26/256 = 10.2%) -- the same "
    "membership test a sampling pass applies at scan time. n_mixture is "
    "CURRICULUM MIXTURE sampling: each source gets its own rate (25% for "
    "src0-4, 80% for the rest -- the up/down-weighting a training-data "
    "recipe applies per source), decided on an INDEPENDENT hash channel "
    "(md5('mix|'||doc_id)) so mixture membership does not correlate with "
    "the plain sample. n_weighted (round 4) counts membership in the "
    f"global top-{WEIGHTED_K} Efraimidis-Spirakis WEIGHTED draw "
    "(weight = n_chars+1; see weighted_sample below) -- selection rides "
    "ln() doubles, whose last-ulp engine differences cannot flip "
    "membership unless two keys straddle the K-boundary within 1 ulp "
    "(verified identical on the driver datasets; the counts, not the "
    "keys, are what is hashed). Pure projection + one tiny aggregation "
    "plus one TakeOrdered pass for the weighted set; a document can "
    "never migrate between splits (or in/out of any sample) when the "
    "corpus grows, unlike fraction-based randomSplit -- the "
    "backfill-safe replacement for rand().",
    tags=("training", "llm-data", "sampling"),
)
def train_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    prefix = F.substring(_doc_hash(), 1, 2)
    split = split_col()
    mix_pfx = F.substring(
        F.md5(
            F.encode(
                F.concat(F.lit("mix|"), F.col("doc_id").cast("string")),
                "UTF-8",
            )
        ),
        1,
        2,
    )
    mix_thresh = F.when(
        F.col("source").isin("src0", "src1", "src2", "src3", "src4"),
        F.lit("40"),
    ).otherwise(F.lit("cc"))
    docs = read_table(spark, sf_dir, "documents")
    eligible = docs.where(
        F.col("doc_id").isNotNull()
        & F.col("n_chars").isNotNull()
        & ((F.col("n_chars") + 1) > 0)
    ).select("doc_id", (F.col("n_chars") + 1).cast("double").alias("w"))
    wsel = weighted_sample(
        eligible, WEIGHTED_K, "w", id_col="doc_id", seed=_WS_SEED
    ).select("doc_id", F.lit(True).alias("in_weighted"))
    return (
        docs.join(F.broadcast(wsel), "doc_id", "left")
        .select(
            split.alias("split"),
            "lang",
            "n_chars",
            prefix.alias("pfx"),
            (mix_pfx < mix_thresh).alias("in_mix"),
            "in_weighted",
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_if(F.col("pfx") < "1a").alias("n_sampled"),
            F.count_if(F.col("in_mix")).alias("n_mixture"),
            F.count_if(F.coalesce("in_weighted", F.lit(False))).alias(
                "n_weighted"
            ),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "train_chunk_documents",
    oracle=f"""
        SELECT doc_id, u.i AS chunk_idx,
               substr(text, CAST(u.i * {CHUNK_STRIDE} + 1 AS INT), {CHUNK_SIZE})
                   AS chunk
        FROM documents,
             UNNEST(range(0, CAST(floor((n_chars - 1) / {CHUNK_STRIDE}) AS BIGINT) + 1))
                 AS u(i)
        WHERE n_chars > 0
    """,
    doc="Overlapping-window document chunking (512-char windows, 400-char "
    "stride) for context-length-bounded training. Spark side is "
    "sequence + posexplode: pure map-side fan-out, one scan, no numbers-"
    "table join and no shuffle; the oracle unnests a per-row range list "
    "with the same bound (round-3 fix: the old fixed range(0,64) join "
    "silently capped docs over 25,600 chars). Both sides guard "
    "n_chars > 0 so empty documents emit no chunks.",
    tags=("training", "llm-data", "chunking"),
)
def train_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    n_chunks = F.greatest(
        F.floor((F.col("n_chars") - 1) / CHUNK_STRIDE), F.lit(0)
    ).cast("int")
    return (
        docs.select(
            "doc_id",
            "text",
            F.posexplode(F.sequence(F.lit(0), n_chunks)).alias("chunk_idx", "_i"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.expr(
                f"substring(text, CAST(chunk_idx * {CHUNK_STRIDE} + 1 AS INT),"
                f" {CHUNK_SIZE})"
            ).alias("chunk"),
        )
    )


@register(
    "train_pack_sequences",
    oracle=f"""
        SELECT lang, bin_id, COUNT(*) AS docs_in_bin,
               CAST(SUM(n_chars) AS BIGINT) AS bin_chars
        FROM (
            SELECT lang, n_chars,
                   CAST(floor((SUM(n_chars) OVER (
                        PARTITION BY lang ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        - n_chars) / {PACK_BUDGET}) AS BIGINT) AS bin_id
            FROM documents
        )
        GROUP BY lang, bin_id
    """,
    doc="Sequence packing: assign documents to fixed-budget training bins "
    "(8192 chars) by running-sum bucketing within each language shard -- "
    "bin_id = floor(exclusive-cumsum / budget). Per-lang windows keep the "
    "sort shard-local (no global sort); output is per-bin fill stats. "
    "The streaming-cumsum formulation packs in one pass, unlike bin-"
    "packing heuristics that need the whole shard resident.",
    bench=True,
    tags=("training", "llm-data", "packing"),
)
def train_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    docs = read_table(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    binned = docs.withColumn(
        "bin_id",
        F.floor((F.sum("n_chars").over(w) - F.col("n_chars")) / PACK_BUDGET),
    )
    return binned.groupBy("lang", "bin_id").agg(
        F.count(F.lit(1)).alias("docs_in_bin"),
        F.sum("n_chars").alias("bin_chars"),
    )


@register(
    "train_global_shuffle",
    oracle=f"""
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY {_ORACLE_HASH}, doc_id) AS shuffle_pos
        FROM documents
    """,
    doc="Deterministic global shuffle for training-order assignment: "
    "position = rank of md5(doc_id) (doc_id tiebreak for absolute "
    "determinism); identical order every run, any engine -- epoch "
    "reshuffles just salt the hash input. Two-phase enumeration: a naive "
    "row_number over a global ORDER BY would collapse 100 TB into ONE "
    "window partition, so instead rows are bucketed by the hash's first "
    "byte (256 ordered buckets), ranked bucket-locally in parallel, and "
    "offset by the broadcast running count of the preceding buckets -- "
    "global positions without a global sort. Lexicographic bucket order "
    "== lexicographic hash order, so the result equals the naive rank.",
    bench=True,
    tags=("training", "llm-data", "shuffle"),
)
def train_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", _doc_hash().alias("h")
    )
    return _shuffle_positions(docs)


def _shuffle_positions(docs: DataFrame) -> DataFrame:
    """2-phase global rank over the ``h`` hash column (the shared core
    of the registry query and the per-epoch variant below)."""
    # Bucket = first hex byte of the hash: 256 buckets, hash-uniform sizes.
    # Because bucket is a PREFIX of h, ordering by (bucket, h) == ordering
    # by h: bucket-local ranks + bucket offsets reproduce the global rank.
    bucketed = docs.withColumn("bucket", F.substring("h", 1, 2))
    local = F.row_number().over(
        Window.partitionBy("bucket").orderBy("h", "doc_id")
    )
    # 256-row offset table: rows in all lexicographically-earlier buckets.
    counts = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    offsets = counts.select(
        "bucket",
        (
            F.sum("n").over(
                Window.orderBy("bucket").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            - F.col("n")
        ).alias("offset"),
    )
    return (
        bucketed.withColumn("local_pos", local)
        .join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            (F.col("offset") + F.col("local_pos")).cast("long").alias("shuffle_pos"),
        )
    )


def epoch_shuffle(docs: DataFrame, epoch: int) -> DataFrame:
    """A fresh deterministic permutation per training EPOCH: the hash
    channel is salted with the epoch number, so every epoch re-orders
    the corpus independently while any (epoch, corpus) pair reproduces
    exactly -- the property a resumable multi-epoch run needs (restart
    epoch 3 and get epoch 3's order, not a new random one).

    Same 2-phase shape and cost as ``train_global_shuffle``; at 100 TB
    each epoch's permutation is priced once at shard-write time
    (``io.write_training_shards``), which is where a real run pays it.
    """
    h = F.md5(
        F.encode(
            F.concat(
                F.lit(f"epoch{int(epoch)}|"), F.col("doc_id").cast("string")
            ),
            "UTF-8",
        )
    )
    return _shuffle_positions(docs.select("doc_id", h.alias("h")))


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    stratum_col: str | None = None,
    seed: str = _WS_SEED,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (top-k of the
    Efraimidis-Spirakis exponential keys).

    Curation mixtures need "sample k documents with probability
    proportional to quality weight" -- reproducibly, so a backfill
    re-draws the identical sample. Each row gets the key
    ``ln(u) / w`` where ``u`` is a uniform derived from md5(seed, id)
    (the repo's engine-portable hash channel, independent of the
    split/shuffle channels) and ``w`` its weight; the k LARGEST keys
    are exactly an A-ES weighted draw without replacement
    [Efraimidis & Spirakis 2006, Inf. Process. Lett. 97(5)]. No rand(),
    no driver state: membership is a pure row function.

    Scale shape: the key is one scan-local projection. The global cut is
    ``orderBy(desc).limit(k)`` -- TakeOrderedAndProject, a per-partition
    heap + one k-row merge, never a full sort. With ``stratum_col`` the
    cut is a row_number window partitioned by stratum ("k per source"),
    the same shuffle any per-stratum operator pays. Rows with NULL or
    non-positive weight are excluded (zero-weight must never be drawn).

    Determinism: u is a pure hex-prefix function of (seed, id); ln and
    the division are fixed-order per-row IEEE ops, so keys -- and hence
    the selected set -- are identical across runs and partitionings
    (pinned in tests/test_llm_ops.py).
    """
    w = F.col(weight_col).cast("double")
    # 13 hex chars = 52 bits, exact in a double; +1 keeps u > 0 so ln(u)
    # is finite.
    frac = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))), 1, 13),
            16,
            10,
        ).cast("double")
        + 1.0
    ) / float(16**13 + 1)
    key = F.log(frac) / w
    keyed = df.where(w.isNotNull() & (w > 0)).withColumn("__wkey", key)
    if stratum_col is None:
        out = keyed.orderBy(F.desc("__wkey"), F.asc(id_col)).limit(k)
    else:
        win = Window.partitionBy(stratum_col).orderBy(
            F.desc("__wkey"), F.asc(id_col)
        )
        out = keyed.withColumn("__rn", F.row_number().over(win)).where(
            F.col("__rn") <= k
        ).drop("__rn")
    return out.drop("__wkey")


#: Content-defined chunking knobs: rolling window, boundary probability
#: 1/CDC_MASK_MOD per position, and the min/max chunk bounds.
CDC_WINDOW = 8
CDC_MASK_MOD = 64
CDC_MIN_CHUNK = 16
CDC_MAX_CHUNK = 256


def chunk_cdc(
    docs: DataFrame,
    window: int = CDC_WINDOW,
    mask_mod: int = CDC_MASK_MOD,
    min_chunk: int = CDC_MIN_CHUNK,
    max_chunk: int = CDC_MAX_CHUNK,
    text_col: str = "text",
) -> DataFrame:
    """Content-defined chunking: boundaries where the rolling window's
    hash satisfies a mask, instead of fixed strides.

    Why a training pipeline wants it: fixed-stride chunks SHIFT when a
    document is edited or re-crawled with a new header -- every chunk
    downstream of the edit changes identity, so chunk-level dedup and
    caching miss everything. Content-defined boundaries re-synchronize
    within one window of an edit (the storage-dedup CDC property), so
    unchanged text keeps its chunk identity across corpus versions.

    Declarative rendering -- the whole algorithm is Catalyst array
    expressions inside one projection, no UDF, no shuffle:
    1. candidate boundaries = positions whose trailing ``window``-gram
       hashes to 0 mod ``mask_mod`` (xxhash64 on the substring);
    2. a left FOLD (`aggregate`) enforces ``min_chunk`` by skipping
       candidates too close to the last accepted one -- the inherently
       sequential step, expressed as the fold it is;
    3. gaps over ``max_chunk`` split by stride (forced boundaries);
    4. posexplode emits (doc_id, chunk_idx, chunk).

    Output chunks concatenate back to the exact original text. NULL
    and empty texts emit no chunks; short docs (< window) are one
    chunk. Sub-``min_chunk`` chunks occur only as the document tail or
    as the remainder right after a forced ``max_chunk`` split (forced
    boundaries are position-, not content-, defined by necessity).

    Cost note: the min-gap fold copies its accumulator per accepted
    candidate, so per-document work is O(candidates^2 / ...) in the
    worst case -- irrelevant for web-scale documents (KBs: tens of
    candidates) but a megabyte-scale document should be pre-split (or
    the mask_mod raised) before this pass; the mapInPandas tier is the
    escape hatch if such documents dominate.
    """
    cand = (
        f"CASE WHEN length(__t) >= {window} THEN"
        f" filter(sequence({window}, length(__t)),"
        f" p -> pmod(xxhash64(substring(__t, p - {window} + 1, {window})),"
        f" {mask_mod}) = 0)"
        f" ELSE CAST(array() AS ARRAY<INT>) END"
    )
    accepted = (
        f"aggregate({cand}, array(0),"
        f" (acc, b) -> CASE WHEN b - element_at(acc, -1) >= {min_chunk}"
        f" AND b < length(__t)"
        f" THEN concat(acc, array(b)) ELSE acc END)"
    )
    bounds = f"concat({accepted}, array(length(__t)))"
    pairs = (
        f"flatten(transform("
        f" transform(sequence(1, size({bounds}) - 1),"
        f"  i -> struct(element_at({bounds}, i) AS lo,"
        f"              element_at({bounds}, i + 1) AS hi)),"
        f" pr -> transform(sequence(pr.lo, pr.hi - 1, {max_chunk}),"
        f"  s -> struct(s AS lo, least(s + {max_chunk}, pr.hi) AS hi))))"
    )
    return (
        docs.where(F.col(text_col).isNotNull() & (F.length(text_col) > 0))
        .select("doc_id", F.col(text_col).alias("__t"))
        .select(
            "doc_id",
            "__t",
            F.posexplode(F.expr(pairs)).alias("chunk_idx", "pr"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.expr("substring(__t, pr.lo + 1, pr.hi - pr.lo)").alias("chunk"),
        )
    )


def plan_mixture(
    per_source_tokens: dict[str, int],
    weights: dict[str, float],
    budget_tokens: int,
    allow_repetition: bool = False,
) -> dict[str, dict]:
    """Turn a token budget + desired mixture weights into per-source
    sampling rates -- the planning step in front of the deterministic
    mixture channel (``train_sample_split``'s n_mixture thresholds).

    Each source's target is its normalized weight's share of the
    budget. A source smaller than its target either REPEATS
    (``allow_repetition``: rate > 1 = epochs over that source, the
    standard up-weighting) or caps at rate 1.0 with its deficit
    WATER-FILLED onto the remaining sources by weight -- iterated
    until stable, so the budget is met exactly whenever the corpus can
    meet it. Driver-side arithmetic over the (tiny) source list; the
    resulting rate maps onto the scan-local hash predicate as
    ``substr(md5('mix|'||id),1,2) < hex(round(rate*256))`` -- the same
    channel the registry query uses, so planned mixtures inherit its
    backfill stability.

    Returns {source: {target_tokens, rate, sampled_tokens}}.
    """
    weights = {s: weights.get(s, 0.0) for s in per_source_tokens}
    w_total = sum(weights.values())
    if w_total <= 0:
        raise ValueError("mixture weights must sum to a positive value")
    out = {
        s: {"target_tokens": budget_tokens * weights[s] / w_total}
        for s in per_source_tokens
    }
    if allow_repetition:
        for s, e in out.items():
            have = per_source_tokens[s]
            e["rate"] = e["target_tokens"] / have if have else 0.0
            e["sampled_tokens"] = e["target_tokens"] if have else 0.0
        return out
    active = {s for s, n in per_source_tokens.items() if n > 0}
    remaining = float(budget_tokens)
    for s in set(out) - active:
        out[s].update(rate=0.0, sampled_tokens=0.0)
    while active:
        aw = sum(weights[s] for s in active)
        if aw <= 0:
            break
        capped = {
            s
            for s in active
            if remaining * weights[s] / aw >= per_source_tokens[s]
        }
        if not capped:
            for s in active:
                tgt = remaining * weights[s] / aw
                out[s].update(
                    rate=tgt / per_source_tokens[s], sampled_tokens=tgt
                )
            break
        for s in capped:
            out[s].update(
                rate=1.0, sampled_tokens=float(per_source_tokens[s])
            )
            remaining -= per_source_tokens[s]
        active -= capped
    # Sources the loop never reached (zero weight, or all weight went to
    # capped sources) are drawn from at rate 0 -- every entry always
    # carries the full key set.
    for s, e in out.items():
        e.setdefault("rate", 0.0)
        e.setdefault("sampled_tokens", 0.0)
    return out
