"""Distributed BPE (byte-pair-encoding) tokenizer training + encoding.

Round 4 shipped the frequency-vocab tokenizer (``text.build_vocab`` /
``encode_docs``); this module adds the real thing: learning SUBWORD
merges from the corpus (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units" -- the algorithm behind
GPT-2/RoBERTa-class tokenizers). The reference has no text surface at
all; this is north-star extension inventory (SURVEY 2.12).

The scale trick is the one every real BPE trainer uses: training never
touches documents after the first scan. The corpus collapses to the
DISTINCT-WORD COUNT TABLE (token, n) -- corpus-sublinear, Zipf-bounded
-- and all ``n_merges`` iterations run over that table's symbol arrays:

1. ``words``: one map-side explode + combinable groupBy(token) count
   (the only document-sized shuffle in training).
2. The merge loop then runs on one of two engines -- the merge loop is
   inherently sequential (merge k+1's counts depend on merge k's
   rewrite), so the scalable design question is WHERE the per-merge
   work happens, and the answer depends only on the WORD-TABLE size,
   never the corpus size:

   - **Driver engine (the default path)**: when the word table fits a
     row bound (``driver_word_bound``, default 5M rows -- hundreds of
     MB of (word, n) pairs, trivially driver-resident), collect it
     ONCE and run the merge loop in-process: a lazy max-heap over pair
     counts plus incremental count updates touching only the words
     that contain the winning pair (the reference Sennrich
     `learn_bpe` index structure). Per merge this is microseconds,
     not a Spark job -- a 32k-merge production vocab is minutes, where
     one-job-per-merge would be days of scheduler overhead on any
     cluster. This is exactly why reference BPE trainers train
     driver-side on the collected word-count table: the table is
     Zipf-sublinear (millions of rows at 100 TB), the corpus is not.
   - **Distributed engine (the over-bound fallback)**: per merge,
     adjacent symbol pairs explode from each word's array weighted by
     word count -> one combinable groupBy(pair) sum -> the argmax pair
     comes to the driver as ONE row (count desc, pair asc -- the
     deterministic tie-break; a tie broken by partition order would
     make the learned tokenizer drift run to run). The winning pair is
     then merged into every word's symbol array MAP-SIDE by a
     left-fold Catalyst expression (greedy non-overlapping
     left-to-right, exactly the reference semantics: pair (a,a) on
     "aaaa" -> [aa, aa], on "aaa" -> [aa, a]). Lineage is
     localCheckpoint-bounded every few merges (same posture as
     operators/graph.connected_components); at cluster scale swap in
     reliable checkpointing.

   Both engines implement identical semantics (same argmax tie-break,
   same greedy rewrite); a crossover test pins merge-list equality on
   the same corpus. One documented caveat: ties between pair symbols
   containing astral-plane characters could order differently (Spark
   compares UTF-16 code units, Python code points); counts, not
   spelling, decide real corpora.

Scale shape of the shared first stage and the distributed engine, with
a supporting spot measurement (local[32], round 5, 10 merges, warm,
single run each -- the 0.5s delta is inside this
VM's documented ambient noise band, so read the DIRECTION, not the
decimals): a synthetic Zipf corpus at 5k docs (833 distinct words)
trained in ~3.3s and at 50k docs (2,363 distinct words) in ~3.8s --
10x the documents moved wall time far less than 10x, because cost
rides the Zipf-sublinear word table plus a fixed per-merge driver
round trip, not the corpus. At 100 TB the word table is still
millions of rows, not billions of documents.

Encoding (``bpe_encode``) applies the learned merge ranks per word via
the classic lowest-rank-first algorithm. That is a per-word priority
loop -- genuinely imperative -- so it rides the fast Python tier: one
Arrow-batched pandas_udf with the merge table broadcast in the closure
(model-sized, like the k-means centroids), applied map-side with zero
shuffle. Training stays 100% JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: End-of-word marker appended to every word's symbol sequence (the
#: Sennrich formulation): merges learned at word ends stay distinct
#: from word-internal ones, and decoding can reconstruct boundaries.
EOW = "</w>"

#: Checkpoint the evolving word table every this many merges to keep
#: plan lineage (and codegen size) bounded.
CHECKPOINT_EVERY = 8


def _word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over the whitespace-split, case-PRESERVING token
    channel (``text._toks``'s regex on ``text_col``) -- the
    corpus-sublinear table all training iterations run on."""
    # one expression for any column name (identical to _toks() when
    # text_col == 'text' -- no second code path to keep in sync)
    toks = F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), F.lit(0))
    return (
        docs.select(F.explode(toks).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _merge_expr(col: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) -> a||b inside a
    symbol array, as a single codegen fold (no UDF, no shuffle)."""
    la, lb, lab = F.lit(a), F.lit(b), F.lit(a + b)
    return F.aggregate(
        col,
        F.expr("CAST(array() AS ARRAY<STRING>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == la)
            & (x == lb),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(lab)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


#: Word tables at or under this many rows train driver-side (the fast
#: engine); larger tables fall back to the distributed merge loop. 5M
#: (word, n) rows is hundreds of MB -- far under driver memory, and far
#: over any real corpus's Zipf-bounded distinct-word count.
DRIVER_WORD_BOUND = 5_000_000


def _train_bpe_driver(
    word_rows: list[tuple[str, int]], n_merges: int, min_pair_count: int
) -> list[tuple[str, str]]:
    """The in-process merge engine: Sennrich's `learn_bpe` with an
    inverted pair->words index, incremental pair-count updates, and a
    lazy max-heap for the argmax. Per merge: O(touched words) updates +
    amortized O(log pairs) selection -- no Spark job. Semantics are
    bit-for-bit the distributed engine's: argmax tie-break (count desc,
    pair asc) and greedy left-to-right non-overlapping rewrite."""
    import heapq

    words: list[list] = [
        [list(w) + [EOW], int(n)] for w, n in word_rows
    ]
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for idx, (syms, n) in enumerate(words):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + n
            pair_words.setdefault(p, set()).add(idx)
    # lazy heap: entries are (-count, a, b) snapshots; an entry is live
    # iff its count still equals the current count (counts move ->
    # a fresh entry was pushed, so the true argmax is always present)
    heap = [(-c, a, b) for (a, b), c in pair_counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        best = None
        while heap:
            negc, a, b = heap[0]
            if pair_counts.get((a, b), 0) == -negc:
                best = (a, b, -negc)
                break
            heapq.heappop(heap)  # stale snapshot
        if best is None or best[2] < min_pair_count:
            break
        a, b, _cnt = best
        merges.append((a, b))
        merged = a + b
        touched: set[tuple[str, str]] = set()
        # the index is a SUPERSET (never pruned on rewrite), so a
        # member word may no longer contain the pair -- the rewrite
        # no-ops and we skip it. pop() is safe: the greedy fold leaves
        # no (a, b) adjacency behind, and merged-symbol spellings can
        # never re-create one (merged != a because b is non-empty).
        for idx in sorted(pair_words.pop((a, b), ())):
            syms, n = words[idx]
            new: list[str] = []
            for x in syms:
                if new and new[-1] == a and x == b:
                    new[-1] = merged
                else:
                    new.append(x)
            if len(new) == len(syms):
                continue  # stale index member: pair no longer present
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                c = pair_counts.get(p, 0) - n
                if c > 0:
                    pair_counts[p] = c
                else:
                    pair_counts.pop(p, None)
                touched.add(p)
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + n
                pair_words.setdefault(p, set()).add(idx)
                touched.add(p)
            words[idx][0] = new
        for p in touched:
            c = pair_counts.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p[0], p[1]))
    return merges


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    min_pair_count: int = 2,
    text_col: str = "text",
    driver_word_bound: int = DRIVER_WORD_BOUND,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from the corpus; returns the
    ordered merge list [(left, right), ...] -- the tokenizer model.

    Stops early when the best remaining pair occurs fewer than
    ``min_pair_count`` times (merging noise would memorize the corpus).
    Deterministic: same corpus -> same merges, any partitioning.

    The corpus-sized work (word counting) is always distributed; the
    merge loop runs driver-side when the distinct-word table has at
    most ``driver_word_bound`` rows (see module docstring -- this is
    what makes a 32k-merge vocab reachable), distributed otherwise.
    Pass ``driver_word_bound=0`` to force the distributed engine.
    """
    wc = _word_counts(docs, text_col)
    if driver_word_bound > 0:
        # one action, not two: collecting bound+1 rows both answers the
        # size probe and, when under-bound, IS the word table -- the
        # old count()-then-collect() ran the word-count shuffle twice
        probe = wc.limit(driver_word_bound + 1).collect()
        if len(probe) <= driver_word_bound:
            rows = [(r["word"], r["n"]) for r in probe]
            return _train_bpe_driver(rows, n_merges, min_pair_count)
    chars = F.expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
    )
    words = wc.select(
        F.concat(chars, F.array(F.lit(EOW))).alias("syms"), "n"
    )
    words = words.localCheckpoint(eager=True)
    # adjacent pairs; the size guard matters: sequence() counts DOWN
    # past an inverted bound, so 1-symbol words must emit no pairs
    pair_col = F.expr(
        "IF(size(syms) >= 2,"
        " transform(sequence(0, size(syms) - 2),"
        " i -> struct(syms[i] AS a, syms[i + 1] AS b)),"
        " CAST(array() AS ARRAY<STRUCT<a: STRING, b: STRING>>))"
    )
    merges: list[tuple[str, str]] = []
    for step in range(n_merges):
        best = (
            words.select(F.explode(pair_col).alias("p"), "n")
            .groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()  # ONE row per merge: the argmax pair
        )
        if not best or best[0]["cnt"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        words = words.select(_merge_expr(F.col("syms"), a, b).alias("syms"), "n")
        if (step + 1) % CHECKPOINT_EVERY == 0:
            words = words.localCheckpoint(eager=True)
    return merges


def bpe_encode(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list: (doc_id, tokens
    array<string>) where each word is segmented by applying merges in
    rank order (lowest rank first -- the reference BPE apply loop).

    The merge table is model-sized and rides the udf closure (an
    Arrow-batched broadcast, like kmeans' literal centroids); the udf
    runs map-side in the scan stage -- zero shuffle, plan-asserted in
    tests. NULL text -> NULL; the whitespace, case-PRESERVING token
    channel is identical to training's (``text._toks``); run
    ``text.normalize_text`` upstream of BOTH if the corpus needs
    Unicode canonicalization.
    """
    import re

    from pyspark.sql.functions import pandas_udf

    # Java's default \S (the training channel's regexp_extract_all) is
    # the ASCII class; Python's str.split() splits Unicode whitespace
    # too (NBSP etc.) and would tokenize differently -- match Java's
    # class exactly
    _token_re = re.compile(r"[^ \t\n\x0b\f\r]+")
    ranks = {pair: i for i, pair in enumerate(merges)}

    def _encode_word(word: str) -> list[str]:
        syms = list(word) + [EOW]
        while len(syms) >= 2:
            pairs = [(syms[i], syms[i + 1]) for i in range(len(syms) - 1)]
            ranked = [
                (ranks[p], i) for i, p in enumerate(pairs) if p in ranks
            ]
            if not ranked:
                break
            _, i = min(ranked)
            syms[i : i + 2] = [syms[i] + syms[i + 1]]
        return syms

    def _encode_text(s):
        if s is None:
            return None
        out: list[str] = []
        for w in _token_re.findall(s):
            out.extend(_encode_word(w))
        return out

    # unhinted: the module-wide future-annotations import stringifies
    # type hints, which pandas_udf cannot infer from (scalar default)
    @pandas_udf("array<string>")
    def _enc(batch):
        return batch.map(_encode_text)

    return docs.select("doc_id", _enc(F.col(text_col)).alias("tokens"))
