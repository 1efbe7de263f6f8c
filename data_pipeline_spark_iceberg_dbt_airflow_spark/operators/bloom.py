"""Bloom-filter blocklist gate (shuffle-avoiding membership screening).

The 100 TB curation problem this solves: screen a corpus against a
blocklist (URL/document digests -- takedowns, opt-outs, benchmark
contamination ids) that is too large to broadcast as a hash join but
whose MEMBERSHIP BITS fit comfortably in memory (~1.2 bits/item/hash at
practical sizes). The exact anti-join would shuffle the whole corpus on
the key; the bloom gate instead answers "definitely not listed" for the
overwhelming majority of rows inside the scan stage, and only the tiny
maybe-listed remainder pays the exact join. No false negatives by
construction, so the screened set is IDENTICAL to the exact anti-join's
-- the filter only prunes work, never changes the answer (pinned in
tests/test_bloom.py).

Spark 4 does not expose ``bloom_filter_agg``/``might_contain`` as public
SQL functions (they are internal to runtime join filtering), and
``df.stat.bloomFilter`` yields a driver-only JVM object unusable in a
Column. So both halves are built from public primitives, and both stay
JVM-side:

- **Build** is one map-side-combinable aggregate: each key explodes to
  its ``num_hashes`` bit positions (xxhash64 with distinct seeds), and
  ``bit_or`` folds them into ``num_bits/64`` words -- every map task
  emits at most one partial row per word, so the shuffle is
  filter-sized, not blocklist-sized. The driver collect is the finished
  word array: bounded by ``num_bits``, independent of blocklist rows.
- **Probe** ships the word array as a SINGLE-ROW broadcast
  (BroadcastNestedLoopJoin against one row: the corpus side never
  shuffles, the words materialize once per executor) and tests all
  ``num_hashes`` bits with codegen shift/AND arithmetic against the
  bound array column. NOT an inlined literal: codegen rebuilds a
  156k-element array literal per row (measured 308s vs 2.2s per 1M
  probes -- see ``with_bloom_flag``).

Measured (local[32], round 4, md5 keys, 10 bits/key + 4 hashes):
1M-key blocklist -> build 2.4s (1.2 MB filter), probe 1M keys 2.2s,
observed fp rate 1.17% vs 1.18% theoretical; 100k keys -> build 0.9s,
same fp rate. Build and probe both track input size, filter size only
shows up as broadcast bytes. False-positive rate follows the standard
``(1 - e^{-kn/m})^k``; each false positive costs one row in the
exact-join remainder, never a wrong answer.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Hash-seed base: xxhash64(seed=_SEED_BASE + i) gives num_hashes
#: independent channels; fixed so filters are reproducible run to run.
_SEED_BASE = 0x9E3779B9

DEFAULT_BITS_PER_KEY = 10
DEFAULT_NUM_HASHES = 4


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The key's bit positions: pmod keeps them in [0, num_bits)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(_SEED_BASE + i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    num_bits: int,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> list[int]:
    """Build the filter; returns the packed word array (num_bits/64 longs).

    One combinable ``bit_or`` shuffle of at most num_bits/64 groups; the
    collect is model-sized. NULL keys are skipped (a NULL key cannot be
    blocklisted; probe returns false for NULL too).
    """
    if num_bits % 64 != 0:
        raise ValueError("num_bits must be a multiple of 64")
    n_words = num_bits // 64
    pos = F.explode(
        F.array(*_positions(F.col(key_col), num_bits, num_hashes))
    ).alias("pos")
    words = (
        keys.where(F.col(key_col).isNotNull())
        .select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("w"),
            # SQL shiftleft takes a column shift count (the PySpark
            # wrapper's numBits is int-only, hence expr)
            F.expr("shiftleft(1L, CAST(pmod(pos, 64) AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    packed = [0] * n_words
    for row in words:
        packed[row["w"]] = row["bits"]
    return packed


def _probe_cond(bf: Column, key: Column, num_bits: int, num_hashes: int) -> Column:
    """The all-bits-set test against a BOUND word-array column."""
    cond = None
    for p in _positions(key, num_bits, num_hashes):
        word = F.get(bf, (p / 64).cast("int"))
        this = F.getbit(word, F.pmod(p, F.lit(64))) == 1
        cond = this if cond is None else (cond & this)
    return key.isNotNull() & F.coalesce(cond, F.lit(False))


def with_bloom_flag(
    df: DataFrame,
    words: list[int],
    key: Column,
    out_col: str,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Add ``out_col`` = might-contain flag (True = MAY be in the build
    set at the sizing fp rate; False = DEFINITELY not; NULL key = False).

    The word array rides in as a single-row broadcast
    (BroadcastNestedLoopJoin against one row -- no shuffle of ``df``,
    materialized once per executor), and the bit test is codegen
    shift/AND arithmetic against that bound column. An earlier rendering
    inlined the words as an array LITERAL; codegen rebuilds such a
    literal per row, which measured 308s/1M probes at 156k words vs
    2.2s/1M for the broadcast row -- the literal form is only viable for
    toy filters, so this is the only probe path.
    """
    num_bits = len(words) * 64
    bf = df.sparkSession.createDataFrame([(words,)], "__bf array<bigint>")
    return (
        df.crossJoin(F.broadcast(bf))
        .withColumn(out_col, _probe_cond(F.col("__bf"), key, num_bits, num_hashes))
        .drop("__bf")
    )


def blocklist_screen(
    corpus: DataFrame,
    blocklist: DataFrame,
    key_col: str,
    bits_per_key: int = DEFAULT_BITS_PER_KEY,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Drop corpus rows whose ``key_col`` appears in ``blocklist`` --
    exact anti-join semantics at bloom-gate cost.

    Rows failing the gate ("definitely not listed", the overwhelming
    majority under any realistic blocklist ratio) are emitted straight
    from the scan; only maybe-listed rows enter the exact
    ``left_anti`` join that removes true members and restores the false
    positives. NULL keys are unlistable and pass through.

    Cost model note: the union's two branches each read the corpus (the
    deliberate trade -- scans are the cheap term; the avoided full-key
    shuffle is the expensive one, and folding both branches into one
    pass would need a null-keyed outer join that routes every clean row
    to a single reducer). A pipeline that finds the double scan
    material persists the flagged frame once or applies the gate inside
    its sink write.
    """
    n = blocklist.where(F.col(key_col).isNotNull()).count()
    num_bits = max(64, ((max(n, 1) * bits_per_key + 63) // 64) * 64)
    words = bloom_build(blocklist, key_col, num_bits, num_hashes)
    flagged = with_bloom_flag(
        corpus, words, F.col(key_col), "__maybe", num_hashes
    )
    clean = flagged.where(~F.col("__maybe")).drop("__maybe")
    suspects = (
        flagged.where(F.col("__maybe"))
        .drop("__maybe")
        .join(blocklist.select(key_col).distinct(), key_col, "left_anti")
    )
    return clean.unionByName(suspects)


def bloom_fp_rate(num_bits: int, num_keys: int, num_hashes: int) -> float:
    """Theoretical false-positive rate (1 - e^{-kn/m})^k, for sizing."""
    return (1.0 - math.exp(-num_hashes * num_keys / num_bits)) ** num_hashes
