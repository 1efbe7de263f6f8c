"""Deduplication operators over the ``documents`` table.

The reference has no dedup surface of its own (its tables are append-only
micro-batches, /root/reference/Iceberg-dbt-project/scripts/
extract_bitcoin_prices.py:150-193); these operators are the
training-data-pipeline extension the north-star calls for: exact dedup,
n-gram Jaccard near-dup, MinHash+LSH banded near-dup, and SimHash
fingerprinting, all expressed as declarative DataFrame plans with DuckDB
oracles running the identical formula.

Cross-engine determinism: every hash is ``md5`` over an explicit UTF-8
string (hex output is identical in Spark and DuckDB) and every MIN over
hashes is a lexicographic min over hex strings -- no engine-specific hash
functions anywhere.

Scale design (100 TB):
- Exact dedup is a single hash-shuffle on md5(text) -- the canonical
  map-side-combinable groupBy; never a sort.
- Near-dup NEVER does all-pairs: candidate pairs come from an equi-join
  on shared shingles (inverted index) or shared LSH band keys, both plain
  hash-shuffles on the join key. A document-frequency cap drops
  stop-shingles so one hot shingle cannot produce a quadratic pair blowup
  (the classic skew killer; cap mirrored in the oracle so semantics stay
  exact).
- MinHash signatures are 8 permutations -> 4 bands x 2 rows; signature
  build is |shingles| x 8 rows shuffled once on (doc_id, seed). Banding
  makes the join linear in near-dup density rather than quadratic in
  corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import read_table, widen_for_compute
from .registry import register

#: Shingles appearing in more than this many docs are dropped (stop-shingle
#: cap; keeps the inverted-index join linear under skew). Mirrored verbatim
#: in every oracle.
DF_CAP = 100

#: Near-dup verification threshold on true n-gram Jaccard.
JACCARD_THRESHOLD = 0.5

_NORM = "trim(regexp_replace(lower(text), '\\\\s+', ' '))"

#: Shared oracle CTEs: whitespace-normalized word tokens -> distinct word
#: 3-gram shingles per doc -> document-frequency-capped shingle index.
ORACLE_SHINGLE_CTES = rf"""
    toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        FROM documents),
    shingles AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(len(t) - 2),
                      i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS shingle
        FROM toks WHERE len(t) >= 3),
    capped AS (
        SELECT s.doc_id, s.shingle
        FROM shingles s
        JOIN (SELECT shingle FROM shingles
              GROUP BY shingle HAVING COUNT(*) <= {DF_CAP}) keep
          USING (shingle))
"""


def _tokens_col() -> F.Column:
    """Whitespace-normalized word tokens (identical to the oracle's CTE)."""
    return F.split(F.expr(_NORM), " ")


def shingled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct word 3-gram shingles per doc, document-frequency capped.

    The inverted-index building block shared by the Jaccard and MinHash
    near-dup operators. Per-doc dedup happens ROW-SIDE (array_distinct
    before explode -- no corpus-wide distinct shuffle); the df-cap is one
    groupBy(shingle) + semi-join. Callers that traverse the index more
    than once persist the result (materialize-the-index, the same call a
    production pipeline makes at 100 TB rather than re-scanning text).
    """
    # Shingling is the CPU-bound stage of the whole dedup family; make sure
    # it runs on every core even when the scan is a single parquet split.
    docs = widen_for_compute(read_table(spark, sf_dir, "documents"))
    sh = (
        docs.select("doc_id", _tokens_col().alias("t"))
        .where(F.size("t") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "array_distinct(transform(sequence(0, size(t)-3),"
                    " i -> concat_ws(' ', t[i], t[i+1], t[i+2])))"
                )
            ).alias("shingle"),
        )
    )
    keep = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= DF_CAP)
        .select("shingle")
    )
    return sh.join(keep, "shingle").select("doc_id", "shingle")


@register(
    "dedup_exact_hash",
    oracle="""
        SELECT md5(text) AS text_hash,
               MIN(doc_id) AS keep_doc_id,
               COUNT(*) AS dup_cnt
        FROM documents
        GROUP BY md5(text)
    """,
    doc="Exact dedup via content hash: one surviving doc_id per distinct "
    "md5(text), plus the duplicate count. Single map-side-combinable "
    "hash-shuffle on the 128-bit digest -- the only correct exact-dedup "
    "shape at 100 TB (never orderBy/dropDuplicates on the raw text, which "
    "shuffles full documents; the digest is 16 bytes).",
    bench=True,
    tags=("dedup", "llm-data"),
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.groupBy(
        F.md5(F.encode("text", "UTF-8")).alias("text_hash")
    ).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("dup_cnt"),
    )


@register(
    "dedup_keep_first_normalized",
    oracle=r"""
        SELECT doc_id, lang, source
        FROM (SELECT doc_id, lang, source,
                     ROW_NUMBER() OVER (
                         PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                         ORDER BY doc_id) AS rn
              FROM documents)
        WHERE rn = 1
    """,
    doc="Exact dedup keeping the full surviving row: normalize (lowercase, "
    "collapse whitespace), hash, keep the lowest doc_id per hash via "
    "row_number. The keep-full-row variant of dedup_exact_hash -- one "
    "window shuffle on the digest, no self-join back to the corpus.",
    tags=("dedup", "llm-data"),
)
def dedup_keep_first_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy(
        F.md5(F.encode(F.expr(_NORM), "UTF-8"))
    ).orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "lang", "source")
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
        WITH {ORACLE_SHINGLE_CTES},
        n AS (SELECT doc_id, COUNT(*) AS n_sh FROM capped GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS icnt
            FROM capped a
            JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id)
        SELECT i.doc_a, i.doc_b,
               CAST(icnt AS DOUBLE) / (na.n_sh + nb.n_sh - icnt) AS jaccard
        FROM inter i
        JOIN n na ON na.doc_id = i.doc_a
        JOIN n nb ON nb.doc_id = i.doc_b
        WHERE CAST(icnt AS DOUBLE) / (na.n_sh + nb.n_sh - icnt)
              >= {JACCARD_THRESHOLD}
    """,
    doc="Word-3-gram Jaccard near-dup: candidate pairs share at least one "
    "shingle (inverted-index equi-join, NOT all-pairs), true Jaccard = "
    "|intersection| / |union| from exact integer counts, threshold 0.5. "
    "The df-cap keeps one hot shingle from exploding the pair count; "
    "the pair-generation join and the intersection groupBy shuffle on the "
    "same keys so AQE can coalesce.",
    bench=True,
    tags=("dedup", "llm-data"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The index feeds three consumers (pair join x2, per-doc counts):
    # materialize it once instead of re-tokenizing the corpus three times.
    sh = shingled_docs(spark, sf_dir).persist()
    n = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("icnt"))
    )
    na = n.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    nb = n.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = F.col("icnt").cast("double") / (
        F.col("na") + F.col("nb") - F.col("icnt")
    )
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


#: MinHash geometry: NUM_PERM permutations split into BANDS bands of
#: ROWS_PER_BAND rows. P(candidate) = 1 - (1 - j^r)^b -- steep around
#: j ~ 0.5 with (8, 4, 2).
NUM_PERM = 8
ROWS_PER_BAND = 2


@register(
    "dedup_minhash_lsh",
    oracle=f"""
        WITH {ORACLE_SHINGLE_CTES},
        seeds AS (SELECT unnest(range({NUM_PERM})) AS seed),
        minh AS (
            SELECT doc_id, seed,
                   MIN(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS minh
            FROM capped CROSS JOIN seeds
            GROUP BY doc_id, seed),
        bands AS (
            SELECT doc_id, seed // {ROWS_PER_BAND} AS band,
                   string_agg(minh, ',' ORDER BY seed) AS band_key
            FROM minh GROUP BY doc_id, seed // {ROWS_PER_BAND}),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a
            JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                        AND a.doc_id < b.doc_id),
        n AS (SELECT doc_id, COUNT(*) AS n_sh FROM capped GROUP BY doc_id),
        inter AS (
            SELECT c.doc_a, c.doc_b, COUNT(*) AS icnt
            FROM cand c
            JOIN capped sa ON sa.doc_id = c.doc_a
            JOIN capped sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
            GROUP BY c.doc_a, c.doc_b)
        SELECT i.doc_a, i.doc_b,
               CAST(icnt AS DOUBLE) / (na.n_sh + nb.n_sh - icnt) AS jaccard
        FROM inter i
        JOIN n na ON na.doc_id = i.doc_a
        JOIN n nb ON nb.doc_id = i.doc_b
        WHERE CAST(icnt AS DOUBLE) / (na.n_sh + nb.n_sh - icnt)
              >= {JACCARD_THRESHOLD}
    """,
    doc="MinHash+LSH near-dup, the 100 TB-scale path: per-doc signature of "
    "8 min-hashes (md5-keyed permutations, lexicographic min over hex -- "
    "engine-portable), banded 4x2; docs sharing a band key become "
    "candidates via an equi-join on (band, band_key); candidates are then "
    "VERIFIED against true shingle Jaccard >= 0.5. Unlike "
    "dedup_ngram_jaccard, pair generation never touches the full inverted "
    "index -- band keys are 1 row per (doc, band), so the join input is "
    "4 rows/doc regardless of document length.",
    bench=True,
    tags=("dedup", "llm-data", "minhash"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = shingled_docs(spark, sf_dir).persist()
    # All NUM_PERM min-hashes in ONE map-side-combinable groupBy(doc_id) --
    # no seeds x shingles row expansion, no per-(doc, seed) shuffle. Each
    # permutation is min over md5('<seed>|' || shingle), identical to the
    # oracle's CROSS JOIN seeds formulation.
    minh = sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.md5(
                    F.encode(
                        F.concat_ws("|", F.lit(str(s)), F.col("shingle")), "UTF-8"
                    )
                )
            ).alias(f"m{s}")
            for s in range(NUM_PERM)
        ]
    )
    # Band keys row-side: band b = seeds [b*r, b*r+r), key = comma-join in
    # seed order (= the oracle's string_agg ORDER BY seed).
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                ",",
                *[F.col(f"m{s}") for s in range(b * ROWS_PER_BAND, (b + 1) * ROWS_PER_BAND)],
            ).alias("band_key"),
        )
        for b in range(NUM_PERM // ROWS_PER_BAND)
    ]
    bands = minh.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("icnt"))
    )
    n = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    na = n.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    nb = n.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = F.col("icnt").cast("double") / (
        F.col("na") + F.col("nb") - F.col("icnt")
    )
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
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
    docs = widen_for_compute(read_table(spark, sf_dir, "documents"))
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
