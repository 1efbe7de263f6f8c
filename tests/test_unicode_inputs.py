"""Unicode-text differential sweep.

Spark runs Java regex/string semantics, DuckDB runs RE2/UTF-8 -- a drift
risk for every text operator (`\\s` classes, length() code-point counts,
case mapping, md5 over multi-byte text). This sweep rewrites the
documents corpus with accents, CJK, emoji, tabs, NBSP, and sharp-s
case-folding traps, then re-runs the text/dedup/training/UDF query
families differentially. Zero expected divergences: both engines count
code points for length(), treat NBSP as non-\\s, and md5 the identical
UTF-8 bytes.
"""

from __future__ import annotations

import shutil

import duckdb
import pytest

from data_pipeline_spark_iceberg_dbt_airflow_spark.io import TABLES, table_path
from data_pipeline_spark_iceberg_dbt_airflow_spark.queries import all_queries
from tests.oracle import compare, run_oracle

FAMILIES = ("text", "dedup", "train", "udf", "multimodal")


@pytest.fixture(scope="module")
def unicode_sf_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("uni_sf")
    src_dir = "/root/testdata/sf0.001"
    for t in TABLES:
        if t != "documents":
            shutil.copy(table_path(src_dir, t), base / f"{t}.parquet")
    con = duckdb.connect()
    try:
        con.execute(rf"""
        COPY (
          SELECT doc_id,
                 CASE doc_id % 6
                   WHEN 0 THEN 'Caf'||chr(233)||' r'||chr(233)||'sum'
                               ||chr(233)||' '||text
                   WHEN 1 THEN chr(20013)||chr(25991)||chr(27979)
                               ||chr(35797)||' '||text
                   WHEN 2 THEN replace(text, ' ', chr(9))
                   WHEN 3 THEN chr(128512)||' '||text
                   WHEN 4 THEN upper(text)||' '||chr(223)
                   ELSE text||chr(10)||chr(160)||'fin'
                 END AS text,
                 lang, source, n_chars
          FROM read_parquet('{table_path(src_dir, "documents")}')
        ) TO '{base / "documents.parquet"}' (FORMAT PARQUET)
        """)
    finally:
        con.close()
    return str(base)


def test_text_families_survive_unicode(spark, unicode_sf_dir):
    failures = []
    for name, spec in all_queries().items():
        if not any(k in name for k in FAMILIES):
            continue
        try:
            df = spec.spark_fn(spark, unicode_sf_dir)
            if spec.oracle is not None:
                compare(df, run_oracle(spec.oracle, unicode_sf_dir))
            else:
                df.count()
        except Exception as ex:
            failures.append(f"{name}: {type(ex).__name__} {str(ex)[:160]}")
    assert not failures, "\n".join(failures)


def test_round4_text_operators_handle_unicode_and_nulls(spark):
    """CDC chunks reassemble codepoint-exact unicode text; hash_embed
    and strip_boilerplate tolerate NULL text alongside emoji/CJK."""
    from pyspark.sql import functions as F

    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.dedup import (
        strip_boilerplate,
    )
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.text import (
        hash_embed,
    )
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.training import (
        chunk_cdc,
    )

    uni = "héllo wörld éè 数据处理流水线 🚀🔥 " * 20
    docs = spark.createDataFrame(
        [(1, uni), (2, None), (3, "ascii only text here")],
        "doc_id long, text string",
    )
    pieces = {}
    for r in chunk_cdc(docs).collect():
        pieces.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk"]))
    assert "".join(c for _, c in sorted(pieces[1])) == uni  # codepoint-exact
    assert 2 not in pieces

    vecs = {r["doc_id"]: r["embedding"] for r in hash_embed(docs).collect()}
    assert len(vecs) == 3 and all(x == 0.0 for x in vecs[2])  # NULL -> zero

    out = {r["doc_id"]: r["text"] for r in strip_boilerplate(docs).collect()}
    assert out[2] is None  # NULL passes through
    # the x20-repeated unicode doc is pure intra-doc repetition =
    # boilerplate by definition -> strips to empty; the unique ascii
    # doc survives intact (modulo token normalization)
    assert out[1] == ""
    assert out[3] == "ascii only text here"


def test_normalize_text_canonicalizes_unicode(spark):
    """normalize_text folds the classic dedup-defeating variants to one
    canonical form: full-width latin, NFC-vs-NFD accents, NBSP /
    ideographic spaces, zero-width chars, BOM. Idempotent; NULL-safe;
    casefold handles the sharp-s trap."""
    import unicodedata

    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.text import (
        normalize_text,
    )

    nfd_cafe = unicodedata.normalize("NFD", "café")
    rows = [
        (1, "Ｈｅｌｌｏ world"),  # full-width Hello
        (2, "café menu"),  # NFC
        (3, f"{nfd_cafe} menu"),  # NFD spelling of the same text
        (4, "a b　c"),  # NBSP + ideographic space
        (5, "z​ero‍width﻿!"),  # ZWSP, ZWJ, BOM
        (6, "  spaced\t\tout  "),
        (7, None),
        (8, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["text"] for r in normalize_text(docs).collect()
    }
    assert out[1] == "Hello world"
    assert out[2] == "cafe menu"  # accents stripped
    assert out[3] == out[2]  # NFC and NFD spellings converge
    assert out[4] == "a b c"
    assert out[5] == "zerowidth!"
    assert out[6] == "spaced out"
    assert out[7] is None
    assert out[8] == ""

    # idempotence: re-normalizing the output is the identity
    once = normalize_text(docs)
    twice = {
        r["doc_id"]: r["text"] for r in normalize_text(once).collect()
    }
    assert twice == out

    # casefold folds the sharp-s (lower() would not)
    sharp = spark.createDataFrame(
        [(1, "STRASSE"), (2, "Straße")], "doc_id long, text string"
    )
    folded = {
        r["doc_id"]: r["text"]
        for r in normalize_text(sharp, casefold=True).collect()
    }
    assert folded[1] == folded[2] == "strasse"


def test_normalize_text_unifies_dedup_channels(spark):
    """The point of the operator: two copies of one sentence that differ
    only by width/accent-form/space encoding hash as DISTINCT content
    raw, and as the SAME content post-normalization."""
    import unicodedata

    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.text import (
        normalize_text,
    )

    a = "the café menu lists tea"
    b = unicodedata.normalize("NFD", a).replace(" ", " ")
    docs = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    raw = docs.selectExpr("md5(text) h").distinct().count()
    norm = (
        normalize_text(docs).selectExpr("md5(text) h").distinct().count()
    )
    assert raw == 2 and norm == 1


def test_normalize_text_is_arrow_batched_no_shuffle(spark):
    """Plan contract: the Python tier is ArrowEvalPython (vectorized
    batch transfer), never row-at-a-time BatchEvalPython, and the
    operator adds no exchange."""
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.text import (
        normalize_text,
    )

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = (
        normalize_text(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "Exchange" not in plan, plan


def test_normalize_text_preserves_nonlatin_combining_marks(spark):
    """Accent stripping is LATIN-BASE-ONLY: Thai/Devanagari/Hebrew/
    Arabic marks are category Mn but meaning-bearing -- they must
    survive normalization while café still folds."""
    rows = [
        (1, "กิน ข้าว"),  # Thai: vowel sign + tone marks (Mn)
        (2, "हिन्दी"),  # Devanagari: matra + virama (Mn)
        (3, "שָׁלוֹם"),  # Hebrew pointing (Mn)
        (4, "café"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.text import (
        normalize_text,
    )
    import unicodedata

    out = {r["doc_id"]: r["text"] for r in normalize_text(docs).collect()}
    assert out[1] == unicodedata.normalize("NFC", "กิน ข้าว")
    assert out[2] == unicodedata.normalize("NFC", "हिन्दी")
    assert out[3] == unicodedata.normalize("NFC", "שָׁלוֹם")
    assert out[4] == "cafe"
