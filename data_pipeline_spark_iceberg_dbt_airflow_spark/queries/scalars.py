"""Scalar function families (SURVEY.md §2.8).

The reference declares COALESCE / DATE() / aliasing / literal arithmetic /
casts (README.md:372-383, extract_bitcoin_prices.py:78-88) -- all covered by
the reference queries -- and parses JSON driver-side with ``response.json()``
BEFORE Spark (extract_bitcoin_prices.py:53,76,101). Moving that parse into
the engine is the [ext] JSON family over ``events.props``; string / date /
math / array / map families complete the envelope.

Registry budget note (round 3): 4 consolidated entries (was 9). Families
sharing a table and granularity merge into one per-row query each: JSON +
map over events, string + date + math over orders, array + higher-order
over embeddings; explode keeps its own entry (generator granularity).

Cross-engine discipline: only functions with identical semantics in Spark
and DuckDB are oracle-paired (regexp_replace needs DuckDB's 'g' flag to
match Spark's replace-all; libm-dependent fns like pow/ln are avoided in
favor of IEEE-exact sqrt and multiplication). RESULT-TYPE parity is part
of the contract: Spark CEIL/FLOOR on DOUBLE return BIGINT while DuckDB
returns DOUBLE, so the oracle casts them to BIGINT (the round-2 driver
hash failure); array outputs are rendered as scalar columns because
array-typed cells crash the driver comparator.

Scale notes: everything here is a stateless projection inside whole-stage
codegen -- no shuffle, no Python. JSON parsing via get_json_object/from_json
is JVM-side (Jackson), the 100 TB-safe way to lift semi-structured columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import read_table
from .registry import register


@register(
    "scalar_json_map_events",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
               CAST(props->>'k' AS BIGINT) AS struct_k,
               len(json_keys(props)) AS map_size,
               array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
               CASE WHEN props IS NULL THEN CAST(NULL AS INT)
                    ELSE CAST(json_extract(props, '$.missing') IS NOT NULL
                              AS INT)
               END AS has_missing
        FROM events
    """,
    doc="F8/F13 JSON + map families, consolidated (was scalar_json_get + "
    "scalar_json_schema_lift + scalar_map_family): prop_k lifts the props "
    "JSON string by path (get_json_object -- the engine-side rendering of "
    "the reference's driver-side response.json(), "
    "extract_bitcoin_prices.py:53,76,101); struct_k lifts the same field "
    "through from_json with an explicit StructType schema (typed lift); "
    "map_size/keys_csv/has_missing exercise a real MAP column (from_json "
    "MapType -> map_keys/size/map_contains_key), with the key list "
    "rendered as a sorted CSV string -- engines disagree on map value "
    "wrapping and the driver cannot hash arrays, so queries emit scalars. "
    "All JVM Jackson parsing inside codegen; no Python in the row path.",
    tags=("scalar", "json", "map"),
)
def scalar_json_map_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        F.from_json("props", schema).getField("k").alias("struct_k"),
        F.size(m).alias("map_size"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
        # INT, not BOOLEAN: a nullable boolean lands in pandas as object-
        # None on the Spark side but float-NaN on the DuckDB side -- the
        # hash can never match. Nullable ints degrade to float64 NaN on
        # BOTH sides. (null-injection sweep finding)
        F.map_contains_key(m, F.lit("missing")).cast("int").alias("has_missing"),
    )


@register(
    "scalar_row_functions",
    oracle="""
        SELECT o_orderkey,
               UPPER(o_orderpriority) AS prio_upper,
               LOWER(o_orderstatus) AS status_lower,
               LENGTH(o_orderpriority) AS prio_len,
               SUBSTR(o_orderpriority, 1, 3) AS prio_prefix,
               concat_ws('/', o_orderstatus, o_orderpriority) AS status_prio,
               regexp_replace(o_orderpriority, '[0-9]+', '#', 'g') AS prio_masked,
               levenshtein(o_orderstatus, 'O') AS status_edit_dist,
               translate(o_orderpriority, '-', '_') AS prio_underscored,
               lpad(o_orderstatus, 3, '*') AS status_lpad,
               rpad(o_orderstatus, 3, '*') AS status_rpad,
               reverse(o_orderpriority) AS prio_reversed,
               strpos(o_orderpriority, 'URGENT') AS urgent_pos,
               CASE WHEN o_orderpriority LIKE '%URGENT%' THEN 1 ELSE 0 END
                   AS is_urgent,
               CAST(o_orderdate AS DATE) AS order_date,
               CAST(o_orderdate AS DATE) + 30 AS due_date,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
               year(o_orderdate) AS order_year,
               month(o_orderdate) AS order_month_num,
               day(o_orderdate) AS order_day,
               date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                   AS days_since_1995,
               ABS(o_totalprice - 150000) AS price_dev,
               CAST(CEIL(o_totalprice) AS BIGINT) AS price_ceil,
               CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
               SQRT(o_totalprice) AS price_sqrt,
               GREATEST(o_totalprice, 10000.0) AS price_floor10k,
               LEAST(o_totalprice, 200000.0) AS price_cap200k,
               o_orderkey % 7 AS key_mod7
        FROM orders
    """,
    doc="F9 string + F10 date + F11 math families, consolidated on one "
    "orders scan (was scalar_string_family + scalar_date_family + "
    "scalar_math_family): upper/lower/length/substring/concat/"
    "regexp_replace/LIKE (Spark regexp_replace replaces all matches; the "
    "oracle passes DuckDB's 'g' flag), to_date/date_add/date_trunc/year/"
    "month/day/datediff, abs/ceil/floor/sqrt/greatest/least/mod. Only "
    "IEEE-exact operations (sqrt, multiply) -- libm-dependent pow/ln can "
    "differ in the last ulp between engines. Spark CEIL/FLOOR on DOUBLE "
    "return BIGINT; the oracle casts to match (round-2 driver red).",
    tags=("scalar", "string", "date", "math"),
)
def scalar_row_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("prio_upper"),
        F.lower("o_orderstatus").alias("status_lower"),
        F.length("o_orderpriority").alias("prio_len"),
        F.substring("o_orderpriority", 1, 3).alias("prio_prefix"),
        F.concat_ws("/", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.regexp_replace("o_orderpriority", "[0-9]+", "#").alias("prio_masked"),
        # levenshtein is the classic DP distance in both engines (exact
        # ints); instr/strpos are both 1-based with 0 = not found.
        F.levenshtein(F.col("o_orderstatus"), F.lit("O")).alias(
            "status_edit_dist"
        ),
        F.translate("o_orderpriority", "-", "_").alias("prio_underscored"),
        F.lpad("o_orderstatus", 3, "*").alias("status_lpad"),
        F.rpad("o_orderstatus", 3, "*").alias("status_rpad"),
        F.reverse("o_orderpriority").alias("prio_reversed"),
        F.instr("o_orderpriority", "URGENT").alias("urgent_pos"),
        F.when(F.col("o_orderpriority").like("%URGENT%"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_urgent"),
        d.alias("order_date"),
        F.date_add(d, 30).alias("due_date"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month_num"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_1995"),
        F.abs(F.col("o_totalprice") - 150000).alias("price_dev"),
        F.ceil("o_totalprice").alias("price_ceil"),
        F.floor("o_totalprice").alias("price_floor"),
        F.sqrt("o_totalprice").alias("price_sqrt"),
        F.greatest(F.col("o_totalprice"), F.lit(10000.0)).alias("price_floor10k"),
        F.least(F.col("o_totalprice"), F.lit(200000.0)).alias("price_cap200k"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
    )


@register(
    "scalar_array_ops",
    oracle="""
        SELECT 'fold' AS kind, vec_id,
               len(embedding) AS dim,
               embedding[1] AS first_component,
               embedding[64] AS last_component,
               embedding[2] AS h2,
               embedding[3] AS h3,
               CAST(list_sum(list_transform(list_slice(embedding, 1, 4),
                    x -> CAST(x AS DOUBLE))) AS DOUBLE) AS head4_sum,
               CAST(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS DOUBLE)
                   AS sq_norm,
               CAST(NULL AS FLOAT) AS component
        FROM embeddings
        UNION ALL
        SELECT 'explode' AS kind, vec_id,
               CAST(NULL AS INT) AS dim,
               CAST(NULL AS FLOAT) AS first_component,
               CAST(NULL AS FLOAT) AS last_component,
               CAST(NULL AS FLOAT) AS h2,
               CAST(NULL AS FLOAT) AS h3,
               CAST(NULL AS DOUBLE) AS head4_sum,
               CAST(NULL AS DOUBLE) AS sq_norm,
               u.component
        FROM embeddings, UNNEST(embedding) AS u(component)
        WHERE vec_id < 50
    """,
    doc="F12 array + higher-order + explode families, consolidated under a "
    "`kind` marker (was scalar_array_family + scalar_array_transform_agg, "
    "then + scalar_explode_positions in round 5 to free a registry slot "
    "for dedup_span_mask). kind='fold': size/element_at (both engines "
    "1-based here), slice rendered as its element scalars + fold "
    "(head4_sum over slice(1,4)) because array-typed output cells crash "
    "the driver comparator (round-2 harness error), and the "
    "transform+aggregate squared-L2 norm whose lambda runs inside codegen "
    "-- the pattern the cosine-similarity operators build on (no Python, "
    "no explode-shuffle). kind='explode': one row per array element "
    "(UNNEST analog) -- generator output multiplies rows by array length, "
    "filtered to a key range so the test stays bounded; at scale "
    "explode-early-then-aggregate beats carrying wide arrays through "
    "shuffles.",
    tags=("scalar", "array", "higher_order", "explode"),
)
def scalar_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    head4 = F.slice("embedding", 1, 4)
    nf = F.lit(None).cast("float")
    fold = emb.select(
        F.lit("fold").alias("kind"),
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_component"),
        F.element_at("embedding", 64).alias("last_component"),
        F.element_at("embedding", 2).alias("h2"),
        F.element_at("embedding", 3).alias("h3"),
        F.aggregate(
            F.transform(head4, lambda x: x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("head4_sum"),
        F.aggregate(
            F.transform(
                "embedding", lambda x: x.cast("double") * x.cast("double")
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("sq_norm"),
        nf.alias("component"),
    )
    exploded = emb.filter(F.col("vec_id") < 50).select(
        F.lit("explode").alias("kind"),
        "vec_id",
        F.lit(None).cast("int").alias("dim"),
        nf.alias("first_component"),
        nf.alias("last_component"),
        nf.alias("h2"),
        nf.alias("h3"),
        F.lit(None).cast("double").alias("head4_sum"),
        F.lit(None).cast("double").alias("sq_norm"),
        F.explode("embedding").alias("component"),
    )
    return fold.unionByName(exploded)
