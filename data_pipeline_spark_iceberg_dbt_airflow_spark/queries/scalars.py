"""Scalar function families (SURVEY.md §2.8).

The reference declares COALESCE / DATE() / aliasing / literal arithmetic /
casts (README.md:372-383, extract_bitcoin_prices.py:78-88) -- all covered by
the reference queries -- and parses JSON driver-side with ``response.json()``
BEFORE Spark (extract_bitcoin_prices.py:53,76,101). Moving that parse into
the engine is the [ext] JSON family over ``events.props``; string / date /
math / array families complete the envelope.

Cross-engine discipline: only functions with identical semantics in Spark
and DuckDB are oracle-paired (regexp_replace needs DuckDB's 'g' flag to
match Spark's replace-all; libm-dependent fns like pow/ln are avoided in
favor of IEEE-exact sqrt and multiplication).

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
    "scalar_json_get",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
        FROM events
    """,
    doc="F8/F13 JSON path extraction: get_json_object over the props JSON "
    "string -- the engine-side rendering of the reference's driver-side "
    "response.json() (extract_bitcoin_prices.py:53,76,101). JVM Jackson "
    "parse, no Python in the row path.",
    tags=("scalar", "json"),
)
def scalar_json_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
    )


@register(
    "scalar_json_schema_lift",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k
        FROM events
        GROUP BY event_type
    """,
    doc="F8 from_json with an explicit schema: lift props into a typed "
    "struct once, then aggregate the typed field. Integer sums -- no float "
    "discipline needed.",
    tags=("scalar", "json"),
)
def scalar_json_schema_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    return (
        ev.withColumn("p", F.from_json("props", schema))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("p.k")).alias("sum_k"),
        )
    )


@register(
    "scalar_string_family",
    oracle="""
        SELECT c_custkey,
               UPPER(c_name) AS name_upper,
               LOWER(c_mktsegment) AS segment_lower,
               LENGTH(c_name) AS name_len,
               SUBSTR(c_name, 1, 8) AS name_prefix,
               c_name || '/' || c_mktsegment AS name_seg,
               regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_masked,
               CASE WHEN c_name LIKE '%1%' THEN 1 ELSE 0 END AS has_one
        FROM customer
    """,
    doc="F9 string family: upper/lower/length/substring/concat/"
    "regexp_replace/LIKE. Spark regexp_replace replaces all matches; the "
    "oracle passes DuckDB's 'g' flag for identical semantics.",
    tags=("scalar", "string"),
)
def scalar_string_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("segment_lower"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("/", "c_name", "c_mktsegment").alias("name_seg"),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("name_masked"),
        F.when(F.col("c_name").like("%1%"), F.lit(1)).otherwise(F.lit(0)).alias("has_one"),
    )


@register(
    "scalar_date_family",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) AS order_date,
               CAST(o_orderdate AS DATE) + 30 AS due_date,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
               year(o_orderdate) AS order_year,
               month(o_orderdate) AS order_month_num,
               day(o_orderdate) AS order_day,
               date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                   AS days_since_1995
        FROM orders
    """,
    doc="F10 date-arithmetic family: to_date/date_add/date_trunc/"
    "year/month/day/datediff over order timestamps.",
    tags=("scalar", "date"),
)
def scalar_date_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        d.alias("order_date"),
        F.date_add(d, 30).alias("due_date"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month_num"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_1995"),
    )


@register(
    "scalar_math_family",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ABS(l_quantity - 25) AS qty_dev,
               CEIL(l_extendedprice) AS price_ceil,
               FLOOR(l_extendedprice) AS price_floor,
               SQRT(l_quantity) AS qty_sqrt,
               l_discount * l_discount AS disc_sq,
               GREATEST(l_quantity, 10.0) AS qty_floor10,
               LEAST(l_quantity, 40.0) AS qty_cap40,
               CAST(l_quantity AS BIGINT) % 7 AS qty_mod7
        FROM lineitem
    """,
    doc="F11 math family: abs/ceil/floor/sqrt/greatest/least/mod. Only "
    "IEEE-exact operations (sqrt, multiply) -- libm-dependent pow/ln can "
    "differ in the last ulp between JVM and C++ engines.",
    tags=("scalar", "math"),
)
def scalar_math_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_discount") * F.col("l_discount")).alias("disc_sq"),
        F.greatest(F.col("l_quantity"), F.lit(10.0)).alias("qty_floor10"),
        F.least(F.col("l_quantity"), F.lit(40.0)).alias("qty_cap40"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
    )


@register(
    "scalar_array_family",
    oracle="""
        SELECT vec_id,
               len(embedding) AS dim,
               embedding[1] AS first_component,
               embedding[64] AS last_component,
               list_slice(embedding, 1, 4) AS head4
        FROM embeddings
    """,
    doc="F12 array family: size/element_at/slice over the ARRAY<FLOAT> "
    "embedding column (both engines are 1-based).",
    tags=("scalar", "array"),
)
def scalar_array_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_component"),
        F.element_at("embedding", 64).alias("last_component"),
        F.slice("embedding", 1, 4).alias("head4"),
    )


@register(
    "scalar_explode_positions",
    oracle="""
        SELECT vec_id, u.component
        FROM embeddings, UNNEST(embedding) AS u(component)
        WHERE vec_id < 50
    """,
    doc="F12 explode: one row per array element (UNNEST analog). Generator "
    "output multiplies rows by the array length -- filtered to a key range "
    "so the test stays bounded; at scale explode early-then-aggregate "
    "beats carrying wide arrays through shuffles.",
    tags=("scalar", "array", "explode"),
)
def scalar_explode_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < 50).select(
        "vec_id", F.explode("embedding").alias("component")
    )


@register(
    "scalar_array_transform_agg",
    oracle="""
        SELECT vec_id,
               CAST(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS DOUBLE)
                   AS sq_norm
        FROM embeddings
        WHERE vec_id < 100
    """,
    doc="F12 higher-order functions: transform + aggregate compute the "
    "squared L2 norm JVM-side -- the lambda runs inside codegen, the "
    "pattern the cosine-similarity operators build on (no Python, no "
    "explode-shuffle).",
    tags=("scalar", "array", "higher_order"),
)
def scalar_array_transform_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < 100).select(
        "vec_id",
        F.aggregate(
            F.transform(
                "embedding", lambda x: x.cast("double") * x.cast("double")
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("sq_norm"),
    )


@register(
    "scalar_map_family",
    oracle="""
        SELECT event_id,
               len(json_keys(props)) AS map_size,
               array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
               CAST(props->>'k' AS BIGINT) AS k_value,
               (json_extract(props, '$.missing') IS NOT NULL) AS has_missing
        FROM events
        WHERE event_id < 500
    """,
    doc="F12 map family: lift the props JSON into a real MAP column "
    "(from_json MapType) and exercise map_keys / size / element_at / "
    "map_contains_key -- all codegen'd per-row, no shuffle. The oracle "
    "computes the same facts through DuckDB's JSON functions, proving the "
    "map semantics rather than the storage representation (engines "
    "disagree on map value wrapping, so queries emit scalars, not maps).",
    tags=("scalar", "map"),
)
def scalar_map_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return ev.filter(F.col("event_id") < 500).select(
        "event_id",
        F.size(m).alias("map_size"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
        F.element_at(m, F.lit("k")).alias("k_value"),
        F.map_contains_key(m, F.lit("missing")).alias("has_missing"),
    )
