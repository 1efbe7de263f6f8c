"""Streaming runtime tests (T3 watermark, T4 stateful state store).

Strategy: write the events fixture as two parquet "micro-batch" files,
run the stream to completion with trigger(availableNow), and check the
streaming output against the same aggregation computed in plain batch --
the parity the micro-batch execution model guarantees.
"""

from __future__ import annotations

import pytest

from data_pipeline_spark_iceberg_dbt_airflow_spark.io import read_table
from data_pipeline_spark_iceberg_dbt_airflow_spark.streaming import (
    read_events_stream,
    run_to_memory_sink,
    running_counts,
    windowed_counts,
)


@pytest.fixture(scope="module")
def stream_dir(spark, sf_dir, tmp_path_factory):
    """Events split into two micro-batch files by event half."""
    base = tmp_path_factory.mktemp("stream_events")
    ev = read_table(spark, sf_dir, "events")
    mid = ev.selectExpr("percentile_approx(event_id, 0.5)").collect()[0][0]
    ev.where(f"event_id <= {mid}").coalesce(1).write.parquet(
        str(base / "batch=0")
    )
    ev.where(f"event_id > {mid}").coalesce(1).write.parquet(
        str(base / "batch=1")
    )
    return str(base)


def _stream_schema(spark, stream_dir):
    return spark.read.parquet(f"{stream_dir}/batch=0").schema


def test_watermarked_window_counts_match_batch(spark, sf_dir, stream_dir):
    import datetime as dt

    schema = _stream_schema(spark, stream_dir)
    stream = read_events_stream(spark, f"{stream_dir}/batch=*", schema)
    run_to_memory_sink(
        windowed_counts(stream), table_name="t3_out", output_mode="append"
    )
    got = {
        (r.win_start, r.event_type): r.events
        for r in spark.table("t3_out").collect()
    }
    events = read_table(spark, sf_dir, "events")
    batch = windowed_counts(events)
    want = {(r.win_start, r.event_type): r.events for r in batch.collect()}
    # Watermark semantics: append mode emits a window only once the
    # watermark (max event time - 1 h) passes its END; the stream's final
    # windows stay open. Emitted windows must match batch exactly, and the
    # withheld set must be exactly the windows the watermark hadn't passed.
    max_ts = events.agg({"ts": "max"}).collect()[0][0]
    wm = max_ts - dt.timedelta(hours=1)
    want_final = {k: v for k, v in want.items() if k[0] + dt.timedelta(days=1) <= wm}
    assert got == want_final and len(got) > 0
    withheld = set(want) - set(got)
    assert withheld and all(
        k[0] + dt.timedelta(days=1) > wm for k in withheld
    )


def test_stateful_running_counts_accumulate_across_batches(
    spark, sf_dir, stream_dir
):
    schema = _stream_schema(spark, stream_dir)
    # maxFilesPerTrigger=1 forces two micro-batches so state genuinely
    # carries across batch boundaries.
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stream_dir}/batch=*")
        .select("user_id", "event_id")
    )
    run_to_memory_sink(
        running_counts(stream), table_name="t4_out", output_mode="update"
    )
    # update mode emits one row per (user, micro-batch it appeared in);
    # the LAST emission per user is the final cumulative count.
    rows = spark.table("t4_out").collect()
    final: dict[int, int] = {}
    for r in rows:  # memory sink preserves batch order
        final[r.user_id] = r.total_events
    want = {
        r.user_id: r.cnt
        for r in read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    assert final == want
    # at least one user must have been updated twice (state carried over)
    from collections import Counter

    per_user_emissions = Counter(r.user_id for r in rows)
    assert max(per_user_emissions.values()) == 2
