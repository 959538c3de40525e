"""Structured Streaming pipelines (ST1-ST5): the streaming form of
each operator must agree with its batch form, and the incremental file
source must process newly-arrived files exactly once."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from poet_cloud_cost_etl_spark.catalog import table
from poet_cloud_cost_etl_spark.streaming import pipelines as P

from tests.conftest import SF_SMALL


@pytest.fixture()
def events_dir(tmp_path):
    """A streaming source dir seeded with the sf0.001 events file."""
    src = tmp_path / "events_in"
    src.mkdir()
    shutil.copy(
        os.path.join(SF_SMALL, "events.parquet"), src / "part-000.parquet"
    )
    return str(src)


def test_tumbling_daily_stream_matches_batch(spark, events_dir, tmp_path):
    stream = P.incremental_events_source(spark, events_dir)
    result = P.tumbling_daily(stream)
    P.run_available_now(result, str(tmp_path / "ck1"), "t_tumble")

    got = {
        (r.window_start, r.event_type): r.n
        for r in spark.sql("SELECT * FROM t_tumble").collect()
    }
    batch = (
        table(spark, SF_SMALL, "events")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
        .collect()
    )
    want = {(r.ws, r.event_type): r.n for r in batch}
    assert got == want and len(got) > 0


def test_session_windows_stream_matches_batch(spark, events_dir, tmp_path):
    stream = P.incremental_events_source(spark, events_dir)
    result = P.session_windows(stream)
    P.run_available_now(result, str(tmp_path / "ck2"), "t_sess")

    got = spark.sql("SELECT count(*) AS c, sum(n_events) AS s FROM t_sess").collect()[0]
    batch = (
        table(spark, SF_SMALL, "events")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    assert got.c == batch.count()
    assert got.s == batch.agg(F.sum("n_events")).collect()[0][0]


def test_dedup_within_watermark(spark, events_dir, tmp_path):
    stream = P.incremental_events_source(spark, events_dir)
    result = P.dedup_within_watermark(stream).select("event_id")
    P.run_append_available_now(result, str(tmp_path / "ck3"), "t_dedup")

    n = spark.sql("SELECT count(DISTINCT event_id) AS n FROM t_dedup").collect()[0].n
    n_rows = spark.sql("SELECT count(*) AS n FROM t_dedup").collect()[0].n
    expected = table(spark, SF_SMALL, "events").select("event_id").distinct().count()
    assert n == n_rows == expected


def test_incremental_source_picks_up_new_files(spark, events_dir, tmp_path):
    """ST1: a second availableNow run after a new file lands processes
    only the new data (checkpoint advanced, no reprocessing)."""
    stream = P.incremental_events_source(spark, events_dir)
    counts = stream.groupBy().agg(F.count(F.lit(1)).alias("n"))
    ck = str(tmp_path / "ck4")
    P.run_available_now(counts, ck, "t_incr1")
    first = spark.sql("SELECT n FROM t_incr1").collect()[0].n

    # a "new day" of data arrives: copy the same file under a new name
    shutil.copy(
        os.path.join(SF_SMALL, "events.parquet"),
        os.path.join(events_dir, "part-001.parquet"),
    )
    stream2 = P.incremental_events_source(spark, events_dir)
    counts2 = stream2.groupBy().agg(F.count(F.lit(1)).alias("n"))
    P.run_available_now(counts2, ck, "t_incr2")
    second = spark.sql("SELECT n FROM t_incr2").collect()[0].n

    assert first == 1000
    assert second == 2000  # complete mode: cumulative count includes both files
