"""Structured Streaming surface (SURVEY §2.10, ST1-ST5).

The reference is cron-batch (``/root/reference/entrypoint.sh:7-9``
writes a crontab; incremental sync is an *unimplemented* roadmap item,
``/root/reference/README.md:48``). This module supplies the idiomatic
Spark replacement: the parquet-directory file source picks up new
files per trigger (exactly the missing incremental sync), watermarks
bound state, and ``trigger(availableNow=True)`` reproduces cron-batch
semantics ("process everything new, then stop") with exactly-once
checkpointing instead of cron's at-least-once.

Each pipeline here is the streaming twin of a batch query in
queries.py (events_tumbling_daily, events_session_window,
events_dedup_state), so correctness is checked two ways: the batch
form against the DuckDB oracle, and the streaming form against the
batch form (tests/test_streaming.py).

State-store sizing (100 TB): tests run on the default HDFS-backed
provider (state on executor heap). A production deployment with a
large keyspace — stateful dedup over billions of ids, per-user
running state — sets
``spark.sql.streaming.stateStore.providerClass =
org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``
(+ ``...rocksdb.changelogCheckpointing.enabled=true`` for fast
commits), which spills keyed state to executor-local disk. Semantics
are identical — tests/test_streaming.py::test_rocksdb_state_store_provider
runs a stateful pipeline under RocksDB and asserts batch-equal
results. The provider is fixed per checkpoint: never flip it on an
existing checkpoint dir; migrate by rebuilding state into a fresh
one.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Declared schema for a stream defined over a not-yet-populated events
# directory (matches the session-zoned shape the probe produces from
# either fixture layout).
EVENTS_FILE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

def incremental_events_source(
    spark: SparkSession,
    source_dir: str,
    max_files_per_trigger: int = 4,
    schema: T.StructType | None = None,
) -> DataFrame:
    """ST1: incremental file source over a parquet directory. Files
    that appear after the last trigger are processed exactly once
    (checkpoint-tracked) — the reference's missing incremental sync.

    readStream needs an explicit schema, so we probe the files already
    present with a batch read and normalize ``ts`` to session-zoned
    TIMESTAMP the same way the batch catalog does (catalog.py:
    EVENT_TS_COLUMNS) — the fixture generation has stored ts as long
    nanoseconds and as naive TIMESTAMP(MICROS) at different times, and
    a stream over either layout must behave identically.

    The normal file-stream deployment watches a directory files only
    ARRIVE in later, so an empty/missing directory at definition time
    must not fail: pass ``schema`` explicitly, or the probe falls back
    to EVENTS_FILE_SCHEMA when it cannot infer.

    SCOPE OF THE FALLBACK: EVENTS_FILE_SCHEMA declares ``ts`` as
    TIMESTAMP, so it covers only the micros/timestamp parquet layout.
    A long-ns source whose directory is still empty at definition
    time MUST pass ``schema`` explicitly (ts as LongType) — a
    readStream schema is fixed for the life of the query, so the
    long-ns normalization branch below cannot engage retroactively
    once files arrive under the fallback.  On RESTART the probe
    re-runs (this function is called again) and infers the true
    layout, so the mismatch is bounded to the first query
    incarnation over an empty directory.
    """
    from ..catalog import ensure_session_confs

    # The nanos-as-long probe and the NTZ->TIMESTAMP cast below assume
    # the session confs the batch catalog pins (nanosAsLong, UTC tz).
    ensure_session_confs(spark)
    if schema is not None:
        inferred = schema
    else:
        try:
            inferred = spark.read.parquet(source_dir).schema
        except AnalysisException:
            inferred = EVENTS_FILE_SCHEMA
    raw = (
        spark.readStream.schema(inferred)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    ts_type = inferred["ts"].dataType
    if isinstance(ts_type, T.LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, T.TimestampNTZType):  # UTC session tz: lossless
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_daily(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """ST2 + ST5: watermarked tumbling-window aggregate. The watermark
    bounds state: windows older than (max event time - watermark) are
    finalized and their state dropped; later-arriving rows for them
    are ignored (the late-data policy)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def session_windows(stream: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """ST3: stateful session windows per user."""
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_within_watermark(stream: DataFrame) -> DataFrame:
    """ST4: stateful dedup by event_id. State for an id is kept only
    within the watermark horizon — bounded memory at any scale."""
    return stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["event_id"])


def run_available_now(
    result: DataFrame, checkpoint_dir: str, query_name: str
) -> None:
    """Cron-batch semantics, idiomatically: drain everything currently
    available, commit the checkpoint, stop (entrypoint.sh:7-9 twin)."""
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if "sort" not in query_name else "append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_append_available_now(
    result: DataFrame, checkpoint_dir: str, query_name: str
) -> None:
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_foreach_batch_parquet(
    result: DataFrame, checkpoint_dir: str, out_dir: str
) -> None:
    """Production sink pattern: each micro-batch lands through the
    batch writer (parquet here; JDBC via sources.sinks.write_jdbc in
    deployments). This is how the streaming pipeline reuses every
    batch sink the engine has.

    Exactly-once under failure, not just clean restart: foreachBatch
    alone is at-least-once (a crash between the write and the
    checkpoint commit replays the batch), so the sink keys the write
    on the checkpoint's batch id — each batch OVERWRITES its own
    ``batch_id=N`` partition directory, making replays idempotent.
    Readers see ``batch_id`` as an ordinary discovered partition
    column of ``out_dir`` (the result schema must not itself contain
    a ``batch_id`` column)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    q = (
        result.writeStream.foreachBatch(_sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def running_user_totals(stream: DataFrame, evict_after_ms: int | None = None) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState`` — the
    escape hatch for semantics the built-in stateful operators can't
    express (here: a per-user monotone running total + event count
    emitted once per micro-batch).

    State is one (total_cents, n) pair per user — O(users), not
    O(events) — and lives in the state store, so a 1000-executor run
    shards it by the grouping key like any other keyed state.

    ``evict_after_ms`` enables processing-time state eviction for
    long-running (continuous-trigger) deployments. Leave it None under
    ``availableNow``: a pending processing-time timeout keeps the
    query alive in "cleaning up state" batches until it fires, so a
    drain-and-stop trigger would never terminate.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id bigint, n_events bigint, total_cents bigint"
    state_schema = "total_cents bigint, n bigint"

    def _update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        total, n = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            cents = (pdf["value"] * 100).round(0).astype("int64")
            total += int(cents.sum())
            n += len(pdf)
        state.update((total, n))
        if evict_after_ms:
            state.setTimeoutDuration(evict_after_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_cents": [total]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if evict_after_ms
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_stream_interval_join(
    left: DataFrame, right: DataFrame, window: str = "5 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """ST6: stream-stream inner join with event-time interval bounds
    (the streaming twin of the batch ``join_range`` query).

    Both sides carry watermarks AND the join condition bounds the two
    event times relative to each other — that pair is what lets Spark
    compute how long each side's rows must stay in join state before
    no future match is possible, so state is evicted instead of
    growing forever (the defining constraint of stream-stream joins).
    Output rows appear once both sides' watermarks pass the match
    window (append mode)."""
    l = left.withWatermark("ts", watermark).select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("eid1"),
        F.col("ts").alias("ts1"),
    )
    r = right.withWatermark("ts", watermark).select(
        F.col("user_id").alias("u2"),
        F.col("event_id").alias("eid2"),
        F.col("ts").alias("ts2"),
    )
    return l.join(
        r,
        F.expr(
            f"u = u2 AND ts2 > ts1 AND ts2 <= ts1 + INTERVAL {window}"
        ),
        "inner",
    ).select("u", "eid1", "eid2", "ts1", "ts2")


def enrich_with_dim(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """ST7: stream-static join — enrich a stream with a (broadcast)
    dimension table. No watermark needed: the static side holds no
    streaming state. NOTE: a file-backed static side is snapshotted
    at plan time (InMemoryFileIndex caches the listing) — it is NOT
    re-listed per micro-batch, so restart the query (or use a
    snapshot-resolving source) to pick up dimension updates."""
    return stream.join(F.broadcast(dim), on, "left")


def event_type_profile_tws(stream: DataFrame) -> DataFrame:
    """ST8: per-user event-type profile via ``transformWithStateInPandas``
    — the Spark 4 arbitrary-state v2 API (SPARK-46815) that replaces
    ``applyInPandasWithState`` with TYPED state primitives: a
    ``MapState`` (event_type → count) and a ``ValueState`` (running
    value cents) per user, managed by a ``StatefulProcessor`` object
    with an explicit lifecycle (init / handleInputRows / close).

    Why it exists next to ``running_user_totals``: MapState gives
    per-subkey point updates — only the event types SEEN IN THIS
    BATCH are read and written, where the v1 API would round-trip
    each user's entire state blob every batch. At production
    keyspaces (users × event types) on the RocksDB provider that is
    the difference between touching a few keys and rewriting the
    store. Requires the RocksDB state-store provider (the v2 API
    refuses the default HDFS-heap provider by design).

    Emits, per micro-batch, one row per (user, event_type) updated in
    that batch, carrying the user's running total — 'update' output
    semantics, same contract as its batch twin
    (groupBy(user, type).count ⨝ per-user cents total)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = (
        "user_id bigint, event_type string, n bigint, user_total_cents bigint"
    )

    class _Profile(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState(
                "counts", "event_type string", "n bigint"
            )
            self._total = handle.getValueState("total", "cents bigint")

        def handleInputRows(self, key, rows, timer_values):
            got = self._total.get()
            total = got[0] if got is not None else 0
            touched: dict[str, int] = {}
            for pdf in rows:
                cents = (pdf["value"] * 100.0).round(0).astype("int64")
                total += int(cents.sum())
                for et, n in pdf.groupby("event_type").size().items():
                    touched[et] = touched.get(et, 0) + int(n)
            for et, add in touched.items():
                prev = self._counts.getValue((et,))
                self._counts.updateValue((et,), ((prev[0] if prev else 0) + add,))
            self._total.update((total,))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(touched),
                    "event_type": [et for et in sorted(touched)],
                    "n": [self._counts.getValue((et,))[0] for et in sorted(touched)],
                    "user_total_cents": [total] * len(touched),
                }
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_Profile(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
