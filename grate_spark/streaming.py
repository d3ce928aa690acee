"""Structured Streaming surfaces beyond the CDC foreachBatch adapter.

The reference has no streaming layer (grate is a batch extraction
library); these operators exist on the ENGINE side of the north rule —
the windowed-aggregation / late-data semantics a change-log consumer
needs when the event source is a stream rather than a replayable log.

Two entry points:

- ``streaming_hourly_rollup``: the streaming twin of
  ``queries.events_hourly_rollup`` — a tumbling 1-hour window count/sum
  over a file-source stream, complete-mode memory sink, equivalence
  with the batch rollup is gate-tested (tests/test_streaming.py).
- ``watermarked_rollup_final_state``: update-mode rollup with a real
  watermark; late events older than the watermark are DROPPED by the
  state store (the semantics that bound state size at 10^10 events —
  without eviction, windowed state grows with the key x window
  product). The final per-window state is folded via foreachBatch so
  the test can assert exactly which late rows were discarded.

At cluster scale the same plans run against Kafka/event-hub sources
unchanged; the file source here is the sandbox stand-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_rollup_plan(stream: DataFrame,
                       watermark_delay: str | None = None) -> DataFrame:
    """The shared windowed-agg plan: tumbling 1-hour windows on ``ts``
    per event_type. Partial (map-side) aggregation applies before the
    state-store shuffle exactly as in the batch plan."""
    if watermark_delay is not None:
        stream = stream.withWatermark("ts", watermark_delay)
    return (stream.groupBy(F.window("ts", "1 hour").alias("w"),
                           "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("w.start").alias("hour_ts"), "event_type",
                    "n_events", "sum_value"))


def streaming_hourly_rollup(spark: SparkSession, events_dir: str,
                            schema, checkpoint_dir: str,
                            query_name: str = "hourly_rollup"
                            ) -> DataFrame:
    """Run the rollup as a stream over a parquet directory
    (availableNow), complete mode into a memory sink; returns the final
    result table — row-for-row the batch rollup of the same files."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    q = (hourly_rollup_plan(stream)
         .writeStream.outputMode("complete").format("memory")
         .queryName(query_name)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(query_name)


def watermarked_rollup_final_state(spark: SparkSession, events_dir: str,
                                   schema, checkpoint_dir: str,
                                   watermark_delay: str = "1 hour",
                                   max_files_per_trigger: int = 1
                                   ) -> dict:
    """Update-mode watermarked rollup over an ordered file feed; folds
    every emitted update into the latest per-(window, type) state.

    Returns ``{(hour_ts, event_type): (n_events, sum_value)}``. An
    event whose 1-hour window closed before the watermark (max event
    time seen in prior triggers minus ``watermark_delay``) never
    reaches the state store — the key's count stays at its pre-late
    value, which is what the equivalence test pins."""
    final: dict = {}

    def _fold(df: DataFrame, _bid: int) -> None:
        for r in df.collect():  # bounded: only UPDATED windows emit
            final[(r["hour_ts"], r["event_type"])] = (
                r["n_events"], r["sum_value"])

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .option("latestFirst", "false")
              .parquet(events_dir))
    q = (hourly_rollup_plan(stream, watermark_delay=watermark_delay)
         .writeStream.outputMode("update")
         .foreachBatch(_fold)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return final


def dedup_new_offsets_stream(events: DataFrame,
                             state_timeout: str = "NoTimeout",
                             ttl: str | None = None,
                             ts_col: str = "ts",
                             watermark_delay: str | None = None
                             ) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): per
    (repo, path) key, remember the highest offset ever emitted and pass
    through ONLY events with a strictly higher offset — cross-batch
    redelivery dedup at the stream layer, the in-stream complement of
    the lake's offset-checkpoint dedup (cdc/pipeline).

    State per key is a single long (the high watermark): at 10^9 keys
    that is the minimal possible stateful footprint, hash-partitioned
    by the state-store shuffle on the grouping key. Emitted rows keep
    the event schema, so the CDC pipeline can consume the deduped
    stream unchanged.

    ``ttl`` (e.g. ``"2 hours"``): event-time TTL — the scale-correct
    default for churny key spaces. The stream is watermarked on
    ``ts_col`` (delay ``watermark_delay``, default ``ttl``) and a key's
    HWM state is EVICTED once the watermark passes its newest event
    time + ttl, so the store tracks the ACTIVE key set, not every key
    ever seen (unbounded at 10^9 keys with churn under NoTimeout). A
    stale offset redelivered after eviction passes the STREAM layer,
    but the lake's offset checkpoint still rejects it end-to-end
    (``offset > ckpt`` in CdcPipeline) — gate-tested.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (LongType, StructField, StructType)

    use_ttl = ttl is not None
    if use_ttl:
        state_timeout = "EventTimeTimeout"
        events = events.withWatermark(ts_col, watermark_delay or ttl)
        ttl_ms = _duration_ms(ttl)

    out_schema = events.schema
    state_schema = StructType([StructField("hwm", LongType())])

    def _dedup(key, pdfs, state):
        if use_ttl and state.hasTimedOut:
            # watermark passed this key's horizon: drop its HWM. A
            # later redelivery below the evicted HWM re-emits here and
            # is rejected by the lake's offset checkpoint instead.
            state.remove()
            return
        hwm = state.get[0] if state.exists else -1
        # offsets emitted THIS batch: a key's rows may arrive in
        # several pandas chunks, so intra-batch duplicates must be
        # tracked across chunks, not just inside one
        seen: set = set()
        best = hwm
        max_ts_ms = None
        for pdf in pdfs:
            if use_ttl and len(pdf):
                m = pdf[ts_col].max()
                ms = int(m.value // 1_000_000)
                if max_ts_ms is None or ms > max_ts_ms:
                    max_ts_ms = ms
            fresh = pdf[pdf["offset"] > hwm]
            if len(fresh):
                fresh = fresh.drop_duplicates(subset=["offset"])
                fresh = fresh[~fresh["offset"].isin(seen)]
            if len(fresh):
                seen.update(int(o) for o in fresh["offset"])
                m = int(fresh["offset"].max())
                if m > best:
                    best = m
                yield fresh
        if best > hwm:
            state.update((best,))
        if use_ttl and max_ts_ms is not None:
            # eviction horizon rides the key's newest event time, so an
            # active key keeps extending its own lease
            state.setTimeoutTimestamp(max_ts_ms + ttl_ms)

    timeout = getattr(GroupStateTimeout, state_timeout)
    return (events.groupBy("repo", "path")
            .applyInPandasWithState(_dedup, out_schema, state_schema,
                                    "update", timeout))


_DUR_UNITS = {"ms": 1, "millisecond": 1, "milliseconds": 1,
              "s": 1000, "second": 1000, "seconds": 1000,
              "m": 60_000, "minute": 60_000, "minutes": 60_000,
              "h": 3_600_000, "hour": 3_600_000, "hours": 3_600_000,
              "d": 86_400_000, "day": 86_400_000, "days": 86_400_000}


def _duration_ms(s: str) -> int:
    """Parse a Spark-style duration string ('2 hours', '30 seconds')."""
    parts = s.strip().split()
    if len(parts) != 2 or parts[1].lower() not in _DUR_UNITS:
        raise ValueError(f"unsupported duration: {s!r}")
    return int(float(parts[0]) * _DUR_UNITS[parts[1].lower()])
