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
                             state_timeout: str = "NoTimeout"
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
    """
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (LongType, StructField, StructType)

    out_schema = events.schema
    state_schema = StructType([StructField("hwm", LongType())])

    def _dedup(key, pdfs, state):
        hwm = state.get[0] if state.exists else -1
        # offsets emitted THIS batch: a key's rows may arrive in
        # several pandas chunks, so intra-batch duplicates must be
        # tracked across chunks, not just inside one
        seen: set = set()
        best = hwm
        for pdf in pdfs:
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

    timeout = getattr(GroupStateTimeout, state_timeout)
    return (events.groupBy("repo", "path")
            .applyInPandasWithState(_dedup, out_schema, state_schema,
                                    "update", timeout))
