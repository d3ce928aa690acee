"""Structured Streaming rollup: batch equivalence + watermark
late-data semantics (grate_spark/streaming.py)."""

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType,
                               StructField, StructType, TimestampType)

SF = os.environ.get("GRATE_TEST_SF", "/root/testdata/sf0.001")

EV_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])


def test_streaming_rollup_matches_batch(spark, tmp_path):
    """The streaming windowed agg over the sf events parquet produces
    row-for-row the batch hourly rollup."""
    from grate_spark.queries import events_hourly_rollup
    from grate_spark.streaming import streaming_hourly_rollup

    # the file source needs a DIRECTORY; the sf table is a single file
    evdir = str(tmp_path / "events")
    os.makedirs(evdir)
    os.link(os.path.join(SF, "events.parquet"),
            os.path.join(evdir, "part-0.parquet"))
    got = streaming_hourly_rollup(
        spark, evdir, EV_SCHEMA,
        str(tmp_path / "ckpt"), query_name="t_roll")
    want = events_hourly_rollup(spark, SF)
    g = {(r["hour_ts"], r["event_type"]): (r["n_events"],
                                           r["sum_value"])
         for r in got.collect()}
    w = {(r["hour_ts"], r["event_type"]): (r["n_events"],
                                           r["sum_value"])
         for r in want.collect()}
    assert g == w and len(g) > 100


def test_watermark_drops_late_events(spark, tmp_path):
    """An event arriving after the watermark EVICTED its window's state
    is dropped: the window's final aggregate must not include it, while
    a naive batch aggregation of the same files would.

    Three ordered triggers: (h1, h5) seed state and the watermark;
    (h10) advances the watermark to 9:30, evicting the h1 window; then
    a late h1 event with a poison value (99) arrives — if it were
    aggregated, h1 would reappear as (1, 99.0)."""
    import datetime as dt

    from grate_spark.streaming import watermarked_rollup_final_state

    def ev(eid, hour, value=1.0):
        return (eid, dt.datetime(2024, 1, 1, hour, 30), 1, "click",
                value, "{}")

    feeds = [[ev(1, 1), ev(2, 5)], [ev(3, 10)], [ev(4, 1, 99.0)]]
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, rows in enumerate(feeds):
        d = str(tmp_path / f"b{i}")
        spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write \
            .parquet(d)
        src = [fn for fn in os.listdir(d) if fn.endswith(".parquet")][0]
        dst = os.path.join(flat, f"{i}.parquet")
        os.link(os.path.join(d, src), dst)
        # the file source orders by modification time (latestFirst off)
        os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    final = watermarked_rollup_final_state(
        spark, flat, EV_SCHEMA, str(tmp_path / "ckpt"),
        watermark_delay="1 hour", max_files_per_trigger=1)

    got = {k[0].hour: v for k, v in final.items()}
    # the late event neither re-opened h1 nor changed its aggregate
    assert got == {1: (1, 1.0), 5: (1, 1.0), 10: (1, 1.0)}, final

    # the batch aggregation of the same files WOULD count it — the
    # difference is exactly the streaming eviction semantics
    batch = (spark.read.schema(EV_SCHEMA).parquet(flat)
             .groupBy(F.date_trunc("hour", "ts").alias("h"))
             .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
             .collect())
    bmap = {r["h"].hour: (r["n"], r["sv"]) for r in batch}
    assert bmap[1] == (2, 100.0)


def test_stateful_offset_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState cross-batch dedup: per-key offset high
    watermark survives micro-batch boundaries — redelivered and
    duplicate offsets never re-emit."""
    from pyspark.sql.types import (LongType, IntegerType, StringType,
                                   StructField, StructType)

    from grate_spark.streaming import dedup_new_offsets_stream

    schema = StructType([
        StructField("offset", LongType()),
        StructField("partition", IntegerType()),
        StructField("op", StringType()),
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("commit", StringType()),
        StructField("lang", StringType()),
        StructField("content", StringType()),
    ])

    def ev(off):
        return (off, 0, "I", "r", "a.csv", f"c{off}", "csv", "x")

    # trigger 1: offsets 1, 2 and an intra-batch duplicate of 2;
    # trigger 2: redelivery of 2 (cross-batch dup) plus fresh 3
    feeds = [[ev(1), ev(2), ev(2)], [ev(2), ev(3)]]
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, rows in enumerate(feeds):
        d = str(tmp_path / f"b{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
        src = [fn for fn in os.listdir(d) if fn.endswith(".parquet")][0]
        dst = os.path.join(flat, f"{i}.parquet")
        os.link(os.path.join(d, src), dst)
        os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    emitted = []

    def _sink(df, bid):
        emitted.append((bid, sorted(r["offset"] for r in df.collect())))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .option("latestFirst", "false").parquet(flat))
    q = (dedup_new_offsets_stream(stream)
         .writeStream.outputMode("update").foreachBatch(_sink)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    per_batch = {b: offs for b, offs in emitted if offs}
    assert per_batch == {0: [1, 2], 1: [3]}, emitted


def test_streaming_dedup_event_time_ttl_evicts_idle_state(spark, tmp_path):
    """Event-time TTL on the stateful offset dedup: an idle key's HWM
    state is evicted once the watermark passes its horizon — a stale
    offset redelivered AFTER eviction re-emits at the stream layer (the
    eviction proof) while an ACTIVE key's lease keeps extending and its
    duplicates stay deduped. End-to-end the lake's offset checkpoint
    still rejects the re-emitted stale offset (tested below)."""
    import datetime as dt

    from grate_spark.cdc.pipeline import CdcPipeline
    from grate_spark.streaming import dedup_new_offsets_stream

    schema = StructType([
        StructField("offset", LongType()),
        StructField("ts", TimestampType()),
        StructField("op", StringType()),
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("commit", StringType()),
        StructField("lang", StringType()),
        StructField("content", StringType()),
    ])
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def ev(off, path, hours):
        return (off, t0 + dt.timedelta(hours=hours), "I", "r", path,
                f"c{off}", "csv", "a,b\n1,2")

    feeds = [
        [ev(5, "a.csv", 0), ev(6, "b.csv", 0)],     # A and B seen
        [ev(100, "b.csv", 3)],                      # watermark -> t0+2h
        [ev(101, "b.csv", 3)],                      # A idle: EVICTED here
        [ev(5, "a.csv", 3), ev(100, "b.csv", 3)],   # stale redeliveries
    ]
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, rows in enumerate(feeds):
        d = str(tmp_path / f"b{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
        src = [fn for fn in os.listdir(d) if fn.endswith(".parquet")][0]
        dst = os.path.join(flat, f"{i}.parquet")
        os.link(os.path.join(d, src), dst)
        os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    emitted = []

    def _sink(df, bid):
        emitted.append((bid, sorted(r["offset"] for r in df.collect())))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .option("latestFirst", "false").parquet(flat))
    q = (dedup_new_offsets_stream(stream, ttl="1 hour")
         .writeStream.outputMode("update").foreachBatch(_sink)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    per_batch = {b: offs for b, offs in emitted if offs}
    # batch 3: A's offset 5 RE-EMITS (state was evicted), while the
    # still-leased B drops its duplicate 100
    assert per_batch == {0: [5, 6], 1: [100], 2: [101], 3: [5]}, emitted

    # end-to-end: the lake offset checkpoint rejects the stale 5
    pipe = CdcPipeline(spark, str(tmp_path / "lake"), n_buckets=4,
                       wide_view=False)
    live = spark.createDataFrame(
        [(off, 0, op, r, p, c, lg, ct) for (off, _ts, op, r, p, c, lg, ct)
         in [feeds[0][0], feeds[0][1], feeds[1][0], feeds[2][0]]],
        "offset long, partition int, op string, repo string, "
        "path string, commit string, lang string, content string")
    pipe.replay(live)
    ckpt = int(pipe.lake.checkpoint()["global"])
    assert ckpt == 101
    stale = spark.createDataFrame(
        [(5, 0, "I", "r", "a.csv", "c5", "csv", "a,b\n9,9")],
        "offset long, partition int, op string, repo string, "
        "path string, commit string, lang string, content string")
    res = pipe.apply_batch(stale, lo=ckpt, hi=ckpt + 1,
                           batch_id=99)
    assert res["n_events"] == 0 and not res["committed"]
    row = pipe.results().filter(
        (F.col("path") == "a.csv") & (F.col("row_id") == 1)).collect()
    assert [r["cells"] for r in row] == [["1", "2"]]
