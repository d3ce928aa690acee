"""CDC replay throughput bench: events/sec end-to-end (tail -> extract ->
MERGE), plus the N-vs-4N scaling protocol.

The event log is synthesized at arbitrary scale from the documents table
with pure DataFrame ops (no driver loops): docs are replicated and
hash-assigned to ``n_files`` CSV blobs, then given an I/U/D script.
Generation is materialized to parquet first so the timed section measures
the replay only.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .events import EVENT_COLS
from .pipeline import CdcPipeline


def bench_blobs(spark: SparkSession, sf_dir: str, n_files: int,
                rows_per_file: int, version: int) -> DataFrame:
    """n_files CSV blobs of ~rows_per_file rows built from documents.
    version 2 adds a column and perturbs the content."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")) \
        .select("doc_id", "lang", "n_chars")
    n_docs = docs.count()
    replicas = max(1, (n_files * rows_per_file + n_docs - 1) // n_docs)
    rep = spark.range(replicas).withColumnRenamed("id", "r")
    rows = docs.crossJoin(rep).withColumn(
        "file_id",
        F.pmod(F.xxhash64(F.col("doc_id") * replicas + F.col("r")),
               F.lit(n_files)).cast("int"))
    line_cols = [F.col("doc_id").cast("string"), F.col("lang"),
                 (F.col("n_chars") + F.col("r")).cast("string")]
    header = "doc_id,lang,n_chars"
    if version == 2:
        line_cols.append((F.col("n_chars") % 7).cast("string"))
        header += ",quality"
    rows = rows.withColumn("line", F.concat_ws(",", *line_cols))
    body = (rows.groupBy("file_id")
            .agg(F.array_join(
                F.transform(F.array_sort(F.collect_list(
                    F.struct("doc_id", "r", "line"))),
                    lambda x: x["line"]), "\n").alias("body")))
    return body.select(
        F.concat(F.lit("bench-repo-"),
                 (F.col("file_id") % 16).cast("string")).alias("repo"),
        F.concat(F.lit("f"), F.col("file_id").cast("string"),
                 F.lit(".csv")).alias("path"),
        F.concat(F.lit(f"v{version}-"),
                 F.col("file_id").cast("string")).alias("commit"),
        F.lit("csv").alias("lang"),
        F.concat(F.lit(header + "\n"), F.col("body")).alias("content"))


def bench_events(spark: SparkSession, sf_dir: str, n_files: int = 800,
                 rows_per_file: int = 50,
                 n_partitions: int = 16) -> DataFrame:
    v1 = bench_blobs(spark, sf_dir, n_files, rows_per_file, 1) \
        .withColumn("op", F.lit("I")).withColumn("phase", F.lit(1))
    v2 = bench_blobs(spark, sf_dir, n_files, rows_per_file, 2) \
        .filter(F.pmod(F.xxhash64("path"), F.lit(3)) == 0) \
        .withColumn("op", F.lit("U")).withColumn("phase", F.lit(2))
    dels = v1.select("repo", "path") \
        .filter(F.pmod(F.xxhash64("path"), F.lit(10)) == 7) \
        .withColumn("commit", F.lit("del")) \
        .withColumn("lang", F.lit("csv")) \
        .withColumn("content", F.lit(None).cast("string")) \
        .withColumn("op", F.lit("D")).withColumn("phase", F.lit(3))
    all_ev = v1.unionByName(v2).unionByName(dels)
    w = Window.orderBy("phase", "path")
    return (all_ev.withColumn("offset",
                              F.row_number().over(w).cast("bigint"))
            .withColumn("partition",
                        F.pmod(F.xxhash64("repo"),
                               F.lit(n_partitions)).cast("int"))
            .select(*EVENT_COLS))


def replay_events_per_sec(spark: SparkSession, sf_dir: str,
                          n_files: int | None = None,
                          n_batches: int = 4,
                          workdir: str | None = None) -> dict:
    """Materialize a bench event log, then time a full checkpointed
    replay. Returns events/sec plus breakdowns."""
    n_files = n_files or int(os.environ.get("GRATE_BENCH_FILES", "600"))
    own_tmp = workdir is None
    workdir = workdir or tempfile.mkdtemp(prefix="grate-replay-bench-")
    ev_path = os.path.join(workdir, "events.parquet")
    lake_root = os.path.join(workdir, "lake")
    try:
        bench_events(spark, sf_dir, n_files=n_files) \
            .write.mode("overwrite").parquet(ev_path)
        events = spark.read.parquet(ev_path)
        n_events = events.count()

        pipe = CdcPipeline(spark, lake_root, n_buckets=64)
        batch = max(1, (n_events + n_batches - 1) // n_batches)
        t0 = time.perf_counter()
        pipe.replay(events, batch_size=batch)
        elapsed = time.perf_counter() - t0

        n_rows = pipe.results().count()
        return {"events_per_sec": round(n_events / elapsed, 2),
                "n_events": n_events,
                "n_result_rows": n_rows,
                "replay_seconds": round(elapsed, 3),
                "n_batches": n_batches,
                "n_files": n_files}
    finally:
        if own_tmp:
            shutil.rmtree(workdir, ignore_errors=True)
