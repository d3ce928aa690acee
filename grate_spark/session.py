"""SparkSession builder tuned for the extraction/CDC workload.

Local-mode defaults mirror what a multi-executor deployment would set:
AQE on (skew-join splitting, partition coalescing), Arrow transfer for
pandas UDFs, bounded Arrow batch sizes so per-file grids stay in memory.
On a real cluster the same code ships via ``spark-submit --py-files``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _ensure_pythonpath() -> None:
    """Make this package importable in executor python workers regardless
    of the driver's cwd (the local-mode analog of --py-files)."""
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if root not in sys.path:
        sys.path.insert(0, root)
    parts = os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if root not in parts:
        os.environ["PYTHONPATH"] = (
            root + (os.pathsep + os.environ["PYTHONPATH"]
                    if os.environ.get("PYTHONPATH") else ""))


def get_spark(cpus: int | str | None = None,
              app: str = "grate_spark",
              shuffle_partitions: int | None = None,
              extra: dict | None = None) -> SparkSession:
    _ensure_pythonpath()
    cpus = int(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # 3x cores: fine-grained tasks smooth per-file cost variance in
        # the extraction stage (one straggler task no longer holds a
        # whole wave); AQE still coalesces genuinely tiny partitions
        shuffle_partitions = max(3 * int(cpus), 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # keep post-shuffle partitions fine enough to occupy all cores
        # (default 64MB advisory folds small-local-scale shuffles into
        # fewer tasks than cores)
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                str(16 * 1024 * 1024))
        # MIN/MAX/COUNT over parquet resolve from footer statistics —
        # makes the replay's high-watermark probe metadata-only
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # finer input splits: blob scans feed the extraction UDF, whose
        # per-split cost is seconds — 16 MB splits give several task
        # waves per core so stragglers pipeline instead of capping the
        # stage (default 128 MB + 4 MB open-cost bin-packs a whole
        # batch into one wave)
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        # default 100 silently drops whole-stage codegen for wide
        # operators — the 64-dim flat-vector scoring projections and
        # the schema-evolved wide table (c001..c256) both exceed it and
        # fell back to interpreted row-at-a-time eval
        .config("spark.sql.codegen.maxFields", "512")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # blob rows are ~100KB each (file contents): 256 rows ≈ 25MB per
        # Arrow batch keeps the python workers' resident set and copy
        # churn bounded (2048 would mean ~300MB batches per worker)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        # commit output by direct rename-per-file (v2) instead of the
        # two-phase per-task + job-commit rename cascade (v1): the CDC
        # merge writes a fresh staged directory per batch whose
        # atomicity comes from the lake MANIFEST commit, not the
        # Hadoop committer, so v1's extra renames are pure overhead.
        # (An object-store deployment replaces this with its own
        # committer; the manifest keeps correctness either way.)
        .config("spark.hadoop.mapreduce.fileoutputcommitter"
                ".algorithm.version", "2")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "20g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # shuffle/spill scratch: the sandbox's virtio /tmp has erratic
    # multi-second write latency under concurrency; use tmpfs when
    # available (a real cluster puts this on node-local SSDs)
    if os.path.isdir("/dev/shm"):
        scratch = "/dev/shm/spark-local"
        os.makedirs(scratch, exist_ok=True)
        builder = builder.config("spark.local.dir", scratch)
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = ()) -> dict:
    """Load driver parquet tables and register temp views."""
    names = names or ("region", "nation", "customer", "supplier", "part",
                      "orders", "lineitem", "events", "documents",
                      "embeddings")
    out = {}
    for n in names:
        path = os.path.join(sf_dir, f"{n}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(n)
            out[n] = df
    return out
