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
        # one-ish wave per stage at local scale; a real cluster sizes this
        # to ~2-3x total cores (or relies on AQE coalescing from a higher
        # initial value)
        shuffle_partitions = max(int(cpus), 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "20g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
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
