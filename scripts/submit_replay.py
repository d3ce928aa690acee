"""spark-submit entrypoint: CDC replay of an event log into a lake.

The cluster deployment path the north rule names:

    python scripts/make_pyfiles.py
    spark-submit --master <cluster> --py-files dist/grate_spark.zip \
        scripts/submit_replay.py <events.parquet> <lake_root> \
        [--batch-size N] [--n-buckets N]

``--py-files`` puts the zip on sys.path of the driver AND every
executor's Python workers — no code on the cluster filesystem. The
session is taken as spark-submit configured it (master, executor
counts, shuffle partitions all come from the submit line / cluster
defaults, never hardcoded here). Prints one JSON line of replay stats.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("events", help="event-log parquet path")
    ap.add_argument("lake_root", help="lake directory (created if absent)")
    ap.add_argument("--batch-size", type=int, default=None,
                    help="events per replay batch (default: one batch)")
    ap.add_argument("--n-buckets", type=int, default=64,
                    help="bucket count for a NEW results table "
                         "(an existing table's manifest spec wins)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("grate-cdc-replay").getOrCreate()
    # import AFTER the session exists: under spark-submit the zip from
    # --py-files is already on sys.path; running directly from a repo
    # checkout works too
    from grate_spark.cdc.pipeline import CdcPipeline

    events = spark.read.parquet(args.events)
    pipe = CdcPipeline(spark, args.lake_root, n_buckets=args.n_buckets,
                       wide_view=False)
    stats = pipe.replay(events, batch_size=args.batch_size)
    out = {
        "n_batches": len(stats),
        "n_events": sum(s.get("n_events", 0) for s in stats),
        "n_result_rows": pipe.results().count(),
        "checkpoint": pipe.lake.checkpoint(),
        "lake_version": pipe.lake.current_version(),
    }
    print("REPLAY " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
