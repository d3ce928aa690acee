"""Benchmark harness: headline queries + CDC replay throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Env:
  SPARK_GRAFT_SF_DIR  input tables dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default 32)
  GRATE_BENCH_REPEAT  timing repetitions per query (default 1)

Scaling study (N vs 4N cores): scripts/scaling_bench.py runs this suite
at two parallelism levels in separate processes and reports efficiency.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _time_df(df) -> float:
    t0 = time.perf_counter()
    # materialize fully: aggregated outputs are small, collect is fine
    df.collect()
    return time.perf_counter() - t0


def run_suite(spark, sf_dir: str, repeat: int = 1) -> dict[str, float]:
    from grate_spark.queries import QUERIES

    # untimed warmup: spin the Arrow/python-worker pool and the common
    # codegen shapes (scan+agg, broadcast join+window, Pandas-UDF with
    # the numpy/pandas worker imports) once, so the alphabetically-first
    # timed queries don't absorb process startup
    for warm in ("token_counts", "cosine_topk", "multimodal_features"):
        if warm in QUERIES:
            QUERIES[warm][0](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name, (fn, _sql) in sorted(QUERIES.items()):
        best = None
        for _ in range(repeat):
            t = _time_df(fn(spark, sf_dir))
            best = t if best is None else min(best, t)
        timings[name] = round(best, 4)
    return timings


def run_replay_bench(spark, sf_dir: str) -> dict:
    """CDC replay throughput: synthesize a deterministic event log of file
    blobs and replay it end-to-end (tail -> extract -> merge)."""
    try:
        from grate_spark.cdc.bench import replay_events_per_sec
    except ImportError:
        return {}
    # untimed warmup on a tiny log: JIT/codegen for the extract+merge
    # path, so the timed replay measures steady-state ingest throughput
    replay_events_per_sec(spark, sf_dir, n_files=300, rows_per_file=20,
                          n_batches=1, n_trials=1)
    # the reported value is the MEDIAN of >=3 fresh-lake replays over
    # one materialized log (raw samples in replay.samples) — a single
    # shot is a coin-flip against this VM's hypervisor steal epochs
    return replay_events_per_sec(spark, sf_dir)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeat = int(os.environ.get("GRATE_BENCH_REPEAT", "1"))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from grate_spark.session import get_spark

    spark = get_spark(cpus=cpus, app="grate_spark-bench")
    try:
        # warm the JVM/scan path once so timings measure the queries
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

        timings = run_suite(spark, sf_dir, repeat=repeat)
        replay = run_replay_bench(spark, sf_dir)

        total = round(sum(timings.values()), 4)
        # the final stdout line is COMPACT on purpose: the driver tails
        # a bounded window of stdout and must parse this line — r4's
        # record was lost because the full per-trial array overflowed
        # it. Everything bulky (trials, samples, batch breakdowns) goes
        # to the sidecar file instead.
        out = {
            "metric": "replay_events_per_sec" if replay else "suite_seconds",
            "value": replay.get("events_per_sec", total) if replay else total,
            "unit": "events/sec" if replay else "sec",
            "queries": timings,
            "sf": sf_dir,
            "cpus": cpus,
        }
        if replay:
            out["suite_seconds"] = total
            out["n_trials"] = replay.get("n_trials")
            out["n_clean_trials"] = replay.get("n_clean_trials")
            if replay.get("degraded"):
                out["degraded"] = True
            sidecar = os.environ.get(
                "GRATE_BENCH_DETAIL",
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_DETAIL.json"))
            try:
                with open(sidecar, "w") as f:
                    json.dump({"compact": out, "replay": replay}, f,
                              indent=1)
                out["detail"] = os.path.basename(sidecar)
            except OSError:
                pass
        print(json.dumps(out))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
