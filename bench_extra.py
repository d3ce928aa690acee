"""Round-6 optimization harness (bench.py stays FROZEN for the driver).

Per-query isolation per the optimization guide §1.4/§1.5/§7.2:
- times each named query with the noop sink (computation only, no
  collect-to-driver cost) AND with .collect() (bench.py's methodology,
  for apples-to-apples numbers),
- labels jobs via setJobDescription,
- optionally writes .explain("formatted") to plans/r06/<name>_<tag>.txt.

Usage:
  python bench_extra.py [--sf DIR] [--repeat N] [--plans TAG] [query ...]

With no query names, runs every query in the registry.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--plans", default=None,
                    help="write plans/r06/<name>_<TAG>.txt per query")
    ap.add_argument("--no-collect", action="store_true",
                    help="skip the collect() timing (noop only)")
    ap.add_argument("--explain-only", action="store_true",
                    help="write plans, run nothing")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from grate_spark.session import get_spark
    spark = get_spark(app="grate_spark-bench-extra")
    from grate_spark.queries import QUERIES

    names = args.queries or sorted(QUERIES)
    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", "r06")
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    # same warmup set as bench.py so first-query numbers are comparable
    if not args.explain_only:
        for warm in ("token_counts", "cosine_topk", "multimodal_features"):
            if warm in QUERIES:
                QUERIES[warm][0](spark, args.sf).collect()

    out = {}
    for name in names:
        fn = QUERIES[name][0]
        if args.plans:
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(plans_dir,
                                   f"{name}_{args.plans}.txt"), "w") as f:
                f.write(plan)
            if args.explain_only:
                print(f"wrote plan: {name}", flush=True)
                continue
        noop_best = coll_best = None
        for _ in range(args.repeat):
            # build OUTSIDE the timer — bench.py's frozen methodology
            # (`_time_df(fn(spark, sf))`) evaluates fn before the
            # timer starts, so query-function-internal actions (cdc
            # replays, lsh candidate materialization, ivf training)
            # are untimed there and must be untimed here too
            df = fn(spark, args.sf)
            spark.sparkContext.setJobDescription(f"{name}: noop")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t = time.perf_counter() - t0
            noop_best = t if noop_best is None else min(noop_best, t)
            if not args.no_collect:
                df = fn(spark, args.sf)
                spark.sparkContext.setJobDescription(f"{name}: collect")
                t0 = time.perf_counter()
                df.collect()
                t = time.perf_counter() - t0
                coll_best = t if coll_best is None else min(coll_best, t)
            spark.sparkContext.setJobDescription(None)
        out[name] = {"noop": round(noop_best, 4)}
        if coll_best is not None:
            out[name]["collect"] = round(coll_best, 4)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf": args.sf, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
