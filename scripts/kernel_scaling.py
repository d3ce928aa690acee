"""Isolated extraction-kernel scaling: pure multiprocessing, no Spark.

The end-to-end replay numbers on the sandbox VM carry +-30-40% run-to-
run noise (shared-host CPU), which swamps scaling measurements. This
script measures the engine's parallel kernel — the per-blob extraction
that dominates replay compute — under plain multiprocessing at N and 4N
workers, best-of-3, where measurements ARE reproducible. A pure-CPU
control (chained sha256) calibrates the box's own scaling ceiling.

Prints one JSON line; referenced by BENCH.md.
"""

from __future__ import annotations

import base64
import hashlib
import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_FILES = int(os.environ.get("GRATE_KERNEL_FILES", "900"))
ROWS = int(os.environ.get("GRATE_KERNEL_ROWS", "300"))
LEVELS = (int(os.environ.get("GRATE_BENCH_N", "4")),
          int(os.environ.get("GRATE_BENCH_4N", "16")))


def _setup():
    global BLOB
    sys.path.insert(0, REPO)
    from grate_spark.cdc.bench import _csv_body_to_xlsx
    body = "doc_id,lang,n_chars\n" + "\n".join(
        f"{i},en,{100 + i}" for i in range(ROWS))
    BLOB = base64.b64encode(_csv_body_to_xlsx(body)).decode()


def _extract(n):
    import gc
    sys.path.insert(0, REPO)
    from grate_spark.extract import extract_blob
    gc.collect()
    gc.freeze()
    gc.set_threshold(200000, 100, 100)
    for k in range(n):
        extract_blob(f"f{k}.xlsx", BLOB)
    return n


def _control(n):
    h = hashlib.sha256(b"x")
    for _ in range(n):
        h = hashlib.sha256(h.digest())
    return 1


def best_of(fn, procs, arg, reps=3, init=None):
    best = None
    for _ in range(reps):
        with mp.Pool(procs, initializer=init) as p:
            t0 = time.perf_counter()
            p.map(fn, [arg] * procs)
            dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return best


def main():
    low, high = LEVELS
    out = {"metric": "extraction_kernel_scaling_N_to_4N",
           "rows_per_file": ROWS, "files_per_proc": N_FILES}

    kt = {p: best_of(_extract, p, N_FILES, init=_setup)
          for p in (low, high)}
    k_speed = {p: round(N_FILES * p / kt[p], 1) for p in kt}
    k_eff = (k_speed[high] / k_speed[low]) / (high / low)
    out["kernel_files_per_sec"] = {str(p): k_speed[p] for p in kt}
    out["kernel_scaling_efficiency"] = round(k_eff, 3)

    ct = {p: best_of(_control, p, 2_000_000) for p in (low, high)}
    c_speed = {p: round(2_000_000 * p / ct[p] / 1e6, 2) for p in ct}
    c_eff = (c_speed[high] / c_speed[low]) / (high / low)
    out["control_mhash_per_sec"] = {str(p): c_speed[p] for p in ct}
    out["control_scaling_efficiency"] = round(c_eff, 3)

    out["kernel_vs_hardware_ceiling"] = round(k_eff / c_eff, 3)
    out["value"] = out["kernel_scaling_efficiency"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
