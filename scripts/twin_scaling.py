"""Spark-free twin of the fused extract->parquet-encode stage.

The end-to-end 2->8 scaling studies land at 0.63-0.69 clean while every
1->4 study reads >=0.8, and the working hypothesis (BENCH.md) is that
the box itself — memory-bus-bound parquet encode at 8+ concurrent
writers on a 32-vCPU shared host — is the ceiling, not Spark. This
script settles it: it reproduces the fused stage's per-task work with
NO Spark at all (plain multiprocessing), so whatever efficiency IT
measures at 2->8 is the hardware's answer.

Per worker, for its share of the same blob population the replay bench
uses (xlsx workbooks built by ``_csv_body_to_xlsx``, 500 rows each):

    base64 decode -> extract_blob (CFB/XLSX walk, SST, render)
    -> content sha256 -> pyarrow table in the lake's EXTRACT_SCHEMA
       (+ lineage cols) -> parquet encode (snappy, Spark-default-ish
       row groups) to tmpfs

which is byte-for-byte the work a fused extract->merge-write task does
(grate_spark/cdc/pipeline.py:246-300, lake.py:468-516), minus the JVM.
STRONG scaling like the end-to-end study: a fixed total file count is
split across P workers; efficiency = (T_low/T_high)/(high/low).

A pure-CPU control (chained sha256) and a pure-ENCODE control (the same
pyarrow write with extraction skipped) run at the same levels in the
same epoch, so the output separates three ceilings:

    control_cpu      — the box's best case (cache-resident integer work)
    twin (fused)     — extraction + encode, the engine's actual mix
    control_encode   — encode alone, the memory-bus-bound term

Prints one JSON line; referenced by BENCH_SCALING.md / BENCH.md.

Usage: python scripts/twin_scaling.py [total_files] [rows_per_file]
Env: GRATE_TWIN_LOW/HIGH (default 2/8), GRATE_TWIN_REPS (default 3).
"""

from __future__ import annotations

import base64
import hashlib
import json
import multiprocessing as mp
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TOTAL_FILES = int(sys.argv[1]) if len(sys.argv) > 1 else \
    int(os.environ.get("GRATE_TWIN_FILES", "2000"))
ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else \
    int(os.environ.get("GRATE_TWIN_ROWS", "500"))
LOW = int(os.environ.get("GRATE_TWIN_LOW", "2"))
HIGH = int(os.environ.get("GRATE_TWIN_HIGH", "8"))
REPS = int(os.environ.get("GRATE_TWIN_REPS", "3"))


def _blob(file_id: int) -> bytes:
    """Deterministic xlsx blob matching the replay bench's population
    (same builder, same row count, per-file varying numeric column so
    parquet dictionaries see realistic cardinality)."""
    from grate_spark.cdc.bench import _csv_body_to_xlsx
    body = "doc_id,lang,n_chars\n" + "\n".join(
        f"{i},en,{100 + ((i * 7 + file_id) % 4096)}" for i in range(ROWS))
    return _csv_body_to_xlsx(body)


def _arrow_schema():
    import pyarrow as pa
    # EXTRACT_SCHEMA (operators/extraction.py:28-44) + the lineage cols
    # the fused write carries (src_offset, batch_id, content_sha)
    return pa.schema([
        ("repo", pa.string()), ("path", pa.string()),
        ("commit", pa.string()), ("fmt", pa.string()),
        ("sheet", pa.string()), ("sheet_idx", pa.int32()),
        ("row_id", pa.int64()), ("cells", pa.list_(pa.string())),
        ("types", pa.string()), ("formats", pa.list_(pa.string())),
        ("error", pa.string()), ("content_sha", pa.string()),
        ("src_offset", pa.int64()), ("batch_id", pa.int32()),
    ])


def _init_worker(blob_b64: str, outdir: str):
    global _BLOB_B64, _OUT
    _BLOB_B64 = blob_b64
    _OUT = outdir
    # pre-import the heavy modules so per-task walls time compute, not
    # module init (the Spark study's Python workers are likewise reused)
    import pyarrow  # noqa: F401
    import pyarrow.parquet  # noqa: F401
    import grate_spark.extract  # noqa: F401
    import grate_spark.operators.extraction  # noqa: F401
    import gc
    gc.collect()
    gc.freeze()
    gc.set_threshold(200000, 100, 100)


def _fused(task):
    """One fused-stage task: extract `n` blobs, encode one parquet file
    (the lake writes one file per bucket per task — same shape)."""
    wid, n, encode_only = task
    import pyarrow as pa
    import pyarrow.parquet as pq
    from grate_spark.extract import extract_blob
    from grate_spark.operators.extraction import TYPE_CODES

    def materialize(path):
        """Mirror _extract_batches' per-blob row build
        (operators/extraction.py:96-118), minus the pandas frame."""
        res = extract_blob(path, _BLOB_B64)
        rows = []
        for si, table in enumerate(res.tables):
            if table.hidden:
                continue
            for rid, (cells, types, formats) in enumerate(table.rows):
                tstr = "".join(TYPE_CODES.get(t, "?") for t in types)
                fmts = formats if any(f != "General" for f in formats) \
                    else None
                rows.append((res.fmt, table.name, si, rid, cells,
                             tstr, fmts))
        return rows

    schema = _arrow_schema()
    cols = {f.name: [] for f in schema}
    raw = base64.b64decode(_BLOB_B64)
    sha = hashlib.sha256(raw).hexdigest()
    if encode_only:
        # pre-extract ONE blob, then replicate its rows n times: the
        # encode control writes identical bytes with extraction amortized
        template = materialize("f0.xlsx")
    total_rows = 0
    # stream chunks into one file like the real fused task: the Arrow
    # batches cross into the JVM writer every _CHUNK_ROWS=8192 rows
    # (operators/extraction.py:56), never as one giant buffer
    chunk = 8192
    writer = pq.ParquetWriter(
        os.path.join(_OUT, f"part-{wid}.parquet"), schema,
        compression="snappy")
    try:
        for k in range(n):
            fid = wid * 1_000_000 + k
            path = f"f{fid}.xlsx"
            rows = template if encode_only else materialize(path)
            for fmt, sheet, si, rid, cells, tstr, fmts in rows:
                cols["repo"].append(f"bench-repo-{fid % 16}")
                cols["path"].append(path)
                cols["commit"].append(f"v1-{fid}")
                cols["fmt"].append(fmt)
                cols["sheet"].append(sheet)
                cols["sheet_idx"].append(si)
                cols["row_id"].append(rid)
                cols["cells"].append(cells)
                cols["types"].append(tstr)
                cols["formats"].append(fmts)
                cols["error"].append(None)
                cols["content_sha"].append(sha)
                cols["src_offset"].append(fid)
                cols["batch_id"].append(0)
            if len(cols["repo"]) >= chunk:
                t = pa.table(cols, schema=schema)
                writer.write_table(t)
                total_rows += t.num_rows
                cols = {f.name: [] for f in schema}
        if cols["repo"]:
            t = pa.table(cols, schema=schema)
            writer.write_table(t)
            total_rows += t.num_rows
    finally:
        writer.close()
    return total_rows


def _control_cpu(task):
    _wid, n, _ = task
    h = hashlib.sha256(b"x")
    for _ in range(n):
        h = hashlib.sha256(h.digest())
    return 1


def _noop(_x):
    return 0


def _cpu_stat():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    return (vals[7] if len(vals) > 7 else 0), sum(vals)


def _run_level(fn, procs: int, total: int, blob_b64: str,
               encode_only: bool = False) -> tuple[float, float]:
    """Strong scaling: `total` units split evenly across `procs`
    workers; returns (wall_seconds, steal_pct)."""
    per = [total // procs + (1 if i < total % procs else 0)
           for i in range(procs)]
    outdir = tempfile.mkdtemp(prefix="grate-twin-", dir="/dev/shm")
    try:
        with mp.Pool(procs, initializer=_init_worker,
                     initargs=(blob_b64, outdir)) as pool:
            # warm every worker (fork + heavy imports) before timing:
            # the Spark study's Python workers are long-lived and
            # reused across the whole replay, so startup is not part
            # of the stage cost being twinned
            pool.map(_noop, range(procs * 4))
            s0, t0 = _cpu_stat()
            w0 = time.perf_counter()
            pool.map(fn, [(i, n, encode_only)
                          for i, n in enumerate(per)])
            wall = time.perf_counter() - w0
    finally:
        shutil.rmtree(outdir, ignore_errors=True)
    s1, t1 = _cpu_stat()
    steal = round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2)
    return wall, steal


def main() -> None:
    blob_b64 = base64.b64encode(_blob(0)).decode("ascii")
    levels = (LOW, HIGH)
    out = {"metric": "fused_stage_twin_scaling",
           "total_files": TOTAL_FILES, "rows_per_file": ROWS,
           "levels": list(levels), "reps": REPS}

    # per-study totals sized so the LOW level runs tens of seconds —
    # short walls measure pool mechanics, not the stage
    studies = {
        "twin_fused": (_fused, TOTAL_FILES, False),
        "control_encode": (_fused, TOTAL_FILES * 6, True),
        "control_cpu": (_control_cpu, 120_000_000, False),
    }
    # interleave levels within each rep so a noise epoch hits both
    samples = {name: {p: [] for p in levels} for name in studies}
    for _rep in range(REPS):
        for name, (fn, total, enc) in studies.items():
            for p in levels:
                wall, steal = _run_level(fn, p, total, blob_b64, enc)
                samples[name][p].append(
                    {"sec": round(wall, 3), "steal_pct": steal})
    for name in studies:
        lo = min(s["sec"] for s in samples[name][LOW])
        hi = min(s["sec"] for s in samples[name][HIGH])
        eff = (lo / hi) / (HIGH / LOW)
        pair = [round((a["sec"] / b["sec"]) / (HIGH / LOW), 3)
                for a, b in zip(samples[name][LOW], samples[name][HIGH])]
        out[name] = {
            "best_seconds": {str(LOW): lo, str(HIGH): hi},
            "efficiency_best": round(eff, 3),
            "paired_efficiencies": pair,
            "paired_median": sorted(pair)[len(pair) // 2],
            "samples": {str(p): samples[name][p] for p in levels},
        }
    out["value"] = out["twin_fused"]["efficiency_best"]
    # the verdict the study exists to render: if the Spark-free twin
    # also lands ~0.7 at 2->8, the end-to-end number is the box, not
    # the engine
    out["twin_vs_cpu_ceiling"] = round(
        out["twin_fused"]["efficiency_best"]
        / max(out["control_cpu"]["efficiency_best"], 1e-9), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
