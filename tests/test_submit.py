"""The cluster deployment path, end-to-end: package the library with
scripts/make_pyfiles.py and run a real ``spark-submit --py-files``
replay in a subprocess whose sys.path does NOT contain the repo — the
executors' Python workers must import grate_spark from the shipped zip,
exactly as a multi-executor cluster would. Final table state is checked
against an in-process replay of the same event log."""

import json
import os
import shutil
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from grate_spark.cdc.pipeline import RESULTS_TABLE, CdcPipeline
from grate_spark.cdc.lake import LakeCatalog
from tests.test_cdc import state_fingerprint

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_replay(spark, tmp_path):
    spark_submit = shutil.which("spark-submit")
    if not spark_submit:
        pytest.skip("spark-submit not on PATH")

    from grate_spark.cdc.events import EVENT_COLS

    rows = [(i + 1, 0, "I", "r", f"f{i}.csv", "c", "csv",
             f"k,v\n{i},a") for i in range(8)]
    rows += [(9, 0, "U", "r", "f0.csv", "c2", "csv", "k,v\n0,b"),
             (10, 0, "D", "r", "f1.csv", "c2", "csv", None)]
    events = spark.createDataFrame(rows, list(EVENT_COLS))
    ev_path = str(tmp_path / "events.parquet")
    events.write.parquet(ev_path)

    zip_path = str(tmp_path / "grate_spark.zip")
    subprocess.run([sys.executable,
                    os.path.join(REPO, "scripts", "make_pyfiles.py"),
                    zip_path], check=True, capture_output=True)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    lake_root = str(tmp_path / "lake")
    out = subprocess.run(
        [spark_submit, "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zip_path,
         os.path.join(REPO, "scripts", "submit_replay.py"),
         ev_path, lake_root, "--n-buckets", "4", "--batch-size", "6"],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=420)
    assert out.returncode == 0, out.stderr[-4000:]
    res = None
    for line in out.stdout.splitlines():
        if line.startswith("REPLAY "):
            res = json.loads(line[len("REPLAY "):])
    assert res is not None, out.stdout[-2000:]
    assert res["n_events"] == 10
    assert res["checkpoint"]["global"] == 10
    assert res["n_batches"] == 2

    # the submitted run's final state == an in-process replay's
    want_pipe = CdcPipeline(spark, str(tmp_path / "lake2"), n_buckets=4,
                            wide_view=False)
    want_pipe.replay(events)
    got = LakeCatalog(spark, lake_root).read(RESULTS_TABLE)
    assert res["n_result_rows"] == got.count() > 0
    cols = ["repo", "path", "sheet", "row_id", "cells",
            "content_sha256", "error"]
    assert state_fingerprint(got.select(*cols)) == \
        state_fingerprint(want_pipe.results().select(*cols))
    # the deleted file is gone, the updated one shows the new content
    live = got.filter((F.col("row_id") >= 1) & F.col("error").isNull())
    paths = {r["path"] for r in live.select("path").distinct().collect()}
    assert "f1.csv" not in paths
    f0 = live.filter(F.col("path") == "f0.csv").collect()
    assert [r["cells"] for r in f0] == [["0", "b"]]
