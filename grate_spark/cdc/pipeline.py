"""The CDC replay loop: change-log tail -> extract -> MERGE, exactly once.

Per micro-batch (SURVEY §3.4 lifecycle; north rule semantics):

1. **offset-bounded scan** of the events table: ``offset > ckpt AND
   offset <= min(ckpt + batch, hwm)`` — deterministic, resumable; the
   predicate is Catalyst-evaluable so parquet row groups outside the
   range are pruned.
2. **tabular-artifact filter** on the path suffix (D6) — also pushed to
   the scan, never inside the UDF.
3. **latest-offset-wins per key** (G1): the window runs over KEY
   COLUMNS only (repo, path, offset, op); a path updated 10^6 times in
   a batch extracts once. Blob payloads never enter the window.
4. **winner selection without a blob shuffle**: the winning keys
   broadcast back onto the scan as a semi-join, so extraction reads
   blobs straight off the source splits (scan-partition parallelism);
   batches whose winner set exceeds the broadcast budget fall back to
   one co-partitioned full-row window shuffle.
5. **extract UDTF** (mapInPandas) over winning I/U blobs; corrupt blobs
   become error rows (counted in metrics, never task failures).
6. **MERGE**: per-path replace into the bucketed results table +
   schema-evolving wide view + metrics append + checkpoint/lineage — all
   in ONE lake commit, so replaying after any crash is idempotent.

The results table key is (repo, path); each row also carries
(sheet, row_id) per the north star key, plus lineage columns
(batch_id, src_offset, commit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..extract import TABULAR_SUFFIX_RE
from ..operators.extraction import extract_files, with_content_sha
from .lake import LakeCatalog, _bucket_expr

RESULTS_TABLE = "results"
WIDE_TABLE = "results_wide"
METRICS_TABLE = "ingest_metrics"

MERGE_KEY = ("repo", "path")


def _wide_view(rows: DataFrame, n_cols: int,
               max_cols: int = 256) -> DataFrame:
    """Schema-evolution surface: cells exploded to typed-width string
    columns c001..cNNN. When a batch's widest sheet exceeds the table's
    current width, the MERGE widens the schema (column-add) in the same
    commit.

    ``max_cols`` guards the table width: ONE pathological 16k-column
    sheet would otherwise widen results_wide permanently for every
    reader (schema evolution is add-only). Positions past the cap land
    in a single ``c_overflow`` array column, so over-wide rows still
    round-trip losslessly while the scan schema stays bounded."""
    width = min(n_cols, max_cols)
    cols = [rows[c] for c in ("repo", "path", "sheet", "row_id")]
    cols += [F.try_element_at("cells", F.lit(i + 1)).alias(f"c{i + 1:03d}")
             for i in range(width)]
    if n_cols > max_cols:
        cols.append(F.slice("cells", max_cols + 1, n_cols - max_cols)
                    .alias("c_overflow"))
    return rows.filter(F.col("error").isNull()).select(*cols)


class CdcPipeline:
    def __init__(self, spark: SparkSession, lake_root: str,
                 n_buckets: int = 32, n_partitions: int | None = None,
                 wide_view: bool = True,
                 broadcast_winners_max: int = 1_000_000,
                 bucket_blobs: bool | None = None,
                 salt_buckets: bool | None = None,
                 wide_max_cols: int = 256,
                 python_encode: bool | None = None):
        self.spark = spark
        self.lake = LakeCatalog(spark, lake_root)
        self.n_buckets = n_buckets
        self.n_partitions = n_partitions or int(
            spark.sparkContext.defaultParallelism)
        self.wide_view = wide_view
        self.wide_max_cols = wide_max_cols
        self.force_repartition = n_partitions is not None
        # bucket_blobs (default ON): exchange the winning BLOBS on the
        # merge bucket BEFORE extraction instead of exchanging the
        # extracted rows after it — extraction and the parquet encode
        # fuse into ONE stage: no barrier (the write starts as soon as
        # any bucket's blobs are extracted, not after the slowest), no
        # row-shuffle serialization, trivial dynamic-partition sort
        # (one bucket per task), and the encode overlaps the UDF's
        # Python wait instead of bursting all writers at once.
        # Measured (interleaved A/B, 15k-file xlsx batch): ~20% faster
        # at local[8], parity-to-faster at local[2], identical state.
        import os as _os
        if bucket_blobs is None:
            bucket_blobs = _os.environ.get("GRATE_BUCKET_BLOBS", "1") == "1"
        self.bucket_blobs = bucket_blobs
        # salt_buckets (default ON): sub-split merge buckets whose event
        # count exceeds an even per-core share of the batch, using a
        # per-bucket path-hash salt in the fused exchange (see
        # _salt_plan). Off -> one task per touched bucket, always.
        if salt_buckets is None:
            salt_buckets = _os.environ.get("GRATE_SALT_BUCKETS", "1") == "1"
        self.salt_buckets = salt_buckets
        # python_encode (default OFF, requires bucket_blobs): run the
        # merge write as the arrow-native fused writer — extraction AND
        # parquet encode inside the Python worker (pyarrow), only
        # per-file manifest rows returning to the driver. Trade-off,
        # measured interleaved on the same event log: at LOW
        # per-executor parallelism it removes the JVM half (Arrow row
        # transfer back + parquet-mr) whose task time inflated
        # super-linearly with thread count, and the identical Python
        # loop scales at the host's CPU ceiling
        # (scripts/twin_scaling.py, BENCH_TWIN_2_8.json); at local[32]
        # (one oversubscribed JVM) the object->Arrow conversion makes
        # it ~1.6x SLOWER than parquet-mr (431 vs 710 ev/s warm). Real
        # clusters run 4-8 cores/executor where the fused path is the
        # right shape, but the default follows the measured single-JVM
        # throughput. Default is ADAPTIVE on the session's parallelism
        # (like AQE picking a join strategy): fused at <= 8 task
        # threads per JVM (measured best 30.7s vs 53.6s at local[8] on
        # the xlsx workload), parquet-mr above (710 vs 431 ev/s at
        # local[32]); both paths are state-identical (gate-tested).
        # GRATE_PY_ENCODE=0/1 still pins it either way.
        # See operators/fused_write.py.
        if python_encode is None:
            env = _os.environ.get("GRATE_PY_ENCODE")
            if env is not None:
                python_encode = env == "1"
            else:
                # the measured crossover (fused wins at <= 8 task
                # threads, parquet-mr above) is PER-JVM oversubscription,
                # so gate on per-executor task slots: on a cluster
                # defaultParallelism is TOTAL cores (8 execs x 4 cores =
                # 32) and would wrongly pick parquet-mr for exactly the
                # 4-8-core executors where fused is the right shape.
                # local masters have one JVM = defaultParallelism slots.
                python_encode = self._task_slots_per_jvm(spark) <= 8
        self.python_encode = python_encode and self.bucket_blobs
        # batches up to this many events dedup via a broadcast semi-join
        # of the winning (repo, path, offset) keys, so blob payloads are
        # NEVER shuffled; bigger batches fall back to the full-row
        # latest-wins window (one co-partitioned blob shuffle)
        self.broadcast_winners_max = broadcast_winners_max
        self._pending_metrics: list[tuple] = []
        self._sync_bucket_spec()

    @staticmethod
    def _task_slots_per_jvm(spark: SparkSession) -> int:
        """Concurrent task slots per executor JVM — the contention
        domain the fused-writer crossover was measured against.
        ``spark.executor.cores / spark.task.cpus`` on a cluster;
        defaultParallelism only for local[...] masters (one JVM)."""
        master = spark.sparkContext.master or ""
        if master.startswith("local"):
            return int(spark.sparkContext.defaultParallelism)
        try:
            exec_cores = int(spark.conf.get("spark.executor.cores", "0")
                             or 0)
            task_cpus = int(spark.conf.get("spark.task.cpus", "1") or 1)
        except Exception:
            exec_cores, task_cpus = 0, 1
        if exec_cores > 0:
            return max(1, exec_cores // max(1, task_cpus))
        # executor.cores unset (e.g. standalone grabbing whole nodes):
        # fall back to total parallelism — conservative (parquet-mr)
        return int(spark.sparkContext.defaultParallelism)

    def _sync_bucket_spec(self, manifest: dict | None = None) -> None:
        """The manifest's bucket spec is authoritative for an existing
        results table: writers must bucket incoming rows with the SAME
        (xxhash64, mod) the readers use for marker routing and point
        lookups — a constructor n_buckets that disagrees with the
        table would silently mis-bucket new files. rebucket() evolves
        the spec; every writer follows the manifest."""
        m = manifest or self.lake.manifest()
        t = m.get("tables", {}).get(RESULTS_TABLE)
        if t:
            self.n_buckets = int(t["n_buckets"])

    def _salt_plan(self, bucket_counts: dict[int, int],
                   n_events: int) -> dict[int, int]:
        """Sub-split factor per touched bucket for the fused
        extract->write exchange.

        A merge bucket is the natural write grain (one task, one file),
        but it is NOT indivisible for the exchange: a skewed batch — a
        hot repo whose files all hash to one bucket — would serialize
        the whole extract+encode behind a single task. Each bucket
        whose raw event count exceeds an even per-core share of the
        batch (`n_events / parallelism`) is split into
        ``ceil(count / share)`` sub-parts (capped at the core count),
        keyed by a path hash so a file's rows stay together. Uniform
        batches with >= parallelism touched buckets get all-1s — the
        exchange is exactly the old one-task-per-bucket plan."""
        import math
        par = max(1, self.n_partitions)
        share = max(1.0, n_events / par)
        return {b: min(par, max(1, math.ceil(cnt / share)))
                for b, cnt in bucket_counts.items()}

    # -- one micro-batch -------------------------------------------------------

    def apply_batch(self, events: DataFrame, lo: int, hi: int,
                    batch_id: int, prefetched: tuple | None = None) -> dict:
        """Apply events with lo < offset <= hi. Returns batch metrics."""
        batch = (events
                 .filter((F.col("offset") > lo) & (F.col("offset") <= hi))
                 .filter(F.col("path").rlike(TABULAR_SUFFIX_RE)))
        return self._apply(batch, lo, hi, batch_id, prefetched=prefetched)

    def _batch_precompute(self, events: DataFrame, lo: int,
                          hi: int) -> tuple:
        """The two read-only jobs a batch needs before its merge — the
        latest-wins winner set (cached) and the grouping-sets stats
        rollup — computed from the immutable event log alone, so the
        replay loop can run them for batch i+1 CONCURRENTLY with batch
        i's merge (guide §2.6: overlap independent jobs; the stats
        tasks back-fill the cores the merge's tail leaves idle).
        Returns (winners_df_cached, rolled_rows)."""
        batch = (events
                 .filter((F.col("offset") > lo) & (F.col("offset") <= hi))
                 .filter(F.col("path").rlike(TABULAR_SUFFIX_RE)))
        return self._precompute_from_batch(batch)

    def _precompute_from_batch(self, batch: DataFrame) -> tuple:
        w = Window.partitionBy("repo", "path").orderBy(F.desc("offset"))
        winners = (batch.select("repo", "path", "offset", "op")
                   .withColumn("_rn", F.row_number().over(w))
                   .filter(F.col("_rn") == 1).drop("_rn"))
        winners.cache()
        # NOTE deliberately NOT materialized here: an eager count in
        # the prefetch thread grabs a full task wave ahead of the
        # running merge under FIFO scheduling and measured ~15% SLOWER
        # end-to-end; the lazy cache materializes in the merge's
        # broadcast build instead
        rolled = (batch.withColumn(
            "_b", _bucket_expr(MERGE_KEY, self.n_buckets))
            .groupingSets([["partition"], ["_b"], []],
                          "partition", "_b")
            .agg(F.count("*").alias("n"),
                 F.countDistinct("offset").alias("n_offsets"),
                 F.min("offset").alias("min_offset"),
                 F.max("offset").alias("max_offset"),
                 F.grouping("partition").alias("_gp"),
                 F.grouping("_b").alias("_gb"))
            .collect())
        return winners, rolled

    def _apply(self, batch: DataFrame, lo: int, hi: int,
               batch_id: int, prefetched: tuple | None = None) -> dict:
        import os as _os
        import time as _time
        _dbg = _os.environ.get("GRATE_CDC_TIMING") == "1"
        _t0 = _time.perf_counter()

        def _mark(label):
            nonlocal _t0
            if _dbg:
                now = _time.perf_counter()
                print(f"    [batch {batch_id}] {label}: "
                      f"{now - _t0:.2f}s", flush=True)
                _t0 = now

        # latest-offset-wins per file key within the batch, computed on
        # KEY COLUMNS ONLY (repo, path, offset, op) — never the blob
        # payload. The winners set is one row per distinct key: small,
        # cacheable, broadcastable. The grouping sets
        # {(partition), (_b), ()} yield all three stat levels in ONE
        # action: (partition) -> per-partition lineage, (_b) ->
        # per-bucket event counts (touched set + the salt plan's skew
        # signal), () -> the GLOBAL countDistinct(offset) that catches
        # a duplicate offset redelivered under TWO different
        # `partition` values. Both jobs read only the immutable event
        # log, so the replay loop PREFETCHES them for batch i+1 while
        # batch i's merge runs (``prefetched``).
        if prefetched is not None:
            winners, rolled = prefetched
        else:
            winners, rolled = self._precompute_from_batch(batch)
        try:
            _mark("part stats")
            # grouping sets over ZERO input rows yield ZERO output rows
            # (not a single all-null total row), so an empty batch —
            # e.g. a range containing only non-tabular paths — must
            # short-circuit here; the caller advances the checkpoint
            # via its committed:False branch
            total = next((r for r in rolled
                          if r["_gp"] == 1 and r["_gb"] == 1), None)
            if total is None:
                return {"batch_id": batch_id, "n_events": 0,
                        "committed": False, "lo": lo, "hi": hi}
            part_rows = sorted((r for r in rolled if r["_gp"] == 0),
                               key=lambda r: r["partition"])
            # raw event count per bucket (deletes/duplicates included —
            # an upper-bound proxy for per-bucket extraction work)
            bucket_counts = {int(r["_b"]): r["n"] for r in rolled
                             if r["_gb"] == 0 and r["_gp"] == 1}
            n_events = total["n"]
            # duplicate delivery of the SAME offset inside one batch
            # would make the winners semi-join extract a blob twice;
            # detected here for free, such a batch takes the window
            # path, whose row_number drops exact duplicates
            has_dup_offsets = total["n_offsets"] != n_events
            if n_events == 0:
                return {"batch_id": batch_id, "n_events": 0,
                        "committed": False, "lo": lo, "hi": hi}
            touched = sorted(bucket_counts)
            part_stats = [{"partition": r["partition"], "n": r["n"],
                           "min_offset": r["min_offset"],
                           "max_offset": r["max_offset"]}
                          for r in part_rows]

            win_iu = winners.filter(F.col("op") != "D") \
                .select("repo", "path", "offset")
            if n_events <= self.broadcast_winners_max \
                    and not has_dup_offsets:
                # broadcast semi-join selects the winning blob rows
                # straight off the scan: NO shuffle of blob payloads at
                # all — extraction parallelism is the scan's split
                # count, and the only shuffle in the whole batch is the
                # (small) extracted-row bucket exchange in the merge.
                blobs = (batch.filter(F.col("op") != "D")
                         .join(F.broadcast(win_iu),
                               ["repo", "path", "offset"])
                         .select("repo", "path", "commit", "lang",
                                 "content", "offset"))
            else:
                # winners too big to broadcast: full-row latest-wins
                # window — ONE blob shuffle, co-partitioned on the
                # merge key, so a hot repo still fans out (at cluster
                # scale a bucketed event table turns this into SPJ)
                w = Window.partitionBy("repo", "path") \
                    .orderBy(F.desc("offset"))
                latest = (batch.withColumn(
                    "_rn", F.row_number().over(w))
                    .filter((F.col("_rn") == 1) & (F.col("op") != "D"))
                    .drop("_rn"))
                blobs = latest.select("repo", "path", "commit", "lang",
                                      "content", "offset")
            shuffle_parts = int(self.spark.conf.get(
                "spark.sql.shuffle.partitions"))
            bucket_blobs = self.bucket_blobs
            if bucket_blobs:
                # cluster blobs on the merge bucket now so the extracted
                # rows are born bucket-partitioned and the MoR write
                # needs no exchange of its own (extract -> encode fuse).
                # Base grain is one task per touched bucket; buckets
                # whose event count exceeds an even per-core share are
                # SUB-SPLIT with a per-bucket path salt, so a skewed
                # batch (one hot repo -> one bucket) no longer
                # serializes extraction+write behind a single task.
                # partitionBy("_bucket") still yields one file per
                # bucket PER TASK, so a salted bucket lands as n_sub
                # files — the manifest already supports that.
                bexpr = _bucket_expr(MERGE_KEY, self.n_buckets)
                if self.python_encode:
                    # arrow-native fused writer: attach lineage + the
                    # JVM-computed bucket BEFORE the exchange, and
                    # unwrap base64 on the map side so the shuffle
                    # carries raw bytes (~25% fewer for binary blobs)
                    from ..operators.extraction import unwrap_content
                    blobs = unwrap_content(
                        blobs.withColumn("src_offset",
                                         F.col("offset")),
                        keep=("src_offset",)).withColumn("_bucket",
                                                         bexpr)
                n_sub = self._salt_plan(bucket_counts, n_events) \
                    if self.salt_buckets else {}
                k_env = int(_os.environ.get("GRATE_WRITE_TASKS", "0"))
                if any(s > 1 for s in n_sub.values()):
                    pairs = [x for b, s in n_sub.items() if s > 1
                             for x in (F.lit(b), F.lit(s))]
                    mod = F.coalesce(
                        F.element_at(F.create_map(*pairs), bexpr),
                        F.lit(1))
                    salt = F.pmod(F.xxhash64(F.col("path")), mod)
                    k = k_env or sum(n_sub.values())
                    blobs = blobs.repartition(k, bexpr, salt)
                else:
                    k = k_env or max(1, len(touched))
                    blobs = blobs.repartition(k, bexpr)
            elif self.force_repartition \
                    and self.n_partitions != shuffle_parts:
                blobs = blobs.repartition(self.n_partitions,
                                          "repo", "path")
            txn = self.lake.begin()
            all_keys = winners.select("repo", "path")
            if self.python_encode:
                # ONE heavy job, arrow-native: each task extracts its
                # blobs AND encodes parquet with pyarrow inside the
                # Python worker; only per-file manifest rows (plus the
                # row stats, free on the same pass) come back. Row
                # data never re-crosses into the JVM and parquet-mr is
                # out of the hot path (operators/fused_write.py).
                from ..operators.fused_write import (ROW_SCHEMA,
                                                     extract_encode_files)
                rel = txn.stage_rel(RESULTS_TABLE)
                full = _os.path.join(self.lake.root, rel)
                manifest = extract_encode_files(
                    blobs, full, rel, txn.next_seq(),
                    batch_id).collect()
                _mark("fused extract->encode (arrow-native)")
                entries_by_bucket: dict[str, list[dict]] = {}
                for r in manifest:
                    entries_by_bucket.setdefault(
                        str(r["bucket"]), []).append(
                        {"path": r["path"],
                         "bounds": {"repo": [r["repo_min"],
                                             r["repo_max"]],
                                    "path": [r["path_min"],
                                             r["path_max"]]}})
                stats = txn.merge_files(RESULTS_TABLE, ROW_SCHEMA,
                                        entries_by_bucket, all_keys,
                                        MERGE_KEY, self.n_buckets,
                                        touched=touched,
                                        approx_keys=n_events)
                n_rows = int(sum(r["n_rows"] for r in manifest))
                n_error_rows = int(sum(r["n_error_rows"]
                                       for r in manifest))
                max_cols = int(max((r["max_cols"] for r in manifest),
                                   default=0))
                _mark("register files + markers")
            else:
                rows = with_content_sha(extract_files(blobs))

                # lineage columns come from the driving event
                ev_meta = win_iu.select(
                    "repo", "path", F.col("offset").alias("src_offset"))
                rows = rows.join(F.broadcast(ev_meta),
                                 ["repo", "path"]) \
                    .withColumn("batch_id", F.lit(batch_id))

                # row stats ride the merge write itself via an
                # Observation — zero extra jobs, no re-read of the
                # written files (at scale a re-read is a second pass
                # over the batch's output)
                from pyspark.sql import Observation
                obs = Observation(f"cdc-batch-{batch_id}")
                rows = rows.observe(
                    obs,
                    F.count(F.lit(1)).alias("n_rows"),
                    F.count("error").alias("n_error_rows"),
                    F.max(F.size("cells")).alias("max_cols"))

                # ONE heavy job: extraction fused straight into the MoR
                # merge write (map-side extract -> bucket shuffle ->
                # write)
                stats = txn.merge_replace_keys(
                    RESULTS_TABLE, rows, all_keys, MERGE_KEY,
                    self.n_buckets, touched=touched,
                    pre_partitioned=bucket_blobs,
                    approx_keys=n_events)
                _mark("merge results (extraction fused)")

                # the merge's write action completed, so the observed
                # metrics are available without touching the data again
                vals = obs.get
                n_rows = int(vals["n_rows"] or 0)
                n_error_rows = int(vals["n_error_rows"] or 0)
                max_cols = int(vals["max_cols"] or 0)
                _mark("row stats (observed on the merge write)")

            if self.wide_view and stats["files"]:
                # the wide merge needs the typed-width projection, whose
                # width (max_cols) we only know post-write; read the
                # files the merge just wrote (column-pruned) as input.
                # Those files are already bucket-pure (partitionBy wrote
                # one bucket per file), and the projection never moves a
                # row across keys — so the wide write is pre_partitioned
                # too: the whole wide path runs without ANY exchange
                # (scan -> project -> encode in one fused stage).
                # `touched` was computed under the RESULTS bucket spec;
                # after rebucket(results, k) the wide table may keep a
                # DIFFERENT spec, under which that set would silently
                # drop rows — let the merge re-derive its own touched
                # set (and re-cluster) whenever the specs disagree.
                wt = txn.tables.get(WIDE_TABLE)
                same_spec = wt is None \
                    or int(wt["n_buckets"]) == self.n_buckets
                written = self.spark.read.parquet(*stats["files"])
                txn.merge_replace_keys(WIDE_TABLE,
                                       _wide_view(written, max_cols,
                                                  self.wide_max_cols),
                                       all_keys, MERGE_KEY,
                                       self.n_buckets,
                                       touched=touched if same_spec
                                       else None,
                                       pre_partitioned=same_spec,
                                       approx_keys=n_events)
                _mark("merge wide view (fused, no exchange)")

            # per-batch ingest metrics buffer — flushed to the metrics
            # table in one write by flush_metrics() (replay calls it);
            # the lineage entry below carries the same facts durably in
            # the SAME commit as the data, so a crash loses no metrics
            self._pending_metrics.append(
                (batch_id, lo, hi, n_events, n_rows, n_error_rows,
                 len(stats["buckets"])))

            txn.set_checkpoint(
                {"global": hi},
                {"batch_id": batch_id, "lo": lo, "hi": hi,
                 "n_rows": n_rows, "n_error_rows": n_error_rows,
                 "partitions": part_stats,
                 "buckets": stats["buckets"]})
            txn.commit()
            _mark("manifest commit")
            return {"batch_id": batch_id, "n_events": n_events,
                    "n_rows": n_rows, "n_error_rows": n_error_rows,
                    "committed": True, "lo": lo, "hi": hi}
        finally:
            winners.unpersist()

    def flush_metrics(self) -> None:
        """Write buffered per-batch ingest metrics in one commit.

        Driver-side pyarrow write: metrics are a handful of rows per
        batch, so spinning a Spark job (schedule + shuffle-free write +
        listdir) for them was pure fixed cost on the ingest path."""
        if not self._pending_metrics:
            return
        from pyspark.sql.types import (IntegerType, LongType,
                                       StructField, StructType)
        schema = StructType([
            StructField("batch_id", IntegerType()),
            StructField("lo", LongType()),
            StructField("hi", LongType()),
            StructField("n_events", LongType()),
            StructField("n_rows", LongType()),
            StructField("n_error_rows", LongType()),
            StructField("n_buckets", IntegerType()),
        ])
        txn = self.lake.begin()
        txn.append_rows(METRICS_TABLE, self._pending_metrics, schema)
        txn.commit()
        self._pending_metrics = []

    # -- the replay loop -------------------------------------------------------

    def replay(self, events: DataFrame, batch_size: int | None = None,
               max_batches: int | None = None,
               compact_after_markers: int = 256,
               compact_after_marker_bytes: int = 128 << 20,
               squash_after_marker_files: int = 24) -> list[dict]:
        """Tail the log from the committed checkpoint to its high
        watermark in offset-bounded batches. Restart-safe: the checkpoint
        is read from the last committed manifest.

        ``compact_after_markers`` / ``compact_after_marker_bytes``: when
        a table accumulates more than this many MoR marker files OR this
        many marker bytes (marker growth tracks distinct touched keys,
        not batch count — one huge batch can outgrow the broadcast
        budget on its own), fold them into the data files after the
        replay loop (maintenance off the ingest critical path). Until
        compaction runs, reads stay correct regardless: the MoR read
        switches from broadcast to shuffle join past the broadcast
        budget (lake.read).

        ``squash_after_marker_files``: when compaction is NOT warranted
        but the marker FILE count (one per merge commit) outgrows this,
        squash them into one max(seq)-per-key file — O(marker keys),
        no data rewrite, so long replays don't degrade reads with
        thousands of tiny marker unions."""
        import os as _os
        import time as _time
        _dbg = _os.environ.get("GRATE_CDC_TIMING") == "1"
        _t = _time.perf_counter()
        # batch [lo, hi] ranges are pure arithmetic over (checkpoint,
        # batch_size, hwm) — the checkpoint advances to hi whether or
        # not a batch commits rows — so each batch's read-only jobs
        # (winners window + stats rollup over the immutable log) can be
        # PREFETCHED on a driver thread while the previous batch's
        # merge (or, for batch 1, the hwm scan) runs: their tasks
        # back-fill the cores the merge's straggler tail leaves idle
        # (guide §2.6). A prefetched hi past the hwm selects exactly
        # the (lo, hwm] rows, so the optimistic first guess also
        # covers a final short batch.
        from concurrent.futures import ThreadPoolExecutor
        pool = None
        pending = None  # (lo, hi, future)
        self._sync_bucket_spec()
        ckpt0 = int(self.lake.checkpoint().get("global", 0))
        if batch_size is not None and (max_batches is None
                                       or max_batches > 0):
            pool = ThreadPoolExecutor(max_workers=1,
                                      thread_name_prefix="cdc-prefetch")
            pending = (ckpt0, ckpt0 + batch_size,
                       pool.submit(self._batch_precompute, events,
                                   ckpt0, ckpt0 + batch_size))
        hwm_row = events.agg(F.max("offset").alias("h")).collect()[0]
        if _dbg:
            print(f"    [replay] hwm scan: "
                  f"{_time.perf_counter() - _t:.2f}s", flush=True)
        hwm = hwm_row["h"] or 0
        results = []
        n = 0
        try:
            while True:
                ckpt = int(self.lake.checkpoint().get("global", 0))
                if ckpt >= hwm:
                    break
                if max_batches is not None and n >= max_batches:
                    break
                hi = hwm if batch_size is None \
                    else min(ckpt + batch_size, hwm)
                batch_id = len(self.lake.lineage()) + 1
                pre = None
                if pending is not None:
                    if pending[0] == ckpt and (
                            pending[1] == hi
                            or (hi == hwm and pending[1] >= hwm)):
                        pre = pending[2].result()
                    else:  # resumed elsewhere: discard the prefetch
                        pending[2].result()[0].unpersist()
                    pending = None
                nxt_lo = hi
                nxt_hi = hwm if batch_size is None \
                    else min(hi + batch_size, hwm)
                if nxt_lo < nxt_hi and (max_batches is None
                                        or n + 1 < max_batches):
                    if pool is None:
                        pool = ThreadPoolExecutor(
                            max_workers=1,
                            thread_name_prefix="cdc-prefetch")
                    pending = (nxt_lo, nxt_hi,
                               pool.submit(self._batch_precompute,
                                           events, nxt_lo, nxt_hi))
                import time as _time
                t0 = _time.perf_counter()
                res = self.apply_batch(events, ckpt, hi, batch_id,
                                       prefetched=pre)
                res["seconds"] = _time.perf_counter() - t0
                if not res.get("committed"):
                    # nothing tabular in range: still advance the
                    # checkpoint so replay terminates (offset watermark
                    # only)
                    txn = self.lake.begin()
                    txn.set_checkpoint({"global": hi},
                                       {"batch_id": batch_id,
                                        "lo": ckpt,
                                        "hi": hi, "partitions": [],
                                        "buckets": []})
                    txn.commit()
                results.append(res)
                n += 1
        finally:
            if pending is not None:
                try:
                    pending[2].result()[0].unpersist()
                except Exception:
                    pass
            if pool is not None:
                pool.shutdown()
        _t = _time.perf_counter()
        self.flush_metrics()
        if _dbg:
            print(f"    [replay] flush_metrics: "
                  f"{_time.perf_counter() - _t:.2f}s", flush=True)
        _t = _time.perf_counter()
        if compact_after_markers is not None:
            m = self.lake.manifest()
            for tname in (RESULTS_TABLE, WIDE_TABLE):
                t = m["tables"].get(tname)
                if not t:
                    continue
                entries = [e for fs in t.get("markers", {}).values()
                           for e in fs]
                n_bytes = sum(e.get("bytes", 0) for e in entries)
                if (len(entries) > compact_after_markers
                        or n_bytes > compact_after_marker_bytes):
                    # INCREMENTAL: rewrite only the marker-dense buckets
                    # (>= the mean marker-key count), so maintenance is
                    # O(chosen buckets), never O(table); remaining
                    # buckets keep their tombstones and get picked up by
                    # a later trigger. At 10^10 events a full-table
                    # rewrite on the maintenance path would dwarf the
                    # ingest itself.
                    counts = self.lake.marker_bucket_counts(tname)
                    chosen = None
                    if counts:
                        mean = sum(counts.values()) / len(counts)
                        chosen = [b for b, c in counts.items()
                                  if c >= mean]
                    txn = self.lake.begin()
                    txn.compact(tname, buckets=chosen)
                    txn.commit()
                    m = self.lake.manifest()
                elif (squash_after_marker_files is not None
                        and len(entries) > squash_after_marker_files):
                    # not worth a data rewrite yet, but the marker
                    # union is fragmenting: fold the files (cheap,
                    # O(marker keys))
                    txn = self.lake.begin()
                    txn.squash_markers(tname)
                    txn.commit()
                    m = self.lake.manifest()
        if _dbg:
            print(f"    [replay] compaction check: "
                  f"{_time.perf_counter() - _t:.2f}s", flush=True)
        return results

    def compact(self) -> None:
        """Maintenance: fold MoR markers into data files for all result
        tables (one atomic commit). Run off the ingest critical path."""
        txn = self.lake.begin()
        txn.compact(RESULTS_TABLE)
        if self.wide_view and WIDE_TABLE in txn.tables:
            txn.compact(WIDE_TABLE)
        txn.commit()

    # -- Structured Streaming adapter -------------------------------------------

    def run_streaming(self, events_dir: str, schema,
                      checkpoint_dir: str,
                      max_files_per_trigger: int = 1) -> None:
        """The same engine under Structured Streaming: a file-source
        stream of event parquet files, applied via foreachBatch. The
        lake's own offset checkpoint (not only Spark's) guards each
        batch, so retries/redelivery stay exactly-once; the replay loop
        and this path produce identical table states.
        """
        def _sink(df: DataFrame, _spark_batch_id: int) -> None:
            self._sync_bucket_spec()
            ckpt = int(self.lake.checkpoint().get("global", 0))
            fresh = (df.filter(F.col("offset") > ckpt)
                     .filter(F.col("path").rlike(TABULAR_SUFFIX_RE)))
            hi_row = df.agg(F.max("offset").alias("h")).collect()[0]
            hi = hi_row["h"]
            if hi is None or hi <= ckpt:
                return
            batch_id = len(self.lake.lineage()) + 1
            res = self._apply(fresh, ckpt, int(hi), batch_id)
            if not res.get("committed"):
                txn = self.lake.begin()
                txn.set_checkpoint({"global": int(hi)},
                                   {"batch_id": batch_id, "lo": ckpt,
                                    "hi": int(hi), "partitions": [],
                                    "buckets": []})
                txn.commit()

        stream = (self.spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", max_files_per_trigger)
                  .parquet(events_dir))
        q = (stream.writeStream.foreachBatch(_sink)
             .option("checkpointLocation", checkpoint_dir)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()

    # -- reads ------------------------------------------------------------------

    def results(self) -> DataFrame:
        return self.lake.read(RESULTS_TABLE)

    def results_wide(self) -> DataFrame:
        return self.lake.read(WIDE_TABLE)

    def metrics(self) -> DataFrame:
        return self.lake.read(METRICS_TABLE)
