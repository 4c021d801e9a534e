"""SparkSession factory tuned for the image pipeline.

Arrow is the JVM↔Python wire for every pixel operator, so the session pins
the Arrow batch size (the analogue of the reference's 32×32 block windows —
cli.py:81-83 — which bounded memory per work unit) and enables AQE for
runtime re-planning of the spatial joins.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession

#: task retries for local-mode masters. Spark hard-codes maxTaskFailures=1
#: for plain ``local``/``local[N]`` (SparkContext.createTaskScheduler), so
#: any task-level self-healing — including the idle-timeout worker kill
#: below — would fail the whole JOB on first trigger. ``local[N,F]`` is the
#: retry-capable local master form; every engine session uses it.
LOCAL_TASK_RETRIES = int(os.environ.get("SPARK_GRAFT_TASK_RETRIES", "4"))

_PLAIN_LOCAL = re.compile(r"local\[(\d+|\*)\]$")


def _retryable_master(master: str) -> str:
    """``local[N]`` → ``local[N,F]`` so task failures retry instead of
    failing the job (cluster masters pass through untouched)."""
    m = _PLAIN_LOCAL.fullmatch(master)
    if m and LOCAL_TASK_RETRIES > 1:
        return f"local[{m.group(1)},{LOCAL_TASK_RETRIES}]"
    return master

#: rows per Arrow batch crossing into Python workers. At the default 32×32
#: uint8 RGB payload (~3 KiB/row) this bounds a batch to ~6 MiB, keeping
#: per-task memory flat regardless of partition size (the color operator
#: further cache-blocks the math inside each batch — see operators/color.py).
ARROW_BATCH_ROWS = 2048

#: every elementwise kernel is single-threaded by design — parallelism comes
#: from Spark tasks. Pin the numeric libraries' thread pools so 32 python
#: workers don't each spawn their own.
_WORKER_ENV_PINS = {
    "OMP_NUM_THREADS": "1",
    "OPENBLAS_NUM_THREADS": "1",
    "MKL_NUM_THREADS": "1",
    "VECLIB_MAXIMUM_THREADS": "1",
    "NUMEXPR_NUM_THREADS": "1",
}


def get_spark(
    app_name: str = "rio_color_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with the engine's tuning applied.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (all cores if the
    env var is unset). On a real cluster, pass ``master=None`` and let
    spark-submit supply it.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    master = _retryable_master(master)
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    # local-mode python workers inherit the driver env
    for k, v in _WORKER_ENV_PINS.items():
        os.environ.setdefault(k, v)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.parquet.compression.codec", "zstd")
        # binary image payloads compress poorly and dictionary-encode worse
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        # straggler re-runs are valuable on a real cluster but duplicate
        # heavy Python tasks on this oversubscribed single box — opt-in
        .config(
            "spark.speculation",
            os.environ.get("SPARK_GRAFT_SPECULATION", "false"),
        )
        .config("spark.speculation.multiplier", "2")
        .config("spark.speculation.quantile", "0.9")
        # scan-split size. MEASURED on the 100k-image pipeline (r3): 16 MiB
        # splits of a 256-file input made one ~390-row task per file — each
        # task crossed into Python with a single undersized Arrow batch and
        # per-task overhead dominated (local[8] 22.0 s). Packing ~3-7 files
        # per split fills the 2048-row Arrow batches and amortizes the
        # worker round-trip: 64 MiB → 13.2 s, 128 MiB → 10.8 s at local[8]
        # (and 36.5 s vs 77.7 s at local[2]). 128 MiB is also the standard
        # cluster setting. Env-tunable; never lower it below the parquet
        # row-group size (openCostInBytes is the packing knob — see below).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m"),
        )
        # packing knob for many-small-files tables: raising the open cost
        # toward maxPartitionBytes gives ~one file per split WITHOUT
        # creating sub-file splits (sub-row-group split planning of zstd
        # parquet measured 15-25x slower scans on this box: a 3.6 GB scan
        # took 148 s at 2 MB splits vs 5.9 s at 64 MB)
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_OPEN_COST", "4m"),
        )
        .config("spark.ui.showConsoleProgress", "false")
        # self-healing for the (rare, local-mode, 1M-scale) wedged-task
        # hazard: a JVM task thread stuck reading from an idle Python worker
        # (jstack: ReaderInputStream select, worker ~0% CPU — observed once
        # sitting 20+ min; BENCH/wedge_rootcause.md). With these set, the
        # read times out and the worker is killed; whether the TASK then
        # retries depends on the master's maxTaskFailures. Plain
        # local/local[N] hard-codes maxTaskFailures=1 (task failure = job
        # failure), which is why _retryable_master above rewrites every
        # local master to local[N,F] — under it the kill is a seconds-scale
        # task retry; without it the job would fail at the timeout (still
        # strictly better than hanging forever, and bench.py's subprocess
        # retry recovers at the job level). Contract: every engine kernel
        # produces output per Arrow batch in far under this timeout
        # (batches are 2048 rows / ~6 MiB; kernels run in ms), so a
        # genuinely busy worker is never killed. On a 1000-executor cluster
        # this matters more: some worker somewhere WILL hang.
        .config(
            "spark.python.worker.idleTimeoutSeconds",
            os.environ.get("SPARK_GRAFT_WORKER_IDLE_TIMEOUT", "600"),
        )
        .config("spark.python.worker.killOnIdleTimeout", "true")
    )
    # shuffle/spill scratch on tmpfs when available: the sandbox's single
    # virtio disk collapses under concurrent writers (a cluster's shuffle
    # goes to per-node local disks)
    if os.path.isdir("/dev/shm") and "SPARK_LOCAL_DIRS" not in os.environ:
        scratch = "/dev/shm/spark-local"
        os.makedirs(scratch, exist_ok=True)
        builder = builder.config("spark.local.dir", scratch)
    return builder.getOrCreate()
