"""10x-scale probe + wedged-task experiment (BENCH/BASELINE.md §10x).

Generates a 1M-image table on tmpfs once, then runs the pinned flagship
pipeline at the requested levels/rounds through bench.pipeline_subprocess
(inherits the hard timeout + process-group kill + retry). Each run records
wall seconds and CPU/DRAM envelopes; results append to
``BENCH/probe_1m_runs.jsonl`` so windows accumulate across invocations.

The wedged-task experiment rides along for free: every run now executes
with ``spark.python.worker.idleTimeoutSeconds=600`` +
``killOnIdleTimeout=true`` on a retry-capable ``local[N,F]`` master
(session.py:_retryable_master — plain local[N] hard-codes
maxTaskFailures=1, under which the idle-timeout kill would FAIL the job
at 600 s rather than retry the task). With both set, a recurrence of the
rare local-mode wedge (JVM task thread blocked reading from an idle
worker) kills the worker and the task retries; the run completes late
instead of hanging into the 900 s subprocess kill. A run that previously
wedged shows up here as ``seconds`` ≈ normal + ~600 rather than a
timeout retry.

Usage: python scripts/probe_1m.py [--rounds 2] [--levels 2,8,32] [--n 1000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH",
    "probe_1m_runs.jsonl",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--levels", type=str, default="2,8,32")
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--keep-images", type=str, default="", help="reuse an existing table dir")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    import bench
    from rio_color_spark.session import get_spark
    from rio_color_spark.sources.images import write_images

    if args.keep_images:
        img_path = args.keep_images
        img_dir = None
    else:
        img_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
        img_dir = tempfile.mkdtemp(prefix="rcs_probe1m_", dir=img_base)
        img_path = img_dir + "/images"
        spark = get_spark("probe-1m-gen", master="local[32]", shuffle_partitions=32)
        t0 = time.perf_counter()
        write_images(spark, args.n, img_path, partitions=256)
        print(f"generated {args.n} images in {time.perf_counter() - t0:.1f}s -> {img_path}")
        spark.stop()

    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    stamp = int(time.time())
    try:
        for rnd in range(args.rounds):
            for cpus in levels:
                t0 = time.perf_counter()
                r = bench.pipeline_subprocess(cpus, img_path, args.n)
                rec = {
                    "window": stamp,
                    "round": rnd,
                    "cpus": cpus,
                    "n": args.n,
                    "seconds": round(r["seconds"], 2),
                    "images_per_sec": round(args.n / r["seconds"], 1),
                    "env_before": r["env_before"],
                    "env_after": r["env_after"],
                    "wall_with_retries": round(time.perf_counter() - t0, 2),
                }
                with open(OUT_PATH, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                print(json.dumps(rec))
    finally:
        if img_dir:
            import shutil

            shutil.rmtree(img_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
