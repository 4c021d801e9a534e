"""Round-7 optimization harness (bench.py is FROZEN for measurement).

Per-operator isolation per the optimization guide §1: noop sink, min-of-N
steady-state timing on local[$SPARK_GRAFT_CPUS], with the physical plan
(`explain("formatted")`) captured to plans/r07/<query>_<tag>.txt.

Usage:
    python bench_extra.py [--tag before] [--runs 3] [--no-plans] [q1 q2 ...]
    python bench_extra.py --generate         # time write_images only
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r07")

DEFAULT_QUERIES = [
    "gamma", "dsl_chain", "saturation", "tile_encode", "cell_encode",
    "pip_join", "knn_geo", "dedup_exact", "minhash_sig", "lsh_pairs",
    "simhash", "token_count", "quality", "ann_topk", "ann_lsh",
    "cosine_neardup", "band_stats", "tpch_q1", "events_window",
    "tiff_ingest", "frames_y4m",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default=None, help="plan file suffix (before/after)")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--generate", action="store_true")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as E
    from rio_color_spark.session import get_spark

    spark = get_spark("bench-extra", master=f"local[{CPUS}]", shuffle_partitions=32)
    sc = spark.sparkContext

    out: dict[str, object] = {}

    if args.generate:
        import shutil
        import tempfile

        from rio_color_spark.sources.images import write_images

        base = "/dev/shm" if os.path.isdir("/dev/shm") else None
        ts = []
        for _ in range(args.runs):
            d = tempfile.mkdtemp(prefix="rcs_bx_imgs_", dir=base)
            sc.setJobDescription("generate_images")
            t0 = time.perf_counter()
            write_images(spark, 100_000, d + "/images", partitions=256)
            ts.append(round(time.perf_counter() - t0, 3))
            shutil.rmtree(d, ignore_errors=True)
        out["generate_images"] = {"min": min(ts), "runs": ts}
        print(json.dumps(out))
        spark.stop()
        return

    names = args.queries or DEFAULT_QUERIES
    qs = E.queries()
    for name in names:
        ts = []
        t_build = []
        for i in range(args.runs):
            sc.setJobDescription(name)
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            t_build.append(round(time.perf_counter() - t0, 3))
            df.write.mode("overwrite").format("noop").save()
            ts.append(round(time.perf_counter() - t0, 3))
        if args.tag:
            os.makedirs(PLAN_DIR, exist_ok=True)
            df = qs[name](spark, SF_DIR)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(PLAN_DIR, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(txt)
        out[name] = {"min": min(ts), "runs": ts, "build": t_build}
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps({k: v["min"] for k, v in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
