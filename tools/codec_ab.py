"""Interleaved A/B of spark.io.compression.codec (lz4 vs zstd) at a
shuffle-dominated 10M-row shape (guide §2.3/§9; VERDICT r12 item 7).

The bench's sf0.1 shuffles are KB-MB, so the codec is second-order
there; this harness measures it where shuffle bytes dominate: 10M rows
x 64 float dims (~2.6 GB raw shuffle payload) generated deterministically
(xxhash64-derived values — no data files, no caching), pushed through
one full exchange (repartition by a 10k-key column) into a noop sink
(guide §1.4), plus a map-side-combined aggregation over the same rows.

Each rep runs in a FRESH subprocess/SparkSession (the codec is read at
context start), sides alternate so host drift hits both alike.

    python tools/codec_ab.py --rows 10000000 --reps 3
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def measure(codec: str, rows: int) -> dict:
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName(f"codec-ab-{codec}")
        .config("spark.io.compression.codec", codec)
        .config("spark.sql.shuffle.partitions", "200")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    dims = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda j: (
            F.pmod(F.xxhash64(F.col("id") * 64 + j), F.lit(100000)) / 100000.0
        ).cast("float"),
    )
    df = spark.range(int(rows)).select(
        F.col("id"),
        (F.col("id") % 10000).alias("k"),
        dims.alias("v"),
    )
    out = {}
    # 1. pure exchange of the wide payload -> noop (shuffle write+read)
    spark.sparkContext.setJobDescription(f"codec={codec}: wide exchange")
    t0 = time.time()
    df.repartition(200, "k").write.format("noop").mode("overwrite").save()
    out["wide_exchange_sec"] = round(time.time() - t0, 3)
    # 2. map-side-combined aggregation (partial rows cross the wire)
    spark.sparkContext.setJobDescription(f"codec={codec}: agg")
    t0 = time.time()
    df.groupBy("k").agg(
        F.sum(F.element_at("v", 1)).alias("s1"),
        F.count(F.lit(1)).alias("n"),
    ).write.format("noop").mode("overwrite").save()
    out["agg_sec"] = round(time.time() - t0, 3)
    spark.stop()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if os.environ.get("_CODEC_AB_MEASURE"):
        print(
            json.dumps(
                measure(os.environ["_CODEC_AB_MEASURE"], args.rows)
            )
        )
        return 0
    reps = []
    for i in range(args.reps):
        for codec in ("lz4", "zstd"):
            env = dict(os.environ, _CODEC_AB_MEASURE=codec)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--rows",
                 str(args.rows)],
                capture_output=True, text=True, env=env, timeout=1200,
            )
            line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
            rec = {"rep": i, "codec": codec}
            rec.update(json.loads(line[-1]) if line else {"error": proc.stderr[-300:]})
            reps.append(rec)
            print(json.dumps(rec), flush=True)
    result = {"what": "spark.io.compression.codec A/B, shuffle-heavy 10M-row shape",
              "rows": args.rows, "reps": reps}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
