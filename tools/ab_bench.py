"""Same-hour interleaved A/B bench control (SCALING section 8d/8e protocol).

When ``tools/bench_diff.py`` flags keys in the SHIPPED round pair, the
adjudication is an interleaved A/B of the two code versions on this
host, same hour: host drift hits both sides alike, so only a delta
where one side's distribution dominates is code-attributable. Round 10
ran this by hand for an intermediate artifact and the judge found the
FINAL artifact's flags unadjudicated (VERDICT r10 item 1) — this tool
makes the protocol a command.

Orchestrator (run from the current repo):

    python tools/ab_bench.py --old <git-ref> \
        --keys bm25_index_build,ivf_index_build,ann_pq_topk \
        --reps 3 --out BENCH_r11_ab_control.json

creates a detached worktree of ``--old`` under /tmp, then alternately
spawns one measurement subprocess per side per rep (old, new, old,
new, ...), each a fresh JVM/SparkSession so no page-cache or JIT state
leaks across sides. Measurement mode (``--measure``) runs inside one
side's code via PYTHONPATH and prints a single JSON line.

Supported keys mirror bench.py's semantics for the same names:

- build keys (``*_index_build``): clear the recipe's cache dir, time
  the ``_ensure_*`` build, min over ``--inner`` attempts;
- registry query keys: ``clear_managed_caches()`` once, then time
  ``QUERIES[name](spark, sf).count()`` min-of-``--inner`` (bench.py's
  registry loop shape — caches warmed by run 1 persist into run 2,
  exactly as in the sweep). Prebuilt-index keys get their index
  ensured (untimed) first, as bench.py's build phase does.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# build-key name -> (recipe tag, registry ensure-fn name)
BUILD_KEYS = {
    "bm25_index_build": ("bm25_v2_b32", "_ensure_bm25_index"),
    "ivf_index_build": ("ivf_v1", "_ensure_ivf_index"),
    "ivfpq_index_build": ("ivfpq_v2_c16m8k16", "_ensure_ivfpq_index"),
    "trgm_index_build": ("trgm_v2_b16", "_ensure_trigram_index"),
    # lifecycle builds (build+append / streamed-up): their _ensure fns
    # gate on completion markers inside the recipe dir, so the rmtree
    # before each inner run forces a genuine rebuild
    "trgm_incremental_build": ("trgm_inc_v1_b8", "_ensure_trgm_inc_index"),
    "trgm_streaming_build": ("trgm_stream_v1_b8", "_ensure_trgm_stream_index"),
}

# serving QPS keys: measured with bench.py's meter shapes (same thread
# counts, same warm pass, AQE off, 8-partition cached working set);
# median over --inner reps, reported in q/s (higher = better)
SERVING_KEYS = ("serving_concurrent_qps", "serving_microbatch_qps")

# query keys that probe a prebuilt index: ensure it exists (untimed)
# before timing, matching bench.py's build-then-sweep ordering
PREBUILT_DEPS = {
    "ann_ivfpq_probe_prebuilt": "_ensure_ivfpq_index",
    "ann_ivfpq_exact_rescore": "_ensure_ivfpq_index",
    "bm25_indexed_topk": "_ensure_bm25_index",
    "ann_ivf_built_topk": "_ensure_ivf_index",
}


def _measure_serving(spark, sf_dir: str, keys: list[str], inner: int) -> dict:
    """bench.py's serving meters, verbatim shapes: job-per-query under 16
    parallel clients (concurrent) and the MicroBatcher dispatch loop
    under 32 clients (microbatch). One unrecorded warm pass, then the
    requested keys interleaved ``inner`` times; per-key MEDIAN q/s."""
    import threading

    from pyspark.sql import functions as F

    from vectolite_spark.operators.topk import topk_ids
    from vectolite_spark.schema import load_table
    from vectolite_spark.serving import MicroBatcher

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    embs = load_table(spark, sf_dir, "embeddings").coalesce(8).cache()
    embs.count()
    qvecs = [
        [float(x) for x in r["embedding"]]
        for r in embs.filter(F.col("vec_id") % 199 == 7).limit(12).collect()
    ]

    def _threaded(n_threads, per_thread, call) -> float:
        def worker(tid: int) -> None:
            for i in range(per_thread):
                call(tid, i)

        worker(0)  # per-rep warm: JIT + caches for THIS shape
        t0 = time.time()
        threads = [
            threading.Thread(target=worker, args=(t,))
            for t in range(n_threads)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return round(n_threads * per_thread / (time.time() - t0), 1)

    mb = MicroBatcher(embs, k=10, max_batch=64, max_wait_ms=8)
    meters = {
        "serving_concurrent_qps": lambda: _threaded(
            16, 8,
            lambda tid, i: topk_ids(
                embs, qvecs[(tid + i) % len(qvecs)], 10
            ).collect(),
        ),
        "serving_microbatch_qps": lambda: _threaded(
            32, 8, lambda tid, i: mb.query(qvecs[(tid + i) % len(qvecs)])
        ),
    }
    for name in keys:
        meters[name]()  # unrecorded warm pass
    samples: dict[str, list[float]] = {n: [] for n in keys}
    for _ in range(inner):
        for name in keys:
            samples[name].append(meters[name]())
    try:
        mb.close()
    except AttributeError:  # older refs: no close()
        pass
    embs.unpersist()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return {
        n: sorted(v)[len(v) // 2] for n, v in samples.items()
    }


def measure(keys: list[str], inner: int) -> dict[str, float]:
    import shutil

    from vectolite_spark import registry
    from vectolite_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    out: dict[str, float] = {}
    # builds first, then untimed prebuilt deps, then query keys — the
    # same phase order bench.py uses
    for name in keys:
        if name not in BUILD_KEYS:
            continue
        recipe, fn_name = BUILD_KEYS[name]
        # older --old refs predate some lifecycle builds (e.g. the
        # trgm_inc/trgm_stream _ensure fns landed r10/r11) — emit NaN
        # instead of crashing the measurement subprocess, mirroring the
        # clear_managed_caches ImportError fallback below
        fn = getattr(registry, fn_name, None)
        if fn is None:
            out[name] = float("nan")
            continue
        best = None
        for _ in range(inner):
            shutil.rmtree(
                registry.index_cache_path(recipe, sf_dir), ignore_errors=True
            )
            t0 = time.time()
            fn(spark, sf_dir)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 4)
    for name in keys:
        dep = PREBUILT_DEPS.get(name)
        if dep is not None:
            dep_fn = getattr(registry, dep, None)
            if dep_fn is not None:
                dep_fn(spark, sf_dir)
    try:
        from vectolite_spark.operators.dedup import clear_managed_caches
    except ImportError:  # pragma: no cover - very old refs
        clear_managed_caches = lambda: None  # noqa: E731
    serving_wanted = [n for n in keys if n in SERVING_KEYS]
    if serving_wanted:
        out.update(_measure_serving(spark, sf_dir, serving_wanted, inner))
    for name in keys:
        if name in BUILD_KEYS or name in SERVING_KEYS:
            continue
        fn = registry.QUERIES.get(name)
        if fn is None:
            out[name] = float("nan")
            continue
        clear_managed_caches()
        best = None
        for _ in range(inner):
            t0 = time.time()
            fn(spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 4)
    spark.stop()
    return out


def orchestrate(args) -> int:
    old_wt = os.path.join("/tmp", f"ab_old_{args.old.replace('/', '_')}")
    if not os.path.isdir(old_wt):
        subprocess.run(
            ["git", "worktree", "add", "--detach", old_wt, args.old],
            cwd=REPO,
            check=True,
        )
    sides = [("old", old_wt), ("new", REPO)]
    reps: list[dict] = []
    keys = args.keys.split(",")
    for i in range(args.reps):
        for label, path in sides:
            env = dict(os.environ)
            env["PYTHONPATH"] = path
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--measure",
                    args.keys,
                    "--inner",
                    str(args.inner),
                ],
                cwd=path,
                env=env,
                capture_output=True,
                text=True,
            )
            line = (proc.stdout.strip().splitlines() or ["{}"])[-1]
            try:
                vals = json.loads(line)
            except json.JSONDecodeError:
                print(proc.stdout[-2000:], file=sys.stderr)
                print(proc.stderr[-2000:], file=sys.stderr)
                return 1
            rec = {"code": label, "ref": args.old if label == "old" else "HEAD"}
            rec.update(vals)
            reps.append(rec)
            print(json.dumps(rec), flush=True)
    artifact = {
        "what": (
            "Same-hour interleaved A/B (SCALING 8d protocol, tools/"
            f"ab_bench.py): old code (worktree @ {args.old}) vs current "
            f"repo, {args.reps} alternating reps per side, fresh "
            "SparkSession per rep, min-of-"
            f"{args.inner} inner runs per key, "
            f"sf={os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')}."
        ),
        "keys": keys,
        "reps": reps,
    }
    # per-side min/max summary so the overlap verdict is readable
    summary: dict[str, dict] = {}
    for k in keys:
        summary[k] = {}
        for label, _ in sides:
            vals = [r[k] for r in reps if r["code"] == label and k in r]
            if vals:
                summary[k][label] = {
                    "min": min(vals),
                    "max": max(vals),
                    "median": sorted(vals)[len(vals) // 2],
                }
    artifact["summary"] = summary
    if args.out:
        with open(os.path.join(REPO, args.out), "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"wrote {args.out}")
    print(json.dumps(summary, indent=1))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", help="comma-separated keys: run one rep here")
    ap.add_argument("--old", help="git ref of the prior round's code")
    ap.add_argument("--keys", help="comma-separated keys to adjudicate")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--inner", type=int, default=2)
    ap.add_argument("--out", help="artifact filename (written at repo root)")
    args = ap.parse_args()
    if args.measure:
        vals = measure(args.measure.split(","), args.inner)
        print(json.dumps(vals))
        return 0
    if not (args.old and args.keys):
        ap.error("need --old and --keys (or --measure)")
    return orchestrate(args)


if __name__ == "__main__":
    sys.exit(main())
