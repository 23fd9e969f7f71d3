"""Per-job profile of a registry entry (or an index build): runs it on a
session with the event log enabled, then prints one line per Spark job —
wall ms, #stages, #tasks, input bytes, shuffle read/write bytes, and the
job's call site / description. This is the guide-§1 "where does the time
go" view for entries that are compositions of many jobs (lifecycle
capstones, in-entry index builds), where a single end-to-end number says
nothing about which pass to optimize.

Usage:
    python tools/profile_entry.py <entry_name> [sf_dir] [--runs N]
    python tools/profile_entry.py --build trgm_v2  # bench.py build fns

The event log is written to a throwaway dir and parsed in-process; no
Spark UI needed (spark.ui.enabled stays false).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.1"


def _session(log_dir: str):
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.appName("vl-profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.dir", log_dir)
        .getOrCreate()
    )


def parse_event_log(log_dir: str) -> list[dict]:
    """One dict per job: start/end ms, description, per-stage rollups."""
    files = []
    for root, _dirs, names in os.walk(log_dir):
        for f in names:
            if not f.startswith(".") and "appstatus" not in f:
                files.append(os.path.join(root, f))
    jobs: dict[int, dict] = {}
    stage_metrics: dict[int, dict] = {}  # stage_id -> rollup
    stage_names: dict[int, str] = {}
    for path in files:
        if path.endswith(".zstd"):
            import io
            import subprocess

            proc = subprocess.run(
                ["zstd", "-dc", path], capture_output=True, check=True
            )
            fh = io.StringIO(proc.stdout.decode("utf-8", errors="replace"))
        else:
            fh = open(path, errors="replace")
        with fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    props = ev.get("Properties") or {}
                    jobs[jid] = {
                        "job": jid,
                        "t0": ev["Submission Time"],
                        "desc": props.get("spark.job.description")
                        or props.get("callSite.short", ""),
                        "stages": [
                            s["Stage ID"] for s in ev.get("Stage Infos", [])
                        ],
                    }
                    for s in ev.get("Stage Infos", []):
                        stage_names[s["Stage ID"]] = s.get("Stage Name", "")
                elif e == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in jobs:
                        jobs[jid]["t1"] = ev["Completion Time"]
                elif e == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    m = ev.get("Task Metrics") or {}
                    sm = stage_metrics.setdefault(
                        sid,
                        {
                            "tasks": 0,
                            "input": 0,
                            "sh_read": 0,
                            "sh_write": 0,
                            "cpu_ms": 0,
                            "py_ms": 0,
                        },
                    )
                    sm["tasks"] += 1
                    sm["input"] += (m.get("Input Metrics") or {}).get(
                        "Bytes Read", 0
                    )
                    sm["sh_read"] += (
                        (m.get("Shuffle Read Metrics") or {}).get(
                            "Local Bytes Read", 0
                        )
                        + (m.get("Shuffle Read Metrics") or {}).get(
                            "Remote Bytes Read", 0
                        )
                    )
                    sm["sh_write"] += (
                        m.get("Shuffle Write Metrics") or {}
                    ).get("Shuffle Bytes Written", 0)
                    sm["cpu_ms"] += m.get("Executor CPU Time", 0) // 1_000_000
                    sm["py_ms"] += sum(
                        a.get("Update", 0)
                        for a in ev.get("Accumulables", [])
                        if a.get("Name") == "internal.metrics.pythonTime"
                    )
    out = []
    for jid in sorted(jobs):
        j = jobs[jid]
        roll = {"tasks": 0, "input": 0, "sh_read": 0, "sh_write": 0, "cpu_ms": 0}
        for sid in j["stages"]:
            sm = stage_metrics.get(sid)
            if sm:
                for k in roll:
                    roll[k] += sm[k]
        if not j["desc"] and j["stages"]:
            j["desc"] = stage_names.get(max(j["stages"]), "")[:100]
        out.append(
            {
                "job": jid,
                "ms": j.get("t1", j["t0"]) - j["t0"],
                "t0": j["t0"],
                "t1": j.get("t1", j["t0"]),
                "desc": (j["desc"] or "")[:100],
                "n_stages": len(j["stages"]),
                **roll,
            }
        )
    return out


def print_jobs(rows: list[dict], min_ms: int = 0) -> None:
    total = sum(r["ms"] for r in rows)
    print(
        f"{'job':>4} {'gap':>6} {'ms':>7} {'stg':>3} {'tasks':>5} {'inMB':>7} "
        f"{'shrMB':>7} {'shwMB':>7} {'cpu_ms':>7}  desc"
    )
    # gap = this job's start minus the latest end among all PRIOR jobs —
    # time no Spark job was running (driver-side work) just before it.
    # Concurrent (driver-thread) jobs show gap 0.
    last_end = None
    gap_total = 0
    for r in rows:
        gap = 0 if last_end is None else max(0, r["t0"] - last_end)
        gap_total += gap
        last_end = r["t1"] if last_end is None else max(last_end, r["t1"])
        if r["ms"] < min_ms and gap < min_ms:
            continue
        print(
            f"{r['job']:>4} {gap:>6} {r['ms']:>7} {r['n_stages']:>3} "
            f"{r['tasks']:>5} "
            f"{r['input'] / 1e6:>7.1f} {r['sh_read'] / 1e6:>7.1f} "
            f"{r['sh_write'] / 1e6:>7.1f} {r['cpu_ms']:>7}  {r['desc']}"
        )
    print(
        f"-- {len(rows)} jobs, sum(job wall) = {total} ms, "
        f"sum(inter-job gap) = {gap_total} ms"
    )


def main() -> None:
    import argparse
    import shutil
    import tempfile

    ap = argparse.ArgumentParser()
    ap.add_argument("entry")
    ap.add_argument("sf_dir", nargs="?", default=SF_DIR)
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--min-ms", type=int, default=0)
    ap.add_argument(
        "--fresh-index",
        action="store_true",
        help="clear the entry's build-if-absent index caches first",
    )
    args = ap.parse_args()

    log_dir = tempfile.mkdtemp(prefix="vl_evlog_")
    spark = _session(log_dir)
    spark.sparkContext.setLogLevel("ERROR")
    from vectolite_spark import registry
    from vectolite_spark.operators.dedup import clear_managed_caches
    from vectolite_spark.session import ensure_shipped

    ensure_shipped(spark)
    fn = registry.QUERIES[args.entry]
    for i in range(args.runs):
        clear_managed_caches()
        t0 = time.time()
        fn(spark, args.sf_dir).count()
        print(f"run {i}: {time.time() - t0:.3f}s", file=sys.stderr)
    spark.stop()
    time.sleep(1.0)
    rows = parse_event_log(log_dir)
    print_jobs(rows, min_ms=args.min_ms)
    shutil.rmtree(log_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
