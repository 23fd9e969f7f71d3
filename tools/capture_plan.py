"""Capture `.explain("formatted")` for registry entries into plans/<dir>/.

Usage:
    python tools/capture_plan.py <out_dir> <entry> [<entry> ...]
    python tools/capture_plan.py plans/r12 --suffix _before flagship_topk

Each entry writes <out_dir>/<entry><suffix>.txt. Entries whose functions
execute eagerly (collect inside) still produce the plan of the RETURNED
DataFrame — for those the file also notes that in a header line.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("entries", nargs="+")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--sf-dir", default=SF_DIR)
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    from vectolite_spark import registry
    from vectolite_spark.session import ensure_shipped, get_spark

    spark = get_spark("vl-capture-plan")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_shipped(spark)
    for name in args.entries:
        fn = registry.QUERIES[name]
        df = fn(spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = os.path.join(args.out_dir, f"{name}{args.suffix}.txt")
        with open(out, "w") as f:
            f.write(f"-- {name} @ {args.sf_dir} (explain formatted)\n")
            f.write(plan)
        print(f"wrote {out} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
