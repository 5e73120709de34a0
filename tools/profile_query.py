"""Per-query optimization workbench (round-10): time one or more queries
with the bench's exact methodology (fresh session, sf0.001 codegen warm-up,
noop sink, rep timings) and optionally save the formatted plan to
plans/r10/<name>_<tag>.txt for the plan-diff evidence trail.

Usage:
    python tools/profile_query.py NAME [NAME ...] [--tag before|after]
        [--reps N] [--sf DIR]

Prints each rep's wall time (rep1 = cold plan+codegen at sf, rep2+ = warm)
so plan-analysis overhead is distinguishable from execution. The bench
reports min-of-2; compare on that.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from steam_prices_data_engineering_spark.plans import registry
from steam_prices_data_engineering_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default=None, help="save plan as plans/r10/<name>_<tag>.txt")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark(app_name="profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    for name in args.names:
        fn = qs[name]
        # codegen warm-up at the smallest sf (bench methodology)
        try:
            fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: warm-up failed: {e!r}", file=sys.stderr)
        if args.tag:
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out = os.path.join(REPO, "plans", "r10", f"{name}_{args.tag}.txt")
            os.makedirs(os.path.dirname(out), exist_ok=True)
            with open(out, "w") as f:
                f.write(plan)
            print(f"{name}: plan -> {out}")
        reps = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i + 1}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            reps.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        rep_s = " ".join(f"{r:.3f}" for r in reps)
        print(f"{name}: reps [{rep_s}]  min {min(reps):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
