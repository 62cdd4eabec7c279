"""Per-query measurement harness for optimization rounds (guide §1).

Times each HEADLINE query at $SPARK_GRAFT_SF_DIR with the bench's own
action (count()), N repeats with per-query min, and optionally dumps
``explain("formatted")`` for every declared query to plans/<tag>/.

    python tools/perf_measure.py --plans before          # dump plans only
    python tools/perf_measure.py --time 5                # time, 5 repeats
    python tools/perf_measure.py --time 5 --queries near_dup_pipeline ...

Timing uses the same session factory and action as bench.py so numbers
are comparable; jobs are labelled via setJobDescription.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import HEADLINE  # noqa: E402
from web_api_postgres_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", metavar="TAG", default=None,
                    help="dump explain('formatted') to plans/r14/<q>_<TAG>.txt")
    ap.add_argument("--time", type=int, default=0, metavar="N",
                    help="time HEADLINE queries, N repeats, report min")
    ap.add_argument("--queries", nargs="*", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="perf-measure")

    if args.plans:
        names = args.queries or HEADLINE
        outdir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "plans", "r14")
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            fn = getattr(entrymod, f"q_{name}")
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"))
            with open(os.path.join(outdir, f"{name}_{args.plans}.txt"), "w") as f:
                f.write(plan)
            print(f"plan {name} -> {name}_{args.plans}.txt", file=sys.stderr)

    if args.time:
        names = args.queries or HEADLINE
        fns = {n: getattr(entrymod, f"q_{n}") for n in names}
        # warmup at smallest sf (same as bench.py)
        for n in names:
            try:
                fns[n](spark, "/root/testdata/sf0.001").count()
            except Exception:
                pass
        runs: dict[str, list[float]] = {n: [] for n in names}
        for _ in range(args.time):
            for n in names:
                spark.sparkContext.setJobDescription(f"perf:{n}")
                t0 = time.perf_counter()
                fns[n](spark, sf_dir).count()
                runs[n].append(round(time.perf_counter() - t0, 3))
                spark.sparkContext.setJobDescription(None)
        timings = {n: min(s) for n, s in runs.items()}
        print(json.dumps({"queries": timings, "runs": runs,
                          "total": round(sum(timings.values()), 3)}))

    spark.stop()


if __name__ == "__main__":
    main()
