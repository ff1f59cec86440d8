"""Extra benchmarks for optimization work (guide §1.4): per-query noop-sink
isolation + .explain("formatted") capture. NOT the driver's bench — bench.py
is frozen; this file exists so optimization evidence (plan shapes, isolated
timings) can be produced without touching the measured harness.

Usage:
  python bench_extra.py                       # all suite queries, 3 passes
  python bench_extra.py knn10_build pip_join  # subset
  SPARK_GRAFT_PLANS_DIR=plans/r06 SPARK_GRAFT_PLAN_SUFFIX=_before \
      python bench_extra.py                   # also dump plans
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from libpysal_spark import get_spark
from bench import suite


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    passes = int(os.environ.get("SPARK_GRAFT_PASSES", "3"))
    plans_dir = os.environ.get("SPARK_GRAFT_PLANS_DIR", "")
    suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "")
    spark = get_spark(app_name=f"bench-extra-{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    only = set(sys.argv[1:])

    # warm codegen caches like bench.py does
    warm_sf = "/root/testdata/sf0.001"
    if os.path.isdir(warm_sf) and warm_sf != sf_dir:
        for name, fn in suite(spark, warm_sf).items():
            if only and name not in only:
                continue
            try:
                fn().write.format("noop").mode("overwrite").save()
            except Exception:
                pass

    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)
        for name, fn in suite(spark, sf_dir).items():
            if only and name not in only:
                continue
            df = fn()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as f:
                f.write(plan)

    from pyspark.sql import functions as F

    def control() -> float:
        """Fixed CPU-bound job: a host-speed yardstick (guide §1 / VERDICT r5
        #4 paired-control methodology). Compare query/control ratios across
        runs, not raw seconds — this host's wall clock swings 1.3-1.5x."""
        t0 = time.time()
        spark.range(300_000_000).select(
            F.sum((F.col("id") % 1_000_003).cast("double") * F.col("id").cast("double"))
        ).collect()
        return round(time.time() - t0, 3)

    times: dict[str, float] = {}
    controls: list[float] = [control()]
    for _p in range(passes):
        for name, fn in suite(spark, sf_dir).items():
            if only and name not in only:
                continue
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            spark.sparkContext.setJobDescription(None)
            if name not in times or dt < times[name]:
                times[name] = dt
        controls.append(control())
    out = {
        "metric": "noop-sink per-query min seconds",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf_dir,
        "cores": cores,
        "passes": passes,
        "control_sec": controls,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
