"""Per-query bench profiler: splits BUILD (driver-side plan
construction, incl. any eager jobs the plan function runs) from
EXECUTE (the noop-sink materialization) for every HEADLINE query, in
bench order, over N sweeps — the measurement harness behind
OPTIMIZATION_r17.md (guide §1: measure first, noop sink, labeled
jobs).

Per-query cost at sf0.1 decomposes into: py4j expression
construction + analysis (build), codegen compile + job scheduling +
actual compute (exec). Sweep 1 in a fresh session pays codegen and
memo builds exactly like the driver's bench; sweep 2+ shows the
session-warm floor. The MIN across sweeps of (build+exec) is the
least-noise estimate of a query's intrinsic session-warm cost; the
sweep-1 value is what the driver's bench sees.

Usage: python scripts/profile_bench.py [n_sweeps] [out.json]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from pythondataingestionprocess_spark.plans import REGISTRY  # noqa: E402
from pythondataingestionprocess_spark.session import get_spark  # noqa: E402

n_sweeps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/r17_profile.json"
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(
    app_name="pdip-profile",
    extra_conf={"spark.ui.showConsoleProgress": "false"},
)

names = [n for n in bench.HEADLINE if n in REGISTRY or n in bench.RETIRED_BENCH_PLANS]


def plan_fn(name):
    spec = REGISTRY.get(name)
    return spec.fn if spec is not None else bench.RETIRED_BENCH_PLANS[name]


# warmup like bench.py: first query + calibration
bench.materialize(plan_fn(names[0])(spark, sf_dir))
calib0 = bench.calibrate(spark)

sweeps = []
for s in range(n_sweeps):
    row = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = plan_fn(name)(spark, sf_dir)
        t1 = time.perf_counter()
        bench.materialize(df)
        t2 = time.perf_counter()
        row[name] = (round(t1 - t0, 3), round(t2 - t1, 3))
    sweeps.append(row)
calib1 = bench.calibrate(spark)

result = {
    "calib": [calib0, calib1],
    "loadavg": os.getloadavg()[0],
    "sweeps": sweeps,
}
with open(out_path, "w") as f:
    json.dump(result, f, indent=1)

# human summary: sweep-1 (what the bench sees) sorted desc
first = sweeps[0]
floor = {
    n: min(b + e for b, e in (sw[n] for sw in sweeps)) for n in names
}
print(f"calib {calib0} -> {calib1}")
print(f"{'sweep1':>8} {'build1':>7} {'floor':>7}  name")
for n in sorted(names, key=lambda n: -(first[n][0] + first[n][1])):
    b, e = first[n]
    print(f"{b + e:8.3f} {b:7.3f} {floor[n]:7.3f}  {n}")
print("TOTAL sweep1", round(sum(b + e for b, e in first.values()), 1),
      "floor", round(sum(floor.values()), 1))
