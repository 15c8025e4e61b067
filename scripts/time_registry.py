"""Time every registered query at sf0.01 (simulates the driver's CORRECTNESS pass).

Usage: python scripts/time_registry.py [sf_dir]
Prints per-query wall seconds in registry order plus the running total.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pythondataingestionprocess_spark.session import get_spark  # noqa: E402
from pythondataingestionprocess_spark.plans import REGISTRY  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = get_spark()
timings: dict[str, float] = {}
total = 0.0
for name, spec in REGISTRY.items():
    t0 = time.monotonic()
    try:
        df = spec.fn(spark, sf_dir)
        n = df.count()
        err = None
    except Exception as e:  # pragma: no cover
        n = -1
        err = f"{type(e).__name__}: {e}"[:200]
    dt = time.monotonic() - t0
    timings[name] = round(dt, 2)
    total += dt
    print(f"{total:8.1f}  {dt:6.2f}s  {n:>8}  {name}" + (f"  ERR {err}" if err else ""), flush=True)

print(json.dumps({"total_sec": round(total, 1), "n_queries": len(timings)}))
with open("/tmp/registry_timings.json", "w") as f:
    json.dump(timings, f, indent=1)
