"""Dump `.explain("formatted")` for named registered queries to
plans/r<N>/<query>_<tag>.txt — the committed evidence files the round
ledger's plan claims are checked against.

Usage: python scripts/dump_plan.py <tag> <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     PLAN_ROUND (default r18).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pythondataingestionprocess_spark.plans import REGISTRY  # noqa: E402
from pythondataingestionprocess_spark.session import get_spark  # noqa: E402

tag = sys.argv[1]
names = sys.argv[2:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
round_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("PLAN_ROUND", "r18"),
)
os.makedirs(round_dir, exist_ok=True)

spark = get_spark(
    app_name="pdip-dump-plan",
    extra_conf={"spark.ui.showConsoleProgress": "false"},
)
for name in names:
    df = REGISTRY[name].fn(spark, sf_dir)
    text = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(round_dir, f"{name}_{tag}.txt")
    with open(path, "w") as f:
        f.write(text)
    print(path)
spark.stop()
