"""Triangle-counting scaling probe: measures (a) the degree-
orientation's wedge-bound win on a SKEWED graph — the quantity that
decides whether the wedge join survives a hot vertex — and (b) wall
time at growing edge counts.

The synthetic graph is deterministic (hash-spread endpoints) with a
planted hub tail: ~20%% of edges attach to a small hot-vertex core,
giving the heavy-tailed degree distribution real co-occurrence graphs
have. For each scale we report:

- naive_wedges  = Σ C(deg(v), 2)      (what an unoriented self-join
                                       would materialize)
- oriented_wedges = Σ C(outdeg(v), 2) (what the oriented join
                                       actually materializes)
- wall seconds for the full triangle_count

Usage: python scripts/triangle_scaling.py [edges_base] [n_scales]
(defaults 1_000_000 and 2 → runs at 1M and 4M edges)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pythondataingestionprocess_spark.operators.graph import (  # noqa: E402
    normalize_edges,
    triangle_count,
)
from pythondataingestionprocess_spark.session import get_spark  # noqa: E402

base = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
n_scales = int(sys.argv[2]) if len(sys.argv) > 2 else 2

spark = get_spark()

for s in range(n_scales):
    m = base * (4**s)
    v = m // 10  # sparse regime: avg degree ~20, like a real co-occurrence graph
    hot = max(v // 1000, 10)
    raw = spark.range(m).select(
        # 80% spread edges, 20% into the hot core (heavy tail)
        (F.xxhash64("id") % v).alias("a"),
        F.when(
            F.col("id") % 5 == 0, F.abs(F.xxhash64("id", F.lit(1))) % hot
        )
        .otherwise(F.abs(F.xxhash64("id", F.lit(2))) % v)
        .alias("b"),
    ).select(F.abs("a").alias("a"), "b")
    edges = normalize_edges(raw, "a", "b").localCheckpoint(eager=True)
    n_edges = edges.count()

    deg = (
        edges.select(F.col("u").alias("w"))
        .unionAll(edges.select(F.col("v").alias("w")))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    naive_wedges = deg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).alias("w")
    ).collect()[0]["w"]

    du = deg.select(F.col("w").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("w").alias("v"), F.col("deg").alias("deg_v"))
    wd = edges.join(du, "u").join(dv, "v")
    src_is_u = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    outdeg = (
        wd.select(F.when(src_is_u, F.col("u")).otherwise(F.col("v")).alias("src"))
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("od"))
    )
    oriented_wedges = outdeg.agg(
        F.sum(F.col("od") * (F.col("od") - 1) / 2).alias("w")
    ).collect()[0]["w"]

    t0 = time.monotonic()
    row = triangle_count(edges).collect()[0]
    wall = time.monotonic() - t0
    print(
        json.dumps(
            {
                "edges": n_edges,
                "vertices": row["n_vertices"],
                "triangles": row["n_triangles"],
                "naive_wedges": int(naive_wedges),
                "oriented_wedges": int(oriented_wedges),
                "wedge_ratio": round(naive_wedges / max(oriented_wedges, 1), 1),
                "wall_sec": round(wall, 2),
            }
        ),
        flush=True,
    )
