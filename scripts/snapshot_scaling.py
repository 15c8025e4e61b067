"""Commit-protocol overhead probe for SnapshotTableStore.

Claims under test (snapshot_store module docstring):

1. **Commits are metadata-sized** — the claim (manifest write +
   os.link) costs the same whether the table holds 1k or 1M rows;
   total commit wall is data-WRITE-bound, so append wall tracks the
   BATCH size, not the table size.
2. **Log replay stays cheap as history grows** — read planning walks
   the JSON log (files-sized); with hundreds of commits the resolve
   step must stay in milliseconds, and OPTIMIZE restores scan-side
   file counts.
3. **append_once's txn probe is log-bound, not data-bound** — the
   dedup check reads manifests only.

Run:  python scripts/snapshot_scaling.py [n_appends] [rows_per_batch]
Writes a human-readable table to stdout; paste into BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pythondataingestionprocess_spark.pipeline.snapshot_store import (  # noqa: E402
    SnapshotTableStore,
)
from pythondataingestionprocess_spark.session import get_spark  # noqa: E402

N_APPENDS = int(sys.argv[1]) if len(sys.argv) > 1 else 200
ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

spark = get_spark(app_name="pdip-snapshot-scaling")
spark.sparkContext.setLogLevel("ERROR")
root = tempfile.mkdtemp(prefix="snapshot_scaling_")
st = SnapshotTableStore(spark, root, stats_cols={"store": ["id_store"]})


def batch(i: int):
    return (
        spark.range(i * ROWS, (i + 1) * ROWS)
        .selectExpr(
            "id AS id_store",
            "concat('name-', id) AS store_name",
            "concat('https://example.com/', id) AS store_url",
            "id % 2 = 0 AS status",
        )
        .coalesce(1)
    )


print(f"appends={N_APPENDS} rows/batch={ROWS}")
print(f"{'commit#':>8} {'append_s':>9} {'claim_s':>8} {'read_resolve_ms':>16} "
      f"{'rows_total':>11}")
checkpoints = {1, 10, 50, 100, 150, N_APPENDS}
for i in range(N_APPENDS):
    t0 = time.monotonic()
    df = batch(i)
    # isolate the claim: time _claim via a wrapper
    claim_t = [0.0]
    orig = st._claim

    def timed_claim(name, record, next_id, _o=orig, _t=claim_t):
        c0 = time.monotonic()
        ok = _o(name, record, next_id)
        _t[0] += time.monotonic() - c0
        return ok

    st._claim = timed_claim
    st.append("store", df)
    st._claim = orig
    wall = time.monotonic() - t0
    sid = i + 1
    if sid in checkpoints:
        r0 = time.monotonic()
        dirs = st._live_dirs("store", sid)  # the log-replay resolve step
        resolve_ms = (time.monotonic() - r0) * 1e3
        print(f"{sid:>8} {wall:>9.3f} {claim_t[0]:>8.4f} "
              f"{resolve_ms:>16.1f} {sid * ROWS:>11}", flush=True)

# txn-probe cost at full history
t0 = time.monotonic()
st.committed_txns("store")
print(f"committed_txns over {N_APPENDS} manifests: "
      f"{(time.monotonic() - t0) * 1e3:.1f} ms")

# OPTIMIZE + post-compaction read
t0 = time.monotonic()
st.optimize("store")
print(f"optimize({N_APPENDS} files -> "
      f"{len(st._live_dirs('store', st.current_snapshot('store')))} dir): "
      f"{time.monotonic() - t0:.2f} s")
t0 = time.monotonic()
n = st.read("store").count()
print(f"post-optimize full read: {time.monotonic() - t0:.2f} s ({n} rows)")
removed = st.vacuum("store", keep_last=1)
print(f"vacuum removed {len(removed)} dirs")
