"""Generate a driver-corpus-shaped dataset at an arbitrary scale
factor (r14 VERDICT item 2: "certify one order of magnitude up").

The driver's /root/testdata is read-only and capped at sf0.1; this
generator extrapolates the SAME schema and the measured sf0.1
distributions (row-count ratios, value ranges, enum frequencies,
planted exact-duplicate docs) so bench.py and driver_sim.py run
unmodified at sf1+ via SPARK_GRAFT_SF_DIR. It is NOT bit-identical to
the driver's corpus — correctness certification compares Spark vs the
DuckDB oracle ON THE SAME generated files, so generator choice cannot
mask an engine bug; only the absolute wall-clock ledger needs the
"generator-extrapolated" caveat (recorded in BASELINE.md).

Deterministic: numpy PCG64(seed=42); one pass per table, vectorized
(sf1 = 6M lineitem rows in ~1 min); pyarrow writes with row-group
size 1M so Spark gets multiple scan tasks per file.

Usage: python scripts/gen_sf.py [--sf 1.0] [--out /tmp/sf1]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

AP = argparse.ArgumentParser()
AP.add_argument("--sf", type=float, default=1.0)
AP.add_argument("--out", default=None)
ARGS = AP.parse_args()
SF = ARGS.sf
OUT = ARGS.out or f"/tmp/sf{SF:g}"
os.makedirs(OUT, exist_ok=True)

RNG = np.random.default_rng(42)
DAY_US = 86_400_000_000

# row counts follow the measured driver ratios (TESTDATA.md + probes)
N_CUST = int(150_000 * SF)
N_SUPP = int(10_000 * SF)
N_PART = int(200_000 * SF)
N_ORD = int(1_500_000 * SF)
N_LINE = int(6_000_000 * SF)
N_EVT = int(1_000_000 * SF)
N_DOC = int(50_000 * SF)
N_EMB = int(20_000 * SF)
N_USERS = max(1, int(15_000 * SF))


def write(name: str, table: pa.Table) -> None:
    pq.write_table(table, f"{OUT}/{name}.parquet",
                   row_group_size=1_000_000)
    print(f"{name}: {table.num_rows} rows")


def ts_col(micros: np.ndarray) -> pa.Array:
    return pa.array(micros, type=pa.timestamp("us"))


# -- dims --------------------------------------------------------------
write("region", pa.table({
    "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
    "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
}))
write("nation", pa.table({
    "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
    "n_name": [f"NATION_{i}" for i in range(25)],
    "n_regionkey": pa.array(np.arange(25, dtype=np.int32) % 5),
}))

ck = np.arange(N_CUST)
write("customer", pa.table({
    "c_custkey": ck,
    "c_name": [f"Customer#{i:09d}" for i in ck],
    "c_nationkey": pa.array(RNG.integers(0, 25, N_CUST, dtype=np.int32)),
    "c_acctbal": np.round(RNG.uniform(-1000, 10000, N_CUST), 2),
    "c_mktsegment": np.array(
        ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    )[RNG.integers(0, 5, N_CUST)],
}))

sk = np.arange(N_SUPP)
write("supplier", pa.table({
    "s_suppkey": sk,
    "s_name": [f"Supplier#{i:09d}" for i in sk],
    "s_nationkey": pa.array(RNG.integers(0, 25, N_SUPP, dtype=np.int32)),
    "s_acctbal": np.round(RNG.uniform(-1000, 10000, N_SUPP), 2),
}))

ADJ = ["large", "hot", "blue", "small", "dark", "cold", "soft", "tiny"]
NOUN = ["ring", "bolt", "wheel", "cap", "tube", "cog", "pin", "disk"]
pk = np.arange(N_PART)
write("part", pa.table({
    "p_partkey": pk,
    "p_name": [f"{ADJ[i % 8]} {NOUN[(i // 8) % 8]}" for i in pk],
    "p_brand": np.array([f"Brand#{b}" for b in range(1, 26)])[
        RNG.integers(0, 25, N_PART)],
    "p_type": np.array(
        ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
    )[RNG.integers(0, 6, N_PART)],
    "p_size": pa.array(RNG.integers(1, 51, N_PART, dtype=np.int32)),
    "p_retailprice": np.round(RNG.uniform(900, 1000, N_PART), 2),
}))

# -- facts -------------------------------------------------------------
EPOCH_95 = np.datetime64("1995-01-01", "us").astype(np.int64)
ok = np.arange(N_ORD)
write("orders", pa.table({
    "o_orderkey": ok,
    "o_custkey": RNG.integers(0, N_CUST, N_ORD),
    "o_orderstatus": np.array(["F", "O", "P"])[RNG.integers(0, 3, N_ORD)],
    "o_totalprice": np.round(RNG.uniform(1000, 500000, N_ORD), 2),
    "o_orderdate": ts_col(
        EPOCH_95 + RNG.integers(0, 2405, N_ORD) * DAY_US),
    "o_orderpriority": np.array(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    )[RNG.integers(0, 5, N_ORD)],
}))

write("lineitem", pa.table({
    "l_orderkey": RNG.integers(0, N_ORD, N_LINE),
    "l_partkey": RNG.integers(0, N_PART, N_LINE),
    "l_suppkey": RNG.integers(0, N_SUPP, N_LINE),
    "l_linenumber": pa.array(
        RNG.integers(1, 8, N_LINE, dtype=np.int32)),
    "l_quantity": RNG.integers(1, 51, N_LINE).astype(np.float64),
    "l_extendedprice": np.round(RNG.uniform(900, 105000, N_LINE), 2),
    "l_discount": np.round(RNG.integers(0, 11, N_LINE) / 100.0, 2),
    "l_tax": np.round(RNG.integers(0, 9, N_LINE) / 100.0, 2),
    "l_returnflag": np.array(["A", "N", "R"])[RNG.integers(0, 3, N_LINE)],
    "l_linestatus": np.array(["F", "O"])[RNG.integers(0, 2, N_LINE)],
    "l_shipdate": ts_col(
        EPOCH_95 + RNG.integers(1, 2500, N_LINE) * DAY_US),
}))

EPOCH_24 = np.datetime64("2024-01-01", "us").astype(np.int64)
ev_ts = np.sort(EPOCH_24 + RNG.integers(0, 30 * DAY_US, N_EVT))
write("events", pa.table({
    "event_id": np.arange(N_EVT),
    "ts": ts_col(ev_ts),
    "user_id": RNG.integers(0, N_USERS, N_EVT),
    "event_type": np.array(
        ["click", "error", "purchase", "signup", "view"]
    )[RNG.integers(0, 5, N_EVT)],
    "value": np.round(RNG.exponential(50.0, N_EVT), 2),
    "props": [json.dumps({"k": int(k)})
              for k in RNG.integers(0, 100, N_EVT)],
}))

VOCAB = np.array((
    "batch part spark line column order small sort vector scan fast "
    "query agg slow value filter customer stream big merge group join "
    "shuffle key table row cache disk plan stage"
).split())
langs = np.array(["en", "zh", "es", "fr", "de"])[
    RNG.choice(5, N_DOC, p=[0.41, 0.15, 0.15, 0.15, 0.14])]
lengths = RNG.integers(8, 100, N_DOC)
texts = [" ".join(VOCAB[RNG.integers(0, len(VOCAB), n)]) for n in lengths]
# plant exact duplicates at the measured sf0.1 rate (~0.16%)
n_dup = max(1, N_DOC // 625)
dup_to = RNG.integers(0, N_DOC, n_dup)
dup_from = RNG.integers(0, N_DOC, n_dup)
for a, b in zip(dup_to, dup_from):
    texts[a] = texts[b]
write("documents", pa.table({
    "doc_id": np.arange(N_DOC),
    "text": texts,
    "lang": langs,
    "source": np.array([f"src{i}" for i in range(20)])[
        RNG.integers(0, 20, N_DOC)],
    "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
}))

labels = RNG.integers(0, 10, N_EMB).astype(np.int32)
centers = RNG.normal(0, 1, (10, 64)).astype(np.float32)
vecs = centers[labels] + RNG.normal(0, 0.35, (N_EMB, 64)).astype(np.float32)
write("embeddings", pa.table({
    "vec_id": np.arange(N_EMB),
    "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
    "label": pa.array(labels),
}))

print(f"done: {OUT} (sf={SF})")
