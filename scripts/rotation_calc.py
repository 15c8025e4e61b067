"""Compute the next round's driver-window rotation from evidence age.

Reads every CORRECTNESS_r0*.json in the repo root, derives each
query's LAST-CHECKED round (presence in a round's file = the driver
checked it that round), and prints the next round's priority lists
ready to paste into plans/__init__.py:

- STALE: the oldest-evidence queries, front-loaded;
- then the staged new registrations (NEW_R6_STAGED etc.), which have
  no evidence at all;
- sized so stale + staged == 50 (the driver window).

Usage: python scripts/rotation_calc.py [--window 50]
Run at the START of a round, after the driver wrote the previous
round's CORRECTNESS file. Queries never seen in any file (beyond the
declared staged list) are flagged loudly — they are evidence holes.
"""

from __future__ import annotations

import glob
import json
import re
import sys

sys.path.insert(0, "/root/repo")

from pythondataingestionprocess_spark.plans import (  # noqa: E402
    NEW_R6_STAGED,
    NEW_R7_STAGED,
    NEW_R8_STAGED,
    NEW_R9_STAGED,
    REGISTRY,
)

WINDOW = 50
if "--window" in sys.argv:
    WINDOW = int(sys.argv[sys.argv.index("--window") + 1])

last_checked: dict[str, int] = {}
failed_latest: set[str] = set()
for path in sorted(glob.glob("/root/repo/CORRECTNESS_r0*.json")):
    rnd = int(re.search(r"r0*(\d+)", path).group(1))
    with open(path) as f:
        for name, row in json.load(f).items():
            if name not in REGISTRY:
                continue
            # a FAILED row is not evidence — the query must ride the
            # next window again, not age out of rotation as "checked".
            # "no_oracle" is NOT a failure: rows-only queries record it
            # by design (the driver's weaker rows-only check).
            err = row.get("err")
            ok = (
                (not err or err == "no_oracle")
                and row.get("hash_match") is not False
                and row.get("rows_match") is not False
            )
            if ok and rnd > last_checked.get(name, 0):
                last_checked[name] = rnd
                failed_latest.discard(name)
            elif not ok and rnd >= last_checked.get(name, 0):
                failed_latest.add(name)

if failed_latest:
    print(f"ALERT: latest driver row FAILED for {sorted(failed_latest)} — "
          f"fix and front-load these first", file=sys.stderr)

staged = [n for n in NEW_R6_STAGED if n in REGISTRY]
# Deferred past the NEXT window (r7 staging): evidence-less by design,
# not holes — they fill the round-after's free slots so the full
# r3-age stale block can ride first.
deferred = [
    n for n in NEW_R7_STAGED + NEW_R8_STAGED + NEW_R9_STAGED if n in REGISTRY
]
never = sorted(
    n
    for n in REGISTRY
    if n not in last_checked and n not in staged and n not in deferred
)
if never:
    print(f"WARNING: {len(never)} registered queries have NO evidence and "
          f"are not staged: {never}", file=sys.stderr)

budget = WINDOW - len(staged) - len(never)
by_age = sorted(last_checked.items(), key=lambda kv: (kv[1], kv[0]))
stale = [n for n, _ in by_age[:budget]]
cut_round = last_checked[stale[-1]] if stale else None
left_out = [n for n, r in by_age[budget:] if r == cut_round]

rounds = sorted(set(last_checked.values()))
print(f"# evidence ages: " + ", ".join(
    f"r{r}:{sum(1 for v in last_checked.values() if v == r)}" for r in rounds
))
print(f"# window {WINDOW} = {len(stale)} stale + {len(never)} unstaged-never "
      f"+ {len(staged)} staged; stale cut at round {cut_round}"
      + (f" (leaves {len(left_out)} same-age queries for next round: "
         f"{left_out})" if left_out else ""))
print("\nSTALE = [")
for n in sorted(stale):
    print(f'    "{n}",')
print("]")
print("\nNEW = [")
for n in never + staged:
    print(f'    "{n}",')
print("]")
if deferred:
    print(f"\n# deferred past the next window (staged r7/r8/r9): {deferred}")
