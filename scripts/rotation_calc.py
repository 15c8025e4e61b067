"""Compute the next round's driver-window rotation from evidence age.

Reads every CORRECTNESS_r0*.json in the repo root (or an explicit
``--files`` list, used by the era-pinned test fixture), derives each
query's LAST-CHECKED round (presence in a round's file = the driver
checked it that round), and prints the next round's priority lists
ready to paste into plans/__init__.py:

- STALE: the oldest-evidence queries, front-loaded;
- then the next staged block (the first NEW_R*_STAGED constant still
  present on the plans package), which has no driver evidence yet;
- sized so stale + staged == 50 (the driver window).

Usage: python scripts/rotation_calc.py [--window 50] [--files f1 f2 ...]
Run at the START of a round, after the driver wrote the previous
round's CORRECTNESS file. Exit codes: 1 = a registered query's latest
driver row FAILED; 2 = evidence-lag tripwire (some registered query's
last green evidence is older than MAX_EVIDENCE_AGE rounds — a
regression there could have been hiding for that long).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pythondataingestionprocess_spark.plans as plans  # noqa: E402

REGISTRY = plans.REGISTRY

# Any registered query whose last green driver row is older than this
# many rounds trips a hard failure: with a 50-row window over ~180
# queries the natural worst-case lag is ~3 rounds; 4+ means the
# rotation has a hole (VERDICT r5 item 8).
MAX_EVIDENCE_AGE = 4

# Registry capacity cap (r8 VERDICT item 3). At WINDOW rows per round
# the refresh cycle is ceil(len(REGISTRY) / WINDOW); at
# WINDOW * MAX_EVIDENCE_AGE queries the cycle equals the evidence-age
# tripwire bound with ZERO slack — one short round or one mid-round
# registration then silently pushes worst-case evidence age past the
# bound (that exact failure shipped at the end of r8: registry grew
# 179 -> 182 with three unstaged registrations). CAP_BUFFER keeps
# real slack; registering past the cap requires retiring equals
# FIRST, mechanically.
CAP_BUFFER = 20


def _round_of(path: str) -> int:
    """Round number from a CORRECTNESS file name, anchored to the
    basename so path segments like 'user2/' or 'r2024/' can't
    misparse (ADVICE r6)."""
    m = re.search(r"CORRECTNESS_r0*(\d+)\.json$", os.path.basename(path))
    if not m:
        sys.exit(f"rotation_calc: not a CORRECTNESS_r<N>.json file: {path!r}")
    return int(m.group(1))


_ap = argparse.ArgumentParser(description=__doc__)
_ap.add_argument("--window", type=int, default=50)
_ap.add_argument("--files", nargs="+", default=None)
_args = _ap.parse_args()
WINDOW = _args.window

# zero-padded and unpadded round numbers both match; sort by the
# PARSED round, not lexicographically (r10 sorts after r2 — ADVICE r6)
files = _args.files if _args.files is not None else glob.glob(
    "/root/repo/CORRECTNESS_r*.json"
)
files = sorted(files, key=_round_of)

last_checked: dict[str, int] = {}
failed_latest: set[str] = set()
current_round = 0
for path in files:
    rnd = _round_of(path)
    current_round = max(current_round, rnd)
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

rc = 0
if failed_latest:
    print(f"ALERT: latest driver row FAILED for {sorted(failed_latest)} — "
          f"fix and front-load these first", file=sys.stderr)
    rc = 1

hard_cap = WINDOW * MAX_EVIDENCE_AGE - CAP_BUFFER
if len(REGISTRY) > hard_cap:
    print(f"ALERT: registry size {len(REGISTRY)} exceeds the capacity "
          f"cap {hard_cap} (= window {WINDOW} x MAX_EVIDENCE_AGE "
          f"{MAX_EVIDENCE_AGE} - buffer {CAP_BUFFER}) — retire queries "
          f"before registering more", file=sys.stderr)
    rc = max(rc, 2)

# The next staged block is the first NEW_R<N>_STAGED constant still on
# the package, discovered by pattern so r10+ blocks need no edit here
# (each round's session folds the consumed one into the applied
# rotation and deletes the constant); later blocks are deferred —
# evidence-less by design, not holes.
_staged_attrs = sorted(
    (a for a in dir(plans) if re.fullmatch(r"NEW_R(\d+)_STAGED", a)),
    key=lambda a: int(re.fullmatch(r"NEW_R(\d+)_STAGED", a).group(1)),
)
_staged_blocks = [getattr(plans, attr) for attr in _staged_attrs]
staged = [n for n in (_staged_blocks[0] if _staged_blocks else []) if n in REGISTRY]
deferred = [n for blk in _staged_blocks[1:] for n in blk if n in REGISTRY]

# The applied current-round NEW block rides THIS round's window; its
# queries lack driver evidence mid-round by construction — expected,
# not a hole (they'll appear in the next CORRECTNESS file).
pending_current = [
    n for n in getattr(plans, "NEW_CURRENT", []) if n not in last_checked
]

never = sorted(
    n
    for n in REGISTRY
    if n not in last_checked
    and n not in staged
    and n not in deferred
    and n not in pending_current
)
if never:
    print(f"WARNING: {len(never)} registered queries have NO evidence and "
          f"are not staged: {never}", file=sys.stderr)

# Evidence-lag tripwire: checked queries whose evidence has aged past
# the bound. Staged/deferred queries carry driver_sim evidence at
# registration and are budgeted into named future windows, so they are
# exempt until first driver contact; unstaged-never already WARNs.
overdue = sorted(
    n for n, r in last_checked.items() if current_round - r > MAX_EVIDENCE_AGE
)
if overdue:
    print(f"ALERT: evidence older than {MAX_EVIDENCE_AGE} rounds for "
          f"{overdue} — the rotation has a hole; front-load these",
          file=sys.stderr)
    rc = max(rc, 2)

budget = max(0, WINDOW - len(staged) - len(never))
if WINDOW - len(staged) - len(never) < 0:
    print(f"# NOTE: window over-subscribed (staged {len(staged)} + "
          f"unstaged-never {len(never)} > {WINDOW}) — no stale refresh "
          f"this round", file=sys.stderr)
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
if pending_current:
    print(f"\n# riding the CURRENT round's window, driver row pending: "
          f"{pending_current}")
if deferred:
    print(f"\n# deferred past the next window (later staged blocks): {deferred}")
sys.exit(rc)
