"""The driver parses bench.py's stdout TAIL (last ~2000 chars).

Round 5's official bench number was lost because the single detailed
JSON line (88 per-query timings, ~2.8 KB) outgrew that buffer and its
head — including "value" — was truncated away (BENCH_r05.json:
parsed null). The contract now: the detailed line prints first, the
FINAL stdout line is a compact summary that stays far under the
buffer. These tests pin that contract without paying for a full
sf0.1 bench run.
"""

import json
import subprocess
import sys

import bench


def test_compact_final_line_is_parseable_and_small(monkeypatch, capsys,
                                                   tmp_path):
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    # two cheap queries; calibration shrunk to a no-op-sized job
    monkeypatch.setattr(bench, "HEADLINE",
                        ["projection_narrow", "distinct_dims"])
    monkeypatch.setattr(bench, "R1_SUBSET", ["projection_narrow"])
    monkeypatch.setattr(bench, "calibrate", lambda spark: 0.001)
    # never stomp the committed BENCH_DETAIL.json from a test run
    monkeypatch.setattr(bench, "DETAIL_PATH",
                        str(tmp_path / "BENCH_DETAIL.json"))

    bench.main()
    out = capsys.readouterr().out
    lines = [ln for ln in out.strip().splitlines() if ln.strip()]
    assert len(lines) >= 2

    final = lines[-1]
    # must survive any tail buffer: compact, self-contained JSON
    assert len(final) < 500
    compact = json.loads(final)
    assert compact["metric"] == "headline_queries_total_wall"
    assert compact["unit"] == "sec"
    assert compact["value"] > 0
    assert compact["n_queries"] == 2
    assert "r1_subset_wall" in compact and "calib_sec" in compact
    # r10 VERDICT item 6: the cross-round comparable — r1-subset
    # seconds per mean-calib — is computed IN the artifact (both
    # lines), matching subset / mean(calib, calib_end) to the ledger's
    # rounding
    assert compact["r1_subset_per_calib"] == round(
        compact["r1_subset_wall"]
        / ((compact["calib_sec"] + compact["calib_sec_end"]) / 2),
        1,
    )
    # r7 VERDICT item 4: the artifact must be self-interpreting on a
    # contended host — end-of-run calib and load averages ride both
    # the compact and detailed lines
    assert "calib_sec_end" in compact
    assert "loadavg_1m_start" in compact and "loadavg_1m_end" in compact
    # r9 VERDICT item 6: the artifact must carry its own noise verdict
    # — 'clean' or a 'WARN: ...' string — on BOTH lines, so a polluted
    # run self-flags inside the committed BENCH_r{N}.json
    assert compact["host_noise"] == "clean" or compact[
        "host_noise"].startswith("WARN: ")
    assert "queries" not in compact, "per-query detail belongs to the " \
        "detailed line/file, never the tail-parsed final line"

    detailed = json.loads(lines[-2])
    assert set(detailed["queries"]) == {"projection_narrow", "distinct_dims"}
    assert detailed["value"] == compact["value"]


def test_compact_line_stays_small_at_full_headline():
    """Static bound: even if every headline query name appeared in the
    compact line it would blow the buffer — so assert the compact
    payload shape (fixed keys, no per-query dict) directly from the
    source, then bound a synthetic render at full scale."""
    synthetic = json.dumps({
        "metric": "headline_queries_total_wall",
        "value": 99999.999,
        "unit": "sec",
        "sf": 0.1,
        "n_queries": len(bench.HEADLINE),
        "r1_subset_wall": 99999.999,
        "calib_sec": 99.999,
        "calib_sec_end": 99.999,
        "loadavg_1m_start": 999.99,
        "loadavg_1m_end": 999.99,
        # worst case: every noise rule fires at once
        "host_noise": bench.host_noise_verdict(0.485, 0.95, 999.9,
                                               999.9, 32),
    })
    assert len(synthetic) < 500


def test_bench_detail_file_written(monkeypatch, capsys, tmp_path):
    """The full per-query detail survives on disk (the stdout tail
    can't carry it). Self-contained (ADVICE r6): runs bench.main()
    itself with the same cheap monkeypatched HEADLINE instead of
    depending on a previous test's side effect, and FAILS (not
    silently passes) if the file is missing."""
    import os

    path = str(tmp_path / "BENCH_DETAIL.json")
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setattr(bench, "HEADLINE",
                        ["projection_narrow", "distinct_dims"])
    monkeypatch.setattr(bench, "R1_SUBSET", ["projection_narrow"])
    monkeypatch.setattr(bench, "calibrate", lambda spark: 0.001)
    monkeypatch.setattr(bench, "DETAIL_PATH", path)

    bench.main()
    capsys.readouterr()  # drain; stdout contract is the other test's job

    assert os.path.exists(path), "bench.main() must write the detail file"
    with open(path) as f:
        detail = json.load(f)
    assert set(detail["queries"]) == {"projection_narrow", "distinct_dims"}
    assert detail["value"] > 0
    assert "r1_subset_wall" in detail and "calib_sec" in detail
    assert "r1_subset_per_calib" in detail
    assert "calib_sec_end" in detail
    assert "loadavg_1m_start" in detail and "loadavg_1m_end" in detail


def test_host_noise_verdict_rules():
    """The three BASELINE.md reading rules, now code: calib drift
    outside +/-15%, loadavg above core count, ambient start load."""
    v = bench.host_noise_verdict
    assert v(0.5, 0.5, 1.0, 6.0, 32) == "clean"
    # mid-run speed change (the r9 artifact's calib 0.485 -> 0.395)
    assert "calib drifted" in v(0.485, 0.395, 1.0, 2.0, 32)
    # sweep competed for CPU
    assert "upper bound" in v(0.5, 0.5, 40.0, 2.0, 32)
    assert "upper bound" in v(0.5, 0.5, 1.0, 40.0, 32)
    # ambient background load at start (the r9 pollution: 4.4-5.3)
    assert "ambient loadavg" in v(0.5, 0.5, 4.4, 6.0, 32)
    # missing loadavg (platform without getloadavg) stays clean
    assert v(0.5, 0.5, None, None, 32) == "clean"
    # multiple findings concatenate under one WARN prefix
    both = v(0.485, 0.395, 40.0, 2.0, 32)
    assert both.startswith("WARN: ") and ";" in both
