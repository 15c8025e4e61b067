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
    # the quiet-host gate would sleep if the suite's own Spark load
    # pushed loadavg over the threshold — not this test's concern
    monkeypatch.setattr(bench, "_wait_for_quiet_host", lambda: 0.0)
    # never stomp the committed BENCH_DETAIL.json from a test run
    monkeypatch.setattr(bench, "DETAIL_PATH",
                        str(tmp_path / "BENCH_DETAIL.json"))

    bench.main()
    out = capsys.readouterr().out
    lines = [ln for ln in out.strip().splitlines() if ln.strip()]
    assert len(lines) >= 2

    final = lines[-1]
    # must survive the ~2000-char tail buffer: compact, self-contained
    # JSON (the per-query "q" array grew it past the old 500-char
    # bound; 91 two-decimal floats is ~600 chars, total ~1200)
    assert len(final) < 1900
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
    assert "queries" not in compact, "the full name->sec dict belongs " \
        "to the detailed line/file; the final line carries the compact " \
        "'q' array instead (r18, VERDICT r17 item 2)"

    detailed = json.loads(lines[-2])
    assert set(detailed["queries"]) == {"projection_narrow", "distinct_dims"}
    assert detailed["value"] == compact["value"]
    # r18: per-query walls ride the final line as 2-decimal floats in
    # the detailed dict's insertion order (benched-HEADLINE order)
    assert compact["q"] == [
        round(v, 2) for v in detailed["queries"].values()
    ]
    assert len(compact["q"]) == compact["n_queries"]


def test_compact_line_stays_small_at_full_headline():
    """Static bound: a full name->sec dict would blow the tail buffer
    (~3.3 KB at 91 queries), so the final line carries only fixed keys
    plus the nameless "q" float array — bound a synthetic worst-case
    render at full HEADLINE scale against the driver's ~2000-char
    tail."""
    worst_noise = bench.host_noise_verdict(0.485, 0.95, 999.9, 999.9, 32)
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
        # worst case: every noise rule fires at once, a retried run
        # rides the line too
        "host_noise": worst_noise,
        "quiet_wait_sec": 120.0,
        "bench_runs": 2,
        "discarded_host_noise": worst_noise[:60],
        # worst case per-query array: every query at a 5-digit wall
        "q": [99999.99] * len(bench.HEADLINE),
    })
    assert len(synthetic) < 1900


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
    monkeypatch.setattr(bench, "_wait_for_quiet_host", lambda: 0.0)
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
    outside +/-20% (widened from +/-15% per r13 VERDICT item 7 —
    calib variance exceeds raw-wall variance on this host), loadavg
    above core count, ambient start load."""
    v = bench.host_noise_verdict
    assert v(0.5, 0.5, 1.0, 6.0, 32) == "clean"
    # mid-run speed change (the r13 artifact's calib 0.45 -> 0.338,
    # ratio 0.75 — outside even the widened band)
    assert "calib drifted" in v(0.45, 0.338, 1.0, 2.0, 32)
    # the r13 ledger's 0.85-ratio pair now reads unambiguously clean
    # (it sat exactly ON the old band's edge — VERDICT r13 nit 3)
    assert v(0.41, 0.349, 1.0, 2.0, 32) == "clean"
    # inclusive boundary: 0.80 and 1.20 are clean BY RULE
    assert v(0.5, 0.4, 1.0, 2.0, 32) == "clean"
    assert v(0.5, 0.6, 1.0, 2.0, 32) == "clean"
    assert "calib drifted" in v(0.5, 0.39, 1.0, 2.0, 32)
    assert "calib drifted" in v(0.5, 0.61, 1.0, 2.0, 32)
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


def _fake_detail(calib, calib_end, noise):
    return {
        "metric": "headline_queries_total_wall",
        "value": 50.0,
        "unit": "sec",
        "queries": {"projection_narrow": 50.0},
        "sf": 0.001,
        "r1_subset_wall": 50.0,
        "r1_subset_per_calib": 100.0,
        "calib_sec": calib,
        "calib_sec_end": calib_end,
        "loadavg_1m_start": 1.0,
        "loadavg_1m_end": 1.0,
        "host_noise": noise,
    }


def test_select_run_asymmetric_drift_rule():
    """r18 (VERDICT r17 item 9): when both runs' per-query timings
    agree (each total within 10% of the elementwise-min composite),
    the LOWER total is parsed even if that run carries a WARN — a run
    whose host sped up mid-run is an upper bound, not a worse
    measurement. When the runs disagree, the old clean-beats-WARN
    rule still decides."""
    def run(value, queries, calib, calib_end, noise):
        d = _fake_detail(calib, calib_end, noise)
        d["value"] = value
        d["queries"] = queries
        return d

    warn = "WARN: calib drifted 0.51x mid-run (outside +/-20%)"
    # agreeing runs (2% apart): faster WARN'd run wins
    fast = run(50.0, {"a": 20.0, "b": 30.0}, 0.6, 0.3, warn)
    slow = run(51.0, {"a": 20.5, "b": 30.5}, 0.5, 0.5, "clean")
    assert bench.select_run([slow, fast]) is fast
    assert bench.select_run([fast, slow]) is fast
    # disagreeing runs (>10% above the min composite): clean wins
    # even though the WARN'd run's total is lower
    fast2 = run(40.0, {"a": 10.0, "b": 30.0}, 0.6, 0.3, warn)
    slow2 = run(45.0, {"a": 20.0, "b": 25.0}, 0.5, 0.5, "clean")
    # min composite = 10 + 25 = 35; fast2 = 40 > 38.5, slow2 = 45 > 38.5
    assert bench.select_run([fast2, slow2]) is slow2
    # exact tie on total: cleanliness breaks it
    t1 = run(50.0, {"a": 50.0}, 0.6, 0.3, warn)
    t2 = run(50.0, {"a": 50.0}, 0.5, 0.5, "clean")
    assert bench.select_run([t1, t2]) is t2
    # single run: returned as-is
    assert bench.select_run([t1]) is t1


def test_calib_drift_triggers_one_retry_on_fresh_session(
        monkeypatch, capsys, tmp_path):
    """r13 VERDICT item 4: when the calib pair drifts out of band the
    bench reruns ONCE on a FRESH SparkSession (per-session memos
    evicted, so the rerun measures plans, not cache hits), archives
    both runs, and parses the stabler one."""
    calls = {"sweeps": 0, "sessions": 0, "stops": 0}

    class FakeSpark:
        def stop(self):
            calls["stops"] += 1

    def fake_get_spark(app_name=None):
        calls["sessions"] += 1
        return FakeSpark()

    drifty = _fake_detail(
        0.5, 0.3, "WARN: calib drifted 0.60x mid-run (outside +/-20%)")
    clean = _fake_detail(0.5, 0.5, "clean")

    def fake_sweep(spark, sf_dir, names, plan_fn, sf):
        calls["sweeps"] += 1
        return dict(drifty if calls["sweeps"] == 1 else clean)

    monkeypatch.setattr(bench, "get_spark", fake_get_spark)
    monkeypatch.setattr(bench, "run_sweep", fake_sweep)
    monkeypatch.setattr(bench, "_wait_for_quiet_host", lambda: 0.0)
    monkeypatch.setattr(bench, "DETAIL_PATH",
                        str(tmp_path / "BENCH_DETAIL.json"))
    bench.main()
    assert calls == {"sweeps": 2, "sessions": 2, "stops": 1}
    out = [ln for ln in capsys.readouterr().out.strip().splitlines()
           if ln.strip()]
    compact = json.loads(out[-1])
    assert compact["host_noise"] == "clean"
    assert compact["bench_runs"] == 2
    assert "calib drifted" in compact["discarded_host_noise"]
    assert len(out[-1]) < 500
    detail = json.loads(out[-2])
    assert detail["discarded_run"]["host_noise"].startswith("WARN")


def test_clean_run_does_not_retry(monkeypatch, capsys, tmp_path):
    calls = {"sweeps": 0}

    class FakeSpark:
        def stop(self):
            raise AssertionError("clean run must not cycle the session")

    def fake_sweep(spark, sf_dir, names, plan_fn, sf):
        calls["sweeps"] += 1
        return _fake_detail(0.5, 0.5, "clean")

    monkeypatch.setattr(bench, "get_spark", lambda app_name=None: FakeSpark())
    monkeypatch.setattr(bench, "run_sweep", fake_sweep)
    monkeypatch.setattr(bench, "_wait_for_quiet_host", lambda: 0.0)
    monkeypatch.setattr(bench, "DETAIL_PATH",
                        str(tmp_path / "BENCH_DETAIL.json"))
    bench.main()
    assert calls["sweeps"] == 1
    compact = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "bench_runs" not in compact
    assert "discarded_host_noise" not in compact


def test_ambient_load_warn_triggers_retry_and_clean_run_wins(
        monkeypatch, capsys, tmp_path):
    """r14 VERDICT item 5: an ambient-load WARN triggers the one-shot
    retry too (the drift-only trigger let an ambient WARN become the
    parsed number), with a SECOND bounded quiet wait before the rerun;
    the clean rerun is parsed even when its calib pair is no stabler
    than the WARN'd run's."""
    calls = {"sweeps": 0, "stops": 0, "quiet_waits": 0}

    class FakeSpark:
        def stop(self):
            calls["stops"] += 1

    def fake_sweep(spark, sf_dir, names, plan_fn, sf):
        calls["sweeps"] += 1
        if calls["sweeps"] == 1:
            return _fake_detail(
                0.5, 0.5, "WARN: ambient loadavg 6.5 at start; "
                "compare within-run ratios only")
        # rerun: clean verdict but a (slightly) LESS stable calib pair
        # — the clean/WARN split must dominate the selection
        return _fake_detail(0.5, 0.52, "clean")

    def fake_quiet():
        calls["quiet_waits"] += 1
        return 30.0

    monkeypatch.setattr(bench, "get_spark", lambda app_name=None: FakeSpark())
    monkeypatch.setattr(bench, "run_sweep", fake_sweep)
    monkeypatch.setattr(bench, "_wait_for_quiet_host", fake_quiet)
    monkeypatch.setattr(bench, "DETAIL_PATH",
                        str(tmp_path / "BENCH_DETAIL.json"))
    bench.main()
    assert calls == {"sweeps": 2, "stops": 1, "quiet_waits": 2}
    out = [ln for ln in capsys.readouterr().out.strip().splitlines()
           if ln.strip()]
    compact = json.loads(out[-1])
    assert compact["host_noise"] == "clean"
    assert compact["bench_runs"] == 2
    assert "ambient loadavg" in compact["discarded_host_noise"]
    assert compact["quiet_wait_sec"] == 60.0


def test_quiet_host_gate_waits_bounded(monkeypatch):
    """The pre-start gate polls loadavg and gives up after the bound
    (never blocks a loaded host forever)."""
    loads = iter([10.0, 9.0, 2.0])
    slept = []
    monkeypatch.setattr(bench, "_loadavg_1m", lambda: next(loads))
    monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))
    assert bench._wait_for_quiet_host() == 20.0
    assert slept == [10, 10]
    # already quiet: returns immediately
    monkeypatch.setattr(bench, "_loadavg_1m", lambda: 0.5)
    assert bench._wait_for_quiet_host() == 0.0
    # bounded: a permanently loaded host exits at the cap
    monkeypatch.setattr(bench, "_loadavg_1m", lambda: 99.0)
    slept.clear()
    waited = bench._wait_for_quiet_host()
    assert waited <= bench.QUIET_WAIT_MAX_SEC + 10
    assert sum(slept) == waited
