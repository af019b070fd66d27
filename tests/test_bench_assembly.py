"""Unit-gate for bench.py's window-evidence assembly.

The committed BENCH_r{N}.json row is produced once per round by the
driver; a malformed watcher-log line or a missing key in a capture
record must never crash that run or mis-rank the evidence. These tests
drive ``bench.assemble_window_evidence`` against synthetic logs covering
the qualification rules (capacity vs bracketed), the per-rung ladder,
the stationary-window preference on the query axis, and junk lines.
"""

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def _write(path, recs, junk=False):
    with open(path, "w") as f:
        if junk:
            f.write("not json at all\n{truncated\n")
        for r in recs:
            f.write(json.dumps(r) + "\n")
    return str(path)


def _empty(tmp_path, name):
    p = tmp_path / name
    p.write_text("")
    return str(p)


@pytest.fixture
def logs(tmp_path):
    return {
        "qlog": _empty(tmp_path, "quiet.jsonl"),
        "spot_log": _empty(tmp_path, "spot.jsonl"),
        "query_leg_log": _empty(tmp_path, "qlegs.jsonl"),
    }


def test_empty_and_junk_logs_leave_result_untouched(tmp_path, logs):
    _write(logs["qlog"], [], junk=True)
    out = bench.assemble_window_evidence({"metric": "m"}, **logs)
    assert out == {"metric": "m"}
    # missing files entirely
    out = bench.assemble_window_evidence(
        {}, qlog=str(tmp_path / "nope1"), spot_log=str(tmp_path / "nope2"),
        query_leg_log=str(tmp_path / "nope3"))
    assert out == {}


def test_quiet_window_qualification_and_ladder(logs):
    recs = [
        # disqualified: no efficiency at all (aborted leg)
        {"ts": "t0", "scaling_efficiency": None, "kernel_16p": 50e6},
        # disqualified: low capacity AND not bracketed
        {"ts": "t1", "scaling_efficiency": 0.95, "pair": [8, 32],
         "kernel_32p": 3e6, "controls_bracketed": False,
         "keff_pre": 0.9, "keff_after": 0.9},
        # qualified via capacity (16p kernel ≥ 12M), rung 4→16
        {"ts": "t2", "scaling_efficiency": 0.81, "pair": [4, 16],
         "kernel_16p": 41e6, "keff_pre": 0.82, "keff_after": 0.51,
         "controls_bracketed": False, "build_sec_4c": 80.0,
         "docs_per_sec_16c": 25000.0, "replicas": 128, "mini_rate": 1.5e6},
        # qualified via bracket (keff ≥ 0.7 both sides), rung 2→8
        {"ts": "t3", "scaling_efficiency": 0.99, "pair": [2, 8],
         "kernel_32p": 5e6, "controls_bracketed": True,
         "keff_pre": 0.97, "keff_after": 0.75, "build_sec_2c": 100.0},
        # qualified, same rung as t2 but LOWER efficiency → not in ladder
        {"ts": "t4", "scaling_efficiency": 0.70, "pair": [4, 16],
         "kernel_16p": 30e6},
        # legacy record with no pair field → defaults to 8x32 rung
        {"ts": "t5", "scaling_efficiency": 0.43, "kernel_32p": 14e6},
    ]
    _write(logs["qlog"], recs, junk=True)
    out = bench.assemble_window_evidence({}, **logs)

    assert out["quiet_window_best"]["ts"] == "t3"
    ladder = out["quiet_window_ladder"]
    assert set(ladder) == {"2x8", "4x16", "8x32"}
    assert ladder["4x16"]["ts"] == "t2"
    assert ladder["8x32"]["ts"] == "t5"
    # rung view keeps evidence fields, drops unknown ones
    v = ladder["4x16"]
    assert v["build_sec_4c"] == 80.0 and v["keff_pre"] == 0.82
    assert v["replicas"] == 128 and "pair" not in v


def test_spot_best_is_lowest_total(logs):
    _write(logs["spot_log"], [
        {"kind": "spot_queries", "queries": {"q": 1}, "total_sec": 12.0},
        {"kind": "spot_queries", "queries": {"q": 1}, "total_sec": 9.78},
        {"kind": "build_leg", "total_sec": 1.0},        # wrong kind
        {"kind": "spot_queries", "total_sec": 0.1},      # no queries dict
    ])
    out = bench.assemble_window_evidence({}, **logs)
    assert out["spot_queries_best"]["total_sec"] == 9.78


def test_query_scaling_prefers_stationary_then_best_axis(logs):
    recs = [
        # non-stationary (mini collapsed mid-run) but huge ratio — the
        # classic inflated capture; must lose to any stationary record
        {"kind": "query_scaling", "query_scaling_efficiency_8_to_32": 1.9,
         "mini_rate_before": 2.0e6, "mini_rate_after": 0.3e6},
        # stationary, b256 axis better than b64 → ranked on 0.71
        {"kind": "query_scaling", "query_scaling_efficiency_8_to_32": 0.60,
         "query_scaling_efficiency_b256": 0.71,
         "mini_rate_before": 1.8e6, "mini_rate_after": 1.6e6},
        # stationary, b256 absent (None) → ranked on 0.67
        {"kind": "query_scaling", "query_scaling_efficiency_8_to_32": 0.67,
         "query_scaling_efficiency_b256": None,
         "mini_rate_before": 1.2e6, "mini_rate_after": 1.2e6},
    ]
    _write(logs["query_leg_log"], recs)
    out = bench.assemble_window_evidence({}, **logs)
    assert out["query_scaling_best"]["query_scaling_efficiency_b256"] == 0.71


def test_query_scaling_falls_back_to_noisy_pool(logs):
    _write(logs["query_leg_log"], [
        {"kind": "query_scaling", "query_scaling_efficiency_8_to_32": 0.5,
         "mini_rate_before": 0.2e6, "mini_rate_after": 0.1e6},
    ])
    out = bench.assemble_window_evidence({}, **logs)
    assert out["query_scaling_best"]["query_scaling_efficiency_8_to_32"] == 0.5


def test_assembly_on_real_repo_logs_matches_committed_shape():
    """The actual repo logs must assemble without error, and the ladder —
    if present — must carry a ≥0.8 rung (the north-rule evidence on file:
    2→8 at 0.99 / 4→16 at 0.816)."""
    out = bench.assemble_window_evidence({})
    if "quiet_window_ladder" in out:
        best = max(r["scaling_efficiency"]
                   for r in out["quiet_window_ladder"].values())
        assert best >= 0.8
        assert out["quiet_window_best"]["scaling_efficiency"] == pytest.approx(
            best)


def test_holding_flag_waits_for_inflight_capture(tmp_path, monkeypatch):
    """If a watcher capture holds the flag when the committed bench
    starts, _holding_flag must WAIT for the release (not run unheld
    alongside the watcher's legs), then take the flag itself; an
    hour-old orphan flag is reaped; on timeout it proceeds unheld
    WITHOUT unlinking the foreign holder's flag."""
    import threading
    import time as _time

    flag = str(tmp_path / "quietbench.running")
    monkeypatch.setattr(bench, "QUIET_FLAG", flag)

    # flag absent: acquires, runs holding it, releases after
    seen = []
    bench._holding_flag(lambda: seen.append(os.path.exists(flag)))
    assert seen == [True] and not os.path.exists(flag)

    # in-flight capture releases mid-wait: bench acquires afterwards
    open(flag, "w").close()
    threading.Thread(
        target=lambda: (_time.sleep(1.5), os.unlink(flag))).start()
    t0 = _time.time()
    seen = []
    bench._holding_flag(lambda: seen.append(os.path.exists(flag)),
                        wait_sec=30)
    assert seen == [True] and _time.time() - t0 >= 1.0
    assert not os.path.exists(flag)

    # holder never releases: run unheld at deadline, flag left intact
    open(flag, "w").close()
    seen = []
    bench._holding_flag(lambda: seen.append("ran"), wait_sec=1)
    assert seen == ["ran"] and os.path.exists(flag)

    # orphaned flag (holder died >1h ago): reaped and acquired at once
    os.utime(flag, (_time.time() - 7200,) * 2)
    t0 = _time.time()
    seen = []
    bench._holding_flag(lambda: seen.append(os.path.exists(flag)),
                        wait_sec=30)
    assert seen == [True] and _time.time() - t0 < 1.0
    assert not os.path.exists(flag)
