"""Protocol tests for tools/ab_harness.py (r11 verdict item 8): the
clean/throttled window classification, the alternating-order
interleave, the backoff path, and the window-vs-code adjudication
rule — all with the sentinel probe monkeypatched (no timing)."""

import importlib.util
import os
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")


@pytest.fixture()
def harness(monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "ab_harness", os.path.join(TOOLS, "ab_harness.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ab_harness"] = mod
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod.time, "sleep", lambda s: None)
    return mod


def _probe(ratio):
    return {"fma1_sec": 0.0, "gemm32_sec": 0.0, "ratio": ratio}


def test_is_clean_classification(harness):
    clean = {"sentinel_before": _probe(1.0), "sentinel_after": _probe(1.5)}
    dirty_before = {"sentinel_before": _probe(2.7),
                    "sentinel_after": _probe(1.0)}
    dirty_after = {"sentinel_before": _probe(1.0),
                   "sentinel_after": _probe(1.51)}
    assert harness.is_clean(clean)
    assert not harness.is_clean(dirty_before)
    assert not harness.is_clean(dirty_after)
    # the threshold is a parameter
    assert harness.is_clean(dirty_after, clean=1.6)


def test_interleave_alternates_order_and_tags_windows(
        harness, monkeypatch):
    ratios = iter([1.0, 1.0,   # attempt 0: clean
                   2.5, 1.0,   # attempt 1: throttled (before)
                   1.0, 1.0])  # attempt 2: clean
    monkeypatch.setattr(harness, "probe",
                        lambda: _probe(next(ratios)))
    calls = []
    arms = {
        "a": lambda: calls.append("a") or {"qps_batch": 100.0},
        "b": lambda: calls.append("b") or {"qps_batch": 200.0},
    }
    recs = harness.run_interleaved(arms, attempts=3)
    assert [r["window"] for r in recs] == [
        "clean", "throttled", "clean"]
    # order alternates per attempt: a,b then b,a then a,b
    assert calls == ["a", "b", "b", "a", "a", "b"]
    assert recs[0]["order"] == ["a", "b"]
    assert recs[1]["order"] == ["b", "a"]
    # every record carries both arms' results regardless of order
    assert recs[1]["a"]["qps_batch"] == 100.0
    assert recs[1]["b"]["qps_batch"] == 200.0


def test_interleave_stop_when_requires_clean(harness, monkeypatch):
    # stop_when satisfied on a THROTTLED attempt must not stop
    ratios = iter([9.9, 9.9, 9.9, 9.9, 1.0, 1.0, 1.0, 1.0])
    monkeypatch.setattr(harness, "probe",
                        lambda: _probe(next(ratios)))
    recs = harness.run_interleaved(
        {"x": lambda: {"qps_batch": 1.0}}, attempts=4,
        stop_when=lambda r: True)
    # stopped at the FIRST clean attempt (attempt index 2), having
    # recorded the two throttled ones
    assert len(recs) == 3
    assert recs[-1]["window"] == "clean"


def test_adjudicate_regression_window_vs_code(harness):
    def rec(window, qps):
        return {"window": window, "x": {"qps_batch": qps}}

    # one clean attempt >= 0.9x baseline -> window
    out = harness.adjudicate_regression(
        [rec("throttled", 50.0), rec("clean", 95.0)],
        "x", baseline_qps=100.0, regressed_qps=60.0)
    assert out["verdict"].startswith("window")
    assert out["best_clean_qps"] == 95.0
    # every clean attempt below the gate -> code-or-box
    out = harness.adjudicate_regression(
        [rec("clean", 80.0)], "x", 100.0, 60.0)
    assert out["verdict"].startswith("code-or-box")
    # no clean attempt -> inconclusive
    out = harness.adjudicate_regression(
        [rec("throttled", 99.0)], "x", 100.0, 60.0)
    assert out["verdict"].startswith("inconclusive")


def test_write_ab_row_stamps_and_preserves(harness, monkeypatch,
                                           tmp_path):
    import json

    ab = tmp_path / "BENCH_AB.json"
    ab.write_text(json.dumps({"existing_row": {"keep": True}}))
    monkeypatch.setattr(harness, "REPO", str(tmp_path))
    harness.write_ab_row("new_row", {"rows": [1, 2]})
    data = json.loads(ab.read_text())
    assert data["existing_row"] == {"keep": True}
    assert data["new_row"]["rows"] == [1, 2]
    assert "ts" in data["new_row"]
