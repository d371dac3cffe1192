"""Unit tests for tools/bench_delta.py's trust gate (ADVICE r10 medium +
VERDICT r10 task 1): contended or engine-wide-suspect artifacts must be
refused, not silently normalized away."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "bench_delta",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "bench_delta.py"),
)
bench_delta = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(bench_delta)


def _artifact(tmp_path, name, queries, canary_scale):
    p = tmp_path / name
    payload = {"queries": queries}
    if canary_scale is not None:
        payload["canary"] = {"scale": canary_scale}
    p.write_text(json.dumps(payload))
    return str(p)


def _run(monkeypatch, capsys, argv):
    monkeypatch.setattr(sys, "argv", ["bench_delta.py", *argv])
    rc = bench_delta.main()
    return rc, capsys.readouterr().out


def test_clean_comparison_passes(tmp_path, monkeypatch, capsys):
    old = _artifact(tmp_path, "old.json", {"q1": 1.0, "q2": 0.5}, 1.05)
    new = _artifact(tmp_path, "new.json", {"q1": 1.1, "q2": 0.55}, 1.10)
    rc, out = _run(monkeypatch, capsys, [old, new])
    assert rc == 0
    assert "REFUSED" not in out


def test_contended_new_canary_refused(tmp_path, monkeypatch, capsys):
    """A new-side canary above CANARY_IDLE_MAX is indistinguishable from an
    engine-wide regression — exit 1 even when every normalized per-query
    ratio is clean (the ADVICE r10 blind spot)."""
    old = _artifact(tmp_path, "old.json", {"q1": 1.0}, 1.0)
    new = _artifact(
        tmp_path, "new.json", {"q1": 1.15},
        bench_delta.CANARY_IDLE_MAX + 0.21,
    )
    rc, out = _run(monkeypatch, capsys, [old, new])
    assert rc == 1
    assert "REFUSED" in out and "new canary scale" in out


def test_engine_wide_regression_not_normalized_away(tmp_path, monkeypatch, capsys):
    """The exact ADVICE scenario: every query 2.5x slower AND the canary
    2.5x inflated (engine-wide slowdown). Normalized ratios are all 1.0 —
    the old gate passed silently; the trust gate must refuse."""
    old = _artifact(tmp_path, "old.json", {"q1": 1.0, "q2": 2.0}, 1.0)
    new = _artifact(tmp_path, "new.json", {"q1": 2.5, "q2": 5.0}, 2.5)
    rc, out = _run(monkeypatch, capsys, [old, new])
    assert rc == 1
    assert "REFUSED" in out


def test_allow_contended_downgrades_to_warning(tmp_path, monkeypatch, capsys):
    old = _artifact(tmp_path, "old.json", {"q1": 1.0}, 1.0)
    new = _artifact(tmp_path, "new.json", {"q1": 1.0}, 2.5)
    rc, out = _run(monkeypatch, capsys, [old, new, "2.0", "--allow-contended"])
    assert rc == 0
    assert "WARNING" in out and "REFUSED" not in out


def test_per_query_regression_still_gates(tmp_path, monkeypatch, capsys):
    old = _artifact(tmp_path, "old.json", {"q1": 1.0, "q2": 1.0}, 1.0)
    new = _artifact(tmp_path, "new.json", {"q1": 2.6, "q2": 1.0}, 1.05)
    rc, out = _run(monkeypatch, capsys, [old, new])
    assert rc == 1
    assert "REGRESSIONS" in out and "q1" in out


@pytest.mark.parametrize(
    "old_scale,new_scale,phrase",
    [
        (None, None, "either file"),
        (None, 1.0, "the OLD file"),
        (1.0, None, "the NEW file"),
    ],
)
def test_missing_canary_message_names_the_right_side(
    tmp_path, monkeypatch, capsys, old_scale, new_scale, phrase
):
    old = _artifact(tmp_path, "old.json", {"q1": 1.0}, old_scale)
    new = _artifact(tmp_path, "new.json", {"q1": 1.0}, new_scale)
    rc, out = _run(monkeypatch, capsys, [old, new])
    assert rc == 0
    assert phrase in out
