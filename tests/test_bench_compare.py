"""Pin scripts/bench_compare.py's flag logic (pure Python, no Spark).

The script gates future rounds on per-query bench regressions, so its
thresholds and exit semantics must not drift silently.
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(tmp_path, monkeypatch, ref: dict, cur: dict, extra_args: tuple = ()):
    """Execute bench_compare's main() against a throwaway git repo."""
    import uuid

    repo = tmp_path / f"r-{uuid.uuid4().hex[:8]}"
    repo.mkdir()
    subprocess.run(["git", "init", "-q"], cwd=repo, check=True)
    (repo / "BENCH_DETAIL.json").write_text(json.dumps(ref))
    subprocess.run(["git", "add", "-A"], cwd=repo, check=True)
    subprocess.run(
        ["git", "-c", "user.email=t@t", "-c", "user.name=t",
         "commit", "-qm", "ref"],
        cwd=repo,
        check=True,
    )
    (repo / "BENCH_DETAIL.json").write_text(json.dumps(cur))

    spec = importlib.util.spec_from_file_location(
        "bench_compare", os.path.join(REPO, "scripts", "bench_compare.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "REPO", str(repo))
    monkeypatch.setattr(
        mod.sys, "argv", ["bench_compare.py", "HEAD", *extra_args]
    )
    return mod.main()


def test_regression_flagged_and_exit_code(tmp_path, monkeypatch):
    ref = {"queries_min": {"q_a": 1.0, "q_b": 1.0}, "queries_extended": {},
           "value_min": 2.0}
    cur = {"queries_min": {"q_a": 1.0, "q_b": 2.0}, "queries_extended": {},
           "value_min": 3.0}
    assert _run(tmp_path, monkeypatch, ref, cur) == 1, ">1.5x must flag"


def test_noise_floor_and_improvements_not_flagged(tmp_path, monkeypatch):
    ref = {
        "queries_min": {"q_fast": 0.05, "q_slow": 2.0},
        "queries_extended": {"q_x": 1.0},
        "value_min": 2.05,
    }
    cur = {
        "queries_min": {"q_fast": 0.15, "q_slow": 1.0},  # sub-floor 3x + a win
        "queries_extended": {"q_x": 1.4},  # 1.4x < 1.5x threshold
        "value_min": 1.15,
    }
    assert _run(tmp_path, monkeypatch, ref, cur) == 0


def test_guard_diverted_run_still_gates(tmp_path, monkeypatch):
    """When bench.py diverts a degraded run to BENCH_DETAIL.loaded.json,
    bench_compare must pick up that newer artifact instead of silently
    diffing the stale canonical file against itself."""
    import os as _os
    import time
    import uuid

    repo = tmp_path / f"r-{uuid.uuid4().hex[:8]}"
    repo.mkdir()
    subprocess.run(["git", "init", "-q"], cwd=repo, check=True)
    ref = {"queries_min": {"q_a": 1.0}, "queries_extended": {}, "value_min": 1.0}
    (repo / "BENCH_DETAIL.json").write_text(json.dumps(ref))
    subprocess.run(["git", "add", "-A"], cwd=repo, check=True)
    subprocess.run(
        ["git", "-c", "user.email=t@t", "-c", "user.name=t", "commit", "-qm", "r"],
        cwd=repo,
        check=True,
    )
    time.sleep(0.05)
    loaded = {"queries_min": {"q_a": 2.0}, "queries_extended": {}, "value_min": 2.0}
    (repo / "BENCH_DETAIL.loaded.json").write_text(json.dumps(loaded))
    _os.utime(repo / "BENCH_DETAIL.loaded.json")  # strictly newer

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_compare", os.path.join(REPO, "scripts", "bench_compare.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "REPO", str(repo))
    monkeypatch.setattr(mod.sys, "argv", ["bench_compare.py", "HEAD"])
    assert mod.main() == 1, "diverted 2x regression must still flag"


def test_extended_keys_on_min_stat_when_present(tmp_path, monkeypatch):
    """With queries_extended_min on BOTH sides, extended diffs key on
    the floor stat: a median-only spike (one loaded sweep out of three)
    must not flag, while a floor regression must."""
    ref = {
        "queries_min": {"q_a": 1.0},
        "queries_extended": {"q_x": 1.0},
        "queries_extended_min": {"q_x": 1.0},
        "value_min": 1.0,
    }
    spiked = {
        "queries_min": {"q_a": 1.0},
        "queries_extended": {"q_x": 2.0},  # median inflated by one sweep
        "queries_extended_min": {"q_x": 1.0},  # floor unchanged
        "value_min": 1.0,
    }
    assert _run(tmp_path, monkeypatch, ref, spiked) == 0
    regressed = {
        "queries_min": {"q_a": 1.0},
        "queries_extended": {"q_x": 1.0},  # median masked by two fast sweeps
        "queries_extended_min": {"q_x": 2.0},
        "value_min": 1.0,
    }
    assert _run(tmp_path, monkeypatch, ref, regressed) == 1
    # fallback: a ref predating the stat still compares on the median
    old_ref = {
        "queries_min": {"q_a": 1.0},
        "queries_extended": {"q_x": 1.0},
        "value_min": 1.0,
    }
    assert _run(tmp_path, monkeypatch, old_ref, spiked) == 1


def test_dropped_query_gates_unless_waived(tmp_path, monkeypatch):
    ref = {"queries_min": {"q_a": 1.0, "q_b": 1.0}, "queries_extended": {},
           "value_min": 2.0}
    cur = {"queries_min": {"q_a": 1.0}, "queries_extended": {},
           "value_min": 1.0}
    assert _run(tmp_path, monkeypatch, ref, cur) == 1, "silent drop must gate"
    assert _run(tmp_path, monkeypatch, ref, cur, ("--allow-drops",)) == 0
