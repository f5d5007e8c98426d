"""Pin bench.py's loaded-host guard (pure Python, no Spark).

The committed BENCH_DETAIL.json is the best-known idle-host record;
a loaded-host sweep must land in BENCH_DETAIL.loaded.json instead of
clobbering it (this happened two consecutive rounds before the guard).
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _git_repo_with_record(tmp_path, record: dict):
    repo = tmp_path / "r"
    repo.mkdir()
    subprocess.run(["git", "init", "-q"], cwd=repo, check=True)
    (repo / "BENCH_DETAIL.json").write_text(json.dumps(record))
    subprocess.run(["git", "add", "-A"], cwd=repo, check=True)
    subprocess.run(
        ["git", "-c", "user.email=t@t", "-c", "user.name=t",
         "commit", "-qm", "record"],
        cwd=repo,
        check=True,
    )
    return repo


RECORD = {"queries_min": {"q_a": 1.0, "q_b": 2.0}, "value_min": 3.0}


def test_degraded_detection_over_shared_keys():
    bench = _bench()
    # 20% slower over shared keys -> degraded
    assert bench._is_degraded_run(
        {"queries_min": {"q_a": 1.2, "q_b": 2.4}}, RECORD
    )
    # within 10% -> not degraded
    assert not bench._is_degraded_run(
        {"queries_min": {"q_a": 1.05, "q_b": 2.1}}, RECORD
    )
    # faster -> not degraded
    assert not bench._is_degraded_run(
        {"queries_min": {"q_a": 0.9, "q_b": 1.8}}, RECORD
    )
    # disjoint headline sets are un-comparable -> never degraded
    assert not bench._is_degraded_run(
        {"queries_min": {"q_new": 99.0}}, RECORD
    )
    # comparison uses ONLY shared keys: a new expensive query must not
    # masquerade as host load
    assert not bench._is_degraded_run(
        {"queries_min": {"q_a": 1.0, "q_b": 2.0, "q_new": 50.0}}, RECORD
    )


def test_non_numeric_cells_degrade_gracefully():
    """A corrupt record (null / string / bool cells) must not raise at
    the end of an expensive sweep — skip the bad keys, compare the
    rest, and fall back to 'not degraded' when nothing is comparable."""
    bench = _bench()
    # corrupt cell on one side: the other (shared, numeric) key still
    # drives the verdict
    assert bench._is_degraded_run(
        {"queries_min": {"q_a": 1.0, "q_b": 9.9}},
        {"queries_min": {"q_a": None, "q_b": 2.0}},
    )
    assert not bench._is_degraded_run(
        {"queries_min": {"q_a": "oops", "q_b": 2.0}}, RECORD
    )
    # bools are ints in Python but nonsense as timings -> skipped
    assert not bench._is_degraded_run(
        {"queries_min": {"q_a": True, "q_b": 2.0}}, RECORD
    )
    # nothing comparable at all -> not degraded, no TypeError
    assert not bench._is_degraded_run(
        {"queries_min": {"q_a": None, "q_b": None}}, RECORD
    )


def test_loaded_run_does_not_clobber_committed_record(tmp_path, monkeypatch):
    bench = _bench()
    repo = _git_repo_with_record(tmp_path, RECORD)
    loaded = {"queries_min": {"q_a": 1.5, "q_b": 3.0}, "value_min": 4.5}
    monkeypatch.delenv("SPARK_BENCH_FORCE_DETAIL", raising=False)
    path = bench.resolve_detail_path(loaded, str(repo))
    assert path.endswith("BENCH_DETAIL.loaded.json")
    # simulate the full write the driver would do
    with open(path, "w") as fh:
        json.dump(loaded, fh)
    committed = json.loads((repo / "BENCH_DETAIL.json").read_text())
    assert committed == RECORD, "idle record must survive a loaded run"


def test_idle_or_faster_run_writes_canonical_path(tmp_path, monkeypatch):
    bench = _bench()
    repo = _git_repo_with_record(tmp_path, RECORD)
    monkeypatch.delenv("SPARK_BENCH_FORCE_DETAIL", raising=False)
    faster = {"queries_min": {"q_a": 0.8, "q_b": 1.9}, "value_min": 2.7}
    assert bench.resolve_detail_path(faster, str(repo)).endswith(
        os.sep + "BENCH_DETAIL.json"
    )


def test_force_env_bypasses_guard(tmp_path, monkeypatch):
    bench = _bench()
    repo = _git_repo_with_record(tmp_path, RECORD)
    loaded = {"queries_min": {"q_a": 9.0, "q_b": 9.0}}
    monkeypatch.setenv("SPARK_BENCH_FORCE_DETAIL", "1")
    assert bench.resolve_detail_path(loaded, str(repo)).endswith(
        os.sep + "BENCH_DETAIL.json"
    )


def test_guard_also_protects_working_tree_record(tmp_path, monkeypatch):
    """A better record written this round but not yet committed must
    not be clobbered by a later run that only beats the COMMITTED one."""
    bench = _bench()
    repo = _git_repo_with_record(tmp_path, RECORD)  # committed total 3.0
    better = {"queries_min": {"q_a": 0.8, "q_b": 1.6}, "value_min": 2.4}
    (repo / "BENCH_DETAIL.json").write_text(json.dumps(better))
    monkeypatch.delenv("SPARK_BENCH_FORCE_DETAIL", raising=False)
    # total 2.9: beats committed 3.0 but is >10% over working-tree 2.4
    middling = {"queries_min": {"q_a": 0.9, "q_b": 2.0}, "value_min": 2.9}
    assert bench.resolve_detail_path(middling, str(repo)).endswith(
        "BENCH_DETAIL.loaded.json"
    )
    # a run beating BOTH records still lands canonically
    best = {"queries_min": {"q_a": 0.7, "q_b": 1.5}, "value_min": 2.2}
    assert bench.resolve_detail_path(best, str(repo)).endswith(
        os.sep + "BENCH_DETAIL.json"
    )


def test_no_committed_record_writes_canonical_path(tmp_path, monkeypatch):
    bench = _bench()
    repo = tmp_path / "nogit"
    repo.mkdir()
    monkeypatch.delenv("SPARK_BENCH_FORCE_DETAIL", raising=False)
    anything = {"queries_min": {"q_a": 9.0}}
    assert bench.resolve_detail_path(anything, str(repo)).endswith(
        os.sep + "BENCH_DETAIL.json"
    )


def test_load_factor_over_shared_keys():
    bench = _bench()
    # 1.2x over both shared queries -> 1.2 (q_new has no record row and
    # must not poison the ratio)
    lf = bench._load_factor({"q_a": 1.2, "q_b": 2.4, "q_new": 9.0}, RECORD)
    assert lf == 1.2
    # no record / empty record / zero total -> None, never ZeroDivisionError
    assert bench._load_factor({"q_a": 1.0}, None) is None
    assert bench._load_factor({"q_a": 1.0}, {"queries_min": {}}) is None
    assert bench._load_factor({"q_a": 1.0}, {"queries_min": {"q_a": 0}}) is None
    # boolean cells in a corrupt record are skipped like the guard does
    assert bench._load_factor({"q_a": 1.0}, {"queries_min": {"q_a": True}}) is None


def test_calibration_probe_is_positive_seconds():
    bench = _bench()
    t = bench._calibration_probe()
    # fixed CPU work: strictly positive, and not absurdly long even on
    # a loaded host (the probe is 256 MB of md5, ~0.3-0.5 s idle)
    assert 0.01 < t < 30.0
