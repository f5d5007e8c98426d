"""Pin the registry's driver-sample steering (registry._ordered).

The external driver samples ~50 names per round from the registry's
iteration order; the steering must put (1) never-drawn names first,
then (2) names whose latest driver row is unsettled — a hard error
(e.g. the r5 canonicalizer crashes), a hash mismatch, or a
``no_oracle`` row recorded before the query gained an oracle — and
only then (3) settled names. Pure-Python test: no SparkSession.
"""

from __future__ import annotations

import json

from big_data_traffict_prediction_spark import registry


def _green(rows: int = 10) -> dict:
    return {
        "rows_match": True,
        "schema_match": True,
        "hash_match": True,
        "spark_rows": rows,
        "oracle_rows": rows,
        "err": None,
    }


def _rows_only(rows: int = 10) -> dict:
    return {
        "rows_match": None,
        "schema_match": None,
        "hash_match": None,
        "spark_rows": rows,
        "oracle_rows": None,
        "err": "no_oracle",
    }


def _hard_err() -> dict:
    return {
        "rows_match": None,
        "schema_match": None,
        "hash_match": None,
        "spark_rows": None,
        "oracle_rows": None,
        "err": "TypeError: unhashable type: 'list'",
    }


def _mismatch() -> dict:
    return {
        "rows_match": True,
        "schema_match": True,
        "hash_match": False,
        "spark_rows": 10,
        "oracle_rows": 10,
        "err": None,
    }


def _with_artifacts(tmp_path, monkeypatch, files: dict[str, dict], snapshot=None):
    for fname, rows in files.items():
        (tmp_path / fname).write_text(json.dumps(rows))
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path))
    monkeypatch.setattr(registry, "_LATEST_ROW_CACHE", None)
    # default: empty snapshot disables the changed-fingerprint check so
    # row-status tests stay hermetic vs the committed _fingerprints.json
    monkeypatch.setattr(registry, "_FP_SNAPSHOT_CACHE", snapshot or {})


def _q(name: str, oracle: str | None) -> registry.Query:
    return registry.Query(name=name, fn=lambda s, d: None, oracle=oracle, doc="")


def test_row_settles_classification():
    oracled = _q("a", "SELECT 1")
    rows_only_q = _q("b", None)
    # green hash row settles an oracle-backed query
    assert registry._row_settles(oracled, _green())
    # a clean rows-only row settles only a query that still has no oracle
    assert registry._row_settles(rows_only_q, _rows_only())
    assert not registry._row_settles(oracled, _rows_only()), (
        "a no_oracle row recorded before the query gained an oracle must re-draw"
    )
    # hard errors and hash mismatches never settle
    assert not registry._row_settles(oracled, _hard_err())
    assert not registry._row_settles(rows_only_q, _hard_err())
    assert not registry._row_settles(oracled, _mismatch())
    # a rows-only row whose row-count probe itself died is unsettled
    dead = dict(_rows_only())
    dead["spark_rows"] = None
    assert not registry._row_settles(rows_only_q, dead)


def test_latest_round_wins(tmp_path, monkeypatch):
    _with_artifacts(
        tmp_path,
        monkeypatch,
        {
            "CORRECTNESS_r01.json": {"x": _hard_err()},
            "CORRECTNESS_r02.json": {"x": _green()},
        },
    )
    rnd, row = registry._driver_latest_rows()["x"]
    assert rnd == 2 and row["hash_match"] is True, "r02 row must supersede r01"


def test_round_sort_is_numeric_not_lexicographic(tmp_path, monkeypatch):
    # an unpadded _r7 must supersede _r06, and _r10 must supersede both —
    # lexicographic filename order would pick _r7 as "latest"
    _with_artifacts(
        tmp_path,
        monkeypatch,
        {
            "CORRECTNESS_r06.json": {"x": _hard_err()},
            "CORRECTNESS_r7.json": {"x": _mismatch()},
            "CORRECTNESS_r10.json": {"x": _green()},
        },
    )
    rnd, row = registry._driver_latest_rows()["x"]
    assert rnd == 10 and row["hash_match"] is True, (
        "numeric round 10 must win over lexicographically-later r7/r06"
    )


def test_ordering_never_then_recheck_then_settled(tmp_path, monkeypatch):
    registry._load_modules()
    oracle_backed = [n for n, q in registry._REGISTRY.items() if q.oracle][:3]
    green_name, err_name, retro_name = oracle_backed
    _with_artifacts(
        tmp_path,
        monkeypatch,
        {
            "CORRECTNESS_r01.json": {
                green_name: _green(),
                err_name: _hard_err(),
                retro_name: _rows_only(),  # predates this query's oracle
            }
        },
    )
    ordered = [q.name for q in registry._ordered()]
    never_count = len(ordered) - 3
    # group 1: every never-drawn name precedes all three drawn names
    drawn = {green_name, err_name, retro_name}
    assert min(ordered.index(x) for x in drawn) == never_count, (
        "never-drawn names must all lead"
    )
    # group 2: the unsettled pair (hard err + retro-oracled) re-draw next
    assert set(ordered[never_count : never_count + 2]) == {err_name, retro_name}
    # group 3: the settled green name sorts last
    assert ordered[-1] == green_name


def test_settled_names_sort_stalest_green_first(tmp_path, monkeypatch):
    registry._load_modules()
    oracle_backed = [n for n, q in registry._REGISTRY.items() if q.oracle][:3]
    old_name, older_name, fresh_name = oracle_backed
    _with_artifacts(
        tmp_path,
        monkeypatch,
        {
            "CORRECTNESS_r01.json": {older_name: _green()},
            "CORRECTNESS_r03.json": {old_name: _green()},
            "CORRECTNESS_r06.json": {fresh_name: _green()},
        },
    )
    ordered = [q.name for q in registry._ordered()]
    # all three settle, so they trail the never-drawn block — but among
    # them the oldest green row re-draws first, the freshest last
    assert ordered[-3:] == [older_name, old_name, fresh_name], (
        "settled names must order by ascending round of latest green row"
    )


def test_changed_fingerprint_forces_recheck(tmp_path, monkeypatch):
    registry._load_modules()
    oracle_backed = [n for n, q in registry._REGISTRY.items() if q.oracle][:2]
    changed_name, stable_name = oracle_backed
    snapshot = {
        changed_name: {"fp": "0000deadbeef0000", "round": 6},  # != real fp
        stable_name: {
            "fp": registry._fingerprint(registry._REGISTRY[stable_name]),
            "round": 6,
        },
    }
    _with_artifacts(
        tmp_path,
        monkeypatch,
        {"CORRECTNESS_r06.json": {changed_name: _green(), stable_name: _green()}},
        snapshot=snapshot,
    )
    ordered = [q.name for q in registry._ordered()]
    never_count = len(ordered) - 2
    # the edited query re-checks ahead of every settled name despite its
    # green row; the unchanged query stays settled at the back
    assert ordered[never_count] == changed_name
    assert ordered[-1] == stable_name


def test_refresh_fingerprints_rules(tmp_path, monkeypatch):
    registry._load_modules()
    oracle_backed = [n for n, q in registry._REGISTRY.items() if q.oracle][:3]
    stable_name, witnessed_name, unwitnessed_name = oracle_backed
    real_fp = {n: registry._fingerprint(registry._REGISTRY[n]) for n in oracle_backed}
    snapshot = {
        # unchanged since r2 → round should advance to its latest green
        stable_name: {"fp": real_fp[stable_name], "round": 2},
        # changed, and the max-round draw (r6) witnessed the new code → adopt
        witnessed_name: {"fp": "aaaa000000000000", "round": 2},
        # changed, but its latest green row predates the change (r3 < max 6)
        # → keep the stale entry so it stays in the re-check group
        unwitnessed_name: {"fp": "bbbb000000000000", "round": 2},
    }
    _with_artifacts(
        tmp_path,
        monkeypatch,
        {
            "CORRECTNESS_r03.json": {unwitnessed_name: _green()},
            "CORRECTNESS_r06.json": {stable_name: _green(), witnessed_name: _green()},
        },
        snapshot=snapshot,
    )
    # redirect the snapshot write into the temp dir, not the repo
    monkeypatch.setattr(
        registry, "_fingerprint_path", lambda: str(tmp_path / "_fingerprints.json")
    )
    snap = registry.refresh_fingerprints()
    assert snap[stable_name] == {"fp": real_fp[stable_name], "round": 6}
    assert snap[witnessed_name] == {"fp": real_fp[witnessed_name], "round": 6}
    assert snap[unwitnessed_name] == {"fp": "bbbb000000000000", "round": 2}, (
        "a change never witnessed by the newest draw must keep its stale entry"
    )
