"""Hand-computable semantics tests for the hypertable-style analytics
(operators/tsdb.py): TWA weighting, LOCF vs linear interpolation on
planted gaps, OHLC picks, and finite-difference deltas."""

from __future__ import annotations

from datetime import datetime, timezone

from big_data_traffict_prediction_spark.compat import NOW_EPOCH
from big_data_traffict_prediction_spark.operators.tsdb import (
    DAY_START,
    q_delta_series,
    q_gap_fill_interp,
    q_gap_fill_locf,
    q_ohlc_candles,
    q_time_weighted_avg,
)


def _utc(epoch: int) -> datetime:
    return datetime.fromtimestamp(epoch, tz=timezone.utc).replace(tzinfo=None)


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{path}/events.parquet")


def test_twa_weights_by_holding_time(spark, tmp_path):
    """value 10 held for 50 s then value 20 held for 50 s (to NOW)
    → TWA exactly 15; a plain AVG would also say 15, so add a third
    sample making the durations unequal: 10 (100 s), 20 (50 s)
    → (10*100 + 20*50) / 150 = 13.333333."""
    rows = [
        (1, _utc(NOW_EPOCH - 150), 1, "click", 10.0, "{}"),
        (2, _utc(NOW_EPOCH - 50), 1, "click", 20.0, "{}"),
    ]
    path = str(tmp_path / "ev")
    _write_events(spark, path, rows)
    r = q_time_weighted_avg(spark, path).collect()
    assert len(r) == 1
    assert r[0].n_samples == 2 and r[0].covered_s == 150
    assert abs(r[0].twa - (10.0 * 100 + 20.0 * 50) / 150) < 1e-6


def test_gap_fill_locf_and_interp_planted_gaps(spark, tmp_path):
    """Camera 1 observed in hours 0 and 3 of the aligned day: LOCF
    carries hour-0 across 1-2; interpolation ramps 5 → 11 linearly.
    Camera 2 observed only in hour 2: leading buckets are 0 under
    LOCF but backfill (NOCB) to 4 under interpolation."""
    rows = [
        (1, _utc(DAY_START + 600), 1, "click", 5.9, "{}"),  # h0, new_count 5
        (2, _utc(DAY_START + 3 * 3600 + 60), 1, "click", 11.2, "{}"),  # h3 → 11
        (3, _utc(DAY_START + 2 * 3600 + 60), 2, "view", 4.5, "{}"),  # h2 → 4
    ]
    path = str(tmp_path / "ev")
    _write_events(spark, path, rows)

    locf = {
        (r.camera_id, r.bucket_epoch): (r.value_locf, r.is_gap)
        for r in q_gap_fill_locf(spark, path).collect()
    }
    assert len(locf) == 48  # 2 cameras × 24 buckets
    hb = lambda h: DAY_START + h * 3600  # noqa: E731
    assert locf[("1", hb(0))] == (5, 0)
    assert locf[("1", hb(1))] == (5, 1)
    assert locf[("1", hb(2))] == (5, 1)
    assert locf[("1", hb(3))] == (11, 0)
    assert locf[("1", hb(23))] == (11, 1)
    assert locf[("2", hb(0))] == (0, 1)  # leading gap → 0
    assert locf[("2", hb(2))] == (4, 0)

    interp = {
        (r.camera_id, r.bucket_epoch): r.value_interp
        for r in q_gap_fill_interp(spark, path).collect()
    }
    assert interp[("1", hb(1))] == 7.0  # 5 + (11-5)*1/3
    assert interp[("1", hb(2))] == 9.0  # 5 + (11-5)*2/3
    assert interp[("1", hb(23))] == 11.0  # trailing LOCF
    assert interp[("2", hb(0))] == 4.0  # leading NOCB
    assert interp[("2", hb(1))] == 4.0


def test_ohlc_picks_first_last_extremes(spark, tmp_path):
    """Three samples in one trailing-24h hour: open = earliest by
    (ts, id), close = latest, high/low = extremes."""
    base = NOW_EPOCH - 3600  # final hour bucket
    rows = [
        (10, _utc(base + 10), 1, "click", 7.0, "{}"),
        (11, _utc(base + 20), 1, "click", 2.0, "{}"),
        (12, _utc(base + 30), 1, "click", 5.0, "{}"),
    ]
    path = str(tmp_path / "ev")
    _write_events(spark, path, rows)
    r = q_ohlc_candles(spark, path).collect()
    assert len(r) == 1
    c = r[0]
    assert (c.open, c.high, c.low, c.close, c.n_samples) == (7.0, 7.0, 2.0, 5.0, 3)


def test_delta_series_first_row_null_and_rate(spark, tmp_path):
    rows = [
        (1, _utc(NOW_EPOCH - 150), 1, "click", 10.0, "{}"),
        (2, _utc(NOW_EPOCH - 50), 1, "click", 25.5, "{}"),
    ]
    path = str(tmp_path / "ev")
    _write_events(spark, path, rows)
    r = sorted(q_delta_series(spark, path).collect(), key=lambda x: x.ts)
    assert r[0].delta is None and r[0].rate_per_s is None
    assert r[1].delta == 15.5 and r[1].dt_s == 100
    assert abs(r[1].rate_per_s - 0.155) < 1e-9


def test_cm_sketch_never_underestimates(spark, sf_dir):
    from big_data_traffict_prediction_spark.operators.tsdb import q_heavy_hitters_sketch

    rows = q_heavy_hitters_sketch(spark, sf_dir).collect()
    assert rows, "no cameras"
    assert all(r.overcount >= 0 for r in rows), "count-min underestimated"
    assert all(r.cm_estimate == r.exact_total + r.overcount for r in rows)


def test_first_touch_attribution_window_edges(spark, tmp_path):
    """user 1: view 100 s before the purchase → attributed, lag 100;
    a second view 50 s before must NOT steal credit (first touch =
    earliest in window). user 2: only a view AFTER the purchase →
    unattributed. user 3: the view is 8 days old → outside the 7-day
    window → unattributed."""
    from big_data_traffict_prediction_spark.operators.windows import (
        q_first_touch_attribution,
    )

    T = NOW_EPOCH - 86400
    rows = [
        (1, _utc(T - 100), 1, "view", 1.0, "{}"),
        (2, _utc(T - 50), 1, "view", 1.0, "{}"),
        (3, _utc(T), 1, "purchase", 1.0, "{}"),
        (4, _utc(T + 60), 2, "purchase", 1.0, "{}"),
        (5, _utc(T + 120), 2, "view", 1.0, "{}"),
        (6, _utc(T - 8 * 86400), 3, "view", 1.0, "{}"),
        (7, _utc(T), 3, "purchase", 1.0, "{}"),
    ]
    path = str(tmp_path / "ev")
    _write_events(spark, path, rows)
    out = {r.id: (r.attributed, r.lag_s) for r in
           q_first_touch_attribution(spark, path).collect()}
    assert out == {3: (1, 100), 4: (0, None), 7: (0, None)}


def test_markov_transitions_hand_counts(spark, tmp_path):
    """user 1 sequence view→click→click: transitions (view,click) and
    (click,click); user 2 click→view: (click,view). From 'click' the
    next is click or view, 1 each → 500000 ppm."""
    from big_data_traffict_prediction_spark.operators.windows import (
        q_markov_transitions,
    )

    T = NOW_EPOCH - 86400
    rows = [
        (1, _utc(T), 1, "view", 1.0, "{}"),
        (2, _utc(T + 10), 1, "click", 1.0, "{}"),
        (3, _utc(T + 20), 1, "click", 1.0, "{}"),
        (4, _utc(T), 2, "click", 1.0, "{}"),
        (5, _utc(T + 10), 2, "view", 1.0, "{}"),
    ]
    path = str(tmp_path / "ev")
    _write_events(spark, path, rows)
    out = {(r.prev_type, r.next_type): (r.n, r.p_ppm) for r in
           q_markov_transitions(spark, path).collect()}
    assert out == {
        ("view", "click"): (1, 1_000_000),
        ("click", "click"): (1, 500_000),
        ("click", "view"): (1, 500_000),
    }


def test_trending_decay_recency_beats_history(spark):
    """A camera with all its volume yesterday must outrank a camera
    with more TOTAL volume spread over old days — the decay property
    itself — and the shift-weight algebra must match a hand fold."""
    import datetime

    from big_data_traffict_prediction_spark.compat import NOW_EPOCH
    from big_data_traffict_prediction_spark.operators import timeseries as TS

    def at_age(days):
        return datetime.datetime.utcfromtimestamp(
            NOW_EPOCH - days * 86400 - 3600
        )

    rows = [
        # "fresh": 10 vehicles at age 0 (score 10 * 2^13)
        (1, "fresh", at_age(0), 10),
        # "stale": 60 vehicles at age 12 (score 60 * 2^1) — 6x total,
        # far below fresh after decay
        (2, "stale", at_age(12), 60),
        (3, "both", at_age(0), 1),
        (4, "both", at_age(12), 1),
    ]
    df = spark.createDataFrame(
        rows, "id long, camera_id string, ts timestamp, new_count long"
    )
    orig = TS.traffic_history
    TS.traffic_history = lambda s, d: df
    try:
        out = {r.camera_id: r for r in TS.q_trending_decay(spark, "x").collect()}
    finally:
        TS.traffic_history = orig
    D = TS.TREND_DAYS
    assert out["fresh"].decay_score == 10 * (1 << (D - 1))
    assert out["stale"].decay_score == 60 * (1 << (D - 13))
    assert out["fresh"].decay_score > out["stale"].decay_score
    assert out["both"].decay_score == (1 << (D - 1)) + (1 << (D - 13))
    assert out["both"].n_days == 2 and out["both"].total_count == 2


def test_trending_decay_boundary_second_is_excluded(spark):
    """An event in the window's FIRST second would floor to age ==
    TREND_DAYS and a negative shift (both engines fault); the filter
    must exclude it while keeping the next second (age 13)."""
    import datetime

    from big_data_traffict_prediction_spark.compat import NOW_EPOCH
    from big_data_traffict_prediction_spark.operators import timeseries as TS

    D = TS.TREND_DAYS
    start = NOW_EPOCH - D * 86400
    rows = [
        # inside the boundary second -> would be age D, must be dropped
        (1, "edge", datetime.datetime.utcfromtimestamp(start) +
         datetime.timedelta(microseconds=500_000), 5),
        # first full second of the window -> age D-1, weight 2^0
        (2, "edge", datetime.datetime.utcfromtimestamp(start + 1), 7),
    ]
    df = spark.createDataFrame(
        rows, "id long, camera_id string, ts timestamp, new_count long"
    )
    orig = TS.traffic_history
    TS.traffic_history = lambda s, d: df
    try:
        out = {r.camera_id: r for r in TS.q_trending_decay(spark, "x").collect()}
    finally:
        TS.traffic_history = orig
    assert out["edge"].n_events == 1  # the boundary row is excluded
    assert out["edge"].decay_score == 7  # age D-1 -> weight 2^0
