"""Behavioral tests for the analytics ops: planted anomaly detection
and Pearson-r bounds/sanity."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from big_data_traffict_prediction_spark.operators.analytics import (
    q_anomaly_zscore,
    q_profile_correlation,
)


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{path}/events.parquet")


def test_zscore_flags_planted_spike(spark, tmp_path):
    """Camera 1 sees 10 cars at 08:00 on nine days and 200 on the
    tenth: only the spike day flags, with a large positive z."""
    rows = []
    eid = 0
    for day in range(1, 11):
        val = 200.0 if day == 10 else 10.0
        rows.append(
            (eid, datetime(2024, 3, day, 8, 30), 1, "click", val, "{}")
        )
        eid += 1
    path = str(tmp_path / "ev")
    _write_events(spark, path, rows)
    out = q_anomaly_zscore(spark, path).collect()
    assert len(out) == 1
    r = out[0]
    assert r.camera_id == "1" and r.hour == 8
    assert r.day_ts == datetime(2024, 3, 10)
    assert r.zscore > 2.0 and r.baseline_days == 10


def test_profile_correlation_bounds_and_self_similarity(spark, tmp_path):
    """Two cameras with proportional profiles correlate at exactly 1;
    a third anti-phase camera correlates negatively with both; every r
    stays within [-1, 1]."""
    rows = []
    eid = 0
    for h in range(6):
        base = [5, 10, 20, 15, 8, 3][h]
        for day in (1, 2):
            rows.append((eid, datetime(2024, 3, day, h), 1, "click", float(base), "{}")); eid += 1
            rows.append((eid, datetime(2024, 3, day, h), 2, "click", float(base * 3), "{}")); eid += 1
            rows.append((eid, datetime(2024, 3, day, h), 3, "click", float(25 - base), "{}")); eid += 1
    path = str(tmp_path / "ev")
    _write_events(spark, path, rows)
    out = {(r.cam_a, r.cam_b): r.pearson_r for r in q_profile_correlation(spark, path).collect()}
    assert set(out) == {("1", "2"), ("1", "3"), ("2", "3")}
    assert out[("1", "2")] == 1.0
    assert out[("1", "3")] < -0.9 and out[("2", "3")] < -0.9
    assert all(-1.0 <= v <= 1.0 for v in out.values())


def test_histogram_quantile_equals_percentile_disc(spark, sf_dir):
    """The histogram inverse-CDF pick (smallest value with cumulative
    count ≥ ceil(p·n)) must equal Spark's own percentile_disc on every
    camera — the definitional equivalence the oracle relies on."""
    from big_data_traffict_prediction_spark.operators.analytics import (
        q_approx_quantile,
    )
    from big_data_traffict_prediction_spark.tables import traffic_history

    got = {r.camera_id: r for r in q_approx_quantile(spark, sf_dir).collect()}
    exact = (
        traffic_history(spark, sf_dir)
        .groupBy("camera_id")
        .agg(
            F.expr(
                "percentile_disc(array(0.5,0.9,0.99))"
                " WITHIN GROUP (ORDER BY new_count)"
            ).alias("e")
        )
        .collect()
    )
    assert got
    for r in exact:
        g = got[r.camera_id]
        assert (g.p50, g.p90, g.p99) == tuple(r.e), (r.camera_id, g, r.e)


def test_skyline_keeps_nondominated_only(spark, tmp_path):
    """cam1 (total 100, peak 90), cam2 (90, 85), cam3 (80, 72): peaks
    fall strictly as totals fall, so nobody is both busier and
    smoother — all three are the skyline."""
    from datetime import datetime

    from big_data_traffict_prediction_spark.operators.analytics import q_skyline_pareto

    rows, eid = [], 0
    for cam, samples in ((1, [90.0, 10.9]), (2, [85.0, 5.2]), (3, [72.0, 8.3])):
        for k, v in enumerate(samples):
            rows.append((eid, datetime(2024, 1, 10, 8, k), cam, "click", v, "{}"))
            eid += 1
    path = str(tmp_path / "ev")
    _write_events(spark, path, rows)
    out = {r.camera_id: (r.total, r.peak) for r in q_skyline_pareto(spark, path).collect()}
    assert out == {"1": (100, 90), "2": (90, 85), "3": (80, 72)}


def test_skyline_drops_dominated_camera(spark, tmp_path):
    """cam1 (total 100, peak 50), cam2 (total 90, peak 40),
    cam3 (total 80, peak 45): cam3 is dominated by cam2."""
    from datetime import datetime

    from big_data_traffict_prediction_spark.operators.analytics import q_skyline_pareto

    plant = {1: [50.0, 50.9], 2: [40.0, 40.2, 10.3], 3: [45.0, 35.3]}
    rows, eid = [], 0
    for cam, samples in plant.items():
        for k, v in enumerate(samples):
            rows.append((eid, datetime(2024, 1, 10, 8, k), cam, "click", v, "{}"))
            eid += 1
    path = str(tmp_path / "ev")
    _write_events(spark, path, rows)
    out = {r.camera_id for r in q_skyline_pareto(spark, path).collect()}
    assert out == {"1", "2"}


def test_embedding_centroids_hand_mean(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_traffict_prediction_spark.functions.similarity import (
        q_embedding_centroids,
    )

    tbl = pa.table(
        {
            "vec_id": pa.array([1, 2, 3], pa.int64()),
            "embedding": pa.array(
                [[1.0, -2.0], [3.0, -4.0], [10.0, 10.0]],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0, 0, 1], pa.int32()),
        }
    )
    emb_dir = tmp_path / "emb"
    emb_dir.mkdir()
    path = str(emb_dir)
    pq.write_table(tbl, f"{path}/embeddings.parquet")
    out = {r.label: (r.n_vectors, r.centroid_fp) for r in
           q_embedding_centroids(spark, path).collect()}
    # fixed-point CSV: component * CENTROID_SCALE (1e6), comma-joined
    assert out[0] == (2, "2000000,-3000000")
    assert out[1] == (1, "10000000,10000000")


def test_rising_streaks_hand_planted(spark, tmp_path):
    """cam 1: 1,2,3,2,5,6,7,8 → runs [1,2,3] (len 3) and [2,5,6,7,8]
    (len 5); cam 2: 4,4,4 → no strictly-rising run ≥ 3."""
    from datetime import datetime

    from big_data_traffict_prediction_spark.operators.analytics import q_rising_streaks

    plant = {1: [1, 2, 3, 2, 5, 6, 7, 8], 2: [4, 4, 4]}
    rows, eid = [], 0
    for cam, vals in plant.items():
        for k, v in enumerate(vals):
            rows.append((eid, datetime(2024, 1, 10, 8, k), cam, "click", float(v) + 0.2, "{}"))
            eid += 1
    path = str(tmp_path / "ev")
    _write_events(spark, path, rows)
    out = [(r.camera_id, r.run_len, r.from_count, r.to_count)
           for r in q_rising_streaks(spark, path).collect()]
    assert out == [("1", 3, 1, 3), ("1", 5, 2, 8)]


def test_zorder_key_interleaves_bits(spark, tmp_path):
    """cam 3 (bits 11) at epoch-hour 1 (bit 1): spread(3)=0b101,
    spread(1)<<1=0b10 → zkey 0b111 = 7."""
    from datetime import datetime, timezone

    from big_data_traffict_prediction_spark.operators.reshape import q_zorder_key

    ts = datetime.fromtimestamp(3600, tz=timezone.utc).replace(tzinfo=None)
    _write_events(spark, str(tmp_path / "ev"), [(1, ts, 3, "click", 1.0, "{}")])
    r = q_zorder_key(spark, str(tmp_path / "ev")).collect()
    assert len(r) == 1
    assert (r[0].camera_id, r[0].epoch_hour, r[0].zkey) == ("3", 1, 7)


def test_similar_days_finds_planted_twin(spark, tmp_path):
    """Camera 2 replays the reference profile exactly (d2=0); camera 3
    differs by 2 vehicles in one hour (d2=4)."""
    from datetime import datetime

    from big_data_traffict_prediction_spark.operators.analytics import (
        SIMILAR_REF_DAY,
        q_similar_days,
    )

    y, m, d = (int(x) for x in SIMILAR_REF_DAY.split("-"))
    rows, eid = [], 0
    for h, v in ((8, 5), (9, 12), (10, 7)):
        rows.append((eid, datetime(y, m, d, h), 1, "click", float(v) + 0.1, "{}")); eid += 1
        rows.append((eid, datetime(y, m, d - 3, h), 2, "click", float(v) + 0.4, "{}")); eid += 1
        off = 2 if h == 9 else 0
        rows.append((eid, datetime(y, m, d - 5, h), 3, "click", float(v + off) + 0.2, "{}")); eid += 1
    path = str(tmp_path / "ev")
    _write_events(spark, path, rows)
    out = [(r.camera_id, r.d2) for r in q_similar_days(spark, path).collect()]
    assert out[0] == ("2", 0)
    assert ("3", 4) in out


def test_cusum_flags_planted_drift_only(spark, tmp_path):
    """cam 1 steps from 100/day to 500/day mid-series → sustained
    positive drift accumulates past 3μ and breaches; cam 2 is flat →
    CUSUM never leaves zero."""
    from datetime import datetime

    from big_data_traffict_prediction_spark.operators.timeseries import (
        q_cusum_changepoints,
    )

    rows, eid = [], 0
    for day in range(1, 21):
        v1 = 100.0 if day <= 10 else 500.0
        rows.append((eid, datetime(2024, 1, day, 12), 1, "click", v1 + 0.3, "{}")); eid += 1
        rows.append((eid, datetime(2024, 1, day, 12), 2, "click", 100.3, "{}")); eid += 1
    path = str(tmp_path / "ev")
    _write_events(spark, path, rows)
    out = {r.camera_id: r for r in q_cusum_changepoints(spark, path).collect()}
    assert out["1"].is_breach == 1
    assert out["1"].first_breach_day is not None and out["1"].first_breach_day > "2024-01-10"
    assert out["2"].is_breach == 0 and out["2"].max_cusum_scaled == 0


def test_global_ntile_matches_window_ntile(spark):
    """The distributed closed-form ntile must be row-for-row identical
    to the single-partition window ntile — checked for several bucket
    counts, with heavy value ties and a unique tie-break, including
    the n_rows < n_buckets edge."""
    from pyspark.sql import Window

    from big_data_traffict_prediction_spark.operators.analytics import _global_ntile

    for size, buckets in [(257, 5), (100, 4), (64, 10), (3, 5), (1, 5)]:
        data = [(i, (i * 37) % 11) for i in range(size)]  # many ties
        df = spark.createDataFrame(data, ["id", "v"])
        got = {
            r.id: r.b
            for r in _global_ntile(
                df, [F.asc("v"), F.asc("id")], "b", n=buckets
            ).collect()
        }
        exp = {
            r.id: r.b
            for r in df.select(
                "id",
                F.ntile(buckets).over(Window.orderBy("v", "id")).alias("b"),
            ).collect()
        }
        assert got == exp, f"size={size} buckets={buckets}"


def test_global_rank_prefix_sum_matches_window(spark):
    """global_rank's _rk/_cum/_tot must equal the windowed
    row_number/running-sum/grand-total on the same ordering."""
    from pyspark.sql import Window

    from big_data_traffict_prediction_spark.compat import global_rank

    data = [(i, (i * 13) % 7, (i * 5) % 23 + 1) for i in range(311)]
    df = spark.createDataFrame(data, ["id", "v", "w"])
    ranked = global_rank(df, [F.desc("v"), F.asc("id")], sum_col="w")
    got = {(r.id): (r._rk, r._cum, r._tot, r._n) for r in ranked.collect()}
    wo = Window.orderBy(F.desc("v"), F.asc("id"))
    exp_df = df.select(
        "id",
        F.row_number().over(wo).alias("rk"),
        F.sum("w").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("w").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("tot"),
        F.count(F.lit(1)).over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    exp = {r.id: (r.rk, r.cum, r.tot, r.n) for r in exp_df.collect()}
    assert got == exp


def test_skyline_matches_bruteforce_on_random_points(spark, tmp_path):
    """Property: the distributed prefix-min skyline equals the O(n²)
    dominance definition on random cameras with HEAVY ties on both
    axes (ties are where the tie-collapse + strict-prefix logic can
    silently go wrong)."""
    import random

    from big_data_traffict_prediction_spark.operators.analytics import q_skyline_pareto

    rng = random.Random(99)
    rows, eid = [], 0
    truth: dict[int, tuple[int, int]] = {}
    for cam in range(1, 61):
        # small domains → many (total, peak) collisions
        n_obs = rng.randint(1, 4)
        vals = [rng.choice([3, 5, 8, 13]) for _ in range(n_obs)]
        for i, v in enumerate(vals):
            rows.append(
                (eid, datetime(2024, 5, 1 + i, 9), cam, "click", float(v), "{}")
            )
            eid += 1
        truth[cam] = (sum(vals), max(vals))
    path = str(tmp_path / "ev")
    _write_events(spark, path, rows)

    expected = {
        str(c)
        for c, (t, p) in truth.items()
        if not any(
            (t2 >= t and p2 <= p and (t2 > t or p2 < p))
            for c2, (t2, p2) in truth.items()
            if c2 != c
        )
    }
    got = {r.camera_id for r in q_skyline_pareto(spark, path).collect()}
    assert got == expected


def test_cdc_merge_branches_and_state(spark, oracle_sf_dir):
    """All five MERGE actions fire at sf0.01 (the oracle SF — the
    smoke SF only has 3), and the merged state obeys the semantics:
    insert/update carry the feed value, keep carries the target
    value, delete/delete_miss leave no state."""
    from big_data_traffict_prediction_spark.operators.joins import q_cdc_merge

    rows = q_cdc_merge(spark, oracle_sf_dir).collect()
    by_action: dict[str, list] = {}
    for r in rows:
        by_action.setdefault(r.action, []).append(r)
    assert set(by_action) == {"insert", "update", "delete", "delete_miss", "keep"}
    for r in rows:
        if r.action == "insert":
            assert r.old_cnt is None and r.merged_cnt == r.feed_cnt > 0
        elif r.action == "update":
            assert r.old_cnt is not None and r.merged_cnt == r.feed_cnt > 0
        elif r.action == "keep":
            assert r.feed_cnt is None and r.merged_cnt == r.old_cnt
        elif r.action == "delete":
            assert r.old_cnt is not None and r.feed_cnt == 0
            assert r.merged_cnt is None
        else:  # delete_miss
            assert r.old_cnt is None and r.feed_cnt == 0
            assert r.merged_cnt is None
    # keys unique after merge (it is a table state, not a log)
    keys = [(r.camera_id, r.event_type) for r in rows]
    assert len(keys) == len(set(keys))


def test_zone_map_probes_fire(spark, oracle_sf_dir):
    """Both pruning decisions must actually skip zones at the oracle
    SF — a grain change that saturates the bloom (e.g. day-level zones
    with 150 cameras over 62 bits) would silently make the index
    useless while still hash-matching."""
    from big_data_traffict_prediction_spark.operators.scans import q_zone_map_stats

    rows = q_zone_map_stats(spark, oracle_sf_dir).collect()
    assert sum(r.skip_for_camera for r in rows) > 0
    assert sum(r.skip_for_range for r in rows) > 0
    # a skip decision must never be wrong: skipped zones where the
    # probe camera hashed into the bloom would be data loss — checked
    # by construction here (bloom has no false negatives)
    probe_rows = sum(not r.skip_for_camera for r in rows)
    assert probe_rows > 0  # probe camera does exist in some zones


def test_compaction_plan_bins_are_sound(spark, oracle_sf_dir):
    """Greedy exclusive-prefix packing invariants: bin ids are dense
    from 0 within each day, every bin except possibly the last holds
    at least the target MINUS one chunk (no premature bin break), and
    no bin exceeds target + its largest single chunk (a chunk may
    straddle the boundary, nothing else may)."""
    from collections import defaultdict

    from big_data_traffict_prediction_spark.operators.reshape import (
        COMPACT_TARGET_BYTES,
        q_compaction_plan,
    )

    rows = q_compaction_plan(spark, oracle_sf_dir).collect()
    by_day = defaultdict(lambda: defaultdict(list))
    for r in rows:
        by_day[r.d][r.bin_id].append(r.chunk_bytes)
    assert any(len(bins) > 1 for bins in by_day.values())  # packing fires
    for d, bins in by_day.items():
        assert sorted(bins) == list(range(len(bins))), d  # dense ids
        for b, sizes in bins.items():
            fill = sum(sizes)
            assert fill <= COMPACT_TARGET_BYTES + max(sizes), (d, b)
            if b < len(bins) - 1:
                # the NEXT chunk started a new bin only because the
                # prefix crossed the target
                assert fill >= COMPACT_TARGET_BYTES - max(sizes), (d, b)


def test_compaction_plan_dense_bins_with_oversized_chunk(spark):
    """A single chunk larger than 2x the target used to skip bin ids
    (floor of the prefix jumps by >1); the dense-rank derivation keeps
    ids dense and day_bins honest regardless of chunk size."""
    from big_data_traffict_prediction_spark.operators.reshape import (
        COMPACT_TARGET_BYTES,
        pack_chunks_into_bins,
    )

    t = COMPACT_TARGET_BYTES
    chunks = spark.createDataFrame(
        [
            ("2024-01-01", "1", t // 2),
            ("2024-01-01", "2", 3 * t),  # oversized: floor jumps by 3
            ("2024-01-01", "3", t // 2),
            ("2024-01-01", "4", t // 2),
        ],
        "d string, camera_id string, chunk_bytes long",
    )
    rows = {r.camera_id: r for r in pack_chunks_into_bins(chunks).collect()}
    ids = sorted({r.bin_id for r in rows.values()})
    assert ids == list(range(len(ids)))  # dense, no holes
    assert rows["1"].bin_id == 0 and rows["2"].bin_id == 0
    assert rows["3"].bin_id == 1  # prefix t/2+3t crosses; next dense id
    assert all(r.day_bins == len(ids) for r in rows.values())


def test_scd2_intervals_tile_per_camera(spark, oracle_sf_dir):
    """SCD-2 invariants: versions are dense from 1, consecutive
    intervals tile exactly (valid_to == next valid_from), exactly one
    current (open) interval per camera, and adjacent versions always
    change state."""
    from collections import defaultdict

    from big_data_traffict_prediction_spark.operators.windows import q_scd2_build

    rows = q_scd2_build(spark, oracle_sf_dir).collect()
    by_cam = defaultdict(list)
    for r in rows:
        by_cam[r.camera_id].append(r)
    assert by_cam
    for cam, vs in by_cam.items():
        vs.sort(key=lambda r: r.version)
        assert [r.version for r in vs] == list(range(1, len(vs) + 1)), cam
        assert sum(r.is_current for r in vs) == 1 and vs[-1].is_current, cam
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to == b.valid_from, cam
            assert a.state != b.state, cam
        assert all(r.n_versions == len(vs) for r in vs), cam


def test_join_size_sketch_never_underestimates(spark, oracle_sf_dir):
    """CM inner product only ADDS on collisions: estimate >= exact,
    and with 150 keys over 4x512 cells the relative error stays well
    under the 1/width analytical bound's practical envelope."""
    from big_data_traffict_prediction_spark.operators.tsdb import (
        q_join_size_sketch,
    )

    r = q_join_size_sketch(spark, oracle_sf_dir).collect()[0]
    assert r.exact_pairs > 0 and r.n_keys > 0
    assert r.cm_estimate >= r.exact_pairs
    assert r.overcount == r.cm_estimate - r.exact_pairs
    assert r.over_ppm < 600_000, r  # < 60% over — collisions, not junk


def test_join_size_mcv_beats_uniform_on_skew(spark, oracle_sf_dir):
    """The MCV estimator's reason to exist: testdata cameras are
    near-uniform (uniform stats already land within ~1%), so the
    ordering that matters is pinned on a PLANTED skewed fleet — one
    camera amplified 512x (the AQE skew fixture shape). There the
    uniform estimate collapses (it spreads the hot key's mass over
    every key: err > 50%) while the end-biased histogram keeps the hot
    key as an exact singleton bucket and stays ppm-accurate."""
    from pyspark.sql import functions as F

    from big_data_traffict_prediction_spark.operators.tsdb import (
        am_pm_sides,
        join_size_estimates,
    )

    pk = (
        am_pm_sides(spark, oracle_sf_dir)
        .groupBy("camera_id")
        .agg(F.sum("am").alias("na"), F.sum("pm").alias("npm"))
    )
    c0 = pk.agg(F.min("camera_id")).collect()[0][0]
    hot = F.col("camera_id") == c0
    skewed = pk.select(
        "camera_id",
        F.when(hot, F.col("na") * 512).otherwise(F.col("na")).alias("na"),
        F.when(hot, F.col("npm") * 512).otherwise(F.col("npm")).alias("npm"),
    )
    r = join_size_estimates(skewed).collect()[0]
    assert r.exact_pairs > 0
    err_u = abs(r.est_uniform - r.exact_pairs) / r.exact_pairs
    err_m = abs(r.est_mcv - r.exact_pairs) / r.exact_pairs
    assert err_u > 0.5, (err_u, r)  # uniform misses the skewed mass
    assert err_m < 0.001, (err_m, r)  # MCV keeps the hot key exact
    # and on the UNSKEWED fleet both estimators sit within ~1%
    u = join_size_estimates(pk).collect()[0]
    assert abs(u.est_uniform - u.exact_pairs) <= u.exact_pairs * 0.01
    assert abs(u.est_mcv - u.exact_pairs) <= u.exact_pairs * 0.01


def test_conjunction_corr_beats_avi_on_planted(spark):
    """The regime q_selectivity_conjunction exists for: values strongly
    correlated with time (in-window rows carry [100,250], out-of-window
    rows [0,99]) make sel_value track sel_time, so the AVI product
    double-counts the restriction and lands near HALF the true count —
    while the 2-D zone×measure cells read the joint distribution and
    stay within the sketch's boundary-bucket error."""
    from pyspark.sql import functions as F

    from big_data_traffict_prediction_spark.operators.scans import (
        SEL_T1,
        SEL_T2,
        conj_sel_estimates,
    )

    n = 4000
    week = SEL_T2 - SEL_T1
    planted = (
        spark.range(n)
        .select(
            F.when(
                F.col("id") % 2 == 0,
                F.lit(SEL_T1) + F.pmod(F.col("id") * 3600, F.lit(week)),
            )
            .otherwise(
                F.lit(SEL_T1 - week) + F.pmod(F.col("id") * 3600, F.lit(week))
            )
            .alias("es"),
            F.when(F.col("id") % 2 == 0, F.lit(100) + F.col("id") % 151)
            .otherwise(F.col("id") % 100)
            .cast("long")
            .alias("new_count"),
            F.lit("click").alias("event_type"),
        )
        .select(F.timestamp_seconds("es").alias("ts"), "new_count", "event_type")
    )
    r = conj_sel_estimates(spark, planted).collect()[0]
    assert r.exact_rows == n // 2, r
    err_avi = abs(r.est_avi - r.exact_rows) / r.exact_rows
    err_corr = abs(r.est_corr - r.exact_rows) / r.exact_rows
    assert err_avi > 0.4, r  # AVI halves the count under correlation
    assert err_corr < 0.1, r  # 2-D cells: boundary-bucket error only
    assert err_corr * 4 < err_avi, r


def test_zone_map_merge_equals_full_rebuild(spark, oracle_sf_dir):
    """The incremental-equals-rebuild theorem for zone maps: merging
    the base index with the late-batch delta must reproduce the full
    build's stats exactly on every mergeable column (the full build
    additionally carries the non-mergeable COUNT(DISTINCT), which the
    merge deliberately omits)."""
    from big_data_traffict_prediction_spark.operators.scans import (
        q_zone_map_merge,
        q_zone_map_stats,
    )

    cols = ["d", "hr", "n_rows", "min_count", "max_count", "bloom_fp"]
    merged = {
        (r.d, r.hr): r for r in q_zone_map_merge(spark, oracle_sf_dir).collect()
    }
    full = {
        (r.d, r.hr): r for r in q_zone_map_stats(spark, oracle_sf_dir).collect()
    }
    assert merged.keys() == full.keys() and merged
    for k, m in merged.items():
        f = full[k]
        for c in cols:
            assert getattr(m, c) == getattr(f, c), (k, c)
    acts = {r.action for r in merged.values()}
    assert "update" in acts  # the delta really merged into existing zones


def test_scd2_apply_planted_scenarios(spark):
    """Edge coverage the real feed may not draw every round: a camera
    untouched by the delta, a camera whose delta never changes band, a
    camera whose delta both closes the open interval and appends, and
    a camera born in the delta."""
    import datetime

    from big_data_traffict_prediction_spark.operators import windows as W

    t1 = datetime.datetime.utcfromtimestamp(W.SCD2_APPLY_T1)
    day = datetime.timedelta(days=1)
    B = W.SCD2_BAND
    rows = []  # (id, camera_id, ts, new_count)
    # cam "a": base only (2 versions), no delta rows -> untouched
    rows += [(1, "a", t1 - 9 * day, 0), (2, "a", t1 - 8 * day, B)]
    # cam "b": base 1 version, delta rows in the SAME band -> untouched
    rows += [(3, "b", t1 - 9 * day, B), (4, "b", t1 + day, B + 1)]
    # cam "c": base 1 version, delta changes band twice -> close + 2 new
    rows += [
        (5, "c", t1 - 9 * day, 0),
        (6, "c", t1 + day, B),
        (7, "c", t1 + 2 * day, 2 * B),
    ]
    # cam "d": born in the delta, one band change
    rows += [(8, "d", t1 + day, 0), (9, "d", t1 + 2 * day, B)]
    df = spark.createDataFrame(
        [(i, c, ts, n) for i, c, ts, n in rows],
        "id long, camera_id string, ts timestamp, new_count long",
    )
    import big_data_traffict_prediction_spark.tables as tables

    orig = tables.traffic_history
    tables.traffic_history = lambda s, d: df
    W.traffic_history = tables.traffic_history
    try:
        out = {
            (r.camera_id, r.version): r
            for r in W.q_scd2_apply(spark, "ignored").collect()
        }
    finally:
        tables.traffic_history = orig
        W.traffic_history = orig
    # a: untouched, still current on version 2
    assert out[("a", 2)].is_current and out[("a", 2)].n_versions == 2
    assert out[("a", 1)].valid_to == out[("a", 2)].valid_from
    # b: same band throughout -> one version, still open
    assert out[("b", 1)].is_current and out[("b", 1)].n_versions == 1
    # c: base interval closed AT the first delta change, two appended
    assert not out[("c", 1)].is_current
    assert out[("c", 1)].valid_to == t1 + day
    assert out[("c", 2)].state == 1 and out[("c", 3)].state == 2
    assert out[("c", 3)].is_current and out[("c", 3)].n_versions == 3
    # d: born in the delta with its own version chain
    assert out[("d", 1)].valid_to == out[("d", 2)].valid_from
    assert out[("d", 2)].is_current and out[("d", 2)].n_versions == 2
    assert len(out) == 8


def test_drift_tvd_planted_bounds(spark):
    """A camera replaying its reference distribution drifts 0 ppm; a
    camera whose current week lands entirely in new buckets drifts the
    full 1,000,000 ppm; a half-shifted camera lands at 500,000."""
    import datetime

    from big_data_traffict_prediction_spark.operators import analytics as A

    a1 = datetime.datetime.utcfromtimestamp(A.DRIFT_A1)
    b1 = datetime.datetime.utcfromtimestamp(A.DRIFT_B1)
    B = A.DRIFT_BUCKET
    rows = []
    rid = 0

    def add(cam, when, count):
        nonlocal rid
        rows.append((rid, cam, when, count))
        rid += 1

    hour = datetime.timedelta(hours=1)
    for k in range(4):  # cam "same": identical band histograms
        add("same", a1 + k * hour, (k % 2) * B)
        add("same", b1 + k * hour, (k % 2) * B)
    for k in range(4):  # cam "flip": disjoint bands
        add("flip", a1 + k * hour, 0)
        add("flip", b1 + k * hour, 5 * B)
    for k in range(4):  # cam "half": half the mass moves
        add("half", a1 + k * hour, 0)
        add("half", b1 + k * hour, (k % 2) * 5 * B)
    df = spark.createDataFrame(
        rows, "id long, camera_id string, ts timestamp, new_count long"
    )
    orig = A.traffic_history
    A.traffic_history = lambda s, d: df
    try:
        out = {r.camera_id: r for r in A.q_drift_tvd(spark, "ignored").collect()}
    finally:
        A.traffic_history = orig
    assert out["same"].tvd_ppm == 0
    assert out["flip"].tvd_ppm == 1000000
    assert out["half"].tvd_ppm == 500000
    assert all(r.n_a == 4 and r.n_b == 4 for r in out.values())


def test_ann_ivf_delta_planted_assignment(spark, tmp_path):
    """Delta vectors pointing at a known base seed's direction must
    land in that seed's cell with a positive fit; the stored quantizer
    (base seeds) must not move when the delta arrives."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_traffict_prediction_spark.functions.similarity import (
        q_ann_ivf_delta,
    )

    dim = 8
    def unit(k):
        v = [0.0] * dim
        v[k] = 1.0
        return v

    # ids 0..11 base (split = (15*4)//5 = 12), 12..14 delta;
    # stride = max(12//8, 1) = 1 -> seeds are ids 0..7 = 8 axis units
    rows = [unit(i) for i in range(8)]          # seeds: distinct axes
    rows += [unit(0), unit(0), unit(5), unit(5)]  # base bulk
    rows += [unit(5), unit(5), unit(5)]           # delta: all near seed 5
    tbl = pa.table(
        {
            "vec_id": pa.array(range(15), pa.int64()),
            "embedding": pa.array(rows, pa.list_(pa.float32())),
            "label": pa.array([0] * 15, pa.int32()),
        }
    )
    d = tmp_path / "emb"
    d.mkdir()
    pq.write_table(tbl, f"{d}/embeddings.parquet")
    out = {r.cell: r for r in q_ann_ivf_delta(spark, str(d)).collect()}
    assert out[5].delta_n == 3 and out[5].delta_fit_fp > 0
    assert sum(r.delta_n for r in out.values()) == 3
    assert sum(r.base_n for r in out.values()) == 12
    assert out[0].base_n == 3 and out[5].base_n == 3  # seed + 2 bulk each
    assert sum(r.share_ppm for r in out.values()) <= 1000000


def test_selectivity_estimate_prunes_and_bounds(spark, oracle_sf_dir):
    """Pruning counts must nest (scanned <= in-range <= total), the
    estimate must be non-vacuous and within the uniform-assumption
    envelope (under 5x of truth on this corpus), and a zero-overlap
    measure range must skip every zone."""
    from big_data_traffict_prediction_spark.operators.scans import (
        q_selectivity_estimate,
    )

    r = q_selectivity_estimate(spark, oracle_sf_dir).first()
    assert r.zones_scanned <= r.zones_in_range <= r.zones_total
    assert r.zones_in_range > 0 and r.exact_rows > 0 and r.est_rows > 0
    assert r.est_rows <= 5 * r.exact_rows  # uniform-assumption envelope
    assert r.err_ppm == abs(r.est_rows - r.exact_rows) * 1_000_000 // max(
        r.exact_rows, 1
    )


def test_clustering_depth_zorder_beats_ingest(spark, oracle_sf_dir):
    """The number that justifies OPTIMIZE ZORDER: a camera point probe
    under the ingest layout touches ~every file (cameras interleave in
    time), while the z-ordered layout's camera locality lets the same
    zone-map stats skip a large fraction."""
    from big_data_traffict_prediction_spark.operators.reshape import (
        q_clustering_depth,
    )

    rows = {r.layout: r for r in q_clustering_depth(spark, oracle_sf_dir).collect()}
    assert set(rows) == {"ingest", "zorder"}
    ing, zo = rows["ingest"], rows["zorder"]
    assert ing.n_cameras == zo.n_cameras and ing.n_files == zo.n_files == 64
    assert ing.scan_ppm > 900_000  # ingest order: camera in ~every file
    assert zo.scan_ppm < ing.scan_ppm * 7 // 10  # z-order locality wins


def test_histogram_stats_is_exact_equi_depth(spark, oracle_sf_dir):
    """Equi-depth exactness: bucket b holds EXACTLY ranks
    [b*n//B, (b+1)*n//B) — the value-frequency overlap construction
    must reproduce that mass split bit for bit (ties straddle buckets
    by rank, never by luck) — and bounds must tile monotonically."""
    from pyspark.sql import functions as F

    from big_data_traffict_prediction_spark.operators.scans import (
        HIST_BUCKETS,
        q_histogram_stats,
    )
    from big_data_traffict_prediction_spark.tables import traffic_history

    rows = sorted(q_histogram_stats(spark, oracle_sf_dir).collect(),
                  key=lambda r: r.bucket)
    n = (
        traffic_history(spark, oracle_sf_dir)
        .filter(F.col("new_count").isNotNull())
        .count()
    )
    assert sum(r.n_rows for r in rows) == n
    assert [r.bucket for r in rows] == list(range(HIST_BUCKETS))
    for r in rows:
        expected = (r.bucket + 1) * n // HIST_BUCKETS - r.bucket * n // HIST_BUCKETS
        assert r.n_rows == expected, (r.bucket, r.n_rows, expected)
        assert r.lo <= r.hi and 1 <= r.ndv <= r.hi - r.lo + 1
    for a, b in zip(rows, rows[1:]):
        # bounds tile: a straddling value repeats as the next lo
        # (a.hi == b.lo); otherwise buckets are disjoint (a.hi < b.lo)
        assert a.hi <= b.lo


def test_selectivity_histogram_beats_uniform(spark, oracle_sf_dir):
    """The round-12 capability claim: on the skewed measure the
    equi-depth histogram estimator must beat zone-map-uniform
    interpolation on the SAME predicate and exact witness, and the
    shared columns must agree with q_selectivity_estimate exactly."""
    from big_data_traffict_prediction_spark.operators.scans import (
        q_selectivity_estimate,
        q_selectivity_histogram,
    )

    r = q_selectivity_histogram(spark, oracle_sf_dir).first()
    assert r.exact_rows > 0 and r.est_hist > 0
    assert r.err_hist_ppm < r.err_uniform_ppm, (
        f"histogram ({r.err_hist_ppm} ppm) must beat uniform "
        f"({r.err_uniform_ppm} ppm)"
    )
    r0 = q_selectivity_estimate(spark, oracle_sf_dir).first()
    assert r.exact_rows == r0.exact_rows
    assert r.est_uniform == r0.est_rows


def test_zone_map_merge_law_arbitrary_splits(spark, sf_dir):
    """merge(a ⊕ b ⊕ c) == rebuild(a ∪ b ∪ c) for an arbitrary 3-way
    slice of the fact, in both association orders — the algebraic law
    (associativity + identity on disjoint slices) that lets a 100 TB
    system maintain zone stats as partitions append in any order."""
    from pyspark.sql import functions as F

    from big_data_traffict_prediction_spark.operators.scans import (
        merge_zone_stats,
        zone_stat_frame,
    )
    from big_data_traffict_prediction_spark.tables import traffic_history

    h = traffic_history(spark, sf_dir)
    s = [
        zone_stat_frame(h.filter(F.pmod("id", F.lit(3)) == i)) for i in range(3)
    ]
    rebuilt = {
        (r.d, r.hr): (r.n, r.mn, r.mx, r.fp)
        for r in zone_stat_frame(h).collect()
    }
    assert rebuilt
    for merged in (
        merge_zone_stats(merge_zone_stats(s[0], s[1]), s[2]),
        merge_zone_stats(s[0], merge_zone_stats(s[1], s[2])),
    ):
        got = {(r.d, r.hr): (r.n, r.mn, r.mx, r.fp) for r in merged.collect()}
        assert got == rebuilt


def test_histogram_merge_law_arbitrary_splits(spark, sf_dir):
    """vf(⊕ of K disjoint slices) == vf(whole) — and therefore the
    derived equi-depth buckets are IDENTICAL — for arbitrary K and
    either association order: the algebraic law that lets incremental
    ANALYZE fold ingest batches into the stored histogram in any order
    (the zone-map law's twin; q_histogram_merge pins one base/delta
    split, this pins the general statement)."""
    from functools import reduce

    from pyspark.sql import functions as F

    from big_data_traffict_prediction_spark.operators.scans import (
        hist_buckets_from_vf,
        hist_value_freq,
        merge_vf,
    )
    from big_data_traffict_prediction_spark.tables import traffic_history

    h = traffic_history(spark, sf_dir)
    rebuilt = {
        r.bucket: (r.lo, r.hi, r.n_rows, r.ndv)
        for r in hist_buckets_from_vf(spark, hist_value_freq(h)).collect()
    }
    assert rebuilt
    for k in (2, 5):
        slices = [
            hist_value_freq(h.filter(F.pmod("id", F.lit(k)) == i))
            for i in range(k)
        ]
        for merged_vf in (
            reduce(merge_vf, slices),  # left fold
            reduce(lambda a, b: merge_vf(b, a), reversed(slices)),  # right fold
        ):
            got = {
                r.bucket: (r.lo, r.hi, r.n_rows, r.ndv)
                for r in hist_buckets_from_vf(spark, merged_vf).collect()
            }
            assert got == rebuilt, f"k={k}"


def test_selectivity_sketch_beats_uniform(spark, oracle_sf_dir):
    """The zone-grain sketch estimator must beat min/max-uniform on the
    shared predicate by a wide margin (no AVI assumption, per-zone
    value distribution), and its witness columns must agree with the
    other two estimator queries exactly. The sketch vs global-histogram
    comparison is deliberately NOT an inequality assert: on this corpus
    they roughly tie (17.9% vs 15.2% at sf0.01) — see the operator
    docstring for why both orders are possible."""
    from big_data_traffict_prediction_spark.operators.scans import (
        q_selectivity_estimate,
        q_selectivity_zone_sketch,
    )

    r = q_selectivity_zone_sketch(spark, oracle_sf_dir).first()
    assert r.exact_rows > 0 and r.est_sketch > 0 and r.sketch_cells > 0
    assert r.err_sketch_ppm * 3 < r.err_uniform_ppm, (
        f"sketch ({r.err_sketch_ppm} ppm) should beat uniform "
        f"({r.err_uniform_ppm} ppm) by >3x"
    )
    r0 = q_selectivity_estimate(spark, oracle_sf_dir).first()
    assert r.exact_rows == r0.exact_rows
    assert r.est_uniform == r0.est_rows


def test_zone_sketch_bounds_match_dds_upper(spark):
    """q_selectivity_zone_sketch derives bucket bounds with clamped
    shifts (the ANSI-hoisting workaround); over every REAL bucket id
    (0..3 and >= 8) they must equal pipeline's dds_upper tiling:
    up(b) == dds_upper(b) and lo(b) == dds_upper(b-1) + 1 (lo(0) = 0)."""
    from big_data_traffict_prediction_spark.operators.pipeline import (
        dds_bucket,
        dds_upper,
    )
    from big_data_traffict_prediction_spark.operators.scans import (
        zone_sketch_bounds,
    )

    # real bucket ids are exactly the image of dds_bucket
    xs = spark.range(0, 300000).select(F.col("id").alias("x"))
    buckets = xs.select(dds_bucket(F.col("x")).alias("bucket")).distinct()
    b = F.col("bucket")
    lo, up = zone_sketch_bounds()  # the query's OWN expressions
    rows = buckets.select("bucket", lo.alias("lo"), up.alias("up")).collect()
    uppers = {
        r.bucket: r.up
        for r in buckets.select("bucket", dds_upper(b).alias("up")).collect()
    }
    assert len(rows) > 20
    prev_by_bucket = {}
    for r in sorted(rows, key=lambda r: r.bucket):
        assert r.up == uppers[r.bucket], (r.bucket, r.up, uppers[r.bucket])
        prev_by_bucket[r.bucket] = r.lo
    ordered = sorted(uppers)
    for a, c in zip(ordered, ordered[1:]):
        # lo of the NEXT real bucket continues exactly after this upper
        assert prev_by_bucket[c] == uppers[a] + 1, (a, c)
    assert prev_by_bucket[ordered[0]] == 0


def test_join_order_uniform_misranks_on_planted_skew(spark):
    """The System-R uniform estimate can pick the WRONG join order
    under key skew: a hot part key makes lineitem⋈part explode while
    the per-NDV formula still divides by the full key domain — the
    mis-rank q_join_size_histogram's MCV rung exists to catch."""
    from big_data_traffict_prediction_spark.operators.tsdb import join_order_rank

    # 1000 lineitem rows: orderkeys uniform over 100; partkey 1 holds
    # 900 rows, parts 2..101 one row each (ndv_lp = 101).
    lf = spark.range(0, 1000).select(
        (F.col("id") % 100 + 1).alias("l_orderkey"),
        F.when(F.col("id") < 900, F.lit(1))
        .otherwise(F.col("id") - 900 + 2)
        .alias("l_partkey"),
    )
    of = spark.range(1, 51).select(F.col("id").alias("o_orderkey"))
    pf = spark.range(1, 2).select(F.col("id").alias("p_partkey"))
    r = join_order_rank(lf, of, pf).first()
    # uniform: est_lp = 1000*1/101 = 9 rows << est_lo = 1000*50/100 = 500
    assert r.pick_est == "part_first"
    # reality: the hot part key joins 900 rows >> the 500 order rows
    assert r.exact_part_first == 900 and r.exact_orders_first == 500
    assert r.pick_exact == "orders_first"
    assert not r.agree


def test_join_order_agrees_on_real_data(spark, oracle_sf_dir):
    """On the near-uniform testdata both estimates land within ~5% and
    est/exact agree on joining the filtered part dim first."""
    from big_data_traffict_prediction_spark.operators.tsdb import q_join_order_rank

    r = q_join_order_rank(spark, oracle_sf_dir).first()
    assert r.agree and r.pick_est == "part_first"
    assert r.err_orders_ppm < 50_000 and r.err_part_ppm < 50_000


def test_analyze_sample_calibration_grades(spark, oracle_sf_dir):
    """The three sampled statistics have three honesty grades: linear
    stats (count, fixed-point sum) land within a few percent at the
    10% sample; NDV from a sample is the documented hard case — Chao1 must
    at least beat naive linear scaling (d_obs/q) and never fall below
    what the sample directly witnessed."""
    from big_data_traffict_prediction_spark.operators.pipeline import (
        SMP_MOD,
        SMP_PERMILLE,
        q_analyze_sample,
    )

    r = q_analyze_sample(spark, oracle_sf_dir).first()
    assert r.sample_rows > 0 and r.n_exact > r.sample_rows
    assert r.err_rows_ppm < 100_000, f"count err {r.err_rows_ppm} ppm"
    assert r.err_sum_ppm < 100_000, f"sum err {r.err_sum_ppm} ppm"
    # Chao1 is a lower-bound-style estimator: above what the sample
    # directly witnessed, not wildly above the truth
    assert r.ndv_chao <= r.ndv_exact * 2
    err_chao = abs(r.ndv_chao - r.ndv_exact)
    assert err_chao * 1_000_000 // max(r.ndv_exact, 1) == r.err_ndv_ppm
    assert SMP_MOD // SMP_PERMILLE == 10  # 10% sample wiring


def test_bloom_skipping_matrix(spark, oracle_sf_dir):
    """The index-x-layout decision matrix: min/max degrades on the
    hash-bucketed layout (wide random [min,max] spans) where bloom
    prunes hard; on the camera-sorted range layout min/max is exact
    (zero false positives). No index ever produces a false negative
    (scanned >= true everywhere)."""
    from big_data_traffict_prediction_spark.operators.reshape import (
        q_bloom_skipping_eval,
    )

    rows = {
        (r.layout, r.idx): r
        for r in q_bloom_skipping_eval(spark, oracle_sf_dir).collect()
    }
    assert set(rows) == {
        ("bucket", "minmax"),
        ("bucket", "bloom"),
        ("range", "minmax"),
        ("range", "bloom"),
    }
    for r in rows.values():
        assert r.scanned_pairs >= r.true_pairs, r  # no false negatives
        assert r.fp_pairs == r.scanned_pairs - r.true_pairs
    # hash layout: range stats degrade, bloom is the working index
    assert (
        rows[("bucket", "bloom")].scan_ppm * 4
        < rows[("bucket", "minmax")].scan_ppm
    )
    # range-clustered layout: min/max is exact and beats bloom's FPs
    assert rows[("range", "minmax")].fp_pairs == 0
    assert (
        rows[("range", "minmax")].scan_ppm
        <= rows[("range", "bloom")].scan_ppm
    )


def test_equality_selectivity_mcv_wins_on_planted_hot_key(spark, oracle_sf_dir):
    """On the near-uniform fleet the MCV list is a wash (honest tie);
    on a planted 512x hot key it is load-bearing: uniform misses the
    hot key by ~the whole table while MCV stores it exactly."""
    from big_data_traffict_prediction_spark.operators.scans import (
        equality_selectivity_profile,
        q_selectivity_equality,
    )

    real = q_selectivity_equality(spark, oracle_sf_dir).first()
    assert real.n_rows > 0 and real.ndv > real.mcv_k
    assert real.mae_mcv_ppm <= real.mae_uniform_ppm  # never worse
    # 1000 tail keys x 10 rows + one hot key x 5120 rows
    planted = spark.range(0, 1001).select(
        F.col("id").cast("string").alias("camera_id"),
        F.when(F.col("id") == 0, F.lit(5120)).otherwise(F.lit(10)).alias("c"),
    )
    p = equality_selectivity_profile(planted).first()
    # uniform: est = n/ndv ~ 15 for every key -> hot-key error ~ 5105
    assert p.max_err_uniform > 5_000
    # MCV stores the hot key exactly; worst remaining error is the
    # tail rounding (couple of rows)
    assert p.max_err_mcv < 10
    assert p.mae_mcv_ppm * 10 < p.mae_uniform_ppm


def test_t_closeness_hand_planted_distributions(spark, tmp_path):
    """hour-8 group: all rows from user 2 (global share 1/3) →
    TVD = (2/3 + 2/3)/2 = 2/3 → 666666 ppm, exceeds t=0.5; hour-9
    group: all user 1 (global share 2/3) → TVD = 1/3 → 333333 ppm,
    inside t. Integer closed form checked exactly."""
    from datetime import datetime

    from big_data_traffict_prediction_spark.operators.scans import q_t_closeness

    rows, eid = [], 0
    for _ in range(4):
        rows.append((eid, datetime(2024, 3, 1, 8, eid % 60), 2, "click", 1.0, "{}"))
        eid += 1
    for _ in range(8):
        rows.append((eid, datetime(2024, 3, 1, 9, eid % 60), 1, "click", 1.0, "{}"))
        eid += 1
    path = str(tmp_path / "ev")
    _write_events(spark, path, rows)
    out = {r.qi_hour: r for r in q_t_closeness(spark, path).collect()}
    assert set(out) == {8, 9}
    assert out[8].tvd_ppm == 666_666 and out[8].exceeds_t
    assert out[9].tvd_ppm == 333_333 and not out[9].exceeds_t
    assert out[8].n_groups == 2 and out[8].groups_at_risk == 1
    assert out[8].group_size == 4 and out[9].group_size == 8


def test_mcv_merge_equals_rebuild(spark, sf_dir):
    """Per-key counts are the mergeable sufficient statistic of the
    equality-stats family: the incremental merge must reproduce the
    full rebuild's entire error profile tuple for tuple."""
    from big_data_traffict_prediction_spark.operators.scans import (
        q_mcv_merge,
        q_selectivity_equality,
    )

    merged = q_mcv_merge(spark, sf_dir).collect()
    rebuilt = q_selectivity_equality(spark, sf_dir).collect()
    assert len(merged) == len(rebuilt) == 1
    assert merged[0].asDict() == rebuilt[0].asDict()


def test_sample_histogram_stays_in_histogram_class(spark, oracle_sf_dir):
    """The histogram built from the 10% sample costs accuracy (~23% vs
    the full build's ~15% on this predicate at sf0.01) but stays FAR
    inside the histogram class — nowhere near zone-uniform's ~132%
    (q_selectivity_histogram's pinned comparison). That gap is why
    engines build histograms from samples at scale."""
    from big_data_traffict_prediction_spark.operators.scans import (
        q_sample_histogram,
    )

    r = q_sample_histogram(spark, oracle_sf_dir).first()
    assert r.exact_rows > 0 and r.est_sample_hist > 0
    assert r.err_sample_ppm < 400_000, f"sampled err {r.err_sample_ppm} ppm"
    # the deterministic 10% hash sample lands near its nominal rate
    assert 0.08 * r.total_rows <= r.sample_rows <= 0.12 * r.total_rows


def test_funnel_one_pass_matches_join_semantics(spark):
    """Planted fixture for the one-pass funnel rewrite (r13 opt round):
    the running-min window form must reproduce the chained-join
    semantics on every edge the production fixture never exercises —
    a click BEFORE any view (doesn't count), a click tied with the
    first view's timestamp (strict >, doesn't count), a purchase
    before the first qualifying click (doesn't count), and NULL
    user_ids (counted in stage 1's GROUP BY, dropped by the stage-2/3
    equi-joins)."""
    import datetime as dt

    from pyspark.sql import types as T

    from big_data_traffict_prediction_spark.operators.pipeline import funnel_counts

    def r(uid, sec, etype):
        return (uid, dt.datetime(2024, 1, 1, 0, 0, sec), etype)

    rows = [
        # u1: full funnel
        r(1, 1, "view"), r(1, 2, "click"), r(1, 3, "purchase"),
        # u2: click before view + click tied with first view → stage 1 only
        r(2, 1, "click"), r(2, 2, "view"), r(2, 2, "click"), r(2, 5, "purchase_x"),
        # u3: purchase BEFORE its qualifying click → stages 1-2 only
        r(3, 1, "view"), r(3, 5, "click"), r(3, 4, "purchase"),
        # NULL user: view counts (GROUP BY keeps the NULL group),
        # click does not (equi-join drops NULLs)
        (None, dt.datetime(2024, 1, 1, 0, 0, 1), "view"),
        (None, dt.datetime(2024, 1, 1, 0, 0, 2), "click"),
        # u5: purchase only → no stage
        r(5, 1, "purchase"),
    ]
    e = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("user_id", T.LongType(), True),
                T.StructField("ts", T.TimestampType(), False),
                T.StructField("event_type", T.StringType(), False),
            ]
        ),
    )
    got = {x.stage: x.n_users for x in funnel_counts(e).collect()}
    assert got == {"view": 4, "click": 2, "purchase": 1}, got
