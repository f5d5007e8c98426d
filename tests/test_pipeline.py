"""Pipeline operators: approximate results bounded against exact ones,
sampling rates against requested fractions."""

from __future__ import annotations

from big_data_traffict_prediction_spark.operators.pipeline import (
    SAMPLE_FRACTIONS,
    q_approx_distinct,
    q_corpus_select,
    q_stratified_sample,
)


def test_kmv_distinct_bounds(spark, sf_dir):
    from big_data_traffict_prediction_spark.operators.pipeline import KMV_K

    row = q_approx_distinct(spark, sf_dir).first()
    if row.exact_users < KMV_K:
        # fallback branch: the sketch holds the whole hashed value set,
        # so only collisions can shave the count — never overshoot
        assert row.exact_users * 0.95 <= row.user_id_kmv <= row.exact_users
    else:
        # estimator branch ((k−1)·M/h_k): unbiased, TWO-SIDED error —
        # it overshoots about half the time (sf0.1 has ≥ KMV_K users)
        rel = abs(row.user_id_kmv - row.exact_users) / row.exact_users
        assert rel <= 0.15, f"user KMV should land within 15%: {rel:.3f}"
    # event_id is dense-unique (n_rows distinct): always the estimator
    # path; KMV std error ≈ 1/sqrt(k−1) ≈ 3.1% at k=1024
    rel_err = abs(row.event_id_kmv - row.n_rows) / row.n_rows
    assert rel_err <= 0.15, f"KMV k=1024 should land within 15%: {rel_err:.3f}"


def test_stratified_sample_hits_fractions(spark, sf_dir):
    rows = {r.lang: r for r in q_stratified_sample(spark, sf_dir).collect()}
    for lang, frac in SAMPLE_FRACTIONS.items():
        got = rows[lang].achieved_ppm / 1e6
        # multiplicative hash at small n: generous tolerance, zero would
        # still indicate a wiring bug
        assert abs(got - frac) < 0.2, f"{lang}: wanted ~{frac}, got {got}"
    # strata not in the fraction map are excluded entirely
    for lang, r in rows.items():
        if lang not in SAMPLE_FRACTIONS:
            assert r.n_sampled == 0


def test_corpus_select_applies_all_three_filters(spark, sf_dir):
    from pyspark.sql import functions as F

    from big_data_traffict_prediction_spark.functions.text import norm_col
    from big_data_traffict_prediction_spark.operators.pipeline import (
        CORPUS_LANG,
        QUALITY_MIN,
    )
    from big_data_traffict_prediction_spark.tables import load_table

    out = q_corpus_select(spark, sf_dir)
    rows = out.collect()
    assert rows, "corpus selection must keep something at every SF"
    assert all(r.lang == CORPUS_LANG for r in rows)
    assert all(r.quality_score >= QUALITY_MIN for r in rows)
    # dedup keep-rule: no two selected docs share a fingerprint
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(norm_col()).alias("fp")
    )
    picked = {r.doc_id for r in rows}
    fps = [r.fp for r in d.collect() if r.doc_id in picked]
    assert len(fps) == len(set(fps)), "selected corpus contains duplicate fingerprints"


def test_reservoir_sample_is_deterministic_uniform_k(spark, sf_dir):
    from big_data_traffict_prediction_spark.operators.pipeline import (
        RESERVOIR_K,
        q_reservoir_sample,
    )

    a = [r.doc_id for r in q_reservoir_sample(spark, sf_dir).collect()]
    b = [r.doc_id for r in q_reservoir_sample(spark, sf_dir).collect()]
    assert a == b, "hash-ranked sample must be rerun-stable"
    assert len(a) == min(RESERVOIR_K, 500) and len(set(a)) == len(a)


def test_vocab_coverage_reaches_target_monotonically(spark, sf_dir):
    from big_data_traffict_prediction_spark.functions.text import (
        VOCAB_COVERAGE_PCT,
        q_vocab_coverage,
    )

    rows = q_vocab_coverage(spark, sf_dir).collect()
    assert rows
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True), "frequency must be non-increasing"
    cums = [r.cum_tokens for r in rows]
    assert cums == sorted(cums), "cumulative mass must increase"
    assert rows[-1].coverage_pct >= VOCAB_COVERAGE_PCT
    # the cut is minimal: the second-to-last row was still short of it
    if len(rows) >= 2:
        assert rows[-2].coverage_pct < VOCAB_COVERAGE_PCT


def test_ddsketch_error_bound_vs_exact(spark, oracle_sf_dir):
    """Every estimate must sit at or above the exact percentile and
    within the sketch's +25% relative guarantee (exact below 4 -> the
    estimate IS exact: buckets 0..3 are singletons)."""
    from pyspark.sql import functions as F

    from big_data_traffict_prediction_spark.operators.pipeline import (
        DDS_QS,
        q_ddsketch_quantiles,
    )
    from big_data_traffict_prediction_spark.tables import traffic_history

    got = {r.camera_id: r for r in q_ddsketch_quantiles(spark, oracle_sf_dir).collect()}
    exact = (
        traffic_history(spark, oracle_sf_dir)
        .groupBy("camera_id")
        .agg(
            F.expr(
                "percentile_disc(array(0.50,0.90,0.99))"
                " WITHIN GROUP (ORDER BY new_count)"
            ).alias("e")
        )
        .collect()
    )
    assert got
    for r in exact:
        g = got[r.camera_id]
        for q, ex in zip(DDS_QS, r.e):
            est = getattr(g, f"p{q}_est")
            assert est >= ex, (r.camera_id, q, est, ex)
            if ex <= 3:
                assert est == ex, (r.camera_id, q, est, ex)
            else:
                assert est <= ex + ex // 4 + 1, (r.camera_id, q, est, ex)


def test_ddsketch_buckets_are_mergeable(spark, sf_dir):
    """The mergeability law: bucket counts of A ∪ B equal the
    bucket-wise SUM of A's and B's counts — the property that lets a
    100 TB system persist per-partition sketches and merge at read."""
    from pyspark.sql import functions as F

    from big_data_traffict_prediction_spark.operators.pipeline import dds_bucket
    from big_data_traffict_prediction_spark.tables import traffic_history

    h = traffic_history(spark, sf_dir).select(
        "camera_id", dds_bucket(F.col("new_count")).alias("bucket"), "id"
    )
    whole = {
        (r.camera_id, r.bucket): r.c
        for r in h.groupBy("camera_id", "bucket").agg(F.count("*").alias("c")).collect()
    }
    half = lambda p: (
        h.filter(F.pmod("id", F.lit(2)) == p)
        .groupBy("camera_id", "bucket")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    merged: dict = {}
    for part in (0, 1):
        for r in half(part):
            merged[(r.camera_id, r.bucket)] = merged.get((r.camera_id, r.bucket), 0) + r.c
    assert merged == whole and whole


def test_analyze_table_counts_planted_nulls(spark, tmp_path):
    """The profile must count nulls per column, exclude them from NDV
    and min/max, and zero-pad integers so lexicographic min/max equals
    numeric order ('9' vs '10')."""
    from datetime import datetime

    from big_data_traffict_prediction_spark.operators.pipeline import (
        q_analyze_table,
    )

    rows = [
        (9, datetime(2024, 1, 1, 8), None, "click", 1.5, "{}"),
        (10, datetime(2024, 1, 2, 9), 7, "view", 0.25, None),
        (11, datetime(2024, 1, 3, 10), 7, "view", 490.02, "{}"),
        (12, datetime(2024, 1, 4, 11), -3, "view", -2.5, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{tmp_path}/events.parquet")
    out = {r.col_name: r for r in q_analyze_table(spark, str(tmp_path)).collect()}
    assert set(out) == {"event_id", "ts", "user_id", "event_type", "value", "props"}
    assert all(r.n_rows == 4 for r in out.values())
    assert out["user_id"].n_null == 1 and out["user_id"].ndv_exact == 2
    assert out["props"].n_null == 1 and out["props"].ndv_exact == 1
    # sign-split zero-padding: numeric order survives the string min/max
    assert out["event_id"].min_val.endswith("9")
    assert out["event_id"].max_val.endswith("12")
    assert out["event_id"].min_val < out["event_id"].max_val
    # negatives sort BELOW every non-negative ('0' prefix vs '1')
    assert out["user_id"].min_val.startswith("0")  # -3 is the minimum
    assert out["user_id"].max_val.endswith("7")
    assert out["value"].min_val.startswith("0")  # -2.5 * 10000 = -25000
    assert out["value"].max_val.endswith("4900200")  # 490.02 * 10000
    assert out["value"].ndv_exact == 4


def test_ann_recall_eval_is_informative(spark, oracle_sf_dir):
    """The eval must produce a non-vacuous spread: every query has a
    full exact top-K, some query recalls perfectly, and the macro
    recall sits strictly between 'broken' and 'the eval is a tautology'
    (random embeddings cluster poorly, so IVF@2-probes cannot be ~1)."""
    from big_data_traffict_prediction_spark.functions.similarity import (
        TOP_K,
        q_ann_recall_eval,
    )

    rows = q_ann_recall_eval(spark, oracle_sf_dir).collect()
    assert rows and all(r.n_exact == TOP_K for r in rows)
    assert all(0 <= r.n_hits <= TOP_K for r in rows)
    macro = sum(r.recall_ppm for r in rows) / len(rows)
    assert 100_000 < macro < 1_000_000, macro
    assert any(r.recall_ppm == 1_000_000 for r in rows)


def test_ddsketch_bucket_laws_exhaustive(spark):
    """Bucket-mapping laws over an exhaustive integer sweep: buckets
    are monotone in x, every x is <= its bucket's upper bound, and the
    previous bucket's upper bound is < x (the bounds tile with no gaps
    or overlaps) — the algebra both engines must agree on for the
    sketch to hash-match."""
    from pyspark.sql import functions as F

    from big_data_traffict_prediction_spark.operators.pipeline import (
        dds_bucket,
        dds_upper,
    )

    xs = spark.range(0, 20000).select(F.col("id").alias("x"))
    rows = xs.select(
        "x",
        dds_bucket(F.col("x")).alias("b"),
        dds_upper(dds_bucket(F.col("x"))).alias("up"),
    ).collect()
    rows.sort(key=lambda r: r.x)
    prev_b = -1
    uppers = {}
    for r in rows:
        assert r.b >= prev_b, (r.x, r.b, prev_b)  # monotone
        assert r.x <= r.up, (r.x, r.b, r.up)  # upper bound holds
        uppers[r.b] = r.up
        prev_b = max(prev_b, r.b)
    bs = sorted(uppers)
    for a, b in zip(bs, bs[1:]):
        # bounds tile: the next bucket starts right after this upper
        assert uppers[a] < uppers[b], (a, b)
    # relative error law: upper <= x + x // 4 + 1 for every x
    assert all(r.up <= r.x + r.x // 4 + 1 for r in rows)


def test_constraint_profile_planted_violations(spark, tmp_path):
    """Planted duplicate surrogate keys must fail the unique candidate
    with an exact violation_ppm; a single-type user keeps the fd
    holding; day → dow holds by calendar construction."""
    from datetime import datetime

    from big_data_traffict_prediction_spark.operators.pipeline import (
        q_constraint_profile,
    )

    rows = [
        # event_id 7 appears twice (one violating key group of 4)
        (7, datetime(2024, 1, 1, 8), 1, "click", 1.0, "{}"),
        (7, datetime(2024, 1, 1, 9), 1, "click", 2.0, "{}"),
        (8, datetime(2024, 1, 2, 8), 1, "click", 3.0, "{}"),
        (9, datetime(2024, 1, 3, 8), 2, "view", 4.0, "{}"),
        (10, datetime(2024, 1, 3, 9), 2, "click", 5.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{tmp_path}/events.parquet")
    out = {
        (r.kind, r.lhs, r.rhs): r
        for r in q_constraint_profile(spark, str(tmp_path)).collect()
    }
    key = out[("unique", "event_id", "")]
    assert key.n_groups == 4 and key.violating == 1 and not key.holds
    assert key.violation_ppm == 1_000_000 // 4
    fd = out[("fd", "user_id", "event_type")]
    assert fd.n_groups == 2 and fd.violating == 1 and not fd.holds  # user 2 mixes
    cal = out[("fd", "day", "dow")]
    assert cal.n_groups == 3 and cal.violating == 0 and cal.holds
