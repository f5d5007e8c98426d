"""Pipeline operators: approximate results bounded against exact ones,
sampling rates against requested fractions."""

from __future__ import annotations

from big_data_traffict_prediction_spark.operators.pipeline import (
    SAMPLE_FRACTIONS,
    q_approx_distinct,
    q_corpus_select,
    q_stratified_sample,
)


def test_approx_distinct_within_rsd_bound(spark, sf_dir):
    row = q_approx_distinct(spark, sf_dir).first()
    rel_err = abs(row.approx_users - row.exact_users) / row.exact_users
    assert rel_err <= 0.10, f"HLL rsd=0.05 should land within 10%: {rel_err:.3f}"


def test_stratified_sample_hits_fractions(spark, sf_dir):
    rows = {r.lang: r for r in q_stratified_sample(spark, sf_dir).collect()}
    for lang, frac in SAMPLE_FRACTIONS.items():
        got = rows[lang].achieved_fraction
        # Bernoulli sampling at small n: generous tolerance, zero would
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
