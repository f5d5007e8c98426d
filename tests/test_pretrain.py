"""Invariant tests for the pretrain-curation operators beyond the
oracle parity gate (which checks exact values at sf0.01)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_traffict_prediction_spark.functions.pretrain import (
    DOMAIN_CAP,
    _per_hash_doc_counts,
    q_bigram_familiarity,
    q_domain_cap,
    q_substring_dedup,
)


def test_per_hash_doc_counts_machinery(spark):
    """docs_with = distinct docs containing the hash; cnt = per-doc
    multiplicity — checked on a constructed span stream."""
    spans = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 20), (2, 10), (3, 30)], "doc_id int, h int"
    ).select("doc_id", "h")
    rows = {
        (r.h, r.doc_id): (r.cnt, r.docs_with)
        for r in _per_hash_doc_counts(spans).collect()
    }
    assert rows[(10, 1)] == (2, 2)  # doc1 has h=10 twice; docs 1 and 2 share it
    assert rows[(10, 2)] == (1, 2)
    assert rows[(20, 1)] == (1, 1)
    assert rows[(30, 3)] == (1, 1)


def test_substring_dedup_bounds(spark, sf_dir):
    pdf = q_substring_dedup(spark, sf_dir).toPandas()
    assert (pdf.n_dup_spans <= pdf.n_spans).all()
    assert (pdf.n_spans >= 1).all()  # every doc yields >= 1 window
    assert ((pdf.dup_frac >= 0) & (pdf.dup_frac <= 1)).all()


def test_bigram_familiarity_bounds(spark, sf_dir):
    pdf = q_bigram_familiarity(spark, sf_dir).toPandas()
    assert (pdf.n_familiar <= pdf.n_bigrams).all()
    assert ((pdf.familiar_frac >= 0) & (pdf.familiar_frac <= 1)).all()
    # every bigram occurs in at least its own document
    assert (pdf.avg_doc_freq >= 1).all()


def test_domain_cap_rank_contract(spark, sf_dir):
    pdf = q_domain_cap(spark, sf_dir).toPandas()
    for src, grp in pdf.groupby("source"):
        assert len(grp) <= DOMAIN_CAP
        assert sorted(grp.rk) == list(range(1, len(grp) + 1))
        # quality non-increasing along the rank
        q = grp.sort_values("rk").quality.to_list()
        assert all(a >= b for a, b in zip(q, q[1:]))
