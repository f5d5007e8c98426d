"""Behavioral tests for the curation ops beyond the oracle-parity
gate: planted-signal checks and structural invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_traffict_prediction_spark.functions.curation import (
    BENCH_SOURCES,
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    q_contamination_check,
    q_doc_chunks,
    q_repetition_score,
)


def test_repetition_flags_planted_repeats(spark, sf_dir, tmp_path):
    """A doc that is one trigram repeated flags; a doc of all-distinct
    tokens does not."""
    rows = [
        (1, " ".join(["alpha beta gamma"] * 20), "en", "t", 0),
        (2, " ".join(f"tok{i}" for i in range(60)), "en", "t", 0),
    ]
    path = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{path}/documents.parquet")
    out = {r.doc_id: r for r in q_repetition_score(spark, path).collect()}
    assert out[1].is_repetitive and out[1].dup_trigram_frac > 0.9
    assert not out[2].is_repetitive and out[2].dup_trigram_frac == 0.0
    assert out[2].distinct_token_ratio == 1.0


def test_contamination_catches_planted_benchmark_copy(spark, sf_dir, tmp_path):
    """A corpus doc embedding a benchmark sentence is flagged; a
    disjoint-vocabulary doc is not; benchmark docs never appear."""
    bench_text = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (1, bench_text, "en", BENCH_SOURCES[0], 0),
        (2, "prefix words then " + bench_text + " then suffix words", "en", "corpus", 0),
        (3, " ".join(f"w{i}" for i in range(40)), "en", "corpus", 0),
    ]
    path = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{path}/documents.parquet")
    out = {r.doc_id: r for r in q_contamination_check(spark, path).collect()}
    assert set(out) == {2, 3}, "benchmark docs must not be scored"
    assert out[2].is_contaminated and out[2].overlap_grams >= 5
    assert not out[3].is_contaminated and out[3].overlap_grams == 0


def test_chunks_cover_every_token_exactly_by_stride(spark, sf_dir):
    """Invariants over real data: per doc, chunk ids are dense from 0,
    every chunk except the last has CHUNK_TOKENS tokens or the doc is
    shorter, and chunk count == ceil(max(n - overlap, 1) / stride)
    recomputed from the token count."""
    chunks = q_doc_chunks(spark, sf_dir)
    per_doc = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.max("chunk_id").alias("max_id"),
        F.min("chunk_id").alias("min_id"),
        F.sum(
            F.when(F.col("chunk_tokens") > CHUNK_TOKENS, 1).otherwise(0)
        ).alias("oversized"),
    )
    bad = per_doc.filter(
        (F.col("min_id") != 0)
        | (F.col("max_id") != F.col("n_chunks") - 1)
        | (F.col("oversized") > 0)
    ).count()
    assert bad == 0

    from big_data_traffict_prediction_spark.functions.text import norm_col
    from big_data_traffict_prediction_spark.tables import load_table

    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(norm_col(), " ")).alias("n")
    )
    expected = toks.select(
        "doc_id",
        (F.floor((F.col("n") - 1) / CHUNK_STRIDE) + 1).cast("long").alias("want"),
    )
    mismatch = (
        per_doc.join(expected, "doc_id")
        .filter(F.col("n_chunks") != F.col("want"))
        .count()
    )
    assert mismatch == 0


def test_doc_winnow_matches_python_model_and_guarantee(spark, tmp_path):
    """q_doc_winnow against a plain-Python winnow (same md5-60 hash,
    same K/W), plus the MOSS guarantee: two docs sharing a substring of
    length >= K+W-1 share at least one selected fingerprint."""
    import hashlib

    from big_data_traffict_prediction_spark.functions.text import (
        WINNOW_K,
        WINNOW_W,
        q_doc_winnow,
    )

    shared = "abcdefghijk"  # exactly K+W-1 = 11 chars
    rows = [
        (1, "xxqq " + shared + " zz trailer", "en", "t", 0),
        (2, "totally other lead " + shared + " yy", "en", "t", 0),
        (3, "short", "en", "t", 0),  # < K chars after norm -> no row
    ]
    path = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{path}/documents.parquet")

    def winnow(text: str):
        norm = " ".join(text.split()).lower().strip()
        grams = [norm[i : i + WINNOW_K] for i in range(len(norm) - WINNOW_K + 1)]
        hs = [
            int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams
        ]
        if not hs:
            return None
        wins = max(len(hs) - WINNOW_W + 1, 1)
        mins = [min(hs[j : j + WINNOW_W]) for j in range(wins)]
        fps = list(dict.fromkeys(mins))
        x = 0
        for f in fps:
            x ^= f
        return len(hs), len(fps), min(fps), x, set(fps)

    got = {r.doc_id: r for r in q_doc_winnow(spark, path).collect()}
    assert set(got) == {1, 2}, "sub-K doc must emit no row"
    models = {}
    for doc_id, text, *_ in rows[:2]:
        n_grams, n_fp, min_fp, fp_xor, fps = winnow(text)
        models[doc_id] = fps
        r = got[doc_id]
        assert (r.n_grams, r.n_fp, r.min_fp, r.fp_xor) == (
            n_grams, n_fp, min_fp, fp_xor,
        ), f"doc {doc_id} summary mismatch"
    # winnowing guarantee: K+W-1 shared chars -> shared fingerprint
    assert models[1] & models[2], "shared substring must share a fingerprint"
