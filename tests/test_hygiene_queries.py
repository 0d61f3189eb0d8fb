"""Training-data hygiene semantics on planted corpora: a pure-loop
document must score ~1 on repetition; a corpus document that quotes a
benchmark passage must be flagged contaminated, and untainted sources
must come out clean (zero hits, not merely low)."""

import pytest

from great_expectations_spark import suite_queries as sq


@pytest.fixture()
def hygiene_dir(spark, tmp_path):
    bench = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        # benchmark split (src0)
        (0, bench, "en", "src0", len(bench)),
        (1, "one two three four five six", "en", "src0", 27),
        # corpus: doc 10 quotes 5+ consecutive benchmark tokens
        (10, "intro alpha beta gamma delta epsilon outro", "en", "srcA", 43),
        # doc 11 shares tokens but never 5 in a row
        (11, "alpha beta gamma X delta epsilon zeta", "en", "srcA", 37),
        # srcB is fully clean
        (12, "p q r s t u v w x y", "en", "srcB", 19),
        # degenerate loop doc: trigram repetition ratio ~ 1
        (13, " ".join(["spam"] * 40), "en", "srcB", 199),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "sfh")
    df.coalesce(2).write.mode("overwrite").parquet(d + "/documents.parquet")
    return d


def test_repetition_scores_flag_loops(spark, hygiene_dir):
    rows = {
        r.doc_id: r
        for r in sq.doc_repetition_scores(spark, hygiene_dir).collect()
    }
    loop = rows[13]
    assert loop.n_trigrams == 38 and loop.distinct_trigrams == 1
    assert loop.trigram_rep_ratio > 0.97
    assert loop.token_rep_ratio > 0.97
    # a no-repeat doc scores exactly 0 on both ratios
    clean = rows[12]
    assert clean.trigram_rep_ratio == 0.0
    assert clean.token_rep_ratio == 0.0


def test_contamination_flags_quoting_doc_only(spark, hygiene_dir):
    rows = {
        r.source: r
        for r in sq.ngram_contamination(spark, hygiene_dir).collect()
    }
    assert set(rows) == {"srcA", "srcB"}  # benchmark split excluded
    a = rows["srcA"]
    # doc 10's 5-token quoted run is exactly one benchmark 5-gram;
    # doc 11's interrupted run contributes none
    assert a.docs == 2 and a.contaminated_docs == 1
    assert a.hit_grams == 1
    b = rows["srcB"]
    assert b.contaminated_docs == 0 and b.hit_grams == 0
    assert b.overlap_frac == 0.0
