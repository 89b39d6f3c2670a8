"""Unit tests for corpus-curation operators: PII scrub (with real
PII-shaped fixtures the synthetic corpus lacks), repetition stats,
benchmark decontamination."""

import hashlib

from hotdog_spark.operators import privacy
from hotdog_spark.operators.decontam import decontaminate, word_ngrams
from hotdog_spark.operators.textops import repetition_stats

from pyspark.sql import functions as F


def test_pii_scrub_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "Contact Bob@Example.COM or 10.0.0.1 now"),
            (2, "call 555-123-4567 or 555.987.6543; ip 192.168.1.254"),
            (3, "the Customer bought a spark VECTOR spark"),
            (4, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in privacy.pii_scrub(df, "text", "doc_id", ["customer", "spark", "vector"])
        .collect()
    }
    assert (out[1]["n_email"], out[1]["n_ipv4"]) == (1, 1)
    assert (out[2]["n_phone"], out[2]["n_ipv4"]) == (2, 1)
    assert out[3]["n_denylist"] == 4
    assert all(
        out[4][c] == 0 for c in ("n_email", "n_ipv4", "n_phone", "n_denylist")
    )
    expected = "the <term> bought a <term> <term> <term>"
    assert out[3]["redacted_fp"] == hashlib.md5(expected.encode()).hexdigest()[:16]
    # Redaction collapses docs differing only in scrubbed PII.
    df2 = spark.createDataFrame(
        [(1, "hi alice@a.com bye"), (2, "hi bob@b.org bye")], ["doc_id", "text"]
    )
    fps = {
        r["redacted_fp"]
        for r in privacy.pii_scrub(df2, "text", "doc_id", []).collect()
    }
    assert len(fps) == 1


def test_repetition_stats_runs_and_ratios(spark):
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "x y x y"), (3, "solo")], ["doc_id", "text"]
    )
    out = {r["id"]: r for r in repetition_stats(df, "text", "doc_id").collect()}
    r1 = out[1]
    assert (r1["n_tokens"], r1["n_distinct"], r1["top_tok_cnt"], r1["max_run"]) == (
        4, 2, 3, 3,
    )
    assert r1["distinct_ratio"] == 0.5
    r2 = out[2]  # alternating: counts 2 but no run > 1
    assert (r2["top_tok_cnt"], r2["max_run"]) == (2, 1)
    assert (out[3]["n_tokens"], out[3]["max_run"]) == (1, 1)


def test_word_ngrams_short_doc_is_empty(spark):
    df = spark.createDataFrame([("a b c",), ("a b",)], ["text"])
    got = df.select(F.size(word_ngrams(F.col("text"), 3)).alias("n")).collect()
    assert sorted(r["n"] for r in got) == [0, 1]


def test_decontaminate_flags_shared_ngrams(spark):
    corpus = spark.createDataFrame(
        [
            (10, "one two three four five six"),   # contains bench 5-gram
            (11, "totally different words here now"),
            (12, "one two three four five"),       # exactly the bench doc
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(99, "one two three four five")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["shared_grams"]
        for r in decontaminate(corpus, bench, "text", "doc_id", n=5).collect()
    }
    # doc 10 has grams {one..five, two..six}: one shared; doc 12 identical.
    assert got == {10: 1, 12: 1}
