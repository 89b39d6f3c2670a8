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


def test_decontaminate_semantic_flags_near_benchmark_vectors(spark):
    # Pick ids so the md5 split is known: id 17 hashes below the 10%
    # threshold (test side); the rest are train.
    ids = list(range(40))
    th = hashlib.md5(b"x").hexdigest()  # noqa: F841 (doc: split is md5-based)
    from hotdog_spark.operators.sampling import hex_threshold
    cut = hex_threshold(0.1)
    test_ids = [i for i in ids if hashlib.md5(str(i).encode()).hexdigest()[:4] < cut]
    train_ids = [i for i in ids if i not in set(test_ids)]
    assert test_ids, "fixture needs at least one test id"
    b0 = test_ids[0]
    # train vec equal to the benchmark vector -> cosine 1.0 (flagged);
    # orthogonal train vec -> cosine 0.0 (not flagged).
    clone, ortho = train_ids[0], train_ids[1]
    def vec(i):
        if i == b0 or i == clone:
            return [1.0, 0.0, 0.0, 0.0]
        if i == ortho:
            return [0.0, 1.0, 0.0, 0.0]
        return [0.0, 0.0, 1.0, 0.0]
    df = spark.createDataFrame(
        [(i, vec(i)) for i in ids], ["vec_id", "embedding"]
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    from hotdog_spark.operators.decontam import decontaminate_semantic
    got = {
        r["train_id"]: (r["bench_id"], r["max_cosine"])
        for r in decontaminate_semantic(
            df, "vec_id", "embedding", test_frac=0.1, threshold=0.5
        ).collect()
    }
    assert clone in got and got[clone][1] == 1.0
    assert got[clone][0] == b0 or got[clone][0] in test_ids
    assert ortho not in got


def test_rebalance_temperature_sqrt_rates(spark):
    # 4 groups with counts 100, 400, 1600, 100: sqrt temperature keeps
    # ~100, ~200, ~400, 100 — the 16x group keeps 1/4, not 1/16.
    rows = []
    k = 0
    for g, n in [("a", 100), ("b", 400), ("c", 1600), ("d", 100)]:
        for _ in range(n):
            rows.append((k, g)); k += 1
    from hotdog_spark.operators.sampling import rebalance_temperature_sqrt
    df = spark.createDataFrame(rows, ["id", "grp"])
    kept = rebalance_temperature_sqrt(df, "id", "grp")
    counts = {r["grp"]: r["n"] for r in
              kept.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    # min groups keep everything (threshold >= 65536 branch)
    assert counts["a"] == 100 and counts["d"] == 100
    # md5 thresholds are approximate: allow +-20% around sqrt targets
    assert 160 <= counts["b"] <= 240      # target 200
    assert 320 <= counts["c"] <= 480      # target 400
    # determinism: rerun gives the identical kept set
    ids1 = sorted(r["id"] for r in kept.select("id").collect())
    ids2 = sorted(r["id"] for r in
                  rebalance_temperature_sqrt(df, "id", "grp").select("id").collect())
    assert ids1 == ids2


def test_importance_weights_hashed_ngrams_differential(spark):
    """The Spark DSIR-style scorer must equal a pure-Python reference
    (md5 bucketing, integer masses, weight algebra) on a mixed-language
    corpus; docs made of target-side bigrams must be selected."""
    import hashlib
    from collections import Counter

    from pyspark.sql import functions as F

    from hotdog_spark.operators.sampling import importance_weights_hashed_ngrams

    docs = [
        (1, "en", "the cat sat on the mat"),
        (2, "en", "the cat ran"),
        (3, "de", "der hund lief schnell weg"),
        (4, "de", "the cat sat"),   # de-labeled but target-like content
        (5, "en", "x"),             # single token -> no row
    ]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:4], 16) % 1024

    per_doc_buckets = {}
    src, tgt = Counter(), Counter()
    for did, lang, text in docs:
        toks = text.split()
        if len(toks) < 2:
            continue
        bs = [bucket(f"{a} {b}") for a, b in zip(toks, toks[1:])]
        per_doc_buckets[did] = bs
        src.update(bs)
        if lang == "en":
            tgt.update(bs)
    s_tot, t_tot = sum(src.values()), sum(tgt.values())

    df = spark.createDataFrame(docs, ["doc_id", "lang", "text"])
    out = {
        r["doc_id"]: r.asDict()
        for r in importance_weights_hashed_ngrams(
            df, "text", "doc_id", target_pred=F.col("lang") == "en"
        ).collect()
    }
    assert set(out) == set(per_doc_buckets)
    for did, bs in per_doc_buckets.items():
        tm = sum(tgt[b] for b in bs)
        sm = sum(src[b] for b in bs)
        r = out[did]
        assert r["n_grams"] == len(bs)
        assert r["target_mass"] == tm and r["source_mass"] == sm
        assert r["weight"] == (tm / sm) * (s_tot / t_tot)
        assert r["selected"] == int(tm * s_tot > sm * t_tot)
    # doc 4 shares every bigram with the en docs -> more target-like
    # than the de doc 3
    assert out[4]["weight"] > out[3]["weight"]


def test_decontaminate_bloom_superset_of_exact(spark):
    """Bloom decontamination can never miss a truly shared gram (every
    bit of a shared gram was set by the benchmark build); exact-flagged
    docs are a subset of bloom-flagged docs, and on a tiny corpus with a
    huge bitmap (fill ratio ~0) the two reports are identical."""
    from hotdog_spark.operators.decontam import bloom_build, decontaminate_bloom

    corpus = spark.createDataFrame(
        [
            (10, "one two three four five six"),
            (11, "totally different words here now"),
            (12, "one two three four five"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(99, "one two three four five")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["bloom_hits"], r["n_grams"])
        for r in decontaminate_bloom(
            corpus, bench, "text", "doc_id", n=5
        ).collect()
    }
    assert got == {10: (1, 2), 12: (1, 1)}
    # bitmap is bounded by benchmark gram count * k words, never more
    bm = bloom_build(bench, "text", "doc_id", n=5).collect()
    assert 1 <= len(bm) <= 4
    # every stored word is a single set bit here (1 gram, 4 hashes)
    total_bits = sum(bin(r["bits"] & ((1 << 64) - 1)).count("1") for r in bm)
    assert total_bits == 4


def test_curation_config_compiles_and_matches_dict_form(spark):
    """YAML text and the dict constant compile to identical results."""
    import yaml

    from hotdog_spark.curation import DEFAULT_WASH, build_curation_pipeline
    from hotdog_spark.sources.batch import table

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    yml = yaml.safe_dump(DEFAULT_WASH)
    a = sorted(map(tuple, build_curation_pipeline(docs, yml).collect()))
    b = sorted(map(tuple, build_curation_pipeline(docs, DEFAULT_WASH).collect()))
    assert a == b and a


def test_curation_config_rejects_bad_configs():
    """Compile-time failure: unknown step, unknown param, missing
    prerequisite, empty pipeline — all refuse before any job runs."""
    import pytest

    from hotdog_spark.curation import load_curation_config

    with pytest.raises(ValueError, match="unknown step"):
        load_curation_config({"pipeline": [{"step": "nope"}]})
    with pytest.raises(ValueError, match="unknown params"):
        load_curation_config(
            {"pipeline": [{"step": "redact", "deny": []}]}
        )
    with pytest.raises(ValueError, match="requires a prior"):
        load_curation_config(
            {"pipeline": [{"step": "redact"}, {"step": "pack"}]}
        )
    with pytest.raises(ValueError, match="non-empty"):
        load_curation_config({"pipeline": []})


def test_curation_config_rejects_inconsistent_group_by():
    """Param CONSISTENCY is compile-time too (ADVICE r6): a bin_report
    group_by that differs from pack's, or a pack group_by naming a
    column the features step never produces, must refuse at load time
    rather than die mid-job."""
    import pytest

    from hotdog_spark.curation import load_curation_config

    base = [
        {"step": "redact"},
        {"step": "features"},
    ]
    with pytest.raises(ValueError, match="not a column the features step"):
        load_curation_config(
            {"pipeline": base + [{"step": "pack", "group_by": "source"}]}
        )
    with pytest.raises(ValueError, match="must match the pack step"):
        load_curation_config(
            {"pipeline": base
             + [{"step": "pack", "group_by": "lang"},
                {"step": "bin_report", "group_by": "doc_id"}]}
        )
    # consistent config still compiles
    load_curation_config(
        {"pipeline": base
         + [{"step": "pack", "group_by": "lang"},
            {"step": "bin_report", "group_by": "lang"}]}
    )


def test_k_anonymity_report_pinned(spark):
    """Handcrafted equivalence classes: sizes 1, 1, 3, 7, 12 ->
    buckets '1'(2 classes, 2 rows), '2-4'(1, 3), '5-9'(1, 7),
    '10+'(1, 12); at_risk on the sub-threshold buckets only; ppm
    shares sum to ~1e6."""
    from pyspark.sql import functions as F

    from hotdog_spark.operators.privacy import k_anonymity_report

    rows = (
        [("a", 0)] + [("b", 0)]     # two singleton classes
        + [("c", 0)] * 3            # class of 3
        + [("d", 0)] * 7            # class of 7
        + [("e", 0)] * 12           # class of 12
    )
    df = spark.createDataFrame(rows, "qid string, pad long")
    out = {
        r.k_bucket: r
        for r in k_anonymity_report(df, [F.col("qid")], k_threshold=5).collect()
    }
    assert out["1"].n_classes == 2 and out["1"].n_rows == 2
    assert out["2-4"].n_classes == 1 and out["2-4"].n_rows == 3
    assert out["5-9"].n_classes == 1 and out["5-9"].n_rows == 7
    assert out["10+"].n_classes == 1 and out["10+"].n_rows == 12
    assert out["1"].at_risk == 1 and out["2-4"].at_risk == 1
    assert out["5-9"].at_risk == 0 and out["10+"].at_risk == 0
    total = 24
    for b, r in out.items():
        assert r.row_share_ppm == (1_000_000 * r.n_rows) // total


def test_l_diversity_report_homogeneity_attack_flagged(spark):
    """Classic homogeneity case: a class of 10 rows all sharing one
    sensitive value is k-anonymous but l=1 (at risk); a mixed class of
    4 rows with 3 distinct values is small but diverse (l=3, safe at
    threshold 3)."""
    from pyspark.sql import functions as F

    from hotdog_spark.operators.privacy import l_diversity_report

    rows = [("q1", "s_same")] * 10 + [
        ("q2", "a"), ("q2", "b"), ("q2", "c"), ("q2", "a"),
    ]
    df = spark.createDataFrame(rows, "qid string, sens string")
    out = {
        r.l: r
        for r in l_diversity_report(
            df, [F.col("qid")], F.col("sens"), l_threshold=3
        ).collect()
    }
    assert out[1].n_classes == 1 and out[1].n_rows == 10 and out[1].at_risk == 1
    assert out[3].n_classes == 1 and out[3].n_rows == 4 and out[3].at_risk == 0
    assert out[1].row_share_ppm == (1_000_000 * 10) // 14


def test_t_closeness_report_skewness_attack_flagged(spark):
    """Skewness case l-diversity misses: global sensitive distribution
    50/50 (a, b); class q1 is all-'a' (10 rows, TVD = 1/2*(|1-0.5| +
    |0-0.5|) = 0.5 -> decile 5, at risk at 300k ppm); class q2 is a
    milder 25/75 skew (TVD 0.25 -> decile 2, below threshold)."""
    from pyspark.sql import functions as F

    from hotdog_spark.operators.privacy import t_closeness_report

    rows = [("q1", "a")] * 10 + [("q2", "a")] * 5 + [("q2", "b")] * 15
    df = spark.createDataFrame(rows, "qid string, sens string")
    out = {
        r.tvd_decile: r
        for r in t_closeness_report(
            df, [F.col("qid")], F.col("sens"), t_ppm_threshold=300_000
        ).collect()
    }
    # global: a=15, b=15 of 30. q1: n_cv(a)=10,k=10 -> |10*30-15*10| +
    # |0*30-15*10| = 150+150=300 -> ppm = 1e6*300 // (2*10*30) = 500000
    assert out[5].n_classes == 1 and out[5].n_rows == 10 and out[5].at_risk == 1
    # q2: a: |5*30-15*20|=150, b: |15*30-15*20|=150 -> 1e6*300//(2*20*30)
    # = 250000 -> decile 2, below the 300k threshold
    assert out[2].n_classes == 1 and out[2].n_rows == 20 and out[2].at_risk == 0


def test_t_closeness_overflow_guard_fires(spark):
    """The scaled numerator 1e6*tvd_num can reach 2e6*k*N, so the guard
    is scoped to the PRODUCT k*n_total (not n_total alone): it must
    raise loudly on forged rows where k*N exceeds the bound — including
    the adversarial shape where n_total alone looks moderate (1e9) but
    a large class pushes k*N over — and pass values through unchanged
    under the bound."""
    import pytest

    from hotdog_spark.operators.privacy import (
        T_CLOSENESS_KN_BOUND,
        _guarded_tvd_ppm,
    )

    # n_total huge on its own
    over = spark.createDataFrame(
        [(10, 300, T_CLOSENESS_KN_BOUND)],
        "k long, tvd_num long, n_total long",
    )
    with pytest.raises(Exception, match="exceeds the"):
        over.select(_guarded_tvd_ppm()).collect()

    # the under-scoped-guard counterexample: n_total=1e9 (old per-N
    # bound passed), k=10_000 -> k*N = 1e13 > 4.6e12; tvd_num ~ 2*k*N*0.5
    # would make 1e6*tvd_num ~ 1e19 > 2^63 and wrap silently without
    # the product-scoped guard.
    sneaky = spark.createDataFrame(
        [(10_000, 10_000_000_000_000, 1_000_000_000)],
        "k long, tvd_num long, n_total long",
    )
    with pytest.raises(Exception, match="exceeds the"):
        sneaky.select(_guarded_tvd_ppm()).collect()

    # just under the product bound: passes and stays exact
    under = spark.createDataFrame(
        [(10, 300, 30)], "k long, tvd_num long, n_total long"
    )
    [row] = under.select(_guarded_tvd_ppm()).collect()
    assert row.tvd_ppm == (1_000_000 * 300) // (2 * 10 * 30)

    # boundary: k*N exactly at the bound is allowed (1e6*tvd_num <=
    # 2e6*k*N = 2^63-1-ish stays representable)
    edge_k = 2
    edge_n = T_CLOSENESS_KN_BOUND // edge_k
    edge = spark.createDataFrame(
        [(edge_k, 2 * edge_k * edge_n, edge_n)],
        "k long, tvd_num long, n_total long",
    )
    [row] = edge.select(_guarded_tvd_ppm()).collect()
    assert row.tvd_ppm == 1_000_000

    # boundary-EXACT (VERDICT r9 #8): the edge case above lands at
    # k*N = BOUND-1 (BOUND is odd, k=2); pin both sides of the guard at
    # exactly the bound with n_total=1, where `k > BOUND div n_total`
    # degenerates to `k > BOUND` — k*N = BOUND passes, BOUND+1 fires.
    at_bound = spark.createDataFrame(
        [(T_CLOSENESS_KN_BOUND, 2 * T_CLOSENESS_KN_BOUND, 1)],
        "k long, tvd_num long, n_total long",
    )
    [row] = at_bound.select(_guarded_tvd_ppm()).collect()
    assert row.tvd_ppm == 1_000_000  # 1e6*2kN div 2kN, exact at the max
    past_bound = spark.createDataFrame(
        [(T_CLOSENESS_KN_BOUND + 1, 1, 1)],
        "k long, tvd_num long, n_total long",
    )
    with pytest.raises(Exception, match="exceeds the"):
        past_bound.select(_guarded_tvd_ppm()).collect()


def test_aho_corasick_merged_outputs_and_overlaps():
    """The automaton's failure-link output merging: a match state must
    also report every needle that is a proper suffix of its path, and
    overlapping occurrences still register each distinct needle."""
    from hotdog_spark.operators.decontam import AhoCorasick

    ac = AhoCorasick([(1, "a b c d e"), (2, "b c"), (3, "c d"), (4, "zz")])
    # text containing needle 1 must ALSO report its inner needles 2, 3
    assert ac.scan_distinct("x a b c d e y") == {1, 2, 3}
    assert ac.scan_distinct("b c d") == {2, 3}
    # overlapping self-repeats: "zzz" contains "zz" twice (overlap)
    assert ac.scan_distinct("zzz") == {4}
    assert ac.scan_distinct("no hits here") == set()
    # partial-word substring semantics: "ab c" does NOT contain "b c"?
    # it does — 'b c' is a raw substring of 'ab c' (exact-substring
    # contract, deliberately tokenization-blind)
    assert ac.scan_distinct("ab cd") == {2}


def test_canary_scan_end_to_end(spark):
    """canary_scan over a small corpus: self-matches, cross-doc exact
    copies, suffix needles, and clean docs."""
    import pandas as pd

    from hotdog_spark.operators.decontam import canary_scan

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "alpha beta gamma delta",      # needle source
                    "x alpha beta gamma delta y",  # contains needle 0
                    "beta gamma x",                # contains needle 9 only
                    "nothing in common",
                ],
            }
        )
    )
    needles = spark.createDataFrame(
        pd.DataFrame(
            {
                "needle_id": [0, 9],
                "needle": ["alpha beta gamma delta", "beta gamma"],
            }
        )
    )
    out = {
        r.doc_id: (r.n_canaries, r.first_canary)
        for r in canary_scan(docs, needles, "text", "doc_id").collect()
    }
    # docs 0 and 1 contain both (needle 9 is a substring of needle 0)
    assert out == {0: (2, 0), 1: (2, 0), 2: (1, 9)}


def test_canary_scan_needle_bound(spark):
    """The bounded-needle-set contract fails loudly rather than
    collecting an unbounded table to the driver."""
    import pandas as pd
    import pytest

    from hotdog_spark.operators.decontam import canary_scan

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["x"]})
    )
    needles = spark.createDataFrame(
        pd.DataFrame({"needle_id": range(10), "needle": ["n"] * 10})
    )
    with pytest.raises(ValueError, match="max_needles"):
        canary_scan(docs, needles, "text", "doc_id", max_needles=5)
