"""Property pins for the round-4 scale operators: the algebraic
guarantees each technique is chosen FOR, checked against brute force on
small random inputs (seeded — deterministic in CI).

- prefix filtering is LOSSLESS: exactly the brute-force Jaccard>=t pairs
- CMS never under-counts, and agrees with exact counts when no collision
- Morton interleave is a bijection (round-trips bit-exactly)
- minhash Jaccard estimate is within the binomial envelope for dups
"""

import random

import pytest
from pyspark.sql import functions as F

from hotdog_spark.operators import dedup, sampling


def _random_docs(seed, n_docs=30, vocab=14, min_w=4, max_w=18, dup_frac=0.2):
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    docs = []
    for i in range(n_docs):
        k = rng.randint(min_w, max_w)
        docs.append((i, " ".join(rng.choice(words) for _ in range(k))))
    # plant near-dups: copy an earlier doc, sometimes perturb one word
    for i in range(1, n_docs, int(1 / dup_frac)):
        src = rng.randrange(0, i)
        text = docs[src][1]
        if rng.random() < 0.5:
            toks = text.split()
            toks[rng.randrange(len(toks))] = rng.choice(words)
            text = " ".join(toks)
        docs[i] = (i, text)
    return docs


def _shingle_set(text, k=3):
    toks = text.strip().lower().split()
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


@pytest.mark.parametrize("seed", [7, 21, 99])
def test_prefix_filter_is_lossless(spark, seed):
    """The prefix principle guarantee: the operator's result equals the
    brute-force set of pairs with shingle-set Jaccard >= t — nothing
    missed (losslessness), nothing extra (verification)."""
    t = 0.8
    docs = _random_docs(seed)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.prefix_filter_jaccard_pairs(
            df, "text", "doc_id", threshold=t
        ).collect()
    }
    want = {}
    for i, (ida, ta) in enumerate(docs):
        sa = _shingle_set(ta, k=5)
        for idb, tb in docs[i + 1:]:
            sb = _shingle_set(tb, k=5)
            inter = len(sa & sb)
            j = inter / len(sa | sb)
            if j >= t:
                want[(ida, idb)] = j
    assert set(got) == set(want)
    for pair, j in want.items():
        assert abs(got[pair] - j) < 1e-12


@pytest.mark.parametrize("seed", [3, 42])
def test_minhash_jaccard_estimate_bounds(spark, seed):
    """Exact duplicates must estimate 1.0 (every band minimum agrees);
    all estimates lie in [1/bands, 1] for candidate pairs (a candidate
    shares at least one band by construction)."""
    docs = _random_docs(seed, n_docs=20)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    est = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in dedup.minhash_jaccard_estimates(df, "text", "doc_id").collect()
    }
    text_by_id = dict(docs)
    assert est, "no candidate pairs — seed produced no dups?"
    for (a, b), e in est.items():
        assert 1 / 8 <= e <= 1.0
        if text_by_id[a].strip().lower() == text_by_id[b].strip().lower():
            assert e == 1.0


def test_zorder_key_is_bijective(spark):
    """Morton interleave round-trip vs a pure-python reference over the
    full 5-bit × 5-bit grid — bijection, no collisions, exact values."""
    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", sampling.zorder_key(F.col("x"), F.col("y"), bits=5).alias("z")
        ).collect()
    }

    def ref(x, y):
        z = 0
        for b in range(5):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    assert all(got[(x, y)] == ref(x, y) for x, y in rows)
    assert len(set(got.values())) == len(rows)  # bijective on the grid


def test_knn_graph_hybrid_paths_agree(spark):
    """The literal-centroid and broadcast-table assignment paths must
    produce IDENTICAL graphs — same math, different physical shape."""
    from pyspark.sql import functions as F

    from hotdog_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    kw = dict(centroid_filter=F.col("vid") < 8, k=3, nprobe=2)
    lit_rows = {
        (r.query_id, r.rank): (r.neighbor_id, r.score)
        for r in similarity.knn_graph(
            emb, "embedding", "vec_id", literal_cells_max=16, **kw
        ).collect()
    }
    tab_rows = {
        (r.query_id, r.rank): (r.neighbor_id, r.score)
        for r in similarity.knn_graph(
            emb, "embedding", "vec_id", literal_cells_max=0, **kw
        ).collect()
    }
    assert lit_rows == tab_rows and len(lit_rows) > 0


def test_knn_graph_cells_matches_join_path(spark):
    """The per-cell Arrow-batched matmul twin (knn_graph_cells) must be
    BIT-IDENTICAL to the equi-join formulation — same neighbors, same
    ranks, same float64 scores (the quantized dots stay below 2⁵³, so
    BLAS f64 arithmetic is exact and matches the codegen bigint path)."""
    from pyspark.sql import functions as F

    from hotdog_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    kw = dict(centroid_filter=F.col("vid") < 8, k=3, nprobe=2)
    join_rows = {
        (r.query_id, r.rank): (r.neighbor_id, r.score)
        for r in similarity.knn_graph(emb, "embedding", "vec_id", **kw).collect()
    }
    cell_rows = {
        (r.query_id, r.rank): (r.neighbor_id, r.score)
        for r in similarity.knn_graph_cells(
            emb, "embedding", "vec_id", **kw
        ).collect()
    }
    assert join_rows == cell_rows and len(cell_rows) > 0


def test_winnow_kernel_matches_expression(spark):
    """The Arrow-batched winnowing kernel must produce BIT-IDENTICAL
    (n_grams, fingerprint-set) output to the Catalyst expression path on
    adversarial inputs: empty/short docs, Java-\\s whitespace runs,
    Unicode outside ASCII (NBSP and em-space must NOT be collapsed —
    Python's \\s would, Java's doesn't), casefolding specials (ß, İ),
    and repetitive strings that stress window dedup."""
    from hotdog_spark.operators import textops as T

    texts = [
        (0, "the quick brown fox jumps over the lazy dog " * 5),
        (1, ""),
        (2, "short"),
        (3, "a\t\tb\nc\r\nd   e\x0b f\x0c g"),
        (4, "ÜBER straße İstanbul ß Ω ω"),
        (5, "nb sp and em space stay"),   # Unicode spaces ≠ Java \s
        (6, "x" * 7),
        (7, "  leading and trailing   "),
        (8, "ab" * 300),
        (9, "päivää hyvää " * 40),
        (10, None),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    for k, w in [(8, 4), (20, 4)]:
        expr = {
            r["id"]: (r["n_grams"], list(r["_mins"]))
            for r in T._winnow_mins_expr(df, "text", "doc_id", k, w).collect()
        }
        kern = {
            r["id"]: (r["n_grams"], list(r["_mins"]))
            for r in T._winnow_mins_kernel(df, "text", "doc_id", k, w).collect()
        }
        assert expr == kern and len(kern) == len(texts)


def test_minhash_kernel_matches_expression(spark):
    """The Arrow-batched MinHash signature kernel must be BIT-IDENTICAL
    to the Catalyst expression path on adversarial inputs: empty/short
    docs (whole-text shingle), Java-\\s whitespace runs, Unicode spaces
    that Java \\s must NOT split on, casefolding specials, and long
    repetitive docs."""
    from hotdog_spark.operators import dedup as D

    texts = [
        (0, "the quick brown fox jumps over the lazy dog " * 4),
        (1, ""),
        (2, "one two"),
        (3, "a\t\tb\nc\r\nd   e\x0b f\x0c g h i j"),
        (4, "ÜBER straße İstanbul ß Ω ω alpha beta gamma"),
        (5, "nb sp em space stay one token each word here"),
        (6, "  leading and trailing words here ok   "),
        (7, "rep " * 100),
        (8, None),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    for bands, k in [(8, 5), (4, 3)]:
        expr = {
            (r["id"], r["band"]): r["sig"]
            for r in D._minhash_signatures_expr(
                df, "text", "doc_id", bands, k
            ).collect()
        }
        kern = {
            (r["id"], r["band"]): r["sig"]
            for r in D._minhash_signatures_kernel(
                df, "text", "doc_id", bands, k
            ).collect()
        }
        # the None-text doc gets no signature rows on either path
        assert expr == kern and len(kern) == (len(texts) - 1) * bands


def test_cms_never_undercounts(spark):
    """The count-min guarantee: estimate >= exact for every key, with
    equality when the key's buckets are collision-free."""
    import __spark_entry__ as em

    out = em.queries()["heavy_hitters_cms"](
        spark.newSession(), "/root/testdata/sf0.001"
    ).collect()
    assert len(out) == 10
    for r in out:
        assert r.overcount >= 0
        assert r.est_n == r.exact_n + r.overcount
