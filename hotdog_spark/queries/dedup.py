"""Dedup operator queries over the `documents` table, each with a DuckDB
oracle reproducing the md5-based hashing bit-for-bit."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hotdog_spark.operators import dedup as ops
from hotdog_spark.queries import register
from hotdog_spark.sources.batch import table

_TOKS = "string_split_regex(trim(lower(text)), '\\s+')"


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS group_size
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one map-side-combinable hash aggregate; the canonical
    doc is the minimum id per content hash."""
    return ops.exact_dedup_groups(table(spark, sf_dir, "documents"), "text", "doc_id")


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             CASE WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
                  ELSE [array_to_string(t[i:i+4], ' ')
                        for i in generate_series(1, len(t)-4)] END AS shingles
      FROM toks
    ), ex AS (
      SELECT doc_id, unnest(shingles) AS shingle FROM sh
    ), sigs0 AS MATERIALIZED (
      SELECT doc_id, band, MIN(substring(md5(shingle), 2 * band + 1, 15)) AS sig
      FROM ex, (SELECT unnest(generate_series(0, 7)) AS band) b
      GROUP BY doc_id, band
    ), sigs AS MATERIALIZED (
      -- the LSH bucket cap, mirrored from the operator BEFORE the
      -- self-join (exactly the Spark plan shape): a (band, sig) bucket
      -- holding more than 1000 docs is a degenerate signature
      -- (Zipf-skewed shingles), not near-duplication
      SELECT s.doc_id, s.band, s.sig FROM sigs0 s
      JOIN (SELECT band, sig FROM sigs0 GROUP BY band, sig
            HAVING COUNT(*) <= 1000) k USING (band, sig)
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM sigs a JOIN sigs b
      ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates: 5-word shingles → 8 band minima
    (overlapping 60-bit windows of ONE md5 per shingle — sf10 measured
    the per-(band,shingle) md5 version at 384 M digest calls, 8× this)
    → bucket join on (band, signature), capped at max_bucket=1000 and
    mirrored in the oracle's HAVING.

    The cap is LOAD-BEARING on realistic text, not defensive: on the
    uniform-31-word corpus the sf10 bucket audit saw max bucket 8 (cap
    never binds — every committed primary-corpus result is identical
    with or without it), but on the Zipf(10k-word) corpus the band
    minima concentrate on globally-common low-hash shingles and the
    uncapped join spilled 59 GB of shuffle at sf10 before filling the
    disk (round-9 measurement).  A bucket that a meaningful fraction of
    the corpus falls into signals a degenerate signature, not
    near-duplication — same contract as the simhash Hamming and
    winnowing caps."""
    return ops.minhash_lsh_pairs(
        table(spark, sf_dir, "documents"), "text", "doc_id", bands=8, k=5,
        max_bucket=1000,
    )


@register(
    "dedup_lsh_recall_report",
    oracle=f"""
    WITH sample AS (
      SELECT doc_id, text FROM documents
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 256
    ), toks AS (
      SELECT doc_id, {_TOKS} AS t FROM sample
    ), sets AS (
      SELECT doc_id, list_distinct(
        CASE WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
             ELSE [array_to_string(t[i:i+4], ' ')
                   for i in generate_series(1, len(t)-4)] END) AS sh
      FROM toks
    ), truth AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sets a JOIN sets b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5
    ), ex AS (
      SELECT doc_id, unnest(sh) AS shingle FROM sets
    ), sigs AS (
      SELECT doc_id, band, MIN(substring(md5(shingle), 2 * band + 1, 15)) AS sig
      FROM ex, (SELECT unnest(generate_series(0, 7)) AS band) b
      GROUP BY doc_id, band
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sigs a JOIN sigs b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ), hits AS (
      SELECT t.id_a FROM truth t JOIN cand c
        ON t.id_a = c.id_a AND t.id_b = c.id_b
    )
    SELECT (SELECT COUNT(*) FROM sample) AS n_eval_docs,
           (SELECT COUNT(*) FROM truth) AS n_truth_pairs,
           (SELECT COUNT(*) FROM cand) AS n_lsh_candidates,
           (SELECT COUNT(*) FROM hits) AS n_hits,
           CASE WHEN (SELECT COUNT(*) FROM truth) > 0 THEN
             CAST((SELECT COUNT(*) FROM hits) AS DOUBLE)
               / (SELECT COUNT(*) FROM truth) END AS recall,
           CASE WHEN (SELECT COUNT(*) FROM cand) > 0 THEN
             CAST((SELECT COUNT(*) FROM hits) AS DOUBLE)
               / (SELECT COUNT(*) FROM cand) END AS candidate_precision
    """,
)
def dedup_lsh_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-config eval: recall@jaccard≥0.5 and candidate precision of
    the 8-band/5-word-shingle MinHash-LSH against exact set Jaccard on a
    256-doc deterministic md5 sample (bounded all-pairs FOREVER — the
    quadratic stage never sees the corpus).  The dedup analog of
    ann_recall_report: the number that justifies a bands/k dial before
    running it on 100 TB.  Distinct shingle sets make the sample's
    banding identical to the full-corpus run restricted to it, so
    recall is unbiased over sampled pairs (variance caveat in the
    operator docstring)."""
    return ops.lsh_recall_report(
        table(spark, sf_dir, "documents"), "text", "doc_id",
        sample_n=256, bands=8, k=5, threshold=0.5,
    )


def _simhash_oracle() -> str:
    sums = []
    for j in range(16):
        digit = f"(strpos('0123456789abcdef', substring(h, {j // 4 + 1}, 1)) - 1)"
        bit = f"(({digit} // {2 ** (j % 4)}) % 2)"
        sums.append(f"SUM(2 * {bit} - 1) AS s{j}")
    terms = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {2**j} ELSE 0 END)" for j in range(16)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ), h AS (
      SELECT doc_id, md5(tok) AS h FROM tok
    ), bits AS (
      SELECT doc_id, {", ".join(sums)} FROM h GROUP BY doc_id
    )
    SELECT doc_id AS id, CAST({terms} AS BIGINT) AS simhash FROM bits
    """


@register("dedup_simhash", oracle=_simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document: token md5 bits summed ±1 — a single
    integer-exact aggregation (near-dups share simhash within small
    Hamming distance)."""
    return ops.simhash16(table(spark, sf_dir, "documents"), "text", "doc_id")


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH rawtoks AS (
      SELECT doc_id, lang, n_chars,
             unnest(list_distinct({_TOKS})) AS tok
      FROM documents
    ), bn AS (
      SELECT lang, COUNT(*) AS _bn FROM documents GROUP BY lang
    ), toks AS (
      -- SCALE-AWARE per-block document-frequency cap: tokens in more
      -- than GREATEST(100, CEIL(0.05 * block_docs)) same-lang docs
      -- leave the token universe (sizes AND intersections).  A fixed
      -- cap collapsed recall to zero at sf1 — both engines agreed,
      -- which is how the bug hid; the proportional cap keeps the skew
      -- guarantee while surviving corpus growth.
      SELECT t.* FROM rawtoks t
      JOIN (SELECT r.lang, r.tok FROM rawtoks r
            JOIN bn ON r.lang = bn.lang
            GROUP BY r.lang, r.tok, bn._bn
            HAVING COUNT(*) <= GREATEST(100, CEIL(0.05 * bn._bn))) keep
        ON t.lang = keep.lang AND t.tok = keep.tok
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM toks a JOIN toks b
        ON a.tok = b.tok AND a.doc_id < b.doc_id
       AND a.lang = b.lang AND abs(a.n_chars - b.n_chars) <= 5
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, inter,
           sa.n_tok + sb.n_tok - inter AS union_n,
           CAST(inter AS DOUBLE) / CAST(sa.n_tok + sb.n_tok - inter AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(inter AS DOUBLE) / CAST(sa.n_tok + sb.n_tok - inter AS DOUBLE) >= 0.2
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked token-set Jaccard: candidates limited to same-language,
    similar-length docs; intersection computed distributively by joining
    exploded distinct tokens.  The scale-aware cap
    max(100, ceil(5% of block)) drops ubiquitous tokens from the token
    universe before the join — the 100 TB skew/blowup guard that, unlike
    a fixed cap, does not silently zero out recall as blocks grow (the
    sf1 run caught exactly that); the oracle applies the identical cap,
    so the match is exact by construction."""
    return ops.ngram_jaccard_pairs(
        table(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        block_cols=["lang"],
        length_col="n_chars",
        length_tol=5,
        threshold=0.2,
        max_df=100,
        max_df_frac=0.05,
    )


@register(
    "dedup_containment",
    oracle=f"""
    WITH rawtoks AS (
      SELECT doc_id, lang, unnest(list_distinct({_TOKS})) AS tok
      FROM documents
    ), bn AS (
      SELECT lang, COUNT(*) AS _bn FROM documents GROUP BY lang
    ), toks AS (
      SELECT t.* FROM rawtoks t
      JOIN (SELECT r.lang, r.tok FROM rawtoks r
            JOIN bn ON r.lang = bn.lang
            GROUP BY r.lang, r.tok, bn._bn
            HAVING COUNT(*) <= GREATEST(100, CEIL(0.05 * bn._bn))) keep
        ON t.lang = keep.lang AND t.tok = keep.tok
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM toks a JOIN toks b
        ON a.tok = b.tok AND a.doc_id < b.doc_id AND a.lang = b.lang
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, inter, sa.n_tok AS n_a, sb.n_tok AS n_b,
           CAST(inter AS DOUBLE) / least(sa.n_tok, sb.n_tok) AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(inter AS DOUBLE) / least(sa.n_tok, sb.n_tok) >= 0.8
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup pairs by token-set containment (|A∩B| over
    the SMALLER set): catches excerpts/quotations that symmetric Jaccard
    dilutes to ~0 when lengths differ 100x.  Same blocked distributive
    join as the Jaccard query, same scale-aware skew cap on both sides."""
    return ops.ngram_containment_pairs(
        table(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        block_cols=["lang"],
        threshold=0.8,
        max_df=100,
        max_df_frac=0.05,
    )


@register(
    "dedup_chunk_boilerplate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ), chunks AS (
      SELECT doc_id, g.i AS idx,
             array_to_string(tk[g.i*10+1 : (g.i+1)*10], ' ') AS chunk
      FROM toks, LATERAL (
        SELECT unnest(generate_series(0, CAST(ceil(len(tk)/10.0) AS INT) - 1)) AS i
      ) g
    ), hot AS (
      SELECT chunk FROM chunks GROUP BY chunk HAVING COUNT(DISTINCT doc_id) > 1
    ), kept AS (
      SELECT c.doc_id, c.idx, c.chunk FROM chunks c
      WHERE c.chunk NOT IN (SELECT chunk FROM hot)
    ), total AS (
      SELECT doc_id, COUNT(*) AS n_chunks FROM chunks GROUP BY doc_id
    ), rebuilt AS (
      SELECT doc_id, string_agg(chunk, ' ' ORDER BY idx) AS clean_text,
             COUNT(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id AS id, COALESCE(r.clean_text, '') AS clean_text,
           t.n_chunks,
           CAST(t.n_chunks - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed
    FROM total t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
    """,
)
def dedup_chunk_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document boilerplate removal (CCNet/Gopher paragraph dedup
    adapted to this corpus's separator-free text): 10-token chunks
    repeated across >1 docs are dropped and each doc reassembled in
    order.  Whole-doc dedup can't catch shared spans; this is the op
    that does.  Chunking is a JVM array projection; the hot-chunk list
    broadcasts; the corpus shuffles once on the chunk key."""
    return ops.dedup_chunks(
        table(spark, sf_dir, "documents"), "text", "doc_id",
        chunk_tokens=10, max_docs=1,
    ).withColumn("n_chunks", F.col("n_chunks").cast("bigint"))


_BUCKET24 = " || ".join(
    f"(CASE WHEN qv[{i}] >= 0 THEN '1' ELSE '0' END)" for i in range(1, 25)
)
_QUANT_EMB = "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id,
             list_transform(embedding, x -> x * CAST(1.01 AS DOUBLE)) AS embedding
      FROM embeddings WHERE vec_id % 20 = 0
    ), n AS (
      SELECT vec_id, {_QUANT_EMB} AS qv,
             list_sum(list_transform({_QUANT_EMB}, x -> x * x)) AS n2
      FROM corpus
    ), params AS (
      SELECT GREATEST(8, LEAST(24,
        CAST(ceil(log2(CAST(COUNT(*) AS DOUBLE) / 64.0)) AS INT))) AS bits
      FROM corpus
    ), b AS (
      SELECT vec_id, qv, n2,
             substring({_BUCKET24}, 1, (SELECT bits FROM params)) AS bucket
      FROM n WHERE n2 > 0
    )
    SELECT a.vec_id AS id_a, c.vec_id AS id_b,
           CAST(list_sum(list_transform(list_zip(a.qv, c.qv), s -> s[1] * s[2])) AS DOUBLE)
             / sqrt(CAST(a.n2 * c.n2 AS DOUBLE)) AS score
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    WHERE CAST(list_sum(list_transform(list_zip(a.qv, c.qv), s -> s[1] * s[2])) AS DOUBLE)
            / sqrt(CAST(a.n2 * c.n2 AS DOUBLE)) >= 0.99
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: sign-bucket blocking + exact cosine ≥
    0.99 within buckets.  The corpus is augmented with deterministically
    perturbed copies (×1.01 scaling of every 20th vector) so the operator
    provably recovers planted near-duplicates — the synthetic embeddings
    have no natural ones (max pairwise cosine ≈ 0.55).

    BUCKET BITS SCALE WITH THE CORPUS — bits = clamp(⌈log2(n/64)⌉, 8, 24)
    — keeping expected bucket size (and so pair volume per bucket)
    constant as n grows: sf10 measured the fixed-8-bit version going
    quadratic (19.6× time for 10× rows) because 256 buckets means bucket
    size ∝ n.  The oracle derives the same width from the same count and
    takes the same sign-string prefix.  A scaling perturbation preserves
    every sign, so planted near-dup recall is invariant to the width —
    only the candidate volume changes."""
    import math

    from hotdog_spark.operators import similarity as sim

    emb = table(spark, sf_dir, "embeddings")
    planted = emb.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.01)).alias("embedding"),
    )
    corpus = emb.select("vec_id", "embedding").unionByName(planted)
    n = corpus.count()
    bits = max(8, min(24, math.ceil(math.log2(n / 64.0))))
    return sim.near_dup_pairs(corpus, "embedding", "vec_id", threshold=0.99, bits=bits)


_MINHASH_PAIRS_SQL = f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             CASE WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
                  ELSE [array_to_string(t[i:i+4], ' ')
                        for i in generate_series(1, len(t)-4)] END AS shingles
      FROM toks
    ), ex AS (
      SELECT doc_id, unnest(shingles) AS shingle FROM sh
    ), sigs0 AS MATERIALIZED (
      SELECT doc_id, band, MIN(substring(md5(shingle), 2 * band + 1, 15)) AS sig
      FROM ex, (SELECT unnest(generate_series(0, 7)) AS band) b
      GROUP BY doc_id, band
    ), sigs AS MATERIALIZED (
      -- the LSH bucket cap, mirrored from the operator BEFORE the
      -- self-join (exactly the Spark plan shape): a (band, sig) bucket
      -- holding more than 1000 docs is a degenerate signature
      -- (Zipf-skewed shingles), not near-duplication
      SELECT s.doc_id, s.band, s.sig FROM sigs0 s
      JOIN (SELECT band, sig FROM sigs0 GROUP BY band, sig
            HAVING COUNT(*) <= 1000) k USING (band, sig)
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM sigs a JOIN sigs b
      ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
"""


#: Rounds of unrolled min-label propagation in the components oracle.
#: Measured fixpoint depth on the LSH pair graph: 1 round at sf0.01,
#: 2 at sf0.1, 6 at sf1, 23 at sf10 — 32 leaves ~40% headroom at the
#: largest verified scale.  If a future corpus ever needed more rounds
#: the oracle's labels would differ from the engine's CONVERGED labels
#: and the digest comparison would fail loudly (a safe failure, never a
#: silent pass).
_PROP_ROUNDS = 32


def _components_oracle(
    final_select: str,
    rounds: int = _PROP_ROUNDS,
    pairs_sql: str | None = None,
) -> str:
    """Connected-components oracle via UNROLLED min-label propagation —
    replaces the r5/r6 recursive-CTE transitive closure whose ``reach``
    relation grows with sum(component_size²) (measured 17+ min / 36.7 GB
    at sf10, unfinished).  Propagation keeps ONE label per vertex per
    round, so each round is a single |E| hash join: the whole oracle ran
    in ~35 s at sf10.  Same unrolled-CTE trick as the BPE oracle
    (queries/_bpe_oracle.py); ``final_select`` consumes the converged
    labels from the ``comp(id, component)`` CTE."""
    ctes = [
        f"pairs AS MATERIALIZED ({pairs_sql or _MINHASH_PAIRS_SQL})",
        """e AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    )""",
        """v0 AS MATERIALIZED (
      SELECT src AS id, LEAST(src, MIN(dst)) AS lbl FROM e GROUP BY src
    )""",
    ]
    for r in range(1, rounds + 1):
        ctes.append(f"""v{r} AS MATERIALIZED (
      SELECT e.src AS id, LEAST(MIN(own.lbl), MIN(nb.lbl)) AS lbl
      FROM e JOIN v{r - 1} own ON own.id = e.src
             JOIN v{r - 1} nb ON nb.id = e.dst
      GROUP BY e.src
    )""")
    ctes.append(f"comp AS (SELECT id, lbl AS component FROM v{rounds})")
    return "WITH " + ",\n    ".join(ctes) + "\n    " + final_select


@register(
    "dedup_minhash_components",
    oracle=_components_oracle("SELECT id, component FROM comp"),
)
def dedup_minhash_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization of MinHash near-dup clusters: connected components
    (min-label propagation, O(diameter) shuffle rounds) over the LSH pair
    graph; component = min doc_id = the document to keep.  The oracle
    runs the SAME min-label propagation, unrolled to a fixed round count
    (see _components_oracle) — linear per round, unlike the recursive
    transitive closure it replaced, which made this query sf10-intractable
    on the oracle side."""
    pairs = ops.minhash_lsh_pairs(
        table(spark, sf_dir, "documents"), "text", "doc_id", bands=8, k=5,
        max_bucket=1000,
    )
    # minhash_lsh_pairs ends in .distinct() with id_a < id_b
    return ops.connected_components(pairs, pairs_unique=True)


_LEAK_SPLIT = (
    "CASE WHEN substring(md5(CAST({id} AS VARCHAR)), 1, 4) < '4ccc' "
    "THEN 'test' ELSE 'train' END"
)


@register(
    "split_leakage_report",
    oracle=f"""
    WITH pairs AS ({_MINHASH_PAIRS_SQL}),
    near AS (
      SELECT id_a, id_b,
             {_LEAK_SPLIT.format(id='id_a')} AS split_a,
             {_LEAK_SPLIT.format(id='id_b')} AS split_b
      FROM pairs
    ),
    near_x AS (
      SELECT CASE WHEN split_a = 'train' THEN id_a ELSE id_b END AS train_id,
             CASE WHEN split_a = 'train' THEN id_b ELSE id_a END AS test_id
      FROM near WHERE split_a != split_b
    ),
    ex AS (
      SELECT MIN(CASE WHEN split = 'train' THEN doc_id END) AS train_id,
             MIN(CASE WHEN split = 'test' THEN doc_id END) AS test_id
      FROM (
        SELECT doc_id, md5(text) AS h,
               {_LEAK_SPLIT.format(id='doc_id')} AS split
        FROM documents
      ) GROUP BY h
      HAVING COUNT(CASE WHEN split = 'train' THEN 1 END) > 0
         AND COUNT(CASE WHEN split = 'test' THEN 1 END) > 0
    )
    SELECT train_id, test_id, 'near' AS kind FROM near_x
    UNION ALL
    SELECT train_id, test_id, 'exact' AS kind FROM ex
    """,
)
def split_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination audit: duplicates that CROSS the split
    boundary — the leakage an eval score silently inherits when dedup
    runs before splitting but not across it (public finding: benchmark
    contamination sections of the GPT-3/C4 papers).

    Two detection tiers, two scale shapes:

    * ``exact`` — one row per leaked content-hash GROUP (lowest train
      member, lowest test member, via conditional mins on one hash
      aggregate).  Group-level, so a pathological 10 k-copy boilerplate
      group emits ONE row, not 10 k² pairs — the output is bounded by
      distinct leaked contents at any corpus size.
    * ``near`` — the proven LSH candidate-pair path (5-word shingles,
      8 bands, one md5 per shingle), filtered to cross-split pairs by
      computing each side's split INLINE from its id (the split rule is
      a pure md5 expression — no join back to the corpus).

    The registered split uses test_frac = 0.30 (prefix < '4ccc') rather
    than the production 0.05: on the ~0.2 %-duplicate synthetic corpus
    a 5 % test slice crosses almost no dup pairs, and an audit whose
    healthy state is empty-by-construction can't be distinguished from
    a broken one.  Production dial: pass the real split fraction.
    Returns (train_id, test_id, kind)."""
    from hotdog_spark.operators.sampling import split_of

    docs = table(spark, sf_dir, "documents")
    test_frac = 0.30
    near = ops.minhash_lsh_pairs(docs, "text", "doc_id", bands=8, k=5, max_bucket=1000)
    sa, sb = split_of(F.col("id_a"), test_frac), split_of(F.col("id_b"), test_frac)
    near_x = (
        near.withColumn("split_a", sa)
        .withColumn("split_b", sb)
        .filter(F.col("split_a") != F.col("split_b"))
        .select(
            F.when(F.col("split_a") == "train", F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("train_id"),
            F.when(F.col("split_a") == "train", F.col("id_b"))
            .otherwise(F.col("id_a"))
            .alias("test_id"),
            F.lit("near").alias("kind"),
        )
    )
    hashed = docs.select(
        F.md5("text").alias("h"),
        "doc_id",
        split_of(F.col("doc_id"), test_frac).alias("split"),
    )
    is_train = F.col("split") == "train"
    exact = (
        hashed.groupBy("h")
        .agg(
            F.min(F.when(is_train, F.col("doc_id"))).alias("train_id"),
            F.min(F.when(~is_train, F.col("doc_id"))).alias("test_id"),
            F.count(F.when(is_train, F.lit(1))).alias("n_train"),
            F.count(F.when(~is_train, F.lit(1))).alias("n_test"),
        )
        .filter((F.col("n_train") > 0) & (F.col("n_test") > 0))
        .select("train_id", "test_id", F.lit("exact").alias("kind"))
    )
    return near_x.unionByName(exact)


@register(
    "dedup_exact_applied",
    oracle="""
    SELECT MIN(doc_id) AS keep_id,
           arg_min(text, doc_id) AS text_kept,
           COUNT(*) AS group_size
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact_applied(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Applied exact dedup: the surviving corpus itself (kept doc id +
    payload + collapsed count) in ONE aggregate — min_by carries the
    kept payload so there is no join-back shuffle."""
    return ops.apply_exact_dedup(table(spark, sf_dir, "documents"), "text", "doc_id")


@register(
    "dedup_incremental_ingest",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             substring(md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), 1, 16) AS fp,
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000' AS is_old
      FROM documents
    ), idx AS (SELECT DISTINCT fp FROM f WHERE is_old)
    SELECT fp, MIN(doc_id) AS keep_id
    FROM f
    WHERE NOT is_old AND fp NOT IN (SELECT fp FROM idx)
    GROUP BY fp
    """,
)
def dedup_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus ingestion: the md5<'8000' half plays the already
    -indexed corpus; the rest is the ingest batch, admitted only when its
    fingerprint is new (anti-join) and unique within the batch.  The full
    corpus is never re-deduped."""
    from hotdog_spark.operators.dedup import incremental_dedup
    from hotdog_spark.operators.textops import fingerprint_expr

    docs = table(spark, sf_dir, "documents")
    is_old = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4) < F.lit("8000")
    index = (
        docs.filter(is_old)
        .select(fingerprint_expr(F.col("text")).alias("fp"))
        .distinct()
    )
    return incremental_dedup(docs.filter(~is_old), index, "text", "doc_id")


@register(
    "dedup_fuzzy_levenshtein",
    oracle="""
    WITH blocked AS (
      SELECT doc_id, text,
             len(string_split_regex(trim(lower(text)), '\\s+')) AS n,
             string_split_regex(trim(lower(text)), '\\s+')[1] AS t0
      FROM documents
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           levenshtein(a.text, b.text) AS dist
    FROM blocked a JOIN blocked b ON a.n = b.n AND a.t0 = b.t0
    WHERE a.doc_id < b.doc_id AND levenshtein(a.text, b.text) <= 120
    """,
)
def dedup_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy near-dup pairs by edit distance with (token-count, first
    token) blocking — the exact-verification stage fuzzy dedup runs on
    LSH/blocked candidates, never on all pairs.  (Threshold 120: the
    synthetic corpus has no exact dups; its nearest blocked pairs sit at
    distance ≥ 41.)"""
    from hotdog_spark.operators.dedup import fuzzy_pairs_levenshtein

    return fuzzy_pairs_levenshtein(
        table(spark, sf_dir, "documents"), "text", "doc_id", max_dist=120
    )


@register(
    "dedup_provenance_report",
    oracle=f"""
    WITH ex AS (
      SELECT doc_id,
             doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text))
               AS is_exact_dup
      FROM documents
    ), pairs AS ({_MINHASH_PAIRS_SQL}),
    nd AS (SELECT DISTINCT id_b AS doc_id FROM pairs)
    SELECT e.doc_id,
           e.is_exact_dup,
           (nd.doc_id IS NOT NULL) AS is_near_dup,
           CASE WHEN e.is_exact_dup THEN 'exact'
                WHEN nd.doc_id IS NOT NULL THEN 'near_dup'
                ELSE 'kept' END AS removal_stage
    FROM ex e LEFT JOIN nd USING (doc_id)
    """,
)
def dedup_provenance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document dedup PROVENANCE — the audit trail a production
    corpus wash must keep (why did each document survive or not):
    exact-duplicate flag (not the min-id of its content-hash group),
    near-duplicate flag (appears as the larger id in a MinHash-LSH
    pair), and the first-match removal stage ('exact' wins over
    'near_dup' wins over 'kept' — the same cascade priority the applied
    dedup pipeline uses).  Composes the exact-hash aggregate and the
    LSH pair join, both already oracle-backed; adds one window over the
    content hash and one left anti-ish join — no new shuffle class."""
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents")
    ex = docs.select(
        "doc_id",
        (
            F.col("doc_id")
            != F.min("doc_id").over(Window.partitionBy(F.md5("text")))
        ).alias("is_exact_dup"),
    )
    nd = (
        ops.minhash_lsh_pairs(docs, "text", "doc_id", bands=8, k=5, max_bucket=1000)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
        .withColumn("_nd", F.lit(True))
    )
    j = ex.join(nd, "doc_id", "left")
    return j.select(
        "doc_id",
        "is_exact_dup",
        F.coalesce(F.col("_nd"), F.lit(False)).alias("is_near_dup"),
        F.when(F.col("is_exact_dup"), F.lit("exact"))
        .when(F.coalesce(F.col("_nd"), F.lit(False)), F.lit("near_dup"))
        .otherwise(F.lit("kept"))
        .alias("removal_stage"),
    )


#: Sampled-key thresholds for the sf10-verifiable fuzzy twin, keyed on
#: corpus size so the sample is NEVER empty at the driver's sf0.01 gate
#: (VERDICT r7 item 1: a 1/256 sample of 500 docs yielded 0 pairs — a
#: vacuous green).  First two md5 hex chars < thr keeps ~int(thr,16)/256
#: of doc ids:
#:   n ≤ 1,000   → '20' (1/8):   1 pair at sf0.001, 2 at sf0.01
#:   n ≤ 10,000  → '04' (1/64):  22 pairs at sf0.1
#:   n > 10,000  → '01' (1/256): 351 at sf1; ≈1,973 of 500k ids at sf10
#:                 → 172k blocked candidates, oracle measured 44 s.
#: All measured against the committed synthetic tables; the tier bound
#: is derived from count(*) on the SAME table in both engines, so the
#: Spark query and the DuckDB oracle always pick the same tier.
_FUZZY_TIERS = ((1_000, "20"), (10_000, "04"))
_FUZZY_THR_DEFAULT = "01"
_FUZZY_THR_SQL = (
    "CASE WHEN (SELECT count(*) FROM documents) <= 1000 THEN '20' "
    "WHEN (SELECT count(*) FROM documents) <= 10000 THEN '04' "
    "ELSE '01' END"
)


def _fuzzy_sample_thr(n_docs: int) -> str:
    for bound, thr in _FUZZY_TIERS:
        if n_docs <= bound:
            return thr
    return _FUZZY_THR_DEFAULT


@register(
    "dedup_fuzzy_levenshtein_sampled",
    oracle=f"""
    WITH blocked AS (
      SELECT doc_id, text,
             len(string_split_regex(trim(lower(text)), '\\s+')) AS n,
             string_split_regex(trim(lower(text)), '\\s+')[1] AS t0
      FROM documents
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           levenshtein(a.text, b.text) AS dist
    FROM blocked a JOIN blocked b ON a.n = b.n AND a.t0 = b.t0
    WHERE a.doc_id < b.doc_id
      AND substring(md5(CAST(a.doc_id AS VARCHAR)), 1, 2)
          < ({_FUZZY_THR_SQL})
      AND levenshtein(a.text, b.text) <= 120
    """,
)
def dedup_fuzzy_levenshtein_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled-key twin of dedup_fuzzy_levenshtein (VERDICT r6 item 3):
    the SAME blocking + exact-Levenshtein semantics, restricted to pairs
    whose lower doc id falls in a deterministic md5 sample.  The full
    query's oracle is measured-intractable at sf10 (every blocked
    candidate pays an O(len²) edit distance); the sampled population
    keeps the verification honest at every scale — same trick as the
    LSH recall reports' sample-bounded ground truth.

    The sample fraction is corpus-size-keyed (VERDICT r7 item 1) so the
    result is nonempty at every verified scale: both the Spark side
    (a count() here — parquet-footer cheap) and the oracle (a scalar
    count(*) subquery) derive the tier from the same table, so they
    cannot disagree."""
    from hotdog_spark.operators.dedup import fuzzy_pairs_levenshtein

    docs = table(spark, sf_dir, "documents")
    thr = _fuzzy_sample_thr(docs.count())
    sampled = (
        F.substring(F.md5(F.col("id").cast("string")), 1, 2) < F.lit(thr)
    )
    return fuzzy_pairs_levenshtein(
        docs, "text", "doc_id", max_dist=120, left_filter=sampled,
    )


from hotdog_spark.queries.text import _QUALITY_SQL as _QSQL

_BEST_QUALITY_ORACLE = _components_oracle(f"""SELECT component, n_members, best_id, best_quality FROM (
  SELECT c.component, c.id AS best_id, q.quality AS best_quality,
         COUNT(*) OVER (PARTITION BY c.component) AS n_members,
         ROW_NUMBER() OVER (PARTITION BY c.component
                            ORDER BY q.quality DESC, c.id) AS rn
  FROM comp c JOIN (SELECT doc_id, {_QSQL} AS quality FROM documents) q
    ON c.id = q.doc_id
) t WHERE rn = 1""")


@register("dedup_components_best_quality", oracle=_BEST_QUALITY_ORACLE)
def dedup_components_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection: within each MinHash near-dup
    component keep the HIGHEST-quality member (ties → lowest id) instead
    of the arbitrary min-id — the policy real corpus washes use.  One
    ranking window over the (tiny) component assignment joined to the
    quality projection."""
    from pyspark.sql.window import Window

    from hotdog_spark.operators.textops import quality_expr

    docs = table(spark, sf_dir, "documents")
    pairs = ops.minhash_lsh_pairs(docs, "text", "doc_id", bands=8, k=5, max_bucket=1000)
    comp = ops.connected_components(pairs, pairs_unique=True)
    q = docs.select("doc_id", quality_expr(F.col("text")).alias("quality"))
    j = comp.join(q, comp.id == q.doc_id).select("component", "id", "quality")
    w = Window.partitionBy("component").orderBy(F.col("quality").desc(), F.col("id"))
    return (
        j.withColumn("n_members", F.count(F.lit(1)).over(Window.partitionBy("component")))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "component",
            "n_members",
            F.col("id").alias("best_id"),
            F.col("quality").alias("best_quality"),
        )
    )


@register(
    "dedup_minhash_jaccard_estimate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             CASE WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
                  ELSE [array_to_string(t[i:i+4], ' ')
                        for i in generate_series(1, len(t)-4)] END AS shingles
      FROM toks
    ), ex AS (
      SELECT doc_id, unnest(shingles) AS shingle FROM sh
    ), sigs AS MATERIALIZED (
      SELECT doc_id, band, MIN(substring(md5(shingle), 2 * band + 1, 15)) AS sig
      FROM ex, (SELECT unnest(generate_series(0, 7)) AS band) b
      GROUP BY doc_id, band
    ), csigs AS MATERIALIZED (
      -- bucket cap applied BEFORE candidate generation (Spark plan
      -- shape); the per-pair agreement join below still reads the FULL
      -- signature table, mirroring the operator
      SELECT s.doc_id, s.band, s.sig FROM sigs s
      JOIN (SELECT band, sig FROM sigs GROUP BY band, sig
            HAVING COUNT(*) <= 1000) k USING (band, sig)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM csigs a JOIN csigs b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           CAST(SUM(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END) AS BIGINT)
             AS matching_bands,
           CAST(CAST(SUM(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END) AS BIGINT)
                AS DOUBLE) / 8.0 AS est_jaccard
    FROM cand c
    JOIN sigs sa ON sa.doc_id = c.id_a
    JOIN sigs sb ON sb.doc_id = c.id_b AND sb.band = sa.band
    GROUP BY c.id_a, c.id_b
    """,
)
def dedup_minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash similarity ESTIMATION (LSH stage 2): for every band-bucket
    candidate pair, the fraction of agreeing band signatures — an
    unbiased Jaccard estimate that gates which pairs earn an exact
    comparison.  Signatures built once and persisted; per-pair cost is
    exactly 8 comparison rows via two id-keyed joins."""
    return ops.minhash_jaccard_estimates(
        table(spark, sf_dir, "documents"), "text", "doc_id", bands=8, k=5,
        max_bucket=1000,
    )


@register(
    "dedup_prefix_filter_jaccard",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), ex AS MATERIALIZED (
      SELECT doc_id, unnest(ta) AS tok FROM (
        SELECT doc_id,
               list_distinct(list_transform(
                 CASE WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
                      ELSE [array_to_string(t[i:i+4], ' ')
                            for i in generate_series(1, len(t)-4)] END,
                 s -> list_sum(list_transform(generate_series(1,15), i -> CAST(strpos('0123456789abcdef', substring(md5(s), i, 1)) - 1 AS BIGINT) * CAST(pow(16, 15 - i) AS BIGINT))))) AS ta
        FROM w)
    ), sized AS MATERIALIZED (
      SELECT doc_id, COUNT(*) AS sz FROM ex GROUP BY doc_id
    ), dfreq AS (
      SELECT tok, COUNT(*) AS df FROM ex GROUP BY tok
    ), pref AS MATERIALIZED (
      SELECT doc_id, sz, tok AS ptok FROM (
        SELECT e.doc_id, s.sz, e.tok,
               row_number() OVER (PARTITION BY e.doc_id ORDER BY d.df, e.tok) AS rn
        FROM ex e JOIN dfreq d ON e.tok = d.tok JOIN sized s ON e.doc_id = s.doc_id)
      WHERE rn <= sz - CEIL(0.8 * sz) + 1
    ), cand AS MATERIALIZED (
      SELECT DISTINCT ON (a.doc_id, b.doc_id)
             a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sz_a, b.sz AS sz_b
      FROM pref a JOIN pref b
        ON a.ptok = b.ptok AND a.doc_id < b.doc_id
       AND CAST(b.sz AS DOUBLE) >= 0.8 * CAST(a.sz AS DOUBLE)
       AND CAST(a.sz AS DOUBLE) >= 0.8 * CAST(b.sz AS DOUBLE)
    ), verified AS (
      SELECT c.id_a, c.id_b, c.sz_a, c.sz_b, COUNT(*) AS inter_n
      FROM cand c
      JOIN ex ea ON ea.doc_id = c.id_a
      JOIN ex eb ON eb.doc_id = c.id_b AND eb.tok = ea.tok
      GROUP BY c.id_a, c.id_b, c.sz_a, c.sz_b
    )
    SELECT id_a, id_b,
           CAST(inter_n AS BIGINT) AS inter_n,
           CAST(sz_a + sz_b - inter_n AS BIGINT) AS union_n,
           CAST(inter_n AS DOUBLE) / CAST(sz_a + sz_b - inter_n AS DOUBLE) AS jaccard
    FROM verified
    WHERE CAST(inter_n AS DOUBLE) / CAST(sz_a + sz_b - inter_n AS DOUBLE) >= 0.8
    """,
)
def dedup_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-similarity join with PREFIX FILTERING (PPJoin family): pairs
    with 5-word-shingle-set Jaccard >= 0.8, candidates generated ONLY
    from each document's rare-shingle prefix (|x| - ceil(0.8|x|) + 1
    elements ordered by ascending global document frequency), pruned
    further by PPJoin's positional upper bound (lossless — see the
    operator).  Elements travel as md5-int60 hashes (8-byte keys instead
    of ~45-byte shingle strings; the oracle reproduces the identical
    integers digit-by-digit, so any collision merges the same pair of
    shingles in both engines).  Shingles (not tokens) keep the element
    space Zipf-like so the filter actually prunes — see the operator
    docstring for the measured token-set failure mode on a
    small-vocabulary corpus.

    Oracle note (sf10-caught): the oracle is deliberately RELATIONAL —
    no list-typed column survives past the exploded ``ex`` (doc_id, tok)
    CTE.  The original list-shaped form (per-doc ``list(tok ORDER BY
    df)`` aggregate, prefix via list slice + unnest, intersection via
    ``list_intersect`` on joined lists) OOM'd DuckDB at sf10 even at an
    80 GB cap with spill-to-disk enabled, with or without MATERIALIZED
    hints: DuckDB's list aggregate/join operators hold list payloads
    in non-spillable blocks.  This form — prefix via a ``row_number()``
    window (spillable sort), intersection via a candidate-pair join on
    ``ex`` counted with GROUP BY — computes the identical 1,003-pair
    answer at sf10 in 17 s under a 32 GB cap.  The MATERIALIZED hints
    keep the multiply-referenced ``ex``/``sized``/``pref`` CTEs from
    being re-inlined (re-running the md5 shingling up to 3×).  Same
    result set, digest unchanged."""
    return ops.prefix_filter_jaccard_pairs(
        table(spark, sf_dir, "documents"), "text", "doc_id", threshold=0.8
    )


@register(
    "dedup_repeated_ngram_spans",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, {_TOKS} AS ws FROM documents
    ), t AS (
      SELECT doc_id, len(ws) AS n_tokens, ws FROM w WHERE len(ws) >= 5
    ), g AS MATERIALIZED (
      SELECT doc_id, n_tokens, u.i AS pos,
             md5(array_to_string(ws[u.i:u.i+4], ' ')) AS h
      FROM t, LATERAL (SELECT unnest(range(1, len(ws) - 3)) AS i) u
    ), dup AS (
      SELECT h FROM g GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
    ), hits AS (
      SELECT g.doc_id, g.n_tokens, g.pos, g.pos + 4 AS e
      FROM g JOIN dup ON g.h = dup.h
    ), marked AS (
      SELECT doc_id, n_tokens, pos, e,
             CASE WHEN max(e) OVER prev IS NULL
                    OR pos > max(e) OVER prev + 1
                  THEN 1 ELSE 0 END AS ni
      FROM hits
      WINDOW prev AS (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), numbered AS (
      SELECT doc_id, n_tokens, pos, e,
             SUM(ni) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM marked
    ), spans AS (
      SELECT doc_id, n_tokens, island,
             MAX(e) - MIN(pos) + 1 AS span_tokens
      FROM numbered GROUP BY doc_id, n_tokens, island
    )
    SELECT doc_id AS doc,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
           CAST(SUM(span_tokens) AS BIGINT) AS dup_tokens,
           CAST(MAX(span_tokens) AS BIGINT) AS max_span_tokens,
           (1000000 * CAST(SUM(span_tokens) AS BIGINT))
             // CAST(n_tokens AS BIGINT) AS dup_token_ppm
    FROM spans GROUP BY doc_id, n_tokens
    """,
)
def dedup_repeated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-SUBSTRING dedup report (Lee et al. 2021's signal,
    re-expressed as the distributed n-gram blocking scan —
    operators/dedup.py::repeated_ngram_spans): per document, the maximal
    spans of tokens covered by 5-grams occurring in >= 2 distinct
    documents, with coverage ppm.  This is the boilerplate/licence-block
    detector that document-level dedup cannot see.  Plan: digest-keyed
    frequency agg + join back, then a per-doc gaps-and-islands window —
    no Python, no collect."""
    return ops.repeated_ngram_spans(
        table(spark, sf_dir, "documents"), "text", "doc_id", n=5, min_docs=2
    )


def _simhash48_hamming_oracle(
    bits: int = 48,
    n_blocks: int = 4,
    max_hamming: int = 3,
    max_bucket: int = 1000,
) -> str:
    """Replays simhash_bits + blocked Hamming pairing in pure SQL: the
    same hex-digit bit derivation as _simhash_oracle widened to 48 bits,
    the same block split / bucket-size cap / pigeonhole candidate join,
    and the same exact bit_count(xor) verification."""
    hexchars = bits // 4
    width = bits // n_blocks
    mask = (1 << width) - 1
    sums = []
    for j in range(bits):
        digit = f"(strpos('0123456789abcdef', substring(h, {j // 4 + 1}, 1)) - 1)"
        bit = f"(({digit} // {2 ** (j % 4)}) % 2)"
        sums.append(f"SUM(2 * {bit} - 1) AS s{j}")
    terms = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {2**j}::BIGINT ELSE 0 END)"
        for j in range(bits)
    )
    assert hexchars == 12  # bit layout below assumes 12 leading hex chars
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ), h AS (
      SELECT doc_id, md5(tok) AS h FROM tok
    ), bits AS (
      SELECT doc_id, {", ".join(sums)} FROM h GROUP BY doc_id
    ), sh AS MATERIALIZED (
      SELECT doc_id AS id, CAST({terms} AS BIGINT) AS simhash FROM bits
    ), blocks AS MATERIALIZED (
      SELECT id, simhash, b.b AS b, (simhash >> ({width} * b.b)) & {mask} AS bv
      FROM sh, (SELECT unnest(range(0, {n_blocks})) AS b) b
    ), keep AS (
      SELECT b, bv FROM blocks GROUP BY b, bv
      HAVING COUNT(*) <= {max_bucket}
    ), kept AS MATERIALIZED (
      SELECT blocks.* FROM blocks JOIN keep USING (b, bv)
    )
    SELECT DISTINCT a.id AS id_a, c.id AS id_b,
           CAST(bit_count(xor(a.simhash, c.simhash)) AS BIGINT) AS hamming
    FROM kept a JOIN kept c ON a.b = c.b AND a.bv = c.bv AND a.id < c.id
    WHERE bit_count(xor(a.simhash, c.simhash)) <= {max_hamming}
    """


@register("dedup_simhash_hamming", oracle=_simhash48_hamming_oracle())
def dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate PAIRS within Hamming distance 3 — the
    blocked search of Manku, Jain & Das Sarma 2007 (WWW; the production
    near-dup design behind web-crawl dedup), completing the simhash
    family: where `dedup_simhash` emits per-doc hashes, this finds the
    actual pairs, at scale, without all-pairs comparison
    (operators/dedup.py::simhash_hamming_pairs).  48-bit simhash split
    into 4×12-bit blocks; pigeonhole guarantees every Hamming≤3 pair
    agrees on ≥1 block, so candidates come from 4 block-equality
    self-joins (one shuffle keyed on (block, value)) and one exact
    bit_count(xor) verifies each.  Saturated block values (> 1000 docs —
    boilerplate clusters, exact-dedup territory) are excluded by a
    deterministic bucket cap mirrored in the oracle."""
    return ops.simhash_hamming_pairs(
        table(spark, sf_dir, "documents"), "text", "doc_id",
        bits=48, n_blocks=4, max_hamming=3, max_bucket=1000,
    )


@register(
    "dedup_simhash_components",
    oracle=_components_oracle(
        "SELECT id, component FROM comp",
        pairs_sql=(
            "SELECT id_a, id_b FROM (" + _simhash48_hamming_oracle() + ")"
        ),
    ),
)
def dedup_simhash_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization of SIMHASH near-dup clusters — the pairs →
    clusters → canonical composition for the Hamming family, mirroring
    dedup_minhash_components: connected components (min-label
    propagation, O(diameter) shuffle rounds) over the blocked
    Hamming<=3 pair graph; component = min doc_id = the document to
    keep.  The oracle nests the full simhash pair replay inside the
    unrolled-propagation components oracle — two independently-written
    stages composed, both engines end to end."""
    pairs = ops.simhash_hamming_pairs(
        table(spark, sf_dir, "documents"), "text", "doc_id",
        bits=48, n_blocks=4, max_hamming=3, max_bucket=1000,
    ).select("id_a", "id_b")
    # simhash_hamming_pairs ends in .distinct() with id_a < id_b
    return ops.connected_components(pairs, pairs_unique=True)
