"""Text-analysis queries over the `documents` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hotdog_spark.operators import textops as ops
from hotdog_spark.queries import _bpe_oracle as _bpe
from hotdog_spark.queries import register
from hotdog_spark.sources.batch import table

_TOKS = "string_split_regex(trim(lower(text)), '\\s+')"


def _hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in ops.STOPWORDS[lang])
    return f"len(list_filter({_TOKS}, x -> list_contains([{words}], x)))"


@register(
    "profile_source_length_histogram",
    oracle="""
    SELECT source, CAST(length(bin(n_chars)) AS INTEGER) AS log2_bucket,
           COUNT(*) AS n_docs, MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY 1, 2
    """,
)
def profile_source_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length histogram on power-of-two buckets —
    the size-skew report consulted before choosing packing bin sizes,
    shard counts, and maxPartitionBytes for a new corpus drop (a
    source whose mass sits in two adjacent buckets packs very
    differently from one spanning ten).

    The bucket is floor(log2(n_chars)) + 1 computed EXACTLY as the
    binary-digit count ``length(bin(n_chars))`` — a float log2 would
    misbucket values adjacent to powers of two (log2(2^53+2) rounds
    down), and both engines share the digit-count semantics including
    bin(0) = '0' → bucket 1.  One map-side-combinable aggregate over a
    two-column projection; output rows are bounded by
    sources × 64 buckets regardless of corpus size."""
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy(
        "source", F.length(F.bin("n_chars")).cast("int").alias("log2_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").alias("sum_chars"),
    )


@register(
    "text_token_count",
    oracle=f"""
    SELECT doc_id,
           len({_TOKS}) AS ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS lex_tokens
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish lexer token counts (the unit every data-mix
    budget is denominated in)."""
    return ops.token_counts(table(spark, sf_dir, "documents"), "text", "doc_id")


def _langid_case() -> str:
    cases = []
    for lang in ops.LANGS:
        conds = " AND ".join(
            f"{_hits(lang)} >= {_hits(other)}" for other in ops.LANGS if other != lang
        )
        cases.append(f"WHEN {conds} THEN '{lang}'")
    return f"CASE {' '.join(cases)} END"


def _langid_oracle() -> str:
    hits_cols = ", ".join(f"{_hits(lang)} AS hits_{lang}" for lang in ops.LANGS)
    return f"""
    SELECT doc_id,
           {_langid_case()} AS pred_lang,
           {hits_cols}
    FROM documents
    """


_QUALITY_SQL = f"""0.5 * (CAST({_hits('en')} AS DOUBLE) / CAST(len({_TOKS}) AS DOUBLE))
           - 0.3 * (CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
                    / CAST(length(text) AS DOUBLE))
           + 0.02 * (CAST(list_sum(list_transform({_TOKS}, x -> length(x))) AS DOUBLE)
                     / CAST(len({_TOKS}) AS DOUBLE))"""


@register(
    "langid_confusion_matrix",
    oracle=f"""
    SELECT lang, {_langid_case()} AS pred_lang, COUNT(*) AS n_docs
    FROM documents GROUP BY 1, 2
    """,
)
def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic vs the labeled lang column as a confusion
    matrix — the eval a pipeline runs before trusting a heuristic gate
    to filter a corpus (per-class precision/recall are the row/column
    sums).  One map-side aggregate; |langs|² output rows at any
    corpus size."""
    from hotdog_spark.operators.textops import language_confusion

    return language_confusion(table(spark, sf_dir, "documents"), "text", "lang")


@register("text_language_id", oracle=_langid_oracle())
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language ID heuristic with auditable per-language
    hit counts; argmax breaks ties alphabetically."""
    return ops.language_id(table(spark, sf_dir, "documents"), "text", "doc_id")


@register(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id,
           len({_TOKS}) AS n_tokens,
           length(text) AS n_chars_txt,
           len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
           CAST(list_sum(list_transform({_TOKS}, x -> length(x))) AS DOUBLE)
             / CAST(len({_TOKS}) AS DOUBLE) AS mean_tok_len,
           CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
             / CAST(length(text) AS DOUBLE) AS punct_ratio,
           CAST({_hits('en')} AS DOUBLE) / CAST(len({_TOKS}) AS DOUBLE) AS stopword_ratio,
           0.5 * (CAST({_hits('en')} AS DOUBLE) / CAST(len({_TOKS}) AS DOUBLE))
           - 0.3 * (CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
                    / CAST(length(text) AS DOUBLE))
           + 0.02 * (CAST(list_sum(list_transform({_TOKS}, x -> length(x))) AS DOUBLE)
                     / CAST(len({_TOKS}) AS DOUBLE)) AS quality
    FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / punctuation / stopword quality features + combined score;
    all ratios are exact int/int divisions."""
    return ops.quality_score(table(spark, sf_dir, "documents"), "text", "doc_id")


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           substring(md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), 1, 16) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical content fingerprint: md5 of casefolded,
    whitespace-collapsed text (16 hex chars)."""
    return ops.fingerprint(table(spark, sf_dir, "documents"), "text", "doc_id")


@register(
    "text_clean_corpus_pipeline",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id,
             {_QUALITY_SQL} AS quality,
             {_langid_case()} AS pred_lang,
             substring(md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), 1, 16) AS fp
      FROM documents
    ), surv AS (
      SELECT * FROM feats WHERE quality > 0.1 AND pred_lang = 'en'
    )
    SELECT fp, MIN(doc_id) AS keep_id, COUNT(*) AS dup_count,
           arg_min(quality, doc_id) AS keep_quality
    FROM surv GROUP BY fp
    """,
)
def text_clean_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed cleaning pipeline (quality gate → language gate →
    fingerprint dedup) in one scan + one aggregate — the end-to-end shape
    a 100 TB corpus wash actually runs."""
    return ops.clean_corpus(
        table(spark, sf_dir, "documents"), "text", "doc_id", min_quality=0.1, lang="en"
    )


@register(
    "sample_deterministic_docs",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '1999'
    """,
)
def sample_deterministic_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-deterministic ~10% sample (md5 prefix threshold): same
    rows on every engine, every rerun, every parallelism — unlike
    df.sample().  hex_threshold(0.1) == '1999'."""
    from hotdog_spark.operators.sampling import md5_sample

    return md5_sample(
        table(spark, sf_dir, "documents").select("doc_id", "lang"), "doc_id", 0.1
    )


@register(
    "split_train_test_counts",
    oracle="""
    SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '0ccc'
                THEN 'test' ELSE 'train' END AS split,
           COUNT(*) AS n
    FROM documents GROUP BY 1
    """,
)
def split_train_test_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable train/test split assignment (5% test): a key's split never
    changes as the corpus grows.  hex_threshold(0.05) == '0ccc'."""
    from hotdog_spark.operators.sampling import with_split

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return with_split(docs, "doc_id", test_frac=0.05).groupBy("split").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "text_top_terms",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ), cnt AS (
      SELECT doc_id, tok, COUNT(*) AS cnt FROM toks GROUP BY doc_id, tok
    ), r AS (
      SELECT doc_id, tok, cnt,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY cnt DESC, tok) AS rnk
      FROM cnt
    )
    SELECT doc_id, tok, cnt, rnk FROM r WHERE rnk <= 3
    """,
)
def text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 terms by frequency (the TF side of TF-IDF);
    the ranking window rides the (doc, term) aggregation's shuffle."""
    return ops.top_terms(
        table(spark, sf_dir, "documents"), "text", "doc_id", k=3
    ).withColumnRenamed("id", "doc_id")


@register(
    "text_salient_terms",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ), cnt AS (
      SELECT doc_id, tok, COUNT(*) AS cnt FROM toks GROUP BY doc_id, tok
    ), dfreq AS (
      SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok
    ), scored AS (
      SELECT c.doc_id, c.tok, c.cnt, d.df,
             CAST(c.cnt AS DOUBLE) * CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
               / CAST(d.df AS DOUBLE) AS salience
      FROM cnt c JOIN dfreq d ON c.tok = d.tok
    )
    SELECT doc_id, tok, cnt, df, salience, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY salience DESC, tok) AS rnk
      FROM scored
    ) t WHERE rnk <= 3
    """,
)
def text_salient_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 salient terms by tf × (N/df) — the log-free
    IDF weighting (ln's last-ulp divergence between Java Math.log and
    libm breaks cross-engine bit-exactness; * and / are correctly
    rounded, so this score hashes identically everywhere).  Combines the
    TF and DF sides into the keyword-extraction op."""
    return ops.rare_term_salience(
        table(spark, sf_dir, "documents"), "text", "doc_id", k=3
    ).withColumnRenamed("id", "doc_id")


def _cdc_oracle() -> str:
    from hotdog_spark.operators.textops import CDC_DIV, CDC_K, WINNOW_B, WINNOW_M

    k, div, m = CDC_K, CDC_DIV, WINNOW_M
    pw = [pow(WINNOW_B, k - 1 - j, m) for j in range(k)]
    terms = " + ".join(
        f"CAST(ord(substr(s, CAST(i + {j} AS INT), 1)) AS BIGINT) * {pw[j]}"
        for j in range(k)
    )
    return f"""
    WITH t AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
      FROM documents
    ), h AS (
      SELECT doc_id, s,
             CASE WHEN length(s) >= {k}
                  THEN list_transform(generate_series(1, length(s) - {k} + 1),
                                      i -> ({terms}) % {m})
                  ELSE [] END AS hs
      FROM t WHERE length(s) >= 1
    ), b AS (
      SELECT doc_id, s,
             list_concat(list_concat([CAST(1 AS BIGINT)],
                 list_filter(generate_series(CAST(2 AS BIGINT),
                                             CAST(len(hs) AS BIGINT)),
                             i -> hs[i] % {div} = 0)),
                 [CAST(length(s) + 1 AS BIGINT)]) AS bs
      FROM h
    ), c AS (
      SELECT doc_id,
             list_transform(generate_series(1, len(bs) - 1),
                            j -> md5(substr(s, CAST(bs[j] AS INT),
                                            CAST(bs[j+1] - bs[j] AS INT)))) AS chs
      FROM b
    ), inst AS (
      SELECT doc_id, unnest(chs) AS ch FROM c
    ), pdc AS (
      SELECT doc_id, ch, COUNT(*) AS n_occ FROM inst GROUP BY 1, 2
    ), cs AS (
      SELECT ch, MIN(doc_id) <> MAX(doc_id) AS shared FROM pdc GROUP BY ch
    )
    SELECT p.doc_id,
           CAST(SUM(p.n_occ) AS BIGINT) AS n_chunks,
           COUNT(*) AS n_unique,
           CAST(SUM(CASE WHEN cs.shared THEN p.n_occ ELSE 0 END) AS BIGINT)
             AS n_shared,
           CAST((SUM(CASE WHEN cs.shared THEN p.n_occ ELSE 0 END) * 1000000)
                // SUM(p.n_occ) AS BIGINT) AS shared_ppm
    FROM pdc p JOIN cs USING (ch)
    GROUP BY 1
    """


@register("dedup_cdc_chunk_stats", oracle=_cdc_oracle())
def dedup_cdc_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup profile (LBFS/restic-style Rabin
    chunking — Muthitacharoen et al. 2001, public): boundaries wherever
    the rolling 16-gram hash ≡ 0 mod 64, chunks identified by md5, and
    per-document counts of how many chunk instances also occur in other
    documents — the sub-document dedup signal fixed-width chunking
    misses when content shifts.  All-integer output (counts + exact ppm
    via integer division), so the report hash-matches cross-engine.
    See :func:`hotdog_spark.operators.textops.cdc_chunk_stats` for the
    plan shape (array-land chunking, keyed aggregates, AQE-skew-safe
    chunk-hash join; corpus never self-joined)."""
    from hotdog_spark.operators.textops import cdc_chunk_stats

    return cdc_chunk_stats(table(spark, sf_dir, "documents"), "text", "doc_id")


def _winnow_ctes(k: int, w: int) -> str:
    """The shared winnowing CTE chain (t → h → f): normalized text,
    Rabin-Karp k-gram hash list, deduplicated window-minima fingerprint
    list — byte-for-byte the same integers the Spark operator computes."""
    from hotdog_spark.operators.textops import WINNOW_B, WINNOW_M

    m = WINNOW_M
    pw = [pow(WINNOW_B, k - 1 - j, m) for j in range(k)]
    terms = " + ".join(
        f"CAST(ord(substr(s, CAST(i + {j} AS INT), 1)) AS BIGINT) * {pw[j]}"
        for j in range(k)
    )
    return f"""
    WITH t AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
      FROM documents
    ), h AS (
      SELECT doc_id,
             CASE WHEN length(s) >= {k}
                  THEN list_transform(generate_series(1, length(s) - {k} + 1),
                                      i -> ({terms}) % {m})
                  ELSE [] END AS hashes
      FROM t
    ), f AS (
      SELECT doc_id, hashes,
             CASE WHEN len(hashes) >= {w}
                  THEN list_distinct(list_transform(
                         generate_series(1, len(hashes) - {w} + 1),
                         x -> list_min(hashes[x : x + {w} - 1])))
                  ELSE list_distinct(hashes) END AS fps
      FROM h
    )"""


def _winnow_oracle() -> str:
    from hotdog_spark.operators.textops import WINNOW_K, WINNOW_W

    return f"""
    {_winnow_ctes(WINNOW_K, WINNOW_W)}
    SELECT doc_id, CAST(len(hashes) AS BIGINT) AS n_grams,
           CAST(len(fps) AS BIGINT) AS n_fp,
           CAST(COALESCE(list_sum(fps), 0) AS BIGINT) AS fp_sum
    FROM f
    """


@register("text_winnowing_fingerprints", oracle=_winnow_oracle())
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (MOSS, SIGMOD'03) per document: Rabin-Karp
    polynomial k-gram hashes + per-window minima, deduplicated — the
    position-robust fingerprint set (reported as count + exact integer
    sum) that whole-doc hashing can't provide.  Pure array-land JVM
    arithmetic: no explode, no shuffle."""
    from hotdog_spark.operators.textops import winnowing_fingerprints

    return winnowing_fingerprints(
        table(spark, sf_dir, "documents"), "text", "doc_id"
    ).withColumnRenamed("id", "doc_id")


_WP_K, _WP_W, _WP_MAXDF, _WP_MINSHARED = 20, 4, 50, 3


def _winnow_pairs_ctes() -> str:
    """The shared winnowing PAIR chain (… → e → hot → c → p): exploded
    fingerprints, hot-fingerprint removal, thresholded pair aggregate."""
    return f"""
    {_winnow_ctes(_WP_K, _WP_W)}
    , e AS (
      SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fp, unnest(fps) AS fp
      FROM f
    ), hot AS (
      SELECT fp FROM e GROUP BY fp HAVING COUNT(*) > {_WP_MAXDF}
    ), c AS (
      SELECT * FROM e WHERE fp NOT IN (SELECT fp FROM hot)
    ), p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.n_fp AS n_fp_a, b.n_fp AS n_fp_b,
             COUNT(*) AS shared_fp
      FROM c a JOIN c b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
      HAVING COUNT(*) >= {_WP_MINSHARED}
    )"""


def _winnow_pairs_oracle() -> str:
    return f"""
    {_winnow_pairs_ctes()}
    SELECT id_a, id_b, shared_fp, n_fp_a, n_fp_b,
           CAST(shared_fp AS DOUBLE) / least(n_fp_a, n_fp_b) AS overlap
    FROM p
    """


@register("dedup_winnowing_pairs", oracle=_winnow_pairs_oracle())
def dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing overlap detection (MOSS stage 2): document pairs sharing
    >= 3 winnowing fingerprints at k=20 chars.  Hot fingerprints (df > 50
    boilerplate) are removed via a broadcast anti-join BEFORE the
    fingerprint self-join, bounding the candidate blow-up at max_df² per
    fingerprint — the same skew discipline as dedup_ngram_jaccard."""
    from hotdog_spark.operators.textops import winnowing_pairs

    return winnowing_pairs(
        table(spark, sf_dir, "documents"), "text", "doc_id",
        k=_WP_K, w=_WP_W, max_df=_WP_MAXDF, min_shared=_WP_MINSHARED,
    )


@register(
    "dedup_winnowing_pair_stats",
    oracle=f"""
    {_winnow_pairs_ctes()}
    SELECT CAST(id_a % 10 AS BIGINT) AS bucket,
           COUNT(*)::BIGINT AS n_pairs,
           SUM(shared_fp)::BIGINT AS sum_shared_fp,
           MAX(shared_fp)::BIGINT AS max_shared_fp
    FROM p GROUP BY 1
    """,
)
def dedup_winnowing_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded AGGREGATE twin of dedup_winnowing_pairs (VERDICT r6
    item 3): pair count / shared-fingerprint mass per id_a-decile bucket
    (≤10 rows).  The full pair set is answer-proportional — 21.6 M rows
    at sf10 under gram-space saturation — which makes the full-result
    comparison intractable on the ORACLE side there; this report rides
    the identical join and threshold but emits a fixed-size summary, so
    the operator's sf10 semantics stay digest-verified even while the
    row-level twin is excluded."""
    from hotdog_spark.operators.textops import winnowing_pairs

    pairs = winnowing_pairs(
        table(spark, sf_dir, "documents"), "text", "doc_id",
        k=_WP_K, w=_WP_W, max_df=_WP_MAXDF, min_shared=_WP_MINSHARED,
    )
    return pairs.groupBy(
        (F.col("id_a") % 10).cast("bigint").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("shared_fp").alias("sum_shared_fp"),
        F.max("shared_fp").alias("max_shared_fp"),
    )


@register(
    "text_doc_frequency",
    oracle=f"""
    WITH per AS (
      SELECT doc_id, unnest(list_distinct({_TOKS})) AS tok FROM documents
    ), dfreq AS (
      SELECT tok, COUNT(*) AS df FROM per GROUP BY tok
    )
    SELECT tok, df, (SELECT COUNT(*) FROM documents) AS n_docs
    FROM dfreq ORDER BY df DESC, tok LIMIT 20
    """,
)
def text_doc_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 terms by document frequency with the corpus size alongside
    — the exact integer inputs of IDF, engine-identical by construction."""
    return ops.doc_frequency(table(spark, sf_dir, "documents"), "text", "doc_id", top=20)


@register(
    "sample_stratified_by_lang",
    oracle="""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    ) t WHERE rk <= 20
    """,
)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-20-docs-per-language deterministic sample (hash-ordered
    ranking window) — the per-group-quota counterpart of md5_sample."""
    from hotdog_spark.operators.sampling import stratified_sample

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample(docs, "doc_id", "lang", 20)


@register(
    "pack_token_budget_bins",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT doc_id, lang, n_tokens,
             CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         - n_tokens) / 2048.0) AS BIGINT) AS bin
      FROM toks
    )
    SELECT lang, bin, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM packed GROUP BY lang, bin
    """,
)
def pack_token_budget_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing (2048-token bins per language): window cumsum
    → bin id → per-bin totals.  The sequence-packing precursor every LLM
    pretraining pipeline runs; one shuffle per group column."""
    from hotdog_spark.operators.sampling import pack_token_budget

    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("n_tokens"),
    )
    packed = pack_token_budget(docs, "doc_id", "n_tokens", 2048, group_col="lang")
    return packed.groupBy("lang", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )


@register(
    "pack_split_sequences",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tokens
      FROM documents
    ), st AS (
      SELECT doc_id, lang, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tokens AS BIGINT) AS start
      FROM toks WHERE n_tokens > 0
    ), pieces AS (
      SELECT doc_id, lang, n_tokens, start, g.b AS bin,
             CAST(g.b - (start // 2048) AS INT) AS piece_idx,
             CAST(least((g.b + 1) * 2048, start + n_tokens)
                  - greatest(g.b * 2048, start) AS BIGINT) AS piece_tokens
      FROM st, LATERAL (
        SELECT unnest(generate_series(start // 2048,
                                      (start + n_tokens - 1) // 2048)) AS b
      ) g
    )
    SELECT lang, bin, CAST(COUNT(*) AS BIGINT) AS n_pieces,
           CAST(SUM(piece_tokens) AS BIGINT) AS bin_tokens,
           CAST(SUM(CASE WHEN piece_idx > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_continuations
    FROM pieces GROUP BY lang, bin
    """,
)
def pack_split_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing WITH document splitting (2048-token cuts per
    language): every bin is exactly full except each stream's last —
    zero padding waste, the layout pretraining consumes.  Per-bin piece
    counts, token totals and continuation counts verify the split
    arithmetic end-to-end."""
    from hotdog_spark.operators.sampling import pack_split_spans

    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("n_tokens"),
    )
    pieces = pack_split_spans(docs, "doc_id", "n_tokens", 2048, group_col="lang")
    return pieces.groupBy("lang", "bin").agg(
        F.count(F.lit(1)).alias("n_pieces"),
        F.sum("piece_tokens").alias("bin_tokens"),
        F.sum(F.when(F.col("piece_idx") > 0, 1).otherwise(0)).alias(
            "n_continuations"
        ),
    )


@register(
    "corpus_mix_report",
    oracle="""
    WITH feats AS (
      SELECT lang,
             len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tokens,
             md5(text) AS content_hash,
             CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '0ccc'
                  THEN 'test' ELSE 'train' END AS split
      FROM documents
    )
    SELECT lang, split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           COUNT(DISTINCT content_hash) AS n_unique,
           COUNT(*) - COUNT(DISTINCT content_hash) AS n_dup_rows
    FROM feats GROUP BY lang, split
    """,
)
def corpus_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-mix accounting report every training run starts from:
    per (language, split) — document counts, token budget, exact-dup
    exposure — composed from the split assigner, tokenizer, and content
    hash in ONE scan + ONE aggregate.  The shape that matters at 100 TB:
    corpus accounting costs one pass, not one pass per metric."""
    from hotdog_spark.operators.sampling import with_split

    d = with_split(table(spark, sf_dir, "documents"), "doc_id", test_frac=0.05)
    feats = d.select(
        "lang",
        "split",
        F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("n_tokens"),
        F.md5("text").alias("content_hash"),
    )
    return feats.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.countDistinct("content_hash").alias("n_unique"),
        (F.count(F.lit(1)) - F.countDistinct("content_hash")).alias("n_dup_rows"),
    )


@register(
    "export_shard_manifest",
    oracle="""
    SELECT doc_id,
           CAST((strpos('0123456789abcdef',
                        substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) % 8
                AS INTEGER) AS shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY (strpos('0123456789abcdef',
                           substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) % 8
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS INTEGER) AS pos,
           n_chars
    FROM documents
    """,
)
def export_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-export shard manifest: every document's deterministic
    shard and within-shard position (content-hash order — a reproducible
    global shuffle).  Rerun-, engine- and growth-stable: a doc's shard
    never changes, and within-shard order is independent of source file
    layout.  One hash shuffle on the shard key; at 100 TB the same plan
    feeds partitionBy('shard') ordered writes."""
    from hotdog_spark.operators.sampling import shard_by_hash

    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return shard_by_hash(docs, "doc_id", n_shards=8).select(
        "doc_id", "shard", "pos", "n_chars"
    )


TAXONOMY = {
    "agg": "compute", "hash": "compute", "join": "compute",
    "merge": "compute", "scan": "compute", "sort": "compute",
    "batch": "streaming", "stream": "streaming", "window": "streaming",
    "column": "storage", "data": "storage", "row": "storage", "table": "storage",
}

_TAX_VALUES = ", ".join(f"('{t}', '{c}')" for t, c in sorted(TAXONOMY.items()))


@register(
    "classify_docs_by_taxonomy",
    oracle=f"""
    WITH tax(tok, topic) AS (VALUES {_TAX_VALUES}),
    toks AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ), hits AS (
      SELECT doc_id, topic, COUNT(*) AS hits
      FROM toks JOIN tax USING (tok) GROUP BY doc_id, topic
    )
    SELECT doc_id, topic, hits FROM hits
    QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY hits DESC, topic) = 1
    """,
)
def classify_docs_by_taxonomy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-taxonomy topic tagging: each document labeled with its
    dominant topic by curated-vocabulary hits (broadcast taxonomy join —
    the corpus never shuffles until the per-doc argmax)."""
    from hotdog_spark.operators.textops import classify_by_taxonomy

    return classify_by_taxonomy(
        table(spark, sf_dir, "documents"), "text", "doc_id", TAXONOMY
    ).withColumnRenamed("id", "doc_id")


_BM25_TERMS = ["spark", "window", "merge"]


def _bm25_oracle() -> str:
    dfs = ",\n             ".join(
        f"CAST(SUM(CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    avgdl = "(CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE))"
    contribs = []
    for i, t in enumerate(_BM25_TERMS):
        tf = f"CAST(len(list_filter(b.toks, x -> x = '{t}')) AS DOUBLE)"
        idf = f"(CAST(s.n_docs - s.df_{i} AS DOUBLE) + 0.5) / (CAST(s.df_{i} AS DOUBLE) + 0.5)"
        contribs.append(
            f"{idf} * ({tf} * 2.2) / ({tf} + 1.2 * (0.25 + 0.75 * CAST(b.dl AS DOUBLE) / {avgdl}))"
        )
    score = " + ".join(contribs)
    return f"""
    WITH base AS (
      SELECT doc_id, {_TOKS} AS toks, CAST(len({_TOKS}) AS BIGINT) AS dl
      FROM documents
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS sum_dl,
             {dfs}
      FROM base
    ), scored AS (
      SELECT b.doc_id, b.dl, {score} AS score
      FROM base b, s
    )
    SELECT doc_id, dl, score, rank FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM scored
    ) t WHERE rank <= 20
    """


@register("text_bm25_topk", oracle=_bm25_oracle())
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance top-20 for a fixed 3-term query with the RATIONAL
    (log-free) idf — search-style corpus ranking as one tiny stats
    aggregate broadcast over the scan + sort/limit top-k.  See
    operators/textops.py:bm25_rational_topk for the exactness contract
    (no log; fixed-order float arithmetic)."""
    from hotdog_spark.operators.textops import bm25_rational_topk

    return bm25_rational_topk(
        table(spark, sf_dir, "documents"), "text", "doc_id",
        terms=_BM25_TERMS, topk=20,
    ).withColumnRenamed("id", "doc_id")


@register(
    "text_ngram_novelty",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, {_TOKS} AS w FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS g
      FROM words, UNNEST(range(1, len(w) - 3)) AS t(i)
    ), firsts AS (
      SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g
    )
    SELECT grams.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN f.first_doc = grams.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(CAST(SUM(CASE WHEN f.first_doc = grams.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS novelty_ratio
    FROM grams JOIN firsts f ON grams.g = f.g
    GROUP BY grams.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-order n-gram novelty: per document, the fraction of its
    distinct word-5-grams whose FIRST corpus occurrence (min doc_id —
    ingestion order) is this document.  The marginal-value curve of
    incremental data: dropping novelty means new batches repeat the
    corpus.  Plan: distinct 5-grams per doc → one gram-keyed aggregate
    for first-occurrence → join back on the gram key (one row per gram,
    no pair blow-up) → one doc-keyed aggregate.  Docs shorter than 5
    words contribute no grams and drop out (same rule as the
    decontamination gram family)."""
    from hotdog_spark.operators.dedup import normalized_tokens, word_shingles

    docs = table(spark, sf_dir, "documents")
    toks = normalized_tokens(F.col("text"))
    n = F.size(toks)
    grams = (
        docs.select(
            "doc_id",
            F.when(
                n >= 5,
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(0), n - 5),
                        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 5)),
                    )
                ),
            ).alias("_g"),
        )
        .filter(F.col("_g").isNotNull())
        .select("doc_id", F.explode_outer("_g").alias("g"))
        .filter(F.col("g").isNotNull())
    )
    firsts = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    joined = grams.join(firsts, "g")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum((F.col("first_doc") == F.col("doc_id")).cast("bigint")).alias("n_novel"),
        (
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("bigint")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("novelty_ratio"),
    )


@register(
    "quality_lm_bigram",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), bg AS (
      SELECT doc_id, t[i.i] AS w1, t[i.i + 1] AS w2
      FROM t, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) i
      WHERE len(t) >= 2
    ), cb AS (
      SELECT w1, w2, COUNT(*) AS cnt FROM bg GROUP BY w1, w2
    ), cc AS (
      SELECT w1, COUNT(*) AS ctx FROM bg GROUP BY w1
    ), scored AS (
      SELECT g.doc_id,
             CAST(b.cnt AS DOUBLE) / CAST(c.ctx AS DOUBLE) AS p,
             CASE WHEN b.cnt * 200 < c.ctx THEN 1 ELSE 0 END AS rare
      FROM bg g
      JOIN cb b ON g.w1 = b.w1 AND g.w2 = b.w2
      JOIN cc c ON g.w1 = c.w1
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           MIN(p) AS min_p,
           MAX(p) AS max_p,
           CAST(SUM(rare) AS BIGINT) AS n_rare,
           CAST(SUM(rare) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS rare_frac
    FROM scored GROUP BY doc_id
    """,
)
def quality_lm_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM familiarity scoring (CCNet-style corpus quality signal,
    transcendental-free): train MLE p(w2|w1) over the corpus, score each
    document by min/max bigram probability and rare-transition fraction.
    Rarity is an exact integer cross-multiplication (cnt·200 < ctx); the
    emitted floats are exactly-rounded single divisions plus MIN/MAX —
    all accumulation-order-independent.  The operator's mean_p column is
    deliberately NOT emitted here: a per-doc float SUM flips the 10th
    significant digit for ~1-in-10^4 docs at scale (the sf10 digest
    caught exactly that), so the cross-engine contract sticks to
    order-independent columns.  See :func:`hotdog_spark.operators.
    textops.lm_bigram_familiarity` for the 100 TB posture
    (vocabulary-bounded model tables, min-count floor)."""
    return ops.lm_bigram_familiarity(
        table(spark, sf_dir, "documents"), "text", "doc_id", rare_denom=200
    ).select("doc_id", "n_bigrams", "min_p", "max_p", "n_rare", "rare_frac")


@register("bpe_train_merges", oracle=_bpe.bpe_train_oracle(20))
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING over the corpus (Sennrich et al. 2016):
    learn 20 merges from the word-frequency table and return the ordered
    merge table (rank, left, right, weighted pair count).  The training
    loop is iterative argmax-and-rewrite — the same class as the k-means
    trainer — so the DuckDB oracle UNROLLS the 20 rounds into chained
    CTEs (queries/_bpe_oracle.py: pair-count → tie-broken argmax →
    replace()-rewrite per round); correctness is additionally pinned by
    a differential unit test against a loop-reference implementation
    (tests/test_bpe.py) plus hand-checked merges on the classic corpus.
    Scale posture: the corpus is scanned ONCE (token-count aggregate);
    every iteration runs on the vocabulary-bounded (word, cnt, syms)
    table and drives exactly one row to the driver (the argmax)."""
    from hotdog_spark.operators import bpe

    merges = bpe.bpe_train(
        table(spark, sf_dir, "documents"), "text", n_merges=20
    )
    rows = [
        (i, a, b, pc) for i, (a, b, pc) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank long, left string, right string, pair_count long"
    )


@register("bpe_encode_stats", oracle=_bpe.bpe_encode_oracle(20))
def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train 20 BPE merges, then ENCODE every document with the learned
    table (merge list travels in the kernel closure — broadcast-dim
    pattern) and emit exact integer stats: words, token characters, BPE
    tokens, merges applied.  Oracle: the unrolled-CTE replay trains the
    same 20 merges in pure SQL, reads each word's encoded length off the
    final training table, and joins docs→words→lengths
    (queries/_bpe_oracle.py); the arithmetic law n_merges_applied =
    n_chars_tok + n_words - n_bpe_tokens is asserted in tests and makes
    silent encode drift detectable."""
    from hotdog_spark.operators import bpe

    docs = table(spark, sf_dir, "documents")
    merges = bpe.bpe_train(docs, "text", n_merges=20)
    return bpe.bpe_encode_stats(docs, "text", "doc_id", merges)


@register("pack_bpe_token_bins", oracle=_bpe.bpe_pack_oracle(20, 4096))
def pack_bpe_token_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKENIZER-AWARE sequence packing: train 20 BPE merges, encode the
    corpus, and pack documents into 4096-BPE-token bins per language —
    the units a pretraining packer actually budgets by, vs the
    whitespace-token proxy in pack_token_budget_bins.  Composes three
    existing oracle-backed stages (BPE train → encode → offset-division
    packing window); plan shape is the trainer's bounded loop + one
    corpus encode kernel + one doc-keyed join + one window shuffle per
    group column."""
    from hotdog_spark.operators import bpe
    from hotdog_spark.operators.sampling import pack_token_budget

    docs = table(spark, sf_dir, "documents")
    merges = bpe.bpe_train(docs, "text", n_merges=20)
    stats = bpe.bpe_encode_stats(docs, "text", "doc_id", merges).select(
        "doc_id", "n_bpe_tokens"
    )
    joined = docs.select("doc_id", "lang").join(stats, "doc_id")
    packed = pack_token_budget(
        joined, "doc_id", "n_bpe_tokens", 4096, group_col="lang"
    )
    return packed.groupBy("lang", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bpe_tokens").alias("bin_tokens"),
    )


@register("bpe_fertility_by_lang", oracle=_bpe.bpe_fertility_oracle(20))
def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY by language — BPE tokens per word, the
    standard multilingual-tokenizer equity metric (a language whose
    fertility is 2× pays 2× the context budget per sentence; tokenizer
    papers report it before training commits to a vocab).  Composes the
    oracle-backed train → encode chain with one lang-keyed aggregate;
    the ratio is emitted as scaled-integer ppm via exact bigint floor
    division, so the metric itself hash-matches cross-engine (a float
    ratio would not).  Plan shape: the trainer's bounded loop + one
    corpus encode kernel + one doc-keyed join + one 10-row aggregate."""
    from hotdog_spark.operators import bpe

    docs = table(spark, sf_dir, "documents")
    merges = bpe.bpe_train(docs, "text", n_merges=20)
    stats = bpe.bpe_encode_stats(docs, "text", "doc_id", merges).select(
        "doc_id", "n_words", "n_bpe_tokens"
    )
    joined = docs.select("doc_id", "lang").join(stats, "doc_id")
    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("n_words"),
        F.sum("n_bpe_tokens").alias("n_bpe_tokens"),
        F.expr(
            "CAST((1000000 * sum(n_bpe_tokens)) div sum(n_words) AS BIGINT)"
        ).alias("fertility_ppm"),
    )


@register(
    "chunk_documents_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), sized AS (
      SELECT doc_id, t, len(t) AS n,
             CASE WHEN len(t) <= 64 THEN 1
                  ELSE 1 + (len(t) - 64 + 47) // 48 END AS n_chunks
      FROM toks
    ), chunks AS (
      SELECT doc_id, n,
             unnest(generate_series(0, n_chunks - 1)) AS chunk_no,
             t
      FROM sized
    )
    SELECT doc_id, chunk_no,
           chunk_no * 48 AS start_tok,
           LEAST(CAST(64 AS BIGINT), n - chunk_no * 48) AS n_tokens,
           md5(array_to_string(t[chunk_no * 48 + 1 : chunk_no * 48 + 64], ' '))
             AS chunk_md5
    FROM chunks
    """,
)
def chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG/context-window chunking: 64-token windows with stride 48
    (16-token overlap), emitted as (doc_id, chunk_no, start_tok,
    n_tokens, chunk_md5) — the sliding-window segmentation an embedding
    or packing stage consumes.  Chunk count = 1 + ceil((n-64)/48) (one
    chunk for short docs; the final chunk may be partial, and its
    n_tokens says so).  Pure projection + bounded explode (≤ n/48 + 1
    rows per doc), zero shuffle, zero Python — the 100 TB shape for
    corpus re-segmentation.  Fingerprints (md5 of the re-joined window)
    rather than chunk text keep output rows narrow; the text itself is
    a slice away when needed."""
    from pyspark.sql import functions as F

    from hotdog_spark.operators.dedup import normalized_tokens

    CHUNK, STRIDE = 64, 48
    d = table(spark, sf_dir, "documents").select(
        "doc_id", normalized_tokens(F.col("text")).alias("t")
    )
    sized = d.select(
        "doc_id",
        "t",
        F.size("t").alias("n"),
        F.when(F.size("t") <= CHUNK, F.lit(1))
        .otherwise(
            F.lit(1)
            + F.expr(f"(size(t) - {CHUNK} + {STRIDE - 1}) div {STRIDE}")
        )
        .alias("n_chunks"),
    )
    ch = sized.select(
        "doc_id",
        "n",
        "t",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_no"),
    )
    return ch.select(
        "doc_id",
        F.col("chunk_no").cast("bigint").alias("chunk_no"),
        (F.col("chunk_no") * STRIDE).cast("bigint").alias("start_tok"),
        F.least(
            F.lit(CHUNK).cast("bigint"),
            (F.col("n") - F.col("chunk_no") * STRIDE).cast("bigint"),
        ).alias("n_tokens"),
        F.md5(
            F.concat_ws(
                " ", F.slice(F.col("t"), F.col("chunk_no") * STRIDE + 1, CHUNK)
            )
        ).alias("chunk_md5"),
    )


@register(
    "sample_weighted_priority",
    oracle="""
    WITH u AS (
      SELECT doc_id, n_chars,
             list_sum(list_transform(generate_series(1, 15),
               i -> CAST(strpos('0123456789abcdef',
                          substring(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1
                    AS BIGINT) * CAST(pow(16, 15 - i) AS BIGINT))) AS h
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, n_chars,
           CAST(h AS DOUBLE) / n_chars AS priority_key
    FROM u
    ORDER BY priority_key, doc_id
    LIMIT 100
    """,
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic size-weighted sampling: each doc gets priority
    h(doc_id)/weight (md5-int60 hash over its id, divided by n_chars —
    ONE IEEE division, bit-identical cross-engine) and the global
    bottom-k wins.  Heavier docs draw proportionally smaller keys, so
    the sample tilts toward them, yet membership is a pure function of
    (id, weight): rerun-, engine-, and partition-stable, and stable
    under corpus growth (new docs can enter, survivors never reshuffle)
    — the property RNG-based weighted reservoirs lose.  Deliberately
    the linear-race priority (u/w), not A-ES's u^(1/w): the exponential
    form needs ln/pow, whose last-ulp behavior is libm-specific — this
    engine's determinism contract bans transcendentals (see
    oracle-float rules).  Plan shape: a pure projection into a global
    top-k (TakeOrderedAndProject — no full sort materializes)."""
    from pyspark.sql import functions as F

    d = table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    keyed = d.select(
        "doc_id",
        "n_chars",
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
            .cast("bigint")
            .cast("double")
            / F.col("n_chars").cast("double")
        ).alias("priority_key"),
    )
    return keyed.orderBy("priority_key", "doc_id").limit(100)


def _gopher_oracle(min_words: int, min_stop_hits: int) -> str:
    stop_sum = " + ".join(
        f"(CASE WHEN list_contains(toks, '{w}') THEN 1 ELSE 0 END)"
        for w in ops.GOPHER_REQUIRED_STOPS
    )
    return f"""
    WITH t AS (
      SELECT doc_id, text, {_TOKS} AS toks FROM documents
    ), c AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             COALESCE(CAST(list_sum(list_transform(toks, x -> length(x)))
                      AS BIGINT), 0) AS sum_word_len,
             CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS BIGINT)
               AS n_symbols,
             CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
             CAST(len(regexp_extract_all(text, '(?m)^[-*•] ')) AS BIGINT)
               AS n_bullet_lines,
             CAST(len(regexp_extract_all(text, '(?m)\\.\\.\\.$')) AS BIGINT)
               AS n_ellipsis_lines,
             CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
                  AS BIGINT) AS n_alpha_words,
             CAST({stop_sum} AS BIGINT) AS n_required_stops
      FROM t
    )
    SELECT doc_id, n_words, sum_word_len, n_symbols, n_lines,
           n_bullet_lines, n_ellipsis_lines, n_alpha_words, n_required_stops,
           (n_words >= {min_words} AND n_words <= 100000) AS rule_word_count,
           (3 * n_words <= sum_word_len AND sum_word_len <= 10 * n_words)
             AS rule_mean_word_len,
           (10 * n_symbols < n_words) AS rule_symbol_ratio,
           (10 * n_bullet_lines < 9 * n_lines) AS rule_bullet,
           (10 * n_ellipsis_lines < 3 * n_lines) AS rule_ellipsis,
           (5 * n_alpha_words >= 4 * n_words) AS rule_alpha,
           (n_required_stops >= {min_stop_hits}) AS rule_stops,
           ((n_words >= {min_words} AND n_words <= 100000)
            AND (3 * n_words <= sum_word_len AND sum_word_len <= 10 * n_words)
            AND (10 * n_symbols < n_words)
            AND (10 * n_bullet_lines < 9 * n_lines)
            AND (10 * n_ellipsis_lines < 3 * n_lines)
            AND (5 * n_alpha_words >= 4 * n_words)
            AND (n_required_stops >= {min_stop_hits})) AS passes_gopher
    FROM c
    """


@register("text_gopher_rules", oracle=_gopher_oracle(min_words=25, min_stop_hits=1))
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-rule wash (Rae et al. 2021 §A.1.1) — per-document
    counters, the seven rule booleans, and the combined pass flag, all
    integer comparisons (ratio rules via cross-multiplication, so no
    float exists anywhere in the output).

    Corpus-aware dials, documented per the synthetic-testdata posture:
    ``min_words=25`` (the paper's 50 would fail most of this corpus's
    10-60-word docs; 25 splits it) and ``min_stop_hits=1`` (the
    vocabulary contains only 'the' from the paper's required-stopword
    inventory, so the paper's >=2 would zero out the pass branch).
    Line-boundary note: the corpus is newline-free, so Java's
    MULTILINE-``$`` (matches before ``\\r\\n``) and RE2's (before
    ``\\n`` only) cannot diverge here."""
    return ops.gopher_rules(
        table(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        min_words=25,
        min_stop_hits=1,
    )


@register("wordpiece_train_merges", oracle=_bpe.wordpiece_train_oracle(20))
def wordpiece_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece tokenizer TRAINING (Schuster & Nakajima 2012 — the BERT
    tokenizer's selection rule): learn 20 merges by likelihood gain
    count(ab)/(count(a)·count(b)) instead of BPE's raw count, compared
    by exact integer cross-multiplication so the merge table is a pure
    function of the corpus (operators/bpe.py::wordpiece_train; same
    one-scan / vocab-bounded-loop shape as bpe_train).  The DuckDB
    oracle unrolls the 20 rounds with the argmax resolved by a HUGEINT
    cross-multiplied NOT EXISTS anti-join — no float scores in either
    engine (queries/_bpe_oracle.py::wordpiece_train_oracle)."""
    from hotdog_spark.operators import bpe

    merges = bpe.wordpiece_train(
        table(spark, sf_dir, "documents"), "text", n_merges=20
    )
    rows = [
        (i, a, b, pc, ca, cb) for i, (a, b, pc, ca, cb) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows,
        "rank long, left string, right string, pair_count long,"
        " left_count long, right_count long",
    )


@register("wordpiece_encode_stats", oracle=_bpe.wordpiece_encode_oracle(20))
def wordpiece_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode the corpus with the learned WORDPIECE merge table and emit
    exact per-document integer stats — the tokenizer-parity twin of
    bpe_encode_stats: identical greedy in-order merge application
    (operators/bpe.py::bpe_encode_stats — encoding is table-driven, so
    the kernel is shared), only the learned table differs.  One corpus
    scan for training, one Arrow-batched scan for encoding; merge table
    travels in the kernel closure (vocabulary-sized)."""
    from pyspark.sql import functions as F

    from hotdog_spark.operators import bpe

    docs = table(spark, sf_dir, "documents")
    merges = bpe.wordpiece_train(docs, "text", n_merges=20)
    ranked = [(a, b, pc) for (a, b, pc, _ca, _cb) in merges]
    return bpe.bpe_encode_stats(docs, "text", "doc_id", ranked).select(
        "doc_id",
        "n_words",
        "n_chars_tok",
        F.col("n_bpe_tokens").alias("n_wp_tokens"),
        "n_merges_applied",
    )
