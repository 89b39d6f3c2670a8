"""Corpus-curation queries: PII scrubbing, repetition quality signals,
benchmark decontamination — over the `documents` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hotdog_spark.operators import privacy
from hotdog_spark.operators.decontam import canary_scan, decontaminate
from hotdog_spark.operators.sampling import hex_threshold
from hotdog_spark.operators.textops import repetition_stats
from hotdog_spark.queries import register
from hotdog_spark.sources.batch import table

_TOKS = "string_split_regex(trim(lower(text)), '\\s+')"

# The synthetic corpus carries no real PII, so the regex categories prove
# themselves in unit tests (tests/test_curation.py) while the denylist
# terms — chosen from the corpus vocabulary — exercise non-trivial counts
# and redaction end-to-end at driver scale.
DENY_TERMS = ["customer", "spark", "vector"]
_DENY = privacy.denylist_re(DENY_TERMS)

_REDACTED = (
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    f"lower(text), '{privacy.EMAIL_RE}', '<email>', 'g'), "
    f"'{privacy.IPV4_RE}', '<ip>', 'g'), "
    f"'{privacy.PHONE_RE}', '<phone>', 'g'), "
    f"'{_DENY}', '<term>', 'g')"
)


@register(
    "text_pii_scrub",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '{privacy.EMAIL_RE}')) AS n_email,
           len(regexp_extract_all(lower(text), '{privacy.IPV4_RE}')) AS n_ipv4,
           len(regexp_extract_all(lower(text), '{privacy.PHONE_RE}')) AS n_phone,
           len(regexp_extract_all(lower(text), '{_DENY}')) AS n_denylist,
           substring(md5({_REDACTED}), 1, 16) AS redacted_fp
    FROM documents
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII/denylist scrub audit: per-category match counts + the md5
    fingerprint of the redacted text (the dedup key after scrubbing).
    Pure regex projection — codegen'd, zero shuffle."""
    return privacy.pii_scrub(
        table(spark, sf_dir, "documents"), "text", "doc_id", DENY_TERMS
    )


@register(
    "text_repetition_stats",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS}) AS tok,
             generate_subscripts({_TOKS}, 1) AS pos
      FROM documents
    ), isl AS (
      SELECT doc_id, tok, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id, tok ORDER BY pos) AS grp
      FROM toks
    ), runs AS (
      SELECT doc_id, tok, grp, COUNT(*) AS run FROM isl GROUP BY doc_id, tok, grp
    ), per_tok AS (
      SELECT doc_id, tok, CAST(SUM(run) AS BIGINT) AS cnt, MAX(run) AS mrun
      FROM runs GROUP BY doc_id, tok
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_distinct,
           CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS distinct_ratio,
           MAX(cnt) AS top_tok_cnt,
           MAX(mrun) AS max_run
    FROM per_tok GROUP BY doc_id
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters' inputs: vocabulary ratio, top-token
    count, longest consecutive-token run — one doc-keyed shuffle family."""
    return repetition_stats(
        table(spark, sf_dir, "documents"), "text", "doc_id"
    ).withColumnRenamed("id", "doc_id")


@register(
    "decontaminate_ngram_overlap",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, {_TOKS} AS w,
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{hex_threshold(0.05)}'
               AS is_bench
      FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id, is_bench, array_to_string(w[i:i+4], ' ') AS g
      FROM words, UNNEST(range(1, len(w) - 3)) AS t(i)
    ), bench AS (SELECT DISTINCT g FROM grams WHERE is_bench)
    SELECT grams.doc_id, COUNT(*) AS shared_grams
    FROM grams JOIN bench ON grams.g = bench.g
    WHERE NOT grams.is_bench
    GROUP BY grams.doc_id
    """,
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: the held-out 5% md5 split plays the eval
    benchmark; corpus docs sharing any word 5-gram with it are reported
    with their shared-gram counts.  Benchmark gram set broadcast — the
    corpus is never shuffled on the gram key."""
    docs = table(spark, sf_dir, "documents")
    is_bench = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4) < F.lit(
        hex_threshold(0.05)
    )
    bench = docs.filter(is_bench)
    corpus = docs.filter(~is_bench)
    return decontaminate(corpus, bench, "text", "doc_id", n=5)


@register(
    "decontaminate_canary_exact",
    oracle="""
    WITH needles AS (
      SELECT doc_id AS needle_id,
             array_to_string((string_split(text, ' '))[1:5], ' ') AS needle
      FROM documents
      WHERE doc_id % 97 = 0 AND len(string_split(text, ' ')) >= 5
    )
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_canaries,
           MIN(n.needle_id) AS first_canary
    FROM documents d JOIN needles n ON position(n.needle IN d.text) > 0
    GROUP BY d.doc_id
    """,
)
def decontaminate_canary_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-substring canary decontamination (Aho-Corasick, the third
    mechanism in the decontamination family after token-n-gram overlap
    and the Bloom screen): every ~97th document's first five words play
    the verbatim canary strings (BIG-bench-style), and the whole corpus
    is scanned for raw substring occurrences — catching contamination
    that token-granular shingles miss (partial-word joins, different
    tokenization).  The Spark side compiles ONE automaton per executor
    from the closure-shipped needle set and walks each document once —
    O(len(text)) per doc, independent of needle count, zero shuffle;
    the oracle pays the O(docs x needles) position() bill instead, two
    independent routes to the same answer.  Self-matches guarantee
    non-vacuous rows; injected exact-duplicate docs add cross-doc
    hits."""
    docs = table(spark, sf_dir, "documents")
    needles = docs.filter(
        (F.col("doc_id") % 97 == 0)
        & (F.size(F.split(F.col("text"), " ")) >= 5)
    ).select(
        F.col("doc_id").alias("needle_id"),
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 5), " ").alias(
            "needle"
        ),
    )
    return canary_scan(docs, needles, "text", "doc_id")


from hotdog_spark.queries.text import _QUALITY_SQL

_DECILE_ORACLE = f"""
WITH feats AS (
  SELECT doc_id, lang, {_QUALITY_SQL} AS quality FROM documents
), d AS (
  SELECT doc_id, lang,
         NTILE(10) OVER (PARTITION BY lang ORDER BY quality, doc_id) AS decile
  FROM feats
)
SELECT doc_id, lang, decile FROM d WHERE decile > 1
"""


@register("quality_decile_filter", oracle=_DECILE_ORACLE)
def quality_decile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive quality gate: instead of a fixed threshold, drop each
    language's bottom quality decile (ntile over (quality, doc_id) — an
    exact integer assignment, no interpolated percentiles to drift across
    engines).  One keyed window shuffle; the gate recalibrates itself as
    the corpus distribution shifts."""
    from pyspark.sql.window import Window

    from hotdog_spark.operators.textops import quality_expr

    docs = table(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id", "lang", quality_expr(F.col("text")).alias("quality")
    )
    w = Window.partitionBy("lang").orderBy("quality", "doc_id")
    d = feats.withColumn("decile", F.ntile(10).over(w))
    return d.filter(F.col("decile") > 1).select("doc_id", "lang", "decile")


_CALIBRATE_ORACLE = f"""
WITH feats AS (
  SELECT doc_id, source, {_QUALITY_SQL} AS quality FROM documents
), ranked AS (
  SELECT doc_id, source, quality,
         PERCENT_RANK() OVER (PARTITION BY source
                              ORDER BY quality, doc_id) AS pct_rank
  FROM feats
)
SELECT doc_id, source, quality, pct_rank,
       CAST(LEAST(FLOOR(pct_rank * 10), 9) AS BIGINT) AS calib_bucket
FROM ranked
"""


@register("quality_calibrate_by_source", oracle=_CALIBRATE_ORACLE)
def quality_calibrate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quality calibration: raw quality scores are not
    comparable between sources (a mid-tier web crawl doc and a mid-tier
    curated doc score differently), so mixing on the raw score skews the
    blend.  percent_rank WITHIN source maps every score onto [0,1]
    uniformly per source; the calibrated bucket is then a pure projection
    floor(pct*10) — NOT a global ntile, which would be a single-reducer
    sort at 100 TB.  Plan: one window shuffle keyed by source, then
    projections.  percent_rank = (rank-1)/(n-1) is an exact integer
    division in both engines, so the result hash-matches."""
    from pyspark.sql.window import Window

    from hotdog_spark.operators.textops import quality_expr

    docs = table(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id", "source", quality_expr(F.col("text")).alias("quality")
    )
    w = Window.partitionBy("source").orderBy("quality", "doc_id")
    ranked = feats.withColumn("pct_rank", F.percent_rank().over(w))
    return ranked.select(
        "doc_id", "source", "quality", "pct_rank",
        F.least(F.floor(F.col("pct_rank") * 10), F.lit(9))
        .cast("bigint").alias("calib_bucket"),
    )


@register(
    "rebalance_source_mix",
    oracle="""
    WITH counts AS (
      SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source
    ), m AS (SELECT MIN(cnt) AS mn FROM counts),
    r AS (
      SELECT source, cnt, CAST(FLOOR(mn * 65536 / cnt) AS BIGINT) AS th
      FROM counts, m
    )
    SELECT d.source, r.cnt AS n_before, COUNT(*) AS n_kept
    FROM documents d JOIN r ON d.source = r.source
    WHERE r.th >= 65536
       OR substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < printf('%04x', r.th)
    GROUP BY d.source, r.cnt
    """,
)
def rebalance_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mix rebalancing: every source deterministically downsampled to
    ≈ the smallest source's size (per-source md5 thresholds).  The corpus
    is never shuffled — one tiny count aggregate broadcasts back onto a
    pure filter projection."""
    from hotdog_spark.operators.sampling import rebalance_to_min_group

    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    kept = rebalance_to_min_group(docs, "doc_id", "source")
    return kept.groupBy("source", "n_before").agg(
        F.count(F.lit(1)).alias("n_kept")
    )


_PIPELINE_ORACLE = f"""
    WITH red AS (
      SELECT doc_id, lang, {_REDACTED} AS rtext, {_QUALITY_SQL} AS quality
      FROM documents
    ), feats AS (
      SELECT doc_id, lang, quality,
             substring(md5(trim(regexp_replace(rtext, '\\s+', ' ', 'g'))), 1, 16) AS fp,
             len(string_split_regex(trim(rtext), '\\s+')) AS n_tokens
      FROM red
    ), surv AS (SELECT * FROM feats WHERE quality > 0.1),
    kept AS (
      SELECT fp, MIN(doc_id) AS doc_id, arg_min(lang, doc_id) AS lang,
             arg_min(n_tokens, doc_id) AS n_tokens
      FROM surv GROUP BY fp
    ), packed AS (
      SELECT lang, doc_id, n_tokens,
             CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) - n_tokens) / 2048.0)
                  AS BIGINT) AS bin
      FROM kept
    )
    SELECT lang, bin, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM packed GROUP BY lang, bin
    """


@register("pipeline_corpus_build", oracle=_PIPELINE_ORACLE)
def pipeline_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END corpus build in one DAG: PII/denylist redaction →
    quality gate → redacted-fingerprint dedup (min-id canonical) →
    per-language 2048-token sequence packing → bin accounting.

    Feature extraction is a single projection riding the scan; the whole
    pipeline costs one fp aggregate + one language-keyed window + the
    final bin aggregate — the composed shape a 100 TB corpus wash
    actually executes, with every intermediate engine-deterministic.
    """
    from hotdog_spark.operators.dedup import normalized_tokens
    from hotdog_spark.operators.sampling import pack_token_budget
    from hotdog_spark.operators.textops import fingerprint_expr, quality_expr

    docs = table(spark, sf_dir, "documents")
    red = privacy.redacted_text(F.col("text"), DENY_TERMS)
    feats = docs.select(
        "doc_id",
        "lang",
        quality_expr(F.col("text")).alias("quality"),
        fingerprint_expr(red).alias("fp"),
        F.size(normalized_tokens(red)).alias("n_tokens"),
    )
    surv = feats.filter(F.col("quality") > 0.1)
    kept = surv.groupBy("fp").agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("lang", "doc_id").alias("lang"),
        F.min_by("n_tokens", "doc_id").alias("n_tokens"),
    )
    packed = pack_token_budget(kept, "doc_id", "n_tokens", 2048, group_col="lang")
    return packed.groupBy("lang", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("bin_tokens")
    )


@register("pipeline_from_config", oracle=_PIPELINE_ORACLE)
def pipeline_from_config(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DEFAULT_WASH config compiled by the curation DSL
    (`hotdog_spark.curation`) — declarative step list → one composed
    DAG.  Shares `pipeline_corpus_build`'s oracle on purpose: the
    config spells out that exact wash, so the hash match proves the
    config compiler wires every step onto the same oracle-backed
    expressions (the same ethos as the reference's YAML→cascade
    compiler, applied to the curation domain)."""
    from hotdog_spark.curation import DEFAULT_WASH, build_curation_pipeline

    return build_curation_pipeline(
        table(spark, sf_dir, "documents"), DEFAULT_WASH
    )


@register(
    "pack_sharded_bins",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) AS n_tokens,
             CAST((strpos('0123456789abcdef',
                          substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) % 8
                  AS BIGINT) AS shard
      FROM documents
    ), packed AS (
      SELECT lang, shard, n_tokens,
             CAST(FLOOR(CAST(SUM(n_tokens) OVER (
                    PARTITION BY lang, shard ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                  ) - n_tokens AS DOUBLE) / 2048.0) AS BIGINT) AS bin
      FROM toks
    )
    SELECT lang, shard, bin, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM packed GROUP BY lang, shard, bin
    """,
)
def pack_sharded_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHARDED sequence packing — the parallelism fix the sf1 profile
    demanded: packing windows keyed by language alone run 5-wide forever
    (one sequential cumsum per language, no matter the cluster).  Keying
    the same offset-division packer by (lang, md5-shard) multiplies the
    parallel units to langs × shards with zero semantic loss — documents
    are still packed deterministically, bins are per-shard — which is how
    a 100 TB packer actually runs (n_shards ≈ cluster cores).  Plan: one
    window shuffle on the composite key + one aggregate."""
    from pyspark.sql import functions as F

    from hotdog_spark.operators.dedup import normalized_tokens
    from hotdog_spark.operators.sampling import pack_token_budget

    docs = table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "lang",
        F.size(normalized_tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
        (
            (
                F.instr(
                    F.lit("0123456789abcdef"),
                    F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
                ) - 1
            ) % 8
        ).cast("bigint").alias("shard"),
    ).withColumn("pack_group", F.concat_ws("|", "lang", "shard"))
    packed = pack_token_budget(keyed, "doc_id", "n_tokens", 2048, group_col="pack_group")
    return packed.groupBy("lang", "shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )


@register(
    "rebalance_temperature_mix",
    oracle="""
    WITH counts AS (
      SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
    ), m AS (SELECT MIN(cnt) AS mn FROM counts),
    r AS (
      SELECT lang, cnt,
             CAST(FLOOR(65536 * sqrt(CAST(mn AS DOUBLE) / CAST(cnt AS DOUBLE)))
                  AS BIGINT) AS th
      FROM counts, m
    )
    SELECT d.lang, r.cnt AS n_before, COUNT(*) AS n_kept
    FROM documents d JOIN r ON d.lang = r.lang
    WHERE r.th >= 65536
       OR substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < printf('%04x', r.th)
    GROUP BY d.lang, r.cnt
    """,
)
def rebalance_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted (T=2: share ∝ √count) language-mix rebalance (the actual XLM-R use case; the synthetic corpus is lang-skewed — en 43% — while sources are uniform, so this query exercises non-trivial keep-rates) —
    the multilingual-training middle ground between the natural mix and
    `rebalance_source_mix`'s uniform mix.  Keep-rate √(min/cnt) per
    source via one IEEE div + sqrt (correctly rounded, bit-identical
    cross-engine) scaled by 2¹⁶; md5-threshold application, corpus never
    shuffled (operators/sampling.py:rebalance_temperature_sqrt)."""
    from hotdog_spark.operators.sampling import rebalance_temperature_sqrt

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    kept = rebalance_temperature_sqrt(docs, "doc_id", "lang")
    return kept.groupBy("lang", "n_before").agg(
        F.count(F.lit(1)).alias("n_kept")
    )


@register(
    "curation_importance_weights",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, lang = 'en' AS is_target,
             list_transform(generate_series(1, len(t) - 1),
                            i -> t[i] || ' ' || t[i + 1]) AS gs
      FROM (SELECT doc_id, lang, {_TOKS} AS t FROM documents)
      WHERE len(t) >= 2
    ), g AS (
      SELECT doc_id, is_target,
             CAST(list_sum(list_transform(generate_series(1, 4), i ->
               CAST(strpos('0123456789abcdef', substring(md5(gg.g), i, 1)) - 1
                    AS BIGINT) * CAST(pow(16, 4 - i) AS BIGINT))) % 1024
                  AS INT) AS bucket
      FROM b, LATERAL (SELECT unnest(gs) AS g) gg
    ), src AS (
      SELECT bucket, COUNT(*) AS s_cnt FROM g GROUP BY bucket
    ), tgt AS (
      SELECT bucket, COUNT(*) AS t_cnt FROM g WHERE is_target GROUP BY bucket
    ), model AS (
      SELECT s.bucket, s.s_cnt, COALESCE(t.t_cnt, 0) AS t_cnt
      FROM src s LEFT JOIN tgt t ON s.bucket = t.bucket
    ), tot AS (
      SELECT CAST(SUM(s_cnt) AS BIGINT) AS s_tot,
             CAST(SUM(t_cnt) AS BIGINT) AS t_tot FROM model
    ), pd AS (
      SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(SUM(m.t_cnt) AS BIGINT) AS target_mass,
             CAST(SUM(m.s_cnt) AS BIGINT) AS source_mass
      FROM g JOIN model m ON g.bucket = m.bucket GROUP BY g.doc_id
    )
    SELECT doc_id, n_grams, target_mass, source_mass,
           (CAST(target_mass AS DOUBLE) / CAST(source_mass AS DOUBLE))
             * (CAST(s_tot AS DOUBLE) / CAST(t_tot AS DOUBLE)) AS weight,
           CAST(CASE WHEN CAST(target_mass AS HUGEINT) * CAST(s_tot AS HUGEINT)
                        > CAST(source_mass AS HUGEINT) * CAST(t_tot AS HUGEINT)
                THEN 1 ELSE 0 END AS BIGINT) AS selected
    FROM pd, tot
    """,
)
def curation_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weighting (hashed bigram features, target =
    the 'en' slice, source = the whole corpus) with integer-exact
    scoring: per-doc target/source feature masses are exact BIGINT sums,
    the selection flag is a decimal/hugeint cross-multiplication, and
    the weight is a fixed-order chain of exactly-rounded double ops —
    no logs, no order-dependent float sums (columns chosen to the same
    standard the sf10 digest enforced on quality_lm_bigram).  See
    :func:`hotdog_spark.operators.sampling.importance_weights_hashed_ngrams`
    for the scale posture (bucket-bounded model tables broadcast by
    construction; the corpus is never shuffled on a feature key)."""
    from hotdog_spark.operators.sampling import importance_weights_hashed_ngrams

    docs = table(spark, sf_dir, "documents")
    return importance_weights_hashed_ngrams(
        docs, "text", "doc_id", target_pred=F.col("lang") == "en", buckets=1024
    )


def _bloom_oracle(m: int, k: int) -> str:
    def pos(expr: str) -> str:
        return (
            f"('0x' || substring(md5(CAST(i AS VARCHAR) || ':' || {expr}),"
            f" 1, 15))::BIGINT % {m}"
        )

    return f"""
    WITH wx AS (
      SELECT doc_id, {_TOKS} AS w,
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{hex_threshold(0.05)}'
               AS is_bench
      FROM documents
    ), grams AS MATERIALIZED (
      SELECT DISTINCT doc_id, is_bench, array_to_string(w[i:i+4], ' ') AS g
      FROM wx, UNNEST(range(1, len(w) - 3)) AS t(i)
    ), bpos AS MATERIALIZED (
      SELECT DISTINCT {pos('g')} AS pos
      FROM (SELECT DISTINCT g FROM grams WHERE is_bench),
           UNNEST(range(0, {k})) AS h(i)
    ), probe AS (
      SELECT doc_id, g, {pos('g')} AS pos
      FROM grams, UNNEST(range(0, {k})) AS h(i)
      WHERE NOT is_bench
    ), pg AS (
      SELECT p.doc_id, p.g, COUNT(b.pos) AS hit_n
      FROM probe p LEFT JOIN bpos b ON p.pos = b.pos
      GROUP BY p.doc_id, p.g
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN hit_n = {k} THEN 1 ELSE 0 END) AS BIGINT)
             AS bloom_hits,
           CAST(COUNT(*) AS BIGINT) AS n_grams
    FROM pg GROUP BY doc_id
    HAVING SUM(CASE WHEN hit_n = {k} THEN 1 ELSE 0 END) >= 1
    """


@register("decontaminate_bloom_filter", oracle=_bloom_oracle(m=1 << 22, k=4))
def decontaminate_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination (same 5% md5 benchmark split and word
    5-grams as ``decontaminate_ngram_overlap``, so the two reports are
    directly comparable): the benchmark's grams are folded into a fixed
    4 Mi-bit bitmap (bit_or mergeable aggregate, ≤ 64 Ki rows, 512 KB
    broadcast), and corpus grams probe it map-side.

    Why this exists next to the exact variant: the exact join broadcasts
    the benchmark's distinct-gram SET, which grows with the benchmark;
    the bloom bitmap is O(m) regardless — the decontamination shape that
    survives a benchmark suite too large to broadcast.  Never a false
    negative; false positives are deterministic md5 arithmetic (FP per
    gram ≈ fill_ratio^4), reproduced bit-for-bit by the oracle's
    position-set formulation (a bitmap word/bit is a bijection of the
    position integer, so set membership ≡ bit test)."""
    from hotdog_spark.operators.decontam import decontaminate_bloom

    docs = table(spark, sf_dir, "documents")
    is_bench = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4) < F.lit(
        hex_threshold(0.05)
    )
    return decontaminate_bloom(
        docs.filter(~is_bench), docs.filter(is_bench), "text", "doc_id", n=5
    )


@register(
    "privacy_k_anonymity_report",
    oracle="""
    WITH classes AS (
      SELECT lang, source, n_chars // 16 AS len_bucket,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM documents GROUP BY lang, source, n_chars // 16
    ), buckets AS (
      SELECT CASE WHEN k = 1 THEN '1'
                  WHEN k < 5 THEN '2-4'
                  WHEN k < 10 THEN '5-9'
                  ELSE '10+' END AS k_bucket,
             CAST(COUNT(*) AS BIGINT) AS n_classes,
             CAST(SUM(k) AS BIGINT) AS n_rows,
             CAST(MIN(k) AS BIGINT) AS min_k
      FROM classes GROUP BY 1
    ), tot AS (
      -- CAST: DuckDB SUM(BIGINT) yields HUGEINT, which pandas converts
      -- to float64 and the ppm division would come back float-typed
      SELECT CAST(SUM(n_rows) AS BIGINT) AS n_total FROM buckets
    )
    SELECT k_bucket, n_classes, n_rows,
           (1000000 * n_rows) // greatest(n_total, 1) AS row_share_ppm,
           CAST(CASE WHEN min_k < 5 THEN 1 ELSE 0 END AS BIGINT) AS at_risk
    FROM buckets, tot
    """,
)
def privacy_k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) over the documents table's
    quasi-identifier tuple (lang, source, 16-char length bucket): the
    pre-release privacy check — rows in small equivalence classes are
    re-identifiable by joining quasi-identifiers against external data
    (operators/privacy.py::k_anonymity_report).  Two bounded keyed
    aggregates; class-size distribution with at-risk flags; no
    row-level data leaves the executors."""
    from pyspark.sql import functions as F

    from hotdog_spark.operators.privacy import k_anonymity_report

    docs = table(spark, sf_dir, "documents")
    return k_anonymity_report(
        docs,
        [F.col("lang"), F.col("source"),
         F.expr("n_chars div 16").alias("len_bucket")],
        k_threshold=5,
    )


@register(
    "privacy_l_diversity_report",
    oracle="""
    WITH classes AS (
      SELECT source, n_chars // 16 AS len_bucket,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS l
      FROM documents GROUP BY source, n_chars // 16
    ), buckets AS (
      SELECT l, CAST(COUNT(*) AS BIGINT) AS n_classes,
             CAST(SUM(k) AS BIGINT) AS n_rows
      FROM classes GROUP BY l
    ), tot AS (
      SELECT CAST(SUM(n_rows) AS BIGINT) AS n_total FROM buckets
    )
    SELECT l, n_classes, n_rows,
           (1000000 * n_rows) // greatest(n_total, 1) AS row_share_ppm,
           CAST(CASE WHEN l < 3 THEN 1 ELSE 0 END AS BIGINT) AS at_risk
    FROM buckets, tot
    """,
)
def privacy_l_diversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — k-anonymity's
    companion against the homogeneity attack: per (source, length
    bucket) quasi-identifier class, how many DISTINCT languages (the
    sensitive attribute here) each class contains; classes where every
    row shares one value leak the secret without re-identification
    (operators/privacy.py::l_diversity_report)."""
    from pyspark.sql import functions as F

    from hotdog_spark.operators.privacy import l_diversity_report

    docs = table(spark, sf_dir, "documents")
    return l_diversity_report(
        docs,
        [F.col("source"), F.expr("n_chars div 16").alias("len_bucket")],
        F.col("lang"),
        l_threshold=3,
    )


@register(
    "privacy_t_closeness_report",
    oracle="""
    WITH cells AS (
      SELECT source, n_chars // 16 AS len_bucket, lang,
             CAST(COUNT(*) AS BIGINT) AS n_cv
      FROM documents GROUP BY source, n_chars // 16, lang
    ), class_sizes AS (
      SELECT source, len_bucket, CAST(SUM(n_cv) AS BIGINT) AS k
      FROM cells GROUP BY source, len_bucket
    ), gdist AS (
      SELECT lang, CAST(SUM(n_cv) AS BIGINT) AS n_v FROM cells GROUP BY lang
    ), tot AS (
      SELECT CAST(SUM(n_v) AS BIGINT) AS n_total FROM gdist
    ), spine AS (
      SELECT cs.source, cs.len_bucket, cs.k, g.lang, g.n_v, t.n_total
      FROM class_sizes cs CROSS JOIN gdist g CROSS JOIN tot t
    ), joined AS (
      SELECT s.source, s.len_bucket, s.k, s.n_total,
             COALESCE(c.n_cv, 0) AS n_cv, s.n_v
      FROM spine s
      LEFT JOIN cells c ON c.source = s.source
                       AND c.len_bucket = s.len_bucket AND c.lang = s.lang
    ), per_class AS (
      SELECT k,
             (1000000 * CAST(SUM(ABS(n_cv * n_total - n_v * k)) AS BIGINT))
               // (2 * k * n_total) AS tvd_ppm
      FROM joined GROUP BY source, len_bucket, k, n_total
    ), buckets AS (
      SELECT tvd_ppm // 100000 AS tvd_decile,
             CAST(COUNT(*) AS BIGINT) AS n_classes,
             CAST(SUM(k) AS BIGINT) AS n_rows
      FROM per_class GROUP BY 1
    ), btot AS (
      SELECT CAST(SUM(n_rows) AS BIGINT) AS n_total FROM buckets
    )
    SELECT tvd_decile, n_classes, n_rows,
           (1000000 * n_rows) // greatest(n_total, 1) AS row_share_ppm,
           CAST(CASE WHEN tvd_decile * 100000 >= 300000 THEN 1 ELSE 0 END
                AS BIGINT) AS at_risk
    FROM buckets, btot
    """,
)
def privacy_t_closeness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) completing
    the classic privacy triple (k-anonymity → l-diversity →
    t-closeness): per (source, length-bucket) class, the exact-integer
    total-variation distance between the class's language distribution
    and the global one, bucketed into TVD deciles with at-risk flags —
    the skewness-attack check l-diversity misses
    (operators/privacy.py::t_closeness_report)."""
    from pyspark.sql import functions as F

    from hotdog_spark.operators.privacy import t_closeness_report

    docs = table(spark, sf_dir, "documents")
    return t_closeness_report(
        docs,
        [F.col("source"), F.expr("n_chars div 16").alias("len_bucket")],
        F.col("lang"),
        t_ppm_threshold=300_000,
    )
