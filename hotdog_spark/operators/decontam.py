"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

Standard practice before LLM training (GPT-3 appendix C, PaLM §7,
Dolma/RefinedWeb pipelines): any training document containing an n-gram
(n≈8..13 words; smaller here because the synthetic docs are short) that
also occurs in an eval benchmark is contaminated and must be dropped or
audited.

Scale shape: the benchmark side is an eval suite — thousands of
documents, not terabytes — so its distinct-gram set is broadcast; the
100 TB corpus side is never shuffled on the gram key.  The only corpus
shuffle is the final per-document aggregation of hits, whose input is
already tiny (only matching grams survive the broadcast hash join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hotdog_spark.operators import fan_out
from hotdog_spark.operators.dedup import normalized_tokens


def word_ngrams(text: Column, n: int) -> Column:
    """Space-joined word n-grams of the casefolded text; documents
    shorter than ``n`` words yield an empty array (they cannot contain a
    contaminating n-gram)."""
    w = normalized_tokens(text)
    return F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.array_join(F.slice(w, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _doc_grams(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    return fan_out(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("g"),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
) -> DataFrame:
    """Per-corpus-document benchmark contamination report.

    Returns (doc_id, shared_grams) for every corpus document sharing at
    least one word ``n``-gram with the benchmark set.  Anti-joining the
    corpus against this result yields the decontaminated corpus.
    """
    bench_grams = _doc_grams(benchmark, text_col, id_col, n).select("g").distinct()
    corpus_grams = _doc_grams(corpus, text_col, id_col, n)
    return (
        corpus_grams.join(F.broadcast(bench_grams), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("shared_grams"))
    )
