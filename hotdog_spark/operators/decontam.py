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


def decontaminate_semantic(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    test_frac: float = 0.1,
    threshold: float = 0.30,
) -> DataFrame:
    """Embedding-space benchmark-leakage screen: flag every training
    vector whose cosine similarity to ANY held-out/benchmark vector is
    ≥ ``threshold`` — the semantic complement of the n-gram
    :func:`decontaminate` (paraphrased or translated benchmark items
    share no n-grams but sit next to the benchmark in embedding space;
    cf. the contamination audits in GPT-4/Llama reports and
    SemDeDup-style cosine screening).

    The held-out side is chosen content-deterministically (md5 split on
    the id, :func:`~hotdog_spark.operators.sampling.with_split`), so the
    screen is reproducible across engines and reruns.

    Scale shape (the part that matters at 100 TB): the benchmark is an
    eval suite — O(10³..10⁴) vectors, not terabytes — so its quantized
    matrix is collected once (bounded, like a centroid table) and ships
    in the task closure; the corpus is scored MAP-SIDE in one
    vectorized Arrow/BLAS kernel (batch·64 @ 64·b) with zero corpus
    shuffle — the flag is a pure projection.  Determinism: integer-milli
    quantized dots (< 2⁵³, exact in f64 BLAS), one IEEE divide by
    sqrt(n2·n2b) — the proven parity recipe of the ANN kernels
    (`similarity.py`); ties on equal cosine break to the smallest
    benchmark id via stable lexsort.

    Returns (train id, best-matching benchmark id, max cosine) for
    flagged rows only.
    """
    import numpy as np
    import pandas as pd

    from hotdog_spark.operators.sampling import hex_threshold
    from hotdog_spark.operators.similarity import with_quantized

    base = with_quantized(df, vec_col, id_col)
    th = hex_threshold(test_frac)
    is_test = F.substring(F.md5(F.col("vid").cast("string")), 1, 4) < F.lit(th)
    probes = [
        (int(r["vid"]), [int(x) for x in r["q"]], int(r["n2"]))
        for r in base.filter(is_test & (F.col("n2") > 0)).collect()
    ]
    probes.sort()
    pid = np.asarray([p[0] for p in probes], dtype=np.int64)
    P = np.asarray([p[1] for p in probes], dtype=np.float64)
    n2p = np.asarray([p[2] for p in probes], dtype=np.int64)
    tau = float(threshold)

    def screen(batches):
        for pdf in batches:
            if len(pdf) == 0 or len(pid) == 0:
                continue
            Q = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["q"]]
            )
            n2 = pdf["n2"].to_numpy(dtype=np.int64)
            dots = Q @ P.T                      # exact: quantized < 2⁵³
            denom = np.sqrt((n2[:, None] * n2p[None, :]).astype(np.float64))
            score = dots / denom
            # (score desc, benchmark id asc): stable lexsort on (-score)
            best = np.lexsort((np.broadcast_to(pid, score.shape), -score),
                              axis=1)[:, 0] if score.shape[1] > 1 else \
                np.zeros(len(pdf), dtype=np.int64)
            rows = np.arange(len(pdf))
            mx = score[rows, best]
            keep = mx >= tau
            if not keep.any():
                continue
            yield pd.DataFrame({
                "train_id": pdf["vid"].to_numpy(dtype=np.int64)[keep],
                "bench_id": pid[best[keep]],
                "max_cosine": mx[keep],
            })

    train = base.filter((~is_test) & (F.col("n2") > 0))
    return train.mapInPandas(
        screen, "train_id long, bench_id long, max_cosine double"
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
