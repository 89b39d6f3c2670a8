"""Byte-pair-encoding tokenizer TRAINING and ENCODING as Spark jobs —
the vocabulary-learning stage of a training-data pipeline (Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword
Units"; the algorithm and its word-frequency formulation are public).

Why this is Spark-shaped and 100 TB-credible: classic BPE trains on the
WORD-FREQUENCY table, not the raw corpus — one corpus-wide token count
(the same keyed aggregate every other text operator starts with)
reduces 100 TB of text to a vocabulary-bounded (word, count) table, and
every merge iteration after that touches only that small table.  The
corpus is scanned exactly once for training and once for encoding; the
iterative loop runs over data whose size is set by the vocabulary, not
the corpus.  Per-iteration driver traffic is ONE row (the argmax pair —
the same bounded-collect shape as the k-means trainer in
similarity.py).

Determinism: the merge chosen each round is max by (weighted pair
count, then lexicographically smallest (left, right)) — a total order,
so the merge table is a pure function of the corpus.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# End-of-word sentinel: distinguishes "est" inside a word from "est" at
# a word boundary, exactly as the public BPE formulation does.
EOW = "</w>"

_WC_SCHEMA = StructType(
    [
        StructField("word", StringType()),
        StructField("cnt", LongType()),
        StructField("syms", ArrayType(StringType())),
    ]
)


def _merge_once(syms: list[str], a: str, b: str) -> list[str]:
    """One left-to-right greedy merge pass: every adjacent (a, b) pair
    becomes the single symbol a+b.  Overlaps resolve left-first —
    ('a','a') over [a,a,a] yields [aa, a] — matching the reference
    algorithm."""
    out: list[str] = []
    i, n = 0, len(syms)
    ab = a + b
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def word_frequency_table(df: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt, syms) — the one corpus-wide scan.  ``syms`` starts as
    the word's characters plus the end-of-word sentinel."""
    from hotdog_spark.operators.dedup import normalized_tokens

    wc = (
        df.select(F.explode(normalized_tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    syms = F.concat(
        F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
        F.array(F.lit(EOW)),
    )
    return wc.select("word", "cnt", syms.alias("syms"))


def _train_local(
    wordcounts: list[tuple[str, int]],
    n_merges: int,
    min_pair_count: int,
) -> list[tuple[str, str, int]]:
    """The merge loop over a COLLECTED (word, cnt) table — identical
    semantics and tie-break to the distributed loop below (pinned by
    test_bpe.py's forced-distributed differential)."""
    vocab = {w: list(w) + [EOW] for w, _ in wordcounts}
    counts = dict(wordcounts)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            c = counts[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc[p] = pc.get(p, 0) + c
        if not pc:
            break
        (a, b), best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best < min_pair_count:
            break
        merges.append((a, b, best))
        for w in vocab:
            vocab[w] = _merge_once(vocab[w], a, b)
    return merges


#: Vocabularies at or below this row count train driver-side.  The
#: word-frequency table is vocabulary-bounded BY CONSTRUCTION (that is
#: the whole point of the Sennrich formulation) — for any real corpus it
#: is a centroid-table-class collect, and the driver loop replaces 20
#: sequential Spark jobs whose cost was pure scheduling latency
#: (measured: 5.5 s → <1 s at sf0.1 on a 31-word vocab).  Corpora whose
#: vocab exceeds the limit keep the fully distributed iteration.
VOCAB_COLLECT_LIMIT = 1_000_000


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 20,
    min_pair_count: int = 2,
    vocab_collect_limit: int = VOCAB_COLLECT_LIMIT,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus.  Returns the
    ordered merge table [(left, right, weighted_pair_count), ...] —
    ranks are list positions.  Stops early when the best remaining pair
    occurs fewer than ``min_pair_count`` times (weighted by word
    frequency).

    The corpus is scanned ONCE (the distributed word-frequency
    aggregate).  The merge loop then runs driver-side when the vocab
    fits ``vocab_collect_limit`` (the common case — vocabulary-bounded
    input is the premise of the algorithm), else distributed with one
    argmax row per round."""
    from hotdog_spark.dist import ensure_shipped

    ensure_shipped(df.sparkSession)

    # localCheckpoint (not persist): each iteration rewrites `syms`, so
    # the logical plan would otherwise grow by one mapInPandas PER MERGE
    # and Catalyst re-stringifies the whole lineage on every AQE update —
    # measured: JVM heap OOM in explainString at 20 merges.  Checkpoint
    # truncates the lineage to the materialized partitions each round
    # (the standard iterative-algorithm posture, same reason MLlib's
    # iterative trainers checkpoint).
    wc = word_frequency_table(df, text_col).localCheckpoint(eager=True)
    if wc.count() <= vocab_collect_limit:
        rows = wc.select("word", "cnt").collect()
        return _train_local(
            [(r["word"], int(r["cnt"])) for r in rows], n_merges, min_pair_count
        )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        # size >= 2 guard: a fully-merged word is one symbol, and Spark's
        # sequence(0, -1) DESCENDS ([0, -1]) instead of being empty.
        pairs = wc.filter(F.size("syms") >= 2).select(
            "cnt",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(syms) - 2),"
                    " i -> struct(syms[i] AS a, syms[i + 1] AS b))"
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("pc"))
            .orderBy(F.desc("pc"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["pc"] < min_pair_count:
            break
        a, b, pc = best[0]["a"], best[0]["b"], int(best[0]["pc"])
        merges.append((a, b, pc))

        def kernel(batches: Iterator[pd.DataFrame], _a=a, _b=b):
            for pdf in batches:
                pdf = pdf.copy()
                pdf["syms"] = [
                    _merge_once(list(s), _a, _b) for s in pdf["syms"]
                ]
                yield pdf

        wc = wc.mapInPandas(kernel, _WC_SCHEMA).localCheckpoint(eager=True)
    return merges


def bpe_encode_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str, int]],
) -> DataFrame:
    """Encode every document with a learned merge table and emit exact
    per-document integer stats: word count, BPE token count, character
    count (tokens only), and the merge saving (chars+words − bpe tokens
    — every merge application removes exactly one symbol, so this also
    equals the number of merge operations applied).  The merge table
    travels in the kernel closure (vocabulary-sized — the broadcast-dim
    pattern); the corpus is scanned once, Arrow-batched."""
    from hotdog_spark.dist import ensure_shipped

    ensure_shipped(df.sparkSession)
    ranked = [(a, b) for a, b, _ in merges]

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_words", LongType()),
            StructField("n_chars_tok", LongType()),
            StructField("n_bpe_tokens", LongType()),
            StructField("n_merges_applied", LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Word-level memo (the standard BPE encode cache): encoding is a
        # pure function of the word, and corpora have vocabulary-bounded
        # distinct words, so each worker encodes each word ONCE instead
        # of once per occurrence — the difference between O(tokens) and
        # O(vocab) merge-loop work per partition.
        memo: dict[str, int] = {}

        def n_syms(w: str) -> int:
            got = memo.get(w)
            if got is None:
                syms = list(w) + [EOW]
                for a, b in ranked:
                    if len(syms) < 2:
                        break
                    syms = _merge_once(syms, a, b)
                got = memo[w] = len(syms)
            return got

        for pdf in batches:
            rows = {k: [] for k in (
                id_col, "n_words", "n_chars_tok", "n_bpe_tokens",
                "n_merges_applied",
            )}
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = (text or "").strip().lower().split()
                n_chars = sum(len(w) for w in words)
                n_bpe = sum(n_syms(w) for w in words)
                base_syms = n_chars + len(words)  # chars + one EOW per word
                rows[id_col].append(did)
                rows["n_words"].append(len(words))
                rows["n_chars_tok"].append(n_chars)
                rows["n_bpe_tokens"].append(n_bpe)
                rows["n_merges_applied"].append(base_syms - n_bpe)
            yield pd.DataFrame(rows)

    # CPU-bound per-word merge replay over a compact parquet input:
    # fan out so the encode uses every core (no-op on naturally
    # multi-partition inputs at scale — the r10 single-task audit)
    from hotdog_spark.operators import fan_out

    return fan_out(df.select(id_col, text_col)).mapInPandas(kernel, schema)


def _wp_beats(
    x: tuple[int, int, int, str, str], y: tuple[int, int, int, str, str]
) -> bool:
    """True iff candidate x outranks y under the WordPiece objective:
    higher likelihood score pc/(ca·cb), ties broken by lexicographically
    smaller (a, b).  The ratio comparison is done by exact integer
    cross-multiplication — Python ints are unbounded, so no overflow at
    any corpus size (the DuckDB oracle uses HUGEINT for the same
    products)."""
    (pcx, cax, cbx, ax, bx) = x
    (pcy, cay, cby, ay, by) = y
    lhs = pcx * cay * cby
    rhs = pcy * cax * cbx
    if lhs != rhs:
        return lhs > rhs
    return (ax, bx) < (ay, by)


def _wordpiece_local(
    wordcounts: list[tuple[str, int]],
    n_merges: int,
    min_pair_count: int,
) -> list[tuple[str, str, int, int, int]]:
    """WordPiece merge loop over a collected (word, cnt) table: same
    rewrite machinery as BPE (:func:`_merge_once`), different SELECTION —
    the pair maximizing count(ab)/(count(a)·count(b)) (Schuster &
    Nakajima 2012, the BERT tokenizer's likelihood-gain rule) instead of
    raw count(ab).  Returns [(left, right, pair_cnt, left_cnt,
    right_cnt), ...] in merge order."""
    vocab = {w: list(w) + [EOW] for w, _ in wordcounts}
    counts = dict(wordcounts)
    merges: list[tuple[str, str, int, int, int]] = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        sc: dict[str, int] = {}
        for w, syms in vocab.items():
            c = counts[w]
            for s in syms:
                sc[s] = sc.get(s, 0) + c
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc[p] = pc.get(p, 0) + c
        best = None
        for (a, b), n_ab in pc.items():
            if n_ab < min_pair_count:
                continue
            cand = (n_ab, sc[a], sc[b], a, b)
            if best is None or _wp_beats(cand, best):
                best = cand
        if best is None:
            break
        n_ab, ca, cb, a, b = best
        merges.append((a, b, n_ab, ca, cb))
        for w in vocab:
            vocab[w] = _merge_once(vocab[w], a, b)
    return merges


def wordpiece_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 20,
    min_pair_count: int = 2,
    vocab_collect_limit: int = VOCAB_COLLECT_LIMIT,
) -> list[tuple[str, str, int, int, int]]:
    """Learn ``n_merges`` WordPiece merges (Schuster & Nakajima 2012 —
    the BERT tokenizer family member).  Identical Spark shape to
    :func:`bpe_train` — ONE corpus scan to the vocabulary-bounded
    word-frequency table, then an iterative loop over that table — with
    the likelihood-gain selection rule: argmax of
    count(ab) / (count(a)·count(b)), compared by exact integer
    cross-multiplication (no float scores anywhere, so the merge table
    is a pure function of the corpus in any engine).

    Distributed fallback (vocab above ``vocab_collect_limit``): per
    round, pair counts AND symbol counts are keyed aggregates over the
    segmentation table; the joined scored-pair table — bounded by the
    active segmentation's adjacent-pair vocabulary, the same
    vocab-bounded class as the table itself — is collected and the
    argmax resolved driver-side with unbounded ints (a distributed
    fixed-width argmax would overflow: pc·ca·cb exceeds signed-64 past
    ~2 M tokens).

    Returns [(left, right, pair_cnt, left_cnt, right_cnt), ...]."""
    from hotdog_spark.dist import ensure_shipped

    ensure_shipped(df.sparkSession)
    wc = word_frequency_table(df, text_col).localCheckpoint(eager=True)
    if wc.count() <= vocab_collect_limit:
        rows = wc.select("word", "cnt").collect()
        return _wordpiece_local(
            [(r["word"], int(r["cnt"])) for r in rows], n_merges, min_pair_count
        )
    merges: list[tuple[str, str, int, int, int]] = []
    for _ in range(n_merges):
        pairs = wc.filter(F.size("syms") >= 2).select(
            "cnt",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(syms) - 2),"
                    " i -> struct(syms[i] AS a, syms[i + 1] AS b))"
                )
            ).alias("p"),
        )
        pcdf = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("pc"))
            .filter(F.col("pc") >= min_pair_count)
        )
        scdf = (
            wc.select("cnt", F.explode("syms").alias("sym"))
            .groupBy("sym")
            .agg(F.sum("cnt").alias("c"))
        )
        sa = scdf.select(F.col("sym").alias("a"), F.col("c").alias("ca"))
        sb = scdf.select(F.col("sym").alias("b"), F.col("c").alias("cb"))
        scored = pcdf.join(sa, "a").join(sb, "b").collect()
        best = None
        for r in scored:
            cand = (int(r["pc"]), int(r["ca"]), int(r["cb"]), r["a"], r["b"])
            if best is None or _wp_beats(cand, best):
                best = cand
        if best is None:
            break
        n_ab, ca, cb, a, b = best
        merges.append((a, b, n_ab, ca, cb))

        def kernel(batches: Iterator[pd.DataFrame], _a=a, _b=b):
            for pdf in batches:
                pdf = pdf.copy()
                pdf["syms"] = [
                    _merge_once(list(s), _a, _b) for s in pdf["syms"]
                ]
                yield pdf

        wc = wc.mapInPandas(kernel, _WC_SCHEMA).localCheckpoint(eager=True)
    return merges
