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


BLOOM_BITS = 1 << 22   # m: 4 Mi bits = 65,536 int64 words (512 KB broadcast)
BLOOM_HASHES = 4       # k


def _bloom_positions(g: Column, m: int = BLOOM_BITS, k: int = BLOOM_HASHES) -> Column:
    """Array of the gram's ``k`` bloom bit positions: independent hashes
    are md5 over an index-salted gram (``"i:" + g``), int60 from the
    first 15 hex chars, mod ``m``.  Pure integer math, bit-identical in
    DuckDB (``('0x' || substring(md5(...), 1, 15))::BIGINT % m``)."""
    return F.array(
        *[
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{i}:"), g)), 1, 15
                    ),
                    16,
                    10,
                ).cast("bigint"),
                F.lit(m),
            )
            for i in range(k)
        ]
    )


def bloom_build(
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
    m: int = BLOOM_BITS,
    k: int = BLOOM_HASHES,
) -> DataFrame:
    """Build a bloom-filter bitmap over the benchmark's distinct word
    n-grams as a (word_idx, bits) DataFrame — at most ``m / 64`` rows
    regardless of benchmark size.

    The aggregate is ``bit_or`` of single-bit words: associative,
    commutative, map-side combinable — the textbook mergeable-sketch
    shape.  This is what makes bloom the 100 TB decontamination path:
    the exact variant (:func:`decontaminate`) broadcasts the benchmark's
    DISTINCT GRAM SET, which grows with the benchmark; the bloom bitmap
    is a fixed ``m`` bits no matter how many grams went in (dial ``m``
    to the target false-positive rate: fill ratio p after inserts gives
    FP ≈ p^k per probed gram)."""
    grams = _doc_grams(benchmark, text_col, id_col, n).select("g").distinct()
    pos = grams.select(
        F.explode(_bloom_positions(F.col("g"), m, k)).alias("pos")
    ).distinct()
    return pos.groupBy(
        (F.col("pos") / F.lit(64)).cast("bigint").alias("word_idx")
    ).agg(
        F.bit_or(
            # pyspark's shiftleft() only takes a literal shift; the SQL
            # form accepts a column
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))")
        ).alias("bits")
    )


def decontaminate_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
    m: int = BLOOM_BITS,
    k: int = BLOOM_HASHES,
) -> DataFrame:
    """Bloom-filter benchmark decontamination: flag corpus documents
    whose word n-grams probe positive against a bloom bitmap built from
    the benchmark's grams.

    Superset-with-false-positives of the exact :func:`decontaminate`
    (never a false negative — every truly shared gram has all its bits
    set); false positives are a DETERMINISTIC function of (gram, m, k)
    — the same md5 arithmetic reproduces them in any engine, so the
    report is still oracle-comparable bit-for-bit.

    Scale shape: the corpus side explodes each distinct (doc, gram)
    into ``k`` position rows and probes them against the BROADCAST
    (word_idx, bits) bitmap — never shuffled on the gram key; the two
    aggregations that follow (all-k-bits per gram, hit count per doc)
    are keyed by (doc, gram) and doc, both map-side combinable.  At
    100 TB the benchmark-side state is ``m`` bits, full stop — the
    property the exact broadcast-gram-set variant loses when the
    benchmark itself is large.

    Returns (doc_id, bloom_hits, n_grams) for corpus docs with ≥ 1
    probing gram, bloom_hits ≥ 1."""
    from pyspark.sql import Window  # noqa: F401  (parity with module imports)

    bitmap = bloom_build(benchmark, text_col, id_col, n, m, k)
    cg = _doc_grams(corpus, text_col, id_col, n)
    probe = cg.select(
        "doc_id",
        "g",
        F.explode(_bloom_positions(F.col("g"), m, k)).alias("pos"),
    ).select(
        "doc_id",
        "g",
        (F.col("pos") / F.lit(64)).cast("bigint").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))").alias(
            "mask"
        ),
    )
    joined = probe.join(F.broadcast(bitmap), "word_idx", "left").select(
        "doc_id",
        "g",
        F.coalesce(
            (F.col("bits").bitwiseAND(F.col("mask")) != F.lit(0)).cast("int"),
            F.lit(0),
        ).alias("hit"),
    )
    per_gram = joined.groupBy("doc_id", "g").agg(
        (F.sum("hit") == F.lit(k)).cast("int").alias("bloom_hit")
    )
    return (
        per_gram.groupBy("doc_id")
        .agg(
            F.sum("bloom_hit").cast("bigint").alias("bloom_hits"),
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
        )
        .filter(F.col("bloom_hits") >= 1)
    )


# ---- exact multi-pattern canary scan (Aho-Corasick 1975, public) ----

#: per-worker automaton memo: benchmark canary sets are a fixed
#: artifact per job, so the build cost is paid once per executor, not
#: per Arrow batch
_AC_CACHE: dict = {}


class AhoCorasick:
    """Classic Aho-Corasick (CACM 1975, public) multi-pattern matcher:
    goto trie + BFS failure links + merged output sets.  One pass over
    the text finds every occurrence of every needle — O(len(text)),
    INDEPENDENT of needle count, which is the mechanism separation
    from the n-gram-set and Bloom decontaminators: those match
    token-granular shingles; this matches raw substrings exactly, the
    canary-string check (e.g. BIG-bench canary GUIDs, verbatim eval
    prompts) that n-gram overlap can miss across tokenization."""

    __slots__ = ("goto", "fail", "out")

    def __init__(self, needles) -> None:
        from collections import deque

        goto: list[dict] = [{}]
        out: list[list] = [[]]
        for nid, s in needles:
            node = 0
            for ch in s:
                nxt = goto[node].get(ch)
                if nxt is None:
                    goto.append({})
                    out.append([])
                    nxt = len(goto) - 1
                    goto[node][ch] = nxt
                node = nxt
            out[node].append(nid)
        fail = [0] * len(goto)
        q = deque(goto[0].values())          # depth-1: fail = root
        while q:
            node = q.popleft()
            for ch, nxt in goto[node].items():
                q.append(nxt)
                f = fail[node]
                while f and ch not in goto[f]:
                    f = fail[f]
                fail[nxt] = goto[f].get(ch, 0)
                if out[fail[nxt]]:
                    # merged outputs: a match state also reports every
                    # needle that is a proper suffix of its path (BFS
                    # order guarantees the fail target is finalized)
                    out[nxt] = out[nxt] + out[fail[nxt]]
        self.goto, self.fail, self.out = goto, fail, out

    def scan_distinct(self, text: str) -> set:
        """Distinct needle ids with >= 1 (possibly overlapping)
        occurrence in ``text`` — one automaton walk."""
        goto, fail, out = self.goto, self.fail, self.out
        node = 0
        hits: set = set()
        for ch in text:
            while node and ch not in goto[node]:
                node = fail[node]
            node = goto[node].get(ch, 0)
            if out[node]:
                hits.update(out[node])
        return hits


def canary_scan(
    corpus: DataFrame,
    needles: DataFrame,
    text_col: str,
    id_col: str,
    max_needles: int = 1_000_000,
) -> DataFrame:
    """EXACT substring decontamination: scan every corpus document for
    verbatim occurrences of any canary string, in one Aho-Corasick walk
    per document.  ``needles`` is (needle_id bigint, needle string).

    Returns (doc_id, n_canaries, first_canary) for documents with at
    least one hit: n_canaries = DISTINCT needles present, first_canary
    = the smallest matching needle id.

    Scale shape: the needle set is a benchmark artifact — bounded by
    construction (guarded at ``max_needles``; BIG-bench-scale canary
    sets are ~1e4-1e6 strings) — collected once, shipped in the task
    closure, compiled to ONE automaton per executor process
    (memoized), then each document costs O(len(text)) regardless of
    needle count.  The corpus is never shuffled and never compared
    needle-by-needle — the plan is a single Arrow-batched projection."""
    import pandas as pd

    from hotdog_spark.dist import ensure_shipped

    ensure_shipped(corpus.sparkSession)
    rows = needles.limit(max_needles + 1).collect()
    if len(rows) > max_needles:
        raise ValueError(
            f"canary_scan: needle set exceeds max_needles={max_needles}; "
            "canary sets are benchmark artifacts and must stay bounded"
        )
    needle_list = tuple(
        (int(r[0]), str(r[1])) for r in rows if r[1]
    )

    def kernel(batches):
        # keyed by the needle tuple itself, not hash(tuple): dict lookup
        # already uses the hash for bucketing but resolves collisions by
        # equality, so two different needle sets can never silently
        # share an automaton in a long-lived executor process
        ac = _AC_CACHE.get(needle_list)
        if ac is None:
            ac = AhoCorasick(needle_list)
            if len(_AC_CACHE) < 4:
                _AC_CACHE[needle_list] = ac
        for pdf in batches:
            out = {"doc_id": [], "n_canaries": [], "first_canary": []}
            for did, text in zip(pdf[id_col], pdf[text_col]):
                hits = ac.scan_distinct(text if text is not None else "")
                if hits:
                    out["doc_id"].append(int(did))
                    out["n_canaries"].append(len(hits))
                    out["first_canary"].append(min(hits))
            if out["doc_id"]:
                yield pd.DataFrame(out)

    # one automaton walk per document is CPU-bound Python: fan out so a
    # compact parquet input doesn't pin the scan to one task (r10 audit)
    return fan_out(corpus.select(id_col, text_col)).mapInPandas(
        kernel, "doc_id long, n_canaries long, first_canary long"
    )
