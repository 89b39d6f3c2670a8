"""Text-analysis operators for training-data pipelines: token counting,
language-ID heuristic, quality scoring, document fingerprinting.

Everything is built-in column expressions (whole-stage codegen); ratios
are integer/integer divisions so values reproduce exactly in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hotdog_spark.operators import fan_out, track_persist
from hotdog_spark.operators.dedup import normalized_tokens

# A BPE-ish lexer: letter runs, digit runs, single non-alnum marks.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language stopword inventories for the n-gram/stopword heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "de": ["der", "die", "und", "das", "ist", "von"],
    "fr": ["le", "la", "et", "les", "des", "est"],
    "zh": ["de", "shi", "le", "zai", "he"],
}
LANGS = sorted(STOPWORDS)  # deterministic argmax tie-break order


def token_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Whitespace token count + BPE-ish lexer token count."""
    text = F.col(text_col)
    return fan_out(df).select(
        F.col(id_col),
        F.size(normalized_tokens(text)).alias("ws_tokens"),
        F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0)).alias("lex_tokens"),
    )


def _stopword_hits_hof(tokens: Column, words: list[str]) -> Column:
    """Multiset stopword count, higher-order-function form: filter the
    token array against a literal word array and take its size.  Lambda
    is interpreted per element (tokens × |wordlist| evaluations per row,
    ×5 languages in language_id)."""
    wordlist = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(wordlist, t)))


def _stopword_hits_regexp(tokens: Column, words: list[str]) -> Column:
    """Multiset stopword count, single-regexp form: rebuild the
    single-space-joined token string, pad with spaces, and count
    ZERO-WIDTH lookahead matches of ``(?= word )`` — zero-width so
    adjacent occurrences sharing a separator space both count ("the the"
    → 2), and each token occurrence contributes exactly one match (the
    one position whose following text is ``word`` + space).  Exact same
    integers as the token-multiset count."""
    import re as _re

    padded = F.concat(F.lit(" "), F.concat_ws(" ", tokens), F.lit(" "))
    alt = "|".join(_re.escape(w) for w in words)
    return F.regexp_count(padded, F.lit(f"(?= (?:{alt}) )"))


def _stopword_hits(tokens: Column, words: list[str]) -> Column:
    """Multiset count of tokens that equal any of ``words``.

    Two exactly-equivalent forms (oracles unchanged either way),
    selected by HOTDOG_STOPWORD_IMPL for A/B measurement; the default is
    the measured winner.  r5 swapped HOF → regexp claiming the HOF form
    was "the dominant cost at sf10" — the r6 A/B (AB_TEXTOPS.json,
    median-of-3 at sf0.1 AND sf10) REFUTES that: regexp's best sf10
    ratio is 0.72× (language_id), nowhere near the ≥2× bar, and the
    heaviest consumer (text_clean_corpus_pipeline) is WORSE under
    regexp at both scales (1.50× at sf0.1 — the r5 bench regression —
    and 1.06× at sf10).  Default reverted to HOF per the decision rule;
    the regexp form stays for corpora where it measures better
    (quality_score/language_id were mildly regexp-favorable)."""
    import os as _os

    impl = _os.environ.get("HOTDOG_STOPWORD_IMPL", _STOPWORD_DEFAULT)
    fn = _stopword_hits_regexp if impl == "regexp" else _stopword_hits_hof
    return fn(tokens, words)


# Measured winner (AB_TEXTOPS.json, r6): HOF — see _stopword_hits.
_STOPWORD_DEFAULT = "hof"


def _lang_scores(text_col: Column) -> dict:
    toks = normalized_tokens(text_col)
    return {lang: _stopword_hits(toks, ws) for lang, ws in STOPWORDS.items()}


def _lang_argmax(scores: dict) -> Column:
    # argmax via ordered CASE cascade: the first language (alphabetical
    # order) whose score is >= every other wins — i.e. max score with
    # alphabetical tie-break, trivially reproducible in SQL.
    chain = None
    for lang in LANGS:
        cond = None
        for other in LANGS:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        chain = F.when(cond, F.lit(lang)) if chain is None else chain.when(cond, F.lit(lang))
    return chain


def language_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Stopword-ratio language ID: count per-language stopword hits over
    whitespace tokens, argmax with alphabetical tie-break.  Returns the
    per-language scores too so the decision is auditable."""
    scores = _lang_scores(F.col(text_col))
    return fan_out(df).select(
        F.col(id_col),
        _lang_argmax(scores).alias("pred_lang"),
        *[scores[lang].alias(f"hits_{lang}") for lang in LANGS],
    )


def language_confusion(df: DataFrame, text_col: str, label_col: str) -> DataFrame:
    """Confusion matrix of the language-ID heuristic against the labeled
    ``label_col``: (lang, pred_lang, n_docs) — the standard classifier
    eval run whenever a heuristic gate (langid, quality, taxonomy) has
    labeled data to check itself against, BEFORE that gate filters a
    corpus.  Per-class precision/recall fall out of the row/column sums.
    One map-side-combinable aggregate over the corpus; output is
    |langs|² rows at any scale."""
    scores = _lang_scores(F.col(text_col))
    return (
        fan_out(df)
        .groupBy(
            F.col(label_col).alias("lang"),
            _lang_argmax(scores).alias("pred_lang"),
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic quality features + a combined score.

    All components are exact int/int divisions; the score is a linear
    combination of them (deterministic doubles)."""
    text = F.col(text_col)
    toks = normalized_tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    # regexp_count, not size(regexp_extract_all(...)): same integer
    # without materializing a match array per row
    punct = F.regexp_count(text, F.lit(r"[^A-Za-z0-9\s]"))
    stop_en = _stopword_hits(toks, STOPWORDS["en"])
    # Σ token lengths = length of the separator-free token join — a flat
    # JVM concat instead of an interpreted per-token aggregate lambda
    mean_tok_len = F.length(F.concat_ws("", toks)).cast("bigint").cast(
        "double"
    ) / n_tok.cast("double")
    punct_ratio = punct.cast("double") / n_chars.cast("double")
    stop_ratio = stop_en.cast("double") / n_tok.cast("double")
    score = (
        F.lit(0.5) * stop_ratio
        - F.lit(0.3) * punct_ratio
        + F.lit(0.02) * mean_tok_len
    )
    return fan_out(df).select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars_txt"),
        punct.alias("n_punct"),
        mean_tok_len.alias("mean_tok_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality"),
    )


def fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Content fingerprint: md5 of the casefolded, whitespace-collapsed
    text — the canonical near-exact-dup key (16 hex chars kept)."""
    return fan_out(df).select(
        F.col(id_col),
        fingerprint_expr(F.col(text_col)).alias("fp"),
    )


def fingerprint_expr(text: Column) -> Column:
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.substring(F.md5(norm), 1, 16)


WINNOW_K = 8          # k-gram width (chars)
WINNOW_W = 4          # winnowing window (grams)
WINNOW_B = 257        # polynomial base
WINNOW_M = (1 << 31) - 1


def _winnow_mins(
    df: DataFrame, text_col: str, id_col: str, k: int, w: int
) -> DataFrame:
    """Shared winnowing core: (id, n_grams, _mins) — dispatches to the
    Arrow-batched kernel (:func:`_winnow_mins_kernel`), which computes
    the identical integers ~10× faster than the expression path
    (:func:`_winnow_mins_expr`, kept for cross-validation: the property
    suite pins kernel ≡ expression on adversarial inputs)."""
    return _winnow_mins_kernel(df, text_col, id_col, k, w)


# Java \s (ASCII-only: space, tab, newline, vertical tab, form feed, CR)
# — Python's \s on str is Unicode-aware and would collapse NBSP etc.,
# silently diverging from the JVM/regexp_replace semantics.
_JAVA_WS = "[ \\t\\n\\x0b\\f\\r]+"


def _winnow_mins_kernel(
    df: DataFrame, text_col: str, id_col: str, k: int, w: int
) -> DataFrame:
    """Vectorized winnowing core: one Arrow batch in, per-doc rolling
    k-gram hashes + window minima via numpy sliding windows — O(n) work
    per document with C-speed inner loops, replacing the expression
    path's O(n·k) interpreted higher-order-function arithmetic (the
    gram hash there re-reads k array elements per position because
    Catalyst lambdas cannot roll state across positions).

    Bit-parity with :func:`_winnow_mins_expr` (property-pinned):
    normalization is lower → collapse JAVA-\\s runs to one space → trim
    spaces; codes are Unicode code points (``F.ascii`` ≡ ``ord``); the
    polynomial sum never overflows int64 (max code point 0x10FFFF ×
    (M-1) × k=20 < 2⁶³) and is reduced mod M exactly once, like the
    bigint expression; dedup keeps first-occurrence order
    (``pd.unique`` ≡ ``F.array_distinct``)."""
    import re

    import numpy as np
    import pandas as pd

    ws = re.compile(_JAVA_WS)
    pw = np.array([pow(WINNOW_B, k - 1 - j, WINNOW_M) for j in range(k)],
                  dtype=np.int64)

    def kernel(batches):
        for pdf in batches:
            ids, ngs, mins = [], [], []
            for doc_id, text in zip(pdf["id"], pdf["txt"]):
                norm = ws.sub(" ", (text or "").lower()).strip(" ")
                codes = np.frombuffer(
                    norm.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                n = len(codes)
                if n < k:
                    ids.append(doc_id); ngs.append(0)
                    mins.append(np.array([], dtype=np.int64))
                    continue
                grams = np.lib.stride_tricks.sliding_window_view(codes, k)
                hashes = (grams @ pw) % WINNOW_M
                if len(hashes) >= w:
                    wins = np.lib.stride_tricks.sliding_window_view(hashes, w)
                    m = wins.min(axis=1)
                else:
                    m = hashes
                ids.append(doc_id); ngs.append(len(hashes))
                mins.append(pd.unique(m))
            yield pd.DataFrame({
                "id": pd.Series(ids, dtype="int64"),
                "n_grams": pd.Series(ngs, dtype="int64"),
                "_mins": mins,
            })

    staged = fan_out(df).select(
        F.col(id_col).alias("id"), F.col(text_col).alias("txt")
    )
    return staged.mapInPandas(
        kernel, "id long, n_grams long, _mins array<bigint>"
    )


def _winnow_mins_expr(
    df: DataFrame, text_col: str, id_col: str, k: int, w: int
) -> DataFrame:
    """Expression-path winnowing core: (id, n_grams, _mins) where
    ``_mins`` is the deduplicated array of per-window minimum Rabin-Karp
    k-gram hashes — the MOSS fingerprint set
    (Schleimer/Wilkerson/Aiken, SIGMOD'03).

    The per-gram hash is the classic Rabin-Karp polynomial
    (Σ c_j·B^(k-1-j) mod M) — a single-threaded scanner computes it
    ROLLING in O(1)/position; here each position's hash is an
    independent JVM array expression (same values, embarrassingly
    parallel, engine-exact integers).  Everything stays in array-land:
    one projection, NO explode, NO shuffle — per-doc cost is O(n·k)
    codegen arithmetic.
    """
    from hotdog_spark.operators import fan_out, track_persist
    from hotdog_spark.operators.dedup import normalized_tokens  # noqa: F401  (same norm family)

    pw = [pow(WINNOW_B, k - 1 - j, WINNOW_M) for j in range(k)]

    # Materialize the normalized text and the per-character code array
    # ONCE per row: embedding the regexp_replace inside every character
    # term would re-run the regexp O(n·k) times per doc (measured
    # minutes-per-500-docs); element_at over a codes array makes each
    # term a plain array lookup.
    staged = fan_out(df).select(
        F.col(id_col).alias("id"),
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")).alias("_norm"),
    ).select(
        "id",
        F.transform(
            F.split(F.col("_norm"), ""),
            lambda c: F.ascii(c).cast("bigint"),
        ).alias("_codes"),
    )

    codes = F.col("_codes")

    def gram_hash(i: Column) -> Column:
        acc = None
        for j, p in enumerate(pw):
            term = F.element_at(codes, i + j) * F.lit(p).cast("bigint")
            acc = term if acc is None else acc + term
        return acc % F.lit(WINNOW_M).cast("bigint")

    n = F.size(codes)
    hashes_expr = F.when(
        n >= k, F.transform(F.sequence(F.lit(1), n - k + 1), gram_hash)
    ).otherwise(F.array().cast("array<bigint>"))
    # stage each big array through a column so it evaluates once per row
    with_hashes = staged.select("id", hashes_expr.alias("_hashes"))
    h = F.col("_hashes")
    mins_expr = F.when(
        F.size(h) >= w,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(h) - w + 1),
                lambda x: F.array_min(F.slice(h, x, w)),
            )
        ),
    ).otherwise(F.array_distinct(h))
    return with_hashes.select(
        "id", F.size(h).cast("bigint").alias("n_grams"), mins_expr.alias("_mins")
    )


def winnowing_fingerprints(
    df: DataFrame, text_col: str, id_col: str,
    k: int = WINNOW_K, w: int = WINNOW_W,
) -> DataFrame:
    """Winnowing document fingerprints (MOSS local fingerprinting): the
    compact comparable form of the fingerprint set — distinct-minima
    count plus their exact integer sum.  See :func:`_winnow_mins` for
    the algorithm and plan shape (no explode, no shuffle)."""
    with_mins = _winnow_mins(df, text_col, id_col, k, w)
    return with_mins.select(
        "id",
        "n_grams",
        F.size("_mins").cast("bigint").alias("n_fp"),
        F.coalesce(
            F.aggregate("_mins", F.lit(0).cast("bigint"), lambda a, x: a + x),
            F.lit(0).cast("bigint"),
        ).alias("fp_sum"),
    )


CDC_K = 16       # rolling-hash gram width for chunk boundaries
CDC_DIV = 64     # boundary divisor: expected chunk length ~ CDC_DIV chars


def cdc_chunk_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = CDC_K,
    div: int = CDC_DIV,
) -> DataFrame:
    """Content-defined chunking (CDC) dedup profile — Rabin-style
    chunking (Muthitacharoen, Chen & Mazières 2001, "A low-bandwidth
    network file system", public; the same boundary rule restic/borg/
    LBFS use): a chunk boundary falls wherever the rolling k-gram
    Rabin-Karp hash ≡ 0 (mod ``div``).  Boundaries are a pure function
    of LOCAL content, so an insertion near the start of a document
    shifts at most one boundary instead of re-aligning every fixed-
    width chunk — the property that makes CDC the standard sub-document
    dedup unit for storage systems and training-corpus pipelines alike
    (shared boilerplate paragraphs hash to identical chunks no matter
    where they sit in the document).

    Semantics (mirrored integer-exactly by the DuckDB oracle): text is
    normalized (lower, whitespace collapsed, trimmed); gram hashes use
    the winnowing constants (B=257, M=2³¹−1); cut positions are the
    hash indices i ≥ 2 with hash[i] % div == 0 (i ≥ 2 keeps the first
    chunk non-empty); chunks are the substrings between consecutive
    boundaries [1, cuts…, len+1], each identified by its md5.  A
    document shorter than k chars is one whole-text chunk; empty text
    yields no chunks.

    Returns one row per document: (doc_id, n_chunks, n_unique
    within-doc distinct chunk hashes, n_shared chunk instances whose
    hash also occurs in ≥ 1 OTHER document, shared_ppm = n_shared·10⁶
    div n_chunks — exact integer arithmetic, no floats).

    PLAN SHAPE: chunking is one fanned-out projection (array-land JVM
    codegen — no explode until the instance table, no UDF anywhere);
    the instance table aggregates by (doc, chunk-hash) — no hot key:
    per-doc cardinality is bounded — then by chunk-hash with map-side
    combinable MIN/MAX partials (a boilerplate chunk shared by every
    document costs one partial row per map task, never a full-row
    funnel); the shared flag returns via an equi-join on chunk-hash
    that AQE's skew-join handling splits if a hash is degenerate-hot,
    and the final per-doc rollup re-keys by doc_id.  Three exchanges +
    one join, all keyed, corpus never self-joined."""
    from hotdog_spark.operators import fan_out

    pw = [pow(WINNOW_B, k - 1 - j, WINNOW_M) for j in range(k)]

    staged = (
        fan_out(df)
        .select(
            F.col(id_col).alias("doc_id"),
            F.trim(
                F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
            ).alias("_norm"),
        )
        .filter(F.length("_norm") >= 1)
        .select(
            "doc_id",
            "_norm",
            F.transform(
                F.split(F.col("_norm"), ""),
                lambda c: F.ascii(c).cast("bigint"),
            ).alias("_codes"),
        )
    )

    # Py4J expression diet (r12, guide §7.3): the 16-term gram hash, the
    # cut filter and the chunk transform used to be composed op-by-op
    # through the Column API (~2,000 gateway round-trips traced per
    # build); each now arrives as ONE parsed SQL string building the
    # identical expression tree — same element_at/multiply/modulo nodes,
    # same exact bigint arithmetic, every oracle hash unchanged.
    gram_terms = " + ".join(
        f"element_at(_codes, i + {j}) * {p}L" for j, p in enumerate(pw)
    )
    hashes_expr = F.expr(
        f"CASE WHEN size(_codes) >= {k} THEN "
        f"transform(sequence(1, size(_codes) - {k} + 1),"
        f" i -> ({gram_terms}) % {WINNOW_M}L) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )
    with_h = staged.select("doc_id", "_norm", hashes_expr.alias("_hashes"))

    # cut indices: i in [2, size(h)] with h[i] % div == 0.  sequence()
    # DESCENDS when end < start (the repo's documented trap), so gate on
    # size(h) >= 2 before building [2..size(h)].
    cuts = (
        f"CASE WHEN size(_hashes) >= 2 THEN "
        f"filter(sequence(CAST(2 AS BIGINT), CAST(size(_hashes) AS BIGINT)),"
        f" i -> element_at(_hashes, CAST(i AS INT)) % {div} = 0) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )
    bounds = F.expr(
        f"concat(array(CAST(1 AS BIGINT)), {cuts},"
        f" array(CAST(length(_norm) + 1 AS BIGINT)))"
    )
    with_b = with_h.select("doc_id", "_norm", bounds.alias("_bs"))

    chunks = F.expr(
        "transform(sequence(1, size(_bs) - 1),"
        " j -> md5(substr(_norm, CAST(element_at(_bs, j) AS INT),"
        " CAST(element_at(_bs, j + 1) - element_at(_bs, j) AS INT))))"
    )
    inst = with_b.select(
        "doc_id", F.explode(chunks).alias("ch")
    )

    # NOT persisted (examined r11): per_doc_ch feeds both the shared-flag
    # aggregate and the join-back, but both consumers sit directly above
    # per_doc_ch's OWN exchange, and AQE's runtime stage reuse already
    # dedups that identical shuffle stage — the audited final plan shows
    # ONE documents scan.  An explicit persist was tried and REVERTED:
    # it blocked the stage reuse (plan_audit: exchanges 3→4, scans 1→2,
    # a gate regression) and only looked faster inside a noisy window.
    # (Contrast repeated_ngram_spans, whose duplicated subtree is a
    # PROJECTION below its consumers' differing exchanges — no stage for
    # AQE to reuse, so the persist there is load-bearing.)
    per_doc_ch = inst.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).alias("n_occ")
    )
    ch_shared = per_doc_ch.groupBy("ch").agg(
        (F.min("doc_id") != F.max("doc_id")).alias("shared")
    )
    return (
        per_doc_ch.join(ch_shared, "ch")
        .groupBy("doc_id")
        .agg(
            F.sum("n_occ").alias("n_chunks"),
            F.count(F.lit(1)).alias("n_unique"),
            F.sum(F.when(F.col("shared"), F.col("n_occ")).otherwise(F.lit(0)))
            .alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_unique",
            "n_shared",
            F.expr("n_shared * 1000000 div n_chunks").alias("shared_ppm"),
        )
    )


def winnowing_pairs(
    df: DataFrame, text_col: str, id_col: str,
    k: int = 20, w: int = WINNOW_W,
    max_df: int = 50, min_shared: int = 3,
    saturation_warn_ratio: float = 4.0,
    pair_mass_warn_per_doc: float = 20.0,
) -> DataFrame:
    """Winnowing overlap detection (MOSS stage 2): find document pairs
    sharing >= ``min_shared`` winnowing fingerprints — the join MOSS runs
    over its fingerprint index to flag likely plagiarism/boilerplate.

    Scale discipline mirrors ``dedup_ngram_jaccard``'s capped token join:
    a fingerprint appearing in more than ``max_df`` documents (boilerplate
    everyone shares) would contribute O(df²) candidate pairs, so hot
    fingerprints are counted once and removed via a BROADCAST anti-join
    before the self-join — the pair blow-up is bounded by max_df² per
    fingerprint.  ``n_fp`` (the pre-cap per-doc fingerprint count) rides
    the exploded rows so the pair aggregate needs no join-back.  The
    default k=20 chars (vs 8 for the per-doc digest) makes grams span
    several tokens, the regime where shared fingerprints indicate real
    overlap rather than vocabulary coincidence.

    Returns (id_a, id_b, shared_fp, n_fp_a, n_fp_b, overlap) with
    overlap = shared / min(n_fp) — the containment form, robust to
    length mismatch.  Reference anchor: the reference has no analog
    (it is a syslog router); this extends SURVEY §7.3 M5.

    MEASURED SCALE CHARACTERISTIC (sf10): on the synthetic 31-word
    corpus the TRUE RESULT grows quadratically — 404 k pairs at 50 k
    docs → 21.6 M pairs at 500 k docs — because the 20-char gram space
    saturates and unrelated documents genuinely share ≥ min_shared
    fingerprints.  The operator's work stays proportional to candidates
    (392 M candidate rows → 21.6 M output in ~118 s, ~0.3 µs/candidate);
    no plan can emit a 21.6 M-row answer with sub-answer-sized shuffle.
    On a rich-vocabulary corpus the answer (and hence cost) stays near
    linear; the dials when a corpus saturates are gram width ``k``
    (wider grams ⇒ fewer coincidental matches) and ``max_df`` (lower ⇒
    only rarer, more discriminative fingerprints pair).  Same
    saturation finding as word-set Jaccard (ngram_jaccard_pairs
    docstring), one representation level down.

    SHUFFLE DIET (sf1-measured): the first shape self-joined the exploded
    (id, n_fp, fp) table on fp — the fingerprint rows (with the n_fp
    payload riding every one) crossed the wire twice for the join plus
    once more as 4-column pair keys, 237 MB at sf1, the repo's largest
    shuffle.  Now the fp rows shuffle ONCE, as bare 2-column (id, fp)
    rows, into a groupBy(fp) whose bounded id-lists (df <= max_df, so
    <= max_df elements) generate the pairs MAP-SIDE from each list; the
    pair aggregate keys on (id_a, id_b) only, and the per-doc sizes join
    back onto the (tiny, post-threshold) result instead of riding the
    hot path.  Same answer, one skinny shuffle instead of three wide
    ones — and the hot-fp cap becomes a free filter on the grouped list
    size instead of a separate aggregate + anti-join.  r12: the per-doc
    sizes table stopped being a groupBy(id) aggregate over the exploded
    fingerprints (a full-table exchange) and is now a shuffle-free
    ``size(_mins)`` projection of the persisted doc-level fingerprint
    arrays — the persist moved BELOW the explode, so the cache holds one
    row per document instead of one per fingerprint.
    """
    # persist the DOC-level kernel output (one row per doc, fingerprint
    # ARRAY column), not the exploded fingerprint table (r12, VERDICT r11
    # item 7): the cache shrinks (no id repeated per fingerprint) and —
    # the exchange diet — the per-doc sizes stop being a full-table
    # groupBy(id) aggregate over the exploded rows and become a
    # shuffle-free `size(_mins)` projection of this cache (§2.4: a
    # `distinct`/aggregate over data that is already unique per row is
    # an Exchange for nothing; `_mins` is array_distinct per doc, so
    # size(_mins) IS the exact count the old aggregate produced).  Cost:
    # the explode below now runs once per fp-consumer (per_fp and the
    # pair join) instead of once into a cache — a plain array explode
    # over cached arrays, no winnowing recompute (the persist boundary
    # is what keeps the O(n·k) kernel single-evaluation, as before).
    mins = track_persist(
        _winnow_mins(df, text_col, id_col, k, w).select("id", "_mins")
    )
    # explode_OUTER, not explode: for an inner explode Catalyst's
    # InferFiltersFromGenerate synthesizes `size(_mins) > 0` — harmless
    # above the persist boundary, but kept outer for parity with the
    # pre-persist lesson (pushed below the staging projections it
    # INLINED the whole winnowing chain, re-evaluating the _codes
    # transform inside every element_at of the hash lambda; measured
    # minutes-per-500-docs).  The post-filter on the GENERATED attribute
    # is free either way.
    fps = mins.select(
        F.col("id"),
        F.explode_outer("_mins").alias("fp"),
    ).filter(F.col("fp").isNotNull())
    # SATURATION GUARD (sf10 finding, VERDICT r5): on a small-vocabulary
    # corpus the k-char gram space saturates and the TRUE answer grows
    # quadratically (404 k pairs at 50 k docs → 21.6 M at 500 k on the
    # synthetic corpus) — previously a silent 5 GB shuffle the user hit
    # before reading the docstring.  The signal is the distinct-
    # fingerprint : document ratio: on a rich corpus each doc contributes
    # mostly-unique fingerprints (ratio ≈ mean n_fp, tens), at
    # saturation distinct fps stop growing with the corpus and the ratio
    # collapses toward 0.  The check is one skinny aggregate over the
    # persisted doc-level cache (two counts, map-side combinable, O(1)
    # driver rows) — the only eager step in the operator, and its action
    # doubles as the materialization of that cache for every downstream
    # consumer.
    # per-fp document frequencies and per-doc sizes are needed by BOTH
    # the guard (eager, below) and the pair pipeline (lazy: `eligible`
    # filters per_fp, the result joins back onto `sizes`) — persist the
    # two skinny aggregates so the guard's eager pass doubles as their
    # materialization instead of re-scanning fps twice (sf0.1-measured:
    # the guard's standalone aggregates cost ~0.5 s, most of the r5→r6
    # winnowing bench delta).
    per_fp = track_persist(fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_df")))
    # n_fp = size(_mins): exchange-free projection of the doc-level cache
    # (see the persist note above).  The >= 1 filter reproduces the old
    # aggregate's domain exactly — a doc whose text is shorter than k
    # chars has an EMPTY _mins, produced no exploded rows, and therefore
    # had no row in the old groupBy(id) sizes table (keeps the guard's
    # n_docs denominator and the join-back domain bit-identical).
    # Persisted (skinny: two columns, one row per doc) so the two
    # join-backs below read this instead of re-projecting the array
    # cache twice.
    sizes = track_persist(
        mins.select(
            "id", F.size("_mins").cast("bigint").alias("n_fp")
        ).filter(F.col("n_fp") >= 1)
    )
    if saturation_warn_ratio > 0:
        import warnings

        # TWO saturation signals, because they catch different regimes
        # (sf10 finding, VERDICT r5 item 5 follow-up):
        #  1. distinct-fp : doc ratio — collapses when the gram space is
        #     exhausted (tiny vocab, short grams).  In that regime most
        #     fps exceed max_df, so the answer is EITHER quadratic or
        #     fully capped-away; both deserve a warning.
        #  2. candidate-pair mass — sum of C(df, 2) over the fps that
        #     will actually join (2 <= df <= max_df), per document.
        #     This is the literal candidate volume of the downstream
        #     self-join, the quantity that exploded 53x at sf10 while
        #     the ratio signal stayed ABOVE its threshold (measured:
        #     the sf10 corpus keeps >= 4 distinct fps per doc yet
        #     carries ~784 candidates per doc).  Computed from the SAME
        #     persisted per-fp df aggregate the pipeline's eligibility
        #     filter reads — guard-only cost is two O(1)-driver-row
        #     reductions over already-persisted tables, disabled by
        #     saturation_warn_ratio=0.
        # ONE action for both guard reductions (r11, guide §1.2: the
        # guard was two sequential driver jobs — the per_fp stats and a
        # separate sizes.count() — each paying full job latency; the
        # cross-join of two single-row aggregates evaluates both
        # subtrees in one job and still materializes both persists).
        stats = (
            per_fp.agg(
                F.count(F.lit(1)).alias("d"),
                F.sum(
                    F.when(
                        (F.col("_df") >= 2) & (F.col("_df") <= max_df),
                        F.col("_df").cast("double")
                        * (F.col("_df") - 1).cast("double") / 2.0,
                    ).otherwise(0.0)
                ).alias("pair_mass"),
            )
            .crossJoin(sizes.agg(F.count(F.lit(1)).alias("n_docs")))
            .collect()[0]
        )
        n_docs = stats["n_docs"]
        dials = (
            "  Dials: widen gram width k (fewer coincidental matches), "
            "lower max_df (only rarer fingerprints pair), or raise "
            "min_shared."
        )
        if n_docs and stats["d"] / n_docs < saturation_warn_ratio:
            warnings.warn(
                "winnowing_pairs: fingerprint space is SATURATED — "
                f"{stats['d']:,} distinct fingerprints across "
                f"{n_docs:,} documents "
                f"(ratio {stats['d'] / n_docs:.2f} < "
                f"{saturation_warn_ratio}); unrelated documents will "
                "genuinely share >= min_shared fingerprints and the "
                "answer (and its shuffle) grows quadratically with the "
                "corpus." + dials,
                stacklevel=2,
            )
        elif n_docs and (stats["pair_mass"] or 0.0) / n_docs > pair_mass_warn_per_doc:
            warnings.warn(
                "winnowing_pairs: candidate-pair mass is SATURATED — the "
                f"eligible fingerprints generate ~{stats['pair_mass']:,.0f} "
                f"candidate pairs for {n_docs:,} documents "
                f"({stats['pair_mass'] / n_docs:,.1f} per doc > "
                f"{pair_mass_warn_per_doc}); the answer (and its shuffle) "
                "is growing quadratically with the corpus even though "
                "per-doc fingerprints look diverse." + dials,
                stacklevel=2,
            )
    # COUNT FIRST, COLLECT SECOND (sf10-measured): collecting id-lists
    # and then filtering on size materializes the FULL list for every
    # ubiquitous fingerprint before the cap can apply — at sf10 that
    # meant multi-100k-element aggregation buffers, 6.7 GB of spill and
    # a 12.7× time ratio.  The count aggregate is map-side combinable
    # (counts, never lists), the eligible-fp filter (2 ≤ df ≤ max_df)
    # applies before any list exists, and the fp-keyed join + groupBy
    # reuse one partitioning, so every collected list is ≤ max_df
    # elements by construction.  per_fp is the persisted guard aggregate.
    eligible = per_fp.filter(
        (F.col("_df") >= 2) & (F.col("_df") <= max_df)
    ).select("fp")
    grouped = (
        fps.join(eligible, "fp")
        .groupBy("fp")
        .agg(F.array_sort(F.collect_list("id")).alias("ids"))
    )
    # pair generation is a map-side array expression over each bounded
    # list: element i pairs with every later element
    pair_expr = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    pairs = (
        grouped.select(F.explode(pair_expr).alias("p"))
        .select("p.id_a", "p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("bigint").alias("shared_fp"))
        .filter(F.col("shared_fp") >= min_shared)
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_fp").alias("n_fp_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_fp").alias("n_fp_b"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a", "id_b", "shared_fp", "n_fp_a", "n_fp_b",
            (
                F.col("shared_fp").cast("double")
                / F.least("n_fp_a", "n_fp_b").cast("double")
            ).alias("overlap"),
        )
    )


def quality_expr(text: Column) -> Column:
    """The combined quality score as a single reusable expression.
    Same forms as quality_score: regexp_count for punctuation,
    concat_ws-length for Σ token lengths, and the A/B-selected
    _stopword_hits — identical integers either way."""
    toks = normalized_tokens(text)
    n_tok = F.size(toks)
    mean_tok_len = F.length(F.concat_ws("", toks)).cast("bigint").cast(
        "double"
    ) / n_tok.cast("double")
    punct_ratio = (
        F.regexp_count(text, F.lit(r"[^A-Za-z0-9\s]")).cast("double")
        / F.length(text).cast("double")
    )
    stop_ratio = _stopword_hits(toks, STOPWORDS["en"]).cast("double") / n_tok.cast("double")
    return F.lit(0.5) * stop_ratio - F.lit(0.3) * punct_ratio + F.lit(0.02) * mean_tok_len


def pred_lang_expr(text: Column) -> Column:
    """Argmax language as a single reusable expression (alphabetical
    tie-break, same cascade as language_id)."""
    toks = normalized_tokens(text)
    scores = {lang: _stopword_hits(toks, ws) for lang, ws in STOPWORDS.items()}
    chain = None
    for lang in LANGS:
        cond = None
        for other in LANGS:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        chain = F.when(cond, F.lit(lang)) if chain is None else chain.when(cond, F.lit(lang))
    return chain


def clean_corpus(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_quality: float = 0.1,
    lang: str = "en",
) -> DataFrame:
    """The composed training-data cleaning pipeline in ONE scan:

        score quality → keep target language → exact-near-dup collapse
        (fingerprint groups, canonical = min id)

    Every stage is a column expression over the same projection, so the
    physical plan is scan → project → filter → one hash aggregate — no
    self-joins, no repeated scans of the corpus.  At 100 TB this is the
    shape that matters: feature extraction rides the dedup shuffle for
    free.  Returns (fp, keep_id, dup_count, quality of the kept doc =
    min-id doc's quality via min_by).
    """
    text = F.col(text_col)
    feats = fan_out(df).select(
        F.col(id_col).alias("_id"),
        quality_expr(text).alias("quality"),
        pred_lang_expr(text).alias("pred_lang"),
        fingerprint_expr(text).alias("fp"),
    )
    survivors = feats.filter(
        (F.col("quality") > min_quality) & (F.col("pred_lang") == lang)
    )
    return survivors.groupBy("fp").agg(
        F.min("_id").alias("keep_id"),
        F.count(F.lit(1)).alias("dup_count"),
        F.min_by("quality", "_id").alias("keep_quality"),
    )


def top_terms(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """Per-document top-k terms by frequency (term-frequency ranking,
    ties broken alphabetically).

    Shape: explode → two-level aggregation keyed by (doc, term) → ranking
    window partitioned by doc.  Both shuffles share the doc-id prefix, so
    at scale the window rides the aggregation's partitioning.  Returns
    (id, tok, cnt, rnk).
    """
    from pyspark.sql.window import Window

    from hotdog_spark.operators import fan_out, track_persist
    from hotdog_spark.operators.dedup import normalized_tokens

    toks = fan_out(df).select(
        F.col(id_col).alias("id"),
        F.explode(normalized_tokens(F.col(text_col))).alias("tok"),
    )
    cnt = toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("id").orderBy(F.col("cnt").desc(), F.col("tok"))
    return cnt.select(
        "id", "tok", "cnt", F.row_number().over(w).alias("rnk")
    ).filter(F.col("rnk") <= k)


def rare_term_salience(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Per-document top-k salient terms by tf × (N/df) — the LOG-FREE
    inverse-document-frequency weighting.

    Why not ln: the classic tf·ln(N/df) needs a transcendental whose
    rounding IEEE-754 does NOT pin down — Java's Math.log (Spark) and
    libm's log (DuckDB/C engines) may differ in the last ulp, which is
    enough to flip ranks at near-ties and break cross-engine
    reproducibility.  tf·N/df uses only correctly-rounded ops (* /) over
    exact integers, so every engine produces bit-identical scores and the
    SAME ranking; it preserves the property that matters (rarer ⇒ higher
    weight, monotone in 1/df).

    Shape: one (doc, term) aggregate, a token-keyed join against the
    df table, and a doc-partitioned ranking window that reuses the
    aggregation's doc-prefix partitioning.  Returns
    (id, tok, cnt, df, salience, rnk).
    """
    from pyspark.sql.window import Window

    from hotdog_spark.operators import fan_out, track_persist
    from hotdog_spark.operators.dedup import normalized_tokens

    toks = fan_out(df).select(
        F.col(id_col).alias("id"),
        F.explode(normalized_tokens(F.col(text_col))).alias("tok"),
    )
    cnt = toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    dfreq = (
        toks.select("id", "tok").distinct()
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        cnt.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "salience",
            F.col("cnt").cast("double")
            * F.col("n_docs").cast("double")
            / F.col("df").cast("double"),
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.col("salience").desc(), F.col("tok")
    )
    return scored.select(
        "id", "tok", "cnt", "df", "salience",
        F.row_number().over(w).alias("rnk"),
    ).filter(F.col("rnk") <= k)


def repetition_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher-style repetition quality signals per document.

    Returns (id, n_tokens, n_distinct, distinct_ratio, top_tok_cnt,
    max_run): total tokens, vocabulary size, their exact ratio, the count
    of the most frequent token, and the longest run of consecutive
    identical tokens — the features repetition filters threshold on
    (Rae et al. 2021 §A1.1).

    Shape: posexplode → gaps-and-islands run detection → two-level
    aggregation, every stage keyed by the document id, so the whole
    computation rides ONE doc-keyed shuffle family; nothing is ever
    grouped on a low-cardinality key.
    """
    from pyspark.sql.window import Window

    base = fan_out(df).select(
        F.col(id_col).alias("id"),
        F.posexplode(normalized_tokens(F.col(text_col))).alias("pos", "tok"),
    )
    # Consecutive equal tokens share (pos - rank-within-(id,tok)): the
    # classic islands trick, no sequential scan needed.
    w = Window.partitionBy("id", "tok").orderBy("pos")
    runs = (
        base.withColumn("grp", F.col("pos") - F.row_number().over(w))
        .groupBy("id", "tok", "grp")
        .agg(F.count(F.lit(1)).alias("run"))
    )
    per_tok = runs.groupBy("id", "tok").agg(
        F.sum("run").alias("cnt"), F.max("run").alias("mrun")
    )
    return per_tok.groupBy("id").agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        (
            F.count(F.lit(1)).cast("double") / F.sum("cnt").cast("double")
        ).alias("distinct_ratio"),
        F.max("cnt").alias("top_tok_cnt"),
        F.max("mrun").alias("max_run"),
    )


def doc_frequency(df: DataFrame, text_col: str, id_col: str, top: int = 20) -> DataFrame:
    """Corpus document frequency: for the ``top`` most widespread terms,
    how many documents contain them, next to the corpus size (the exact
    inputs of IDF — the log is left to the caller so the output stays
    engine-exact integers).

    One explode of per-doc distinct tokens → hash aggregate on token →
    global top-k; the corpus size joins in as a single-row broadcast.
    Returns (tok, df, n_docs).
    """
    from hotdog_spark.operators import fan_out, track_persist
    from hotdog_spark.operators.dedup import normalized_tokens

    per_doc = fan_out(df).select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(normalized_tokens(F.col(text_col)))).alias("tok"),
    )
    dfreq = per_doc.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        dfreq.crossJoin(F.broadcast(n_docs))
        .orderBy(F.col("df").desc(), F.col("tok"))
        .limit(top)
    )


def classify_by_taxonomy(
    df: DataFrame,
    text_col: str,
    id_col: str,
    taxonomy: dict[str, str],
) -> DataFrame:
    """Keyword-taxonomy topic tagging: explode tokens, equi-join against
    the (term → topic) taxonomy, count hits per (doc, topic), keep each
    document's top topic (ties broken alphabetically).

    The taxonomy is a curated vocabulary — thousands of terms at most —
    so the join is a broadcast hash join against the exploded corpus:
    no shuffle touches the corpus until the per-doc argmax, whose input
    is already collapsed to (doc, topic) rows.  Returns
    (id, topic, hits).
    """
    from pyspark.sql.window import Window

    tax = df.sparkSession.createDataFrame(
        sorted(taxonomy.items()), ["tok", "topic"]
    )
    toks = fan_out(df).select(
        F.col(id_col).alias("id"),
        F.explode(normalized_tokens(F.col(text_col))).alias("tok"),
    )
    hits = (
        toks.join(F.broadcast(tax), "tok")
        .groupBy("id", "topic")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    w = Window.partitionBy("id").orderBy(F.col("hits").desc(), F.col("topic"))
    return (
        hits.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def bm25_rational_topk(
    df: DataFrame, text_col: str, id_col: str,
    terms: list[str], topk: int = 20,
) -> DataFrame:
    """BM25 relevance scoring with the RATIONAL idf variant
    (idf = (N - df + 0.5)/(df + 0.5), i.e. BM25's idf without the log —
    log's last-ulp divergence between libm implementations breaks
    cross-engine bit-exactness, the same reason rare_term_salience is
    log-free; */÷ are correctly rounded so scores hash identically).
    k1 = 1.2, b = 0.75 (the standard Robertson constants, kept as
    literals on both engines so no computed-constant drift).

    Plan shape: ONE tiny corpus-stats aggregate (N, Σdl, df per query
    term — a single row) broadcast back over the scan, score as a pure
    projection, then global top-k via sort+limit (TakeOrderedAndProject,
    no single-reducer window).  Corpus-side cost is two scans and an
    O(1)-row shuffle at any scale.
    """
    from hotdog_spark.operators import fan_out, track_persist
    from hotdog_spark.operators.dedup import normalized_tokens
    from pyspark.sql.window import Window

    base = fan_out(df).select(
        F.col(id_col).alias("id"),
        normalized_tokens(F.col(text_col)).alias("_toks"),
    ).select(
        "id", "_toks", F.size("_toks").cast("bigint").alias("dl")
    )
    stat_aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    ]
    for i, t in enumerate(terms):
        stat_aggs.append(
            F.sum(
                F.when(F.array_contains("_toks", t), F.lit(1)).otherwise(F.lit(0))
            ).cast("bigint").alias(f"df_{i}")
        )
    stats = base.agg(*stat_aggs)

    scored = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    contrib = None
    for i, t in enumerate(terms):
        # NB: the HOF lambda must be strictly unary — PySpark infers arity
        # from the signature, and any second param (even defaulted) turns
        # it into the (element, index) form, binding the index column.
        # A factory closure captures the term without widening the arity.
        def _eq(term):
            return lambda x: x == F.lit(term)

        tf = F.size(F.filter("_toks", _eq(t))).cast("double")
        idf = (
            (F.col("n_docs") - F.col(f"df_{i}")).cast("double") + F.lit(0.5)
        ) / (F.col(f"df_{i}").cast("double") + F.lit(0.5))
        term_score = idf * (tf * F.lit(2.2)) / (
            tf + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("dl").cast("double") / avgdl)
        )
        contrib = term_score if contrib is None else contrib + term_score
    scored = scored.select("id", "dl", contrib.alias("score"))
    top = scored.orderBy(F.col("score").desc(), F.col("id")).limit(topk)
    w = Window.orderBy(F.col("score").desc(), F.col("id"))
    return top.withColumn("rank", F.row_number().over(w))


def lm_bigram_familiarity(
    df: DataFrame,
    text_col: str,
    id_col: str,
    rare_denom: int = 200,
) -> DataFrame:
    """Corpus-trained bigram language-model FAMILIARITY score (the
    CCNet-style "does this document look like the rest of the corpus"
    quality signal, kept transcendental-free for cross-engine parity):
    train MLE bigram conditional probabilities p(w2|w1) =
    c(w1,w2)/c(w1·) over the WHOLE corpus, then score every document by

    - ``n_bigrams``  — adjacent-token pairs in the document,
    - ``mean_p``     — arithmetic mean of its bigram probabilities
      (each p is ONE exactly-rounded IEEE division; the per-doc sum of
      ~10² doubles carries ~1e-14 relative order-noise, far below the
      comparator's 10-significant-digit canon — no logs anywhere, so no
      libm divergence between the JVM and DuckDB),
    - ``n_rare`` / ``rare_frac`` — transitions rarer than
      1/``rare_denom`` of their context, decided by the EXACT integer
      cross-multiplication c(w1,w2)·rare_denom < c(w1·).

    Documents scoring low (small mean_p, high rare_frac) are the
    unfamiliar/garbled tail a curation pipeline drops or down-weights.

    Plan at scale: one explode over the corpus (the token stream a
    tokenizer pass reads anyway), two keyed aggregates for the model
    (bigram types are vocabulary-bounded, not corpus-bounded — and the
    map-side partial aggregation means BOTH exchanges carry only
    vocab-sized partials), two joins to score — AQE broadcasts the
    model tables when they fit; at web scale you would add a min-count
    floor so the bigram table stays memory-resident (the classic LM
    cutoff — the join keys and shapes are unchanged).  The exploded
    stream is persisted once and feeds model-build and scoring, so the
    corpus is tokenized exactly once.

    Shape tried and REJECTED (r12, measured): deriving ``cc`` from
    ``cb`` (Σ_w2 c(w1,w2) = c(w1·)) plus a vocab-side ``cb ⨝ cc``
    model join so the corpus stream passes one join instead of two —
    a wash at sf0.1 (1.03×) and 1.40× WORSE at sf1 (1/5 interleaved
    pairs): the static plan shows the (w1,w2) aggregate exchange is
    NOT reused for the cc derivation (the cache is scanned and
    aggregated twice anyway) and the planner flips the scoring join to
    build on the corpus-sized stream.  The two-aggregate shape already
    ships vocab-sized partials, so there was no corpus-sized shuffle
    to remove in the first place.
    """
    bg = track_persist(bigram_stream(df, text_col, id_col))
    cb = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    cc = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("ctx"))
    return lm_bigram_score(bg, cb, cc, id_col, rare_denom=rare_denom)


def bigram_stream(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) adjacent-token pairs — the shared front of LM
    training and scoring.  Pure projection + generator: runs unchanged
    under Structured Streaming."""
    toks = normalized_tokens(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("t")).filter(F.size("t") >= 2)
    return base.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 2),"
                " i -> struct(t[i] AS w1, t[i + 1] AS w2))"
            )
        ).alias("b"),
    ).select(id_col, "b.w1", "b.w2")


def lm_bigram_score(
    bg: DataFrame,
    cb: DataFrame,
    cc: DataFrame,
    id_col: str,
    rare_denom: int = 200,
) -> DataFrame:
    """Score a bigram stream against a PREBUILT model (``cb`` =
    (w1, w2, cnt) bigram counts, ``cc`` = (w1, ctx) context counts).
    Factored out of :func:`lm_bigram_familiarity` so the production
    shape works too: train the model in batch, score live documents via
    STREAM-STATIC joins (both joins and the per-doc aggregate run
    unchanged under Structured Streaming with the model as the static
    side — see tests/test_streaming.py::test_streaming_lm_scoring)."""
    scored = (
        bg.join(cb, ["w1", "w2"])
        .join(cc, ["w1"])
        .select(
            F.col(id_col),
            (F.col("cnt").cast("double") / F.col("ctx").cast("double")).alias("p"),
            (F.col("cnt") * F.lit(rare_denom) < F.col("ctx"))
            .cast("long")
            .alias("rare"),
        )
    )
    n = F.count(F.lit(1))
    return scored.groupBy(id_col).agg(
        n.alias("n_bigrams"),
        # mean_p is a float SUM: per-doc it carries ~1e-14 relative
        # accumulation-order noise, which at corpus scale WILL flip the
        # 10th significant digit for ~1-in-10^4 documents (measured: the
        # sf10 digest mismatched on exactly this column).  min/max of
        # exactly-rounded single divisions are order-independent, so
        # cross-engine comparisons should use those + the integer rare
        # counters; mean_p stays for users with that caveat.
        (F.sum("p") / n.cast("double")).alias("mean_p"),
        F.min("p").alias("min_p"),
        F.max("p").alias("max_p"),
        F.sum("rare").alias("n_rare"),
        (F.sum("rare").cast("double") / n.cast("double")).alias("rare_frac"),
    )


def _token_bucket_py(tok: str, buckets: int) -> int:
    """Driver-side twin of the index's token→bucket hash (md5 leading
    4 hex digits mod buckets) — used to decide WHICH partitions a query
    needs before any scan happens."""
    import hashlib

    return int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:4], 16) % buckets


def materialize_inverted_index(
    df: DataFrame, text_col: str, id_col: str, path: str, buckets: int = 64
) -> None:
    """Materialize a token INVERTED INDEX partitioned by token-hash
    bucket — the search-engine counterpart of ``materialize_minhash_index``
    (dedup) and ``materialize_ivf_index`` (ANN): postings are
    (tok, id, tf) rows, laid out so a term query scans ONLY the
    partitions its terms hash into (parquet partition pruning, asserted
    in tests/test_plans.py) instead of the corpus.

    Bucketing by hash rather than raw token keeps the directory count
    fixed (``buckets``) at any vocabulary size — a million-term corpus
    still writes 64 directories — while lookups stay exact: the bucket
    prunes the scan, the residual ``tok IN (…)`` filter (pushed to
    parquet row groups) does the rest."""
    from hotdog_spark.operators import fan_out
    from hotdog_spark.operators.dedup import normalized_tokens

    toks = fan_out(df).select(
        F.col(id_col).alias("id"),
        F.explode(normalized_tokens(F.col(text_col))).alias("tok"),
    ).filter(F.col("tok") != "")
    postings = toks.groupBy("tok", "id").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    postings.withColumn(
        "bucket",
        F.pmod(
            F.conv(F.substring(F.md5(F.col("tok")), 1, 4), 16, 10).cast("int"),
            F.lit(buckets),
        ),
    ).write.partitionBy("bucket").mode("overwrite").parquet(path)


def search_terms_from_index(
    spark, path: str, terms: list[str], buckets: int = 64
) -> DataFrame:
    """Exact posting lookup from a materialized inverted index: computes
    the query terms' buckets DRIVER-SIDE (same md5 law as the writer),
    so the scan carries a ``bucket IN (…)`` partition filter — only the
    matching directories are read — plus the pushed ``tok IN (…)``
    residual.  Returns (tok, id, tf) postings."""
    want = sorted({_token_bucket_py(t, buckets) for t in terms})
    idx = spark.read.parquet(path)
    return idx.filter(idx.bucket.isin(want)).filter(
        idx.tok.isin(list(terms))
    ).select("tok", "id", "tf")


# Gopher's "must contain" stopword inventory (Rae et al. 2021, table A1).
GOPHER_REQUIRED_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher-style document quality rules (public: Rae et al. 2021,
    arXiv:2112.11446 §A.1.1 — the rule set MassiveText was washed with,
    reused by RefinedWeb/Dolma/FineWeb):

    1. word count within [min_words, max_words]
    2. mean word length within [3, 10] chars
    3. symbol-to-word ratio (``#`` / ``...``) < 0.1
    4. fraction of lines starting with a bullet < 0.9
    5. fraction of lines ending with an ellipsis < 0.3
    6. fraction of words containing an alphabetic char >= 0.8
    7. at least ``min_stop_hits`` distinct required stopwords present

    Every rule is an INTEGER comparison: ratios are tested by
    cross-multiplication (e.g. mean-word-length in [3,10] is
    ``3*n_words <= sum_word_len <= 10*n_words``), so there is no float
    anywhere and the booleans reproduce bit-exactly in any engine.

    Scale shape: one projection over the corpus — counters are
    ``regexp_count`` / ``size`` expressions in whole-stage codegen, the
    required-stopword probe is |inventory| ``array_contains`` literals.
    Zero shuffle, zero Python; at 100 TB this is a full-parallelism scan
    whose output can fuse into the downstream filter.

    Dials: the paper's bounds assume web documents; synthetic or
    domain-specific corpora should re-dial ``min_words`` /
    ``min_stop_hits`` so both branches stay populated (the registered
    query documents its choices).  Returns one row per document with the
    raw counters, the seven per-rule booleans, and ``passes_gopher``.
    """
    text = F.col(text_col)
    toks = normalized_tokens(text)
    n_words = F.size(toks).cast("bigint")
    # Σ token lengths = length of the separator-free join (flat JVM
    # concat, same trick as quality_score's mean_tok_len)
    sum_word_len = F.length(F.concat_ws("", toks)).cast("bigint")
    n_symbols = F.regexp_count(text, F.lit(r"#|\.\.\.")).cast("bigint")
    n_lines = F.size(F.split(text, "\n", -1)).cast("bigint")
    n_bullet_lines = F.regexp_count(text, F.lit(r"(?m)^[-*•] ")).cast(
        "bigint"
    )
    n_ellipsis_lines = F.regexp_count(text, F.lit(r"(?m)\.\.\.$")).cast("bigint")
    n_alpha_words = F.size(
        F.filter(toks, lambda t: t.rlike("[A-Za-z]"))
    ).cast("bigint")
    stop_hits = None
    for w in GOPHER_REQUIRED_STOPS:
        hit = F.array_contains(toks, w).cast("int")
        stop_hits = hit if stop_hits is None else stop_hits + hit
    n_required_stops = stop_hits.cast("bigint")

    rule_word_count = (n_words >= F.lit(min_words)) & (
        n_words <= F.lit(max_words)
    )
    rule_mean_word_len = (F.lit(3) * n_words <= sum_word_len) & (
        sum_word_len <= F.lit(10) * n_words
    )
    rule_symbol_ratio = F.lit(10) * n_symbols < n_words
    rule_bullet = F.lit(10) * n_bullet_lines < F.lit(9) * n_lines
    rule_ellipsis = F.lit(10) * n_ellipsis_lines < F.lit(3) * n_lines
    rule_alpha = F.lit(5) * n_alpha_words >= F.lit(4) * n_words
    rule_stops = n_required_stops >= F.lit(min_stop_hits)

    return fan_out(df).select(
        F.col(id_col),
        n_words.alias("n_words"),
        sum_word_len.alias("sum_word_len"),
        n_symbols.alias("n_symbols"),
        n_lines.alias("n_lines"),
        n_bullet_lines.alias("n_bullet_lines"),
        n_ellipsis_lines.alias("n_ellipsis_lines"),
        n_alpha_words.alias("n_alpha_words"),
        n_required_stops.alias("n_required_stops"),
        rule_word_count.alias("rule_word_count"),
        rule_mean_word_len.alias("rule_mean_word_len"),
        rule_symbol_ratio.alias("rule_symbol_ratio"),
        rule_bullet.alias("rule_bullet"),
        rule_ellipsis.alias("rule_ellipsis"),
        rule_alpha.alias("rule_alpha"),
        rule_stops.alias("rule_stops"),
        (
            rule_word_count
            & rule_mean_word_len
            & rule_symbol_ratio
            & rule_bullet
            & rule_ellipsis
            & rule_alpha
            & rule_stops
        ).alias("passes_gopher"),
    )
