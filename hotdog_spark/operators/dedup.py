"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

All hashing is md5-based so results are engine-independent (the DuckDB
oracles reproduce them bit-for-bit), and every stage is a plain
shuffle-on-key dataflow:

* exact dedup       — one hash-aggregate on md5(text): map-side combinable.
* MinHash + LSH     — explode shingles → per-(doc, band) min over
                      md5(band|shingle) → shuffle on (band, signature) →
                      bucket self-join.  At 100 TB the candidate-pair
                      explosion is bounded by band width; no all-pairs
                      comparison ever happens.
* SimHash           — per-token md5 bits summed per doc (16-bit variant):
                      a single aggregation, integer-exact.
* n-gram Jaccard    — token-set intersection via explode + join on token,
                      candidates pre-bounded by (lang, length) blocking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hotdog_spark.operators import fan_out, track_persist


def normalized_tokens(text: Column) -> Column:
    """lower → trim → split on whitespace runs (identical to DuckDB's
    ``string_split_regex(trim(lower(x)), '\\s+')``)."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def word_shingles(tokens: Column, k: int = 3) -> Column:
    """k-word shingles; texts shorter than k words collapse to one
    whole-text shingle so no document silently drops out."""
    n = F.size(tokens)
    return F.when(
        n < k, F.array(F.concat_ws(" ", tokens))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, k)),
        )
    )


def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: group by content hash, keep the smallest id as the
    canonical representative.  Returns (content_hash, keep_id, group_size)."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, bands: int = 8, k: int = 3
) -> DataFrame:
    """MinHash signatures — dispatches to the Arrow-batched kernel
    (:func:`_minhash_signatures_kernel`): tokenize → k-word shingles →
    ONE md5 per shingle → per-band minima, all inside one map stage with
    C-speed inner loops.  The Catalyst expression twin
    (:func:`_minhash_signatures_expr`) is kept for cross-validation
    (property-pinned bit-identical); sf10 measured its shingle
    explode — 25 M interpreted transform/concat_ws evaluations — at
    ~20 s before a single hash was computed, ~6× the whole kernel.
    Returns (id, band, sig) — one row per (doc, band)."""
    return _minhash_signatures_kernel(df, text_col, id_col, bands, k)


def _minhash_signatures_kernel(
    df: DataFrame, text_col: str, id_col: str, bands: int, k: int
) -> DataFrame:
    r"""See :func:`minhash_signatures`.  Bit-parity notes: normalization
    is lower → trim spaces → split on JAVA-\s runs (Python's \s is
    Unicode-wide and would diverge); a doc shorter than k words
    collapses to one whole-text shingle like :func:`word_shingles`;
    band b's hash is the 15-hex-char window of md5(shingle) at offset
    2b, and fixed-width lowercase hex compares lexicographically in
    value order, so ``min`` over Python strings equals the expression
    path's MIN."""
    import hashlib
    import re

    import pandas as pd

    ws = re.compile("[ \t\n\x0b\f\r]+")

    def kernel(batches):
        for pdf in batches:
            ids, bnds, sigs = [], [], []
            for did, text in zip(pdf["id"], pdf["txt"]):
                if text is None:
                    # parity: the expression path explodes a null
                    # shingle array to zero rows — null docs get no sigs
                    continue
                norm = text.lower().strip(" ")
                toks = ws.split(norm)
                if len(toks) < k:
                    shingles = [" ".join(toks)]
                else:
                    shingles = [
                        " ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)
                    ]
                hashes = [
                    hashlib.md5(sh.encode("utf-8")).hexdigest() for sh in shingles
                ]
                for b in range(bands):
                    ids.append(did)
                    bnds.append(b)
                    sigs.append(min(h[2 * b: 2 * b + 15] for h in hashes))
            yield pd.DataFrame({
                "id": pd.Series(ids, dtype="int64"),
                "band": pd.Series(bnds, dtype="int32"),
                "sig": sigs,
            })

    staged = fan_out(df).select(
        F.col(id_col).alias("id"), F.col(text_col).alias("txt")
    )
    return staged.mapInPandas(kernel, "id long, band int, sig string")


def _minhash_signatures_expr(
    df: DataFrame, text_col: str, id_col: str, bands: int = 8, k: int = 3
) -> DataFrame:
    """MinHash signatures: ``bands`` hash functions derived from one md5
    per shingle (overlapping 15-hex windows), each the lexicographic min
    over the doc's shingles.  Returns (id, band, sig) — one row per
    (doc, band).

    All band minima are computed in ONE aggregation over the shingle rows
    (8 min() columns, map-side combinable) instead of exploding shingles ×
    bands — an 8× reduction of the shuffled row count; the (band, sig)
    long format is unpivoted afterwards from the tiny per-doc result.

    ONE md5 PER SHINGLE: band b's hash is the 15-hex-char window of
    md5(shingle) starting at 2b+1 (overlapping 60-bit windows of one
    128-bit digest — the standard split-a-wide-hash construction for k
    MinHash functions).  The first version hashed md5(band|shingle),
    i.e. ``bands`` md5 evaluations per shingle instance; sf10 measured
    that as 384 M md5 calls dominating the whole operator.  Fixed-width
    lowercase hex compares lexicographically in value order, so MIN
    over the substring IS the min-hash; every oracle mirrors the same
    substring windows."""
    shingled = fan_out(df).select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(normalized_tokens(F.col(text_col)), k)).alias("shingle"),
    ).withColumn("_h", F.md5("shingle"))
    sigs_wide = shingled.groupBy("id").agg(
        *[
            F.min(F.substring("_h", 2 * b + 1, 15)).alias(f"sig{b}")
            for b in range(bands)
        ]
    )
    stack_expr = ", ".join(f"{b}, sig{b}" for b in range(bands))
    return sigs_wide.selectExpr(
        "id", f"stack({bands}, {stack_expr}) AS (band, sig)"
    )


#: Salt fan-out for :func:`_capped_bucket_arrays` — bounds any single
#: task's share of a degenerate bucket at ~bucket/SALT rows in level 1
#: and SALT·(cap+1) array elements in level 2.
_CAP_SALT = 16


def _capped_bucket_arrays(
    rows: DataFrame, keys: list[str], value, cap: int
) -> DataFrame:
    """Per-(keys) bucket id arrays with an over-cap drop that NO task
    ever pays for (ADVICE r10), in a single pass over ``rows``.

    The naive shapes both concentrate a degenerate bucket — the exact
    case the cap exists for: a meaningful corpus fraction sharing one
    signature — in one task: a window count hash-exchanges every row of
    the bucket to one partition before filtering, and a plain
    ``groupBy``/``collect_list`` builds the whole giant array in one
    reduce task.  A census + broadcast anti-join avoids the funnel but
    needs a SECOND pass over the signature table (measured ~2× on the
    bench: one extra job + cache write per query).

    This shape is two-level salted aggregation, both levels map-side
    combinable, one full-row exchange total:

    1. group by (keys, hash(value) % _CAP_SALT): per sub-bucket, a row
       count and the sorted value list SLICED to cap+1 elements.  A
       bucket that survives the cap has ≤ cap rows total, so no kept
       sub-list is ever truncated; an over-cap bucket's sub-lists are
       truncated freely — it is about to be dropped, only its COUNT
       must stay exact (the slice caps per-task state at cap+1 per
       sub-bucket even when one bucket holds 10⁹ rows).
    2. group by (keys): total = sum of sub-counts (exact), bucket drop
       by ``total > cap``, then flatten + sort the ≤ SALT·(cap+1)
       surviving elements.  The level-2 exchange carries ≤ SALT rows
       per bucket regardless of bucket size.

    Returns (keys…, ids) with ids sorted, |ids| in [2, cap]."""
    val = F.col(value) if isinstance(value, str) else value
    salted = rows.groupBy(
        *keys, F.pmod(F.hash(val), F.lit(_CAP_SALT)).alias("_salt")
    ).agg(
        F.count(F.lit(1)).alias("_np"),
        F.slice(F.array_sort(F.collect_list(val)), 1, cap + 1).alias("_part"),
    )
    return (
        salted.groupBy(*keys)
        .agg(
            F.sum("_np").alias("_bn"),
            F.flatten(F.collect_list("_part")).alias("_flat"),
        )
        .filter(F.col("_bn") <= cap)
        .select(*keys, F.array_sort("_flat").alias("ids"))
        .filter(F.size("ids") >= 2)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bands: int = 8,
    k: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing any band signature.
    Returns distinct (id_a, id_b) with id_a < id_b.

    The capped path is a single-consumer linear pipeline (no persist
    needed); the UNCAPPED path persists the signature table because it
    feeds both sides of the self-join — otherwise Spark recomputes the
    whole shingle→md5→agg pipeline once per side (measured 2× cost).
    At data-lake scale the equivalent move is materializing signatures
    to a table and joining that.

    SHINGLE WIDTH is the candidate-volume dial: band minima collide
    whenever two docs share low-hash shingles, so if the shingle
    universe saturates (many docs per shingle) candidates go quadratic —
    measured on the synthetic corpus at 3-word shingles: 904 → 82 k →
    7.6 M candidates across sf0.01/0.1/1 (~×90 per ×10 docs).  The
    registered queries use k=5, whose universe outgrows the corpus and
    keeps collisions meaning near-duplication; the default stays k=3
    for short-text/rich-vocabulary inputs.

    ``max_bucket`` is the second dial, for when even wide shingles
    saturate (sf10 measured k=5 candidates going quadratic again at
    500 k docs): (band, sig) buckets holding more than ``max_bucket``
    docs are DROPPED before any pair materializes — the standard LSH
    bucket cap (a bucket that a meaningful fraction of the corpus falls
    into signals a degenerate signature, not near-duplication; its
    O(b²) pairs are noise).  Deliberately a documented *semantic* (the
    oracles mirror it with a HAVING on bucket size), not a silent
    truncation.

    PLAN SHAPE (r10 join-free rewrite; cap de-funneled in r11): the
    capped path exchanges full signature rows exactly ONCE, and no
    single task ever holds a degenerate bucket: the bucket arrays come
    from :func:`_capped_bucket_arrays` — two-level salted aggregation
    whose level-1 slice bounds per-task state at cap+1 elements per
    sub-bucket and whose level-2 merge drops over-cap buckets from an
    exact sub-count sum (ADVICE r10 — the earlier inline window count
    funneled the whole degenerate bucket through one spilling task
    before discarding it, and a census + broadcast anti-join costs a
    second pass over the signature table).  Pair emission stays
    JVM-side and join-free: ``posexplode`` + ``slice`` over the sorted
    id array.  The r8/r9 shape (keep-aggregate + broadcast keep-join +
    bucket self-join) shuffled the signature table three times; this
    shape shuffles it once.  Per-bucket pair fan-out is bounded by
    C(max_bucket, 2), so the exploded slice arrays stay small.

    The UNCAPPED path (max_bucket=None) keeps the persisted bucket
    self-join: a degenerate bucket's pairs are quadratic either way,
    but the join STREAMS them while the array shape would copy an
    O(bucket)-element slice per emitted row."""
    sigs = minhash_signatures(df, text_col, id_col, bands, k)
    if max_bucket is not None:
        buckets = _capped_bucket_arrays(
            sigs, ["band", "sig"], "id", max_bucket
        )
        return (
            buckets.select(F.posexplode("ids").alias("_i", "id_a"), "ids")
            .select(
                "id_a",
                F.explode(F.expr("slice(ids, _i + 2, size(ids))")).alias("id_b"),
            )
            .distinct()
        )
    # uncapped: persisted self-join (sigs feed both sides)
    sigs = track_persist(sigs)
    a = sigs.select(
        F.col("band"), F.col("sig"), F.col("id").alias("id_a")
    )
    b = sigs.select(
        F.col("band").alias("band_b"), F.col("sig").alias("sig_b"), F.col("id").alias("id_b")
    )
    return (
        a.join(
            b,
            (a.band == b.band_b) & (a.sig == b.sig_b) & (a.id_a < b.id_b),
        )
        .select("id_a", "id_b")
        .distinct()
    )


def lsh_recall_report(
    df: DataFrame,
    text_col: str,
    id_col: str,
    sample_n: int = 256,
    bands: int = 8,
    k: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """The dedup eval loop: recall and candidate precision of the
    MinHash-LSH config against EXACT shingle-set Jaccard ground truth on
    a fixed-size deterministic sample — the measurement that justifies a
    bands/k setting before trusting it on 100 TB (the dedup analog of
    ann_recall_report).

    Sample = the ``sample_n`` docs with the smallest md5(id): rerun- and
    engine-stable, one TakeOrderedAndProject over the corpus.  Ground
    truth = all-pairs exact Jaccard WITHIN the sample — bounded at
    sample_n²/2 pairs forever, so the quadratic stage never grows with
    the corpus.  LSH banding collides per-pair (independent of other
    docs), so sample-restricted candidates ≡ full-corpus candidates ∩
    sample² and the recall estimate is unbiased over sampled pairs.
    The honest caveat, stated rather than hidden: true-pair density in a
    fixed sample FALLS as the corpus grows (sf0.01 measured 4 truth
    pairs at n=256, sf0.1 one), so at large sf this is a high-variance
    estimate — production would plant duplicates or hold out a labeled
    eval set; the report's machinery is identical either way.

    Returns ONE row: (n_eval_docs, n_truth_pairs, n_lsh_candidates,
    n_hits, recall, candidate_precision); the ratios are NULL when
    their denominator is empty, in both engines.
    """
    base = fan_out(df).select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    )
    sampled = track_persist(
        base.withColumn("_key", F.md5(F.col("id").cast("string")))
        .orderBy("_key", "id")
        .limit(sample_n)
        .select("id", "text")
    )
    sets = sampled.select(
        "id",
        F.array_distinct(
            word_shingles(normalized_tokens(F.col("text")), k)
        ).alias("sh"),
    )
    a = sets.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sets.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    truth = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(inter.cast("double") / union.cast("double") >= F.lit(threshold))
        .select("id_a", "id_b")
    )
    cands = minhash_lsh_pairs(sampled, "text", "id", bands=bands, k=k)
    # Examined r11 and deliberately left as-is: a full-outer-join
    # single-aggregate shape (evaluate truth and cands once each) was
    # measured a 1.08× REGRESSION in a tight ABA bracket — the sample
    # is a FIXED 256 docs forever, so the doubled leg evaluation here
    # is bounded and cheap, while the outer join added a real shuffle.
    #
    # r12: the cheap fix the fusion attempt overshot — persist the two
    # tiny legs instead of restructuring the plan.  Each is consumed
    # twice (its count leg + the hits join); within the one report
    # action the first consumer computes-and-caches, the second reads
    # the cache, so the 256²-pair exact-Jaccard cross join and the LSH
    # candidate pipeline each evaluate ONCE (guide §5 "reused and
    # recomputing is more expensive").  Plan shape otherwise unchanged;
    # interleaved same-session A/B at sf0.1: 0.85× median over 9
    # rep-pairs, every pair in favor, report row identical.
    truth = track_persist(truth)
    cands = track_persist(cands)
    hits = truth.join(cands, ["id_a", "id_b"])
    rep = (
        sampled.agg(F.count(F.lit(1)).alias("n_eval_docs"))
        .crossJoin(truth.agg(F.count(F.lit(1)).alias("n_truth_pairs")))
        .crossJoin(cands.agg(F.count(F.lit(1)).alias("n_lsh_candidates")))
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hits")))
    )
    return rep.select(
        "n_eval_docs",
        "n_truth_pairs",
        "n_lsh_candidates",
        "n_hits",
        F.when(
            F.col("n_truth_pairs") > 0,
            F.col("n_hits").cast("double") / F.col("n_truth_pairs").cast("double"),
        ).alias("recall"),
        F.when(
            F.col("n_lsh_candidates") > 0,
            F.col("n_hits").cast("double")
            / F.col("n_lsh_candidates").cast("double"),
        ).alias("candidate_precision"),
    )


def minhash_jaccard_estimates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bands: int = 8,
    k: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Estimated Jaccard similarity for LSH candidate pairs from MinHash
    signature agreement: Pr[min-hash collision] = J(A,B), so the fraction
    of agreeing band signatures is an unbiased Jaccard estimate — the
    standard second stage between LSH candidate generation and (n× more
    expensive) exact verification.  Candidates needing exact token
    comparison shrink to pairs whose ESTIMATE clears threshold.

    Plan: the signature table is built once (persisted — it feeds both
    candidate generation and the per-pair agreement joins), candidates
    come from the join-free bucket-group shape of
    :func:`minhash_lsh_pairs` when capped (ONE exchange, window-count
    cap, per-bucket pair emission) or the bucket self-join when
    uncapped, and the per-pair agreement count is two id-keyed joins +
    one aggregate — each pair costs exactly ``bands`` comparison rows.
    Returns (id_a, id_b, matching_bands, est_jaccard).
    """
    sigs = track_persist(minhash_signatures(df, text_col, id_col, bands, k))
    if max_bucket is not None:
        # same bucket cap as minhash_lsh_pairs: candidate GENERATION
        # skips degenerate buckets without ever concentrating one in a
        # task (two-level salted aggregation); the per-pair agreement
        # count below still uses the full signature table
        buckets = _capped_bucket_arrays(
            sigs, ["band", "sig"], "id", max_bucket
        )
        cands = (
            buckets.select(F.posexplode("ids").alias("_i", "id_a"), "ids")
            .select(
                "id_a",
                F.explode(F.expr("slice(ids, _i + 2, size(ids))")).alias("id_b"),
            )
            .distinct()
        )
    else:
        cands = (
            sigs.alias("x")
            .join(
                sigs.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.sig") == F.col("y.sig"))
                & (F.col("x.id") < F.col("y.id")),
            )
            .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
            .distinct()
        )
    sa = sigs.select(
        F.col("id").alias("id_a"), "band", F.col("sig").alias("sig_a")
    )
    sb = sigs.select(
        F.col("id").alias("_idb"), F.col("band").alias("band_b"),
        F.col("sig").alias("sig_b"),
    )
    joined = (
        cands.join(sa, "id_a")
        .join(sb, (F.col("id_b") == F.col("_idb")) & (F.col("band") == F.col("band_b")))
        .drop("_idb", "band_b")
    )
    est = joined.groupBy("id_a", "id_b").agg(
        F.sum((F.col("sig_a") == F.col("sig_b")).cast("bigint")).alias("matching_bands")
    )
    return est.select(
        "id_a", "id_b", "matching_bands",
        (F.col("matching_bands").cast("double") / F.lit(float(bands))).alias("est_jaccard"),
    )


def simhash16(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """16-bit SimHash over whitespace tokens — delegates to
    :func:`simhash_bits` at bits=16 (one bit-derivation contract for the
    whole simhash family; the generalized shift formula
    4*(hexchars-1-j//4)+(j%4) reduces to the original
    4*(3-j//4)+(j%4) at hexchars=4, so hashes are bit-identical to the
    pre-refactor implementation and every oracle still matches).
    Returns (id, simhash)."""
    return simhash_bits(df, text_col, id_col, bits=16)


def _drop_hot_tokens(
    toks: DataFrame,
    df: DataFrame,
    block_cols: list[str],
    max_df: int | None,
    max_df_frac: float | None,
) -> DataFrame:
    """Remove tokens whose per-block document frequency exceeds the cap —
    the shared skew guard for the token-join operators.

    The two caps compose independently (effective cap = max of whichever
    are given): ``max_df`` alone is an absolute df ceiling, ``max_df_frac``
    alone is a scale-aware fractional ceiling (ceil(frac × block size)),
    and together the looser of the two wins per block.  In particular a
    call with ONLY ``max_df_frac`` is honored, not silently ignored.

    Tokens are distinct per doc upstream, so count(*) per (block, tok) IS
    the document frequency; the partial agg is map-side-combinable and the
    hot list is tiny by construction, so the removal is a broadcast
    anti-join."""
    if max_df is None and max_df_frac is None:
        return toks
    dfreq = toks.groupBy(*block_cols, "tok").agg(F.count(F.lit(1)).alias("_df"))
    if max_df_frac is not None:
        bn = df.groupBy(*block_cols).agg(F.count(F.lit(1)).alias("_bn"))
        cap = F.greatest(
            F.lit(max_df or 0).cast("bigint"),
            F.ceil(F.lit(max_df_frac) * F.col("_bn")),
        )
        hot = (
            dfreq.join(F.broadcast(bn), list(block_cols))
            .filter(F.col("_df") > cap)
            .select(*block_cols, "tok")
        )
    else:
        hot = dfreq.filter(F.col("_df") > max_df).select(*block_cols, "tok")
    return toks.join(F.broadcast(hot), [*block_cols, "tok"], "left_anti")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_cols: list[str],
    length_col: str,
    length_tol: int = 5,
    threshold: float = 0.2,
    max_df: int | None = None,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Token-set Jaccard similarity for blocked candidate pairs.

    Blocking (same ``block_cols``, |length difference| ≤ tol) bounds the
    pair count; the intersection is computed distributively by exploding
    distinct tokens and joining on token — never an all-pairs loop.
    Returns (id_a, id_b, inter, union_n, jaccard).

    ``max_df`` is the 100 TB skew guard: a token appearing in d same-block
    docs contributes O(d²) join pairs, so one ubiquitous token ("the")
    makes both a hot shuffle partition AND a quadratic row blowup no join
    strategy can save.  With ``max_df`` set, tokens whose per-block
    document frequency exceeds it are removed from the token UNIVERSE
    (sizes and intersections alike), so the result is exactly Jaccard over
    the informative-token sets — a deterministic, documented semantic the
    oracle mirrors, not an approximation of the uncapped answer.  The
    over-cap token list is tiny by construction (≤ total_tokens/max_df
    entries, stopword-scale in practice), so it broadcasts.

    ``max_df_frac`` makes the cap SCALE-AWARE: effective cap per block =
    max(max_df, ceil(frac × block_doc_count)), keeping the skew
    guarantee (hot-token pair blowup bounded at frac²·bn² per token)
    without a fixed constant that tightens relative to growing blocks.

    KNOWN SCALE LIMIT, measured at sf1: on a 31-word vocabulary every
    token's df reaches ~0.8·block regardless of cap policy (min df 5120
    in 22 k-doc blocks), so WORD-set Jaccard returns zero pairs there —
    both engines consistently.  That is vocabulary saturation, not a cap
    bug: word sets stop being discriminative once the vocabulary is
    dwarfed by the corpus.  For near-dup detection at scale use the
    SHINGLE-domain operators (minhash_lsh_pairs,
    prefix_filter_jaccard_pairs, winnowing_pairs), whose element
    universes grow combinatorially; word-Jaccard remains the right tool
    for rich-vocabulary or small-block settings."""
    toks = fan_out(df).select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in block_cols],
        F.col(length_col).alias("_len"),
        F.explode(F.array_distinct(normalized_tokens(F.col(text_col)))).alias("tok"),
    )
    toks = _drop_hot_tokens(toks, df, block_cols, max_df, max_df_frac)
    sizes = toks.groupBy("id").agg(F.count(F.lit(1)).alias("n_tok"))
    a = toks.select(
        F.col("id").alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in block_cols],
        F.col("_len").alias("len_a"),
        "tok",
    )
    b = toks.select(
        F.col("id").alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in block_cols],
        F.col("_len").alias("len_b"),
        F.col("tok").alias("tok_b"),
    )
    cond = (a.tok == b.tok_b) & (a.id_a < b.id_b)
    for c in block_cols:
        cond = cond & (F.col(f"{c}_a") == F.col(f"{c}_b"))
    cond = cond & (F.abs(F.col("len_a") - F.col("len_b")) <= length_tol)
    inter = (
        a.join(b, cond)
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_tok").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_tok").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "inter",
            (F.col("n_a") + F.col("n_b") - F.col("inter")).alias("union_n"),
            (
                F.col("inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_cols: list[str],
    threshold: float = 0.8,
    max_df: int | None = None,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Asymmetric near-dup detection by token-set CONTAINMENT:
    ``|A∩B| / min(|A|, |B|)`` — the score that catches a short document
    quoted or excerpted inside a long one, which symmetric Jaccard
    dilutes below any usable threshold (a 50-token doc fully inside a
    5000-token doc has Jaccard ≈ 0.01 but containment = 1.0).

    Same distributive shape as ``ngram_jaccard_pairs`` (explode distinct
    tokens, equi-join on token within blocks, per-pair count) minus the
    length blocking — length asymmetry is exactly the point here — and
    with the same optional ``max_df`` skew cap.  Returns
    (id_a, id_b, inter, n_a, n_b, containment)."""
    toks = fan_out(df).select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in block_cols],
        F.explode(F.array_distinct(normalized_tokens(F.col(text_col)))).alias("tok"),
    )
    toks = _drop_hot_tokens(toks, df, block_cols, max_df, max_df_frac)
    sizes = toks.groupBy("id").agg(F.count(F.lit(1)).alias("n_tok"))
    a = toks.select(
        F.col("id").alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in block_cols],
        "tok",
    )
    b = toks.select(
        F.col("id").alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in block_cols],
        F.col("tok").alias("tok_b"),
    )
    cond = (a.tok == b.tok_b) & (a.id_a < b.id_b)
    for c in block_cols:
        cond = cond & (F.col(f"{c}_a") == F.col(f"{c}_b"))
    inter = a.join(b, cond).groupBy("id_a", "id_b").agg(
        F.count(F.lit(1)).alias("inter")
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_tok").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_tok").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "inter",
            "n_a",
            "n_b",
            (
                F.col("inter").cast("double")
                / F.least("n_a", "n_b").cast("double")
            ).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def dedup_chunks(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 10,
    max_docs: int = 1,
) -> DataFrame:
    """Sub-document (chunk/paragraph-level) boilerplate removal — the
    CCNet/Gopher move of deduplicating REPEATED SPANS across documents,
    not whole documents: split each doc into consecutive fixed-width
    token chunks, drop every chunk whose exact content appears in more
    than ``max_docs`` distinct docs, and reassemble the survivors in
    order.  Catches shared headers/footers/license blocks that whole-doc
    dedup misses entirely.

    Scale shape: chunking is a JVM array projection (transform+slice, no
    explode until the count); the hot-chunk list is found with one
    map-side-combinable aggregate and is SMALL by construction (only
    cross-doc repeated content), so it rides a broadcast anti-join — the
    corpus shuffles once, on the chunk hash, and reassembly is one
    doc-keyed aggregate.  Returns (id, clean_text, n_chunks, n_removed).
    """
    base = fan_out(df).select(
        F.col(id_col).alias("id"),
        F.split(F.col(text_col), " ").alias("tk"),
    )
    n_chunks = F.ceil(F.size("tk") / F.lit(chunk_tokens)).cast("int")
    chunks = base.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("tk"), i * chunk_tokens + 1, chunk_tokens)
                ),
            )
        ).alias("idx", "chunk"),
    )
    hot = (
        chunks.groupBy("chunk")
        .agg(F.count_distinct("id").alias("_nd"))
        .filter(F.col("_nd") > max_docs)
        .select("chunk", F.lit(True).alias("_hot"))
    )
    # Flag instead of anti-join so totals and survivors come out of ONE
    # doc-keyed aggregate (collect_list skips the nulls the unmatched
    # `when` leaves for hot chunks) — one corpus shuffle, no join-back.
    flagged = chunks.join(F.broadcast(hot), "chunk", "left")
    keep = F.col("_hot").isNull()
    agg = flagged.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.count(F.when(keep, 1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(keep, F.struct("idx", "chunk")))
                ),
                lambda s: s.getField("chunk"),
            ),
        ).alias("clean_text"),
    )
    return agg.select(
        "id",
        "clean_text",
        "n_chunks",
        (F.col("n_chunks") - F.col("n_kept")).cast("bigint").alias("n_removed"),
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    pairs_unique: bool = False,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph → the
    canonical-document assignment (component label = min doc id reachable).

    Iterative min-label propagation WITH pointer doubling: each round
    every node takes the min of its own label and its neighbors' labels,
    then shortcuts through its label's label (label ← label[label], the
    classic path-halving step — Shiloach-Vishkin / hash-to-min family,
    public).  Plain propagation converges in O(graph diameter) rounds
    and near-dup graphs are NOT always shallow — the sf0.1 simhash pair
    graph measured diameter ~13, i.e. 13 shuffle rounds; shortcutting
    makes it O(log diameter).  Every label is itself a node id (labels
    start as own-id and only ever take the min of other nodes' labels),
    so the shortcut self-join is total — no row is lost.  Each round is
    two keyed equi-joins + one aggregate; intermediate labels are
    checkpointed and replaced so lineage stays flat.

    Round-job diet (r11, guide §2.4 "remove shuffles outright"):

    * ``pairs_unique=True`` (every registered caller: the pair
      operators end in ``.distinct()`` with id_a < id_b, so the
      symmetrized union is unique by construction — the invariant is
      pinned by tests/test_ops.py::
      test_pair_producers_emit_unique_strictly_ordered_pairs) skips the
      edge ``distinct()`` — one full exchange+aggregate of the largest
      table in the query.
    * Round 1 against the identity label map is algebra, not a join:
      nbr(src) = dst and the pointer-doubling lookup is a no-op, so the
      seed labels come from ONE aggregate over the edge list (min
      neighbor vs own id) with no joins and no separate node-table
      checkpoint.
    * Convergence is detected by comparing the label-column SUM between
      rounds (exact DECIMAL(38,0) — no bigint wrap) instead of a
      labels⨝labels difference join: labels are per-node monotone
      non-increasing, so the sum is unchanged iff NO label changed.
      The sum rides the SAME job that materializes the round's lazy
      localCheckpoint (r12, guide §1.2): eager=False marks the RDD for
      checkpointing and the sum aggregate's single action both computes
      + caches the partitions and returns the sum — one driver job and
      one pass over the label table per round, where eager=True plus a
      separate aggregate paid two of each.
    * The sum check requires labels that CAST to DECIMAL(38,0)
      losslessly; for any other id type (the operator is a generic
      public API) the cast would yield NULL and None == None would end
      the loop early with partially-converged components (ADVICE r11) —
      those types fall back to an any-label-changed existence check
      (LIMIT 1 over a changed-rows join), same per-round job count.

    Measured shapes that did NOT survive (r12, sf0.1 simhash graph —
    9 rounds, 6.7 k edges, interleaved A/B, keep for the next reader):

    * a SECOND pointer-shortcut per round (label[label[label]] through
      the previous map): round count unchanged at 9 — convergence here
      is gated by the neighbor hop, not pointer depth — and the extra
      n-row join per round cost ~1.2× wall.
    * TWO/THREE neighbor hops per checkpoint round: rounds 9 → 6 / 5
      but wall parity at best locally, and at scale k hops per round
      means MORE total edge joins (6×2=12 vs 9×1) — strictly more
      full-edge shuffles for the same fixpoint.
    * disabling AQE for the loop's tiny tables: 2.5× WORSE — AQE's
      runtime broadcast conversion of the sub-10 MB label side is
      load-bearing; without it every round pays two 32-partition SMJs.
    * pre-hash-partitioning the checkpointed edge list on dst so the
      per-round join reuses the exchange: localCheckpoint does NOT
      preserve outputPartitioning (the rescan is UnknownPartitioning —
      verified on the final plan), so the pre-shuffle is pure cost.

    Returns (id, component) for every node that appears in ``pairs``.
    """
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    sum_convergence = isinstance(
        e.schema["src"].dataType, (ByteType, ShortType, IntegerType, LongType)
    ) and isinstance(
        e.schema["dst"].dataType, (ByteType, ShortType, IntegerType, LongType)
    )
    # localCheckpoint (not just persist): each round's plan must be CUT,
    # or the logical plan doubles per iteration and the driver OOMs just
    # *printing* it.  On a cluster with an unreliable-executor profile,
    # swap for reliable checkpoint(dir) — same shape.
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    if not pairs_unique:
        sym = sym.distinct()
    edges = sym.localCheckpoint(eager=True)
    # round 1 collapsed: labels start as the identity map, under which
    # the neighbor join is edges itself and the shortcut lookup is a
    # no-op — the first stepped/doubled label table is exactly
    # min(own id, min neighbor id) per node, one aggregate.
    # lazy checkpoint + the convergence aggregate = ONE materializing job
    # (see docstring); the integral-type gate picks the convergence probe
    labels = (
        edges.select(F.col("src").alias("id"), F.col("dst").alias("label"))
        .union(edges.select(F.col("src").alias("id"), F.col("src").alias("label")))
        .groupBy("id")
        .agg(F.min("label").alias("label"))
        .localCheckpoint(eager=False)
    )
    _label_sum = F.sum(F.col("label").cast("decimal(38,0)"))
    if sum_convergence:
        prev_sum = labels.agg(_label_sum).first()[0]
    else:
        labels.count()  # materialize the lazy checkpoint
    for _ in range(max_iter - 1):
        nbr = edges.join(labels, edges.dst == labels.id).select(
            edges.src.alias("id"), F.col("label")
        )
        stepped = (
            labels.union(nbr)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        # pointer doubling: follow the label one hop (m.label <= m.id ==
        # stepped.label, so the shortcut only ever lowers the label; the
        # inner join is total because every label is a live node id).
        # The lookup side is a RENAMED projection — stepped already
        # contains `labels` in its lineage via the union, and a
        # string-alias self-join over shared attribute ids breaks
        # Catalyst resolution (observed: `key not found: id#NN`)
        m = labels.select(
            F.col("id").alias("_mid"), F.col("label").alias("_mlabel")
        )
        new_labels = (
            stepped.join(m, stepped.label == F.col("_mid"))
            .select(
                "id",
                F.least(F.col("label"), F.col("_mlabel")).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        if sum_convergence:
            new_sum = new_labels.agg(_label_sum).first()[0]
            converged = new_sum == prev_sum
            prev_sum = new_sum
        else:
            # type-agnostic fallback (ADVICE r11): any row whose label
            # changed this round?  LIMIT 1 existence probe — the first
            # action also materializes the lazy checkpoint.
            prev = labels.select(
                F.col("id").alias("_pid"), F.col("label").alias("_plabel")
            )
            converged = not (
                new_labels.join(prev, new_labels.id == F.col("_pid"))
                .filter(F.col("label") != F.col("_plabel"))
                .limit(1)
                .count()
            )
        labels = new_labels
        if converged:
            break
    return labels.select("id", F.col("label").alias("component"))


def apply_exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """The *applied* form of exact dedup: return the surviving corpus
    (one doc per content hash — the min-id representative), not just the
    group table.

    min_by inside the same aggregate carries the kept row's payload, so
    the whole apply is STILL one hash aggregate — no join-back against
    the corpus, which at 100 TB would be a second full shuffle.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.min_by(text_col, id_col).alias("text_kept"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .select("keep_id", "text_kept", "group_size")
    )


def provenance_state(
    df: DataFrame, text_col: str, id_col: str, bands: int = 8, k: int = 5
) -> tuple[DataFrame, DataFrame]:
    """Per-document MERGEABLE dedup-provenance signals — the
    streaming-safe half of the provenance report (VERDICT r7 item 8):
    (id, content_hash) plus the MinHash signature rows.  Both are pure
    per-doc map-stage outputs (no window, no join), so a stream can
    append them to a state table per micro-batch and finalize later —
    delta-sized work per batch, the same monoid pattern as the
    incremental views and the KMV sketch rollup."""
    hashes = df.select(
        F.col(id_col).alias("id"),
        F.md5(F.col(text_col)).alias("content_hash"),
    )
    sigs = minhash_signatures(df, text_col, id_col, bands, k)
    return hashes, sigs


def provenance_report_from_state(
    hashes: DataFrame, sigs: DataFrame
) -> DataFrame:
    """Finalize accumulated provenance state into the per-doc report —
    the identical window + LSH band self-join + first-match-wins
    composition as the batch ``dedup_provenance_report`` query, reading
    the per-doc signals from state instead of recomputing them.  The
    streamed finalize therefore equals the one-shot batch report
    bit-for-bit (pinned by the streaming parity test)."""
    from pyspark.sql.window import Window

    ex = hashes.select(
        F.col("id").alias("doc_id"),
        (
            F.col("id")
            != F.min("id").over(Window.partitionBy("content_hash"))
        ).alias("is_exact_dup"),
    )
    a = sigs.select("band", "sig", F.col("id").alias("id_a"))
    b = sigs.select(
        F.col("band").alias("band_b"),
        F.col("sig").alias("sig_b"),
        F.col("id").alias("id_b"),
    )
    nd = (
        a.join(b, (a.band == b.band_b) & (a.sig == b.sig_b) & (a.id_a < b.id_b))
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


def incremental_dedup(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Incremental-ingest dedup: admit only new documents whose content
    fingerprint is absent from the existing corpus ``index`` (a DataFrame
    with one ``fp`` column), collapsing duplicates within the batch to the
    min-id representative.

    This is the shape a continuously-growing corpus actually runs — the
    full corpus is never re-deduped; each ingest batch costs one
    fingerprint projection, one hash anti-join against the (bucketable,
    incrementally-maintained) index, and one batch-local aggregate.
    Returns (fp, keep_id).
    """
    from hotdog_spark.operators.textops import fingerprint_expr

    batch = new_docs.select(
        F.col(id_col).alias("_id"), fingerprint_expr(F.col(text_col)).alias("fp")
    )
    fresh = batch.join(index.select("fp"), "fp", "left_anti")
    return fresh.groupBy("fp").agg(F.min("_id").alias("keep_id"))


def fuzzy_pairs_levenshtein(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 25,
    left_filter: Column | None = None,
) -> DataFrame:
    """String-similarity join: near-duplicate pairs by Levenshtein edit
    distance, with candidate generation by blocking instead of all-pairs.

    Blocking key = (token count, first token): a cheap projection that
    near-identical texts almost always share, so the self-join explodes
    per-block (tiny) instead of per-corpus (n²).  Candidates then pay the
    exact O(len²) edit-distance check — an integer metric, so thresholds
    behave identically in every engine.  Returns (a_id, b_id, dist) with
    a_id < b_id.

    ``left_filter`` (over the blocked frame's ``id`` column) restricts
    the LEFT join side — the sampled-key verification mode: pairs whose
    lower id falls in a deterministic sample, the same Levenshtein
    semantics at a volume an oracle can replay at sf10 (VERDICT r6
    item 3).
    """
    toks = normalized_tokens(F.col(text_col))
    blocked = fan_out(df).select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("t"),
        F.size(toks).alias("_n"),
        F.element_at(toks, 1).alias("_t0"),
    )
    left = blocked if left_filter is None else blocked.filter(left_filter)
    a = left.select(
        F.col("id").alias("a_id"), F.col("t").alias("a_t"), "_n", "_t0"
    )
    b = blocked.select(
        F.col("id").alias("b_id"), F.col("t").alias("b_t"), "_n", "_t0"
    )
    # dist is projected through an explode(array(...)) Generate node on
    # purpose: a plain Filter over a projected alias is pushed through
    # the Project by Catalyst (PushPredicateThroughNonJoin substitutes
    # the alias), so the O(len²) levenshtein would be evaluated TWICE
    # per candidate — once in the pushed predicate, once in the
    # projection (measured: the sf10 leg doubled, ~44M extra DP
    # evaluations).  Predicates referencing a GENERATOR output cannot
    # be substituted, so this shape evaluates the distance exactly
    # once.  The threshold form levenshtein(a, b, t) additionally bands
    # the DP (returns -1 past t, exact distance otherwise), so the
    # filter becomes dist >= 0 — identical kept rows and values.
    return (
        a.join(b, ["_n", "_t0"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.explode(
                F.array(
                    F.levenshtein(F.col("a_t"), F.col("b_t"), max_dist)
                )
            ).alias("dist"),
        )
        .filter(F.col("dist") >= 0)
    )


def materialize_minhash_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    table_name: str,
    bands: int = 8,
    k: int = 3,
    buckets: int = 32,
) -> None:
    """Materialize MinHash signatures as a bucketed table: the 100 TB
    move that turns every later LSH self-join into a co-located scan.

    Signatures are computed once and written ``bucketBy(buckets, band,
    sig)`` + sorted, so ``lsh_pairs_from_index`` plans a sort-merge join
    with ZERO exchanges (asserted in tests/test_plans.py) — re-dedup
    against a grown corpus stops paying the signature shuffle entirely.
    """
    (
        minhash_signatures(df, text_col, id_col, bands, k)
        .write.bucketBy(buckets, "band", "sig")
        .sortBy("band", "sig")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table_name)
    )


def lsh_pairs_from_index(spark, table_name: str) -> DataFrame:
    """Candidate pairs from a materialized signature index (see
    ``materialize_minhash_index``): co-located self-join on (band, sig),
    no shuffle of the signature table."""
    sigs = spark.table(table_name)
    a = sigs.select("band", "sig", F.col("id").alias("id_a"))
    b = sigs.select(
        F.col("band").alias("band_b"),
        F.col("sig").alias("sig_b"),
        F.col("id").alias("id_b"),
    )
    return (
        a.join(b, (a.band == b.band_b) & (a.sig == b.sig_b) & (a.id_a < b.id_b))
        .select("id_a", "id_b")
        .distinct()
    )


def _hashed_shingle_rows(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    r"""(id, tok) rows — the per-doc DISTINCT md5-int60 hashed k-word
    shingles, one row each, built in one Arrow batch per partition.  The
    expression form (transform + concat_ws per shingle, then
    conv(substring(md5))) is interpreted per element by Catalyst; at
    sf10 the 25 M-shingle build alone cost ~20 s before hashing.  Rows,
    not per-doc arrays (the r5 shape): the consumer's first move was
    ``explode``, so emitting rows skips the Python sort + Arrow
    list-column transfer + JVM explode round trip (r6 measured the
    array shape + its downstream df-join at ~3× the sf0.1 constant).
    Hash parity with the DuckDB oracle is by construction:
    ``int(md5(s).hexdigest()[:15], 16)`` ≡ the oracle's digit-by-digit
    hex expansion ≡ Spark's ``conv(substring(md5(s),1,15),16,10)``
    (spot-pinned in tests).  Tokenization parity matches the minhash
    kernel: lower → trim spaces → split on Java-\s runs; < k words ⇒
    one whole-text shingle; null text ⇒ no row (explode-of-null
    parity)."""
    import hashlib
    import re

    import pandas as pd

    ws = re.compile("[ \t\n\x0b\f\r]+")

    def kernel(batches):
        for pdf in batches:
            ids, toks = [], []
            for did, text in zip(pdf["id"], pdf["txt"]):
                if text is None:
                    continue
                toks_ = ws.split(text.lower().strip(" "))
                if len(toks_) < k:
                    shingles = [" ".join(toks_)]
                else:
                    shingles = [
                        " ".join(toks_[i:i + k])
                        for i in range(len(toks_) - k + 1)
                    ]
                for h in {
                    int(hashlib.md5(sh.encode("utf-8")).hexdigest()[:15], 16)
                    for sh in shingles
                }:
                    ids.append(did)
                    toks.append(h)
            yield pd.DataFrame({
                "id": pd.Series(ids, dtype="int64"),
                "tok": pd.Series(toks, dtype="int64"),
            })

    staged = fan_out(df).select(
        F.col(id_col).alias("id"), F.col(text_col).alias("txt")
    )
    return staged.mapInPandas(kernel, "id long, tok long")


def prefix_filter_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, threshold: float = 0.8
) -> DataFrame:
    """Set-similarity join via PREFIX FILTERING (the PPJoin family,
    Xiao et al., WWW'08) over 5-WORD-SHINGLE sets: two sets with
    Jaccard >= t must share an element among each set's first
    ``|x| - ceil(t*|x|) + 1`` elements when both are ordered by GLOBAL
    RARITY (ascending document frequency).  Only those short,
    rare-element prefixes generate candidates — lossless by the prefix
    principle, and sharper than a document-frequency cap because common
    elements never enter the join at all.

    The set domain is SHINGLES, not tokens, deliberately: prefix
    filtering prunes only when element frequencies are Zipf-like.  On a
    small-vocabulary corpus token SETS are nearly identical across
    documents (measured: 32 k "near-dup" token-set pairs in 500 docs and
    a quadratic candidate join); multi-word shingles restore a large,
    skewed element space, so the same algorithm returns the true
    near-dups with prefix-sized shuffle volume.  The width is 5 (see the
    inline note: 3-word shingles saturated at sf1).

    Plan: hashed element rows (Arrow kernel) → document frequency as a
    window over the element key (one exchange, no agg+join) → ONE
    per-doc aggregate producing rarity order + verification set + size →
    candidate join on prefix elements only → exact Jaccard verification
    via array_intersect on sets joined back per pair.
    Returns (id_a, id_b, inter_n, union_n, jaccard) for pairs >= t.
    """
    # 5-WORD shingles: the element universe must outgrow the corpus for
    # prefix filtering to prune.  3-word shingles saturated at sf1 (30 k
    # possible vs 2.5 M instances -> dfs grow linearly with n and the
    # candidate join wrote 43 GB of shuffle before filling the disk);
    # the 5-word universe is ~1000x larger, so element dfs stay O(1) as
    # the corpus grows.  Monitor this ratio when porting to a new corpus.
    #
    # Elements are HASHED to int60 (md5 prefix, engine-portable — the
    # DuckDB oracle reproduces the identical integers digit-by-digit),
    # so every downstream row carries an 8-byte key instead of a ~45-byte
    # shingle string: sf10 measured 3.3 GB of shuffle with string
    # elements, dominated by payload width.  A hash collision would
    # merge two shingles IDENTICALLY in both engines (same md5), so
    # oracle parity is exact by construction; at 60 bits the expected
    # collision count stays ≪ 1 far beyond 10⁸ distinct shingles.
    rows = _hashed_shingle_rows(df, text_col, id_col, k=5)
    # NO global rank table: a row_number over all distinct elements would
    # be a single-reducer sort (a genuine 100 TB killer spotted in this
    # operator's own plan).  The prefix only needs each document's
    # elements ORDERED by (df, element) — any consistent total order —
    # so sort per doc on the (df, tok) struct directly.
    #
    # Document frequency rides a WINDOW over tok, not an aggregate +
    # join: count(*) over (partition by tok) is ONE exchange on tok,
    # where the r5 shape (groupBy(tok) agg → sort-merge join back)
    # re-shuffled both the 2.5 M-row element table and its aggregate —
    # r6 measured that join as the dominant sf0.1 cost and it scales
    # with the full element count at sf10.
    with_df = rows.select(
        "id", "tok",
        F.count(F.lit(1)).over(Window.partitionBy("tok")).alias("df"),
    )
    # ONE aggregate per doc yields the rarity order, the verification
    # set AND its size — the r5 shape built (id, ta, sz) separately in
    # the kernel and joined it back on id, an extra exchange carrying
    # the full arrays.
    docagg = (
        with_df.groupBy("id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "tok"))),
                lambda s: s.getField("tok"),
            ).alias("by_rank"),
            F.array_sort(F.collect_list("tok")).alias("ta"),
            F.count(F.lit(1)).alias("sz"),
        )
    )
    # persist: docagg feeds the prefix table AND both verification
    # join-backs — without it the whole shingle → window → sort pipeline
    # re-runs per consumer (the winnowing/minhash recompute lesson; at
    # lake scale: materialize the prefix index).
    docagg = track_persist(docagg)
    plen = (F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1).cast("int")
    # The candidate join carries ONLY (id, sz, pos, ptok) — shipping the
    # full shingle arrays through it was half of the r4 43 GB shuffle;
    # arrays are joined back from the persisted docagg per PAIR, not
    # per candidate row.
    # NOT persisted: pref is one cheap posexplode over the PERSISTED
    # docagg — caching it too (the r5 shape) added a full
    # materialization barrier that cost more wall time than the two
    # consumers' recompute of slice+posexplode from cache.
    pref = docagg.select(
        "id", "sz",
        F.posexplode(F.slice("by_rank", F.lit(1), plen)).alias("pos", "ptok"),
    )
    a = pref.select(
        F.col("id").alias("id_a"), F.col("sz").alias("sz_a"),
        F.col("pos").alias("pa"), "ptok",
    )
    b = pref.select(
        F.col("id").alias("id_b"), F.col("sz").alias("sz_b"),
        F.col("pos").alias("pb"), F.col("ptok").alias("ptok_b"),
    )
    # PPJoin LENGTH FILTER (lossless): J(x,y) >= t forces
    # t*|x| <= |y| and t*|y| <= |x| — applied inside the join condition
    # so out-of-band-size pairs never materialize.
    joined = a.join(
        b,
        (F.col("ptok") == F.col("ptok_b"))
        & (F.col("id_a") < F.col("id_b"))
        & (F.col("sz_b").cast("double") >= F.lit(threshold) * F.col("sz_a").cast("double"))
        & (F.col("sz_a").cast("double") >= F.lit(threshold) * F.col("sz_b").cast("double")),
    )
    # PPJoin POSITIONAL FILTER (lossless): with both sets in the same
    # global rarity order, every shared element sits at position >=
    # min-shared-prefix-position in each set, so
    # inter <= min(|x| - pa*, |y| - pb*) with pa*/pb* the coordinate-wise
    # minima over the pair'''s shared prefix elements; and J >= t forces
    # inter >= ceil(t/(1+t)·(|x|+|y|)).  Candidates whose positional
    # upper bound cannot reach that floor are pruned BEFORE the
    # verification join ever fetches their full element arrays — they
    # could only fail it.  (Per-row bounds would over-prune: the minima
    # may come from different elements, hence the aggregate.)
    alpha = F.ceil(
        F.lit(threshold) / F.lit(1.0 + threshold)
        * (F.col("sz_a") + F.col("sz_b")).cast("double")
    )
    cand = (
        joined.groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.min("pa").alias("pa"), F.min("pb").alias("pb"))
        .filter(
            F.least(F.col("sz_a") - F.col("pa"), F.col("sz_b") - F.col("pb"))
            >= alpha
        )
        .select("id_a", "id_b", "sz_a", "sz_b")
    )
    ta = docagg.select(F.col("id").alias("id_a"), F.col("ta").alias("ta_a"))
    tb = docagg.select(F.col("id").alias("id_b"), F.col("ta").alias("ta_b"))
    verified = cand.join(ta, "id_a").join(tb, "id_b")
    inter = F.size(F.array_intersect("ta_a", "ta_b")).cast("bigint")
    out = verified.select(
        "id_a", "id_b",
        inter.alias("inter_n"),
        (F.col("sz_a") + F.col("sz_b") - inter).alias("union_n"),
    ).withColumn(
        "jaccard", F.col("inter_n").cast("double") / F.col("union_n").cast("double")
    )
    return out.filter(F.col("jaccard") >= threshold)


def repeated_ngram_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """EXACT repeated-substring dedup report (the distributed equivalent
    of the suffix-array scan in Lee et al. 2021, "Deduplicating Training
    Data Makes Language Models Better", public): find every token
    position covered by an n-gram that occurs in >= min_docs DISTINCT
    documents, merge overlapping/adjacent hits into maximal duplicated
    SPANS per document, and report per-document span statistics — the
    signal used to strip boilerplate/licence blocks that document-level
    dedup (exact, MinHash) cannot see because the *containing* documents
    are unique.

    Plan shape: tokenize (projection) → positional n-gram hashes
    (md5 of the n-gram, so the shuffle key is a fixed 32-char digest,
    never the raw n-gram text) → one keyed aggregate for cross-document
    frequency → one hash join back onto the positions → per-document
    gaps-and-islands window (running max of span end) → two keyed
    aggregates.  Everything is built-in expressions; no Python in the
    plan.  At 100 TB the positional table is token-count-sized — the
    unavoidable cost of exact substring matching — but it is never
    collected and both shuffles key on the digest.  A viral n-gram
    (boilerplate in millions of docs) skews its join partition; the
    dup-key side stays one row per digest, so AQE's skew-join split
    handles the probe side — and the doc-frequency count before it is
    map-side partial-aggregated, so the hot key arrives pre-combined.

    Returns (doc, n_tokens, n_dup_spans, dup_tokens, max_span_tokens,
    dup_token_ppm) for documents with at least one duplicated span.
    """
    # fan_out (r12): this was the ONE tokenizing operator reading df
    # without it — a compact parquet input arrives as a single split, so
    # the md5-per-n-gram gram build (the query's CPU cost, materialized
    # into the persist below) ran in ONE task no matter the core count.
    # The sf1 8-vs-32-core probe caught it: scaling ratio 1.06 on a
    # 176 MB-shuffle query; hash-fan-out by the (high-cardinality) doc
    # id measured 0.30x at sf1 and 0.64x at sf0.1, identical rows.
    toks = fan_out(df, by=[id_col]).select(
        F.col(id_col).alias("doc"),
        normalized_tokens(F.col(text_col)).alias("w"),
    ).withColumn("n_tokens", F.size("w")).filter(F.col("n_tokens") >= n)

    # persisted: the positional gram table feeds BOTH the cross-document
    # frequency aggregate and the join-back onto positions — without it
    # the whole tokenize → md5-per-n-gram derivation (the query's CPU
    # cost) runs twice in one plan (r11; same precedent as the winnowing
    # fp table — at data-lake scale the equivalent move is materializing
    # the positional n-gram index once)
    grams = track_persist(
        toks.select(
            "doc",
            "n_tokens",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.col("n_tokens") - (n - 1)),
                    lambda i: F.md5(F.concat_ws(" ", F.slice("w", i, n))),
                )
            ).alias("p0", "h"),
        ).select(
            "doc", "n_tokens", (F.col("p0") + 1).alias("pos"), "h"
        )
    )

    dup_keys = (
        grams.groupBy("h")
        .agg(F.countDistinct("doc").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h")
    )
    hits = grams.join(dup_keys, "h").select(
        "doc", "n_tokens", "pos", (F.col("pos") + (n - 1)).alias("e")
    )

    w_ord = Window.partitionBy("doc").orderBy("pos")
    prev_end = F.max("e").over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = F.when(
        prev_end.isNull() | (F.col("pos") > prev_end + 1), F.lit(1)
    ).otherwise(F.lit(0))
    islands = hits.withColumn(
        "island",
        F.sum(new_island).over(
            w_ord.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    spans = islands.groupBy("doc", "n_tokens", "island").agg(
        (F.max("e") - F.min("pos") + 1).alias("span_tokens")
    )
    return spans.groupBy("doc", "n_tokens").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup_spans"),
        F.sum("span_tokens").cast("bigint").alias("dup_tokens"),
        F.max("span_tokens").cast("bigint").alias("max_span_tokens"),
    ).select(
        "doc",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "n_dup_spans",
        "dup_tokens",
        "max_span_tokens",
        F.expr("(1000000 * dup_tokens) div n_tokens").alias("dup_token_ppm"),
    )


def simhash_bits(
    df: DataFrame, text_col: str, id_col: str, bits: int = 48
) -> DataFrame:
    """Generalized SimHash (Charikar 2002) over whitespace tokens: per
    token take the first ``bits`` bits of md5, sum ±1 per bit position
    over the doc, set bit where the sum is positive.  Same integer-exact
    contract and hex-digit bit layout as :func:`simhash16` (bit j lives
    in hex digit j//4, MSB-first, at in-digit position j%4), widened so
    blocked Hamming search has enough selectivity.  ``bits`` ≤ 52 keeps
    2^j terms inside exact BIGINT/double-free arithmetic everywhere.
    Returns (id, simhash)."""
    assert bits % 4 == 0 and 4 <= bits <= 52
    hexchars = bits // 4
    toks = fan_out(df).select(
        F.col(id_col).alias("id"),
        F.explode(normalized_tokens(F.col(text_col))).alias("tok"),
    ).withColumn(
        "v",
        F.conv(F.substring(F.md5(F.col("tok")), 1, hexchars), 16, 10)
        .cast("long"),
    )
    # Py4J expression diet (r12, guide §7.3 driver-side cost): the
    # per-bit Column compositions here used to cost ~7,000 gateway
    # round-trips per call (traced) — seconds of driver wall before any
    # job ran, paid once per bench rep.  Each bit's aggregate and the
    # final weight sum now arrive as ONE parsed SQL string each; the
    # resolved expression trees (shiftright & 1, *2-1, CASE WHEN) are
    # identical to the old Column-API forms, all arithmetic stays in
    # exact integer types, and every oracle hash is unchanged.
    agg_cols = [
        F.expr(
            f"sum((shiftright(v, {4 * (hexchars - 1 - j // 4) + (j % 4)}) & 1)"
            f" * 2 - 1) AS s{j}"
        )
        for j in range(bits)
    ]
    sums = toks.groupBy("id").agg(*agg_cols)
    weight_sum = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {2**j}L ELSE 0L END)" for j in range(bits)
    )
    return sums.select(
        "id", F.expr(f"CAST(({weight_sum}) AS BIGINT) AS simhash")
    )


def simhash_hamming_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 48,
    n_blocks: int = 4,
    max_hamming: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate PAIRS within a SimHash Hamming ball — the blocked
    search of Manku, Jain & Das Sarma 2007 ("Detecting near-duplicates
    for web crawling", public): split the ``bits``-bit simhash into
    ``n_blocks`` equal blocks; by pigeonhole every pair within Hamming
    distance ``max_hamming`` ≤ n_blocks-1 agrees exactly on at least one
    block, so candidates are generated by n_blocks block-equality
    self-joins (LSH-banding shape — one shuffle keyed on (block,
    value), never all-pairs) and verified with one exact
    ``bit_count(xor)`` per candidate.

    ``max_bucket`` is the saturation guard (same philosophy as the
    winnowing operator's): a block value shared by more than
    ``max_bucket`` documents is a boilerplate CLUSTER — exact-dedup
    territory with a quadratic candidate bill — and is excluded from
    pair generation.  The rule is a deterministic function of the data
    (bucket row-counts), applied identically in the DuckDB oracle, so
    results stay hash-checkable at every scale.

    Returns (id_a, id_b, hamming) with id_a < id_b, hamming ≤ max_hamming.
    """
    sh = simhash_bits(df, text_col, id_col, bits=bits)
    return simhash_hamming_pairs_from_hashes(
        sh,
        bits=bits,
        n_blocks=n_blocks,
        max_hamming=max_hamming,
        max_bucket=max_bucket,
    )


def simhash_hamming_pairs_from_hashes(
    sh: DataFrame,
    bits: int = 48,
    n_blocks: int = 4,
    max_hamming: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """The blocked Hamming-ball pair search of
    :func:`simhash_hamming_pairs`, starting from an already-computed
    (id, simhash) table — the incremental-ingest entry point: a
    streaming pipeline that accumulates per-doc simhashes in a state
    table runs THIS over the accumulated state and gets bit-equal
    results to the one-shot batch operator (pinned by
    tests/test_streaming.py's simhash parity test).  Single source of
    truth for the block split AND the ``max_bucket`` saturation cap —
    both code paths share the exact contract.

    PLAN SHAPE (round-10 rewrite, same as minhash_lsh_pairs): join-free.
    ONE hash exchange on (b, bv), a spill-safe window count applying the
    cap inline, a ``collect_list(struct(id, simhash))`` per block bucket
    reusing that partitioning, and JVM-side pair emission + the exact
    ``bit_count(xor)`` verification via ``posexplode`` + ``slice``.
    The previous shape (keep-aggregate + keep-join + block self-join)
    evaluated the md5-per-token simhash derivation once per join side
    and shuffled the block table three times; now the pipeline is
    single-consumer and linear (no persist), with one full-row exchange
    — the salted level-1 aggregation of :func:`_capped_bucket_arrays`
    — and no task ever holds an over-cap bucket (ADVICE r10: the
    earlier inline window count funneled the whole degenerate bucket
    through one task before discarding it).  Per-bucket fan-out is
    bounded by C(max_bucket, 2)."""
    assert max_hamming <= n_blocks - 1, "pigeonhole needs hamming < blocks"
    assert bits % n_blocks == 0
    width = bits // n_blocks
    mask = (1 << width) - 1

    blocks = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("b"),
                    F.shiftright("simhash", width * b)
                    .bitwiseAND(F.lit(mask))
                    .alias("bv"),
                )
                for b in range(n_blocks)
            ])
        ).alias("blk"),
    ).select("id", "simhash", "blk.b", "blk.bv")

    buckets = _capped_bucket_arrays(
        blocks, ["b", "bv"], F.struct("id", "simhash"), max_bucket
    ).withColumnRenamed("ids", "xs")
    # array_sort on the struct orders by its first field (id), so the
    # posexplode/slice emission below yields id_a < id_b directly
    cand = (
        buckets.select(F.posexplode("xs").alias("_i", "x"), "xs")
        .select(
            F.col("x.id").alias("id_a"),
            F.col("x.simhash").alias("sh_a"),
            F.explode(F.expr("slice(xs, _i + 2, size(xs))")).alias("y"),
        )
        .select(
            "id_a",
            F.col("y.id").alias("id_b"),
            F.expr("bit_count(sh_a ^ y.simhash)").cast("bigint").alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= max_hamming)
