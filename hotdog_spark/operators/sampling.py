"""Deterministic sampling and dataset splitting.

`df.sample()` is seed-and-partitioning dependent — rerun the job with
different parallelism and you get a different sample.  Training-data
pipelines need *content-deterministic* sampling: whether a row is in the
sample depends only on its key, so the split is reproducible across
engines, reruns, and backfills, and rows never migrate between train and
test when the corpus grows.  The trick: hash the key (md5 —
engine-portable), take a fixed-width lowercase-hex prefix, and compare it
lexicographically against a threshold — fixed-width hex ordering is
integer ordering, so no hex→int conversion is needed anywhere.

Pure projections — no shuffle, no state, no RNG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 4 hex chars → 16 bits of uniformity: granularity 1/65536 per key.
_PREFIX_LEN = 4
_SPACE = 16 ** _PREFIX_LEN


def hex_threshold(rate: float) -> str:
    """The 4-hex-char cutoff under which ~``rate`` of keys fall."""
    return format(int(rate * _SPACE), f"0{_PREFIX_LEN}x")


def _prefix(key: Column) -> Column:
    return F.substring(F.md5(key.cast("string")), 1, _PREFIX_LEN)


def md5_sample(df: DataFrame, key_col: str, rate: float) -> DataFrame:
    """Keep ~``rate`` of rows, chosen deterministically by key content."""
    return df.filter(_prefix(F.col(key_col)) < F.lit(hex_threshold(rate)))


def split_of(key: Column, test_frac: float = 0.1) -> Column:
    """The :func:`with_split` assignment as a pure expression — for
    call-sites that already hold the key in a pair/edge row and must
    not join back to the corpus just to learn its split."""
    return F.when(
        _prefix(key) < F.lit(hex_threshold(test_frac)), F.lit("test")
    ).otherwise(F.lit("train"))


def with_split(
    df: DataFrame, key_col: str, test_frac: float = 0.1, split_col: str = "split"
) -> DataFrame:
    """Add a stable train/test assignment column.  A key's split never
    changes as the corpus grows — the property random splits lose."""
    return df.withColumn(split_col, split_of(F.col(key_col), test_frac))


def shard_by_hash(
    df: DataFrame, key_col: str, n_shards: int = 16
) -> DataFrame:
    """Deterministic shard assignment + within-shard order for training
    export — the last mile of a data pipeline: every run, engine, and
    backfill produces the SAME shard layout and the same within-shard
    sequence, and that sequence is a content-hash order (a reproducible
    global shuffle, uncorrelated with source order — exactly what
    sequential training consumption wants).

    shard = first md5 hex digit mod ``n_shards`` (power-of-two shard
    counts ≤ 16 stay uniform); ``pos`` = rank of (md5, key) inside the
    shard.  One hash shuffle on the shard key; at 100 TB follow with
    ``.repartition("shard").sortWithinPartitions("pos")`` and a
    ``partitionBy("shard")`` write so each shard lands as one ordered
    file set.
    """
    if not 1 <= n_shards <= 16 or 16 % n_shards != 0:
        raise ValueError("n_shards must divide 16 (md5 digit uniformity)")
    from pyspark.sql.window import Window

    h = F.md5(F.col(key_col).cast("string"))
    # Column-API arithmetic on the already-built hash column — no SQL
    # string interpolation, so quoted/dotted column names work too.
    shard = (F.instr(F.lit("0123456789abcdef"), F.substring(h, 1, 1)) - 1) % n_shards
    w = Window.partitionBy("shard").orderBy(h, F.col(key_col))
    return df.withColumn("shard", shard.cast("int")).withColumn(
        "pos", F.row_number().over(w)
    )


def stratified_sample(
    df: DataFrame, key_col: str, group_col: str, n_per_group: int
) -> DataFrame:
    """Exactly-n-per-group deterministic sample: rank rows inside each
    group by (md5(key), key) and keep the first ``n_per_group``.

    Content-deterministic like ``md5_sample`` but with an exact per-group
    quota — the shape data-mix construction needs ("200k docs per
    language").  One shuffle on the group key; the hash order makes the
    pick uniform-ish while staying engine-portable.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_group)
        .drop("_rk")
    )


def pack_token_budget(
    df: DataFrame,
    key_col: str,
    tokens_col: str,
    budget: int,
    group_col: str | None = None,
) -> DataFrame:
    """Assign documents to fixed-token-budget bins (LLM sequence-packing
    precursor): within each group, order docs deterministically by key and
    bin them where the running token total crosses multiples of
    ``budget``.

    bin = floor(start_offset / budget) where start_offset is the running
    token total before the doc — offset-division binning: each bin covers
    one ``budget``-sized span of the concatenated token stream.  Docs are
    assigned by where they *start*, so a doc may straddle its bin's end:
    a bin's total is ≤ budget + its largest doc (exactly the slack a
    packer that never splits documents must accept), and bin ids can skip
    past spans an oversized doc covers.  This formulation is a pure
    window cumsum — one shuffle, no sequential state, and (unlike greedy
    reset-on-overflow packing, which is inherently order-sequential) it
    computes identically in any engine.  Adds ``bin`` (bigint).
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(group_col).orderBy(key_col)
        if group_col is not None
        else Window.partitionBy().orderBy(key_col)
    )
    cum = F.sum(tokens_col).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        "bin", F.floor((cum - F.col(tokens_col)) / F.lit(budget)).cast("bigint")
    )


def pack_split_spans(
    df: DataFrame,
    key_col: str,
    tokens_col: str,
    budget: int,
    group_col: str | None = None,
) -> DataFrame:
    """Sequence packing WITH document splitting — the layout LLM
    pretraining actually trains on: the group's docs concatenate into one
    token stream cut into exact ``budget``-token sequences, and a doc
    straddling a cut contributes a piece to each side.  Every bin is
    exactly full (except the stream's last), zero padding waste —
    ``pack_token_budget``'s no-split variant trades that for intact docs.

    Pure arithmetic on the same one-shuffle window cumsum: a doc
    occupying stream offsets [start, start+len) overlaps bins
    floor(start/B)..floor((start+len-1)/B); one generator row per
    overlapped bin with the exact overlap size.  Fan-out per doc is
    len/B + 1 rows — bounded, engine-exact, order-deterministic.
    Emits (…, bin, piece_idx, piece_tokens): piece_idx numbers a doc's
    pieces 0..n, so consumers can reassemble or mask across cuts.
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(group_col).orderBy(key_col)
        if group_col is not None
        else Window.partitionBy().orderBy(key_col)
    )
    cum = F.sum(tokens_col).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    b = F.lit(budget)
    with_start = df.withColumn("_start", cum - F.col(tokens_col)).filter(
        F.col(tokens_col) > 0
    )
    first_bin = F.floor(F.col("_start") / b)
    last_bin = F.floor((F.col("_start") + F.col(tokens_col) - 1) / b)
    exploded = with_start.withColumn(
        "bin", F.explode(F.sequence(first_bin, last_bin))
    )
    piece_start = F.greatest(F.col("bin") * b, F.col("_start"))
    piece_end = F.least(
        (F.col("bin") + 1) * b, F.col("_start") + F.col(tokens_col)
    )
    return (
        exploded.withColumn("piece_idx", (F.col("bin") - first_bin).cast("int"))
        .withColumn("piece_tokens", (piece_end - piece_start).cast("bigint"))
        .drop("_start")
    )


def rebalance_to_min_group(
    df: DataFrame, key_col: str, group_col: str
) -> DataFrame:
    """Deterministically downsample every group to ≈ the smallest group's
    size — the data-mix rebalancer ("equal docs per source") that keeps
    the same rows on every rerun.

    Per-group keep-rate = min_count / count, applied through the same
    md5-prefix threshold as ``md5_sample`` (threshold = ⌊rate·16^4⌋ as
    4-digit hex; rate 1 keeps everything explicitly, sidestepping the
    5-hex-digit '10000' comparing lexicographically *below* all 4-digit
    prefixes).  Cost: one tiny group-count aggregate broadcast back onto
    the corpus — the corpus itself is never shuffled.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_cnt"))
    mn = counts.agg(F.min("_cnt").alias("_min"))
    rates = counts.crossJoin(F.broadcast(mn)).select(
        group_col,
        F.col("_cnt"),
        F.floor(F.col("_min") * _SPACE / F.col("_cnt")).cast("long").alias("_th"),
    )
    keep = (F.col("_th") >= _SPACE) | (
        _prefix(F.col(key_col)) < F.format_string(f"%0{_PREFIX_LEN}x", F.col("_th"))
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(keep)
        .drop("_th")
        .withColumnRenamed("_cnt", "n_before")
    )


def rebalance_temperature_sqrt(
    df: DataFrame, key_col: str, group_col: str
) -> DataFrame:
    """Temperature-weighted data-mix rebalancing (T = 2, i.e. target
    share ∝ count^(1/2)) — the multilingual-training compromise between
    the natural mix (head sources drown the tail) and the uniform mix of
    :func:`rebalance_to_min_group` (tail sources force away most head
    data).  Sampling sources proportional to p^α with α = 1/2 is the
    standard temperature fix (e.g. multilingual BERT / XLM-R data
    sampling); this is its deterministic, downsample-only form: the
    per-group keep-rate that realises share ∝ √count without ever
    upsampling is rate_g = √(min_count / count_g) (the smallest group
    keeps everything, a 100×-larger group keeps 1/10 — not 1/100 as the
    uniform mix would).

    Cross-engine determinism: rate_g is computed as
    ``floor(16⁴ · sqrt(min/cnt))`` — one IEEE division and one IEEE
    sqrt (both correctly rounded, so bit-identical in Spark and DuckDB)
    scaled by a power of two (exact) — and applied through the same
    md5-prefix threshold as :func:`md5_sample`.  Same scale shape as
    :func:`rebalance_to_min_group`: one tiny count aggregate broadcast
    onto a pure filter; the corpus is never shuffled.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_cnt"))
    mn = counts.agg(F.min("_cnt").alias("_min"))
    rates = counts.crossJoin(F.broadcast(mn)).select(
        group_col,
        F.col("_cnt"),
        F.floor(
            F.lit(_SPACE)
            * F.sqrt(F.col("_min").cast("double") / F.col("_cnt").cast("double"))
        ).cast("long").alias("_th"),
    )
    keep = (F.col("_th") >= _SPACE) | (
        _prefix(F.col(key_col)) < F.format_string(f"%0{_PREFIX_LEN}x", F.col("_th"))
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(keep)
        .drop("_th")
        .withColumnRenamed("_cnt", "n_before")
    )


def zorder_key(x: Column, y: Column, bits: int = 10) -> Column:
    """Morton (Z-order) interleaving of the low ``bits`` bits of two
    integer keys — the multi-dimensional clustering key behind
    data-skipping layouts (Delta/Iceberg OPTIMIZE ZORDER): rows sorted or
    tiled by this key are simultaneously clustered on BOTH dimensions, so
    per-file min/max stats prune scans on either predicate.

    Pure bit arithmetic (shift/and/or — identical semantics in Spark and
    DuckDB BIGINT), a projection with no shuffle; callers mask inputs to
    ``bits`` width themselves if keys may exceed it.
    """
    acc = None
    for b in range(bits):
        xb = F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b)
        yb = F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        term = xb + yb
        acc = term if acc is None else acc + term
    return acc


def importance_weights_hashed_ngrams(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_pred: Column,
    buckets: int = 1024,
) -> DataFrame:
    """DSIR-style importance weighting with hashed bigram features (Xie
    et al. 2023, "Data Selection for Language Models via Importance
    Resampling" — the public formulation), kept INTEGER-EXACT so both
    engines agree bit-for-bit:

    - features: word bigrams hashed into ``buckets`` buckets (md5 → one
      4-hex-digit int → pmod — the simhash bucketing pattern),
    - target model: bucket counts over the rows where ``target_pred``
      holds; source model: bucket counts over the whole corpus,
    - per document, ``target_mass`` = Σ target-count of its hashed
      grams and ``source_mass`` = Σ source-count (exact BIGINT sums —
      the rational stand-in for DSIR's log-ratio: monotone in "does
      this doc's feature mass look like the target", no logs so no libm
      divergence),
    - ``weight`` = (target_mass/T) / (source_mass/S) as ONE double
      division of exact integers (T, S = total feature mass of each
      model), and ``selected`` = the exact integer cross-multiplication
      target_mass·S > source_mass·T (importance weight > 1 — the doc is
      more target-like than the average source doc).

    Plan at scale: one bigram explode (persisted, feeds the model and
    the scoring join), ONE bucket-count aggregate computing both models
    via a conditional count — BUCKET-bounded (1024 rows — broadcast by
    construction, never a shuffle of the corpus), one scalar-totals
    cross join (1 row), and one per-doc aggregate.  The corpus is never
    shuffled on anything wider than its own doc key, and the gram cache
    is scanned twice (model + scoring), not three times."""
    from hotdog_spark.operators import track_persist
    from hotdog_spark.operators.dedup import normalized_tokens

    toks = normalized_tokens(F.col(text_col))
    base = df.select(
        F.col(id_col), target_pred.alias("is_target"), toks.alias("t")
    ).filter(F.size("t") >= 2)
    grams = track_persist(
        base.select(
            id_col,
            "is_target",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2),"
                    " i -> concat(t[i], ' ', t[i + 1]))"
                )
            ).alias("g"),
        ).withColumn(
            "bucket",
            F.pmod(
                F.conv(F.substring(F.md5(F.col("g")), 1, 4), 16, 10).cast("int"),
                F.lit(buckets),
            ),
        ).drop("g")
    )
    # Source and target bucket counts in ONE pass over the gram cache:
    # count(when(is_target, 1)) counts exactly the rows a
    # filter(is_target) would keep (nulls and false both excluded), so
    # this is the old two-aggregate + left-join shape fused — one cache
    # scan and one bucket-keyed exchange instead of two of each, and
    # absent-target buckets get 0 without a coalesce.
    model = F.broadcast(
        grams.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("s_cnt"),
            F.count(F.when(F.col("is_target"), F.lit(1))).alias("t_cnt"),
        )
    )
    totals = F.broadcast(
        model.agg(
            F.sum("s_cnt").alias("s_tot"), F.sum("t_cnt").alias("t_tot")
        )
    )
    per_doc = (
        grams.join(model, "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("t_cnt").alias("target_mass"),
            F.sum("s_cnt").alias("source_mass"),
        )
    )
    # weight as (tm/sm)·(S/T): every op is an exactly-rounded IEEE
    # double op in a FIXED order, so both engines produce the same bits
    # — and no int64 product that would overflow at 100 TB feature
    # masses.  selected cross-multiplies in DECIMAL so the exact flag
    # survives any corpus size (long·long wraps in Spark, errors in
    # DuckDB; decimal(18,0)² fits decimal(37,0) in both).
    dec = "decimal(18,0)"
    return per_doc.crossJoin(totals).select(
        id_col,
        "n_grams",
        "target_mass",
        "source_mass",
        (
            (F.col("target_mass").cast("double") / F.col("source_mass").cast("double"))
            * (F.col("s_tot").cast("double") / F.col("t_tot").cast("double"))
        ).alias("weight"),
        (
            F.col("target_mass").cast(dec) * F.col("s_tot").cast(dec)
            > F.col("source_mass").cast(dec) * F.col("t_tot").cast(dec)
        ).cast("long").alias("selected"),
    )
