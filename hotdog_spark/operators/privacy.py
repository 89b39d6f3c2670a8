"""PII / denylist scrubbing for training corpora.

Before text reaches a training mix it gets scrubbed: structured PII
(emails, IPs, phone numbers) is redacted to placeholder tokens, and
configurable denylist terms are masked.  The reference engine has no such
operator (it is a syslog router); this belongs to the north-star
LLM-pipeline surface alongside dedup and quality scoring.

Everything is built-in `regexp_extract_all` / `regexp_replace` column
expressions — whole-stage codegen, zero shuffle, a pure projection that
scales linearly with the corpus.  The regex dialect is restricted to the
intersection of Java regex (Spark) and RE2 (DuckDB oracle): no
backreferences, no lookaround, ASCII `\\b` word boundaries only, so the
same pattern strings drive both engines bit-identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hotdog_spark.operators import fan_out

# Patterns are applied to casefolded text, in this order (counts are
# independent per category; redaction is sequential in the same order).
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"


def denylist_re(terms: list[str]) -> str:
    """Whole-word alternation over casefolded denylist terms."""
    return r"\b(" + "|".join(sorted(t.lower() for t in terms)) + r")\b"


def _count(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0))


def redacted_text(text: Column, deny_terms: list[str]) -> Column:
    """Casefold then redact email → ipv4 → phone → denylist, in order."""
    red = F.lower(text)
    for pattern, token in (
        (EMAIL_RE, "<email>"),
        (IPV4_RE, "<ip>"),
        (PHONE_RE, "<phone>"),
        (denylist_re(deny_terms), "<term>"),
    ):
        red = F.regexp_replace(red, pattern, token)
    return red


def pii_scrub(
    df: DataFrame, text_col: str, id_col: str, deny_terms: list[str]
) -> DataFrame:
    """Per-document PII/denylist audit + redaction fingerprint.

    Returns (id, n_email, n_ipv4, n_phone, n_denylist, redacted_fp) where
    ``redacted_fp`` is the 16-hex-char md5 of the fully redacted text —
    the key downstream exact-dedup runs on so that documents differing
    only in scrubbed PII collapse together.
    """
    text = F.col(text_col)
    low = F.lower(text)
    return fan_out(df).select(
        F.col(id_col),
        _count(low, EMAIL_RE).alias("n_email"),
        _count(low, IPV4_RE).alias("n_ipv4"),
        _count(low, PHONE_RE).alias("n_phone"),
        _count(low, denylist_re(deny_terms)).alias("n_denylist"),
        F.substring(F.md5(redacted_text(text, deny_terms)), 1, 16).alias(
            "redacted_fp"
        ),
    )


def k_anonymity_report(
    df: "DataFrame",
    quasi_cols: list[Column],
    k_threshold: int = 5,
) -> "DataFrame":
    """k-ANONYMITY audit over a quasi-identifier tuple (Sweeney 2002,
    public): group rows into equivalence classes by the quasi-identifier
    columns, measure each class size k, and report the class-size
    distribution — the standard pre-release privacy check for a corpus:
    any row in a class with k below threshold is re-identifiable by
    joining the quasi-identifiers against an external dataset.

    Output is one row per class-size bucket ('1', '2-4', '5-9', '10+'
    by default threshold geometry) with the number of equivalence
    classes, the number of rows, and each bucket's row share in ppm —
    plus an `at_risk` flag (bucket entirely below ``k_threshold``).

    Scale shape: one keyed aggregate over the quasi-identifier tuple
    (map-side combinable) and one tiny re-aggregate over class sizes —
    the whole report is two shuffles of bounded-cardinality rows; no
    row-level data ever leaves the executors."""
    classes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("k"))
    # bucket labels derive from the threshold so a non-default
    # k_threshold never mislabels a class (boundaries and names move
    # together); at the default 5 they read '1', '2-4', '5-9', '10+'
    bucket = (
        F.when(F.col("k") == 1, F.lit("1"))
        .when(F.col("k") < k_threshold, F.lit(f"2-{k_threshold - 1}"))
        .when(
            F.col("k") < 2 * k_threshold,
            F.lit(f"{k_threshold}-{2 * k_threshold - 1}"),
        )
        .otherwise(F.lit(f"{2 * k_threshold}+"))
    )
    buckets = classes.select(bucket.alias("k_bucket"), "k").groupBy(
        "k_bucket"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum("k").cast("bigint").alias("n_rows"),
        F.min("k").cast("bigint").alias("min_k"),
    )
    # total = window-sum over the ≤4 bucket rows themselves — no second
    # pass over df or classes (at 100 TB an extra count() scan would
    # double the report's cost for one denominator)
    from pyspark.sql.window import Window

    total = F.sum("n_rows").over(
        Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return buckets.select(
        "k_bucket",
        "n_classes",
        "n_rows",
        (F.col("min_k") < k_threshold).cast("bigint").alias("at_risk"),
        total.alias("n_total"),
    ).select(
        "k_bucket",
        "n_classes",
        "n_rows",
        F.expr("(1000000 * n_rows) div greatest(n_total, 1)")
        .alias("row_share_ppm"),
        "at_risk",
    )


def l_diversity_report(
    df: "DataFrame",
    quasi_cols: list[Column],
    sensitive_col: Column,
    l_threshold: int = 3,
) -> "DataFrame":
    """l-DIVERSITY audit (Machanavajjhala et al. 2007, public) — the
    companion to :func:`k_anonymity_report`: k-anonymity alone fails
    when an equivalence class is large but every member shares the same
    SENSITIVE value (the homogeneity attack — the attacker learns the
    secret without identifying the row).  Per quasi-identifier class,
    count DISTINCT sensitive values l; report the class distribution by
    l with row counts and an at-risk flag (l below threshold).

    Same two-bounded-aggregate shape as the k report: one keyed
    aggregate per class (count + approx-free exact distinct via a
    two-level group), one tiny re-aggregate over l values."""
    # project first, then group by the projected NAMES — grouping by the
    # original expressions would re-resolve them against the projection,
    # where their input columns no longer exist
    qnames = [f"_q{i}" for i in range(len(quasi_cols))]
    classes = (
        df.select(
            *[c.alias(n) for c, n in zip(quasi_cols, qnames)],
            sensitive_col.alias("_sens"),
        )
        .groupBy(*qnames)
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.countDistinct("_sens").alias("l"),
        )
    )
    buckets = classes.groupBy("l").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum("k").cast("bigint").alias("n_rows"),
    )
    from pyspark.sql.window import Window

    total = F.sum("n_rows").over(
        Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return buckets.select(
        F.col("l").cast("bigint").alias("l"),
        "n_classes",
        "n_rows",
        total.alias("n_total"),
    ).select(
        "l",
        "n_classes",
        "n_rows",
        F.expr("(1000000 * n_rows) div greatest(n_total, 1)")
        .alias("row_share_ppm"),
        (F.col("l") < l_threshold).cast("bigint").alias("at_risk"),
    )


#: Exactness bound for the TVD ppm math, scoped to the WORST product in
#: the whole expression, not just the per-value cross terms: tvd_num =
#: Σ_v |n_cv·N − n_v·k| ≤ 2·k·N, so the scaled numerator 1_000_000·tvd_num
#: can reach 2_000_000·k·N, and the denominator itself is 2·k·N.  Both
#: stay inside signed-64 (9.22e18) iff k·N ≤ (2^63−1) div 2_000_000.
#: (The per-value products n_cv·N, n_v·k ≤ k·N are then far under 2^63.)
#: Enforced in-plan below per class — the same loud-failure idiom as
#: queries/similarity.py::_guarded_simpson_ppm and
#: sketches.py::guarded_est_union.
T_CLOSENESS_KN_BOUND = (2**63 - 1) // 2_000_000  # 4_611_686_018_427


def _guarded_tvd_ppm() -> "Column":
    """tvd_ppm with the exactness bound enforced in-plan: raises via
    ``raise_error`` when k·n_total exceeds T_CLOSENESS_KN_BOUND instead
    of letting the scaled-numerator / denominator BIGINT products wrap
    silently.  The check itself is multiplication-free (k compared to
    BOUND div n_total — exact for integer k, N ≥ 1) so the guard can
    never overflow while testing for overflow.  Split out so the guard
    is unit-testable on a forged over-bound row."""
    return F.expr(
        f"CASE WHEN k > ({T_CLOSENESS_KN_BOUND} div greatest(n_total, 1)) "
        f"THEN raise_error(concat('t_closeness_report: k*n_total=', "
        f"CAST(k AS STRING), '*', CAST(n_total AS STRING), "
        f"' exceeds the {T_CLOSENESS_KN_BOUND} exact-bigint bound "
        f"(1e6*tvd_num <= 2e6*k*N would overflow); shard the "
        f"audit by corpus slice')) "
        f"ELSE (1000000 * tvd_num) div (2 * k * n_total) END"
    ).alias("tvd_ppm")


def t_closeness_report(
    df: "DataFrame",
    quasi_cols: list[Column],
    sensitive_col: Column,
    t_ppm_threshold: int = 300_000,
) -> "DataFrame":
    """t-CLOSENESS audit (Li, Li & Venkatasubramanian 2007, public) —
    the third classic privacy criterion after k-anonymity and
    l-diversity: an equivalence class leaks information when its
    SENSITIVE-value distribution diverges from the global one (the
    skewness attack — l distinct values can still be 99% one value).
    Per class, the total-variation distance to the global distribution,

        TVD = 1/2 * sum_v | p_class(v) - p_global(v) |,

    computed in EXACT integer ppm:
    (1_000_000 * sum_v |n_cv*N - n_v*k|) div (2*k*N) — all BIGINT
    (worst product is the scaled numerator 1e6*tvd_num <= 2e6*k*N,
    which stays in signed-64 iff k*N <= T_CLOSENESS_KN_BOUND ~ 4.6e12,
    enforced per class in-plan — the same exactness-bound class as the
    other ppm reports).

    Output: one row per TVD decile bucket (tvd_ppm div 100_000, 0..10)
    with class/row counts, row share ppm, and an at-risk flag for
    buckets whose lower bound is at or above ``t_ppm_threshold``.

    Scale shape: one keyed aggregate per (class, sensitive value), a
    spine join against the BROADCAST global value distribution (the
    sensitive domain is bounded — languages, sources), one per-class
    aggregate, one tiny decile re-aggregate."""
    from pyspark.sql.window import Window

    qnames = [f"_q{i}" for i in range(len(quasi_cols))]
    base = df.select(
        *[c.alias(n) for c, n in zip(quasi_cols, qnames)],
        sensitive_col.alias("_sens"),
    )
    cells = base.groupBy(*qnames, "_sens").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cv")
    )
    class_sizes = cells.groupBy(*qnames).agg(
        F.sum("n_cv").cast("bigint").alias("k")
    )
    glob = cells.groupBy("_sens").agg(
        F.sum("n_cv").cast("bigint").alias("n_v")
    )
    # global total via a window over the (bounded) value distribution —
    # no extra corpus pass
    glob = glob.withColumn(
        "n_total",
        F.sum("n_v").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("bigint"),
    )
    # every sensitive value contributes to every class (absence means
    # |0 - n_v*k|), so join the observed cells onto the class x value
    # spine
    spine = class_sizes.crossJoin(F.broadcast(glob))
    joined = spine.join(cells, [*qnames, "_sens"], "left").na.fill(
        {"n_cv": 0}
    )
    per_class = joined.groupBy(*qnames, "k", "n_total").agg(
        F.sum(F.abs(F.col("n_cv") * F.col("n_total") - F.col("n_v") * F.col("k")))
        .cast("bigint")
        .alias("tvd_num")
    ).select(
        "k",
        _guarded_tvd_ppm(),
    )
    buckets = per_class.select(
        F.expr("tvd_ppm div 100000").cast("bigint").alias("tvd_decile"), "k"
    ).groupBy("tvd_decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum("k").cast("bigint").alias("n_rows"),
    )
    total = F.sum("n_rows").over(
        Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return buckets.select(
        "tvd_decile",
        "n_classes",
        "n_rows",
        total.alias("n_total"),
    ).select(
        "tvd_decile",
        "n_classes",
        "n_rows",
        F.expr("(1000000 * n_rows) div greatest(n_total, 1)")
        .alias("row_share_ppm"),
        (F.col("tvd_decile") * 100_000 >= t_ppm_threshold)
        .cast("bigint")
        .alias("at_risk"),
    )
