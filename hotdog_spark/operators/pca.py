"""PCA at corpus scale: one distributed pass, driver-side eigensolve.

The classic decomposition of the problem (same as MLlib's RowMatrix
``computeGramianMatrix`` → local eigendecomposition): the data-sized
work is ONE pass accumulating the d×d Gram matrix (d = embedding dim,
64 here — 4096 cells, microscopic next to the corpus), and the
eigensolve runs on the driver over those d² numbers, touching no data.
At 100 TB the pass is map-side combinable partials (one d×d int64
matrix per Arrow batch, numpy ``X.T @ X``), so shuffle volume is
O(partitions · d²), independent of row count.

Everything is exact integer arithmetic so the result is reproducible
bit-for-bit and a DuckDB oracle can replay it:

* inputs quantized to ints (the package-wide ``round(x*1000)``);
* Gram/covariance cells are exact integer sums;
* the power iteration runs over Python arbitrary-precision ints with
  floor-division renormalization (scale to ``V_SCALE`` by the max
  absolute component each step) — no float appears until the final
  single-division Rayleigh quotient;
* sign fixed deterministically (the largest-|v| component is made
  positive; ties on lowest dim index).

Power iteration converges to the top eigenvector at rate (λ₂/λ₁)^k —
``iters`` is fixed (the honest contract; the oracle unrolls the same
count), so the result is defined as "k power steps from the all-ones
vector", exactly reproducible rather than tolerance-terminated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: fixed-point scale of the iterated vector (six fractional digits)
V_SCALE = 1_000_000


def gram_cells(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """(i, j, s_ij, s_i, n) cells of the quantized data's Gram matrix
    (upper triangle, i <= j) plus per-dim sums and the row count —
    everything the covariance matrix needs, in ONE Arrow-batched pass.

    Each batch contributes a d×d int64 partial via numpy ``X.T @ X``
    (vectorized, no per-row Python); partials are summed by a (i, j)
    hash aggregate of d² rows per partition.  Magnitude: |q| ≤ ~5·10³
    ⇒ |x_i·x_j| ≤ 2.5·10⁷ ⇒ int64 safely holds sums past 10¹¹ rows per
    partition; the combine aggregate is decimal(38,0).
    """
    from hotdog_spark.operators import fan_out
    from hotdog_spark.operators.similarity import quantized

    base = fan_out(df).select(quantized(F.col(vec_col)).alias("q"))

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf["q"].tolist(), dtype=np.int64)
            d = x.shape[1]
            g = x.T @ x  # exact int64
            s = x.sum(axis=0)
            iu, ju = np.triu_indices(d)
            yield pd.DataFrame(
                {
                    "i": iu.astype("int32"),
                    "j": ju.astype("int32"),
                    "s_ij": g[iu, ju],
                    # per-dim sums and n ride the diagonal rows (i == j)
                    "s_i": np.where(iu == ju, s[iu], 0),
                    "n_rows": np.where((iu == 0) & (ju == 0), len(pdf), 0),
                }
            )

    partials = base.mapInPandas(
        kernel, "i int, j int, s_ij long, s_i long, n_rows long"
    )
    return partials.groupBy("i", "j").agg(
        F.sum(F.col("s_ij").cast("decimal(38,0)")).alias("s_ij"),
        F.sum(F.col("s_i").cast("decimal(38,0)")).alias("s_i"),
        F.sum("n_rows").alias("n_rows"),
    )


def _power_iterate(
    cov: dict[tuple[int, int], int], d: int, iters: int
) -> list[int]:
    """Fixed-count power iteration over exact ints; returns the
    V_SCALE-scaled vector after sign fixing."""
    v = [V_SCALE] * d
    for _ in range(iters):
        w = [
            sum(cov[(min(i, j), max(i, j))] * v[j] for j in range(d))
            for i in range(d)
        ]
        m = max(abs(x) for x in w)
        if m == 0:
            break
        # SYMMETRIC truncation (divide magnitudes, reapply sign): SQL
        # integer-division rounding differs between engines on negative
        # operands, so both sides operate on non-negative values only —
        # where truncation and floor coincide everywhere
        v = [(x * V_SCALE) // m if x >= 0 else -((-x * V_SCALE) // m) for x in w]
    # deterministic sign: make the largest-|v| (lowest index on ties)
    # component positive
    pivot = max(range(d), key=lambda i: (abs(v[i]), -i))
    if v[pivot] < 0:
        v = [-x for x in v]
    return v


def pca_top_component(
    spark: SparkSession,
    df: DataFrame,
    vec_col: str,
    id_col: str,
    iters: int = 8,
) -> DataFrame:
    """Top principal component of the embedding covariance.

    Returns d rows: (dim, component_scaled, eigenvalue_est) where
    ``component_scaled`` is the V_SCALE-fixed-point eigenvector entry
    and ``eigenvalue_est`` the Rayleigh quotient vᵀCv / vᵀv — one IEEE
    division of exact integers, identical cross-engine.  Truncation
    note: v is renormalized by floor division each step, so this is a
    DEFINED deterministic recurrence, not a tolerance-converged float
    one — the property that makes it oracle-checkable.
    """
    cells = gram_cells(df, vec_col, id_col).collect()
    n = sum(int(r["n_rows"]) for r in cells)
    d = max(int(r["j"]) for r in cells) + 1
    s = {}
    sij = {}
    for r in cells:
        i, j = int(r["i"]), int(r["j"])
        sij[(i, j)] = int(r["s_ij"])
        if i == j:
            s[i] = int(r["s_i"])
    # covariance (×n² to stay integral): C_ij = n·S_ij − S_i·S_j
    cov = {
        (i, j): n * sij[(i, j)] - s[i] * s[j]
        for (i, j) in sij
    }
    v = _power_iterate(cov, d, iters)
    # Rayleigh quotient from exact ints
    num = sum(
        cov[(min(i, j), max(i, j))] * v[i] * v[j]
        for i in range(d)
        for j in range(d)
    )
    den = sum(x * x for x in v)
    rq = float(num) / float(den) if den else 0.0
    return spark.createDataFrame(
        [(i, v[i], rq) for i in range(d)],
        "dim int, component_scaled bigint, eigenvalue_est double",
    )
