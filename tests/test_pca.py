"""PCA operator: the integer recurrence must track the true top
eigenvector (numpy cross-check), the Gram kernel must be exact, and
the whole thing must be invariant to partitioning."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hotdog_spark.operators import pca


def _mk(spark, x, parts=4):
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(x)]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    ).repartition(parts)


def test_gram_cells_exact_vs_numpy(spark):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(300, 8)).astype(np.float32)
    q = np.round(x.astype(np.float64) * 1000).astype(np.int64)
    cells = pca.gram_cells(_mk(spark, x), "embedding", "vec_id").collect()
    n = sum(int(r["n_rows"]) for r in cells)
    assert n == 300
    g = q.T @ q
    s = q.sum(axis=0)
    for r in cells:
        i, j = int(r["i"]), int(r["j"])
        assert int(r["s_ij"]) == int(g[i, j])
        if i == j:
            assert int(r["s_i"]) == int(s[i])


def test_top_component_matches_numpy_eigh(spark):
    rng = np.random.default_rng(11)
    # anisotropic data: a dominant direction the iteration must find
    base = rng.normal(size=(500, 6))
    base[:, 2] *= 6.0
    out = pca.pca_top_component(
        spark, _mk(spark, base.astype(np.float32)), "embedding", "vec_id"
    ).collect()
    v = np.array([r["component_scaled"] for r in sorted(out, key=lambda r: r["dim"])],
                 dtype=np.float64)
    q = np.round(base.astype(np.float64) * 1000)
    c = len(q) * (q.T @ q) - np.outer(q.sum(0), q.sum(0))
    w, vecs = np.linalg.eigh(c)
    top = vecs[:, -1]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.999
    # Rayleigh estimate within 1% of the true top eigenvalue
    rq = out[0]["eigenvalue_est"]
    assert abs(rq - w[-1]) / w[-1] < 0.01


def test_partitioning_invariance_bitwise(spark):
    rng = np.random.default_rng(5)
    x = rng.normal(size=(200, 5)).astype(np.float32)
    a = sorted(
        tuple(r)
        for r in pca.pca_top_component(
            spark, _mk(spark, x, parts=1), "embedding", "vec_id"
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in pca.pca_top_component(
            spark, _mk(spark, x, parts=13), "embedding", "vec_id"
        ).collect()
    )
    assert a == b


def test_sign_is_deterministic_positive_pivot(spark):
    rng = np.random.default_rng(7)
    x = rng.normal(size=(100, 4)).astype(np.float32)
    out = pca.pca_top_component(spark, _mk(spark, x), "embedding", "vec_id").collect()
    vals = [r["component_scaled"] for r in out]
    assert max(vals, key=abs) > 0
