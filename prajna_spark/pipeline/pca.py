"""Distributed PCA: top principal component by Gram aggregation + power
iteration.

The scalable decomposition: the only corpus-sized work is ONE pass that
accumulates X^T X (the Gram matrix), the column sums, and the row count
— numpy matmul per Arrow batch, emitted as (i, j, partial) triples and
hash-summed into dim^2 + dim + 1 rows. Everything after that is
driver-bounded linear algebra on a dim x dim matrix (same adjudication
as the k-means centroid reads: the collect is bounded by the DIMENSION,
never the corpus).

Cross-engine exactness uses the pagerank technique: the covariance is
rounded once (9 decimals) after the fp-order-sensitive sums, then a
FIXED number of power iterations runs with per-iteration rounding, so a
DuckDB CTE chain replays the whole computation hash-exactly (fp drift
between numpy's and SQL's sum orders is ~1e-15, six orders below the
rounding step).

Reference analog: Prajna's iterative numerics live in driver-looped
fold/aggregate passes (paper §5 SGD example; GV.fs:1751 AggregateFunction);
this is the same loop shape with the corpus pass reduced to one
aggregation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (kept for API symmetry)


def gram_stats(vectors: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """One corpus pass -> (i, j, val) rows: i,j in 1..dim carry the Gram
    sums; (i, 0) carries column sum_i; (0, 0) carries the row count."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            g = x.T @ x
            s = x.sum(axis=0)
            n = float(len(x))
            ii, jj = np.meshgrid(
                np.arange(1, dim + 1), np.arange(1, dim + 1), indexing="ij"
            )
            yield pd.DataFrame(
                {
                    "i": np.concatenate([ii.ravel(), np.arange(1, dim + 1), [0]]),
                    "j": np.concatenate([jj.ravel(), np.zeros(dim, dtype=int), [0]]),
                    "val": np.concatenate([g.ravel(), s, [n]]),
                }
            )

    out = vectors.select(vec_col).mapInPandas(
        partials, schema="i int, j int, val double"
    )
    return out.groupBy("i", "j").agg(F.sum("val").alias("val"))


def _pround_py(x, decimals: int):
    """Portable IEEE half-up rounding, the numpy twin of
    functions.rounding.pround: floor(x * 10^d + 0.5) / 10^d."""
    import numpy as np

    scale = 10.0**decimals
    return np.floor(x * scale + 0.5) / scale


def pca_top_component(
    vectors: DataFrame,
    vec_col: str,
    dim: int,
    n_iter: int = 8,
    round_internal: int = 9,
    round_out: int = 6,
) -> DataFrame:
    """-> (dim_idx, loading, eigenvalue): the dominant eigenvector of the
    sample covariance (centered, /n), by ``n_iter`` power iterations from
    the uniform start 1/sqrt(dim) (IEEE sqrt + division — bit-identical
    on any engine, so part of the replay contract). Per-iteration
    rounding pins the replay; see module docstring."""
    import numpy as np

    spark = vectors.sparkSession
    rows = gram_stats(vectors, vec_col, dim).collect()  # dim^2+dim+1 rows
    g = np.zeros((dim, dim))
    s = np.zeros(dim)
    n = 0.0
    for r in rows:
        if r["i"] == 0:
            n = r["val"]
        elif r["j"] == 0:
            s[r["i"] - 1] = r["val"]
        else:
            g[r["i"] - 1, r["j"] - 1] = r["val"]
    mu = s / n
    cov = _pround_py(g / n - np.outer(mu, mu), round_internal)

    v = np.full(dim, 1.0 / np.sqrt(float(dim)))
    for _ in range(n_iter):
        # the matvec is NOT rounded: its terms are exact multiples of the
        # covariance's rounding grain, so sums land exactly on .5e-9
        # midpoints where a 1-ulp cross-engine drift flips the rounding
        # (observed). Dividing by the (irrational) norm de-correlates the
        # grain; rounding THERE is midpoint-collision-free.
        w = cov @ v
        norm = np.sqrt(float((w * w).sum()))
        v = _pround_py(w / norm, round_internal)
    lam = float(v @ (cov @ v))

    out = [
        (int(i + 1), float(_pround_py(v[i], round_out)), float(_pround_py(lam, round_out)))
        for i in range(dim)
    ]
    return spark.createDataFrame(out, "dim_idx int, loading double, eigenvalue double")
