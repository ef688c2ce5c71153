"""PCA over an embedding column — distributed moments, driver-side eigh.

Dimensionality reduction is the standard pre-step for visualising,
compressing, or whitening an embedding table (and the IVF/PQ literature
trains quantizers in a PCA-rotated space). The decomposition splits
exactly along Spark's execution model:

- **Moments are distributed**: each Arrow batch contributes
  (n, Σx, Σx xᵀ) — computed as one BLAS GEMM per batch inside
  ``mapInPandas`` — so the corpus is scanned once, map-side only, and
  the shuffle carries ``n_batches`` rows of dim²+dim+1 doubles, not
  vectors.
- **The eigenproblem is a driver scalar**: covariance is dim×dim
  (64×64 here — microseconds in LAPACK); shipping it to a cluster would
  be pure overhead. ``numpy.linalg.eigh`` on the driver, components
  sign-fixed (largest-|loading| coordinate made positive) so the basis
  is deterministic up to float noise.
- **Projection is map-side again**: X_c @ Wᵀ per batch, no shuffle.

Float caveat (why the catalog entry is rows-only): partial moment sums
combine in partition order, so covariance entries can wiggle at ~1e-13
across layouts; eigenvectors inherit ~1e-10 of that. tests/test_pca.py
pins the algorithm against exact single-machine numpy PCA instead
(subspace equality, explained variance, reconstruction-error ordering).

Reference: training-pipeline extension (SURVEY.md §6); no analog in the
reference app.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _moments_gen(dim: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            ).reshape(len(pdf), dim)
            yield pd.DataFrame(
                {
                    "n": [len(pdf)],
                    "s": [X.sum(axis=0).tolist()],
                    "ss": [(X.T @ X).ravel().tolist()],
                }
            )

    return gen


class PcaModel:
    def __init__(self, mean: np.ndarray, components: np.ndarray, variances: np.ndarray, n: int):
        self.mean = mean  # (dim,)
        self.components = components  # (k, dim), rows orthonormal
        self.variances = variances  # (k,) explained variance per component
        self.n = n


def pca_fit(emb: DataFrame, k: int, vec_col: str = "embedding") -> PcaModel:
    """Fit top-k principal components. One corpus scan (map-side GEMM
    partials), one bounded collect, one driver eigh."""
    dim = len(emb.select(vec_col).first()[0])
    parts = emb.select(F.col(vec_col).alias("embedding")).mapInPandas(
        _moments_gen(dim),
        "n long, s array<double>, ss array<double>",
    )
    rows = parts.collect()
    n = sum(r["n"] for r in rows)
    if n < 2:
        raise ValueError("PCA needs at least 2 vectors")
    s = np.zeros(dim)
    ss = np.zeros((dim, dim))
    for r in rows:
        s += np.asarray(r["s"])
        ss += np.asarray(r["ss"]).reshape(dim, dim)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, dim)
    # deterministic sign: make the largest-|loading| coordinate positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PcaModel(mean, comps, np.maximum(evals[order], 0.0), n)


def pca_project(
    emb: DataFrame,
    model: PcaModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """(id, proj array<double>) — map-side centering + GEMM per batch."""
    mean, comps = model.mean.copy(), model.components.copy()
    dim = mean.shape[0]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            ).reshape(len(pdf), dim)
            P = np.round((X - mean) @ comps.T, round_to)
            yield pd.DataFrame(
                {"id": pdf["id"].to_numpy("int64"), "proj": list(P)}
            )

    return emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("embedding")
    ).mapInPandas(gen, "id long, proj array<double>")
