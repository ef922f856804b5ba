"""PCA over an embedding column — dimensionality reduction / whitening
ahead of similarity search (a 64->16 projection cuts ANN scan cost 4x
and often improves near-dup precision by dropping noise dimensions).

Scale shape: the covariance Gramian is computed as ONE pass of per-batch
(d x d) partial GEMMs emitted as (i, j, v) rows — n_batches * d^2 tiny
rows shuffle into a map-side-combinable sum, the corpus itself never
shuffles (the posexplode self-join alternative would shuffle n*d value
rows). The d x d result is collected to the driver (d^2 scalars), eigen-
decomposed with numpy, and the top-k components ship back inside a
mapInPandas closure for a zero-shuffle projection GEMM.

`gram_upper` (the distributed part) is driver-gated with a DuckDB oracle;
the eigen/projection stage is validated against numpy in tests/test_pca.py
(eigenvectors have sign/order freedom, so cross-engine hashing would be
meaningless — variance-recovery invariants are tested instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from embeddingsearch_spark.constants import ROUND_DIGITS


def column_means(emb: DataFrame, vec_col: str = "embedding") -> list[float]:
    """Per-dimension means in one tiny aggregate (d scalars to driver)."""
    first = emb.select(vec_col).first()
    if first is None:
        raise ValueError("empty corpus")
    d = len(first[0])
    row = emb.agg(
        *[F.avg(F.col(vec_col)[i].cast("double")).alias(f"m{i}") for i in range(d)]
    ).first()
    return [float(row[f"m{i}"]) for i in range(d)]


def gram_upper(
    emb: DataFrame,
    vec_col: str = "embedding",
    means: list[float] | None = None,
    ddof: int = 1,
) -> DataFrame:
    """Upper-triangle covariance entries ``(i, j, v)`` (i <= j, 0-based):
    v = sum_rows((x_i - mu_i)(x_j - mu_j)) / (n - ddof), rounded to
    ROUND_DIGITS. One corpus scan; each Arrow batch contributes its
    partial X_c^T X_c as d*(d+1)/2 rows."""
    import numpy as np

    if means is None:
        means = column_means(emb, vec_col)
    mu = np.asarray(means, dtype=np.float64)
    d = len(mu)
    iu = np.triu_indices(d)

    def part(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            ) - mu
            G = X.T @ X
            yield pd.DataFrame(
                {
                    "i": iu[0].astype("int32"),
                    "j": iu[1].astype("int32"),
                    "pv": G[iu],
                    "pn": np.full(len(iu[0]), len(X), dtype="int64"),
                }
            )

    partials = emb.select(vec_col).mapInPandas(
        part, schema="i int, j int, pv double, pn long"
    )
    return (
        partials.groupBy("i", "j")
        .agg(F.sum("pv").alias("_v"), F.sum("pn").alias("_n"))
        .select(
            "i",
            "j",
            # + 0.0 canonicalizes IEEE -0.0 (round can produce it and
            # engines disagree on the sign of a rounded-away negative)
            (
                F.round(
                    F.col("_v") / (F.col("_n") - F.lit(ddof)), ROUND_DIGITS
                )
                + F.lit(0.0)
            ).alias("v"),
        )
    )


def pca_components(
    emb: DataFrame,
    k: int,
    vec_col: str = "embedding",
) -> tuple[list[float], "object", "object"]:
    """(means, components (k x d), explained_variance (k,)) — covariance
    collected as d^2 scalars, eigh on the driver, top-k by eigenvalue."""
    import numpy as np

    means = column_means(emb, vec_col)
    d = len(means)
    rows = gram_upper(emb, vec_col, means=means).collect()
    C = np.zeros((d, d))
    for r in rows:
        C[r.i, r.j] = r.v
        C[r.j, r.i] = r.v
    vals, vecs = np.linalg.eigh(C)  # ascending
    order = np.argsort(vals)[::-1][:k]
    return means, vecs[:, order].T, vals[order]


def project(
    emb: DataFrame,
    means: list[float],
    components,
    vec_col: str = "embedding",
    out_col: str = "proj",
    whiten_by=None,
) -> DataFrame:
    """All input columns + ``proj`` (array<double>, length k): centered
    projection onto the components; ``whiten_by`` (eigenvalues) scales
    each axis to unit variance. Zero-shuffle Arrow GEMM per batch."""
    import numpy as np

    mu = np.asarray(means, dtype=np.float64)
    W = np.asarray(components, dtype=np.float64).T  # d x k
    if whiten_by is not None:
        W = W / np.sqrt(np.maximum(np.asarray(whiten_by, dtype=np.float64), 1e-12))
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in emb.schema
    )

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            ) - mu
            P = X @ W
            pdf = pdf.copy()
            pdf[out_col] = [list(map(float, p)) for p in P]
            yield pdf

    return emb.mapInPandas(run, schema=f"{fields}, {out_col} array<double>")
