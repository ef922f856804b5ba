"""Embedding sources (reference S5/S6, AIProvider.cs:39-133).

The reference calls an HTTP provider (ollama/openai) with batched text
arrays per model. In the Spark engine that boundary is a ``mapInPandas``
iterator — each Arrow batch becomes one provider call — and for tests a
deterministic hash embedder (FIXTURES.md §1.4) replaces the network: the
vector is a pure function of (text, model, seed), so fixture generation,
the engine, and the DuckDB oracle agree without any model server.

Two implementations of the SAME function:
  - :func:`deterministic_embedding` — pure Column expression (JVM-side,
    scan-stage, no Python); preferred inside pipelines.
  - :func:`embed_map_in_pandas` — Arrow-batched Python path exercising the
    real provider seam (swap `_embed_batch` for an HTTP call to get the
    reference's S5/S6 behavior).
Both produce identical vectors (tested).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_DIM = 32
SEED = 42
_TWO_PI = 2.0 * math.pi


def _component(text: Column, model: Column, k: int) -> Column:
    """Raw component k: sin(h mod 10000 / 10000 * 2π) where h is the first
    60 bits of sha256(text|model|seed|k)."""
    h = F.conv(
        F.substring(
            F.sha2(
                F.concat_ws("|", text, model, F.lit(str(SEED)), F.lit(str(k))),
                256,
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")  # 60 bits — modulo must happen in integer domain
    return F.sin((h % 10000).cast("double") / 10000.0 * _TWO_PI)


def deterministic_embedding(
    text: Column, model: Column, dim: int = DEFAULT_DIM
) -> Column:
    """L2-normalized deterministic embedding as array<double>."""
    arr = F.array(*[_component(text, model, k) for k in range(dim)])
    norm = F.sqrt(
        F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    safe = F.when(norm == 0.0, F.lit(1.0)).otherwise(norm)
    return F.transform(arr, lambda x: x / safe)


def _embed_one(text: str, model: str, dim: int) -> list[float]:
    """Python mirror of deterministic_embedding (shared spec)."""
    comps = []
    for k in range(dim):
        payload = f"{text}|{model}|{SEED}|{k}".encode()
        h = int(hashlib.sha256(payload).hexdigest()[:15], 16)
        comps.append(math.sin(h % 10000 / 10000.0 * _TWO_PI))
    norm = math.sqrt(sum(c * c for c in comps)) or 1.0
    return [c / norm for c in comps]


def _embed_batch(texts: list[str], model: str, dim: int) -> list[list[float]]:
    """Provider seam: one call per (batch, model) — the reference's batched
    array-input request (AIProvider.cs:39, Datapoint.cs:67-110). Replace
    with an HTTP POST to `/api/embed` (ollama) or `/v1/embeddings` (openai)
    for a live provider."""
    return [_embed_one(t, model, dim) for t in texts]


def embed_map_in_pandas(
    df: DataFrame,
    text_col: str = "text",
    model_col: str = "model",
    dim: int = DEFAULT_DIM,
    out_col: str = "vector",
) -> DataFrame:
    """Arrow-batched embedding: each pandas batch is grouped by model and
    embedded with one `_embed_batch` call per model (the reference's
    per-model batched prefetch, SearchdomainHelper.cs:63-96)."""
    import pandas as pd

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    out_schema = f"{fields}, {out_col} array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vectors: list[list[float]] = [None] * len(pdf)  # type: ignore
            for model, idx in pdf.groupby(model_col).groups.items():
                texts = pdf.loc[idx, text_col].tolist()
                embs = _embed_batch(texts, str(model), dim)
                for i, pos in enumerate(idx):
                    vectors[pdf.index.get_loc(pos)] = embs[i]
            pdf = pdf.copy()
            pdf[out_col] = vectors
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
