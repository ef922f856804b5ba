"""HTTP cross-encoder reranking provider seam.

The retrieval stack's final stage: a cross-encoder scores (query,
document) PAIRS jointly — more accurate than bi-encoder cosine, far too
expensive for the full corpus, so it reranks only the top candidates an
earlier stage (BM25 / ANN / RRF) already selected. The reference's
model-catalog configuration explicitly denylists cross-encoders from
the EMBEDDING path (docs/Server.md "Denylist": ["cross-encoder", ...])
— this module is the seam those models belong behind instead.

Same design as `sources/embedder.HttpEmbedder`: batched POST per Arrow
batch, bearer auth, injectable ``transport`` for tests, stdlib urllib
default — no HTTP client dependency. Wire format is the common public
rerank shape (Jina/Cohere-style):

    POST {model, query, documents: [...]}
      -> {"results": [{"index": i, "relevance_score": s}, ...]}

Scale shape: candidates are top-k rows per query (bounded by k·|Q|,
never corpus-sized), grouped per query so each query costs one POST per
``batch_size`` window of its candidates. Provider capacity — not Spark
— bounds parallelism; cap concurrent tasks via partition count if the
provider rate-limits.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from embeddingsearch_spark.constants import ROUND_DIGITS


@dataclass
class HttpReranker:
    """Batched HTTP cross-encoder client. ``transport`` is the test
    seam: callable (url, payload_dict, headers_dict, timeout) →
    response_dict; None → stdlib urllib POST."""

    url: str
    model: str
    api_key: str | None = None
    batch_size: int = 32
    timeout: float = 30.0
    transport: object = None

    def rerank(self, query: str, documents: list[str]) -> list[float]:
        """Relevance score per document, order-aligned with input."""
        from embeddingsearch_spark.sources.embedder import (
            _urllib_post_json,
        )

        transport = self.transport or _urllib_post_json
        headers = {}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        out: list[float] = [0.0] * len(documents)
        for i in range(0, len(documents), self.batch_size):
            chunk = documents[i : i + self.batch_size]
            resp = transport(
                self.url,
                {
                    "model": self.model,
                    "query": query,
                    "documents": chunk,
                },
                headers,
                self.timeout,
            )
            results = resp["results"]
            if len(results) != len(chunk):
                raise ValueError(
                    f"provider returned {len(results)} scores for "
                    f"{len(chunk)} documents"
                )
            seen: set[int] = set()
            for r in results:
                idx = int(r["index"])
                # contract errors, not silent misalignment: a negative
                # index would wrap via Python list semantics and score
                # the wrong document; duplicates would leave gaps
                if not 0 <= idx < len(chunk):
                    raise ValueError(
                        f"provider index {idx} outside batch of "
                        f"{len(chunk)}"
                    )
                if idx in seen:
                    raise ValueError(
                        f"provider returned duplicate index {idx}"
                    )
                seen.add(idx)
                out[i + idx] = float(r["relevance_score"])
        return out


@dataclass
class HashReranker:
    """Deterministic local stand-in cross-encoder (the `mock:model`
    convention of the embedder seam, applied to reranking): the score
    of a (query, document) pair is the md5 fraction of their joined
    text — a pure function both engines reproduce, so the WHOLE
    applyInPandas rerank path (grouping, batching, ranking) is
    value-oracled end-to-end. Swap `HttpReranker` in for a real
    provider; the interface is identical."""

    def rerank(self, query: str, documents: list[str]) -> list[float]:
        import hashlib

        out = []
        for d in documents:
            h = hashlib.md5(
                (query + "||" + d).encode("utf-8")
            ).hexdigest()[:8]
            # 32-bit int / 2^32: exactly representable in float64 —
            # rounding happens once, in rerank_topk's F.round
            out.append(int(h, 16) / 4294967296.0)
        return out


def rerank_topk(
    candidates: DataFrame,
    queries: DataFrame,
    reranker: HttpReranker,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
) -> DataFrame:
    """Rerank candidate rows with the cross-encoder:
    ``(query_id, doc_id, rerank_score, rank<=k)``.

    ``candidates`` = (query_id, doc_id, text) — the earlier stage's
    top-k join with the doc text. Work runs in `applyInPandas` grouped
    BY QUERY: each group is one query's candidate list (bounded by the
    upstream k), scored in ``batch_size`` windows per POST. Ranks are
    deterministic (rounded score desc, doc id asc)."""
    import pandas as pd

    joined = candidates.join(
        F.broadcast(
            queries.select(
                F.col(query_id_col),
                F.col(query_text_col).alias("_qtext"),
            )
        ),
        query_id_col,
    ).select(query_id_col, id_col, text_col, "_qtext")
    # derive id/query-id types from the input so string/UUID ids work —
    # a hardcoded `long` would make Arrow reject or null-cast them
    qt = candidates.schema[query_id_col].dataType.simpleString()
    it = candidates.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{query_id_col} {qt}, {id_col} {it}, rerank_score double"
    )

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return pd.DataFrame(
                columns=[query_id_col, id_col, "rerank_score"]
            )
        qtext = str(pdf["_qtext"].iloc[0])
        scores = reranker.rerank(qtext, [str(t) for t in pdf[text_col]])
        return pd.DataFrame(
            {
                query_id_col: pdf[query_id_col].values,
                id_col: pdf[id_col].values,
                "rerank_score": scores,
            }
        )

    scored = joined.groupBy(query_id_col).applyInPandas(
        score, schema=out_schema
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.round(F.col("rerank_score"), ROUND_DIGITS).desc(),
        F.col(id_col).asc(),
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            id_col,
            F.round("rerank_score", ROUND_DIGITS).alias("rerank_score"),
            "rank",
        )
    )
