"""Vector BLOB codec (S2/S3, reference SearchdomainHelper.cs:18-31):
float32 little-endian byte packing, the reference's MySQL `embedding BLOB`
wire format. The native engine layout is parquet `ARRAY<FLOAT>` (no
packing needed — SURVEY.md §1.6); these Arrow-batched UDFs exist ONLY for
interop with data exported from the reference's store.

UDFs are built lazily (a DDL return type parses against the active
session, which need not exist at import time).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

_cache: dict = {}


def _udfs():
    if "v2b" not in _cache:
        import numpy as np

        @pandas_udf("binary")
        def v2b(vectors: pd.Series) -> pd.Series:
            return vectors.map(
                lambda v: np.asarray(v, dtype="<f4").tobytes()
                if v is not None
                else None
            )

        @pandas_udf("array<float>")
        def b2v(blobs: pd.Series) -> pd.Series:
            return blobs.map(
                lambda b: np.frombuffer(bytes(b), dtype="<f4").tolist()
                if b is not None
                else None
            )

        _cache["v2b"], _cache["b2v"] = v2b, b2v
    return _cache["v2b"], _cache["b2v"]


def vector_to_blob(col: Column) -> Column:
    """array<float> → float32-LE bytes (reference BytesFromFloatArray)."""
    return _udfs()[0](col)


def blob_to_vector(col: Column) -> Column:
    """float32-LE bytes → array<float> (reference FloatArrayFromBytes)."""
    return _udfs()[1](col)
