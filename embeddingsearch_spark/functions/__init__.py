from embeddingsearch_spark.functions.similarity import (  # noqa: F401
    cosine,
    euclidian,
    manhattan,
    pearson,
    similarity_dispatch,
)
from embeddingsearch_spark.functions.probmethods import (  # noqa: F401
    probmethod_agg,
    probmethod_dispatch_agg,
)
