from . import (  # noqa: F401
    bm25,
    facets,
    filters,
    fusion,
    ivf,
    pallas_knn,
    pq,
    quant,
    topk,
    vector,
)
