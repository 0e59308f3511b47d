from . import bm25, facets, filters, fusion, topk, vector  # noqa: F401
