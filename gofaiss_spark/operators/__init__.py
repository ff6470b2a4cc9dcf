from gofaiss_spark.operators.flat import FlatIndex, build_flat
from gofaiss_spark.operators.ivf import IvfIndex, build_ivf, search_ivf
from gofaiss_spark.operators.ivfpq import IvfPqIndex, build_ivfpq, search_ivfpq
from gofaiss_spark.operators.lsh import LshIndex, build_lsh, search_lsh
from gofaiss_spark.operators.pq import PqIndex, build_pq, search_pq
from gofaiss_spark.operators.topk import (
    range_search,
    score_pairs,
    search_flat,
    topk,
)

__all__ = [
    "FlatIndex",
    "IvfIndex",
    "IvfPqIndex",
    "LshIndex",
    "PqIndex",
    "build_flat",
    "build_ivf",
    "build_ivfpq",
    "build_lsh",
    "build_pq",
    "range_search",
    "score_pairs",
    "search_flat",
    "search_ivf",
    "search_ivfpq",
    "search_lsh",
    "search_pq",
    "topk",
]
