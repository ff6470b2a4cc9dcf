from gofaiss_spark.operators.diversity import mmr_rerank
from gofaiss_spark.operators.flat import FlatIndex, build_flat
from gofaiss_spark.operators.ivf import IvfIndex, build_ivf, search_ivf
from gofaiss_spark.operators.ivfpq import IvfPqIndex, build_ivfpq, search_ivfpq
from gofaiss_spark.operators.lsh import LshIndex, build_lsh, search_lsh
from gofaiss_spark.operators.pq import PqIndex, build_pq, search_pq
from gofaiss_spark.operators.reconstruct import merge_index, reconstruct
from gofaiss_spark.operators.retrieval import (
    TextIndex,
    build_text_index,
    load_text_index,
    rrf_fuse,
    save_text_index,
    search_bm25,
    search_maxsim,
    tfidf_top_terms,
)
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
    "TextIndex",
    "build_flat",
    "build_ivf",
    "build_ivfpq",
    "build_lsh",
    "build_pq",
    "build_text_index",
    "load_text_index",
    "merge_index",
    "mmr_rerank",
    "range_search",
    "reconstruct",
    "rrf_fuse",
    "save_text_index",
    "score_pairs",
    "search_bm25",
    "search_flat",
    "search_ivf",
    "search_ivfpq",
    "search_lsh",
    "search_maxsim",
    "search_pq",
    "tfidf_top_terms",
    "topk",
]
