from gofaiss_spark.operators.topk import (
    range_search,
    score_pairs,
    search_flat,
    topk,
)

__all__ = ["range_search", "score_pairs", "search_flat", "topk"]
