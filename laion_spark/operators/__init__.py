from laion_spark.operators.knn import knn_search, topk_by_score

__all__ = ["knn_search", "topk_by_score"]
