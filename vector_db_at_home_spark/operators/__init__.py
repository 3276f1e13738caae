from .knn import knn_search
from .topk import top_k_per_group

__all__ = ["knn_search", "top_k_per_group"]
