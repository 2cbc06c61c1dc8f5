from .matcher_pallas import fused_search

__all__ = ["fused_search"]
