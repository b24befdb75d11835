from .core import REGISTRY, Query, all_plans

__all__ = ["REGISTRY", "Query", "all_plans"]
