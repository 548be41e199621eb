from .scalar import FUNCTIONS, evaluate, parse_expr

__all__ = ["FUNCTIONS", "evaluate", "parse_expr"]
