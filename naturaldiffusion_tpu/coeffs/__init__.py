from .matrix import CoeffMatrix, max_abs_diff
from .registry import DERIVERS, derive

__all__ = ["CoeffMatrix", "max_abs_diff", "DERIVERS", "derive"]
