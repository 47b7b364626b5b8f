from .likelihood import get_likelihood_fn, get_div_fn

__all__ = ["get_likelihood_fn", "get_div_fn"]
