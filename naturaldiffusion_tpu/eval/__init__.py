from .likelihood import get_likelihood_fn, get_div_fn
from .fid import (frechet_distance, compute_statistics, activations,
                  fid_from_samples)

__all__ = ["get_likelihood_fn", "get_div_fn", "frechet_distance",
           "compute_statistics", "activations", "fid_from_samples"]
