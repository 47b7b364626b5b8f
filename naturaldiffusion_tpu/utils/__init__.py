from .plotting import draw_marginal_coeff, save_image_grid
from .profiling import Timer, NFECounter, trace

__all__ = ["draw_marginal_coeff", "save_image_grid", "Timer", "NFECounter",
           "trace"]
