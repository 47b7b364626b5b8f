from .plotting import draw_marginal_coeff, save_image_grid

__all__ = ["draw_marginal_coeff", "save_image_grid"]
