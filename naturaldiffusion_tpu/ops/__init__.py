from .weighted_sum import (weighted_sum_xla, fused_weighted_sum_pallas,
                           pad_rows, pad_lanes)

__all__ = ["weighted_sum_xla", "fused_weighted_sum_pallas",
           "pad_rows", "pad_lanes"]
