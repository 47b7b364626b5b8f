from .ni import (NISchedule, natural_inference,
                 natural_inference_checked, natural_inference_reference)
from .predictions import to_x0, from_x0, PREDICTION_TYPES
from .guidance import classifier_free, classifier_free_two_pass, unconditional

__all__ = [
    "NISchedule", "natural_inference", "natural_inference_checked",
    "natural_inference_reference",
    "to_x0", "from_x0", "PREDICTION_TYPES",
    "classifier_free", "classifier_free_two_pass", "unconditional",
]
