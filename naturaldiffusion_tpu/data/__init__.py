from .datasets import (get_dataset, cifar10_iterator, synthetic_iterator,
                       get_scaler, get_inverse_scaler)
from .native_loader import NativeBatchLoader

__all__ = ["get_dataset", "cifar10_iterator", "synthetic_iterator",
           "get_scaler", "get_inverse_scaler", "NativeBatchLoader"]
