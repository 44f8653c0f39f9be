from .resize import (
    bilinear_matrix,
    nearest_indices,
    resize_bilinear,
    resize_nearest,
)
from .histogram import class_histogram, confusion_areas

__all__ = [
    "bilinear_matrix",
    "nearest_indices",
    "resize_bilinear",
    "resize_nearest",
    "class_histogram",
    "confusion_areas",
]
