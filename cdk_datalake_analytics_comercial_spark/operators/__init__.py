from .relational import top1_per_group, rolling_range_join, rolling_window
from . import dedup, similarity, text, multimodal

__all__ = [
    "top1_per_group",
    "rolling_range_join",
    "rolling_window",
    "dedup",
    "similarity",
    "text",
    "multimodal",
]
