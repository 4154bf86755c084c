from .relational import (
    rolling_range_join,
    rolling_window,
    top1_per_group,
    top1_per_group_agg,
)
from . import asof, contamination, dedup, dq, graph, incremental, multimodal, pack, similarity, sketches, skew, text, timeseries

__all__ = [
    "top1_per_group",
    "top1_per_group_agg",
    "rolling_range_join",
    "rolling_window",
    "asof",
    "contamination",
    "dedup",
    "dq",
    "graph",
    "incremental",
    "multimodal",
    "pack",
    "similarity",
    "sketches",
    "skew",
    "text",
    "timeseries",
]
