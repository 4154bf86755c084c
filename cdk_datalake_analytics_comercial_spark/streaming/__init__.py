from . import dedup, joins, sink, stateful, windows

__all__ = ["windows", "stateful", "dedup", "joins", "sink"]
