from . import dedup, joins, sink, source, stateful, windows

__all__ = ["windows", "stateful", "dedup", "joins", "sink", "source"]
