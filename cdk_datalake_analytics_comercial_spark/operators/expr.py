"""Expression-level helpers for higher-order-function pipelines.

Spark evaluates higher-order functions interpreted (no codegen), and a
lambda body re-evaluates every captured subtree **per element** — a
``transform(sequence(...), i -> f(expensive_subtree, i))`` recomputes
``expensive_subtree`` once per output element. :func:`let` is the antidote:
bind the subtree as a lambda variable (bound references are cheap array
lookups), so it evaluates exactly once per row.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once per row, reference it many times in ``body``.

    Implemented as a single-element ``transform``: the lambda variable is a
    bound reference, so every use inside ``body`` is an O(1) lookup instead
    of a re-evaluation of the ``value`` expression tree.
    """
    return F.element_at(F.transform(F.array(value), body), 1)
