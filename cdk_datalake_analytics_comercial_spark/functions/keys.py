"""Surrogate-key builders.

The reference's identity convention (SURVEY §1.3): pipe-joined composite
business keys, e.g. ``concat_ws("|", cod_compania, cod_sucursal, cod_almacen,
cod_documento_venta, nro_documento_venta) -> id_venta`` (`t_venta.py:89`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def surrogate_key(*cols: Column | str, sep: str = "|") -> Column:
    """Pipe-joined composite key over trimmed string parts."""
    parts = [
        F.trim(F.col(c).cast("string")) if isinstance(c, str) else F.trim(c.cast("string"))
        for c in cols
    ]
    return F.concat_ws(sep, *parts)
