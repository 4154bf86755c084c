"""Layered table catalog: resolve ``(layer, table) -> path``.

Replaces the reference's ``data_paths`` class of S3 prefixes
(`common_jobs_functions.py:84-97`) with a filesystem-agnostic resolver
(local FS for tests, ``s3a://`` on a cluster — the path scheme is opaque to
the engine). Stage tables are multi-instance: one directory per source
endpoint under ``{root}/{layer}/{table}/{instance}/`` (reference reads
DynamoDB to enumerate endpoints, `common_jobs_functions.py:231-268`; here the
instance list is plain filesystem/config discovery).
"""

from __future__ import annotations

import enum
import json
import os
from dataclasses import dataclass, field


class Layer(str, enum.Enum):
    """Medallion layers of the reference (`common_jobs_functions.py:84-97`)."""

    RAW = "raw"
    STAGE = "stage"      # reference: BIGMAGIC / `apdayc`
    DOMAIN = "domain"
    ANALYTICS = "analytics"
    EXTERNAL = "external"


@dataclass
class Catalog:
    """Resolves logical table addresses to physical paths.

    ``root`` is the lake root (e.g. ``/tmp/lake`` or ``s3a://bucket/lake``).
    """

    root: str
    layer_prefixes: dict[str, str] = field(default_factory=dict)

    def layer_path(self, layer: Layer | str) -> str:
        layer = Layer(layer) if not isinstance(layer, Layer) else layer
        prefix = self.layer_prefixes.get(layer.value, layer.value)
        return os.path.join(self.root, prefix)

    def table_path(self, layer: Layer | str, table: str, instance: str | None = None) -> str:
        p = os.path.join(self.layer_path(layer), table)
        if instance is not None:
            p = os.path.join(p, instance)
        return p

    def instances(
        self, layer: Layer | str, table: str, principal_only: bool = False
    ) -> list[str]:
        """Enumerate instance subdirectories of a multi-instance stage table.

        Replaces the DynamoDB endpoint scan (`common_jobs_functions.py:231-268`).
        Only meaningful for local/posix paths; on object stores, pass the
        instance list explicitly to ``read_table``.

        ``principal_only=True`` restricts to endpoints flagged principal in
        the layer's ``_endpoints.json`` — the reference's ``have_principal``
        filter on the DynamoDB ``IS_PRINCIPAL`` attribute
        (`common_jobs_functions.py:241-243`). Shared masters (``m_pais``,
        ``m_parametro``, …) are replicated to every source endpoint; reading
        them from all endpoints unions duplicate copies → join fan-out and
        double-counted aggregates, so those reads must come from the single
        principal endpoint only.
        """
        base = self.table_path(layer, table)
        if not os.path.isdir(base):
            return []
        subdirs = sorted(
            d for d in os.listdir(base)
            if os.path.isdir(os.path.join(base, d)) and not d.startswith(("_", "."))
        )
        if principal_only:
            meta = self.endpoint_meta(layer)
            if meta:  # no registry file → every endpoint counts as principal
                subdirs = [
                    d for d in subdirs
                    if meta.get(d, {}).get("is_principal", False)
                ]
        return subdirs

    def endpoint_meta(self, layer: Layer | str) -> dict[str, dict]:
        """Endpoint registry for a layer: ``{endpoint: {"is_principal":
        bool, ...}}`` from ``{layer}/_endpoints.json`` — the filesystem twin
        of the reference's DynamoDB endpoint table (``ENDPOINT_NAME`` /
        ``IS_PRINCIPAL``, `common_jobs_functions.py:231-243`). Missing file
        → empty dict (single-endpoint lakes need no registry)."""
        path = os.path.join(self.layer_path(layer), "_endpoints.json")
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            return {}
        return data if isinstance(data, dict) else {}

    def is_table_dir(self, layer: Layer | str, table: str) -> bool:
        base = self.table_path(layer, table)
        if not os.path.isdir(base):
            return False
        # a single-instance table has data files / partition dirs directly
        return any(
            e.endswith(".parquet") or "=" in e or e == "_SUCCESS"
            for e in os.listdir(base)
        )
