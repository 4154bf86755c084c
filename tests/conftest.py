"""Shared pytest fixtures: one session-scoped SparkSession sized for CI."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from cdk_datalake_analytics_comercial_spark.core import get_spark

    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def lake(tmp_path):
    """A throwaway lake root + catalog."""
    from cdk_datalake_analytics_comercial_spark.core.catalog import Catalog

    return Catalog(root=str(tmp_path / "lake"))
