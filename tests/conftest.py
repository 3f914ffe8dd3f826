"""Shared pytest fixtures: one SparkSession per test run, synthetic
pages data at the smallest scale (sf0.001, 2000 rows, seed 42)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    from fgcspark.session import get_spark

    s = get_spark("fgcspark-tests", cores=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def pages_dir() -> str:
    """Deterministic sf0.001 pages dataset (generated once, cached)."""
    from fgcspark.synth.pages import ensure

    return str(ensure("sf0.001"))
