from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from hedera_etl_spark.session import get_spark

    s = get_spark("pytest", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()
