from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datax_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="datax_spark_tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def wal_fixture(tmp_path_factory):
    """One shared small WAL (with schema evolution) for the suite."""
    from datax_spark.fixtures import generate_wal

    root = tmp_path_factory.mktemp("wal_fx")
    return generate_wal(str(root), n_keys=120, n_events=900, n_segments=6)
