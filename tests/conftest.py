"""Shared Spark fixture: one local session for the whole test run.

local[32]-style config per the sandbox; shuffle partitions kept small so the
tiny fixture tables don't drown in empty tasks (AQE coalesces anyway).
"""

from __future__ import annotations

import pytest

from genesis_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="genesis-tests", cores=8,
                  shuffle_partitions=8)
    yield s
    s.stop()
