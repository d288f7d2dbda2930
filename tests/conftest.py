from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

# Tiny-frame invariant (operators/ranks.py:with_tiny_rank) is CHECKED in the
# test suite: every bounded-frame rank site counts its frame and raises if it
# exceeds the declared bound.
os.environ.setdefault("SVH_ASSERT_TINY_FRAMES", "1")

from shortvideohybridanalyticslakehouse_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("svh-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
