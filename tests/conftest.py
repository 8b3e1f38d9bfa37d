import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cex_crawler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # local[4,2]: 2 task attempts, like a real cluster's
    # spark.task.maxFailures>1 — the fault-injection resume test needs a
    # failed task attempt to retry instead of failing the job
    s = get_spark(app_name="cex-tests", master="local[4,2]", shuffle_partitions=4)
    yield s
    s.stop()
