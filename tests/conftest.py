import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


@pytest.fixture(scope="session")
def spark():
    from sparkcrawl.session import get_spark

    s = get_spark(cores=4, app="sparkcrawl-tests", shuffle_partitions=8)
    yield s
    s.stop()
