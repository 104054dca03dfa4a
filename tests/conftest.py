import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from zzzarchived_arxiv_fulltext_spark.config import build_spark

    spark = build_spark(
        app_name="engine-tests", master="local[4]", shuffle_partitions=8
    )
    yield spark
    spark.stop()
