import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from dedup_spark.session import get_spark

    s = get_spark("dedup_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus200(spark):
    from dedup_spark.synth import corpus_df

    return corpus_df(spark, 200, seed=42).cache()
