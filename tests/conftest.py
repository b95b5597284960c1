import pytest

from kgspark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="kgspark-tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def rows_as_tuples(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())
