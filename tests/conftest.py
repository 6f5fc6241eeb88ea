import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_log_analyzer_spark.conf import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_session(app="tests", cores=8, shuffle_partitions=8,
                      extra={"spark.driver.memory": "8g"})
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_df():
    from ai_log_analyzer_spark import grammar
    return grammar.generate_pages(2000)


@pytest.fixture(scope="session")
def oracle_result(pages_df):
    from ai_log_analyzer_spark.oracle import pipeline as O
    return O.run(pages_df)
