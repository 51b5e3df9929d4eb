import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdfspark.session import build_session  # noqa: E402
from pdfspark.synth import ensure_fixtures  # noqa: E402

SF = "sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = build_session(master="local[4]", app_name="pdfspark-tests",
                      shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_dir():
    return ensure_fixtures(SF)


@pytest.fixture(scope="session")
def spans_geom(spark, fixture_dir):
    return spark.read.parquet(os.path.join(fixture_dir, "spans_geom.parquet"))


@pytest.fixture(scope="session")
def documents_in(spark, fixture_dir):
    return spark.read.parquet(os.path.join(fixture_dir, "documents_in.parquet"))


@pytest.fixture(scope="session")
def testdata_dir():
    return "/root/testdata/sf0.001"
