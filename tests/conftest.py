import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gstored_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def docs200(spark):
    from gstored_spark.sources import corpus as SC

    return SC.generate_documents(spark, 200).persist()


@pytest.fixture(scope="session")
def gold200(spark):
    from gstored_spark.sources import corpus as SC

    return SC.generate_gold(spark, 200).persist()


@pytest.fixture(scope="session")
def kg(spark, docs200):
    """Canonical string triples from the 200-doc corpus (expensive: full
    extract->link->LSH->CC pipeline; shared session-wide)."""
    from gstored_spark.kg.pipeline import triples_from_documents

    t = triples_from_documents(spark, docs200).persist()
    t.count()
    return t
