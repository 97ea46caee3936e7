from __future__ import annotations

import pandas as pd
import pytest

from manga_translator_spark.corpus import generate_corpus
from manga_translator_spark.oracle import extract_corpus
from manga_translator_spark.schema import PAGES_SCHEMA
from manga_translator_spark.session import get_spark

N_PAGES = 300  # covers every FIXTURES.md edge-case modulus at least once


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_rows():
    return generate_corpus(N_PAGES)


@pytest.fixture(scope="session")
def golden(corpus_rows):
    return {e.url: e for e in extract_corpus(corpus_rows)}


@pytest.fixture(scope="session")
def pages_df(spark, corpus_rows):
    df = spark.createDataFrame(pd.DataFrame(corpus_rows), schema=PAGES_SCHEMA)
    df.persist()
    df.count()
    return df
