from __future__ import annotations

import pytest

from entity_resolution_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="entity_resolution_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def corpus(spark):
    """Small planted-duplicates corpus: (pages_df, labels_df, expected_df)."""
    from entity_resolution_spark.datagen import synth_pages_df

    return synth_pages_df(spark, n_entities=120, n_domains=12, seed=42)
