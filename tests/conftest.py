import pytest

from biomass_processing_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="bpp_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def smoke_dir(spark):
    from biomass_processing_pipeline_spark import synth

    return synth.ensure_fixtures(spark, "sf0.001")
