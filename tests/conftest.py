import pytest


@pytest.fixture(scope="session")
def spark():
    from geowave_spark.session import get_spark

    s = get_spark("pytest", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def geo001():
    from geowave_spark.datagen import ensure_geo_tables

    return ensure_geo_tables("sf0.001")
