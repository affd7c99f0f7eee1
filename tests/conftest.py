import shutil
import tempfile
import warnings

import pytest

warnings.filterwarnings("ignore")


@pytest.fixture(scope="session")
def spark():
    from paimon_python_spark.session import configure_builder
    from pyspark.sql import SparkSession

    spark = configure_builder(
        SparkSession.builder.master("local[4]").appName("paimon_python_spark_tests"),
        shuffle_partitions=4,
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from paimon_python_spark.session import set_spark

    set_spark(spark)
    yield spark


@pytest.fixture()
def warehouse(spark):
    path = tempfile.mkdtemp(prefix="pps_wh_")
    yield path
    shutil.rmtree(path, ignore_errors=True)


@pytest.fixture()
def catalog(warehouse):
    from paimon_python_spark import Catalog

    cat = Catalog.create({"warehouse": warehouse})
    cat.create_database("default", True)
    return cat
