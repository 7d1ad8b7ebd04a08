import shutil

import pytest

from dataingestion_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    spark = build_session(
        app_name="cdc-engine-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.warehouse.dir": "/tmp/cdc-test-warehouse",
            "spark.driver.memory": "4g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture()
def tmp_table_dir(tmp_path):
    d = tmp_path / "table"
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)
