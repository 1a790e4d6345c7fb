from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import SparkSession

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("osm2geojson_spark-tests")
        # fixture documents are tiny: single shuffle partition + no AQE keeps
        # per-query scheduling overhead down (scale configs live in bench.py)
        .config("spark.sql.shuffle.partitions", "1")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield s
    s.stop()


def read_data(name: str) -> str:
    with open(os.path.join(DATA_DIR, name), encoding="utf-8") as f:
        return f.read()


def read_json(name: str):
    return json.loads(read_data(name))


@pytest.fixture
def data_dir():
    return DATA_DIR
