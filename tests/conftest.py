from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from crysda_spark.session import get_spark

    s = get_spark("crysda_spark_tests")
    yield s


@pytest.fixture(scope="session")
def lineitem(spark):
    from crysda_spark import read_parquet

    return read_parquet(spark, f"{SF_DIR}/lineitem.parquet").cache()


@pytest.fixture(scope="session")
def orders(spark):
    from crysda_spark import read_parquet

    return read_parquet(spark, f"{SF_DIR}/orders.parquet").cache()


@pytest.fixture(scope="session")
def nation(spark):
    from crysda_spark import read_parquet

    return read_parquet(spark, f"{SF_DIR}/nation.parquet")


@pytest.fixture(scope="session")
def region(spark):
    from crysda_spark import read_parquet

    return read_parquet(spark, f"{SF_DIR}/region.parquet")


@pytest.fixture(scope="session")
def customer(spark):
    from crysda_spark import read_parquet

    return read_parquet(spark, f"{SF_DIR}/customer.parquet")


@pytest.fixture(scope="session")
def sleep_df(spark):
    """msleep-like NA-heavy fixture (FIXTURES.md §1) built in-memory."""
    from crysda_spark import from_records

    rows = [
        {"name": "Cheetah", "vore": "carni", "sleep_total": 12.1, "sleep_rem": None, "bodywt": 50.0},
        {"name": "Owl monkey", "vore": "omni", "sleep_total": 17.0, "sleep_rem": 1.8, "bodywt": 0.48},
        {"name": "Mountain beaver", "vore": "herbi", "sleep_total": 14.4, "sleep_rem": 2.4, "bodywt": 1.35},
        {"name": "Greater short-tailed shrew", "vore": "omni", "sleep_total": 14.9, "sleep_rem": 2.3, "bodywt": 0.019},
        {"name": "Cow", "vore": "herbi", "sleep_total": 4.0, "sleep_rem": 0.7, "bodywt": 600.0},
        {"name": "Three-toed sloth", "vore": "herbi", "sleep_total": 14.4, "sleep_rem": 2.2, "bodywt": 3.85},
        {"name": "Northern fur seal", "vore": "carni", "sleep_total": 8.7, "sleep_rem": 1.4, "bodywt": 20.49},
        {"name": "Vesper mouse", "vore": None, "sleep_total": 7.0, "sleep_rem": None, "bodywt": 0.045},
        {"name": "Dog", "vore": "carni", "sleep_total": 10.1, "sleep_rem": 2.9, "bodywt": 14.0},
        {"name": "Roe deer", "vore": "herbi", "sleep_total": 3.0, "sleep_rem": None, "bodywt": 14.8},
        {"name": "Big brown bat", "vore": "insecti", "sleep_total": 19.7, "sleep_rem": 3.9, "bodywt": 0.023},
        {"name": "Little brown bat", "vore": "insecti", "sleep_total": 19.9, "sleep_rem": 2.0, "bodywt": 0.01},
    ]
    return from_records(spark, rows, order=["name", "vore", "sleep_total", "sleep_rem", "bodywt"])
