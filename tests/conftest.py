from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

DATA_DIR = REPO_ROOT / "tests" / "data"


@pytest.fixture(scope="session")
def corpus_dir() -> Path:
    return DATA_DIR


@pytest.fixture(scope="session")
def spark():
    """Shared local SparkSession: one JVM for the whole test run."""
    from email_address_parser_spark.session import build_session

    spark = build_session(app_name="eap-tests", cores=os.environ.get("SPARK_GRAFT_CPUS", "4"),
                          shuffle_partitions=8)
    yield spark
    spark.stop()
