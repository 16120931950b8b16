import os
import sys

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from gpq_tiles_spark.session import get_spark

    s = get_spark("gpq-tiles-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def docs_table(tmp_path_factory):
    """Small deterministic interleaved-document fixture (seed 42)."""
    from gpq_tiles_spark.fixtures import write_fixture

    path = str(tmp_path_factory.mktemp("fixtures") / "documents.parquet")
    write_fixture(path, n_docs=400, seed=42)
    return path
