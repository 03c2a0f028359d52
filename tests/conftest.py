import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongo_bulk_data_migration_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="mbdm-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g", "spark.sql.autoBroadcastJoinThreshold": "1048576"},
    )
    yield s
    s.stop()


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "wh")


def rows_of(df, key="doc_id"):
    """Collect to plain sorted dicts for golden-state comparison."""
    out = []
    for r in df.collect():
        d = r.asDict(recursive=True)
        if "tokens" in d and d["tokens"] is not None:
            d["tokens"] = list(d["tokens"])
        out.append(d)
    return sorted(out, key=lambda d: d[key])
